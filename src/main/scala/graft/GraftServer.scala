package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.api.{Engine, GraftConfig, HttpApi}

/** Daemon entry point — the `loudmld -c <config>` analog
  * (/root/reference/loudml/server.py main): read a JSON config
  * document, boot the service (bucket registry → engine → HTTP), and
  * serve until killed.
  *
  *   spark-submit --class graft.GraftServer <jar> /etc/graft/config.json
  *
  * The Spark session is the process's compute fabric: every endpoint's
  * data path is the same distributed plan the library call runs. */
object GraftServer {

  /** Testable core: boot from a config file path, return the handles
    * (the caller owns the api's lifecycle). `portOverride = Some(0)`
    * binds ephemeral for tests. */
  def startFromFile(spark: SparkSession, configPath: String,
      portOverride: Option[Int] = None)
      : (Engine, HttpApi, java.net.InetSocketAddress) = {
    val json = new String(Files.readAllBytes(Paths.get(configPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    GraftConfig.serve(spark, GraftConfig.fromJson(json), portOverride)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: GraftServer <config.json> [port]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-server")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val port = if (args.length > 1) Some(args(1).toInt) else None
    val (_, api, addr) = startFromFile(spark, args(0), port)
    System.err.println(s"graft serving on ${addr.getHostString}:${addr.getPort}")
    // serve until the process is killed; the shutdown hook closes clean
    val latch = new java.util.concurrent.CountDownLatch(1)
    sys.addShutdownHook { api.stop(); latch.countDown() }
    latch.await()
  }
}
