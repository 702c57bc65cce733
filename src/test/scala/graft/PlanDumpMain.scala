package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Dump the AQE-final `explain("formatted")` plan of every SparkEntry
  * query (or a comma-separated subset in arg 1) to `<outDir>/<name>_<tag>.txt`
  * — the round's plan evidence (plans/r14, tags "before" and "after").
  *
  * Runs each query at sf0.001 (audit-sized) and collect()s it first so the
  * explain shows the AQE-final plan with codegen markers, exactly like
  * PlanAuditMain (a noop write would leave the frame unexecuted /
  * isFinalPlan=false).
  *
  * Usage: Test/runMain graft.PlanDumpMain <outDir> <tag> [names] [dataDir]
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val dataDir =
      if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 2)
        args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dataDir)
        df.collect()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${name}_$tag.txt"),
          plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"dumped $name")
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
