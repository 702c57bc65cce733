package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "runs":R,"agg":"min","sf":…,"passes":[…],"queries":{name:sec,…}}
  * — per-query MINIMUMS last so a bounded tail capture keeps them.
  *
  * Each query is materialized through the `noop` sink so the full output
  * (all columns, all rows) is computed — `count()` would let Catalyst prune
  * the payload columns and undercount the real work. A warmup query runs
  * first so JIT/classloading/FS-metadata costs don't land on the first
  * measured query.
  *
  * Each query is timed in SPARK_GRAFT_BENCH_RUNS full passes over the
  * suite (default 2) and the per-query MINIMUM across passes is
  * reported: this host's shared-VM CPU throttles in bursts, and
  * single-shot timings swing 3-10× on identical code (measured across
  * rounds — e.g. one suite run scored a 2.4 s query at 56 s while
  * neighbours were unaffected). The passes are INTERLEAVED — the whole
  * suite runs once, then again — so a throttle burst, which is short
  * and contiguous in time, cannot hit both runs of the same query
  * (back-to-back runs sat inside one burst and defeated min-of-2 in
  * round 4). The JSON carries every pass's raw numbers as evidence
  * alongside the per-query min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: small scan+agg exercises codegen, parquet footer reads, JIT
    SparkEntry.queries.get("q_agg_stats")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save())

    // optional subset for local iteration: comma-separated query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // interleaved passes: run the WHOLE suite once per pass, min per
    // query across passes — a contiguous throttle burst can inflate a
    // query in at most one pass
    val passes: Seq[Map[String, Double]] =
      (1 to runs).map(_ => names.map(n => n -> once(n)).toMap)
    val results = names.map { n =>
      val ts = passes.map(_(n))
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val ok = results.filter(_._2 >= 0)
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val passesJson = passes.map(p => names.map(n => s""""$n":${p(n)}""")
      .mkString("{", ",", "}")).mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    // "queries" (the per-query mins — the meaningful numbers) is the
    // LAST key: the driver keeps a bounded TAIL of this line, and with
    // the raw-pass evidence first, truncation eats the evidence rather
    // than the result (round 5 lost the mins to the old ordering)
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"agg":"min","interleaved":true,"sf":"$sfDir","passes":$passesJson,"queries":$qs}""")
    spark.stop()
  }
}
