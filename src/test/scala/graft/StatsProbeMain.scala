package graft
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: print optimizedPlan.stats.sizeInBytes for the
  * loaders at each SF, to pick fanOut minBytes floors empirically. */
object StatsProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1");
         t <- Seq("documents", "embeddings", "events")) {
      val df = graft.sources.Tables.load(spark, dir, t)
      val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
      println(s"$dir/$t sizeInBytes=$sz parts=${df.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
