package graft
import org.apache.spark.sql.SparkSession
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    if (args.length > 1 && args(1) == "full") println(plan)
    println("=== " + name + " ===")
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).length)
    println("Exchange count: " + "Exchange".r.findAllIn(plan).length)
    println("BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(plan).length +
      "  SortMergeJoin: " + "SortMergeJoin".r.findAllIn(plan).length +
      "  NestedLoop: " + "BroadcastNestedLoopJoin".r.findAllIn(plan).length)
    println("WholeStageCodegen spans: " + "WholeStageCodegen".r.findAllIn(plan).length)
    spark.stop()
  }
}
