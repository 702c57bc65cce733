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
    // collect() executes THIS DataFrame's QueryExecution so the explain
    // below shows the AQE-final plan with codegen markers (a noop write
    // would spawn a separate execution and leave df unexecuted /
    // isFinalPlan=false); sf0.001 results are audit-sized
    df.collect()
    // formatted mode AFTER an action: AQE's plain executedPlan.toString
    // hides final shapes and codegen markers ("*(n)" prefixes)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    if (args.length > 1 && args(1) == "full") println(plan)
    println("=== " + name + " ===")
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).length)
    println("Exchange count: " + "\\bExchange\\b".r.findAllIn(plan).length)
    println("BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(plan).length +
      "  SortMergeJoin: " + "SortMergeJoin".r.findAllIn(plan).length +
      "  NestedLoop: " + "BroadcastNestedLoopJoin".r.findAllIn(plan).length)
    // formatted mode marks codegen'd nodes with a "* " prefix
    println("codegen'd nodes: " + "\\* [A-Z]".r.findAllIn(plan).length +
      " / " + "\\([0-9]+\\)\n".r.findAllIn(plan).length + " total")
    spark.stop()
  }
}
