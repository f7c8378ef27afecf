package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"==== $q ====")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      plan.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .foreach(l => println(l.trim.take(220)))
      println("Exchanges: " + (plan.split("Exchange ").length - 1))
      println("BHJ: " + (plan.split("BroadcastHashJoin").length - 1)
        + "  SMJ: " + (plan.split("SortMergeJoin").length - 1))
      // Spark 4 formatted plans tag codegen'd operators "[codegen id : N]"
      val codegenIds = "codegen id : (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSet
      println("CodegenSpans: " + codegenIds.size)
      if (sys.env.contains("GRAFT_EXPLAIN_FULL")) println(plan)
    }
    spark.stop()
  }
}
