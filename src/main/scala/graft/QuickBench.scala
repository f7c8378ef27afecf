package graft
import org.apache.spark.sql.SparkSession
object QuickBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // stress runs lift the driver-result guard (memory-sink streaming
      // entries at 100x return >1 GiB to the driver by design)
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT", "1g"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args(0)).queryExecution.toRdd.count()
      println(f"QB $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
