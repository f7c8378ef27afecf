package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
object TimeTwo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/docs1000")
    var t0 = System.nanoTime()
    var c = Dedup.substringDedupAnchored(docs, "doc_id", "text", 40)
      .queryExecution.toRdd.count()
    println(s"TIME anchored_1000x ${(System.nanoTime()-t0)/1e9} rows=$c")
    t0 = System.nanoTime()
    c = Dedup.cdcDedup(docs, "doc_id", "text", 16, 64).queryExecution.toRdd.count()
    println(s"TIME cdc_1000x ${(System.nanoTime()-t0)/1e9} rows=$c")
    spark.stop()
  }
}
