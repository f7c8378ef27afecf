package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Scratch stress timing: logistic-regression fit/eval on the 100x
  * duplicate-saturated corpus (500k docs). */
object TimeCls {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(
      args.headOption.getOrElse("/tmp/sfbig/documents.parquet"))
    val label = when(col("lang") === "en", 1000000L).otherwise(0L)
    var t0 = System.nanoTime()
    val w = Classifier.fitLogistic(docs, "doc_id", "text", label, 256, 3, 50L)
    val nw = w.count()
    println(s"TIME cls_fit_100x ${(System.nanoTime() - t0) / 1e9} weights=$nw")
    t0 = System.nanoTime()
    val ev = Classifier.evalLogistic(docs, "doc_id", "text", label, 256, 3, 50L)
    val acc = ev.agg(avg(col("correct").cast("double"))).head().getDouble(0)
    println(s"TIME cls_eval_100x ${(System.nanoTime() - t0) / 1e9} acc=$acc")
    spark.stop()
  }
}
