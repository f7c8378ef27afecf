package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AnchorBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    // phase 1: anchor walk alone
    val anchors = docs.filter(length(col("text")) >= 16)
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graft.WinnowedAnchors(col("text"), 16, 25)).as("__a"))
      .select(col("doc_id"), col("__a.pos").as("pos"), col("__a.h").as("h"))
    t("anchors-scan")(anchors.queryExecution.toRdd.count())
    // phase 2: full operator
    t("full")(graft.operators.Dedup.substringDedupAnchored(
      docs, "doc_id", "text", 40, 16, 25).queryExecution.toRdd.count())
    // phase 3: the incremental ingestion loop — index the 9/10 corpus
    // slice once, then classify + admit the 1/10 delta batch; the
    // classify+append numbers are the recurring per-batch cost
    val idx = java.nio.file.Files.createTempDirectory("graft-incrsub").toString
    // delta = top 1/10 id range, honoring appendToSubstringIndex's
    // monotone-id ingestion contract (corpus ids all below delta ids)
    val cut = docs.agg(expr("percentile_approx(doc_id, 0.9)")).head().getLong(0)
    val corpus = docs.filter(col("doc_id") < cut)
    val delta = docs.filter(col("doc_id") >= cut)
    t("index-build")(graft.operators.Dedup.buildSubstringIndex(
      corpus, "doc_id", "text", idx))
    t("incr-classify")(graft.operators.Dedup.incrementalSubstringDedup(
      spark, delta, "doc_id", "text", idx, 40).queryExecution.toRdd.count())
    t("incr-append")(graft.operators.Dedup.appendToSubstringIndex(
      spark, delta, "doc_id", "text", idx))
    spark.stop()
  }
}
