package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Receipt for churn-proportional LSH-index compaction
  * (Dedup.compactDedupIndexDelta — the IvfCompactBench analogue for the
  * band-table families): builds a dedup index over a docs corpus, then
  * prices (a) the whole rewrite, (b) the first delta swap (escalates to
  * full — manifest founding), (c) a ZERO-CHURN delta swap (pure hard
  * links), (d) a delta swap after a small append (base links, only the
  * appended files fold), and asserts the delta-compacted and
  * whole-rewritten generations classify a probe batch identically.
  * Usage: runMain graft.BandCompactBench <sfDir> [chunks]
  * — second arg `chunks` prices the CHUNK family
  * (Dedup.compactChunkIndexDelta, round 17) the same way: whole
  * rewrite vs manifest founding vs zero-churn link swap vs
  * append-delta fold, with per-doc report equality asserted. */
object BandCompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sed.SedQueries.ensureConfs(spark)
    import graft.operators.Dedup
    val docs = graft.sed.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint(true)
    val n = docs.count()
    // append/probe batches: ids above the corpus (monotone contract)
    val mx = docs.agg(max("doc_id")).first().getLong(0)
    val append = docs.limit(500)
      .select((col("doc_id") + mx + 1).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val probe = docs.limit(400)
      .select((col("doc_id") + 2 * (mx + 1)).as("doc_id"), col("text"))
      .localCheckpoint(true)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    if (args.lift(1).contains("chunks")) {
      // CHUNK family: same lifecycle pricing over the (ph, owner) table
      val idx = tmp("graft-bcb-cidx")
      t(s"chunk_build n=$n")(Dedup.incrementalCdcDedup(
        spark, docs, "doc_id", "text", idx, 16, 32)
        .queryExecution.toRdd.count())
      val w = tmp("graft-bcb-cw")
      t("whole_rewrite")(Dedup.compactChunkIndex(spark, idx, w))
      val d1 = tmp("graft-bcb-cd1")
      println("first_delta(actions=" +
        t("first_delta")(Dedup.compactChunkIndexDelta(spark, idx, d1)) + ")")
      val d2 = tmp("graft-bcb-cd2")
      println("zero_churn(actions=" +
        t("zero_churn")(Dedup.compactChunkIndexDelta(spark, d1, d2)) + ")")
      t("append")(Dedup.incrementalCdcDedup(
        spark, append, "doc_id", "text", d2, 16, 32)
        .queryExecution.toRdd.count())
      val d3 = tmp("graft-bcb-cd3")
      println("append_delta(actions=" +
        t("append_delta")(Dedup.compactChunkIndexDelta(spark, d2, d3)) + ")")
      val w2 = tmp("graft-bcb-cw2")
      t("whole_rewrite_post_append")(Dedup.compactChunkIndex(spark, d2, w2))
      // probe both (incrementalCdcDedup classifies BEFORE its append,
      // so the returned reports reflect the pre-probe index state)
      def report(p: String) = Dedup.incrementalCdcDedup(
          spark, probe, "doc_id", "text", p, 16, 32)
        .select("doc_id", "n_chunks", "n_dup_chunks", "dup_chars")
        .collect().toSet
      val eq = report(d3) == report(w2)
      println(s"report_equal=$eq")
      require(eq, "delta-compacted chunk report diverged from whole rewrite")
      spark.stop()
      return
    }
    val idx = tmp("graft-bcb-idx")
    t(s"build n=$n")(Dedup.buildDedupIndex(docs, "doc_id", "text", idx))
    val w = tmp("graft-bcb-w")
    t("whole_rewrite")(Dedup.compactDedupIndex(spark, idx, w))
    val d1 = tmp("graft-bcb-d1")
    println("first_delta(actions=" +
      t("first_delta")(Dedup.compactDedupIndexDelta(spark, idx, d1)) + ")")
    val d2 = tmp("graft-bcb-d2")
    println("zero_churn(actions=" +
      t("zero_churn")(Dedup.compactDedupIndexDelta(spark, d1, d2)) + ")")
    // small append, then the churn-proportional swap
    val cls = Dedup.incrementalDedup(spark, append, "doc_id", "text", d2)
      .localCheckpoint(true)
    Dedup.appendToDedupIndex(append, cls, "doc_id", "text", d2)
    val d3 = tmp("graft-bcb-d3")
    println("append_delta(actions=" +
      t("append_delta")(Dedup.compactDedupIndexDelta(spark, d2, d3)) + ")")
    val w2 = tmp("graft-bcb-w2")
    t("whole_rewrite_post_append")(Dedup.compactDedupIndex(spark, d2, w2))
    def classify(p: String): Long = Dedup.incrementalDedup(
        spark, probe, "doc_id", "text", p)
      .select("doc_id", "status", "match_id", "n_near")
      .orderBy("doc_id").queryExecution.toRdd.count()
    val eq = Dedup.incrementalDedup(spark, probe, "doc_id", "text", d3)
      .select("doc_id", "status", "match_id", "n_near").collect().toSet ==
      Dedup.incrementalDedup(spark, probe, "doc_id", "text", w2)
        .select("doc_id", "status", "match_id", "n_near").collect().toSet
    println(s"classification_equal=$eq probe_rows=${classify(d3)}")
    require(eq, "delta-compacted classification diverged from whole rewrite")
    spark.stop()
  }
}
