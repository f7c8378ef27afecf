package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Incremental CDC-chunk dedup (Dedup.incrementalCdcDedup — the chunk
  * index behind streaming video dedup): the gate is EQUALITY of the
  * accumulated per-batch reports with the from-scratch cdcDedup over
  * everything ingested (a doc's report is final at ingest under the
  * corpus-order-first rule), plus crash-replay idempotence and
  * compaction invariance. */
class ChunkIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1215)
  private def blob(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  private def freshIdx(): String =
    java.nio.file.Files.createTempDirectory("graft-chunkidx-spec").toString

  /** Corpus with shared runs across ids: later docs embed earlier docs'
    * substrings so dup chunks appear within AND across batches. */
  private def corpus(): Seq[(Long, String)] = {
    val shared = (0 until 6).map(_ => blob(120))
    (1L to 24L).map { id =>
      val parts = (0 until 3).map { j =>
        if (rng.nextInt(2) == 0) shared(rng.nextInt(shared.length))
        else blob(80 + rng.nextInt(80))
      }
      (id, parts.mkString)
    }
  }

  private def reports(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
    df.select("doc_id", "n_chunks", "n_dup_chunks", "dup_chars")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  test("batch-fed ingest reports equal from-scratch cdcDedup, cross-batch dups included") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val got = Seq((1L, 8L), (9L, 16L), (17L, 24L)).map { case (lo, hi) =>
      reports(Dedup.incrementalCdcDedup(spark,
        docs.filter(col("doc_id").between(lo, hi)), "doc_id", "text", idx, 16, 32))
    }.reduce(_ ++ _)
    val want = reports(Dedup.cdcDedup(docs, "doc_id", "text", 16, 32))
    assert(got == want)
    assert(want.values.exists(_._2 > 0), "fixture planted no dup chunks")
    // and dups genuinely cross batch boundaries: some doc in a later
    // batch has dup chunks that from-scratch attributes to an earlier id
    val later = (9L to 24L).filter(id => want.get(id).exists(_._2 > 0))
    assert(later.nonEmpty, "no cross-batch or later-batch dup docs")
  }

  test("post-append replay re-derives the IDENTICAL report (owner self-exclusion)") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val b1 = docs.filter(col("doc_id") <= 12)
    val b2 = docs.filter(col("doc_id") > 12)
    val r1 = reports(Dedup.incrementalCdcDedup(spark, b1, "doc_id", "text", idx, 16, 32))
    // replay b1 AFTER its append committed: its own hashes are indexed
    // under its OWN ids, which the strict owner inequality never counts
    // as earlier content — the report must be bit-identical, and later
    // batches must still classify exactly despite the duplicate owner rows
    val r1replay = reports(Dedup.incrementalCdcDedup(spark, b1, "doc_id", "text", idx, 16, 32))
    assert(r1replay == r1)
    val r2 = reports(Dedup.incrementalCdcDedup(spark, b2, "doc_id", "text", idx, 16, 32))
    val want = reports(Dedup.cdcDedup(docs, "doc_id", "text", 16, 32))
    assert((r1 ++ r2) == want)
  }

  test("compaction drops duplicate hash rows and preserves classification") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    Dedup.incrementalCdcDedup(spark, docs.filter(col("doc_id") <= 12),
      "doc_id", "text", idx, 16, 32).count()
    // simulate a crash-replay double append
    Dedup.incrementalCdcDedup(spark, docs.filter(col("doc_id") <= 12),
      "doc_id", "text", idx, 16, 32).count()
    val dest = freshIdx()
    Dedup.compactChunkIndex(spark, idx, dest)
    val compacted = spark.read.parquet(s"$dest/chunks")
    assert(compacted.count() == compacted.distinct().count())
    val r2 = reports(Dedup.incrementalCdcDedup(spark,
      docs.filter(col("doc_id") > 12), "doc_id", "text", dest, 16, 32))
    val want = reports(Dedup.cdcDedup(docs, "doc_id", "text", 16, 32))
    assert(r2 == want.filter(_._1 > 12))
  }
}
