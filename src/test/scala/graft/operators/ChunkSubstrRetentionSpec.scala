package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Retention (GDPR/TTL) for the chunk and substring-anchor index
  * families (round 15 — the split family's DropBefore ported:
  * Dedup.compactChunkIndexDropBefore / compactSubstringIndexDropBefore).
  * Gates, per family:
  *  - horizon-clean feeds: the retained index EQUALS a from-scratch
  *    build over the retained corpus, and post-retention ingest equals
  *    the from-scratch pass over retained ∪ batch — including a copy of
  *    RETIRED content, which re-founds under a fresh owner;
  *  - tombstones enumerate exactly what was forgotten;
  *  - straddlers (content on both sides of the horizon) forget
  *    CONSERVATIVELY: later batches report less duplication, never a
  *    trim against forgotten content;
  *  - the substring family's text store physically drops pre-horizon
  *    docs (the real forgetting). */
class ChunkSubstrRetentionSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1504)
  private def blob(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  // era-disjoint ALPHABETS: any chunk of an era-1 doc contains only
  // era-1 characters, so no chunk hash can straddle eras — random text
  // alone is NOT horizon-clean (tiny CDC tail chunks like "a" repeat
  // across any random corpora; the first fixture cut caught exactly that)
  private def blobA(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(13)).toChar).mkString
  private def blobB(n: Int): String =
    (0 until n).map(_ => ('n' + rng.nextInt(13)).toChar).mkString

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def chunkRows(path: String): Set[(String, Long)] =
    spark.read.parquet(s"$path/chunks").as[(String, Long)].collect().toSet

  private def reports(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] =
    df.select("doc_id", "n_chunks", "n_dup_chunks", "dup_chars")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

  // era-LOCAL shared content over era-disjoint alphabets: horizon-clean
  // by construction
  private def era(ids: Range, pool: IndexedSeq[String],
                  mk: Int => String): Seq[(Long, String)] =
    ids.map { id =>
      val parts = (0 until 3).map { _ =>
        if (rng.nextInt(2) == 0) pool(rng.nextInt(pool.length))
        else mk(80 + rng.nextInt(80))
      }
      (id.toLong, parts.mkString)
    }

  test("chunk retention: horizon-clean drop equals from-scratch over the retained corpus; retired content re-founds") {
    val poolA = (0 until 4).map(_ => blobA(120))
    val poolB = (0 until 4).map(_ => blobB(120))
    val era1 = era(1 to 12, poolA, blobA)
    val era2 = era(13 to 24, poolB, blobB)
    val idx = tmp("graft-chunkret")
    Dedup.incrementalCdcDedup(spark, era1.toDF("doc_id", "text"),
      "doc_id", "text", idx, 16, 32).collect()
    Dedup.incrementalCdcDedup(spark, era2.toDF("doc_id", "text"),
      "doc_id", "text", idx, 16, 32).collect()
    val pre = chunkRows(idx)
    val dest = tmp("graft-chunkret-dst")
    val tomb = Dedup.compactChunkIndexDropBefore(spark, idx, dest, 13L)
      .as[(String, Long)].collect().toSet
    // tombstones = exactly the pre-horizon-owned hashes, and the kept
    // rows are exactly the rest (min-owner resolved)
    assert(tomb.nonEmpty && tomb.forall(_._2 < 13L))
    assert(chunkRows(dest) == pre.groupBy(_._1)
      .map { case (ph, xs) => (ph, xs.map(_._2).min) }.toSet
      .filter(_._2 >= 13L))
    assert(tomb.map(_._1) == pre.groupBy(_._1)
      .filter(_._2.map(_._2).min < 13L).keySet)
    // horizon-clean: retained index == from-scratch index over era2 only
    val scratch = tmp("graft-chunkret-scr")
    Dedup.incrementalCdcDedup(spark, era2.toDF("doc_id", "text"),
      "doc_id", "text", scratch, 16, 32).collect()
    assert(chunkRows(dest) == chunkRows(scratch))
    // post-retention batch: fresh content + an era2 repeat + a copy of
    // RETIRED era1 content (re-founds as its own first occurrence)
    val era3 = Seq(
      (30L, blob(100) + poolB(0)),  // dup vs retained era2
      (31L, poolA(1) + blob(90)),   // copy of retired content -> re-founds
      (32L, blob(200)))             // clean
    val got = reports(Dedup.incrementalCdcDedup(spark,
      era3.toDF("doc_id", "text"), "doc_id", "text", dest, 16, 32))
    val scratchAll = tmp("graft-chunkret-scr2")
    Dedup.incrementalCdcDedup(spark, (era2 ++ era3).toDF("doc_id", "text"),
      "doc_id", "text", scratchAll, 16, 32).collect()
    val want = reports(Dedup.cdcDedup((era2 ++ era3).toDF("doc_id", "text"),
      "doc_id", "text", 16, 32)).filter(kv => kv._1 >= 30L)
    assert(got == want)
    assert(got(30L)._2 > 0, "era2 repeat must classify dup")
    scratchAll.nonEmpty // silence unused
    ()
  }

  test("chunk retention: a straddler forgets conservatively — less duplication, never a stale trim") {
    val shared = blob(150)
    val era1 = Seq((1L, blob(60) + shared), (2L, blob(180)))
    val era2 = Seq((10L, shared + blob(70)))  // straddler: dup of era1
    val idx = tmp("graft-chunkstraddle")
    Dedup.incrementalCdcDedup(spark, era1.toDF("doc_id", "text"),
      "doc_id", "text", idx, 16, 32).collect()
    val r2 = reports(Dedup.incrementalCdcDedup(spark,
      era2.toDF("doc_id", "text"), "doc_id", "text", idx, 16, 32))
    assert(r2(10L)._2 > 0, "fixture must straddle (era2 dup of era1)")
    val dest = tmp("graft-chunkstraddle-dst")
    Dedup.compactChunkIndexDropBefore(spark, idx, dest, 10L).collect()
    // era3 repeats the straddled content: the index forgot it (era2's
    // occurrence was dup, never indexed), so it re-founds — LESS
    // duplication than from-scratch over the retained corpus, which
    // would attribute it to era2's copy. Conservative direction only.
    val era3 = Seq((20L, blob(30) + shared))
    val got = reports(Dedup.incrementalCdcDedup(spark,
      era3.toDF("doc_id", "text"), "doc_id", "text", dest, 16, 32))
    val want = reports(Dedup.cdcDedup((era2 ++ era3).toDF("doc_id", "text"),
      "doc_id", "text", 16, 32))
    assert(got(20L)._2 <= want(20L)._2)
    // and doc 20's chunks were admitted as owners (re-founded)
    assert(chunkRows(dest).exists(_._2 == 20L))
  }

  private def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
    df.select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => (x._2, x._3)).sorted.toSeq
      }

  test("substring retention: anchors and texts drop by horizon; post-retention trims equal from-scratch over retained ∪ batch") {
    val sharedA = blob(80)  // era-1-only content
    val sharedB = blob(80)  // era-2-only content
    val era1 = Seq(
      (1L, blob(50) + sharedA + blob(40)),
      (2L, blob(20) + sharedA + blob(70)),  // trims vs doc 1
      (3L, blob(120)))
    val era2 = Seq(
      (10L, blob(30) + sharedB + blob(50)),
      (11L, sharedB + blob(90)),            // trims vs doc 10? (10 earlier)
      (12L, blob(140)))
    val idx = tmp("graft-substrret")
    Dedup.buildSubstringIndex(era1.toDF("doc_id", "text"), "doc_id", "text", idx)
    Dedup.incrementalSubstringDedup(spark, era2.toDF("doc_id", "text"),
      "doc_id", "text", idx, 40).collect()
    Dedup.appendToSubstringIndex(spark, era2.toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val dest = tmp("graft-substrret-dst")
    val tomb = Dedup.compactSubstringIndexDropBefore(spark, idx, dest, 10L)
    assert(tomb.count() > 0)
    // texts physically dropped below the horizon
    val keptIds = spark.read.parquet(s"$dest/texts")
      .select("id").as[Long].collect().toSet
    assert(keptIds == Set(10L, 11L, 12L))
    // no surviving anchor references a deleted text
    val anchorIds = spark.read.parquet(s"$dest/anchors")
      .select("e_id").as[Long].collect().toSet
    assert(anchorIds.forall(_ >= 10L))
    // horizon-clean: retained index == from-scratch build over era2
    val scratch = tmp("graft-substrret-scr")
    Dedup.buildSubstringIndex(era2.toDF("doc_id", "text"), "doc_id", "text", scratch)
    def anchors(p: String): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$p/anchors").as[(Long, Long, Long)].collect().toSet
    assert(anchors(dest) == anchors(scratch))
    // post-retention batch: repeats of retained era2 content AND of
    // RETIRED era1 content — spans equal from-scratch anchored over
    // retained ∪ batch (the era1 repeat trims NOTHING: re-founds)
    val batch = Seq(
      (20L, blob(10) + sharedB + blob(60)), // trims vs era2
      (21L, sharedA + blob(75)),            // retired content: keeps all
      (22L, blob(95)))                      // clean
    val got = spansOf(Dedup.incrementalSubstringDedup(
      spark, batch.toDF("doc_id", "text"), "doc_id", "text", dest, 40))
    val want = spansOf(Dedup.substringDedupAnchored(
      (era2 ++ batch).toDF("doc_id", "text"), "doc_id", "text", 40))
      .filter(kv => kv._1 >= 20L)
    assert(got == want)
    assert(got.contains(20L) && !got.contains(21L) && !got.contains(22L))
  }

  test("empty-survivor horizon: retiring EVERY id leaves readable stores that accept later ingest") {
    // the r15 latent bug: a horizon past every text id wrote an empty
    // partitioned texts/ (just _SUCCESS) that the next read failed
    // schema inference on — the marker in writeTextsReadable fixes it
    val era1 = Seq((1L, blob(100)), (2L, blob(60) + blob(60)))
    val idx = tmp("graft-substrempty")
    Dedup.buildSubstringIndex(era1.toDF("doc_id", "text"), "doc_id", "text", idx)
    val dest = tmp("graft-substrempty-dst")
    val tomb = Dedup.compactSubstringIndexDropBefore(spark, idx, dest, 100L)
    assert(tomb.count() > 0, "fixture must actually retire anchors")
    // the regression reads: both stores must stay readable at zero rows
    assert(spark.read.parquet(s"$dest/texts").count() == 0)
    assert(spark.read.parquet(s"$dest/anchors").count() == 0)
    // and the emptied store still works as an index: classify + admit a
    // fresh batch (repeating RETIRED content — re-founds, trims nothing),
    // then the appended texts coexist with the schema marker
    val batch = Seq((200L, era1.head._2), (201L, blob(90)))
    val spans = Dedup.incrementalSubstringDedup(spark,
      batch.toDF("doc_id", "text"), "doc_id", "text", dest, 40)
    assert(spans.count() == 0, "retired content must re-found, not trim")
    Dedup.appendToSubstringIndex(spark, batch.toDF("doc_id", "text"),
      "doc_id", "text", dest)
    assert(spark.read.parquet(s"$dest/texts")
      .select("id").as[Long].collect().toSet == Set(200L, 201L))
    // chunk family under the same all-retired horizon (non-partitioned
    // store — must also stay readable and re-ingestable)
    val cidx = tmp("graft-chunkempty")
    Dedup.incrementalCdcDedup(spark, era1.toDF("doc_id", "text"),
      "doc_id", "text", cidx, 16, 32).collect()
    val cdest = tmp("graft-chunkempty-dst")
    Dedup.compactChunkIndexDropBefore(spark, cidx, cdest, 100L).collect()
    assert(spark.read.parquet(s"$cdest/chunks").count() == 0)
    val creport = reports(Dedup.incrementalCdcDedup(spark,
      batch.toDF("doc_id", "text"), "doc_id", "text", cdest, 16, 32))
    assert(creport(200L)._2 == 0, "retired chunks must re-found as owners")
  }
}
