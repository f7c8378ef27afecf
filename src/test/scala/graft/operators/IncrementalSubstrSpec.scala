package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Incremental substring dedup over a persisted winnowed-anchor index
  * (Dedup.buildSubstringIndex / incrementalSubstringDedup / append /
  * compact): the round-11 ExactSubstr ingestion loop. The load-bearing
  * gate is span-EXACT equality against the from-scratch anchored
  * operator on corpus ∪ batch restricted to batch ids — the persisted
  * index path certifies against the direct computation, the same shape
  * as incremental exact dedup's oracle replay. */
class IncrementalSubstrSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1311)
  private def randText(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  private def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
    df.select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => (x._2, x._3)).sorted.toSeq
      }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-substridx-spec").toString

  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  /** From-scratch anchored spans on the union, restricted to `ids`. */
  private def scratch(rows: Seq[(Long, String)], ids: Set[Long],
                      minLen: Int = 40): Map[Long, Seq[(Long, Long)]] =
    spansOf(Dedup.substringDedupAnchored(df(rows), "doc_id", "text", minLen))
      .filter { case (id, _) => ids.contains(id) }

  test("incremental batch equals from-scratch anchored on corpus ∪ batch (batch ids)") {
    val shared = randText(80)
    val sharedB = randText(60)
    val corpus = Seq(
      (1L, randText(50) + shared + randText(40)),
      (2L, randText(120)),
      (3L, randText(30) + sharedB + randText(30)))
    // batch: a corpus repeat, an in-batch repeat pair, a clean doc
    val inBatch = randText(70)
    val batch = Seq(
      (10L, randText(20) + shared + randText(60)),       // vs corpus doc 1
      (11L, inBatch + randText(40)),                     // in-batch earliest
      (12L, randText(25) + inBatch + randText(10)),      // vs batch doc 11
      (13L, randText(15) + sharedB + randText(55)),      // vs corpus doc 3
      (14L, randText(90)))                               // clean
    val path = tmp()
    Dedup.buildSubstringIndex(df(corpus), "doc_id", "text", path)
    val got = spansOf(Dedup.incrementalSubstringDedup(
      spark, df(batch), "doc_id", "text", path, 40))
    val want = scratch(corpus ++ batch, batch.map(_._1).toSet)
    assert(got == want)
    assert(got.contains(10L) && got.contains(12L) && got.contains(13L))
    assert(!got.contains(11L) && !got.contains(14L)) // earliest / clean keep
  }

  test("interleaved ids: classify equality holds when batch ids sit below corpus ids") {
    // the driver entry's DeltaMod slice interleaves batch and corpus ids;
    // pairing still requires id > earliest id, exactly like from-scratch
    val shared = randText(70)
    val corpus = Seq(
      (2L, randText(10) + shared + randText(30)), // EARLIER id than batch doc 3
      (5L, randText(100)))
    val batch = Seq(
      (3L, shared + randText(50)),                 // later than corpus doc 2: trims
      (1L, randText(20) + shared + randText(5)))   // EARLIEST id of all: keeps
    val path = tmp()
    Dedup.buildSubstringIndex(df(corpus), "doc_id", "text", path)
    val got = spansOf(Dedup.incrementalSubstringDedup(
      spark, df(batch), "doc_id", "text", path, 40))
    assert(got == scratch(corpus ++ batch, batch.map(_._1).toSet))
    assert(got.contains(3L) && !got.contains(1L))
  }

  test("append admits a batch; the next batch pairs against it without rebuild") {
    val crossBatch = randText(90)
    val fromCorpus = randText(65)
    val corpus = Seq((1L, randText(40) + fromCorpus + randText(20)), (2L, randText(80)))
    val b1 = Seq((10L, randText(30) + crossBatch + randText(15)), (11L, randText(60)))
    val b2 = Seq(
      (20L, randText(10) + crossBatch + randText(35)),  // vs APPENDED b1 doc 10
      (21L, fromCorpus + randText(45)),                 // vs original corpus doc 1
      (22L, randText(75)))
    val path = tmp()
    Dedup.buildSubstringIndex(df(corpus), "doc_id", "text", path)
    Dedup.appendToSubstringIndex(spark, df(b1), "doc_id", "text", path)
    val got = spansOf(Dedup.incrementalSubstringDedup(
      spark, df(b2), "doc_id", "text", path, 40))
    assert(got == scratch(corpus ++ b1 ++ b2, b2.map(_._1).toSet))
    assert(got.contains(20L) && got.contains(21L) && !got.contains(22L))
  }

  test("append admits TRIMMED docs too: their unique text still anchors future repeats") {
    val dup = randText(75)
    val unique = randText(85)
    val corpus = Seq((1L, randText(20) + dup + randText(20)))
    // b1 doc is itself trimmed (repeats `dup`) but carries `unique`
    val b1 = Seq((10L, dup + unique))
    val b2 = Seq((20L, randText(12) + unique + randText(12)))
    val path = tmp()
    Dedup.buildSubstringIndex(df(corpus), "doc_id", "text", path)
    Dedup.appendToSubstringIndex(spark, df(b1), "doc_id", "text", path)
    val got = spansOf(Dedup.incrementalSubstringDedup(
      spark, df(b2), "doc_id", "text", path, 40))
    assert(got == scratch(corpus ++ b1 ++ b2, Set(20L)))
    assert(got(20L).nonEmpty) // the repeat of b1's surviving text is found
  }

  test("compact preserves classification and re-mins anchor owners") {
    val shared = randText(60)
    val corpus = Seq((1L, randText(25) + shared + randText(25)), (2L, randText(70)))
    val b1 = Seq((10L, randText(55)), (11L, randText(18) + shared))
    val b2 = Seq((20L, shared + randText(30)), (21L, randText(66)))
    val path = tmp(); val dest = tmp()
    Dedup.buildSubstringIndex(df(corpus), "doc_id", "text", path)
    Dedup.appendToSubstringIndex(spark, df(b1), "doc_id", "text", path)
    Dedup.compactSubstringIndex(spark, path, dest)
    val viaCompact = spansOf(Dedup.incrementalSubstringDedup(
      spark, df(b2), "doc_id", "text", dest, 40))
    val viaAppend = spansOf(Dedup.incrementalSubstringDedup(
      spark, df(b2), "doc_id", "text", path, 40))
    assert(viaCompact == viaAppend)
    assert(viaCompact == scratch(corpus ++ b1 ++ b2, b2.map(_._1).toSet))
    // compacted anchors hold ONE row per hash
    val a = spark.read.parquet(s"$dest/anchors")
    assert(a.groupBy("h").count().filter(col("count") > 1).count() == 0)
  }

  test("randomized: incremental == from-scratch over fuzzed corpora and batches") {
    (0 until 5).foreach { trial =>
      val base = randText(400)
      def doc(): String = {
        val n = rng.nextInt(3)
        val chunks = (0 until n).map { _ =>
          val s = rng.nextInt(300); base.substring(s, s + 60 + rng.nextInt(40))
        }
        (chunks :+ randText(40 + rng.nextInt(80))).mkString(randText(1 + rng.nextInt(4)))
      }
      val all = (1L to 14L).map(id => (id, doc()))
      val (corpus, batch) = all.partition(_._1 % 3 != 0) // interleaved slice
      val path = tmp()
      Dedup.buildSubstringIndex(df(corpus), "doc_id", "text", path)
      val got = spansOf(Dedup.incrementalSubstringDedup(
        spark, df(batch), "doc_id", "text", path, 40))
      assert(got == scratch(all, batch.map(_._1).toSet), s"trial $trial")
    }
  }
}
