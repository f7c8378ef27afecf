package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Generation-maintained EXACT-DEDUP index ingest (round 14 —
  * Dedup.dedupIndexIngest): the classify-and-admit loop must produce the
  * SAME per-batch classifications whether or not in-loop generation-swap
  * compaction runs between batches; the `_ingest_max` guard must admit
  * exact replays but reject same-min-different-content batches (the
  * replay-admission hole the round-13 advice named); and a first-swap
  * crash between the commit marker and GC must not strand the flat
  * root's table payload forever (the sweep hole the round-13 advice
  * named). */
class DedupIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1401)
  private def words(n: Int): String =
    (0 until n).map(_ => s"w${rng.nextInt(200)}").mkString(" ")

  /** Corpus with exact copies and near-dups spread across batches. */
  private def corpus(): Seq[(Long, String)] = {
    var id = 0L
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until 30).foreach { _ =>
      val base = words(20)
      id += 1; out += ((id, base))
      if (rng.nextInt(3) == 0) { id += 1; out += ((id, base)) } // exact copy
      if (rng.nextInt(3) == 0) { id += 1; out += ((id, base + " w999")) } // near-dup
    }
    out.toSeq
  }

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-dedupingest").toString

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(p: String): Boolean =
    fs(p).exists(new org.apache.hadoop.fs.Path(p))

  private def classify(root: String, b: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, Long, Long)] =
    Dedup.incrementalDedup(spark, b, "doc_id", "text",
        GenIndex.active(spark, root), 12, 3, 3, 0.8)
      .as[(Long, String, Long, Long)].collect().toSet

  test("ingest loop classifications are invariant to in-loop generation swaps") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val n = all.length
    val cuts = Seq(n / 4, n / 2, 3 * n / 4).map(i => all(i)._1)
    val batches = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1) && col("doc_id") <= cuts(2)),
      docs.filter(col("doc_id") > cuts(2)))
    val managed = freshRoot()   // compacts every 2 batches
    val plain = freshRoot()     // never compacts
    batches.zipWithIndex.foreach { case (b, i) =>
      val got = Dedup.dedupIndexIngest(spark, b, "doc_id", "text", managed,
        batchId = i, compactEvery = 2)
        .as[(Long, String, Long, Long)].collect().toSet
      val want = Dedup.dedupIndexIngest(spark, b, "doc_id", "text", plain,
        batchId = i, compactEvery = 0)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got == want, s"batch $i classification drifted under compaction")
    }
    // two swaps ran (after batches 2 and 4); exactly one committed
    // generation survives and the flat payload is gone
    assert(GenIndex.active(spark, managed) == s"$managed/gen-00002")
    assert(!exists(s"$managed/gen-00001"))
    assert(!exists(s"$managed/hashes"))
    // bounded-file-count receipt: the compacted generation holds strictly
    // fewer parquet files than the append-accumulated uncompacted twin
    def parquetFiles(root: String): Int =
      GenIndex.DedupTables.map { t =>
        val d = new org.apache.hadoop.fs.Path(s"${GenIndex.active(spark, root)}/$t")
        if (!fs(root).exists(d)) 0
        else fs(root).listStatus(d).count(_.getPath.getName.endsWith(".parquet"))
      }.sum
    assert(parquetFiles(managed) < parquetFiles(plain),
      s"compacted=${parquetFiles(managed)} uncompacted=${parquetFiles(plain)}")
    // a later probe batch classifies identically against both indexes
    val probe = Seq((100000L, all.head._2), (100001L, words(20)))
      .toDF("doc_id", "text")
    assert(classify(managed, probe) == classify(plain, probe))
  }

  test("exact replay of the last batch is admitted; same-min-different-content is rejected") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val root = freshRoot()
    val cut = all(all.length / 2)._1
    val b1 = docs.filter(col("doc_id") <= cut)
    val b2 = docs.filter(col("doc_id") > cut)
    Dedup.dedupIndexIngest(spark, b1, "doc_id", "text", root, 0).count()
    Dedup.dedupIndexIngest(spark, b2, "doc_id", "text", root, 1).count()
    val preProbe = classify(root, b1.limit(5))

    // exact replay of b2: admitted; every formerly-new/dup_delta doc now
    // resolves dup_corpus against its own admitted keeper (near_corpus
    // docs were never admitted and re-classify near_corpus), and the
    // index content is unchanged
    val replay = Dedup.dedupIndexIngest(spark, b2, "doc_id", "text", root, 1)
    assert(replay.filter(col("status").isin("new", "dup_delta")).count() == 0)
    assert(classify(root, b1.limit(5)) == preProbe)

    // same min id as b2, different max/count: NOT a replay — rejected
    val forged = b2.orderBy("doc_id").limit(1).unionByName(
      Seq((all.last._1 + 50L, "forged tail doc")).toDF("doc_id", "text"))
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupIndexIngest(spark, forged, "doc_id", "text", root, 2).count()
    }
    assert(ex.getMessage.contains("monotone-id ingestion contract"))
  }

  test("first-swap crash between marker and GC cannot strand the flat root payload") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val root = freshRoot()
    Dedup.dedupIndexIngest(spark, docs, "doc_id", "text", root, 0).count()
    val pre = classify(root, docs.limit(8))
    // simulated crash: gen-1 fully written AND committed, but the flat
    // root's tables were never GC'd
    Dedup.compactDedupIndex(spark, root, s"$root/gen-00001")
    fs(root).create(new org.apache.hadoop.fs.Path(
      s"$root/gen-00001/_COMMITTED"), true).close()
    assert(exists(s"$root/hashes")) // the stranded payload
    assert(GenIndex.active(spark, root) == s"$root/gen-00001")
    assert(classify(root, docs.limit(8)) == pre)
    // the NEXT compaction's sweep reclaims it (the round-13 advice hole)
    GenIndex.compact(spark, root)((s, d) => Dedup.compactDedupIndex(spark, s, d))
    assert(GenIndex.active(spark, root) == s"$root/gen-00002")
    assert(!exists(s"$root/hashes"))
    assert(!exists(s"$root/gen-00001"))
    assert(classify(root, docs.limit(8)) == pre)
  }
}
