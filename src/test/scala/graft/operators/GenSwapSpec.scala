package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Crash-safe generation-swap compaction (GenIndex): the split index's
  * final assignment must be bit-equal through every generation, a crash
  * at ANY point of the swap must leave the previous generation active,
  * and superseded generations must actually get swept (the bounded-
  * file-count story of in-loop maintenance). */
class GenSwapSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1301)
  private def words(n: Int): String =
    (0 until n).map(_ => s"g${rng.nextInt(300)}").mkString(" ")

  private def corpus(): Seq[(Long, String)] = {
    var id = 0L
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until 24).foreach { _ =>
      val base = words(25)
      id += 1; out += ((id, base))
      if (rng.nextBoolean()) { id += 1; out += ((id, base + " g998")) }
    }
    out.toSeq
  }

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-genidx-spec").toString

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def assignMap(root: String, docs: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, String)] =
    Dedup.splitIndexAssignment(spark, docs, "doc_id", "text", "gs",
        GenIndex.active(spark, root))
      .select("doc_id", "cluster_label", "split").as[(Long, Long, String)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("assignment is bit-equal through generations; ingest continues into the active one") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val root = freshRoot()
    val cut1 = all(all.length / 3)._1
    val cut2 = all(2 * all.length / 3)._1
    val b1 = docs.filter(col("doc_id") <= cut1)
    val b2 = docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
    val b3 = docs.filter(col("doc_id") > cut2)

    assert(GenIndex.active(spark, root) == root) // flat before any swap
    Dedup.splitIndexIngest(spark, b1, "doc_id", "text", "gs", root).count()
    val pre = assignMap(root, b1)
    GenIndex.compact(spark, root)(
      (s, d) => Dedup.compactSplitIndex(spark, s, d))
    val g1 = GenIndex.active(spark, root)
    assert(g1 == s"$root/gen-00001")
    assert(assignMap(root, b1) == pre)
    // flat tables GC'd from the root after the swap
    assert(!fs(root).exists(new org.apache.hadoop.fs.Path(s"$root/hashes")))

    // keep ingesting into the ACTIVE generation, swap again
    Dedup.splitIndexIngest(spark, b2, "doc_id", "text", "gs", g1).count()
    GenIndex.compact(spark, root)(
      (s, d) => Dedup.compactSplitIndex(spark, s, d))
    val g2 = GenIndex.active(spark, root)
    assert(g2 == s"$root/gen-00002")
    assert(!fs(root).exists(new org.apache.hadoop.fs.Path(g1))) // swept
    Dedup.splitIndexIngest(spark, b3, "doc_id", "text", "gs", g2).count()

    val want = Dedup.leakageSafeSplit(docs, "doc_id", "text", "gs")
      .select("doc_id", "cluster_label", "split").as[(Long, Long, String)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(assignMap(root, docs) == want)
    // the monotone guard survives the swaps (marker carried per gen)
    val ex = intercept[IllegalArgumentException] {
      Dedup.splitIndexIngest(spark, b1, "doc_id", "text", "gs", g2).count()
    }
    assert(ex.getMessage.contains("monotone-id ingestion contract"))
  }

  test("a crash before the commit marker leaves the previous generation active") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val root = freshRoot()
    Dedup.splitIndexIngest(spark, docs, "doc_id", "text", "gs", root).count()
    val pre = assignMap(root, docs)

    // simulated crash: the table rewrites complete but the _COMMITTED
    // marker is never created
    Dedup.compactSplitIndex(spark, root, s"$root/gen-00001")
    assert(GenIndex.active(spark, root) == root)
    assert(assignMap(root, docs) == pre)

    // the next (successful) compaction sweeps the stale attempt and swaps
    GenIndex.compact(spark, root)(
      (s, d) => Dedup.compactSplitIndex(spark, s, d))
    assert(GenIndex.active(spark, root) == s"$root/gen-00001")
    assert(assignMap(root, docs) == pre)
  }

  test("a crash between marker and GC resolves to the newer generation; sweep finishes later") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val root = freshRoot()
    Dedup.splitIndexIngest(spark, docs, "doc_id", "text", "gs", root).count()
    val pre = assignMap(root, docs)
    GenIndex.compact(spark, root)(
      (s, d) => Dedup.compactSplitIndex(spark, s, d))
    // simulated crash AFTER gen-2's marker, BEFORE gen-1 is GC'd: both
    // generations committed on disk
    Dedup.compactSplitIndex(spark, s"$root/gen-00001", s"$root/gen-00002")
    fs(root).create(new org.apache.hadoop.fs.Path(
      s"$root/gen-00002/_COMMITTED"), true).close()
    assert(GenIndex.active(spark, root) == s"$root/gen-00002")
    assert(assignMap(root, docs) == pre)
    // the next compaction's sweep removes the superseded generation
    GenIndex.compact(spark, root)(
      (s, d) => Dedup.compactSplitIndex(spark, s, d))
    assert(GenIndex.active(spark, root) == s"$root/gen-00003")
    assert(!fs(root).exists(new org.apache.hadoop.fs.Path(s"$root/gen-00001")))
    assert(!fs(root).exists(new org.apache.hadoop.fs.Path(s"$root/gen-00002")))
    assert(assignMap(root, docs) == pre)
  }
}
