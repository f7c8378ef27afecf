package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Generation-maintained IVF index (round 14): appends land under the
  * ACTIVE generation, search results are bit-equal through generation
  * swaps, a crash at any point of a swap leaves the previous generation
  * active AND READABLE (the `ivfScan` bucket-glob must ignore a
  * half-written `gen-NNNNN/` sibling under the flat root — bare
  * whole-directory parquet discovery would refuse the mixed layout),
  * and an index with no data yet searches as empty instead of failing
  * schema inference. */
class IvfGenSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dim = 8

  // deterministic per (id, dim): the same id must embed identically no
  // matter which call materializes it (the from-scratch twin rebuilds)
  private def vecs(ids: Range): Seq[(Long, Array[Float])] =
    ids.map { i =>
      val base = i % 4
      (i.toLong, Array.tabulate(Dim)(d =>
        (if (d == base) 1f else 0f) + ((i * 31 + d * 7) % 97) / 2000f))
    }

  private def centroids: Array[(Int, Array[Float])] =
    Array.tabulate(4)(c => (c, Array.tabulate(Dim)(d => if (d == c) 1f else 0f)))

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ivfgen").toString

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(p: String): Boolean =
    fs(p).exists(new org.apache.hadoop.fs.Path(p))

  private def search(root: String, qs: Array[(Long, Array[Float])])
      : Set[(Long, Long, Long)] =
    Ann.searchIvfIndex(spark, Ann.activeIvfIndex(spark, root), qs, 3, nprobe = 4)
      .select(col("query_id"), col("vec_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet

  test("search is bit-equal through generation swaps; appends land in the active one") {
    val root = freshRoot()
    Ann.buildIvfIndex(vecs(0 until 40).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, centroids)
    val qs = vecs(200 until 203).toArray
    val pre = search(root, qs)

    GenIndex.compact(spark, root)((src, dest) =>
      Ann.compactIvfIndex(spark, Ann.loadIvfIndex(spark, src), dest))
    assert(GenIndex.active(spark, root) == s"$root/gen-00001")
    assert(search(root, qs) == pre)
    // flat payload (bucket dirs + sidecar) GC'd from the root
    assert(!exists(s"$root/_centroids.json"))
    assert(!fs(root).listStatus(new org.apache.hadoop.fs.Path(root))
      .exists(_.getPath.getName.startsWith("bucket=")))

    // append into the active generation, swap again: results equal an
    // index built from scratch over the full corpus
    Ann.appendToIvfIndex(Ann.activeIvfIndex(spark, root),
      vecs(40 until 80).toDF("vec_id", "embedding"), "vec_id", "embedding")
    GenIndex.compact(spark, root)((src, dest) =>
      Ann.compactIvfIndex(spark, Ann.loadIvfIndex(spark, src), dest))
    assert(GenIndex.active(spark, root) == s"$root/gen-00002")
    assert(!exists(s"$root/gen-00001"))
    val scratch = freshRoot()
    Ann.buildIvfIndex(vecs(0 until 80).toDF("vec_id", "embedding"),
      "vec_id", "embedding", scratch, centroids)
    assert(search(root, qs) == search(scratch, qs))
    // exactly one file per bucket after the swap (the compaction receipt)
    val files = fs(root).listStatus(
        new org.apache.hadoop.fs.Path(s"$root/gen-00002"))
      .filter(_.getPath.getName.startsWith("bucket="))
      .map(st => fs(root).listStatus(st.getPath)
        .count(_.getPath.getName.endsWith(".parquet")))
    assert(files.nonEmpty && files.forall(_ == 1), files.toSeq.toString)
  }

  test("per-bucket compaction: quiet buckets move by link (same files), busy ones rewrite to one file, search is bit-equal") {
    val root = freshRoot()
    // base vectors (ids 0..39 spread over all 4 buckets, one partition →
    // one base file per bucket), then three appends that touch ONLY
    // bucket 0 (base == 0 for multiples of 4)
    Ann.buildIvfIndex(
      vecs(0 until 40).toDF("vec_id", "embedding").repartition(1),
      "vec_id", "embedding", root, centroids)
    (0 until 3).foreach { r =>
      Ann.appendToIvfIndex(Ann.loadIvfIndex(spark, root),
        vecs((100 + 4 * r) until (101 + 4 * r)) // one id, base 0
          .toDF("vec_id", "embedding"), "vec_id", "embedding")
    }
    val f = fs(root)
    def partFiles(dir: String): Map[String, Set[String]] =
      f.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.getPath.getName.startsWith("bucket="))
        .map(st => st.getPath.getName ->
          f.listStatus(st.getPath).map(_.getPath.getName)
            .filter(_.endsWith(".parquet")).toSet)
        .toMap
    val before = partFiles(root)
    assert(before("bucket=0").size == 4, before.toString) // base + 3 appends
    assert((1 to 3).forall(b => before(s"bucket=$b").size == 1))

    val qs = vecs(200 until 203).toArray
    val pre = search(root, qs)
    var receipt = (-1, -1)
    GenIndex.compact(spark, root) { (src, dest) =>
      receipt = Ann.compactIvfIndexPerBucket(spark,
        Ann.loadIvfIndex(spark, src), dest, rewriteFilesOver = 2)
    }
    assert(receipt == ((1, 3)), receipt.toString) // bucket 0 rewrites, 1..3 link
    val active = GenIndex.active(spark, root)
    assert(active == s"$root/gen-00001")
    val after = partFiles(active)
    // quiet buckets keep their EXACT file names (link, not rewrite);
    // the busy bucket compacts to one freshly-named file
    (1 to 3).foreach(b => assert(after(s"bucket=$b") == before(s"bucket=$b")))
    assert(after("bucket=0").size == 1 &&
      !before("bucket=0").contains(after("bucket=0").head))
    // content is untouched: search bit-equal through the swap, and
    // equal to a from-scratch build over the same corpus
    assert(search(root, qs) == pre)
    val scratch = freshRoot()
    Ann.buildIvfIndex(
      (vecs(0 until 40) ++ Seq(100, 104, 108).flatMap(i => vecs(i to i)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", scratch, centroids)
    assert(search(root, qs) == search(scratch, qs))
  }

  test("per-bucket compaction refuses a self-targeted or dirty destination (fresh-dest contract)") {
    val root = freshRoot()
    Ann.buildIvfIndex(vecs(0 until 40).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, centroids)
    val idx = Ann.loadIvfIndex(spark, root)
    // destPath == index.path: append into the read path would duplicate
    // or destroy the index — must refuse before touching anything
    val self = intercept[IllegalArgumentException] {
      Ann.compactIvfIndexPerBucket(spark, idx, root)
    }
    assert(self.getMessage.contains("destPath must differ"))
    // a destination that already holds bucket dirs: the append + link
    // passes would silently double rows — must refuse
    val dirty = freshRoot()
    Ann.buildIvfIndex(vecs(50 until 60).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dirty, centroids)
    val pre = intercept[IllegalArgumentException] {
      Ann.compactIvfIndexPerBucket(spark, idx, dirty)
    }
    assert(pre.getMessage.contains("fresh"))
    // and the refusals left both indexes untouched
    val qs = vecs(200 until 203).toArray
    assert(search(root, qs).nonEmpty)
  }

  test("a half-written generation under the flat root neither breaks reads nor survives the sweep") {
    val root = freshRoot()
    Ann.buildIvfIndex(vecs(0 until 40).toDF("vec_id", "embedding"),
      "vec_id", "embedding", root, centroids)
    val qs = vecs(200 until 203).toArray
    val pre = search(root, qs)
    // simulated crash mid-copy: tables written, NO commit marker
    Ann.compactIvfIndex(spark, Ann.loadIvfIndex(spark, root), s"$root/gen-00001")
    assert(GenIndex.active(spark, root) == root)
    // the flat root stays readable despite the mixed layout underneath
    assert(search(root, qs) == pre)
    // the next compaction sweeps the stale attempt and swaps cleanly
    GenIndex.compact(spark, root)((src, dest) =>
      Ann.compactIvfIndex(spark, Ann.loadIvfIndex(spark, src), dest))
    assert(GenIndex.active(spark, root) == s"$root/gen-00001")
    assert(search(root, qs) == pre)
  }

  test("an index with a sidecar but no data searches as empty") {
    val root = freshRoot()
    Ann.buildIvfIndex(vecs(0 until 40).toDF("vec_id", "embedding").limit(0),
      "vec_id", "embedding", root, centroids)
    assert(search(root, vecs(200 until 202).toArray).isEmpty)
  }
}
