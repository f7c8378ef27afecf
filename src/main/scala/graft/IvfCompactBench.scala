package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Churn-vs-size receipt for the round-15 per-bucket IVF compaction
  * (graft.operators.Ann.compactIvfIndexPerBucket): builds an index of
  * `n` vectors over `k` buckets, appends batches that touch ONLY
  * `hot` buckets, then times a whole-index generation swap against the
  * per-bucket swap on identical layouts. The number that matters is the
  * ratio: the whole-index rewrite is O(index size) no matter how little
  * churned, the per-bucket swap is O(hot-bucket data + one metadata op
  * per quiet file). Both paths run through GenIndex.compact so the
  * receipt times the REAL production swap including sweep + commit.
  *
  * Usage: runMain graft.IvfCompactBench [n] [k] [hot] [appends] */
object IvfCompactBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val hot = args.lift(2).map(_.toInt).getOrElse(4)
    val appends = args.lift(3).map(_.toInt).getOrElse(6)
    val dim = k // axis c == bucket c, one-to-one — no centroid ties
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Ann, GenIndex}

    // deterministic synthetic corpus; centroid c points along axis c, a
    // vector's dominant hash-derived axis decides its bucket — so bucket
    // membership is controllable from the id alone
    def corpusFor(ids: org.apache.spark.sql.Dataset[java.lang.Long]) = ids.select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (when(i === pmod(xxhash64(col("id")), lit(k)).cast("int"), lit(10.0))
          .otherwise(lit(0.0)) +
          (pmod(xxhash64(col("id"), i), lit(1000L)) + lit(1L)).cast("double") / lit(1000.0))
          .cast("float")).as("embedding"))
    val centroids = Array.tabulate(k)(c =>
      (c, Array.tabulate(dim)(d => if (d == c) 1f else 0f)))

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def build(root: String): Unit = {
      Ann.buildIvfIndex(corpusFor(spark.range(n)), "vec_id", "embedding",
        root, centroids)
      // swap once up front: the build itself writes one file per bucket
      // PER TASK; the steady-state layout every later swap sees is one
      // file per bucket + whatever the feed appended since
      GenIndex.compact(spark, root)((src, dest) => {
        Ann.compactIvfIndexPerBucket(spark, Ann.loadIvfIndex(spark, src), dest)
        ()
      })
      // `appends` small batches landing ONLY in hot buckets: ids chosen
      // so xxhash64(id) % k < hot (rejection-filtered in-plan)
      (0 until appends).foreach { a =>
        val batch = corpusFor(
          spark.range(n + a * 100000L, n + (a + 1) * 100000L)
            .filter(pmod(xxhash64(col("id")), lit(k)) < hot))
        Ann.appendToIvfIndex(Ann.activeIvfIndex(spark, root), batch,
          "vec_id", "embedding")
      }
    }
    val rootFull = java.nio.file.Files.createTempDirectory("ivfb-full").toString
    val rootChurn = java.nio.file.Files.createTempDirectory("ivfb-churn").toString
    build(rootFull); build(rootChurn)
    var receipt = (-1, -1)
    val tFull = t {
      GenIndex.compact(spark, rootFull)((src, dest) => {
        Ann.compactIvfIndex(spark, Ann.loadIvfIndex(spark, src), dest); ()
      })
    }
    val tChurn = t {
      GenIndex.compact(spark, rootChurn)((src, dest) =>
        receipt = Ann.compactIvfIndexPerBucket(spark,
          Ann.loadIvfIndex(spark, src), dest, rewriteFilesOver = 4))
    }
    // equality receipt: both swapped indexes answer a probe identically
    val qs = Ann.collectQueries(
      corpusFor(spark.range(50)), "vec_id", "embedding")
    val a = Ann.searchIvfIndex(spark, Ann.activeIvfIndex(spark, rootFull), qs, 10)
      .collect().map(_.toString).sorted.toSeq
    val b = Ann.searchIvfIndex(spark, Ann.activeIvfIndex(spark, rootChurn), qs, 10)
      .collect().map(_.toString).sorted.toSeq
    require(a == b, "per-bucket swap changed search results")
    println(s"""{"metric":"ivf_compact","n":$n,"buckets":$k,"hot":$hot,""" +
      s""""appends":$appends,"full_swap_sec":${f"$tFull%.2f"},""" +
      s""""per_bucket_swap_sec":${f"$tChurn%.2f"},""" +
      s""""rewritten":${receipt._1},"linked":${receipt._2},""" +
      s""""search_equal":true}""")
    spark.stop()
  }
}
