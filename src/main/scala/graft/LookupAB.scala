package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the ASYMMETRIC query-vs-corpus Hamming lookup
  * (Multimodal.hammingLookupSketch) at radius 18 over the REAL rep set
  * of a docs corpus, every 10th rep as the query batch: probe-0 (110
  * tables — the corpus pays 110 rows/hash), probe-1, probe-2 (6 tables
  * — 18× less corpus emission, the 56-variant ball rides only the
  * |Q| = n/10 side). This is the shape SketchAB's SELF-join verdict
  * does NOT transfer to: there both sides were n and the variant
  * inflation hit the quadratic bucket join; here the big side is
  * variant-free by construction. Match counts print so the A/B also
  * certifies the three configs agree (recall differences would show as
  * count drift far beyond the ~0.95 gate).
  *
  * WIDE mode (round 17, §8 item 2): `runMain graft.LookupAB - wide
  * [n] [q]` A/Bs KEY WIDTH at a synthetic multi-million-hash corpus —
  * bits 10 vs 14 vs 16, each at its own probe-2 / 0.95-recall table
  * count (6 / 17 / 30). The 10-bit key saturates at 1024 buckets, so
  * at n = 4M each query variant probes ~3.9k random corpus rows
  * (1.31M candidates/query at t = 6); bits = 16 cuts the per-bucket
  * population 64× for 5× more tables and a 2.4× bigger ball — ~5.2×
  * fewer candidates/query, paid for by 5× more index rows/bytes.
  * Corpus hashes are uniform xxhash64; queries are sampled corpus
  * hashes with id-deterministic bit flips (k = id %% 24, so ~3/4 of
  * queries sit within radius 18 and the match counts discriminate).
  * Usage: runMain graft.LookupAB <sfDir> [wide [n] [q]] */
object LookupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sed.SedQueries.ensureConfs(spark)
    import graft.operators.Multimodal
    if (args.lift(1).contains("wide")) { wideMode(spark, args); return }
    val docs = graft.sed.Tables.documents(spark, sfDir)
    val reps = Multimodal.imageHashes(
        Multimodal.withPgmPayload(docs, "text", "payload"), "doc_id", "payload")
      .filter(col("is_image"))
      .groupBy("phash").agg(min("doc_id").as("doc_id"))
      .localCheckpoint(true)
    val qs = reps.filter(col("doc_id") % 10 === 0).localCheckpoint(true)
    println(s"reps ${reps.count()} queries ${qs.count()}")
    def t(name: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val e = f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s matches=$e")
      }
    }
    val t2 = Multimodal.sketchTablesForMultiprobe(18, 10, 0.95, 2)
    val t1 = Multimodal.sketchTablesForMultiprobe(18, 10, 0.95, 1)
    println(s"tables: probe0=110 probe1=$t1 probe2=$t2")
    t("probe0_t110")(Multimodal.hammingLookupSketch(reps, qs, "doc_id", "phash",
      18, 10, 110, probe = 0).queryExecution.toRdd.count())
    t(s"probe1_t$t1")(Multimodal.hammingLookupSketch(reps, qs, "doc_id", "phash",
      18, 10, t1, probe = 1).queryExecution.toRdd.count())
    t(s"probe2_t$t2")(Multimodal.hammingLookupSketch(reps, qs, "doc_id", "phash",
      18, 10, t2, probe = 2).queryExecution.toRdd.count())
    // PERSISTED-INDEX phase — the artifact this shape exists for at
    // 100 TB: build + bytes + indexed-query wall per config. probe-2
    // sizing writes/stores/scans tables-ratio (18×) less index.
    def du(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(hp).getLength
    }
    Seq((0, 110), (1, t1), (2, t2)).foreach { case (probe, tbl) =>
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-lkidx-p$probe").toString + "/idx"
      val b0 = System.nanoTime()
      Multimodal.buildHammingSketchIndex(reps, "doc_id", "phash", path,
        10, tbl, "sketch")
      val bs = (System.nanoTime() - b0) / 1e9
      println(f"index probe$probe t$tbl build $bs%.2f s bytes ${du(path)}")
      t(s"indexed_probe${probe}_t$tbl")(Multimodal.hammingLookupIndexed(
        spark, path, qs, "doc_id", "phash", 18, 10, tbl, probe = probe)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }

  /** Key-width A/B at a synthetic multi-million-hash corpus (see
    * scaladoc WIDE mode). */
  private def wideMode(spark: SparkSession, args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val n = args.lift(2).map(_.toLong).getOrElse(4000000L)
    val nq = args.lift(3).map(_.toInt).getOrElse(1000)
    val corpus = spark.range(n)
      .select(col("id"), expr("xxhash64(id)").as("ph"))
      .localCheckpoint(true)
    // queries: every (n/nq)th corpus hash with k = id % 24 deterministic
    // bit flips — ~3/4 land within radius 18 of their source
    val stride = math.max(1L, n / nq)
    val sampled = corpus.filter(col("id") % stride === 0)
      .select("id", "ph").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val queries = sampled.map { case (id, ph) =>
      val k = (id % 24).toInt
      val rnd = new scala.util.Random(id)
      val flips = rnd.shuffle((0 until 64).toList).take(k)
      (id, flips.foldLeft(ph)((h, p) => h ^ (1L << p)))
    }.toSeq
    import spark.implicits._
    val qs = queries.toDF("id", "ph").localCheckpoint(true)
    println(s"wide corpus n=$n queries=${qs.count()}")
    def t(name: String)(f: => Long): Unit =
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val e = f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s matches=$e")
      }
    def du(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(hp).getLength
    }
    Seq(10, 14, 16).foreach { bits =>
      val tbl = Multimodal.sketchTablesForMultiprobe(18, bits, 0.95, 2)
      println(s"bits=$bits tables=$tbl " +
        s"recall=${Multimodal.sketchRecallMultiprobe(18, bits, tbl, 2)}")
      t(s"inline_b${bits}_t$tbl")(Multimodal.hammingLookupSketch(
        corpus, qs, "id", "ph", 18, bits, tbl, probe = 2)
        .queryExecution.toRdd.count())
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-lkwide-b$bits").toString + "/idx"
      val b0 = System.nanoTime()
      Multimodal.buildHammingSketchIndex(corpus, "id", "ph", path,
        bits, tbl, "sketch")
      println(f"index b$bits t$tbl build ${(System.nanoTime() - b0) / 1e9}%.2f s " +
        s"bytes ${du(path)}")
      t(s"indexed_b${bits}_t$tbl")(Multimodal.hammingLookupIndexed(
        spark, path, qs, "id", "ph", 18, bits, tbl, probe = 2)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
