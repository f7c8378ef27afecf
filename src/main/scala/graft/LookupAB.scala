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
  * Usage: runMain graft.LookupAB <sfDir> */
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
}
