package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B of the radius-18 sketch configs over the REAL rep set of
  * a docs corpus: probe-0 (110 tables) vs probe-2 (self-sized tables).
  * Usage: runMain graft.SketchAB <sfDir> */
object SketchAB {
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
      .groupBy("phash")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_exact"))
      .localCheckpoint(true)
    println(s"reps ${reps.count()}")
    def t(name: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val e = f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s edges=$e")
      }
    }
    val t2 = Multimodal.sketchTablesForMultiprobe(18, 10, 0.95, 2)
    val t1 = Multimodal.sketchTablesForMultiprobe(18, 10, 0.95, 1)
    println(s"tables: probe0=110 probe1=$t1 probe2=$t2")
    t("probe0_t110")(Multimodal.hammingEdgesSketch(reps, "doc_id", "phash", 18,
      10, 110).queryExecution.toRdd.count())
    t(s"probe1_t$t1")(Multimodal.hammingEdgesSketch(reps, "doc_id", "phash", 18,
      10, t1, probe = 1).queryExecution.toRdd.count())
    t(s"probe2_t$t2")(Multimodal.hammingEdgesSketch(reps, "doc_id", "phash", 18,
      10, t2, probe = 2).queryExecution.toRdd.count())
    spark.stop()
  }
}
