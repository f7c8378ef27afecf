package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Operational stress for substring dedup AT INGEST
  * (SedStreaming.streamingSubstringDedup) on a MakeBig corpus: the whole
  * documents table replayed as an ascending-id file feed, one chunk per
  * micro-batch, each probing + founding/extending the persisted anchor
  * index. Reports per-batch trigger times (the recurring ingestion cost —
  * it must stay ~flat as the index grows, because a batch's cost is
  * O(|batch| + matched), never O(corpus)), total wall time, span count,
  * and final index size. */
object StreamSubstrStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val chunks = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val feed = java.nio.file.Files.createTempDirectory("graft_sss_feed").toString
    graft.streaming.SedStreaming.stageFileStream(docs, "doc_id", feed, chunks)
    val idx = java.nio.file.Files.createTempDirectory("graft_sss_idx").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sss_out").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // contract-configuration parity (round 16): the driver entries run
    // on RocksDB state with changelog checkpointing
    // (StreamingQueries.streamSession), so this receipt must too
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING")
    val t0 = System.nanoTime()
    val q = graft.streaming.SedStreaming.streamingSubstringDedup(
      graft.streaming.SedStreaming.fileStream(s2, feed, schema),
      "doc_id", "text", idx, out,
      java.nio.file.Files.createTempDirectory("graft_sss_ck").toString, 40)
    try q.processAllAvailable() finally q.stop()
    val total = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      println(f"BATCH ${p.batchId} ${p.durationMs.get("triggerExecution") / 1000.0}%.1f s " +
        f"rows=${p.numInputRows}")
    }
    val spans = spark.read.parquet(out)
    println(f"TOTAL $total%.1f s spans=${spans.count()} docs_trimmed=" +
      spans.select("doc_id").distinct().count())
    val anchors = spark.read.parquet(s"$idx/anchors")
    println(s"INDEX anchors=${anchors.count()}")
    spark.stop()
  }
}
