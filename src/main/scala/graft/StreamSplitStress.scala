package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Operational stress for leakage-safe splitting AT INGEST
  * (SedStreaming.streamingLeakageSplit) on a MakeBig corpus (duplicate-
  * saturated — the near-dup-heavy shape that actually exercises cluster
  * growth and merges): the whole documents table replayed as an
  * ascending-id file feed, one chunk per micro-batch, each clustering
  * against and then extending the persisted split index. Reports
  * per-batch trigger times (must stay ~flat as the index grows —
  * per-batch cost is O(|batch| + matched), never O(corpus)), total wall
  * time, split distribution, and index sizes. */
object StreamSplitStress {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val chunks = args.lift(1).map(_.toInt).getOrElse(10)
    // "merges" mode: a synthetic MERGE-HEAVY feed — cluster seed PAIRS
    // (J < 0.8 apart) land in the early batches, their bridges (J >= 0.8
    // to both) in the late ones, so every bridge batch forces thousands
    // of cross-batch cluster merges: the label-history growth worst case
    // (every merge appends correction rows for the losing cluster).
    val mergeHeavy = args.lift(2).contains("merges")
    // in-loop generation-swap compaction cadence (round 13): 0 = off
    val compactEvery = args.lift(3).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (mergeHeavy) {
        val n = 30000L // 10k clusters x (2 seeds + 1 late bridge)
        // ids 0..2n/3-1: seeds a/b of cluster (id % (2n/3) / 2);
        // ids >= 2n/3: bridge of cluster (id - 2n/3)
        spark.range(n).selectExpr("id AS doc_id",
          s"""CASE
             WHEN id < ${2 * n / 3} THEN
               concat_ws(' ',
                 transform(sequence(0, 31), i -> concat('c', CAST(id DIV 2 AS STRING), '_', i)),
                 transform(sequence(0, 4),  i -> concat(CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END,
                   CAST(id DIV 2 AS STRING), '_', i)))
             ELSE concat_ws(' ',
               transform(sequence(0, 31), i -> concat('c', CAST(id - ${2 * n / 3} AS STRING), '_', i)))
             END AS text""")
      } else spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val feed = java.nio.file.Files.createTempDirectory("graft_spl_feed").toString
    graft.streaming.SedStreaming.stageFileStream(docs, "doc_id", feed, chunks)
    val idx = java.nio.file.Files.createTempDirectory("graft_spl_idx").toString
    val out = java.nio.file.Files.createTempDirectory("graft_spl_out").toString
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
    val q = graft.streaming.SedStreaming.streamingLeakageSplit(
      graft.streaming.SedStreaming.fileStream(s2, feed, schema),
      "doc_id", "text", "graft-split", idx, out,
      java.nio.file.Files.createTempDirectory("graft_spl_ck").toString,
      compactEvery = compactEvery)
    try q.processAllAvailable() finally q.stop()
    val total = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      println(f"BATCH ${p.batchId} ${p.durationMs.get("triggerExecution") / 1000.0}%.1f s " +
        f"rows=${p.numInputRows}")
    }
    val active = graft.operators.GenIndex.active(spark, idx)
    val assigned = spark.read.parquet(out)
    println(f"TOTAL $total%.1f s assigned=${assigned.count()}")
    assigned.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(s"SPLIT ${r.getString(0)} ${r.getLong(1)}"))
    println(s"INDEX active=$active " +
      s"reps=${spark.read.parquet(s"$active/hashes").count()} " +
      s"labelRows=${spark.read.parquet(s"$active/clusters").count()}")
    if (compactEvery > 0) {
      // the bounded-maintenance receipt: parquet file counts of the
      // ACTIVE generation's tables (without in-loop compaction the
      // append-only tables accumulate one file set per batch), plus the
      // generation dirs still on disk (sweep must leave ~one)
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.operators.GenIndex.SplitTables.foreach { t =>
        val p = new org.apache.hadoop.fs.Path(s"$active/$t")
        val n = if (fs.exists(p))
          fs.listStatus(p).count(_.getPath.getName.startsWith("part-")) else 0
        println(s"FILES $t $n")
      }
      val gens = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
        .map(_.getPath.getName).filter(_.startsWith("gen-")).sorted
      println(s"GENERATIONS ${gens.mkString(",")}")
    }
    // maintenance-cadence compaction: label history collapses to one row
    // per rep and the final assignment must be IDENTICAL through it
    val before = graft.operators.Dedup.splitIndexAssignment(
        spark, docs, "doc_id", "text", "graft-split", active)
      .groupBy("split").count().orderBy("split").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val dest = java.nio.file.Files.createTempDirectory("graft_spl_cidx").toString
    val t1 = System.nanoTime()
    graft.operators.Dedup.compactSplitIndex(spark, active, dest)
    println(f"COMPACT ${(System.nanoTime() - t1) / 1e9}%.1f s " +
      s"labelRows=${spark.read.parquet(s"$dest/clusters").count()}")
    val after = graft.operators.Dedup.splitIndexAssignment(
        spark, docs, "doc_id", "text", "graft-split", dest)
      .groupBy("split").count().orderBy("split").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    println(s"COMPACT_INVARIANT ${before == after} $before")
    if (mergeHeavy) {
      // modest corpus: the from-scratch operator is feasible, so the
      // in-loop-compaction run certifies bit-equality against it
      val want = graft.operators.Dedup.leakageSafeSplit(
        docs, "doc_id", "text", "graft-split")
      val got = graft.operators.Dedup.splitIndexAssignment(
        spark, docs, "doc_id", "text", "graft-split", active)
      val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
      println(s"EQUAL_FROM_SCRATCH ${diff == 0}")
    }
    spark.stop()
  }
}
