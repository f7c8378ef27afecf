package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.SedStreaming

/** Scale-stress twin of q_stream_enrich with a FILE sink: the identical
  * stream-stream enrichment chain reads file-source feeds and writes
  * parquet, so the (quadratic-in-density) output stays distributed
  * instead of accumulating in a driver-side memory sink. Exists because
  * the 100× stress proved the MEMORY-SINK harness is the bound — the
  * join state itself is watermark-evicted and partition-count-
  * insensitive — and a real deployment sinks to files/Kafka anyway.
  * Args: <sfDir> [chunks] [provider: rocksdb|hdfs]. Prints one line:
  * rows + wall seconds + peak state + peak JVM heap (the
  * before/after receipt for the round-15 RocksDB state-store move —
  * with `rocksdb` the join state lives on local disk with a bounded
  * block cache instead of executor heap).
  */
object EnrichFileStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val provider = args.lift(2).getOrElse("rocksdb")
    // state partitions — the contract entry runs StatePartitions/2 = 4;
    // the stress default stays 32 (the r15 receipt's config)
    val partitions = args.lift(3).map(_.toInt).getOrElse(32)
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb") {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      builder.config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      ()
    }
    // A/B extra confs: SPARK_GRAFT_STRESS_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_STRESS_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sed.SedQueries.ensureConfs(spark)

    val work = java.nio.file.Files.createTempDirectory("enrich_stress").toString
    val base = graft.sed.Tables.events(spark, sfDir)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id", "ts_us",
        "CAST(value AS DOUBLE) AS v")
    SedStreaming.stageFileStream(base, "ts_us", s"$work/events", chunks)
    SedStreaming.stageFileStream(
      base.filter(col("event_id") % 100 === 0).toDF("sensor_id", "sts_us", "reading"),
      "sts_us", s"$work/sensors", chunks)

    // reset heap-pool peak counters AFTER staging so the peak measures
    // the streaming phase only; the collector tracks pool peaks for free
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    heapPools.foreach(_.resetPeakUsage())

    // WHERE the state time goes (VERDICT r16 task 1: probe CPU vs
    // commit): accumulate state-operator timings + provider custom
    // metrics via a LISTENER — q.recentProgress retains only the last
    // ~spark.sql.streaming.numRecentProgressUpdates (~100) reports, so
    // a >=100-micro-batch profile summed post-hoc silently undercounts
    // the early batches (ADVICE r16). Events arrive on the listener bus
    // after the batch completes; quiescence is awaited before printing.
    var updMs, rmMs, commitMs = 0L
    val custom = scala.collection.mutable.Map.empty[String, Long]
    val lastBatchSeen = new java.util.concurrent.atomic.AtomicLong(-1L)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val pr = e.progress
        custom.synchronized {
          pr.stateOperators.foreach { so =>
            updMs += so.allUpdatesTimeMs
            rmMs += so.allRemovalsTimeMs
            commitMs += so.commitTimeMs
            so.customMetrics.asScala.foreach { case (k, v) =>
              custom(k) = custom.getOrElse(k, 0L) + v.longValue()
            }
          }
        }
        lastBatchSeen.updateAndGet(b => math.max(b, pr.batchId))
        ()
      }
    }
    spark.streams.addListener(listener)

    val t0 = System.nanoTime()
    val evSrc = SedStreaming.fileStream(spark, s"$work/events", StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("v", DoubleType))))
      .withColumn("ets", expr("timestamp_micros(ts_us)"))
      .select("event_id", "ets")
    val snSrc = SedStreaming.fileStream(spark, s"$work/sensors", StructType(Seq(
      StructField("sensor_id", LongType), StructField("sts_us", LongType),
      StructField("reading", DoubleType))))
      .withColumn("sts", expr("timestamp_micros(sts_us)"))
      .select("sensor_id", "sts", "reading")
    val joined = SedStreaming.enrichWithSensor(evSrc, snSrc,
      "ets", "sts", "30 minutes", 600)
    val q = joined.writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .start()
    // track PEAK join state across micro-batches — the number that must
    // stay bounded (watermark-evicted) while the OUTPUT grows quadratic
    var peakStateRows = 0L
    var peakStateBytes = 0L
    val poll = new Thread(() => {
      while (q.isActive) {
        Option(q.lastProgress).foreach { pr =>
          pr.stateOperators.foreach { so =>
            peakStateRows = math.max(peakStateRows, so.numRowsTotal)
            peakStateBytes = math.max(peakStateBytes, so.memoryUsedBytes)
          }
        }
        Thread.sleep(250)
      }
    })
    poll.setDaemon(true); poll.start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    Option(q.lastProgress).foreach(_.stateOperators.foreach { so =>
      peakStateRows = math.max(peakStateRows, so.numRowsTotal)
      peakStateBytes = math.max(peakStateBytes, so.memoryUsedBytes)
    })
    // drain the listener bus before reading the totals: the final
    // batch's progress event may still be in flight after
    // processAllAvailable returns (bounded wait, outside wall_sec)
    val lastBatch = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (lastBatchSeen.get < lastBatch && System.nanoTime() < deadline)
      Thread.sleep(50)
    q.stop()
    spark.streams.removeListener(listener)
    val peakHeapMb = heapPools.map(_.getPeakUsage.getUsed).sum / 1048576
    // The listener totals are PER-STORE-TASK sums (wall x parallelism),
    // so compare them to each other, not to wall_sec.
    val interesting = Seq("rocksdbCommitFlushLatency",
      "rocksdbCommitCompactLatency", "rocksdbCommitCheckpointLatency",
      "rocksdbCommitFileSyncLatencyMs", "rocksdbWriterStallLatencyMs",
      "rocksdbGetLatency", "rocksdbPutLatency",
      "rocksdbGetCount", "rocksdbPutCount",
      "rocksdbTotalBytesRead", "rocksdbTotalBytesWritten",
      "rocksdbTotalBytesReadByCompaction",
      "rocksdbTotalBytesWrittenByCompaction",
      "rocksdbTotalCompactionLatencyMs", "rocksdbTotalFlushLatencyMs")
      .flatMap(k => custom.get(k).map(v => s""""$k":$v"""))
      .mkString(",")
    val rows = spark.read.parquet(s"$work/out").count()
    println(f"""{"metric":"enrich_file_stress","rows":$rows,"wall_sec":$wall%.1f,"chunks":$chunks,"provider":"$provider","partitions":$partitions,"peak_state_rows":$peakStateRows,"peak_state_mb":${peakStateBytes / 1048576},"peak_heap_mb":$peakHeapMb,"updates_ms":$updMs,"removals_ms":$rmMs,"commit_ms":$commitMs,"sf":"$sfDir"${if (interesting.nonEmpty) "," + interesting else ""}}""")
    spark.stop()
  }
}
