package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpecBase
import graft.operators.BinAxis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Operational posture: a streaming job on a 100 TB feed WILL be
  * restarted (deploys, preemptions, failures), and correctness then
  * rests entirely on checkpoint recovery — the file-source log must not
  * re-ingest processed input, and the aggregation state store must
  * resume, not reset. MemoryStream cannot prove this (it is not
  * replayable across restarts), so this spec drives a real file source
  * through stop → new data → restart on one checkpoint. */
class StreamingRestartSpec extends SparkSpecBase {
  import spark.implicits._

  test("windowed histogram state survives a stop/restart on one checkpoint") {
    val s = spark.newSession()
    graft.sed.SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val dir = Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))

    def t(min: Int) = Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    def feed(rows: Seq[(Timestamp, Double)]): Unit = {
      import s.implicits._
      rows.toDF("ts", "value").coalesce(1).write.mode("append").parquet(srcDir)
    }
    def start() = {
      val src = s.readStream.schema(StructType.fromDDL("ts TIMESTAMP, value DOUBLE"))
        .parquet(srcDir)
      SedStreaming.streamingHistogram(src, "ts", "30 minutes", "1 hour",
          Seq(BinAxis("value", 10, 0.0, 100.0)))
        .writeStream.format("memory").queryName("graft_restart_hist")
        .outputMode("complete")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
    }
    def counts(): Map[Long, Long] = s.table("graft_restart_hist")
      .select(col("value_bin").cast("long"), col("cnt").cast("long"))
      .as[(Long, Long)].collect().toMap

    // epoch 1: three events in bin 1
    feed(Seq((t(1), 15.0), (t(2), 15.0), (t(3), 17.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(counts() == Map(1L -> 3L))

    // stopped: two more bin-1 events and one bin-2 event arrive
    feed(Seq((t(10), 12.0), (t(11), 19.0), (t(12), 25.0)))

    // epoch 2, same checkpoint: the first batch must resume the state
    // store (bin 1 = 5, not 2) and must NOT re-ingest the first file
    // (bin 1 = 5, not 8)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(counts() == Map(1L -> 5L, 2L -> 1L),
      "restart must resume aggregation state and skip processed files")
  }

  test("funnel (depth, t_last) state survives a stop/restart on one checkpoint") {
    val s = spark.newSession()
    graft.sed.SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val dir = Files.createTempDirectory("graft_restart_funnel").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))

    def feed(rows: Seq[(Long, Long, String)]): Unit = {
      import s.implicits._
      rows.toDF("user_id", "ts_us", "event_type")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    // append-mode recovery needs a replayable sink — memory can't
    // recover in append mode, a parquet sink can
    val outDir = s"$dir/out"
    def start() = {
      val src = s.readStream
        .schema(StructType.fromDDL("user_id BIGINT, ts_us BIGINT, event_type STRING"))
        .parquet(srcDir)
      SedStreaming.streamingFunnel(src, Seq("a", "b", "c"))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .start()
    }
    def advances(): Set[(Long, Int, Long)] = s.read.parquet(outDir)
      .as[(Long, Int, Long)].collect().toSet

    // epoch 1: u1 reaches stage a then b
    feed(Seq((1L, 10L, "a"), (1L, 20L, "b")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(advances() == Set((1L, 0, 10L), (1L, 1, 20L)))

    // stopped: u1's c arrives (must advance from RESUMED depth 2, not
    // restart at 0), plus a stale b that must NOT re-emit
    feed(Seq((1L, 30L, "c"), (1L, 31L, "b")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(advances() == Set((1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L)),
      "restart must resume per-user funnel state and not re-ingest or re-emit")
  }

  test("retention week-set state survives a stop/restart on one checkpoint") {
    val s = spark.newSession()
    graft.sed.SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val W = graft.operators.EventAnalytics.WeekUs
    val dir = Files.createTempDirectory("graft_restart_ret").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def feed(rows: Seq[(Long, Long)]): Unit = {
      import s.implicits._
      rows.toDF("user_id", "ts_us").coalesce(1).write.mode("append").parquet(srcDir)
    }
    val outDir = s"$dir/out"
    def start() = {
      val src = s.readStream
        .schema(StructType.fromDDL("user_id BIGINT, ts_us BIGINT")).parquet(srcDir)
      SedStreaming.streamingRetention(src)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    }
    def weeks(): Seq[(Long, Long)] =
      s.read.parquet(outDir).as[(Long, Long)].collect().toSeq

    feed(Seq((1L, 5 * W + 1), (1L, 5 * W + 2)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(weeks().sorted == Seq((1L, 5L)))

    // stopped: a repeat of week 5 (must NOT re-emit — the seen-set must
    // be recovered, not reset) and a new week
    feed(Seq((1L, 5 * W + 9), (1L, 7 * W)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(weeks().sorted == Seq((1L, 5L), (1L, 7L)),
      "restart must recover the per-user week set exactly once per week")
  }

  test("transitions last-type state survives a stop/restart on one checkpoint") {
    val s = spark.newSession()
    graft.sed.SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val dir = Files.createTempDirectory("graft_restart_trans").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def feed(rows: Seq[(Long, Long, Long, String)]): Unit = {
      import s.implicits._
      rows.toDF("user_id", "ts_us", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val outDir = s"$dir/out"
    def start() = {
      val src = s.readStream.schema(StructType.fromDDL(
        "user_id BIGINT, ts_us BIGINT, event_id BIGINT, event_type STRING"))
        .parquet(srcDir)
      SedStreaming.streamingTransitions(src)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    }
    def edges(): Seq[(Long, String, String)] =
      s.read.parquet(outDir).as[(Long, String, String)].collect().toSeq

    feed(Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(edges().sorted == Seq((1L, "a", "b")))

    // stopped: next event must chain off the RECOVERED last type ("b"),
    // not restart the sequence
    feed(Seq((1L, 30L, 3L, "c")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(edges().sorted == Seq((1L, "a", "b"), (1L, "b", "c")),
      "restart must chain off the recovered last type without re-ingesting")
  }

  test("as-of last-reading state survives a stop/restart on one checkpoint") {
    val s = spark.newSession()
    graft.sed.SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val dir = Files.createTempDirectory("graft_restart_asof").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def feed(rows: Seq[(Long, Long, Long, Option[Double])]): Unit = {
      import s.implicits._
      rows.toDF("k", "o", "i", "r").coalesce(1).write.mode("append").parquet(srcDir)
    }
    val outDir = s"$dir/out"
    def start() = {
      val src = s.readStream.schema(StructType.fromDDL(
        "k BIGINT, o BIGINT, i BIGINT, r DOUBLE")).parquet(srcDir)
      SedStreaming.streamingAsofEnrich(src, "k", "o", "i", "r")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    }
    def rows(): Map[Long, (Option[Long], Option[Double])] =
      s.read.parquet(outDir)
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._2 -> ((r._4, r._6))).toMap

    // epoch 1: a reading at t=10 enriches the t=15 event
    feed(Seq((0L, 10L, 100L, Some(1.5)), (0L, 15L, 1L, None)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(rows()(1L) == ((Some(100L), Some(1.5))))

    // stopped: an event arrives with NO new reading — it must enrich
    // against the RECOVERED (10, 100, 1.5) state, and the first file
    // must not re-ingest (no duplicate id-1 rows)
    feed(Seq((0L, 20L, 2L, None)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = s.read.parquet(outDir).count()
    assert(got == 3L, s"expected 3 output rows, got $got (re-ingest?)")
    assert(rows()(2L) == ((Some(100L), Some(1.5))),
      "restart must enrich from the recovered last-reading state")
  }
}
