package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.sed.{SedQueries, Tables}
import graft.streaming.{SedStreaming => SS}

/** File-source twins of the streaming driver entries: the SAME operator
  * chains read a staged parquet directory as a stream (no driver feed)
  * and must produce the SAME rows as the MemoryStream entries — proof
  * that the harness's driver-side feed is an implementation detail of
  * the test rig, not of the operators. */
class FileStreamSpec extends SparkSpecBase {

  private val Watermark = "30 minutes"
  private val SessionGap = "10 minutes"
  private val ToleranceSec = 600

  private def streamSession(partitions: Int = 8): SparkSession = {
    val s = spark.newSession()
    SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    s
  }

  private var sink = 0
  private def runToEnd(out: DataFrame, mode: String): DataFrame = {
    sink += 1
    val name = s"graft_filestream_$sink"
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    out.sparkSession.table(name)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("file-source sessionize equals the MemoryStream entry") {
    val dir = Files.createTempDirectory("fs_sess").toString
    SS.stageFileStream(
      Tables.events(spark, Sf)
        .selectExpr("CAST(user_id AS BIGINT) AS user_id", "ts div 1000 AS ts_us"),
      "ts_us", dir)
    val s = streamSession()
    val src = SS.fileStream(s, dir, StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType))))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val got = runToEnd(
      SS.sessionize(src, "ts", "user_id", Watermark, SessionGap), "complete")
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"))
    val expected = StreamingQueries.streamSessionize(spark, Sf)
    assert(rows(got) == rows(expected) && rows(got).nonEmpty)
  }

  test("file-source windowed histogram equals the MemoryStream entry") {
    val dir = Files.createTempDirectory("fs_hist").toString
    SS.stageFileStream(
      Tables.events(spark, Sf)
        .selectExpr("ts div 1000 AS ts_us", "CAST(value AS DOUBLE) AS value"),
      "ts_us", dir)
    val s = streamSession()
    val src = SS.fileStream(s, dir, StructType(Seq(
      StructField("ts_us", LongType), StructField("value", DoubleType))))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val got = runToEnd(
      SS.streamingHistogram(src, "ts", Watermark, "1 hour",
        Seq(graft.operators.BinAxis("value", 50, 0.0, 500.0))), "complete")
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("value_bin"), col("cnt"))
    val expected = StreamingQueries.streamHistogram(spark, Sf)
    assert(rows(got) == rows(expected) && rows(got).nonEmpty)
  }

  test("file-source stream-stream enrich equals the MemoryStream entry") {
    val evDir = Files.createTempDirectory("fs_ev").toString
    val snDir = Files.createTempDirectory("fs_sn").toString
    val base = Tables.events(spark, Sf)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id", "ts div 1000 AS ts_us",
        "CAST(value AS DOUBLE) AS v")
    SS.stageFileStream(base, "ts_us", evDir)
    SS.stageFileStream(base.filter(col("event_id") % 100 === 0)
      .toDF("sensor_id", "sts_us", "reading"), "sts_us", snDir)
    val s = streamSession(4)
    val evSrc = SS.fileStream(s, evDir, StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("v", DoubleType))))
      .withColumn("ets", expr("timestamp_micros(ts_us)"))
      .select("event_id", "ets")
    val snSrc = SS.fileStream(s, snDir, StructType(Seq(
      StructField("sensor_id", LongType), StructField("sts_us", LongType),
      StructField("reading", DoubleType))))
      .withColumn("sts", expr("timestamp_micros(sts_us)"))
      .select("sensor_id", "sts", "reading")
    val got = runToEnd(
      SS.enrichWithSensor(evSrc, snSrc, "ets", "sts", Watermark, ToleranceSec)
        .select(col("event_id"), unix_micros(col("ets")).as("ets_us"),
          col("sensor_id"), unix_micros(col("sts")).as("sts_us"), col("reading")),
      "append")
    val expected = StreamingQueries.streamEnrich(spark, Sf)
    assert(rows(got) == rows(expected) && rows(got).nonEmpty)
  }

  test("file-source dedup-at-ingest equals the MemoryStream entry") {
    val dir = Files.createTempDirectory("fs_dd").toString
    SS.stageFileStream(
      Tables.documents(spark, Sf)
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text"),
      "doc_id", dir)
    val s = streamSession()
    val src = SS.fileStream(s, dir, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
      .withColumn("ts", expr("timestamp_micros((doc_id + 86400) * 1000000)"))
    val got = runToEnd(
      SS.streamingDedup(src, "ts", "text", Watermark), "append")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
    val expected = StreamingQueries.streamDedup(spark, Sf)
    assert(rows(got) == rows(expected) && rows(got).nonEmpty)
  }
}
