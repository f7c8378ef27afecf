package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sed.{QueryDef, SedQueries, Tables}

/** Driver-contract entries for the streaming operators: each runs the
  * REAL Structured-Streaming plan (MemoryStream source fed in event-time
  * -ordered chunks → stateful operator → memory sink, run to completion)
  * and returns the sink contents as the result DataFrame. Deterministic
  * (fixed chunking, fixed data), so the driver's rows-only gate is stable;
  * batch equivalence is asserted in SedStreamingSpec.
  *
  * The driver feed collects the sf table to the driver only because
  * MemoryStream is driver-fed — a production deployment reads Kafka/files
  * with the identical operator chain (the plans in SedStreaming are
  * source-agnostic).
  */
object StreamingQueries {

  private val runCounter = new AtomicLong(0)

  /** State partitions for these entries. A streaming query fixes its state
    * partitioning at first start from `spark.sql.shuffle.partitions`, and
    * every micro-batch commits one state-store delta PER PARTITION PER
    * STORE — at the session default of 32 that fixed commit overhead
    * dominates the driver-fed MemoryStream runs 3-to-1 (measured 6.1 s →
    * 2.5 s at 8 for the stream-stream join). 8 keeps the harness honest
    * (state is still partitioned and shuffled) without paying 32 ways for
    * a small feed; production jobs reusing [[SedStreaming]] inherit their
    * own session's setting. Applied on a CLONED session so the caller's
    * conf is never mutated. */
  private val StatePartitions = 8

  private def streamSession(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    SedQueries.ensureConfs(s2)
    s2.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
    s2
  }

  /** Session gap (streaming sessionize) and enrich tolerance, seconds. */
  private val SessionGap = "10 minutes"
  private val Watermark = "30 minutes"
  private val ToleranceSec = 600

  private def feed3[T <: Product : org.apache.spark.sql.Encoder](
      s: SparkSession, rows: Seq[T]): MemoryStream[T] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[T]
    // 3 chunks => 3 micro-batches: state carries across triggers, the
    // watermark actually advances — a single batch would not exercise
    // incremental execution at all
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach(c => ms.addData(c))
    ms
  }

  private def runToTable(s: SparkSession, out: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${runCounter.incrementAndGet()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** Streaming sessionize over the events table (session_window state). */
  def streamSessionize(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    import s.implicits._
    val rows = Tables.events(s0, d)
      .selectExpr("CAST(user_id AS BIGINT) AS u", "ts div 1000 AS ts_us")
      .as[(Long, Long)].collect().sortBy(_._2).toSeq
    val src = feed3(s, rows).toDF().toDF("user_id", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val sess = SedStreaming.sessionize(src, "ts", "user_id", Watermark, SessionGap)
    runToTable(s, sess, "complete")
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"))
  }

  /** Stream-stream enrichment: every 100th event doubles as a "sensor"
    * reading; each event joins the readings within the preceding
    * `ToleranceSec` (bucketed equality key + exact range predicate). */
  def streamEnrich(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    import s.implicits._
    val base = Tables.events(s0, d)
      .selectExpr("CAST(event_id AS BIGINT) AS id", "ts div 1000 AS ts_us",
        "CAST(value AS DOUBLE) AS v")
      .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
    val sensorRows = base.filter(_._1 % 100 == 0)
    val evStream = feed3(s, base).toDF().toDF("event_id", "ts_us", "v")
      .withColumn("ets", expr("timestamp_micros(ts_us)"))
      .select("event_id", "ets")
    val snStream = feed3(s, sensorRows).toDF().toDF("sensor_id", "sts_us", "reading")
      .withColumn("sts", expr("timestamp_micros(sts_us)"))
      .select("sensor_id", "sts", "reading")
    val joined = SedStreaming.enrichWithSensor(evStream, snStream,
      "ets", "sts", Watermark, ToleranceSec)
      .select(col("event_id"), unix_micros(col("ets")).as("ets_us"),
        col("sensor_id"), unix_micros(col("sts")).as("sts_us"), col("reading"))
    runToTable(s, joined, "append")
  }

  /** Rows-only driver entries (streaming plans have no DuckDB twin). */
  val defs: Map[String, QueryDef] = Map(
    "q_stream_sessionize" -> QueryDef((s, d) => streamSessionize(s, d), None),
    "q_stream_enrich" -> QueryDef((s, d) => streamEnrich(s, d), None))
}
