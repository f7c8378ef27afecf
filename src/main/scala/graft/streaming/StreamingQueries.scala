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
    * dominates the driver-fed MemoryStream runs ~3-to-1 (measured 6.1 s
    * vs 2.5 s per single-batch run at 8 partitions for the stream-stream
    * join; flat below 8). 8 keeps the harness honest (state is still
    * partitioned and shuffled) without paying 32 ways for a small feed;
    * production jobs reusing [[SedStreaming]] inherit their own
    * session's setting. Applied on a CLONED session so the caller's conf
    * is never mutated. */
  private val StatePartitions = 8

  private def streamSession(s: SparkSession,
                            partitions: Int = StatePartitions): SparkSession = {
    val s2 = s.newSession()
    SedQueries.ensureConfs(s2)
    s2.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    // processAllAvailable() after each chunk would otherwise schedule a
    // no-data micro-batch purely to advance the watermark — re-committing
    // EVERY state store delta (8 per partition for a stream-stream join)
    // with zero new rows, nearly doubling batch count. Inner-join and
    // complete-mode aggregation output is emitted on DATA batches, so
    // dropping no-data batches changes cost, never results (the batch-
    // equivalence specs pin this).
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    s2
  }

  /** Session gap (streaming sessionize) and enrich tolerance, seconds. */
  private val SessionGap = "10 minutes"
  private val Watermark = "30 minutes"
  private val ToleranceSec = 600

  private def emptyStream[T <: Product : org.apache.spark.sql.Encoder](
      s: SparkSession): MemoryStream[T] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    MemoryStream[T]
  }

  /** Rows per feed chunk are capped so the stateful operators hold at
    * most ~one chunk of in-flight state per side (watermark eviction
    * trails one batch): an unbounded chunk would grow join state with the
    * dataset and OOM the single-JVM harness — a real stream trickles, so
    * the harness should too. At least 3 chunks regardless of size. */
  private val MaxChunkRows = 500000

  private def chunk3[T](rows: Seq[T]): Seq[Seq[T]] =
    rows.grouped(math.max(1,
      math.min(rows.length / 3 + 1, MaxChunkRows))).toSeq

  /** Start the query, then feed each chunk and drain it as its OWN
    * micro-batch (addData interleaved with processAllAvailable). Data
    * added entirely before start would be served as ONE batch (the
    * MemoryStream read limit is all-available), so state would never
    * carry across triggers and the watermark would never advance —
    * interleaving is what makes these entries exercise real incremental
    * execution. Event-time-ordered chunks + a watermark delay far larger
    * than the join tolerance / session gap keep the emitted row set
    * identical to the batch plan (spec-asserted). */
  private def runChunked(s: SparkSession, out: DataFrame, mode: String)
                        (feedChunk: Int => Unit, nChunks: Int): DataFrame = {
    val name = s"graft_stream_${runCounter.incrementAndGet()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try (0 until nChunks).foreach { i => feedChunk(i); q.processAllAvailable() }
    finally q.stop()
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
    val ms = emptyStream[(Long, Long)](s)
    val src = ms.toDF().toDF("user_id", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val sess = SedStreaming.sessionize(src, "ts", "user_id", Watermark, SessionGap)
    val cks = chunk3(rows)
    runChunked(s, sess, "complete")(i => ms.addData(cks(i)), cks.size)
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
    // A symmetric-hash stream-stream join commits FOUR state stores per
    // side per partition per batch (keyToNumValues + keyWithIndexToValue
    // × left/right) — 8× the per-partition store budget of the single-
    // store aggregations. Halving the partitions equalizes the per-batch
    // delta-commit count with the other entries while the state stays
    // partitioned and shuffled; production jobs inherit their session's
    // own setting via SedStreaming.
    val s = streamSession(s0, StatePartitions / 2)
    import s.implicits._
    val base = Tables.events(s0, d)
      .selectExpr("CAST(event_id AS BIGINT) AS id", "ts div 1000 AS ts_us",
        "CAST(value AS DOUBLE) AS v")
      .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
    val sensorRows = base.filter(_._1 % 100 == 0)
    val evMs = emptyStream[(Long, Long, Double)](s)
    val snMs = emptyStream[(Long, Long, Double)](s)
    val evStream = evMs.toDF().toDF("event_id", "ts_us", "v")
      .withColumn("ets", expr("timestamp_micros(ts_us)"))
      .select("event_id", "ets")
    val snStream = snMs.toDF().toDF("sensor_id", "sts_us", "reading")
      .withColumn("sts", expr("timestamp_micros(sts_us)"))
      .select("sensor_id", "sts", "reading")
    val joined = SedStreaming.enrichWithSensor(evStream, snStream,
      "ets", "sts", Watermark, ToleranceSec)
      .select(col("event_id"), unix_micros(col("ets")).as("ets_us"),
        col("sensor_id"), unix_micros(col("sts")).as("sts_us"), col("reading"))
    // both sides chunked over the SAME time ranges (both are sorted by
    // ts), so each micro-batch advances the two watermarks together
    val evCks = chunk3(base)
    val snCks = chunk3(sensorRows)
    runChunked(s, joined, "append")({ i =>
      if (i < evCks.size) evMs.addData(evCks(i))
      if (i < snCks.size) snMs.addData(snCks(i))
    }, math.max(evCks.size, snCks.size))
  }

  /** Incremental windowed histogram — the flagship sed streaming shape:
    * per-event value binned within event-time windows, counts maintained
    * as windowed state behind a watermark. */
  def streamHistogram(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    import s.implicits._
    val rows = Tables.events(s0, d)
      .selectExpr("ts div 1000 AS ts_us", "CAST(value AS DOUBLE) AS v")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val ms = emptyStream[(Long, Double)](s)
    val src = ms.toDF().toDF("ts_us", "value")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val hist = SedStreaming.streamingHistogram(src, "ts", Watermark,
      "1 hour", Seq(graft.operators.BinAxis("value", 50, 0.0, 500.0)))
    val cks = chunk3(rows)
    runChunked(s, hist, "complete")(i => ms.addData(cks(i)), cks.size)
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("value_bin"), col("cnt"))
  }

  /** Streaming dedup-at-ingest over the near-duplicate-heavy documents
    * feed: content-hash dropDuplicatesWithinWatermark, state = one entry
    * per distinct hash inside the horizon, watermark-evicted. Event time
    * is synthesized from doc_id (1 s spacing) so the horizon genuinely
    * evicts on the longer feeds; a duplicate is re-emitted only once its
    * keeper's state has aged out (> watermark apart — spec-pinned). */
  def streamDedup(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    import s.implicits._
    val rows = Tables.documents(s0, d)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val ms = emptyStream[(Long, String)](s)
    // +1 day: doc 0 must not land exactly ON the initial watermark
    // (epoch 0), where it would be discarded as late before dedup
    val src = ms.toDF().toDF("doc_id", "text")
      .withColumn("ts", expr("timestamp_micros((doc_id + 86400) * 1000000)"))
    val dd = SedStreaming.streamingDedup(src, "ts", "text", Watermark)
    val cks = chunk3(rows)
    runChunked(s, dd, "append")(i => ms.addData(cks(i)), cks.size)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
  }

  /** Rows-only driver entries (streaming plans have no DuckDB twin). */
  val defs: Map[String, QueryDef] = Map(
    "q_stream_sessionize" -> QueryDef((s, d) => streamSessionize(s, d), None),
    "q_stream_enrich" -> QueryDef((s, d) => streamEnrich(s, d), None),
    "q_stream_hist" -> QueryDef((s, d) => streamHistogram(s, d), None),
    "q_stream_dedup" -> QueryDef((s, d) => streamDedup(s, d), None))
}
