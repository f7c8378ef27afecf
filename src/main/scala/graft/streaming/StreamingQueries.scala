package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sed.{QueryDef, SedQueries, Tables}

/** Driver-contract entries for the streaming operators: each runs the
  * REAL Structured-Streaming plan against a FILE-SOURCE feed — the input
  * table is staged as event-time-ordered parquet chunks by one Spark
  * write job (stageFileStream) and replayed one file per micro-batch, so
  * NOTHING rides through the driver on the input side. Append-mode
  * entries (the stream-stream join, dedup-at-ingest) write a parquet
  * sink and return the read-back — output never accumulates on the
  * driver either, which is what lets q_stream_enrich's 240M-row 100x
  * run complete inside the entry itself (the round-7 memory-sink shape
  * exhausted a 96 GB heap there). Complete-mode aggregations (windowed
  * histogram, sessionize) keep the memory sink: their result IS the
  * bounded aggregate state (windows x bins; one row per session).
  *
  * Deterministic (fixed chunking, fixed data), so the driver's rows-only
  * gate is stable. The MemoryStream twins of all four chains live in
  * [[memoryTwins]] — FileStreamSpec asserts row equality between each
  * contract entry and its driver-fed twin, proving the feed mechanism is
  * an implementation detail of the harness, not of the operators.
  */
object StreamingQueries {

  private val runCounter = new AtomicLong(0)

  /** Plan-stability capture for streaming entries (round 12): batch
    * entries fingerprint their DataFrame, but a streaming chain's
    * physical plan only exists per micro-batch inside StreamExecution —
    * so each contract entry records its LAST executed micro-batch plan's
    * fingerprint here (keyed by entry name via a thread-local the defs
    * wrapper sets), and StreamPlanAuditSpec gates the map against a
    * committed snapshot. MemoryStream twins (spec rig) run with no
    * current entry and record nothing. */
  private[graft] val lastPlans =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val currentEntry = new ThreadLocal[String]
  private def recordPlan(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    Option(currentEntry.get()).foreach(record(_, q))

  /** Record a stream's fingerprint under an explicit entry name — for
    * streaming contract entries defined OUTSIDE this object
    * (q_stream_index_ingest lives with the ANN block). */
  private[graft] def record(name: String,
                            q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    org.apache.spark.sql.graft.StreamPlan.lastExecutedPlan(q)
      .foreach(pl => lastPlans(name) = graft.sed.PlanFingerprint.ofPlan(pl))

  /** State partitions for these entries. A streaming query fixes its state
    * partitioning at first start from `spark.sql.shuffle.partitions`, and
    * every micro-batch commits one state-store delta PER PARTITION PER
    * STORE — at the session default of 32 that fixed commit overhead
    * dominates the small-feed runs ~3-to-1 (measured 6.1 s vs 2.5 s per
    * single-batch run at 8 partitions for the stream-stream join; flat
    * below 8). 8 keeps the harness honest (state is still partitioned and
    * shuffled) without paying 32 ways for a small feed; production jobs
    * reusing [[SedStreaming]] inherit their own session's setting.
    * Applied on a CLONED session so the caller's conf is never mutated. */
  private val StatePartitions = 8

  private def streamSession(s: SparkSession,
                            partitions: Int = StatePartitions): SparkSession = {
    val s2 = s.newSession()
    SedQueries.ensureConfs(s2)
    s2.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    // (r18) the r17 SPARK_GRAFT_STREAM_CONF A/B hook moved OUT of the
    // contract path into the profiling main (graft.StreamJobProfile): a
    // stray environment variable must never silently change what the
    // certified entries run with — session confs here are a pure
    // function of code + feed size again.
    // processAllAvailable() would otherwise schedule no-data micro-batches
    // purely to advance the watermark — re-committing EVERY state store
    // delta (8 per partition for a stream-stream join) with zero new rows,
    // nearly doubling batch count. Inner-join and complete-mode
    // aggregation output is emitted on DATA batches, so dropping no-data
    // batches changes cost, never results (the batch-equivalence specs
    // pin this).
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // RocksDB state store (round 15): the default
    // HDFSBackedStateStoreProvider keeps EVERY partition's state map in
    // executor heap — fine at sf100 in one 128 GiB JVM, the ceiling at
    // 100 TB with a realistic watermark horizon (q_stream_enrich's
    // stream-stream join holds ~240M pairs of state at 100×). RocksDB
    // spills state to local disk with a bounded block cache, so state
    // size is bounded by disk, not heap; results are provider-invariant
    // (same oracles — the driver gate re-certifies every entry) and
    // changelog checkpointing keeps per-batch commit cost proportional
    // to the delta, not a full SST upload per batch.
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    s2
  }

  /** SessionGap in µs — the oracle's break/end arithmetic must use the
    * same literal the session_window gap parses to. */
  private val SessionGapUs = 600000000L

  /** Session gap (streaming sessionize) and enrich tolerance, seconds. */
  private val SessionGap = "10 minutes"
  private val Watermark = "30 minutes"
  private val ToleranceSec = 600

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Opt a CLONED stream session into per-core scan splits of its staged
    * single-file micro-batches (r18, guide §6 — see
    * [[SedStreaming.scanSplitFor]]). ONLY for entries whose per-batch
    * results are provably independent of the scan's partition layout:
    * stateless projections/filters, and foreachBatch index loops whose
    * operators are SET-based over the batch (joins/aggregations with
    * deterministic tie-breaks — the same operators their oracles/specs
    * certify on arbitrarily-partitioned batch inputs). NOT applied to
    * arrival-order-sensitive chains (streamingDedup's keeper election
    * keeps the first-arriving row per content key within a batch). */
  private def splitScan(s: SparkSession, dir: String): Unit =
    s.conf.set("spark.sql.files.maxPartitionBytes",
      SedStreaming.scanSplitFor(s, dir).toString)

  /** Drain a file-source chain into a named memory sink (complete-mode
    * aggregations — the sink holds the bounded aggregate result). */
  private def runToMemory(s: SparkSession, out: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${runCounter.incrementAndGet()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s.table(name)
  }

  /** Drain a file-source chain into a parquet sink and return the
    * read-back — append-mode entries, where output volume scales with the
    * data and must not accumulate on the driver. */
  private def runToParquet(s: SparkSession, out: DataFrame): DataFrame = {
    val outDir = tmp("graft_stream_sink")
    val q = out.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", tmp("graft_stream_ck"))
      .outputMode("append").start()
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s.read.parquet(outDir)
  }

  // ---- the four contract chains, shared by file and memory feeds ------

  private val sessSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts_us", LongType)))

  private def sessionizeChain(src: DataFrame): DataFrame =
    SedStreaming.sessionize(
      src.withColumn("ts", expr("timestamp_micros(ts_us)")),
      "ts", "user_id", Watermark, SessionGap)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"))

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts_us", LongType),
    StructField("v", DoubleType)))
  private val snSchema = StructType(Seq(
    StructField("sensor_id", LongType), StructField("sts_us", LongType),
    StructField("reading", DoubleType)))

  private def enrichChain(ev: DataFrame, sn: DataFrame): DataFrame =
    SedStreaming.enrichWithSensor(
      ev.withColumn("ets", expr("timestamp_micros(ts_us)"))
        .select("event_id", "ets"),
      sn.withColumn("sts", expr("timestamp_micros(sts_us)"))
        .select("sensor_id", "sts", "reading"),
      "ets", "sts", Watermark, ToleranceSec)
      .select(col("event_id"), unix_micros(col("ets")).as("ets_us"),
        col("sensor_id"), unix_micros(col("sts")).as("sts_us"), col("reading"))

  private val histSchema = StructType(Seq(
    StructField("ts_us", LongType), StructField("value", DoubleType)))

  /** q_stream_hist's axis — shared by the chain and its oracle so the
    * bin arithmetic cannot drift. */
  private val HistAxis = graft.operators.BinAxis("value", 50, 0.0, 500.0)

  private def histChain(src: DataFrame): DataFrame =
    SedStreaming.streamingHistogram(
      src.withColumn("ts", expr("timestamp_micros(ts_us)")),
      "ts", Watermark, "1 hour",
      Seq(HistAxis))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("value_bin"), col("cnt"))

  private val dedupSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def dedupChain(src: DataFrame): DataFrame =
    SedStreaming.streamingDedup(
      // +1 day: doc 0 must not land exactly ON the initial watermark
      // (epoch 0), where it would be discarded as late before dedup
      src.withColumn("ts", expr("timestamp_micros((doc_id + 86400) * 1000000)")),
      "ts", "text", Watermark)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))

  private def neardupChain(src: DataFrame): DataFrame =
    SedStreaming.streamingLshCandidates(
      // same doc_id-derived event time as dedupChain (1 s spacing,
      // +1 day so doc 0 isn't late against the initial watermark)
      src.withColumn("ts", expr("timestamp_micros((doc_id + 86400) * 1000000)")),
      "doc_id", "ts", "text", Watermark)
      .select(col("band"), col("dup_id"), col("keeper_id"),
        unix_micros(col("ts")).as("ts_us"))

  // ---- contract entries: file-source feed, driver-residency-free ------

  /** Streaming sessionize over the events table (session_window state). */
  def streamSessionize(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_sess_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(user_id AS BIGINT) AS user_id", "ts_us"),
      "ts_us", dir)
    runToMemory(s, sessionizeChain(SedStreaming.fileStream(s, dir, sessSchema)),
      "complete")
  }

  /** Stream-stream enrichment: every 100th event doubles as a "sensor"
    * reading; each event joins the readings within the preceding
    * `ToleranceSec` (bucketed equality key + exact range predicate).
    * Both sides staged over the SAME time ranges (both are staged sorted
    * by ts into the same chunk count), so each micro-batch advances the
    * two watermarks together. */
  def streamEnrich(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val base = Tables.events(s0, d)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id", "ts_us",
        "CAST(value AS DOUBLE) AS v")
    val evDir = tmp("graft_enrich_ev")
    val snDir = tmp("graft_enrich_sn")
    val evChunks = SedStreaming.stageFileStream(base, "ts_us", evDir)
    SedStreaming.stageFileStream(
      base.filter(col("event_id") % 100 === 0).toDF("sensor_id", "sts_us", "reading"),
      "sts_us", snDir)
    val s = streamSession(s0, enrichStatePartitions(evChunks))
    runToParquet(s, enrichChain(
      SedStreaming.fileStream(s, evDir, evSchema),
      SedStreaming.fileStream(s, snDir, snSchema)))
  }

  /** SCALE-ADAPTIVE state partitioning for the stream-stream join
    * (optimization guide §2: derive partitioning from input size, never a
    * constant tuned for one scale). The join is PROBE-CPU-bound on
    * RocksDB at scale, not commit-bound (r16 profile, EnrichFileStress
    * breakdown at 100×: 1,394 s of state-update task time — 536M gets
    * through the disk format — against 5.8 s of commit; changelog
    * checkpointing already made commits cheap): 4 → 16 partitions
    * measured 467.5 → 142.1 s at 100× (3.3×) with heap still bounded
    * (2.8 GB). On SMALL feeds the trade inverts — per-batch delta-commit
    * count dominates and fewer partitions win (r16's warm sf0.1 A/B:
    * 5.5 s at 4 partitions vs 9.1 s at 16; the r16 artifact paid
    * 4.80 → 6.65 s for pinning 16 globally). The staged chunk count IS
    * the feed-size signal (~1.5M rows/chunk): feeds under ~6M rows keep
    * the commit-bound setting, larger feeds take the probe-concurrency
    * one. Results are partition-invariant (the driver oracle re-certifies
    * the entry at every SF; FileStreamSpec pins twin equality). A
    * production deployment sizes this from its own cluster/feed instead
    * — the derivation, not the constants, is the contract. */
  private[streaming] def enrichStatePartitions(chunks: Int): Int =
    if (chunks >= 5) StatePartitions * 2 else StatePartitions / 2

  /** Incremental windowed histogram — the flagship sed streaming shape:
    * per-event value binned within event-time windows, counts maintained
    * as windowed state behind a watermark. */
  def streamHistogram(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_hist_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("ts_us", "CAST(value AS DOUBLE) AS value"),
      "ts_us", dir)
    runToMemory(s, histChain(SedStreaming.fileStream(s, dir, histSchema)),
      "complete")
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
    val dir = tmp("graft_dedup_feed")
    // DETERMINISTIC staging (round 13): batch membership is
    // NTILE(StreamChunks) OVER (ORDER BY doc_id), which the DuckDB
    // oracle replays verbatim — the promotion to oracle-eligible
    SedStreaming.stageFileStreamNtile(Tables.documents(s0, d)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text"),
      "doc_id", dir, graft.sed.PipelineQueries.StreamChunks)
    runToParquet(s, dedupChain(SedStreaming.fileStream(s, dir, dedupSchema)))
  }

  /** Streaming NEAR-dup candidate detection at ingest over the same
    * documents feed: MinHash-LSH banding per arriving doc against
    * watermark-evicted per-band-key keeper state
    * (SedStreaming.streamingLshCandidates) — star pairs per bucket, the
    * same connected components as the batch LSH stage. */
  def streamNearDedup(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_neardup_feed")
    // deterministic NTILE staging, same rationale as streamDedup
    SedStreaming.stageFileStreamNtile(Tables.documents(s0, d)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text"),
      "doc_id", dir, graft.sed.PipelineQueries.StreamChunks)
    runToParquet(s, neardupChain(SedStreaming.fileStream(s, dir, dedupSchema)))
  }

  /** Streaming forward-fill over the events feed: every 10th event
    * carries a sensor value, the rest fill forward per user in event-
    * time order, with per-key state carrying the last value ACROSS
    * micro-batches (SedStreaming.streamingForwardFill). ORACLE-ELIGIBLE
    * (rare for streaming): the filled values pass through untouched, so
    * the result equals DuckDB's LAST_VALUE(... IGNORE NULLS) window —
    * chunking is provably irrelevant because the feed is staged in
    * ts_us-ascending files and state carries the boundary. */
  def streamForwardFill(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_ffill_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(user_id AS BIGINT) AS user_id", "ts_us",
        "CASE WHEN event_id % 10 = 0 THEN value ELSE NULL END AS v"),
      "ts_us", dir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("v", DoubleType)))
    runToParquet(s, SedStreaming.streamingForwardFill(
      SedStreaming.fileStream(s, dir, schema), "user_id", "ts_us", "v"))
  }

  /** Streaming conversion funnel: the events table replayed as an
    * event-time-ordered file stream, per-user (depth, t_last) state,
    * stage advances emitted append-mode exactly once — then folded to
    * the q_funnel contract rows. ORACLE-ELIGIBLE: greedy in-order
    * progression equals the batch first-qualifying-time chain (see
    * SedStreaming.streamingFunnel), so this shares q_funnel's DuckDB
    * oracle VERBATIM — batch and online funnels hash-matching one
    * oracle certifies both execution paths. */
  def streamFunnel(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val stages = graft.operators.EventAnalytics.DefaultStages
    val dir = tmp("graft_funnel_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(user_id AS BIGINT) AS user_id", "ts_us", "event_type"),
      "ts_us", dir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("event_type", StringType)))
    val advances = runToParquet(s, SedStreaming.streamingFunnel(
      SedStreaming.fileStream(s, dir, schema), stages))
    // fold the advance log to the q_funnel row contract; stages nobody
    // reached must still appear with n_users = 0
    import s.implicits._
    val stageDf = stages.zipWithIndex.map { case (st, i) => (i, st) }
      .toDF("stage_idx", "stage")
    val counts = advances.groupBy("stage_idx").agg(count(lit(1)).as("n_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    stageDf.join(counts, Seq("stage_idx"), "left")
      .na.fill(0L, Seq("n_users"))
      // same NULL-on-empty-first-stage guard as the batch funnel/oracle
      .withColumn("pct_of_first",
        when(first("n_users").over(w) > 0,
          round(col("n_users").cast("double") / first("n_users").over(w), 6)))
  }

  /** Online anomaly scoring with an OFFLINE model — the two-phase
    * deployment (like q_stream_decontam's Bloom): per-type exact-cents
    * moments fit on the batch table, broadcast against the live feed in
    * a stream-static join, each arriving event flagged map-only
    * (stateless, append mode, no watermark). ORACLE-ELIGIBLE: scoring
    * with full-corpus moments makes the replayed stream equal the batch
    * operator, so this shares q_zscore_outliers' oracle VERBATIM. */
  def streamZscore(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    import graft.operators.EventAnalytics
    val dir = tmp("graft_zscore_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id", "ts_us",
        "event_type", "value"), "ts_us", dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    // offline model: the moment table from the batch view of the data
    // (|event_type| rows), broadcast into the stream-static join.
    // MATERIALIZED once: the static side of a stream-static join is
    // re-evaluated EVERY micro-batch, so an uncheckpointed moment
    // aggregation re-scans the whole corpus per batch (measured 10x the
    // entry wall at 100x before this localCheckpoint)
    val stats = EventAnalytics.momentStats(Tables.events(s, d)).localCheckpoint(true)
    val live = SedStreaming.fileStream(s, dir, schema)
    val scored = EventAnalytics.flagOutliers(
      EventAnalytics.withCents(live, "event_id", "event_type", "value")
        .join(broadcast(stats), "event_type"),
      k = 2, "event_id", "event_type", "value")
    runToParquet(s, scored)
  }

  /** Online winsorization with OFFLINE thresholds — the second two-phase
    * deployment next to q_stream_zscore: the per-type discrete-quantile
    * clamp band fits on the batch table (histogram cumulative window,
    * |type| rows, MATERIALIZED once — the stream-static re-evaluation
    * lesson), broadcast into the live feed, each arriving event clamped
    * map-only. ORACLE-ELIGIBLE: full-corpus thresholds make the
    * replayed stream equal the batch operator — shares q_winsorize's
    * oracle VERBATIM. */
  def streamWinsorize(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    import graft.operators.EventAnalytics
    val dir = tmp("graft_winsor_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id", "ts_us",
        "event_type", "value"), "ts_us", dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val thr = EventAnalytics.winsorizeThresholds(Tables.events(s, d), 0.05, 0.95)
      .localCheckpoint(true)
    val live = SedStreaming.fileStream(s, dir, schema)
    runToParquet(s, EventAnalytics.clampWithThresholds(
      EventAnalytics.withCents(live, "event_id", "event_type", "value")
        .join(broadcast(thr), "event_type"),
      "event_id", "event_type", "value"))
  }

  /** Streaming quality-classifier inference at ingest — the
    * CCNet/fastText-style keep-drop filter embedded in the ingest
    * stream: documents arrive as a staged file feed and each is scored
    * MAP-ONLY (one codegen projection per arriving file; stateless — no
    * watermark, no state store, nothing accumulates, back-pressured by
    * maxFilesPerTrigger). A replayed stream therefore equals the batch
    * operator row-for-row and SHARES q_quality_classifier's oracle
    * VERBATIM. */
  def streamQuality(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_quality_feed")
    SedStreaming.stageFileStream(
      Tables.documents(s0, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text")),
      "doc_id", dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // stateless map-only scoring — split the single-file micro-batch
    // (r18; measured 3 × ~19 s single-task batches at 100×)
    splitScan(s, dir)
    val live = SedStreaming.fileStream(s, dir, schema)
    runToParquet(s, live
      .withColumn("__toks", graft.functions.TextFunctions.tokens(col("text")))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tok"),
        graft.functions.TextFunctions.hashedLinearScoreU(
          col("__toks"), graft.sed.PipelineQueries.ClsDim).as("score_u"))
      .withColumn("keep", col("score_u") > 0))
  }

  /** Blocklist filtering AT INGEST: arriving documents scored MAP-ONLY
    * through the SAME Aho–Corasick flag projection as the batch operator
    * (one codegen projection per arriving file — stateless, no watermark,
    * no state store). A replayed stream equals the batch operator
    * row-for-row, so this SHARES q_blocklist's oracle VERBATIM. */
  def streamBlocklist(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_blk_feed")
    SedStreaming.stageFileStream(
      Tables.documents(s0, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text")),
      "doc_id", dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // stateless AC-flag projection — split the single-file micro-batch
    splitScan(s, dir)
    runToParquet(s, graft.sed.PipelineQueries.blocklistFlags(
      SedStreaming.fileStream(s, dir, schema)))
  }

  /** CCNet perplexity bucketing AT INGEST: the KN model and the per-lang
    * third cutoffs fit OFFLINE on the batch table (materialized once —
    * the stream-static lesson), then every arriving micro-batch scores
    * its docs against the model and labels them head/middle/tail via
    * foreachBatch (per-doc scoring needs a per-doc aggregation, which a
    * pure append stream cannot do statelessly — the q_stream_index_ingest
    * precedent). Full-corpus model + cutoffs make the replayed stream
    * equal the batch operator row-for-row, so this SHARES
    * q_ppl_buckets' oracle VERBATIM. Span output is per-batch overwrite
    * (restart-idempotent). */
  def streamPpl(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val batch = Tables.documents(s0, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"), col("text"))
    val model = graft.operators.Lm.knModel(
      batch, "text", graft.sed.PipelineQueries.KnDiscount).localCheckpoint(true)
    val cuts = graft.sed.PipelineQueries.pplCuts(
      graft.sed.PipelineQueries.pplScoreWith(model, batch)).localCheckpoint(true)
    val dir = tmp("graft_ppl_feed")
    SedStreaming.stageFileStream(batch, "doc_id", dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val outPath = tmp("graft_ppl_out")
    // the foreachBatch body aggregates per doc_id (scan layout cannot
    // change its result) but the tokenize/shingle scan work runs in the
    // batch file's scan tasks — split the single file (r18, guide §6)
    splitScan(s, dir)
    val q = SedStreaming.fileStream(s, dir, schema).writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.sed.PipelineQueries.pplBucketize(
            graft.sed.PipelineQueries.pplScoreWith(model, b.toDF()), cuts)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .option("checkpointLocation", tmp("graft_ppl_ck"))
      .start()
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s0.read.parquet(outPath)
      .select("doc_id", "lang", "score_u", "bucket")
  }

  /** Character-level substring dedup AT INGEST: the documents table
    * replayed as an ascending-id file feed into the incremental
    * ExactSubstr loop — each micro-batch probes the PERSISTED
    * winnowed-anchor index (founded by the first batch), writes its trim
    * spans, and admits its own anchors/text so later batches pair against
    * it. The corpus is never rescanned: per-batch cost is O(|batch| +
    * matched), which is the only ingestion shape that survives 100 TB.
    * Rows-only BY DESIGN like q_substring_anchored (the winnowed path is
    * a spec-gated approximation of the exact operator); the accumulated
    * spans EQUAL the from-scratch anchored operator over the whole table
    * (StreamingSubstrSpec pins stream == batch, plus restart recovery). */
  def streamSubstring(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_substr_feed")
    SedStreaming.stageFileStream(
      Tables.documents(s0, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text")),
      "doc_id", dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val outPath = tmp("graft_substr_out")
    // set-based foreachBatch body (span-exactness pinned vs the batch
    // operator on arbitrary partitioning) — split the batch scan (r18)
    splitScan(s, dir)
    // compactEvery = 2: anchor-index generation swaps run mid-feed;
    // the accumulated spans must stay equal through them
    val q = SedStreaming.streamingSubstringDedup(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "text",
      tmp("graft_substr_idx"), outPath,
      tmp("graft_substr_ck"), graft.sed.PipelineQueries.SubstrL,
      compactEvery = 2)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s0.read.parquet(outPath)
      .select("doc_id", "span_id", "span_start", "span_end")
  }

  /** Leakage-safe splitting AT INGEST: the documents table replayed as
    * an ascending-id file feed into the incremental split-index loop
    * (SedStreaming.streamingLeakageSplit) — each micro-batch clusters
    * against the persisted index, takes its clusters' splits (merges
    * re-key to the min label, whose split wins), and admits itself.
    * ORACLE-ELIGIBLE despite being incremental: the final index
    * assignment provably equals the from-scratch cluster-keyed split
    * over the whole corpus (labels are component minima, which only
    * decrease and merge to minima — SplitIngestSpec pins equality incl.
    * the merge and restart cases), so this shares q_leakage_split's
    * DuckDB oracle VERBATIM. */
  def streamLeakageSplit(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_split_feed")
    val docsDf = Tables.documents(s0, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    SedStreaming.stageFileStream(docsDf, "doc_id", dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val idxPath = tmp("graft_split_idx")
    // set-based foreachBatch body (min-label clustering; oracle-pinned)
    // — split the batch scan (r18)
    splitScan(s, dir)
    // compactEvery = 2: the entry runs the in-loop generation-swap
    // compaction (GenIndex) mid-feed — the staged feed is >= 3 chunks,
    // so at least one swap genuinely fires — and the oracle therefore
    // certifies not just the ingest but index maintenance: the final
    // assignment must be bit-identical through every generation
    val q = SedStreaming.streamingLeakageSplit(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "text",
      graft.sed.PipelineQueries.SplitSeed, idxPath, tmp("graft_split_out"),
      tmp("graft_split_ck"),
      graft.sed.PipelineQueries.NumHashes, graft.sed.PipelineQueries.RowsPerBand,
      graft.sed.PipelineQueries.ShingleN, 0.8, graft.sed.PipelineQueries.MaxBucket,
      compactEvery = 2)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    graft.operators.Dedup.splitIndexAssignment(
      s0, docsDf, "doc_id", "text", graft.sed.PipelineQueries.SplitSeed,
      graft.operators.GenIndex.active(s0, idxPath))
  }

  /** Exact-dedup classification AT INGEST over the generation-maintained
    * dedup index (SedStreaming.streamingDedupIngest /
    * Dedup.dedupIndexIngest): the documents table replays as THREE
    * deterministic NTILE batches; each batch classifies against the
    * admitted docs of the earlier ones, writes its classification
    * durably BEFORE admitting itself, and the index swaps a generation
    * mid-feed (compactEvery = 2 -> after batch 2, so batch 3 probes the
    * compacted generation). ORACLE-ELIGIBLE: a doc's classification is
    * final at ingest, so the accumulated outputs equal the per-batch
    * unrolled replay (PipelineQueries.dedupIngestOracle) — which also
    * certifies the mid-feed swap, since a swap that changed any
    * classification would hash-mismatch. */
  def streamDedupIngest(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_dingest_feed")
    val docsDf = Tables.documents(s0, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    SedStreaming.stageFileStreamNtile(docsDf, "doc_id", dir, chunks = 3)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val outPath = tmp("graft_dingest_out")
    // set-based foreachBatch body (classification joins; oracle-pinned)
    // — split the batch scan (r18)
    splitScan(s, dir)
    val q = SedStreaming.streamingDedupIngest(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "text",
      tmp("graft_dingest_idx"), outPath, tmp("graft_dingest_ck"),
      graft.sed.PipelineQueries.NumHashes, graft.sed.PipelineQueries.RowsPerBand,
      graft.sed.PipelineQueries.ShingleN, 0.8, graft.sed.PipelineQueries.MaxBucket,
      compactEvery = 2)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s0.read.parquet(outPath).select("doc_id", "status", "match_id", "n_near")
  }

  /** Leakage-safe splitting at ingest WITH RETENTION: the same
    * streamingLeakageSplit loop over a 4-batch NTILE feed, except the
    * final compaction (compactEvery = 2, so compactions fire after
    * batches 2 and 4) runs as dropBefore(horizon) with horizon = min +
    * 3/5 of the id range — clusters whose whole recorded history
    * predates it RETIRE (tombstones under _tombstones/batch=3), the
    * rest keep their labels. ORACLE-ELIGIBLE: end-of-feed current
    * labels equal the from-scratch split (SplitIngestSpec), and the
    * retire rule — max representative id below the horizon — replays
    * in SQL, so the post-retention assignment equals the q_leakage_split
    * pipeline restricted to kept clusters
    * (PipelineQueries.retentionSplitOracle); retired docs resolve
    * nothing on BOTH sides. */
  def streamRetentionSplit(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_retsplit_feed")
    val docsDf = Tables.documents(s0, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val mm = docsDf.agg(min("doc_id"), max("doc_id")).first()
    val horizon = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 3 / 5
    SedStreaming.stageFileStreamNtile(docsDf, "doc_id", dir, chunks = 4)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val idxPath = tmp("graft_retsplit_idx")
    val outPath = tmp("graft_retsplit_out")
    // set-based foreachBatch body — split the batch scan (r18)
    splitScan(s, dir)
    val q = SedStreaming.streamingLeakageSplit(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "text",
      graft.sed.PipelineQueries.SplitSeed, idxPath, outPath,
      tmp("graft_retsplit_ck"),
      graft.sed.PipelineQueries.NumHashes, graft.sed.PipelineQueries.RowsPerBand,
      graft.sed.PipelineQueries.ShingleN, 0.8, graft.sed.PipelineQueries.MaxBucket,
      compactEvery = 2,
      retention = bid => if (bid == 3) horizon else Long.MinValue)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    graft.operators.Dedup.splitIndexAssignment(
      s0, docsDf, "doc_id", "text", graft.sed.PipelineQueries.SplitSeed,
      graft.operators.GenIndex.active(s0, idxPath))
  }

  /** TEXT CDC-chunk dedup at ingest WITH RETENTION (round 15): the
    * documents table replays as FOUR NTILE batches through the chunk
    * index loop (SedStreaming.streamingCdcDedup); the compaction after
    * batch 3 (compactEvery = 3) runs as dropBefore(horizon) with
    * horizon = min + 2/5 of the id range — chunk hashes first owned
    * before it RETIRE (tombstones under _tombstones/batch=2), and
    * batch 4 classifies against the retained index, RE-FOUNDING any
    * returning retired content under fresh owners. ORACLE-ELIGIBLE:
    * reports are final at ingest, the retire rule (first owner below
    * the horizon) replays in SQL, and batch 4's classification is the
    * retained-hash left-join — the unrolled trajectory
    * (PipelineQueries.retentionChunksOracle). */
  def streamRetentionChunks(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_retchunk_feed")
    val docsDf = Tables.documents(s0, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val mm = docsDf.agg(min("doc_id"), max("doc_id")).first()
    val horizon = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 2 / 5
    SedStreaming.stageFileStreamNtile(docsDf, "doc_id", dir, chunks = 4)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val outPath = tmp("graft_retchunk_out")
    // set-based foreachBatch body — split the batch scan (r18)
    splitScan(s, dir)
    val q = SedStreaming.streamingCdcDedup(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "text",
      tmp("graft_retchunk_idx"), outPath, tmp("graft_retchunk_ck"),
      graft.sed.PipelineQueries.CdcW, graft.sed.PipelineQueries.CdcDiv,
      compactEvery = 3,
      retention = bid => if (bid == 2) horizon else Long.MinValue)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s0.read.parquet(outPath)
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_chars")
  }

  /** Substring-anchor dedup at ingest WITH RETENTION (round 16 — the
    * last index family under the retention gate): the documents table
    * replays as FOUR NTILE batches through the anchor-index loop
    * (SedStreaming.streamingSubstringDedup); the compaction after
    * batch 3 (compactEvery = 3) runs as dropBefore(horizon) with
    * horizon = min + 2/5 of the id range — anchors first seen before it
    * retire, the TEXT STORE physically drops pre-horizon docs,
    * tombstones go durable under _tombstones/batch=2, and batch 4
    * classifies against the retained index, RE-FOUNDING returning
    * retired content under fresh owners. Rows-only BY DESIGN like
    * q_stream_substring (the winnowed anchored path does not unroll in
    * SQL); StreamingSubstrSpec's retention case pins the trajectory —
    * per-era spans equal the from-scratch anchored operator, the
    * retired-repeat doc provably re-founds, tombstones enumerate the
    * forgotten anchors, and the retained text store holds exactly the
    * post-horizon ids. */
  def streamRetentionSubstr(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_retsubstr_feed")
    val docsDf = Tables.documents(s0, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val mm = docsDf.agg(min("doc_id"), max("doc_id")).first()
    val horizon = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 2 / 5
    SedStreaming.stageFileStreamNtile(docsDf, "doc_id", dir, chunks = 4)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val outPath = tmp("graft_retsubstr_out")
    // set-based foreachBatch body — split the batch scan (r18)
    splitScan(s, dir)
    val q = SedStreaming.streamingSubstringDedup(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "text",
      tmp("graft_retsubstr_idx"), outPath, tmp("graft_retsubstr_ck"),
      graft.sed.PipelineQueries.SubstrL,
      compactEvery = 3,
      retention = bid => if (bid == 2) horizon else Long.MinValue)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s0.read.parquet(outPath)
      .select("doc_id", "span_id", "span_start", "span_end")
  }

  /** Frame-sampled video dedup AT INGEST: the documents table's
    * synthetic payloads replayed as an ascending-id file feed into the
    * incremental chunk-index loop (SedStreaming.streamingVideoDedup) —
    * each micro-batch chunk-classifies its frame-token sequences
    * against the persisted index and admits its new hashes.
    * ORACLE-ELIGIBLE: per-video reports are FINAL at ingest
    * (corpus-order-first), so the accumulated outputs equal the batch
    * operator row-for-row and this shares q_video_cdc_dedup's oracle
    * VERBATIM. */
  def streamVideoDedup(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_video_feed")
    SedStreaming.stageFileStream(
      graft.operators.Multimodal.withPayload(
          Tables.documents(s0, d).select(col("doc_id").cast("long").as("doc_id"),
            col("text")), "text", "payload")
        .select("doc_id", "payload"),
      "doc_id", dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val outPath = tmp("graft_video_out")
    // set-based foreachBatch body — split the batch scan (r18)
    splitScan(s, dir)
    // compactEvery = 2: the chunk index compacts in-loop through the
    // GenIndex generation swap mid-feed, so the shared batch oracle
    // certifies ingest AND maintenance (the q_stream_leakage_split move)
    val q = SedStreaming.streamingVideoDedup(
      SedStreaming.fileStream(s, dir, schema), "doc_id", "payload",
      tmp("graft_video_idx"), outPath, tmp("graft_video_ck"),
      frameBytes = 64, stride = 1, compactEvery = 2)
    try { q.processAllAvailable(); recordPlan(q) } finally q.stop()
    s0.read.parquet(outPath)
      .select("doc_id", "n_frames", "n_chunks", "n_dup_chunks", "dup_chars")
  }

  /** Streaming cohort retention: the events feed through per-user
    * week-set state (calendar-bounded), (user, week) emitted exactly
    * once on first sight, folded to retention cells. ORACLE-ELIGIBLE:
    * the emitted set is arrival-order independent and the cohort is
    * computed at fold time, so this shares q_retention's DuckDB oracle
    * VERBATIM. */
  def streamRetention(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_retention_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(user_id AS BIGINT) AS user_id", "ts_us"), "ts_us", dir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType)))
    val weeks = runToParquet(s, SedStreaming.streamingRetention(
      SedStreaming.fileStream(s, dir, schema)))
    val f = weeks.groupBy("user_id").agg(min("w").as("cw"))
    weeks.join(f, "user_id")
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Streaming transition-matrix fit: the events table replayed as an
    * event-time-ordered file stream, per-user last-type state (one
    * string per user), (prev, next) edges emitted append-mode exactly
    * once, folded to the q_transitions contract rows. ORACLE-ELIGIBLE:
    * in-order replay reproduces the batch window lag exactly, so this
    * shares q_transitions' DuckDB oracle VERBATIM. */
  def streamTransitions(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_trans_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(user_id AS BIGINT) AS user_id", "ts_us",
        "CAST(event_id AS BIGINT) AS event_id", "event_type"),
      "ts_us", dir)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val edges = runToParquet(s, SedStreaming.streamingTransitions(
      SedStreaming.fileStream(s, dir, schema)))
    val c = edges.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_transitions"))
    val rowW = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
    c.withColumn("p", round(col("n_transitions").cast("double") /
        sum("n_transitions").over(rowW), 6))
      .select("prev_type", "next_type", "n_transitions", "p")
  }

  /** Streaming backward AS-OF enrichment: the events feed replayed in
    * event-time order, every 100th event doubling as a sensor reading
    * (the q_asof_join setup); per-key last-reading state — here ONE
    * global series, the keyed generalization is the operator's
    * signature — carries across micro-batches. ORACLE-ELIGIBLE:
    * in-order replay with equal-ts runs folding readings first (max-id
    * reading per timestamp wins, matching the batch ROW_NUMBER dedup)
    * equals the batch union+range-sort+fill plan, so this shares
    * q_asof_join's DuckDB ASOF LEFT JOIN oracle VERBATIM — one oracle
    * certifying batch and online as-of. */
  def streamAsof(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val dir = tmp("graft_asof_feed")
    SedStreaming.stageFileStream(Tables.events(s0, d)
      .selectExpr("CAST(0 AS BIGINT) AS k",
        "CAST(event_id AS BIGINT) AS event_id", "ts_us",
        "CASE WHEN event_id % 100 = 0 THEN CAST(value AS DOUBLE) END AS r"),
      "ts_us", dir)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("event_id", LongType),
      StructField("ts_us", LongType), StructField("r", DoubleType)))
    runToParquet(s, SedStreaming.streamingAsofEnrich(
      SedStreaming.fileStream(s, dir, schema), "k", "ts_us", "event_id", "r"))
      .select("event_id", "ts_us", "sensor_id", "reading")
  }

  /** Decontamination flag at ingest: the documents table replayed as a
    * file stream, each arriving doc scored map-only against a
    * driver-built Bloom over the eval docs' (doc_id % 97 == 0) shingle
    * hashes — stateless append-mode flagging, the cheap gate in front
    * of the exact offline pass. Rows-only (Bloom bit decisions have no
    * SQL twin); the no-false-negative guarantee vs exact decontam and
    * the file/batch twin equality are spec-pinned. */
  def streamDecontaminate(s0: SparkSession, d: String): DataFrame = {
    SedQueries.ensureConfs(s0)
    val s = streamSession(s0)
    val shingleN = 3
    val evalHashes = Tables.documents(s0, d)
      .filter(col("doc_id") % 97 === 0)
      .withColumn("__toks", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("__toks")) >= shingleN)
      .select(explode(org.apache.spark.sql.graft.ShingleHashes(
        col("__toks"), shingleN)).as("h"))
    val bf = evalHashes.stat.bloomFilter("h", 100000L, 0.01)
    val bc = s.sparkContext.broadcast(bf)
    val dir = tmp("graft_decontam_feed")
    SedStreaming.stageFileStream(Tables.documents(s0, d)
      .filter(col("doc_id") % 97 =!= 0)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text"), "doc_id", dir)
    // stateless map-only scoring: spread each single-file micro-batch
    // across the cores (r18, guide §6 — per-row results are independent
    // of scan partition layout, so the emitted SET is unchanged)
    splitScan(s, dir)
    runToParquet(s, SedStreaming.streamingDecontaminate(
      SedStreaming.fileStream(s, dir, dedupSchema), "doc_id", "text", bc, shingleN))
  }

  // ---- MemoryStream twins (spec evidence: feed-independence) ----------

  /** The same four chains fed from driver-side MemoryStream in event-time
    * -ordered chunks — kept as the equality twins FileStreamSpec holds
    * the contract entries against. Data added entirely before start would
    * be served as ONE batch (the MemoryStream read limit is
    * all-available), so addData is interleaved with processAllAvailable:
    * state carries across triggers and the watermark advances, the same
    * incremental execution the file source gets from maxFilesPerTrigger. */
  private[streaming] object memoryTwins {

    private val MaxChunkRows = 500000

    private def chunk3[T](rows: Seq[T]): Seq[Seq[T]] =
      rows.grouped(math.max(1,
        math.min(rows.length / 3 + 1, MaxChunkRows))).toSeq

    private def emptyStream[T <: Product : org.apache.spark.sql.Encoder](
        s: SparkSession): MemoryStream[T] = {
      implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
      MemoryStream[T]
    }

    private def runChunked(s: SparkSession, out: DataFrame, mode: String)
                          (feedChunk: Int => Unit, nChunks: Int): DataFrame = {
      val name = s"graft_stream_mem_${runCounter.incrementAndGet()}"
      val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
      try (0 until nChunks).foreach { i => feedChunk(i); q.processAllAvailable() }
      finally q.stop()
      s.table(name)
    }

    def streamSessionize(s0: SparkSession, d: String): DataFrame = {
      SedQueries.ensureConfs(s0)
      val s = streamSession(s0)
      import s.implicits._
      val rows = Tables.events(s0, d)
        .selectExpr("CAST(user_id AS BIGINT) AS u", "ts_us")
        .as[(Long, Long)].collect().sortBy(_._2).toSeq
      val ms = emptyStream[(Long, Long)](s)
      val cks = chunk3(rows)
      runChunked(s, sessionizeChain(ms.toDF().toDF("user_id", "ts_us")),
        "complete")(i => ms.addData(cks(i)), cks.size)
    }

    def streamEnrich(s0: SparkSession, d: String): DataFrame = {
      SedQueries.ensureConfs(s0)
      import s0.implicits._
      val base = Tables.events(s0, d)
        .selectExpr("CAST(event_id AS BIGINT) AS id", "ts_us",
          "CAST(value AS DOUBLE) AS v")
        .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
      // same SCALE-ADAPTIVE partition rule as the contract entry — the
      // SHARED chunksFor formula, so the twin exercises the shipped
      // configuration at every scale and cannot drift if RowsPerChunk
      // or the clamp changes
      val s = streamSession(s0, enrichStatePartitions(
        SedStreaming.chunksFor(base.length.toLong)))
      val sensorRows = base.filter(_._1 % 100 == 0)
      val evMs = emptyStream[(Long, Long, Double)](s)
      val snMs = emptyStream[(Long, Long, Double)](s)
      val evCks = chunk3(base)
      val snCks = chunk3(sensorRows)
      runChunked(s, enrichChain(
        evMs.toDF().toDF("event_id", "ts_us", "v"),
        snMs.toDF().toDF("sensor_id", "sts_us", "reading")), "append")({ i =>
        if (i < evCks.size) evMs.addData(evCks(i))
        if (i < snCks.size) snMs.addData(snCks(i))
      }, math.max(evCks.size, snCks.size))
    }

    def streamHistogram(s0: SparkSession, d: String): DataFrame = {
      SedQueries.ensureConfs(s0)
      val s = streamSession(s0)
      import s.implicits._
      val rows = Tables.events(s0, d)
        .selectExpr("ts_us", "CAST(value AS DOUBLE) AS v")
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      val ms = emptyStream[(Long, Double)](s)
      val cks = chunk3(rows)
      runChunked(s, histChain(ms.toDF().toDF("ts_us", "value")),
        "complete")(i => ms.addData(cks(i)), cks.size)
    }

    def streamDedup(s0: SparkSession, d: String): DataFrame = {
      SedQueries.ensureConfs(s0)
      val s = streamSession(s0)
      import s.implicits._
      val rows = Tables.documents(s0, d)
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val ms = emptyStream[(Long, String)](s)
      val cks = chunk3(rows)
      runChunked(s, dedupChain(ms.toDF().toDF("doc_id", "text")),
        "append")(i => ms.addData(cks(i)), cks.size)
    }

    def streamNearDedup(s0: SparkSession, d: String): DataFrame = {
      SedQueries.ensureConfs(s0)
      val s = streamSession(s0)
      import s.implicits._
      val rows = Tables.documents(s0, d)
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val ms = emptyStream[(Long, String)](s)
      val cks = chunk3(rows)
      runChunked(s, neardupChain(ms.toDF().toDF("doc_id", "text")),
        "append")(i => ms.addData(cks(i)), cks.size)
    }
  }

  /** Rows-only driver entries (streaming plans have no DuckDB twin). */
  val defs: Map[String, QueryDef] = rawDefs.map { case (n, qd) =>
    n -> qd.copy(build = (s, d) => {
      currentEntry.set(n)
      try qd.build(s, d) finally currentEntry.remove()
    })
  }

  private lazy val rawDefs: Map[String, QueryDef] = Map(
    // ORACLE-ELIGIBLE (promoted round 12): complete-mode session_window
    // over an event-time-ordered feed retains every session and merges
    // exactly like batch gap-break sessionization — two events share a
    // session iff the later one starts strictly inside the earlier's
    // [ts, ts+gap) window, so the oracle's break condition is
    // `diff >= gap` and session_end = max(ts) + gap. No event is ever
    // late (the feed ascends in ts), so the watermark only bounds state,
    // never output.
    "q_stream_sessionize" -> QueryDef((s, d) => streamSessionize(s, d),
      Some(s"""SELECT user_id, MIN(us) AS session_start_us,
            MAX(us) + $SessionGapUs AS session_end_us,
            CAST(COUNT(*) AS BIGINT) AS n_events
          FROM (
            SELECT user_id, us, CAST(SUM(brk) OVER w2 AS BIGINT) AS sess FROM (
              SELECT user_id, us,
                CASE WHEN us - LAG(us) OVER w >= $SessionGapUs THEN 1 ELSE 0 END AS brk
              FROM (SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS us
                    FROM events)
              WINDOW w AS (PARTITION BY user_id ORDER BY us))
            WINDOW w2 AS (PARTITION BY user_id ORDER BY us))
          GROUP BY user_id, sess""".replaceAll("\\s+", " "))),
    // ORACLE-ELIGIBLE (promoted round 12): an INNER stream-stream join
    // over in-ts-order feeds emits every in-tolerance pair exactly once
    // regardless of chunking — a sensor row needed by a future event
    // cannot have been evicted, because events arrive in ts order, so
    // any future match has ets > max(processed event ts) while eviction
    // requires sts + tolerance < min(max per source) - watermark delay;
    // with delay (30 min) > tolerance (10 min) the needed row always
    // survives. The bucketed equality key is a pure rewrite (each pair
    // shares exactly one bucket). So the result IS the batch tolerance
    // join, and the oracle states it directly.
    "q_stream_enrich" -> QueryDef((s, d) => streamEnrich(s, d),
      Some("""SELECT e.event_id, epoch_us(e.ts) AS ets_us,
            s.sensor_id, s.sts_us, s.reading
          FROM (SELECT CAST(event_id AS BIGINT) AS event_id, ts FROM events) e
          JOIN (SELECT CAST(event_id AS BIGINT) AS sensor_id, epoch_us(ts) AS sts_us,
                  CAST(value AS DOUBLE) AS reading
                FROM events WHERE event_id % 100 = 0) s
            ON s.sts_us <= epoch_us(e.ts)
           AND s.sts_us >= epoch_us(e.ts) - 600000000""".replaceAll("\\s+", " "))),
    // ORACLE-ELIGIBLE (promoted round 12): complete-mode tumbling-window
    // counts over an event-time-ordered feed retain every window and no
    // event is ever late, so the result IS the batch epoch-aligned
    // hour-window histogram; bin arithmetic comes from the same BinAxis
    // the chain bins with.
    "q_stream_hist" -> QueryDef((s, d) => streamHistogram(s, d),
      Some(s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
            ${HistAxis.idxSql("CAST(value AS DOUBLE)")} AS value_bin,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events
          WHERE ${HistAxis.inRangeSql("CAST(value AS DOUBLE)")}
          GROUP BY 1, 2""".replaceAll("\\s+", " "))),
    // ORACLE-ELIGIBLE (promoted round 13): the feed is staged with
    // deterministic NTILE chunk boundaries the oracle replays, and
    // StreamDedupSemanticsSpec pins the state semantics the SQL encodes
    // (no-extension entries, one-batch eviction lag, inclusive expiry
    // boundary, first-in-feed-order in-batch winner) — so the recursive
    // per-hash emission chain in DuckDB equals the streaming output
    // exactly, horizon re-emissions included.
    "q_stream_dedup" -> QueryDef((s, d) => streamDedup(s, d),
      Some(graft.sed.PipelineQueries.streamDedupOracle)),
    // ORACLE-ELIGIBLE (promoted round 13): same deterministic staging;
    // the oracle replays the minhash banding (the batch fragments,
    // verbatim) and the per-bucket keeper islands under the pinned
    // group-state timeout rule (no-data batch required, strict
    // watermark-past-timeout comparison).
    "q_stream_neardup" -> QueryDef((s, d) => streamNearDedup(s, d),
      Some(graft.sed.PipelineQueries.streamNearDupOracle)),
    "q_stream_decontam" -> QueryDef((s, d) => streamDecontaminate(s, d), None),
    "q_stream_winsorize" -> QueryDef((s, d) => streamWinsorize(s, d),
      Some(graft.operators.EventAnalytics.winsorizeSql(0.05, 0.95))),
    "q_stream_zscore" -> QueryDef((s, d) => streamZscore(s, d),
      Some(graft.operators.EventAnalytics.zscoreOutliersSql())),
    "q_stream_retention" -> QueryDef((s, d) => streamRetention(s, d),
      Some(graft.operators.EventAnalytics.retentionSql)),
    "q_stream_transitions" -> QueryDef((s, d) => streamTransitions(s, d),
      Some(graft.operators.EventAnalytics.transitionsSql)),
    "q_stream_funnel" -> QueryDef((s, d) => streamFunnel(s, d),
      Some(graft.operators.EventAnalytics.funnelSql(
        graft.operators.EventAnalytics.DefaultStages))),
    "q_stream_asof" -> QueryDef((s, d) => streamAsof(s, d),
      Some(SedQueries.AsofJoinOracle)),
    "q_stream_quality" -> QueryDef((s, d) => streamQuality(s, d),
      Some(graft.sed.PipelineQueries.qualityClassifierOracle)),
    "q_stream_substring" -> QueryDef((s, d) => streamSubstring(s, d), None),
    "q_stream_leakage_split" -> QueryDef((s, d) => streamLeakageSplit(s, d),
      Some(graft.sed.PipelineQueries.leakageSplitOracle)),
    // ORACLE-ELIGIBLE (round 14): deterministic NTILE batches; the
    // unrolled per-batch trajectory oracle replays classify-then-admit
    // with corpus := earlier batches' admitted docs, certifying the
    // managed dedup-ingest loop AND its mid-feed generation swap.
    "q_stream_dedup_ingest" -> QueryDef((s, d) => streamDedupIngest(s, d),
      Some(graft.sed.PipelineQueries.dedupIngestOracle)),
    // ORACLE-ELIGIBLE (round 14): the GDPR path under the driver gate —
    // end-of-feed retention compaction retires wholly-pre-horizon
    // clusters; the oracle is the from-scratch split restricted to kept
    // clusters (max rep id >= horizon), retired docs resolve nothing.
    "q_stream_retention_split" -> QueryDef((s, d) => streamRetentionSplit(s, d),
      Some(graft.sed.PipelineQueries.retentionSplitOracle)),
    // ORACLE-ELIGIBLE (round 15): chunk-index retention under the
    // driver gate — the mid-feed compaction retires pre-horizon-owned
    // chunk hashes, batch 4 classifies against the retained index
    // (retired content re-founds); the oracle is the unrolled NTILE
    // trajectory with the retire rule replayed in SQL.
    "q_stream_retention_chunks" -> QueryDef((s, d) => streamRetentionChunks(s, d),
      Some(graft.sed.PipelineQueries.retentionChunksOracle)),
    // rows-only BY DESIGN (round 16): substring-index retention under
    // the driver gate — mid-feed dropBefore retires anchors AND
    // physically drops pre-horizon texts; the winnowed anchored spans
    // don't unroll in SQL, so the trajectory is pinned by
    // StreamingSubstrSpec's retention case instead.
    "q_stream_retention_substr" -> QueryDef((s, d) => streamRetentionSubstr(s, d),
      None),
    "q_stream_video_dedup" -> QueryDef((s, d) => streamVideoDedup(s, d),
      Some(graft.sed.PipelineQueries.videoCdcOracle)),
    "q_stream_blocklist" -> QueryDef((s, d) => streamBlocklist(s, d),
      Some(graft.sed.PipelineQueries.blocklistOracle)),
    "q_stream_ppl" -> QueryDef((s, d) => streamPpl(s, d),
      Some(graft.sed.PipelineQueries.pplBucketsOracle)),
    "q_stream_ffill" -> QueryDef((s, d) => streamForwardFill(s, d),
      Some("""SELECT CAST(user_id AS VARCHAR) AS user_id, epoch_us(ts) AS ts_us,
          LAST_VALUE(CASE WHEN event_id % 10 = 0 THEN value ELSE NULL END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
          FROM events""".replaceAll("\\s+", " "))))
}
