package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream product analytics: conversion funnels, cohort retention,
  * transition matrices, and exact-arithmetic outlier detection.
  *
  * The reference (OpenCOMPES/sed) models per-event rows but ships no
  * product-analytics layer; these are the standard large-scale event
  * analytics a telemetry / training-data pipeline needs (brief §extras).
  * Every shape here is shuffle-minimal and state-bounded:
  *
  *  - '''funnel''': one filtered min-aggregation per stage (event_type
  *    predicate reaches the scan, map-side partial MIN), chained by an
  *    equi-join on the previous stage's (user, t) set — distinct-user
  *    sized, so AQE broadcasts it when small and shuffle-hash-joins when
  *    not. No per-user event list is ever materialized.
  *  - '''retention''': ONE shuffle — groupBy(user) carrying a
  *    `collect_set` of active week indices (bounded by the calendar, not
  *    the event count), then an in-row explode and a tiny second agg on
  *    (cohort, offset) — thousands of cells at any data size.
  *  - '''transitions''': ONE shuffle — a window lag over
  *    (user, time-order); the transition matrix is |event_type|² rows.
  *  - '''zscoreOutliers''': per-type moment aggregation in EXACT integer
  *    cents (map-side partials), broadcast back; the outlier predicate
  *    and z-score are derived from exact integer sums with IEEE +−×/√
  *    only, so both engines of a cross-check compute bit-identical
  *    doubles (no libm drift — the q1_agg cents discipline applied to
  *    second moments).
  *
  * Week arithmetic is integral (`ts_us div $WeekUs`) — no timezone or
  * calendar functions, so results are engine- and locale-independent.
  */
object EventAnalytics {

  /** Microseconds per 7-day week. */
  val WeekUs: Long = 7L * 24 * 3600 * 1000000L

  /** The canonical funnel stage sequence over the test generator's
    * event types, in product-journey order — shared by q_funnel and
    * q_stream_funnel so batch, streaming, and oracle stay aligned. */
  val DefaultStages: Seq[String] = Seq("view", "click", "signup", "purchase")

  /** Strict-order conversion funnel: stage k counts users whose first
    * qualifying `stages(k)` event happened strictly AFTER their first
    * qualifying `stages(k-1)` event. Returns one row per stage:
    * (stage_idx, stage, n_users, pct_of_first).
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts_us"): DataFrame = {
    val stageSets = stageTimes(events, stages, userCol, typeCol, tsCol)
    val counts = stageSets.zip(stages.zipWithIndex).map { case (df, (st, i)) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionAll _)
    // stage rows are a handful — the unpartitioned window is plot-sized
    val w = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL (not Infinity / NaN) when the first stage matched nobody —
    // mirrors the oracle's NULLIF so both engines agree on empty corpora.
    counts.withColumn("pct_of_first",
      when(first("n_users").over(w) > 0,
        round(col("n_users").cast("double") / first("n_users").over(w), 6)))
  }

  /** The per-stage first-qualifying-time sets (user, t) behind
    * [[funnel]] / [[funnelTiming]] — each |users| rows, chained by an
    * equi-join on the previous stage. */
  private def stageTimes(events: DataFrame, stages: Seq[String], userCol: String,
                         typeCol: String, tsCol: String): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    stages.zipWithIndex.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(userCol).agg(min(tsCol).as("t"))
    ) { case (prev, (st, _)) =>
      events.filter(col(typeCol) === st)
        .join(prev.select(col(userCol), col("t").as("__pt")), Seq(userCol))
        .filter(col(tsCol) > col("__pt"))
        .groupBy(userCol).agg(min(tsCol).as("t"))
    }
  }

  /** Time-to-convert per funnel transition: for each stage k ≥ 1, the
    * count of converting users and their mean (exact integer-µs sums)
    * delay from the previous stage's first-qualifying time. Same
    * stage-set chain as [[funnel]]; each timing row is a |users|-sized
    * equi-join (every stage-k user is a stage-(k−1) user by
    * construction). Returns (stage_idx, stage, n_users, avg_delay_us).
    */
  def funnelTiming(events: DataFrame, stages: Seq[String],
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts_us"): DataFrame = {
    require(stages.length >= 2, "funnelTiming needs at least two stages")
    val sets = stageTimes(events, stages, userCol, typeCol, tsCol)
    sets.zip(sets.tail).zip(stages.zipWithIndex.tail).map {
      case ((prev, cur), (st, i)) =>
        cur.join(prev.select(col(userCol), col("t").as("__pt")), Seq(userCol))
          .agg(count(lit(1)).as("n_users"),
            sum(col("t") - col("__pt")).as("__d"))
          .select(lit(i).as("stage_idx"), lit(st).as("stage"), col("n_users"),
            (col("__d").cast("double") / col("n_users")).as("avg_delay_us"))
    }.reduce(_ unionAll _)
      .filter(col("n_users") > 0)
  }

  /** DuckDB oracle for [[funnelTiming]] on the `events` table. */
  def funnelTimingSql(stages: Seq[String]): String = {
    require(stages.length >= 2)
    stages.foreach(s => require(!s.contains("'"), "stage must not contain quotes"))
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"s0 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events WHERE event_type = '$st' GROUP BY user_id)"
      else
        s"""s$i AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e
            JOIN s${i - 1} p USING (user_id)
            WHERE e.event_type = '$st' AND epoch_us(e.ts) > p.t
            GROUP BY e.user_id)"""
    }.mkString(", ")
    val unions = stages.zipWithIndex.tail.map { case (st, i) =>
      s"""SELECT $i AS stage_idx, '$st' AS stage,
          CAST(COUNT(*) AS BIGINT) AS n_users,
          CAST(CAST(SUM(c.t - p.t) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_delay_us
          FROM s$i c JOIN s${i - 1} p USING (user_id)"""
    }.mkString(" UNION ALL ")
    s"""WITH $ctes SELECT * FROM ($unions) WHERE n_users > 0"""
      .replaceAll("\\s+", " ")
  }

  /** DuckDB oracle for [[funnel]] on the `events` table. */
  def funnelSql(stages: Seq[String]): String = {
    require(stages.nonEmpty)
    stages.foreach(s => require(!s.contains("'"), "stage must not contain quotes"))
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"s0 AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events WHERE event_type = '$st' GROUP BY user_id)"
      else
        s"""s$i AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e
            JOIN s${i - 1} p USING (user_id)
            WHERE e.event_type = '$st' AND epoch_us(e.ts) > p.t
            GROUP BY e.user_id)"""
    }.mkString(", ")
    val unions = stages.zipWithIndex.map { case (st, i) =>
      s"SELECT $i AS stage_idx, '$st' AS stage, (SELECT COUNT(*) FROM s$i) AS n_users"
    }.mkString(" UNION ALL ")
    s"""WITH $ctes, c AS ($unions)
       SELECT stage_idx, stage, n_users,
         ROUND(CAST(n_users AS DOUBLE) /
           NULLIF((SELECT n_users FROM c WHERE stage_idx = 0), 0), 6)
           AS pct_of_first
       FROM c""".replaceAll("\\s+", " ")
  }

  /** Weekly cohort retention: cohort = a user's first active epoch-week;
    * one output row per (cohort_week, week_offset) with the count of
    * cohort users active that week. ONE wide shuffle (per-user week set).
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts_us"): DataFrame = {
    val perUser = events
      .select(col(userCol), expr(s"$tsCol div $WeekUs").as("w"))
      .groupBy(userCol).agg(collect_set(col("w")).as("ws"))
    perUser
      .select(array_min(col("ws")).as("cw"), explode(col("ws")).as("w"))
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB oracle for [[retention]] on the `events` table. */
  val retentionSql: String =
    s"""WITH uw AS (SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS w FROM events),
       f AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id)
       SELECT cw AS cohort_week, w - cw AS week_offset, COUNT(*) AS n_users
       FROM uw JOIN f USING (user_id) GROUP BY 1, 2""".replaceAll("\\s+", " ")

  /** Microseconds per day. */
  val DayUs: Long = 24L * 3600 * 1000000L

  /** Rolling active users: per active day, DAU plus trailing-7-day WAU
    * and trailing-30-day MAU. The standard engagement dashboard, in the
    * compressed (user, day) domain: ONE distinct collapses the event
    * stream (shuffle ∝ user-days, not events); each rolling count
    * explodes a user-day into its covered target days IN-ROW (≤ 30
    * rows) and re-distincts — work bounded by user-days × window, never
    * by raw event count. Day math is integral `ts_us div`, engine- and
    * timezone-independent. Returns (day, dau, wau, mau) for days with
    * ≥ 1 active user. */
  def activeUsers(events: DataFrame, userCol: String = "user_id",
                  tsCol: String = "ts_us"): DataFrame = {
    // ONE derivation of the distinct user-day base (the naive
    // three-branch dau/wau/mau plan recomputed the 100M-row distinct
    // per branch — measured 131 s → 35 s at 1e8 events): each user-day
    // covers its next 30 days with its offset, MIN(offset) per
    // (user, target day) says how recently the user was active, and one
    // conditional aggregation reads all three counters off it.
    val ud = events.select(col(userCol), expr(s"$tsCol div $DayUs").as("day")).distinct()
    val cov = ud
      .select(col(userCol), col("day"), explode(sequence(lit(0L), lit(29L))).as("o"))
      .groupBy(col(userCol), (col("day") + col("o")).as("day"))
      .agg(min("o").as("mo"))
    cov.groupBy("day").agg(
      sum(when(col("mo") === 0, 1L).otherwise(0L)).as("dau"),
      sum(when(col("mo") <= 6, 1L).otherwise(0L)).as("wau"),
      count(lit(1)).as("mau"))
      .filter(col("dau") > 0)
  }

  /** DuckDB oracle for [[activeUsers]] on the `events` table. */
  val activeUsersSql: String =
    s"""SELECT * FROM (
         SELECT day,
           CAST(SUM(CASE WHEN mo = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dau,
           CAST(SUM(CASE WHEN mo <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS wau,
           CAST(COUNT(*) AS BIGINT) AS mau
         FROM (
           SELECT user_id, td AS day, MIN(o) AS mo FROM (
             SELECT user_id, day + o AS td, o FROM
               (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events) ud,
               UNNEST(range(0, 30)) AS t(o))
           GROUP BY user_id, td)
         GROUP BY day)
       WHERE dau > 0""".replaceAll("\\s+", " ")

  /** First-order transition matrix over per-user time-ordered event
    * types: (prev_type, next_type, n_transitions, p) where p is the
    * row-normalized transition probability. ONE shuffle (the window
    * lag); the matrix itself is |event_type|² rows.
    */
  def transitions(events: DataFrame, userCol: String = "user_id",
                  typeCol: String = "event_type", tsCol: String = "ts_us",
                  idCol: String = "event_id"): DataFrame = {
    // Dictionary-encode the type BEFORE the wide shuffle: the hot path
    // (one exchange + sort + lag over the full stream) then carries a
    // fixed-width int surrogate instead of strings — UnsafeRow sort and
    // lag comparisons go pointer-free, and shuffle bytes drop ~40%
    // (measured 176 s → 75 s at 1e8 events). The dim table is
    // a tiny partial-agg distinct, broadcast both ways; names re-attach
    // at the |types|²-row matrix level.
    // NULL types are dropped EXPLICITLY (not silently via the inner
    // dictionary join) so the contract matches the oracle's WHERE clause
    // by construction: a NULL event row contributes no transition pair.
    val nonNull = events.filter(col(typeCol).isNotNull)
    val dim = nonNull.select(col(typeCol).as("__t")).distinct()
      .withColumn("__tid",
        row_number().over(Window.orderBy("__t")).cast("int"))
    val enc = nonNull
      .join(broadcast(dim), nonNull(typeCol) === dim("__t"))
      .select(col(userCol), col(tsCol), col(idCol), col("__tid"))
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val c = enc
      .select(col("__tid").as("__nid"), lag(col("__tid"), 1).over(w).as("__pid"))
      .filter(col("__pid").isNotNull)
      .groupBy("__pid", "__nid").agg(count(lit(1)).as("n_transitions"))
    val named = c
      .join(broadcast(dim.select(col("__tid").as("__pid"), col("__t").as("prev_type"))), "__pid")
      .join(broadcast(dim.select(col("__tid").as("__nid"), col("__t").as("next_type"))), "__nid")
    val rowW = Window.partitionBy("prev_type")
    named.withColumn("p",
      round(col("n_transitions").cast("double") / sum("n_transitions").over(rowW), 6))
      .select("prev_type", "next_type", "n_transitions", "p")
  }

  /** DuckDB oracle for [[transitions]] on the `events` table. */
  val transitionsSql: String =
    """WITH t AS (SELECT event_type AS next_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
         FROM events WHERE event_type IS NOT NULL),
       c AS (SELECT prev_type, next_type, COUNT(*) AS n_transitions
         FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, n_transitions,
         ROUND(CAST(n_transitions AS DOUBLE) /
           CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
       FROM c""".replaceAll("\\s+", " ")

  /** Per-type winsorization: clamp a 2-decimal value column to its
    * [pLo, pHi] DISCRETE quantile band (smallest value whose cumulative
    * count reaches p·n — ties share a cumulative rank, so the cut is
    * unambiguous). The robust-clipping cleaning step that tames heavy
    * tails without dropping rows. No per-row sort: thresholds come from
    * a (type, cents)-HISTOGRAM cumulative window (distinct-value-
    * bounded, the `Mixture.qualityFloor` shape) and broadcast back.
    * Returns (idCol, typeCol, valCol, w_value). */
  def winsorize(events: DataFrame, pLo: Double, pHi: Double,
                idCol: String = "event_id", typeCol: String = "event_type",
                valCol: String = "value"): DataFrame =
    clampWithThresholds(
      withCents(events, idCol, typeCol, valCol)
        .join(broadcast(winsorizeThresholds(events, pLo, pHi, typeCol, valCol)), typeCol),
      idCol, typeCol, valCol)

  /** The per-type (lo, hi) clamp band at the discrete [pLo, pHi]
    * quantiles — the OFFLINE model of the two-phase deployment (the
    * streaming path broadcasts it against live events). */
  def winsorizeThresholds(events: DataFrame, pLo: Double, pHi: Double,
                          typeCol: String = "event_type",
                          valCol: String = "value"): DataFrame = {
    require(0.0 < pLo && pLo < pHi && pHi < 1.0, s"need 0 < $pLo < $pHi < 1")
    val hist = events
      .select(col(typeCol), floor(col(valCol) * 100 + 0.5).cast("long").as("__vc"))
      .groupBy(typeCol, "__vc").agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(typeCol).orderBy("__vc")
    val wAll = Window.partitionBy(typeCol)
    hist
      .withColumn("__cm", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(wAll))
      .groupBy(typeCol).agg(
        min(when(col("__cm").cast("double") >= lit(pLo) * col("__n").cast("double"),
          col("__vc"))).as("__lo"),
        min(when(col("__cm").cast("double") >= lit(pHi) * col("__n").cast("double"),
          col("__vc"))).as("__hi"))
  }

  /** The shared clamp step: expects [[withCents]] columns joined with a
    * [[winsorizeThresholds]] row per type. */
  private[graft] def clampWithThresholds(joined: DataFrame, idCol: String,
                                         typeCol: String, valCol: String): DataFrame =
    joined.select(col(idCol), col(typeCol), col(valCol),
      (least(greatest(col("__vc"), col("__lo")), col("__hi")).cast("double") /
        lit(100.0)).as("w_value"))

  /** DuckDB oracle for [[winsorize]] on the `events` table. */
  def winsorizeSql(pLo: Double, pHi: Double): String = {
    import graft.functions.SedFunctions.d2s
    s"""WITH ev AS (SELECT event_id, event_type, value,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
       h AS (SELECT event_type, vc, COUNT(*) AS c FROM ev GROUP BY 1, 2),
       cum AS (SELECT event_type, vc,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY vc) AS BIGINT) AS cm,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM h),
       thr AS (SELECT event_type,
         MIN(CASE WHEN CAST(cm AS DOUBLE) >= ${d2s(pLo)} * CAST(n AS DOUBLE) THEN vc END) AS lo,
         MIN(CASE WHEN CAST(cm AS DOUBLE) >= ${d2s(pHi)} * CAST(n AS DOUBLE) THEN vc END) AS hi
         FROM cum GROUP BY 1)
       SELECT event_id, ev.event_type, value,
         CAST(LEAST(GREATEST(vc, lo), hi) AS DOUBLE) / 100.0E0 AS w_value
       FROM ev JOIN thr USING (event_type)""".replaceAll("\\s+", " ")
  }

  /** Per-type z-score outliers (|z| > k) on a 2-decimal value column.
    * Moments fold in exact integer cents, so mean/variance — and the
    * outlier predicate — are bit-identical across engines; only rows
    * with (v−μ)² > k²·σ² (strict) survive. Returns
    * (event_id, event_type, value, z) with z rounded to 6 dp.
    *
    * Scale: the moment table is |event_type| rows (broadcast back);
    * int64 second moments hold to ~9e18 / (max_cents²) rows per type —
    * ~9·10¹⁰ rows at cents ≤ 10⁴, beyond which widen to decimal.
    */
  def zscoreOutliers(events: DataFrame, k: Int = 2,
                     idCol: String = "event_id", typeCol: String = "event_type",
                     valCol: String = "value"): DataFrame =
    flagOutliers(withCents(events, idCol, typeCol, valCol)
      .join(broadcast(momentStats(events, typeCol, valCol)), typeCol),
      k, idCol, typeCol, valCol)

  /** (idCol, typeCol, valCol, __vc) — the exact-cents projection the
    * scoring runs on; shared by the batch and streaming paths. */
  private[graft] def withCents(events: DataFrame, idCol: String,
                               typeCol: String, valCol: String): DataFrame =
    events.select(col(idCol), col(typeCol), col(valCol),
      floor(col(valCol) * 100 + 0.5).cast("long").as("__vc"))

  /** Per-type exact-cents moment table (typeCol, __n, __s, __ss) — the
    * OFFLINE model of the two-phase anomaly-detection deployment; the
    * streaming path broadcasts it against live events. */
  def momentStats(events: DataFrame, typeCol: String = "event_type",
                  valCol: String = "value"): DataFrame =
    events.select(col(typeCol), floor(col(valCol) * 100 + 0.5).cast("long").as("__vc"))
      .groupBy(typeCol).agg(
        count(lit(1)).as("__n"), sum("__vc").as("__s"),
        sum(col("__vc") * col("__vc")).as("__ss"))

  /** The shared scoring step: expects the [[withCents]] columns joined
    * with a [[momentStats]] row per event type. */
  private[graft] def flagOutliers(joined: DataFrame, k: Int, idCol: String,
                                  typeCol: String, valCol: String): DataFrame = {
    val m = col("__s").cast("double") / col("__n")
    val j = joined
      .withColumn("__m", m)
      .withColumn("__v", col("__ss").cast("double") / col("__n") - m * m)
      .withColumn("__d", col("__vc").cast("double") - col("__m"))
    j.filter(col("__v") > 0 && col("__d") * col("__d") > lit(k * k).cast("double") * col("__v"))
      .select(col(idCol), col(typeCol), col(valCol),
        round(col("__d") / sqrt(col("__v")), 6).as("z"))
  }

  /** Two-arm A/B comparison per event type: arm = user-hash parity (a
    * deterministic 50/50 split), per (type, arm) moments folded in
    * EXACT integer cents (one groupBy(type) with conditional partial
    * aggs — |type| output rows), Welch's t derived from the exact sums
    * with IEEE +−×/√ only, so the statistic is engine-bit-identical
    * (rounded to 6 dp for reporting). Returns one row per event type:
    * (typeCol, n_a, n_b, mean_a, mean_b, diff, t). */
  def abTest(events: DataFrame, userCol: String = "user_id",
             typeCol: String = "event_type", valCol: String = "value"): DataFrame = {
    val ev = events.select(col(typeCol), (col(userCol) % 2).as("__arm"),
      floor(col(valCol) * 100 + 0.5).cast("long").as("__vc"))
    val a = col("__arm") === 0
    val st = ev.groupBy(typeCol).agg(
      sum(when(a, 1L).otherwise(0L)).as("__na"),
      sum(when(a, col("__vc"))).as("__sa"),
      sum(when(a, col("__vc") * col("__vc"))).as("__ssa"),
      sum(when(!a, 1L).otherwise(0L)).as("__nb"),
      sum(when(!a, col("__vc"))).as("__sb"),
      sum(when(!a, col("__vc") * col("__vc"))).as("__ssb"))
    val na = col("__na").cast("double"); val nb = col("__nb").cast("double")
    val ma = col("__sa").cast("double") / na / 100.0
    val mb = col("__sb").cast("double") / nb / 100.0
    // sample variances in cents^2, from exact sums
    val va = (col("__ssa").cast("double") - col("__sa").cast("double") * col("__sa").cast("double") / na) / (na - 1)
    val vb = (col("__ssb").cast("double") - col("__sb").cast("double") * col("__sb").cast("double") / nb) / (nb - 1)
    st.filter(col("__na") >= 2 && col("__nb") >= 2)
      .select(col(typeCol), col("__na").as("n_a"), col("__nb").as("n_b"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round(ma - mb, 6).as("diff"),
        round((ma - mb) * 100.0 / sqrt(va / na + vb / nb), 6).as("t"))
  }

  /** DuckDB oracle for [[abTest]] on the `events` table. */
  val abTestSql: String =
    """WITH ev AS (SELECT event_type, user_id % 2 AS arm,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
       st AS (SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN arm = 0 THEN vc END) AS BIGINT) AS sa,
         CAST(SUM(CASE WHEN arm = 0 THEN vc * vc END) AS BIGINT) AS ssa,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN arm = 1 THEN vc END) AS BIGINT) AS sb,
         CAST(SUM(CASE WHEN arm = 1 THEN vc * vc END) AS BIGINT) AS ssb
         FROM ev GROUP BY event_type)
       SELECT event_type, na AS n_a, nb AS n_b,
         ROUND(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0E0, 6) AS mean_a,
         ROUND(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0E0, 6) AS mean_b,
         ROUND(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0E0 -
               CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0E0, 6) AS diff,
         ROUND((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0E0 -
                CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0E0) * 100.0E0 /
           SQRT(((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)) / CAST(na AS DOUBLE) +
                ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)) / CAST(nb AS DOUBLE)), 6) AS t
       FROM st WHERE na >= 2 AND nb >= 2""".replaceAll("\\s+", " ")

  /** DuckDB oracle for [[zscoreOutliers]] on the `events` table. */
  def zscoreOutliersSql(k: Int = 2): String =
    s"""WITH ev AS (SELECT event_id, event_type, value,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vc FROM events),
       st AS (SELECT event_type, COUNT(*) AS n, SUM(vc) AS s, SUM(vc * vc) AS ss
         FROM ev GROUP BY event_type),
       j AS (SELECT event_id, ev.event_type, value,
         CAST(vc AS DOUBLE) - CAST(s AS DOUBLE) / n AS d,
         CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS v
         FROM ev JOIN st USING (event_type))
       SELECT event_id, event_type, value, ROUND(d / SQRT(v), 6) AS z
       FROM j WHERE v > 0 AND d * d > CAST(${k * k} AS DOUBLE) * v"""
      .replaceAll("\\s+", " ")
}
