package graft.sed

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SedFunctions
import graft.functions.SedFunctions._
import graft.operators.{BinAxis, Binning, ColumnOffset, DfOps, EdgeAxis}

/** One driver-contract query: a Spark builder plus (optionally) the
  * structurally identical DuckDB oracle SQL. */
case class QueryDef(build: (SparkSession, String) => DataFrame, sql: Option[String])

/** The sed-derived query inventory (SURVEY.md §2, dfops + calibrators +
  * binning sections). Every query parameterizes over the sf directory and
  * shares its numeric constants between the Spark plan and the oracle SQL
  * through the twin `...Sql` emitters in [[SedFunctions]], so both engines
  * evaluate bit-identical IEEE arithmetic.
  */
object SedQueries {

  /** Confs queries need regardless of who built the session. The test
    * `events.ts` column has been generated both as parquet
    * TIMESTAMP(NANOS) (read via the nanosAsLong legacy mode as int64
    * nanoseconds) and as timestamp[us] (read as TIMESTAMP_NTZ); both are
    * normalized to a single `ts_us` µs contract in [[Tables.events]],
    * which needs the session zone pinned to UTC so the NTZ read matches
    * DuckDB's `epoch_us`. */
  def ensureConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // right-size the reduce side for the local[32] target (Spark's 200
    // default just fragments these workloads); harmless when the host
    // session already set something else runtime-specific.
    if (spark.conf.get("spark.sql.shuffle.partitions") == "200")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  private def events(spark: SparkSession, dir: String): DataFrame = {
    ensureConfs(spark)
    Tables.events(spark, dir)
  }

  // ---- shared physics parameters (single source for Spark + oracle) ----
  // TOF bin number derived from the synthetic `value` column: realistic
  // tens-of-thousands bin range, as in a DLD TOF column.
  private def tofCol(df: DataFrame): Column = df("value") * lit(100.0) + lit(10000.0)
  /** q_asof_join's DuckDB ASOF LEFT JOIN oracle — shared VERBATIM with
    * q_stream_asof (the online twin): one oracle certifying both the
    * batch union+range-sort+fill plan and the streaming per-key
    * last-reading state path. */
  private[graft] val AsofJoinOracle: String =
    """SELECT e.event_id, e.ts_us, r.sensor_id, r.reading
      FROM (SELECT event_id, epoch_us(ts) AS ts_us FROM events) e
      ASOF LEFT JOIN (
        SELECT sensor_id, sts_us, reading FROM (
          SELECT event_id AS sensor_id, epoch_us(ts) AS sts_us,
            CAST(value AS DOUBLE) AS reading,
            ROW_NUMBER() OVER (PARTITION BY epoch_us(ts) ORDER BY event_id DESC) AS rn
          FROM events WHERE event_id % 100 = 0) WHERE rn = 1) r
      ON e.ts_us >= r.sts_us""".replaceAll("\\s+", " ")

  private val tofSql = "(value * 100.0E0 + 10000.0E0)"

  private val TofDistance = 0.9       // m
  private val TimeOffset = 1.0e-8     // s
  private val Binwidth = 4.125e-12    // s/bin
  private val BinningF = 1
  private val EnergyOffset = -10.0    // eV
  private val PolyA = Seq(1.5e-13, -4.0e-9, 6.0e-4) // highest order first
  private val CtrX = 250.0; private val CtrY = 75.0 // correction center (x=value, y=user_id)
  private val SectorDelays = Seq(0.0, 12.5, -7.25, 3.75, -2.5, 8.0, -11.0, 5.5)
  private val AdcRange = (0.0, 500.0)
  private val DelayRangeMm = (-10.0, 10.0)
  private val Time0Mm = 1.5
  private val DelayRange = (mmToPs(DelayRangeMm._1, Time0Mm), mmToPs(DelayRangeMm._2, Time0Mm))
  // momentum calibration: the append_k_axis constants come from the
  // two-point symmetry fit (momentum.py:1612 calibrate), not hand entry —
  // a 512×128 momentum map binned over detector ranges (0,1024)×(0,128),
  // symmetry point b at pixel (256,64) = the k-space origin, point a at
  // (356,114) with known k-coordinate (1.31, 0.605)
  private val KCal = graft.calibrate.MomentumCalibration.calibrateTwoPoint(
    nRows = 512, nCols = 128, pointA = (356.0, 114.0), pointB = (256.0, 64.0),
    kCoordA = (1.31, 0.605), binRanges = ((0.0, 1024.0), (0.0, 128.0)))
  private val KxStart = KCal.rStart; private val KxCenter = KCal.xCenter
  private val KxScale = KCal.kxScale; private val KxStep = KCal.rStep
  private val KyStart = KCal.cStart; private val KyCenter = KCal.yCenter
  private val KyScale = KCal.kyScale; private val KyStep = KCal.cStep
  // interp knots: external "sensor" time series over the events' ts span
  private val KnotTs = Seq(1.7040672e9, 1.704672e9, 1.7052768e9, 1.7058816e9, 1.7067456e9)
  private val KnotVal = Seq(20.0, 22.5, 19.0, 25.0, 21.0)

  // Epoch seconds (double) from the normalized ts_us column (Tables
  // floors to the µs grid — the only precision DuckDB's timestamp
  // functions carry — so both engines divide the same integer).
  private def esCol(df: DataFrame): Column =
    col("ts_us").cast("double") / lit(1.0e6)
  private val esSql = "(CAST(epoch_us(ts) AS DOUBLE) / 1.0E6)"

  /** Deterministic demo deformation field: 9 landmarks on a 3×3 grid with
    * a smooth sinusoidal distortion, TPS-solved once on the driver. */
  lazy val DfieldGrid: graft.calibrate.MomentumCorrection.Dfield = {
    val tgt = for (i <- Seq(0.0, 32.0, 63.0); j <- Seq(0.0, 32.0, 63.0)) yield (i, j)
    val srcR = tgt.map { case (i, j) => i + 1.5 * math.sin(j / 63.0 * math.Pi) }
    val srcC = tgt.map { case (i, j) => j - 1.2 * math.sin(i / 63.0 * math.Pi) }
    graft.calibrate.MomentumCorrection.splineWarp(
      srcR.toArray, srcC.toArray,
      tgt.map(_._1).toArray, tgt.map(_._2).toArray, 64, 64)
  }

  // histogram axes
  private val ValueEdges = Array(0.0, 10.0, 25.0, 50.0, 100.0, 200.0, 350.0, 500.0)
  private val UserEdges = Array(0.0, 50.0, 120.0, 150.0)
  private val AxValue = BinAxis("value", 100, 0.0, 500.0)
  private val AxValue50 = BinAxis("value", 50, 0.0, 500.0)
  private val AxUser = BinAxis("user_id", 30, 0.0, 150.0)
  private val AxM = BinAxis("m", 20, 0.0, 97.0)

  val defs: Map[String, QueryDef] = Map(

    // ---------------- dfops ----------------
    "q_filter" -> QueryDef(
      (s, d) => DfOps.applyFilter(events(s, d), "value", 50.0, 400.0)
        .select("event_id", "value", "user_id"),
      Some("SELECT event_id, value, user_id FROM events WHERE value > 50.0 AND value < 400.0")),

    "q_drop_column" -> QueryDef(
      (s, d) => DfOps.dropColumns(events(s, d), Seq("props", "ts_us")),
      Some("SELECT event_id, user_id, event_type, value FROM events")),

    "q_jitter_uniform" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        DfOps.applyJitter(df, Seq("value"), "event_id", 0.5, "uniform")
          .select("event_id", "value_jittered")
      },
      Some(s"SELECT event_id, ${jitterUniformSql("value", "event_id", 0.5, 1L)} AS value_jittered FROM events")),

    "q_jitter_normal" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        DfOps.applyJitter(df, Seq("value"), "event_id", 0.5, "normal")
          .select("event_id", "value_jittered")
      },
      Some(s"SELECT event_id, ${jitterNormalSql("value", "event_id", 0.5, 1L)} AS value_jittered FROM events")),

    "q_forward_fill" -> QueryDef(
      (s, d) => {
        val df = events(s, d).withColumn("value_sparse",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
          .select("event_id", "value_sparse")
        DfOps.forwardFill(df, "event_id", Seq("value_sparse"))
          .withColumnRenamed("value_sparse", "value_filled")
      },
      Some("""SELECT event_id, LAST_VALUE(value_sparse IGNORE NULLS) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled FROM (SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_sparse FROM events)""")),

    "q_backward_fill" -> QueryDef(
      (s, d) => {
        val df = events(s, d).withColumn("value_sparse",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
          .select("event_id", "value_sparse")
        DfOps.backwardFill(df, "event_id", Seq("value_sparse"))
          .withColumnRenamed("value_sparse", "value_filled")
      },
      Some("""SELECT event_id, FIRST_VALUE(value_sparse IGNORE NULLS) OVER (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value_filled FROM (SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_sparse FROM events)""")),

    "q_offset_mean" -> QueryDef(
      (s, d) => DfOps.offsetByOtherColumns(events(s, d), "value",
        Seq(ColumnOffset("value", 1.5, Some("mean"))), "value_off")
        .select("event_id", "value_off"),
      Some(s"SELECT event_id, value + 1.5 * (SELECT ${DfOps.exactMeanSql("value")} FROM events) AS value_off FROM events")),

    "q_offset_columns" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.withColumn("value_off",
          df("value") + lit(0.5) * df("user_id") + lit(-0.001) * df("event_id"))
          .select("event_id", "value_off")
      },
      Some("SELECT event_id, value + 0.5E0 * user_id + -0.001E0 * event_id AS value_off FROM events")),

    "q_timestamped_data" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        DfOps.addTimeStampedData(df, esCol(df), "temperature", KnotTs, KnotVal)
          .select("event_id", "temperature")
      },
      Some(s"SELECT event_id, ${interp1dSql(esSql, KnotTs, KnotVal)} AS temperature FROM events")),

    "q_map_2d" -> QueryDef(
      (s, d) => DfOps.mapColumns2d(events(s, d),
        (x, y) => (x + lit(0.1) * y, y - lit(0.002) * x * x),
        "value", "user_id", "xm", "ym").select("event_id", "xm", "ym"),
      Some("SELECT event_id, value + 0.1E0 * user_id AS xm, user_id - 0.002E0 * value * value AS ym FROM events")),

    // ---------------- energy calibration ----------------
    "q_tof2ev" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.select(df("event_id"),
          tof2ev(tofCol(df), TofDistance, TimeOffset, Binwidth, BinningF, "kinetic", EnergyOffset).as("energy"))
      },
      Some(s"SELECT event_id, ${tof2evSql(tofSql, TofDistance, TimeOffset, Binwidth, BinningF, "kinetic", EnergyOffset)} AS energy FROM events")),

    "q_tof2evpoly" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.select(df("event_id"), tof2evpoly(tofCol(df), PolyA, EnergyOffset).as("energy"))
      },
      Some(s"SELECT event_id, ${tof2evpolySql(tofSql, PolyA, EnergyOffset)} AS energy FROM events")),

    "q_tof2ns" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.select(df("event_id"), tof2ns(tofCol(df), Binwidth, BinningF).as("tof_ns"))
      },
      Some(s"SELECT event_id, ${tof2nsSql(tofSql, Binwidth, BinningF)} AS tof_ns FROM events")),

    "q_energy_corr_spherical" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val corr = energyCorrectionSpherical(df("value"), df("user_id").cast("double"), CtrX, CtrY, 1.0, 3000.0)
        df.select(df("event_id"), (tofCol(df) + corr).as("tof_corr"))
      },
      Some(s"SELECT event_id, $tofSql + ${energyCorrectionSphericalSql("value", "CAST(user_id AS DOUBLE)", CtrX, CtrY, 1.0, 3000.0)} AS tof_corr FROM events")),

    "q_energy_corr_lorentzian" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val corr = energyCorrectionLorentzian(df("value"), df("user_id").cast("double"), CtrX, CtrY, 0.8, 700.0)
        df.select(df("event_id"), (tofCol(df) + corr).as("tof_corr"))
      },
      Some(s"SELECT event_id, $tofSql + ${energyCorrectionLorentzianSql("value", "CAST(user_id AS DOUBLE)", CtrX, CtrY, 0.8, 700.0)} AS tof_corr FROM events")),

    "q_energy_corr_gaussian" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val corr = energyCorrectionGaussian(df("value"), df("user_id").cast("double"), CtrX, CtrY, 0.8, 700.0)
        // EXP differs by 1 ULP between JVM and libm on rare inputs; round
        // to 1e-6 (values are O(1e4)) on both sides for a stable compare.
        df.select(df("event_id"), round(tofCol(df) + corr, 6).as("tof_corr"))
      },
      Some(s"SELECT event_id, ROUND($tofSql + ${energyCorrectionGaussianSql("value", "CAST(user_id AS DOUBLE)", CtrX, CtrY, 0.8, 700.0)}, 6) AS tof_corr FROM events")),

    "q_energy_corr_lorentzian_asym" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val corr = energyCorrectionLorentzianAsym(df("value"), df("user_id").cast("double"), CtrX, CtrY, 0.8, 700.0, 0.5, 500.0)
        df.select(df("event_id"), (tofCol(df) + corr).as("tof_corr"))
      },
      Some(s"SELECT event_id, $tofSql + ${energyCorrectionLorentzianAsymSql("value", "CAST(user_id AS DOUBLE)", CtrX, CtrY, 0.8, 700.0, 0.5, 500.0)} AS tof_corr FROM events")),

    "q_sector_align" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.select(df("event_id"),
          sectorAlign(tofCol(df), (df("event_id") % 8).cast("int"), SectorDelays).as("tof_aligned"))
      },
      Some(s"SELECT event_id, ${sectorAlignSql(tofSql, "CAST(event_id % 8 AS INTEGER)", SectorDelays)} AS tof_aligned FROM events")),

    "q_energy_offsets" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val withE = df.withColumn("energy",
          tof2ev(tofCol(df), TofDistance, TimeOffset, Binwidth, BinningF, "kinetic", EnergyOffset))
        DfOps.offsetByOtherColumns(withE, "energy",
          Seq(ColumnOffset("value", 0.02, None, preserveMean = true)), "energy_off")
          .select("event_id", "energy_off")
      },
      Some(s"SELECT event_id, ${tof2evSql(tofSql, TofDistance, TimeOffset, Binwidth, BinningF, "kinetic", EnergyOffset)} + 0.02 * value - 0.02 * (SELECT ${DfOps.exactMeanSql("value")} FROM events) AS energy_off FROM events")),

    // ---------------- momentum ----------------
    "q_k_axis" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.select(df("event_id"),
          detectorToK(df("value"), KxStart, KxCenter, KxScale, KxStep).as("kx"),
          detectorToK(df("user_id").cast("double"), KyStart, KyCenter, KyScale, KyStep).as("ky"))
      },
      Some(s"SELECT event_id, ${detectorToKSql("value", KxStart, KxCenter, KxScale, KxStep)} AS kx, ${detectorToKSql("CAST(user_id AS DOUBLE)", KyStart, KyCenter, KyScale, KyStep)} AS ky FROM events")),

    "q_pose_transform" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val (nx, ny) = poseTransform(df("value"), df("user_id").cast("double"),
          scale = 1.05, angleRad = 0.3, centerX = 250.0, centerY = 75.0, xTrans = 4.0, yTrans = -2.0)
        df.select(df("event_id"), nx.as("xt"), ny.as("yt"))
      }, {
        val (nx, ny) = poseTransformSql("value", "CAST(user_id AS DOUBLE)",
          1.05, 0.3, 250.0, 75.0, 4.0, -2.0)
        Some(s"SELECT event_id, $nx AS xt, $ny AS yt FROM events")
      }),

    // ---------------- delay ----------------
    // Inverse-deformation-field application (momentum.py:2105 apply_dfield):
    // TPS-estimated 64×64 grid (momentum.py:627 spline_warp_estimate) built
    // driver-side from 9 landmark pairs, applied per event via the native
    // bilinear codegen expression. Grid lookup is not SQL-expressible
    // compactly -> rows-only check; exactness is spec-tested against the
    // driver-side reference interpolator.
    "q_dfield_apply" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
          .withColumn("xi", col("value") * lit(64.0 / 500.0))
          .withColumn("yi", col("user_id").cast("double") * lit(64.0 / 150.0))
        graft.calibrate.MomentumCorrection.applyDfield(
          df, DfieldGrid, "xi", "yi", "x_corr", "y_corr", ((0.0, 500.0), (0.0, 150.0)))
          .select("event_id", "x_corr", "y_corr")
      },
      // the 64×64 deformation grids as DuckDB list literals (d2s — exact
      // doubles), bilinear lookup replayed with Bilinear2D's arithmetic
      // order so both engines compute identical IEEE sums
      Some {
        val g = DfieldGrid
        val rows = g.rows; val cols = g.cols
        val rStep = (500.0 - 0.0) / rows; val cStep = (150.0 - 0.0) / cols
        val rdLit = g.rdeform.map(d2s).mkString("[", ",", "]")
        val cdLit = g.cdeform.map(d2s).mkString("[", ",", "]")
        def interp(lst: String): String =
          s"($lst[i00] * (1.0 - fx) * (1.0 - fy) + $lst[i10] * fx * (1.0 - fy)" +
            s" + $lst[i01] * (1.0 - fx) * fy + $lst[i11] * fx * fy)"
        s"""WITH g AS (SELECT $rdLit AS rd, $cdLit AS cd),
           pre AS (SELECT event_id,
             (value * ${d2s(64.0 / 500.0)}) AS xi,
             (CAST(user_id AS DOUBLE) * ${d2s(64.0 / 150.0)}) AS yi FROM events),
           cl AS (SELECT event_id,
             LEAST(GREATEST(xi, 0.0), ${d2s(rows - 1.0)}) AS x,
             LEAST(GREATEST(yi, 0.0), ${d2s(cols - 1.0)}) AS y FROM pre),
           ix AS (SELECT event_id, x, y,
             LEAST(FLOOR(x), ${d2s(rows - 2.0)}) AS x0,
             LEAST(FLOOR(y), ${d2s(cols - 2.0)}) AS y0 FROM cl),
           f AS (SELECT event_id, (x - x0) AS fx, (y - y0) AS fy,
             CAST(x0 * $cols + y0 + 1 AS BIGINT) AS i00,
             CAST((x0 + 1) * $cols + y0 + 1 AS BIGINT) AS i10,
             CAST(x0 * $cols + y0 + 2 AS BIGINT) AS i01,
             CAST((x0 + 1) * $cols + y0 + 2 AS BIGINT) AS i11 FROM ix)
           SELECT event_id,
             (${interp("rd")} * ${d2s(rStep)}) AS x_corr,
             (${interp("cd")} * ${d2s(cStep)}) AS y_corr
           FROM f, g""".replaceAll("\\s+", " ")
      }),

    "q_delay_axis" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        df.select(df("event_id"), adcToDelay(df("value"), AdcRange, DelayRange).as("delay"))
      },
      Some(s"SELECT event_id, ${adcToDelaySql("value", AdcRange, DelayRange)} AS delay FROM events")),

    "q_delay_offsets" -> QueryDef(
      (s, d) => {
        val df = events(s, d)
        val delay = adcToDelay(df("value"), AdcRange, DelayRange)
        df.select(df("event_id"), (delay * lit(-1.0) + lit(3.0)).as("delay_off"))
      },
      Some(s"SELECT event_id, ${adcToDelaySql("value", AdcRange, DelayRange)} * -1.0 + 3.0 AS delay_off FROM events")),

    // Batch sessionization (the offline twin of
    // streaming.SedStreaming.sessionize): gap-break flags via lag, session
    // ids via running sum, one aggregate per (user, session). Two window
    // passes over the same (user_id, time) ordering — Spark plans ONE
    // sort+exchange reused by both.
    "q_sessionize" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val gapUs = 43200000000L // 12 h
        val df = events(s, d).withColumn("us", col("ts_us"))
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        df.withColumn("brk",
            when(col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
          .withColumn("session", sum("brk").over(w))
          .groupBy("user_id", "session")
          .agg(count(lit(1)).as("n_events"),
            min("us").as("start_us"), max("us").as("end_us"))
      },
      Some("""SELECT user_id, session, COUNT(*) AS n_events,
          MIN(us) AS start_us, MAX(us) AS end_us FROM (
            SELECT user_id, us, CAST(SUM(brk) OVER w2 AS BIGINT) AS session FROM (
              SELECT user_id, event_id, us,
                CASE WHEN us - LAG(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS brk
              FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
              WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
            WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id))
          GROUP BY user_id, session""".replaceAll("\\s+", " "))),

    // Batch as-of join: each event takes the latest sensor reading at or
    // before its timestamp (every 100th event doubles as a reading; one
    // deterministic reading per timestamp). Linear plan: union + ONE
    // range shuffle + boundary-seeded fill (see operators.AsOf) — no
    // candidate-pair expansion. Oracle: DuckDB's native ASOF LEFT JOIN.
    "q_asof_join" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select("event_id", "ts_us")
        val w = Window.partitionBy("sts_us").orderBy(col("sensor_id").desc)
        val rd = events(s, d).filter(col("event_id") % 100 === 0)
          .selectExpr("event_id AS sensor_id", "ts_us AS sts_us",
            "CAST(value AS DOUBLE) AS reading")
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
        graft.operators.AsOf.asofJoin(ev, rd, "ts_us", "sts_us", Seq("sensor_id", "reading"))
      },
      Some(AsofJoinOracle)),

    // NEAREST as-of: each event takes the temporally closest reading,
    // ties backward. Two linear range-shuffle passes (prev via forward
    // fill, next via backward fill) + a map-only CASE — still no
    // candidate-pair expansion. Oracle: both DuckDB ASOF directions
    // joined, the same CASE choosing the closer.
    "q_asof_nearest" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select("event_id", "ts_us")
        val w = Window.partitionBy("sts_us").orderBy(col("sensor_id").desc)
        val rd = events(s, d).filter(col("event_id") % 100 === 0)
          .selectExpr("event_id AS sensor_id", "ts_us AS sts_us",
            "CAST(value AS DOUBLE) AS reading")
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
        graft.operators.AsOf.asofNearest(ev, rd, "ts_us", "sts_us",
          Seq("sensor_id", "reading"))
      },
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
          r AS (SELECT sensor_id, sts_us, reading FROM (
            SELECT event_id AS sensor_id, epoch_us(ts) AS sts_us,
              CAST(value AS DOUBLE) AS reading,
              ROW_NUMBER() OVER (PARTITION BY epoch_us(ts) ORDER BY event_id DESC) AS rn
            FROM events WHERE event_id % 100 = 0) WHERE rn = 1),
          b AS (SELECT e.event_id, e.ts_us, r.sensor_id AS p_id, r.reading AS p_rd,
              r.sts_us AS pts
            FROM e ASOF LEFT JOIN r ON e.ts_us >= r.sts_us),
          f AS (SELECT e.event_id, r.sensor_id AS n_id, r.reading AS n_rd,
              r.sts_us AS nts
            FROM e ASOF LEFT JOIN r ON e.ts_us <= r.sts_us)
          SELECT b.event_id, b.ts_us,
            CASE WHEN nts IS NULL OR (pts IS NOT NULL AND (b.ts_us - pts) <= (nts - b.ts_us))
              THEN p_id ELSE n_id END AS sensor_id,
            CASE WHEN nts IS NULL OR (pts IS NOT NULL AND (b.ts_us - pts) <= (nts - b.ts_us))
              THEN p_rd ELSE n_rd END AS reading,
            CASE WHEN nts IS NULL OR (pts IS NOT NULL AND (b.ts_us - pts) <= (nts - b.ts_us))
              THEN pts ELSE nts END AS matched_ts
          FROM b JOIN f USING (event_id)""".replaceAll("\\s+", " "))),

    // ---------------- binning ----------------
    "q_hist1d" -> QueryDef(
      (s, d) => Binning.histogram(events(s, d), Seq(AxValue)),
      Some(Binning.histogramSql("events", Seq(AxValue)))),

    "q_hist2d" -> QueryDef(
      (s, d) => Binning.histogram(events(s, d), Seq(AxValue50, AxUser)),
      Some(Binning.histogramSql("events", Seq(AxValue50, AxUser)))),

    "q_hist3d" -> QueryDef(
      (s, d) => {
        val df = events(s, d).withColumn("m", (col("event_id") % 97).cast("double"))
        Binning.histogram(df, Seq(AxValue50, AxUser, AxM))
      },
      Some(Binning.histogramSql(
        "(SELECT value, user_id, CAST(event_id % 97 AS DOUBLE) AS m FROM events)",
        Seq(AxValue50, AxUser, AxM)))),

    // Non-uniform explicit-edge histogram (numpy histogramdd edge-array
    // mode, binning.py:200 bin_dataframe with edge sequences): 2-D over a
    // log-ish value axis × a coarse user axis.
    "q_hist_edges" -> QueryDef(
      (s, d) => {
        val ev = events(s, d).withColumn("u", col("user_id").cast("double"))
        Binning.histogramEdges(ev, Seq(
          EdgeAxis("value", ValueEdges), EdgeAxis("u", UserEdges)))
      },
      Some(Binning.histogramEdgesSql(
        "(SELECT value, CAST(user_id AS DOUBLE) AS u FROM events)",
        Seq(EdgeAxis("value", ValueEdges), EdgeAxis("u", UserEdges))))),

    "q_hist_centers" -> QueryDef(
      (s, d) => Binning.withCenters(Binning.histogram(events(s, d), Seq(AxValue)), Seq(AxValue)),
      Some(Binning.histogramSql("events", Seq(AxValue), centers = true))),

    "q_norm_hist" -> QueryDef(
      (s, d) => Binning.normalizationHistogram(
        events(s, d).filter(col("event_type") =!= "error"), AxValue),
      Some("SELECT value_bin, COUNT(*) AS norm_cnt FROM (SELECT " +
        AxValue.idxSql("value") + " AS value_bin FROM events WHERE " +
        AxValue.inRangeSql("value") + " AND event_type <> 'error') GROUP BY value_bin")),

    "q_hist_normalized" -> QueryDef(
      (s, d) => {
        val ev = events(s, d)
        Binning.normalizedHistogram(ev, ev.filter(col("event_type") =!= "error"),
          Seq(AxValue50, AxUser), AxValue50)
      },
      Some {
        val hist = Binning.histogramSql("events", Seq(AxValue50, AxUser))
        val norm = "SELECT value_bin, COUNT(*) AS norm_cnt FROM (SELECT " +
          AxValue50.idxSql("value") + " AS value_bin FROM events WHERE " +
          AxValue50.inRangeSql("value") + " AND event_type <> 'error') GROUP BY value_bin"
        s"SELECT h.value_bin, h.user_id_bin, h.cnt, n.norm_cnt, CAST(h.cnt AS DOUBLE) / CAST(n.norm_cnt AS DOUBLE) AS intensity FROM ($hist) h JOIN ($norm) n ON h.value_bin = n.value_bin"
      }),

    "q_event_histogram" -> QueryDef(
      (s, d) => Binning.eventHistogram(events(s, d), Seq(AxValue, AxUser)),
      Some(Binning.eventHistogramSql("events", Seq(AxValue, AxUser))))
  )

  /** Flagship pipeline (SparkEntry.entry): jitter → sector align →
    * energy calibration → k axes → 3-D (kx, ky, E) histogram — the
    * canonical sed workflow (processor.py compute()) expressed through
    * the fluent SedProcessor facade; one lazy, shuffle-once Spark plan. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    ensureConfs(spark)
    val ev = Tables.events(spark, dir)
    val raw = ev
      .withColumn("x", col("value"))
      .withColumn("y", col("user_id").cast("double"))
      .withColumn("tof", tofCol(ev)) // the shared TOF derivation
      .withColumn("sector", (col("event_id") % 8).cast("int"))
    SedProcessor(raw)
      .addJitter(Seq("tof"), "event_id", 0.5)
      .alignDldSectors("sector", SectorDelays)
      .appendEnergyAxis(TofDistance, TimeOffset, Binwidth, BinningF, "kinetic", EnergyOffset)
      .appendKAxis(KxStart, KxCenter, KxScale, KxStep, KyStart, KyCenter, KyScale, KyStep)
      .compute(Seq(
        BinAxis("kx", 64, -4.0, 0.0), BinAxis("ky", 64, -1.0, 0.0),
        BinAxis("energy", 64, 0.0, 2500.0)), withCenters = false)
  }
}
