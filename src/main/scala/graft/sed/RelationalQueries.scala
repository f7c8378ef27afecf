package graft.sed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational coverage over the TPC-H-ish tables (SURVEY.md §2
  * "Relational coverage"): grouped agg, multi-way join + top-k, semi/anti
  * joins, window functions, rollup.
  *
  * Money sums are folded in exact integer cents (inputs have fixed decimal
  * precision) so results are independent of partition/reduction order —
  * a plain double SUM would be nondeterministic at cluster scale and could
  * never hash-match an oracle.
  *
  * Scale notes: dimension tables (region/nation/customer-filter) are
  * broadcast; fact-fact joins shuffle on their keys with partial aggs
  * pushed below the exchange; top-k is TakeOrderedAndProject (no global
  * sort materialization).
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, name: String): DataFrame = {
    SedQueries.ensureConfs(s); Tables.load(s, d, name)
  }

  /** SUM of a 2-decimal money column in exact cents, as double. */
  private def centsSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(floor(c * 100 + 0.5).cast("long")).cast("double") / lit(100.0)
  private def centsSumSql(c: String): String =
    s"CAST(SUM(CAST(FLOOR($c * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0"

  /** Per-row revenue extendedprice*(1-discount), exact at 1e-4. */
  private def revSum(df: DataFrame): org.apache.spark.sql.Column =
    sum(floor(df("l_extendedprice") * (lit(1.0) - df("l_discount")) * 10000 + 0.5).cast("long"))
      .cast("double") / lit(10000.0)
  private val revSumSql =
    "CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)/10000.0"

  private val FunnelStages = graft.operators.EventAnalytics.DefaultStages

  val defs: Map[String, QueryDef] = Map(

    // TPC-H Q1-style pricing summary.
    "q1_agg" -> QueryDef(
      (s, d) => {
        val l = t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        l.groupBy("l_returnflag", "l_linestatus").agg(
          centsSum(col("l_quantity")).as("sum_qty"),
          centsSum(col("l_extendedprice")).as("sum_base"),
          revSum(l).as("sum_disc_price"),
          (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 1000000 + 0.5)
            .cast("long")).cast("double") / lit(1000000.0)).as("sum_charge"),
          (sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).cast("double") / count(lit(1)) / lit(100.0)).as("avg_qty"),
          (sum(floor(col("l_discount") * 100 + 0.5).cast("long")).cast("double") / count(lit(1)) / lit(100.0)).as("avg_disc"),
          count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
          ${centsSumSql("l_quantity")} AS sum_qty,
          ${centsSumSql("l_extendedprice")} AS sum_base,
          $revSumSql AS sum_disc_price,
          CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_charge,
          CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)/COUNT(*)/100.0 AS avg_qty,
          CAST(SUM(CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)/COUNT(*)/100.0 AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""".replaceAll("\\s+", " "))),

    // TPC-H Q3-style: 3-way join, agg, deterministic top-10.
    "q3_join" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        val l = t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(l("l_orderkey"), o("o_orderdate"))
          .agg(revSum(l).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, $revSumSql AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".replaceAll("\\s+", " "))),

    // Left-semi + left-anti join (customers with / without an urgent order).
    "q_semi_anti" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        val semi = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_urgent").as("tag"))
        val anti = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_urgent").as("tag"))
        semi.union(anti)
      },
      Some("""SELECT c_custkey, 'has_urgent' AS tag FROM customer
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT c_custkey, 'no_urgent' AS tag FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""
        .replaceAll("\\s+", " "))),

    // Window functions: per-customer running order total + sequence number.
    "q_window" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
          (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).over(w).cast("double") / lit(100.0)).as("running_total"),
          row_number().over(w).cast("long").as("order_seq"))
      },
      Some("""SELECT o_custkey, o_orderkey,
          CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)/100.0 AS running_total,
          CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""
        .replaceAll("\\s+", " "))),

    // Bucketized range join: events joined into value intervals derived
    // from part with NO equality key. Spark would plan the raw inequality
    // join as BroadcastNestedLoopJoin (quadratic + full broadcast);
    // RangeJoin manufactures a bucket equality key instead — points hash
    // to floor(v/width), intervals explode into overlapped buckets, exact
    // containment prunes after an ordinary shuffled equi-join. The oracle
    // runs the PLAIN inequality join, certifying the rewrite.
    "q_range_join" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s) // events.parquet carries TIMESTAMP(NANOS)
        val pts = Tables.events(s, d).select(col("event_id"),
          col("value").cast("double").as("value"))
        val ivs = t(s, d, "part").filter(col("p_partkey") % 4 === 0)
          .select(col("p_partkey"),
            ((col("p_partkey") % 500).cast("double") - lit(0.5)).as("lo"),
            ((col("p_partkey") % 500).cast("double") + lit(0.5)).as("hi"))
        graft.operators.RangeJoin.pointInInterval(pts, ivs,
            "value", "lo", "hi", bucketWidth = 1.0)
          .select("event_id", "p_partkey", "value")
      },
      Some("""SELECT event_id, p_partkey, value
          FROM (SELECT event_id, CAST(value AS DOUBLE) AS value FROM events) e
          JOIN (SELECT p_partkey,
                  CAST(p_partkey % 500 AS DOUBLE) - 0.5E0 AS lo,
                  CAST(p_partkey % 500 AS DOUBLE) + 0.5E0 AS hi
                FROM part WHERE p_partkey % 4 = 0) i
          ON i.lo <= e.value AND e.value <= i.hi""".replaceAll("\\s+", " "))),

    // Salted fact-fact join: lineitem ⋈ orders through Skew.saltedJoin
    // (factor 8). The salt spreads each order key over 8 reducers — the
    // rewrite for hot keys too big for one reducer when neither side
    // broadcasts — and is provably result-invariant: the oracle is the
    // PLAIN join, so the hash-match certifies the rewrite's equivalence.
    "q_salted_join" -> QueryDef(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.Skew.saltedJoin(li, o, "l_orderkey",
          col("l_orderkey") + col("l_linenumber"), factor = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + 0.5)
              .cast("long")).cast("double") / lit(10000.0)).as("revenue"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_items, $revSumSql AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority""".replaceAll("\\s+", " "))),

    // Top-k per group: the 3 highest-value orders per priority class.
    // rank <= k over a window is planned as WindowGroupLimit in Spark 4:
    // each map task keeps a bounded k-heap per group BEFORE the shuffle,
    // so the exchange carries k rows per (task, group) instead of the
    // full fact table — the scale-correct shape for per-group leaders.
    "q_topk_per_group" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rk"))
          .filter(col("rk") <= 3)
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
          CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
        FROM orders QUALIFY rk <= 3""".replaceAll("\\s+", " "))),

    // Semi-structured extraction: the events `props` column carries JSON
    // payloads; parse with a schema (JsonToStructs — codegen'd, no UDF)
    // and aggregate the extracted field per event type. The parse is
    // map-side, so the shuffle carries only (event_type, k) partials —
    // schema-on-read at 100 TB costs one pass, not a conversion job.
    "q_json_extract" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s) // events.parquet carries TIMESTAMP(NANOS)
        Tables.events(s, d)
          .select(col("event_type"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
              .getField("k").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
            min("k").as("min_k"), max("k").as("max_k"))
          .withColumn("avg_k", col("sum_k").cast("double") / col("n"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
          CAST(SUM(k) AS DOUBLE)/COUNT(*) AS avg_k
        FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
        GROUP BY event_type""".replaceAll("\\s+", " "))),

    // Exact per-group percentiles (linear-interpolated, the numpy/
    // PERCENTILE_CONT definition both engines implement). Spark's exact
    // `percentile` buffers each group's values, so this shape assumes
    // bounded groups (event types here); at 100 TB with unbounded groups
    // the scale path is approx_percentile (bounded-error sketch, mergeable
    // map-side) — which can never hash-match a cross-engine oracle, so the
    // driver-gradeable entry is the exact one. One aggregation buffer
    // serves both percentiles (array form), ROUND(6) absorbs the engines'
    // different interpolation orderings.
    "q_percentiles" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        Tables.events(s, d).groupBy("event_type")
          .agg(expr("percentile(value, array(0.5D, 0.95D))").as("__ps"),
            count(lit(1)).as("n"))
          .select(col("event_type"),
            round(element_at(col("__ps"), 1), 6).as("p50"),
            round(element_at(col("__ps"), 2), 6).as("p95"),
            col("n"))
      },
      Some("""SELECT event_type,
          ROUND(quantile_cont(value, 0.5E0), 6) AS p50,
          ROUND(quantile_cont(value, 0.95E0), 6) AS p95,
          COUNT(*) AS n
        FROM events GROUP BY event_type""".replaceAll("\\s+", " "))),

    // Robust (median/MAD) outlier detection per event type (round 11 —
    // Hampel's rule, the heavy-tail-safe twin of q_zscore_outliers:
    // mean/stddev are themselves dragged by the outliers they should
    // flag; the median and the median-absolute-deviation are not).
    // Flag |value − median| > 3 · 1.4826 · MAD (1.4826 scales MAD to
    // σ under normality). Both medians are exact percentiles ROUND(6)
    // (the documented cross-engine interpolation absorb); everything
    // after is IEEE-exact double arithmetic on identical inputs, so
    // the flagged row set hash-matches. Two grouped exact-percentile
    // passes + one broadcast join back — the q_percentiles bounded-
    // group caveat applies (per-type value buffers; the sketch pair
    // q_percentiles_approx is the stated 100 TB path).
    "q_anomaly_mad" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        val ev = Tables.events(s, d)
        val med = ev.groupBy("event_type")
          .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(round(expr("percentile(dev, 0.5D)"), 6).as("mad"))
        dev.join(broadcast(mad), "event_type")
          .filter(col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
          .select(col("event_id").cast("long").as("event_id"),
            col("event_type"), col("value"), col("med"), col("mad"))
      },
      Some("""WITH med AS (SELECT event_type,
              ROUND(quantile_cont(value, 0.5E0), 6) AS med
            FROM events GROUP BY event_type),
          dev AS (SELECT event_id, e.event_type, value, med,
              abs(value - med) AS dev
            FROM events e JOIN med USING (event_type)),
          mad AS (SELECT event_type,
              ROUND(quantile_cont(dev, 0.5E0), 6) AS mad
            FROM dev GROUP BY event_type)
          SELECT CAST(event_id AS BIGINT) AS event_id, d.event_type, value, med, mad
          FROM dev d JOIN mad USING (event_type)
          WHERE dev > 3.0E0 * 1.4826E0 * mad""".replaceAll("\\s+", " "))),

    // Sketch-based percentile twin of q_percentiles — the 100 TB path.
    // Exact `percentile` buffers every group value in the aggregation
    // state (fine for bounded groups, impossible for billions of rows
    // per group); `approx_percentile` maintains a bounded mergeable
    // quantile sketch with map-side partial merge, so state is O(accuracy)
    // per group regardless of row count. Rows-only by design: sketch
    // output is engine-specific (DuckDB's approx_quantile uses a
    // different sketch), so the cross-engine contract is the error bound
    // vs the exact result, pinned by PipelineInvariantsSpec.
    "q_percentiles_approx" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        Tables.events(s, d).groupBy("event_type")
          .agg(expr("approx_percentile(value, array(0.5D, 0.95D), 10000)").as("__ps"),
            count(lit(1)).as("n"))
          .select(col("event_type"),
            round(element_at(col("__ps"), 1), 6).as("p50_approx"),
            round(element_at(col("__ps"), 2), 6).as("p95_approx"),
            col("n"))
      },
      None),

    // Z-order (Morton) layout keys over the event stream: bin the two
    // query dimensions (value, user), interleave the bin bits. Writing
    // sorted by this key (repartitionByRange + sortWithinPartitions)
    // makes parquet min/max pruning selective on BOTH dimensions — the
    // layout step of a write-once/scan-forever 100 TB event store. The
    // key itself is shift/mask column algebra (codegen'd, no shuffle);
    // the oracle replays the identical bit placement.
    "q_zorder" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        val bx = least(floor(col("value")).cast("long"), lit(1023L))
        val by = col("user_id").cast("long").bitwiseAND(lit(1023L))
        Tables.events(s, d).select(col("event_id"), bx.as("bx"), by.as("by"),
          graft.operators.Layout.zorderKey(Seq(bx, by), bits = 10).as("zkey"))
      },
      Some(s"""SELECT event_id, bx, by,
          ${graft.operators.Layout.zorderKeySql(Seq("bx", "by"), 10)} AS zkey
        FROM (SELECT event_id,
            LEAST(CAST(FLOOR(value) AS BIGINT), 1023) AS bx,
            CAST(user_id AS BIGINT) & 1023 AS by
          FROM events)""".replaceAll("\\s+", " "))),

    // Exact distinct cardinality per group. Spark plans COUNT(DISTINCT)
    // as two cascaded aggregations (partial dedup on (group, user) below
    // the shuffle, then the final count), so a hot group's duplicates
    // collapse map-side instead of funneling one reducer.
    "q_distinct_users" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        Tables.events(s, d).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
          COUNT(*) AS n_events
        FROM events GROUP BY event_type""".replaceAll("\\s+", " "))),

    // Sketch twin of q_distinct_users — the unbounded-cardinality 100 TB
    // path. Exact distinct counting keys the shuffle by (group, user):
    // state grows with the number of distinct users. approx_count_distinct
    // keeps one bounded HyperLogLog++ register set per group, merged
    // map-side, so state is O(1/rsd^2) per group regardless of
    // cardinality. Rows-only by design (HLL estimates are engine-
    // specific); PipelineInvariantsSpec bounds the relative error vs the
    // exact counts.
    "q_distinct_users_approx" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        Tables.events(s, d).groupBy("event_type")
          .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"),
            count(lit(1)).as("n_events"))
      },
      None),

    // Rollup aggregate over the region -> nation hierarchy.
    "q_rollup" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("r_name"), col("n_name"), col("c_acctbal"))
          .createOrReplaceTempView("graft_cust_geo")
        // DSL rollup + grouping() trips DetectAmbiguousSelfJoin on the
        // joined lineage; the SQL form builds the identical Aggregate plan.
        s.sql(s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
            ${centsSumSql("c_acctbal")} AS sum_acctbal,
            CAST(GROUPING(r_name) AS BIGINT) AS g_r,
            CAST(GROUPING(n_name) AS BIGINT) AS g_n
          FROM graft_cust_geo GROUP BY ROLLUP(r_name, n_name)""")
      },
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
          ${centsSumSql("c_acctbal")} AS sum_acctbal,
          CAST(GROUPING(r_name) AS BIGINT) AS g_r,
          CAST(GROUPING(n_name) AS BIGINT) AS g_n
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)""".replaceAll("\\s+", " "))),

    // CUBE aggregate: all four grouping sets over (returnflag, linestatus)
    // in ONE pass — Spark's Expand operator replicates each input row per
    // grouping set BELOW the partial aggregation, so the shuffle carries
    // partially-aggregated groups (|distinct| × 4 rows), never the 4×
    // replicated fact table. Money in exact cents (see centsSum).
    "q_cube" -> QueryDef(
      (s, d) => {
        t(s, d, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
          .createOrReplaceTempView("graft_cube_li")
        // SQL form for the same DetectAmbiguousSelfJoin reason as q_rollup
        s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
            ${centsSumSql("l_quantity")} AS sum_qty,
            CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
            CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
          FROM graft_cube_li GROUP BY CUBE(l_returnflag, l_linestatus)""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
          ${centsSumSql("l_quantity")} AS sum_qty,
          CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
          CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"""
        .replaceAll("\\s+", " "))),

    // Grouped sequence assembly: per user, the full event history in
    // event-time order, fingerprinted — the "assemble per-entity ordered
    // interaction history" shape behind SFT/conversation dataset
    // construction. ONE shuffle on user_id; collect_list is bounded by
    // per-user event counts (the unbounded-entity path is sessionize/
    // window). The in-row struct sort on (ts_us, event_id, type) makes
    // the sequence deterministic under any shuffle arrival order; the
    // md5 keeps the compare row compact (no text payload rides the
    // result).
    "q_user_history" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            md5(concat_ws("|",
              transform(
                array_sort(collect_list(struct(col("ts_us"), col("event_id"),
                  col("event_type")))),
                e => concat_ws(":", e.getField("event_id").cast("string"),
                  e.getField("event_type")))).cast("binary")).as("seq_md5"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
          md5(string_agg(CAST(event_id AS VARCHAR) || ':' || event_type, '|'
            ORDER BY epoch_us(ts), event_id, event_type)) AS seq_md5
        FROM events GROUP BY user_id""".replaceAll("\\s+", " "))),

    // Event-time RANGE window frame: per user, the trailing-1-hour event
    // count and value sum at every event — the standard rolling-feature
    // shape. ONE shuffle on user_id + per-partition sort; Spark evaluates
    // the bounded RANGE frame with a sliding two-pointer accumulator
    // (add/evict), O(n) per partition, never O(n·frame). Values fold in
    // exact integer micro-units so the running sums are reduction-order
    // independent; ts ties share a frame (RANGE includes peers) so the
    // result is deterministic under any sort-tie order.
    "q_window_range" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
          col("ts_us"), floor(col("value") * 1000000 + 0.5).cast("long").as("vu"))
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        ev.select(col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("vu")).over(w).as("sum_u_1h"))
      },
      Some("""SELECT event_id, user_id, ts_us,
          CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
          CAST(SUM(vu) OVER w AS BIGINT) AS sum_u_1h
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vu FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""
        .replaceAll("\\s+", " "))),

    // Strict-order conversion funnel over the event stream: stage k
    // counts users whose first stage-k event came strictly after their
    // first stage-(k-1) event. Each stage is a filtered min-agg (the
    // event_type predicate reaches the scan; MIN has map-side partials)
    // chained by an equi-join on the previous distinct-user-sized stage
    // set — AQE broadcasts small stages, shuffle-hash-joins huge ones.
    // No per-user event list is ever collected. The final window runs
    // over |stages| rows.
    "q_funnel" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.funnel(Tables.events(s, d), FunnelStages)
      },
      Some(graft.operators.EventAnalytics.funnelSql(FunnelStages))),

    // Weekly cohort retention: cohort = first active epoch-week per
    // user; cells count cohort users active at each week offset. ONE
    // wide shuffle — groupBy(user) carries a collect_set of week
    // indices (bounded by the calendar, not event count); the cell agg
    // is thousands of rows at any scale. Week math is pure integer
    // division on ts_us — no calendar/timezone functions to drift
    // across engines.
    "q_retention" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.retention(Tables.events(s, d))
      },
      Some(graft.operators.EventAnalytics.retentionSql)),

    // Rolling active users (DAU / trailing-7d WAU / trailing-30d MAU)
    // in the compressed (user, day) domain: one distinct collapses the
    // event stream, rolling counts explode user-days in-row (<= 30
    // rows) and re-distinct — bounded by user-days x window, never raw
    // event count.
    "q_active_users" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.activeUsers(Tables.events(s, d))
      },
      Some(graft.operators.EventAnalytics.activeUsersSql)),

    // First-order event-type transition matrix (Markov chain fit) over
    // per-user time-ordered sequences: ONE shuffle (window lag keyed on
    // user), |event_type|^2 output rows with row-normalized transition
    // probabilities. Tie-break on event_id makes the sequence — and so
    // the matrix — deterministic under repeated timestamps.
    "q_transitions" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.transitions(Tables.events(s, d))
      },
      Some(graft.operators.EventAnalytics.transitionsSql)),

    // Time-to-convert per funnel transition: the funnel's stage-set
    // chain joined pairwise (every stage-k user is stage-(k-1) by
    // construction), mean delay from exact integer-microsecond sums.
    "q_funnel_timing" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.funnelTiming(Tables.events(s, d), FunnelStages)
      },
      Some(graft.operators.EventAnalytics.funnelTimingSql(FunnelStages))),

    // Two-arm A/B comparison per event type (arm = user parity): moments
    // fold in exact integer cents through ONE conditional groupBy(type)
    // (|type| output rows); Welch's t derives from the exact sums with
    // IEEE arithmetic only — engine-bit-identical, rounded for report.
    "q_ab_test" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.abTest(Tables.events(s, d))
      },
      Some(graft.operators.EventAnalytics.abTestSql)),

    // Per-type winsorization at the discrete [5%, 95%] quantile band:
    // robust clipping that tames heavy tails without dropping rows. No
    // per-row sort — thresholds come from a (type, cents)-histogram
    // cumulative window (distinct-value-bounded, the qualityFloor
    // shape), broadcast back; the clamp itself is map-only.
    "q_winsorize" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.winsorize(Tables.events(s, d), 0.05, 0.95)
      },
      Some(graft.operators.EventAnalytics.winsorizeSql(0.05, 0.95))),

    // Per-type z-score outlier detection with EXACT integer-cents
    // moments: the per-type (n, sum, sum-of-squares) table folds in
    // int64 (map-side partials, |event_type| rows, broadcast back), and
    // mean/variance/z derive from those exact sums with IEEE +-*/ and
    // sqrt only — bit-identical across engines, no libm drift. Strict
    // (v-mean)^2 > k^2*var keeps the boundary unambiguous.
    "q_zscore_outliers" -> QueryDef(
      (s, d) => {
        SedQueries.ensureConfs(s)
        graft.operators.EventAnalytics.zscoreOutliers(Tables.events(s, d))
      },
      Some(graft.operators.EventAnalytics.zscoreOutliersSql()))
  )
}
