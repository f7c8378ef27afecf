package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private val W = EventAnalytics.WeekUs

  // (event_id, user_id, event_type, ts_us, value)
  private def ev(rows: (Long, Long, String, Long, Double)*) =
    rows.toDF("event_id", "user_id", "event_type", "ts_us", "value")

  test("funnel: strict ordering — out-of-order stages don't convert") {
    // u1 completes a->b->c in order; u2 has b BEFORE a (no conversion past a);
    // u3 only reaches a; u4 never starts (b without a).
    val df = ev(
      (1, 1, "a", 100, 0), (2, 1, "b", 200, 0), (3, 1, "c", 300, 0),
      (4, 2, "b", 100, 0), (5, 2, "a", 200, 0), (6, 2, "c", 300, 0),
      (7, 3, "a", 100, 0),
      (8, 4, "b", 100, 0))
    val got = EventAnalytics.funnel(df, Seq("a", "b", "c"))
      .orderBy("stage_idx")
      .select("stage", "n_users", "pct_of_first").as[(String, Long, Double)].collect()
    // stage a: u1,u2,u3; stage b: u1 only (u2's b precedes its a);
    // stage c: u1 (c at 300 > b at 200). u2's c is after its a but u2
    // never passed b, so it must not count.
    assert(got.toSeq == Seq(("a", 3L, 1.0), ("b", 1L, 0.333333), ("c", 1L, 0.333333)))
  }

  test("funnel: equal timestamps do NOT advance (strictly after)") {
    val df = ev((1, 1, "a", 100, 0), (2, 1, "b", 100, 0))
    val got = EventAnalytics.funnel(df, Seq("a", "b"))
      .orderBy("stage_idx").select("n_users").as[Long].collect()
    assert(got.toSeq == Seq(1L, 0L))
  }

  test("retention: cohort cells count users active at each week offset") {
    // u1 first week 10, active weeks {10, 11, 13}; u2 first week 10,
    // active {10}; u3 first week 11, active {11, 12}.
    val df = ev(
      (1, 1, "x", 10 * W + 5, 0), (2, 1, "x", 11 * W + 1, 0), (3, 1, "x", 13 * W + 9, 0),
      (4, 2, "x", 10 * W + 7, 0),
      (5, 3, "x", 11 * W + 2, 0), (6, 3, "x", 12 * W + 3, 0))
    val got = EventAnalytics.retention(df)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 0L, 2L), (10L, 1L, 1L), (10L, 3L, 1L),
      (11L, 0L, 1L), (11L, 1L, 1L)))
  }

  test("retention: duplicate events in one week count the user once") {
    val df = ev((1, 1, "x", 5 * W, 0), (2, 1, "x", 5 * W + 100, 0))
    val got = EventAnalytics.retention(df).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((5L, 0L, 1L)))
  }

  test("transitions: lag respects per-user time order with event_id tie-break") {
    // u1: a(t=1) -> b(t=2) -> b(t=2, higher id) -> c(t=3)
    // u2: a(t=1) -> c(t=5); no cross-user transitions.
    val df = ev(
      (1, 1, "a", 1, 0), (2, 1, "b", 2, 0), (3, 1, "b", 2, 0), (4, 1, "c", 3, 0),
      (5, 2, "a", 1, 0), (6, 2, "c", 5, 0))
    val got = EventAnalytics.transitions(df)
      .select("prev_type", "next_type", "n_transitions")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "b", 1L), ("b", "c", 1L), ("a", "c", 1L)))
    // row-normalized: from a -> {b: 0.5, c: 0.5}
    val pa = EventAnalytics.transitions(df).filter($"prev_type" === "a")
      .select("p").as[Double].collect().toSeq
    assert(pa == Seq(0.5, 0.5))
  }

  test("zscoreOutliers: only the strict |z|>k tail survives, z exact") {
    // one type, values: eight 10.00s and one 100.00 -> the 100 is the
    // outlier; mean = 20, var = 800 (population), z = 80/sqrt(800)
    val rows = (1L to 8L).map(i => (i, 1L, "t", i * 10, 10.00)) :+ (9L, 1L, "t", 900L, 100.00)
    val got = EventAnalytics.zscoreOutliers(ev(rows: _*))
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head._1 == 9L)
    // cents: mean 2000, var = (8*1000^2*0 + ...) -- compute directly:
    val vc = rows.map(r => math.floor(r._5 * 100 + 0.5).toLong)
    val n = vc.length.toDouble
    val m = vc.sum / n
    val v = vc.map(x => x.toDouble * x).sum / n - m * m
    val zExp = math.rint((vc.last - m) / math.sqrt(v) * 1e6) / 1e6
    assert(math.abs(got.head._2 - zExp) < 1e-9)
  }

  test("winsorize clamps to the discrete quantile band, interior untouched") {
    // type t: cents 1..100 (values 0.01..1.00); pLo=0.05 -> lo = 5 (cum 5 >= 5),
    // pHi=0.95 -> hi = 95 (cum 95 >= 95)
    val rows = (1L to 100L).map(i => (i, 1L, "t", i, i / 100.0))
    val got = EventAnalytics.winsorize(ev(rows: _*), 0.05, 0.95)
      .select("event_id", "w_value").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.05 && got(4L) == 0.05)   // below lo -> clamped up
    assert(got(5L) == 0.05 && got(50L) == 0.50)  // band interior unchanged
    assert(got(95L) == 0.95 && got(99L) == 0.95) // above hi -> clamped down
    assert(got.size == 100)
  }

  test("winsorize: per-type thresholds are independent") {
    val rows = (1L to 10L).map(i => (i, 1L, "a", i, i * 1.0)) ++
      (11L to 20L).map(i => (i, 1L, "b", i, 1000 + i * 1.0))
    val got = EventAnalytics.winsorize(ev(rows: _*), 0.2, 0.8)
      .select("event_id", "w_value").as[(Long, Double)].collect().toMap
    assert(got(1L) == 2.0 && got(10L) == 8.0)       // type a band [2, 8]
    assert(got(11L) == 1012.0 && got(20L) == 1018.0) // type b band [1012, 1018]
  }

  test("activeUsers: DAU/WAU/MAU windows cover exactly the trailing days") {
    val D = EventAnalytics.DayUs
    // u1 active day 0 and day 8; u2 active day 8.
    val df = ev(
      (1, 1, "x", 0 * D + 5, 0), (2, 1, "x", 8 * D + 1, 0),
      (3, 2, "x", 8 * D + 2, 0))
    val got = EventAnalytics.activeUsers(df)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // day 0: dau 1 (u1), wau 1, mau 1
    assert(got(0L) == ((1L, 1L, 1L)))
    // day 8: dau 2; wau = users active in days 2..8 = {u1, u2} minus u1's
    // day-0 activity (outside 7d) -> u1 IS active day 8 itself, so wau 2;
    // mau covers day 0 too -> 2
    assert(got(8L) == ((2L, 2L, 2L)))
    assert(got.size == 2)
  }

  test("activeUsers: a user inactive on the day still counts toward WAU within 7 days") {
    val D = EventAnalytics.DayUs
    // u1 active day 0 only; u2 active day 3 -> day 3 has dau 1 but wau 2
    val df = ev((1, 1, "x", 0 * D, 0), (2, 2, "x", 3 * D, 0))
    val got = EventAnalytics.activeUsers(df)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(3L) == ((1L, 2L, 2L)))
  }

  test("funnelTiming: mean delay from exact first-qualifying times") {
    // u1: a@100 -> b@300 (200); u2: a@100 -> b@200 (100); u3 stalls at a
    val df = ev(
      (1, 1, "a", 100, 0), (2, 1, "b", 300, 0),
      (3, 2, "a", 100, 0), (4, 2, "b", 200, 0),
      (5, 3, "a", 100, 0))
    val got = EventAnalytics.funnelTiming(df, Seq("a", "b"))
      .select("stage_idx", "stage", "n_users", "avg_delay_us")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got == Seq((1, "b", 2L, 150.0)))
  }

  test("funnelTiming: transitions nobody completes are dropped") {
    val df = ev((1, 1, "a", 100, 0), (2, 1, "b", 200, 0))
    val got = EventAnalytics.funnelTiming(df, Seq("a", "b", "c"))
      .select("stage").as[String].collect().toSeq
    assert(got == Seq("b"))
  }

  test("abTest: exact moments give the textbook Welch t") {
    // arm A (even users): values 10, 12; arm B (odd): 20, 26
    val df = ev(
      (1, 2, "t", 1, 10.0), (2, 4, "t", 2, 12.0),
      (3, 1, "t", 3, 20.0), (4, 3, "t", 4, 26.0))
    val r = EventAnalytics.abTest(df)
      .select("n_a", "n_b", "mean_a", "mean_b", "diff", "t")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert((r._1, r._2, r._3, r._4, r._5) == ((2L, 2L, 11.0, 23.0, -12.0)))
    // var_a = 2 (cents^2: 20000), var_b = 18 (180000);
    // t = -1200 / sqrt(10000 + 90000) cents
    val tExp = math.rint(-1200.0 / math.sqrt(10000.0 + 90000.0) * 1e6) / 1e6
    assert(math.abs(r._6 - tExp) < 1e-9)
  }

  test("abTest: single-observation arms are excluded") {
    val df = ev((1, 2, "t", 1, 10.0), (2, 1, "t", 2, 20.0), (3, 1, "t", 3, 22.0))
    assert(EventAnalytics.abTest(df).count() == 0)
  }

  test("zscoreOutliers: zero-variance type emits nothing") {
    val df = ev((1, 1, "t", 1, 5.0), (2, 1, "t", 2, 5.0))
    assert(EventAnalytics.zscoreOutliers(df).count() == 0)
  }
}
