package graft.operators

import graft.SparkSpecBase

import scala.util.Random

/** Seeded-random equivalence tests: the distributed event-analytics
  * operators vs straightforward driver-side reference implementations
  * over small random event sets — the property evidence the per-case
  * fixtures in EventAnalyticsSpec can't give. */
class EventAnalyticsPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val Stages = Seq("a", "b", "c")

  /** (event_id, user_id, event_type, ts_us) with duplicate timestamps
    * made likely (small ts range) to stress tie handling. */
  private def randomEvents(rnd: Random, n: Int): Seq[(Long, Long, String, Long)] =
    (1 to n).map { i =>
      (i.toLong, 1L + rnd.nextInt(4), Seq("a", "b", "c", "x")(rnd.nextInt(4)),
        rnd.nextInt(20).toLong)
    }

  private def toDf(rows: Seq[(Long, Long, String, Long)]) =
    rows.map(r => (r._1, r._2, r._3, r._4, 0.0))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")

  /** Reference funnel: per user, walk stages by first-qualifying time. */
  private def refFunnelDepth(rows: Seq[(Long, Long, String, Long)]): Map[Long, Int] =
    rows.groupBy(_._2).map { case (u, evs) =>
      var depth = 0
      var tLast = Long.MinValue
      var advanced = true
      while (advanced && depth < Stages.length) {
        val cands = evs.filter(e => e._3 == Stages(depth) && e._4 > tLast)
        if (cands.isEmpty) advanced = false
        else { tLast = cands.map(_._4).min; depth += 1 }
      }
      u -> depth
    }

  test("funnel counts equal the per-user first-qualifying walk") {
    val rnd = new Random(42)
    for (trial <- 0 until 6) {
      val rows = randomEvents(rnd, 40 + rnd.nextInt(60))
      val depths = refFunnelDepth(rows)
      val want = Stages.indices.map(k => k -> depths.values.count(_ > k).toLong).toMap
      val got = EventAnalytics.funnel(toDf(rows), Stages)
        .select("stage_idx", "n_users").as[(Int, Long)].collect().toMap
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("transitions equal the per-user sorted-lag reference") {
    val rnd = new Random(7)
    for (trial <- 0 until 6) {
      val rows = randomEvents(rnd, 30 + rnd.nextInt(50))
      val want = rows.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._4, e._1))
        sorted.zip(sorted.tail).map { case (p, n) => (p._3, n._3) }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = EventAnalytics.transitions(toDf(rows))
        .select("prev_type", "next_type", "n_transitions")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("retention cells equal the distinct user-week reference") {
    val rnd = new Random(13)
    val W = EventAnalytics.WeekUs
    for (trial <- 0 until 6) {
      val rows = randomEvents(rnd, 30 + rnd.nextInt(50))
        .map(r => r.copy(_4 = r._4 * (W / 4))) // spread ts across ~5 weeks
      val uw = rows.map(r => (r._2, r._4 / W)).distinct
      val first = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
      val want = uw.groupBy { case (u, w) => (first(u), w - first(u)) }
        .map { case (k, v) => k -> v.size.toLong }
      val got = EventAnalytics.retention(toDf(rows))
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("winsorize preserves row count, clamps into the threshold band, is idempotent on interior") {
    val rnd = new Random(29)
    val rows = (1 to 120).map { i =>
      (i.toLong, 1L, Seq("t", "u")(rnd.nextInt(2)), 0L,
        math.floor(rnd.nextDouble() * 10000) / 100.0)
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val got = EventAnalytics.winsorize(df, 0.1, 0.9)
      .select("event_id", "event_type", "value", "w_value")
      .as[(Long, String, Double, Double)].collect()
    assert(got.length == rows.length)
    // per type, the clamp band is [10th, 90th] discrete quantile of cents
    got.groupBy(_._2).foreach { case (_, g) =>
      val cents = g.map(r => math.floor(r._3 * 100 + 0.5).toLong).sorted
      val n = cents.length
      val lo = cents(math.ceil(0.1 * n).toInt - 1)
      val hi = cents(math.ceil(0.9 * n).toInt - 1)
      g.foreach { r =>
        val wc = math.floor(r._4 * 100 + 0.5).toLong
        val vc = math.floor(r._3 * 100 + 0.5).toLong
        assert(wc == math.min(math.max(vc, lo), hi), s"$r lo=$lo hi=$hi")
      }
    }
  }
}
