package graft.operators

import graft.SparkSpecBase

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def pr(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pagerank(pairs.toDF("a_id", "b_id"), iters)
      .as[(Long, Long)].collect().toMap

  /** Driver-side replay of the exact integer recurrence. */
  private def replay(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap(p => Seq(p, p.swap)).distinct
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size.toLong
    val base = (1000000L * 15) / (100 * n)
    var ranks = deg.keys.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => (ranks(src) * 85) / (100 * deg(src)) }.sum
      }
      ranks = deg.keys.map(k => k -> (base + in.getOrElse(k, 0L))).toMap
    }
    ranks
  }

  test("pagerank matches the integer recurrence replayed on the driver") {
    // star: hub 1 linked to 2, 3, 4; separate pair (5, 6)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    for (k <- Seq(1, 3, 8)) assert(pr(pairs, k) == replay(pairs, k))
  }

  test("pagerank on an empty pair list returns an empty frame, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Graph.pagerank(empty, 3).count() == 0)
  }

  test("pagerank ranks the hub above leaves and symmetric pairs equally") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
    val r = pr(pairs, 8)
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L))
    assert(r(5L) == r(6L))
    // total mass stays ~1 (integer-div leakage only)
    val total = r.values.sum
    assert(total > 900000L && total <= 1000000L)
  }
}
