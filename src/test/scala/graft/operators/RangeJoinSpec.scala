package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("pointInInterval matches brute force on random overlapping intervals") {
    val rnd = new scala.util.Random(31)
    val pts = Seq.tabulate(400)(i => (i.toLong, rnd.nextDouble() * 100 - 10))
    val ivs = Seq.tabulate(60) { i =>
      val lo = rnd.nextDouble() * 100 - 10
      (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }
    for (width <- Seq(0.5, 3.0, 40.0)) {
      val got = RangeJoin.pointInInterval(
        pts.toDF("pid", "p"), ivs.toDF("iid", "lo", "hi"), "p", "lo", "hi", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val expected = (for {
        (pid, p) <- pts; (iid, lo, hi) <- ivs if lo <= p && p <= hi
      } yield (pid, iid)).toSet
      assert(got == expected, s"width=$width")
      assert(expected.nonEmpty)
    }
  }

  test("interval ends are inclusive and negative coordinates bucket correctly") {
    val pts = Seq((1L, -5.0), (2L, 0.0), (3L, 5.0)).toDF("pid", "p")
    val ivs = Seq((10L, -5.0, 0.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 2.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // both ends in, 5.0 out
  }

  test("a degenerate giant interval fails loudly instead of exploding") {
    val pts = Seq((1L, 0.0)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", 1.0, maxBucketsPerInterval = 100)
        .count()
    }
    assert(ex.getMessage != null)
  }
}
