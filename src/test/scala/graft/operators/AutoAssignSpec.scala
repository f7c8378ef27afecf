package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Automatic exact-pruned cluster assignment (round 14): clusterAssign
  * dispatches to the spherical-bound pruned path above AutoRouteK, and
  * the switch must be INVISIBLE — bit-equal (cid AND cosine) to the flat
  * broadcast scan on clustered fixtures, uniform fixtures (worst case:
  * nothing prunes), and the adversarial duplicate-centers-across-cells
  * fixture where a skipped cell could otherwise steal a lower-cid tie. */
class AutoAssignSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dim = 16

  private def unit(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    val v = Array.fill(Dim)(r.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def jitter(base: Array[Float], seed: Int, eps: Float): Array[Float] = {
    val r = new scala.util.Random(seed)
    base.map(x => x + (r.nextFloat() - 0.5f) * eps)
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double)] =
    df.select("vec_id", "cid", "cos").as[(Long, Int, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  private def corpus(n: Int, anchors: Seq[Array[Float]]): org.apache.spark.sql.DataFrame =
    (0 until n).map(i =>
      (i.toLong, jitter(anchors(i % anchors.size), 9000 + i, 0.4f)))
      .toDF("vec_id", "embedding")

  test("above AutoRouteK the pruned path is bit-equal to the flat scan (clustered centers)") {
    val k = Ann.AutoRouteK + 40
    val anchors = (0 until 16).map(a => unit(100 + a))
    val centers = Array.tabulate(k)(c => (c, jitter(anchors(c % 16), 5000 + c, 0.1f)))
    val docs = corpus(400, anchors)
    assert(collect(Ann.clusterAssign(docs, "vec_id", "embedding", centers)) ==
      collect(Ann.clusterAssignBrute(docs, "vec_id", "embedding", centers)))
  }

  test("uniform centers (worst case, nothing prunes) stay bit-equal") {
    val k = Ann.AutoRouteK + 8
    val centers = Array.tabulate(k)(c => (c, unit(200 + c)))
    val docs = (0 until 200).map(i => (i.toLong, unit(7000 + i))).toDF("vec_id", "embedding")
    assert(collect(Ann.clusterAssign(docs, "vec_id", "embedding", centers)) ==
      collect(Ann.clusterAssignBrute(docs, "vec_id", "embedding", centers)))
  }

  test("duplicate centers across cells cannot steal the lower-cid tie through pruning") {
    val k = Ann.AutoRouteK + 16
    val base = unit(42)
    // every center identical: every cell bound ties the running best
    // exactly, so every cell must scan and cid 0 must win everywhere
    val centers = Array.tabulate(k)(c => (c, base.clone()))
    val docs = (0 until 50).map(i => (i.toLong, jitter(base, 8000 + i, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = collect(Ann.clusterAssign(docs, "vec_id", "embedding", centers))
    assert(got == collect(Ann.clusterAssignBrute(docs, "vec_id", "embedding", centers)))
    assert(got.values.forall(_._1 == 0))
  }

  test("the switch point itself is bit-invariant (k = AutoRouteK vs AutoRouteK + 1)") {
    val anchors = (0 until 8).map(a => unit(300 + a))
    val centersAt = Array.tabulate(Ann.AutoRouteK)(c => (c, jitter(anchors(c % 8), 6000 + c, 0.1f)))
    val docs = corpus(200, anchors)
    val flat = collect(Ann.clusterAssign(docs, "vec_id", "embedding", centersAt))
    // adding one center ABOVE the threshold flips the implementation;
    // results for rows whose winner is unchanged must not move at all
    val far = unit(999).map(x => -x) // antipodal-ish: wins nothing here
    val centersOver = centersAt :+ ((Ann.AutoRouteK, far))
    val auto = collect(Ann.clusterAssign(docs, "vec_id", "embedding", centersOver))
    val brute = collect(Ann.clusterAssignBrute(docs, "vec_id", "embedding", centersOver))
    assert(auto == brute)
    assert(auto == flat, "an extra never-winning center across the switch changed results")
  }

  test("assignBuckets itself is bit-invariant across the switch point (ingest bucketing path)") {
    // clusterAssign's switch is pinned above; assignBuckets has its OWN
    // dispatch (the streaming IVF ingest path), so drive it directly:
    // flat at k = AutoRouteK vs routed at k = AutoRouteK + 1 with a
    // never-winning extra center must agree, and the routed output must
    // equal the brute scan's winner
    val anchors = (0 until 8).map(a => unit(400 + a))
    val centersAt = Array.tabulate(Ann.AutoRouteK)(c =>
      (c, jitter(anchors(c % 8), 6100 + c, 0.1f)))
    val docs = corpus(200, anchors)
    def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val flat = buckets(Ann.assignBuckets(docs, "vec_id", "embedding", centersAt))
    val far = unit(998).map(x => -x) // antipodal-ish: wins nothing here
    val centersOver = centersAt :+ ((Ann.AutoRouteK, far))
    val routed = buckets(Ann.assignBuckets(docs, "vec_id", "embedding", centersOver))
    assert(routed == flat,
      "an extra never-winning center across assignBuckets' switch changed buckets")
    val brute = collect(Ann.clusterAssignBrute(docs, "vec_id", "embedding", centersOver))
      .map { case (id, (cid, _)) => id -> cid }
    assert(routed == brute)
  }
}
