package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Greedy k-center coreset (Ann.kcenterCoreset): the gate is EXACT
  * trajectory equality against a plain-Scala reference simulation of
  * Gonzalez's algorithm — picks, order, and micro-unit radii — plus the
  * semantic guarantee the operator is for (one prototype per planted
  * cluster before any second prototype inside a cluster). */
class KcenterSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1108)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Reference simulation: identical arithmetic, driver-side. */
  private def reference(vs: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Long, Option[Long])] = {
    val sorted = vs.sortBy(_._1)
    val seed = sorted.head
    val norms = vs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    def dist(a: (Long, Array[Float]), b: (Long, Array[Float])): Double =
      1.0 - dot(a._2, b._2) / (norms(a._1) * norms(b._1))
    var m = vs.map(p => p._1 -> dist(p, seed)).toMap
    var picked = Vector[(Long, Long, Option[Long])]((0L, seed._1, None))
    val byId = vs.map(p => p._1 -> p).toMap
    (1 until k).foreach { i =>
      val selIds = picked.map(_._2).toSet
      val (bid, bm) = m.filterNot(p => selIds(p._1)).toSeq
        .sortBy { case (id, d) => (-d, id) }.head
      picked :+= ((i.toLong, bid, Some(math.floor(bm * 1e6 + 0.5).toLong)))
      m = m.map { case (id, d) => id -> math.min(d, dist(byId(id), byId(bid))) }
    }
    picked
  }

  private def got(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Option[Long])] =
    df.select("sel_rank", "vec_id", "r_u").as[(Long, Long, Option[Long])]
      .collect().sortBy(_._1).toSeq

  test("selection trajectory equals the plain-Scala Gonzalez reference, radii included") {
    (0 until 4).foreach { trial =>
      val vs = (1L to 20L).map(id =>
        (id, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
      val df = vs.toDF("vec_id", "embedding")
      val res = got(Ann.kcenterCoreset(df, "vec_id", "embedding", 6))
      assert(res == reference(vs, 6), s"trial $trial")
      assert(res.head._3.isEmpty && res.tail.forall(_._3.nonEmpty))
    }
  }

  test("covering radius trajectory is non-increasing (greedy max-min is monotone)") {
    val vs = (1L to 30L).map(id => (id, Array.fill(8)(rng.nextFloat())))
    val radii = got(Ann.kcenterCoreset(vs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 8)).flatMap(_._3)
    assert(radii == radii.sorted.reverse)
  }

  test("planted clusters: the first k picks cover all k clusters before any revisit") {
    // 4 orthogonal directions + small same-direction jitter: cross-cluster
    // cosine distance ~1, in-cluster ~0 — greedy max-min must take one
    // prototype per cluster in picks 0..3
    val dirs = (0 until 4).map { c =>
      val v = Array.fill(16)(0f); v(c * 4) = 1f; v
    }
    val vs = (0 until 24).map { i =>
      val c = i % 4
      val v = dirs(c).clone()
      v(c * 4 + 1 + (i / 4) % 3) = 0.05f * ((i / 4) + 1)
      ((i + 1).toLong, v)
    }
    val res = got(Ann.kcenterCoreset(vs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 4))
    val clusters = res.map { case (_, id, _) => ((id - 1) % 4) }
    assert(clusters.toSet.size == 4, s"picked clusters $clusters")
  }

  test("k=1 returns just the lowest-id seed; reruns are bit-identical") {
    val vs = (5L to 15L).map(id => (id, Array.fill(4)(rng.nextFloat())))
    val df = vs.toDF("vec_id", "embedding")
    assert(got(Ann.kcenterCoreset(df, "vec_id", "embedding", 1)) ==
      Seq((0L, 5L, None)))
    val a = got(Ann.kcenterCoreset(df, "vec_id", "embedding", 5))
    val b = got(Ann.kcenterCoreset(df, "vec_id", "embedding", 5))
    assert(a == b)
  }

  test("k over the pass/driver-pick cap or under 1 is refused") {
    val df = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Ann.kcenterCoreset(df, "vec_id", "embedding", Ann.MaxKcenterK + 1)
    }
    intercept[IllegalArgumentException] {
      Ann.kcenterCoreset(df, "vec_id", "embedding", 0)
    }
  }

  test("zero-norm embedding fails loudly in both variants (clusterAssign posture)") {
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 0f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.kcenterCoreset(df, "vec_id", "embedding", 2).collect()
    }
    assert(e.getMessage.contains("zero-norm") ||
      Option(e.getCause).exists(_.getMessage.contains("zero-norm")))
    val e2 = intercept[Exception] {
      Ann.kcenterSampled(df, "vec_id", "embedding", 2, m = 8).collect()
    }
    assert(e2.getMessage.contains("zero-norm"))
  }

  test("sampled variant with a covering sample equals the exact operator row-for-row") {
    (0 until 3).foreach { trial =>
      val vs = (1L to 25L).map(id =>
        (id, Array.fill(8)(rng.nextFloat() * 2f - 1f)))
      val df = vs.toDF("vec_id", "embedding")
      val exact = got(Ann.kcenterCoreset(df, "vec_id", "embedding", 7))
      val sampled = got(Ann.kcenterSampled(df, "vec_id", "embedding", 7, m = 64))
      assert(sampled == exact, s"trial $trial")
    }
  }

  test("sampled variant under subsampling still covers every planted cluster") {
    // 5 orthogonal clusters × 40 members; m = 32 of 200 sampled — a
    // uniform sample hits every cluster whp and greedy max-min must then
    // take one prototype per cluster before any revisit
    val dirs = (0 until 5).map { c =>
      val v = Array.fill(20)(0f); v(c * 4) = 1f; v
    }
    val vs = (0 until 200).map { i =>
      val c = i % 5
      val v = dirs(c).clone()
      v(c * 4 + 1 + (i / 5) % 3) = 0.04f * ((i / 5) % 7 + 1)
      ((i + 1).toLong, v)
    }
    val res = got(Ann.kcenterSampled(vs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", 5, m = 32))
    val clusters = res.map { case (_, id, _) => ((id - 1) % 5) }
    assert(clusters.toSet.size == 5, s"picked clusters $clusters")
  }

  test("sampled variant has no MaxKcenterK cap — k is bounded by the sample alone") {
    val vs = (1L to 300L).map(id => (id, Array.fill(6)(rng.nextFloat() + 0.01f)))
    val df = vs.toDF("vec_id", "embedding")
    val res = got(Ann.kcenterSampled(df, "vec_id", "embedding",
      Ann.MaxKcenterK + 4, m = Ann.MaxKcenterK + 44))
    assert(res.length == Ann.MaxKcenterK + 4)
    assert(res.map(_._2).distinct.length == res.length)
    intercept[IllegalArgumentException] {
      Ann.kcenterSampled(df, "vec_id", "embedding", 9, m = 8) // k > m
    }
    intercept[IllegalArgumentException] {
      Ann.kcenterSampled(df, "vec_id", "embedding", 4, m = Ann.MaxKcenterSample + 1)
    }
  }
}
