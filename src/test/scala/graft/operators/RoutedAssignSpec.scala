package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** IVF-routed center assignment (Ann.clusterAssignRouted) — the scale
  * path of clusterAssign for center counts in the thousands: gates are
  * bit-exact equality with the brute scan when every cell is probed,
  * exact assignment on planted well-separated clusters under real
  * pruning, and a high-agreement bound on smooth random data. */
class RoutedAssignSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1214)

  private def collectAssign(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double)] =
    df.select("vec_id", "cid", "cos").as[(Long, Int, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("nprobe >= cells degrades to the exact scan bit-for-bit") {
    val centers = (0 until 24).map(i =>
      (i, Array.fill(8)(rng.nextFloat() + 0.01f))).toArray
    val corpus = (1L to 60L).map(id => (id, Array.fill(8)(rng.nextFloat() + 0.01f)))
      .toDF("vec_id", "embedding")
    val exact = collectAssign(Ann.clusterAssign(corpus, "vec_id", "embedding", centers))
    val routed = collectAssign(Ann.clusterAssignRouted(corpus, "vec_id", "embedding",
      centers, cells = 6, nprobe = 6))
    assert(routed == exact)
  }

  test("planted orthogonal clusters assign exactly under real pruning") {
    // 8 orthogonal center directions; corpus vectors are jittered copies
    // of their center — routing cells separate cleanly, so nprobe = 1
    // still finds the true center
    val centers = (0 until 8).map { c =>
      val v = Array.fill(32)(0f); v(c * 4) = 1f; (c, v)
    }.toArray
    val corpus = (0 until 80).map { i =>
      val c = i % 8
      val v = centers(c)._2.clone()
      v(c * 4 + 1) = 0.05f * (1 + i / 8 % 3)
      ((i + 1).toLong, v)
    }
    val routed = collectAssign(Ann.clusterAssignRouted(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      centers, cells = 8, nprobe = 1))
    corpus.foreach { case (id, _) =>
      assert(routed(id)._1 == (id - 1) % 8, s"vec $id routed to ${routed(id)._1}")
    }
  }

  test("uniform random data (worst case): agreement grows with nprobe, optimum never exceeded") {
    // uniform random vectors have NO cluster structure — the hardest
    // regime for routing (real embedding corpora cluster, see the
    // planted test). The gate is the tradeoff curve's shape: monotone
    // agreement in nprobe, >= 80% at half the cells probed, exact at all.
    val centers = (0 until 64).map(i =>
      (i, Array.fill(16)(rng.nextFloat() + 0.01f))).toArray
    val corpus = (1L to 400L).map(id => (id, Array.fill(16)(rng.nextFloat() + 0.01f)))
      .toDF("vec_id", "embedding")
    val exact = collectAssign(Ann.clusterAssign(corpus, "vec_id", "embedding", centers))
    val agreeAt = (np: Int) => {
      val routed = collectAssign(Ann.clusterAssignRouted(corpus, "vec_id", "embedding",
        centers, cells = 8, nprobe = np))
      // routed cosine never exceeds the exact optimum
      exact.foreach { case (id, (_, c)) => assert(routed(id)._2 <= c + 1e-12) }
      exact.count { case (id, (cid, _)) => routed(id)._1 == cid }
    }
    val Seq(a4, a6, a8) = Seq(4, 6, 8).map(agreeAt)
    assert(a4 >= (exact.size * 0.8).toInt, s"agreement $a4/${exact.size} at 4/8")
    assert(a6 >= a4 && a8 >= a6, s"agreement not monotone: $a4, $a6, $a8")
    assert(a8 == exact.size)
  }

  test("zero-norm vectors and centers fail loudly") {
    val centers = Array((0, Array(1f, 0f)), (1, Array(0f, 1f)))
    val bad = Seq((1L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ann.clusterAssignRouted(bad, "vec_id", "embedding", centers, 2, 1).collect()
    }
    assert(e.getMessage.contains("zero-norm") ||
      Option(e.getCause).exists(_.getMessage.contains("zero-norm")))
    intercept[IllegalArgumentException] {
      Ann.clusterAssignRouted(bad, "vec_id", "embedding",
        Array((0, Array(0f, 0f))), 1, 1)
    }
  }
}
