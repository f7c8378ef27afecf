package graft.operators

import graft.SparkSpecBase

/** Large-star/small-star connected components (Kiveris et al. 2014) vs
  * the iterated min-label propagation baseline: identical labels on
  * every fixture shape, far fewer rounds on chains. */
class CcStarSpec extends SparkSpecBase {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  private def pairsDf(ps: Seq[(Long, Long)]) = ps.toDF("a_id", "b_id")

  test("star CC equals propagation on a chain, in far fewer rounds") {
    val chain = (1L until 60L).map(i => (i, i + 1))
    val prop = labelsOf(Dedup.connectedComponents(pairsDf(chain), maxIter = 100))
    val (starDf, rounds) = Dedup.connectedComponentsStarRounds(pairsDf(chain))
    val star = labelsOf(starDf)
    assert(star == prop)
    assert(star.values.toSet == Set(1L) && star.size == 60)
    info(s"chain-60 star rounds: $rounds")
    assert(rounds <= 8, s"star CC needed $rounds rounds on a 60-chain")
  }

  test("star CC equals propagation on cliques and isolated edges") {
    val clique = for (i <- 10L to 20L; j <- (i + 1) to 20L) yield (i, j)
    val ps = clique ++ Seq((100L, 101L), (200L, 201L), (201L, 202L))
    val prop = labelsOf(Dedup.connectedComponents(pairsDf(ps)))
    val star = labelsOf(Dedup.connectedComponentsStar(pairsDf(ps)))
    assert(star == prop)
    assert(star(20L) == 10L && star(101L) == 100L && star(202L) == 200L)
  }

  test("star CC equals propagation on random graphs (fuzz)") {
    val rng = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      val n = 80
      val ps = (0 until 120).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val prop = labelsOf(Dedup.connectedComponents(pairsDf(ps), maxIter = 100))
      val star = labelsOf(Dedup.connectedComponentsStar(pairsDf(ps)))
      assert(star == prop)
    }
  }

  test("star CC on an empty pair graph yields no labels") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponentsStar(empty).count() == 0)
  }

  test("auto CC equals star on every fixture, under AND over the driver bound") {
    val rng = new scala.util.Random(14)
    val fixtures = Seq(
      (1L until 60L).map(i => (i, i + 1)),                    // chain
      (for (i <- 10L to 20L; j <- (i + 1) to 20L) yield (i, j)) ++
        Seq((100L, 101L), (200L, 201L), (201L, 202L)),        // cliques + edges
      (0 until 120).map(_ =>
        (rng.nextInt(80).toLong, rng.nextInt(80).toLong))
        .filter(p => p._1 != p._2),                           // random
      Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (3L, 1L)))  // dup/reversed
    fixtures.foreach { ps =>
      val star = labelsOf(Dedup.connectedComponentsStar(pairsDf(ps)))
      // driver union-find path (all fixtures fit the default bound)
      assert(labelsOf(Dedup.connectedComponentsAuto(pairsDf(ps))) == star)
      // forced DISTRIBUTED path: a limit below the edge count falls back
      assert(labelsOf(Dedup.connectedComponentsAuto(pairsDf(ps),
        driverEdgeLimit = 1)) == star)
    }
    assert(Dedup.connectedComponentsAuto(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).count() == 0)
  }

  test("auto CC on string ids routes to the type-generic star, losing no edges") {
    // string UUID-ish ids: a long cast would null every id and silently
    // drop all edges (every duplicate kept); auto must fall back to the
    // type-generic star and label lexicographic component-mins
    val ps = Seq(("u-b", "u-a"), ("u-b", "u-c"), ("u-x", "u-y"))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponentsAuto(ps)
      .as[(String, String)].collect().toMap
    assert(got == Map("u-a" -> "u-a", "u-b" -> "u-a", "u-c" -> "u-a",
      "u-x" -> "u-x", "u-y" -> "u-x"))
  }

  test("auto CC numeric-string ids keep the hi>lo invariant via the star path") {
    // "10" < "9" lexicographically but 10 > 9 numerically; the old
    // greatest-before-cast mixed the two orders. String ids now run the
    // type-generic star end to end: canonical order is lexicographic in
    // BOTH the edge canonicalization and the label min, consistently.
    val ps = Seq(("9", "10"), ("10", "11")).toDF("a_id", "b_id")
    val got = Dedup.connectedComponentsAuto(ps)
      .as[(String, String)].collect().toMap
    assert(got == Map("9" -> "10", "10" -> "10", "11" -> "10"))
  }

  test("auto CC casts int ids to long AFTER widening, same labels as star") {
    val ps = Seq((5, 3), (3, 1), (7, 8)).toDF("a_id", "b_id")
    val got = labelsOf(Dedup.connectedComponentsAuto(ps))
    assert(got == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("star CC handles reversed and duplicate input pairs") {
    val ps = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (3L, 1L))
    val star = labelsOf(Dedup.connectedComponentsStar(pairsDf(ps)))
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
