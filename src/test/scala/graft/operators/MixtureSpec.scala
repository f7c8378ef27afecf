package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpecBase {
  import spark.implicits._

  test("waterfill: binding domain keeps all rows, rates follow C·w/n exactly") {
    // counts: a=100, b=10; weights a=0.5, b=0.5 → C = min(100/0.5, 10/0.5)
    // = 20 rows; b binds (rate 1e6 — every row eligible), a keeps 10%.
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 110).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val got = Mixture.waterfill(df, "id", "dom",
      Seq("a" -> 500000L, "b" -> 500000L))
    val rates = got.select("dom", "rate_u").distinct().as[(String, Long)]
      .collect().toMap
    assert(rates("b") == 1000000L) // binding domain: keeps everything
    assert(rates("a") == 100000L)  // C=20 → a keeps 20·0.5/100 = 10%
    val kept = got.select("id", "dom").as[(Long, String)].collect()
    assert(kept.count(_._2 == "b") == 10) // rate 1e6 ⇒ ALL of b survives
    // a's kept set is exactly the hash rule — replay it driver-side
    val aKept = kept.filter(_._2 == "a").map(_._1).toSet
    val expected = (1 to 100).filter { i =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$i:a").take(8), 16)
      h % 1000000L < 100000L
    }.map(_.toLong).toSet
    assert(aKept == expected)
  }

  test("waterfill: domains absent from the mixture are dropped") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "zzz")).toDF("id", "dom")
    val got = Mixture.waterfill(df, "id", "dom",
      Seq("a" -> 500000L, "b" -> 500000L))
    assert(!got.select("dom").as[String].collect().contains("zzz"))
  }

  test("qualityFloor keeps each domain's top slice at the discrete quantile, ties included") {
    // domain A: scores 1..10 -> 0.7-cutoff = 7 (cum 7 >= 7), keep 7..10
    // domain B: all equal    -> cutoff = the value, keep everything
    // domain C: ties at cutoff -> cum(1)=5 < 7, cum(2)=10 >= 7, keep all five 2s
    val rows = (1L to 10L).map(i => (i, "A", i)) ++
      (11L to 14L).map(i => (i, "B", 5L)) ++
      (21L to 25L).map(i => (i, 'C'.toString, 1L)) ++
      (26L to 30L).map(i => (i, "C", 2L))
    val df = rows.toDF("id", "dom", "s")
    val got = Mixture.qualityFloor(df, "id", "dom", col("s"), 0.7)
      .as[(Long, String, Long)].collect().toSet
    val expect = ((7L to 10L).map(i => (i, "A", i)) ++
      (11L to 14L).map(i => (i, "B", 5L)) ++
      (26L to 30L).map(i => (i, "C", 2L))).toSet
    assert(got == expect)
    intercept[IllegalArgumentException] {
      Mixture.qualityFloor(df, "id", "dom", col("s"), 1.0)
    }
  }

  test("waterfill refuses malformed weights") {
    val df = Seq((1L, "a")).toDF("id", "dom")
    intercept[IllegalArgumentException] {
      Mixture.waterfill(df, "id", "dom", Seq("a" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Mixture.waterfill(df, "id", "dom",
        Seq("a" -> 900000L, "b" -> 200000L)) // sums over 1e6
    }
  }
}
