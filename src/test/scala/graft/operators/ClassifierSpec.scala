package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Logistic-regression fit: hand-replayed micro-unit trajectory, round-0
  * exactness (all-zero weights => p_u = 500000 exactly), learning on a
  * separable corpus, and determinism. */
class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dim = 64
  private val LrScale = 2L

  /** Independent driver-side replay of the exact integer trajectory:
    * same hash (first 8 md5 hex chars), same micro-unit sigmoid floor,
    * same truncating-division update. */
  private def replayFit(docs: Seq[(Long, String, Long)], dim: Int,
                        rounds: Int, lrScale: Long): Map[Long, Long] = {
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val feat = docs.flatMap { case (id, text, yu) =>
      text.trim.split("\\s+").filter(_.nonEmpty)
        .groupBy(t => h32(t) % dim).map { case (b, ts) =>
          (id, yu, b, ts.length.toLong)
        }
    }
    val nDocs = feat.map(_._1).distinct.size
    val lrDiv = nDocs * lrScale
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    (0 until rounds).foreach { _ =>
      val errs = feat.groupBy(r => (r._1, r._2)).map { case ((id, yu), rows) =>
        val dot = rows.map(r => r._4 * w(r._3)).sum
        val p = math.floor(1.0 / (1.0 + math.exp(-(dot.toDouble / 1.0e6)))
          * 1.0e6 + 0.5).toLong
        id -> (p - yu)
      }
      val grads = feat.groupBy(_._3).map { case (b, rows) =>
        b -> rows.map(r => errs(r._1) * r._4).sum
      }
      w = w ++ grads.map { case (b, g) => b -> (w(b) - g / lrDiv) }
    }
    w.toMap
  }

  test("fitLogistic matches an independent exact-integer replay over 3 rounds") {
    val docs = Seq(
      (1L, "good fine good solid", 1000000L),
      (2L, "bad awful bad", 0L),
      (3L, "good bad fine", 1000000L),
      (4L, "awful awful solid", 0L))
    val df = docs.map { case (id, t, y) => (id, t, y == 1000000L) }
      .toDF("doc_id", "text", "is_pos")
    val got = Classifier.fitLogistic(df, "doc_id", "text",
        when(col("is_pos"), 1000000L).otherwise(0L), Dim, 3, LrScale)
      .as[(Long, Long)].collect().toMap
    val want = replayFit(docs, Dim, 3, LrScale)
    assert(got == want.filter(_ => true)) // full map equality
    assert(got.nonEmpty && got.values.exists(_ != 0L))
  }

  test("round 0 is exact: zero weights give p_u = 500000 for every doc") {
    val df = Seq((1L, "x y", true), (2L, "z", false))
      .toDF("doc_id", "text", "is_pos")
    val eval1 = Classifier.evalLogistic(df, "doc_id", "text",
      when(col("is_pos"), 1000000L).otherwise(0L), Dim, 1, LrScale)
    // after ONE round weights moved, but the replay of round 0 inside
    // the fit saw exactly 500000: check via a 1-round fit's weights —
    // every gradient contribution is (500000 - y_u) * c exactly.
    val w = Classifier.fitLogistic(df, "doc_id", "text",
        when(col("is_pos"), 1000000L).otherwise(0L), Dim, 1, LrScale)
      .as[(Long, Long)].collect().toMap
    val want = replayFit(Seq((1L, "x y", 1000000L), (2L, "z", 0L)),
      Dim, 1, LrScale)
    assert(w == want)
    assert(eval1.count() == 2)
  }

  test("separable corpus: training lifts accuracy above the all-positive baseline") {
    val pos = (1L to 30L).map(i => (i, s"good nice fine t$i", true))
    val neg = (31L to 60L).map(i => (i, s"bad awful poor t$i", false))
    val df = (pos ++ neg).toDF("doc_id", "text", "is_pos")
    val label = when(col("is_pos"), 1000000L).otherwise(0L)
    val eval = Classifier.evalLogistic(df, "doc_id", "text", label,
      Dim, 4, 1L).cache()
    val n = eval.count()
    val acc = eval.filter(col("correct")).count().toDouble / n
    assert(n == 60)
    // all-zero weights predict everything positive => 0.5 here
    assert(acc > 0.9, s"accuracy $acc after training on a separable corpus")
    // positive docs score above negative docs
    val meanPos = eval.filter(col("y_u") === 1000000L).agg(avg("p_u"))
      .as[Double].head()
    val meanNeg = eval.filter(col("y_u") === 0L).agg(avg("p_u"))
      .as[Double].head()
    assert(meanPos > meanNeg)
    eval.unpersist()
  }

  test("fit is deterministic and bounded by dim distinct buckets") {
    val df = (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 3} filler", i % 2 == 0))
      .toDF("doc_id", "text", "is_pos")
    val label = when(col("is_pos"), 1000000L).otherwise(0L)
    val a = Classifier.fitLogistic(df, "doc_id", "text", label, 8, 2, LrScale)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Classifier.fitLogistic(df, "doc_id", "text", label, 8, 2, LrScale)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.size <= 8 && a.forall(p => p._1 >= 0 && p._1 < 8))
  }

  test("production-dim broadcast-join path equals the map-literal trajectory") {
    // dim > MapLiteralMaxDim forces the join path; the independent
    // replay is path-agnostic, so equality proves the join path runs
    // the identical exact-integer trajectory (no 100k-entry literal
    // ever compiles into the plan)
    val bigDim = Classifier.MapLiteralMaxDim + 904 // 5000
    val docs = Seq(
      (1L, "good fine good solid", 1000000L),
      (2L, "bad awful bad", 0L),
      (3L, "good bad fine", 1000000L),
      (4L, "awful awful solid", 0L))
    val df = docs.map { case (id, t, y) => (id, t, y == 1000000L) }
      .toDF("doc_id", "text", "is_pos")
    val label = when(col("is_pos"), 1000000L).otherwise(0L)
    val got = Classifier.fitLogistic(df, "doc_id", "text", label,
        bigDim, 3, LrScale)
      .as[(Long, Long)].collect().toMap
    assert(got == replayFit(docs, bigDim, 3, LrScale))
    // eval rides the same path: per-doc p_u from the joined dot
    val eval = Classifier.evalLogistic(df, "doc_id", "text", label,
        bigDim, 3, LrScale)
      .select("doc_id", "p_u").as[(Long, Long)].collect().toMap
    assert(eval.keySet == Set(1L, 2L, 3L, 4L))
    assert(eval.values.forall(p => p >= 0L && p <= 1000000L))
  }

  test("docs with zero tokens are excluded from fit and eval") {
    val df = Seq((1L, "word", true), (2L, "   ", false), (3L, "", false))
      .toDF("doc_id", "text", "is_pos")
    val label = when(col("is_pos"), 1000000L).otherwise(0L)
    val eval = Classifier.evalLogistic(df, "doc_id", "text", label, Dim, 1, LrScale)
    assert(eval.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}
