package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Leakage-safe split (Dedup.leakageSafeSplit): the load-bearing property
  * is that NO verified near-dup pair (and no exact-copy pair) straddles a
  * split boundary — the guarantee a doc-level hash split cannot give. */
class LeakageSplitSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1112)
  private def words(n: Int): String =
    (0 until n).map(_ => s"w${rng.nextInt(400)}").mkString(" ")

  /** Corpus with exact-copy groups and paraphrase (near-dup) pairs. */
  private def corpus(): Seq[(Long, String)] = {
    var id = 0L
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until 40).foreach { _ =>
      val base = words(30)
      id += 1; out += ((id, base))
      rng.nextInt(3) match {
        case 0 => // exact copy
          id += 1; out += ((id, base))
        case 1 => // paraphrase: one word appended (high jaccard)
          id += 1; out += ((id, base + " w999"))
        case _ => ()
      }
    }
    out.toSeq
  }

  test("no exact-copy or verified near-dup pair straddles a split") {
    val docs = corpus().toDF("doc_id", "text")
    val split = Dedup.leakageSafeSplit(docs, "doc_id", "text", "s1")
      .select(col("doc_id"), col("split"))
    // exact copies: same md5 -> must share split
    val byHash = docs.withColumn("h", md5(col("text").cast("binary")))
      .join(split, "doc_id")
      .groupBy("h").agg(countDistinct("split").as("ns"))
    assert(byHash.filter(col("ns") > 1).count() == 0)
    // verified near-dup pairs over the SAME candidate machinery
    val reps = Dedup.exactRepresentatives(docs, "doc_id", md5(col("text").cast("binary")))
    val ver = Dedup.jaccardForPairs(reps, "doc_id", "text", 3,
        Dedup.minhashCandidates(reps, "doc_id", "text", 12, 3, 3, 10000))
      .filter(col("jaccard") >= 0.8)
    val straddle = ver
      .join(split.select(col("doc_id").as("a_id"), col("split").as("sa")), "a_id")
      .join(split.select(col("doc_id").as("b_id"), col("split").as("sb")), "b_id")
      .filter(col("sa") =!= col("sb"))
    assert(straddle.count() == 0)
    assert(ver.count() > 0) // the fixture actually plants near-dups
  }

  test("every doc gets exactly one split; same seed reproduces, new seed moves clusters") {
    val docs = corpus().toDF("doc_id", "text")
    val a = Dedup.leakageSafeSplit(docs, "doc_id", "text", "s1")
      .select("doc_id", "split").as[(Long, String)].collect().sortBy(_._1)
    val b = Dedup.leakageSafeSplit(docs, "doc_id", "text", "s1")
      .select("doc_id", "split").as[(Long, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.length == docs.count())
    val c = Dedup.leakageSafeSplit(docs, "doc_id", "text", "s2")
      .select("doc_id", "split").as[(Long, String)].collect().sortBy(_._1)
    assert(c.toSeq != a.toSeq) // a different seed reshuffles some cluster
    // rough 80/10/10 shape on ~40 clusters: train strictly dominates
    val frac = a.count(_._2 == "train").toDouble / a.length
    assert(frac > 0.5 && frac < 0.98, s"train fraction $frac")
  }
}
