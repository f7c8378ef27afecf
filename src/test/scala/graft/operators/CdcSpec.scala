package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Content-defined chunking: exact tiling, boundary re-synchronization
  * after an insertion (the property fixed-size splits lack), and
  * first-wins dedup accounting. */
class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def randText(n: Int): String =
    Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString

  test("cdcChunks tile each document exactly and respect the boundary rule") {
    val docs = Seq((1L, randText(400)), (2L, randText(7)), (3L, randText(60)))
      .toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", 8, 16).cache()
    val tiled = ch.groupBy("doc_id").agg(
      sum("clen").as("covered"), min("s").as("s0"), max("e").as("e1"),
      count(lit(1)).as("n"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
    assert(tiled.filter(col("covered") =!= col("len")).count() == 0)
    assert(tiled.filter(col("s0") =!= 0 || col("e1") =!= col("len")).count() == 0)
    // a 7-char doc (< gram width) is a single whole-doc chunk
    val short = ch.filter(col("doc_id") === 2L).select("s", "e").as[(Long, Long)].collect()
    assert(short.toSeq == Seq((0L, 7L)))
    ch.unpersist()
  }

  test("CDC boundaries re-synchronize after an insertion; fixed splits would not") {
    val shared = randText(600)
    val docs = Seq((1L, shared), (2L, randText(37) + shared)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", 8, 16).cache()
    val h1 = ch.filter(col("doc_id") === 1L).select("ph").as[String].collect().toSet
    val c2 = ch.filter(col("doc_id") === 2L).select("ph", "clen").as[(String, Long)].collect()
    // enough boundaries exist for the property to be non-vacuous
    assert(h1.size >= 5 && c2.length >= 5)
    // all but the chunks touching the splice re-align with doc 1
    val dupChars = c2.filter(p => h1.contains(p._1)).map(_._2).sum
    assert(dupChars >= shared.length * 7 / 10,
      s"only $dupChars of ${shared.length} shared chars re-synchronized")
    val dedup = Dedup.cdcDedup(docs, "doc_id", "text", 8, 16)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(dedup(1L)._3 == 0L || dedup(1L)._3 < dedup(2L)._3) // first doc keeps its content
    assert(dedup(2L)._3 >= 1L && dedup(2L)._4 == dupChars)
    ch.unpersist()
  }

  test("cdcDedup: identical docs — later copy is fully duplicate chunks") {
    val t = randText(300)
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val got = Dedup.cdcDedup(docs, "doc_id", "text", 8, 16)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 == 0L && got(1L)._4 == 0L)
    assert(got(2L)._3 == got(2L)._2 && got(2L)._4 == 300L)
  }
}
