package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Split-index RETENTION (round 14 — Dedup.compactSplitIndexDropBefore):
  * a dropBefore(epochMin) compaction retires clusters whose whole
  * recorded history predates the horizon, emits one tombstone per
  * retired cluster for the at-ingest consumer, and leaves the retained
  * half of the index EQUAL to from-scratch over the retained corpus
  * (horizon-clean feeds). Straddling clusters are conservatively kept
  * whole; retired content re-founds a NEW cluster if it ever returns —
  * the "index forgets" semantics retention must mean. */
class SplitRetentionSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1403)
  private def words(n: Int): String =
    (0 until n).map(_ => s"r${rng.nextInt(400)}").mkString(" ")

  private def freshIdx(): String =
    java.nio.file.Files.createTempDirectory("graft-splitret").toString

  /** One era of clustered docs starting at `id0`: singletons, exact
    * copies, paraphrase pairs — every cluster CONTAINED in the era. */
  private def era(id0: Long, groups: Int): Seq[(Long, String)] = {
    var id = id0
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until groups).foreach { _ =>
      val base = words(30)
      out += ((id, base)); id += 1
      rng.nextInt(3) match {
        case 0 => out += ((id, base)); id += 1 // exact copy
        case 1 => out += ((id, base + " r999")); id += 1 // paraphrase
        case _ => ()
      }
    }
    out.toSeq
  }

  private def assignMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    df.select("doc_id", "cluster_label", "split").as[(Long, Long, String)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("post-retention assignment equals from-scratch over the retained corpus; tombstones fold") {
    val old = era(1L, 12)
    val epochMin = old.map(_._1).max + 1
    val fresh = era(epochMin, 12)
    val root = freshIdx()
    val seed = "ret"

    // at-ingest consumer state: outputs + corrections per batch
    var acc = Map.empty[Long, (Long, String)]
    Seq(old, fresh).foreach { batch =>
      val (assigned, corrections) = Dedup.splitIndexIngestWithCorrections(
        spark, batch.toDF("doc_id", "text"), "doc_id", "text", seed,
        GenIndex.active(spark, root))
      acc = acc ++ assignMap(assigned)
      corrections.select("old_label", "new_label", "new_split")
        .as[(Long, Long, String)].collect()
        .foreach { case (oldL, newL, newS) =>
          acc = acc.map { case (id, (l, s)) =>
            if (l == oldL) id -> ((newL, newS)) else id -> ((l, s)) }
        }
    }

    // retention compaction through a generation swap
    var tombstones = Set.empty[Long]
    GenIndex.compact(spark, root) { (src, dest) =>
      tombstones = Dedup.compactSplitIndexDropBefore(spark, src, dest, epochMin)
        .as[Long].collect().toSet
    }
    assert(tombstones.nonEmpty)
    assert(tombstones.forall(_ < epochMin))

    // the index now answers EXACTLY the from-scratch split of the
    // retained corpus — and nothing at all for retired docs
    val freshDf = fresh.toDF("doc_id", "text")
    val allDf = (old ++ fresh).toDF("doc_id", "text")
    val active = GenIndex.active(spark, root)
    val got = assignMap(Dedup.splitIndexAssignment(
      spark, allDf, "doc_id", "text", seed, active))
    val want = assignMap(Dedup.leakageSafeSplit(freshDf, "doc_id", "text", seed))
    assert(got == want, "retained half must equal from-scratch over retained docs")
    assert(!got.keySet.exists(_ < epochMin), "retired docs must resolve nothing")

    // consumer fold: delete tombstoned clusters, keep the rest — equals
    // the final assignment over the retained corpus
    val folded = acc.filterNot { case (_, (l, _)) => tombstones.contains(l) }
    assert(folded == want)

    // retired content returning later re-founds a NEW cluster under a
    // fresh label (the index has genuinely forgotten it)
    val returnId = epochMin + 100000L
    val back = Seq((returnId, old.head._2)).toDF("doc_id", "text")
    val re = assignMap(Dedup.splitIndexIngest(
      spark, back, "doc_id", "text", seed, GenIndex.active(spark, root)))
    assert(re(returnId)._1 == returnId, "returning retired content must re-found, not resurrect")
  }

  test("a cluster straddling the horizon is kept whole (conservative retention)") {
    val root = freshIdx()
    val seed = "strad"
    val base = words(30)
    // cluster A wholly old; cluster B straddles (old rep, fresh paraphrase)
    val oldBatch = Seq((1L, base), (2L, base), (10L, words(30)))
    val epochMin = 11L
    val freshBatch = Seq((20L, oldBatch.last._2 + " r999"), (30L, words(30)))
    Dedup.splitIndexIngest(spark, oldBatch.toDF("doc_id", "text"),
      "doc_id", "text", seed, root).count()
    Dedup.splitIndexIngest(spark, freshBatch.toDF("doc_id", "text"),
      "doc_id", "text", seed, GenIndex.active(spark, root)).count()

    var tombstones = Set.empty[Long]
    GenIndex.compact(spark, root) { (src, dest) =>
      tombstones = Dedup.compactSplitIndexDropBefore(spark, src, dest, epochMin)
        .as[Long].collect().toSet
    }
    // only the wholly-old cluster (label 1) retires; the straddler (label
    // 10, fresh member 20) survives with its ORIGINAL label and its old
    // member still resolves
    assert(tombstones == Set(1L))
    val all = (oldBatch ++ freshBatch).toDF("doc_id", "text")
    val got = assignMap(Dedup.splitIndexAssignment(
      spark, all, "doc_id", "text", seed, GenIndex.active(spark, root)))
    assert(got.keySet == Set(10L, 20L, 30L))
    assert(got(10L)._1 == 10L && got(20L)._1 == 10L)
  }
}
