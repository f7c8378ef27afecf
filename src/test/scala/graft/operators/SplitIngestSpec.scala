package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Incremental leakage-safe split (Dedup.splitIndexIngest /
  * splitIndexAssignment — the streaming face of leakageSafeSplit): the
  * gate is EQUALITY of the accumulated index's final assignment with the
  * from-scratch operator over everything ingested, including the hard
  * cluster-MERGE case (a batch doc bridging two clusters previously
  * assigned different splits — the min label's split wins, which IS the
  * from-scratch answer) and replayed batches (crash-recovery shape). */
class SplitIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1201)
  private def words(n: Int): String =
    (0 until n).map(_ => s"w${rng.nextInt(400)}").mkString(" ")

  private def freshIdx(): String =
    java.nio.file.Files.createTempDirectory("graft-splitidx-spec").toString

  /** Corpus with exact copies, paraphrase pairs, and cross-batch chains,
    * ids ascending so slicing by id respects the ingestion contract. */
  private def corpus(): Seq[(Long, String)] = {
    var id = 0L
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until 30).foreach { _ =>
      val base = words(30)
      id += 1; out += ((id, base))
      rng.nextInt(4) match {
        case 0 => id += 1; out += ((id, base)) // exact copy
        case 1 => id += 1; out += ((id, base + " w999")) // paraphrase
        case 2 => // chain: paraphrase of the paraphrase lands later
          id += 1; out += ((id, base + " w999"))
          id += 1; out += ((id, base + " w999 w998"))
        case _ => ()
      }
    }
    out.toSeq
  }

  private def assignMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    df.select("doc_id", "cluster_label", "split").as[(Long, Long, String)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap

  test("batch-fed ingest equals the from-scratch split, chains across batches included") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val cut1 = all(all.length / 3)._1
    val cut2 = all(2 * all.length / 3)._1
    Seq(
      docs.filter(col("doc_id") <= cut1),
      docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
      docs.filter(col("doc_id") > cut2)
    ).foreach { b =>
      Dedup.splitIndexIngest(spark, b, "doc_id", "text", "s1", idx).count()
    }
    val got = assignMap(Dedup.splitIndexAssignment(spark, docs, "doc_id", "text", "s1", idx))
    val want = assignMap(Dedup.leakageSafeSplit(docs, "doc_id", "text", "s1"))
    assert(got == want)
    assert(got.size == all.length)
  }

  /** Two clusters founded in separate batches with DIFFERENT splits, then
    * a bridge doc that near-dups both: the merge must re-key everything
    * to the min label (its split wins), equal to from-scratch. */
  test("merge case: a bridge batch joins two clusters with different splits") {
    // 30 shared shingles; 5 extra per seed: J(a,b) = 30/40 = 0.75 < 0.8,
    // J(bridge, a) = J(bridge, b) = 30/35 ≈ 0.857 >= 0.8. LSH banding is
    // probabilistic per token set (deterministic once chosen), so scan
    // variants until BOTH bridge pairs are banded candidates AND the two
    // seeds are not — then the fixture provably plants exactly the
    // two-cluster-plus-bridge shape.
    val (a, b, bridge) = (0 until 32).view.map { v =>
      val common = (0 until 32).map(i => s"c${v}_$i").mkString(" ")
      (common + s" x${v}a x${v}b x${v}c x${v}d x${v}e",
        common + s" y${v}a y${v}b y${v}c y${v}d y${v}e",
        common)
    }.find { case (a, b, bridge) =>
      val docs = Seq((1L, a), (2L, b), (3L, bridge)).toDF("doc_id", "text")
      val ver = Dedup.jaccardForPairs(docs, "doc_id", "text", 3,
          Dedup.minhashCandidates(docs, "doc_id", "text"))
        .filter(col("jaccard") >= 0.8)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      ver == Set((1L, 3L), (2L, 3L))
    }.get
    val docs = Seq((1L, a), (2L, b), (3L, bridge)).toDF("doc_id", "text")
    // find a seed where the two pre-merge clusters draw DIFFERENT splits
    // (labels 1 and 2 hash independently per seed, so one exists fast)
    val seed = (0 until 64).map(i => s"m$i").find { sd =>
      val pre = assignMap(Dedup.leakageSafeSplit(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", sd))
      pre(1L)._2 != pre(2L)._2
    }.get
    val idx = freshIdx()
    val atIngest1 = assignMap(Dedup.splitIndexIngest(spark,
      Seq((1L, a)).toDF("doc_id", "text"), "doc_id", "text", seed, idx))
    val atIngest2 = assignMap(Dedup.splitIndexIngest(spark,
      Seq((2L, b)).toDF("doc_id", "text"), "doc_id", "text", seed, idx))
    assert(atIngest1(1L)._2 != atIngest2(2L)._2) // different splits pre-merge
    val atIngest3 = assignMap(Dedup.splitIndexIngest(spark,
      Seq((3L, bridge)).toDF("doc_id", "text"), "doc_id", "text", seed, idx))
    // the bridge lands in the MERGED cluster: min label 1, cluster A's split
    assert(atIngest3(3L) == ((1L, atIngest1(1L)._2)))
    // final state: doc 2's split FLIPPED to the min label's (the
    // resolution rule), and the whole thing equals from-scratch
    val fin = assignMap(Dedup.splitIndexAssignment(
      spark, docs, "doc_id", "text", seed, idx))
    assert(fin(2L) == ((1L, atIngest1(1L)._2)))
    assert(fin == assignMap(Dedup.leakageSafeSplit(docs, "doc_id", "text", seed)))
  }

  test("replayed batches (crash recovery) leave the final assignment unchanged") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val cut = all(all.length / 2)._1
    val b1 = docs.filter(col("doc_id") <= cut)
    val b2 = docs.filter(col("doc_id") > cut)
    Dedup.splitIndexIngest(spark, b1, "doc_id", "text", "s1", idx).count()
    // replay batch 1 (restart after a crash past the index writes)
    Dedup.splitIndexIngest(spark, b1, "doc_id", "text", "s1", idx).count()
    Dedup.splitIndexIngest(spark, b2, "doc_id", "text", "s1", idx).count()
    // and replay batch 2 as well
    Dedup.splitIndexIngest(spark, b2, "doc_id", "text", "s1", idx).count()
    val got = assignMap(Dedup.splitIndexAssignment(spark, docs, "doc_id", "text", "s1", idx))
    assert(got == assignMap(Dedup.leakageSafeSplit(docs, "doc_id", "text", "s1")))
  }

  test("compaction preserves the assignment and collapses label history") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val cut = all(all.length / 2)._1
    Dedup.splitIndexIngest(spark, docs.filter(col("doc_id") <= cut),
      "doc_id", "text", "s1", idx).count()
    Dedup.splitIndexIngest(spark, docs.filter(col("doc_id") > cut),
      "doc_id", "text", "s1", idx).count()
    val dest = freshIdx()
    Dedup.compactSplitIndex(spark, idx, dest)
    val got = assignMap(Dedup.splitIndexAssignment(spark, docs, "doc_id", "text", "s1", dest))
    assert(got == assignMap(Dedup.leakageSafeSplit(docs, "doc_id", "text", "s1")))
    val hist = spark.read.parquet(s"$dest/clusters")
      .groupBy("keeper").agg(count(lit(1)).as("n"))
    assert(hist.filter(col("n") > 1).count() == 0)
  }

  /** The round-13 consumption contract: per-batch at-ingest outputs plus
    * the corrections stream converge to the final index assignment — an
    * at-ingest consumer never has to re-read the corpus after a
    * cross-batch merge. Uses the merge fixture (two clusters with
    * different splits bridged in batch 3), folding each batch's
    * corrections over the accumulated rows in batch order. */
  test("at-ingest outputs + corrections equal the final assignment through a merge") {
    val (a, b, bridge) = (0 until 32).view.map { v =>
      val common = (0 until 32).map(i => s"c${v}_$i").mkString(" ")
      (common + s" x${v}a x${v}b x${v}c x${v}d x${v}e",
        common + s" y${v}a y${v}b y${v}c y${v}d y${v}e",
        common)
    }.find { case (a, b, bridge) =>
      val docs = Seq((1L, a), (2L, b), (3L, bridge)).toDF("doc_id", "text")
      val ver = Dedup.jaccardForPairs(docs, "doc_id", "text", 3,
          Dedup.minhashCandidates(docs, "doc_id", "text"))
        .filter(col("jaccard") >= 0.8)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      ver == Set((1L, 3L), (2L, 3L))
    }.get
    val docs = Seq((1L, a), (2L, b), (3L, bridge)).toDF("doc_id", "text")
    val seed = (0 until 64).map(i => s"m$i").find { sd =>
      val pre = assignMap(Dedup.leakageSafeSplit(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", sd))
      pre(1L)._2 != pre(2L)._2
    }.get
    val idx = freshIdx()
    // accumulate (doc_id -> (label, split)) the way an at-ingest consumer
    // would: batch outputs land, then each batch's corrections re-key
    var acc = Map.empty[Long, (Long, String)]
    var sawCorrection = false
    Seq(Seq((1L, a)), Seq((2L, b)), Seq((3L, bridge))).foreach { batch =>
      val (assigned, corrections) = Dedup.splitIndexIngestWithCorrections(
        spark, batch.toDF("doc_id", "text"), "doc_id", "text", seed, idx)
      acc = acc ++ assignMap(assigned)
      val corr = corrections.select("old_label", "new_label", "new_split")
        .as[(Long, Long, String)].collect()
      if (corr.nonEmpty) sawCorrection = true
      corr.foreach { case (oldL, newL, newS) =>
        acc = acc.map { case (id, (l, s)) =>
          if (l == oldL) id -> ((newL, newS)) else id -> ((l, s))
        }
      }
    }
    assert(sawCorrection, "fixture must exercise a correction-emitting merge")
    val fin = assignMap(Dedup.splitIndexAssignment(
      spark, docs, "doc_id", "text", seed, idx))
    assert(acc == fin)
  }

  test("monotone-ingestion guard rejects out-of-order batches, admits exact replays") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val cut = all(all.length / 2)._1
    val b1 = docs.filter(col("doc_id") <= cut)
    val b2 = docs.filter(col("doc_id") > cut)
    Dedup.splitIndexIngest(spark, b1, "doc_id", "text", "s1", idx).count()
    Dedup.splitIndexIngest(spark, b2, "doc_id", "text", "s1", idx).count()
    // exact replay of the LAST batch: admitted (crash-recovery shape)
    Dedup.splitIndexIngest(spark, b2, "doc_id", "text", "s1", idx).count()
    // an out-of-order batch (re-presenting batch 1 after batch 2) fails
    // loudly instead of silently corrupting corpus-order-first semantics
    val ex = intercept[IllegalArgumentException] {
      Dedup.splitIndexIngest(spark, b1, "doc_id", "text", "s1", idx).count()
    }
    assert(ex.getMessage.contains("monotone-id ingestion contract"))
    // chunk index: same guard
    val cidx = freshIdx()
    Dedup.incrementalCdcDedup(spark, b1, "doc_id", "text", cidx, 8, 16).count()
    Dedup.incrementalCdcDedup(spark, b2, "doc_id", "text", cidx, 8, 16).count()
    Dedup.incrementalCdcDedup(spark, b2, "doc_id", "text", cidx, 8, 16).count()
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.incrementalCdcDedup(spark, b1, "doc_id", "text", cidx, 8, 16).count()
    }
    assert(ex2.getMessage.contains("monotone-id ingestion contract"))
  }

  test("compaction refuses destPath == path") {
    val idx = freshIdx()
    Dedup.splitIndexIngest(spark, corpus().toDF("doc_id", "text"),
      "doc_id", "text", "s1", idx).count()
    val ex = intercept[IllegalArgumentException] {
      Dedup.compactSplitIndex(spark, idx, idx)
    }
    assert(ex.getMessage.contains("destPath"))
    // trailing-slash / scheme variants resolve to the same location too
    intercept[IllegalArgumentException] {
      Dedup.compactSplitIndex(spark, idx, s"$idx/")
    }
  }

  test("at-ingest outputs cover every batch doc exactly once") {
    val all = corpus()
    val docs = all.toDF("doc_id", "text")
    val idx = freshIdx()
    val cut = all(all.length / 2)._1
    val o1 = Dedup.splitIndexIngest(spark, docs.filter(col("doc_id") <= cut),
      "doc_id", "text", "s1", idx)
    val o2 = Dedup.splitIndexIngest(spark, docs.filter(col("doc_id") > cut),
      "doc_id", "text", "s1", idx)
    assert(o1.count() + o2.count() == all.length)
    assert(o1.select("doc_id").distinct().count() == o1.count())
    assert(o2.select("doc_id").distinct().count() == o2.count())
  }
}
