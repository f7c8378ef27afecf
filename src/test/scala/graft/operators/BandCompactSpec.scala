package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Churn-proportional (LSM delta) compaction for the LSH index families
  * (round 16 — Dedup.compactDedupIndexDelta / compactSplitIndexDelta):
  * the first (manifest-less) swap escalates to the full rewrite, a
  * zero-churn swap moves every table by hard link with identical file
  * names, an appended-to swap links the base tier and folds ONLY the
  * delta files — and in every state the compacted index classifies
  * batches IDENTICALLY to the whole-rewrite twin. */
class BandCompactSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1604)
  private def blob(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  private def corpus(ids: Range, pool: IndexedSeq[String]): Seq[(Long, String)] =
    ids.map { id =>
      if (id % 3 == 0) (id.toLong, pool(id % pool.size))          // exact dup
      else if (id % 3 == 1)                                        // near dup
        (id.toLong, pool(id % pool.size).dropRight(6) + blob(6))
      else (id.toLong, blob(120))                                  // fresh
    }

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def files(path: String, table: String): Set[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/$table")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).collect {
      case st if st.isFile && st.getPath.getName.startsWith("part-") =>
        st.getPath.getName
    }.toSet
  }

  private def classify(batch: Seq[(Long, String)], path: String): Set[(Long, String, Long, Long)] =
    Dedup.incrementalDedup(spark, batch.toDF("doc_id", "text"),
        "doc_id", "text", path)
      .select("doc_id", "status", "match_id", "n_near")
      .as[(Long, String, Long, Long)].collect().toSet

  test("full -> link -> delta lifecycle; classification equals the whole-rewrite twin in every state") {
    val pool = (0 until 6).map(_ => blob(120))
    val idx = tmp("graft-bandc")
    Dedup.buildDedupIndex(corpus(1 to 60, pool).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val probe = corpus(200 to 215, pool)

    // swap 1: no manifest -> every table escalates to the full rewrite
    val d1 = tmp("graft-bandc-d1")
    val a1 = Dedup.compactDedupIndexDelta(spark, idx, d1)
    assert(a1 == Map("hashes" -> "full", "bands" -> "full", "shingles" -> "full"), a1.toString)
    assert(classify(probe, d1) == classify(probe, idx))

    // swap 2: zero churn -> pure links, identical file names
    val d2 = tmp("graft-bandc-d2")
    val a2 = Dedup.compactDedupIndexDelta(spark, d1, d2)
    assert(a2 == Map("hashes" -> "link", "bands" -> "link", "shingles" -> "link"), a2.toString)
    Seq("hashes", "bands", "shingles").foreach(t =>
      assert(files(d2, t) == files(d1, t), s"$t files changed across a link swap"))
    assert(classify(probe, d2) == classify(probe, d1))

    // append a batch (including a REPLAY — crash debris), then swap 3:
    // base tier links, only the delta files fold
    val batch = corpus(100 to 112, pool).toDF("doc_id", "text")
    val cls = Dedup.incrementalDedup(spark, batch, "doc_id", "text", d2)
      .localCheckpoint(true)
    Dedup.appendToDedupIndex(batch, cls, "doc_id", "text", d2)
    Dedup.appendToDedupIndex(batch, cls, "doc_id", "text", d2) // replay debris
    val baseBands = files(d1, "bands")
    val d3 = tmp("graft-bandc-d3")
    val a3 = Dedup.compactDedupIndexDelta(spark, d2, d3)
    assert(a3 == Map("hashes" -> "delta", "bands" -> "delta", "shingles" -> "delta"), a3.toString)
    assert(baseBands.subsetOf(files(d3, "bands")),
      "base band tier must move by link (names preserved)")
    // the whole-rewrite twin over the same appended index
    val w = tmp("graft-bandc-w")
    Dedup.compactDedupIndex(spark, d2, w)
    assert(classify(probe, d3) == classify(probe, w))
    // delta fold removed the replay debris: distinct band rows only
    val b3 = spark.read.parquet(s"$d3/bands")
    assert(b3.count() == b3.distinct().count(), "delta fold left duplicate rows")

    // swap 4 on the delta-compacted gen: zero churn again -> links
    val d4 = tmp("graft-bandc-d4")
    assert(Dedup.compactDedupIndexDelta(spark, d3, d4).values.forall(_ == "link"))
    assert(classify(probe, d4) == classify(probe, w))
  }

  test("escalation: the delta-tier budget spends, then the full rewrite re-bases and resets it") {
    val pool = (0 until 4).map(_ => blob(110))
    val idx = tmp("graft-bandesc")
    Dedup.buildDedupIndex(corpus(1 to 30, pool).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    def appendBatch(path: String, r: Int): Unit = {
      val b = corpus((100 + 20 * r) to (110 + 20 * r), pool).toDF("doc_id", "text")
      val c = Dedup.incrementalDedup(spark, b, "doc_id", "text", path)
        .localCheckpoint(true)
      Dedup.appendToDedupIndex(b, c, "doc_id", "text", path)
    }
    // swap 1: manifest founding -> full (tiers reset to 0)
    val d1 = tmp("graft-bandesc-d1")
    assert(Dedup.compactDedupIndexDelta(spark, idx, d1, fullRewriteOver = 1)
      .values.forall(_ == "full"))
    // swap 2 after an append: tier budget (1) not yet spent -> delta
    appendBatch(d1, 0)
    val d2 = tmp("graft-bandesc-d2")
    assert(Dedup.compactDedupIndexDelta(spark, d1, d2, fullRewriteOver = 1)
      .values.forall(_ == "delta"))
    // swap 3 after another append: budget spent -> full, counter resets
    appendBatch(d2, 1)
    val d3 = tmp("graft-bandesc-d3")
    assert(Dedup.compactDedupIndexDelta(spark, d2, d3, fullRewriteOver = 1)
      .values.forall(_ == "full"))
    // and the re-based generation classifies like the whole-rewrite twin
    val probe = corpus(300 to 310, pool)
    val w = tmp("graft-bandesc-w")
    Dedup.compactDedupIndex(spark, d2, w)
    assert(classify(probe, d3) == classify(probe, w))
    // swap 4, zero churn: links again after the reset
    val d4 = tmp("graft-bandesc-d4")
    assert(Dedup.compactDedupIndexDelta(spark, d3, d4, fullRewriteOver = 1)
      .values.forall(_ == "link"))
  }

  test("split family: delta swap preserves the final assignment and the merge corrections") {
    val pool = (0 until 5).map(_ => blob(120))
    val all = corpus(1 to 48, pool)
    val idx = tmp("graft-splitd")
    // ingest in 3 batches with a delta swap after the second
    all.grouped(16).zipWithIndex.foreach { case (b, i) =>
      val step = Dedup.splitIndexIngestStaged(spark,
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text", "s16", idx)
      step.commit()
      if (i == 1) {
        val d = tmp(s"graft-splitd-g$i") + "/gen"
        val acts = Dedup.compactSplitIndexDelta(spark, idx, d)
        // first swap: full everywhere (no manifest yet)
        assert(acts.values.forall(_ == "full"), acts.toString)
        // move the live index forward: replace idx with the new gen
        val conf = spark.sparkContext.hadoopConfiguration
        val ip = new org.apache.hadoop.fs.Path(idx)
        val fs = ip.getFileSystem(conf)
        fs.delete(ip, true)
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(d), fs, ip, false, true, conf)
        ()
      }
    }
    // second swap AFTER more appends: delta actions, assignment equal
    val d2 = tmp("graft-splitd-d2")
    val acts2 = Dedup.compactSplitIndexDelta(spark, idx, d2)
    assert(acts2.values.forall(a => a == "delta" || a == "link"), acts2.toString)
    val w = tmp("graft-splitd-w")
    Dedup.compactSplitIndex(spark, idx, w)
    val docsDf = all.toDF("doc_id", "text")
    def assign(p: String) = Dedup.splitIndexAssignment(
        spark, docsDf, "doc_id", "text", "s16", p)
      .as[(Long, Long, String)].collect().toSet
    assert(assign(d2) == assign(w))
  }

  /** Probing mutates a chunk index (incrementalCdcDedup classifies AND
    * appends), so equality probes run against a throwaway copy. */
  private def copyDir(src: String): String = {
    val dst = tmp("graft-chunkc-copy")
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) { java.nio.file.Files.createDirectories(t); () }
      else { java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
    }
    dst
  }

  test("chunk family: full -> link -> delta lifecycle; reports equal the whole-rewrite twin") {
    val pool = (0 until 5).map(_ => blob(400))
    // materialized ONCE — blob() draws from the stateful rng, so a
    // re-invocation would generate different probe content
    def docs(ids: Range) = ids.map { id =>
      if (id % 2 == 0) (id.toLong, pool(id % pool.size))                     // exact dup
      else (id.toLong, pool(id % pool.size).take(200) + blob(200))           // shared prefix
    }
    val seed = docs(1 to 40)
    val append = docs(100 to 120)
    val probe = docs(500 to 520)
    def probeReport(path: String): Set[(Long, Long, Long, Long)] =
      Dedup.incrementalCdcDedup(spark, probe.toDF("doc_id", "text"),
          "doc_id", "text", copyDir(path), 16, 32)
        .select("doc_id", "n_chunks", "n_dup_chunks", "dup_chars")
        .as[(Long, Long, Long, Long)].collect().toSet
    val idx = tmp("graft-chunkc")
    Dedup.incrementalCdcDedup(spark, seed.toDF("doc_id", "text"),
      "doc_id", "text", idx, 16, 32).collect()

    // swap 1: no manifest -> escalates to the full rewrite
    val d1 = tmp("graft-chunkc-d1")
    assert(Dedup.compactChunkIndexDelta(spark, idx, d1) == Map("chunks" -> "full"))
    assert(probeReport(d1) == probeReport(idx))

    // swap 2: zero churn -> pure link, file names preserved
    val d2 = tmp("graft-chunkc-d2")
    assert(Dedup.compactChunkIndexDelta(spark, d1, d2) == Map("chunks" -> "link"))
    assert(files(d2, "chunks") == files(d1, "chunks"),
      "chunk files changed across a link swap")

    // append a batch TWICE (crash-replay debris), swap 3 -> delta:
    // base tier moves by link, only the delta folds
    val b = append.toDF("doc_id", "text")
    Dedup.incrementalCdcDedup(spark, b, "doc_id", "text", d2, 16, 32).collect()
    Dedup.incrementalCdcDedup(spark, b, "doc_id", "text", d2, 16, 32).collect()
    val base = files(d1, "chunks")
    val d3 = tmp("graft-chunkc-d3")
    assert(Dedup.compactChunkIndexDelta(spark, d2, d3) == Map("chunks" -> "delta"))
    assert(base.subsetOf(files(d3, "chunks")),
      "base chunk tier must move by link (names preserved)")
    val w = tmp("graft-chunkc-w")
    Dedup.compactChunkIndex(spark, d2, w)
    assert(probeReport(d3) == probeReport(w))
    // the within-delta min-owner fold collapsed the replay debris:
    // delta-tier rows are unique per hash
    val deltaFiles = (files(d3, "chunks") -- base).toSeq.map(n => s"$d3/chunks/$n")
    assert(deltaFiles.nonEmpty)
    val delta = spark.read.parquet(deltaFiles: _*)
    assert(delta.groupBy("ph").count().filter(col("count") > 1).count() == 0,
      "delta fold left duplicate owner rows")

    // swap 4: zero churn again -> link
    val d4 = tmp("graft-chunkc-d4")
    assert(Dedup.compactChunkIndexDelta(spark, d3, d4) == Map("chunks" -> "link"))
    assert(probeReport(d4) == probeReport(w))
  }
}
