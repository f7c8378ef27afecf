package graft.streaming

import java.nio.file.Files

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Substring dedup AT INGEST (SedStreaming.streamingSubstringDedup): the
  * load-bearing gate is span-EXACT equality between the accumulated
  * streaming output and the from-scratch anchored operator over the whole
  * corpus — per-batch index probing must lose nothing, including repeats
  * that straddle micro-batch boundaries. The restart test drives a real
  * stop → new data → restart on ONE checkpoint/index/output triple: the
  * file-source log must not re-trim processed batches (per-batch
  * overwrite makes a replay idempotent) and the index must keep pairing
  * new arrivals against everything admitted before the stop. */
class StreamingSubstrSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(1106)
  private def randText(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  private def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
    df.select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => (x._2, x._3)).sorted.toSeq
      }

  /** A 12-doc corpus where repeats cross every chunk boundary: docs pull
    * 60–100-char windows from one base text plus unique filler, so later
    * chunks repeat text first seen in earlier chunks AND in-chunk. */
  private def corpus(): Seq[(Long, String)] = {
    val base = randText(400)
    (1L to 12L).map { id =>
      val n = rng.nextInt(3)
      val chunks = (0 until n).map { _ =>
        val s = rng.nextInt(300); base.substring(s, s + 60 + rng.nextInt(40))
      }
      (id, (chunks :+ randText(40 + rng.nextInt(80))).mkString(randText(1 + rng.nextInt(4))))
    }
  }

  private val schema = StructType.fromDDL("doc_id BIGINT, text STRING")

  /** Append `rows` as one source file with an explicit ascending mtime so
    * the file source replays feeds in arrival order (same-ms appends
    * would otherwise tie on timestamp). */
  private def feed(s: org.apache.spark.sql.SparkSession, dir: String,
                   rows: Seq[(Long, String)], seq: Int): Unit = {
    rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    // pin the fresh file (real now-mtime, far above the synthetic base)
    // to base + seq minutes; earlier feeds keep their pinned slots
    val base = 1700000000000L
    fs.listStatus(p).map(_.getPath).filter(_.getName.startsWith("part-"))
      .filter(f => fs.getFileStatus(f).getModificationTime > base + 86400000L)
      .foreach(f => fs.setTimes(f, base + seq * 60000L, -1))
  }

  private def session(): org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    graft.sed.SedQueries.ensureConfs(s)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  test("file-fed ingest spans equal the from-scratch anchored operator") {
    val all = corpus()
    val s = session()
    val dir = Files.createTempDirectory("graft_sstr_in").toString
    all.grouped(4).zipWithIndex.foreach { case (chunk, i) => feed(s, dir, chunk, i) }
    val out = Files.createTempDirectory("graft_sstr_out").toString
    val q = SedStreaming.streamingSubstringDedup(
      s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      "doc_id", "text",
      Files.createTempDirectory("graft_sstr_idx").toString, out,
      Files.createTempDirectory("graft_sstr_ck").toString, 40)
    try q.processAllAvailable() finally q.stop()
    val got = spansOf(spark.read.parquet(out))
    val want = spansOf(Dedup.substringDedupAnchored(
      all.toDF("doc_id", "text"), "doc_id", "text", 40))
    assert(got == want)
    assert(want.nonEmpty) // the fixture actually plants cross-batch repeats
  }

  test("stop/restart on one checkpoint: processed batches stay trimmed once, the index keeps pairing") {
    val all = corpus()
    val (early, late) = all.partition(_._1 <= 8L)
    val s = session()
    val dir = Files.createTempDirectory("graft_sstr_r_in").toString
    val out = Files.createTempDirectory("graft_sstr_r_out").toString
    val idx = Files.createTempDirectory("graft_sstr_r_idx").toString
    val ck = Files.createTempDirectory("graft_sstr_r_ck").toString
    def start() = SedStreaming.streamingSubstringDedup(
      s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      "doc_id", "text", idx, out, ck, 40)

    // epoch 1: two chunks ingest, job stops (deploy/preemption)
    early.grouped(4).zipWithIndex.foreach { case (c, i) => feed(s, dir, c, i) }
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterEpoch1 = spansOf(spark.read.parquet(out))

    // stopped: a chunk repeating epoch-1 text arrives
    feed(s, dir, late, 2)

    // epoch 2, same checkpoint: must not re-ingest epoch-1 files (their
    // spans unchanged) and must pair the new chunk against the index
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spansOf(spark.read.parquet(out))
    val want = spansOf(Dedup.substringDedupAnchored(
      all.toDF("doc_id", "text"), "doc_id", "text", 40))
    assert(got == want)
    assert(got.filter(_._1 <= 8L) == afterEpoch1,
      "epoch-1 spans must be written exactly once")
    assert(late.map(_._1).toSet.intersect(got.keySet).nonEmpty,
      "the post-restart chunk must trim against pre-restart text")
  }

  test("mid-feed retention: anchors+texts retire, tombstones go durable, returning retired content re-founds") {
    // era-disjoint alphabets (a-m vs n-z) keep every 16-gram hash on one
    // side of the horizon — horizon-clean by construction — except the
    // deliberate straddler doc 15, which repeats RETIRED era-1 content
    def textA(n: Int): String = (0 until n).map(_ => ('a' + rng.nextInt(13)).toChar).mkString
    def textB(n: Int): String = (0 until n).map(_ => ('n' + rng.nextInt(13)).toChar).mkString
    val sharedA = textA(80)
    val sharedB = textB(80)
    val era1 = Seq(
      (1L, textA(50) + sharedA + textA(40)),
      (2L, textA(30) + sharedA + textA(60)), // trims vs doc 1
      (3L, textA(120)), (4L, textA(110)))
    val era2 = Seq(
      (11L, textB(30) + sharedB + textB(50)),
      (12L, textB(130)),
      (13L, sharedB + textB(90)),            // trims vs doc 11
      (15L, sharedA + textB(50)),            // RETIRED content: must re-found
      (16L, textB(100)))
    val s = session()
    val dir = Files.createTempDirectory("graft_sstr_ret_in").toString
    val out = Files.createTempDirectory("graft_sstr_ret_out").toString
    val idx = Files.createTempDirectory("graft_sstr_ret_idx").toString
    // 4 single-file batches: era1 as bids 0-1, era2 as bids 2-3;
    // compactEvery = 2 -> swaps after bid 1 (the dropBefore, horizon 11
    // = everything ingested so far retires) and after bid 3 (plain)
    (era1.grouped(2) ++ era2.grouped(3)).zipWithIndex
      .foreach { case (c, i) => feed(s, dir, c.toSeq, i) }
    val q = SedStreaming.streamingSubstringDedup(
      s.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      "doc_id", "text", idx, out,
      Files.createTempDirectory("graft_sstr_ret_ck").toString, 40,
      compactEvery = 2,
      retention = bid => if (bid == 1) 11L else Long.MinValue)
    try q.processAllAvailable() finally q.stop()
    val got = spansOf(spark.read.parquet(out))
    // per-era spans equal the from-scratch anchored operator per era:
    // era 1 ran before the horizon, era 2 entirely against the retained
    // (emptied) index — the straddler finds nothing to trim against
    assert(got.filter(_._1 <= 4L) == spansOf(Dedup.substringDedupAnchored(
      era1.toDF("doc_id", "text"), "doc_id", "text", 40)))
    assert(got.filter(_._1 >= 11L) == spansOf(Dedup.substringDedupAnchored(
      era2.toDF("doc_id", "text"), "doc_id", "text", 40)))
    // discriminating: WITHOUT retention the straddler would have trimmed
    assert(spansOf(Dedup.substringDedupAnchored(
      (era1 ++ era2).toDF("doc_id", "text"), "doc_id", "text", 40))
      .contains(15L))
    assert(!got.contains(15L), "retired content must re-found, not trim")
    // tombstones durable before the swap committed, all pre-horizon
    val tomb = spark.read.parquet(s"${out}_tombstones/batch=1")
    assert(tomb.count() > 0)
    assert(tomb.select(max("e_id")).as[Long].head() < 11L)
    // the active generation's text store holds exactly the era-2 ids —
    // era 1 physically left disk
    val active = graft.operators.GenIndex.active(spark, idx)
    assert(spark.read.parquet(s"$active/texts")
      .select("id").as[Long].collect().toSet == era2.map(_._1).toSet)
  }
}
