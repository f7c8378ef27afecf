package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the EXACT state semantics of dropDuplicatesWithinWatermark that
  * the q_stream_dedup oracle replays in SQL (round 13): when a
  * duplicate's state entry expires, whether a dropped duplicate extends
  * its keeper's life, and the effective watermark each batch's rows see.
  * These are the load-bearing assumptions of the recursive
  * emission-chain oracle — if a Spark upgrade changes them, THIS suite
  * names the contract that broke, not a hash mismatch in the driver. */
class StreamDedupSemanticsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Run the dedup chain over explicit micro-batches (one addData +
    * processAllAvailable per chunk, no-data batches disabled — the same
    * rig as the contract entries) and return the emitted doc ids. */
  private def run(batches: Seq[Seq[(Long, String, Long)]]): Seq[Long] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val out = SedStreaming.streamingDedup(
      ms.toDF().toDF("doc_id", "content", "ts_s")
        .withColumn("ts", expr("timestamp_seconds(ts_s)")),
      "ts", "content", "30 minutes")
    val name = s"dedup_sem_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    s.table(name).select("doc_id").as[Long].collect().toSeq.sorted
  }

  // delay = 30 min = 1800 s throughout; ts in seconds

  test("a dropped duplicate does NOT extend its keeper's state life") {
    // keeper (1, H, t=1000) => expiry 2800. A dup at t=2000 is dropped;
    // if it extended the entry (expiry 3800), the dup at t=5500 — after
    // fillers push the effective watermark past 2800 but not 3800 —
    // would be dropped too. It must be re-emitted.
    val got = run(Seq(
      Seq((1L, "H", 1000L)),
      Seq((2L, "H", 2000L)), // dropped; would-be extension point
      Seq((3L, "x1", 5000L)), // advances max event time
      Seq((4L, "x2", 5200L)), // watermark catches up past 2800
      Seq((5L, "x3", 5400L)),
      Seq((6L, "H", 5500L)))) // re-emitted iff NO extension
    assert(got.contains(1L) && !got.contains(2L))
    assert(got.contains(6L),
      "duplicate extended its keeper's state — the oracle's no-extension premise broke")
  }

  test("eviction lags one batch: a batch's rows see evictions from the PREVIOUS batch's watermark") {
    // keeper (1, H, t=1000) => expiry 2800.
    // B2 filler max=4700 -> watermark AFTER B2 commits = 2900 > 2800.
    // But eviction visible to B3's rows ran at B2's END under B2's own
    // watermark (from B1 data: 1000-1800 < 0), so H still lives in B3
    // and the dup at t=4800 is DROPPED. By B4, eviction under the 2900
    // watermark has run, so the dup at t=4900 IS emitted.
    val dropped = run(Seq(
      Seq((1L, "H", 1000L)),
      Seq((2L, "f1", 4700L)),
      Seq((3L, "H", 4800L)))) // same-batch-as-eviction: still dropped
    assert(dropped == Seq(1L, 2L),
      s"expected doc 3 dropped (eviction lags one batch), got $dropped")
    val emitted = run(Seq(
      Seq((1L, "H", 1000L)),
      Seq((2L, "f1", 4700L)),
      Seq((3L, "f2", 4750L)),
      Seq((4L, "H", 4900L)))) // one batch later: evicted, re-emitted
    assert(emitted.contains(4L),
      s"expected doc 4 re-emitted after eviction, got $emitted")
  }

  test("boundary: an entry expiring exactly AT the watermark") {
    // keeper expiry = 1000 + 1800 = 2800; filler max = 4600 makes the
    // post-filler watermark exactly 2800. Pins that dropDuplicates'
    // eviction is INCLUSIVE (expiry == watermark evicts) — the exact
    // comparison the q_stream_dedup oracle hardcodes as
    // `e.ts + 2*delay <= gm`. If a Spark upgrade flips this boundary to
    // strict, THIS assertion fails with a named premise instead of the
    // driver gate failing as an opaque hash mismatch.
    val got = run(Seq(
      Seq((1L, "H", 1000L)),
      Seq((2L, "f1", 4600L)), // wm after commit = 2800 == expiry
      Seq((3L, "f2", 4650L)), // eviction under wm 2800 runs at B3 end
      Seq((4L, "H", 4700L)))) // emitted iff expiry==wm evicts
    assert(got.contains(4L),
      s"expiry==watermark did NOT evict (strict boundary) — the " +
        s"q_stream_dedup oracle's inclusive `<=` premise is broken; got $got")
  }

  test("in-batch duplicates: the first row in feed order wins") {
    val got = run(Seq(
      Seq((10L, "H", 9000L), (11L, "H", 9001L), (12L, "H", 9002L))))
    assert(got == Seq(10L))
  }

  // ---- streamingLshCandidates keeper-state eviction (q_stream_neardup
  // oracle premises): EventTimeTimeout fires for a bucket only in a
  // batch where it receives NO data, under that batch's watermark
  // (computed from the PREVIOUS batches' data); a bucket with data in
  // every batch keeps its keeper regardless of watermark advance. ----

  /** Run the LSH chain over explicit micro-batches; returns emitted
    * (band, dup_id, keeper_id) rows. */
  private def runLsh(batches: Seq[Seq[(Long, String, Long)]]): Set[(Int, Long, Long)] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val out = SedStreaming.streamingLshCandidates(
      ms.toDF().toDF("doc_id", "text", "ts_s")
        .withColumn("ts", expr("timestamp_seconds(ts_s)")),
      "doc_id", "ts", "text", "30 minutes")
    val name = s"lsh_sem_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    s.table(name).select("band", "dup_id", "keeper_id")
      .as[(Int, Long, Long)].collect().toSet
  }

  private val TxtA = "alpha beta gamma delta epsilon"
  private val Filler = "zeta eta theta iota kappa lambda"

  test("LSH keeper evicted only in a NO-data batch whose watermark passed its timeout") {
    // keeper (1, A, 1000) => timeout 2800. B2 filler max 4700; B3 filler
    // (the no-data batch for A's buckets, wm = 2900 >= 2800 fires the
    // timeout); B4's copy of A must arrive to a FRESH bucket: no dup row.
    val evicted = runLsh(Seq(
      Seq((1L, TxtA, 1000L)),
      Seq((2L, Filler, 4700L)),
      Seq((3L, Filler + " mu", 4750L)),
      Seq((4L, TxtA, 4800L))))
    assert(!evicted.exists(t => t._2 == 4L || t._3 == 1L),
      s"keeper survived past its horizon: $evicted")
    // same shape WITHOUT the intermediate no-data batch: the keeper's
    // buckets get data again in the very next batch, so the timeout
    // never fires and the copy IS emitted as a dup of keeper 1
    val kept = runLsh(Seq(
      Seq((1L, TxtA, 1000L)),
      Seq((4L, TxtA, 4800L))))
    assert(kept.exists(t => t._2 == 4L && t._3 == 1L),
      s"keeper evicted without a no-data batch: $kept")
  }

  test("q_stream_dedup entry == oracle on a feed where the horizon ACTUALLY re-emits") {
    // the sf tables' dup spacing never exceeds the 2×delay+lag horizon,
    // so the driver gate exercises the chain's base case only; this
    // fixture spaces exact dups 8000 s apart (> 3600 s + batch lag) so
    // the recursive next-emission step genuinely fires — and the oracle
    // SQL is engine-portable (md5/NTILE/windows), so Spark itself can
    // evaluate it against the same synthetic documents table.
    val s = spark
    import s.implicits._
    val docs = (0 until 90).map { i =>
      val id = i * 100L
      val text = if (i % 30 == 0) "dup dup dup" else s"unique text $i"
      (id, text, "en", "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-horizon").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val entry = StreamingQueries.defs("q_stream_dedup").build(s, dir)
      .select("doc_id").as[Long].collect().toSet
    docs.createOrReplaceTempView("documents")
    val oracle = s.sql(graft.sed.PipelineQueries.streamDedupOracle)
      .select("doc_id").as[Long].collect().toSet
    assert(entry == oracle)
    // ids 0, 3000, 6000 share content; 3000 is within 0's horizon at its
    // batch (dropped), 6000 far past it (re-emitted)
    val dupEmissions = entry.intersect(Set(0L, 3000L, 6000L))
    assert(dupEmissions.size >= 2,
      s"horizon never re-emitted — fixture too narrow: $dupEmissions")
    assert(!entry.contains(3000L) || dupEmissions.size == 3,
      "sanity: middle dup expected inside the horizon")
  }

  test("LSH timeout boundary: watermark exactly AT the timeout does NOT fire (strict)") {
    // keeper (1, A, 1000) => timeout 2800; filler max 4600 makes the
    // next batch's watermark exactly 2800. Empirically the group-state
    // timeout fires only when the watermark strictly EXCEEDS the
    // timeout — the opposite boundary from dropDuplicates' expiry<=wm —
    // so the q_stream_neardup oracle's island-break comparison is
    // strict (>). A nudge of 1 over the boundary fires it.
    val atBoundary = runLsh(Seq(
      Seq((1L, TxtA, 1000L)),
      Seq((2L, Filler, 4600L)),
      Seq((3L, Filler + " mu", 4650L)), // no-data batch for A, wm == 2800
      Seq((4L, TxtA, 4700L))))
    assert(atBoundary.exists(t => t._2 == 4L && t._3 == 1L),
      s"wm == timeout fired the eviction — boundary no longer strict: $atBoundary")
    val pastBoundary = runLsh(Seq(
      Seq((1L, TxtA, 1000L)),
      Seq((2L, Filler, 4601L)), // wm = 2801 > 2800
      Seq((3L, Filler + " mu", 4650L)),
      Seq((4L, TxtA, 4700L))))
    assert(!pastBoundary.exists(t => t._2 == 4L && t._3 == 1L),
      s"wm just past the timeout failed to evict: $pastBoundary")
  }
}
