package graft.streaming

import graft.SparkSpecBase
import graft.operators.BinAxis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class SedStreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamingHistogram bins per event-time window incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val hist = SedStreaming.streamingHistogram(df, "ts", "10 seconds", "1 minute",
      Seq(BinAxis("value", 4, 0.0, 4.0)))
    val q = hist.writeStream.format("memory").queryName("hist_out")
      .outputMode("complete").start()
    try {
      def t(s: Int) = Timestamp.valueOf(f"2026-01-01 00:00:$s%02d")
      input.addData((t(1), 0.5), (t(2), 0.7), (t(3), 3.9), (t(30), 1.5))
      q.processAllAvailable()
      val rows = spark.table("hist_out")
        .select("value_bin", "cnt").as[(Long, Long)].collect().toMap
      assert(rows == Map(0L -> 2L, 3L -> 1L, 1L -> 1L))
      input.addData((t(40), 0.1)) // same window, bin 0 grows
      q.processAllAvailable()
      val rows2 = spark.table("hist_out")
        .select("value_bin", "cnt").as[(Long, Long)].collect().toMap
      assert(rows2(0L) == 3L)
    } finally q.stop()
  }

  test("sessionize collapses bursts separated by more than the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "uid")
    val sessions = SedStreaming.sessionize(df, "ts", "uid", "10 seconds", "30 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      def t(m: Int, s: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:$s%02d")
      // burst 1: 3 events within 30s gaps; burst 2 starts 2 min later
      input.addData((t(0, 0), 1L), (t(0, 20), 1L), (t(0, 40), 1L), (t(2, 0), 1L))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("n_events").as[Long].collect().sorted.toSeq
      assert(rows == Seq(1L, 3L))
    } finally q.stop()
  }

  test("enrichWithSensor refuses a watermark delay at or below the join tolerance") {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Timestamp, Long)]
    val sn = MemoryStream[(Timestamp, Double)]
    val e = intercept[IllegalArgumentException] {
      SedStreaming.enrichWithSensor(
        ev.toDF().toDF("ets", "event_id"), sn.toDF().toDF("sts", "temp"),
        "ets", "sts", "30 seconds", 30)
    }
    assert(e.getMessage.contains("tolerance"))
  }

  test("enrichWithSensor attaches readings within the tolerance window") {
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Timestamp, Long)]
    val sn = MemoryStream[(Timestamp, Double)]
    val joined = SedStreaming.enrichWithSensor(
      ev.toDF().toDF("ets", "event_id"), sn.toDF().toDF("sts", "temp"),
      "ets", "sts", "1 minute", 30)
    val q = joined.writeStream.format("memory").queryName("enr_out")
      .outputMode("append").start()
    try {
      def t(s: Int) = Timestamp.valueOf(f"2026-01-01 00:01:$s%02d")
      sn.addData((t(0), 20.0), (t(40), 25.0))
      ev.addData((t(10), 100L), (t(45), 101L))
      q.processAllAvailable()
      val rows = spark.table("enr_out")
        .select("event_id", "temp").as[(Long, Double)].collect().toSet
      // event@10 sees sensor@0 (10s before); event@45 sees sensor@40 (5s before),
      // but NOT sensor@0 (45s > 30s tolerance)
      assert(rows == Set((100L, 20.0), (101L, 25.0)))
    } finally q.stop()
  }

  test("streamingForwardFill carries last non-null across micro-batches per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Option[Double])]
    val df = input.toDF().toDF("k", "o", "v")
    val filled = SedStreaming.streamingForwardFill(df, "k", "o", "v")
    val q = filled.writeStream.format("memory").queryName("ff_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, Some(10.0)), (1L, 2L, None), (2L, 1L, None))
      q.processAllAvailable()
      input.addData((1L, 3L, None), (2L, 2L, Some(5.0)), (2L, 3L, None))
      q.processAllAvailable()
      val rows = spark.table("ff_out").as[(String, Long, Option[Double])].collect()
        .map(r => (r._1.toLong, r._2) -> r._3).toMap
      assert(rows((1L, 2L)).contains(10.0))
      assert(rows((1L, 3L)).contains(10.0)) // carried across batches
      assert(rows((2L, 1L)).isEmpty)        // nothing seen yet for key 2
      assert(rows((2L, 3L)).contains(5.0))
    } finally q.stop()
  }
  test("streamingAsofEnrich: at-or-before semantics, equal-ts readings fold first, state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Option[Double])]
    val df = input.toDF().toDF("k", "o", "i", "r")
    val out = SedStreaming.streamingAsofEnrich(df, "k", "o", "i", "r")
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: event before any reading -> null; a reading at t=10
      // serves the SAME-ts event (inclusive >=) and later ones; two
      // readings at one ts -> the max-id one wins
      input.addData(
        (0L, 5L, 1L, None),
        (0L, 10L, 100L, Some(1.0)), (0L, 10L, 200L, Some(2.0)),
        (0L, 10L, 7L, None), (0L, 12L, 8L, None))
      q.processAllAvailable()
      // batch 2: state carries the (10, 200, 2.0) reading across batches
      input.addData((0L, 20L, 9L, None), (0L, 25L, 300L, Some(3.0)), (0L, 30L, 11L, None))
      q.processAllAvailable()
      val rows = spark.table("asof_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._2 -> ((r._4, r._6))).toMap
      assert(rows(1L) == ((None, None)))
      assert(rows(7L) == ((Some(200L), Some(2.0)))) // same-ts, max-id reading
      assert(rows(8L) == ((Some(200L), Some(2.0))))
      assert(rows(9L) == ((Some(200L), Some(2.0)))) // across batches
      assert(rows(11L) == ((Some(300L), Some(3.0))))
    } finally q.stop()
  }

  test("streamingAsofEnrich keeps per-key state independent across keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Option[Double])]
    val df = input.toDF().toDF("k", "o", "i", "r")
    val out = SedStreaming.streamingAsofEnrich(df, "k", "o", "i", "r")
    val q = out.writeStream.format("memory").queryName("asof_keys_out")
      .outputMode("append").start()
    try {
      // key 1 has a reading, key 2 does not — key 2's events must stay
      // unenriched (no cross-key bleed), key 1 carries across batches
      input.addData((1L, 10L, 100L, Some(7.0)), (2L, 11L, 5L, None))
      q.processAllAvailable()
      input.addData((1L, 20L, 6L, None), (2L, 21L, 7L, None))
      q.processAllAvailable()
      val rows = spark.table("asof_keys_out")
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Double])]
        .collect().map(r => r._2 -> ((r._1, r._4))).toMap
      assert(rows(5L) == ((2L, None)))
      assert(rows(7L) == ((2L, None)))
      assert(rows(6L) == ((1L, Some(100L))))
    } finally q.stop()
  }

  test("streamingFunnel advances exactly once per reached stage, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("user_id", "ts_us", "event_type")
    val fn = SedStreaming.streamingFunnel(df, Seq("a", "b", "c"))
    val q = fn.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1: u1 reaches a; u2 sees b first (no advance)
      input.addData((1L, 10L, "a"), (2L, 10L, "b"))
      q.processAllAvailable()
      // batch 2: u1 advances b (ts > 10), then an equal-ts c must NOT
      // advance; u2 starts a
      input.addData((1L, 20L, "b"), (1L, 20L, "c"), (2L, 20L, "a"))
      q.processAllAvailable()
      // batch 3: u1 finishes c; a repeated b must not re-emit
      input.addData((1L, 30L, "c"), (1L, 31L, "b"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").as[(Long, Int, Long)].collect().toSet
      assert(rows == Set((1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L), (2L, 0, 20L)))
    } finally q.stop()
  }

  test("streamingTransitions carries last type across batches, ties by event_id") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val df = input.toDF().toDF("user_id", "ts_us", "event_id", "event_type")
    val tr = SedStreaming.streamingTransitions(df)
    val q = tr.writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 10L, 1L, "a"))
      q.processAllAvailable()
      // equal ts resolved by event_id: b (id 2) before c (id 3)
      input.addData((1L, 20L, 3L, "c"), (1L, 20L, 2L, "b"))
      q.processAllAvailable()
      val rows = spark.table("trans_out")
        .as[(Long, String, String)].collect().toSeq.sorted
      assert(rows == Seq((1L, "a", "b"), (1L, "b", "c")))
    } finally q.stop()
  }

  test("driver q_stream_transitions equals the batch transition matrix on the sf feed") {
    val got = graft.streaming.StreamingQueries.streamTransitions(spark, Sf)
      .as[(String, String, Long, Double)].collect().toSet
    val want = graft.operators.EventAnalytics.transitions(events)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("streamingRetention emits each (user, week) once, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val W = graft.operators.EventAnalytics.WeekUs
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_us")
    val rt = SedStreaming.streamingRetention(df)
    val q = rt.writeStream.format("memory").queryName("ret_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 5 * W + 1), (1L, 5 * W + 2))
      q.processAllAvailable()
      input.addData((1L, 5 * W + 3), (1L, 6 * W), (2L, 9 * W))
      q.processAllAvailable()
      val rows = spark.table("ret_out").as[(Long, Long)].collect().toSeq
      assert(rows.sorted == Seq((1L, 5L), (1L, 6L), (2L, 9L)))
    } finally q.stop()
  }

  test("driver q_stream_asof equals the batch as-of join on the sf feed") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.streaming.StreamingQueries.streamAsof(spark, Sf)
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    val ev = events.select("event_id", "ts_us")
    val w = Window.partitionBy("sts_us").orderBy(col("sensor_id").desc)
    val rd = events.filter(col("event_id") % 100 === 0)
      .selectExpr("event_id AS sensor_id", "ts_us AS sts_us",
        "CAST(value AS DOUBLE) AS reading")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    val want = graft.operators.AsOf.asofJoin(ev, rd, "ts_us", "sts_us",
        Seq("sensor_id", "reading"))
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("driver q_stream_retention equals the batch retention on the sf feed") {
    val got = graft.streaming.StreamingQueries.streamRetention(spark, Sf)
      .as[(Long, Long, Long)].collect().toSet
    val want = graft.operators.EventAnalytics.retention(events)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("driver q_stream_winsorize equals the batch winsorize on the sf feed") {
    val got = graft.streaming.StreamingQueries.streamWinsorize(spark, Sf)
      .as[(Long, String, Double, Double)].collect().toSet
    val want = graft.operators.EventAnalytics.winsorize(events, 0.05, 0.95)
      .as[(Long, String, Double, Double)].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("driver q_stream_zscore equals the batch z-score outliers on the sf feed") {
    val got = graft.streaming.StreamingQueries.streamZscore(spark, Sf)
      .as[(Long, String, Double, Double)].collect().toSet
    val want = graft.operators.EventAnalytics.zscoreOutliers(events)
      .as[(Long, String, Double, Double)].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("driver q_stream_funnel equals the batch funnel on the sf feed") {
    val got = graft.streaming.StreamingQueries.streamFunnel(spark, Sf)
      .select("stage_idx", "stage", "n_users", "pct_of_first")
      .as[(Int, String, Long, Double)].collect().toSet
    val want = graft.operators.EventAnalytics.funnel(
      events, graft.operators.EventAnalytics.DefaultStages)
      .select("stage_idx", "stage", "n_users", "pct_of_first")
      .as[(Int, String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("driver q_stream_sessionize equals the batch session_window aggregation") {
    val d = "/root/testdata/sf0.001"
    val got = StreamingQueries.streamSessionize(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val batch = graft.sed.Tables.events(spark, d)
      .selectExpr("CAST(user_id AS BIGINT) AS user_id", "timestamp_micros(ts_us) AS ts")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s"),
        unix_micros(col("session_window.end")).as("e"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("driver q_stream_enrich equals the batch range join") {
    val d = "/root/testdata/sf0.001"
    val got = StreamingQueries.streamEnrich(spark, d)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got.nonEmpty)
    val ev = graft.sed.Tables.events(spark, d)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id", "ts_us AS ets_us")
    val sn = graft.sed.Tables.events(spark, d)
      .selectExpr("CAST(event_id AS BIGINT) AS sensor_id", "ts_us AS sts_us",
        "CAST(value AS DOUBLE) AS reading")
      .filter(col("sensor_id") % 100 === 0)
    val batch = ev.join(sn,
        col("sts_us") <= col("ets_us") && col("sts_us") >= col("ets_us") - lit(600L * 1000000L))
      .select("event_id", "ets_us", "sensor_id", "sts_us", "reading")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == batch)
  }
  test("driver q_stream_hist equals the batch windowed histogram") {
    val d = "/root/testdata/sf0.001"
    val got = StreamingQueries.streamHistogram(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val batch = graft.sed.Tables.events(spark, d)
      .selectExpr("timestamp_micros(ts_us) AS ts", "CAST(value AS DOUBLE) AS value")
      .filter(col("value") >= 0.0 && col("value") <= 500.0)
      .select(col("ts"),
        least(floor(col("value") / 10.0), lit(49.0)).cast("long").as("value_bin"))
      .groupBy(window(col("ts"), "1 hour"), col("value_bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("w"), col("value_bin"), col("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("driver q_stream_decontam: batch-twin equal, no false negatives vs exact decontam") {
    val d = "/root/testdata/sf0.001"
    val got = StreamingQueries.streamDecontaminate(spark, d)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    // twin equality: the same map-only scoring run in batch
    val shingleN = 3
    val docsT = graft.sed.Tables.documents(spark, d)
    val evalHashes = docsT.filter(col("doc_id") % 97 === 0)
      .withColumn("__toks", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("__toks")) >= shingleN)
      .select(explode(org.apache.spark.sql.graft.ShingleHashes(
        col("__toks"), shingleN)).as("h"))
    val bc = spark.sparkContext.broadcast(
      evalHashes.stat.bloomFilter("h", 100000L, 0.01))
    val batch = graft.streaming.SedStreaming.streamingDecontaminate(
      docsT.filter(col("doc_id") % 97 =!= 0)
        .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text"),
      "doc_id", "text", bc, shingleN)
      .as[(Long, Long)].collect().toMap
    assert(got == batch, "file-stream flags must equal the batch twin")
    // no false negatives: every doc the EXACT decontamination flags is
    // flagged here, with at least as many maybe-hits as true hits
    val sh = docsT
      .withColumn("__toks", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("__toks")) >= shingleN)
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(array_distinct(org.apache.spark.sql.graft.ShingleHashes(
          col("__toks"), shingleN))).as("h"))
    val exact = sh.filter(col("doc_id") % 97 =!= 0)
      .join(sh.filter(col("doc_id") % 97 === 0).select("h").distinct(), Seq("h"), "left_semi")
      .groupBy("doc_id").agg(countDistinct(col("h")).as("n"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (id, n) =>
      assert(got.getOrElse(id, 0L) >= n, s"doc $id: exact $n not covered by flag")
    }
  }

  test("driver q_stream_dedup: first occurrences kept, re-emits only past the horizon") {
    val d = "/root/testdata/sf0.001"
    val got = StreamingQueries.streamDedup(spark, d)
      .as[(Long, String)].collect()
    assert(got.nonEmpty)
    val docs = graft.sed.Tables.documents(spark, d)
      .select(col("doc_id").cast("long"), md5(col("text")).as("h"))
      .as[(Long, String)].collect()
    // every distinct text is represented (the keeper WITHIN a batch is
    // whichever copy its state partition sees first — identity is not
    // contractual, coverage is)
    assert(got.map(_._2).toSet == docs.map(_._2).toSet,
      "every distinct hash must be emitted at least once")
    // a duplicate re-emits only after its keeper's state aged out: with
    // 1 s event-time spacing that means > 30 min apart in doc_id
    got.groupBy(_._2).foreach { case (h, g) =>
      val ids = g.map(_._1).sorted
      ids.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1) - w(0) > 1800, s"hash $h re-emitted at ${w(1)} after ${w(0)}")
      }
    }
    // everything emitted is a real (doc_id, hash) pair
    assert(got.toSet.subsetOf(docs.toSet))
  }

  test("streamingLshCandidates emits the star pairs of every batch LSH bucket") {
    implicit val sqlCtx = spark.sqlContext
    // ts ascends with doc_id, so the streaming keeper rule (earliest
    // (ts, id)) coincides with the batch star rule (min id per bucket)
    val texts =
      (0 until 4).map(_ => "the quick brown fox jumps over the lazy dog again and again") ++
      (0 until 3).map(_ => "colorless green ideas sleep furiously in the winter garden tonight") ++
      Seq(
        "completely unrelated first document about spark physics detectors",
        "another standalone text mentioning large language model corpora",
        "a third loner document on parquet min max statistics pruning")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (new Timestamp(86400000L + i * 1000L), i.toLong, t)
    }
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = SedStreaming.streamingLshCandidates(
      input.toDF().toDF("ts", "doc_id", "text"),
      "doc_id", "ts", "text", "30 minutes")
    val q = out.writeStream.format("memory").queryName("lsh_out")
      .outputMode("append").start()
    try {
      docs.grouped(4).foreach { ck => input.addData(ck); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("lsh_out")
      .select("band", "dup_id", "keeper_id").as[(Int, Long, Long)].collect().toSet

    // expected: per (band, key) batch bucket, (min id, other) star pairs
    val batch = graft.operators.Dedup.withBandKeys(
      graft.operators.Dedup.minhashSignatures(
        docs.toDF("ts", "doc_id", "text"), "doc_id", "text", 12, 3), 12, 3)
    val expected = (0 until 4).flatMap { b =>
      batch.select(col(s"b$b").as("k"), col("doc_id").cast("long").as("id"))
        .as[(Long, Long)].collect().groupBy(_._1).values
        .filter(_.length >= 2)
        .flatMap { g =>
          val ids = g.map(_._2).sorted
          ids.tail.map(id => (b, id, ids.head))
        }
    }.toSet
    assert(expected.nonEmpty, "fixture must produce LSH collisions")
    assert(got == expected)
  }

  test("streamingLshCandidates evicts keeper state past the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = SedStreaming.streamingLshCandidates(
      input.toDF().toDF("ts", "doc_id", "text"),
      "doc_id", "ts", "text", "5 minutes")
    val q = out.writeStream.format("memory").queryName("lsh_evict")
      .outputMode("append").start()
    def t(m: Int) = Timestamp.valueOf(f"2026-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    val x = "a repeated near duplicate payload that will collide in every band"
    try {
      input.addData((t(1), 1L, x),
        (t(1), 2L, "unrelated filler text so the batch holds several documents"))
      q.processAllAvailable()
      input.addData((t(3), 3L, x)) // in horizon: dup of doc 1 in all 4 bands
      q.processAllAvailable()
      input.addData((t(60), 4L, "watermark advancing text one two three four five"))
      q.processAllAvailable()
      input.addData((t(62), 5L, "more advancing text to process the pending timeouts"))
      q.processAllAvailable()
      input.addData((t(64), 6L, x)) // keeper evicted: emits NOTHING
      q.processAllAvailable()
      val got = spark.table("lsh_evict")
        .select("dup_id", "keeper_id").as[(Long, Long)].collect().toSeq
      assert(got.nonEmpty && got.toSet == Set((3L, 1L)),
        s"expected only (3,1) band hits, got $got")
      assert(got.size == 4, s"identical text must collide in all 4 bands: $got")
    } finally q.stop()
  }

  test("streamingDedup drops repeated content within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val out = SedStreaming.streamingDedup(df, "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")
      input.addData((t(1), "aaa"), (t(1), "bbb"), (t(2), "aaa"))
      q.processAllAvailable()
      input.addData((t(3), "aaa"), (t(3), "ccc")) // dup carried across batches
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").as[String].collect().sorted
      assert(texts.toSeq == Seq("aaa", "bbb", "ccc"))
    } finally q.stop()
  }
}
