package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.SedStreaming

/** 1e8-event scale stress of the STATEFUL streaming analytics block
  * (funnel / retention / transitions — the r9 probe covered their batch
  * twins): the sf0.1 events table replicated `R`× with event-time
  * shifts (each copy occupies its own 30-day span, ids shifted, USERS
  * UNCHANGED — state must stay user-bounded, which is the claim under
  * test), staged as a ts-ascending file feed and driven through the
  * real file-source chains with a parquet sink. Peak state-store
  * rows/bytes are polled across micro-batches and printed per chain —
  * the numbers that must stay O(users), never O(events).
  * Args: <sfDir> <replication> [chunks] [chains: comma list, default all
  * three — the 1e9 run drives funnel alone: its 2-scalar state is safe
  * at any scale, while retention's week-set values grow with the
  * replicated calendar and transitions' sink rewrites the full feed].
  */
object StreamAnalyticsStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(1000)
    val chunks = args.lift(2).map(_.toInt).getOrElse(32)
    val chains = args.lift(3).map(_.split(",").toSet)
      .getOrElse(Set("funnel", "retention", "transitions"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sed.SedQueries.ensureConfs(spark)

    val base = graft.sed.Tables.events(spark, sfDir)
      .selectExpr("CAST(event_id AS BIGINT) AS event_id",
        "CAST(user_id AS BIGINT) AS user_id", "ts_us", "event_type")
    val Array(lo, hi, n0) = base
      .agg(min("ts_us"), max("ts_us"), count(lit(1))).collect()(0)
      .toSeq.map(_.toString.toLong).toArray
    val span = hi - lo + 1
    val feed = base
      .withColumn("__c", explode(sequence(lit(0L), lit(rep - 1L))))
      .select(
        (col("event_id") + col("__c") * (n0 * 10)).as("event_id"),
        col("user_id"),
        (col("ts_us") + col("__c") * span).as("ts_us"),
        col("event_type"))
    val work = java.nio.file.Files.createTempDirectory("stream_stress").toString
    SedStreaming.stageFileStream(feed, "ts_us", s"$work/feed", chunks)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("event_type", StringType)))
    def src = SedStreaming.fileStream(spark, s"$work/feed", schema)

    def drive(name: String, out: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val q = out.writeStream.format("parquet")
        .option("path", s"$work/out_$name")
        .option("checkpointLocation", s"$work/ckpt_$name")
        .outputMode("append").start()
      var peakRows = 0L; var peakBytes = 0L
      val poll = new Thread(() => {
        while (q.isActive) {
          Option(q.lastProgress).foreach(_.stateOperators.foreach { so =>
            peakRows = math.max(peakRows, so.numRowsTotal)
            peakBytes = math.max(peakBytes, so.memoryUsedBytes)
          })
          Thread.sleep(250)
        }
      })
      poll.setDaemon(true); poll.start()
      q.processAllAvailable()
      Option(q.lastProgress).foreach(_.stateOperators.foreach { so =>
        peakRows = math.max(peakRows, so.numRowsTotal)
        peakBytes = math.max(peakBytes, so.memoryUsedBytes)
      })
      q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$work/out_$name").count()
      println(f"""{"metric":"stream_stress_$name","events":${n0 * rep},"rows":$rows,"wall_sec":$wall%.1f,"chunks":$chunks,"peak_state_rows":$peakRows,"peak_state_mb":${peakBytes / 1048576},"rss_gb":${Bench.peakRssGb}%.1f}""")
    }

    if (chains("funnel")) drive("funnel", SedStreaming.streamingFunnel(
      src.select("user_id", "ts_us", "event_type"),
      graft.operators.EventAnalytics.DefaultStages))
    // per-USER-keyed as-of: every 100th event doubles as a reading for
    // ITS user (value derived from the id — a stress needs shape, not
    // semantics); state = one (sts, id, reading) triple per user
    if (chains("asof")) drive("asof", SedStreaming.streamingAsofEnrich(
      src.selectExpr("user_id", "ts_us", "event_id",
        "CASE WHEN event_id % 100 = 0 THEN CAST(event_id % 997 AS DOUBLE) END AS r"),
      "user_id", "ts_us", "event_id", "r"))
    if (chains("retention")) drive("retention", SedStreaming.streamingRetention(
      src.select("user_id", "ts_us")))
    if (chains("transitions")) drive("transitions", SedStreaming.streamingTransitions(src))
    spark.stop()
  }
}
