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
      val rows = spark.table("ff_out").as[(Long, Long, Option[Double])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(rows((1L, 2L)).contains(10.0))
      assert(rows((1L, 3L)).contains(10.0)) // carried across batches
      assert(rows((2L, 1L)).isEmpty)        // nothing seen yet for key 2
      assert(rows((2L, 3L)).contains(5.0))
    } finally q.stop()
  }
}
