package graft.sed

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-9 regenerate-proofing: the driver rewrites /root/testdata between
  * rounds and has already flipped `events.ts` between physical types once
  * (int64 TIMESTAMP(NANOS) → timestamp[us]). [[Tables]] must (a) normalize
  * EITHER representation to the same `ts_us` µs contract, and (b) fail any
  * OTHER drift with one named error instead of N scattered analysis
  * exceptions. */
class SchemaDriftSpec extends SparkSpecBase {

  /** Write a 3-row events fixture whose `ts` has the given SQL type
    * expression, alongside the other contract columns. */
  private def fixture(tsExpr: String): String = {
    val dir = Files.createTempDirectory("drift_events").toString
    spark.range(3).selectExpr(
      "id AS event_id",
      s"$tsExpr AS ts",
      "id % 2 AS user_id",
      "'click' AS event_type",
      "CAST(id AS DOUBLE) * 1.5 AS value",
      "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // 2024-01-01T00:00:07.179575Z — the µs the round-8 drift was debugged on
  private val Us = 1704067207179575L
  // pyarrow writes timestamp[us] NON-UTC-adjusted → Spark reads
  // TIMESTAMP_NTZ; the NTZ cast below reproduces that physical layout
  // (written under the base session's UTC zone, so the stored wall clock
  // is the UTC one, like the driver's generator)
  private def ntz(usExpr: String) =
    s"CAST(timestamp_micros($usExpr) AS TIMESTAMP_NTZ)"

  test("int64-ns and timestamp[us] events normalize to the same ts_us") {
    val nsDir = fixture(s"${Us}000 + id") // BIGINT nanoseconds
    val tsDir = fixture(ntz(Us.toString)) // NTZ timestamp column
    val ns = Tables.events(spark, nsDir).select("event_id", "ts_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ns(0L) == Us && ns(2L) == Us) // sub-µs ns offsets floor away
    val ts = Tables.events(spark, tsDir).select("event_id", "ts_us")
      .collect().map(r => r.getLong(1)).distinct
    assert(ts.sameElements(Array(Us)))
    assert(!Tables.events(spark, tsDir).columns.contains("ts"))
  }

  test("timestamp events flow through the ts_us contract entries") {
    // the three batch entries the round-8 drift broke, over a timestamp-
    // typed fixture: building AND running them proves no call site does
    // raw integer arithmetic on the generator's physical type
    val d = fixture(ntz(s"$Us + id * 1000000"))
    for (q <- Seq("q_timestamped_data", "q_sessionize", "q_asof_join")) {
      val out = graft.SparkEntry.queries(q)(spark, d)
      assert(out.count() > 0, s"$q returned no rows on the timestamp fixture")
    }
  }

  test("contract violations fail with one named SchemaDriftException") {
    val dir = Files.createTempDirectory("drift_bad").toString
    // ts as STRING (neither integral nor timestamp) and value missing
    spark.range(3).selectExpr(
      "id AS event_id", "'2024-01-01' AS ts", "id AS user_id",
      "'click' AS event_type", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[Tables.SchemaDriftException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("events.value"))
  }

  test("normalizeEventTime pins UTC so NTZ reads match epoch_us") {
    val d = fixture(ntz(Us.toString)) // written under UTC, like the driver
    // sabotage the session zone; the accessor must repin before the read
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val got = Tables.events(spark, d).select("ts_us").head().getLong(0)
      assert(got == Us)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
