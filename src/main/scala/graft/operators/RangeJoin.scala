package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join — the second of the brief's
  * named custom-operator examples (with [[AsOf]]).
  *
  * Spark plans a pure inequality join (`lo <= p AND p <= hi`, no equality
  * key) as BroadcastNestedLoopJoin — quadratic work and a broadcast of a
  * whole side, dead at scale. The fix manufactures an equality key: points
  * hash to their `floor(p / bucketWidth)` bucket, each interval EXPLODES
  * into every bucket it overlaps, and the exact containment predicate
  * prunes after an ordinary shuffled equi-join on the bucket id. Shuffle
  * volume: |points| + Σ(interval span / bucketWidth) rows — linear, with
  * the usual partial-agg/AQE machinery available downstream.
  *
  * `bucketWidth` trades replication against selectivity: pick it near the
  * MEDIAN interval span so typical intervals replicate into O(1) buckets.
  * A hard cap on per-interval replication guards against a degenerate
  * giant interval exploding the build side (such intervals are better
  * served broadcast — the cap fails loudly instead of silently OOMing).
  */
object RangeJoin {

  /** Join each point row to every interval row with
    * `lo <= point <= hi` (inclusive ends). Columns of both inputs are
    * preserved; interval columns must not collide with point columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty, s"column collision: ${collisions.mkString(",")}")

    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("__bk", bucketOf(col(pointCol)))
    val iv = intervals
      .withColumn("__lo_bk", bucketOf(col(loCol)))
      .withColumn("__hi_bk", bucketOf(col(hiCol)))
      // loud failure beats a silent 10^6-way explode of one interval —
      // checked in-flight, same technique as SedReader.withFileId
      .withColumn("__span", col("__hi_bk") - col("__lo_bk") + 1)
      .withColumn("__bk", explode(when(col("__span") <= maxBucketsPerInterval,
        sequence(col("__lo_bk"), col("__hi_bk")))
        .otherwise(raise_error(concat(lit("interval spans too many buckets: "),
          col("__span").cast("string"), lit(" > " + maxBucketsPerInterval),
          lit(" — raise bucketWidth or broadcast such intervals"))))))
      .drop("__lo_bk", "__hi_bk", "__span")
    p.join(iv, Seq("__bk"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) <= col(hiCol))
      .drop("__bk")
  }
}
