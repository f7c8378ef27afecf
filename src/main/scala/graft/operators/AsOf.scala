package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed as-of join — attach to every left row the LATEST right row
  * at or before its timestamp (the "backward" as-of of time-series
  * engines; the brief's canonical custom-operator example).
  *
  * Spark has no native as-of join, and the generic rewrite (range join +
  * per-row argmax) shuffles candidate PAIRS — quadratic under bursty
  * right sides. This implementation is linear: union both sides tagged,
  * range-partition + sort ONCE on (time, tag) so each right row sorts
  * immediately before the left rows it serves, then run the
  * boundary-seeded distributed forward fill ([[DfOps.forwardFill]] —
  * O(partitions) driver state, no windows over the whole stream) and keep
  * the left rows. Cost at any scale: ONE range shuffle of |L| + |R| rows
  * + two narrow passes — the same plan a sort-merge as-of would make,
  * expressed with machinery the engine already has.
  *
  * Right-side timestamps need not be unique, but ties are resolved by
  * sort order; dedupe the right side first for deterministic results
  * (the driver query keeps the max-id reading per timestamp).
  */
object AsOf {

  /** `left` as-of `right` on `leftTs >= rightTs` (backward join).
    * `payloadCols` are the right-side columns to attach; left rows with
    * no preceding right row keep them NULL (left-join semantics). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must not be empty")
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      "payload columns must not collide with left-side columns")

    // sort key: (time, tag) — a right row at time t sorts BEFORE left
    // rows at the same t, so '>=' (inclusive) semantics fall out
    val l = payloadCols.foldLeft(
      left.withColumn("__ord", struct(col(leftTs).cast("double"), lit(1))))(
      (d, c) => d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = leftCols.foldLeft(
      right.select((rightTs +: payloadCols).map(col): _*)
        .withColumn("__ord", struct(col(rightTs).cast("double"), lit(0))))(
      (d, c) => if (c == rightTs) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = l.select((leftCols ++ payloadCols :+ "__ord").map(col): _*)
      .unionByName(r.select((leftCols ++ payloadCols :+ "__ord").map(col): _*),
        allowMissingColumns = false)
    DfOps.forwardFill(unioned, "__ord", payloadCols)
      .filter(col("__ord.col2") === 1) // keep left rows
      .drop("__ord")
  }
}
