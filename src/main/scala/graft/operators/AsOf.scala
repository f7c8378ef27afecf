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

  /** FORWARD as-of: the EARLIEST right row at or after each left
    * timestamp. Same union-once/one-range-shuffle plan as [[asofJoin]],
    * mirrored: right rows sort AFTER left rows at equal time (tag 2),
    * and the boundary-seeded fill runs backward. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must not be empty")
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      "payload columns must not collide with left-side columns")
    val l = payloadCols.foldLeft(
      left.withColumn("__ord", struct(col(leftTs).cast("double"), lit(1))))(
      (d, c) => d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = leftCols.foldLeft(
      right.select((rightTs +: payloadCols).map(col): _*)
        .withColumn("__ord", struct(col(rightTs).cast("double"), lit(2))))(
      (d, c) => if (c == rightTs) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = l.select((leftCols ++ payloadCols :+ "__ord").map(col): _*)
      .unionByName(r.select((leftCols ++ payloadCols :+ "__ord").map(col): _*),
        allowMissingColumns = false)
    DfOps.backwardFill(unioned, "__ord", payloadCols)
      .filter(col("__ord.col2") === 1)
      .drop("__ord")
  }

  /** NEAREST as-of: attach the right row whose timestamp is closest to
    * each left row's, ties resolved backward (the at-or-before row).
    * Composition of the two linear passes — backward fill carries the
    * previous row (+ its time), forward fill the next, a map-only CASE
    * picks the closer; two range shuffles total, still no candidate-
    * pair expansion. Appends `payloadCols` and `matched_ts` (the chosen
    * right timestamp, NULL when the right side is empty). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftTs: String, rightTs: String,
                  payloadCols: Seq[String]): DataFrame = {
    val prevNames = payloadCols.map("__p_" + _) :+ "__pts"
    val nextNames = payloadCols.map("__n_" + _) :+ "__nts"
    def renamed(prefix: String, tsAlias: String) = right.select(
      (col(rightTs) +: payloadCols.map(c => col(c).as(prefix + c))) :+
        col(rightTs).as(tsAlias): _*)
    val withPrev = asofJoin(left, renamed("__p_", "__pts"), leftTs, rightTs, prevNames)
    val withBoth = asofJoinForward(withPrev, renamed("__n_", "__nts"), leftTs, rightTs, nextNames)
    val pickPrev = col("__nts").isNull ||
      (col("__pts").isNotNull && (col(leftTs) - col("__pts")) <= (col("__nts") - col(leftTs)))
    val picked = payloadCols.map(c =>
      when(pickPrev, col("__p_" + c)).otherwise(col("__n_" + c)).as(c)) :+
      when(pickPrev, col("__pts")).otherwise(col("__nts")).as("matched_ts")
    withBoth.select(left.columns.map(col).toSeq ++ picked: _*)
  }
}
