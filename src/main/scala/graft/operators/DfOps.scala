package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Generic dataframe operations, mirroring sed.core.dfops
  * (reference: src/sed/core/dfops.py).
  *
  * All single-row ops are pure Column algebra (codegen'd, shuffle-free).
  * The fills are the one genuinely order-dependent pair; see their docs for
  * the cluster-scale design.
  */
object DfOps {

  /** Bound filter on a column, exclusive on both ends
    * (dfops.py:92 apply_filter). Declarative, so Catalyst pushes it into
    * the parquet scan. */
  def applyFilter(df: DataFrame, col: String,
                  lowerBound: Double = Double.NegativeInfinity,
                  upperBound: Double = Double.PositiveInfinity): DataFrame =
    df.filter(df(col) > lit(lowerBound) && df(col) < lit(upperBound))

  /** Drop columns (dfops.py:74 drop_column). */
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** Simultaneous 2-D mapping of two columns (dfops.py:167 map_columns_2d). */
  def mapColumns2d(df: DataFrame, map2d: (Column, Column) => (Column, Column),
                   xCol: String, yCol: String,
                   newXCol: String, newYCol: String): DataFrame = {
    val (nx, ny) = map2d(df(xCol), df(yCol))
    df.withColumn(newXCol, nx).withColumn(newYCol, ny)
  }

  /** Offset a column by other columns and/or their global means
    * (dfops.py:324 offset_by_other_columns; also the engine behind
    * energy/delay `add_offsets`).
    *
    * The mean-reduction terms need one global aggregate; instead of
    * `.collect()` (which would force an action mid-pipeline) the 1-row
    * aggregate is broadcast-cross-joined so the whole thing stays one lazy
    * plan — at cluster scale this is a partial-agg + 1-row exchange,
    * independent of data size.
    *
    * Means are computed in exact integer cents (inputs have 2-decimal
    * precision) to keep the result independent of partition/merge order —
    * a float sum's value would depend on reduction order at scale.
    */
  def offsetByOtherColumns(df: DataFrame, targetColumn: String,
                           offsets: Seq[ColumnOffset],
                           resultColumn: String = null): DataFrame = {
    val out = if (resultColumn == null) targetColumn else resultColumn
    val meanCols = offsets.filter(o => o.reduction.contains("mean") || o.preserveMean)
      .distinctBy(_.column) // two offsets on one column need ONE mean alias
    var base = df
    if (meanCols.nonEmpty) {
      val aggs = meanCols.map(o => exactMean(df(o.column)).as(s"__mean_${o.column}"))
      val meansDf = df.agg(aggs.head, aggs.tail: _*)
      base = df.crossJoin(broadcast(meansDf))
    }
    var expr: Column = base(targetColumn)
    for (o <- offsets) o.reduction match {
      case Some("mean") => expr = expr + lit(o.weight) * col(s"__mean_${o.column}")
      case Some(r) => throw new IllegalArgumentException(s"unsupported reduction $r")
      case None => expr = expr + lit(o.weight) * base(o.column)
    }
    for (o <- offsets if o.preserveMean && o.reduction.isEmpty)
      expr = expr - lit(o.weight) * col(s"__mean_${o.column}")
    base.withColumn(out, expr)
      .drop(meanCols.map(o => s"__mean_${o.column}"): _*)
  }

  /** Order-independent exact mean of a 2-decimal-valued double column:
    * sum in integer cents, divide once. */
  def exactMean(c: Column): Column =
    sum(floor(c * lit(100.0) + lit(0.5)).cast("long")).cast("double") / count(c) / lit(100.0)

  def exactMeanSql(c: String): String =
    s"(CAST(SUM(CAST(FLOOR($c * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / COUNT($c) / 100.0)"

  /** Interpolate externally time-stamped sensor data onto every event
    * (dfops.py:124 add_time_stamped_data). The knot table is small
    * (per-run sensor readings) so it enters the plan as a literal
    * piecewise-linear expression — shuffle-free, unlike a range join. */
  def addTimeStampedData(df: DataFrame, tsSecondsCol: Column, destColumn: String,
                         timeStamps: Seq[Double], data: Seq[Double]): DataFrame =
    df.withColumn(destColumn,
      graft.functions.SedFunctions.interp1d(tsSecondsCol, timeStamps, data))

  // ---------------------------------------------------------------------
  // Forward / backward fill (dfops.py:202 forward_fill_lazy, 264
  // backward_fill_lazy)
  // ---------------------------------------------------------------------
  // The Dask reference uses map_overlap(before=N) repeated `iterations`
  // times — approximate (a gap longer than N rows survives) and ordering-
  // fragile. The exact distributed algorithm instead:
  //   1. range-partition + sort by the order column (one shuffle);
  //   2. per partition, record the last (first) non-null of each fill
  //      column — a #partitions × #cols array, bytes-sized, to the driver;
  //   3. prefix-scan those boundaries on the driver and re-broadcast, then
  //      fill each partition seeded with its predecessor's boundary value.
  // Cost at any scale: one range shuffle + two narrow passes; boundary
  // state is O(partitions), never O(rows).

  def forwardFill(df: DataFrame, orderCol: String, fillCols: Seq[String],
                  numPartitions: Int = 0): DataFrame =
    fillImpl(df, orderCol, fillCols, numPartitions, backward = false)

  def backwardFill(df: DataFrame, orderCol: String, fillCols: Seq[String],
                   numPartitions: Int = 0): DataFrame =
    fillImpl(df, orderCol, fillCols, numPartitions, backward = true)

  private def fillImpl(df: DataFrame, orderCol: String, fillCols: Seq[String],
                       numPartitions: Int, backward: Boolean): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sortCol = if (backward) df(orderCol).desc else df(orderCol).asc
    // localCheckpoint, not cache(): scanned twice (boundary pass + fill
    // pass), and the blocks are released with the RDD by the context
    // cleaner instead of pinning executor memory for the whole session
    val sorted = df.repartitionByRange(n, sortCol).sortWithinPartitions(sortCol)
      .localCheckpoint(true)
    val schema = sorted.schema
    val idxs = fillCols.map(schema.fieldIndex)

    // pass 1: last non-null per (partition, column)
    val bounds: Array[(Int, Array[Option[Any]])] = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val last = Array.fill[Option[Any]](idxs.length)(None)
        it.foreach { row =>
          var j = 0
          while (j < idxs.length) {
            if (!row.isNullAt(idxs(j))) last(j) = Some(row.get(idxs(j)))
            j += 1
          }
        }
        Iterator.single((pid, last))
      }.collect()

    // driver prefix-scan: seed for partition p = last non-null in 0..p-1
    val byPid = bounds.sortBy(_._1).map(_._2)
    val seeds = Array.ofDim[Option[Any]](byPid.length, idxs.length)
    val running = Array.fill[Option[Any]](idxs.length)(None)
    for (p <- byPid.indices) {
      for (j <- idxs.indices) seeds(p)(j) = running(j)
      for (j <- idxs.indices) if (byPid(p)(j).isDefined) running(j) = byPid(p)(j)
    }
    val seedsB = spark.sparkContext.broadcast(seeds)

    // pass 2: fill, seeded with the predecessor partition's boundary
    val filled = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val cur = seedsB.value(pid).clone()
      it.map { row =>
        val vals = row.toSeq.toArray
        var j = 0
        while (j < idxs.length) {
          if (row.isNullAt(idxs(j))) { if (cur(j).isDefined) vals(idxs(j)) = cur(j).get }
          else cur(j) = Some(row.get(idxs(j)))
          j += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(filled, schema)
  }

  /** Jitter columns (dfops.py:17 apply_jitter) — deterministic counter-based
    * noise keyed on an id column; see SedFunctions.jitterUniform/Normal. */
  def applyJitter(df: DataFrame, cols: Seq[String], idCol: String, amp: Double,
                  jitterType: String = "uniform", suffix: String = "_jittered"): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val j = jitterType match {
        case "uniform" => graft.functions.SedFunctions.jitterUniform(acc(c), acc(idCol), amp, i + 1)
        case "normal"  => graft.functions.SedFunctions.jitterNormal(acc(c), acc(idCol), amp, i + 1)
        case t => throw new IllegalArgumentException(s"jitter type $t")
      }
      acc.withColumn(c + suffix, j)
    }
}

/** One offset term for [[DfOps.offsetByOtherColumns]]: add
  * `weight * column` (reduction=None) or `weight * mean(column)`
  * (reduction=Some("mean")); `preserveMean` subtracts `weight*mean(column)`
  * to keep the target's mean unchanged (dfops.py:324). */
case class ColumnOffset(column: String, weight: Double,
                        reduction: Option[String] = None,
                        preserveMean: Boolean = false)
