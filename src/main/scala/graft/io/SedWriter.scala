package graft.io

import org.apache.spark.sql.DataFrame
import graft.operators.BinAxis

/** Result sinks — the Spark-native analogue of sed's io/ exporters
  * (reference: src/sed/io/tiff.py, io/nexus.py, core/processor.py save
  * paths). Binned results are exported as LONG-FORM tables (one row per
  * non-empty bin + center coordinates + axis metadata), the only
  * representation that stays sane when the cube is sparse or huge; a
  * dense xarray/tiff render is a trivial local pivot of that table.
  */
object SedWriter {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Render a (small) binned result as a DENSE row-major cube on the
    * driver — the xarray `DataArray.values` analogue for plotting/export.
    * Deliberately driver-local: only valid when ∏ nBins is plot-sized;
    * the distributed representation stays sparse long-form. */
  def denseCube(hist: DataFrame, axes: Seq[BinAxis],
                cntCol: String = "cnt"): Array[Double] = {
    val sizes = axes.map(_.nBins)
    require(sizes.product <= 16777216, s"dense cube too large: ${sizes.mkString("x")}")
    val out = new Array[Double](sizes.product)
    val strides = sizes.scanRight(1)(_ * _).tail // row-major
    val rows = hist.select(
      (axes.map(a => org.apache.spark.sql.functions.col(a.idxName)) :+
        org.apache.spark.sql.functions.col(cntCol)): _*).collect()
    rows.foreach { r =>
      var off = 0
      var i = 0
      while (i < axes.length) { off += r.getLong(i).toInt * strides(i); i += 1 }
      out(off) = r.get(axes.length) match {
        case l: Long => l.toDouble
        case d: Double => d
        case x => x.toString.toDouble
      }
    }
    out
  }

  /** Export a binned histogram with its axis spec: data as parquet under
    * `<path>/data`, axis metadata (name/bins/range — the xarray coords
    * contract) as a one-row-per-axis JSON table under `<path>/axes`. */
  def binned(hist: DataFrame, axes: Seq[BinAxis], path: String): Unit = {
    val spark = hist.sparkSession
    import spark.implicits._
    parquet(hist, s"$path/data")
    axes.map(a => (a.col, a.nBins, a.lo, a.hi))
      .toDF("axis", "n_bins", "lo", "hi")
      .coalesce(1).write.mode("overwrite").json(s"$path/axes")
  }
}
