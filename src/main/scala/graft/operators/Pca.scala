package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** Principal-component analysis over an `array<float>` embedding column —
  * the dimensionality-reduction step in front of ANN / clustering /
  * visualization in an embedding pipeline.
  *
  * Scale split: the only distributed work is accumulating the moment
  * statistics (count, per-dimension sums, and the upper triangle of the
  * second-moment matrix) — ONE pass over the raw float arrays into a
  * 1 + d + d(d+1)/2 double buffer per task, partition buffers combined
  * by a tiny SQL aggregation. No explode: a d=64 vector updates 2,081 buffer slots
  * in a tight loop instead of materializing 2,080 shuffle rows, and the
  * mean rides in the same pass as the moments. The d×d covariance matrix
  * is driver-sized (d = embedding width, 64 here), so the eigensolve is
  * plain JVM math: power iteration with deflation, deterministic start
  * vector, fixed iteration budget.
  * Projection back over the corpus is map-only column algebra
  * (FloatVecDot — codegen'd, no UDF).
  */
object Pca {

  /** Fitted model: per-dimension means, top-k principal axes (unit
    * vectors, rows of `components`), and their eigenvalues (variance
    * captured along each axis), in decreasing order. */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                      eigenvalues: Array[Double]) {
    require(components.length == eigenvalues.length)
  }

  /** One pass over the corpus for count + sums + second moments (upper
    * triangle, exploiting symmetry), then covariance and the top-k
    * eigenpairs on the driver. `dim` must match the embedding width.
    *
    * The partition-local moment buffers are combined through ONE tiny
    * SQL aggregation — (slot index, value) rows, groupBy(index).sum —
    * rather than `RDD.treeAggregate`. treeAggregate's tree step is an
    * RDD-level shuffle of primitive double arrays, for which Spark
    * auto-picks Kryo, and Kryo's default registration set cannot even be
    * constructed on Java 17 without `--add-opens` launcher flags a plain
    * `java` invocation (how the driver runs Bench/Verify) doesn't pass.
    * That only triggers once the input has enough partitions to add a
    * tree level — the 100x stress, never the small-sf fixtures — i.e. a
    * scale-dependent landmine. The SQL path shuffles through the
    * engine-native UnsafeRow serializer at any partition count, and its
    * row volume is partitions × buffer slots (~2k rows per partition at
    * dim 64) — negligible next to the corpus scan it summarizes.
    *
    * Determinism: the eigensolve has no RNG, so a given moment buffer
    * always yields the same model. The moment sums themselves are double
    * additions whose reduction order follows the partition layout, so
    * across different partitionings/cluster layouts the fit can drift in
    * the last ULPs — same-model determinism, not cross-run bit-stability.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int,
          iters: Int = 1000): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k must be in [1, $dim]")
    val spark = df.sparkSession
    val base = df.select(col(vecCol).as("__v")).filter(size(col("__v")) === dim)
    val tri = dim * (dim + 1) / 2
    // buffer layout: [0] = n, [1, dim] = sums, then the upper triangle
    // row-major ((i,j>=i) in the same fixed loop order everywhere)
    val nSlots = 1 + dim + tri
    val partials = base.rdd.mapPartitions { it =>
      val b = new Array[Double](nSlots)
      it.foreach { row =>
        val v = row.getSeq[Float](0)
        b(0) += 1.0
        var i = 0
        var t = 1 + dim
        while (i < dim) {
          val vi = v(i).toDouble
          b(1 + i) += vi
          var j = i
          while (j < dim) { b(t) += vi * v(j).toDouble; j += 1; t += 1 }
          i += 1
        }
      }
      Iterator.tabulate(nSlots)(i => Row(i, b(i)))
    }
    val accRows = spark.createDataFrame(partials, StructType(Seq(
        StructField("i", IntegerType), StructField("v", DoubleType))))
      .groupBy("i").agg(sum("v").as("v")).collect()
    val acc = new Array[Double](nSlots)
    accRows.foreach(r => acc(r.getInt(0)) = r.getDouble(1))
    val n = acc(0).toLong
    require(n >= 2, s"PCA needs >= 2 vectors, got $n")
    val mean = Array.tabulate(dim)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = acc(t) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      t += 1
    }
    solve(mean, cov, dim, k, iters)
  }

  /** The pre-round-7 explode-based moment pass, kept (package-private)
    * solely so PcaSpec can pin the treeAggregate accumulator against an
    * independently-computed moment set. Same math, ~2,000× the row
    * traffic. */
  private[graft] def fitViaExplode(df: DataFrame, vecCol: String, dim: Int, k: Int,
                                   iters: Int = 1000): PcaModel = {
    require(k >= 1 && k <= dim, s"k=$k must be in [1, $dim]")
    val base = df.select(col(vecCol).as("__v")).filter(size(col("__v")) === dim)
    val firstRows = base
      .select(posexplode(col("__v")).as(Seq("i", "vi")))
      .groupBy("i").agg(sum(col("vi").cast("double")).as("s"), count(lit(1)).as("n"))
      .collect()
    val n = firstRows.map(_.getLong(2)).headOption
      .getOrElse(throw new IllegalArgumentException("PCA fit over an empty corpus"))
    require(n >= 2, s"PCA needs >= 2 vectors, got $n")
    val mean = new Array[Double](dim)
    firstRows.foreach(r => mean(r.getInt(0)) = r.getDouble(1) / n)
    val secondRows = base
      .select(posexplode(col("__v")).as(Seq("i", "vi")), col("__v"))
      .select(col("i"), col("vi"), posexplode(col("__v")).as(Seq("j", "vj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(col("vi").cast("double") * col("vj").cast("double")).as("s"))
      .collect()
    val cov = Array.ofDim[Double](dim, dim)
    secondRows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val c = r.getDouble(2) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    solve(mean, cov, dim, k, iters)
  }

  /** Power iteration with deflation: deterministic uniform start, fixed
    * budget — no RNG, so a given covariance always yields the same
    * eigenpairs. */
  private def solve(mean: Array[Double], cov: Array[Array[Double]],
                    dim: Int, k: Int, iters: Int): PcaModel = {
    val comps = Array.ofDim[Double](k, dim)
    val eigs = new Array[Double](k)
    val work = cov.map(_.clone())
    for (c <- 0 until k) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lambda = 0.0
      for (_ <- 0 until iters) {
        val w = matVec(work, v)
        val nw = math.sqrt(w.map(x => x * x).sum)
        if (nw > 0) { v = w.map(_ / nw); lambda = nw }
      }
      // Rayleigh quotient is the better eigenvalue estimate than ||Cv||
      lambda = dotD(v, matVec(work, v))
      comps(c) = v; eigs(c) = lambda
      for (i <- 0 until dim; j <- 0 until dim) work(i)(j) -= lambda * v(i) * v(j)
    }
    PcaModel(mean, comps, eigs)
  }

  /** Project the corpus onto the model's axes: map-only, one codegen'd
    * dot per component, centering folded into a constant offset
    * (dot(v - mean, c) = dot(v, c) - dot(mean, c)). Output columns
    * `p1..pk` alongside `keep`. */
  def project(df: DataFrame, keep: Seq[Column], vecCol: String,
              model: PcaModel): DataFrame = {
    val projCols = model.components.zipWithIndex.map { case (comp, i) =>
      // components quantized to float once, identically for the data dot
      // and the mean offset, so centering stays consistent
      val compF = comp.map(_.toFloat.toDouble)
      (graft.functions.VectorFunctions.dotLit(col(vecCol), compF) -
        lit(dotD(model.mean, compF))).as(s"p${i + 1}")
    }
    df.select(keep ++ projCols: _*)
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => dotD(row, v))

  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
}
