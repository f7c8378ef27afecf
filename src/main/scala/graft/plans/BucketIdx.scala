// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Bin index for NON-UNIFORM histogram edges via binary search — numpy
  * `histogramdd` explicit-edges semantics: bin i covers
  * [edges(i), edges(i+1)), the last bin is closed on the right; values
  * outside return -1 (callers filter). Edges ride along as a plan
  * reference object; lookup is O(log nBins) branch-predictable codegen.
  */
case class BucketIdx(child: Expression, edges: Array[Double])
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  // UserDefinedExpression marks this NON-CHEAP for CollapseProject: a
  // multi-referenced alias of this expression must stay materialized in
  // its own projection instead of being inlined (= re-evaluated) into
  // every consumer -- inlining turned one dfield lookup into 34 in the
  // full-workflow plan and dominated its runtime
  override def name: String = prettyName

  require(edges.length >= 2 && edges.sliding(2).forall(p => p(0) < p(1)),
    "edges must be strictly increasing")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bucket_idx"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    BucketIdx.search(edges, v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = ctx.addReferenceObj("edges", edges, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.BucketIdx.search($e, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketIdx {
  /** Shared by interpreted eval and generated code. */
  def search(edges: Array[Double], v: Double): Long = {
    val n = edges.length
    // NaN fails every comparison below and would fall through to bin 0
    if (java.lang.Double.isNaN(v) || v < edges(0) || v > edges(n - 1)) return -1L
    if (v == edges(n - 1)) return (n - 2).toLong // right edge closes last bin
    var lo = 0; var hi = n - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (v >= edges(mid)) lo = mid else hi = mid
    }
    lo.toLong
  }

  def apply(c: Column, edges: Array[Double]): Column =
    ExpressionUtils.column(BucketIdx(ExpressionUtils.expression(c), edges))
}
