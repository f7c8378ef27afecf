// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** 32-bit SimHash over PRE-HASHED tokens (array<long> of 32-bit hashes):
  * per-bit ±1 votes, sign-aggregated — one tight codegen loop per row.
  * Bit-identical to the interpreted `aggregate(zip_with(...))`
  * formulation and to the DuckDB oracle's per-bit CASE sums, but without
  * per-token-per-bit lambda interpretation (and the token hash is
  * computed once per token, not once per bit).
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  // UserDefinedExpression marks this NON-CHEAP for CollapseProject: a
  // multi-referenced alias of this expression must stay materialized in
  // its own projection instead of being inlined (= re-evaluated) into
  // every consumer -- inlining turned one dfield lookup into 34 in the
  // full-workflow plan and dominated its runtime
  override def name: String = prettyName


  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](32)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |long[] $votes = new long[32];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  def apply(hashes: Column): Column =
    ExpressionUtils.column(SimHash32(ExpressionUtils.expression(hashes)))
}
