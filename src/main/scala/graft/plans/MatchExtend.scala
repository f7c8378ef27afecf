// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maximal bidirectional extension of a k-char anchor match between two
  * texts — the "extend the seed" step of anchor-based exact substring
  * dedup: given texts `a`/`b` and char offsets `aPos`/`bPos` where both
  * carry the same k-gram, walk left and right while characters keep
  * matching and return the maximal shared interval [start, end) in B
  * coordinates (a 2-element long array). The anchor grams are verified
  * first: a rolling-hash collision (grams differ) returns NULL, so
  * downstream `isNotNull` filters false seeds — extension is therefore
  * EXACT regardless of hash quality. O(match length) per call, in-row,
  * no allocation beyond the 2-long result. */
case class MatchExtend(first: Expression, second: Expression,
                       third: Expression, fourth: Expression, k: Int)
    extends QuaternaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(k >= 1, "anchor width k must be >= 1")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, LongType, StringType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "match_extend"

  override def nullSafeEval(a: Any, ap: Any, b: Any, bp: Any): Any =
    MatchExtend.compute(a.asInstanceOf[UTF8String], ap.asInstanceOf[Long],
      b.asInstanceOf[UTF8String], bp.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, ap, b, bp) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
            org.apache.spark.sql.graft.MatchExtend.compute($a, $ap, $b, $bp, $k);
          ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object MatchExtend {
  /** Shared by interpreted eval and generated code. Null = anchor grams
    * differ (hash collision) or offsets out of range. Offsets are CODE
    * POINTS (the WinnowedAnchors / CharGramHashes60 / SQL substring
    * coordinate system — astral-plane chars count once, and span edges
    * can never split a surrogate pair). */
  def compute(aText: UTF8String, aPosL: Long, bText: UTF8String,
              bPosL: Long, k: Int): GenericArrayData = {
    val a = aText.toString.codePoints().toArray
    val b = bText.toString.codePoints().toArray
    val aPos = aPosL.toInt
    val bPos = bPosL.toInt
    if (aPos < 0 || bPos < 0 || aPos + k > a.length || bPos + k > b.length)
      return null
    var i = 0
    while (i < k) {
      if (a(aPos + i) != b(bPos + i)) return null
      i += 1
    }
    var l = 0
    while (aPos - l - 1 >= 0 && bPos - l - 1 >= 0 &&
      a(aPos - l - 1) == b(bPos - l - 1)) l += 1
    var r = 0
    while (aPos + k + r < a.length && bPos + k + r < b.length &&
      a(aPos + k + r) == b(bPos + k + r)) r += 1
    new GenericArrayData(Array((bPos - l).toLong, (bPos + k + r).toLong))
  }

  def apply(aText: Column, aPos: Column, bText: Column, bPos: Column, k: Int): Column =
    ExpressionUtils.column(MatchExtend(
      ExpressionUtils.expression(aText), ExpressionUtils.expression(aPos),
      ExpressionUtils.expression(bText), ExpressionUtils.expression(bPos), k))
}
