// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-distinct-code-point occurrence counts of a string, fused into ONE
  * native pass — the multiset is bit-identical to the run lengths of
  * `array_sort(regexp_extract_all(text, '[\\s\\S]', 0))` (Java regex
  * character classes match per CODE POINT, as does [[CodePoints.of]]),
  * but without materializing one single-char UTF8String per character,
  * one regex Matcher region per character, and an object-comparison
  * array_sort over all of them (measured 25× on the q_char_entropy scan
  * at 100×; r17). Count ORDER is ascending code point — any consumer of
  * the counts must be order-independent (entropy sums are). Empty string
  * yields an empty array; callers filter `size >= 1` exactly as they
  * filtered the regex form. */
case class CharRunCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_run_counts"

  override def nullSafeEval(a: Any): Any =
    CharRunCounts.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.CharRunCounts.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharRunCounts {
  /** Shared by interpreted eval and generated code. One UTF-8 decode
    * pass ([[CodePoints.of]]), one primitive-int sort (no boxing, no
    * UTF8String comparator), one run-length pass. */
  def compute(text: UTF8String): ArrayData = {
    val cps = CodePoints.of(text)
    if (cps.length == 0) return new GenericArrayData(Array.empty[Long])
    java.util.Arrays.sort(cps)
    var d = 1
    var i = 1
    while (i < cps.length) {
      if (cps(i) != cps(i - 1)) d += 1
      i += 1
    }
    val out = new Array[Long](d)
    var j = 0
    var run = 1L
    i = 1
    while (i < cps.length) {
      if (cps(i) != cps(i - 1)) { out(j) = run; j += 1; run = 1L }
      else run += 1L
      i += 1
    }
    out(j) = run
    new GenericArrayData(out)
  }

  def apply(text: Column): Column =
    ExpressionUtils.column(CharRunCounts(ExpressionUtils.expression(text)))
}
