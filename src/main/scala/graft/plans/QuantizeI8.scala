// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** max(|v_i|) over an `array<float>` column in double, left-to-right —
  * the per-vector scale denominator of symmetric int8 quantization.
  * For finite non-null elements (the embedding-column contract, enforced
  * upstream by the __mx > 0 guard) the result is IEEE-identical to the
  * interpreted `aggregate(transform(...))` fold and DuckDB's
  * `list_aggregate(list_transform(...), 'max')`, but a tight codegen loop
  * (the quantization pass is a full-corpus scan of the embedding store —
  * the exact place interpreted lambdas hurt). Out of contract and
  * deliberately NOT mirrored: a NaN element is skipped here (`v > acc` is
  * false for NaN) where Spark's `greatest` would rank NaN largest, and a
  * null element reads as 0.0f instead of propagating null.
  */
case class FloatVecAbsMax(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_abs_max"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > acc) acc = v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = Math.abs((double) $a.getFloat($i));
         |  if ($v > $acc) $acc = $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FloatVecAbsMax {
  def apply(c: Column): Column =
    ExpressionUtils.column(FloatVecAbsMax(ExpressionUtils.expression(c)))
}

/** Symmetric int8 quantization of an `array<float>` column against a
  * per-row double scale, rendered as the comma-joined component string
  * (the oracle-comparable form): q_i = clamp(floor(v_i * scale + 0.5),
  * -127, 127). Element math identical to the interpreted
  * `transform(...)` + `concat_ws` chain it replaces for finite non-null
  * elements (same contract caveat as FloatVecAbsMax: NaN/null elements
  * are out of contract — null reads as 0.0f rather than being dropped
  * the way concat_ws drops nulls) — one codegen loop, one string build,
  * no per-element lambda dispatch.
  */
case class QuantizeI8Str(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with UserDefinedExpression {
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), DoubleType)
  override def dataType: DataType = StringType
  override def prettyName: String = "quantize_i8_str"

  override def nullSafeEval(a: Any, s: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    UTF8String.fromString(QuantizeI8Str.render(x, scale))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.spark.sql.graft.QuantizeI8Str.render($a, $s));")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizeI8Str {
  /** Shared by interpreted eval and generated code. */
  def render(x: ArrayData, scale: Double): String = {
    val sb = new java.lang.StringBuilder(x.numElements() * 4)
    var i = 0
    while (i < x.numElements()) {
      if (i > 0) sb.append(',')
      var q = math.floor(x.getFloat(i).toDouble * scale + 0.5).toLong
      if (q < -127L) q = -127L
      if (q > 127L) q = 127L
      sb.append(q)
      i += 1
    }
    sb.toString
  }

  def apply(vec: Column, scale: Column): Column =
    ExpressionUtils.column(
      QuantizeI8Str(ExpressionUtils.expression(vec), ExpressionUtils.expression(scale)))
}
