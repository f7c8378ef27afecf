// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** ALL sketch-table keys of a 64-bit hash in ONE native loop — element t
  * is bit-identical to the interpreted
  * `aggregate(sequence(0, bits-1), 0L, (acc, i) -> acc * 2 +
  *   (shiftright(ph, pos_t(i)) & 1))`
  * the sketch operators previously evaluated per (row × table): a
  * higher-order-function fold re-entered the interpreter `bits` times
  * for EVERY table of every row (110 tables on the self-join path), and
  * dominated the q_image_clusters_sketch scan at both measured scales
  * (r17). Positions are the [[graft.operators.Multimodal.sketchPositions]]
  * draw, carried structurally (Seq) so expression equality/canonical-
  * ization stays value-based. Callers `posexplode` the result, which
  * reproduces the former (t, key0) relation exactly. */
case class SketchKeys(child: Expression, positions: Seq[Seq[Int]])
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(positions.nonEmpty && positions.forall(p => p.nonEmpty && p.size <= 16)
    && positions.map(_.size).distinct.size == 1,
    "positions must be non-empty tables of equal width <= 16")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sketch_keys"

  @transient private lazy val flat: Array[Int] = positions.flatten.toArray
  private def bits: Int = positions.head.size

  override def nullSafeEval(a: Any): Any =
    SketchKeys.compute(a.asInstanceOf[Long], flat, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("sketchPositions", flat, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.SketchKeys.compute($a, $flatRef, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchKeys {
  /** Shared by interpreted eval and generated code. `flat` is the
    * row-major (table-major) position layout; fold order matches the
    * former HOF exactly (first position = most significant key bit). */
  def compute(ph: Long, flat: Array[Int], bits: Int): GenericArrayData = {
    val tables = flat.length / bits
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var i = 0
      val off = t * bits
      while (i < bits) {
        acc = acc * 2 + ((ph >>> flat(off + i)) & 1L)
        i += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  def apply(hash: Column, positions: Array[Array[Int]]): Column =
    ExpressionUtils.column(
      SketchKeys(ExpressionUtils.expression(hash), positions.map(_.toSeq).toSeq))
}
