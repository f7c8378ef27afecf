// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over int64 hashes — the
  * map-side pruning step of two-phase benchmark decontamination
  * (Dedup.bloomDecontaminate). Replaces a per-row ScalaUDF that boxed
  * every long and broke whole-stage codegen on the TRAIN shingle scan,
  * i.e. the largest input in the whole pipeline at 100 TB.
  *
  * The sketch travels as a task broadcast (shipped once per executor,
  * not per task, not in generated source); codegen materializes the
  * deserialized filter once per operator instance via mutable state, so
  * the per-row cost is exactly one primitive `mightContainLong` call
  * inside the surrounding WholeStageCodegen span. Reference semantics:
  * the contains() side of the reference's exact n-gram overlap check
  * (decontamination against eval benchmarks), relaxed to a no-false-
  * negative pre-filter whose FPs the subsequent exact semi-join removes.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {

  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val filter: BloomFilter = bloom.value

  override def nullSafeEval(h: Any): Any =
    filter.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val filterVar = ctx.addMutableState(
      classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $filterVar.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  def apply(h: Column, bloom: Broadcast[BloomFilter]): Column =
    ExpressionUtils.column(BloomMightContainLong(ExpressionUtils.expression(h), bloom))
}
