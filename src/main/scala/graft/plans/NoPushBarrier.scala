// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Identity expression that ADVERTISES non-determinism (it is in fact
  * deterministic) so the optimizer cannot relocate predicates across it.
  *
  * Why this exists: a filter on a histogram's aggregated bin key is
  * substitutable through the Aggregate's grouping expression and every
  * Project below it, so PushDownPredicates re-derives the ENTIRE
  * calibration chain inside a scan-level Filter — the full sed workflow
  * chain embeds the deformation-field lookup 16× in that predicate, and
  * codegen'd Filter performs no subexpression elimination (measured 30×
  * slowdown of workflow_1d). Wrapping the post-aggregation key in this
  * barrier keeps the null-key drop where it belongs: on the already-tiny
  * aggregated output.
  *
  * Evaluation and codegen are pure pass-through — zero runtime cost.
  */
case class NoPushBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "no_push_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): NoPushBarrier =
    copy(child = newChild)
}

object NoPushBarrier {
  def apply(c: Column): Column =
    ExpressionUtils.column(NoPushBarrier(ExpressionUtils.expression(c)))
}
