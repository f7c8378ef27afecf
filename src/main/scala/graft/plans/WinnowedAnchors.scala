// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-selected k-char-gram anchors (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 "Winnowing: Local Algorithms for Document
  * Fingerprinting") over a document's characters, fused into ONE pass:
  * rolling 64-bit polynomial hashes of every k-char gram, then the
  * sliding-window minimum (window `w`, rightmost on ties) selects
  * ~2/(w+1) of positions as anchors. Selection is CONTENT-LOCAL — it
  * depends only on the w hashes in the window — so two copies of the
  * same text select the same anchors at the same relative offsets, and
  * the winnowing guarantee holds: any repeat of length ≥ w + k − 1
  * chars shares at least one selected anchor gram in BOTH copies.
  *
  * This is the shuffle-row reducer behind `Dedup.substringDedupAnchored`:
  * only anchors (not every position) enter the corpus-wide exchange.
  * Returns array<struct<pos:int, h:long>> of selected (char offset,
  * gram hash); texts shorter than k chars yield an empty array; texts
  * with fewer than w gram positions are treated as one window (their
  * minimum is still selected, so every k-char-or-longer doc emits ≥ 1
  * anchor). O(n) via a monotonic deque.
  */
case class WinnowedAnchors(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(k >= 4, "gram width k must be >= 4")
  require(w >= 1, "winnowing window w must be >= 1")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnowed_anchors"

  override def nullSafeEval(a: Any): Any =
    WinnowedAnchors.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowedAnchors.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedAnchors {
  private final val Base = 1000003L

  /** Shared by interpreted eval and generated code. Offsets and gram
    * widths are CODE POINTS (the CharGramHashes60 / SQL substring /
    * DuckDB substr coordinate system), so anchored spans land in the
    * same units as the exact substring operator's. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cp = CodePoints.of(text)
    val n = cp.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling polynomial hash over code points, 64-bit wraparound
    var pow = 1L // Base^(k-1)
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val h = new Array[Long](m)
    var acc = 0L
    i = 0
    while (i < k) { acc = acc * Base + cp(i); i += 1 }
    h(0) = acc
    i = 1
    while (i < m) {
      acc = (acc - cp(i - 1) * pow) * Base + cp(i + k - 1)
      h(i) = acc
      i += 1
    }
    // sliding-window minimum, window min(w, m), rightmost on ties:
    // the deque holds strictly increasing hashes; >= pops keep the
    // later index on equal values
    val win = math.min(w, m)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    val sel = new java.util.ArrayList[Any](2 * m / (win + 1) + 2)
    var last = -1
    i = 0
    while (i < m) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != last) {
        last = deque(head)
        sel.add(new GenericInternalRow(Array[Any](last, h(last))): InternalRow)
      }
      i += 1
    }
    new GenericArrayData(sel.toArray)
  }

  def apply(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowedAnchors(ExpressionUtils.expression(text), k, w))
}
