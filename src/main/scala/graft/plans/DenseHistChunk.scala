// Same packaging rationale as FloatVecDot.scala: Catalyst's aggregate
// plumbing (ExpressionUtils, TypedImperativeAggregate internals) is
// private[sql], so the expression lives under org.apache.spark.sql.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Dense per-chunk histogram partial aggregate: counts `chunkSize` bin
  * offsets into ONE flat `Array[Long]` buffer — array indexing instead of
  * one hash-map entry per distinct bin tuple, which is what makes dense
  * (bins ≈ rows) histogram regimes cheap (the reference gets the same
  * effect from per-partition numba `histogramdd` + tree-reduce,
  * /root/reference/src/sed/binning/numba_bin.py:104 numba_histogramdd).
  *
  * Used by [[graft.operators.Binning]] grouped by a chunk id (flat bin key
  * >> log2(chunkSize)), so one partial-agg row per (task, non-empty chunk)
  * reaches the shuffle — never one row per distinct bin tuple — and the
  * merge work spreads over reducers instead of funnelling into one.
  *
  * Serialization is adaptive: mostly-empty chunks (boundary tasks, sparse
  * data that slipped under the dense threshold) ship as (offset, count)
  * pairs, dense ones as the raw long array.
  */
case class DenseHistChunk(
    child: Expression,
    chunkSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(chunkSize > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "dense_hist_chunk"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](chunkSize)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(v.asInstanceOf[Long].toInt) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < chunkSize) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < chunkSize) { if (buf(i) != 0L) nz += 1; i += 1 }
    // sparse entry = 12 bytes vs dense 8: pairs win below 2/3 occupancy
    if (nz.toLong * 12 < chunkSize.toLong * 8) {
      val bb = ByteBuffer.allocate(4 + nz * 12)
      bb.putInt(nz)
      i = 0
      while (i < chunkSize) {
        if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
        i += 1
      }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(4 + chunkSize * 8)
      bb.putInt(-1)
      i = 0
      while (i < chunkSize) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val tag = bb.getInt
    val out = new Array[Long](chunkSize)
    if (tag == -1) {
      var i = 0
      while (i < chunkSize) { out(i) = bb.getLong; i += 1 }
    } else {
      var n = 0
      while (n < tag) { val idx = bb.getInt; out(idx) = bb.getLong; n += 1 }
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DenseHistChunk =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DenseHistChunk =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DenseHistChunk =
    copy(child = newChild)
}

object DenseHistChunk {
  /** Aggregate Column: dense count array (length `chunkSize`) of the
    * in-chunk offsets in `off`. */
  def apply(off: Column, chunkSize: Int): Column =
    ExpressionUtils.column(
      DenseHistChunk(ExpressionUtils.expression(off), chunkSize).toAggregateExpression())
}
