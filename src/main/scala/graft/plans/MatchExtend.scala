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
  /** UTF-8 length of the code point led by byte `b`. */
  private def cpLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else 4

  /** Byte offset of code point `cpIdx` (walks lead bytes; may equal
    * numBytes when the index lands exactly at the end; -1 past-end). */
  private def byteOffsetOf(s: UTF8String, cpIdx: Int): Int = {
    val n = s.numBytes
    var off = 0
    var i = 0
    while (i < cpIdx) {
      if (off >= n) return -1
      off += cpLen(s.getByte(off))
      i += 1
    }
    if (off > n) -1 else off
  }

  /** Shared by interpreted eval and generated code. Null = anchor grams
    * differ (hash collision) or offsets out of range. Offsets are CODE
    * POINTS (the WinnowedAnchors / CharGramHashes60 / SQL substring
    * coordinate system — astral-plane chars count once, and span edges
    * can never split a surrogate pair). The walk happens directly on
    * the UTF-8 BYTES via `getByte` — zero allocation per call (a
    * per-pair decode to a code-point array measured 2× slower on the
    * 100× anchored receipt): code points are equal iff their byte
    * sequences are, and both cursors only ever rest on code-point
    * boundaries, so byte comparison is code-point-exact. */
  def compute(aText: UTF8String, aPosL: Long, bText: UTF8String,
              bPosL: Long, k: Int): GenericArrayData = {
    val aPos = aPosL.toInt
    val bPos = bPosL.toInt
    if (aPos < 0 || bPos < 0) return null
    val an = aText.numBytes
    val bn = bText.numBytes
    val aOff = byteOffsetOf(aText, aPos)
    val bOff = byteOffsetOf(bText, bPos)
    if (aOff < 0 || bOff < 0) return null
    // verify the k anchor code points byte-for-byte
    var ai = aOff
    var bi = bOff
    var cnt = 0
    while (cnt < k) {
      if (ai >= an || bi >= bn) return null
      val la = cpLen(aText.getByte(ai))
      if (bi + la > bn || ai + la > an) return null
      var j = 0
      while (j < la) {
        if (aText.getByte(ai + j) != bText.getByte(bi + j)) return null
        j += 1
      }
      ai += la; bi += la; cnt += 1
    }
    // right extension: whole code points while bytes keep matching
    var r = 0
    var matching = true
    while (matching && ai < an && bi < bn) {
      val la = cpLen(aText.getByte(ai))
      if (ai + la > an || bi + la > bn) matching = false
      else {
        var j = 0
        while (matching && j < la) {
          if (aText.getByte(ai + j) != bText.getByte(bi + j)) matching = false
          j += 1
        }
        if (matching) { ai += la; bi += la; r += 1 }
      }
    }
    // left extension: step back one code point at a time (continuation
    // bytes are 0b10xxxxxx), compare whole code points
    var l = 0
    var al = aOff
    var bl = bOff
    matching = true
    while (matching && al > 0 && bl > 0) {
      var ap = al - 1
      while (ap > 0 && (aText.getByte(ap) & 0xC0) == 0x80) ap -= 1
      var bp = bl - 1
      while (bp > 0 && (bText.getByte(bp) & 0xC0) == 0x80) bp -= 1
      if (al - ap != bl - bp) matching = false
      else {
        var j = 0
        val w = al - ap
        while (matching && j < w) {
          if (aText.getByte(ap + j) != bText.getByte(bp + j)) matching = false
          j += 1
        }
        if (matching) { al = ap; bl = bp; l += 1 }
      }
    }
    new GenericArrayData(Array((bPos - l).toLong, (bPos + k + r).toLong))
  }

  def apply(aText: Column, aPos: Column, bText: Column, bPos: Column, k: Int): Column =
    ExpressionUtils.column(MatchExtend(
      ExpressionUtils.expression(aText), ExpressionUtils.expression(aPos),
      ExpressionUtils.expression(bText), ExpressionUtils.expression(bPos), k))
}
