// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-position 60-bit md5-prefix hashes of every k-CHAR gram of a
  * string, fused into ONE native loop — bit-identical to
  * `transform(sequence(0, length(s)-k), i ->
  *   CAST(conv(substring(md5(CAST(substring(s, i+1, k) AS BINARY)), 1, 15), 16, 10) AS BIGINT))`
  * and to DuckDB's `('0x' || substr(md5(substr(s, i, k)), 1, 15))::BIGINT`,
  * but without the interpreted higher-order-function lambda that
  * re-built substring/cast/md5/conv expression trees per position
  * (measured 3.4× on the q_substring_dedup entry). Character offsets
  * are CODE POINTS (UTF8String semantics, = SQL substring = DuckDB
  * substr): the string's bytes are walked once to index each code
  * point's byte offset, then every gram is one byte-slice digest on a
  * reused ThreadLocal MessageDigest. Shorter-than-k strings yield an
  * empty array (callers filter `length >= k`). */
case class CharGramHashes60(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(k >= 1, "gram width must be >= 1")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes60"

  override def nullSafeEval(a: Any): Any =
    CharGramHashes60.compute(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.CharGramHashes60.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramHashes60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Number of UTF-8 bytes in the code point starting with byte `b`. */
  private def cpLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else 4

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point byte offsets (one pass); offsets(n) == bytes.length
    var n = 0
    var off = 0
    val offsets = new Array[Int](bytes.length + 1)
    while (off < bytes.length) {
      offsets(n) = off
      off += cpLen(bytes(off))
      n += 1
    }
    offsets(n) = bytes.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      val d = md.digest()
      // first 15 hex digits = first 7 bytes + the high nibble of byte 7
      var h = 0L
      var q = 0
      while (q < 7) { h = (h << 8) | (d(q) & 0xffL); q += 1 }
      out(i) = (h << 4) | ((d(7) & 0xffL) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, k: Int): Column =
    ExpressionUtils.column(CharGramHashes60(ExpressionUtils.expression(text), k))
}
