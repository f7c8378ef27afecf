// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 byte-level alphabet map (Radford et al. 2019; the
  * `bytes_to_unicode` trick in the public GPT-2 encoder): each UTF-8
  * byte `b` of the input rewrites to the single BMP code point
  * `0x100 + b`, so ANY string — any script, any emoji, malformed
  * bytes included — becomes a sequence over a CLOSED 256-symbol
  * alphabet of printable one-char symbols. A tokenizer fit over this
  * alphabet needs no unk token: the 256 single-byte symbols cover
  * every possible input, and merges only ever join them. The offset
  * keeps symbols clear of ASCII (no collision with `Tokenizer.Sep`
  * = 0x1F) and makes every symbol exactly one char, so the packed-
  * symbol machinery (`regexp_replace (.)` split, greedy fold, code-
  * point lengths) works unchanged. [[ByteAlpha.decode]] inverts it
  * exactly (round-trip spec-pinned in BpeSpec). Map-only in-row
  * column algebra; output is ≤ 2 UTF-8 bytes per input byte. */
case class ByteAlpha(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "byte_alpha"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(ByteAlpha.encode(s.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
            org.apache.spark.sql.graft.ByteAlpha.encode($s.getBytes()));""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteAlpha {
  /** bytes → one char per byte at code point 0x100 + b. */
  def encode(b: Array[Byte]): String = {
    val out = new Array[Char](b.length)
    var i = 0
    while (i < b.length) { out(i) = (0x100 + (b(i) & 0xFF)).toChar; i += 1 }
    new String(out)
  }

  def encode(s: String): String =
    encode(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Exact inverse of [[encode]]: chars in [0x100, 0x200) → bytes →
    * UTF-8 string. Throws on out-of-alphabet chars — a decode of
    * anything but concatenated byte-level tokens is a caller bug. */
  def decode(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      require(c >= 0x100 && c < 0x200, s"not a byte-alphabet char: ${c.toInt}")
      out(i) = (c - 0x100).toByte
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  def apply(s: Column): Column =
    ExpressionUtils.column(ByteAlpha(ExpressionUtils.expression(s)))
}
