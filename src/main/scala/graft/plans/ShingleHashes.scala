// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Word-n-gram shingle hashes over a token array, fused into ONE codegen
  * loop: for each window of `n` tokens, hash the space-joined shingle
  * with the library's 32-bit token hash (first 4 bytes of MD5 —
  * TextFunctions.hash32Sql is the single semantic definition) and return
  * the `array<long>` the MinHash / SimHash / Jaccard operators consume.
  *
  * Semantically identical to
  * `transform(shingles(toks, n), expr_hash32)`, but that formulation
  * interprets three lambda layers per shingle (window transform,
  * concat_ws, md5+conv expression trees) on what is the map-side cost of
  * every dedup pass over the corpus. Here the windows are joined as raw
  * UTF-8 bytes (no intermediate strings) into a reused MessageDigest.
  *
  * `n = 1` degenerates to per-token hashing (the SimHash input).
  * Windows shorter than `n` yield an empty array (callers filter
  * `size(tokens) >= n`, same contract as shingles()).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(a: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. First 4 MD5 bytes,
    * big-endian unsigned — exactly `conv(substring(md5(s), 1, 8), 16, 10)`
    * and DuckDB's `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + k).getBytes)
        k += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(toks: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(toks), n))
}
