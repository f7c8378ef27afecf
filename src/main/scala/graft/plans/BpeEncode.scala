// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE encoding of a token array with a FIXED ordered merge list
  * (Sennrich et al. 2016 apply_bpe): each word splits into characters,
  * then every merge (left, right) is applied in training order as one
  * greedy left-to-right pass over the word's symbols; the per-word
  * outputs concatenate in token order. This is the reference tokenizer
  * walker — `Tokenizer.bpeApplyTrained`'s vocab-join path must agree
  * with it on the training corpus (BpeSpec pins that equality, which is
  * also the empirical check of the greedy-fold argument in
  * `Tokenizer.Sep`'s doc). In-row, no shuffle; cost is
  * O(merges × word length) per token, the classic apply-BPE loop. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(a: Any): Any =
    BpeEncode.compute(a.asInstanceOf[ArrayData], mergeArr, byteLevel)

  // eval-only (CodegenFallback shape is avoided by funneling through the
  // static compute — the expression sits in a cold, |doc|-bounded
  // projection, never a corpus-wide hot loop; the hot path is the
  // vocab-join in bpeApplyTrained)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", mergeArr, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.BpeEncode.compute($a, $ref, $byteLevel);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, merges: Array[(String, String)],
              byteLevel: Boolean = false): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val w = toks.getUTF8String(t).toString
      // split by CODE POINT (= the fit's regex '(.)' split and DuckDB's
      // regexp_replace — astral-plane chars stay one symbol); byte-level
      // mode splits per UTF-8 BYTE over the ByteAlpha closed alphabet
      var syms: Array[String] =
        if (byteLevel) ByteAlpha.encode(w).toCharArray.map(_.toString)
        else w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      var m = 0
      while (m < merges.length && syms.length > 1) {
        val (l, r) = merges(m)
        // one greedy left-to-right pass: merge non-overlapping (l, r)
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += l + r; i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.toArray
        m += 1
      }
      syms.foreach(s => out += UTF8String.fromString(s))
      t += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def apply(toks: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncode(ExpressionUtils.expression(toks), merges))

  def apply(toks: Column, merges: Seq[(String, String)], byteLevel: Boolean): Column =
    ExpressionUtils.column(BpeEncode(ExpressionUtils.expression(toks), merges, byteLevel))
}
