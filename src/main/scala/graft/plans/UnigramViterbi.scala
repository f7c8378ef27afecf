// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi-best unigram-LM segmentation of a word (Kudo 2018,
  * arXiv:1804.10959 — the SentencePiece unigram model): among all ways
  * to cut the word into vocabulary pieces, return the one maximizing the
  * summed piece log-probability. Scores are integer micro-units, so the
  * DP is exact and the argmax deterministic; ties prefer the LONGER
  * piece at each end position (the cascade makes the full tie-break
  * total). A position no piece covers falls back to a single character
  * at `unkLogpU` (the OOV floor), so every word is segmentable.
  *
  * In-row, no shuffle; cost O(word length × max piece length) via the
  * classic left-to-right DP. The pieces ride as a reference object
  * (hash map), shared by interpreted eval and generated code. */
case class UnigramViterbi(child: Expression, pieces: Map[String, Long],
                          unkLogpU: Long)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(pieces.size <= UnigramViterbi.MaxPieces,
    s"piece table has ${pieces.size} entries, over the " +
      s"${UnigramViterbi.MaxPieces} reference-object limit — the table " +
      "serializes into every task's plan; fit with a smaller vocabSize " +
      "or segment via a piece-table join instead")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val model: UnigramViterbi.Model =
    UnigramViterbi.Model(pieces, unkLogpU)

  override def nullSafeEval(a: Any): Any =
    UnigramViterbi.compute(a.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("model", model,
      "org.apache.spark.sql.graft.UnigramViterbi.Model")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.UnigramViterbi.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramViterbi {
  /** Hard cap on the piece-table size this expression will carry as a
    * plan reference object (the same contract shape as
    * Ann.MaxDefaultCentroids): the table serializes with the physical
    * plan into every task, so a SentencePiece-scale 1M-piece inventory
    * would ship tens of MB per stage. 250k pieces (~10 MB at typical
    * piece lengths) is well past every production unigram vocab that
    * makes sense to carry inline; beyond it, the fit should emit a
    * smaller vocabSize, or segmentation should run as a corpus-side
    * join against the piece table. UnigramSpec pins the boundary. */
  val MaxPieces = 250000

  /** Piece table in lookup form; maxLen bounds the DP's inner loop. */
  case class Model(pieces: Map[String, Long], unkLogpU: Long) {
    @transient lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max
  }

  /** Shared by interpreted eval and generated code. The DP walks CODE
    * POINTS (`offs` maps code-point index → UTF-16 offset), matching the
    * code-point semantics of Spark `substring` / DuckDB `substr` that
    * produced the piece inventory — an astral-plane character is one
    * symbol, never a split surrogate pair. */
  def compute(word: UTF8String, m: Model): ArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = w.codePointCount(0, w.length)
    val offs = new Array[Int](n + 1) // UTF-16 offset of code point i
    var ci = 0
    var ui = 0
    while (ci < n) { offs(ci) = ui; ui = w.offsetByCodePoints(ui, 1); ci += 1 }
    offs(n) = w.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = new Array[Int](n + 1) // chosen piece length (code points) ending at j
    best(0) = 0L
    var j = 1
    while (j <= n) {
      val lMax = math.min(j, m.maxLen)
      var l = 1
      while (l <= lMax) {
        if (best(j - l) != Long.MinValue) {
          val cost = m.pieces.get(w.substring(offs(j - l), offs(j))) match {
            case Some(lp) => lp
            case None     => if (l == 1) m.unkLogpU else Long.MinValue
          }
          if (cost != Long.MinValue) {
            val s = best(j - l) + cost
            // strict > plus ascending l: equal scores keep the LARGER l
            if (s > best(j) || (s == best(j) && l > back(j))) {
              best(j) = s; back(j) = l
            }
          }
        }
        l += 1
      }
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += w.substring(offs(p - back(p)), offs(p)); p -= back(p) }
    new GenericArrayData(out.reverseIterator.map(s =>
      UTF8String.fromString(s): Any).toArray)
  }

  def apply(word: Column, pieces: Map[String, Long], unkLogpU: Long): Column =
    ExpressionUtils.column(
      UnigramViterbi(ExpressionUtils.expression(word), pieces, unkLogpU))
}
