// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-pattern occurrence counts of a fixed multi-pattern set over a
  * string — ONE Aho–Corasick (1975) walk of the text's UTF-8 bytes for
  * the whole set, instead of |patterns| regex/substring passes. Two
  * count modes:
  *
  *  - `boundary = false` (per-position): pattern p scores one hit for
  *    EVERY position i with substring(s, i, len(p)) = p (self-overlaps
  *    included — "aa" hits "aaa" twice), which is what the automaton's
  *    end-position emissions count, and what a DuckDB
  *    `substr(s, i, len(p)) = p` position scan counts.
  *  - `boundary = true` (word-boundary — the published C4 badwords
  *    rule): a hit additionally requires both neighbors of the match to
  *    be non-word or absent, word chars being ASCII [0-9A-Za-z_] (the
  *    regex \w class C4's `\b`-delimited badwords pattern uses), so
  *    "ass" never fires inside "class" but does after punctuation,
  *    start/end, or any non-ASCII code point. The check is byte-local:
  *    every word byte is single-byte ASCII and every byte of a
  *    multi-byte code point has the high bit set, so the byte test
  *    equals the code-point test and a DuckDB per-CHARACTER neighbor
  *    predicate replays it exactly.
  *
  * Matching is raw bytes: UTF-8 is self-synchronizing, so a pattern can
  * only match at code-point boundaries and byte equality is code-point
  * equality; case folding is the CALLER's job (pass `lower(text)` and
  * pre-lowered patterns). Result array aligns with the constructor's
  * pattern order. */
case class AcMatchCounts(child: Expression, patterns: Seq[String],
                         boundary: Boolean)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AcMatchCounts needs a non-empty pattern set of non-empty patterns")
  require(patterns.map(_.getBytes("UTF-8").length.toLong).sum <= AcMatchCounts.MaxPatternBytes,
    s"pattern set exceeds ${AcMatchCounts.MaxPatternBytes} total bytes — the " +
      "automaton serializes into every task's plan; split the list or match " +
      "via a corpus-side join instead")
  override def name: String = prettyName
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_match_counts"

  @transient private lazy val auto: AcMatchCounts.Automaton =
    AcMatchCounts.build(patterns)

  override def nullSafeEval(a: Any): Any =
    AcMatchCounts.compute(a.asInstanceOf[UTF8String], auto, boundary)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("auto", auto,
      "org.apache.spark.sql.graft.AcMatchCounts.Automaton")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.AcMatchCounts.compute($a, $ref, $boundary);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AcMatchCounts {
  def apply(text: org.apache.spark.sql.Column, patterns: Seq[String]): org.apache.spark.sql.Column =
    apply(text, patterns, boundary = false)

  def apply(text: org.apache.spark.sql.Column, patterns: Seq[String],
            boundary: Boolean): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      AcMatchCounts(org.apache.spark.sql.classic.ExpressionUtils.expression(text),
        patterns, boundary))

  /** Cap on the pattern set's total bytes: the built automaton is a plan
    * reference object shipped to every task (the UnigramViterbi.MaxPieces
    * contract shape). 1 MiB covers any real blocklist (C4's is ~5 KB)
    * with orders of magnitude to spare. */
  val MaxPatternBytes = 1L << 20

  /** Built Aho–Corasick automaton. Transitions live in one open-addressed
    * long→int table keyed (state << 8 | byte) — memory O(total pattern
    * bytes), no dense 256-way rows. `emits(s)` lists every pattern id
    * ending at state s INCLUDING via suffix (fail) links, precomputed so
    * the hot walk never chases fail chains for output. `patLens(p)` is
    * pattern p's byte length, used by boundary mode to locate the match
    * start from its emit position. */
  final class Automaton(val nPatterns: Int,
                        val fail: Array[Int],
                        val emits: Array[Array[Int]],
                        val patLens: Array[Int],
                        keys: Array[Long], vals: Array[Int]) extends Serializable {
    private val mask = keys.length - 1
    /** goto(state, byte) or -1. */
    def step(state: Int, b: Byte): Int = {
      val k = (state.toLong << 8) | (b & 0xffL)
      var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & mask)
      while (true) {
        val kk = keys(i)
        if (kk == k) return vals(i)
        if (kk == -1L) return -1
        i = (i + 1) & mask
      }
      -1
    }
  }

  def build(patterns: Seq[String]): Automaton = {
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
    // trie over bytes
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Byte, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { b =>
        s = children(s).getOrElseUpdate(b, {
          children += scala.collection.mutable.Map.empty[Byte, Int]
          ends += Nil
          children.length - 1
        })
      }
      ends(s) = pid :: ends(s)
    }
    val n = children.length
    // BFS fail links + emit accumulation (own endings + fail target's)
    val fail = new Array[Int](n)
    val emits = new Array[Array[Int]](n)
    emits(0) = ends(0).reverse.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).foreach { case (_, c) =>
      fail(c) = 0; emits(c) = ends(c).reverse.toArray; queue += c
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      children(s).foreach { case (b, c) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(b)) f = fail(f)
        fail(c) = children(f).get(b).filter(_ != c).getOrElse(0)
        emits(c) = (ends(c).reverse ++ emits(fail(c))).toArray
        queue += c
      }
    }
    // open-addressed transition table, load factor <= 0.5
    val nEdges = children.iterator.map(_.size).sum
    var cap = 16
    while (cap < nEdges * 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    children.zipWithIndex.foreach { case (m, s) =>
      m.foreach { case (b, c) =>
        val k = (s.toLong << 8) | (b & 0xffL)
        var i = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & mask)
        while (keys(i) != -1L) i = (i + 1) & mask
        keys(i) = k; vals(i) = c
      }
    }
    new Automaton(pats.length, fail, emits, pats.map(_.length), keys, vals)
  }

  /** ASCII word byte ([0-9A-Za-z_]) — the \w class of the C4 boundary
    * rule. Multi-byte UTF-8 bytes are negative, so they fall through
    * every range test to non-word, matching the per-code-point check. */
  private def isWordByte(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') ||
      (b >= 'a' && b <= 'z') || b == '_'

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, auto: Automaton, boundary: Boolean): ArrayData = {
    val out = new Array[Long](auto.nPatterns)
    val bytes = text.getBytes
    var state = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var next = auto.step(state, b)
      while (next == -1 && state != 0) {
        state = auto.fail(state)
        next = auto.step(state, b)
      }
      state = if (next == -1) 0 else next
      val em = auto.emits(state)
      var j = 0
      if (boundary) {
        val endOk = i == bytes.length - 1 || !isWordByte(bytes(i + 1))
        if (endOk) while (j < em.length) {
          val p = em(j)
          val start = i - auto.patLens(p) + 1
          if (start == 0 || !isWordByte(bytes(start - 1))) out(p) += 1L
          j += 1
        }
      } else while (j < em.length) { out(em(j)) += 1L; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}
