// Same packaging rationale as FloatVecDot.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UserDefinedExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** All `numHashes` MinHash signature values in ONE codegen pass over the
  * pre-hashed shingle array: sig_j = min over h of (A_j·h + B_j) mod P,
  * seeded with P for the empty array — coefficients shared with the
  * DuckDB oracle via TextFunctions.minhashA/minhashB/MinhashP; k×n
  * multiply-adds in a tight loop instead of k interpreted lambda folds.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with UserDefinedExpression {
  // UserDefinedExpression marks this NON-CHEAP for CollapseProject: a
  // multi-referenced alias of this expression must stay materialized in
  // its own projection instead of being inlined (= re-evaluated) into
  // every consumer -- inlining turned one dfield lookup into 34 in the
  // full-workflow plan and dominated its runtime
  override def name: String = prettyName


  import graft.functions.TextFunctions.{minhashA, minhashB, MinhashP}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sigs = Array.fill(numHashes)(MinhashP)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (minhashA(j) * h + minhashB(j)) % MinhashP
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sigs = ctx.freshName("sigs")
      val as = ctx.freshName("as")
      val bs = ctx.freshName("bs")
      val aInit = (0 until numHashes).map(j => s"${minhashA(j)}L").mkString(", ")
      val bInit = (0 until numHashes).map(j => s"${minhashB(j)}L").mkString(", ")
      s"""
         |long[] $sigs = new long[$numHashes];
         |long[] $as = new long[] { $aInit };
         |long[] $bs = new long[] { $bInit };
         |java.util.Arrays.fill($sigs, ${MinhashP}L);
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($as[$j] * $h + $bs[$j]) % ${MinhashP}L;
         |    if ($v < $sigs[$j]) $sigs[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  def apply(hashes: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSigs(ExpressionUtils.expression(hashes), numHashes))
}
