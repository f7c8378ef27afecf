package graft.sed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}

import graft.SparkSpecBase

/** Engine-wide plan-shape regression net: no driver-contract query may
  * plan a quadratic join. BroadcastNestedLoopJoin / CartesianProduct are
  * what Catalyst silently falls back to when a join loses its equality
  * key (e.g. a refactor breaks the bucketized range-join or LSH pair
  * rewrites) — correct on test data, dead at 100 TB. Streaming entries
  * are excluded (they execute a full streaming query at build time and
  * their plans are asserted in SedStreamingSpec).
  *
  * Exception: the mean-offset queries cross-join a broadcast 1-row
  * global aggregate (DfOps.offsetByOtherColumns) — a BNLJ whose build
  * side is a single row is linear, not quadratic. Those queries are
  * allowed a nested-loop join ONLY while every condition-free join in
  * their optimized plan provably has a grouping-key-free Aggregate on
  * one side, so the allowance cannot mask a real lost-key regression. */
class PlanAuditSpec extends SparkSpecBase {

  private val skip =
    Set("q_stream_sessionize", "q_stream_enrich", "q_stream_hist", "q_stream_dedup")

  /** Queries whose only non-equi join is the broadcast 1-row mean. */
  private val oneRowBroadcastOk =
    Set("q_energy_offsets", "q_offset_mean", "q_tfidf", "q_lm_score",
      "q_domain_mix")

  private def crossJoinsAreOneRowAggregates(df: DataFrame): Boolean = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    joins.filter(_.condition.isEmpty).forall { j =>
      Seq(j.left, j.right).exists {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _            => false
      }
    }
  }

  test("no driver query plans BroadcastNestedLoopJoin or CartesianProduct") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => None
      case (name, fn) =>
        val df = fn(spark, Sf)
        val plan = df.queryExecution.executedPlan.toString
        val quadratic =
          plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
        if (!quadratic) None
        else if (oneRowBroadcastOk(name) && crossJoinsAreOneRowAggregates(df)) None
        else Some(name)
    }
    assert(offenders.isEmpty, s"quadratic join in: ${offenders.mkString(", ")}")
  }

  /** A ScalaUDF boxes its inputs and breaks whole-stage codegen at the
    * exact spot it runs — the library's answer to "needs custom logic"
    * is a native Expression (FloatVecDot, Bilinear2D, SimHash32,
    * BloomMightContainLong), never a UDF. Gate every contract plan so a
    * convenience UDF can't creep back into a hot path. */
  test("no driver query plans a ScalaUDF") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => None
      case (name, fn) =>
        val plan = fn(spark, Sf).queryExecution.executedPlan
        val hasUdf = plan.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])))
        if (hasUdf) Some(name) else None
    }
    assert(offenders.isEmpty, s"ScalaUDF in: ${offenders.mkString(", ")}")
  }
}
