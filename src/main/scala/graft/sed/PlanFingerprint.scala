package graft.sed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Canonical physical-plan fingerprint for the plan-stability gate: the
  * operator tree's class shape, join strategies + join types, and the
  * exchange count — the properties whose silent drift (a BHJ quietly
  * becoming a SMJ, an extra shuffle slipping into a chain) costs real
  * money at 100 TB while sf0.1 wall-clock medians hide it. Built from
  * the INITIAL executed plan (post-EnsureRequirements, so every
  * exchange is visible, but BEFORE any AQE runtime re-planning), so the
  * fingerprint is deterministic for fixed testdata. Literals, paths,
  * stats and expression ids are all excluded by construction — only
  * node classes (plus join type) enter the string. */
object PlanFingerprint {
  def of(df: DataFrame): String = ofPlan(df.queryExecution.executedPlan)

  /** Fingerprint an already-resolved physical plan — the entry point for
    * streaming micro-batch plans (StreamPlan.lastExecutedPlan), which
    * never pass through a DataFrame. */
  def ofPlan(plan: SparkPlan): String = {
    def walk(p: SparkPlan): String = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.initialPlan)
      case _ =>
        val label = p.getClass.getSimpleName.stripSuffix("Exec") + (p match {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => ":" + j.joinType
          case _ => ""
        })
        val kids = p.children.map(walk)
        if (kids.isEmpty) label else label + "(" + kids.mkString(",") + ")"
    }
    val tree = walk(plan)
    val nEx = "Exchange".r.findAllIn(tree).length
    s"ex=$nEx|$tree"
  }

  /** Short content hash of [[of]] — the per-entry value BENCH_LOCAL.json
    * carries so cross-round plan drift is visible in the artifact. */
  def hash(df: DataFrame): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(of(df).getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
}
