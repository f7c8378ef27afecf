// Same packaging rationale as FloatVecDot.scala — StreamingQueryWrapper
// and StreamExecution are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper

/** Access to a streaming query's LAST executed micro-batch plan — the
  * plan the plan-stability gate fingerprints for streaming entries
  * (batch entries fingerprint their DataFrame directly; a streaming
  * chain's plan only exists per micro-batch inside StreamExecution). */
object StreamPlan {
  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[SparkPlan] = q match {
    case w: StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
