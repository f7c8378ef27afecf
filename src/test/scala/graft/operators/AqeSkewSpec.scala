package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** AQE runtime skew mitigation — the complement to the STATIC rewrite in
  * [[Skew.saltedJoin]]: when skew only shows up at runtime, AQE's
  * OptimizeSkewedJoin splits the oversized shuffle partition and
  * replicates the matching build partition, with no plan change in user
  * code. saltedJoin remains the tool for the case AQE cannot fix (a
  * single hot KEY too big for one reducer even after partition splits
  * can only be spread by salting the key itself); this spec pins that
  * the runtime path actually engages so the two mechanisms can be
  * reasoned about together at 100 TB. */
class AqeSkewSpec extends SparkSpecBase {

  test("AQE splits the skewed partition of a hot-key shuffle join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // 90% of probe rows share one key; build is uniform, 1 row per key
    val probe = s.range(300000).select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
      col("id").as("p"))
    val build = s.range(1000).select(col("id").as("k"), (col("id") + 5).as("b"))

    val j = probe.join(build, "k")
    // materialize THIS DataFrame so AQE finalizes its own adaptive plan
    // (count() would execute a different query and leave it unfinalized)
    assert(j.collect().length == 300000, "every probe row has exactly one match")
    val plan = j.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("skew=true"),
      s"AQE should mark the skewed join, got:\n${plan.take(2000)}")
  }
}
