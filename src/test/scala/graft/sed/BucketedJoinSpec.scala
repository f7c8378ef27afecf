package graft.sed

import graft.SparkSpecBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketed-write co-location — the SURVEY §4 answer to a fact-fact join
  * that repeats every batch: pay the shuffle ONCE at write time
  * (bucketBy on the join key), then every subsequent join of the two
  * tables is exchange-free because both sides already hash-partition the
  * same way. At 100 TB this converts the recurring dominant cost of a
  * pipeline that joins the same keys daily into a one-time layout cost. */
class BucketedJoinSpec extends SparkSpecBase {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    plan.collect { case e: ShuffleExchangeExec => e }.size
  }

  test("joining two tables bucketed on the key plans zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS graft_buck_facts")
    spark.sql("DROP TABLE IF EXISTS graft_buck_dims")
    try {
      spark.range(20000)
        .select((col("id") % 997).as("k"), (col("id") * 3).as("va"))
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_buck_facts")
      spark.range(997)
        .select(col("id").as("k"), (col("id") + 5).as("vb"))
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_buck_dims")

      val a = spark.table("graft_buck_facts")
      val b = spark.table("graft_buck_dims")
      // forbid broadcast so the test exercises the co-located shuffle path
      val j = a.hint("SHUFFLE_MERGE").join(b, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("vb").as("s"))

      assert(shuffles(j) == 0,
        "bucketed join + same-key agg must be exchange-free end to end")
      val joinOnly = a.hint("SHUFFLE_MERGE").join(b, "k").select("k", "va", "vb")
      assert(shuffles(joinOnly) == 0, "bucket-co-located join must be exchange-free")
      assert(a.join(b, "k").count() == 20000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_buck_facts")
      spark.sql("DROP TABLE IF EXISTS graft_buck_dims")
    }
  }
}
