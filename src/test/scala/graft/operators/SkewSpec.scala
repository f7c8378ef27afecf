package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin equals the plain join on a hot-key fixture") {
    // 90% of probe rows share one hot key — the shape that funnels a
    // plain shuffle join through a single reducer
    val probe = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        (col("id") * 3).as("payload"))
    val build = spark.range(100).select(col("id").as("k"), (col("id") + 1000).as("attr"))

    val plain = probe.join(build, "k").select("id", "payload", "attr")
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(probe, build, "k", col("id"), factor = 8)
      .select("id", "payload", "attr").as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedJoin spreads a hot key over `factor` shuffle partitions") {
    val probe = spark.range(8000).select(col("id"), lit(1L).as("k"))
    val build = Seq((1L, "hot")).toDF("k", "attr")
    // with salting the hot key's probe rows hash on (k, salt): count the
    // distinct salts actually produced — all 8 buckets must be hit
    val salts = probe.withColumn("__salt", pmod(col("id"), lit(8L)))
      .select(countDistinct("__salt")).head().getLong(0)
    assert(salts == 8)
    // and the join still yields exactly one match per probe row
    assert(Skew.saltedJoin(probe, build, "k", col("id"), 8).count() == 8000)
  }

  test("left joins preserve unmatched probe rows") {
    val probe = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .withColumn("rid", monotonically_increasing_id())
    val build = Seq((1L, "a"), (1L, "b")).toDF("k", "attr")
    val out = Skew.saltedJoin(probe, build, "k", col("rid"), 4, "left")
    assert(out.count() == 4) // k=1 matches twice, k=2/3 survive unmatched
    assert(out.filter(col("attr").isNull).count() == 2)
  }
}
