package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the tool for the case AQE's skew
  * handling cannot fix alone: a join key whose hot values each exceed a
  * single reducer's capacity while BOTH sides are too large to broadcast.
  *
  * `saltedJoin` spreads every key over `factor` reducers: the probe side
  * gets a deterministic salt in [0, factor) from a high-entropy column
  * (row id, offset — anything uniform per row), the build side is
  * replicated into all `factor` salt values, and the join runs on
  * (key, salt). Hot-key rows land on `factor` reducers instead of one;
  * the build side pays `factor`× replication, so pick the SMALLER side
  * to replicate and a factor ~ hot-key-rows / target-partition-rows.
  *
  * Equivalent to the plain equi-join row-for-row (spec-asserted and
  * oracle-checked in the driver contract): every (l, r) key match shares
  * exactly one salt value.
  */
object Skew {

  /** Equi-join `probe` ⋈ `build` on `key`, salting the shuffle `factor`
    * ways. `saltSource` must be a per-row column of `probe` with uniform
    * low-order bits (an id/offset column); `build` rows are replicated
    * into every salt bucket. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltSource: Column, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salted = probe.withColumn("__salt", pmod(saltSource.cast("long"), lit(factor.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
