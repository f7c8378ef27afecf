package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** Straightforward per-bit reference interleave. */
  private def ref(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (bit <- 0 until bits; (v, ci) <- vals.zipWithIndex)
      z |= ((v >> bit) & 1L) << (bit * vals.size + ci)
    z
  }

  test("zorderKey matches the reference interleave and is bijective on the bit domain") {
    val df = spark.range(4096).select(
      (col("id") * 2654435761L % 1024).as("x"),
      (col("id") * 40503L % 1024).as("y"))
    val got = df.select(col("x"), col("y"),
        Layout.zorderKey(Seq(col("x"), col("y")), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(Seq(x, y), 10), s"($x, $y)")
    }
    // interleaving is injective: distinct z == distinct (x, y)
    assert(got.map(_._3).distinct.length == got.map(t => (t._1, t._2)).distinct.length)
  }

  test("aligned 2^k tiles map to one contiguous z range (the locality property)") {
    // every 16x16 aligned tile must land in exactly [base, base + 255]:
    // that contiguity is what makes file min/max stats selective on both
    // interleaved dimensions after a z-sorted write
    val df = spark.range(200000).select(
      (col("id") * 7919L % 1024).as("x"),
      (col("id") * 104729L % 1024).as("y"))
    val tiles = df.select(
        (col("x") / 16).cast("long").as("tx"), (col("y") / 16).cast("long").as("ty"),
        Layout.zorderKey(Seq(col("x"), col("y")), 10).as("z"))
      .groupBy("tx", "ty").agg(min("z").as("zmin"), max("z").as("zmax"))
      .as[(Long, Long, Long, Long)].collect()
    assert(tiles.nonEmpty)
    tiles.foreach { case (tx, ty, zmin, zmax) =>
      val base = ref(Seq(tx * 16, ty * 16), 10)
      assert(zmin >= base && zmax <= base + 255,
        s"tile ($tx, $ty): [$zmin, $zmax] outside [$base, ${base + 255}]")
    }
  }

  test("three-way interleave and out-of-range masking") {
    val df = Seq((5L, 2L, 7L), (1030L, 1L, 0L)).toDF("a", "b", "c")
    val got = df.select(Layout.zorderKey(Seq(col("a"), col("b"), col("c")), 10))
      .as[Long].collect()
    assert(got(0) == ref(Seq(5L, 2L, 7L), 10))
    // 1030 = 1024 + 6: bits above the declared width are masked off, so
    // the key equals the in-range value 6 instead of colliding elsewhere
    assert(got(1) == ref(Seq(6L, 1L, 0L), 10))
  }

  test("parquet min/max stats prune more row groups under z than lex layout") {
    // The real claim behind Layout: after a z-sorted write, footer
    // min/max statistics are selective on BOTH dimensions, so a 2-D box
    // predicate intersects fewer row groups than under a lexicographic
    // (value, user_id) sort at the same file count. Counted from the
    // actual parquet footers, same logic LayoutBench runs at 100x.
    //
    // Regime matters: lex prunes on the FIRST dimension only, so its
    // cost floor is one full stripe of files per box (boxFraction *
    // files). Z wins once files >> stripes-per-box — the many-files
    // regime a 100 TB store lives in — so the spec uses 64 files with
    // boxes 1/8 of each dim: lex must touch ~8 files/box, z a ~2-tile
    // neighborhood.
    val dir = java.nio.file.Files.createTempDirectory("zspec").toString
    val df = spark.range(400000).select(
      (col("id") * 7919L % 561).cast("double").as("value"),
      (col("id") * 104729L % 1501).as("user_id"))
    val bx = least(floor(col("value")).cast("long"), lit(1023L))
    val by = least(floor(col("user_id") / 2).cast("long"), lit(1023L))
    Layout.zOrdered(df, Seq(bx, by), 10, 64)
      .write.mode("overwrite").parquet(s"$dir/z")
    df.repartitionByRange(64, col("value"), col("user_id"))
      .sortWithinPartitions("value", "user_id")
      .write.mode("overwrite").parquet(s"$dir/lex")

    // 2-D boxes, each 1/8 of either dim (1/64 selectivity)
    val boxes = for (i <- 0 until 4; j <- 0 until 2)
      yield (i * 140.0 + 10, i * 140.0 + 80, j * 750L + 40, j * 750L + 227)
    def survivors(path: String): Long = {
      val stats = graft.LayoutBench.rowGroupStats(path)
      boxes.map { case (v0, v1, u0, u1) =>
        stats.map(_._2.count { case (vMin, vMax, uMin, uMax, _) =>
          vMax >= v0 && vMin <= v1 && uMax >= u0 && uMin <= u1
        }.toLong).sum
      }.sum
    }
    val z = survivors(s"$dir/z")
    val lex = survivors(s"$dir/lex")
    // lex pays a full value-stripe per box (~8 files + boundary); z pays
    // a 2-D tile neighborhood (~4-5 of 64). The gap widens with file
    // count (LayoutBench at 256 files: 4 vs 13); at 64 files the
    // guaranteed structural margin is ~2x — gate at 0.7 with the data
    // deterministic (measured 37 vs 72).
    assert(z < lex * 7 / 10, s"z row-group survivors $z not < 0.7*lex ($lex)")
  }

  test("a z-sorted write clusters both dimensions into few files") {
    // write the same data z-sorted and x-sorted; a selective filter on y
    // must prune more row groups under the z layout. Proxy (local FS):
    // per-output-partition y-ranges are narrow under z, full-width under x.
    val df = spark.range(100000).select(
      (col("id") * 7919L % 1024).as("x"), (col("id") * 104729L % 1024).as("y"))
    val z = df.withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), 10))
      .repartitionByRange(16, col("z"))
      .select(spark_partition_id().as("p"), col("y"))
      .groupBy("p").agg((max("y") - min("y")).as("spread"))
      .agg(avg("spread")).as[Double].head()
    val lex = df.repartitionByRange(16, col("x"))
      .select(spark_partition_id().as("p"), col("y"))
      .groupBy("p").agg((max("y") - min("y")).as("spread"))
      .agg(avg("spread")).as[Double].head()
    assert(z < lex * 0.5,
      s"z-layout y-spread $z should be well under lexicographic $lex")
  }
}
