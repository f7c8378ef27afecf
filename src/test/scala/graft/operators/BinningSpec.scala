package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BinningSpec extends SparkSpecBase {
  import spark.implicits._

  test("histogram matches a driver-side reference count (numpy edge semantics)") {
    val ax = BinAxis("value", 10, 0.0, 500.0)
    val got = Binning.histogram(events, Seq(ax))
      .select("value_bin", "cnt").as[(Long, Long)].collect().toMap
    val vals = events.select("value").as[Double].collect()
    val exp = vals.filter(v => v >= 0.0 && v <= 500.0)
      .groupBy(v => math.min(math.floor(v / 50.0).toLong, 9L))
      .view.mapValues(_.length.toLong).toMap
    assert(got == exp)
  }

  test("right edge falls into the last bin") {
    val ax = BinAxis("v", 4, 0.0, 4.0)
    val got = Binning.histogram(Seq(0.0, 1.0, 4.0, 3.9999).toDF("v"), Seq(ax))
      .select("v_bin", "cnt").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 3L -> 2L))
  }

  test("out-of-range rows are dropped") {
    val ax = BinAxis("v", 2, 0.0, 2.0)
    val got = Binning.histogram(Seq(-0.1, 0.5, 2.1).toDF("v"), Seq(ax))
      .agg(sum("cnt")).as[Long].head()
    assert(got == 1L)
  }

  test("bin centers are lo + (i+0.5)*step") {
    val ax = BinAxis("v", 4, 0.0, 8.0)
    val got = Binning.withCenters(
      Binning.histogram(Seq(1.0, 3.0).toDF("v"), Seq(ax)), Seq(ax))
      .select("v_bin", "v_center").as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 1.0, 1L -> 3.0))
  }

  test("histogramEdges: non-uniform edges, [e_i,e_{i+1}) with closed last bin") {
    val edges = Array(0.0, 1.0, 10.0, 100.0)
    val ax = EdgeAxis("v", edges)
    val data = Seq(-0.5, 0.0, 0.99, 1.0, 9.99, 10.0, 99.0, 100.0, 100.1)
    val got = Binning.histogramEdges(data.toDF("v"), Seq(ax))
      .select("v_bin", "cnt").as[(Long, Long)].collect().toMap
    // -0.5,100.1 dropped; [0,1):2, [1,10):2, [10,100]:3
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 3L))
  }

  test("histogramEdges drops NaN and null values") {
    val ax = EdgeAxis("v", Array(0.0, 1.0, 2.0))
    val df = Seq(Some(0.5), Some(Double.NaN), None, Some(1.5)).toDF("v")
    val got = Binning.histogramEdges(df, Seq(ax))
      .select("v_bin", "cnt").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L))
  }

  test("histogramEdges matches the uniform histogram when edges are uniform") {
    val uni = BinAxis("value", 10, 0.0, 500.0)
    val edges = EdgeAxis("value", Array.tabulate(11)(_ * 50.0))
    val a = Binning.histogram(events, Seq(uni)).select("value_bin", "cnt")
      .as[(Long, Long)].collect().toMap
    val b = Binning.histogramEdges(events, Seq(edges)).select("value_bin", "cnt")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("normalizedHistogram divides by the per-bin normalization") {
    val ax = BinAxis("value", 5, 0.0, 500.0)
    val out = Binning.normalizedHistogram(events, events, Seq(ax), ax)
    val bad = out.filter(col("intensity") =!= col("cnt") / col("norm_cnt")).count()
    assert(bad == 0)
    // normalizing a df by itself -> intensity 1 everywhere
    assert(out.filter(col("intensity") =!= 1.0).count() == 0)
  }

  test("chunkBits: enough chunks for reduce parallelism, under the agg fallback threshold") {
    // 10^4-bin histogram, 32-way parallelism, default threshold 128:
    // chunk count must be >= parallelism (no single-reducer funnel) and
    // < threshold (no sort-based fallback)
    val total = 10000L
    val bits = Binning.chunkBits(total, 32, 128)
    val chunks = (total + (1L << bits) - 1) >> bits
    assert(chunks >= 32, s"only $chunks chunks at bits=$bits")
    assert(chunks < 128, s"$chunks chunks would trip the 128-group fallback")
    // dense 4M-bin cube: chunk arrays capped at 2^16 longs (512 KB)
    assert(Binning.chunkBits(1L << 22, 32, 128) <= 16)
    // a raised threshold may unlock more chunks but must never be exceeded
    val b2 = Binning.chunkBits(1L << 22, 1024, 65536)
    assert(((1L << 22) >> b2) < 65536)
    assert(((1L << 22) >> b2) >= 64)
  }

  test("building and running a histogram never mutates session confs") {
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.getOption(fbKey)
    // dense-chunk regime: 50*50*20 = 50000 bins > MinDenseBins
    val axes = Seq(BinAxis("value", 50, 0.0, 500.0), BinAxis("user_id", 50, 0.0, 150.0),
      BinAxis("m", 20, 0.0, 97.0))
    val df = events.withColumn("m", ($"event_id" % 97).cast("double"))
    val hist = Binning.histogram(df, axes)
    assert(spark.conf.getOption(fbKey) == before, "conf mutated at plan-build time")
    val total = hist.agg(sum("cnt")).as[Long].head()
    val expected = df.filter($"value".between(0, 500) && $"user_id".between(0, 150)).count()
    assert(total == expected)
    assert(spark.conf.getOption(fbKey) == before, "conf mutated at execution time")
  }

  test("dense path is skipped when 2^16-wide chunks would trip the agg fallback") {
    // boundary algebra: default threshold 128 caps the dense regime at
    // ~120 * 2^16 bins regardless of how high denseMaxBins is raised
    assert(Binning.denseViable(1L << 22, 128))
    assert(!Binning.denseViable(1L << 24, 128)) // 256 chunks > 120
    assert(Binning.denseViable(1L << 24, 1024)) // raised threshold unlocks it
    // functional: denseMaxBins raised past threshold*2^16 must fall through
    // to the sparse flat-key plan (not ship a sort-fallback dense plan)
    val denseHist = Binning.histogram(
      events.withColumn("m", ($"event_id" % 97).cast("double")),
      Seq(BinAxis("value", 50, 0.0, 500.0), BinAxis("user_id", 50, 0.0, 150.0),
        BinAxis("m", 20, 0.0, 97.0)))
    assert(denseHist.queryExecution.executedPlan.toString
      .toLowerCase.contains("dense_hist_chunk"), "sanity: dense regime uses the chunk aggregate")
    val s2 = spark.newSession()
    s2.conf.set(Binning.DenseMaxBinsKey, (1L << 26).toString)
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(2000)((rnd.nextDouble() * 100, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val df = s2.createDataFrame(data).toDF("a", "b", "c")
    val axes = Seq(BinAxis("a", 300, 0.0, 100.0), BinAxis("b", 300, 0.0, 100.0),
      BinAxis("c", 300, 0.0, 100.0)) // 2.7e7 bins: <= denseMaxBins, not denseViable
    val hist = Binning.histogram(df, axes)
    assert(!hist.queryExecution.executedPlan.toString.toLowerCase.contains("dense_hist_chunk"),
      "plan must fall through to the sparse flat-key path")
    assert(hist.agg(sum("cnt")).head().getLong(0) == 2000L)
  }

  test("dense-chunk and sparse flat-key paths agree on random shapes") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 3) {
      // product > 4096 -> dense regime by default; values straddle the
      // range so the NULL-key drop is exercised on both paths
      val n1 = 70 + rnd.nextInt(60); val n2 = 70 + rnd.nextInt(60)
      val data = Seq.fill(5000)((rnd.nextDouble() * 120.0 - 10.0, rnd.nextDouble() * 120.0 - 10.0))
      val axes = Seq(BinAxis("a", n1, 0.0, 100.0), BinAxis("b", n2, 0.0, 100.0))
      val dense = Binning.histogram(data.toDF("a", "b"), axes)
        .as[(Long, Long, Long)].collect().toSet
      // independent session with the dense path disabled -> sparse flat key
      val s2 = spark.newSession()
      s2.conf.set(Binning.DenseMaxBinsKey, "1")
      val df2 = s2.createDataFrame(data).toDF("a", "b")
      val sparse = Binning.histogram(df2, axes)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(dense == sparse, s"paths disagree for ${n1}x$n2")
      assert(dense.nonEmpty)
    }
  }

  test("range drop is NOT pushed through an expensive transform chain") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // chain: dfield bilinear (marked UserDefinedExpression) -> derived axis
    val grid = Array.tabulate(64)(i => (i / 8).toDouble) // 8x8
    val df = events
      .withColumn("xi", $"value" * (7.0 / 500.0))
      .withColumn("yi", $"user_id".cast("double") * (7.0 / 150.0))
      .withColumn("xc", org.apache.spark.sql.graft.Bilinear2D($"xi", $"yi", grid, 8, 8))
      .withColumn("energy", $"xc" * 2.0 + 1.0)
    val hist = Binning.histogram(df, Seq(BinAxis("energy", 10, 0.0, 20.0)))
    val opt = hist.queryExecution.optimizedPlan
    val inFilters = opt.collect { case f: LFilter =>
      "bilinear2d".r.findAllMatchIn(f.condition.toString.toLowerCase).length
    }.sum
    assert(inFilters == 0, "range predicate was pushed into a Filter re-deriving the chain")
    val total = "bilinear2d".r.findAllMatchIn(opt.toString.toLowerCase).length
    assert(total == 1, s"dfield lookup duplicated $total times in the plan")
    // and the null-key drop is still numpy-correct
    val got = hist.agg(sum("cnt")).as[Long].head()
    val expected = df.filter($"energy".between(0.0, 20.0)).count()
    assert(got == expected)
  }

  test("3-d histogram total equals in-range row count") {
    val axes = Seq(BinAxis("value", 8, 0.0, 500.0), BinAxis("user_id", 8, 0.0, 150.0),
      BinAxis("m", 8, 0.0, 97.0))
    val df = events.withColumn("m", ($"event_id" % 97).cast("double"))
    val total = Binning.histogram(df, axes).agg(sum("cnt")).as[Long].head()
    val expected = df.filter($"value".between(0, 500) && $"user_id".between(0, 150)).count()
    assert(total == expected)
  }
}
