package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.calibrate.MomentumCorrection
import graft.functions.SedFunctions
import graft.operators.BinAxis
import graft.sed.SedProcessor

/** Direct twin of the reference's WORKFLOW benchmarks (reference:
  * /root/reference/benchmarks/benchmark_sed.py:116 test_workflow_1d /
  * :152 test_workflow_4d; targets benchmark_targets.yaml — workflow_1d
  * 17.06 s, workflow_4d 21.42 s): the same 1e8-row in-memory dataframe
  * shape as BinBench, pushed through the FULL transform chain (jitter →
  * dfield momentum correction → k-axis calibration → energy correction →
  * TOF→energy axis → delay axis) and then binned; only the raw columns
  * are cached, so every timed run re-executes the whole chain + histogram
  * exactly like the reference's repeated `processor.compute` re-runs the
  * lazy Dask graph.
  *
  * Physics constants are representative mpes-order values — the cost is
  * in the operator chain (one whole-stage-codegen projection per event +
  * one aggregation), not in which constants feed it.
  *
  * Usage: sbt "runMain graft.WorkflowBench [nRows] [runs]"
  */
object WorkflowBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // benchmark_sed.py ranges; X/Y pre-scaled to 512-grid index units for
    // the deformation-field lookup (2048 detector px / 512 grid cells).
    // SPARK_GRAFT_STORAGE=MEMORY_AND_DISK swaps eviction for disk spill at
    // the 1e9-row scale probe, same valve as BinBench.
    val level =
      if (sys.env.get("SPARK_GRAFT_STORAGE").contains("MEMORY_AND_DISK"))
        StorageLevel.MEMORY_AND_DISK
      else StorageLevel.MEMORY_ONLY
    val gen = spark.range(0L, n, 1L, cpus.toInt * 2).select(
      col("id").as("rid"),
      (rand(42) * 512.0).as("x"),
      (rand(43) * 512.0).as("y"),
      (rand(44) * 60000.0 + 60000.0).as("tof"),
      (rand(45) * 18000.0 + 2000.0).as("adc"))
    // SPARK_GRAFT_SOURCE=parquet: run the chain over a STORAGE SCAN (the
    // 100 TB posture — every pass re-reads parquet, the 1-d workflow only
    // reads the columns its chain touches). Same valve as BinBench.
    val raw = sys.env.get("SPARK_GRAFT_SOURCE") match {
      case Some("parquet") =>
        val dir = sys.env.getOrElse("SPARK_GRAFT_PARQUET_DIR",
          s"/tmp/workflowbench_parquet_$n")
        if (!new java.io.File(dir, "_SUCCESS").exists())
          gen.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case _ =>
        val cached = gen.persist(level)
        cached.count()
        cached
    }

    // 512x512 inverse deformation field from a 3x3 landmark TPS solve —
    // the mpes-resolution grid shape
    val g = 511.0
    val tgt = for (i <- Seq(0.0, 256.0, g); j <- Seq(0.0, 256.0, g)) yield (i, j)
    val srcR = tgt.map { case (i, j) => i + 2.0 * math.sin(j / g * math.Pi) }
    val srcC = tgt.map { case (i, j) => j - 1.5 * math.sin(i / g * math.Pi) }
    val dfield = MomentumCorrection.splineWarp(srcR.toArray, srcC.toArray,
      tgt.map(_._1).toArray, tgt.map(_._2).toArray, 512, 512)

    def chain: SedProcessor = SedProcessor(raw, xCol = "x", yCol = "y", tofCol = "tof")
      .addJitter(Seq("x", "y", "tof", "adc"), "rid", 0.5)
      .applyMomentumCorrection(dfield, ((0.0, 512.0), (0.0, 512.0)))
      .copy(xCol = "xc", yCol = "yc")
      .applyEnergyCorrection((x, y) =>
        SedFunctions.energyCorrectionLorentzian(x, y, 256.0, 256.0, -0.25, 700.0))
      .appendEnergyAxis(tofDistance = 0.9, timeOffset = 1.0e-8,
        binwidth = 4.125e-12, binning = 1, energyOffset = -30.0)
      .appendKAxis(0.0, 256.0, 0.0107, 1.0, 0.0, 256.0, 0.0107, 1.0)
      .calibrateDelayAxis("adc", (2000.0, 20000.0), (-500.0, 1500.0))

    def bench(name: String)(axes: Seq[BinAxis]): Unit = {
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        chain.compute(axes, withCenters = false).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[workflowbench] $name min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    bench("workflow_1d")(Seq(BinAxis("energy", 1000, -10.0, 10.0)))
    bench("workflow_4d")(Seq(
      BinAxis("kx", 100, -2.0, 2.0), BinAxis("ky", 100, -2.0, 2.0),
      BinAxis("energy", 100, -10.0, 10.0), BinAxis("delay", 100, -1000.0, 1000.0)))
    println(f"[workflowbench] peak_rss_gb=${Bench.peakRssGb}%.1f")
    spark.stop()
  }
}
