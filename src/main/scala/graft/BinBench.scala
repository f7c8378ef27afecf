package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.{BinAxis, Binning}

/** Reproduces the reference's published binning benchmark shape
  * (/root/reference/benchmarks/benchmark_sed.py: 1e8 in-memory events,
  * 4 uniform columns; targets benchmark_targets.yaml — binning_1d 3.02 s,
  * binning_4d 9.21 s): the data lives in the Spark block cache
  * (uncompressed, like the reference's in-memory dask array), each
  * benchmark runs `runs` times and reports min + all (the reference
  * compares `min(timeit.repeat(5))`).
  *
  * Usage: sbt "runMain graft.BinBench [nRows] [runs] [denseMaxBins]"
  * (heap comes from build.sbt's forked -Xmx, not spark.driver.memory;
  * the optional third arg overrides spark.graft.binning.denseMaxBins to
  * compare the sparse vs dense-chunk aggregation paths on the same data).
  */
object BinBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000000L
    val runs = if (args.length > 1) args(1).toInt else 3
    val denseMax = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    denseMax.foreach(v => spark.conf.set(Binning.DenseMaxBinsKey, v))

    // the reference's ranges: X,Y in [0,2048], t in [60000,120000],
    // ADC in [2000,20000], all uniform. At 1e9 rows the cache is ~32 GB;
    // MEMORY_AND_DISK (opt-in via SPARK_GRAFT_STORAGE) degrades to disk
    // spill instead of eviction when the heap can't hold it — the
    // graceful-degradation point the 10x scale probe exists to exercise.
    val level =
      if (sys.env.get("SPARK_GRAFT_STORAGE").contains("MEMORY_AND_DISK"))
        StorageLevel.MEMORY_AND_DISK
      else StorageLevel.MEMORY_ONLY
    val gen = spark.range(0L, n, 1L, cpus.toInt * 2).select(
      (rand(42) * 2048.0).as("X"),
      (rand(43) * 2048.0).as("Y"),
      (rand(44) * 60000.0 + 60000.0).as("t"),
      (rand(45) * 18000.0 + 2000.0).as("ADC"))
    // SPARK_GRAFT_SOURCE=parquet: bin over a STORAGE SCAN instead of the
    // block cache — the 100 TB shape, where the event store never fits
    // in memory and every pass re-reads parquet (column pruning means
    // the 1-d histogram reads one column of four). Data is materialized
    // once (deterministic seeds) and reused across runs.
    val df = sys.env.get("SPARK_GRAFT_SOURCE") match {
      case Some("parquet") =>
        val dir = sys.env.getOrElse("SPARK_GRAFT_PARQUET_DIR",
          s"/tmp/binbench_parquet_$n")
        if (!new java.io.File(dir, "_SUCCESS").exists())
          gen.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case _ =>
        val cached = gen.persist(level)
        cached.count() // materialize the cache before timing
        cached
    }

    def bench(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[binbench] $name min=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    bench("binning_1d") {
      Binning.histogram(df, Seq(BinAxis("t", 1000, 60000.0, 120000.0)))
    }
    bench("binning_3d") { // mid-size product (1e6 bins): dense-chunk regime
      Binning.histogram(df, Seq(
        BinAxis("X", 100, 0.0, 2048.0), BinAxis("Y", 100, 0.0, 2048.0),
        BinAxis("t", 100, 60000.0, 120000.0)))
    }
    bench("binning_4d") {
      Binning.histogram(df, Seq(
        BinAxis("X", 100, 0.0, 2048.0), BinAxis("Y", 100, 0.0, 2048.0),
        BinAxis("t", 100, 60000.0, 120000.0), BinAxis("ADC", 100, 2000.0, 20000.0)))
    }
    println(f"[binbench] peak_rss_gb=${Bench.peakRssGb}%.1f")
    spark.stop()
  }
}
