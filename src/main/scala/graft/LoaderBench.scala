package graft

import org.apache.spark.sql.SparkSession

/** Loader-benchmark twin of the reference's loader_compute_{flash,mpes,
  * sxp} targets (benchmarks/benchmark_sed.py:189 test_loader_compute):
  * after a warm pass, time repeated FULL materializations of each
  * loader's frame over the reference's own raw fixtures and report
  * min/median seconds plus rows and rows/s. The reference number is a
  * warm dask `.compute()` (min of 20, ms-scale on these KB-sized
  * fixtures); the Spark twin pays a fixed per-job scheduling floor
  * (~tens of ms at local[32]) that dominates at fixture size and
  * amortizes to zero at any real data scale — rows/s is the
  * scale-honest column. Run: `sbt "runMain graft.LoaderBench"`.
  */
object LoaderBench {
  private val FlashDir = "/root/reference/tests/data/loader/flash"
  private val SxpFile = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"
  private val MpesFile = "/root/reference/tests/data/loader/mpes/Scan0030_2.h5"

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("big")) { bigMode(args); return }
    // `runMain graft.LoaderBench <n>` = AMORTIZING mode: replicate each
    // raw fixture to n distinctly-named copies and bench the load over
    // those — the scale where Spark's fixed per-job floor (~0.05-0.5 s
    // at local[32]) amortizes and rows/s is the honest comparable
    // against the reference's warm-dask ms-scale fixture targets. The
    // reference's implied rate is its fixture rows / its target seconds;
    // this mode prints graft's rows/s at ~100x the fixture so the two
    // rates compare like-for-like (both warm, both amortized over their
    // own job floors).
    val amortize = args.headOption.map(_.toInt).getOrElse(0)
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS",
      if (amortize > 0) "5" else "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 100000, 1, 4).selectExpr("sum(id % 7)").collect() // warm JVM

    val flashFiles = Seq(
      s"$FlashDir/FLASH1_USER3_stream_2_run43878_file1_20230130T153807.1.h5",
      s"$FlashDir/FLASH1_USER3_stream_2_run43879_file1_20230130T153807.1.h5")

    def bench(name: String, build: () => org.apache.spark.sql.DataFrame): String = {
      val rows = build().queryExecution.toRdd.count() // warm pass
      val times = (0 until repeats).map { _ =>
        val t0 = System.nanoTime()
        build().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val min = times.head
      val med = times(repeats / 2)
      f""""$name":{"min":$min%.4f,"median":$med%.4f,"rows":$rows,"rows_per_sec":${(rows / min).toLong}}"""
    }

    // The flash/sxp reference loaders materialize from their parquet
    // BUFFERS (read_dataframe buffers raw h5 once, .compute() re-reads
    // parquet) — twin that: buffer via FlashBuffer, bench the loaded
    // frame. The mpes loader computes straight from h5 every time.
    // buffers are created by the first (warm) build; later builds skip
    // creation and re-plan the load, so each timed run re-executes the
    // whole load graph like dask's .compute() does
    val flashBufDir = java.nio.file.Files.createTempDirectory("lb_flash").toString
    val sxpBufDir = java.nio.file.Files.createTempDirectory("lb_sxp").toString

    // replicate a fixture into n distinctly-named copies (the loaders
    // key buffers and file ids by name)
    def replicate(srcs: Seq[String], n: Int): Seq[String] = {
      val dir = java.nio.file.Files.createTempDirectory("lb_rep")
      (0 until n).map { i =>
        val src = java.nio.file.Paths.get(srcs(i % srcs.size))
        val name = src.getFileName.toString.replace(".h5", f"_rep$i%03d.h5")
        val dst = dir.resolve(name)
        java.nio.file.Files.copy(src, dst)
        dst.toString
      }
    }

    val (flashIn, sxpIn, mpesIn, tag) =
      if (amortize > 0)
        (replicate(flashFiles, amortize), replicate(Seq(SxpFile), amortize),
          replicate(Seq(MpesFile), amortize), s""","files":$amortize""")
      else (flashFiles, Seq(SxpFile), Seq(MpesFile), "")

    val parts = Seq(
      bench("loader_compute_flash", () => graft.io.FlashBuffer.processAndLoad(
        spark, flashIn, flashBufDir)._1),
      bench("loader_compute_sxp", () => graft.io.FlashBuffer.processAndLoad(
        spark, sxpIn, sxpBufDir, graft.io.FlashReader.sxpChannels,
        ubidOffset = 0, daq = graft.io.FlashReader.DaqSxp)._1),
      bench("loader_compute_mpes",
        () => graft.io.SedReader.readMpesH5(spark, mpesIn)))
    println(s"""{"metric":"loader_compute","repeats":$repeats$tag,${parts.mkString(",")}}""")
    spark.stop()
  }

  /** BIG-FILE mode (VERDICT r16 task 4 — the loader crossover receipt):
    * `runMain graft.LoaderBench big <flashDir> <sxpDir>` loads
    * MakeBigH5-generated production-size raw files (~1M electron rows
    * per file instead of the fixtures' ~4-6k) and reports min/median
    * seconds + rows/s, so the fixture-scale per-file floor (~5 ms
    * listing + footer after the r16 rewrite, but ~50-100 ms of per-file
    * H5 parse setup before it) is amortized over production-shaped
    * files and graft's rows/s compares honestly against the
    * reference-implied rate (895,652 flash / 340,500 sxp rows/s).
    * Pass "-" for a dir to skip that loader. */
  private def bigMode(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val flashDir = args.lift(1).getOrElse("-")
    val sxpDir = args.lift(2).getOrElse("-")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 100000, 1, 4).selectExpr("sum(id % 7)").collect() // warm JVM
    def h5In(dir: String): Seq[String] = {
      val p = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.toString).filter(_.endsWith(".h5")).toSeq.sorted
      finally s.close()
    }
    def bench(name: String, build: () => org.apache.spark.sql.DataFrame): String = {
      val rows = build().queryExecution.toRdd.count() // warm pass (creates buffers)
      val times = (0 until repeats).map { _ =>
        val t0 = System.nanoTime()
        build().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val min = times.head
      val med = times(repeats / 2)
      f""""$name":{"min":$min%.4f,"median":$med%.4f,"rows":$rows,"rows_per_sec":${(rows / min).toLong}}"""
    }
    val parts = Seq.newBuilder[String]
    if (flashDir != "-") {
      val buf = java.nio.file.Files.createTempDirectory("lb_bigflash").toString
      parts += bench("loader_compute_flash_big", () =>
        graft.io.FlashBuffer.processAndLoad(spark, h5In(flashDir), buf)._1)
    }
    if (sxpDir != "-") {
      val buf = java.nio.file.Files.createTempDirectory("lb_bigsxp").toString
      parts += bench("loader_compute_sxp_big", () =>
        graft.io.FlashBuffer.processAndLoad(spark, h5In(sxpDir), buf,
          graft.io.FlashReader.sxpChannels, ubidOffset = 0,
          daq = graft.io.FlashReader.DaqSxp)._1)
    }
    println(s"""{"metric":"loader_compute_big","repeats":$repeats,${parts.result().mkString(",")}}""")
    spark.stop()
  }
}
