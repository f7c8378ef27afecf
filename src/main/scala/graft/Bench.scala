package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every driver-contract query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is executed via `queryExecution.toRdd.count()` — that runs
  * the query's OWN physical plan (all output columns materialized); a
  * plain `df.count()` would let Catalyst prune every column and
  * under-measure projection-heavy queries. A warmup job runs first so the
  * first measured query doesn't pay JVM/codegen initialization. A query
  * that throws reports -1 (never a plausible elapsed time).
  *
  * Per query the reported number is the MEDIAN of `SPARK_GRAFT_BENCH_RUNS`
  * (default 3) executions: single cold runs are dominated by codegen/JIT
  * noise for sub-5 s queries (a byte-identical build once read 2.6 s vs
  * 12.9 s round-over-round), so medians are what make cross-round
  * comparisons meaningful.
  */
object Bench {
  /** JSON string escape (same contract as Verify's). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: initialize codegen, shuffle machinery, parquet reader paths
    spark.range(0, 1000000, 1, 8).selectExpr("sum(id % 7)").collect()
    graft.sed.SedQueries.ensureConfs(spark)
    spark.read.parquet(s"$sfDir/events.parquet").limit(10).collect()
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      }
      val median =
        if (times.exists(_ < 0)) -1.0
        else times.sorted.apply(runs / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${q(sfDir)}}""")
    spark.stop()
  }
}
