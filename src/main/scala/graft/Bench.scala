package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every driver-contract query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is executed via `queryExecution.toRdd.count()` — that runs
  * the query's OWN physical plan (all output columns materialized); a
  * plain `df.count()` would let Catalyst prune every column and
  * under-measure projection-heavy queries. A warmup job runs first so the
  * first measured query doesn't pay JVM/codegen initialization.
  */
object Bench {
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
