package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.sed.{PipelineQueries, RelationalQueries, SedQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SedQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  private def defs = {
    val maps = Seq(SedQueries.defs, PipelineQueries.defs, RelationalQueries.defs,
      graft.streaming.StreamingQueries.defs)
    val merged = maps.reduce(_ ++ _)
    // a duplicate key across the maps would silently shadow a query (and
    // shrink the correctness gate) — fail fast instead
    require(merged.size == maps.map(_.size).sum,
      "duplicate query keys across SedQueries/PipelineQueries/RelationalQueries")
    merged
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, v) if v.sql.isDefined => k -> v.sql.get }
}
