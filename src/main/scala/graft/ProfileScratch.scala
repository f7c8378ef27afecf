package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway plan profiler for 100x tuning runs (kept out of the
  * contract; invoked ad hoc as `runMain graft.ProfileScratch <sfdir>`). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PS $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    graft.sed.SedQueries.ensureConfs(spark)
    def ev = graft.sed.Tables.events(spark, d)
    time("scan_all")(ev.queryExecution.toRdd.count())
    time("scan_4col")(ev.select("event_id", "user_id", "ts_us", "event_type")
      .queryExecution.toRdd.count())
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    time("lag_only")(ev.select(col("event_type").as("next_type"),
      lag(col("event_type"), 1).over(w).as("prev_type"))
      .queryExecution.toRdd.count())
    val w1 = Window.partitionBy("user_id").orderBy(col("ts_us"))
    time("lag_1key")(ev.select(col("event_type").as("next_type"),
      lag(col("event_type"), 1).over(w1).as("prev_type"))
      .queryExecution.toRdd.count())
    time("transitions_full")(
      graft.operators.EventAnalytics.transitions(ev).queryExecution.toRdd.count())
    time("grouped_only")(ev.select(col("event_type").as("next_type"),
      lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .queryExecution.toRdd.count())
    def grouped = ev.select(col("event_type").as("next_type"),
      lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n_transitions"))
    val rowW = Window.partitionBy("prev_type")
    time("grouped_plus_window")(grouped
      .withColumn("p", sum("n_transitions").over(rowW))
      .queryExecution.toRdd.count())
    time("transitions_full_2nd")(
      graft.operators.EventAnalytics.transitions(ev).queryExecution.toRdd.count())
    println(graft.operators.EventAnalytics.transitions(ev)
      .queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
  }
}
