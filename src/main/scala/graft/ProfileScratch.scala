package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan profiler for 100x tuning runs (kept out of the
  * contract; invoked ad hoc as `runMain graft.ProfileScratch <sfdir>`).
  * Round 10: exact vs winnowing-anchored substring dedup. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PS $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f rss=${Bench.peakRssGb}%.1f")
    }
    graft.sed.SedQueries.ensureConfs(spark)
    def docs = graft.sed.Tables.documents(spark, d)
    time("substring_exact")(
      graft.operators.Dedup.substringDedup(docs, "doc_id", "text", 40)
        .queryExecution.toRdd.count())
    time("substring_anchored")(
      graft.operators.Dedup.substringDedupAnchored(docs, "doc_id", "text", 40)
        .queryExecution.toRdd.count())
    time("substring_anchored_2nd")(
      graft.operators.Dedup.substringDedupAnchored(docs, "doc_id", "text", 40)
        .queryExecution.toRdd.count())
    // CC comparison on the real verified near-dup pair graph
    import graft.operators.Dedup
    val reps = Dedup.exactRepresentatives(docs, "doc_id", md5(col("text").cast("binary")))
      .localCheckpoint(true)
    val cand = Dedup.minhashCandidates(reps, "doc_id", "text", 12, 3, 3, 10000)
    val verified = Dedup.jaccardForPairs(reps, "doc_id", "text", 3, cand)
      .filter(col("jaccard") >= 0.8)
      .select("a_id", "b_id").localCheckpoint(true)
    println(s"PS verified_pairs=${verified.count()}")
    time("cc_propagation")(
      Dedup.connectedComponents(verified).queryExecution.toRdd.count())
    val t0 = System.nanoTime()
    val (starL, rounds) = Dedup.connectedComponentsStarRounds(verified)
    val n = starL.queryExecution.toRdd.count()
    println(f"PS cc_star rows=$n rounds=$rounds t=${(System.nanoTime() - t0) / 1e9}%.2f")
  }
}
