package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 1000× k-center receipt (vs the sf0.1 embeddings table: 2k → 2M
  * vectors, and k raised 8 → 2048, far past the exact operator's
  * MaxKcenterK): synthesizes 2M deterministic dim-64 vectors in-plan,
  * then times kcenterSampled's two phases — the single corpus sample
  * pass and the driver-local Gonzalez loop. The exact operator at this
  * k would be 2048 full corpus passes; the sampled shape is ONE. */
object KcenterBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(2048)
    val m = args.lift(2).map(_.toInt).getOrElse(32768)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // deterministic synthetic corpus: 64 hash-derived floats per id,
    // strictly positive so norms are safely nonzero
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => ((pmod(xxhash64(col("id"), i), lit(1000L)) + lit(1L))
          .cast("double") / lit(1000.0)).cast("float")).as("embedding"))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val warm = t("corpus-materialize")(corpus.count())
    println(s"rows $warm k $k m $m")
    val res = t("kcenter-sampled-total")(
      graft.operators.Ann.kcenterSampled(corpus, "vec_id", "embedding", k, m))
    val picks = res.collect()
    println(s"picks ${picks.length} distinct ${picks.map(_.getLong(1)).distinct.length} " +
      f"final_r_u ${picks.last.getLong(2)}")
    // assignment at this k: brute broadcast is O(k·dim) per row
    // (2M × 2048 × 64 = 2.6e11 flops); the IVF-routed path scans only
    // nprobe cells' centers per row
    val centers = corpus
      .join(res.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
    val ra = t("routed-assign")(
      graft.operators.Ann.clusterAssignRouted(corpus, "vec_id", "embedding",
        centers, cells = 64, nprobe = 4).queryExecution.toRdd.count())
    println(s"assigned $ra")
    // the per-row win, same subset both ways: brute broadcast map is
    // O(k·dim) per row, routed is O((cells + k·nprobe/cells)·dim) —
    // at k=4096/cells=64/nprobe=4 that's 4096 vs 64+256 = 320 dots/row
    val sub = corpus.filter(col("vec_id") % 10 === 0).localCheckpoint(true)
    val rb = t("brute-assign-10pct")(
      graft.operators.Ann.clusterAssign(sub, "vec_id", "embedding",
        centers).queryExecution.toRdd.count())
    val rr = t("routed-assign-10pct")(
      graft.operators.Ann.clusterAssignRouted(sub, "vec_id", "embedding",
        centers, cells = 64, nprobe = 4).queryExecution.toRdd.count())
    println(s"subset brute $rb routed $rr")
    spark.stop()
  }
}
