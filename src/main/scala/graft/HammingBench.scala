package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Image-hash near-dup receipt at 1000× the sf0.1 image count: 2M
  * synthetic 64-bit perceptual hashes — 200k distinct seeds × 10
  * planted variants within Hamming ≤ 3 — through the multi-index
  * Hamming graph. The brute-force alternative is 2·10¹² pair
  * comparisons; the banded shape is 4 equality self-joins. */
object HammingBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // id i belongs to seed-group i/10; its hash = seed hash with
    // (i%10 % 4) deterministic bit flips -> every group is a planted
    // near-dup cluster within Hamming 3
    val hashes = spark.range(n).select(col("id"), expr(
      """xxhash64(cast(id div 10 as long)) ^
         (case when id % 10 = 0 then 0L else
            shiftleft(1L, cast(pmod(xxhash64(id), 64) as int)) ^
            (case when id % 10 % 4 >= 2
              then shiftleft(1L, cast(pmod(xxhash64(id, 7L), 64) as int))
              else 0L end)
          end)""").as("ph"))
      .localCheckpoint(true)
    println(s"hashes ${hashes.count()}")
    val t0 = System.nanoTime()
    val g = graft.operators.Multimodal.hammingNearDupGraph(hashes, "id", "ph",
      maxHamming = 3, k = 10)
    val edges = g.queryExecution.toRdd.count()
    println(f"PHASE graph ${(System.nanoTime() - t0) / 1e9}%.1f s edges=$edges")
    // wide radius (round 13) at the REP level — the deployment shape
    // its docstring prescribes: wide edges run over the radius-3 graph's
    // surviving cluster representatives, n/10 rows here (the narrow pass
    // collapses each planted 10-variant cluster to its min id). On
    // uniform codes the candidate stage is pigeonhole-bounded at
    // ~4·V(16,3)/2^16 ≈ 4% of all pairs, so rep count — not corpus
    // count — is the knob that keeps it practical.
    val t1 = System.nanoTime()
    val comps = graft.operators.Dedup.connectedComponentsStar(
      g.filter(col("src") < col("dst"))
        .select(col("src").as("a_id"), col("dst").as("b_id")))
    val reps = hashes.join(
        comps.filter(col("id") =!= col("label")).select(col("id")),
        Seq("id"), "left_anti")
      .localCheckpoint(true)
    println(f"PHASE collapse ${(System.nanoTime() - t1) / 1e9}%.1f s reps=${reps.count()}")
    val t2 = System.nanoTime()
    val wide = graft.operators.Multimodal.hammingEdgesWide(reps, "id", "ph",
      maxHamming = 12)
    val wideEdges = wide.queryExecution.toRdd.count()
    println(f"PHASE wide12_reps ${(System.nanoTime() - t2) / 1e9}%.1f s edges=$wideEdges")
    // bit-sampled sketch (round 14) PAST the exact ceiling — radius 18
    // at the rep level. On uniform codes the candidate stage runs at
    // ~t/2^s ≈ 11% of all pairs (LSH prices r=18-of-64 at ~n^1.5), so
    // the practical envelope is a capped rep subset: 50k reps ≈ 134M
    // candidate pairs. The cap is the honest knob, printed with the row.
    val t3 = System.nanoTime()
    val SketchReps = 50000L
    val sub = reps.filter(col("id") % lit(math.max(1L, 200000L / SketchReps) * 10L) === 0)
      .localCheckpoint(true)
    val subN = sub.count()
    val sk = graft.operators.Multimodal.hammingEdgesSketch(sub, "id", "ph",
      maxHamming = 18)
    val skEdges = sk.queryExecution.toRdd.count()
    println(f"PHASE sketch18_reps ${(System.nanoTime() - t3) / 1e9}%.1f s " +
      f"reps=$subN edges=$skEdges (capped subset of the 200k reps; " +
      "expected recall 0.95 at exactly-18 per sketchRecall)")
    spark.stop()
  }
}
