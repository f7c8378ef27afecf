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
    spark.stop()
  }
}
