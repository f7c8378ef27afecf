package graft
import org.apache.spark.sql.SparkSession
/** Scale receipt for the NN-Descent k-NN graph (one full build on a
  * MakeBig embeddings table). */
object KnnBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val n = graft.operators.Ann.knnGraph(emb, "vec_id", "embedding", k, iters)
      .queryExecution.toRdd.count()
    println(f"KNN rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f k=$k iters=$iters")
    spark.stop()
  }
}
