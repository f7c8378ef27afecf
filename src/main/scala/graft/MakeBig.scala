package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress data: replicate the sf0.1 tables K times with shifted
  * ids (documents get id-suffixed text in half the copies, so both the
  * duplicate-collapse and the distinct-content paths are exercised). */
object MakeBig {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val out = args.lift(1).getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    def rep(name: String, idCols: Seq[String], textCol: Option[String] = None): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val n = base.count()
      val copies = (0 until k).map { i =>
        var c = base
        for (id <- idCols) c = c.withColumn(id, col(id) + lit(i * n * 10))
        textCol.foreach { t =>
          if (i % 2 == 1) c = c.withColumn(t, concat(col(t), lit(s" v$i")))
        }
        c
      }
      copies.reduce(_ unionAll _).write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    rep("events", Seq("event_id"))
    rep("documents", Seq("doc_id"), Some("text"))
    rep("embeddings", Seq("vec_id"))
    rep("lineitem", Seq("l_orderkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("customer", Seq("c_custkey"))
    for (t <- Seq("supplier", "part", "nation", "region"))
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
    println("BIG_DONE")
    spark.stop()
  }
}
