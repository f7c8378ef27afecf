package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.graft.GraftExtensions

class GraftExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expressions are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").as[Double].head()
    assert(dot == 11.0)
    val inter = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c")
      .as[Long].head()
    assert(inter == 2L)
    val sigs = spark.sql("SELECT minhash_sigs(array(42L, 7L), 3) AS s")
      .selectExpr("size(s)").as[Int].head()
    assert(sigs == 3)
    val sh = spark.sql("SELECT simhash32(array(5L)) AS h").as[Long].head()
    assert(sh == 5L) // single hash votes its own bits
    val mx = spark.sql(
      "SELECT float_vec_abs_max(array(CAST(1.5 AS FLOAT), CAST(-4.0 AS FLOAT))) AS m")
      .as[Double].head()
    assert(mx == 4.0)
    val q8 = spark.sql(
      "SELECT quantize_i8_str(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT), " +
        "CAST(2.0 AS FLOAT)), CAST(63.5 AS DOUBLE)) AS q").as[String].head()
    assert(q8 == "64,-32,127") // floor(-0.5*63.5+0.5) = -32; 2*63.5 clamps to 127
  }

  test("native shingle hashes match the interpreted HOF formulation bit for bit") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    for (n <- Seq(1, 3)) {
      val base = documents
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .filter(size(col("__toks")) >= n)
      val hof = base.select(col("doc_id"),
          transform(TextFunctions.shingles(col("__toks"), n),
            TextFunctions.expr_hash32 _).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      val native = base.select(col("doc_id"),
          org.apache.spark.sql.graft.ShingleHashes(col("__toks"), n).as("h"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(native == hof && native.nonEmpty, s"n=$n")
    }
    // below-width token arrays degrade to an empty hash array, not a crash
    val short = Seq((1L, "only two")).toDF("doc_id", "text")
      .select(org.apache.spark.sql.graft.ShingleHashes(
        graft.functions.TextFunctions.tokens(col("text")), 3).as("h"))
      .as[Seq[Long]].head()
    assert(short.isEmpty)
  }

  test("native quantize matches the interpreted HOF formulation bit for bit") {
    import org.apache.spark.sql.functions._
    val hof = embeddings
      .withColumn("__mx", aggregate(col("embedding"), lit(0.0d),
        (acc, v) => greatest(acc, abs(v.cast("double")))))
      .filter(col("__mx") > 0.0)
      .withColumn("scale", lit(127.0) / col("__mx"))
      .select(col("vec_id"), col("scale"),
        concat_ws(",", transform(col("embedding"), v =>
          greatest(lit(-127L), least(lit(127L),
            floor(v.cast("double") * col("scale") + lit(0.5)).cast("long")))
            .cast("string"))).as("q8"))
      .as[(Long, Double, String)].collect().toSet
    val native = embeddings
      .withColumn("__mx", org.apache.spark.sql.graft.FloatVecAbsMax(col("embedding")))
      .filter(col("__mx") > 0.0)
      .withColumn("scale", lit(127.0) / col("__mx"))
      .select(col("vec_id"), col("scale"),
        org.apache.spark.sql.graft.QuantizeI8Str(col("embedding"), col("scale")).as("q8"))
      .as[(Long, Double, String)].collect().toSet
    assert(native == hof && native.nonEmpty)
  }
}
