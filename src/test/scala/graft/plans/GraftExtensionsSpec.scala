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
  }
}
