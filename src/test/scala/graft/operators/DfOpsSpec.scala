package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DfOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("forwardFill is exact across partition boundaries") {
    // nulls everywhere except a few sparse anchors: any gap spans partitions
    val df = spark.range(0, 1000, 1, 8).toDF("id")
      .withColumn("v", when($"id" % 137 === 0, $"id".cast("double")))
    val filled = DfOps.forwardFill(df, "id", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().sortBy(_._1)
    filled.foreach { case (id, v) =>
      val expected = (id / 137) * 137
      assert(v.contains(expected.toDouble), s"id=$id")
    }
  }

  test("backwardFill mirrors forwardFill") {
    val df = spark.range(0, 1000, 1, 8).toDF("id")
      .withColumn("v", when($"id" % 137 === 0, $"id".cast("double")))
    val filled = DfOps.backwardFill(df, "id", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().sortBy(_._1)
    filled.foreach { case (id, v) =>
      val next = ((id + 136) / 137) * 137
      if (next < 1000) assert(v.contains(next.toDouble), s"id=$id")
      else assert(v.isEmpty, s"id=$id trailing nulls stay null")
    }
  }

  test("offsetByOtherColumns preserve_mean keeps the target mean") {
    val df = events.withColumn("e", $"value" * 2.0)
    val out = DfOps.offsetByOtherColumns(df, "e",
      Seq(ColumnOffset("value", 0.5, None, preserveMean = true)), "e_off")
    val Array(m0, m1) = out.agg(avg($"e"), avg($"e_off")).as[(Double, Double)].head() match {
      case (a, b) => Array(a, b)
    }
    assert(math.abs(m0 - m1) < 1e-9)
  }

  test("offsetByOtherColumns supports two offsets referencing the same column") {
    val df = events.limit(100)
    val out = DfOps.offsetByOtherColumns(df, "value",
      Seq(ColumnOffset("value", 1.0, Some("mean")),
        ColumnOffset("user_id", 0.5, None, preserveMean = true),
        ColumnOffset("user_id", 0.25, Some("mean"))), "value_off")
    assert(out.select("value_off").count() == 100) // no ambiguous-reference error
  }

  test("applyFilter bounds are exclusive") {
    val n = DfOps.applyFilter(events, "value", 50.0, 400.0)
      .agg(min($"value"), max($"value")).as[(Double, Double)].head()
    assert(n._1 > 50.0 && n._2 < 400.0)
  }

  test("addTimeStampedData interpolates the sensor curve onto events") {
    val df = Seq(5.0, 15.0).toDF("ts_s")
    val out = DfOps.addTimeStampedData(df, $"ts_s", "temp",
      Seq(0.0, 10.0, 20.0), Seq(1.0, 3.0, 2.0))
      .select("temp").as[Double].collect().sorted
    assert(out.toSeq == Seq(2.0, 2.5))
  }
}
