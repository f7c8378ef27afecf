package graft.io

import graft.SparkSpecBase
import graft.operators.BinAxis
import graft.operators.Binning
import java.nio.file.Files

class IoSpec extends SparkSpecBase {
  import spark.implicits._

  test("read parquet/csv/json round-trips through SedWriter") {
    val dir = Files.createTempDirectory("graft_io").toString
    val df = events.select("event_id", "value", "event_type").limit(100)
    SedWriter.parquet(df, s"$dir/p")
    SedWriter.csv(df, s"$dir/c")
    SedWriter.json(df, s"$dir/j")
    assert(SedReader.read(spark, s"$dir/p").count() == 100)
    val c = SedReader.read(spark, s"$dir/c", "csv")
    assert(c.count() == 100 && c.columns.toSet == df.columns.toSet)
    assert(SedReader.read(spark, s"$dir/j", "json").count() == 100)
  }

  test("partitioned parquet write prunes on the partition column") {
    val dir = Files.createTempDirectory("graft_io").toString
    SedWriter.parquet(events.select("event_id", "value", "event_type"),
      s"$dir/part", partitionBy = Seq("event_type"))
    val back = SedReader.read(spark, s"$dir/part")
    val one = back.filter($"event_type" === "click")
    val expected = events.filter($"event_type" === "click").count()
    assert(one.count() == expected)
    // partition pruning visible in the scan
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && expected > 0)
  }

  test("withFileId assigns a stable id per source file") {
    val dir = Files.createTempDirectory("graft_io").toString
    events.limit(10).write.parquet(s"$dir/f0")
    events.limit(20).write.parquet(s"$dir/f1")
    val df = SedReader.read(spark, s"$dir/f*")
    val withId = SedReader.withFileId(df)
    assert(withId.count() == 30)
    val perFile = withId.groupBy("file_id").count().as[(Long, Long)].collect().toMap
    assert(perFile.values.toSet.subsetOf(Set(10L, 20L)))
    // deterministic across evaluations
    val again = SedReader.withFileId(df).groupBy("file_id").count().as[(Long, Long)].collect().toMap
    assert(perFile == again)
  }

  test("denseCube renders the sparse histogram row-major with zeros for empty bins") {
    val axes = Seq(BinAxis("a", 2, 0.0, 2.0), BinAxis("b", 3, 0.0, 3.0))
    val df = Seq((0.5, 0.5), (0.5, 0.5), (1.5, 2.5)).toDF("a", "b")
    val cube = SedWriter.denseCube(Binning.histogram(df, axes), axes)
    assert(cube.toSeq == Seq(2.0, 0.0, 0.0, 0.0, 0.0, 1.0)) // (0,0)=2, (1,2)=1
  }

  test("binned export writes data + axis metadata") {
    val dir = Files.createTempDirectory("graft_io").toString
    val axes = Seq(BinAxis("value", 10, 0.0, 500.0))
    SedWriter.binned(Binning.withCenters(Binning.histogram(events, axes), axes), axes, s"$dir/b")
    assert(SedReader.read(spark, s"$dir/b/data").count() > 0)
    val meta = SedReader.read(spark, s"$dir/b/axes", "json").collect()
    assert(meta.length == 1 && meta(0).getAs[String]("axis") == "value")
  }
}
