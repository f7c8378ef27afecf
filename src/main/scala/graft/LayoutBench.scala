package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures what the Z-order layout actually buys at scan time: writes
  * the 100x events table (10M rows) twice — z-ordered on
  * (floor(value), floor(user_id/2)) and lexicographically on
  * (value, user_id) — with identical file counts, then for a grid of
  * equal-selectivity box predicates counts the files and row groups
  * whose parquet min/max statistics intersect the box, i.e. the units a
  * stats-based pruner MUST scan. That static count is the 100 TB
  * number: at 1000 executors the scan cost of a selective 2-D query is
  * proportional to surviving row groups, and only clustering makes the
  * stats selective on BOTH dimensions (Layout.scala's contract). Also
  * times the live Spark filter on each layout, where the parquet
  * vectorized reader does the same row-group skip dynamically.
  *
  * Usage: sbt "runMain graft.LayoutBench [copies] [files] [outDir]"
  */
object LayoutBench {
  /** Per-file parquet footer stats for (value, user_id): one entry per
    * row group: (vMin, vMax, uMin, uMax, rows). Package-visible so
    * LayoutSpec can regression-gate the pruning claim on small data. */
  private[graft] def rowGroupStats(dir: String): Seq[(String, Seq[(Double, Double, Long, Long, Long)])] = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .sortBy(_.getName).toSeq
    files.map { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getPath), conf))
      try {
        val groups = rd.getFooter.getBlocks.asScala.toSeq.map { b =>
          val cols = b.getColumns.asScala
          def stats(name: String) = cols.find(_.getPath.toDotString == name).get.getStatistics
          val v = stats("value")
          val u = stats("user_id")
          (v.genericGetMin.asInstanceOf[Double], v.genericGetMax.asInstanceOf[Double],
            u.genericGetMin.asInstanceOf[Long], u.genericGetMax.asInstanceOf[Long],
            b.getRowCount)
        }
        (f.getName, groups)
      } finally rd.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val copies = args.lift(0).map(_.toInt).getOrElse(100)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(256)
    val out = args.lift(2).getOrElse("/tmp/zlayout")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 100x the sf0.1 event stream, same value/user distributions
    // (event_id shifted per copy like MakeBig) — props dropped: layout
    // pruning is about the filter columns, not payload width.
    val base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val n = base.count()
    val big = (0 until copies).map { i =>
      base.withColumn("event_id", col("event_id") + lit(i.toLong * n * 10))
    }.reduce(_ unionAll _)

    // z: bin both dims to 10 bits (value 0..560 -> floor; user 0..~1500
    // -> /2), interleave, range-partition + sort by the key. lex: same
    // file count, sorted (value, user_id) — the first column gets all
    // the clustering, the second none. Identical schema on disk.
    val bx = least(floor(col("value")).cast("long"), lit(1023L))
    val by = least(floor(col("user_id") / 2).cast("long"), lit(1023L))
    val zDir = s"$out/z"
    val lexDir = s"$out/lex"
    Layout.zOrdered(big, Seq(bx, by), 10, nFiles)
      .write.mode("overwrite").parquet(zDir)
    big.repartitionByRange(nFiles, col("value"), col("user_id"))
      .sortWithinPartitions("value", "user_id")
      .write.mode("overwrite").parquet(lexDir)

    // 4x4 grid of disjoint boxes, each 1/16 of either dim -> 1/256
    // selectivity target; offset half a cell per row so box corners
    // don't align with bin boundaries.
    val boxes = for (i <- 0 until 4; j <- 0 until 4) yield {
      val vw = 561.0 / 16; val uw = 1501.0 / 16
      val v0 = (i * 4 + (j % 2) + 1) * vw
      val u0 = (j * 4 + (i % 2) + 1) * uw
      (v0, v0 + vw, u0.toLong, (u0 + uw).toLong)
    }

    def prune(dir: String): (Long, Long, Long, Long) = {
      val stats = rowGroupStats(dir)
      var files = 0L; var groups = 0L; var rows = 0L; var total = 0L
      for ((v0, v1, u0, u1) <- boxes) {
        val hit = stats.map { case (_, gs) =>
          gs.filter { case (vMin, vMax, uMin, uMax, _) =>
            vMax >= v0 && vMin <= v1 && uMax >= u0 && uMin <= u1
          }
        }
        files += hit.count(_.nonEmpty)
        groups += hit.map(_.size).sum
        rows += hit.map(_.map(_._5).sum).sum
      }
      total = stats.map(_._2.map(_._5).sum).sum
      (files / boxes.size, groups / boxes.size, rows / boxes.size, total)
    }

    def scanWall(dir: String): (Double, Long) = {
      var matched = 0L
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        matched = boxes.map { case (v0, v1, u0, u1) =>
          spark.read.parquet(dir)
            .filter(col("value") >= v0 && col("value") <= v1 &&
              col("user_id") >= u0 && col("user_id") <= u1)
            .count()
        }.sum
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, matched)
    }

    val (zf, zg, zr, ztot) = prune(zDir)
    val (lf, lg, lr, ltot) = prune(lexDir)
    val (zw, zm) = scanWall(zDir)
    val (lw, lm) = scanWall(lexDir)
    require(zm == lm, s"layouts disagree on matched rows: $zm vs $lm")
    println(s"""{"metric":"zorder_pruning","copies":$copies,"files":$nFiles,"boxes":${boxes.size},""" +
      s""""matched_rows_per_box":${zm / boxes.size},"total_rows":$ztot,""" +
      s""""z":{"files_scanned":$zf,"row_groups":$zg,"rows_scanned":$zr,"wall_16_boxes_s":$zw},""" +
      s""""lex":{"files_scanned":$lf,"row_groups":$lg,"rows_scanned":$lr,"wall_16_boxes_s":$lw}}""")
    require(ztot == ltot, "row-count mismatch between layouts")
    spark.stop()
  }
}
