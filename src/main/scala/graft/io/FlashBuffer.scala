package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.operators.DfOps

/** Buffered flash/sxp ingestion — the Spark-native form of reference
  * src/sed/loader/flash/buffer_handler.py: raw HDF5 files are
  * materialized once as per-file parquet "buffer" files (electron +
  * timed granularity), later loads skip files whose buffers exist, a
  * schema check catches config drift between saves, and the loaded
  * frame gets a cross-file forward fill of the pulse/train channels.
  *
  * Differences from the reference are deliberate Spark-first choices:
  * buffer creation is a Spark job (one task per raw file) instead of a
  * joblib pool; the cross-file fill is the exact distributed
  * forward-fill operator (DfOps.forwardFill — boundary-only second
  * pass) rather than the reference's overlap-windowed iterative
  * approximation (buffer_handler.py:258-266); and the buffers are
  * ordinary parquet directories any Spark reader can scan with
  * pushdown/pruning. */
object FlashBuffer {

  /** Paths of one raw file's buffer set (buffer_handler.py:27
    * BufferFilePaths): `<folder>/buffer/<typ>_<stem><suffix>`. */
  case class BufferPaths(raw: String, electron: String, timed: String)

  def bufferPaths(h5Paths: Seq[String], folder: String,
                  suffix: String = ""): Seq[BufferPaths] = {
    val sfx = if (suffix.nonEmpty) s"_$suffix" else ""
    h5Paths.sorted.map { p =>
      val base = p.substring(p.lastIndexOf('/') + 1)
      val stem = base.replaceAll("\\.h5$", "")
      BufferPaths(p, s"$folder/buffer/electron_$stem$sfx", s"$folder/buffer/timed_$stem$sfx")
    }
  }

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  /** File sets whose electron or timed buffer is missing
    * (buffer_handler.py:90 file_sets_to_process). */
  def filesToProcess(spark: SparkSession, sets: Seq[BufferPaths],
                     forceRecreate: Boolean = false): Seq[BufferPaths] =
    if (forceRecreate) sets
    else sets.filter(s => !exists(spark, s.electron) || !exists(spark, s.timed))

  /** Validate existing buffer files against the expected column set,
    * with the reference's field-named diagnosis (buffer_handler.py:136
    * _schema_check: "Missing in parquet" = config grew since the buffer
    * was written; "Missing in config" = buffer has columns the current
    * config no longer declares). */
  def schemaCheck(spark: SparkSession, paths: Seq[String],
                  expected: Set[String]): Unit =
    // footer reads are independent metadata ops — do them driver-
    // parallel (at 400 buffers the serial pass was most of the warm
    // load's remaining per-file floor)
    paths.filter(exists(spark, _)).asJava.parallelStream().forEach { p =>
      // direct footer read of one part file — a spark.read schema
      // resolution costs ~10-30 ms of driver work PER FILE, which at
      // 2N buffer dirs per load dominated the amortizing LoaderBench
      val dir = new org.apache.hadoop.fs.Path(p)
      val fsys = fs(spark, p)
      val have = fsys.listStatus(dir)
        .find(f => f.isFile && f.getPath.getName.startsWith("part-") &&
          f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          import scala.jdk.CollectionConverters._
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, spark.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getFileMetaData.getSchema.getFields.asScala
            .map(_.getName).toSet
          finally r.close()
        }
        .getOrElse(spark.read.parquet(p).schema.fieldNames.toSet)
      if (have != expected) {
        val missingInParquet = expected -- have
        val missingInConfig = have -- expected
        val errs = Seq(
          if (missingInParquet.nonEmpty)
            Some(s"Missing in parquet: ${missingInParquet.toSeq.sorted.mkString(", ")}")
          else None,
          if (missingInConfig.nonEmpty)
            Some(s"Missing in config: ${missingInConfig.toSeq.sorted.mkString(", ")}")
          else None).flatten
        throw new IllegalStateException(
          s"The available channels do not match the schema of file $p. " +
            s"${errs.mkString(" ")}. Check the channel configuration or " +
            "set forceRecreate=true.")
      }
    }

  private val IndexCols = Seq("file_id", "run_id", "train_id", "pulse_id")

  /** Expected buffer schemas for a channel set. */
  def electronSchema(channels: Seq[FlashChannel]): Set[String] =
    (IndexCols ++ Seq("electron_id") ++ FlashReader.electronChannelNames(channels) ++
      FlashReader.fillChannelNames(channels)).toSet
  def timedSchema(channels: Seq[FlashChannel]): Set[String] =
    (IndexCols ++ FlashReader.fillChannelNames(channels)).toSet

  /** Cross-file forward fill of the pulse/train channels: a file's
    * leading rows (before its first per-train reading) inherit the last
    * value of the previous file, in (train, pulse, electron) order —
    * the cross-partition fill buffer_handler.py:258 approximates with
    * overlap windows, done exactly here. */
  def fillAcrossFiles(df: DataFrame, channels: Seq[FlashChannel]): DataFrame = {
    val fillCols = FlashReader.fillChannelNames(channels).filter(df.columns.contains)
    val eCol = if (df.columns.contains("electron_id")) col("electron_id") else lit(0L)
    val ordered = df.withColumn("__ord",
      struct(col("train_id"), col("pulse_id"), eCol))
    DfOps.forwardFill(ordered, "__ord", fillCols).drop("__ord")
  }

  /** Create missing buffers, then load both granularities as single
    * DataFrames with the cross-file fill applied
    * (buffer_handler.py:287 process_and_load_dataframe). */
  def processAndLoad(spark: SparkSession, h5Paths: Seq[String], folder: String,
                     channels: Seq[FlashChannel] = FlashReader.referenceChannels,
                     ubidOffset: Int = 5,
                     forceRecreate: Boolean = false,
                     suffix: String = "",
                     filterTimedByElectron: Boolean = true,
                     splitSectorFromTof: Boolean = false,
                     daq: String = FlashReader.DaqHextof,
                     numPulses: Int = 0)
      : (DataFrame, DataFrame) = {
    val sets = bufferPaths(h5Paths, folder, suffix)
    if (!forceRecreate) {
      schemaCheck(spark, sets.map(_.electron), electronSchema(channels))
      schemaCheck(spark, sets.map(_.timed), timedSchema(channels))
    }
    filesToProcess(spark, sets, forceRecreate).foreach { s =>
      FlashReader.readFlashH5(spark, Seq(s.raw), channels, ubidOffset,
        daq = daq, numPulses = numPulses)
        .write.mode("overwrite").parquet(s.electron)
      FlashReader.readFlashTimedH5(spark, Seq(s.raw), channels, ubidOffset,
        filterTimedByElectron, daq = daq, numPulses = numPulses)
        .write.mode("overwrite").parquet(s.timed)
    }
    // re-key file_id to the global sorted position so ids stay stable
    // across incremental loads (each buffer was written with file_id 0).
    // ONE multi-path scan per granularity, file_id derived from the
    // buffer-directory name through a literal map — a per-file
    // read + N-way unionByName planned 2N relations and took ~30 s of
    // pure driver analysis at 100 files (LoaderBench amortizing mode
    // caught it); buffer dir names are unique by construction
    // (electron_<stem>/timed_<stem> under one folder).
    def loadKeyed(paths: Seq[String]): DataFrame = {
      val nameToId: Map[String, Long] = paths.zipWithIndex.map { case (p, i) =>
        p.substring(p.lastIndexOf('/') + 1) -> i.toLong
      }.toMap
      // duplicate basenames across source dirs would silently collapse in
      // the map and corrupt file_id stability — refuse up front
      require(nameToId.size == paths.size,
        s"duplicate buffer dir basenames across ${paths.size} paths " +
          s"(only ${nameToId.size} distinct)")
      // input_file_name() is URI-encoded — decode before the lookup so a
      // dir name with a space/%/non-ASCII stem still resolves; and fail
      // LOUDLY on a miss (a silent null file_id corrupts the cross-file
      // forward fill with no error)
      spark.read.parquet(paths: _*)
        .withColumn("file_id", coalesce(
          element_at(typedlit(nameToId),
            regexp_extract(url_decode(input_file_name()), "([^/]+)/[^/]+$", 1)),
          raise_error(concat(
            lit("FlashBuffer.loadKeyed: no file_id for input file "),
            input_file_name()))))
    }
    val electron0 = loadKeyed(sets.map(_.electron))
    val timed0 = loadKeyed(sets.map(_.timed))
    val electron1 = fillAcrossFiles(electron0, channels)
    val timed1 = fillAcrossFiles(timed0, channels)
    val electron =
      if (splitSectorFromTof && electron1.columns.contains("dldTimeSteps"))
        FlashReader.splitDldSectorId(electron1)
      else electron1
    (electron, timed1)
  }
}
