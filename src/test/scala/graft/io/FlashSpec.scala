package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Flash/sxp multi-granularity loader + buffer handler, validated
  * against the reference's REAL raw fixtures (two different runs of the
  * FLASH HEXTOF test beamtime). */
class FlashSpec extends SparkSpecBase {

  private val dir = "/root/reference/tests/data/loader/flash"
  private val run43878 = s"$dir/FLASH1_USER3_stream_2_run43878_file1_20230130T153807.1.h5"
  private val run43879 = s"$dir/FLASH1_USER3_stream_2_run43879_file1_20230130T153807.1.h5"
  private def have: Boolean =
    Files.exists(Paths.get(run43878)) && Files.exists(Paths.get(run43879))

  test("run ids parse from FLASH and EuXFEL raw file names") {
    assert(FlashReader.runIdOf("FLASH1_USER3_stream_2_run43878_file1_x.1.h5").contains(43878L))
    assert(FlashReader.runIdOf("RAW-R0016-DA03-S00000.h5").contains(16L))
    assert(FlashReader.runIdOf("whatever.h5").isEmpty)
  }

  test("multi-run load: stable file/run ids and electron rows from both runs") {
    assume(have)
    val df = FlashReader.readFlashH5(spark, Seq(run43879, run43878)).cache()
    // ids follow SORTED path order regardless of argument order
    val byFile = df.groupBy("file_id", "run_id").count()
      .orderBy("file_id").collect()
    assert(byFile.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 43878L), (1L, 43879L)))
    // per-file electron counts are properties of the real files
    assert(byFile.map(_.getLong(2)).toSeq === Seq(4027L, 4213L))
    // (file, train, pulse, electron) is a unique key
    assert(df.select("file_id", "train_id", "pulse_id", "electron_id")
      .distinct().count() === df.count())
    // multi-electron pulses exist and ids count from 0
    assert(df.agg(max("electron_id")).head().getLong(0) > 0)
    assert(df.agg(min("electron_id")).head().getLong(0) === 0L)
    assert(df.agg(min("pulse_id")).head().getLong(0) >= 0L)
    df.unpersist()
  }

  test("per-train aux sub-channels and per-pulse channels join onto electrons") {
    assume(have)
    val df = FlashReader.readFlashH5(spark, Seq(run43878)).cache()
    val f = Hdf5File.fromPath(Paths.get(run43878))
    val dld = "/uncategorised/FLASH.EXP/HEXTOF.DAQ/DLD1"
    val dims = f.shape(s"$dld/value")
    val trains = f.readDoubles(s"$dld/index")
    val value = f.readDoubles(s"$dld/value")
    val hits = dims(2).toInt
    // sampleBias = aux (slice 4) column 0 of the first train
    val expectedBias = value((0 * dims(1).toInt + 4) * hits + 0)
    val got = df.filter(col("train_id") === trains(0).toLong)
      .agg(first("sampleBias")).head().getDouble(0)
    assert(got === expectedBias)
    // delayStage has its own (later-starting) train index: electron rows
    // before its first reading carry null, rows at/after carry the value
    val dsBase = "/zraw/FLASH.SYNC/LASER.LOCK.EXP/F1.PG.OSC/FMC0.MD22.1.ENCODER_POSITION.RD/dGroup"
    val dsTrains = f.readDoubles(s"$dsBase/index")
    val dsVals = f.readDoubles(s"$dsBase/value")
    val firstDs = dsTrains(0).toLong
    assert(df.filter(col("train_id") < firstDs && col("delayStage").isNotNull)
      .count() === 0L)
    val at = df.filter(col("train_id") === firstDs)
      .agg(first("delayStage")).head().getDouble(0)
    assert(at === dsVals(0))
    // per-pulse gmdTunnel: value for (train 0, pulse p) matches the raw
    // [train × 8 × 500] plane at slice 0
    val gmBase = "/FL1/Photon Diagnostic/GMD/Pulse resolved energy/energy tunnel"
    val gmTrains = f.readDoubles(s"$gmBase/index")
    val gmDims = f.shape(s"$gmBase/value")
    val gm = f.readDoubles(s"$gmBase/value")
    val p0 = df.filter(col("train_id") === gmTrains(0).toLong && col("gmdTunnel").isNotNull)
      .select("pulse_id", "gmdTunnel").orderBy("pulse_id").head()
    val expectedGm = gm((0 * gmDims(1).toInt + 0) * gmDims(2).toInt + p0.getLong(0).toInt)
    assert(p0.getDouble(1) === expectedGm)
    df.unpersist()
  }

  test("timed frame is the pulse-resolution cut, filterable by electron presence") {
    assume(have)
    val filtered = FlashReader.readFlashTimedH5(spark, Seq(run43878))
    val unfiltered = FlashReader.readFlashTimedH5(spark, Seq(run43878),
      filterTimedByElectron = false)
    val e = FlashReader.readFlashH5(spark, Seq(run43878))
    // filtered timed rows = distinct electron (train, pulse) pairs
    assert(filtered.count() ===
      e.select("train_id", "pulse_id").distinct().count())
    // unfiltered additionally has pulse slots with no electron data
    assert(unfiltered.count() > filtered.count())
    assert(filtered.select("train_id", "pulse_id").distinct().count() === filtered.count())
  }

  test("buffer: create-once, incremental skip, schema drift diagnosis, cross-file fill") {
    assume(have)
    val folder = Files.createTempDirectory("flashbuf").toString
    val (e1, t1) = FlashBuffer.processAndLoad(spark, Seq(run43878, run43879), folder)
    val sets = FlashBuffer.bufferPaths(Seq(run43878, run43879), folder)
    assert(sets.forall(s => Files.exists(Paths.get(s.electron))))
    assert(e1.count() === 8240L && t1.count() > 0)
    // nothing left to process once buffers exist
    assert(FlashBuffer.filesToProcess(spark, sets).isEmpty)
    // cross-file forward fill: the second file's rows before its own
    // first delayStage reading inherit the last value of the first file
    val rawPerFile = FlashReader.readFlashH5(spark, Seq(run43878, run43879))
    val rawNulls = rawPerFile.filter(col("file_id") === 1 && col("delayStage").isNull).count()
    val filledNulls = e1.filter(col("file_id") === 1 && col("delayStage").isNull).count()
    assert(rawNulls > 0L, "fixture should have a leading per-train gap in file 1")
    assert(filledNulls === 0L)
    // schema drift: a channel added to the config after buffering is
    // named in the load-time error
    val extra = FlashReader.referenceChannels :+
      FlashChannel("bogusChan", FlashReader.PerTrain, "/nope/index", "/nope/value")
    val err = intercept[IllegalStateException] {
      FlashBuffer.processAndLoad(spark, Seq(run43878, run43879), folder, extra)
    }
    assert(err.getMessage.contains("Missing in parquet: bogusChan"))
  }

  test("sxp: the real EuXFEL run loads through the preset and the buffer path") {
    val sxp = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"
    assume(Files.exists(Paths.get(sxp)))
    val df = FlashReader.readSxpH5(spark, Seq(sxp)).cache()
    try {
      // macrobunch splitting on the real run: 50 buffer rows explode into
      // 45 distinct derived trains; ids are rowIndexId + boundary ordinal
      assert(df.count() === 2043L)
      assert(df.select("run_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(16L))
      val trains = df.select("train_id").distinct().collect().map(_.getLong(0))
      assert(trains.length === 45)
      val f = Hdf5File.fromPath(Paths.get(sxp))
      val idxTrains = f.readDoubles(
        "/INSTRUMENT/SXP_TR_XPES/DET/MCP_DETECTOR:output/data/trainId").map(_.toLong)
      assert(trains.min === idxTrains.min)
      assert(trains.forall(t => t >= idxTrains.min && t <= idxTrains.max + 50))
      // electron ids are the running count within (train, pulse)
      val idGaps = df.groupBy("train_id", "pulse_id")
        .agg(max("electron_id").as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n") - 1).count()
      assert(idGaps === 0L)
      // per-train fills are constant within a derived train and never null
      // (the raw /INDEX keys precede every derived train of their row)
      assert(df.filter(col("timeStamp").isNull || col("delayStage").isNull).count() === 0L)
      val varying = df.groupBy("train_id")
        .agg(countDistinct("timeStamp").as("nt"), countDistinct("delayStage").as("nd"))
        .filter(col("nt") > 1 || col("nd") > 1).count()
      assert(varying === 0L)
      // timeStamp carries the config's 1e9 scale: epoch seconds, not ns
      val ts = df.agg(min("timeStamp")).head().getDouble(0)
      assert(ts > 1.6e9 && ts < 1.8e9, s"timeStamp not scaled to seconds: $ts")

      // buffer path end to end: create-once, skip, drift diagnosis
      val folder = Files.createTempDirectory("sxpbuf").toString
      val (e1, t1) = FlashBuffer.processAndLoad(spark, Seq(sxp), folder,
        FlashReader.sxpChannels, ubidOffset = 0, daq = FlashReader.DaqSxp)
      val sets = FlashBuffer.bufferPaths(Seq(sxp), folder)
      assert(sets.forall(s => Files.exists(Paths.get(s.electron)) &&
        Files.exists(Paths.get(s.timed))))
      assert(FlashBuffer.filesToProcess(spark, sets).isEmpty) // create-once
      assert(e1.count() === df.count() && t1.count() > 0)
      // buffered result == direct read (same rows, nulls filled identically)
      val cols = df.columns.sorted.toSeq
      assert(e1.select(cols.map(col): _*).collect().toSet ===
        df.select(cols.map(col): _*).collect().toSet)
      // config drift after buffering is diagnosed by field name
      val drifted = FlashReader.sxpChannels :+
        FlashChannel("bogusChan", FlashReader.PerTrain, "/nope/index", "/nope/value")
      val err = intercept[IllegalStateException] {
        FlashBuffer.processAndLoad(spark, Seq(sxp), folder, drifted,
          ubidOffset = 0, daq = FlashReader.DaqSxp)
      }
      assert(err.getMessage.contains("Missing in parquet: bogusChan"))
    } finally df.unpersist()
  }

  test("sxp: numPulses wraps microbunch ids modulo the machine cycle") {
    val sxp = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"
    assume(Files.exists(Paths.get(sxp)))
    val plain = FlashReader.readSxpH5(spark, Seq(sxp))
    val maxPulse = plain.agg(max("pulse_id")).head().getLong(0)
    assert(maxPulse > 10L)
    val wrapped = FlashReader.readSxpH5(spark, Seq(sxp), numPulses = 10)
    assert(wrapped.agg(max("pulse_id")).head().getLong(0) < 10L)
    assert(wrapped.count() === plain.count()) // wrapping relabels, never drops
  }

  test("sxp: ubidOffset shifts pulse ids after the modulo, matching the reference") {
    // reference order: `% num_pulses` first (sxp/loader.py:309), then
    // `- ubid_offset` (loader.py:324); shipped sxp configs use offset 0,
    // so an offset k must shift every pulse id by exactly -k
    val sxp = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"
    assume(Files.exists(Paths.get(sxp)))
    val base = FlashReader.readSxpH5(spark, Seq(sxp), numPulses = 10)
      .groupBy("pulse_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shifted = FlashReader.readSxpH5(spark, Seq(sxp), ubidOffset = 3, numPulses = 10)
      .groupBy("pulse_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shifted == base.map { case (p, n) => (p - 3) -> n })
  }

  test("sector id splits from the packed TOF word and reassembles") {
    assume(have)
    val df = FlashReader.readFlashH5(spark, Seq(run43878))
      .withColumn("orig", col("dldTimeSteps"))
    val split = FlashReader.splitDldSectorId(df)
    val bad = split.filter(
      col("dldSectorID") < 0 || col("dldSectorID") >= 8 ||
        col("dldTimeSteps") * 8 + col("dldSectorID") =!= col("orig")).count()
    assert(bad === 0L)
    // idempotent: an already-split frame is returned unchanged
    assert(FlashReader.splitDldSectorId(split).columns.toSeq === split.columns.toSeq)
  }

  test("missing channel keys raise a named error; removeInvalidFiles skips the file") {
    assume(have)
    val chans = FlashReader.referenceChannels :+
      FlashChannel("ghost", FlashReader.PerTrain, "/missing/index", "/missing/value")
    val err = intercept[org.apache.spark.SparkException] {
      FlashReader.readFlashH5(spark, Seq(run43878), chans).count()
    }
    assert(err.getMessage.contains("ghost") || err.getCause.getMessage.contains("ghost"))
    assert(FlashReader.readFlashH5(spark, Seq(run43878), chans,
      removeInvalidFiles = true).count() === 0L)
  }
}
