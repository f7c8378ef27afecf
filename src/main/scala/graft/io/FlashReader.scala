package graft.io

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One DAQ channel of a flash/sxp-style HDF5 file (reference:
  * src/sed/loader/flash/dataframe.py DataFrameCreator and
  * flash/utils.py:10 get_channels). `format` is one of
  * `per_electron` / `per_pulse` / `per_train`; every channel carries its
  * OWN train index dataset (`indexKey`) plus a value dataset
  * (`datasetKey`), optionally sliced along axis 1 (DLD channels share
  * one [train × slice × hit] dataset). A per-train auxiliary channel may
  * expose `subChannels`: named columns cut from the hit axis. */
case class FlashChannel(name: String, format: String,
                        indexKey: String, datasetKey: String,
                        slice: Option[Int] = None,
                        subChannels: Seq[(String, Int)] = Nil,
                        maxHits: Option[Int] = None,
                        scale: Option[Double] = None)

/** Distributed flash/sxp DAQ ingestion: multi-granularity channel
  * assembly ([per electron | per pulse | per train] → one event row per
  * electron), multi-run concatenation with stable run ids, and the
  * timed (pulse-resolution) twin frame — the Spark-native form of
  * reference src/sed/loader/flash/dataframe.py:22 DataFrameCreator and
  * loader.py. One task per raw file; the (trainId, pulseId, electronId)
  * multi-index join + forward fill the reference does in pandas is a
  * file-LOCAL merge-scan inside the task (all granularities of a train
  * live in the same file), so assembling N files is embarrassingly
  * parallel with zero shuffle; only the cross-file fill of leading
  * per-train gaps is a (linear, boundary-only) pass, done once on the
  * buffered frame by [[FlashBuffer.load]] via DfOps.forwardFill. */
object FlashReader {

  val PerElectron = "per_electron"
  val PerPulse = "per_pulse"
  val PerTrain = "per_train"
  /** DAQ dialects: FLASH HEXTOF (shared sliced DLD dataset, pulse plane
    * NaN-padded) vs EuXFEL SXP (per-channel 2-D hit arrays, macrobunches
    * concatenated per buffer row — see [[parseSxpFile]]). */
  val DaqHextof = "hextof"
  val DaqSxp = "sxp"
  /** The pulse-id channel is index, not data (flash/utils.py:6 PULSE_ALIAS). */
  val PulseAlias = "pulseId"

  /** Raised when a file lacks configured channel keys (reference
    * flash/utils.py:114 InvalidFileError — same remedy message). */
  final class InvalidFileException(val path: String, val invalid: Seq[String])
      extends RuntimeException(
        s"Channels not in file $path: ${invalid.mkString(", ")}. " +
          "Set removeInvalidFiles=true to skip such files.")

  /** The channel layout of the reference's FLASH HEXTOF test beamtime
    * (tests/data/loader/flash/config.yaml) — exercised against the real
    * fixture files in FlashSpec; real deployments pass their own set. */
  def referenceChannels: Seq[FlashChannel] = {
    val dld = "/uncategorised/FLASH.EXP/HEXTOF.DAQ/DLD1"
    Seq(
      FlashChannel(PulseAlias, PerElectron, s"$dld/index", s"$dld/value", Some(2)),
      FlashChannel("dldPosY", PerElectron, s"$dld/index", s"$dld/value", Some(0)),
      FlashChannel("dldPosX", PerElectron, s"$dld/index", s"$dld/value", Some(1)),
      FlashChannel("dldTimeSteps", PerElectron, s"$dld/index", s"$dld/value", Some(3)),
      FlashChannel("dldAux", PerTrain, s"$dld/index", s"$dld/value", Some(4),
        subChannels = Seq("sampleBias" -> 0, "tofVoltage" -> 1,
          "extractorVoltage" -> 2, "extractorCurrent" -> 3,
          "cryoTemperature" -> 4, "sampleTemperature" -> 5,
          "dldTimeBinSize" -> 15)),
      FlashChannel("timeStamp", PerTrain,
        "/uncategorised/FLASH.DIAG/TIMINGINFO/TIME1.BUNCH_FIRST_INDEX.1/index",
        "/uncategorised/FLASH.DIAG/TIMINGINFO/TIME1.BUNCH_FIRST_INDEX.1/time"),
      FlashChannel("delayStage", PerTrain,
        "/zraw/FLASH.SYNC/LASER.LOCK.EXP/F1.PG.OSC/FMC0.MD22.1.ENCODER_POSITION.RD/dGroup/index",
        "/zraw/FLASH.SYNC/LASER.LOCK.EXP/F1.PG.OSC/FMC0.MD22.1.ENCODER_POSITION.RD/dGroup/value"),
      FlashChannel("pulserSignAdc", PerPulse,
        "/FL1/Experiment/PG/SIS8300 100MHz ADC/CH6/TD/index",
        "/FL1/Experiment/PG/SIS8300 100MHz ADC/CH6/TD/value"),
      FlashChannel("gmdTunnel", PerPulse,
        "/FL1/Photon Diagnostic/GMD/Pulse resolved energy/energy tunnel/index",
        "/FL1/Photon Diagnostic/GMD/Pulse resolved energy/energy tunnel/value",
        Some(0)))
  }

  /** The train-id channel is index machinery too in the sxp DAQ (the
    * masterCounter macrobunch array; sxp/loader.py:206-209 removes both
    * pulseId and trainId from the output channel set). */
  val TrainAlias = "trainId"

  /** The channel layout of the reference's EuXFEL SXP test run
    * (tests/data/loader/sxp/config.yaml) — exercised against the real
    * RAW-R0016 fixture in FlashSpec; real deployments pass their own
    * set. pulseId = starterCounter (microbunch ids, also the train
    * splitter), trainId = masterCounter (macrobunch ids); both are index
    * machinery, not output columns. */
  def sxpChannels: Seq[FlashChannel] = {
    val det = "/INSTRUMENT/SXP_TR_XPES/DET/MCP_DETECTOR:output/data"
    Seq(
      FlashChannel(PulseAlias, PerElectron, s"$det/trainId", s"$det/starterCounter",
        maxHits = Some(500)),
      FlashChannel(TrainAlias, PerElectron, s"$det/trainId", s"$det/masterCounter",
        maxHits = Some(500)),
      FlashChannel("dldPosX", PerElectron, s"$det/trainId", s"$det/x", maxHits = Some(500)),
      FlashChannel("dldPosY", PerElectron, s"$det/trainId", s"$det/y", maxHits = Some(500)),
      FlashChannel("dldTimeSteps", PerElectron, s"$det/trainId", s"$det/t",
        maxHits = Some(500)),
      FlashChannel("timeStamp", PerTrain, "/INDEX/trainId", "/INDEX/timestamp",
        scale = Some(1e9)),
      FlashChannel("delayStage", PerTrain, "/INDEX/trainId",
        "/CONTROL/SCS_ILH_LAS/MDL/OPTICALDELAY_PP800/actualPosition/value"))
  }

  /** Electron-resolved output channels (excludes the pulse/train index
    * machinery). */
  def electronChannelNames(channels: Seq[FlashChannel]): Seq[String] =
    channels.filter(c => c.format == PerElectron &&
      c.name != PulseAlias && c.name != TrainAlias).map(_.name)

  /** Pulse/train channels that forward-fill onto electron rows, aux
    * expanded to its sub-channels (get_channels extend_aux=True). */
  def fillChannelNames(channels: Seq[FlashChannel]): Seq[String] =
    channels.filter(_.format == PerPulse).map(_.name) ++
      channels.filter(_.format == PerTrain).flatMap { c =>
        if (c.subChannels.nonEmpty) c.subChannels.map(_._1) else Seq(c.name)
      }

  /** Run id parsed from a raw file name: FLASH `..._run43878_...` or
    * EuXFEL `RAW-R0016-...` naming (reference loader.py run resolution). */
  def runIdOf(fileName: String): Option[Long] = {
    val flash = """.*_run(\d+)_.*""".r
    val xfel = """.*RAW-R(\d+)-.*""".r
    fileName match {
      case flash(id) => Some(id.toLong)
      case xfel(id) => Some(id.toLong)
      case _ => None
    }
  }

  /** Raw files of the given runs under `folder` (driver-side listing,
    * sorted for stable file ids — reference loader.py get_files_from_run_id). */
  def filesForRuns(spark: SparkSession, folder: String, runs: Seq[Long]): Seq[String] = {
    val want = runs.toSet
    val p = new org.apache.hadoop.fs.Path(folder)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter(f => runIdOf(f.getName).exists(want.contains))
      .map(_.toString).sorted
  }

  /** Channel names whose index/dataset keys are absent from the file
    * (reference dataframe.py:275 validate_channel_keys). */
  def invalidChannels(f: Hdf5File, channels: Seq[FlashChannel]): Seq[String] =
    channels.filter(c => !f.exists(c.indexKey) || !f.exists(c.datasetKey)).map(_.name)

  /** Read a channel as (train ids, row-major [T × H] plane, H). A 1-D
    * dataset is [T × 1]; `slice` cuts axis 1 of a 2-D/3-D dataset
    * (dataframe.py:67 get_dataset_array with np.take(axis=1));
    * `maxHits` caps axis 1 of a 2-D dataset and `scale` divides the
    * values (sxp/loader.py:408-424 max_hits truncation + scale). */
  private def readPlane(f: Hdf5File, c: FlashChannel): (Array[Double], Array[Double], Int) = {
    val trains = f.readDoubles(c.indexKey)
    val dims = f.shape(c.datasetKey)
    val data = f.readDoubles(c.datasetKey)
    val t = dims.head.toInt
    val plane = (dims.length, c.slice) match {
      case (1, _) => (data, 1)
      case (2, None) =>
        val h0 = dims(1).toInt
        c.maxHits.filter(_ < h0) match {
          case None => (data, h0)
          case Some(h) =>
            val out = new Array[Double](t * h)
            var i = 0
            while (i < t) { System.arraycopy(data, i * h0, out, i * h, h); i += 1 }
            (out, h)
        }
      case (2, Some(s)) =>
        val out = new Array[Double](t)
        var i = 0; while (i < t) { out(i) = data(i * dims(1).toInt + s); i += 1 }
        (out, 1)
      case (3, Some(s)) =>
        val d1 = dims(1).toInt; val d2 = dims(2).toInt
        val out = new Array[Double](t * d2)
        var i = 0
        while (i < t) {
          System.arraycopy(data, (i * d1 + s) * d2, out, i * d2, d2); i += 1
        }
        (out, d2)
      case (n, sl) => throw new UnsupportedOperationException(
        s"channel ${c.name}: ${n}-D dataset with slice=$sl")
    }
    val vals = c.scale match {
      case Some(sc) => plane._1.map(_ / sc)
      case None => plane._1
    }
    (trains, vals, plane._2)
  }

  /** Per-file multi-granularity assembly — the pandas
    * concat-on-multi-index + sort_index + ffill of dataframe.py:292 `df`
    * as one sorted merge over (trainId, pulseId, electronId). Returns
    * (electron rows, timed rows) as value sequences WITHOUT file/run ids
    * (the caller prepends them). */
  private[io] def parseFile(f: Hdf5File, channels: Seq[FlashChannel], ubidOffset: Int,
                            filterTimedByElectron: Boolean)
      : (Seq[(Long, Long, Long, Array[Double], Array[Double])],
         Seq[(Long, Long, Array[Double])]) = {
    val bad = invalidChannels(f, channels)
    if (bad.nonEmpty) throw new InvalidFileException("<file>", bad)

    val pulseCh = channels.find(_.name == PulseAlias).getOrElse(
      throw new IllegalArgumentException(s"channel set needs '$PulseAlias'"))
    val eChs = channels.filter(c => c.format == PerElectron && c.name != PulseAlias)
    val pChs = channels.filter(_.format == PerPulse)
    val tChs = channels.filter(_.format == PerTrain)
    val fillNames = fillChannelNames(channels)
    val nFill = fillNames.length
    val fillIdx = fillNames.zipWithIndex.toMap

    // --- electron block: shared [T × H] planes + pulse index ---
    val (eTrains, pulsePlane, hits) = readPlane(f, pulseCh)
    val ePlanes = eChs.map(c => readPlane(f, c)._2)
    // (train, pulse, hit) for every non-NaN pulse slot; stable sort by
    // (train, pulse) keeps hit order = electron arrival order, then the
    // running count within each (train, pulse) is the electron id
    // (dataframe.py:102 pulse_index)
    val slots = mutable.ArrayBuffer.empty[(Long, Long, Int)]
    var t = 0
    while (t < eTrains.length) {
      val trainId = eTrains(t).toLong
      var h = 0
      while (h < hits) {
        val pv = pulsePlane(t * hits + h)
        if (!pv.isNaN) slots += ((trainId, pv.toLong - ubidOffset, t * hits + h))
        h += 1
      }
      t += 1
    }
    val sorted = slots.sortBy(s => (s._1, s._2))
      .map { case (tr, p, slot) =>
        (tr, p, Array.tabulate(ePlanes.length)(c => ePlanes(c)(slot)))
      }.toSeq
    mergeFill(sorted, fillEntries(f, pChs, tChs, fillIdx), nFill, filterTimedByElectron)
  }

  /** Fill-channel entries keyed at (train, pulse): per-pulse values sit
    * at their pulse slot; per-train values sit at pulse 0
    * (dataframe.py:194 df_pulse / :230 df_train index shapes). */
  private def fillEntries(f: Hdf5File, pChs: Seq[FlashChannel], tChs: Seq[FlashChannel],
                          fillIdx: Map[String, Int]): Seq[(Long, Long, Int, Double)] = {
    val entries = mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    pChs.foreach { c =>
      val (trs, plane, np) = readPlane(f, c)
      val ci = fillIdx(c.name)
      var i = 0
      while (i < trs.length) {
        var j = 0
        while (j < np) {
          val v = plane(i * np + j)
          // zero pulses are invalid slots in the DAQ (dataframe.py:221)
          if (!v.isNaN && v != 0.0) entries += ((trs(i).toLong, j.toLong, ci, v))
          j += 1
        }
        i += 1
      }
    }
    tChs.foreach { c =>
      val (trs, plane, np) = readPlane(f, c)
      val subs = if (c.subChannels.nonEmpty) c.subChannels else Seq(c.name -> 0)
      subs.foreach { case (name, s) =>
        val ci = fillIdx(name)
        require(c.subChannels.isEmpty || s < np,
          s"aux sub-channel $name slice $s out of range ($np)")
        var i = 0
        while (i < trs.length) {
          val v = plane(i * np + (if (c.subChannels.isEmpty) 0 else s))
          if (!v.isNaN) entries += ((trs(i).toLong, 0L, ci, v))
          i += 1
        }
      }
    }
    entries.toSeq
  }

  /** The merged forward-fill walk shared by the flash and sxp parsers:
    * electron slots (already (train, pulse)-sorted, with their channel
    * values) pick up every fill value keyed at or before their (train,
    * pulse); electron ids are the running count within each key.
    * `dropNegativePulses` is the hextof `pulseId >= 0` cut
    * (flash/dataframe.py:307); the sxp loader has no such filter (its
    * dropna removes only NaN), so a nonzero ubid offset legitimately
    * yields negative pulse ids there. */
  private def mergeFill(sorted: Seq[(Long, Long, Array[Double])],
                        entries: Seq[(Long, Long, Int, Double)],
                        nFill: Int, filterTimedByElectron: Boolean,
                        dropNegativePulses: Boolean = true)
      : (Seq[(Long, Long, Long, Array[Double], Array[Double])],
         Seq[(Long, Long, Array[Double])]) = {
    val sortedEntries = entries.sortBy(e => (e._1, e._2))

    // --- merged forward-fill walk over (train, pulse) order ---
    // Electron rows at (t, p, e) inherit every fill value whose key
    // (t', p') <= (t, p) — exactly pandas sort_index + ffill, because a
    // fill row (t', p', 0) precedes all electron rows from (t', p').
    val last = Array.fill(nFill)(Double.NaN)
    var ei = 0 // entry cursor
    val electronOut = mutable.ArrayBuffer.empty[(Long, Long, Long, Array[Double], Array[Double])]
    val timedKeys = mutable.LinkedHashMap.empty[(Long, Long), (Array[Double], Boolean)]
    def advanceTo(train: Long, pulse: Long): Unit = {
      while (ei < sortedEntries.length && {
        val e = sortedEntries(ei); e._1 < train || (e._1 == train && e._2 <= pulse)
      }) {
        val e = sortedEntries(ei)
        // timed rows exist for every fill key, electrons or not; NaN =
        // "no direct value here", resolved by the ffill walk below
        val (arr, _) =
          timedKeys.getOrElseUpdate((e._1, e._2), (Array.fill(nFill)(Double.NaN), false))
        last(e._3) = e._4
        arr(e._3) = e._4
        ei += 1
      }
    }
    var si = 0
    var prevKey: (Long, Long) = null
    var curE = 0L
    while (si < sorted.length) {
      val (train, pulse, eVals) = sorted(si)
      curE = if (prevKey != null && prevKey == ((train, pulse))) curE + 1 else 0L
      prevKey = (train, pulse)
      advanceTo(train, pulse)
      if ((pulse >= 0 || !dropNegativePulses) && !eVals.exists(_.isNaN)) {
        electronOut += ((train, pulse, curE, eVals, last.clone()))
        val tk = timedKeys.getOrElseUpdate((train, pulse), (last.clone(), false))
        timedKeys((train, pulse)) = (tk._1, true)
      }
      si += 1
    }
    advanceTo(Long.MaxValue, Long.MaxValue) // drain remaining fill entries

    // timed frame = the electronId==0 cut of the combined index
    // (buffer_handler.py:164 _create_timed_dataframe): fill values at
    // every (train, pulse) key, restricted to keys with electron data
    // when filterTimedByElectron — re-walk for final ffilled values
    java.util.Arrays.fill(last, Double.NaN)
    val timedOut = mutable.ArrayBuffer.empty[(Long, Long, Array[Double])]
    timedKeys.toSeq.sortBy(_._1).foreach { case ((train, pulse), (arr, hasE)) =>
      var c = 0
      while (c < nFill) {
        if (!arr(c).isNaN) last(c) = arr(c); c += 1
      }
      if ((pulse >= 0 || !dropNegativePulses) && (!filterTimedByElectron || hasE))
        timedOut += ((train, pulse, last.clone()))
    }
    (electronOut.toSeq, timedOut.toSeq)
  }

  /** Per-file sxp (EuXFEL) assembly — reference sxp/loader.py:260
    * create_multi_index_per_electron + :440 create_dataframe_per_electron.
    * The sxp DAQ concatenates SEVERAL macrobunches' hits into one buffer
    * row: the microbunch-id array (the pulseId channel, starterCounter)
    * descends at each train boundary (`diff < -1`), the real train id is
    * the row's index id plus the boundary ordinal, and the reference's
    * `slice(index, train_end)` / `index = train_end + 1` walk EXCLUDES
    * the boundary hit itself and drops the padding tail after the last
    * boundary — both reproduced exactly. Per-train channels (timeStamp,
    * delayStage) are keyed by the raw /INDEX train ids and forward-fill
    * onto the derived electron trains through the same merged walk as
    * flash. `numPulses > 0` wraps microbunch ids modulo the machine
    * cycle (the config's num_pulses, new-DAQ data only). Electron ids
    * are the running count within (train, pulse) — the order-preserving
    * equivalent of the reference's value_counts + arange assembly. */
  private[io] def parseSxpFile(f: Hdf5File, channels: Seq[FlashChannel],
                               ubidOffset: Int, numPulses: Int,
                               filterTimedByElectron: Boolean)
      : (Seq[(Long, Long, Long, Array[Double], Array[Double])],
         Seq[(Long, Long, Array[Double])]) = {
    val bad = invalidChannels(f, channels)
    if (bad.nonEmpty) throw new InvalidFileException("<file>", bad)
    val mibCh = channels.find(_.name == PulseAlias).getOrElse(
      throw new IllegalArgumentException(s"channel set needs '$PulseAlias'"))
    val eChs = channels.filter(c => c.format == PerElectron &&
      c.name != PulseAlias && c.name != TrainAlias)
    val pChs = channels.filter(_.format == PerPulse)
    val tChs = channels.filter(_.format == PerTrain)
    val fillNames = fillChannelNames(channels)
    val fillIdx = fillNames.zipWithIndex.toMap

    val (idxTrains, mib, hits) = readPlane(f, mibCh)
    val ePlanes = eChs.map(c => readPlane(f, c)._2)
    val slots = mutable.ArrayBuffer.empty[(Long, Long, Array[Double])]
    var i = 0
    while (i < idxTrains.length) {
      val base = i * hits
      var ordinal = 0
      var segStart = 0
      var h = 0
      while (h < hits - 1) {
        if (mib(base + h + 1).toLong - mib(base + h).toLong < -1L) {
          // macrobunch [segStart, h): boundary hit h itself excluded
          val trainId = idxTrains(i).toLong + ordinal
          var s = segStart
          while (s < h) {
            val rawPulse = mib(base + s).toLong
            // offset applied AFTER the modulo, matching the reference
            // (sxp/loader.py:309 `% num_pulses` then :324 `- ubid_offset`);
            // the reference keeps post-subtraction values as-is (its
            // dropna only removes NaN), so no sign cut here
            val pulse = (if (numPulses > 0) rawPulse % numPulses else rawPulse) -
              ubidOffset
            slots += ((trainId, pulse,
              Array.tabulate(ePlanes.length)(c => ePlanes(c)(base + s))))
            s += 1
          }
          segStart = h + 1
          ordinal += 1
        }
        h += 1
      }
      // the tail after the last boundary is DAQ padding — dropped, like
      // the reference's walk which only emits up to the last train_end
      i += 1
    }
    val sorted = slots.sortBy(s => (s._1, s._2)).toSeq
    mergeFill(sorted, fillEntries(f, pChs, tChs, fillIdx),
      fillNames.length, filterTimedByElectron, dropNegativePulses = false)
  }

  private def openAndParse(path: String, channels: Seq[FlashChannel], ubidOffset: Int,
                           filterTimedByElectron: Boolean, daq: String = DaqHextof,
                           numPulses: Int = 0) = {
    val f = Hdf5File.fromHadoop(path, new org.apache.hadoop.conf.Configuration())
    try daq match {
      case DaqHextof => parseFile(f, channels, ubidOffset, filterTimedByElectron)
      case DaqSxp => parseSxpFile(f, channels, ubidOffset, numPulses, filterTimedByElectron)
      case other => throw new IllegalArgumentException(
        s"unknown daq '$other' — use '$DaqHextof' or '$DaqSxp'")
    } catch {
      case e: InvalidFileException => throw new InvalidFileException(path, e.invalid)
    }
  }

  private def idsOf(paths: Seq[String]): Seq[(String, Long, Long)] =
    paths.sorted.zipWithIndex.map { case (p, i) =>
      val base = p.substring(p.lastIndexOf('/') + 1)
      (p, i.toLong, runIdOf(base).getOrElse(-1L))
    }

  /** Electron-resolved frame over ≥1 raw files: one row per detected
    * electron with its pulse/train context forward-filled on. Columns:
    * file_id, run_id, train_id, pulse_id, electron_id, electron
    * channels..., fill channels... One task per file, no shuffle. */
  def readFlashH5(spark: SparkSession, paths: Seq[String],
                  channels: Seq[FlashChannel] = referenceChannels,
                  ubidOffset: Int = 5,
                  removeInvalidFiles: Boolean = false,
                  daq: String = DaqHextof,
                  numPulses: Int = 0): DataFrame = {
    val eNames = electronChannelNames(channels)
    val fNames = fillChannelNames(channels)
    val files = idsOf(paths)
    val rdd = spark.sparkContext.parallelize(files, math.max(1, files.size)).flatMap {
      case (path, fid, rid) =>
        val parsed =
          try Some(openAndParse(path, channels, ubidOffset,
            filterTimedByElectron = true, daq, numPulses))
          catch { case _: InvalidFileException if removeInvalidFiles => None }
        parsed.iterator.flatMap(_._1.iterator.map { case (t, p, e, ev, fv) =>
          // fill gaps surface as SQL nulls (not NaN) so the cross-file
          // forward fill and ordinary aggregates treat them as missing
          Row.fromSeq(Seq(fid, rid, t, p, e) ++ ev ++
            fv.map(v => if (v.isNaN) null else v))
        })
    }
    val schema = StructType(
      Seq(StructField("file_id", LongType), StructField("run_id", LongType),
        StructField("train_id", LongType), StructField("pulse_id", LongType),
        StructField("electron_id", LongType)) ++
        (eNames ++ fNames).map(c => StructField(c, DoubleType)))
    spark.createDataFrame(rdd, schema)
  }

  /** Pulse-resolution twin frame (the reference's "timed" dataframe):
    * one row per (train, pulse) with the fill channels, optionally only
    * where electron data exists. Columns: file_id, run_id, train_id,
    * pulse_id, fill channels... */
  def readFlashTimedH5(spark: SparkSession, paths: Seq[String],
                       channels: Seq[FlashChannel] = referenceChannels,
                       ubidOffset: Int = 5,
                       filterTimedByElectron: Boolean = true,
                       removeInvalidFiles: Boolean = false,
                       daq: String = DaqHextof,
                       numPulses: Int = 0): DataFrame = {
    val fNames = fillChannelNames(channels)
    val files = idsOf(paths)
    val rdd = spark.sparkContext.parallelize(files, math.max(1, files.size)).flatMap {
      case (path, fid, rid) =>
        val parsed =
          try Some(openAndParse(path, channels, ubidOffset, filterTimedByElectron,
            daq, numPulses))
          catch { case _: InvalidFileException if removeInvalidFiles => None }
        parsed.iterator.flatMap(_._2.iterator.map { case (t, p, fv) =>
          Row.fromSeq(Seq(fid, rid, t, p) ++ fv.map(v => if (v.isNaN) null else v))
        })
    }
    val schema = StructType(
      Seq(StructField("file_id", LongType), StructField("run_id", LongType),
        StructField("train_id", LongType), StructField("pulse_id", LongType)) ++
        fNames.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(rdd, schema)
  }

  /** Electron frame of EuXFEL SXP raw files (reference loader/sxp/
    * loader.py) — [[readFlashH5]] with the sxp parser and the sxp test
    * run's defaults (ubid_offset 0, no pulse wrapping). */
  def readSxpH5(spark: SparkSession, paths: Seq[String],
                channels: Seq[FlashChannel] = sxpChannels,
                ubidOffset: Int = 0, numPulses: Int = 0,
                removeInvalidFiles: Boolean = false): DataFrame =
    readFlashH5(spark, paths, channels, ubidOffset, removeInvalidFiles,
      daq = DaqSxp, numPulses = numPulses)

  /** Timed (pulse-resolution) twin of [[readSxpH5]]. */
  def readSxpTimedH5(spark: SparkSession, paths: Seq[String],
                     channels: Seq[FlashChannel] = sxpChannels,
                     ubidOffset: Int = 0, numPulses: Int = 0,
                     filterTimedByElectron: Boolean = true,
                     removeInvalidFiles: Boolean = false): DataFrame =
    readFlashTimedH5(spark, paths, channels, ubidOffset, filterTimedByElectron,
      removeInvalidFiles, daq = DaqSxp, numPulses = numPulses)

  /** Split a bit-packed detector column in two: low `bits` bits and the
    * remaining high bits (reference loader/utils.py:101
    * split_channel_bitwise / :148 split_dld_time_from_sector_id — the
    * HEXTOF DAQ packs the 3-bit sector id into the TOF-steps word).
    * Pure column algebra, codegen'd, no shuffle. */
  def splitChannelBitwise(df: DataFrame, inputCol: String,
                          lowCol: String, highCol: String, bits: Int,
                          overwrite: Boolean = false): DataFrame = {
    require(bits > 0, "bits must be positive")
    require(df.columns.contains(inputCol), s"column $inputCol not in dataframe")
    if (!overwrite)
      Seq(lowCol, highCol).filterNot(_ == inputCol).foreach(c =>
        require(!df.columns.contains(c), s"column $c already in dataframe"))
    val mask = 1L << bits
    df.withColumn(lowCol, (col(inputCol).cast("long") % mask).cast("int"))
      .withColumn(highCol, (col(inputCol).cast("long") / mask).cast("long"))
  }

  def splitDldSectorId(df: DataFrame, tofCol: String = "dldTimeSteps",
                       sectorCol: String = "dldSectorID",
                       reservedBits: Int = 3): DataFrame =
    if (df.columns.contains(sectorCol)) df // reference: already-split is a no-op
    else splitChannelBitwise(df, tofCol, sectorCol, tofCol, reservedBits,
      overwrite = true)
}
