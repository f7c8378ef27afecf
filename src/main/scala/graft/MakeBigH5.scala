package graft

import graft.io.{FlashChannel, FlashReader, Hdf5File, Hdf5Writer}

/** Production-size synthetic raw files for the loader crossover receipt
  * (VERDICT r16 task 4): the reference's flash/sxp fixtures hold ~4k
  * electron rows per ~478 KB file, so the measured rows/s at fixture
  * scale is dominated by the per-file fixed floor (listing + footer +
  * per-file H5 parse setup) and says nothing about production file
  * sizes. This tool tiles a real fixture K× along its TRAIN axis —
  * every dataset the channel set touches is repeated K times on axis 0,
  * index (train-id) datasets offset per copy so ids stay unique and
  * monotone — producing ~K× the electron rows per file in the exact
  * format `FlashReader` parses. Values are bit-identical repeats of
  * real fixture data, so per-row parse work is faithful.
  *
  * Usage:
  *   runMain graft.MakeBigH5 describe                 — fixture shapes
  *   runMain graft.MakeBigH5 <flash|sxp> <K> <files> <destDir>
  */
object MakeBigH5 {
  private val FlashFix = "/root/reference/tests/data/loader/flash/FLASH1_USER3_stream_2_run43878_file1_20230130T153807.1.h5"
  private val SxpFix = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"

  /** Distinct dataset paths a channel set touches, split into
    * (train-id-like paths to offset, value paths to repeat). The sxp
    * masterCounter carries macrobunch ids — offset it too so the
    * output train column stays unique across copies. */
  private def datasetPaths(channels: Seq[FlashChannel]): (Seq[String], Seq[String]) = {
    val idx = channels.map(_.indexKey).distinct
    val masterish = channels.filter(_.name == FlashReader.TrainAlias)
      .map(_.datasetKey)
    val vals = channels.map(_.datasetKey).distinct
      .filterNot(p => idx.contains(p) || masterish.contains(p))
    ((idx ++ masterish).distinct, vals)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("describe")) {
      Seq("flash" -> (FlashFix, FlashReader.referenceChannels),
        "sxp" -> (SxpFix, FlashReader.sxpChannels)).foreach {
        case (tag, (path, chans)) =>
          val f = Hdf5File.fromPath(java.nio.file.Paths.get(path))
          val (idx, vals) = datasetPaths(chans)
          (idx ++ vals).foreach { p =>
            println(s"$tag ${if (idx.contains(p)) "IDX" else "VAL"} " +
              s"${f.shape(p).mkString("x")} $p")
          }
      }
      return
    }
    val daq = args(0)
    val k = args(1).toInt
    val nFiles = args(2).toInt
    val dest = java.nio.file.Paths.get(args(3))
    java.nio.file.Files.createDirectories(dest)
    val (fix, chans) = daq match {
      case "flash" => (FlashFix, FlashReader.referenceChannels)
      case "sxp" => (SxpFix, FlashReader.sxpChannels)
      case other => sys.error(s"unknown daq $other")
    }
    val f = Hdf5File.fromPath(java.nio.file.Paths.get(fix))
    val (idxPaths, valPaths) = datasetPaths(chans)
    val stride = 10000000L // train-id offset per copy: unique + monotone
    (0 until nFiles).foreach { fi =>
      // build the dataset tree for this file: every channel dataset
      // tiled k times along axis 0; ids offset by (file*k + copy)*stride
      val nodes: Seq[(String, Hdf5Writer.Node)] = (idxPaths ++ valPaths).map { p =>
        val dims = f.shape(p)
        val data = f.readDoubles(p)
        val rest = dims.tail
        val rowLen = rest.product.toInt.max(1)
        val out = new Array[Double](data.length * k)
        var c = 0
        while (c < k) {
          System.arraycopy(data, 0, out, c * data.length, data.length)
          if (idxPaths.contains(p)) {
            val off = (fi.toLong * k + c) * stride
            var i = c * data.length
            val end = i + data.length
            while (i < end) { out(i) += off; i += 1 }
          }
          c += 1
        }
        rowLen // silence unused (rest.product covers 1-D too)
        (p, Hdf5Writer.DoubleDataset(p.substring(p.lastIndexOf('/') + 1),
          (dims.head * k) +: rest, out))
      }
      // assemble nested groups from the absolute paths
      def build(prefix: String, entries: Seq[(List[String], Hdf5Writer.Node)]): Seq[Hdf5Writer.Node] = {
        val (leaves, deeper) = entries.partition(_._1.lengthCompare(1) == 0)
        val groups = deeper.groupBy(_._1.head).toSeq.sortBy(_._1).map {
          case (g, sub) =>
            Hdf5Writer.Group(g, build(s"$prefix/$g", sub.map(e => (e._1.tail, e._2))))
        }
        leaves.map(_._2) ++ groups
      }
      val tree = build("", nodes.map { case (p, n) =>
        (p.stripPrefix("/").split("/").toList, n)
      })
      val name = daq match {
        case "flash" => f"FLASH1_USER3_stream_2_run${90000 + fi}%d_file1_big.1.h5"
        case _ => f"RAW-R${9000 + fi}%04d-DA03-S00000.h5"
      }
      Hdf5Writer.write(tree, Seq("creator" -> "graft-bigh5"),
        dest.resolve(name).toString, Hdf5Writer.Latest)
      println(s"wrote ${dest.resolve(name)} (k=$k)")
    }
  }
}
