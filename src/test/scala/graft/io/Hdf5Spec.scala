package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase

/** Validates the pure-JVM HDF5 reader against REAL files written by
  * libhdf5/h5py (the reference repo's loader test fixtures — read-only):
  * a classic-format mpes scan file and the v2-object-header EuXFEL sxp
  * file. These are ground-truth artifacts of the production writer, so a
  * structural misparse (B-tree walk, heap offsets, chunk assembly) cannot
  * produce the expected names, shapes, and physical value ranges. */
class Hdf5Spec extends SparkSpecBase {

  private val mpes = "/root/reference/tests/data/loader/mpes/Scan0030_2.h5"
  private val sxp = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"
  private val flash =
    "/root/reference/tests/data/loader/flash/FLASH1_USER3_stream_2_run43878_file1_20230130T153807.1.h5"

  private def have(p: String): Boolean = Files.exists(Paths.get(p))

  test("parses a real mpes scan file: streams, attributes, values") {
    assume(have(mpes))
    val f = Hdf5File.fromPath(Paths.get(mpes))
    assert(f.rootNames.contains("Stream_0") && f.rootNames.contains("msMarkers"))
    // Name attributes identify the physics channels
    val names = f.rootNames.filter(_.startsWith("Stream_"))
      .flatMap(s => f.attributes(s).get("Name")).map(_.toString)
    assert(Set("X", "Y", "t", "ADC").subsetOf(names.toSet))
    // all streams equal length, > 0
    val lens = f.rootNames.filter(_.startsWith("Stream_")).map(s => f.shape(s).head)
    assert(lens.distinct.size == 1 && lens.head > 0)
    // physical ranges: detector coords and TOF values
    val x = f.readDoubles("Stream_0")
    assert(x.forall(v => v >= 0 && v < 4096))
    val t = f.readDoubles("Stream_2")
    assert(t.forall(v => v > 0 && v < 1e7))
    // msMarkers is a nondecreasing cumulative event count ending <= n
    val mk = f.readDoubles("msMarkers")
    assert(mk.zip(mk.tail).forall { case (a, b) => a <= b } && mk.last <= lens.head)
    // file attribute used for timestamping exists
    assert(f.attributes("/").contains("FirstEventTimeStamp"))
  }

  test("parses v2 object headers + chunked datasets (real EuXFEL sxp file)") {
    assume(have(sxp))
    val f = Hdf5File.fromPath(Paths.get(sxp))
    assert(f.rootNames.toSet == Set("CONTROL", "INDEX", "INSTRUMENT"))
    val trains = f.readDoubles("/INDEX/trainId")
    assert(trains.length == f.shape("/INDEX/trainId").head)
    // train ids are large, strictly increasing integers
    assert(trains.forall(_ > 1e9))
    assert(trains.zip(trains.tail).forall { case (a, b) => b > a })
  }

  test("assembles 3-D chunked datasets (real FLASH DAQ file)") {
    assume(have(flash))
    val f = Hdf5File.fromPath(Paths.get(flash))
    val dld = "/uncategorised/FLASH.EXP/HEXTOF.DAQ/DLD1/value"
    val dims = f.shape(dld)
    assert(dims.length == 3 && dims.head == 20)
    val v = f.readDoubles(dld)
    assert(v.length == dims.product)
    assert(v.exists(x => x != 0.0 && !x.isNaN))
    // per-train index aligns with the value dataset's leading dim
    assert(f.shape("/uncategorised/FLASH.EXP/HEXTOF.DAQ/DLD1/index") == Seq(dims.head))
  }

  test("readMpesH5 loads a scan into a DataFrame distributed per file") {
    assume(have(mpes))
    import org.apache.spark.sql.functions._
    val df = SedReader.readMpesH5(spark, Seq(mpes))
    val n = Hdf5File.fromPath(Paths.get(mpes)).shape("Stream_0").head
    assert(df.count() == n)
    assert(df.columns.toSeq == Seq("file_id", "X", "Y", "t", "ADC", "timeStamps"))
    val row = df.agg(min("t"), max("t"), min("timeStamps"), max("timeStamps")).head()
    assert(row.getDouble(0) > 0 && row.getDouble(1) > row.getDouble(0))
    // timestamps: ~epoch-2022 seconds, spanning the ms-marker count
    val mk = Hdf5File.fromPath(Paths.get(mpes)).readDoubles("msMarkers")
    assert(row.getDouble(2) > 1.6e9 && row.getDouble(2) < 1.8e9)
    assert(math.abs((row.getDouble(3) - row.getDouble(2)) - mk.length / 1000.0) < 0.1)
    // the loaded frame drives the standard processor chain
    val hist = graft.operators.Binning.histogram(df,
      Seq(graft.operators.BinAxis("t", 100, 120000.0, 280000.0)))
    assert(hist.agg(sum("cnt")).head().getLong(0) > 0)
  }
  test("the fluent processor chain runs end to end on the real mpes scan") {
    assume(have(mpes))
    import org.apache.spark.sql.functions._
    val df = SedReader.readMpesH5(spark, Seq(mpes))
    // filter to the physical TOF window, energy-calibrate (flight-tube
    // formula with plausible mpes constants), bin the (X, Y, E) cube —
    // the reference's standard workflow, on the reference's own scan
    val cube = graft.sed.SedProcessor(df, xCol = "X", yCol = "Y", tofCol = "t")
      .filterColumn("t", 120000.0, 280000.0)
      .appendEnergyAxis(tofDistance = 0.9, timeOffset = 1e-8,
        binwidth = 4.125e-12, binning = 1, energyOffset = -30.0)
      .compute(Seq(
        graft.operators.BinAxis("X", 64, 0.0, 1800.0),
        graft.operators.BinAxis("Y", 64, 0.0, 1800.0),
        graft.operators.BinAxis("energy", 64, -60.0, 20.0)))
    val (n, nBins) = (cube.agg(sum("cnt")).head().getLong(0), cube.count())
    // a real photoemission scan concentrates counts in a structured
    // region: events land, and the cube is neither empty nor one bin
    assert(n > 100000, s"expected most of the 297k events in range, got $n")
    assert(nBins > 100 && nBins < 64L * 64 * 64, s"non-degenerate cube: $nBins bins")
  }

  test("Hdf5Writer round-trips through the reader proven on real files") {
    import Hdf5Writer._
    val dir = Files.createTempDirectory("h5w").toString
    val path = s"$dir/out.h5"
    val d2 = DoubleDataset("matrix", Seq(2L, 3L),
      Array(1.5, -2.25, 3.0, 4.0, 5.5, 6.125), attrs = Seq("units" -> "eV"))
    val l1 = LongDataset("ids", Seq(4L), Array(10L, 20L, -30L, 40L))
    val grp = Group("grp", Seq(d2, l1), attrs = Seq("NX_class" -> "NXdata", "weight" -> 2.5))
    Hdf5Writer.write(Seq(grp), Seq("creator" -> "graft"), path)

    val f = Hdf5File.fromPath(Paths.get(path))
    assert(f.rootNames == Seq("grp"))
    assert(f.attributes("/") == Map("creator" -> "graft"))
    assert(f.attributes("/grp")("NX_class") == "NXdata")
    assert(f.attributes("/grp")("weight") == 2.5)
    assert(f.shape("/grp/matrix") == Seq(2L, 3L))
    assert(f.readDoubles("/grp/matrix").sameElements(
      Array(1.5, -2.25, 3.0, 4.0, 5.5, 6.125)))
    assert(f.attributes("/grp/matrix")("units") == "eV")
    assert(f.readDoubles("/grp/ids").sameElements(Array(10.0, 20.0, -30.0, 40.0)))
  }

  test("latest format round-trips: superblock v3, OHDR v2 links, v2 filter pipeline") {
    import Hdf5Writer._
    val dir = Files.createTempDirectory("h5latest").toString
    val path = s"$dir/latest.h5"
    // low-entropy values so deflate genuinely shrinks the file
    val data = Array.tabulate(37 * 19)(i => math.floor(math.sin(i * 0.01) * 100))
    val wave = ChunkedDoubleDataset("wave", Seq(37L, 19L), Seq(16, 8), data,
      attrs = Seq("units" -> "counts")) // shuffle + deflate by default
    val flat = DoubleDataset("flat", Seq(5L), Array(1.0, 2.0, 3.0, 4.0, 5.0))
    val grp = Group("g", Seq(wave, flat), attrs = Seq("NX_class" -> "NXdata"))
    Hdf5Writer.write(Seq(grp), Seq("creator" -> "graft", "n" -> 42L), path, Latest)

    val bytes = Files.readAllBytes(Paths.get(path))
    assert(bytes(8) == 3, "file must carry a v3 superblock")
    assert(bytes.length < data.length * 8, "deflate must shrink the payload")
    val f = Hdf5File.fromPath(Paths.get(path))
    assert(f.rootNames == Seq("g"))
    assert(f.attributes("/")("creator") == "graft")
    assert(f.attributes("/")("n") == 42L)
    assert(f.shape("/g/wave") == Seq(37L, 19L))
    assert(f.readDoubles("/g/wave").sameElements(data))
    assert(f.attributes("/g/wave")("units") == "counts")
    assert(f.readDoubles("/g/flat").toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("relative soft-link targets resolve against the containing group") {
    import Hdf5Writer._
    val dir = Files.createTempDirectory("h5rellink").toString
    val path = s"$dir/rel.h5"
    // HDF5 soft links whose target does not start with '/' are resolved
    // relative to the group HOLDING the link (externally produced files
    // use this; our writer emits absolute targets)
    val inner = Group("inner", Seq(
      DoubleDataset("x", Seq(2L), Array(1.0, 2.0), attrs = Seq("units" -> "eV"))))
    val g = Group("g", Seq(
      inner,
      SoftLink("relds", "inner/x"),       // relative, into a sibling subgroup
      SoftLink("dotds", "./inner/x"),     // with a self-reference segment
      SoftLink("relgrp", "inner")))       // relative link to a group
    Hdf5Writer.write(Seq(g, SoftLink("abs", "/g/inner/x")), Nil, path, Latest)
    val f = Hdf5File.fromPath(Paths.get(path))
    assert(f.readDoubles("/g/relds").toSeq == Seq(1.0, 2.0))
    assert(f.readDoubles("/g/dotds").toSeq == Seq(1.0, 2.0))
    assert(f.readDoubles("/g/relgrp/x").toSeq == Seq(1.0, 2.0))
    assert(f.attributes("/g/relgrp/x")("units") == "eV")
    assert(f.readDoubles("/abs").toSeq == Seq(1.0, 2.0)) // absolute unchanged
  }

  test("superblock v1 round-trips (4-byte K-field shift before the address block)") {
    import Hdf5Writer._
    val dir = Files.createTempDirectory("h5v1").toString
    val path = s"$dir/v1.h5"
    val d = DoubleDataset("x", Seq(3L), Array(1.25, -2.5, 3.75), attrs = Seq("k" -> 7L))
    Hdf5Writer.write(Seq(d), Seq("creator" -> "graft"), path, ClassicV1)
    val bytes = Files.readAllBytes(Paths.get(path))
    assert(bytes(8) == 1, "file must carry a v1 superblock")
    val f = Hdf5File.fromPath(Paths.get(path))
    assert(f.rootNames == Seq("x"))
    assert(f.readDoubles("/x").toSeq == Seq(1.25, -2.5, 3.75))
    assert(f.attributes("/x")("k") == 7L)
  }

  test("classic chunked deflate+shuffle round-trips (v1 filter pipeline, edge chunks)") {
    import Hdf5Writer._
    val dir = Files.createTempDirectory("h5chunk").toString
    val path = s"$dir/chunked.h5"
    // 3-D with chunk dims that do NOT divide the dataset dims: edge chunks
    // are zero-padded on write and clipped on read
    val dims = Seq(5L, 7L, 11L)
    val data = Array.tabulate(5 * 7 * 11)(_.toDouble)
    val ds = ChunkedDoubleDataset("cube", dims, Seq(2, 3, 4), data)
    Hdf5Writer.write(Seq(ds), Nil, path, ClassicV0)
    val f = Hdf5File.fromPath(Paths.get(path))
    assert(f.shape("/cube") == dims)
    assert(f.readDoubles("/cube").sameElements(data))
    // deflate-only variant (no shuffle) exercises the single-filter path
    val p2 = s"$dir/deflate_only.h5"
    Hdf5Writer.write(Seq(ds.copy(name = "cube2", shuffle = false)), Nil, p2, ClassicV0)
    assert(Hdf5File.fromPath(Paths.get(p2)).readDoubles("/cube2").sameElements(data))
  }

  test("nexus export writes an NXdata HDF5 file with signal, axes, and counts") {
    import spark.implicits._
    val axes = Seq(graft.operators.BinAxis("a", 2, 0.0, 2.0), graft.operators.BinAxis("b", 3, 0.0, 3.0))
    val df = Seq((0.5, 0.5), (0.5, 0.5), (1.5, 2.5)).toDF("a", "b")
    val hist = graft.operators.Binning.histogram(df, axes)
    val dir = Files.createTempDirectory("nexus").toString
    val path = s"$dir/cube.nxs"
    SedWriter.nexus(hist, axes, path)
    val f = Hdf5File.fromPath(Paths.get(path))
    assert(f.rootNames == Seq("entry"))
    assert(f.attributes("/")("default") == "entry")
    assert(f.attributes("/entry")("NX_class") == "NXentry")
    assert(f.attributes("/entry/data")("NX_class") == "NXdata")
    assert(f.attributes("/entry/data")("signal") == "counts")
    assert(f.attributes("/entry/data")("axes") == "a:b")
    assert(f.shape("/entry/data/counts") == Seq(2L, 3L))
    assert(f.readDoubles("/entry/data/counts").toSeq == Seq(2.0, 0.0, 0.0, 0.0, 0.0, 1.0))
    assert(f.readDoubles("/entry/data/a").toSeq == Seq(0.5, 1.5))
    assert(f.readDoubles("/entry/data/b").toSeq == Seq(0.5, 1.5, 2.5))
  }
  test("compressed nexus export: identical cube, much smaller file") {
    val axes = Seq(graft.operators.BinAxis("a", 64, 0.0, 64.0),
      graft.operators.BinAxis("b", 64, 0.0, 64.0))
    val df = spark.range(1000)
      .selectExpr("CAST(id % 64 AS DOUBLE) AS a", "CAST((id * 7) % 64 AS DOUBLE) AS b")
    val hist = graft.operators.Binning.histogram(df, axes)
    val dir = Files.createTempDirectory("nexusz").toString
    SedWriter.nexus(hist, axes, s"$dir/plain.nxs")
    SedWriter.nexus(hist, axes, s"$dir/packed.nxs", compress = true)
    val plain = Hdf5File.fromPath(Paths.get(s"$dir/plain.nxs"))
    val packed = Hdf5File.fromPath(Paths.get(s"$dir/packed.nxs"))
    assert(packed.readDoubles("/entry/data/counts")
      .sameElements(plain.readDoubles("/entry/data/counts")))
    assert(packed.attributes("/entry/data")("signal") == "counts")
    val szPlain = Files.size(Paths.get(s"$dir/plain.nxs"))
    val szPacked = Files.size(Paths.get(s"$dir/packed.nxs"))
    assert(szPacked < szPlain / 2, s"compressed $szPacked vs plain $szPlain")
  }

  test("readTrainH5 explodes the real sxp file into per-hit rows") {
    assume(have(sxp))
    import org.apache.spark.sql.functions._
    val base = "/INSTRUMENT/SXP_TR_XPES/DET/MCP_DETECTOR:output/data"
    val df = SedReader.readTrainH5(spark, Seq(sxp),
      electronChannels = Map(
        "dldPosX" -> s"$base/x", "dldPosY" -> s"$base/y",
        "dldTimeSteps" -> s"$base/t", "pulseId" -> s"$base/starterCounter"),
      trainIdKey = s"$base/trainId",
      validityChannel = "dldTimeSteps",
      trainChannels = Map("timeStamp" -> "/INDEX/timestamp"))
    // expected row count = nonzero t cells, computed independently
    val f = Hdf5File.fromPath(Paths.get(sxp))
    val expected = f.readDoubles(s"$base/t").count(_ != 0.0)
    assert(df.count() == expected && expected > 0)
    assert(df.columns.toSeq == Seq("file_id", "train_id", "electron_id",
      "dldPosX", "dldPosY", "dldTimeSteps", "pulseId", "timeStamp"))
    // train ids come from the index dataset; 50 distinct trains at most
    val trains = df.select(countDistinct("train_id")).head().getLong(0)
    assert(trains > 0 && trains <= f.shape(s"$base/trainId").head)
    // spot-check: first hit of the first train matches the raw arrays
    val t0 = f.readDoubles(s"$base/trainId")(0).toLong
    val first = df.filter(col("train_id") === t0 && col("electron_id") === 0)
      .select("dldPosX").head().getDouble(0)
    assert(first == f.readDoubles(s"$base/x")(0))
  }
}
