package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Offline mpes analyzer-metadata derivation (reference
  * loader/mpes/metadata.py:81 fetch_epics_metadata, the non-network
  * half). Tables mirror the reference's published mpes example config
  * (src/sed/config/mpes_example_config.yaml aperture_config /
  * lens_mode_config). */
class MpesMetadataSpec extends AnyFunSuite {
  import MpesMetadata._

  private val ts2018 = 1516736115.0 // 2018-01-23T19:35:15Z
  private val ts2020 = 1579808115.0 // 2020-01-23T19:35:15Z

  private val epoch2018 = ApertureEpoch(
    faSize = Seq(
      "750" -> ((-3.0, -1.4), (-5.4, -4.6)),
      "grid" -> ((-3.0, -1.4), (0.15, 1.75)),
      "1500" -> ((-3.0, -1.4), (6.25, 7.75)),
      "200" -> ((3.3, 4.4), (-5.4, -4.6)),
      "open" -> ((-15.0, -9.0), (-15.0, -8.9))),
    caSize = Seq("50" -> (8.0, 8.4), "100" -> (3.4, 3.8),
      "grid" -> (-5.9, -5.3), "open" -> (-12.0, -8.0)))

  private val epoch2020 = ApertureEpoch(
    faSize = Seq(
      "750" -> ((-6.2, -4.8), (5.0, 6.0)),
      "100" -> ((0.5, 0.9), (-7.0, -6.0)),
      "open" -> ((-15.0, -8.5), (-15.0, -8.9))),
    caSize = Seq("50" -> (9.0, 11.0), "100" -> (5.1, 5.9)))

  private val lensModes = Seq(
    "6kV_kmodem4.0_20VTOF_v3.sav" -> Map(
      "Extr" -> 6000.0, "UCA" -> 1200.0, "A" -> 420.07, "B" -> 2494.8,
      "TOF" -> 20.0),
    "6kV_spatialsmall_30VTOF.sav" -> Map(
      "Extr" -> 6000.0, "UCA" -> 1200.0, "A" -> 403.07, "B" -> 2500.0,
      "TOF" -> 30.0))

  private val config = MetadataConfig(
    apertureConfig = Seq(ts2018 -> epoch2018, ts2020 -> epoch2020),
    lensModeConfig = lensModes)

  private def analyzer(m: Map[String, Any]): Map[String, Any] =
    m("instrument").asInstanceOf[Map[String, Any]]("analyzer")
      .asInstanceOf[Map[String, Any]]

  test("aperture sizes resolve against the epoch dated before the file") {
    val meta = Map[String, Any]("file" -> Map[String, Any](
      "KTOF:Apertures:m1.RBV" -> -2.0, "KTOF:Apertures:m2.RBV" -> -5.0,
      "KTOF:Apertures:m3.RBV" -> 3.6))
    // mid-2019 file -> 2018 epoch: fa (-2.0, -5.0) = '750', ca 3.6 = '100'
    val a = analyzer(enrich(meta, config, ts2018 + 1e7))
    assert(a("fa_size") === 750.0 && a("ca_size") === 100.0)
    assert(a("fa_shape") === "circle" && a("ca_shape") === "circle")
    // 2021 file -> 2020 epoch: same motors no longer match any fa key
    val b = analyzer(enrich(meta, config, ts2020 + 1e7))
    assert(b("fa_size").asInstanceOf[Double].isNaN)
    // 2020-epoch positions resolve in the 2020 tables
    val meta20 = Map[String, Any]("file" -> Map[String, Any](
      "KTOF:Apertures:m1.RBV" -> 0.7, "KTOF:Apertures:m2.RBV" -> -6.5,
      "KTOF:Apertures:m3.RBV" -> 5.5))
    val c = analyzer(enrich(meta20, config, ts2020 + 1e7))
    assert(c("fa_size") === 100.0 && c("ca_size") === 100.0)
  }

  test("non-numeric aperture keys set the shape, not the size") {
    val meta = Map[String, Any]("file" -> Map[String, Any](
      "KTOF:Apertures:m1.RBV" -> -10.0, "KTOF:Apertures:m2.RBV" -> -10.0,
      "KTOF:Apertures:m3.RBV" -> -5.5))
    val a = analyzer(enrich(meta, config, ts2018 + 1.0))
    assert(a("fa_shape") === "open" && a("fa_size").asInstanceOf[Double].isNaN)
    assert(a("ca_shape") === "grid" && a("ca_size").asInstanceOf[Double].isNaN)
  }

  test("a file dated before every epoch wraps to the latest (reference quirk)") {
    val meta = Map[String, Any]("file" -> Map[String, Any](
      "KTOF:Apertures:m1.RBV" -> 0.7, "KTOF:Apertures:m2.RBV" -> -6.5))
    // (0.7, -6.5) only exists in the 2020 tables; a 2017 file still
    // resolves because stamps[idx-1] wraps to the last epoch
    val a = analyzer(enrich(meta, config, ts2018 - 1e7))
    assert(a("fa_size") === 100.0)
  }

  test("lens voltages resolve the mode, projection, and scheme at 0.5% tolerance") {
    def volts(table: Map[String, Double], jitter: Double): Map[String, Any] =
      table.map { case (k, v) => s"KTOF:Lens:$k:V" -> (v * (1.0 + jitter): Any) }
    val meta = Map[String, Any]("file" -> volts(lensModes.head._2, 0.004))
    val a = analyzer(enrich(meta, config, ts2018 + 1.0))
    assert(a("lens_mode") === "6kV_kmodem4.0_20VTOF_v3.sav")
    assert(a("projection") === "reciprocal" && a("scheme") === "momentum dispersive")
    // spatial mode name flips the projection
    val metaSp = Map[String, Any]("file" -> volts(lensModes(1)._2, 0.0))
    val b = analyzer(enrich(metaSp, config, ts2018 + 1.0))
    assert(b("lens_mode") === "6kV_spatialsmall_30VTOF.sav")
    assert(b("projection") === "real" && b("scheme") === "spatial dispersive")
    // voltages off by >0.5% match nothing
    val metaOff = Map[String, Any]("file" -> volts(lensModes.head._2, 0.02))
    assert(!analyzer(enrich(metaOff, config, ts2018 + 1.0)).contains("lens_mode"))
  }

  test("existing instrument entries are preserved and analyzer entries merged") {
    val meta = Map[String, Any](
      "file" -> Map[String, Any]("KTOF:Apertures:m3.RBV" -> 8.2),
      "instrument" -> Map[String, Any]("beamline" -> "FHI",
        "analyzer" -> Map[String, Any]("model" -> "METIS")))
    val out = enrich(meta, config, ts2018 + 1.0)
    val inst = out("instrument").asInstanceOf[Map[String, Any]]
    assert(inst("beamline") === "FHI")
    val a = inst("analyzer").asInstanceOf[Map[String, Any]]
    assert(a("model") === "METIS" && a("ca_size") === 50.0)
  }
}
