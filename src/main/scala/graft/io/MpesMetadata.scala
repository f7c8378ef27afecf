package graft.io

/** Offline mpes instrument-metadata enrichment — the portable core of
  * reference src/sed/loader/mpes/metadata.py:81 fetch_epics_metadata:
  * given per-file channel values (EPICS PV means recorded in the file
  * metadata) and the beamline's aperture/lens-mode configuration tables,
  * derive the analyzer metadata the NeXus export carries — field/contrast
  * aperture shape+size, lens mode, projection, and scheme. The network
  * retrieval half of the reference (EPICS archiver fetch, elabFTW) is
  * environment-bound and out of scope; everything here is a pure
  * function over the metadata tree, so it composes with
  * [[graft.sed.MetaHandler]] and SedProcessor.addMetadata. */
object MpesMetadata {

  /** One dated aperture-configuration epoch (metadata.py aperture_config
    * entries): `faSize` keys map to ((fa_in lo,hi),(fa_hor lo,hi)) motor
    * ranges, `caSize` keys to a (lo,hi) range. A numeric key is a size
    * in µm; a non-numeric key ("open", "grid") is a shape. */
  case class ApertureEpoch(faSize: Seq[(String, ((Double, Double), (Double, Double)))],
                           caSize: Seq[(String, (Double, Double))])

  /** The offline slice of the reference's metadata config: dated
    * aperture epochs (epoch seconds), lens-mode voltage tables
    * (insertion-ordered — the FIRST entry defines the lens list, as the
    * reference iterates dict order), and the aperture motor channels. */
  case class MetadataConfig(
      apertureConfig: Seq[(Double, ApertureEpoch)],
      lensModeConfig: Seq[(String, Map[String, Double])],
      faInChannel: String = "KTOF:Apertures:m1.RBV",
      faHorChannel: String = "KTOF:Apertures:m2.RBV",
      caInChannel: String = "KTOF:Apertures:m3.RBV",
      lensVoltTolerance: Double = 0.005)

  private def num(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case _ => None
  }

  /** Enrich a metadata tree (MetaHandler shape, with channel values under
    * the "file" branch) with the derived instrument.analyzer entries.
    * Faithful to the reference's quirks: the aperture epoch is the last
    * one dated BEFORE the file start (a start before every epoch wraps
    * to the latest — the stamps[index-1] pick at metadata.py:142);
    * a matching numeric aperture key sets the size, a non-numeric key
    * sets the shape; lens voltages match a mode at 0.5% relative
    * tolerance; the mode string's second "_" token determines
    * projection ("spatial" → real) and scheme. */
  def enrich(metadata: Map[String, Any], config: MetadataConfig,
             fileStartTs: Double): Map[String, Any] = {
    val file = metadata.get("file") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    require(config.apertureConfig.nonEmpty, "apertureConfig must be non-empty")
    val epochs = config.apertureConfig.sortBy(_._1)
    val before = epochs.filter(_._1 < fileStartTs)
    val epoch = (if (before.nonEmpty) before.last else epochs.last)._2

    var analyzer: Map[String, Any] = Map(
      "fa_shape" -> "circle", "ca_shape" -> "circle",
      "fa_size" -> Double.NaN, "ca_size" -> Double.NaN)

    // field aperture: needs both motor positions
    for (faIn <- file.get(config.faInChannel).flatMap(num);
         faHor <- file.get(config.faHorChannel).flatMap(num)) {
      epoch.faSize.find { case (_, ((ilo, ihi), (hlo, hhi))) =>
        ilo < faIn && faIn < ihi && hlo < faHor && faHor < hhi
      }.foreach { case (key, _) =>
        key.toDoubleOption match {
          case Some(size) => analyzer += ("fa_size" -> size)
          case None => analyzer += ("fa_shape" -> key)
        }
      }
    }
    // contrast aperture: single motor
    for (caIn <- file.get(config.caInChannel).flatMap(num)) {
      epoch.caSize.find { case (_, (lo, hi)) => lo < caIn && caIn < hi }
        .foreach { case (key, _) =>
          key.toDoubleOption match {
            case Some(size) => analyzer += ("ca_size" -> size)
            case None => analyzer += ("ca_shape" -> key)
          }
        }
    }
    // lens mode from recorded voltages (first mode's keys = lens list)
    config.lensModeConfig.headOption.foreach { case (_, firstTable) =>
      val lenses = firstTable.keys.toSeq.sorted
      val volts = lenses.map(l =>
        file.get(s"KTOF:Lens:$l:V").flatMap(num).getOrElse(Double.NaN))
      config.lensModeConfig.find { case (_, table) =>
        lenses.zip(volts).forall { case (l, v) =>
          val ref = table.getOrElse(l, Double.NaN)
          math.abs(v - ref) <= config.lensVoltTolerance * math.abs(ref)
        }
      }.foreach { case (mode, _) => analyzer += ("lens_mode" -> mode) }
    }
    // projection/scheme from the mode string's second token
    analyzer.get("lens_mode").foreach { case mode: String =>
      val parts = mode.split("_")
      if (parts.length > 1) {
        if (parts(1).contains("spatial"))
          analyzer ++= Map("projection" -> "real", "scheme" -> "spatial dispersive")
        else
          analyzer ++= Map("projection" -> "reciprocal", "scheme" -> "momentum dispersive")
      }
    }

    val instrument = metadata.get("instrument") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val mergedAnalyzer = instrument.get("analyzer") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]] ++ analyzer
      case _ => analyzer
    }
    metadata + ("instrument" -> (instrument + ("analyzer" -> mergedAnalyzer)))
  }
}
