package graft.sed

/** Nested metadata container — the Spark-native form of the reference's
  * MetaHandler (src/sed/core/metadata.py:12): an immutable tree of
  * String/Double/Long/Boolean leaves, Seq[Double] arrays, and nested
  * Map[String, Any] branches, accumulated stage-by-stage as a pipeline
  * chain builds and emitted into the NeXus export as HDF5 groups +
  * attributes (SedWriter.nexus). Immutable where the reference mutates:
  * `add` returns a new handler, so the fluent SedProcessor chain stays
  * value-semantic like the rest of the API. */
final case class MetaHandler(metadata: Map[String, Any] = Map.empty) {

  def apply(key: String): Any = metadata(key)

  /** Add an entry under `name` (metadata.py:95 add). `duplicatePolicy`
    * on an existing key: "raise" (DuplicateEntryError), "overwrite",
    * "merge" (recursive dict completion — EXISTING entries win, new keys
    * fill gaps, the config.py:226 complete_dictionary semantics), or
    * "append" (store as name_1, name_2, ...). */
  def add(entry: Any, name: String, duplicatePolicy: String = "raise"): MetaHandler =
    if (!metadata.contains(name) || duplicatePolicy == "overwrite")
      copy(metadata = metadata + (name -> entry))
    else duplicatePolicy match {
      case "raise" => throw new MetaHandler.DuplicateEntryError(name)
      case "append" =>
        val i = Iterator.from(1).find(i => !metadata.contains(s"${name}_$i")).get
        copy(metadata = metadata + (s"${name}_$i" -> entry))
      case "merge" =>
        (metadata(name), entry) match {
          case (old: Map[_, _], nw: Map[_, _]) =>
            copy(metadata = metadata + (name -> MetaHandler.completeDictionary(
              old.asInstanceOf[Map[String, Any]], nw.asInstanceOf[Map[String, Any]])))
          case (_: Map[_, _], _) =>
            throw new IllegalArgumentException(
              "Cannot merge dictionary with non-dictionary entry!")
          case _ => copy(metadata = metadata + (name -> entry))
        }
      case other => throw new IllegalArgumentException(
        s"could not interpret duplication handling method $other — " +
          "choose between raise, overwrite, merge, append")
    }

  /** Deterministic JSON rendering (metadata.py:39 __repr__). */
  def toJson: String = MetaHandler.renderJson(metadata)
}

object MetaHandler {

  final class DuplicateEntryError(name: String)
      extends RuntimeException(s"an entry $name already exists in metadata")

  /** Recursively complete `target` from `base`: keys missing in target
    * are added; keys present in BOTH keep target's value (descending
    * into sub-maps); a dict/non-dict mismatch raises (reference
    * core/config.py:226 complete_dictionary). */
  def completeDictionary(target: Map[String, Any], base: Map[String, Any]): Map[String, Any] =
    base.foldLeft(target) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (None, _) => acc + (k -> v)
        case (Some(t: Map[_, _]), b: Map[_, _]) =>
          acc + (k -> completeDictionary(t.asInstanceOf[Map[String, Any]],
            b.asInstanceOf[Map[String, Any]]))
        case (Some(t), b: Map[_, _]) => throw new IllegalArgumentException(
          s"Cannot merge dictionaries. Mismatch on Key $k: $t, $b.")
        case (Some(_), _) => acc // existing scalar wins
      }
    }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[sed] def renderJson(v: Any): String = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s""""${esc(k)}":${renderJson(x)}""" }
        .mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(renderJson).mkString("[", ",", "]")
    case s: String => s""""${esc(s)}""""
    case d: Double => if (d == d.toLong.toDouble) d.toLong.toString else d.toString
    case other => String.valueOf(other) // Long, Int, Boolean, null
  }
}
