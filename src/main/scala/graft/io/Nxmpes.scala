package graft.io

import org.json4s._
import org.json4s.jackson.JsonMethods

import scala.collection.mutable

/** Config-driven NXmpes metadata mapping — the Spark-native twin of the
  * reference's pynxtools-based NeXus conversion (io/nexus.py:14 to_nexus
  * feeding `convert()` with config/NXmpes_config.json): a JSON config
  * whose keys are NeXus template paths and whose values are either
  * literals or `@attrs:metadata/...` references into the MetaHandler tree,
  * rendered as a conformant HDF5 group/dataset/attribute hierarchy.
  *
  * Config grammar (the pynxtools template dialect the reference config
  * uses, re-implemented from the config file's observable structure):
  *   - Keys are `/`-separated paths; nested JSON objects extend the path.
  *   - A `CLASS[name]` segment is a group called `name` of NeXus class
  *     `NX` + lowercase(CLASS); a bare UPPERCASE segment (e.g. `ENTRY`)
  *     is the group lowercase(CLASS) of that class; a lowercase segment
  *     is a field (terminal) or a plain subgroup (non-terminal).
  *   - A terminal `@attr` segment is an attribute — of the sibling field
  *     with the same prefix (`duration/@units`), else of the group.
  *   - String values: `@attrs:metadata/<path>` pulls from the metadata
  *     tree; `@eln:<path>` is an electronic-lab-notebook source (no ELN
  *     in scope — never resolves, exists so reference configs load);
  *     `@link:<target>` renders as a REAL HDF5 soft link (h5py/pynxtools
  *     parity; the pure-JVM reader follows it);
  *     `"['a', 'b', ...]"` is a fallback chain (first resolvable entry
  *     wins; a plain-string entry is a literal default); a leading `!`
  *     marks the field required — unresolvable required paths are
  *     collected into the returned report (and throw when `strict`).
  *   - A `name_*{A,B,...}` group segment expands once per variant with
  *     `*` substituted into the subtree's names and values (the
  *     per-lens-element pattern).
  *   - `@data:` references (the NXdata section) are skipped here: the
  *     histogram cube, axes, signal and units are written natively by
  *     [[SedWriter.nexus]]'s cube builder, which already produces the
  *     NXdata group the config describes.
  *
  * Value→HDF5 mapping: strings become scalar fixed-size string datasets,
  * numbers float64/int64 scalars, numeric arrays 1-d float64 datasets,
  * booleans int64 0/1 (the h5py bool storage simplified to a standard
  * integer type).
  */
object Nxmpes {

  /** Outcome of a mapping pass: NeXus paths that resolved, required
    * (`!`) paths whose every source was unresolvable, and attribute paths
    * that resolved but could NOT be applied — attributes of a Link-valued
    * field (an HDF5 soft link carries no attributes of its own; they live
    * on the link's TARGET, so a config `@units` sibling of an `@link:`
    * entry is surfaced here instead of being silently dropped). */
  case class Report(resolved: Seq[String], missingRequired: Seq[String],
                    unapplied: Seq[String] = Nil)

  /** The library's bundled NXmpes mapping config (resource
    * `nxmpes_config.json`) — same dialect as the reference's
    * config/NXmpes_config.json, with source paths matching graft's
    * MetaHandler/CalibrationStore tree. */
  lazy val defaultConfig: String = {
    val in = getClass.getResourceAsStream("/nxmpes_config.json")
    require(in != null, "resource nxmpes_config.json missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private[io] sealed trait Value
  private[io] case class Str(s: String) extends Value
  private[io] case class Num(d: Double) extends Value
  private[io] case class Int64(l: Long) extends Value
  private[io] case class Bool(b: Boolean) extends Value
  private[io] case class Arr(ds: Array[Double]) extends Value
  private[io] case class Link(target: String) extends Value

  // ---- metadata-tree lookup --------------------------------------------

  /** Walk the MetaHandler tree by `/`-separated keys; normalizes json4s
    * artifacts (BigInt, List) to the Value algebra. */
  private def lookup(meta: Map[String, Any], path: String): Option[Value] = {
    val segs = path.split('/').filter(_.nonEmpty).toList
    def walk(node: Any, rest: List[String]): Option[Any] = (node, rest) match {
      case (v, Nil) => Some(v)
      case (m: Map[_, _], k :: tail) =>
        m.asInstanceOf[Map[String, Any]].get(k).flatMap(walk(_, tail))
      case _ => None
    }
    walk(meta, segs).flatMap {
      case s: String => Some(Str(s))
      case d: Double => Some(Num(d))
      case f: Float => Some(Num(f.toDouble))
      case l: Long => Some(Int64(l))
      case i: Int => Some(Int64(i.toLong))
      case bi: BigInt => Some(Int64(bi.toLong))
      case b: Boolean => Some(Bool(b))
      case xs: Seq[_] =>
        val ds = xs.flatMap {
          case d: Double => Some(d)
          case l: Long => Some(l.toDouble)
          case i: Int => Some(i.toDouble)
          case bi: BigInt => Some(bi.toDouble)
          case _ => None
        }
        if (ds.length == xs.length && ds.nonEmpty) Some(Arr(ds.toArray)) else None
      case _ => None // sub-tree where a leaf is expected
    }
  }

  // ---- value resolution ------------------------------------------------

  private val FallbackEntry = "'([^']*)'".r

  /** Resolve one config value against the metadata tree. Returns the
    * resolved value (None = unresolvable) and whether it was required. */
  private def resolveValue(v: JValue, meta: Map[String, Any]): (Option[Value], Boolean) = v match {
    case JString(raw0) =>
      val required = raw0.startsWith("!")
      val raw = if (required) raw0.tail else raw0
      val entries: Seq[String] =
        if (raw.startsWith("[") && raw.endsWith("]"))
          FallbackEntry.findAllMatchIn(raw).map(_.group(1)).toSeq
        else Seq(raw)
      val resolved = entries.iterator.map {
        case e if e.startsWith("@attrs:metadata/") => lookup(meta, e.stripPrefix("@attrs:metadata/"))
        case e if e.startsWith("@attrs:") => lookup(meta, e.stripPrefix("@attrs:"))
        case e if e.startsWith("@eln:") => None // no ELN source in scope
        case e if e.startsWith("@link:") => Some(Link(e.stripPrefix("@link:")))
        case e if e.startsWith("@data:") => None // NXdata handled natively
        case e => Some(Str(e)) // literal default
      }.collectFirst { case Some(x) => x }
      (resolved, required)
    case JDouble(d) => (Some(Num(d)), false)
    case JDecimal(d) => (Some(Num(d.toDouble)), false)
    case JInt(i) => (Some(Int64(i.toLong)), false)
    case JLong(l) => (Some(Int64(l)), false)
    case JBool(b) => (Some(Bool(b)), false)
    case JArray(xs) =>
      val ds = xs.flatMap {
        case JDouble(d) => Some(d)
        case JDecimal(d) => Some(d.toDouble)
        case JInt(i) => Some(i.toDouble)
        case JLong(l) => Some(l.toDouble)
        case _ => None
      }
      (if (ds.length == xs.length && ds.nonEmpty) Some(Arr(ds.toArray)) else None, false)
    case _ => (None, false)
  }

  // ---- template-path parsing -------------------------------------------

  private val ClassName = """([A-Za-z0-9_]+)\[([^\]]+)\]""".r
  private val Wildcard = """(.*)\*\{([^}]*)\}(.*)""".r

  /** One path segment → (hdf5 name, NX_class if the segment declares one). */
  private def parseSegment(seg: String): (String, Option[String]) = seg match {
    case ClassName(cls, name) => (name, Some("NX" + cls.toLowerCase))
    case s if s.nonEmpty && s.forall(c => c.isUpper || c.isDigit || c == '_') =>
      (s.toLowerCase, Some("NX" + s.toLowerCase))
    case s => (s, None)
  }

  /** Flatten the nested config into ordered (path-segments, value) rows,
    * expanding `*{A,B,...}` wildcard groups. */
  private def flatten(j: JValue, prefix: Vector[String]): Seq[(Vector[String], JValue)] = j match {
    case JObject(fields) =>
      fields.flatMap { case JField(k, v) =>
        val segs = k.split('/').filter(_.nonEmpty).toVector
        segs.lastOption match {
          case Some(Wildcard(_, variants, _)) if v.isInstanceOf[JObject] =>
            variants.split(',').map(_.trim).filter(_.nonEmpty).toSeq.flatMap { variant =>
              val sub = substitute(v, variant)
              val expanded = segs.init :+ segs.last.replace("*{" + variants + "}", variant)
              flatten(sub, prefix ++ expanded)
            }
          case _ => flatten(v, prefix ++ segs)
        }
      }
    case leaf => Seq((prefix, leaf))
  }

  /** Substitute `*` for a wildcard variant throughout a subtree's keys
    * and string values. */
  private def substitute(j: JValue, variant: String): JValue = j match {
    case JObject(fields) => JObject(fields.map { case JField(k, v) =>
      JField(k.replace("*", variant), substitute(v, variant))
    })
    case JString(s) => JString(s.replace("*", variant))
    case other => other
  }

  // ---- HDF5 tree construction ------------------------------------------

  private final class FieldB(val name: String, val value: Value) {
    val attrs = mutable.LinkedHashMap.empty[String, Any]
  }
  private final class GroupB(val name: String, var nxClass: Option[String]) {
    val groups = mutable.LinkedHashMap.empty[String, GroupB]
    val fields = mutable.LinkedHashMap.empty[String, FieldB]
    val attrs = mutable.LinkedHashMap.empty[String, Any]
    def subgroup(nm: String, cls: Option[String]): GroupB = {
      val g = groups.getOrElseUpdate(nm, new GroupB(nm, cls))
      if (g.nxClass.isEmpty && cls.isDefined) g.nxClass = cls
      g
    }
  }

  private def attrValue(v: Value): Any = v match {
    case Str(s) => s
    case Num(d) => d
    case Int64(l) => l
    case Bool(b) => if (b) 1L else 0L
    case Arr(ds) => ds.mkString("[", ",", "]") // attr arrays as text (vectors etc.)
    case Link(t) => t
  }

  private def toNode(g: GroupB): Hdf5Writer.Group = {
    val fieldNodes: Seq[Hdf5Writer.Node] = g.fields.values.toSeq.map { f =>
      val attrs = f.attrs.toSeq
      f.value match {
        case Str(s) => Hdf5Writer.StringDataset(f.name, s, attrs)
        case Num(d) => Hdf5Writer.DoubleDataset(f.name, Nil, Array(d), attrs)
        case Int64(l) => Hdf5Writer.LongDataset(f.name, Nil, Array(l), attrs)
        case Bool(b) => Hdf5Writer.LongDataset(f.name, Nil, Array(if (b) 1L else 0L), attrs)
        case Arr(ds) => Hdf5Writer.DoubleDataset(f.name, Seq(ds.length.toLong), ds, attrs)
        case Link(t) =>
          // a REAL HDF5 soft link (what h5py/pynxtools emit for @link):
          // the reader resolves it to the target object transparently
          Hdf5Writer.SoftLink(f.name, t)
      }
    }
    val groupNodes = g.groups.values.toSeq.map(toNode)
    val clsAttr = g.nxClass.map(c => "NX_class" -> (c: Any)).toSeq
    Hdf5Writer.Group(g.name, fieldNodes ++ groupNodes, clsAttr ++ g.attrs.toSeq)
  }

  /** Map `configJson` over `meta`. Returns the children/attributes to
    * place under `/entry` (the config's `/ENTRY/...` subtree), root
    * attributes (e.g. `/@default`), and the resolution report.
    * `strict = true` throws on missing required fields, naming them all
    * (the pynxtools validation posture). */
  def map(configJson: String, meta: Map[String, Any], strict: Boolean = false):
      (Seq[Hdf5Writer.Node], Seq[(String, Any)], Seq[(String, Any)], Report) = {
    val j = try JsonMethods.parse(configJson) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"invalid NXmpes config: not valid JSON (${e.getMessage})")
    }
    val entry = new GroupB("entry", Some("NXentry"))
    val rootAttrs = mutable.LinkedHashMap.empty[String, Any]
    val resolvedPaths = mutable.ArrayBuffer.empty[String]
    val missing = mutable.ArrayBuffer.empty[String]

    // Two passes: values first, then attributes. Attribute keys may
    // precede their field's value in a config (the reference file orders
    // `AXISNAME[x]/@depends_on` before `AXISNAME[x]`), and an attribute
    // whose field never resolved must NOT leave a stray group behind
    // (e.g. `rdeform_field/@units: ""` when the deform field is absent).
    val rows = flatten(j, Vector.empty).filterNot { case (segs, rawValue) =>
      // skip the NXdata template section — built natively from the cube
      segs.exists { s => parseSegment(s)._2.contains("NXdata") } ||
        (rawValue match { case JString(s) => s.contains("@data:"); case _ => false }) ||
        segs.exists(_.contains("*")) // un-expanded @data wildcards
    }
    val (attrRows, valueRows) = rows.partition(_._1.last.startsWith("@"))
    def resolveRow(segs: Vector[String], rawValue: JValue): Option[Value] = {
      val (valueOpt, required) = resolveValue(rawValue, meta)
      if (valueOpt.isDefined) resolvedPaths += segs.mkString("/")
      else if (required) missing += segs.mkString("/")
      valueOpt
    }
    valueRows.foreach { case (segs, rawValue) =>
      resolveRow(segs, rawValue).foreach { value =>
        segs.toList match {
          case "ENTRY" :: rest if rest.nonEmpty => insert(entry, rest, value)
          case _ => () // non-ENTRY top-level keys: nothing else in scope
        }
      }
    }
    attrRows.foreach { case (segs, rawValue) =>
      resolveRow(segs, rawValue).foreach { value =>
        segs.toList match {
          case "@default" :: Nil => rootAttrs += ("default" -> attrValue(value))
          case "ENTRY" :: rest if rest.nonEmpty => attachAttr(entry, rest, value)
          case _ => ()
        }
      }
    }
    if (strict && missing.nonEmpty)
      throw new IllegalArgumentException(
        s"NXmpes required fields unresolvable from metadata: ${missing.mkString(", ")}")
    val unapplied = mutable.ArrayBuffer.empty[String]
    collectLinkAttrs(entry, "ENTRY", unapplied)
    val node = toNode(entry)
    (node.children, node.attrs, rootAttrs.toSeq,
      Report(resolvedPaths.toSeq, missing.toSeq, unapplied.toSeq))
  }

  /** Attribute paths accumulated on Link-valued fields: toNode maps Link
    * to an HDF5 soft link, which cannot carry attributes, so these are
    * reported as unapplied rather than silently lost. */
  private def collectLinkAttrs(g: GroupB, prefix: String,
                               out: mutable.ArrayBuffer[String]): Unit = {
    g.fields.values.foreach { f =>
      f.value match {
        case Link(_) if f.attrs.nonEmpty =>
          f.attrs.keys.foreach(a => out += s"$prefix/${f.name}/@$a")
        case _ => ()
      }
    }
    g.groups.values.foreach(sg => collectLinkAttrs(sg, s"$prefix/${sg.name}", out))
  }

  /** Insert one resolved field/group value under a group builder
    * (creates intermediate groups; terminal segments become fields). */
  private def insert(g: GroupB, segs: List[String], value: Value): Unit = segs match {
    case field :: Nil =>
      val (fname, _) = parseSegment(field)
      g.fields.getOrElseUpdate(fname, new FieldB(fname, value))
      ()
    case group :: rest =>
      val (gname, cls) = parseSegment(group)
      insert(g.subgroup(gname, cls), rest, value)
    case Nil => ()
  }

  /** Attach a resolved attribute to its field or group — LOOKUP-ONLY:
    * an attribute whose target never materialized is dropped instead of
    * conjuring empty groups. */
  private def attachAttr(g: GroupB, segs: List[String], value: Value): Unit = segs match {
    case attr :: Nil if attr.startsWith("@") =>
      g.attrs += (attr.tail -> attrValue(value))
    case field :: attr :: Nil if attr.startsWith("@") =>
      val (fname, _) = parseSegment(field)
      g.fields.get(fname) match {
        case Some(f) => f.attrs += (attr.tail -> attrValue(value))
        case None => g.groups.get(fname) // attribute of an existing subgroup
          .foreach(_.attrs += (attr.tail -> attrValue(value)))
      }
    case group :: rest =>
      val (gname, _) = parseSegment(group)
      g.groups.get(gname).foreach(attachAttr(_, rest, value))
    case Nil => ()
  }
}
