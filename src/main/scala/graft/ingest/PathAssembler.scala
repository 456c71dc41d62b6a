package graft.ingest

import graft.model.StixMeta
import scala.collection.mutable

/** STIX-path intermediate dict -> one STIX 2.0-style observation.
  *
  * The reference's dict2observation (firepit/woodchipper.py:185-283) walks
  * keys like `process:opened_connection_refs[0].dst_ref.value` and
  * materializes the referenced SCO graph as an observation's indexed
  * `objects` map, wiring `_ref`/`_refs` values to object indexes. Same
  * algorithm here over an explicit node tree:
  *  - a path with no ref hop is a (possibly dotted) property of the root
  *    object of its type;
  *  - `x_ref.` descends into a child object whose type comes from
  *    StixMeta.refType, disambiguated by value shape for ipv4/ipv6;
  *  - `x_refs[i].` descends into slot i of a reference list;
  *  - a `#tag` suffix forces a separate object instance of the same type
  *    (woodchipper.py:203-206);
  *  - keys without `:` are observation attributes;
  *  - `protocols` values are listified (STIX requires a list).
  *
  * Output feeds Flatten.flatten20 unchanged: indexed objects, ref index
  * values, rank marking and deterministic ids all happen there.
  */
object PathAssembler {

  type Rec = Map[String, Any]

  private class Node(var otype: String) {
    val props = mutable.LinkedHashMap.empty[String, Any]
    val refs = mutable.LinkedHashMap.empty[String, Node]
    val reflists = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[Int, Node]]
  }

  private val RefsIdx = """(.+_refs)\[(\d+)\]""".r

  /** KNOWN_TIMESTAMPS (firepit/timestamp.py:3-13). */
  private[ingest] val knownTimestamps: Set[String] = Set(
    "accessed", "created", "date", "end", "first_observed", "last_observed",
    "modified", "start", "timestamp")

  /** Lenient text timestamp -> RFC-3339 UTC at millisecond precision,
    * truncating extra digits (timefmt/to_datetime, firepit/timestamp.py).
    * Unparseable values pass through untouched. */
  private[graft] def normTs(v: Any): Any = v match {
    case s: String =>
      val t = s.trim.replace(' ', 'T')
      val zoned = t.endsWith("Z") || t.matches(""".*[+-]\d\d:?\d\d$""")
      try {
        val instant =
          if (zoned) java.time.OffsetDateTime.parse(t).toInstant
          else java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC)
        java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
          .withZone(java.time.ZoneOffset.UTC)
          .format(instant)
      } catch { case _: java.time.format.DateTimeParseException => s }
    case other => other
  }

  private def ipShape(v: Any): Option[String] = {
    val s = v.toString
    if (s.matches("""\d{1,3}(\.\d{1,3}){3}""")) Some("ipv4-addr")
    else if (s.contains(':') && s.matches("[0-9a-fA-F:.]+")) Some("ipv6-addr")
    else None
  }

  private def childType(fromType: String, refName: String, hint: Option[Any]): String = {
    val cands = StixMeta.refType(fromType, refName)
    cands match {
      case Seq(one)                             => one
      case s if s.contains("ipv4-addr")         => hint.flatMap(ipShape).getOrElse("ipv4-addr")
      case Seq()                                => hint.flatMap(ipShape).getOrElse("x-unknown")
      case s                                    => s.head
    }
  }

  /** Split a path on dots OUTSIDE single quotes; quoted segments keep their
    * quotes (`hashes.'SHA-1'` -> ["hashes", "'SHA-1'"]) so downstream
    * flattening/makeid see the reference's key spelling. */
  private def splitSegments(path: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    path.foreach {
      case '\'' => inQuote = !inQuote; sb.append('\'')
      case '.' if !inQuote => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    out += sb.toString
    out.result()
  }

  private def insert(node: Node, path: String, v: Any): Unit = {
    val segs = splitSegments(path)
    val head = segs.head
    val isHop = head.endsWith("_ref") || RefsIdx.pattern.matcher(head).matches
    if (!isHop) {
      if (segs.length == 1) {
        val value = if (path == "protocols" && !v.isInstanceOf[Seq[_]]) Seq(v.toString) else v
        node.props(path) = value
      } else {
        // nested property (hashes.'SHA-1', extensions.'x'.y): build real
        // nested maps so jsonNormalize re-flattens canonically and makeid
        // sees the structured hashes dict (set_obs_prop/recreate_dict,
        // woodchipper.py:161-182)
        var m = node.props
          .getOrElseUpdate(head, mutable.LinkedHashMap.empty[String, Any])
          .asInstanceOf[mutable.LinkedHashMap[String, Any]]
        segs.tail.init.foreach { s =>
          m = m.getOrElseUpdate(s, mutable.LinkedHashMap.empty[String, Any])
            .asInstanceOf[mutable.LinkedHashMap[String, Any]]
        }
        m(segs.last) = v
      }
    } else {
      val rest = segs.drop(1).mkString(".")
      val hint = if (rest.isEmpty || rest == "value") Some(v) else None
      head match {
        case RefsIdx(refName, i) =>
          val slots = node.reflists.getOrElseUpdate(refName, mutable.LinkedHashMap.empty)
          val child = slots.getOrElseUpdate(i.toInt, new Node(childType(node.otype, refName, hint)))
          if (rest.isEmpty) child.props("value") = v else insert(child, rest, v)
        case refName =>
          val child = node.refs.getOrElseUpdate(refName, new Node(childType(node.otype, refName, hint)))
          if (rest.isEmpty) child.props("value") = v else insert(child, rest, v)
      }
    }
  }

  /** Assemble one observation from a path dict. */
  def assemble(paths: Rec): Rec = {
    val roots = mutable.LinkedHashMap.empty[String, Node]
    val obsAttrs = mutable.LinkedHashMap.empty[String, Any]
    paths.foreach { case (k0, v) =>
      if (v != null) {
        // `#tag` suffix forces a distinct object instance of the same type
        val (k, tag) = k0.indexOf('#') match {
          case -1 => (k0, "")
          case i  => (k0.substring(0, i), k0.substring(i + 1))
        }
        val ci = k.indexOf(':')
        if (ci < 0) {
          // observation timestamps are re-rendered RFC-3339 at ms precision
          // (dict2observation: timefmt(dateutil.parse(val)),
          // woodchipper.py:205-210)
          obsAttrs(k) = if (knownTimestamps.contains(k)) normTs(v) else v
        } else {
          val t = k.substring(0, ci)
          val rootKey = if (tag.isEmpty) t else s"$t#$tag"
          insert(roots.getOrElseUpdate(rootKey, new Node(t)), k.substring(ci + 1), v)
        }
      }
    }

    // children emitted before parents so every ref value is an object index
    val objects = mutable.LinkedHashMap.empty[String, Any]
    def emit(n: Node): String = {
      val refEntries = n.refs.toSeq.map { case (r, c) => r -> (emit(c): Any) }
      val listEntries = n.reflists.toSeq.map { case (r, slots) =>
        r -> (slots.toSeq.sortBy(_._1).map(s => emit(s._2)): Any)
      }
      val idx = objects.size.toString
      objects(idx) = (Map[String, Any]("type" -> n.otype) ++ n.props ++ refEntries ++ listEntries)
      idx
    }
    roots.values.foreach(emit)

    val first = obsAttrs.getOrElse("first_observed", "1970-01-01T00:00:00.000Z")
    Map[String, Any](
      "type" -> "observed-data",
      "id" -> s"observed-data--${java.util.UUID.randomUUID()}",
      "first_observed" -> first,
      "last_observed" -> obsAttrs.getOrElse("last_observed", first),
      "number_observed" -> obsAttrs.getOrElse("number_observed", 1L)) ++
      (obsAttrs -- Seq("first_observed", "last_observed", "number_observed")) +
      ("objects" -> objects.toMap)
  }
}
