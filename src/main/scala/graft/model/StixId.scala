package graft.model

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.UUID

/** Deterministic STIX 2.1 identifiers.
  *
  * Mirrors the reference's id synthesis (firepit/stix21.py:53-106): a UUIDv5
  * over the canonical JSON of each type's ID-contributing properties, in the
  * firepit namespace. Deterministic ids are what make ingest idempotent and
  * dedupable across bundles (reference tests/test_storage.py:466-479).
  */
object Uuid5 {
  /** RFC 4122 §4.3 name-based UUID with SHA-1 (the JDK only ships v3/MD5). */
  def apply(namespace: UUID, name: String): UUID = {
    val md = MessageDigest.getInstance("SHA-1")
    val ns = java.nio.ByteBuffer.allocate(16)
    ns.putLong(namespace.getMostSignificantBits)
    ns.putLong(namespace.getLeastSignificantBits)
    md.update(ns.array())
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val bb = java.nio.ByteBuffer.wrap(h, 0, 16)
    new UUID(bb.getLong, bb.getLong)
  }
}

object StixId {
  val Namespace: UUID = UUID.fromString("00abedb4-aa42-466c-9c01-fed23315a9b7")

  /** Hash preference order per the STIX spec (stix21.py:10). */
  private val hashPref = Seq("MD5", "'SHA-1'", "'SHA-256'", "'SHA-512'")

  /** ID-contributing properties per SCO type (stix21.py:12-34). */
  val idProps: Map[String, Seq[String]] = Map(
    "artifact" -> Seq("hashes", "payload_bin"),
    "autonomous-system" -> Seq("number"),
    "directory" -> Seq("path"),
    "domain-name" -> Seq("value"),
    "email-addr" -> Seq("value"),
    "email-message" -> Seq("from_ref", "subject", "body"),
    "file" -> Seq("hashes", "name", "extensions", "parent_directory_ref"),
    "ipv4-addr" -> Seq("value"),
    "ipv6-addr" -> Seq("value"),
    "mac-addr" -> Seq("value"),
    "mutex" -> Seq("name"),
    "network-traffic" -> Seq("start", "end", "src_ref", "dst_ref", "src_port", "dst_port",
      "protocols", "extensions"),
    "process" -> Seq("x_unique_id"),
    "software" -> Seq("name", "cpe", "swid", "vendor", "version"),
    "url" -> Seq("value"),
    "user-account" -> Seq("account_type", "user_id", "account_login"),
    "windows-registry-keys" -> Seq("key", "values"),
    "x509-certificate" -> Seq("hashes", "serial_number"),
    "x-oca-asset" -> Seq("host_id", "device_id", "name", "hostname")
  )

  private val processUniqueIdProps =
    Seq("process_id", "process_uid", "process_unique_id", "process_guid")

  /** Compact canonical JSON with sorted keys (the reference serializes with
    * ujson.dumps(sort_keys=True, ensure_ascii=False): compact separators,
    * raw UTF-8). Longs render without decimal point; escaping is minimal. */
  def canonicalJson(v: Any): String = v match {
    case m: collection.Map[_, _] =>
      m.asInstanceOf[collection.Map[String, Any]]
        .toSeq
        .sortBy(_._1)
        .map { case (k, value) => s"${jsonStr(k)}:${canonicalJson(value)}" }
        .mkString("{", ",", "}")
    case s: Seq[_]     => s.map(canonicalJson).mkString("[", ",", "]")
    case s: String     => jsonStr(s)
    case null          => "null"
    case b: Boolean    => if (b) "true" else "false"
    case d: Double     => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString + ".0" else d.toString
    case other         => other.toString
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append("\"").toString
  }

  /** Deterministic id for an SCO; `obs` is the enclosing 2.0 observation
    * (used to resolve `_ref` index values and the process fallback chain). */
  def makeid(sco: Map[String, Any], obs: Map[String, Any] = null): String = {
    val scoType = sco("type").toString
    val props = idProps.getOrElse(scoType, Nil)
    var contrib = Map.empty[String, Any]

    props.foreach { prop =>
      if (prop == "hashes") {
        // empty hashes maps contribute nothing (reference's `if hashes:`
        // falsy-dict skip, stix21.py:60)
        sco.get("hashes").collect {
          case hashes: collection.Map[_, _] if hashes.nonEmpty =>
            val h = hashes.asInstanceOf[collection.Map[String, Any]]
            val chosen = hashPref.collectFirst {
              case ht if h.get(ht).exists(_ != null) => (ht.stripPrefix("'").stripSuffix("'"), h(ht))
            }
            val (k, v) = chosen.getOrElse {
              val first = h.keys.toSeq.sorted.head
              (first.stripPrefix("'").stripSuffix("'"), h(first))
            }
            contrib += ("hashes" -> Map(k -> v))
        }
      } else {
        sco.get(prop).foreach { value =>
          if (prop.endsWith("_ref") && obs != null) {
            // STIX 2.0 hook: ref value is an index into obs.objects
            val objects = obs.getOrElse("objects", Map.empty).asInstanceOf[collection.Map[String, Any]]
            objects.get(value.toString) match {
              case Some(target: collection.Map[_, _]) =>
                contrib += (prop -> makeid(target.asInstanceOf[collection.Map[String, Any]].toMap))
              case _ => () // unresolvable ref contributes nothing
            }
          } else contrib += (prop -> value)
        }
      }
    }

    if (scoType == "process" && !contrib.contains("x_unique_id")) {
      val exts = sco.getOrElse("extensions", Map.empty)
        .asInstanceOf[collection.Map[String, Any]]
      // scan ALL extension maps for the first non-null unique-id prop — the
      // reference iterates every extension dict (stix21.py:84-90); stopping
      // at the first Map would miss a uid carried by a later extension
      val fromExt = exts.values.iterator
        .collect { case ext: collection.Map[_, _] => ext.asInstanceOf[collection.Map[String, Any]] }
        .flatMap(e =>
          processUniqueIdProps.collectFirst { case p if e.get(p).exists(_ != null) => e(p) })
        .nextOption()
      fromExt match {
        case Some(uid) => contrib += ("x_unique_id" -> uid)
        case None if obs != null =>
          // pid + asset + last_observed fallback (stix21.py:92-98)
          val pid = sco.get("pid")
          val objects = obs.getOrElse("objects", Map.empty).asInstanceOf[collection.Map[String, Any]]
          val asset = objects.values.collectFirst {
            case o: collection.Map[_, _]
                if o.asInstanceOf[collection.Map[String, Any]].get("type").contains("x-oca-asset") =>
              val m = o.asInstanceOf[collection.Map[String, Any]]
              m.get("host_id").orElse(m.get("hostname"))
          }.flatten
          (pid, asset, obs.get("last_observed")) match {
            case (Some(p), Some(a), Some(ts)) => contrib += ("x_unique_id" -> s"${p}_${a}_$ts")
            case _                            => ()
          }
        case _ => ()
      }
    }

    if (contrib.nonEmpty)
      s"$scoType--${Uuid5(Namespace, canonicalJson(contrib))}"
    else
      s"$scoType--${UUID.randomUUID()}"
  }
}
