package graft.ingest

import graft.model.StixId
import scala.collection.mutable

/** stix-shifter mapping-driven "fast translation": native datasource
  * records -> flat STIX-path rows (`[objname#]type:attr` -> value), with
  * deterministic SCO ids and resolved reference columns.
  *
  * Re-expresses the reference's pandas implementation (firepit/aio/
  * ingest.py:205-556) as a PURE PER-RECORD function: where the reference
  * renames/duplicates/unwraps whole DataFrame columns, each record here is
  * independently mapped to its flat row. That is the shape a 100 TB ingest
  * needs — the per-record function runs inside `Dataset.map` on executors
  * with no driver coordination; the pandas version is inherently
  * single-node. Semantics follow the reference column-by-column:
  *
  *  - mapping entries: `key` (STIX object path), `object` (instance name),
  *    `cybox: false` (observed-data attribute), `transformer`, constant
  *    `value`, `references` (ref target object names), `unwrap` (split a
  *    list value into `obj_0`, `obj_1`, ... instances), `group` (collect
  *    several native cols into one list column; bool or "True");
  *  - ipv4/ipv6 dual mappings filtered by value shape (ingest.py:400-409);
  *  - network-traffic:protocols sorted by protocol layer (ingest.py:105-137);
  *  - first rename wins on collisions (`fillna` merge, ingest.py:415-424);
  *  - STIX 2.1 ids via makeid; types whose ids depend on refs
  *    (network-traffic, file, email-message, process) are generated after
  *    their referenced objects' ids resolve (ingest.py:505-540);
  *  - unresolvable refs are dropped (ingest.py:546-550).
  */
object Translate {

  type Rec = Map[String, Any]
  type Transformer = Any => Any

  /** Protocol layer order for network-traffic:protocols (ingest.py:105-125). */
  private val protocolLayers: Map[String, Int] = Map(
    "phy" -> 1, "physical" -> 1, "eth" -> 2, "ethernet" -> 2,
    "ip" -> 3, "ipv4" -> 3, "ipv6" -> 3,
    "icmp" -> 4, "icmp6" -> 4, "icmpv6" -> 4, "udp" -> 4, "tcp" -> 4, "sctp" -> 4,
    "ssl" -> 5, "tls" -> 5, "https" -> 5, "ssh" -> 5, "http" -> 6)

  /** SCO types whose id-contributing properties include refs — their ids are
    * generated after the objects they reference (ingest.py:512-517). */
  private val deferredTypes = Set("network-traffic", "file", "email-message", "process")

  /** Built-in accelerated transformers (ingest.py:310-330). Callers merge in
    * their stix-shifter transformers (e.g. ToLowercaseArray). */
  val builtinTransformers: Map[String, Transformer] = Map(
    "ToInteger" -> (v => v.toString.toDouble.toLong),
    "EpochToTimestamp" -> { v =>
      val ms = v.toString.toDouble.toLong
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
    },
    // v4/v6 split happens via value-shape filtering on the dup columns
    "FilterIPv4List" -> identity[Any],
    "FilterIPv6List" -> identity[Any])

  private def truthy(v: Option[Any]): Boolean = v match {
    case Some(true)           => true
    case Some(s: String)      => s.equalsIgnoreCase("true")
    case _                    => false
  }

  /** stix-shifter mapping key -> output column name (ingest.py:60-74). */
  private def makeColname(m: Rec): String = {
    val key = m("key").toString
    val parts = key.split('.')
    val outs = parts.drop(1).map(p => if (p.contains("-")) s"'$p'" else p)
    if (m.get("cybox").contains(false))
      s"observed-data:${(parts.take(1) ++ outs).mkString(".")}"
    else if (parts.length > 1) {
      val obj = m.get("object").map(o => s"$o#").getOrElse("")
      s"$obj${parts.head}:${outs.mkString(".")}"
    } else s"observed-data:$key"
  }

  /** Mapping lookup for a (possibly dotted) native column (ingest.py:77-96). */
  private def getMapping(stixMap: Rec, col: String): Option[Seq[Rec]] = {
    val direct = stixMap.get(col)
    val found = direct.orElse {
      col.split('.').foldLeft(Option[Any](stixMap)) {
        case (Some(m: collection.Map[_, _]), part) =>
          m.asInstanceOf[collection.Map[String, Any]].get(part)
        case _ => None
      }
    }
    found.flatMap {
      case m: collection.Map[_, _] =>
        val mm = m.asInstanceOf[collection.Map[String, Any]].toMap
        // a dict whose `key` is not a string is not actually a mapping
        if (mm.get("key").exists(_.isInstanceOf[String])) Some(Seq(mm)) else None
      case l: Seq[_] =>
        Some(l.collect { case m: collection.Map[_, _] =>
          m.asInstanceOf[collection.Map[String, Any]].toMap
        })
      case _ => None
    }.filter(_.nonEmpty)
  }

  /** "Nested" maps (elastic_ecs style) flatten their events first
    * (ingest.py:100-104, :213-215). */
  private def isNested(stixMap: Rec): Boolean =
    stixMap.values.exists {
      case m: collection.Map[_, _] =>
        !m.asInstanceOf[collection.Map[String, Any]].contains("key")
      case _ => false
    }

  private def isIpv4(v: Any): Boolean = v != null && v.toString.contains(".")
  private def isIpv6(v: Any): Boolean = v != null && v.toString.contains(":")

  private def toProtocols(v: Any): Any = v match {
    case s: String => Seq(s.toLowerCase)
    case l: Seq[_] =>
      l.map(_.toString.toLowerCase).filter(_.nonEmpty)
        .sortBy(p => protocolLayers.getOrElse(p, 8))
    case other => other
  }

  /** Translate native events into flat STIX-path rows. `identity` is the
    * data source SDO; `transformers` extends the builtins. */
  def translate(
      stixMap: Rec,
      transformers: Map[String, Transformer],
      events: Seq[Rec],
      identity: Rec): Seq[Rec] = {
    val txf = builtinTransformers ++ transformers
    val nested = isNested(stixMap)
    val flatEvents =
      if (nested) events.map(e => Flatten.jsonNormalize(e)) else events

    val valCols = constCols(stixMap, flatEvents.iterator.flatMap(_.keys).toSet)
    val createdNow = nowRfc3339()
    flatEvents.map(ev => translateRow(stixMap, txf, ev, identity, valCols, createdNow))
  }

  /** Constant-value columns apply to EVERY row once any row carries the
    * mapped native column (the reference materializes them as whole
    * DataFrame columns, ingest.py:461-464). `nativeCols` is the union of
    * column names across the event set. */
  def constCols(stixMap: Rec, nativeCols: Iterable[String]): Rec = {
    val valCols = mutable.LinkedHashMap.empty[String, Any]
    nativeCols.toSeq.sorted.foreach { col =>
      getMapping(stixMap, col).foreach(_.foreach { m =>
        m.get("value").foreach(v => valCols(makeColname(m)) = v)
      })
    }
    valCols.toMap
  }

  def nowRfc3339(): String = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(java.time.ZoneOffset.UTC)
    .format(java.time.Instant.now())

  /** Whether events must be flattened before translateRow (elastic_ecs-style
    * nested maps). */
  def needsFlatten(stixMap: Rec): Boolean = isNested(stixMap)

  /** Translate ONE flattened event — pure and serializable, the executor-side
    * kernel for distributed translation. */
  def translateRow(
      stixMap: Rec,
      txf: Map[String, Transformer],
      ev: Rec,
      identity: Rec,
      valCols: Rec,
      createdNow: String): Rec = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    val groups = mutable.LinkedHashMap.empty[String, mutable.ListBuffer[Any]]
    val protoCols = mutable.LinkedHashSet.empty[String]
    val refCols = mutable.LinkedHashMap.empty[String, Any] // refCol -> name | Seq[name]
    val objRenames = mutable.HashMap.empty[String, Seq[String]] // base obj -> unwrapped objs

    def put(colName: String, v: Any): Unit =
      // first writer wins (the reference's rename-merge fillna keeps the
      // existing column, ingest.py:419-424)
      if (v != null && (!out.contains(colName) || out(colName) == null)) out(colName) = v

    // deterministic column order: Scala Maps beyond 4 entries don't preserve
    // insertion order, and first-writer-wins collisions (e.g. user.id vs
    // user.name both mapping user_id) need a stable winner — sorted names
    // give the reference's outcome (user.id precedes user.name)
    ev.toSeq.sortBy(_._1).foreach { case (col, raw) =>
      if (raw != null) getMapping(stixMap, col).foreach { maps =>
        // per-native-column transformer, shared by all its mappings
        // (txf_cols is keyed by original column, ingest.py:292-301)
        val txName = maps.flatMap(_.get("transformer")).headOption.map(_.toString)
        val protoTarget = maps.exists(m =>
          m.get("transformer").contains("ToLowercaseArray") &&
            makeColname(m).endsWith("network-traffic:protocols"))
        val v =
          if (txName.isDefined && !protoTarget)
            // a malformed value must not kill a 100 TB ingest: transformer
            // failures keep the raw value (the reference's stix-shifter
            // transformers swallow their own exceptions, e.g.
            // ToLowercaseArray's bare except — test_asyncingest.py:28-39)
            txf.get(txName.get).map { t =>
              try t(raw)
              catch { case scala.util.control.NonFatal(_) => raw }
            }.getOrElse(raw)
          else raw

        maps.zipWithIndex.foreach { case (m, i) =>
          val newCol = makeColname(m)
          val key = m("key").toString
          val unwrap = truthy(m.get("unwrap"))
          val isRefCol = newCol.endsWith("_ref") || newCol.endsWith("_refs")
          val isIpValue = key == "ipv4-addr.value" || key == "ipv6-addr.value"

          if (m.contains("value")) () // constants handled via valCols
          else if (isRefCol && i > 0) {
            m.get("references").foreach(refs => refCols(newCol) = refs)
          } else if (unwrap && !isRefCol) {
            // split list into per-index object instances (ingest.py:335-397)
            val items = v match { case l: Seq[_] => l; case single => Seq(single) }
            val hi = newCol.indexOf('#')
            val (obj, rest) =
              if (hi >= 0) (newCol.substring(0, hi), newCol.substring(hi + 1))
              else ("", newCol)
            items.zipWithIndex.foreach { case (item, idx) =>
              val keep =
                if (key == "ipv4-addr.value") isIpv4(item)
                else if (key == "ipv6-addr.value") isIpv6(item)
                else true
              val name = if (hi >= 0) s"${obj}_$idx#$rest" else rest
              if (keep) put(name, item)
            }
            if (hi >= 0 && !objRenames.contains(obj))
              objRenames(obj) = items.indices.map(idx => s"${obj}_$idx")
            // expansions apply to every object this column's ref mappings name
            maps.flatMap(_.get("references")).foreach {
              case s: String => objRenames.getOrElseUpdate(s, items.indices.map(i2 => s"${s}_$i2"))
              case l: Seq[_] => l.foreach(r =>
                objRenames.getOrElseUpdate(r.toString, items.indices.map(i2 => s"${r}_$i2")))
              case _ => ()
            }
          } else if (isIpValue) {
            // dual v4/v6 mappings filter by value shape (ingest.py:400-409)
            if (key == "ipv4-addr.value" && isIpv4(v)) put(newCol, v)
            else if (key == "ipv6-addr.value" && isIpv6(v)) put(newCol, v)
          } else if (truthy(m.get("group"))) {
            if (protoTarget) protoCols += newCol
            groups.getOrElseUpdate(newCol, mutable.ListBuffer.empty) += v
          } else if (i == 0 || !isRefCol) {
            if (protoTarget && newCol.endsWith("network-traffic:protocols")) protoCols += newCol
            put(newCol, v)
          }
        }
      }
    }

    // merge grouped columns into one list (ingest.py:433-446)
    groups.foreach { case (newCol, vals) =>
      val combined = vals.flatMap {
        case l: Seq[_] => l
        case single    => Seq(single)
      }.filter(_ != null).toSeq
      if (combined.nonEmpty) out(newCol) = combined
    }

    // protocol ordering transform runs after grouping (ingest.py:449-456)
    protoCols.foreach(c => out.get(c).foreach(v => out(c) = toProtocols(v)))

    valCols.foreach { case (c, v) => out(c) = v }

    // observed-data required columns (ingest.py:478-485)
    out("observed-data:id") = s"observed-data--${java.util.UUID.randomUUID()}"
    out("observed-data:created_by_ref") = identity("id")
    out("observed-data:created") = createdNow
    out("observed-data:modified") = createdNow
    if (!out.contains("observed-data:number_observed"))
      out("observed-data:number_observed") = 1L

    // ---- id generation + reference resolution ----
    def objKeys: Set[String] =
      out.keys.map(k => k.substring(0, k.indexOf(':'))).toSet

    val madeIds = mutable.LinkedHashMap.empty[String, String] // obj name -> id value

    def propsOf(objKey: String): Rec = {
      val prefix = objKey + ":"
      out.toSeq.collect {
        case (k, v) if k.startsWith(prefix) && v != null =>
          k.substring(prefix.length) -> v
      }.toMap
    }

    def makeIdFor(objKey: String): Unit = {
      val (obj, otype) = splitKey(objKey)
      if (otype == "observed-data") return
      val props = propsOf(objKey) - "id"
      if (props.nonEmpty) {
        val id = StixId.makeid(props + ("type" -> otype))
        out(s"$objKey:id") = id
        if (obj.nonEmpty) madeIds(obj) = id
      }
    }

    def resolveRefs(): Unit =
      refCols.toSeq.foreach { case (refCol, target) =>
        // no per-row "source object exists" gate: the reference's obj_set
        // check (ingest.py:492-496) is over the whole DataFrame's columns,
        // so an object materializing ONLY through its ref column in some
        // rows still resolves (test_asyncingest asserts row 2's nt exists
        // solely via src_ref)
        if (!out.contains(refCol)) {
          val named = target match {
            case s: String => Seq(s)
            case l: Seq[_] => l.map(_.toString)
            case _         => Nil
          }
          // unwrapped objects resolve through their indexed instance names
          // (the reference's obj_renames remap, ingest.py:189-191)
          val ids = named.flatMap(n => objRenames.getOrElse(n, Seq(n)))
            .flatMap(madeIds.get)
          if (ids.nonEmpty)
            // singular _ref: first non-null (the reference's bfill,
            // ingest.py:182-184); plural _refs: every instance id
            out(refCol) = if (refCol.endsWith("_refs")) ids else ids.head
        }
      }

    val simple = objKeys.toSeq.sorted
      .filter(k => { val t = splitKey(k)._2; t != "observed-data" && !deferredTypes(t) })
    simple.foreach(makeIdFor)
    resolveRefs()

    // deferred types: resolve refs into the object BEFORE its id so ref
    // values contribute resolved ids; objects referenced by other deferred
    // objects go first (e.g. process_parent before process)
    var pending = objKeys.toSeq.sorted.filter(k => deferredTypes(splitKey(k)._2))
    var progress = true
    while (pending.nonEmpty && progress) {
      progress = false
      val (ready, rest) = pending.partition { k =>
        val obj = splitKey(k)._1
        // ready when no other pending object references it... i.e. this key's
        // refs don't target a pending object
        val myRefs = refCols.collect {
          case (rc, t) if rc.startsWith(k + ":") =>
            t match { case s: String => Seq(s); case l: Seq[_] => l.map(_.toString); case _ => Nil }
        }.flatten.toSet
        val pendingObjs = pending.map(splitKey(_)._1).toSet - obj
        myRefs.intersect(pendingObjs).isEmpty
      }
      if (ready.nonEmpty) {
        ready.foreach { k => resolveRefs(); makeIdFor(k) }
        resolveRefs()
        pending = rest
        progress = true
      }
    }
    pending.foreach(makeIdFor) // cycles: make ids with whatever resolved
    resolveRefs()

    // unresolved ref columns are dropped (ingest.py:546-550): anything in
    // refCols that never got a value stays absent — nothing to do row-wise.
    out.filter(_._2 != null).toMap
  }

  private def splitKey(objKey: String): (String, String) = {
    val h = objKey.indexOf('#')
    if (h >= 0) (objKey.substring(0, h), objKey.substring(h + 1)) else ("", objKey)
  }

  /** Explode ONE translated flat row (`[objname#]type:attr` -> value) into
    * the objects the reference write path materializes (ingest.py:659-731):
    * per-object SCO dicts (objects without an `id` are skipped, :672-674),
    * rank-1 `__contains` edges observation->SCO — rank 0 for dst/
    * destination/target-named instances, matching aio/ingest.py:707-711
    * exactly (the SYNC raft.py path leaves the key unset instead; this
    * kernel mirrors the aio fast path it is cited from) — and `__reflist`
    * rows exploded+deduped from `*_refs` columns (:717-731). Pure and
    * serializable: runs inside `Dataset.flatMap` on executors. */
  def rowToObjects(row: Rec): Seq[Rec] = {
    val out = mutable.ArrayBuffer.empty[Rec]
    val obsId = row.get("observed-data:id").map(_.toString).orNull
    val objKeys = row.keysIterator.map(k => k.substring(0, k.indexOf(':'))).toSet
    objKeys.toSeq.sorted.foreach { objKey =>
      val (name, otype) = splitKey(objKey)
      val prefix = objKey + ":"
      val props = row.collect {
        case (k, v) if k.startsWith(prefix) && v != null =>
          k.substring(prefix.length) -> v
      }
      props.get("id").map(_.toString).foreach { id =>
        val (refLists, scalars) = props.partition(_._1.endsWith("_refs"))
        out += (scalars + ("type" -> otype))
        if (otype != "observed-data" && obsId != null) {
          val edge = Map[String, Any](
            "type" -> "__contains", "source_ref" -> obsId, "target_ref" -> id)
          val secondary = name.startsWith("dst") ||
            name.startsWith("destination") || name.startsWith("target")
          out += edge + ("x_firepit_rank" -> (if (secondary) 0L else 1L))
        }
        refLists.toSeq.sortBy(_._1).foreach { case (refName, v) =>
          val targets = v match { case l: Seq[_] => l; case single => Seq(single) }
          targets.map(_.toString).distinct.foreach { t =>
            out += Map[String, Any](
              "type" -> "__reflist", "ref_name" -> refName,
              "source_ref" -> id, "target_ref" -> t)
          }
        }
      }
    }
    out.toSeq
  }
}
