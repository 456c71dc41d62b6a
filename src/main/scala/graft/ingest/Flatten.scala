package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.StixId
import scala.collection.mutable

/** STIX bundle graph -> flat relational rows.
  *
  * Re-implements the reference's flatten semantics (firepit/raft.py:161-334
  * for 2.0, raft.py:162-210 for 2.1) as pure functions over parsed JSON:
  *  - nested objects flattened to dotted column names with the single-quote
  *    rule for hyphenated keys (json_normalize, raft.py:77-100);
  *  - deterministic 2.1 ids assigned to 2.0 SCOs (StixId.makeid);
  *  - `__contains` rows (observation -> SCO) and `__reflist` rows
  *    (1:N reference lists) emitted as pseudo-objects;
  *  - 2.0 numeric ref indexes resolved to ids; unresolvable refs dropped;
  *  - `x_firepit_rank = 1` marked on each observation's "primary" SCO per
  *    type (roots of same-type ref trees; src preferred over dst for
  *    addresses — raft.py:153-157,253-259,316-348).
  *
  * Flattening runs where the bundles are parsed: driver-side for small
  * hunt-result bundles (the reference's only case), or inside mapPartitions
  * over a bundle-per-row DataFrame for bulk backfills — the functions are
  * pure and serializable, so both work unchanged.
  */
object Flatten {

  type Obj = Map[String, Any]

  private val mapper = new ObjectMapper()

  /** Parse a JSON document into Scala maps/seqs/primitives. */
  def parseJson(text: String): Any = fromJackson(mapper.readTree(text))

  private def fromJackson(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import com.fasterxml.jackson.databind.JsonNode
    if (n.isObject) {
      val it = n.fields()
      val m = mutable.LinkedHashMap.empty[String, Any]
      while (it.hasNext) { val e = it.next(); m(e.getKey) = fromJackson(e.getValue) }
      m.toMap
    } else if (n.isArray) {
      val b = Seq.newBuilder[Any]
      n.forEach((c: JsonNode) => b += fromJackson(c))
      b.result()
    } else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else null
  }

  /** Dotted flattening with STIX's quote rule (raft.py:77-100): hyphenated
    * key parts get single quotes (hashes.'SHA-1'); custom x-* SCO nested
    * dicts are NOT recursed (except `extensions`). */
  def jsonNormalize(d: collection.Map[String, Any], prefix: String = ""): Map[String, Any] = {
    val otype = d.get("type").map(_.toString).getOrElse("")
    val out = mutable.LinkedHashMap.empty[String, Any]
    d.foreach { case (k, v) =>
      // idempotent quoting: keys already carrying quotes (assembled path
      // dicts) are not double-wrapped
      val key0 =
        if (k.contains("-") && !(k.startsWith("'") && k.endsWith("'"))) s"'$k'" else k
      val key = if (prefix.nonEmpty) s"$prefix.$key0" else key0
      v match {
        case m: collection.Map[_, _]
            if k == "extensions" || !otype.startsWith("x-") =>
          out ++= jsonNormalize(m.asInstanceOf[collection.Map[String, Any]], key)
        case other => out(key) = other
      }
    }
    out.toMap
  }

  /** Flatten one observation (2.0 `objects`-style or 2.1 `object_refs`). */
  def flatten(obs: Obj): Seq[Obj] =
    if (obs.get("spec_version").exists(_ == "2.1") || obs.contains("object_refs"))
      flatten21(obs)
    else if (!obs.contains("objects")) Seq(obs)
    else flatten20(obs)

  /** STIX 2.1: objects arrive as top-level bundle entries; observed-data
    * carries object_refs. (raft.py:162-210) */
  def flatten21(obj: Obj): Seq[Obj] = {
    val oid = obj("id").toString
    obj("type").toString match {
      case "identity" => Seq(obj)
      case "observed-data" =>
        val refs = obj.getOrElse("object_refs", Seq.empty).asInstanceOf[Seq[Any]]
        val contains = refs.map(r =>
          Map[String, Any]("type" -> "__contains", "source_ref" -> oid, "target_ref" -> r.toString))
        contains :+ jsonNormalize(obj - "object_refs")
      case _ =>
        val refLists = obj.collect {
          case (prop, v) if prop.endsWith("_refs") =>
            val vals = v match { case s: Seq[_] => s; case single => Seq(single) }
            prop -> vals.map(_.toString).filter(_ != oid)
        }
        val sros = refLists.toSeq.flatMap { case (prop, refs) =>
          refs.map(r =>
            Map[String, Any](
              "type" -> "__reflist", "ref_name" -> prop, "source_ref" -> oid, "target_ref" -> r))
        }
        sros :+ jsonNormalize(obj -- refLists.keys)
    }
  }

  /** STIX 2.0: SCOs are numerically-indexed under obs.objects; synthesize
    * 2.1 ids, emit edges, resolve ref indexes, mark ranks. (raft.py:213-334) */
  def flatten20(obs: Obj): Seq[Obj] = {
    val scos = obs("objects").asInstanceOf[collection.Map[String, Any]]
      .map { case (k, v) => k -> v.asInstanceOf[collection.Map[String, Any]].toMap }

    val refMap = mutable.Map.empty[String, String]   // idx -> 2.1 id
    val prefs = mutable.Map.empty[String, mutable.ArrayBuffer[String]] // type -> idx pref order
    val reffed = mutable.Set.empty[String]
    val results = mutable.ArrayBuffer.empty[mutable.Map[String, Any]]

    def markTree(k: String): Unit = {
      if (!reffed.contains(k)) {
        reffed += k
        scos.get(k).foreach(_.foreach {
          case (attr, v) if attr.endsWith("_ref") =>
            val t = v.toString
            if (scos.contains(t) && t != k) markTree(t)
          case (attr, v) if attr.endsWith("_refs") =>
            v.asInstanceOf[Seq[Any]].map(_.toString).foreach { r =>
              if (scos.contains(r) && r != k) markTree(r)
            }
          case _ => ()
        })
      }
    }

    // deterministic object order (numeric indexes)
    val idxOrder = scos.keys.toSeq.sortBy(k => (k.length, k))

    idxOrder.foreach { idx =>
      val orig = scos(idx)
      val flat = mutable.Map.empty[String, Any] ++ jsonNormalize(orig)
      val scoType = orig("type").toString
      prefs.getOrElseUpdate(scoType, mutable.ArrayBuffer.empty) += idx
      val sid = StixId.makeid(orig, obs)
      flat("id") = sid
      refMap(idx) = sid

      val refListProps = mutable.ArrayBuffer.empty[String]
      flat.toSeq.foreach {
        case (prop, v) if prop.endsWith("_ref") =>
          val tgt = v.toString
          if (scos.contains(tgt) && tgt != idx) {
            val tgtType = scos(tgt)("type").toString
            if (scoType == tgtType) markTree(tgt)
            else if (tgtType.endsWith("-addr")) {
              if (prop.contains("dst_")) reffed += tgt
              else if (prop.endsWith("src_ref"))
                prefs.getOrElseUpdate(tgtType, mutable.ArrayBuffer.empty).prepend(tgt)
            } else if (reffed.contains(tgt)) reffed += idx
          }
        case (prop, v) if prop.endsWith("_refs") =>
          val vals = v match { case s: Seq[_] => s.map(_.toString); case x => Seq(x.toString) }
          vals.foreach { ref =>
            if (scos.contains(ref) && ref != idx) {
              results += mutable.Map[String, Any](
                "type" -> "__reflist", "ref_name" -> prop, "source_ref" -> idx, "target_ref" -> ref)
              if (scos(ref)("type").toString == scoType) reffed += ref
            }
          }
          refListProps += prop
        case _ => ()
      }
      refListProps.foreach(flat.remove)

      results += mutable.Map[String, Any](
        "type" -> "__contains", "source_ref" -> obs("id").toString, "target_ref" -> sid)
      results += flat
    }

    // resolve 2.0-style ref indexes to ids; drop unresolvable refs
    results.foreach { obj =>
      val t = obj("type").toString
      if (t != "__contains" && t != "relationship") {
        obj.toSeq.foreach {
          case (prop, v) if prop.endsWith("_ref") || (t == "__reflist" && (prop == "source_ref" || prop == "target_ref")) =>
            refMap.get(v.toString) match {
              case Some(sid) => obj(prop) = sid
              case None if t == "__reflist" => () // already an id? keep
              case None => obj.remove(prop)
            }
          case _ => ()
        }
      }
    }

    // rank marking: for each un-reffed SCO that is its type's preferred
    // object, set x_firepit_rank=1 on its __contains row (raft.py:316-329)
    idxOrder.foreach { idx =>
      if (!reffed.contains(idx)) {
        val scoType = scos(idx)("type").toString
        val prefList = prefs.getOrElse(scoType, mutable.ArrayBuffer.empty)
        val winner = prefList.find(i => !reffed.contains(i))
        if (winner.contains(idx)) {
          val sid = refMap(idx)
          results.foreach { r =>
            if (r("type") == "__contains" && r("target_ref") == sid)
              r("x_firepit_rank") = 1L
          }
        }
      }
    }

    (results :+ (mutable.Map.empty[String, Any] ++ jsonNormalize(obs - "objects")))
      .map(_.toMap).toSeq
  }

  /** Parse a bundle JSON document and flatten every observation/SDO.
    * Ensures observed-data SDOs have ids (synthesized when missing). */
  def flattenBundle(bundleJson: String): Seq[Obj] = {
    val bundle = parseJson(bundleJson).asInstanceOf[Map[String, Any]]
    val objects = bundle.getOrElse("objects", Seq.empty).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    objects.flatMap { obj =>
      // ingest error contract (reference splitter.py:229, sqlstorage.py:487):
      // a bundle object with a missing or empty `type` is rejected up front
      obj.get("type").map(_.toString) match {
        case None     => throw new graft.api.InvalidObject("missing `type`")
        case Some("") => throw new graft.api.InvalidObject("empty `type` property")
        case _        => ()
      }
      val withId =
        if (obj.contains("id")) obj
        else obj + ("id" -> StixId.makeid(obj))
      flatten(withId)
    }
  }
}
