package graft.ingest

import graft.model.StixId
import scala.collection.mutable

/** Bundle lint/transform utilities — the capability surface of the
  * reference's `splint` CLI (firepit/splint.py:50-221): randomize ids,
  * dedup ids, limit observations, 2.0 -> 2.1 upgrade, linear time shift.
  * Pure functions over parsed bundles; usable driver-side or inside a
  * mapPartitions over a bundle-per-row DataFrame.
  */
object BundleUtil {

  type Obj = Map[String, Any]

  private def objects(bundle: Obj): Seq[Obj] =
    bundle.getOrElse("objects", Seq.empty).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Obj])

  private def withObjects(bundle: Obj, objs: Seq[Obj]): Obj =
    bundle + ("objects" -> objs)

  /** Fresh random ids for every SDO, preserving internal references
    * (splint.py `randomize_ids`): collect the bundle's object ids, then
    * rewrite every occurrence of each collected id consistently. */
  def randomizeIds(bundle: Obj): Obj = {
    val mapping = objects(bundle)
      .flatMap(_.get("id"))
      .map(_.toString)
      .distinct
      .map(old => old -> s"${old.split("--").head}--${java.util.UUID.randomUUID()}")
      .toMap
    def rewrite(v: Any): Any = v match {
      case s: String if mapping.contains(s) => mapping(s)
      case m: Map[_, _] => m.asInstanceOf[Obj].map { case (k, x) => k -> rewrite(x) }
      case xs: Seq[_]   => xs.map(rewrite)
      case other        => other
    }
    withObjects(bundle, objects(bundle).map(o => rewrite(o).asInstanceOf[Obj]))
  }

  /** Drop duplicate-id objects, keeping the first (splint.py `dedup_ids`). */
  def dedupIds(bundle: Obj): Obj = {
    val seen = mutable.Set.empty[String]
    withObjects(
      bundle,
      objects(bundle).filter { o =>
        o.get("id") match {
          case Some(id: String) => seen.add(id)
          case _                => true
        }
      })
  }

  /** Keep at most n observed-data SDOs (plus all non-observations)
    * (splint.py `limit`). */
  def limit(bundle: Obj, n: Int): Obj = {
    var kept = 0
    withObjects(
      bundle,
      objects(bundle).filter { o =>
        if (o.get("type").contains("observed-data")) { kept += 1; kept <= n }
        else true
      })
  }

  /** Linear time remap: shift every observed-data timestamp so the bundle's
    * [oldStart, oldEnd] maps onto [newStart, newEnd]
    * (splint.py `timeshift` / `_shift_dt`). Timestamps are RFC-3339 text. */
  def timeshift(bundle: Obj, newStart: String, newEnd: String): Obj = {
    val fmt = java.time.format.DateTimeFormatter.ISO_INSTANT
    def parse(s: String): Long = java.time.Instant.from(fmt.parse(s)).toEpochMilli
    def render(ms: Long): String =
      java.time.Instant.ofEpochMilli(ms).toString match {
        case s if s.endsWith("Z") && s.length == 20 => s.dropRight(1) + ".000Z"
        case s                                       => s
      }
    val obs = objects(bundle).filter(_.get("type").contains("observed-data"))
    val times = obs.flatMap(o =>
      Seq("first_observed", "last_observed").flatMap(o.get).map(v => parse(v.toString)))
    if (times.isEmpty) return bundle
    val (oldS, oldE) = (times.min, times.max)
    val (newS, newE) = (parse(newStart), parse(newEnd))
    val scale = if (oldE == oldS) 0.0 else (newE - newS).toDouble / (oldE - oldS)
    def shift(v: Any): String = render(newS + ((parse(v.toString) - oldS) * scale).toLong)
    withObjects(
      bundle,
      objects(bundle).map { o =>
        if (!o.get("type").contains("observed-data")) o
        else
          Seq("first_observed", "last_observed").foldLeft(o) { (acc, k) =>
            acc.get(k).map(v => acc + (k -> shift(v))).getOrElse(acc)
          }
      })
  }

  /** 2.0 -> 2.1 upgrade: hoist each observation's indexed SCOs to top-level
    * bundle objects with deterministic 2.1 ids, rewrite refs, and replace
    * `objects` with `object_refs` (firepit/raft.py:103-150 upgrade_2021;
    * binary_ref renamed image_ref per raft.py:119-120). */
  def upgrade(bundle: Obj): Obj = {
    val out = mutable.ArrayBuffer.empty[Obj]
    objects(bundle).foreach { o =>
      if (!o.get("type").contains("observed-data") || !o.contains("objects")) out += o
      else {
        val scos = o("objects").asInstanceOf[collection.Map[String, Any]]
          .map { case (k, v) => k -> v.asInstanceOf[Obj] }
        val idMap = scos.map { case (idx, sco) => idx -> StixId.makeid(sco, o) }
        val upgraded = scos.map { case (idx, sco) =>
          val withId = sco + ("id" -> idMap(idx), "spec_version" -> "2.1")
          withId.map {
            case ("binary_ref", v) => "image_ref" -> idMap.getOrElse(v.toString, v)
            case (k, v) if k.endsWith("_ref") => k -> idMap.getOrElse(v.toString, v)
            case (k, v: Seq[_]) if k.endsWith("_refs") =>
              k -> v.map(x => idMap.getOrElse(x.toString, x))
            case kv => kv
          }
        }
        out ++= upgraded
        out += (o - "objects") ++ Map(
          "spec_version" -> "2.1",
          "object_refs" -> idMap.values.toSeq.sorted)
      }
    }
    withObjects(bundle, out.toSeq)
  }
}
