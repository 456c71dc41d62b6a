package graft.api

import graft.model.StixMeta
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Automatic reference dereferencing — the signature read-path capability
  * (firepit/deref.py:73-191): for `lookup(view)`, DFS over the schema's
  * `_ref` properties builds a LEFT OUTER join tree to the referenced type
  * tables, projecting referenced columns under dotted aliases
  * (`src_ref.value`); when both ipv4-addr and ipv6-addr exist, both are
  * joined and their common columns coalesced (deref.py:28-59); process
  * parent_ref is a guarded self-join (deref.py:142-150);
  * x-oca-asset:parent_process_ref is skipped (deref.py:99-101).
  *
  * All joins are key-equality LEFT OUTER joins on `id` — at scale these are
  * shuffle-hash/broadcast joins on the SCO id, and Catalyst prunes any
  * dereferenced table whose columns the caller's projection drops.
  */
object Deref {

  /** Backtick-quoted column ref (output names contain literal dots). */
  def bq(name: String): Column = col(s"`$name`")

  def autoDeref(store: Storage, view: String, paths: Option[Seq[String]] = None): DataFrame =
    autoDerefOver(store, store.catalog.resolve(view), view, paths)

  /** Same walk over an already-resolved view DataFrame — callers inside a
    * catalog recipe MUST use this with their captured resolver's output, or
    * resolving the view's own name recurses into the recipe being defined
    * (self-redefinition, test_storage.py:732-753). */
  def autoDerefOver(
      store: Storage,
      viewDf: DataFrame,
      view: String,
      paths: Option[Seq[String]] = None): DataFrame = {
    val rootCols = viewDf.columns.toSeq
    if (!rootCols.contains("id")) return viewDf // aggregate view: bail (deref.py:96-98)

    val allTypes = (store.types() ++
      Seq("identity").filter(graft.ingest.UpsertWriter.exists(store.workDir, _))).toSet
    val colDict: Map[String, Seq[String]] =
      allTypes.map(t => t -> store.columns(t)).toMap
    val viewType = store.tableType(view).filter(_.nonEmpty).getOrElse(view)
    val ignore = Map("x-oca-asset" -> Seq("parent_process_ref"))
    val mixedIps = allTypes.contains("ipv4-addr") && allTypes.contains("ipv6-addr")

    var df = viewDf
    val proj = mutable.ArrayBuffer.empty[Column]
    rootCols.foreach { c =>
      if (!c.endsWith("_ref") ||
        (view == "relationship" && (c == "source_ref" || c == "target_ref")))
        proj += bq(c)
    }

    def prefixed(t: String, prefix: String): DataFrame = {
      val tdf = store.catalog.resolve(t)
      tdf.select(tdf.columns.map(c => col(s"`$c`").as(s"$prefix.$c")).toSeq: _*)
    }

    def projectTarget(t: String, refProp: String, joinPrefix: String, outPrefix: String): Unit =
      colDict(t).foreach { c =>
        if (c != refProp && !c.endsWith("_ref"))
          proj += bq(s"$joinPrefix.$c").as(s"$outPrefix.$c")
      }

    /** DFS; visited guard on (type chain) mirrors the reference's
      * ptype != sco_type recursion guard. */
    def walk(scoType: String, prefix: String, depth: Int): Unit = {
      if (depth > 4) return
      val props = colDict.getOrElse(scoType, if (prefix.isEmpty) rootCols else Nil)
      val skip = ignore.getOrElse(scoType, Nil)
      props.foreach { prop =>
        if (prop.endsWith("_ref") && !skip.contains(prop)) {
          val targets = StixMeta.refType(scoType, StixMeta.getLast(prop)).filter(allTypes.contains)
          val keyCol = if (prefix.isEmpty) prop else s"$prefix.$prop"
          val outPrefix = if (prefix.isEmpty) prop else s"$prefix.$prop"
          if (mixedIps && targets.exists(_.startsWith("ipv"))) {
            // dual ipv4/ipv6 join with COALESCE on common columns
            val p4 = s"$outPrefix#4"
            val p6 = s"$outPrefix#6"
            val t4 = prefixed("ipv4-addr", p4)
            val t6 = prefixed("ipv6-addr", p6)
            df = df.join(t4, bq(keyCol) === t4.col(s"`$p4.id`"), "left_outer")
            df = df.join(t6, bq(keyCol) === t6.col(s"`$p6.id`"), "left_outer")
            val c4 = colDict("ipv4-addr").toSet
            val c6 = colDict("ipv6-addr").toSet
            (c4 & c6).toSeq.sorted.foreach { c =>
              if (c != prop && !c.endsWith("_ref"))
                proj += coalesce(bq(s"$p4.$c"), bq(s"$p6.$c")).as(s"$outPrefix.$c")
            }
            (c4 -- c6).toSeq.sorted.foreach { c =>
              if (!c.endsWith("_ref")) proj += bq(s"$p4.$c").as(s"$outPrefix.$c")
            }
            (c6 -- c4).toSeq.sorted.foreach { c =>
              if (!c.endsWith("_ref")) proj += bq(s"$p6.$c").as(s"$outPrefix.$c")
            }
          } else targets.headOption.foreach { t =>
            if (t != scoType) {
              val tgt = prefixed(t, outPrefix)
              df = df.join(tgt, bq(keyCol) === tgt.col(s"`$outPrefix.id`"), "left_outer")
              projectTarget(t, prop, outPrefix, outPrefix)
              walk(t, outPrefix, depth + 1)
            } else if (scoType == "process" && prop == "parent_ref") {
              // guarded self-join (deref.py:142-150)
              val tgt = prefixed("process", outPrefix)
              df = df.join(tgt, bq(keyCol) === tgt.col(s"`$outPrefix.id`"), "left_outer")
              projectTarget("process", prop, outPrefix, outPrefix)
            }
          }
        }
      }
    }

    walk(viewType, "", 0)
    val selected = df.select(proj.toSeq: _*)
    paths match {
      case Some(ps) if !ps.contains("*") =>
        val keep = selected.columns.filter(c => ps.exists(p => c == p || c.startsWith(p + ".")))
        selected.select(keep.map(bq).toSeq: _*)
      case _ => selected
    }
  }

  /** Inverse of deref: split enriched flat rows back into per-type objects
    * (firepit/deref.py:194-220). Pure function. */
  def unresolve(objects: Seq[Map[String, Any]]): Seq[Map[String, Any]] =
    objects.flatMap { obj =>
      val pruned = mutable.LinkedHashMap.empty[String, Any]
      val reffed = mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, Any]]
      obj.toSeq.sortBy(_._1).foreach { case (prop, v) =>
        if (prop.contains("_ref.")) {
          val i = prop.indexOf('.')
          val (ref, rest) = (prop.substring(0, i), prop.substring(i + 1))
          reffed.getOrElseUpdate(ref, mutable.LinkedHashMap.empty)(rest) = v
          if (rest == "id") pruned(ref) = v
        } else pruned(prop) = v
      }
      val children = reffed.values.toSeq.flatMap { m =>
        m.get("id").filter(_ != null).map(_.toString) match {
          case Some(id) =>
            val otype = id.split("--").head
            unresolve(Seq((m + ("type" -> otype)).toMap))
          case None => Nil
        }
      }
      children :+ pruned.toMap
    }
}
