package graft.query

import graft.ingest.Flatten
import graft.model.StixId

/** JSON codec for the data-only subset of the Stage ADT, so assignQuery
  * views persist in the __symtable journal like every other verb (the
  * reference's Query-AST views are SQL text and survive trivially).
  *
  * Nodes holding live Catalyst Columns (ExprCol/ExprAgg/RawAgg/ExprPred and
  * RLit of a Column) are not serializable: toJson returns None and such
  * views stay session-transient — the reference's temp-table analogue.
  */
object StageJson {

  type J = Map[String, Any]

  def toJson(q: GQuery): Option[String] = encQuery(q).map(StixId.canonicalJson)

  def fromJson(s: String): GQuery =
    decQuery(Flatten.parseJson(s).asInstanceOf[J])

  // ----- encode (None = contains a non-serializable node) -----------------

  private def encQuery(q: GQuery): Option[J] =
    seqOpt(q.stages.map(encStage)).map(ss => Map("stages" -> ss))

  private def seqOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def encStage(s: Stage): Option[J] = s match {
    case Table(n)            => Some(Map("t" -> "table", "name" -> n))
    case SubqueryTable(q, a) => encQuery(q).map(qj => Map("t" -> "subquery", "q" -> qj, "alias" -> a))
    case Projection(cols)    => seqOpt(cols.map(encCol)).map(cs => Map("t" -> "proj", "cols" -> cs))
    case Filter(preds, disj) =>
      seqOpt(preds.map(encPred)).map(ps => Map("t" -> "filter", "disj" -> disj, "preds" -> ps))
    case Group(cols)         => seqOpt(cols.map(encCol)).map(cs => Map("t" -> "group", "cols" -> cs))
    case Aggregation(aggs)   => seqOpt(aggs.map(encAgg)).map(as => Map("t" -> "agg", "aggs" -> as))
    case Order(keys) =>
      Some(Map("t" -> "order", "keys" -> keys.map(k => Map("col" -> k.col, "asc" -> k.asc))))
    case Limit(n)            => Some(Map("t" -> "limit", "n" -> n.toLong))
    case Offset(n)           => Some(Map("t" -> "offset", "n" -> n.toLong))
    case CountRows()         => Some(Map("t" -> "count"))
    case Unique()            => Some(Map("t" -> "unique"))
    case CountUnique(cols)   => Some(Map("t" -> "count_unique", "cols" -> cols))
    case Join(n, l, op, r, how, alias, extra, lhs) =>
      seqOpt(extra.map(encPred)).map(ps =>
        Map("t" -> "join", "name" -> n, "l" -> l, "op" -> op, "r" -> r,
          "how" -> how, "alias" -> alias.orNull, "preds" -> ps,
          "lhs" -> lhs.orNull))
  }

  private def encCol(c: ColSpec): Option[J] = c match {
    case Col(n, t, a)         => Some(Map("c" -> "col", "name" -> n, "table" -> t.orNull, "alias" -> a.orNull))
    case CoalescedCol(ns, a)  => Some(Map("c" -> "coalesce", "names" -> ns, "alias" -> a))
    case BinnedCol(p, n, u, a) =>
      Some(Map("c" -> "bin", "prop" -> p, "n" -> n.toLong, "unit" -> u, "alias" -> a.orNull))
    case _: ExprCol           => None
  }

  private def encAgg(a: AggLike): Option[J] = a match {
    case Agg(f, c, al) => Some(Map("a" -> "agg", "func" -> f, "col" -> c.orNull, "alias" -> al))
    case _             => None // ExprAgg / RawAgg hold live Columns
  }

  private def encPred(p: Pred): Option[J] = p match {
    case Comparison(l, op, r) => encRhs(r).map(rj => Map("p" -> "cmp", "lhs" -> l, "op" -> op, "rhs" -> rj))
    case AndPred(a, b)        => for (x <- encPred(a); y <- encPred(b)) yield Map("p" -> "and", "l" -> x, "r" -> y)
    case OrPred(a, b)         => for (x <- encPred(a); y <- encPred(b)) yield Map("p" -> "or", "l" -> x, "r" -> y)
    case NotPred(a)           => encPred(a).map(x => Map("p" -> "not", "x" -> x))
    case _: ExprPred          => None
  }

  private def encScalar(v: Any): Option[Any] = v match {
    case null                                                        => Some(null)
    case _: String | _: Long | _: Double | _: Boolean                => Some(v)
    case i: Int                                                      => Some(i.toLong)
    case _                                                           => None // live Column etc.
  }

  private def encRhs(r: Rhs): Option[J] = r match {
    case RLit(v)      => encScalar(v).map(x => Map("r" -> "lit", "v" -> x))
    case RNull        => Some(Map("r" -> "null"))
    case RList(vs)    => seqOpt(vs.map(encScalar)).map(xs => Map("r" -> "list", "vs" -> xs))
    case RColRef(n)   => Some(Map("r" -> "colref", "name" -> n))
    case RQuery(q, c) => encQuery(q).map(qj => Map("r" -> "query", "q" -> qj, "col" -> c))
  }

  // ----- decode ------------------------------------------------------------

  private def decQuery(j: J): GQuery =
    GQuery(j("stages").asInstanceOf[Seq[Any]].map(s => decStage(s.asInstanceOf[J])))

  private def str(j: J, k: String): String = Option(j.getOrElse(k, null)).map(_.toString).orNull
  private def int(j: J, k: String): Int = j(k).asInstanceOf[Long].toInt

  private def decStage(j: J): Stage = j("t") match {
    case "table"    => Table(str(j, "name"))
    case "subquery" => SubqueryTable(decQuery(j("q").asInstanceOf[J]), str(j, "alias"))
    case "proj"     => Projection(j("cols").asInstanceOf[Seq[Any]].map(c => decCol(c.asInstanceOf[J])))
    case "filter" =>
      Filter(
        j("preds").asInstanceOf[Seq[Any]].map(p => decPred(p.asInstanceOf[J])),
        j("disj").asInstanceOf[Boolean])
    case "group" => Group(j("cols").asInstanceOf[Seq[Any]].map(c => decCol(c.asInstanceOf[J])))
    case "agg" =>
      Aggregation(j("aggs").asInstanceOf[Seq[Any]].map { a =>
        val m = a.asInstanceOf[J]
        Agg(str(m, "func"), Option(str(m, "col")), str(m, "alias"))
      })
    case "order" =>
      Order(j("keys").asInstanceOf[Seq[Any]].map { k =>
        val m = k.asInstanceOf[J]
        OrderKey(str(m, "col"), m("asc").asInstanceOf[Boolean])
      })
    case "limit"        => Limit(int(j, "n"))
    case "offset"       => Offset(int(j, "n"))
    case "count"        => CountRows()
    case "unique"       => Unique()
    case "count_unique" => CountUnique(j("cols").asInstanceOf[Seq[Any]].map(_.toString))
    case "join" =>
      Join(
        str(j, "name"), str(j, "l"), str(j, "op"), str(j, "r"), str(j, "how"),
        Option(str(j, "alias")),
        j("preds").asInstanceOf[Seq[Any]].map(p => decPred(p.asInstanceOf[J])),
        Option(str(j, "lhs")))
  }

  private def decCol(j: J): ColSpec = j("c") match {
    case "col"      => Col(str(j, "name"), Option(str(j, "table")), Option(str(j, "alias")))
    case "coalesce" => CoalescedCol(j("names").asInstanceOf[Seq[Any]].map(_.toString), str(j, "alias"))
    case "bin"      => BinnedCol(str(j, "prop"), int(j, "n"), str(j, "unit"), Option(str(j, "alias")))
  }

  private def decPred(j: J): Pred = j("p") match {
    case "cmp" => Comparison(str(j, "lhs"), str(j, "op"), decRhs(j("rhs").asInstanceOf[J]))
    case "and" => AndPred(decPred(j("l").asInstanceOf[J]), decPred(j("r").asInstanceOf[J]))
    case "or"  => OrPred(decPred(j("l").asInstanceOf[J]), decPred(j("r").asInstanceOf[J]))
    case "not" => NotPred(decPred(j("x").asInstanceOf[J]))
  }

  private def decRhs(j: J): Rhs = j("r") match {
    case "lit"    => RLit(j.getOrElse("v", null))
    case "null"   => RNull
    case "list"   => RList(j("vs").asInstanceOf[Seq[Any]])
    case "colref" => RColRef(str(j, "name"))
    case "query"  => RQuery(decQuery(j("q").asInstanceOf[J]), str(j, "col"))
  }
}
