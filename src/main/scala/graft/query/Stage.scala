package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable query stages — the relational algebra of the reference engine
  * (firepit/query.py:518-594), re-expressed as a fold over DataFrames.
  *
  * Where the reference renders stages to parameterized SQL text and hands it
  * to SQLite/PostgreSQL (firepit/query.py:596-671), here the stages assemble
  * a Catalyst logical plan directly: clause slots are collected in stage
  * order (mirroring the documented evaluation order, firepit/query.py:521-532)
  * and applied in canonical SQL order — FROM, JOIN, WHERE, GROUP/AGG, HAVING,
  * SELECT, DISTINCT, ORDER, OFFSET/LIMIT, COUNT. Catalyst then does the
  * pushdown/pruning/join-selection the reference delegates to its host DB.
  */
sealed trait Stage

/** Scan a named relation (base table or registered view); malformed names
  * raise at construction (firepit/query.py:321-323). */
case class Table(name: String) extends Stage {
  graft.api.Validate.validateName(name)
}

/** Derived table: a nested query in FROM position. firepit/query.py:602-607 */
case class SubqueryTable(q: GQuery, alias: String) extends Stage

/** Column subset with aliases / rendered expressions. firepit/query.py:305-315 */
case class Projection(cols: Seq[ColSpec]) extends Stage

/** WHERE (or HAVING, when appended after aggregation — firepit/query.py:563-567). */
case class Filter(preds: Seq[Pred], disjunction: Boolean = false) extends Stage

/** GROUP BY key list. firepit/query.py:329-353 */
case class Group(cols: Seq[ColSpec]) extends Stage

/** Aggregate list over groups; group cols auto-prepend to the output
  * (Spark's groupBy.agg does this natively). firepit/query.py:356-395 */
case class Aggregation(aggs: Seq[AggLike]) extends Stage

/** Multi-key sort. firepit/query.py:283-302 */
case class Order(keys: Seq[OrderKey]) extends Stage

case class Limit(n: Int) extends Stage
case class Offset(n: Int) extends Stage

/** COUNT(*) AS count over the whole result. firepit/query.py:418-425 */
case class CountRows() extends Stage

/** SELECT DISTINCT. firepit/query.py:428-435 */
case class Unique() extends Stage

/** COUNT(DISTINCT cols) AS count. firepit/query.py:438-450 */
case class CountUnique(cols: Seq[String] = Nil) extends Stage

/** Two-relation join; `lhs` defaults to the previous stage's relation
  * (implicit chaining, firepit/query.py:609-612). Physical strategy
  * (broadcast/shuffle-hash/sort-merge) is Catalyst's choice, exactly as the
  * reference leaves it to the host DB (firepit/query.py:453-515). */
case class Join(
    name: String,
    leftCol: String,
    op: String,
    rightCol: String,
    how: String = "inner",
    alias: Option[String] = None,
    extraPreds: Seq[Pred] = Nil,
    /** Relation the left column binds to; defaults to the PREVIOUS stage's
      * relation (implicit chaining). An explicit lhs re-anchors a later
      * join at an earlier relation (firepit/query.py:453-515 `lhs=`;
      * tests/test_storage.py:732-753 joins ipv4-addr twice off `conns`). */
    lhs: Option[String] = None
) extends Stage {
  // construction-time validation, firepit/query.py:463-470 (cross joins
  // carry no ON columns, so empty is legal there)
  graft.api.Validate.validateName(name)
  if (leftCol.nonEmpty) graft.api.Validate.validatePath(leftCol)
  if (rightCol.nonEmpty) graft.api.Validate.validatePath(rightCol)
  alias.foreach(graft.api.Validate.validateName)
  lhs.foreach(graft.api.Validate.validateName)
}

case class OrderKey(col: String, asc: Boolean = true)
object OrderKey {
  def desc(c: String): OrderKey = OrderKey(c, asc = false)
}

sealed trait AggLike { def toColumn: Column }

/** Pre-built aggregate expression escape hatch (e.g. sum(price*(1-disc))). */
case class ExprAgg(c: Column, alias: String) extends AggLike {
  def toColumn: Column = c.as(alias)
}

/** Already-aliased aggregate expression (auto-agg synthesis output). */
case class RawAgg(c: Column) extends AggLike {
  def toColumn: Column = c
}

/** Aggregate spec: func in COUNT/SUM/MIN/MAX/AVG/NUNIQUE (firepit/query.py:11),
  * NUNIQUE = COUNT(DISTINCT) (firepit/query.py:382-384). `col=None` => '*'. */
case class Agg(func: String, col: Option[String], alias: String) extends AggLike {
  // AGG_FUNCS contract (firepit/query.py:11, :362-369): unknown functions
  // raise at construction, not at plan-build time
  locally {
    if (!Agg.aggFuncs(func.toUpperCase))
      throw new graft.api.InvalidAggregateFunction(func)
  }
  def toColumn: Column = {
    val f = func.toUpperCase
    // '*' is the reference's spelling of "whole row" (firepit/query.py:385-389)
    val c = col.filter(_ != "*").map(column => org.apache.spark.sql.functions.col(column))
    val base = f match {
      case "COUNT"   => c.map(count).getOrElse(count(lit(1)))
      case "SUM"     => sum(c.get)
      case "MIN"     => min(c.get)
      case "MAX"     => max(c.get)
      case "AVG"     => avg(c.get)
      case "NUNIQUE" => count_distinct(c.get)
      case other     => throw new graft.api.InvalidAggregateFunction(other)
    }
    base.as(alias)
  }
}
object Agg {
  private[query] val aggFuncs: Set[String] =
    Set("COUNT", "SUM", "MIN", "MAX", "AVG", "NUNIQUE")
  def apply(func: String, col: String, alias: String): Agg = Agg(func, Some(col), alias)
  /** Missing alias defaults to the lowercased function name
    * (firepit/query.py:390-391: `SUM("foo") AS "sum"`). */
  def apply(func: String, col: String): Agg = Agg(func, Some(col), func.toLowerCase)
  def countStar(alias: String = "count"): Agg = Agg("COUNT", None, alias)
}

/** Column specs renderable to Catalyst Columns (firepit/query.py:70-157). */
sealed trait ColSpec {
  def toColumn: Column
  /** output name, for group-key bookkeeping */
  def outName: String
}

/** Qualified / aliased plain column ref. firepit/query.py:70-93 */
case class Col(name: String, table: Option[String] = None, alias: Option[String] = None)
    extends ColSpec {
  // construction-time validation, firepit/query.py:70-78 — this is what makes
  // Group/Projection/Order reject injection-shaped "column names"
  graft.api.Validate.validatePath(name)
  table.foreach(graft.api.Validate.validateName)
  alias.foreach(graft.api.Validate.validatePath)
  def toColumn: Column = {
    val c = table.map(t => col(s"$t.$name")).getOrElse(col(name))
    alias.map(c.as).getOrElse(c)
  }
  def outName: String = alias.getOrElse(name)
}
object Col {
  def apply(name: String, alias: String): Col = Col(name, None, Some(alias))
}

/** First non-null across join branches (reference uses it to merge the
  * ipv4/ipv6 sides of a deref join). firepit/query.py:96-109 */
case class CoalescedCol(names: Seq[String], alias: String) extends ColSpec {
  names.foreach(graft.api.Validate.validatePath)
  graft.api.Validate.validatePath(alias)
  def toColumn: Column = coalesce(names.map(col): _*).as(alias)
  def outName: String = alias
}

/** Bucket numeric or timestamp values for grouping. The reference renders
  * timestamps to `floor(epoch/width)*width` then back to ISO text, numerics
  * to integer-truncated `x/n*n` (firepit/query.py:112-157). We keep the same
  * bucket arithmetic; timestamp buckets surface as epoch-second LONGs (the
  * caller can re-render) so results are engine-independent.
  */
case class BinnedCol(
    prop: String,
    n: Int,
    unit: String = "", // "" => numeric binning; s/m/h/d => timestamp binning
    alias: Option[String] = None
) extends ColSpec {
  graft.api.Validate.validatePath(prop)
  alias.foreach(graft.api.Validate.validatePath)
  private val unitSeconds = Map("s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L)
  def toColumn: Column = {
    val c =
      if (unit.isEmpty) {
        // truncating division, matching the reference's integer `x / n * n`
        // (values are non-negative in practice; floor == truncation)
        floor(col(prop) / n).cast("long") * n
      } else {
        val w = unitSeconds(unit) * n
        // cast-to-timestamp first: STIX tables keep timestamps as RFC-3339
        // TEXT ('2020-06-30T19:28:22.357434Z'), which unix_timestamp's
        // default format rejects; the ISO-8601-lenient cast handles both
        // text and native timestamp columns
        (floor(unix_timestamp(col(prop).cast("timestamp")) / w) * w).cast("long")
      }
    c.as(alias.getOrElse(s"${prop}_bin"))
  }
  def outName: String = alias.getOrElse(s"${prop}_bin")
}

/** Pre-built Catalyst expression escape hatch (pattern compiler output etc.). */
case class ExprCol(c: Column, alias: String) extends ColSpec {
  def toColumn: Column = c.as(alias)
  def outName: String = alias
}

// ---------------------------------------------------------------------------
// Predicates
// ---------------------------------------------------------------------------

/** Predicate tree (firepit/query.py:160-253). Compiles to a Catalyst Column;
  * IN-subqueries become native `InSubquery` expressions (optimizer rewrites
  * them to semi/existence joins — the distributed analogue of the SQL text
  * `col IN (SELECT ...)` the reference emits). */
sealed trait Pred {
  def toColumn(resolve: String => DataFrame): Column
}

case class Comparison(lhs: String, op: String, rhs: Rhs) extends Pred {
  import Comparison._

  // construction-time contract (firepit/query.py:170-193): an unknown
  // operator, or a NULL comparison outside =/!=/IS, raises immediately —
  // callers see the typed error before any plan is built
  locally {
    graft.api.Validate.validatePath(lhs) // firepit/query.py:74 via Column
    val u = op.toUpperCase
    if (!compOps(u)) throw new graft.api.InvalidComparisonOperator(op)
    if (isNullish(rhs) && !nullOps(u)) throw new graft.api.InvalidComparisonOperator(op)
  }

  def toColumn(resolve: String => DataFrame): Column = {
    // STIX list property: `prop[*]` compares against the string-encoded
    // list column, so scalar =/!= become wildcard LIKEs and every non-null
    // rhs gets %-wrapped (firepit/query.py:181-188)
    val (name, upper, rhsEff) = {
      val star = lhs.indexOf("[*]")
      val base = if (star >= 0) lhs.substring(0, star) else lhs
      val u = op.toUpperCase
      if (star >= 0 && !isNullish(rhs)) {
        val wrapped = rhs match {
          case RLit(v) => RLit(s"%$v%")
          case other   => other
        }
        u match {
          case "="         => (base, "LIKE", wrapped)
          case "!=" | "<>" => (base, "NOT LIKE", wrapped)
          case o           => (base, o, wrapped)
        }
      } else (base, u, if (isNullish(rhs)) RNull else rhs)
    }
    val c = col(name)
    (upper, rhsEff) match {
      // NULL normalization: `= null` => IS NULL (firepit/query.py:190-193,221-227)
      case ("=", RNull) | ("IS", RNull)                     => c.isNull
      case ("!=", RNull) | ("<>", RNull) | ("IS NOT", RNull) => c.isNotNull
      case ("=", r)        => c === r.value
      case ("!=", r)       => c =!= r.value
      case ("<>", r)       => c =!= r.value
      case ("<", r)        => c < r.value
      case (">", r)        => c > r.value
      case ("<=", r)       => c <= r.value
      case (">=", r)       => c >= r.value
      // payload_bin comparisons route to the base64-decoding functions
      // (firepit/query.py:216-220) — without this a Stage-level LIKE against
      // `artifact` would silently match over base64 text
      case ("LIKE", r) if name == "payload_bin" =>
        graft.functions.Funcs.like_bin(r.asString, c)
      case ("NOT LIKE", r) if name == "payload_bin" =>
        !graft.functions.Funcs.like_bin(r.asString, c)
      case ("MATCHES", r) if name == "payload_bin" =>
        graft.functions.Funcs.match_bin(r.asString, c)
      case ("NOT MATCHES", r) if name == "payload_bin" =>
        !graft.functions.Funcs.match_bin(r.asString, c)
      // backslashes in LIKE values are literal in the reference (sqlite has
      // no default ESCAPE); Spark treats \ as the escape char, so double it
      case ("LIKE", r)     => c.like(r.asString.replace("\\", "\\\\"))
      case ("NOT LIKE", r) => !c.like(r.asString.replace("\\", "\\\\"))
      // reference MATCHES = re.search (find), matching Spark's rlike
      case ("MATCHES", r)     => c.rlike(r.asString)
      case ("NOT MATCHES", r) => !c.rlike(r.asString)
      case ("IN", RList(vs))     => c.isin(vs: _*)
      case ("NOT IN", RList(vs)) => !c.isin(vs: _*)
      case ("IN", RQuery(q, resolveCol)) =>
        org.apache.spark.sql.GraftBridge.inSubquery(c, q.df(resolve).select(resolveCol))
      case ("NOT IN", RQuery(q, resolveCol)) =>
        org.apache.spark.sql.GraftBridge.notInSubquery(c, q.df(resolve).select(resolveCol))
      case ("ISSUBSET", r) => graft.functions.Funcs.in_subnet(c, lit(r.value))
      case (o, _) => throw new IllegalArgumentException(s"Unknown predicate op: $o")
    }
  }
}

object Comparison {
  /** COMP_OPS (firepit/query.py:7-8) plus the engine-level extensions the
    * pattern compiler lowers through this node (NOT MATCHES, ISSUBSET). */
  private[query] val compOps: Set[String] = Set(
    "=", "<>", "!=", "<", ">", "<=", ">=", "LIKE", "IN", "IS",
    "NOT LIKE", "NOT IN", "IS NOT", "MATCHES", "NOT MATCHES",
    "ISSUBSET", "ISSUPERSET")
  private[query] val nullOps: Set[String] = Set("=", "!=", "<>", "IS", "IS NOT")
  private[query] def isNullish(r: Rhs): Boolean = r match {
    case RNull                       => true
    case RLit(null)                  => true
    case RLit("null") | RLit("NULL") => true
    case _                           => false
  }
}

case class AndPred(l: Pred, r: Pred) extends Pred {
  def toColumn(resolve: String => DataFrame): Column = l.toColumn(resolve) && r.toColumn(resolve)
}
case class OrPred(l: Pred, r: Pred) extends Pred {
  def toColumn(resolve: String => DataFrame): Column = l.toColumn(resolve) || r.toColumn(resolve)
}
case class NotPred(p: Pred) extends Pred {
  def toColumn(resolve: String => DataFrame): Column = !p.toColumn(resolve)
}
/** Raw Catalyst escape hatch (used by the pattern compiler). */
case class ExprPred(c: Column) extends Pred {
  def toColumn(resolve: String => DataFrame): Column = c
}

/** Right-hand sides. */
sealed trait Rhs {
  def value: Any = this match {
    case RLit(v)  => v
    case RNull    => null
    case RColRef(n) => col(n)
    case _        => throw new IllegalArgumentException(s"No scalar value for $this")
  }
  def asString: String = this match {
    case RLit(v: String) => v
    case other           => throw new IllegalArgumentException(s"String rhs required, got $other")
  }
}
case class RLit(v: Any) extends Rhs
case object RNull extends Rhs
case class RList(vs: Seq[Any]) extends Rhs
case class RColRef(name: String) extends Rhs
case class RQuery(q: GQuery, column: String) extends Rhs

// ---------------------------------------------------------------------------
// Query assembly + fold
// ---------------------------------------------------------------------------

/** Stage container + fold to DataFrame (the analogue of Query.render,
  * firepit/query.py:596-671 — except the DataFrame *is* the query; there is
  * no SQL-text IR). `resolve` maps relation names to DataFrames (engine
  * catalog / parquet reader).
  */
case class GQuery(stages: Seq[Stage]) {
  def append(s: Stage): GQuery = GQuery(stages :+ s)

  def df(resolve: String => DataFrame): DataFrame = {
    var base: Option[DataFrame] = None
    var lastAlias: Option[String] = None
    var wherePreds = Vector.empty[Column]
    var havingPreds = Vector.empty[Column]
    var groupCols = Vector.empty[ColSpec]
    var aggCols = Vector.empty[Column]
    var sawAgg = false
    var proj: Option[Seq[ColSpec]] = None
    var distinct = false
    var orderKeys = Vector.empty[OrderKey]
    var limitN: Option[Int] = None
    var offsetN: Option[Int] = None
    var countFinal = false
    var countUnique: Option[Seq[String]] = None

    stages.foreach {
      case Table(name) =>
        base = Some(resolve(name).alias(name))
        lastAlias = Some(name)
      case SubqueryTable(q, alias) =>
        base = Some(q.df(resolve).alias(alias))
        lastAlias = Some(alias)
      case j @ Join(name, lcol, op, rcol, how, alias, extra, lhs) =>
        // a JOIN with no relation on the left is malformed (firepit/query.py
        // Join append contract; tests/test_query.py test_join_without_table)
        if (base.isEmpty)
          throw new graft.api.InvalidQuery("JOIN requires a preceding table")
        val rightAlias = alias.getOrElse(name)
        val right = resolve(name).alias(rightAlias)
        val sparkHow = how.toUpperCase match {
          case "INNER"                 => "inner"
          case "LEFT OUTER" | "LEFT"   => "left_outer"
          case "RIGHT OUTER" | "RIGHT" => "right_outer"
          case "OUTER" | "FULL OUTER"  => "full_outer"
          case "CROSS"                 => "cross"
          case o                       => o.toLowerCase
        }
        base = Some(
          if (sparkHow == "cross") base.get.crossJoin(right)
          else {
            val l = col(s"${lhs.getOrElse(lastAlias.get)}.$lcol")
            val r = col(s"$rightAlias.$rcol")
            val eq = op match {
              case "="          => l === r
              case "!=" | "<>"  => l =!= r
              case "<"          => l < r
              case ">"          => l > r
              case "<="         => l <= r
              case ">="         => l >= r
              case o            => throw new IllegalArgumentException(s"Join op $o")
            }
            val cond = extra.foldLeft(eq)((acc, p) => acc && p.toColumn(resolve))
            base.get.join(right, cond, sparkHow)
          }
        )
        lastAlias = Some(rightAlias)
      case Filter(preds, disj) =>
        val compiled = preds.map(_.toColumn(resolve))
        val combined =
          if (disj) compiled.reduce(_ || _) else compiled.reduce(_ && _)
        // post-aggregation filter = HAVING (firepit/query.py:563-567)
        if (sawAgg) havingPreds :+= combined else wherePreds :+= combined
      case Group(cols) =>
        groupCols = cols.toVector
      case Aggregation(aggs) =>
        aggCols ++= aggs.map(_.toColumn)
        sawAgg = true
      case Order(keys)   => orderKeys ++= keys
      case Limit(n)      => limitN = Some(n)
      case Offset(n)     => offsetN = Some(n)
      case CountRows()   => countFinal = true
      case Unique()      => distinct = true
      case CountUnique(cols) => countUnique = Some(cols)
      case Projection(cols)  => proj = Some(cols)
    }

    var df = base.getOrElse(throw new IllegalStateException("Query has no Table stage"))
    if (wherePreds.nonEmpty) df = df.where(wherePreds.reduce(_ && _))

    if (aggCols.nonEmpty) {
      df =
        if (groupCols.nonEmpty)
          df.groupBy(groupCols.map(_.toColumn): _*).agg(aggCols.head, aggCols.tail: _*)
        else df.agg(aggCols.head, aggCols.tail: _*)
    } else if (groupCols.nonEmpty) {
      // GROUP BY with no aggregate list = distinct key tuples (the reference's
      // auto-aggregation layer fills aggs in before it gets here; see
      // Storage.autoAggs)
      df = df.select(groupCols.map(_.toColumn): _*).distinct()
    }
    if (havingPreds.nonEmpty) df = df.where(havingPreds.reduce(_ && _))
    proj.foreach(cols => df = df.select(cols.map(_.toColumn): _*))
    // Projection + Unique + Count renders as COUNT(DISTINCT cols) in the
    // reference (firepit/query.py:418-450; tests/test_query.py
    // test_proj_unique_count) — null-excluding, unlike COUNT(*) over a
    // DISTINCT subquery, so route it through count_distinct
    val countDistinctProj = countFinal && distinct && proj.isDefined && countUnique.isEmpty
    if (distinct && countUnique.isEmpty && !countDistinctProj) df = df.distinct()
    countUnique.foreach { cols =>
      df =
        if (cols.isEmpty) df.distinct().agg(count(lit(1)).as("count"))
        else df.agg(count_distinct(col(cols.head), cols.tail.map(col): _*).as("count"))
    }
    if (orderKeys.nonEmpty)
      df = df.orderBy(orderKeys.map { k =>
        // deref output columns contain literal dots ("src_ref.value") —
        // quote when the name exists as-is so it isn't read as a field path
        val c = if (df.columns.contains(k.col)) col(s"`${k.col}`") else col(k.col)
        if (k.asc) c.asc else c.desc
      }: _*)
    offsetN.foreach(n => df = df.offset(n))
    limitN.foreach(n => df = df.limit(n))
    if (countFinal) df =
      if (countDistinctProj) {
        val names = proj.get.map(_.outName)
        df.agg(count_distinct(col(names.head), names.tail.map(col): _*).as("count"))
      } else df.agg(count(lit(1)).as("count"))
    df
  }
}

object GQuery {
  def apply(stages: Stage*)(implicit d: DummyImplicit): GQuery = GQuery(stages.toSeq)
  def table(name: String, stages: Stage*): GQuery = GQuery(Table(name) +: stages.toSeq)
}
