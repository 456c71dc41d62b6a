package graft.pattern

import graft.api.StixPatternError
import graft.model.StixMeta
import graft.model.StixMeta.{NodeLink, RelLink}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Extended STIX pattern compiler: pattern text -> Catalyst Column.
  *
  * The reference parses with a Lark LALR grammar (firepit/paramstix.lark)
  * and renders SQL WHERE text (firepit/stix20.py); we parse with a
  * recursive-descent parser over the same grammar and emit Column
  * expressions. Key mirrored semantics:
  *  - type scoping: comparisons whose path type differs from the queried
  *    table type vanish from the predicate (stix20.py:106-113);
  *  - ref paths compile to IN-subqueries — native Catalyst InSubquery, which
  *    the optimizer rewrites to semi/existence joins (stix20.py:64-84);
  *  - `_refs` lists route through the __reflist edge table;
  *  - ISSUBSET/ISSUPERSET -> in_subnet (ipv4 scope, stix20.py:24-39);
  *  - MATCHES -> rlike (re.search semantics); payload_bin LIKE/MATCHES
  *    decode base64 first (stix20.py:40-46);
  *  - `[*]` list props: array_contains on ArrayType columns, JSON-text LIKE
  *    fallback on strings ('%"sub":"val"%' for struct lists, stix20.py:48-58);
  *  - START/STOP qualifier parsed then dropped (stix20.py:154-156).
  */
object Pattern {

  // ----- AST ---------------------------------------------------------------
  // Observation-level connectives ([A] AND [B]) are distinct nodes from
  // comparison-level ones (inside one bracket): compilation treats them
  // identically, but summarize() needs the distinction — the reference
  // intersects path sets across observation AND and unions everything else
  // (stix20.py:173-178).
  sealed trait Node
  case class Comp(path: String, op: String, value: Value) extends Node
  case class And(l: Node, r: Node) extends Node
  case class Or(l: Node, r: Node) extends Node
  case class ObsAnd(l: Node, r: Node) extends Node
  case class ObsOr(l: Node, r: Node) extends Node

  sealed trait Value
  case class SVal(s: String) extends Value
  case class NVal(n: Double, text: String) extends Value
  case class LVal(vs: Seq[Value]) extends Value

  // ----- Parser ------------------------------------------------------------
  private class Parser(input: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input(pos) else '\u0000'
    private def fail(msg: String): Nothing =
      throw new StixPatternError(s"$msg at $pos in: $input")
    private def expect(c: Char): Unit = { ws(); if (peek != c) fail(s"expected '$c'"); pos += 1 }
    private def tryWord(w: String): Boolean = {
      ws()
      if (input.regionMatches(pos, w, 0, w.length) &&
        (pos + w.length >= input.length || !input(pos + w.length).isLetterOrDigit)) {
        pos += w.length; true
      } else false
    }

    def parse(): Node = {
      val n = obsDisj()
      ws()
      if (tryWord("START")) { timestamp(); if (!tryWord("STOP")) fail("expected STOP"); timestamp() }
      ws()
      if (pos < input.length) fail("trailing input")
      n
    }

    private def timestamp(): Unit = {
      ws()
      if (!input.regionMatches(pos, "t'", 0, 2)) fail("expected t'...'")
      pos += 2
      val end = input.indexOf('\'', pos)
      if (end < 0) fail("unterminated timestamp")
      pos = end + 1
    }

    private def obsDisj(): Node = {
      var l = obsConj()
      while (tryWord("OR")) l = ObsOr(l, obsConj())
      l
    }
    private def obsConj(): Node = {
      var l = obsExp()
      while (tryWord("AND")) l = ObsAnd(l, obsExp())
      l
    }
    private def obsExp(): Node = {
      ws()
      if (peek == '[') { pos += 1; val n = compDisj(); expect(']'); n }
      else if (peek == '(') { pos += 1; val n = obsDisj(); expect(')'); n }
      else fail("expected [ or (")
    }
    private def compDisj(): Node = {
      var l = compConj()
      while (tryWord("OR")) l = Or(l, compConj())
      l
    }
    private def compConj(): Node = {
      var l = compExp()
      while (tryWord("AND")) l = And(l, compExp())
      l
    }
    private def compExp(): Node = {
      ws()
      if (peek == '(') { pos += 1; val n = compDisj(); expect(')'); n }
      else simpleComp()
    }

    private def ident(): String = {
      ws()
      val start = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_' || input(pos) == '-'))
        pos += 1
      if (pos == start) fail("expected identifier")
      input.substring(start, pos)
    }

    private def path(): String = {
      // PATH: ECNAME ("[*]")? ("." ...)*  — accept ident chars, dots, quotes, [*]
      ws()
      val start = pos
      while (pos < input.length && (input(pos).isLetterOrDigit ||
          "_-.'".contains(input(pos)) ||
          (input(pos) == '[' && input.regionMatches(pos, "[*]", 0, 3)))) {
        if (input(pos) == '[') pos += 3 else pos += 1
      }
      if (pos == start) fail("expected path")
      input.substring(start, pos)
    }

    private def simpleComp(): Node = {
      val scoType = ident()
      expect(':')
      val p = path()
      val op = operator()
      val v = value()
      Comp(s"$scoType:$p", op, v)
    }

    private def operator(): String = {
      ws()
      val ops2 = Seq("!=", "<>", "<=", ">=")
      val ops1 = Seq("=", "<", ">")
      ops2.find(o => input.regionMatches(pos, o, 0, o.length)) match {
        case Some(o) => pos += o.length; o
        case None =>
          ops1.find(o => input.regionMatches(pos, o, 0, o.length)) match {
            case Some(o) => pos += o.length; o
            case None =>
              val neg = tryWord("NOT")
              val word = Seq("IN", "LIKE", "MATCHES", "ISSUBSET", "ISSUPERSET")
                .find(tryWord)
                .getOrElse(fail("expected operator"))
              if (neg) s"NOT $word" else word
          }
      }
    }

    private def value(): Value = {
      ws()
      peek match {
        case '(' =>
          pos += 1
          val vs = Seq.newBuilder[Value]
          vs += literal()
          ws()
          while (peek == ',') { pos += 1; vs += literal() }
          expect(')')
          LVal(vs.result())
        case _ => literal()
      }
    }

    private def literal(): Value = {
      ws()
      if (peek == '\'') {
        pos += 1
        val sb = new StringBuilder
        while (pos < input.length && input(pos) != '\'') {
          if (input(pos) == '\\' && pos + 1 < input.length) {
            sb.append(input(pos + 1)); pos += 2
          } else { sb.append(input(pos)); pos += 1 }
        }
        expect('\'')
        SVal(sb.toString)
      } else {
        val start = pos
        while (pos < input.length && (input(pos).isDigit || "+-.eE".contains(input(pos)))) pos += 1
        if (pos == start) fail("expected literal")
        val text = input.substring(start, pos)
        NVal(text.toDouble, text)
      }
    }
  }

  def parse(pattern: String): Node =
    try new Parser(pattern).parse()
    catch {
      case e: StixPatternError => throw e
      case e: Exception        => throw new StixPatternError(s"$pattern (${e.getMessage})")
    }

  // ----- Compiler ----------------------------------------------------------

  /** Compile to a Column for table `scoType`; None when every comparison was
    * scoped out (match-all, like the reference's empty WHERE). `resolve`
    * supplies DataFrames for ref-path subqueries. */
  def compile(pattern: String, scoType: String, resolve: String => DataFrame): Option[Column] =
    compileNode(parse(pattern), scoType, resolve)

  private def compileNode(n: Node, scoType: String, resolve: String => DataFrame): Option[Column] =
    n match {
      case And(l, r) =>
        (compileNode(l, scoType, resolve), compileNode(r, scoType, resolve)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b)             => a.orElse(b) // dropped side vanishes (stix20.py:115)
        }
      case Or(l, r) =>
        (compileNode(l, scoType, resolve), compileNode(r, scoType, resolve)) match {
          case (Some(a), Some(b)) => Some(a || b)
          case (a, b)             => a.orElse(b)
        }
      case ObsAnd(l, r) => compileNode(And(l, r), scoType, resolve)
      case ObsOr(l, r)  => compileNode(Or(l, r), scoType, resolve)
      case Comp(p, op, v) =>
        val (pType, prop) = StixMeta.splitPath(p)
        if (pType != scoType) None // type scoping: comparison vanishes
        else Some(compileComp(scoType, prop, op, v, resolve))
    }

  /** Referenced object paths per SCO type (reference summarize_pattern,
    * stix20.py:162-208): consumers use it to pre-plan which tables/columns a
    * pattern touches. Observation-level AND intersects the operand path
    * sets; every other connective unions them. */
  def summarize(pattern: String): Map[String, Set[String]] = {
    def paths(n: Node): Set[String] = n match {
      case Comp(p, _, _) => Set(p)
      case And(l, r)     => paths(l) | paths(r)
      case Or(l, r)      => paths(l) | paths(r)
      case ObsOr(l, r)   => paths(l) | paths(r)
      case ObsAnd(l, r)  => paths(l) & paths(r)
    }
    paths(parse(pattern))
      .groupBy(p => StixMeta.splitPath(p)._1)
      .map { case (t, ps) => t -> ps.map(p => StixMeta.splitPath(p)._2) }
  }

  private def compileComp(
      scoType: String,
      prop: String,
      op: String,
      v: Value,
      resolve: String => DataFrame): Column = {
    val links = StixMeta.parseProp(scoType, prop)
    if (links.isEmpty)
      throw new graft.api.InvalidStixPath(s"$scoType:$prop")
    // innermost comparison on the last node link
    val nodeLinks = links.collect { case nl: NodeLink => nl }
    val leafProp = nodeLinks.map(_.prop).mkString(".")
    val leafType = links.reverse.collectFirst { case RelLink(_, _, to) => to }.getOrElse(scoType)
    var result = leafComparison(leafType, leafProp, op, v, resolve)
    // wrap outward through ref hops (reverse order)
    links.reverse.foreach {
      case RelLink(fromType, refName, toType) =>
        val sub = resolve(toType).where(result).select(col("id"))
        if (refName.endsWith("_refs")) {
          val reflist = resolve("__reflist")
            .where(col("ref_name") === refName)
            .join(sub, col("target_ref") === sub("id"), "left_semi")
            .select(col("source_ref"))
          result = org.apache.spark.sql.GraftBridge.inSubquery(col("id"), reflist)
        } else {
          result = org.apache.spark.sql.GraftBridge.inSubquery(col(refName), sub)
        }
      case _ => ()
    }
    result
  }

  private def valueAsAny(v: Value): Any = v match {
    case SVal(s)       => s
    case NVal(d, text) => if (!text.contains('.') && !text.toLowerCase.contains('e')) d.toLong else d
    case LVal(_)       => throw new StixPatternError("list in scalar position")
  }
  private def valueAsString(v: Value): String = v match {
    case SVal(s)    => s
    case NVal(_, t) => t
    case LVal(_)    => throw new StixPatternError("list where scalar expected")
  }

  private def leafComparison(
      scoType: String,
      prop: String,
      op: String,
      v: Value,
      resolve: String => DataFrame): Column = {
    val (neg, baseOp) =
      if (op.startsWith("NOT ")) (true, op.stripPrefix("NOT ")) else (false, op)

    def maybeNeg(c: Column): Column = if (neg) !c else c

    // [*] list-property matching (stix20.py:48-58)
    if (prop.contains("[*]")) {
      val (listProp, _, subRaw) = {
        val i = prop.indexOf("[*]")
        (prop.substring(0, i), "", prop.substring(i + 3))
      }
      val sub = subRaw.stripPrefix(".")
      val rhs = valueAsString(v)
      val c = col(s"`$listProp`")
      val isArrayCol =
        try resolve(scoType).schema.fields
          .find(_.name == listProp)
          .exists(_.dataType.isInstanceOf[ArrayType])
        catch { case _: Exception => false }
      val cond =
        if (sub.isEmpty) {
          if (isArrayCol) array_contains(c, rhs)
          else c.like(s"%$rhs%") // JSON-text fallback, reference semantics
        } else c.like(s"""%"$sub":"$rhs"%""")
      return if (baseOp == "!=" || neg) !cond else cond
    }

    val c = col(s"`$prop`")
    baseOp match {
      case "ISSUBSET" =>
        if (scoType == "ipv4-addr" || prop == "src_ref.value" || prop == "dst_ref.value")
          maybeNeg(graft.functions.Funcs.in_subnet(c, lit(valueAsString(v))))
        else throw new StixPatternError(s"ISSUBSET not supported for $scoType")
      case "ISSUPERSET" =>
        if (scoType == "ipv4-addr" || prop == "src_ref.value" || prop == "dst_ref.value")
          maybeNeg(graft.functions.Funcs.in_subnet(lit(valueAsString(v)), c))
        else throw new StixPatternError(s"ISSUPERSET not supported for $scoType")
      case "MATCHES" =>
        if (prop.endsWith("payload_bin"))
          maybeNeg(graft.functions.Funcs.match_bin(valueAsString(v), c))
        else maybeNeg(c.rlike(valueAsString(v)))
      case "LIKE" =>
        if (prop.endsWith("payload_bin"))
          maybeNeg(graft.functions.Funcs.like_bin(valueAsString(v), c))
        else
          // backslashes are literal in reference LIKE semantics (sqlite, no
          // ESCAPE clause); Spark's escape char is \, so double it
          maybeNeg(c.like(valueAsString(v).replace("\\", "\\\\")))
      case "IN" =>
        v match {
          case LVal(vs) => maybeNeg(c.isin(vs.map(valueAsAny): _*))
          case single   => maybeNeg(c === lit(valueAsAny(single)))
        }
      case "="  => c === lit(valueAsAny(v))
      case "!=" | "<>" => c =!= lit(valueAsAny(v))
      case "<"  => c < lit(valueAsAny(v))
      case ">"  => c > lit(valueAsAny(v))
      case "<=" => c <= lit(valueAsAny(v))
      case ">=" => c >= lit(valueAsAny(v))
      case other => throw new StixPatternError(s"unknown op $other")
    }
  }
}
