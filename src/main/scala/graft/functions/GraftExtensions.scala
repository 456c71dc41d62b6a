package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** SQL registration of the engine's scalar surface — the
  * `SparkSessionExtensions` mechanism for shipping custom expressions as a
  * library: sessions created with `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) can call
  * `in_subnet`, `match_bin`, `like_bin`, `rfc3339`, `simhash64`, `dot_f`,
  * and `norm_f` from plain SQL — the same names the reference exposes as
  * host-DB functions (sqlitestorage.py:54-87 registers them on every
  * connection; pgcommon.py ships them as CREATE FUNCTION DDL). The native
  * expressions (SimHash64/DotF/NormF) inject directly; the built-in-composed
  * ones (Funcs) go through the Column bridge, so one definition serves both
  * the DataFrame and SQL APIs.
  *
  * `install(spark)` does the same registrations on an ALREADY RUNNING
  * session (extension classes only apply at session instantiation) — the
  * CLI's `sql` command uses this so statement files get the functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def c(e: Expression): Column = GraftBridge.column(e)
  // eager conversion: builder output must be a real Catalyst tree (see
  // GraftBridge.resolvedExpression) — the lazy wrapper reaches codegen
  private def e(col: Column): Expression = GraftBridge.resolvedExpression(col)
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) rows in SparkSessionExtensions' injectable
    * shape. Patterns are COLUMNS here (SQL can't demand Scala literals);
    * like_bin keeps the reference's literal-backslash contract by doubling
    * them before LIKE, same as Funcs.like_bin does on the literal. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("in_subnet"),
        info("in_subnet", "in_subnet(value, cidr) - IPv4 addr-or-subnet CIDR membership"),
        (args: Seq[Expression]) => e(Funcs.in_subnet(c(args(0)), c(args(1))))),
      (FunctionIdentifier("match_bin"),
        info("match_bin", "match_bin(pattern, b64) - regex search over a base64-decoded value"),
        (args: Seq[Expression]) =>
          e(call_function("rlike", decode(unbase64(c(args(1))), "UTF-8"), c(args(0))))),
      (FunctionIdentifier("like_bin"),
        info("like_bin", "like_bin(pattern, b64) - SQL LIKE over a base64-decoded value"),
        (args: Seq[Expression]) =>
          e(call_function(
            "like",
            decode(unbase64(c(args(1))), "UTF-8"),
            call_function("replace", c(args(0)), lit("\\"), lit("\\\\"))))),
      (FunctionIdentifier("rfc3339"),
        info("rfc3339", "rfc3339(ts) - RFC-3339 millisecond text rendering"),
        (args: Seq[Expression]) => e(Funcs.rfc3339(c(args(0))))),
      (FunctionIdentifier("simhash64"),
        info("simhash64", "simhash64(text) - 64-bit SimHash of normalized word tokens"),
        (args: Seq[Expression]) => SimHash64(args(0))),
      (FunctionIdentifier("dot_f"),
        info("dot_f", "dot_f(a, b) - dot product of two array<float|double> vectors"),
        (args: Seq[Expression]) => DotF(args(0), args(1))),
      (FunctionIdentifier("norm_f"),
        info("norm_f", "norm_f(a) - L2 norm of an array<float|double> vector"),
        (args: Seq[Expression]) => NormF(args(0))),
      // sketch aggregates: builders return the bare AggregateFunction —
      // the analyzer wraps non-windowed uses in an AggregateExpression,
      // exactly how the built-in sum/avg registry entries work. k/d/w must
      // be literals (they size the aggregation state at plan time).
      (FunctionIdentifier("kmv_distinct"),
        info("kmv_distinct",
          "kmv_distinct(value, k) - KMV distinct-count estimate over the 60-bit md5 domain"),
        (args: Seq[Expression]) =>
          KmvSketch(e(Funcs.md5Hash60(c(args(0)))), litInt(args(1), "k"))),
      (FunctionIdentifier("kmv_hashes"),
        info("kmv_hashes",
          "kmv_hashes(value, k) - the KMV sketch itself: ascending array of the k smallest distinct 60-bit md5 hashes"),
        (args: Seq[Expression]) =>
          KmvHashes(e(Funcs.md5Hash60(c(args(0)))), litInt(args(1), "k"))),
      (FunctionIdentifier("bottom_k_sample"),
        info("bottom_k_sample",
          "bottom_k_sample(value, id, k) - the group's k-smallest-by-id-hash sample of value, ascending array<double>"),
        (args: Seq[Expression]) =>
          BottomKSample(
            e(org.apache.spark.sql.functions.struct(
              Funcs.md5Hash60(c(args(1))).as("h"),
              c(args(0)).cast("double").as("v"))),
            litInt(args(2), "k"))),
      (FunctionIdentifier("cms_sketch"),
        info("cms_sketch",
          "cms_sketch(value, depth, width) - Count-Min counter matrix (row-major array<bigint>)"),
        (args: Seq[Expression]) => {
          val (d, w) = (litInt(args(1), "depth"), litInt(args(2), "width"))
          CmsSketch(e(CmsSketch.buckets(c(args(0)), d, w)), d, w)
        }),
      (FunctionIdentifier("cms_estimate"),
        info("cms_estimate",
          "cms_estimate(sketch, value, depth, width) - point-frequency estimate from a cms_sketch"),
        (args: Seq[Expression]) =>
          e(CmsSketch.estimate(
            c(args(0)), c(args(1)), litInt(args(2), "depth"), litInt(args(3), "width")))))

  /** Plan-time integer literal (sketch parameters size aggregation state —
    * they cannot be data-dependent). */
  private def litInt(ex: Expression, name: String): Int = {
    require(ex.foldable, s"$name must be a literal integer")
    ex.eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(s"$name must be an integer, got $other")
    }
  }

  /** Same registrations on a live session. Idempotent PER FUNCTION — each
    * name is checked individually, so a session that already carries part
    * of the surface (a user-registered in_subnet, an interrupted install)
    * still gets every missing function rather than silently keeping a
    * partial surface; names that exist are left alone (re-registration
    * would only replace identical builders, with a registry warning). */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (id, inf, builder) =>
      if (!spark.catalog.functionExists(id.funcName))
        GraftBridge.registerFunction(spark, id.funcName, inf, builder)
    }
}
