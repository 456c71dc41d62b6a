package graft

import graft.query._
import graft.catalog.Catalog
import org.apache.spark.sql.functions._

/** Operator-level specs for the Stage ADT fold (SURVEY §2.1). */
class StageSpec extends SparkSpec {

  private def cat = new Catalog(spark, sfDir)

  test("Table + Projection + alias") {
    val rows = GQuery
      .table("region", Projection(Seq(Col("r_regionkey"), Col("r_name", "region_name"))))
      .df(cat.resolve)
    assert(rows.columns.toSeq == Seq("r_regionkey", "region_name"))
    assert(rows.count() == 5)
  }

  test("Filter: comparison ops and LIKE") {
    val c = cat
    val n = GQuery
      .table("part", Filter(Seq(Comparison("p_name", "LIKE", RLit("%gear%")))), CountRows())
      .df(c.resolve)
      .head()
      .getLong(0)
    val total = c.resolve("part").count()
    assert(n > 0 && n < total)
  }

  test("Filter: null normalization (= null -> IS NULL)") {
    val c = cat
    c.registerRecipe("with_nulls") { r =>
      r("region").withColumn("maybe", when(col("r_regionkey") < 2, col("r_name")))
    }
    val n = GQuery
      .table("with_nulls", Filter(Seq(Comparison("maybe", "=", RNull))), CountRows())
      .df(c.resolve)
      .head()
      .getLong(0)
    assert(n == 3)
  }

  test("Filter: AND/OR/NOT tree") {
    val pred = AndPred(
      OrPred(Comparison("r_regionkey", "=", RLit(0)), Comparison("r_regionkey", "=", RLit(1))),
      NotPred(Comparison("r_regionkey", "=", RLit(1))))
    val rows =
      GQuery.table("region", Filter(Seq(pred))).df(cat.resolve).select("r_regionkey").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0))
  }

  test("Filter after Aggregation = HAVING") {
    val df = GQuery
      .table(
        "orders",
        Group(Seq(Col("o_custkey"))),
        Aggregation(Seq(Agg.countStar("cnt"))),
        Filter(Seq(Comparison("cnt", ">", RLit(5)))))
      .df(cat.resolve)
    assert(df.agg(min("cnt")).head().getLong(0) > 5)
  }

  test("Group + Aggregation: COUNT/SUM/MIN/MAX/AVG/NUNIQUE") {
    val row = GQuery
      .table(
        "lineitem",
        Group(Seq(Col("l_returnflag"))),
        Aggregation(Seq(
          Agg.countStar("cnt"),
          Agg("SUM", "l_quantity", "s"),
          Agg("MIN", "l_quantity", "mn"),
          Agg("MAX", "l_quantity", "mx"),
          Agg("AVG", "l_quantity", "av"),
          Agg("NUNIQUE", "l_orderkey", "nu"))))
      .df(cat.resolve)
    assert(row.columns.toSeq == Seq("l_returnflag", "cnt", "s", "mn", "mx", "av", "nu"))
    assert(row.count() > 0)
  }

  test("Order + Limit + Offset") {
    val c = cat
    val all = GQuery
      .table("orders", Projection(Seq(Col("o_orderkey"))), Order(Seq(OrderKey("o_orderkey"))))
      .df(c.resolve)
      .collect()
      .map(_.getLong(0))
    val page = GQuery
      .table(
        "orders",
        Projection(Seq(Col("o_orderkey"))),
        Order(Seq(OrderKey("o_orderkey"))),
        Offset(10),
        Limit(5))
      .df(c.resolve)
      .collect()
      .map(_.getLong(0))
    assert(page.toSeq == all.slice(10, 15).toSeq)
  }

  test("Order: DESC") {
    val ks = GQuery
      .table(
        "region",
        Projection(Seq(Col("r_regionkey"))),
        Order(Seq(OrderKey.desc("r_regionkey"))))
      .df(cat.resolve)
      .collect()
      .map(_.getInt(0))
    assert(ks.toSeq == ks.sorted.reverse.toSeq)
  }

  test("Unique / CountUnique") {
    val c = cat
    val d = GQuery
      .table("customer", Projection(Seq(Col("c_mktsegment"))), Unique())
      .df(c.resolve)
      .count()
    val cu = GQuery
      .table("customer", CountUnique(Seq("c_mktsegment")))
      .df(c.resolve)
      .head()
      .getLong(0)
    assert(d == cu)
  }

  test("Join: inner + implicit chaining") {
    val df = GQuery
      .table(
        "customer",
        Join("nation", "c_nationkey", "=", "n_nationkey"),
        Join("region", "n_regionkey", "=", "r_regionkey"),
        Projection(Seq(Col("c_custkey"), Col("n_name"), Col("r_name"))))
      .df(cat.resolve)
    assert(df.count() == cat.resolve("customer").count())
  }

  test("Join: left outer keeps unmatched") {
    val c = cat
    c.register(
      "bigo",
      GQuery.table(
        "orders",
        Filter(Seq(Comparison("o_totalprice", ">", RLit(450000.0)))),
        Projection(Seq(Col("o_orderkey"), Col("o_custkey")))))
    val n = GQuery
      .table("customer", Join("bigo", "c_custkey", "=", "o_custkey", how = "LEFT OUTER"))
      .df(c.resolve)
      .count()
    assert(n >= c.resolve("customer").count())
  }

  test("Join: cross") {
    val c = cat
    val n = GQuery.table("region", Join("nation", "", "=", "", how = "CROSS")).df(c.resolve).count()
    assert(n == 5 * 25)
  }

  test("IN-subquery compiles to a (semi) join, not a collect") {
    val c = cat
    val sub = GQuery.table(
      "orders",
      Filter(Seq(Comparison("o_orderpriority", "=", RLit("1-URGENT")))),
      Projection(Seq(Col("o_orderkey"))))
    val df = GQuery
      .table("lineitem", Filter(Seq(Comparison("l_orderkey", "IN", RQuery(sub, "o_orderkey")))))
      .df(c.resolve)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join LeftSemi") || plan.contains("ExistenceJoin"))
    assert(df.count() > 0)
  }

  test("BinnedCol: numeric truncation buckets") {
    val buckets = GQuery
      .table(
        "orders",
        Group(Seq(BinnedCol("o_totalprice", 100000, "", Some("b")))),
        Aggregation(Seq(Agg.countStar("cnt"))),
        Order(Seq(OrderKey("b"))))
      .df(cat.resolve)
      .collect()
    assert(buckets.forall(_.getLong(0) % 100000 == 0))
  }

  test("BinnedCol: time buckets are epoch-aligned") {
    val buckets = GQuery
      .table("orders", Group(Seq(BinnedCol("o_orderdate", 1, "d", Some("b")))),
        Aggregation(Seq(Agg.countStar("cnt"))))
      .df(cat.resolve)
      .collect()
    assert(buckets.forall(_.getLong(0) % 86400 == 0))
  }

  test("SubqueryTable nesting") {
    val inner =
      GQuery.table("orders", Group(Seq(Col("o_custkey"))), Aggregation(Seq(Agg.countStar("cnt"))))
    val row = GQuery(Seq(SubqueryTable(inner, "t"), Aggregation(Seq(Agg("MAX", "cnt", "m")))))
      .df(cat.resolve)
      .head()
    assert(row.getLong(0) > 0)
  }

  test("Predicate error contract: bad ops raise at construction (test_query.py test_bad_comp_op)") {
    intercept[graft.api.InvalidComparisonOperator] { Comparison("foo", "asdf", RLit(99)) }
    intercept[graft.api.InvalidComparisonOperator] { Comparison("baz", "UNLIKE", RLit("%blah%")) }
    // NULL rhs narrows the legal ops to =/!=/IS (firepit/query.py:190-193)
    intercept[graft.api.InvalidComparisonOperator] { Comparison("baz", "<", RNull) }
    intercept[graft.api.InvalidComparisonOperator] { Comparison("baz", "<", RLit(null)) }
  }

  test("Aggregation error contract + default alias (test_query.py test_agg_without_alias)") {
    intercept[graft.api.InvalidAggregateFunction] { Agg("TOTAL", "foo", "t") }
    assert(Agg("SUM", "foo").alias == "sum")
    // ('COUNT', '*', alias) counts rows, not a column named '*'
    val n = GQuery
      .table("region", Aggregation(Seq(Agg("COUNT", Some("*"), "count"))))
      .df(cat.resolve).head().getLong(0)
    assert(n == 5)
  }

  test("list property [*]: scalar = / != become wildcard LIKEs (test_query.py test_filter_list)") {
    val c = cat
    c.registerRecipe("listy") { r =>
      r("region").withColumn(
        "protocols",
        when(col("r_regionkey") < 2, lit("['tcp', 'http']")).otherwise(lit("['udp', 'dns']")))
    }
    def run(p: Pred): Long =
      GQuery.table("listy", Filter(Seq(p)), CountRows()).df(c.resolve).head().getLong(0)
    assert(run(Comparison("protocols[*]", "=", RLit("http"))) == 2)
    assert(run(Comparison("protocols[*]", "!=", RLit("http"))) == 3)
    // null comparisons pass through untouched (firepit/query.py:183)
    assert(run(Comparison("protocols[*]", "=", RNull)) == 0)
    assert(run(Comparison("protocols[*]", "!=", RNull)) == 5)
  }

  test("Join without a preceding Table raises InvalidQuery (test_query.py test_join_without_table)") {
    intercept[graft.api.InvalidQuery] {
      GQuery(Seq(Join("region", "r_regionkey", "=", "n_regionkey"))).df(cat.resolve)
    }
  }

  test("Projection + Unique + Count = COUNT(DISTINCT cols), null-excluding (test_proj_unique_count)") {
    val c = cat
    c.registerRecipe("with_nulls_cnt") { r =>
      r("region").withColumn("maybe", when(col("r_regionkey") < 2, col("r_name")))
    }
    val n = GQuery
      .table("with_nulls_cnt", Projection(Seq(Col("maybe"))), Unique(), CountRows())
      .df(c.resolve).head().getLong(0)
    // 2 non-null values; the null tuple is excluded, exactly as the
    // reference's COUNT(DISTINCT "maybe") renders
    assert(n == 2)
    // without a projection the reference counts the DISTINCT * subquery —
    // null rows included
    val all = GQuery
      .table("with_nulls_cnt", Projection(Seq(Col("maybe"))), Unique())
      .df(c.resolve).count()
    assert(all == 3)
  }
}
