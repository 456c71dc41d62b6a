package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.query._
import graft.catalog.Catalog

/** Driver-facing query inventory: one entry per operator of SURVEY.md §2,
  * exercised through the engine's Stage ADT / storage verbs on the
  * TPC-H-ish test tables, each with a DuckDB oracle.
  *
  * Output discipline for oracle hash-parity:
  *  - every query is totally ordered by a unique key prefix;
  *  - aggregated doubles that accumulate (SUM/AVG over floats) are rounded
  *    the same way on both sides;
  *  - timestamps are rendered to text (the reference keeps RFC-3339 text at
  *    its API boundary too, firepit/timestamp.py:16-34) or epoch longs.
  */
object Queries {

  type QFn = (SparkSession, String) => DataFrame

  private[graft] case class Q(name: String, fn: QFn, oracle: Option[String])

  private[graft] def viaCatalog(build: Catalog => DataFrame): QFn =
    (spark, dir) => build(new Catalog(spark, dir))

  private[graft] def q(name: String, oracle: String)(build: Catalog => DataFrame): Q =
    Q(name, viaCatalog(build), Some(oracle))

  private[graft] def qNoOracle(name: String)(build: Catalog => DataFrame): Q =
    Q(name, viaCatalog(build), None)

  // Shared derived views (registered per-catalog on demand)
  private def bigOrders(c: Catalog): Unit =
    c.register(
      "big_orders",
      GQuery.table(
        "orders",
        Filter(Seq(Comparison("o_totalprice", ">", RLit(450000.0)))),
        Projection(Seq(Col("o_orderkey"), Col("o_custkey")))))

  private val all: Seq[Q] = Seq(
    // ----- §2.1 Table / Projection / Column (firepit/query.py:305-326,70-93)
    q("q_projection",
      "SELECT r_regionkey, r_name AS region_name FROM region ORDER BY r_regionkey") { c =>
      GQuery
        .table(
          "region",
          Projection(Seq(Col("r_regionkey"), Col("r_name", "region_name"))),
          Order(Seq(OrderKey("r_regionkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Predicate: LIKE (firepit/query.py:160-253)
    q("q_filter_like",
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%gear%' ORDER BY p_partkey") { c =>
      GQuery
        .table(
          "part",
          Filter(Seq(Comparison("p_name", "LIKE", RLit("%gear%")))),
          Projection(Seq(Col("p_partkey"), Col("p_name"))),
          Order(Seq(OrderKey("p_partkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Predicate: comparison ops over numbers + timestamps
    q("q_filter_cmp",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        | WHERE l_quantity <= 5 AND l_discount > 0.05 AND l_shipdate < TIMESTAMP '1997-01-01'
        | ORDER BY l_orderkey, l_linenumber""".stripMargin) { c =>
      GQuery
        .table(
          "lineitem",
          Filter(Seq(
            Comparison("l_quantity", "<=", RLit(5.0)),
            Comparison("l_discount", ">", RLit(0.05)),
            Comparison("l_shipdate", "<", RLit(to_timestamp(lit("1997-01-01 00:00:00")))))),
          Projection(
            Seq(Col("l_orderkey"), Col("l_linenumber"), Col("l_quantity"), Col("l_discount"))),
          Order(Seq(OrderKey("l_orderkey"), OrderKey("l_linenumber"))))
        .df(c.resolve)
    },

    // ----- §2.1 Predicate: IN literal list
    q("q_filter_in",
      """SELECT o_orderkey, o_orderpriority FROM orders
        | WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin) {
      c =>
        GQuery
          .table(
            "orders",
            Filter(Seq(Comparison("o_orderpriority", "IN", RList(Seq("1-URGENT", "2-HIGH"))))),
            Projection(Seq(Col("o_orderkey"), Col("o_orderpriority"))),
            Order(Seq(OrderKey("o_orderkey"))))
          .df(c.resolve)
    },

    // ----- §2.1 Predicate: nested AND/OR/NOT tree
    q("q_filter_or_not",
      """SELECT count(*) AS count FROM lineitem
        | WHERE (l_returnflag = 'A' OR l_linestatus = 'O') AND NOT (l_quantity < 10)""".stripMargin) {
      c =>
        GQuery
          .table(
            "lineitem",
            Filter(Seq(AndPred(
              OrPred(
                Comparison("l_returnflag", "=", RLit("A")),
                Comparison("l_linestatus", "=", RLit("O"))),
              NotPred(Comparison("l_quantity", "<", RLit(10.0)))))),
            CountRows())
          .df(c.resolve)
    },

    // ----- §2.1 Predicate: IS NULL normalization (firepit/query.py:190-193)
    q("q_filter_null",
      """SELECT DISTINCT c_custkey FROM customer
        | LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 450000) bo
        |   ON c_custkey = bo.o_custkey
        | WHERE o_orderkey IS NULL ORDER BY c_custkey""".stripMargin) { c =>
      bigOrders(c)
      GQuery
        .table(
          "customer",
          Join("big_orders", "c_custkey", "=", "o_custkey", how = "LEFT OUTER"),
          Filter(Seq(Comparison("o_orderkey", "=", RNull))),
          Projection(Seq(Col("c_custkey"))),
          Unique(),
          Order(Seq(OrderKey("c_custkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Predicate: IN-subquery -> Catalyst InSubquery (semi-join)
    q("q_filter_subquery",
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS cnt FROM lineitem
        | WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        | GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { c =>
      val sub = GQuery.table(
        "orders",
        Filter(Seq(Comparison("o_orderpriority", "=", RLit("1-URGENT")))),
        Projection(Seq(Col("o_orderkey"))))
      GQuery
        .table(
          "lineitem",
          Filter(Seq(Comparison("l_orderkey", "IN", RQuery(sub, "o_orderkey")))),
          Group(Seq(Col("l_returnflag"))),
          Aggregation(Seq(Agg("SUM", "l_quantity", "sum_qty"), Agg.countStar("cnt"))),
          Order(Seq(OrderKey("l_returnflag"))))
        .df(c.resolve)
    },

    // ----- §2.1 Group + Aggregation: COUNT/SUM/MIN/MAX/AVG/NUNIQUE
    q("q_agg",
      """SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |   sum(l_quantity) AS sum_qty, avg(l_quantity) AS avg_qty,
        |   min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |   round(sum(l_extendedprice), 2) AS sum_price,
        |   count(DISTINCT l_partkey) AS unique_parts
        | FROM lineitem GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin) { c =>
      GQuery
        .table(
          "lineitem",
          Group(Seq(Col("l_returnflag"), Col("l_linestatus"))),
          Aggregation(Seq(
            Agg.countStar("count_order"),
            Agg("SUM", "l_quantity", "sum_qty"),
            Agg("AVG", "l_quantity", "avg_qty"),
            Agg("MIN", "l_extendedprice", "min_price"),
            Agg("MAX", "l_extendedprice", "max_price"),
            ExprAgg(round(sum(col("l_extendedprice")), 2), "sum_price"),
            Agg("NUNIQUE", "l_partkey", "unique_parts"))),
          Order(Seq(OrderKey("l_returnflag"), OrderKey("l_linestatus"))))
        .df(c.resolve)
    },

    // ----- §2.1 Filter-after-Group = HAVING (firepit/query.py:563-567)
    q("q_having",
      """SELECT o_custkey, count(*) AS order_count FROM orders GROUP BY o_custkey
        | HAVING count(*) > 15 ORDER BY o_custkey""".stripMargin) { c =>
      GQuery
        .table(
          "orders",
          Group(Seq(Col("o_custkey"))),
          Aggregation(Seq(Agg.countStar("order_count"))),
          Filter(Seq(Comparison("order_count", ">", RLit(15)))),
          Order(Seq(OrderKey("o_custkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Order: multi-key ASC/DESC
    q("q_sort",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        | ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { c =>
      GQuery
        .table(
          "orders",
          Projection(Seq(Col("o_orderkey"), Col("o_orderstatus"), Col("o_totalprice"))),
          Order(Seq(OrderKey("o_orderstatus"), OrderKey.desc("o_totalprice"), OrderKey("o_orderkey"))),
          Limit(100))
        .df(c.resolve)
    },

    // ----- §2.1 Limit + Offset
    q("q_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey
        | LIMIT 50 OFFSET 100""".stripMargin) { c =>
      GQuery
        .table(
          "orders",
          Projection(Seq(Col("o_orderkey"), Col("o_totalprice"))),
          Order(Seq(OrderKey("o_orderkey"))),
          Offset(100),
          Limit(50))
        .df(c.resolve)
    },

    // ----- §2.1 Count
    q("q_count",
      "SELECT count(*) AS count FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'") { c =>
      GQuery
        .table(
          "lineitem",
          Filter(Seq(Comparison("l_shipdate", ">=", RLit(to_timestamp(lit("2000-01-01 00:00:00")))))),
          CountRows())
        .df(c.resolve)
    },

    // ----- §2.1 Unique
    q("q_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        | ORDER BY c_mktsegment, c_nationkey""".stripMargin) { c =>
      GQuery
        .table(
          "customer",
          Projection(Seq(Col("c_mktsegment"), Col("c_nationkey"))),
          Unique(),
          Order(Seq(OrderKey("c_mktsegment"), OrderKey("c_nationkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 CountUnique
    q("q_count_unique",
      "SELECT count(DISTINCT l_partkey) AS count FROM lineitem WHERE l_quantity > 25") { c =>
      GQuery
        .table(
          "lineitem",
          Filter(Seq(Comparison("l_quantity", ">", RLit(25.0)))),
          CountUnique(Seq("l_partkey")))
        .df(c.resolve)
    },

    // ----- §2.1 Join: INNER (dim join -> Catalyst broadcasts)
    q("q_join_inner",
      """SELECT c_custkey, c_name, n_name FROM customer
        | JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey""".stripMargin) { c =>
      GQuery
        .table(
          "customer",
          Join("nation", "c_nationkey", "=", "n_nationkey"),
          Projection(Seq(Col("c_custkey"), Col("c_name"), Col("n_name"))),
          Order(Seq(OrderKey("c_custkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Join: implicit chaining across 4 relations
    q("q_join_multi",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | GROUP BY n_name ORDER BY n_name""".stripMargin) { c =>
      GQuery
        .table(
          "lineitem",
          Join("orders", "l_orderkey", "=", "o_orderkey"),
          Join("customer", "o_custkey", "=", "c_custkey"),
          Join("nation", "c_nationkey", "=", "n_nationkey"),
          Group(Seq(Col("n_name"))),
          Aggregation(Seq(
            ExprAgg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2), "revenue"))),
          Order(Seq(OrderKey("n_name"))))
        .df(c.resolve)
    },

    // ----- §2.1 Join: LEFT OUTER
    q("q_join_left",
      """SELECT c_custkey, count(o_orderkey) AS big_orders FROM customer
        | LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 450000) bo
        |   ON c_custkey = bo.o_custkey
        | GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { c =>
      bigOrders(c)
      GQuery
        .table(
          "customer",
          Join("big_orders", "c_custkey", "=", "o_custkey", how = "LEFT OUTER"),
          Group(Seq(Col("c_custkey"))),
          Aggregation(Seq(Agg("COUNT", "o_orderkey", "big_orders"))),
          Order(Seq(OrderKey("c_custkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Join: FULL OUTER + CoalescedColumn (firepit/query.py:96-109)
    q("q_join_full",
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey
        | FROM (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9500) a
        | FULL OUTER JOIN (SELECT DISTINCT s_nationkey FROM supplier) b
        |   ON c_nationkey = s_nationkey
        | ORDER BY nationkey""".stripMargin) { c =>
      c.register(
        "rich_nations",
        GQuery.table(
          "customer",
          Filter(Seq(Comparison("c_acctbal", ">", RLit(9500.0)))),
          Projection(Seq(Col("c_nationkey"))),
          Unique()))
      c.register(
        "supp_nations",
        GQuery.table("supplier", Projection(Seq(Col("s_nationkey"))), Unique()))
      GQuery
        .table(
          "rich_nations",
          Join("supp_nations", "c_nationkey", "=", "s_nationkey", how = "OUTER"),
          Projection(Seq(CoalescedCol(Seq("c_nationkey", "s_nationkey"), "nationkey"))),
          Order(Seq(OrderKey("nationkey"))))
        .df(c.resolve)
    },

    // ----- §2.1 Join: CROSS
    q("q_join_cross",
      """SELECT r_name, o_orderstatus
        | FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        | ORDER BY r_name, o_orderstatus""".stripMargin) { c =>
      c.register(
        "order_statuses",
        GQuery.table("orders", Projection(Seq(Col("o_orderstatus"))), Unique()))
      GQuery
        .table(
          "region",
          Join("order_statuses", "", "=", "", how = "CROSS"),
          Projection(Seq(Col("r_name"), Col("o_orderstatus"))),
          Order(Seq(OrderKey("r_name"), OrderKey("o_orderstatus"))))
        .df(c.resolve)
    },

    // ----- §2.1 BinnedColumn: timestamp binning (firepit/query.py:126-157)
    q("q_bin_time",
      """SELECT CAST(floor(epoch(o_orderdate) / 2592000) AS BIGINT) * 2592000 AS odate_bin,
        |   count(*) AS count
        | FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { c =>
      GQuery
        .table(
          "orders",
          Group(Seq(BinnedCol("o_orderdate", 30, "d", Some("odate_bin")))),
          Aggregation(Seq(Agg.countStar("count"))),
          Order(Seq(OrderKey("odate_bin"))))
        .df(c.resolve)
    },

    // ----- §2.1 BinnedColumn: numeric binning
    q("q_bin_num",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS price_bin,
        |   count(*) AS count
        | FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { c =>
      GQuery
        .table(
          "orders",
          Group(Seq(BinnedCol("o_totalprice", 50000, "", Some("price_bin")))),
          Aggregation(Seq(Agg.countStar("count"))),
          Order(Seq(OrderKey("price_bin"))))
        .df(c.resolve)
    },

    // ----- §2.1 Query-as-Table: nested subquery (firepit/query.py:602-607)
    q("q_nested",
      """SELECT round(avg(cnt), 6) AS avg_orders, max(cnt) AS max_orders
        | FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) per_cust""".stripMargin) {
      c =>
        val inner = GQuery.table(
          "orders",
          Group(Seq(Col("o_custkey"))),
          Aggregation(Seq(Agg.countStar("cnt"))))
        GQuery(Seq(
          SubqueryTable(inner, "per_cust"),
          Aggregation(Seq(
            ExprAgg(round(avg(col("cnt")), 6), "avg_orders"),
            Agg("MAX", "cnt", "max_orders")))))
          .df(c.resolve)
    },

    // ----- §2.2 merge verb: UNION with dedup (firepit/sqlstorage.py:777-793)
    q("q_merge",
      """SELECT o_orderkey FROM (
        |   SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
        |   UNION
        |   SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') t
        | ORDER BY o_orderkey""".stripMargin) { c =>
      val a = GQuery
        .table(
          "orders",
          Filter(Seq(Comparison("o_totalprice", ">", RLit(400000.0)))),
          Projection(Seq(Col("o_orderkey"))))
        .df(c.resolve)
      val b = GQuery
        .table(
          "orders",
          Filter(Seq(Comparison("o_orderpriority", "=", RLit("1-URGENT")))),
          Projection(Seq(Col("o_orderkey"))))
        .df(c.resolve)
      a.unionByName(b).distinct().orderBy(col("o_orderkey"))
    },

    // ----- §2.2 value_counts verb: multi-join weighted frequency
    //       (firepit/sqlstorage.py:854-874 — view ⋈ __contains ⋈ observed-data)
    q("q_value_counts",
      """SELECT c_mktsegment, count(*) AS count FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { c =>
      GQuery
        .table(
          "lineitem",
          Join("orders", "l_orderkey", "=", "o_orderkey"),
          Join("customer", "o_custkey", "=", "c_custkey"),
          Group(Seq(Col("c_mktsegment"))),
          Aggregation(Seq(Agg.countStar("count"))),
          Order(Seq(OrderKey("c_mktsegment"))))
        .df(c.resolve)
    },

    // ----- §2.2 summary verb (firepit/sqlstorage.py:992-1026)
    q("q_summary",
      """SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS first_observed,
        |   strftime(max(o_orderdate), '%Y-%m-%d') AS last_observed,
        |   sum(l_quantity) AS number_observed
        | FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin) { c =>
      GQuery
        .table(
          "orders",
          Join("lineitem", "o_orderkey", "=", "l_orderkey"),
          Aggregation(Seq(
            ExprAgg(date_format(min(col("o_orderdate")), "yyyy-MM-dd"), "first_observed"),
            ExprAgg(date_format(max(col("o_orderdate")), "yyyy-MM-dd"), "last_observed"),
            Agg("SUM", "l_quantity", "number_observed"))))
        .df(c.resolve)
    },

    // ----- §2.2 timestamped verb (firepit/sqlstorage.py:913-990)
    q("q_timestamped",
      """SELECT l_orderkey, l_linenumber, strftime(o_orderdate, '%Y-%m-%d') AS first_observed
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | ORDER BY first_observed, l_orderkey, l_linenumber LIMIT 500""".stripMargin) { c =>
      GQuery
        .table(
          "lineitem",
          Join("orders", "l_orderkey", "=", "o_orderkey"),
          Projection(Seq(
            Col("l_orderkey"),
            Col("l_linenumber"),
            ExprCol(date_format(col("o_orderdate"), "yyyy-MM-dd"), "first_observed"))),
          Order(Seq(OrderKey("first_observed"), OrderKey("l_orderkey"), OrderKey("l_linenumber"))),
          Limit(500))
        .df(c.resolve)
    }
  )

  lazy val queries: Map[String, QFn] =
    (all ++ PipelineQueries.all ++ StixQueries.all ++ SplintQueries.all).map(x => x.name -> x.fn).toMap
  lazy val oracle: Map[String, String] =
    (all ++ PipelineQueries.all ++ StixQueries.all ++ SplintQueries.all).collect { case Q(n, _, Some(sql)) =>
      n -> sql.replaceAll("\\s+", " ").trim
    }.toMap
}
