package graft

import graft.functions.Funcs
import org.apache.spark.sql.functions._

class FuncsSpec extends SparkSpec {
  import spark.implicits._

  test("in_subnet: addresses and nested nets, null-safe false") {
    val df = Seq(
      ("10.0.0.5", "10.0.0.0/24", true),
      ("10.0.1.5", "10.0.0.0/24", false),
      ("10.0.0.0/25", "10.0.0.0/24", true),
      ("10.0.0.0/23", "10.0.0.0/24", false),
      ("192.168.1.77", "192.168.0.0/16", true),
      ("8.8.8.8", "0.0.0.0/0", true),
      (null, "10.0.0.0/24", false)
    ).toDF("v", "cidr", "expect")
    val bad =
      df.filter(Funcs.in_subnet(col("v"), col("cidr")) =!= col("expect")).count()
    assert(bad == 0)
  }

  test("match_bin / like_bin decode base64 then match") {
    val df = Seq("aGVsbG8gd29ybGQ=").toDF("b") // "hello world"
    assert(df.filter(Funcs.match_bin("wor.d", col("b"))).count() == 1)
    assert(df.filter(Funcs.like_bin("%world", col("b"))).count() == 1)
    assert(df.filter(Funcs.like_bin("world", col("b"))).count() == 0)
  }

  test("rfc3339 renders millisecond UTC text") {
    val df = Seq("2024-01-02 03:04:05.678").toDF("s")
      .select(Funcs.rfc3339(to_timestamp(col("s"))).as("t"))
    assert(df.head().getString(0) == "2024-01-02T03:04:05.678Z")
  }

  test("GraftExtensions: the whole scalar surface is SQL-callable") {
    graft.functions.GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT
        |  in_subnet('10.0.0.5', '10.0.0.0/8')  AS in1,
        |  in_subnet('11.0.0.5', '10.0.0.0/8')  AS in2,
        |  match_bin('wor.d', base64('hello world')) AS mb,
        |  like_bin('%world', base64('hello world')) AS lb,
        |  like_bin('world',  base64('hello world')) AS lb2,
        |  rfc3339(timestamp'2024-01-02 03:04:05.678') AS ts,
        |  dot_f(cast(array(1.0, 2.0) AS array<double>),
        |        cast(array(3.0, 4.0) AS array<double>)) AS dp,
        |  norm_f(cast(array(3.0, 4.0) AS array<double>)) AS nm,
        |  simhash64('alpha beta gamma') AS sh
        |""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getString(5) == "2024-01-02T03:04:05.678Z")
    assert(r.getDouble(6) == 11.0 && r.getDouble(7) == 5.0)
    // SQL and Column APIs share one definition -> identical values
    val colApi = Seq("alpha beta gamma").toDF("t")
      .select(graft.functions.SimHash64(col("t"))).head().getLong(0)
    assert(r.getLong(8) == colApi)
  }

  test("GraftExtensions: builder-time injection lists the same functions") {
    // the extension class is the same registration table install() uses
    assert(graft.functions.GraftExtensions.registrations.map(_._1.funcName).sorted ==
      Seq("bottom_k_sample", "cms_estimate", "cms_sketch", "dot_f", "in_subnet",
        "kmv_distinct", "kmv_hashes", "like_bin", "match_bin", "norm_f", "rfc3339",
        "simhash64"))
  }

  test("GraftExtensions: sketch aggregates are SQL-callable and match the Column API") {
    graft.functions.GraftExtensions.install(spark)
    val df = (1 to 100).map(i => s"v${i % 37}").toDF("x")
    df.createOrReplaceTempView("sk_vals")
    // KMV: SQL call == Column API call, grouped through partial aggregation
    val sqlKmv = spark.sql("SELECT kmv_distinct(x, 32) FROM sk_vals").head().getDouble(0)
    val colKmv = df.agg(graft.functions.KmvSketch.kmvDistinct(col("x"), 32)).head().getDouble(0)
    assert(sqlKmv == colKmv)
    // KMV hashes: SQL array == Column API array, ascending, k-bounded
    val sqlH = spark.sql("SELECT kmv_hashes(x, 16) FROM sk_vals").head().getSeq[Long](0)
    val colH = df.agg(graft.functions.KmvSketch.kmvHashes(col("x"), 16)).head().getSeq[Long](0)
    assert(sqlH == colH && sqlH.length == 16 && sqlH == sqlH.sorted)
    // bottom-k sample: SQL array == Column API array, ascending
    val sqlBk = spark.sql("SELECT bottom_k_sample(length(x), x, 8) FROM sk_vals")
      .head().getSeq[Double](0)
    val colBk = df.agg(graft.functions.BottomKSample
      .bottomKByHash(length(col("x")), col("x"), 8)).head().getSeq[Double](0)
    assert(sqlBk == colBk && sqlBk.length == 8 && sqlBk == sqlBk.sorted)
    // CMS: sketch + estimate round-trip in pure SQL == Column API
    val sqlEst = spark.sql(
      """SELECT v, cms_estimate(sk, v, 4, 64) AS est FROM
        |  (SELECT cms_sketch(x, 4, 64) AS sk FROM sk_vals),
        |  (SELECT DISTINCT x AS v FROM sk_vals)
        |ORDER BY v""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = df.agg(graft.functions.CmsSketch.cms(col("x"), 4, 64).as("sk"))
    val colEst = df.distinct().crossJoin(broadcast(sk))
      .select(col("x"), graft.functions.CmsSketch.estimate(col("sk"), col("x"), 4, 64))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlEst == colEst)
    // sketch parameters must be plan-time literals
    intercept[Exception] {
      spark.sql("SELECT kmv_distinct(x, length(x)) FROM sk_vals").head()
    }
  }
}
