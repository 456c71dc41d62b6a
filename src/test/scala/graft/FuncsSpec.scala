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
}
