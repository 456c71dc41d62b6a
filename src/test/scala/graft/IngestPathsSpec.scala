package graft

import graft.api.Storage
import graft.ingest.LogMapper
import java.nio.file.Files

/** Distributed ingest + log conversion paths. */
class IngestPathsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore() =
    new Storage(spark, Files.createTempDirectory("graft-ingest").toString)

  private def mkBundle(ip: String, url: String) =
    s"""{"type":"bundle","id":"bundle--x","objects":[
       |{"type":"observed-data","id":"observed-data--${ip.replace('.', '-')}",
       | "first_observed":"2024-01-01T00:00:00.000Z","last_observed":"2024-01-01T00:00:00.000Z",
       | "number_observed":1,
       | "objects":{"0":{"type":"ipv4-addr","value":"$ip"},
       |            "1":{"type":"url","value":"$url"}}}]}""".stripMargin

  test("cacheBundles: executor-side flatten, same tables as driver cache") {
    val s = tmpStore()
    val bundles = Seq(
      mkBundle("10.0.0.1", "http://a.test/1"),
      mkBundle("10.0.0.2", "http://a.test/2"),
      mkBundle("10.0.0.1", "http://a.test/3") // dup ip across bundles
    ).toDS().repartition(3)
    s.cacheBundles("q1", bundles)
    assert(s.count("ipv4-addr") == 2) // deterministic-id dedup held
    assert(s.count("url") == 3)
    s.extract("u", "url", "q1", "[url:value LIKE '%a.test%']")
    assert(s.count("u") == 3)
    // provenance recorded for the distributed path too
    assert(s.catalog.resolve("__queries").where($"query_id" === "q1").count() >= 5)
  }

  test("LogMapper: flat records -> bundle -> cache -> query") {
    val recs: Seq[Map[String, Any]] = Seq(
      Map("timestamp" -> "2024-02-01T10:00:00.000Z", "src_ip" -> "10.1.1.1",
        "dst_ip" -> "8.8.8.8", "src_port" -> 5353L, "dst_port" -> 53L,
        "protocol" -> "UDP", "user" -> "alice"),
      Map("timestamp" -> "2024-02-01T10:01:00.000Z", "src_ip" -> "10.1.1.2",
        "dst_ip" -> "1.1.1.1", "dst_port" -> 443L, "url" -> "https://x.test/a"))
    val s = tmpStore()
    s.cache("q1", LogMapper.toBundleJson(recs))
    assert(s.count("network-traffic") == 2)
    assert(s.count("ipv4-addr") == 4)
    assert(s.count("user-account") == 1)
    s.extract("dns", "network-traffic", "q1", "[network-traffic:dst_port = 53]")
    val row = s.lookup("dns").head
    assert(row("src_ref.value") == "10.1.1.1" && row("dst_ref.value") == "8.8.8.8")
    assert(row("protocols").asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("udp"))
  }
}
