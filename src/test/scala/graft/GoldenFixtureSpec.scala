package graft

import graft.api.Storage
import java.nio.file.Files

/** Golden-value e2e tests replayed from the reference's own suite on its
  * own fixture bundles (public test data; FIXTURES.md §1). Every expected
  * number/string below is copied from the reference assertions — these pin
  * end-to-end parity of ingest (deterministic ids, ranks, extension
  * shortening), the pattern compiler, provenance, deref, sort, and group
  * auto-agg on real STIX corpora.
  */
class GoldenFixtureSpec extends SparkSpec {

  private def fixture(name: String): String =
    new java.io.File(s"src/test/resources/fixtures/$name").getAbsolutePath

  private def tmpStore(): Storage =
    new Storage(spark, Files.createTempDirectory("graft-golden").toString)

  test("test_bundle: extract LIKE '%page/1%' -> the 14 reference urls (test_storage.py:24-41)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle.json")))
    assert(s.tables().contains("url") && s.types().contains("url"))
    s.extract("urls", "url", "q1", "[url:value LIKE '%page/1%']")
    assert(s.views().contains("urls"))
    val urls = s.values("url:value", "urls").map(_.toString)
    assert(urls.length == 14)
    assert(urls.contains("http://www8.example.com/page/176"))
    assert(!urls.contains("http://www27.example.com/page/64"))
  }

  test("test_bundle: scoped-out pattern, sort golden, dependent-view update (test_storage.py:61-96)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle.json")))
    // the ipv4 comparison is type-scoped away -> all 31 urls
    s.extract("urls", "url", "q1", "[ipv4-addr:value ISSUBSET '192.168.0.0/16']")
    val urls = s.values("url:value", "urls")
    assert(urls.length == 31 && s.count("urls") == 31)
    assert(urls.map(_.toString).contains("http://www27.example.com/page/64"))
    assert(s.lookup("urls", limit = Some(5)).length == 5)
    s.assign("sorted", "urls", "sort", "value")
    val sortedUrls = s.values("url:value", "sorted").map(_.toString)
    assert(sortedUrls.length == 31)
    assert(sortedUrls.head == "http://www11.example.com/page/108")
    // redefine urls: the dependent sorted view follows (test_storage.py:84-91)
    s.extract("urls", "url", "q1", "[url:value LIKE '%page/1%']")
    assert(s.values("url:value", "urls").length == 14)
    assert(s.values("url:value", "sorted").length == 14)
  }

  test("test_bundle: unique ip/user values + group auto-agg (test_storage.py:93-121)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle.json")))
    s.extract("a_ips", "ipv4-addr", "q1", "[ipv4-addr:value LIKE '10.%']")
    val ips = s.values("ipv4-addr:value", "a_ips").map(_.toString)
    assert(ips.length == 10 && ips.contains("10.0.0.141"))
    s.extract("users", "user-account", "q1", "[ipv4-addr:value LIKE '10.%']")
    val users = s.values("user-account:account_login", "users").map(_.toString)
    assert(users.length == 14)
    assert(users.count(_ == "henry") == 1 && users.count(_ == "isabel") == 1)
    s.assign("grouped_users", "users", "group", "user-account:account_login")
    val cols = s.columns("grouped_users")
    assert(!cols.contains("unique_account_login")) // key never auto-aggs
    val grouped = s.lookup("grouped_users")
    assert(grouped.exists(_.get("account_login").contains("henry")))
    assert(grouped.exists(_.get("account_login").contains("isabel")))
  }

  test("test_bundle: deref lookup multiplicities (test_lookup.py:24-36)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle.json")))
    s.extract("conns", "network-traffic", "q1", "[network-traffic:dst_port < 1024]")
    val conns = s.lookup("conns", cols = Seq("src_ref.value", "dst_ref.value"))
    assert(conns.length == 78)
    val pairs = conns.map(c => s"${c("src_ref.value")}_${c("dst_ref.value")}")
    assert(pairs.count(_ == "192.168.90.122_10.0.0.214") == 2)
    assert(pairs.count(_ == "192.168.132.245_10.0.0.214") == 1)
  }

  test("test_bundle: lookup cols restriction; scalar load; join enrichment (test_lookup.py:16-23, test_storage.py:137-180)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle.json")))
    s.extract("conns", "network-traffic", "q1", "[network-traffic:dst_port < 1024]")
    val ports = s.lookup("conns", cols = Seq("dst_port"))
    assert(ports.length == 78)
    assert(ports.map(_("dst_port")).toSet == Set(22L, 80L, 514L))
    // scalar load via the type's primary property
    s.load("test_ips", Seq("10.0.0.1", "10.0.0.2"), "ipv4-addr")
    val rows = s.lookup("test_ips")
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r("type") == "ipv4-addr")
      assert(Set("10.0.0.1", "10.0.0.2").contains(r("value").toString))
    }
    // enrich two ips through load + join; shared columns coalesce
    s.extract("local_ips", "ipv4-addr", "q1", "[ipv4-addr:value LIKE '%']")
    s.load("marked_ips", Seq(
      Map[String, Any]("type" -> "ipv4-addr", "value" -> "10.0.0.201", "risk" -> "high"),
      Map[String, Any]("type" -> "ipv4-addr", "value" -> "10.0.0.214", "risk" -> "high")))
    s.join("marked", "local_ips", "value", "marked_ips", "value")
    val marked = s.lookup("marked")
    assert(marked.length == 2)
    marked.foreach { r =>
      assert(Set("10.0.0.201", "10.0.0.214").contains(r("value").toString))
      assert(r("risk") == "high")
    }
  }

  test("test_bundle_2: port-zero sort with byte-exact reference ids (test_storage.py:598-609)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle_2.json")))
    s.extract("conns", "network-traffic", "q1", "[network-traffic:dst_port < 1024]")
    s.assign("sconns", "conns", "sort", "src_port")
    val conns = s.lookup("sconns")
    assert(conns.head("src_port") == 0L)
    // deterministic uuid5 id must BYTE-match the reference's
    assert(conns.head("id") == "network-traffic--637791d8-c981-5a1e-9714-f0c4cfcb736b")
    assert(conns.head("start") == "2020-06-30T19:25:09.447726Z")
  }

  test("test_bundle_2: rename clobbers; old name raises UnknownViewname (test_storage.py:618-629)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("test_bundle_2.json")))
    s.extract("conns1", "network-traffic", "q1", "[network-traffic:dst_port < 1024]")
    s.extract("conns2", "network-traffic", "q1", "[network-traffic:dst_port > 1024]")
    s.renameView("conns2", "conns1")
    intercept[graft.api.UnknownViewname] { s.lookup("conns2") }
    assert(s.count("conns1") == 2) // the clobbering definition (dst_port > 1024)
  }

  test("conn_a + conn_b: duplicate identity dedups to one row (test_storage.py:612-615)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("conn_a.json"), fixture("conn_b.json")))
    assert(s.count("identity") == 1)
  }

  test("one_event: exactly one rank-1 ip and it is the src (test_storage.py:631-655)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("one_event.json")))
    val v = s.catalog.resolve("ipv4-addr")
    val c = s.catalog.resolve("__contains")
    val ranked = v
      .join(c, v("id") === c("target_ref"))
      .where(c("x_firepit_rank").isNotNull)
      .select("value")
      .collect()
    assert(ranked.length == 1)
    assert(ranked.head.getString(0) == "10.95.79.130")
  }

  test("mixed-v4-v6: dual-stack deref with COALESCE values (test_lookup.py:38-48)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("mixed-v4-v6.json")))
    s.extract("conns", "network-traffic", "q1", "[network-traffic:dst_port > 0]")
    val conns = s.lookup("conns")
    assert(conns.length == 10)
    val pairs = conns.map(c => s"${c("src_ref.value")}_${c("dst_ref.value")}")
    assert(pairs.count(_ == "192.168.1.156_192.168.1.1") == 2)
    assert(pairs.count(_ == "fe80:0:0:0:5d67:4a8:1e69:54d8_fe80:0:0:0:950c:ff99:129:5107") == 1)
  }

  test("service-example: extension shortening + reflist exclusion (test_lookup.py:61-70)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("service-example.json")))
    s.extract("procs", "process", "q1", "[process:binary_ref.name = 'runme.exe']")
    val procs = s.lookup("procs")
    assert(procs.length == 1)
    assert(procs.head("x_service_name") == "MyService")
    assert(!procs.head.contains("x_service_dll_refs")) // routed to __reflist
  }

  test("ccoe: 563 procs with parent_ref deref at scale-ish (test_lookup.py:51-58)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("ccoe_investigator_demo.json")))
    s.extract("procs", "process", "q1", "[process:pid > 0]")
    val procs = s.lookup("procs", limit = Some(1000))
    assert(s.count("procs") == 563)
    // the deref'd column is a SCHEMA property: every returned row map carries
    // the same keys, so assert over all rows instead of the head of a frame
    // with no recorded sort key (post-join row order is not contractual)
    assert(procs.nonEmpty && procs.forall(_.contains("parent_ref.pid")))
  }

  test("spec_2_1_bundle: 2.1 goldens — ids, no spec_version column, verbs (test_spec_version_2_1.py)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("spec_2_1_bundle.json")))
    val types = s.types()
    assert(types.contains("identity") && types.contains("domain-name") && types.contains("ipv4-addr"))
    val dnCols = s.columns("domain-name")
    assert(!dnCols.contains("type") && !dnCols.contains("spec_version"))
    val dn = s.lookup("domain-name")
    assert(dn.length == 1)
    assert(dn.head("id") == "domain-name--bedb4899-d24b-5401-bc86-8f6b4cc18ec7")
    assert(dn.head("value") == "example.com")
    val ip = s.lookup("ipv4-addr")
    assert(ip.length == 1)
    assert(ip.head("id") == "ipv4-addr--28bb3599-77cd-5a82-a950-b5bc3caf07c4")
    assert(ip.head("value") == "198.51.100.3")
    s.extract("domains", "domain-name", "q1", "[domain-name:value LIKE '%.com']")
    assert(s.values("domain-name:value", "domains") == Seq("example.com"))
    val vc = s.valueCounts("domains", "value")
    assert(vc == Seq(("example.com", 1L)))
    s.extract("ips", "ipv4-addr", "q1", "[ipv4-addr:value ISSUBSET '198.51.100.0/24']")
    assert(s.values("ipv4-addr:value", "ips") == Seq("198.51.100.3"))
  }

  test("ccoe custom objects: x-oca-event extract keeps ref columns (test_custom_objects.py)") {
    val s = tmpStore()
    s.cache("q1", Seq(fixture("ccoe_investigator_demo.json")))
    s.extract("events", "x-oca-event", "q1", "[x-oca-event:kind = 'event']")
    assert(s.columns("events").contains("process_ref"))
    assert(s.count("events") > 0)
  }
}
