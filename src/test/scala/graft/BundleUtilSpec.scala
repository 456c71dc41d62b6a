package graft

import graft.ingest.{BundleUtil, Flatten}
import org.scalatest.funsuite.AnyFunSuite

class BundleUtilSpec extends AnyFunSuite {

  private def bundle: Map[String, Any] =
    Flatten.parseJson(
      """{"type":"bundle","id":"bundle--b","objects":[
        |{"type":"identity","id":"identity--i1","name":"t"},
        |{"type":"observed-data","id":"observed-data--o1","created_by_ref":"identity--i1",
        | "first_observed":"2024-01-01T00:00:00.000Z","last_observed":"2024-01-03T00:00:00.000Z",
        | "number_observed":1,
        | "objects":{"0":{"type":"ipv4-addr","value":"10.0.0.1"},
        |            "1":{"type":"network-traffic","src_ref":"0","src_port":80,
        |                 "protocols":["tcp"]}}},
        |{"type":"identity","id":"identity--i1","name":"dup"}
        |]}""".stripMargin).asInstanceOf[Map[String, Any]]

  private def objs(b: Map[String, Any]) =
    b("objects").asInstanceOf[Seq[Map[String, Any]]]

  test("dedupIds keeps first occurrence") {
    val out = objs(BundleUtil.dedupIds(bundle))
    assert(out.count(_.get("id").contains("identity--i1")) == 1)
    assert(out.find(_.get("id").contains("identity--i1")).get("name") == "t")
  }

  test("randomizeIds rewrites ids and internal references consistently") {
    val out = objs(BundleUtil.randomizeIds(bundle))
    val obsId = out.find(_.get("type").contains("observed-data")).get("id").toString
    assert(obsId != "observed-data--o1" && obsId.startsWith("observed-data--"))
    val ident = out.filter(_.get("type").contains("identity")).head
    val obs = out.find(_.get("type").contains("observed-data")).get
    assert(obs("created_by_ref") == ident("id")) // ref follows the new id
  }

  test("limit caps observations, keeps other SDOs") {
    val out = objs(BundleUtil.limit(bundle, 0))
    assert(!out.exists(_.get("type").contains("observed-data")))
    assert(out.exists(_.get("type").contains("identity")))
  }

  test("timeshift maps the time range linearly") {
    val out = objs(BundleUtil.timeshift(bundle, "2030-01-01T00:00:00.000Z", "2030-01-02T00:00:00.000Z"))
    val obs = out.find(_.get("type").contains("observed-data")).get
    assert(obs("first_observed") == "2030-01-01T00:00:00.000Z")
    assert(obs("last_observed") == "2030-01-02T00:00:00.000Z")
  }

  test("upgrade hoists SCOs with 2.1 ids and rewrites refs") {
    val out = objs(BundleUtil.upgrade(bundle))
    val obs = out.find(_.get("type").contains("observed-data")).get
    assert(!obs.contains("objects"))
    val refs = obs("object_refs").asInstanceOf[Seq[String]]
    assert(refs.length == 2)
    val nt = out.find(_.get("type").contains("network-traffic")).get
    val ip = out.find(_.get("type").contains("ipv4-addr")).get
    assert(nt("src_ref") == ip("id")) // index rewritten to deterministic id
    assert(ip("id").toString.startsWith("ipv4-addr--"))
    // flatten_21 accepts the upgraded bundle
    val flat = Flatten.flatten(obs)
    assert(flat.count(_("type") == "__contains") == 2)
  }
}
