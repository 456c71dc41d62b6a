package graft

import graft.ingest.Flatten
import graft.model.StixId
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests the reference lacks (SURVEY §5 port strategy): id
  * determinism, canonical-JSON stability, normalize/flatten invariants.
  * Plain scalacheck generators driven from a fixed seed (the
  * scalatest-scalacheck bridge isn't among the pinned deps). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val valueGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20): Any),
    Gen.chooseNum(0L, 1000000L).map(x => x: Any),
    Gen.oneOf(true: Any, false: Any))

  private val propsGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(12)).suchThat(_.nonEmpty), valueGen))
      .map(_.take(8))

  test("makeid is deterministic and independent of property insertion order") {
    samples(propsGen).foreach { props =>
      val sco = props ++ Map("type" -> "url", "value" -> "http://x.test/1")
      val shuffled = scala.util.Random.shuffle(sco.toSeq).toMap
      assert(StixId.makeid(sco) == StixId.makeid(shuffled))
    }
  }

  test("makeid depends only on ID-contributing properties") {
    samples(propsGen).foreach { noise0 =>
      val noise = noise0 - "value"
      val a = StixId.makeid(Map("type" -> "ipv4-addr", "value" -> "9.9.9.9"))
      val b = StixId.makeid(noise ++ Map("type" -> "ipv4-addr", "value" -> "9.9.9.9"))
      assert(a == b)
    }
  }

  test("canonicalJson is stable under map reordering and parses back") {
    samples(propsGen).foreach { props =>
      val j1 = StixId.canonicalJson(props)
      val j2 = StixId.canonicalJson(scala.util.Random.shuffle(props.toSeq).toMap)
      assert(j1 == j2)
      if (props.nonEmpty) {
        val parsed = Flatten.parseJson(j1).asInstanceOf[Map[String, Any]]
        assert(parsed.keySet == props.keySet)
      }
    }
  }

  test("jsonNormalize never emits nested maps (non-custom types)") {
    val nestedGen: Gen[Map[String, Any]] = Gen.mapOf(Gen.zip(
      Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.oneOf(
        valueGen,
        Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty), valueGen))
          .map(m => m.take(3): Any)
      ))).map(_.take(6))
    samples(nestedGen).foreach { m =>
      val flat = Flatten.jsonNormalize(m ++ Map("type" -> "file"))
      assert(flat.values.forall(v => !v.isInstanceOf[collection.Map[_, _]]))
    }
  }

  test("PathAssembler: every _ref value resolves to an object index; props round-trip") {
    val ipGen = Gen.zip(Gen.chooseNum(1, 254), Gen.chooseNum(1, 254))
      .map { case (a, b) => s"10.$a.0.$b" }
    val recGen = Gen.zip(ipGen, ipGen, Gen.chooseNum(1L, 65535L), Gen.chooseNum(1L, 1023L))
    samples(recGen, 30).foreach { case (src, dst, sport, dport) =>
      val obs = graft.ingest.PathAssembler.assemble(Map(
        "first_observed" -> "2024-01-01T00:00:00.000Z",
        "network-traffic:src_ref.value" -> src,
        "network-traffic:dst_ref.value" -> dst,
        "network-traffic:src_port" -> sport,
        "network-traffic:dst_port" -> dport,
        "network-traffic:protocols" -> "tcp"))
      val objects = obs("objects").asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[Map[String, Any]] }
      // every _ref value is a valid index into the observation's objects
      objects.values.foreach(_.foreach {
        case (p, v) if p.endsWith("_ref") => assert(objects.contains(v.toString))
        case _                            => ()
      })
      val nt = objects.values.find(_("type") == "network-traffic").get
      assert(nt("src_port") == sport && nt("dst_port") == dport)
      assert(objects(nt("src_ref").toString)("value") == src)
      assert(objects(nt("dst_ref").toString)("value") == dst)
      // flatten20 accepts the assembled observation unchanged
      val flat = Flatten.flatten(obs)
      assert(flat.count(_("type") == "__contains") == objects.size)
      val fnt = flat.find(_("type") == "network-traffic").get
      assert(fnt("src_ref").toString.startsWith("ipv4-addr--"))
    }
  }

  test("translate never throws and is deterministic on arbitrary events") {
    import graft.ingest.Translate
    val sm = Flatten.parseJson(
      """{"ip": [
        |   {"key": "ipv4-addr.value", "object": "h", "unwrap": true},
        |   {"key": "ipv6-addr.value", "object": "h6", "unwrap": true},
        |   {"key": "x-oca-asset.ip_refs", "object": "a", "references": ["h", "h6"], "unwrap": true}],
        | "port": {"key": "network-traffic.src_port", "object": "n", "transformer": "ToInteger"},
        | "ts": {"key": "first_observed", "transformer": "EpochToTimestamp", "cybox": false},
        | "name": {"key": "software.name"}}""".stripMargin)
      .asInstanceOf[Map[String, Any]]
    val identity = Map[String, Any]("id" -> "identity--x", "type" -> "identity")
    val evGen: Gen[Map[String, Any]] = for {
      ip <- Gen.oneOf[Any](
        "10.0.0.1", Seq("10.0.0.2", "fe80::1"), Seq.empty[String], 42L, "")
      port <- Gen.oneOf[Any]("80", 80L, "junk", null)
      ts <- Gen.oneOf[Any]("1675275995001", "garbage", null)
      nm <- Gen.option(Gen.alphaNumStr.map(_.take(10)))
      extra <- propsGen
    } yield extra ++ Map("ip" -> ip, "port" -> port, "ts" -> ts) ++
      nm.map(v => Map("name" -> (v: Any))).getOrElse(Map.empty)
    samples(evGen, 80).foreach { ev0 =>
      val ev = ev0.filter(_._2 != null)
      val r1 = Translate.translateRow(sm, Translate.builtinTransformers, ev, identity,
        Map.empty, "2024-01-01T00:00:00.000Z")
      val r2 = Translate.translateRow(sm, Translate.builtinTransformers, ev, identity,
        Map.empty, "2024-01-01T00:00:00.000Z")
      // deterministic except the random observation id
      assert(r1 - "observed-data:id" == r2 - "observed-data:id")
      // exploding to objects never throws, and every object carries an id
      val objs = Translate.rowToObjects(r1)
      assert(objs.filter(o => !o("type").toString.startsWith("__")).forall(_.contains("id")))
      // every __contains edge targets an object emitted in the same row
      val ids = objs.flatMap(_.get("id")).map(_.toString).toSet
      objs.filter(_("type") == "__contains")
        .foreach(e => assert(ids.contains(e("target_ref").toString)))
    }
  }

  test("flatten 2.0 emits one __contains per SCO and resolves every ref") {
    samples(Gen.chooseNum(1, 6), 20).foreach { n =>
      val objects = (0 until n).map(i =>
        i.toString -> (Map("type" -> "ipv4-addr", "value" -> s"10.0.0.$i"): Any)).toMap
      val obs = Map[String, Any](
        "id" -> "observed-data--p", "type" -> "observed-data",
        "first_observed" -> "2024-01-01T00:00:00.000Z",
        "last_observed" -> "2024-01-01T00:00:00.000Z",
        "number_observed" -> 1L, "objects" -> objects)
      val out = Flatten.flatten(obs)
      assert(out.count(_("type") == "__contains") == n)
      assert(out.filter(_("type") == "ipv4-addr").map(_("id")).distinct.size == n)
    }
  }
}
