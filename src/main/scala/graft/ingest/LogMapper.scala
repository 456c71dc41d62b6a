package graft.ingest

import graft.model.StixId

/** Raw log records -> STIX observation bundles — the capability surface of
  * the reference's woodchipper (firepit/woodchipper.py): a Mapper turns one
  * flat log record into the SCO dicts of one observation, and
  * `dict2observation` assembles the observed-data envelope. Mappers are pure
  * functions, so conversion runs driver-side for small files or inside
  * mapPartitions over a record DataFrame at scale.
  */
object LogMapper {

  type Rec = Map[String, Any]

  /** A source-specific mapping: detect whether a record belongs to this
    * source, and convert it to SCO dicts (woodchipper Mapper.detect/convert,
    * woodchipper.py:564-569). */
  trait Mapper {
    def detect(rec: Rec): Boolean
    def convert(rec: Rec): Seq[Rec]
  }

  /** Generic flat-record mapper (woodchipper.py:750-775): src/dst ip+port ->
    * ipv4-addr + network-traffic, url/domain/user fields -> their SCOs. */
  object FlatJsonMapper extends Mapper {
    def detect(rec: Rec): Boolean = true
    def convert(rec: Rec): Seq[Rec] = {
      val out = Seq.newBuilder[Rec]
      var refs = Map.empty[String, String]
      def addr(key: String, refName: String): Unit =
        rec.get(key).foreach { v =>
          out += Map("type" -> "ipv4-addr", "value" -> v.toString)
          refs += (refName -> v.toString)
        }
      addr("src_ip", "src_ref")
      addr("dst_ip", "dst_ref")
      if (refs.nonEmpty) {
        val nt = Map[String, Any]("type" -> "network-traffic") ++
          rec.get("src_port").map(p => "src_port" -> toLong(p)) ++
          rec.get("dst_port").map(p => "dst_port" -> toLong(p)) ++
          rec.get("protocol").map(p => "protocols" -> Seq(p.toString.toLowerCase))
        out += (nt ++ refs.map { case (k, v) => k -> s"__ip:$v" })
      }
      rec.get("url").foreach(u => out += Map("type" -> "url", "value" -> u.toString))
      rec.get("domain").foreach(d => out += Map("type" -> "domain-name", "value" -> d.toString))
      rec.get("user").foreach(u => out += Map("type" -> "user-account", "user_id" -> u.toString))
      out.result()
    }
    private def toLong(v: Any): Long = v match {
      case n: Long => n; case n: Int => n.toLong; case s => s.toString.toDouble.toLong
    }
  }

  /** Assemble one observation from a record's SCOs (dict2observation,
    * woodchipper.py:185-283): indexed objects, ref wiring, timestamps from
    * the record's `timestamp`/`ts` field. */
  def dict2observation(rec: Rec, mapper: Mapper = FlatJsonMapper): Rec = {
    val scos = mapper.convert(rec)
    val ipIndex = scos.zipWithIndex.collect {
      case (o, i) if o("type") == "ipv4-addr" => o("value").toString -> i.toString
    }.toMap
    val objects = scos.zipWithIndex.map { case (o, i) =>
      val resolved = o.map {
        case (k, v: String) if v.startsWith("__ip:") => k -> ipIndex(v.stripPrefix("__ip:"))
        case kv                                      => kv
      }
      i.toString -> resolved
    }.toMap
    val ts = rec.get("timestamp").orElse(rec.get("ts")).map(_.toString)
      .getOrElse("1970-01-01T00:00:00.000Z")
    val obs = Map[String, Any](
      "type" -> "observed-data",
      "first_observed" -> ts,
      "last_observed" -> ts,
      "number_observed" -> 1L,
      "objects" -> objects)
    obs + ("id" -> s"observed-data--${java.util.UUID.randomUUID()}")
  }

  /** Records -> one bundle (convert CLI shape, woodchipper.py:802-921). */
  def toBundle(records: Seq[Rec], mapper: Mapper = FlatJsonMapper): Map[String, Any] =
    Map(
      "type" -> "bundle",
      "id" -> s"bundle--${java.util.UUID.randomUUID()}",
      "objects" -> records.filter(mapper.detect).map(dict2observation(_, mapper)))

  /** Bundle JSON text (feeds Storage.cache / cacheBundles). */
  def toBundleJson(records: Seq[Rec], mapper: Mapper = FlatJsonMapper): String =
    StixId.canonicalJson(toBundle(records, mapper))
}
