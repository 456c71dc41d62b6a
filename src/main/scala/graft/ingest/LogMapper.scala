package graft.ingest

import graft.model.StixId
import scala.jdk.CollectionConverters._

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

  // =========================================================================
  // Path-dict mappers — the reference's per-source mapping architecture
  // (woodchipper.py:530-569): a mapping table turns one log record into an
  // intermediate dict keyed by STIX object paths ("process:pid",
  // "process:opened_connection_refs[0].dst_ref.value", "first_observed"),
  // and an assembler builds the indexed-objects observation from those
  // paths (dict2observation, woodchipper.py:185-283). Mapping values are a
  // target path, a list of paths, or a function producing (path, value)
  // tuples (process_mapping, woodchipper.py:530-550).
  // =========================================================================

  trait PathMapper {
    def detect(rec: Rec): Boolean
    def pathDict(rec: Rec): Map[String, Any]
  }

  type PathFn = Any => Seq[(String, Any)]

  def processMapping(rec: Rec, mapping: Seq[(String, Any)]): Map[String, Any] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    mapping.foreach { case (k, mv) =>
      rec.get(k).filter(v => v != null && v != "") .foreach { v =>
        mv match {
          case s: String   => out(s) = v
          case ss: Seq[_]  => ss.foreach(s => out(s.toString) = v)
          case f: Function1[_, _] =>
            f.asInstanceOf[PathFn](v).foreach { case (p, pv) => out(p) = pv }
        }
      }
    }
    out.toMap
  }

  // ----- shared path-tuple helpers (woodchipper.py:289-398) ----------------

  private def baseName(p: String): String = p.substring(math.max(p.lastIndexOf('\\'), p.lastIndexOf('/')) + 1)
  private def dirName(p: String): String = {
    val i = math.max(p.lastIndexOf('\\'), p.lastIndexOf('/'))
    if (i <= 0) "" else p.substring(0, i)
  }

  def splitImage(prefix: String = "process:"): PathFn = v => {
    val s = v.toString
    Seq(
      s"${prefix}name" -> baseName(s),
      s"${prefix}binary_ref.name" -> baseName(s),
      s"${prefix}binary_ref.parent_directory_ref.path" -> dirName(s))
  }

  def splitFilePath: PathFn = v => {
    val s = v.toString
    Seq("file:name" -> baseName(s), "file:parent_directory_ref.path" -> dirName(s))
  }

  /** "SHA1=..,MD5=.." -> hash path tuples (split_hash, woodchipper.py:337-349). */
  def splitHash(prefix: String): PathFn = v => {
    val tokens = Seq("SHA1=" -> s"${prefix}hashes.'SHA-1'", "MD5=" -> s"${prefix}hashes.MD5",
      "SHA256=" -> s"${prefix}hashes.'SHA-256'")
    v.toString.split(',').toSeq.flatMap { h =>
      tokens.collect { case (tok, path) if h.contains(tok) => path -> h.substring(h.indexOf(tok) + tok.length) }
    }
  }

  /** "HKLM\\..\\Key\\Value" -> registry key + values list (woodchipper.py:393-398). */
  def splitRegKeyValue: PathFn = v => {
    val s = v.toString
    val i = s.lastIndexOf('\\')
    val (key, value) = if (i >= 0) (s.substring(0, i), s.substring(i + 1)) else (s, "")
    Seq(
      "windows-registry-key:key" -> key,
      "windows-registry-key:values" -> Seq(Map("name" -> value)))
  }

  /** Unix epoch (seconds) -> RFC-3339 UTC (from_unix_time, woodchipper.py:291-296). */
  def fromUnixTime: PathFn = v => {
    val secs = v match { case n: Long => n.toDouble; case d: Double => d; case s => s.toString.toDouble }
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(math.round(secs * 1000)))
    Seq("first_observed" -> iso, "last_observed" -> iso)
  }

  /** Windows event id -> x-oca-event code + action (woodchipper.py:299-305). */
  val windowsEvents: Map[Int, String] = Map(
    1 -> "Process Creation", 3 -> "Network Connection", 5 -> "Process Terminated",
    7 -> "Image Loaded", 11 -> "File Create", 12 -> "Registry Create and Delete",
    13 -> "Registry Value Set", 17 -> "Pipe Event Created", 18 -> "Pipe Event Connected",
    22 -> "DNS Query", 4688 -> "Process Creation", 5156 -> "Network Connection")

  def toActionCode: PathFn = v => {
    val id = v.toString.toDouble.toInt
    Seq("x-oca-event:code" -> id.toLong) ++
      windowsEvents.get(id).map(a => "x-oca-event:action" -> (a: Any))
  }

  // ----- Sysmon / Windows events (woodchipper.py:429-521) ------------------

  object SysmonMapper extends PathMapper {
    private val common: Seq[(String, Any)] = Seq(
      // later entries overwrite: UtcTime (the event's own clock) beats the
      // channel's TimeCreated, matching the reference's per-event mappings
      // overriding the common map (woodchipper.py:434-489 vs :600)
      "@timestamp" -> Seq("first_observed", "last_observed"),
      "TimeCreated" -> Seq("first_observed", "last_observed"),
      "UtcTime" -> Seq("first_observed", "last_observed"),
      "Hostname" -> "x-oca-asset:hostname",
      "Channel" -> "x-oca-event:module",
      "SourceName" -> "x-oca-event:provider",
      "EventID" -> toActionCode,
      "ProcessId" -> "process:pid",
      "ProcessGuid" -> "process:x_unique_id")

    private val perEvent: Map[Int, Seq[(String, Any)]] = Map(
      1 -> Seq(
        "Image" -> splitImage(),
        "CommandLine" -> "process:command_line",
        "ParentImage" -> splitImage("process:parent_ref."),
        "ParentProcessId" -> "process:parent_ref.pid",
        "ParentProcessGuid" -> "process:parent_ref.x_unique_id",
        "ParentCommandLine" -> "process:parent_ref.command_line",
        "User" -> "process:creator_user_ref.user_id",
        "Hashes" -> splitHash("process:binary_ref.")),
      3 -> Seq(
        "Image" -> splitImage(),
        "SourceIp" -> "process:opened_connection_refs[0].src_ref.value",
        "SourcePort" -> "process:opened_connection_refs[0].src_port",
        "DestinationIp" -> "process:opened_connection_refs[0].dst_ref.value",
        "DestinationPort" -> "process:opened_connection_refs[0].dst_port",
        "Protocol" -> "process:opened_connection_refs[0].protocols"),
      5 -> Seq("Image" -> splitImage()),
      11 -> Seq("Image" -> splitImage(), "TargetFilename" -> splitFilePath),
      13 -> Seq("Image" -> splitImage(), "TargetObject" -> splitRegKeyValue),
      4688 -> Seq(
        "NewProcessName" -> splitImage(),
        "NewProcessId" -> "process:pid",
        "CommandLine" -> "process:command_line",
        "ParentProcessName" -> splitImage("process:parent_ref."),
        "SubjectUserName" -> "process:creator_user_ref.user_id"),
      5156 -> Seq(
        "Application" -> splitImage(),
        "SourceAddress" -> "process:opened_connection_refs[0].src_ref.value",
        "SourcePort" -> "process:opened_connection_refs[0].src_port",
        "DestAddress" -> "process:opened_connection_refs[0].dst_ref.value",
        "DestPort" -> "process:opened_connection_refs[0].dst_port"))

    def detect(rec: Rec): Boolean =
      rec.contains("EventID") &&
        (rec.contains("UtcTime") || rec.contains("TimeCreated") || rec.contains("@timestamp"))

    def pathDict(rec: Rec): Map[String, Any] = {
      val id = rec("EventID").toString.toDouble.toInt
      val paths = processMapping(rec, common ++ perEvent.getOrElse(id, Nil))
      // fall back to the subject user when no process user mapped
      // (SdsMapper.convert, woodchipper.py:631-639)
      if (!paths.contains("process:creator_user_ref.user_id")) {
        rec.get("TargetUserName").orElse(rec.get("SubjectUserName"))
          .map(_.toString).filter(u => u.nonEmpty && u != "-")
          .map(u => paths + ("user-account:user_id" -> u))
          .getOrElse(paths)
      } else paths
    }
  }

  // ----- Zeek conn/dns logs (woodchipper.py:647-718) -----------------------

  object ZeekCsvMapper extends PathMapper {
    private val mapping: Seq[(String, Any)] = Seq(
      "ts" -> fromUnixTime,
      "id.orig_h" -> "network-traffic:src_ref.value",
      "id.orig_p" -> "network-traffic:src_port",
      "orig_ip_bytes" -> "network-traffic:src_byte_count",
      "orig_pkts" -> "network-traffic:src_packets",
      "id.resp_h" -> "network-traffic:dst_ref.value",
      "id.resp_p" -> "network-traffic:dst_port",
      "resp_ip_bytes" -> "network-traffic:dst_byte_count",
      "resp_pkts" -> "network-traffic:dst_packets",
      "proto" -> "network-traffic:protocols")
    def detect(rec: Rec): Boolean = rec.contains("id.orig_h")
    def pathDict(rec: Rec): Map[String, Any] = processMapping(rec, mapping)
  }

  object ZeekJsonMapper extends PathMapper {
    private val common: Seq[(String, Any)] = Seq(
      "ts" -> fromUnixTime,
      "id_orig_h" -> "network-traffic:src_ref.value",
      "id_orig_p" -> "network-traffic:src_port",
      "id_resp_h" -> "network-traffic:dst_ref.value",
      "id_resp_p" -> "network-traffic:dst_port",
      "proto" -> "network-traffic:protocols")

    private val conn: Seq[(String, Any)] = Seq(
      "orig_ip_bytes" -> "network-traffic:src_byte_count",
      "resp_ip_bytes" -> "network-traffic:dst_byte_count",
      "orig_pkts" -> "network-traffic:src_packets",
      "resp_pkts" -> "network-traffic:dst_packets",
      "orig_l2_addr" -> "network-traffic:src_ref.resolves_to_refs[0].value",
      "resp_l2_addr" -> "network-traffic:dst_ref.resolves_to_refs[0].value")

    /** dns answers: IP-shaped entries -> domain-name resolves_to_refs
      * (process_answers, woodchipper.py:692-703). */
    private val dns: Seq[(String, Any)] = Seq(
      "query" -> "domain-name:value",
      "answers" -> (((v: Any) => {
        val ip = "^([0-9.]+|[0-9a-fA-F:]+)$".r
        val vals = v match { case s: Seq[_] => s.map(_.toString); case x => Seq(x.toString) }
        vals.filter(a => ip.findFirstIn(a).isDefined && (a.contains('.') || a.contains(':')))
          .zipWithIndex
          .map { case (a, i) => s"domain-name:resolves_to_refs[$i].value" -> (a: Any) }
      }): PathFn))

    def detect(rec: Rec): Boolean = rec.contains("@stream")
    def pathDict(rec: Rec): Map[String, Any] = {
      val extra = rec("@stream").toString match {
        case "conn" => conn
        case "dns"  => dns
        case _      => Nil
      }
      processMapping(rec, common ++ extra)
    }
  }

  // ----- ISC honeypot web logs (woodchipper.py:723-745) --------------------

  object IscHoneypotJsonMapper extends PathMapper {
    private val mapping: Seq[(String, Any)] = Seq(
      "url" -> "url:value",
      "user_agent" -> "network-traffic:extensions.'http-request-ext'.request_header.'User-Agent'",
      "source" -> "network-traffic:src_ref.value",
      "ts" -> Seq("first_observed", "last_observed"),
      "sport" -> "network-traffic:src_port",
      "dport" -> "network-traffic:dst_port",
      "dest" -> "network-traffic:dst_ref.value",
      "proto" -> "network-traffic:protocols")
    def detect(rec: Rec): Boolean =
      rec.contains("url") && rec.contains("user_agent") && rec.contains("source")
    def pathDict(rec: Rec): Map[String, Any] = {
      // honeypot records carry no port/dest/proto; synthesize the reference's
      // fixed values (woodchipper.py:738-744)
      val enriched = rec ++ Map(
        "sport" -> 0L, "dport" -> 80L, "dest" -> "127.0.0.1", "proto" -> "tcp",
        "ts" -> s"${rec.getOrElse("date", "1970-01-01")}T${rec.getOrElse("time", "00:00:00")}.000Z")
      processMapping(enriched, mapping)
    }
  }

  // ----- file-format readers (woodchipper.py:802-921) ----------------------

  /** Header'd CSV file -> records, with numeric inference (the convert
    * CLI's CSV path). Small files only — bulk ingest goes through
    * spark.read.csv + cacheBundles. */
  def recordsFromCsv(path: String): Seq[Rec] = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    if (lines.isEmpty) return Nil
    def splitCsv(line: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      val sb = new StringBuilder
      var q = false
      line.foreach {
        case '"'            => q = !q
        case ',' if !q      => out += sb.toString; sb.clear()
        case c              => sb.append(c)
      }
      out += sb.toString
      out.result()
    }
    val header = splitCsv(lines.get(0))
    (1 until lines.size).map { i =>
      header.zip(splitCsv(lines.get(i))).collect {
        case (k, v) if v.nonEmpty => k -> inferScalar(v)
      }.toMap
    }.filter(_.nonEmpty)
  }

  /** Zeek native .log (TSV with #-directive headers: #fields names the
    * columns, #types their zeek types; '-' is unset). */
  def recordsFromZeekLog(path: String): Seq[Rec] = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    var fields: Seq[String] = Nil
    val out = Seq.newBuilder[Rec]
    lines.forEach { line =>
      if (line.startsWith("#fields"))
        fields = line.split('\t').toSeq.drop(1)
      else if (!line.startsWith("#") && line.nonEmpty && fields.nonEmpty)
        out += fields.zip(line.split('\t').toSeq).collect {
          case (k, v) if v.nonEmpty && v != "-" => k -> inferScalar(v)
        }.toMap
    }
    out.result()
  }

  /** JSON-lines log file -> records (Zeek json output, Sysmon exports). */
  def recordsFromJsonl(path: String): Seq[Rec] = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    val out = Seq.newBuilder[Rec]
    lines.forEach { line =>
      if (line.trim.nonEmpty)
        out += graft.ingest.Flatten.parseJson(line).asInstanceOf[Map[String, Any]]
    }
    out.result()
  }

  private def inferScalar(v: String): Any =
    if (v.matches("-?\\d+")) v.toLong
    else if (v.matches("-?\\d+\\.\\d+")) v.toDouble
    else v

  /** Records that are already STIX-shaped flat dicts: `type` plus its
    * primary property present; every key becomes a `type:key` path, known
    * timestamp keys seed first/last_observed (the reference's FlatJsonMapper,
    * woodchipper.py:750-776 — e.g. splint-converted CSVs of extracted SCOs). */
  object StixFlatMapper extends PathMapper {
    def detect(rec: Rec): Boolean =
      rec.get("type").exists(t =>
        rec.contains(graft.model.StixMeta.primaryProp(t.toString)))
    def pathDict(rec: Rec): Map[String, Any] = {
      val otype = rec("type").toString
      val obsKeys = Set("first_observed", "last_observed", "number_observed")
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var tsKey: Option[String] = None
      rec.foreach { case (k, v) =>
        if (obsKeys.contains(k)) out(k) = v
        else {
          if (tsKey.isEmpty && PathAssembler.knownTimestamps.contains(k)) tsKey = Some(k)
          out(s"$otype:$k") = v
        }
      }
      tsKey.foreach { k =>
        if (!out.contains("first_observed")) {
          out("first_observed") = rec(k)
          out("last_observed") = rec(k)
        }
      }
      out.toMap
    }
  }

  /** Pick the first mapper whose detect() matches (process_events,
    * woodchipper.py:788-801). */
  val pathMappers: Seq[PathMapper] =
    Seq(SysmonMapper, ZeekJsonMapper, ZeekCsvMapper, IscHoneypotJsonMapper, StixFlatMapper)

  def detectPathMapper(rec: Rec): Option[PathMapper] = pathMappers.find(_.detect(rec))

  def toBundle(records: Seq[Rec], mapper: PathMapper): Map[String, Any] =
    Map(
      "type" -> "bundle",
      "id" -> s"bundle--${java.util.UUID.randomUUID()}",
      "objects" -> records.filter(mapper.detect).map(r => PathAssembler.assemble(mapper.pathDict(r))))

  def toBundleJson(records: Seq[Rec], mapper: PathMapper): String =
    StixId.canonicalJson(toBundle(records, mapper))

  /** File-level conversion entry (splint `convert` -> woodchipper.convert,
    * firepit/woodchipper.py:871-935): detect the file format by extension /
    * leading bytes, read records, pick the first mapper that recognizes a
    * record, emit a STIX 2.0 bundle JSON.
    *
    * `.zip` archives follow the reference's semantics
    * (woodchipper.py:896-905): the FIRST entry whose name has a convertible
    * extension is extracted and converted; other entries are ignored. */
  def convert(path: String): String = {
    if (path.endsWith(".zip")) return convertZip(path)
    val records =
      if (path.endsWith(".csv")) recordsFromCsv(path)
      else {
        val firstLine = {
          val src = scala.io.Source.fromFile(path)
          try src.getLines().find(_.nonEmpty).getOrElse("") finally src.close()
        }
        if (firstLine.startsWith("#separator")) recordsFromZeekLog(path)
        else recordsFromJsonl(path)
      }
    records.iterator.flatMap(detectPathMapper(_)).nextOption() match {
      case Some(m) => toBundleJson(records, m)
      case None    => toBundleJson(records) // generic flat network-JSON fallback
    }
  }

  private val convertibleExts = Seq(".csv", ".tsv", ".json", ".jsonl", ".log")

  /** Extract the first convertible entry of a zip archive to a temp file
    * and run it through the normal single-file dispatch. */
  private def convertZip(path: String): String = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val entry = zf.entries().asScala
        .find(e => !e.isDirectory && convertibleExts.exists(e.getName.endsWith))
        .getOrElse(throw new IllegalArgumentException(
          s"no convertible entry (${convertibleExts.mkString("/")}) in $path"))
      val name = entry.getName
      val suffix = name.substring(name.lastIndexOf('.'))
      val tmp = java.nio.file.Files.createTempFile("graft-zip-entry", suffix)
      try {
        val in = zf.getInputStream(entry)
        try java.nio.file.Files.copy(
          in, tmp, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
        convert(tmp.toString)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } finally zf.close()
  }
}
