package graft

import graft.api.Storage
import graft.model.{StixId, Uuid5}
import org.apache.spark.sql.SparkSession

/** Deterministic synthetic STIX bundle corpus for the oracle-checked hunting
  * queries (q_stix_*).
  *
  * The reference's own e2e tests run cache -> extract -> lookup over small
  * fixture bundles with exact expected answers (tests/test_storage.py:24-147,
  * tests/test_lookup.py). The driver's DuckDB oracle can't parse STIX
  * bundles, but it CAN read the parquet tables this engine writes — so the
  * corpus is built once into a fixed workdir, the q_stix_* queries exercise
  * the verb surface (pattern compile, provenance semi-join, auto-deref
  * joins, observation joins) through the Storage API, and each oracle
  * recomputes the same answer with plain SQL over the engine's own base
  * tables. What's verified end-to-end: the verbs' relational semantics on
  * top of real ingested STIX data.
  *
  * Everything is seeded/uuid5-deterministic: rebuilding the corpus in any
  * JVM yields byte-identical table contents (ids via StixId.makeid,
  * observation ids via uuid5 of the observation index).
  *
  * Layout: 6 bundles x 50 STIX 2.0 observations. Bundles 0-3 are cached
  * under query_id "q1", bundles 4-5 under "q2". Observations rotate through:
  *  - network connections (ipv4 src/dst, ports, tcp) — most observations;
  *  - every 8th connection uses an ipv6 src (exercises the dual v4/v6
  *    deref join with COALESCE, reference deref.py:28-59);
  *  - every 5th observation carries a url + user-account instead;
  *  - observations with i%10==3 add a process that opened the connection
  *    (opened_connection_refs — exercises the __reflist edge table);
  *  - observations with i%5==2 add an artifact whose payload_bin (base64)
  *    rotates beacon / exfil / benign text (exercises the like_bin /
  *    match_bin payload decoders through the pattern compiler).
  */
object StixCorpus {

  val dir = "/tmp/graft_stix_corpus_v3"
  private val marker = java.nio.file.Paths.get(dir, "_READY")
  private val lock = new Object

  /** Build the corpus if absent; returns a Storage over it. */
  def ensure(spark: SparkSession): Storage = lock.synchronized {
    if (java.nio.file.Files.exists(marker)) return new Storage(spark, dir)
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) deleteRecursively(p)
    val storage = new Storage(spark, dir)
    val bundles = (0 until 6).map(bundleJson)
    storage.cache("q1", bundles.slice(0, 4))
    storage.cache("q2", bundles.slice(4, 6))
    java.nio.file.Files.createFile(marker)
    storage
  }

  /** The SNAPSHOT-VERB fixture store: the same six bundles, but with the
    * url table PINNED between the two ingests (cache q1 → snapshot s1 →
    * cache q2) — marker-guarded and built once per /tmp lifetime like the
    * main corpus, so the q_stix_snapshot row measures the verb READ path
    * (pin vs live), not a full scratch re-ingest per rep (first cut
    * re-ingested per invocation: 40.8 s/row at sf0.1). */
  private val snapDir = "/tmp/graft_stixsnap_corpus_v1"
  private val snapMarker = java.nio.file.Paths.get(snapDir, "_READY")

  def ensureSnap(spark: SparkSession): Storage = lock.synchronized {
    if (java.nio.file.Files.exists(snapMarker)) return new Storage(spark, snapDir)
    val p = java.nio.file.Paths.get(snapDir)
    if (java.nio.file.Files.exists(p)) deleteRecursively(p)
    val storage = new Storage(spark, snapDir)
    storage.cache("q1", (0 until 4).map(bundleJson))
    storage.snapshot("url", "s1")
    storage.cache("q2", (4 until 6).map(bundleJson))
    java.nio.file.Files.createFile(snapMarker)
    storage
  }

  /** The MULTI-TABLE snapshot fixture store: the same six bundles, with
    * url AND user-account pinned between the two ingests by ONE
    * snapshot(Seq(...), name) verb call — both pins land under
    * simultaneously-held leases, so they capture one consistent cut.
    * Marker-guarded and built once per /tmp lifetime (the ensureSnap
    * discipline): q_stix_snapshot_multi measures the verb READ path. */
  private val snapMultiDir = "/tmp/graft_stixsnapmulti_corpus_v1"
  private val snapMultiMarker = java.nio.file.Paths.get(snapMultiDir, "_READY")

  def ensureSnapMulti(spark: SparkSession): Storage = lock.synchronized {
    if (java.nio.file.Files.exists(snapMultiMarker)) return new Storage(spark, snapMultiDir)
    val p = java.nio.file.Paths.get(snapMultiDir)
    if (java.nio.file.Files.exists(p)) deleteRecursively(p)
    val storage = new Storage(spark, snapMultiDir)
    storage.cache("q1", (0 until 4).map(bundleJson))
    storage.snapshot(Seq("url", "user-account"), "m1")
    storage.cache("q2", (4 until 6).map(bundleJson))
    java.nio.file.Files.createFile(snapMultiMarker)
    storage
  }

  private[graft] def deleteDir(p: java.nio.file.Path): Unit = ingest.FsUtil.deleteTree(p)

  private def deleteRecursively(p: java.nio.file.Path): Unit = ingest.FsUtil.deleteTree(p)

  private def pad(n: Long, w: Int): String = {
    val s = n.toString
    "0" * math.max(0, w - s.length) + s
  }

  /** RFC-3339 text timestamps, the reference's at-rest representation
    * (firepit/timestamp.py:16-29): lexicographic order == temporal order. */
  private def ts(secondsFromEpoch: Long): String = {
    val days = secondsFromEpoch / 86400
    val rem = secondsFromEpoch % 86400
    // base 2023-01-01; the corpus spans ~11 hours, so day stays constant
    s"2023-01-${pad(1 + days, 2)}T${pad(rem / 3600, 2)}:${pad(rem % 3600 / 60, 2)}:${pad(rem % 60, 2)}.000Z"
  }

  /** One observation (STIX 2.0 `objects` style, exercising flatten20: id
    * synthesis, ref index resolution, rank marking). Pure function of the
    * global observation index. */
  private def observation(i: Int): Map[String, Any] = {
    val obsId = s"observed-data--${Uuid5(StixId.Namespace, s"graft-corpus-obs-$i")}"
    val first = i.toLong * 137
    val objects: Map[String, Any] =
      if (i % 5 == 4) {
        // url + user-account observation; page numbers repeat (1..40) so
        // urls dedup across observations and value_counts sees weights > 1
        val page = 1 + (i * 7) % 40
        val host = 1 + i % 9
        Map(
          "0" -> Map("type" -> "url", "value" -> s"http://www$host.example.com/page/$page"),
          "1" -> Map("type" -> "user-account", "user_id" -> s"user${i % 25}", "account_login" -> s"login${i % 25}")
        )
      } else {
        val srcV6 = i % 8 == 7
        val src: Map[String, Any] =
          if (srcV6) Map("type" -> "ipv6-addr", "value" -> s"2001:db8::${pad(1 + i % 40, 2)}")
          else if (i % 3 == 0) Map("type" -> "ipv4-addr", "value" -> s"192.168.${1 + i % 3}.${1 + i % 50}")
          else Map("type" -> "ipv4-addr", "value" -> s"10.0.${i % 4}.${1 + i % 60}")
        val dst = Map("type" -> "ipv4-addr", "value" -> s"203.0.113.${1 + i % 45}")
        val dstPort = Seq(22L, 80L, 443L, 445L, 3389L, 8080L, 9999L)(i % 7)
        val conn = Map(
          "0" -> src,
          "1" -> dst,
          "2" -> Map(
            "type" -> "network-traffic",
            "src_ref" -> "0",
            "dst_ref" -> "1",
            "src_port" -> (49152L + (i * 13) % 16000),
            "dst_port" -> dstPort,
            "protocols" -> Seq("tcp"))
        )
        val withProc =
          if (i % 10 == 3)
            // the process that opened this connection (__reflist edge)
            conn + ("3" -> Map(
              "type" -> "process",
              "name" -> s"proc${i % 20}.exe",
              "pid" -> (1000L + i),
              "x_unique_id" -> s"guid-$i",
              "opened_connection_refs" -> Seq("2")))
          else conn
        if (i % 5 == 2) withProc + ("9" -> artifact(i)) else withProc
      }
    Map(
      "type" -> "observed-data",
      "id" -> obsId,
      "first_observed" -> ts(first),
      "last_observed" -> ts(first + (i % 7) * 60L),
      "number_observed" -> (1L + i % 5),
      "objects" -> objects
    )
  }

  /** Artifact SCO with a base64 payload (STIX 2.0 payload_bin). A quarter
    * of the texts carry a "beacon" marker (LIKE path), a quarter an
    * `exfil-<n>` marker (MATCHES path), half are benign — so payload
    * patterns have non-trivial hit sets on both decoders. */
  private def artifact(i: Int): Map[String, Any] = {
    val text = (i % 20) match {
      case 2  => s"beacon interval ${i}s to c2.example.net"
      case 7  => s"staging exfil-$i chunk for upload"
      case 12 => s"routine log rotation $i complete"
      case _  => s"heartbeat $i ok"
    }
    Map(
      "type" -> "artifact",
      "mime_type" -> "text/plain",
      "payload_bin" -> java.util.Base64.getEncoder.encodeToString(text.getBytes("UTF-8")))
  }

  private[graft] def bundleJson(b: Int): String = {
    val obs = (b * 50 until (b + 1) * 50).map(observation)
    StixId.canonicalJson(
      Map(
        "type" -> "bundle",
        "id" -> s"bundle--${Uuid5(StixId.Namespace, s"graft-corpus-bundle-$b")}",
        "objects" -> obs))
  }
}
