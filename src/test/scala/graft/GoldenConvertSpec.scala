package graft

import graft.ingest.{Flatten, LogMapper}
import org.scalatest.funsuite.AnyFunSuite

/** Golden replay of the reference's splint-convert suite
  * (tests/test_splint.py) on the public log fixtures: each file converts to
  * a STIX 2.0 bundle with the reference's observation counts and values.
  * Pure-JVM (no Spark session needed).
  */
class GoldenConvertSpec extends AnyFunSuite {

  private def fixture(name: String): String =
    new java.io.File(s"src/test/resources/fixtures/$name").getAbsolutePath

  private def obsOf(bundleJson: String): Seq[Map[String, Any]] = {
    val b = Flatten.parseJson(bundleJson).asInstanceOf[Map[String, Any]]
    assert(b("type") == "bundle")
    b("objects").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
      .filter(_.get("type").contains("observed-data"))
  }

  test("convert: STIX-flat CSV -> 5 observations (test_splint.py:21-30)") {
    val obs = obsOf(LogMapper.convert(fixture("test_procs.csv")))
    assert(obs.length == 5)
    // each observation carries the process graph from the dotted ref paths
    val objs = obs.head("objects").asInstanceOf[Map[String, Any]]
      .values.map(_.asInstanceOf[Map[String, Any]])
    assert(objs.exists(o => o("type") == "process" && o.get("name").exists(_ != null)))
    assert(objs.exists(_("type") == "directory"))
  }

  test("convert: Sysmon JSON-lines -> 2 observations, ms timestamps (test_splint.py:33-49)") {
    val obs = obsOf(LogMapper.convert(fixture("sds_example.json")))
    assert(obs.length == 2)
    val expectTs = Set("2019-11-16T12:59:17.131Z", "2019-11-16T12:59:11.273Z")
    obs.foreach { o =>
      assert(expectTs.contains(o("first_observed").toString))
      assert(expectTs.contains(o("last_observed").toString))
      assert(o("number_observed") == 1L || o("number_observed") == 1)
      val files = o("objects").asInstanceOf[Map[String, Any]]
        .values.map(_.asInstanceOf[Map[String, Any]])
        .filter(_("type") == "file")
      // the executing image is present (parent images like csrss.exe may
      // also appear as file objects via ParentImage)
      assert(files.exists(f =>
        Set("conhost.exe", "wdsync-inotify.exe").contains(f("name").toString)))
    }
  }

  test("convert: .zip archive -> same bundle as its unzipped log (woodchipper.py:896-905)") {
    // zip the Zeek fixture (plus a decoy entry the reference would skip)
    // and assert the converted observations equal the unzipped conversion
    val zip = java.nio.file.Files.createTempFile("graft-zip", ".zip")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zip))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("README.txt"))
      zos.write("not a log".getBytes("UTF-8"))
      zos.closeEntry()
      zos.putNextEntry(new java.util.zip.ZipEntry("zeek_example.log"))
      zos.write(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fixture("zeek_example.log"))))
      zos.closeEntry()
    } finally zos.close()
    def strip(obs: Seq[Map[String, Any]]) = obs.map(_ - "id") // ids are uuid4
    try
      assert(
        strip(obsOf(LogMapper.convert(zip.toString))) ==
          strip(obsOf(LogMapper.convert(fixture("zeek_example.log")))))
    finally java.nio.file.Files.deleteIfExists(zip)
  }

  test("convert: Zeek JSON conn log -> 2 observations (test_splint.py:52-62)") {
    val obs = obsOf(LogMapper.convert(fixture("zeek_example.log")))
    assert(obs.length == 2)
    val nts = obs.flatMap(_("objects").asInstanceOf[Map[String, Any]]
      .values.map(_.asInstanceOf[Map[String, Any]])
      .filter(_("type") == "network-traffic"))
    assert(nts.length == 2)
  }
}
