package graft

import graft.api.Storage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary phase-level profiler for the write verbs (q_stix_reassign
  * shape) — run against a COPY of the stix corpus. */
object Probe {
  def main(args: Array[String]): Unit = {
    val wd = args.headOption.getOrElse("/tmp/graft_profile_corpus")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 3).foreach { rep =>
      System.err.println(s"--- rep $rep")
      val st = t("Storage construction")(new Storage(spark, wd))
      val sel = t("resolve url + collect") {
        st.catalog.resolve("url")
          .select(col("id"), col("value"))
          .where(!col("value").startsWith("http://loaded."))
          .orderBy("id").limit(5).collect()
      }
      val objs = sel.toSeq.map(r =>
        Map[String, Any]("type" -> "url", "id" -> r.getString(0),
          "x_risk" -> r.getString(1).length.toLong))
      t("reassign (writeObjects)")(st.reassign("risky_urls", objs))
      t("resolve result")(st.catalog.resolve("risky_urls").count())
      // verb-level breakdown with reassign-shaped 5-row batches
      import graft.ingest.UpsertWriter
      val urlDf = UpsertWriter.rowsToDF(spark, objs.map(o =>
        Map[String, Any]("id" -> o("id"), "x_risk" -> o("x_risk"))))
      t("  upsert url (5 rows)")(UpsertWriter.upsert(spark, wd, "url", urlDf))
      val provDf = UpsertWriter.rowsToDF(spark, objs.map(o =>
        Map[String, Any]("sco_id" -> o("id"), "query_id" -> "probe-q")))
      t("  appendDistinct __queries")(
        UpsertWriter.appendDistinct(spark, wd, "__queries", provDf))
      val metaDf = UpsertWriter.rowsToDF(spark, Seq(Map[String, Any](
        "otype" -> "url", "path" -> "x_risk", "shortname" -> "x_risk", "dtype" -> "int")))
      t("  appendKeyedFirst __columns")(
        UpsertWriter.appendKeyedFirst(spark, wd, "__columns", metaDf, Seq("otype", "path")))
    }
    spark.stop()
  }
}
