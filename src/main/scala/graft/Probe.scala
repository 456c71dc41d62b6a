package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Probe { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.ui.enabled", "false").appName("p").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  def scans(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val p = df.queryExecution.executedPlan.toString
    println(s"$name SCANS=" + "Scan parquet".r.findAllIn(p).size +
      " EXCH=" + "Exchange".r.findAllIn(p).size +
      " REUSE=" + "ReusedExchange".r.findAllIn(p).size)
  }
  scans("containment", Dedup.containmentPairs(docs))
  scans("crossSource", Dedup.crossSourceOverlap(docs))
  scans("dupSpans", Dedup.duplicateSpans(docs))
  scans("minhashPairs", Dedup.minhashPairs(docs))
  scans("lshQuality", Dedup.lshQuality(docs))
  scans("ngramJaccard", Dedup.ngramJaccardPairs(docs))
  scans("exactJaccard", Dedup.exactJaccardPairs(docs))
  scans("chunkNovelty", Dedup.chunkNovelty(docs))
  spark.stop()
}}
