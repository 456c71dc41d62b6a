package graft

/** Temporary timing probe — deleted before round end. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val qs = SparkEntry.queries
    names.foreach { n =>
      val fn = qs(n)
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).collect()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $n rep$i: $s%.3f s")
      }
    }
    spark.stop()
  }
}
