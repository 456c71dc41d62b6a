package graft
import org.apache.spark.sql.SparkSession
object ProbePushdown {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .coalesce(2)
      .where(col("l_quantity") <= 5)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    println("PUSHED: " + plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).mkString(" | "))
    spark.stop()
  }
}
