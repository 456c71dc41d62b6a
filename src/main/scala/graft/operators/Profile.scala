package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column-level data profiling — the corpus-QA pass a training pipeline
  * runs before ingesting a new source: per column, null fraction, distinct
  * count, and numeric/string summary stats.
  *
  * One aggregation pass over the table computes every column's stats
  * (a single job, no per-column scans); the per-column rows are unpivoted
  * driver-side from that one result row. Exact count_distinct here for
  * oracle parity — at 100 TB swap in approx_count_distinct, which turns the
  * expensive distinct shuffle into a mergeable HLL sketch with the same
  * plan shape. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.filter(f => cols.isEmpty || cols.contains(f.name))
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(c).as(s"${f.name}__nn"),
        count_distinct(c).as(s"${f.name}__dist")) ++ (f.dataType match {
        case _: NumericType =>
          Seq(
            round(min(c).cast("double"), 4).as(s"${f.name}__min"),
            round(max(c).cast("double"), 4).as(s"${f.name}__max"),
            round(avg(c.cast("double")), 4).as(s"${f.name}__avg"))
        case StringType =>
          Seq(
            min(length(c)).cast("double").as(s"${f.name}__min"),
            max(length(c)).cast("double").as(s"${f.name}__max"),
            round(avg(length(c)), 4).as(s"${f.name}__avg"))
        case _ =>
          Seq(
            lit(null).cast("double").as(s"${f.name}__min"),
            lit(null).cast("double").as(s"${f.name}__max"),
            lit(null).cast("double").as(s"${f.name}__avg"))
      })
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = fields.map { f =>
      Row(
        f.name,
        f.dataType.simpleString,
        r.getAs[Long](s"${f.name}__n"),
        r.getAs[Long](s"${f.name}__n") - r.getAs[Long](s"${f.name}__nn"),
        r.getAs[Long](s"${f.name}__dist"),
        Option(r.getAs[Any](s"${f.name}__min")).map(_.toString.toDouble).orNull,
        Option(r.getAs[Any](s"${f.name}__max")).map(_.toString.toDouble).orNull,
        Option(r.getAs[Any](s"${f.name}__avg")).map(_.toString.toDouble).orNull)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("column", StringType),
        StructField("dtype", StringType),
        StructField("n_rows", LongType),
        StructField("n_null", LongType),
        StructField("n_distinct", LongType),
        StructField("min_val", DoubleType),
        StructField("max_val", DoubleType),
        StructField("avg_val", DoubleType))))
  }

  /** Exact per-column quantiles, one (column, p, q) row per requested
    * percentile — ONE aggregation pass over all columns (each percentile
    * list comes back as an array, unpivoted lazily with posexplode).
    *
    * `percentile` interpolates lo + (hi-lo)·frac, the same quantile_cont
    * definition every SQL engine uses, so values hash-match an oracle
    * (rounded 6dp). Exact percentile sorts each column's values inside the
    * agg — fine for profiling runs and samples; at 100 TB the scale path
    * is approx_percentile (mergeable KLL-style sketch, same plan shape,
    * engine-specific values). */
  def quantiles(
      df: DataFrame,
      colNames: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val psSql = ps.mkString(", ")
    val aggs = colNames.map(c => expr(s"percentile(`$c`, array($psSql))").as(c))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(colNames.map(c =>
        struct(lit(c).as("column"), col(c).as("qs"))): _*)).as("s"))
      .select(col("s.column").as("column"), posexplode(col("s.qs")).as(Seq("i", "q")))
      .select(
        col("column"),
        element_at(typedlit(ps), col("i").cast("int") + 1).as("p"),
        round(col("q"), 6).as("q"))
  }
}
