package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Column profiling — the data-quality gate of an ingest pipeline
  * (null rates, cardinalities, ranges; what you look at before
  * trusting 100 TB of new parquet).
  *
  * ONE pass: every per-column statistic is an aggregate expression in
  * a single global agg (one scan, one reduce), and the wide result is
  * reshaped to long form plan-side via an array-of-structs explode —
  * no second job, no driver loop. Exact COUNT(DISTINCT …) over many
  * columns expands the aggregate (one shuffle copy per distinct
  * column); at real scale swap in approx_count_distinct, which
  * collapses the expansion at ~2% error — the exact form here is what
  * the cross-engine oracle can check. */
object Profile {

  /** Long-format profile: one row per column with
    * (n_rows, n_null, n_distinct, min_val, max_val) — min/max as
    * double for numeric columns, null otherwise (double-vs-string
    * rendering of numerics is not portable across engines). */
  def profile(df: DataFrame, numericCols: Seq[String],
      otherCols: Seq[String] = Nil): DataFrame = {
    val cols = numericCols ++ otherCols
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
        cols.flatMap { c =>
          Seq(count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"))
        } ++
        numericCols.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"mn_$c"),
            max(col(c)).cast("double").as(s"mx_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val (mn, mx) =
        if (numericCols.contains(c)) (col(s"mn_$c"), col(s"mx_$c"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      struct(lit(c).as("column_name"), col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        mn.as("min_val"), mx.as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** The q58 query: profile of the lineitem columns a loader would
    * sanity-check first. */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.lineitem(spark, dir),
      numericCols = Seq("l_orderkey", "l_quantity", "l_extendedprice"),
      otherCols = Seq("l_returnflag"))
}
