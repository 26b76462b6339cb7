package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format surface beyond JSONL (SURVEY.md §2B "Scans / sources /
  * sinks"): CSV and Parquet readers/writers with the options that
  * matter at scale (header+schema for CSV — schema inference is a
  * full extra pass over 100 TB, so callers should pass an explicit
  * schema in production; snappy parquet as the default columnar
  * sink). */
object Io {

  def readCsv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.option("inferSchema", "true").csv(path)
    }
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC — the other splittable columnar format with predicate
    * pushdown + column pruning (Spark's reader pushes filters into
    * ORC's stripe/row-group indexes just like parquet). Same operator
    * catalog runs unchanged over either. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
