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

  /** Compact a parquet directory into ~`targetBytes` output files —
    * the small-files fix (a 100 TB table ingested in streaming
    * micro-batches accretes millions of KB-sized files; every query
    * then pays a task + open + footer-read per file). Sizing comes
    * from the filesystem's content summary (no data read), and the
    * rewrite uses `coalesce`, which merges partitions locally WITHOUT
    * a network shuffle — compaction is pure IO. For size-skewed
    * inputs where even output files matter more than avoiding the
    * shuffle, pass `shuffle = true` (repartition round-robins rows).
    * Returns the chosen file count. Output goes to a new directory:
    * compact-in-place over an object store is not atomic; swap paths
    * (or use a table format) at the catalog level. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 512L << 20, shuffle: Boolean = false): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // size from the listing only (no data read); skip hidden/marker
    // files (_SUCCESS, .crc) so sizing reflects actual data bytes
    def dataBytes(dir: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(dir).iterator.map { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (st.isDirectory) dataBytes(st.getPath)
        else st.getLen
      }.sum
    val totalBytes = dataBytes(p)
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.mode("overwrite").parquet(outPath)
    n
  }

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** IDEMPOTENT PARTITION BACKFILL: overwrite ONLY the partitions
    * present in `df`, leaving every other partition of the table
    * untouched — `partitionOverwriteMode=dynamic`, the mechanism
    * behind "reprocess 2024-03-07" on a date-partitioned 100 TB
    * table (static overwrite mode would drop the whole table first).
    * Dynamic mode is requested as a per-write DataFrameWriter OPTION,
    * which takes precedence over the session conf and is genuinely
    * scoped to this write — a concurrent write on the same session
    * keeps the fail-safe static default (a session-conf toggle would
    * leak dynamic mode into any write racing the window). Re-running
    * the same backfill is idempotent: the partition is replaced with
    * identical content. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "dynamic overwrite needs partition columns")
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*).parquet(path)
  }

  /** SCHEMA-EVOLVED read: union the schemas of every file in the
    * directory (`mergeSchema`) so a table whose writers added columns
    * over time reads as ONE frame — older files surface the new
    * columns as NULL. This is the read posture for any long-lived
    * 100 TB lake table without a catalog-managed table format; the
    * footer-merge costs one extra metadata pass, so production pins
    * the merged schema once and passes it explicitly thereafter. */
  def readParquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** RESILIENT read for a lake with damaged files: corrupt or
    * truncated parquet parts are SKIPPED (logged by Spark) instead of
    * failing the whole 100 TB job hours in. Opt-in wrapper — silent
    * row loss is the explicit trade, which is why the default reader
    * fails fast; use this for forensic/recovery scans, then compact
    * the survivors ([[compactParquet]]) to quarantine the damage. */
  def readParquetResilient(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("ignoreCorruptFiles", "true")
      .option("ignoreMissingFiles", "true")
      .parquet(path)
}
