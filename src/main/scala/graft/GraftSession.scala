package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory for the engine — the config a
  * deployment should START from, with the reasoning attached. Every
  * knob is overridable afterwards; `GraftExtensions` is registered so
  * the native expressions are SQL-callable.
  *
  * Scale rationale per knob:
  *  - `shuffle.partitions` ≈ total executor cores (local: the core
  *    count) — Spark's 200 default under-splits big clusters and
  *    over-splits laptops; AQE coalesces down from this initial
  *    number, so err high on real clusters.
  *  - AQE on + skew-join split on: runtime re-planning is the first
  *    line of defense for skewed keys (salting — Skew.saltedJoin — is
  *    the manual fallback beyond AQE's split factor).
  *  - `files.maxPartitionBytes` 256m: scan tasks sized so a row-group
  *    decompresses comfortably inside executor memory while keeping
  *    task count bounded on 100 TB inputs.
  *  - nanos-as-long: the events table carries TIMESTAMP(NANOS)
  *    parquet which Spark 4 otherwise refuses to read.
  *  - UTC session timezone: event-time math must not depend on the
  *    driver host's zone.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores =
      shufflePartitions.getOrElse(Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // guard probes (witness limits, boundedGrid caps) scan every
      // partition anyway; starting executeTake at the session width
      // avoids the 1→4→16 ramp's sequential driver jobs per probe
      .config("spark.sql.limit.initialNumPartitions", cores.toString)
      // many-query workloads thrash the default 100-entry codegen
      // class cache; 10k entries costs tens of MB on the driver
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${256L << 20}")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
  }
}
