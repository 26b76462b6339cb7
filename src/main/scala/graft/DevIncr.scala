package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only marginal-batch pricing for the incremental index
  * pipelines (VERDICT r12 item 1's cost row): the catalog queries
  * q323/q324 REPLAY the whole corpus (their total ≈ a cold rebuild —
  * that is what makes them oracle-comparable); the number a 100 TB
  * operator actually cares about is the MARGINAL cost of folding one
  * new batch into a standing index. This harness maintains the
  * MATERIALIZED parquet stores (appendToDeletionKeyIndex /
  * appendToShingleStore / appendToLshIndex — row-local O(batch)
  * writes, the production shape), folds the first (nBatches−1)
  * slices untimed, then times the LAST slice's fold alone — append +
  * touched-bucket candidates against the parquet index + verify +
  * ccIncrement — against the one-shot cold rebuild time.
  *
  * Usage: runMain graft.DevIncr <sfDir> [nBatches]
  * Emits one JSON line per measurement.
  */
object DevIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def emit(op: String, kv: (String, String)*): Unit =
      println(kv.map { case (k, v) => s""""$k":$v""" }
        .mkString(s"""{"tool":"incr","op":"$op","sf":"$sfDir",""", ",", "}"))
    def tmp(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"graft_incr_$tag").toString + "/store"

    // ---- entity resolution (q184 cold vs the marginal batch) ------
    {
      val recs = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      val (_, coldSec) = time {
        graft.ext.Linkage.entityResolution(spark, sfDir).count()
      }
      val idxPath = tmp("dk")
      var labels = recs
        .select(col("c_custkey").as("id"), col("c_custkey").as("label"))
        .limit(0)
      def erBatch(b: Int): (Long, Double) = time {
        val batch = recs
          .filter(pmod(col("c_custkey"), lit(nBatches.toLong)) === b)
        // O(batch) row-local append into the standing parquet index
        graft.ext.Linkage.appendToDeletionKeyIndex(batch, idxPath)
        val newKeys = graft.ext.Linkage.deletionKeyTable(batch)
          .localCheckpoint(eager = true)
        val indexKeys = spark.read.parquet(idxPath)
        labels = graft.ext.Dedup.ccIncrement(labels,
            graft.ext.Linkage.erAppendEdges(newKeys, indexKeys))
          .localCheckpoint(eager = true)
        labels.count()
      }
      (0 until nBatches - 1).foreach(erBatch)
      val (entRows, lastSec) = erBatch(nBatches - 1)
      emit("entity_res",
        "cold_oneshot_sec" -> f"$coldSec%.2f",
        "marginal_batch_sec" -> f"$lastSec%.2f",
        "n_batches" -> nBatches.toString,
        "standing_rows" -> entRows.toString)
    }

    // ---- LSH near-dup clustering (q59-shape cold vs marginal) -----
    // production path: xxhash64 signatures, compressed band keys,
    // both stores materialized parquet
    {
      val docs = Tables.documents(spark, sfDir)
      val (_, coldSec) = time {
        graft.ext.Dedup.lshDedupClusters(spark, sfDir).count()
      }
      val shPath = tmp("sh")
      val idxPath = tmp("lsh")
      var labels = docs
        .select(col("doc_id").as("id"), col("doc_id").as("label")).limit(0)
      def lshBatch(b: Int): (Long, Double) = time {
        val batch = docs
          .filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b)
        // O(batch) row-local appends into both standing stores
        graft.ext.Dedup.appendToShingleStore(batch, shPath)
        graft.ext.Dedup.appendToLshIndex(batch, idxPath)
        val newKeys = graft.ext.Dedup.lshBandKeys(
          graft.ext.Dedup.shingleRowsFor(batch, 3).select(col("doc_id"),
            graft.ext.Dedup.minhashFromShingles(col("sh"), 32).as("sig")),
          bands = 8, rowsPerBand = 4)
          .localCheckpoint(eager = true)
        val edges = graft.ext.Dedup.verifyPairs(
          spark.read.parquet(shPath),
          graft.ext.Dedup.lshAppendCandidates(newKeys,
            spark.read.parquet(idxPath), 256), 0.7)
        labels = graft.ext.Dedup.ccIncrement(labels, edges)
          .localCheckpoint(eager = true)
        labels.count()
      }
      (0 until nBatches - 1).foreach(lshBatch)
      val (lshRows, lastSec) = lshBatch(nBatches - 1)
      emit("lsh_clusters",
        "cold_oneshot_sec" -> f"$coldSec%.2f",
        "marginal_batch_sec" -> f"$lastSec%.2f",
        "n_batches" -> nBatches.toString,
        "standing_rows" -> lshRows.toString)
    }
    spark.stop()
  }
}
