package graft.rel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Tables
import graft.ext.{Dedup, Linkage}

/** r13 item 1: incremental maintenance for the heavy candidate-index
  * builds. Every appendable index must satisfy grown-by-appends ==
  * full-rebuild, and every incremental pipeline must land on the
  * one-shot result (the q322 one-oracle-two-disciplines recipe,
  * applied upstream of CC). */
class IncrementalIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()
  val sf = TestSpark.sf

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  test("LSH band-key index: grown by appends equals the full build, row for row") {
    val docs = Tables.documents(spark, sf)
    val full = tmpDir("lsh_full") + "/idx"
    val grown = tmpDir("lsh_grown") + "/idx"
    Dedup.writeLshIndex(spark, sf, full)
    // batch 0 seeds the store; batches 1 and 2 append
    (0 until 3).foreach { b =>
      Dedup.appendToLshIndex(
        docs.filter(pmod(col("doc_id"), lit(3L)) === b), grown)
    }
    val f = spark.read.parquet(full)
      .select("doc_id", "band", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val g = spark.read.parquet(grown)
      .select("doc_id", "band", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(g == f && f.nonEmpty)
  }

  test("shingle store: grown by appends equals the full build") {
    val docs = Tables.documents(spark, sf)
    val full = tmpDir("sh_full") + "/store"
    val grown = tmpDir("sh_grown") + "/store"
    Dedup.writeShingleStore(spark, sf, full)
    (0 until 3).foreach { b =>
      Dedup.appendToShingleStore(
        docs.filter(pmod(col("doc_id"), lit(3L)) === b), grown)
    }
    def slurp(p: String) = spark.read.parquet(p)
      .select(col("doc_id"), array_sort(col("sh")).as("sh")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1).toSeq
    val f = slurp(full)
    assert(slurp(grown) == f && f.nonEmpty)
  }

  test("deletion-key index: grown by appends equals the full build") {
    val recs = Tables.customer(spark, sf)
    val full = tmpDir("dk_full") + "/idx"
    val grown = tmpDir("dk_grown") + "/idx"
    Linkage.writeDeletionKeyIndex(spark, sf, full)
    (0 until 3).foreach { b =>
      Linkage.appendToDeletionKeyIndex(
        recs.filter(pmod(col("c_custkey"), lit(3L)) === b), grown)
    }
    def slurp(p: String) = spark.read.parquet(p)
      .select("c_custkey", "k").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val f = slurp(full)
    assert(slurp(grown) == f && f.nonEmpty)
  }

  test("per-batch append candidates union to the one-shot LSH candidate set") {
    val sig = Dedup.signaturesPortable(spark, sf, k = 3, perms = 32)
      .localCheckpoint(eager = true)
    val oneShot = Dedup.lshCandidatePairs(sig, bands = 8, rowsPerBand = 4,
        maxBucket = 256, compressBuckets = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var store: org.apache.spark.sql.DataFrame = null
    var union = Set.empty[(Long, Long)]
    (0 until 3).foreach { b =>
      val nk = Dedup.lshBandKeys(
        sig.filter(pmod(col("doc_id"), lit(3L)) === b),
        bands = 8, rowsPerBand = 4, compressBuckets = false)
        .localCheckpoint(eager = true)
      store = if (store == null) nk
        else store.unionByName(nk).localCheckpoint(eager = true)
      union ++= Dedup.lshAppendCandidates(nk, store, maxBucket = 256)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(union == oneShot && oneShot.nonEmpty)
  }

  test("lshAppendCandidates fails fast on an oversized touched bucket") {
    import spark.implicits._
    // 5 docs all sharing one (band, bucket): cap 4 must throw
    val keys = (1L to 5L).map(i => (i, 0, "B")).toDF("doc_id", "band", "bucket")
    val e = intercept[IllegalArgumentException] {
      Dedup.lshAppendCandidates(keys, keys, maxBucket = 4).collect()
    }
    assert(e.getMessage.contains("maxBucket"))
    // and an untouched oversized bucket elsewhere must NOT trip the
    // guard for a batch that never joins it
    val quiet = (1L to 5L).map(i => (i, 1, "OLD")).toDF("doc_id", "band", "bucket")
    val nk = Seq((9L, 0, "X")).toDF("doc_id", "band", "bucket")
    assert(Dedup.lshAppendCandidates(nk,
      quiet.unionByName(nk), maxBucket = 4).count() == 0L)
  }

  test("incremental entity resolution equals one-shot q184") {
    val one = Linkage.entityResolution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val inc = Linkage.entityResolutionIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(inc == one && one.nonEmpty)
  }

  test("simhash store: grown by appends equals the full build") {
    val docs = Tables.documents(spark, sf)
    val full = tmpDir("sim_full") + "/store"
    val grown = tmpDir("sim_grown") + "/store"
    Dedup.writeSimhashStore(spark, sf, full)
    (0 until 3).foreach { b =>
      Dedup.appendToSimhashStore(
        docs.filter(pmod(col("doc_id"), lit(3L)) === b), grown)
    }
    def slurp(p: String) = spark.read.parquet(p)
      .select("doc_id", "sh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val f = slurp(full)
    assert(slurp(grown) == f && f.nonEmpty)
  }

  test("incremental simhash near-dup equals one-shot q46 (pairs disjoint per batch)") {
    val one = Dedup.simhashNearDupPortable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val incRows = Dedup.simhashNearDupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // disjoint-by-construction: the union must already be duplicate-free
    assert(incRows.length == incRows.distinct.length)
    assert(incRows.sorted.toSeq == one && one.nonEmpty)
  }

  test("incremental LSH dedup clustering equals one-shot q59") {
    val one = Dedup.lshDedupClustersPortable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val inc = Dedup.lshDedupClustersIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(inc == one && one.nonEmpty)
  }
}
