package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Record linkage / entity resolution: blocking → pairwise fuzzy
  * match → transitive closure. The classic three-stage shape every
  * large-scale dedup-by-identity pipeline uses (customer MDM, author
  * disambiguation, product catalog merge), built from the same
  * scale-safe pieces as the text-dedup family:
  *
  *   - BLOCKING replaces the O(n²) all-pairs comparison with
  *     per-block self-joins — an equi-join on the block key, so
  *     Spark shuffles each record once and compares only within
  *     blocks. At 100 TB the block key choice is the whole game:
  *     block sizes must stay bounded (a degenerate block re-creates
  *     the quadratic). `maxBlock` makes that contract explicit —
  *     the stats pass computes block sizes and FAILS FAST if any
  *     block exceeds the cap, pointing at finer blocking, rather
  *     than silently running a quadratic join (mirrors the
  *     lshCandidatePairs guard philosophy in [[Dedup]]).
  *   - MATCHING is codegen'd `levenshtein` inside the joined rows —
  *     no UDF, stays in Tungsten.
  *   - CLUSTERING reuses [[Dedup.connectedComponents]] (label
  *     propagation with lineage truncation), so transitive identity
  *     (a≈b, b≈c ⇒ {a,b,c} one entity) holds exactly.
  */
object Linkage {

  /** Candidate pairs within (blockCols) blocks, ordered a < b on
    * `idCol` so each unordered pair appears once. Throws if any
    * block exceeds `maxBlock` — the caller must refine blocking, not
    * eat a quadratic join. */
  def blockedPairs(records: DataFrame, idCol: String,
      blockCols: Seq[String], maxBlock: Int): DataFrame = {
    val biggest = records.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    require(biggest <= maxBlock,
      s"largest block has $biggest records (> maxBlock=$maxBlock): " +
        "refine the blocking key instead of running a quadratic join")
    val a = records.columns.foldLeft(records)((d, c) =>
      d.withColumnRenamed(c, s"${c}_a"))
    val b = records.columns.foldLeft(records)((d, c) =>
      d.withColumnRenamed(c, s"${c}_b"))
    val cond = blockCols.map(c => col(s"${c}_a") === col(s"${c}_b"))
      .reduce(_ && _) && col(s"${idCol}_a") < col(s"${idCol}_b")
    a.join(b, cond)
  }

  /** q184 core: resolve customer records into entities. Records are
    * blocked on (c_nationkey, c_mktsegment); two records match when
    * their names are within `maxDist` edits (codegen'd levenshtein);
    * matches close transitively via connected components. Output is
    * one row per customer in a multi-record entity: its canonical
    * representative (min custkey in the component) and the entity
    * size. Deterministic, so the DuckDB recursive-CTE oracle
    * hash-gates the whole pipeline end to end. */
  def entityResolution(spark: SparkSession, dir: String,
      maxDist: Int = 1, maxBlock: Int = 512): DataFrame = {
    val recs = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment"))
    val edges = blockedPairs(recs, "c_custkey",
      Seq("c_nationkey", "c_mktsegment"), maxBlock)
      .filter(levenshtein(col("c_name_a"), col("c_name_b")) <= maxDist)
      .select(col("c_custkey_a").as("doc_a"), col("c_custkey_b").as("doc_b"))
    val comps = Dedup.connectedComponents(edges)
    val sizes = comps.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    comps.join(sizes, "label")
      .select(col("id").as("c_custkey"), col("label").as("entity_id"),
        col("n_members"))
  }
}
