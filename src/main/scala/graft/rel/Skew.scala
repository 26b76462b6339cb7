package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A hash join shuffles both sides on the key, so one heavy-hitter
  * key pins its entire row population on a single reducer — at 100 TB
  * the job is as slow as its hottest key. When the build side is
  * small enough, `broadcast()` sidesteps the shuffle entirely, and
  * AQE's skew-join splitting handles moderate imbalance; SALTING is
  * the remaining tool when the build side is too big to broadcast and
  * the probe side's histogram is pathological.
  */
object Skew {

  /** Join `fact` (skewed probe side) with `dim` (non-broadcastable
    * build side) on `key`, spreading each fact key over `salts`
    * reducers: fact rows get a per-row salt in [0, salts); dim rows
    * are replicated once per salt value; the join key becomes
    * (key, salt). Hot-key reducer load drops by ~`salts`× at the cost
    * of a `salts`× replication of the BUILD side only — pick `salts`
    * ≈ (hottest-key row share) × (shuffle partitions).
    *
    * The salt is derived from a hash of the row's partition and
    * intra-partition position, not `rand()`: any salt value joins
    * correctly (the dim side carries every salt), so a task retry
    * that re-salts a row still produces exactly one identical output
    * row — the join stays retry-deterministic, which `rand()` does
    * not guarantee under speculative execution. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Load-balanced general theta join — the 1-Bucket-Theta scheme
    * (Okcan & Riedewald, "Processing theta-joins using MapReduce",
    * SIGMOD 2011) re-expressed on DataFrames. An arbitrary-predicate
    * join is inherently |L|·|R| work, but Spark's fallback (broadcast
    * or single-partition cartesian) serializes it; here the virtual
    * L×R matrix is cut into a `grid`×`grid` cell grid — each left row
    * lands in one row-band and replicates across its `grid` cells,
    * each right row in one column-band likewise, so every (l, r) pair
    * meets in EXACTLY one cell (its row-band × column-band) and the
    * quadratic work spreads evenly over grid² reducers at replication
    * cost `grid` per side (≈ √reducers, the paper's bound). Band
    * assignment is the same retry-deterministic position hash as
    * [[saltedJoin]] — any band is correct, so re-execution cannot
    * duplicate or drop pairs. */
  def balancedThetaJoin(left: DataFrame, right: DataFrame, cond: Column,
      grid: Int = 8): DataFrame = {
    require(grid > 0, "grid must be positive")
    def band = pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
      lit(grid.toLong)).cast("int")
    val all = sequence(lit(0), lit(grid - 1))
    val l = left.withColumn("__rb", band).withColumn("__cb", explode(all))
    val r = right.withColumn("__cb", band).withColumn("__rb", explode(all))
    l.join(r, l("__rb") === r("__rb") && l("__cb") === r("__cb"))
      .filter(cond)
      .drop("__rb", "__cb")
  }
}
