package graft.rel

import org.apache.spark.sql.DataFrame
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
}
