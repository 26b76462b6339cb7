package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-input REDUCTION techniques: shrink what a join must shuffle
  * before the join runs. Complements [[Skew]] (which fixes how a
  * shuffle distributes) — these fix how much shuffles at all. */
object Reduce {

  /** Bloom semi-join reduction: build a Bloom filter over the small
    * side's keys, broadcast it, and pre-filter the BIG side before
    * the exact join. At 100 TB this is the difference between
    * shuffling the full fact table and shuffling only rows that can
    * possibly match — false positives (rate `fpp`) pass the filter
    * and die in the exact join, so results are EXACTLY the plain
    * semi join's (the oracle runs the plain semi join). Spark's AQE
    * can inject runtime bloom filters itself; the explicit form is
    * for when the small side comes from a separate pipeline stage or
    * the optimizer can't see the opportunity. The filter is built
    * with one aggregation on the small side (`stat.bloomFilter`,
    * mergeable sketch) and ships once per executor.
    *
    * Key columns may be any integral type or string (the types
    * `stat.bloomFilter` itself supports); the probe side dispatches
    * on the column's actual dataType, so int/long/string keys all
    * work. Sizing: pass `expectedItems` when the caller already
    * knows the small side's cardinality (e.g. from a prior stage's
    * metrics) — otherwise ONE column-pruned `approx_count_distinct`
    * action estimates it (an over-estimate only wastes filter bits;
    * an under-estimate only raises fpp, never correctness). */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01, expectedItems: Option[Long] = None): DataFrame =
    big.filter(bloomContained(big, small, key, fpp, expectedItems))
      .join(small.select(col(key)).distinct().hint("broadcast"),
        Seq(key), "left_semi")

  /** ANTI-join sibling of [[bloomSemiJoin]]: rows of `big` whose key
    * is NOT in `small`. A Bloom filter cannot drive an anti join
    * alone (a false positive would wrongly DROP a row), so the split
    * is: bloom-negative rows are definitively clean and bypass the
    * join entirely — scan + filter, zero shuffle — while the
    * bloom-positive sliver (true matches + `fpp` of the clean side)
    * is resolved by the exact anti join. At 100 TB with a blocklist
    * too big to broadcast, that turns "shuffle the whole corpus
    * against the blocklist" into "shuffle `fpp` of it": the branch
    * union re-reads the big side's scan, but two cheap scans beat
    * one full-corpus shuffle, and a materialized input pays the scan
    * once. The filter is built ONCE and shared by both branches.
    * NULL keys are never "contained", so they take the clean branch —
    * exactly the plain anti join's NULL semantics. Results are
    * EXACTLY the plain anti join's. */
  def bloomAntiJoin(big: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01, expectedItems: Option[Long] = None): DataFrame = {
    val contained = bloomContained(big, small, key, fpp, expectedItems)
    val maybe = big.filter(contained)
      .join(small.select(col(key)).distinct(), Seq(key), "left_anti")
    big.filter(!contained).unionByName(maybe)
  }

  /** One broadcast Bloom filter per DISTINCT (context, small-side
    * plan, key, fpp, expectedItems) — repeated bloomSemiJoin /
    * bloomAntiJoin / curatedDocs(bloomPrefilter) calls reuse it
    * instead of accumulating broadcast variables for the session's
    * lifetime.
    *
    * Key discipline:
    *  - the canonicalized plan OBJECT, not its toString — plan
    *    rendering truncates (LocalRelation data, long field lists),
    *    so two different small sides can print identically and a
    *    string key would hand one of them the other's filter: a false
    *    NEGATIVE, the one failure a Bloom filter must never have
    *    (caught live by the property suite). Structural plan equality
    *    includes the data.
    *  - the owning SparkContext is part of the key, so two live
    *    sessions/contexts can never collide on an entry.
    * Lifecycle discipline: entries are NEVER destroy()ed explicitly —
    * a returned bloomSemiJoin DataFrame captures the broadcast in its
    * probe UDF, and destroying it under a live plan fails that plan's
    * next action. Eviction (stopped-context purge on every access,
    * LRU bound of [[bloomCacheMax]]) only DROPS the map reference;
    * Spark's ContextCleaner reclaims the broadcast once no plan
    * references it, which is the correct collection point. */
  private val bloomCache = scala.collection.mutable.LinkedHashMap
    .empty[(org.apache.spark.SparkContext,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        String, Double, Long),
      org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]]
  private val bloomCacheMax = 64

  /** Drop every cached filter reference (long-session hygiene — the
    * [[graft.ext.Dedup.clearCaches]] counterpart; reclamation is the
    * ContextCleaner's, see [[bloomCache]]).
    *
    * CALL THIS AFTER A DATA REFRESH that changes the small side's
    * CONTENT behind an unchanged plan (e.g. files overwritten under a
    * memoized path, a view re-pointed): the cache keys on the
    * canonicalized PLAN, which cannot see file contents, so a stale
    * entry would keep serving the pre-refresh filter — and a filter
    * missing newly-added keys produces Bloom false NEGATIVES, the one
    * failure mode the probe must never have. (Plans that read new
    * FILE LISTINGS — fresh `spark.read` of a grown directory —
    * canonicalize differently and miss the cache naturally; it is the
    * same-listing-new-bytes overwrite that needs the explicit clear,
    * alongside [[graft.ext.Dedup.clearCaches]] for the same reason.) */
  def clearBloomCache(): Unit = bloomCache.synchronized { bloomCache.clear() }

  private[rel] def bloomCacheSize: Int =
    bloomCache.synchronized(bloomCache.size)

  /** Shared probe core: a predicate column that is true iff the small
    * side's Bloom filter reports `key` as a possible member. Builds
    * the filter eagerly (one `stat.bloomFilter` aggregation) and
    * broadcasts it — memoized via [[bloomCache]]; key-type dispatch
    * matches what `stat.bloomFilter` itself supports. NULL keys are
    * never "contained": they fail the positive predicate and pass its
    * negation — the semantics both joins need (NULL matches nothing
    * in a semi join and survives an anti join). */
  private def bloomContained(big: DataFrame, small: DataFrame,
      key: String, fpp: Double, expectedItems: Option[Long]): Column = {
    import org.apache.spark.sql.types._
    val keyType = big.schema(key).dataType
    val supported = keyType match {
      case StringType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!supported) throw new IllegalArgumentException(
      s"bloomSemiJoin key '$key' has unsupported type $keyType " +
        "(integral and string keys only, matching stat.bloomFilter)")
    val spark = big.sparkSession
    val sc = spark.sparkContext
    val cacheKey = (sc, small.queryExecution.analyzed.canonicalized,
      key, fpp, expectedItems.getOrElse(-1L))
    def lookup(): Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]] =
      bloomCache.synchronized {
        // purge entries whose owning context stopped (their broadcasts
        // died with it; dropping the reference is all that's needed)
        bloomCache.filterInPlace { case ((c, _, _, _, _), _) => !c.isStopped }
        bloomCache.remove(cacheKey).map { b =>
          bloomCache.put(cacheKey, b) // re-insert = LRU touch
          b
        }
      }
    val bfB = lookup().getOrElse {
      val n = math.max(expectedItems.getOrElse(
        small.select(approx_count_distinct(col(key))).head().getLong(0)), 1L)
      val built = sc.broadcast(small.stat.bloomFilter(key, n, fpp))
      bloomCache.synchronized {
        bloomCache.get(cacheKey) match {
          case Some(winner) => winner // raced: drop `built` to the cleaner
          case None =>
            bloomCache.put(cacheKey, built)
            while (bloomCache.size > bloomCacheMax)
              bloomCache.remove(bloomCache.head._1) // evict eldest (ref-drop only)
            built
        }
      }
    }
    keyType match {
      case StringType =>
        val f = udf((k: String) => k != null && bfB.value.mightContainString(k))
        f(col(key))
      case _ =>
        val f = udf((k: java.lang.Long) =>
          k != null && bfB.value.mightContainLong(k))
        f(col(key).cast("long"))
    }
  }

  /** The q120 query: orders of BUILDING-segment customers via bloom
    * semi-join reduction — oracle = the plain semi join it equals. */
  def buildingOrders(spark: SparkSession, dir: String): DataFrame = {
    val seg = graft.Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    bloomSemiJoin(graft.Tables.orders(spark, dir), seg, "o_custkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(28,6)")).cast("double")
          .as("sum_price"))
  }

  /** Morton (Z-order) value: bit-interleave two non-negative int
    * columns (a in even bit positions, b in odd) — the space-filling
    * curve behind multi-dimensional data layout: sorting by z keeps
    * rows close in BOTH dimensions close in the file, so min/max
    * zone maps prune 2-D range predicates that a 1-D sort can only
    * prune on its leading column. Pure column arithmetic (2×bits
    * shift/mask terms, codegen-friendly, no UDF); monotone under
    * component-wise dominance, which the spec checks exhaustively on
    * a grid.
    *
    * DOMAIN: both components must fit in `bits` bits, i.e. lie in
    * [0, 2^bits); higher bits are silently DROPPED by the
    * interleave, which breaks dominance-monotonicity and degrades
    * layout quality for out-of-range keys. Size `bits` to the real
    * key domain before a layout job (e.g. `l_partkey` at SF 100
    * needs bits=28, not the default 16) — a one-row
    * `agg(max(a), max(b))` on a sample is cheap insurance, and the
    * spec exercises a wide-domain pair at bits=20 to pin the
    * contract. bits ≤ 31 keeps 2×bits interleaved bits inside a
    * long with room for the sign. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      (shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The q121 query: z-bucket occupancy of lineitem laid out on
    * (l_partkey, l_suppkey) — the audit a layout job emits: how rows
    * distribute over the top bits (z >> 12) of the z-curve (= the file-level
    * zone map granularity a writer would use). */
  def zOrderBuckets(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(spark, dir)
      .select(zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy(shiftright(col("z"), 12).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))

  /** Partial TOP-K aggregator: keeps the k largest (value, id) pairs
    * per group with map-side combine — the aggregation alternative to
    * a row_number window for per-group top-N. The window form sorts
    * EVERY row of a group on the reducer; this form's partial buffers
    * carry at most k entries per group per map task, so the shuffle
    * moves O(groups × k), not O(rows) — at 100 TB that is the whole
    * game. Ordering (value desc, id asc) makes the result total and
    * deterministic; the q123 oracle is the window form it equals. */
  final class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]]
      with Serializable {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (v, id) => (-v, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Nil
    // the buffer stays ≤ k entries, so the per-row sort is O(k log k)
    // on a tiny seq; a full-buffer fast-path skips rows that cannot
    // displace the current minimum
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.size >= k && {
        val (mv, mi) = b.last; a._1 < mv || (a._1 == mv && a._2 > mi)
      }) b
      else trim(b :+ a)
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The q123 query: top-3 order prices per customer via [[TopKAgg]]
    * (one partial-combined aggregation, no window sort), exploded
    * back to rows. Oracle: the ROW_NUMBER window form. */
  def topKAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    graft.Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("o_custkey"), (col("i") + 1).as("rk"),
        col("p._1").as("o_totalprice"), col("p._2").as("o_orderkey"))
  }

  /** Write `df` Z-ORDERED on two key columns: range-partition by the
    * z value (so files own disjoint z ranges) and sort within each
    * partition — parquet then records min/max zone maps per file
    * that prune 2-D range scans. Returns the output path. */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      nFiles: Int = 8): String = {
    df.withColumn("z", zValue(col(a), col(b)))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
    path
  }
}

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
