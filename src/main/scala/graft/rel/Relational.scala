package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator catalog (SURVEY.md §2B): projection, filter,
  * joins (broadcast / semi / anti / outer), aggregation (incl.
  * distinct, rollup, cube), window functions, sort/limit/top-k, set
  * operations, scalar string/date functions, and subquery patterns —
  * each a named, composable query over the driver testdata,
  * oracle-checked against DuckDB by `graft.Verify`.
  *
  * Scale notes (100 TB posture):
  *  - Dimension tables (region/nation/customer/supplier/part) are
  *    broadcast explicitly — a 1000-executor cluster must never
  *    shuffle `lineitem` to join a 25-row `nation`.
  *  - Aggregates run partial→final (HashAggregateExec); no
  *    driver-side collection anywhere; top-k is
  *    TakeOrderedAndProject, never a global sort.
  *  - Sums over double columns go through DECIMAL(28,6): decimal
  *    addition is associative, so results are independent of
  *    partitioning / shuffle order — the only sane equality contract
  *    for a distributed engine checked against a single-node oracle.
  */
object Relational {

  private val orderItemsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val custPartsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val itemPairsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Unpersist + drop the memoized CF/basket projections (the
    * Dedup.clearCaches contract). */
  private val gapDailyCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val markovCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def clearCaches(): Unit = {
    Seq(orderItemsCache, custPartsCache, itemPairsCache, gapDailyCache,
        markovCache).foreach { c =>
      c.values.foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
      c.clear()
    }
  }

  /** Deduped (order, part) item table — MEMOIZED per dir: the basket
    * primitive under q211 lift, q222 item-CF and (via [[itemPairs]])
    * q280 rec-eval; the shingleTable compute-once discipline. */
  private def orderItems(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Memo.cached(orderItemsCache, dir, spark) {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Deduped (customer, part) purchase-history table — MEMOIZED per
    * dir: shared by q240 user-CF (pair generation input) and q280
    * rec-eval (its user history is this exact projection). */
  private def custParts(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Memo.cached(custPartsCache, dir, spark) {
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Undirected within-order co-purchase pair counts — MEMOIZED per
    * dir: the basket self-join is the expensive step of both q222
    * item-CF and q280 rec-eval (which calls itemCf). */
  private def itemPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Memo.cached(itemPairsCache, dir, spark) {
      val items = orderItems(spark, dir)
      items.select(col("okey"), col("part").as("part_a"))
        .join(items.select(col("okey"), col("part").as("part_b")), "okey")
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b")).agg(count(lit(1)).as("n_ab"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Order-independent sum of a double expression: exact decimal
    * accumulation, surfaced back as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  private def davg(c: Column): Column = dsum(c) / count(c)

  private def revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** TPC-H Q1-style pricing summary: filter → groupBy → multi-agg.
    * Predicate pushdown: the shipdate filter reaches the parquet scan. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenue).as("sum_disc_price"),
        dsum(revenue * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** Projection + filter: column pruning down to 3 of 5 customer
    * columns must reach the scan (ReadSchema), predicate pushed. */
  def projectFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 100.0 && col("c_mktsegment") =!= "MACHINERY")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Compound predicates incl. IN-list, BETWEEN, conjunctions. */
  def predicates(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_returnflag") === "R" &&
        col("l_quantity").between(10, 40) &&
        col("l_discount").isin(0.0, 0.05, 0.1) &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice").as("price"))

  /** Flagship: revenue by nation — lineitem ⋈ orders ⋈ customer ⋈
    * nation ⋈ region with explicit broadcast of every dimension.
    * The only shuffles left are lineitem⋈orders (both large at
    * scale; AQE picks the strategy) and the tiny final aggregate. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(revenue).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** Semi join (EXISTS): customers having at least one 'F' order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Anti join (NOT EXISTS): customers with no pending ('P') orders. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Outer join with null-producing side: every nation with its
    * customer count (nations without customers keep count 0). */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"),
        coalesce(dsum(col("c_acctbal")), lit(0.0)).as("total_bal"))
  }

  /** Window top-N per group: 3 most expensive orders per customer.
    * Single shuffle on o_custkey; deterministic via orderkey tiebreak. */
  def topNPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("totalprice"), col("rn"))
  }

  /** Running aggregate window: cumulative spend per customer ordered
    * by orderdate (orderkey tiebreak ⇒ deterministic prefix sums;
    * decimal accumulation ⇒ order-of-addition independent). */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(28,6)")).over(w)
          .cast("double").as("running_spend"))
  }

  /** lag: per customer, days between consecutive orders. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
  }

  /** Global top-k: TakeOrderedAndProject, never a full sort at scale.
    * Fully deterministic via unique (orderkey, linenumber) tiebreak. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  /** Set ops: UNION (distinct) / INTERSECT / EXCEPT over custkey sets. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val building  = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
    val bigSpend  = o.filter(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("c_custkey"))
    building.union(machinery).distinct()
      .intersect(bigSpend)
      .except(c.filter(col("c_acctbal") < 0).select(col("c_custkey")))
  }

  /** Distinct aggregation: grouped exact count-distinct. */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        davg(col("o_totalprice")).as("avg_price"))

  /** ROLLUP grouping sets over returnflag × linestatus. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))

  /** CUBE grouping sets. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))

  /** Distribution window functions — ntile quartiles, percent_rank,
    * cume_dist over order value per priority class. One shuffle on
    * the partition key; the unique-key tiebreak (o_orderkey) makes
    * every rank deterministic cross-engine. */
  def windowDistributions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  /** Hourly volume anomalies per event type: z-score of each hour's
    * count against that type's own mean/stddev, flagged at |z| ≥ 2 —
    * the monitoring query a pipeline runs over its own event firehose.
    * Two stacked aggregations (hourly counts, then per-type moments
    * as a window over the small hourly table) — the raw events are
    * scanned once; everything after the first shuffle is
    * hours × types sized. */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    hourly
      .withColumn("mu", avg(col("n_events")).over(w))
      .withColumn("sd", stddev_samp(col("n_events")).over(w))
      .filter(col("sd") > 0)
      // filter on the UNROUNDED z and round only in the final select,
      // mirroring the oracle's WHERE/SELECT split — filtering on the
      // rounded value would pass raw |z| ∈ [1.99995, 2) rows the
      // oracle drops
      .withColumn("z_raw", (col("n_events") - col("mu")) / col("sd"))
      .filter(abs(col("z_raw")) >= 2.0)
      .select(col("hour"), col("event_type"), col("n_events"),
        round(col("z_raw"), 4).as("z"))
  }

  /** Suppliers per region/nation with balance totals — the
    * supplier-side star join (supplier ⋈ nation ⋈ region, both
    * dimensions broadcast: supplier is the fact side here and must
    * never shuffle to meet a 25-row nation). Covers the one testdata
    * table the rest of the catalog doesn't touch. */
  def supplierByRegion(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_bal"),
        davg(col("s_acctbal")).as("avg_bal"),
        max(col("s_acctbal")).as("max_bal"))

  /** Conversion funnel view → click → purchase, ordered by event
    * time: a user advances a stage only with a LATER event of the
    * next type. Three per-user min-aggregates chained by user_id —
    * every join and aggregate reuses the same user-hash
    * partitioning, and stage tables shrink monotonically. Each stage
    * table feeds TWO consumers (the next stage and its own funnel
    * count), so v and c are persisted — without the barrier Catalyst
    * re-expands the chain per consumer and the event stream is
    * scanned six times instead of once per stage (each stage's scan
    * is event_type-pruned at the reader). The cached tables are
    * per-user scalars, tiny at any event volume. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def stageMin(t: String) = ev.filter(col("event_type") === t)
    val v = stageMin("view").groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_view"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c = stageMin("click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = stageMin("purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
  }

  /** Weekly retention cohorts: users grouped by the week of their
    * first event; n_users = distinct users from that cohort active
    * in cohort-week + offset. One scan, user-keyed first-week agg,
    * join back on user_id, then a small (cohort, offset) aggregate.
    * Offsets are exact (both sides week-truncated ⇒ day diff is a
    * multiple of 7). */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
    val first = w.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    w.join(first, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Time-series gap fill: daily order revenue re-gridded onto a
    * dense date spine (min..max order date), with zero-fill and
    * last-observation-carried-forward columns — the resample step
    * every downstream time-series consumer (drift monitors, EWMA,
    * forecasting) assumes. The spine comes from ONE 1-row min/max
    * aggregate exploded into dates — the only driver-sized object;
    * the daily aggregate is a single scan with map-side partial agg,
    * and the spine join broadcasts the daily table never the spine?
    * No: the spine (thousands of rows for years of data) LEFT-joins
    * the daily aggregate — both tiny relative to the fact table, so
    * the join cost is noise; the fact table is touched exactly once.
    * LOCF is a running `last(ignoreNulls)` window ordered by day —
    * a single-partition window here, fine because the grid is
    * days-not-rows sized (decades ≈ 10⁴ rows); re-grid by (series,
    * day) and partition the window by series when there are many
    * series. Revenue uses the decimal-plane sum so the fill values
    * are order-independent exact. */
  def gapFillDaily(spark: SparkSession, dir: String): DataFrame =
    // MEMOIZED per dir: ELEVEN time-series consumers (CUSUM, ACF,
    // Holt, seasonal, conformal, backtest, EWMA, rolling stats …)
    // ride this day grid — one orders scan total, not one each
    graft.ext.Memo.cached(gapDailyCache, dir, spark) {
    // persisted: the spine bounds derive from the daily aggregate
    // itself (its min/max day == the fact table's), so the fact
    // table really is scanned exactly once — without the barrier the
    // bounds consumer would re-expand the aggregate subtree into a
    // second orders scan
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        col("revenue").isNull.as("is_gap"),
        coalesce(col("revenue"), lit(0.0)).as("revenue_filled"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        last(col("revenue"), ignoreNulls = true).over(w).as("revenue_locf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the outer frame NOW so the inner daily persist can
    // be released inside the builder — otherwise it would outlive the
    // memo entry (clearCaches only sees the cache value) and leak one
    // persisted plan per clearCaches+rebuild cycle. The day grid is
    // ~10^4 rows; the count is the same scan the first consumer would
    // have paid anyway.
    out.count()
    daily.unpersist(blocking = false)
    out
  }

  /** CUSUM changepoint detection (q234) over the gap-filled daily
    * revenue: one-sided cumulative sums C⁺ₜ = max(0, C⁺ₜ₋₁ + (xₜ−μ))
    * and C⁻ₜ (downward) with the day each peaks — the sequential-
    * analysis shift detector ([[rollingZscore]] flags single spikes;
    * CUSUM accumulates small sustained shifts). The recursion is
    * genuinely sequential, so it runs as ONE array fold over the
    * bounded day grid (10⁴ rows for decades, the q172 altitude —
    * the corpus was already reduced by gapFillDaily's single scan);
    * the fold order is the array order on both engines, so the
    * double chain is bit-identical and hash-gates. Argmax keeps the
    * FIRST peak day (strict-greater update ↔ first-row-at-max in the
    * oracle's recursive CTE). */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val base = gapFillDaily(spark, dir).agg(
      // scale-ok: day-grid bounded (≤ ~10⁴ elements for decades of
      // days — the corpus was already reduced by gapFillDaily's scan)
      array_sort(collect_list(struct(col("day"),
        col("revenue_filled")))).as("s"),
      sum(col("revenue_filled").cast("decimal(28,6)")).as("tot"),
      count(lit(1)).as("n_days"))
      .select(col("s"), col("n_days"),
        (col("tot").cast("double") / col("n_days").cast("double")).as("mu"))
    val zero = struct(lit(0.0).as("cu"), lit(-1.0).as("maxu"),
      lit(0).as("argu"), lit(0.0).as("cd"), lit(-1.0).as("maxd"),
      lit(0).as("argd"), lit(0).as("idx"))
    val folded = base.select(col("s"), col("n_days"), col("mu"),
      aggregate(col("s"), zero, (acc, e) => {
        val x = e.getField("revenue_filled")
        val cu = greatest(lit(0.0), acc.getField("cu") + (x - col("mu")))
        val cd = greatest(lit(0.0), acc.getField("cd") + (col("mu") - x))
        val idx = acc.getField("idx") + 1
        struct(cu.as("cu"),
          when(cu > acc.getField("maxu"), cu)
            .otherwise(acc.getField("maxu")).as("maxu"),
          when(cu > acc.getField("maxu"), idx)
            .otherwise(acc.getField("argu")).as("argu"),
          cd.as("cd"),
          when(cd > acc.getField("maxd"), cd)
            .otherwise(acc.getField("maxd")).as("maxd"),
          when(cd > acc.getField("maxd"), idx)
            .otherwise(acc.getField("argd")).as("argd"),
          idx.as("idx"))
      }).as("f"))
    folded.select(col("n_days"), round(col("mu"), 6).as("mean_rev"),
      round(col("f.maxu"), 6).as("max_cusum_up"),
      element_at(col("s"), col("f.argu")).getField("day").as("day_up"),
      round(col("f.maxd"), 6).as("max_cusum_down"),
      element_at(col("s"), col("f.argd")).getField("day").as("day_down"))
  }

  /** Welch's unequal-variance t-test (q235): is weekend daily
    * revenue a different population than weekday — the means-test
    * companion to [[abTest]]'s proportions z. Group moments come
    * from DECIMAL-exact sums (values and their exact DECIMAL
    * squares), so mean/variance/t/df are one fixed IEEE chain over
    * exact aggregates; the Welch–Satterthwaite df is reported so the
    * reader can look up the critical value. Runs on the bounded day
    * grid ([[gapFillDaily]]'s one fact scan). */
  def welchTTest(spark: SparkSession, dir: String): DataFrame = {
    // round-3 integer surrogates (the q195 recipe): milli-unit longs
    // whose sums and DECIMAL(19,0) product sums are exact on BOTH
    // engines (a DECIMAL(18,6) square overflows DuckDB's int64 path)
    val xi = round(col("revenue_filled") * 1000.0, 0).cast("long")
    def d19(c: Column) = c.cast("decimal(19,0)")
    val wkend = dayofweek(col("day")).isin(1, 7)
    val cells = gapFillDaily(spark, dir).agg(
      sum(when(!wkend, 1L).otherwise(0L)).as("n0"),
      sum(when(!wkend, xi)).as("s0"),
      sum(when(!wkend, d19(xi) * d19(xi))).as("q0"),
      sum(when(wkend, 1L).otherwise(0L)).as("n1"),
      sum(when(wkend, xi)).as("s1"),
      sum(when(wkend, d19(xi) * d19(xi))).as("q1"))
    def m(s: String, n: String) =
      (col(s).cast("double") / 1e3) / col(n).cast("double")
    def v(q: String, n: String, mean: Column) =
      (col(q).cast("double") / 1e6 - col(n).cast("double") * mean * mean) /
        (col(n).cast("double") - 1.0)
    val m0 = m("s0", "n0"); val m1 = m("s1", "n1")
    val v0 = v("q0", "n0", m0); val v1 = v("q1", "n1", m1)
    val se0 = v0 / col("n0").cast("double")
    val se1 = v1 / col("n1").cast("double")
    cells.select(col("n0").as("n_weekday"), col("n1").as("n_weekend"),
      round(m0, 6).as("mean_weekday"), round(m1, 6).as("mean_weekend"),
      round((m1 - m0) / sqrt(se1 + se0), 6).as("t"),
      round((se1 + se0) * (se1 + se0) /
        (se1 * se1 / (col("n1").cast("double") - 1.0)
          + se0 * se0 / (col("n0").cast("double") - 1.0)), 6).as("df"))
  }

  /** Exact-size permutation test (q273) — the distribution-free
    * companion to [[welchTTest]]: is the BUILDING-vs-AUTOMOBILE gap
    * in mean order value real, or within what label shuffling alone
    * produces? Each of `reps` pseudo-permutations ranks rows by a
    * deterministic md5(rep:key) uniform and relabels the first n_a
    * ranks as group A — an exact-size random partition, reproducible
    * in any engine (no RNG stream, no partitioning dependence). The
    * per-rep statistic (mean A − mean B) folds from DECIMAL-exact
    * sums and snaps to round-6 before the ≥ comparison, so the
    * p-value — (1 + #{|null| ≥ |observed|}) / (reps + 1), the
    * add-one Monte-Carlo form — is engine-identical. Scale shape:
    * the rep axis explodes inside the scan (reps × n rows, embar-
    * rassingly parallel), the only shuffle is the per-rep rank
    * window (reps independent partitions), and each rep collapses
    * map-side to one row before the final fold. */
  def permutationTest(spark: SparkSession, dir: String, reps: Int = 64,
      segA: String = "BUILDING", segB: String = "AUTOMOBILE"): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin(segA, segB))
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("c_mktsegment") === segA).as("is_a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = base.agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        dsum(when(col("is_a"), col("o_totalprice"))).as("s_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
        dsum(when(!col("is_a"), col("o_totalprice"))).as("s_b"))
      .select(col("n_a"), col("n_b"),
        round(col("s_a") / col("n_a").cast("double")
          - col("s_b") / col("n_b").cast("double"), 6).as("obs_diff"))
    val u = conv(substring(md5(concat_ws(":", col("rep").cast("string"),
      col("o_orderkey").cast("string"))), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy(col("rep")).orderBy(col("u"), col("o_orderkey"))
    val nulls = base
      .select(col("o_orderkey"), col("o_totalprice"),
        explode(sequence(lit(1), lit(reps))).as("rep"))
      .withColumn("u", u)
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(obs))
      .groupBy(col("rep"), col("n_a"), col("n_b"), col("obs_diff"))
      .agg(dsum(when(col("rk") <= col("n_a"), col("o_totalprice"))).as("sa"),
        dsum(when(col("rk") > col("n_a"), col("o_totalprice"))).as("sb"))
      .select(col("n_a"), col("n_b"), col("obs_diff"),
        round(col("sa") / col("n_a").cast("double")
          - col("sb") / col("n_b").cast("double"), 6).as("stat"))
    nulls
      .groupBy(col("n_a"), col("n_b"), col("obs_diff"))
      .agg(count(lit(1)).as("n_reps"),
        sum(when(abs(col("stat")) >= abs(col("obs_diff")), 1L)
          .otherwise(0L)).as("n_ge"),
        dsum(abs(col("stat"))).as("sabs"),
        max(abs(col("stat"))).as("null_max_abs"))
      .select(col("n_a"), col("n_b"), col("obs_diff"), col("n_reps"),
        col("n_ge"),
        round((col("n_ge").cast("double") + 1.0)
          / (col("n_reps").cast("double") + 1.0), 6).as("p_value"),
        round(col("sabs") / col("n_reps").cast("double"), 6)
          .as("null_mean_abs"),
        round(col("null_max_abs"), 6).as("null_max_abs"))
  }

  /** Autocorrelation function (q236) of the gap-filled daily revenue
    * at lags 1..14 — the periodicity diagnostic ([[seasonalTrend]]
    * assumes a weekly cycle; the ACF shows whether one exists, as a
    * lag-7 spike). r_k = Σdₜd₍ₜ₊ₖ₎ / Σdₜ² over mean deviations. The
    * deviations are doubles, so they pass through round-3 integer
    * surrogates (the q195 recipe) and every sum is an exact DECIMAL
    * product sum — order-free. All 14 lag columns come from ONE
    * window pass over the bounded day grid, folded in ONE aggregate,
    * reshaped plan-side. */
  def acf(spark: SparkSession, dir: String, maxLag: Int = 14)
      : DataFrame = {
    val daily = gapFillDaily(spark, dir)
    val mu = daily.agg((sum(col("revenue_filled").cast("decimal(28,6)"))
      .cast("double") / count(lit(1)).cast("double")).as("mu"))
    val w = Window.orderBy(col("day"))
    val withD = daily.join(broadcast(mu))
      .select(col("day"),
        round((col("revenue_filled") - col("mu")) * 1000.0, 0)
          .cast("long").as("di"))
    val lagged = withD.select(col("di") +:
      (1 to maxLag).map(k => lag(col("di"), k).over(w).as(s"d$k")): _*)
    def dec(c: Column) = c.cast("decimal(19,0)")
    val aggs = Seq(sum(dec(col("di")) * dec(col("di"))).as("den")) ++
      (1 to maxLag).map(k =>
        sum(when(col(s"d$k").isNotNull, dec(col("di")) * dec(col(s"d$k"))))
          .as(s"num$k"))
    val wide = lagged.agg(aggs.head, aggs.tail: _*)
    val rows = (1 to maxLag).map(k =>
      struct(lit(k).as("lag"),
        round(col(s"num$k").cast("double") / col("den").cast("double"), 6)
          .as("acf")))
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Exponentially-weighted moving average over the gap-filled daily
    * revenue: a FIXED 8-day half-life-1 kernel (weights 0.5^k,
    * k=0..7) written as one explicit left-associated expression —
    * lag() terms added in a fixed order — so the arithmetic is
    * bit-identical on any engine that evaluates IEEE doubles
    * left-to-right (the hash gate depends on this; a true recursive
    * EWMA or a floating `sum() over ()` would be
    * summation-order-dependent). Only rows with a full 8-day window
    * are emitted, making the kernel mass a compile-time constant
    * (255/128) rather than a data-dependent denominator. Windows are
    * over the DAY grid (10⁴ rows for decades), not the fact table —
    * the heavy lifting stays in gapFillDaily's one scan. */
  def ewmaDaily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day"))
    val x = (k: Int) =>
      if (k == 0) col("revenue_filled")
      else lag(col("revenue_filled"), k).over(w) * lit(math.pow(0.5, k))
    val kernel = (1 to 7).foldLeft(x(0))((acc, k) => acc + x(k))
    gapFillDaily(spark, dir)
      .select(col("day"), col("revenue_filled"),
        (kernel / lit(255.0 / 128.0)).as("ewma8"),
        row_number().over(w).as("rn"))
      .filter(col("rn") >= 8)
      // no round(): both sides compute the identical IEEE double, and
      // a round() could only INTRODUCE a half-way-mode discrepancy
      .select(col("day"), col("revenue_filled"), col("ewma8"))
  }

  /** Holt linear-trend forecast backtest (q276) — double exponential
    * smoothing (level + trend, α = β = 0.5) over the gap-filled
    * daily revenue, trained on all but the last `horizon` days and
    * scored against them: the trend-aware upgrade of [[ewmaDaily]]
    * and the model-based companion to [[seasonalNaiveBacktest]].
    * The recursion (lₜ = ½xₜ + ½(l+b); bₜ = ½(lₜ−l) + ½b,
    * initialized l₁ = x₁, b₁ = x₂−x₁) is inherently sequential, so
    * it folds ONCE over the collected day grid (bounded by the date
    * RANGE, not data size — the q234 CUSUM shape; the corpus itself
    * is still reduced distributed by [[gapFillDaily]]'s one scan).
    * α = β = ½ means every smoothing step is exact IEEE halving of
    * the same operands in the same order, so the fold — and the
    * h-step forecasts level + h·trend — reproduce bit-for-bit in
    * any engine (the oracle runs the identical recursion as a
    * recursive CTE). */
  def holtForecast(spark: SparkSession, dir: String,
      horizon: Int = 7): DataFrame = {
    val w = Window.orderBy(col("day"))
    val daily = gapFillDaily(spark, dir)
      .select(col("day"), col("revenue_filled"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = daily.agg(max(col("rn")).as("n_total"))
    val folded = daily.crossJoin(broadcast(bounds))
      .filter(col("rn") <= col("n_total") - horizon)
      // scale-ok: day-grid bounded (one element per calendar day)
      .agg(array_sort(collect_list(struct(col("rn"), col("revenue_filled"))))
        .as("s"), count(lit(1)).as("n_train"))
    val x1 = element_at(col("s"), 1).getField("revenue_filled")
    val x2 = element_at(col("s"), 2).getField("revenue_filled")
    val zero = struct(x1.as("level"), (x2 - x1).as("trend"))
    val fit = folded.select(col("n_train"),
      aggregate(slice(col("s"), lit(2), size(col("s")) - 1), zero,
        (acc, e) => {
          val x = e.getField("revenue_filled")
          val l = acc.getField("level")
          val b = acc.getField("trend")
          val l2 = lit(0.5) * x + lit(0.5) * (l + b)
          struct(l2.as("level"),
            (lit(0.5) * (l2 - l) + lit(0.5) * b).as("trend"))
        }).as("f"))
    fit.select(col("n_train"), col("f.level").as("level"),
        col("f.trend").as("trend"),
        explode(sequence(lit(1), lit(horizon))).as("h"))
      .join(daily, col("rn") === col("n_train") + col("h"))
      .select(col("h").cast("int").as("h"), col("day"),
        round(col("level") + col("h").cast("double") * col("trend"), 6)
          .as("forecast"),
        col("revenue_filled").as("actual"),
        round(abs((col("level") + col("h").cast("double") * col("trend"))
          - col("revenue_filled")), 6).as("abs_err"))
  }

  /** Rolling correlation (q283) — 28-day trailing Pearson between
    * daily revenue and daily order count over the gap-filled grid:
    * the co-movement monitor ("is volume driving revenue this
    * month?") that pairs with [[rollingZscore]]'s single-series
    * view. ONE window pass computes all six sufficient statistics
    * (n, Σx, Σy, Σx², Σy², Σxy) over the same frame — exact integer
    * milli-surrogates through DECIMAL(19,0) products, so every
    * window sum is order-free — and the correlation is a fixed IEEE
    * chain per row. Zero-variance windows (a flat series) guard to
    * NULL (ANSI sqrt/division). The window runs on the bounded day
    * grid, never the fact table. */
  def rollingCorr(spark: SparkSession, dir: String,
      win: Int = 28): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val w = Window.orderBy(col("day")).rowsBetween(-(win - 1), 0)
    val s = gapFillDaily(spark, dir)
      .select(col("day"),
        round(col("revenue_filled") * 1000.0, 0).cast("long").as("xi"),
        col("n_orders").as("yi"))
      .select(col("day"),
        count(lit(1)).over(w).as("n"),
        sum(col("xi")).over(w).as("sx"),
        sum(col("yi")).over(w).as("sy"),
        sum(d19(col("xi")) * d19(col("xi"))).over(w).as("sxx"),
        sum(d19(col("yi")) * d19(col("yi"))).over(w).as("syy"),
        sum(d19(col("xi")) * d19(col("yi"))).over(w).as("sxy"),
        row_number().over(Window.orderBy(col("day"))).as("rn"))
    def dd(c: String) = col(c).cast("double")
    val n = dd("n")
    val num = n * dd("sxy") - dd("sx") * dd("sy")
    val vx = n * dd("sxx") - dd("sx") * dd("sx")
    val vy = n * dd("syy") - dd("sy") * dd("sy")
    s.filter(col("rn") >= win)
      .select(col("day"),
        when(vx > 0.0 && vy > 0.0, round(num / sqrt(vx * vy), 6))
          .as("corr"))
  }

  /** Cross-correlation lag finder (q284) — at what lag does the
    * view series lead the purchase series? Pearson between hourly
    * 'view' and 'purchase' counts with purchase shifted by each lag
    * in ±`maxLag` hours — the causal-delay probe behind attribution
    * windows and cache-warming decisions. The hourly grid is built
    * once (zero-filled spine, one fact scan), each lag is an
    * rn-offset self-join ON THE GRID (25 lags × ~hours rows — tiny),
    * and per-lag moments are exact integer sums, so every corr is a
    * fixed IEEE chain. */
  def xcorrLag(spark: SparkSession, dir: String,
      maxLag: Int = 12): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("xv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("yv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = hourly.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
    val g = spine.join(hourly, Seq("h"), "left")
      .select(col("h"), coalesce(col("xv"), lit(0L)).as("xv"),
        coalesce(col("yv"), lit(0L)).as("yv"))
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lags = spark.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val joined = g.select(col("rn"), col("xv")).crossJoin(broadcast(lags))
      .join(g.select(col("rn").as("rn2"), col("yv")),
        col("rn2") === col("rn") + col("lag"))
    val agg = joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("xv")).as("sx"),
        sum(col("yv")).as("sy"),
        sum(col("xv") * col("xv")).as("sxx"),
        sum(col("yv") * col("yv")).as("syy"),
        sum(col("xv") * col("yv")).as("sxy"))
    def dd(c: String) = col(c).cast("double")
    val n = dd("n")
    val num = n * dd("sxy") - dd("sx") * dd("sy")
    val vx = n * dd("sxx") - dd("sx") * dd("sx")
    val vy = n * dd("syy") - dd("sy") * dd("sy")
    agg.select(col("lag"), col("n"),
      when(vx > 0.0 && vy > 0.0, round(num / sqrt(vx * vy), 6))
        .as("corr"))
  }

  /** Event study (q285) — average event value by day offset around
    * each user's FIRST purchase (±`k` days): the before/after view
    * behind "did conversion change engagement?", aligned per user
    * so calendar effects cancel. One per-user min-agg finds the
    * anchor, one join tags offsets, one bounded agg (2k+1 rows)
    * folds DECIMAL-exact value sums. The anchor table is user-sized
    * — it joins shuffle-keyed, never broadcast-forced, so the plan
    * survives a 100× user count. */
  def eventStudy(spark: SparkSession, dir: String, k: Int = 7): DataFrame = {
    val first = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    Tables.events(spark, dir)
      .join(first, Seq("user_id"))
      .select(col("user_id"), col("value"),
        datediff(to_date(col("ts")), to_date(col("t0"))).as("day_offset"))
      .filter(col("day_offset").between(-k, k))
      .groupBy(col("day_offset"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        count(col("value")).as("n_valued"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sv"))
      .select(col("day_offset"), col("n_events"), col("n_users"),
        when(col("n_valued") > 0,
          round(col("sv") / col("n_valued").cast("double"), 6))
          .as("mean_value"))
  }

  /** Churn feature table (q287) — the per-user ML feature
    * materialization (activity counts, monetary sum, recency,
    * tenure, active label) a training pipeline writes before model
    * fitting: the [[rfmSegments]] raw material, un-bucketed, plus
    * the label. ONE fact scan: every feature is an aggregate of the
    * same per-user groupBy (map-side partials), and the global
    * "now" anchor is the max over the per-user maxima — derived
    * from the aggregate itself, so no second scan. Monetary folds
    * DECIMAL-exact; dates are exact; the whole row hash-gates. */
  def featureTable(spark: SparkSession, dir: String,
      activeDays: Int = 7): DataFrame = {
    val per = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sv"),
        min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = per.agg(max(col("last_day")).as("now_day"))
    per.crossJoin(broadcast(mx))
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        col("n_errors"), round(col("sv"), 6).as("total_value"),
        datediff(col("now_day"), col("last_day")).as("recency_days"),
        datediff(col("last_day"), col("first_day")).as("tenure_days"),
        (datediff(col("now_day"), col("last_day")) < activeDays)
          .as("is_active"))
  }

  /** Fixed-frequency periodogram (q288) — spectral power of the
    * mean-centered daily revenue at candidate periods (7/14/30
    * days): the "which cycle is real" companion to [[acf]] (the ACF
    * shows a correlation at lag 7; the periodogram ranks the weekly
    * against the monthly hypothesis by amplitude). For each period
    * P: C = Σ cos(2πt/P)·dₜ, S = Σ sin(2πt/P)·dₜ, amplitude =
    * 2√(C²+S²)/n. Determinism: deviations are exact milli-unit
    * longs, each trig factor snaps to round-9 BEFORE the product
    * (engine libm may differ in the last ulp), each term rounds to
    * an integer surrogate, so both sums are exact in any order.
    * The grid is bounded by the date range; the corpus reduces in
    * [[gapFillDaily]]'s one scan. */
  def periodogram(spark: SparkSession, dir: String,
      periods: Seq[Int] = Seq(7, 14, 30)): DataFrame = {
    val w = Window.orderBy(col("day"))
    val daily = gapFillDaily(spark, dir)
      .select(col("day"), col("revenue_filled"))
      .withColumn("t", (row_number().over(w) - 1).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mu = daily.agg((sum(col("revenue_filled").cast("decimal(28,6)"))
      .cast("double") / count(lit(1)).cast("double")).as("mu"))
    val pdf = periods.foldLeft(
      Seq.empty[org.apache.spark.sql.Column]) { (acc, p) =>
        acc :+ lit(p)
      }
    val dev = daily.crossJoin(broadcast(mu))
      .select(col("t"),
        round((col("revenue_filled") - col("mu")) * 1000.0, 0)
          .cast("long").as("di"),
        explode(array(pdf: _*)).as("period"))
    val arg = (lit(6.283185307179586) * col("t").cast("double")) /
      col("period").cast("double")
    val terms = dev.select(col("period"), col("di"),
      round(cos(arg), 9).as("c9"), round(sin(arg), 9).as("s9"))
    val agg = terms.groupBy(col("period"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("c9") * col("di").cast("double"), 0).cast("long"))
          .as("sc"),
        sum(round(col("s9") * col("di").cast("double"), 0).cast("long"))
          .as("ss"))
    val cd = col("sc").cast("double") / 1e3
    val sd = col("ss").cast("double") / 1e3
    agg.select(col("period"), col("n"),
      round(lit(2.0) * sqrt(cd * cd + sd * sd)
        / col("n").cast("double"), 6).as("amplitude"))
  }

  /** Zone-map pruning audit (q289) — how much would data skipping
    * save under two physical layouts? Files are simulated as (a)
    * month partitions of o_orderdate and (b) equal-width
    * o_totalprice range buckets; each file's zone map (min/max
    * price) is tested against a fixed predicate set, and the audit
    * reports files pruned and rows scanned per (layout, predicate).
    * This is the quantified version of the Z-order argument (q121):
    * a price predicate prunes ~nothing under date layout (price is
    * uniform within every month) and nearly everything under price
    * layout. ONE fact scan builds the joint (month-file,
    * price-file) grid; both layouts' zone maps and the predicate
    * cross-product run on that tiny grid. */
  def zonemapAudit(spark: SparkSession, dir: String,
      nFiles: Int = 48): DataFrame = {
    import spark.implicits._
    val bounds = Tables.orders(spark, dir)
      .agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
    val grid = Tables.orders(spark, dir)
      .crossJoin(broadcast(bounds))
      .groupBy(
        ((year(col("o_orderdate")) - 1992) * 12 + month(col("o_orderdate"))
          - 1).cast("int").as("f_month"),
        least(lit(nFiles - 1), floor((col("o_totalprice") - col("mn"))
          / (col("mx") - col("mn")) * nFiles).cast("int")).as("f_price"))
      .agg(min(col("o_totalprice")).as("zmn"),
        max(col("o_totalprice")).as("zmx"), count(lit(1)).as("nr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def zones(key: String, layout: String) =
      grid.groupBy(col(key).as("file"))
        .agg(min(col("zmn")).as("zmin"), max(col("zmx")).as("zmax"),
          sum(col("nr")).as("n_rows"))
        .withColumn("layout", lit(layout))
    val zm = zones("f_month", "by_month")
      .unionByName(zones("f_price", "by_price"))
    val preds = Seq((1, 0.0, 25000.0), (2, 25000.0, 50000.0),
      (3, 50000.0, 100000.0), (4, 100000.0, 200000.0),
      (5, 200000.0, 500000.0)).toDF("pred_id", "lo", "hi")
    zm.crossJoin(broadcast(preds))
      .withColumn("pruned", col("zmax") < col("lo") || col("zmin") > col("hi"))
      .groupBy(col("layout"), col("pred_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
        sum(when(!col("pruned"), col("n_rows")).otherwise(0L))
          .as("rows_scanned"))
      .select(col("layout"), col("pred_id"), col("lo"), col("hi"),
        col("n_files"), col("n_pruned"),
        round(col("n_pruned").cast("double")
          / col("n_files").cast("double"), 6).as("prune_rate"),
        col("rows_scanned"))
  }

  /** Inter-arrival time distribution per event type: log2-bucketed
    * histogram of the gap (in integer microseconds) between a user's
    * consecutive events — the traffic-model view (burst vs poisson
    * vs dead air) that sizes streaming watermarks and session gaps.
    * One user-partitioned lag window (the sessionization shuffle),
    * then a tiny (type, bucket) agg; gaps and bucket ids are exact
    * integers (floor(log2) via the bit length of the µs gap), so the
    * histogram hash-gates with no float exposure. */
  def interArrival(spark: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .withColumn("gap_us", us - lag(us, 1).over(w))
      .filter(col("gap_us").isNotNull && col("gap_us") >= 0)
      // floor(log2(gap+1)) as the bit length minus one — bin() string
      // length, pure integer semantics. NOT float log2: Spark lowers
      // log2 to log(x)/log(2), which is off-by-a-ulp at exact powers
      // of two — precisely the bucket boundaries
      .withColumn("bucket",
        (length(bin(col("gap_us") + 1)) - 1).cast("int"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
  }

  /** Touch attribution: for every purchase, credit the user's FIRST
    * and LAST preceding engagement (view/click) — the two classic
    * marketing-attribution models, resolved in one user-partitioned
    * window pass (running first/last over the engagement prefix; no
    * self-join, no per-purchase scan). Emits per (first_touch,
    * last_touch) pair: purchases and decimal-exact value — the
    * attribution matrix. Purchases with no preceding engagement
    * surface as the (null, null) row rather than vanishing. */
  def touchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col("event_type").isin("view", "click"),
      col("event_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"),
        col("event_id"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("attributed_value"))
  }

  /** Conversion latency: per converting user, the µs gap between
    * first view and first subsequent purchase, summarized as exact
    * interpolated percentiles (p50/p90/p99) plus the conversion
    * count — the "how long does the funnel take" companion to
    * [[funnelStages]]' "how many make it". Two per-user min-aggs on
    * the same user_id partitioning; the percentile runs over the
    * CONVERTING-USERS table. Gaps are integer microseconds. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts"))
        .as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val lat = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("us") > col("t_view"))
      .groupBy(col("user_id"))
      .agg((min(col("us")) - first(col("t_view"))).as("lat_us"))
    lat.agg(count(lit(1)).as("n_converted"),
      // scale-ok: oracle artifact — exact interpolated percentile for
      // DuckDB bit-identity; at scale swap to approx_percentile (the
      // q319 production-twin contract)
      round(expr("percentile(lat_us, 0.5)"), 4).as("p50_us"),
      round(expr("percentile(lat_us, 0.9)"), 4).as("p90_us"),
      round(expr("percentile(lat_us, 0.99)"), 4).as("p99_us"))
  }

  /** Market-basket association rules over order lineitems: for part
    * pairs co-occurring in an order, support, directional confidence
    * and lift — the classic retail co-occurrence mining shape. The
    * pair join is WITHIN-ORDER (self-join on l_orderkey over the
    * deduped (order, part) table, a < b), so candidate work is
    * Σ items_per_order² — bounded by basket size, never corpus
    * quadratic, the same bounded-blocks contract as the linkage and
    * medoid families. Counts are exact longs; confidence and lift
    * are fixed IEEE chains per pair; top pairs by (n_ab desc, a, b).
    * The deduped item table is persisted for its three consumers
    * (two join legs + the per-part margins). */
  def basketLift(spark: SparkSession, dir: String, topN: Int = 25)
      : DataFrame = {
    val items = orderItems(spark, dir)
    val nOrders = Tables.orders(spark, dir).agg(count(lit(1)).as("n_orders"))
    val margins = items.groupBy(col("part")).agg(count(lit(1)).as("n_part"))
    val pairs = itemPairs(spark, dir)
    pairs
      .join(margins.select(col("part").as("part_a"),
        col("n_part").as("n_a")), "part_a")
      .join(margins.select(col("part").as("part_b"),
        col("n_part").as("n_b")), "part_b")
      .join(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_ab").cast("double") * col("n_orders").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
      .limit(topN)
  }

  /** Item-item collaborative filtering (q222): top-N neighbors per
    * part by co-purchase cosine n_ab/√(n_a·n_b) — the classic
    * "customers also bought" neighborhood model ([[basketLift]]
    * answers "is this pair surprising"; this ranks EVERY item's best
    * peers for a recommender). Pairs come from the same per-order
    * distinct-items self-join (bounded by basket size, never
    * catalog²), emitted in BOTH directions so each item ranks its
    * neighbors; ranking is on round-6 cosine with part-id tiebreak
    * (raw-double ordering would be tie-order sensitive), one window
    * over the pair table partitioned by item. */
  def itemCf(spark: SparkSession, dir: String, topN: Int = 5)
      : DataFrame = {
    val items = orderItems(spark, dir)
    val margins = items.groupBy(col("part")).agg(count(lit(1)).as("n_part"))
    // memoized + persisted: the both-directions union reads the pair
    // aggregate twice, and q280's rec-eval rides the same table
    val undirected = itemPairs(spark, dir)
    val directed = undirected.unionByName(undirected.select(
      col("part_b").as("part_a"), col("part_a").as("part_b"), col("n_ab")))
    val w = Window.partitionBy(col("part_a"))
      .orderBy(col("cos").desc, col("part_b"))
    directed
      .join(margins.select(col("part").as("part_a"),
        col("n_part").as("n_a")), "part_a")
      .join(margins.select(col("part").as("part_b"),
        col("n_part").as("n_b")), "part_b")
      .select(col("part_a"), col("part_b"), col("n_ab"),
        round(col("n_ab").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
  }

  /** Split conformal prediction interval (q294) — distribution-free
    * forecast bands (Vovk; Lei et al. 2018) around the seasonal-
    * naive predictor: calibrate q̂ as the ⌈(n+1)(1−α)⌉-th smallest
    * absolute residual on the calibration window, then report the
    * EMPIRICAL coverage of pred ± q̂ over the held-out tail — the
    * honest "are my error bars real" audit that replaces Gaussian
    * assumptions with order statistics. Everything is exact: the
    * day grid is bounded ([[gapFillDaily]]'s one fact scan),
    * residual ranking ties break on day, and the quantile index is
    * integer arithmetic on both engines. */
  def conformalInterval(spark: SparkSession, dir: String,
      horizon: Int = 14, alpha: Double = 0.1): DataFrame = {
    val wDay = Window.orderBy(col("day"))
    val base = gapFillDaily(spark, dir)
      .select(col("day"), col("revenue_filled"))
      .withColumn("pred", lag(col("revenue_filled"), 7).over(wDay))
      .withColumn("rn", row_number().over(wDay))
      .filter(col("pred").isNotNull)
      .withColumn("res", abs(col("revenue_filled") - col("pred")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = base.agg(max(col("rn")).as("n_total"))
    val cal = base.crossJoin(broadcast(bounds))
      .filter(col("rn") <= col("n_total") - horizon)
    val qhat = cal
      .withColumn("rk", row_number().over(Window
        .orderBy(col("res"), col("day"))))
      .crossJoin(broadcast(cal.agg(count(lit(1)).as("n_cal"))))
      .filter(col("rk") ===
        least(ceil((col("n_cal") + 1).cast("double") * lit(1.0 - alpha))
          .cast("long"), col("n_cal")))
      .select(col("n_cal"), col("res").as("q_hat"))
    base.crossJoin(broadcast(bounds))
      .filter(col("rn") > col("n_total") - horizon)
      .crossJoin(broadcast(qhat))
      .groupBy(col("n_cal"), col("q_hat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("res") <= col("q_hat"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("n_cal"), round(col("q_hat"), 6).as("q_hat"),
        col("n_test"), col("n_covered"),
        round(col("n_covered").cast("double")
          / col("n_test").cast("double"), 6).as("coverage"))
  }

  /** Huber robust regression (q298) — quantity-on-discount refit by
    * IRLS (3 unrolled iterations): rows with |residual| > c get
    * weight c/|r| (Huber 1964), so the outliers that steer OLS
    * ([[olsByBrand]]'s estimator) lose their leverage, and the
    * audit reports the coefficient path plus how many rows each
    * pass downweighted. The distributed shape IS the point: each
    * iteration is one aggregate over the persisted (x, y)
    * projection to five weighted sufficient statistics (map-side
    * partials), the fit is a 1-row collect (the bounded driver-
    * scalar precedent), and the next pass embeds those scalars as
    * literals — at 100 TB that is 4 scans of a 2-column cached
    * projection, never a per-row model table. Determinism: x/y are
    * exact integers, weights snap to round-6 DECIMAL before the
    * sums (order-free), and each fit is a fixed IEEE chain — the
    * oracle recomputes the identical chain with zero literals, and
    * the collected Spark scalars are bit-equal to the SQL-computed
    * ones because both derive from exact decimal aggregates. */
  def huberRegression(spark: SparkSession, dir: String,
      iters: Int = 3, c: Double = 10.0): DataFrame = {
    import spark.implicits._
    def d19(cc: Column) = cc.cast("decimal(19,0)")
    val xy = Tables.lineitem(spark, dir)
      .select(round(col("l_discount") * 100.0, 0).cast("long").as("x"),
        col("l_quantity").cast("long").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def fit(n: Double, sx: Double, sy: Double, sxx: Double,
        sxy: Double): (Double, Double) = {
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      (a, b)
    }
    val s0 = xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(d19(col("x")) * d19(col("x"))).as("sxx"),
      sum(d19(col("x")) * d19(col("y"))).as("sxy")).head()
    var (a, b) = fit(s0.getLong(0).toDouble, s0.getLong(1).toDouble,
      s0.getLong(2).toDouble, s0.getDecimal(3).doubleValue,
      s0.getDecimal(4).doubleValue)
    var out = Vector((0, a, b, 0L))
    for (i <- 1 to iters) {
      val r = col("y").cast("double") - lit(a) - lit(b) * col("x").cast("double")
      val w6 = round(when(abs(r) <= c, lit(1.0)).otherwise(lit(c) / abs(r)), 6)
        .cast("decimal(10,6)")
      // DECIMAL(4,0) operands: x <= 10, y <= 50 by generation, and
      // the w·x·x triple product must stay under both engines' 38-
      // digit decimal width (a 19-digit cast overflows DuckDB)
      def d4(cc: Column) = cc.cast("decimal(4,0)")
      val st = xy.select(col("x"), col("y"), w6.as("w"))
        .agg(sum(col("w")).as("sw"),
          sum(col("w") * d4(col("x"))).as("swx"),
          sum(col("w") * d4(col("y"))).as("swy"),
          sum(col("w") * d4(col("x")) * d4(col("x"))).as("swxx"),
          sum(col("w") * d4(col("x")) * d4(col("y"))).as("swxy"),
          sum(when(col("w") < lit(1.0).cast("decimal(10,6)"), 1L)
            .otherwise(0L)).as("n_down")).head()
      val (a2, b2) = fit(st.getDecimal(0).doubleValue,
        st.getDecimal(1).doubleValue, st.getDecimal(2).doubleValue,
        st.getDecimal(3).doubleValue, st.getDecimal(4).doubleValue)
      a = a2; b = b2
      out :+= ((i, a, b, st.getLong(5)))
    }
    out.toDF("iter", "a_raw", "b_raw", "n_down")
      .select(col("iter"), round(col("a_raw"), 6).as("intercept"),
        round(col("b_raw"), 6).as("slope"), col("n_down"))
  }

  /** Logistic regression by Newton–Raphson (q303) — P(order final)
    * on scaled order value, 3 unrolled Newton steps from (0,0):
    * the [[huberRegression]] recipe applied to the canonical GLM.
    * Each step is ONE aggregate over the persisted (x, y)
    * projection to five sufficient statistics (score Σ(y−p),
    * Σ(y−p)x and Hessian Σw, Σwx, Σwx², w = p(1−p)), a 1-row
    * collect, and a closed-form 2×2 solve whose scalars feed the
    * next pass as literals. Determinism: per-row terms snap to
    * round-6 micro surrogates BEFORE the order-free integer sums —
    * σ(z) calls libm exp(), whose last ulp may differ between
    * engines, and the snap makes that difference unobservable
    * except exactly ON a rounding boundary (probability ~1e-10 per
    * term at round-6 — the q223 ln-surrogate precedent, one notch
    * coarser for the larger row count). */
  def logisticNewton(spark: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    import spark.implicits._
    val xy = Tables.orders(spark, dir)
      .select((col("o_totalprice") / lit(100000.0)).as("x"),
        when(col("o_orderstatus") === "F", lit(1.0)).otherwise(lit(0.0))
          .as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def sur6(c: Column) = round(c * 1e6, 0).cast("long")
    var (a, b) = (0.0, 0.0)
    var out = Vector((0, a, b))
    for (i <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(a) + lit(b) * col("x"))))
      val w = p * (lit(1.0) - p)
      val st = xy.agg(
        sum(sur6(col("y") - p)).as("g0"),
        sum(sur6((col("y") - p) * col("x"))).as("g1"),
        sum(sur6(w)).as("sw"),
        sum(sur6(w * col("x"))).as("swx"),
        sum(sur6(w * col("x") * col("x"))).as("swxx")).head()
      val (g0, g1) = (st.getLong(0) / 1e6, st.getLong(1) / 1e6)
      val (sw, swx, swxx) =
        (st.getLong(2) / 1e6, st.getLong(3) / 1e6, st.getLong(4) / 1e6)
      val det = sw * swxx - swx * swx
      a += (swxx * g0 - swx * g1) / det
      b += (sw * g1 - swx * g0) / det
      out :+= ((i, a, b))
    }
    out.toDF("iter", "a_raw", "b_raw")
      .select(col("iter"), round(col("a_raw"), 6).as("intercept"),
        round(col("b_raw"), 6).as("slope"))
  }

  /** 1-D k-means, Lloyd's algorithm unrolled (q304) — 3 clusters on
    * order value, initialized at the exact quartiles (the portable
    * q95 percentiles), 4 assign/update rounds: the HASH-GATED twin
    * of the ANN family's driver-side Lloyd fit (q55/q56 stay
    * rows-only because 64-D codebooks cannot ride a static oracle;
    * the 1-D case proves the identical iteration arithmetic
    * cross-engine). Each round is one scan-aggregate: assignment is
    * an exact-double argmin (ties to the lower cluster), updates
    * are DECIMAL milli-sums / counts, and the final report carries
    * per-cluster inertia from integer surrogates. */
  def kmeans1d(spark: SparkSession, dir: String, rounds: Int = 4,
      exactInit: Boolean = true): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select(col("o_totalprice").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exactInit = true is the ORACLE artifact (DuckDB needs
    // bit-identical initial centers); it is also the measured 100×
    // limit — the exact percentile buffers every value and went
    // super-linear (153×) + OOM'd an 8 GB heap at sf10 (BASELINE
    // r11). Production calls exactInit = false: the same quartile
    // init through approx_percentile's mergeable KLL sketch (the
    // q95 → quantileBucketsApprox swap), O(sketch) memory at any
    // scale; Lloyd's rounds — identical either way — wash out the
    // ≤ 0.01 %-rank init perturbation on any well-separated data
    // (spec: same final cluster sizes on the gate corpus).
    val init =
      if (exactInit)
        // scale-ok: the ORACLE branch (q304 bit-identity); production
        // (q320) passes exactInit=false → mergeable KLL sketch below
        o.agg(percentile(col("v"), lit(0.25)).as("c0"),
          percentile(col("v"), lit(0.5)).as("c1"),
          percentile(col("v"), lit(0.75)).as("c2")).head()
      else
        o.agg(approx_percentile(col("v"), lit(0.25), lit(10000)).as("c0"),
          approx_percentile(col("v"), lit(0.5), lit(10000)).as("c1"),
          approx_percentile(col("v"), lit(0.75), lit(10000)).as("c2"))
          .head()
    var cents = Vector(init.getDouble(0), init.getDouble(1),
      init.getDouble(2))
    def assign(cs: Vector[Double]): Column = {
      val d = cs.map(c => abs(col("v") - lit(c)))
      when(d(0) <= d(1) && d(0) <= d(2), 0)
        .when(d(1) <= d(2), 1).otherwise(2)
    }
    for (_ <- 1 to rounds) {
      // collect-ok: STRUCTURALLY bounded — groupBy(assign) has ≤ 3
      // groups by construction, no Guards.boundedGrid needed (the
      // q315 guard is for vocab ASSUMPTIONS, not schema constants)
      val upd = o.groupBy(assign(cents).as("k"))
        .agg(sum(round(col("v") * 1000.0, 0).cast("long")
          .cast("decimal(28,0)")).as("s"), count(lit(1)).as("n"))
        // collect-ok: ≤ 3 rows (the groupBy above)
        .collect().map(r => r.getAs[Int]("k") ->
          (r.getDecimal(1).doubleValue / 1e3 / r.getLong(2)))
        .toMap
      cents = Vector(0, 1, 2).map(k => upd.getOrElse(k, cents(k)))
    }
    // inertia: per-row squared distance to the OWN centroid, in
    // exact unit² surrogates
    val cexpr = when(col("cluster") === 0, lit(cents(0)))
      .when(col("cluster") === 1, lit(cents(1))).otherwise(lit(cents(2)))
    o.select(col("v"), assign(cents).as("cluster"))
      .select(col("v"), col("cluster"), cexpr.as("c"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        sum(round((col("v") - col("c")) * (col("v") - col("c")), 0)
          .cast("long")).as("inertia"))
      .select(col("cluster"),
        round(when(col("cluster") === 0, lit(cents(0)))
          .when(col("cluster") === 1, lit(cents(1)))
          .otherwise(lit(cents(2))), 6).as("centroid"),
        col("n"), col("inertia"))
  }

  /** CUPED variance reduction (q296) — Controlled experiments Using
    * Pre-Experiment Data (Deng et al., WSDM'13), the standard
    * experimentation-platform trick: adjust each user's experiment
    * metric y by their PRE-period covariate x, ŷ = y − θ(x − x̄)
    * with θ = cov(x,y)/var(x), and report the variance reduction
    * 1 − var(ŷ)/var(y) = ρ² — how much smaller the A/B test gets
    * for free. Everything folds from ONE scan's sufficient
    * statistics: per-user (pre, post) value sums as exact milli
    * longs, then n, Σx, Σy, Σx², Σy², Σxy as exact DECIMAL sums,
    * and var(ŷ) comes from the closed form var(y) − cov²/var(x) —
    * no second pass, no per-row adjustment materialized. */
  def cuped(spark: SparkSession, dir: String,
      splitDay: Int = 15): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val vmilli = coalesce(round(col("value") * 1000.0, 0).cast("long"), lit(0L))
    val per = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .crossJoin(broadcast(Tables.events(spark, dir)
        .agg(min(to_date(col("ts"))).as("d0"))))
      .select(col("user_id"),
        (datediff(col("day"), col("d0")) < splitDay).as("pre"), vmilli.as("v"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("xi"),
        sum(when(!col("pre"), col("v")).otherwise(0L)).as("yi"))
    val s = per.agg(count(lit(1)).as("n"),
      sum(col("xi")).as("sx"), sum(col("yi")).as("sy"),
      sum(d19(col("xi")) * d19(col("xi"))).as("sxx"),
      sum(d19(col("yi")) * d19(col("yi"))).as("syy"),
      sum(d19(col("xi")) * d19(col("yi"))).as("sxy"))
    def dd(c: String) = col(c).cast("double")
    val n = dd("n")
    val varx = (dd("sxx") - dd("sx") * dd("sx") / n) / n / 1e6
    val vary = (dd("syy") - dd("sy") * dd("sy") / n) / n / 1e6
    val cov = (dd("sxy") - dd("sx") * dd("sy") / n) / n / 1e6
    val theta = cov / varx
    s.select(col("n").as("n_users"),
      round(theta, 6).as("theta"),
      round(vary, 6).as("var_y"),
      round(vary - cov * cov / varx, 6).as("var_adj"),
      round(cov * cov / varx / vary, 6).as("var_reduction"))
  }

  /** Sample-ratio-mismatch check (q295) — the first thing an
    * experimentation platform audits every day: users hash-split
    * 50/50 (the deterministic md5 bucket — [[graft.ext.Sampling
    * .hashBucket]]), then per activity day a one-degree-of-freedom
    * chi-square (n_a−n_b)²/(n_a+n_b) against the design ratio.
    * A flagged day means assignment is leaking (bots, redirects,
    * logging loss) and every metric downstream is suspect — the
    * audit runs BEFORE any effect readout (q224's z-test). Exact
    * integer cells from one scan; the statistic is one fixed chain;
    * flag at the χ²₁ 95% critical value 3.841. */
  def srmCheck(spark: SparkSession, dir: String): DataFrame = {
    val arm = graft.ext.Sampling.hashBucket(col("user_id")) < 50
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy(col("day"))
      .agg(sum(when(arm, 1L).otherwise(0L)).as("n_a"),
        sum(when(!arm, 1L).otherwise(0L)).as("n_b"))
      .select(col("day"), col("n_a"), col("n_b"),
        round((col("n_a") - col("n_b")).cast("double")
          * (col("n_a") - col("n_b")).cast("double")
          / (col("n_a") + col("n_b")).cast("double"), 6).as("chi2"),
        ((col("n_a") - col("n_b")).cast("double")
          * (col("n_a") - col("n_b")).cast("double")
          / (col("n_a") + col("n_b")).cast("double") > 3.841)
          .as("srm_flag"))
  }

  /** Session-gap sweep (q299) — session counts under candidate
    * inactivity thresholds (5/15/30/60 min), from ONE lag-window
    * pass: the tuning table behind [[sessionize]]'s fixed gap (and
    * the [[interArrival]] histogram's actionable summary — that
    * shows the gap distribution, this shows what each cut DOES).
    * A session starts at a user's first event or after a gap
    * exceeding the threshold, so per threshold the session count is
    * one conditional sum over the persisted gap table — the
    * threshold axis explodes AFTER the window, never re-scanning
    * the corpus. Exact integer microsecond gaps; hash-gates. */
  def sessionGapSweep(spark: SparkSession, dir: String,
      gapsMin: Seq[Int] = Seq(5, 15, 30, 60)): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("gap_us", us - lag(us, 1).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gaps
      .select(col("user_id"), col("gap_us"),
        explode(array(gapsMin.map(lit): _*)).as("gap_min"))
      .groupBy(col("gap_min"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(when(col("gap_us").isNull
          || col("gap_us") > col("gap_min").cast("long") * 60000000L, 1L)
          .otherwise(0L)).as("n_sessions"))
      .select(col("gap_min"), col("n_users"), col("n_events"),
        col("n_sessions"),
        round(col("n_events").cast("double")
          / col("n_sessions").cast("double"), 6).as("events_per_session"))
  }

  /** Equi-depth histogram selectivity audit (q300) — build the
    * optimizer statistic (10-bucket equi-depth histogram on order
    * value via exact interpolated percentiles — the portable q95
    * device) and measure how well uniform-within-bucket
    * interpolation estimates range-predicate cardinalities against
    * the true counts: the [[joinEstimate]] companion for RANGE
    * selectivity, and the quantified case for histogram stats in
    * CBO. One scan builds the 11-boundary grid, one scan scores all
    * predicates; the estimate is a fixed fold over 10 bucket terms
    * (zero-width buckets guard to point masses). */
  def histogramSelectivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select(col("o_totalprice").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val boundAggs = Seq(count(lit(1)).cast("double").as("n")) ++
      // scale-ok: oracle artifact — exact decile fit for DuckDB
      // bit-identity; at scale the boundary fit swaps to
      // approx_percentile (q319 contract) or histogramQuantiles (q172)
      (0 to 10).map(i => percentile(col("v"), lit(i / 10.0)).as(s"p$i"))
    val bounds = o.agg(boundAggs.head, boundAggs.tail: _*)
    val preds = Seq((1, 0.0, 25000.0), (2, 25000.0, 50000.0),
      (3, 50000.0, 100000.0), (4, 100000.0, 200000.0),
      (5, 200000.0, 500000.0)).toDF("pred_id", "lo", "hi")
    val actual = o.crossJoin(broadcast(preds))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .groupBy(col("pred_id")).agg(count(lit(1)).as("actual"))
    val term = (i: Int) => {
      val a = col(s"p$i"); val b = col(s"p${i + 1}")
      when(b > a,
        greatest(lit(0.0), least(col("hi"), b) - greatest(col("lo"), a))
          / (b - a))
        .otherwise(when(a >= col("lo") && a <= col("hi"), lit(1.0))
          .otherwise(lit(0.0)))
    }
    val estFrac = (0 to 9).map(term).reduce(_ + _)
    preds.crossJoin(broadcast(bounds))
      .select(col("pred_id"), col("lo"), col("hi"),
        round(col("n") / 10.0 * estFrac, 6).as("est_rows"))
      .join(actual, Seq("pred_id"), "left")
      .select(col("pred_id"), col("lo"), col("hi"), col("est_rows"),
        coalesce(col("actual"), lit(0L)).as("actual"),
        when(coalesce(col("actual"), lit(0L)) > 0,
          round(abs(col("est_rows")
            - coalesce(col("actual"), lit(0L)).cast("double"))
            / coalesce(col("actual"), lit(0L)).cast("double"), 6))
          .as("rel_err"))
  }

  /** Skyline / Pareto front (q293) — parts no other part dominates
    * on (retail price ↓, size ↓): the classic multi-criteria
    * shortlist operator (Börzsönyi et al., ICDE'01) that SQL lacks
    * natively. NOT the naive O(n²) exists-join: the 2D skyline
    * falls out of a sort-free two-window sweep — per exact price
    * LEVEL, the min size (a bounded aggregate grid), a running min
    * over strictly-cheaper levels (window on the level grid), and a
    * within-level min for the equal-price case. A row survives iff
    * no strictly-cheaper level reached its size (≤) and no
    * equal-price row is strictly smaller — integer/exact-decimal
    * comparisons only, so membership hash-gates. Scale shape: the
    * fact table reduces to the price-level grid map-side; only the
    * grid is windowed (single-partition but bounded by DISTINCT
    * prices — at 100 TB, range-bucket the levels first, same
    * algebra per bucket + a cross-bucket running min). */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val levels = parts.groupBy(col("p_retailprice"))
      .agg(min(col("p_size")).as("lvl_min"))
    val wCheaper = Window.orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = levels.withColumn("min_cheaper",
      min(col("lvl_min")).over(wCheaper))
    parts.join(grid, Seq("p_retailprice"))
      .filter(
        (col("min_cheaper").isNull || col("min_cheaper") > col("p_size"))
          && col("lvl_min") === col("p_size"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
  }

  /** Recommender evaluation audit (q280) — serve top-3 item-CF
    * recommendations to every customer and score the SYSTEM, not the
    * model: catalog coverage (what fraction of the catalog ever gets
    * recommended — low = popularity collapse) and intra-list
    * diversity (mean pairwise 1−sim inside a user's list, sims as
    * the engine itself serves them, absent neighbor-pairs counting
    * as dissimilar). Serving is the production shape: the [[itemCf]]
    * neighbor table (items × topN — broadcastable at any corpus
    * size) joins each user's purchase history, scores fold as exact
    * DECIMAL sums of round-6 sims, already-bought items drop with
    * one anti-join, and the per-user top-3 is a partitioned window.
    * Every corpus-sized table is touched once; the final metrics
    * fold tiny aggregates. */
  def recEval(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    def dsum6(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val sims = itemCf(spark, dir)
      .select(col("part_a"), col("part_b"), col("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = custParts(spark, dir)
      .select(col("cust").as("user"), col("part"))
    val recs = hist.join(sims, col("part") === col("part_a"))
      .groupBy(col("user"), col("part_b").as("rec"))
      .agg(dsum6(col("cos")).as("score"))
      .join(hist.select(col("user"), col("part").as("rec")),
        Seq("user", "rec"), "left_anti")
      .withColumn("rn", row_number().over(Window.partitionBy(col("user"))
        .orderBy(col("score").desc, col("rec"))))
      .filter(col("rn") <= k)
      .select(col("user"), col("rec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nItems = hist.agg(countDistinct(col("part")).as("n_items"))
    val covRow = recs.agg(countDistinct(col("user")).as("n_users"),
      countDistinct(col("rec")).as("n_rec_items"))
    val pairs = recs.select(col("user"), col("rec").as("ra"))
      .join(recs.select(col("user"), col("rec").as("rb")), Seq("user"))
      .filter(col("ra") < col("rb"))
      .join(sims.select(col("part_a").as("ra"), col("part_b").as("rb"),
        col("cos").as("c1")), Seq("ra", "rb"), "left")
      .join(sims.select(col("part_b").as("ra"), col("part_a").as("rb"),
        col("cos").as("c2")), Seq("ra", "rb"), "left")
      .select(col("user"),
        (lit(1.0) - coalesce(col("c1"), col("c2"), lit(0.0))).as("dis"))
    val ild = pairs.groupBy(col("user"))
      .agg(round(dsum6(col("dis")) / count(lit(1)).cast("double"), 6)
        .as("u_ild"))
      .agg(count(lit(1)).as("n_ild_users"),
        round(dsum6(col("u_ild")) / count(lit(1)).cast("double"), 6)
          .as("mean_ild"))
    covRow.crossJoin(broadcast(nItems)).crossJoin(broadcast(ild))
      .select(col("n_users"), col("n_rec_items"), col("n_items"),
        round(col("n_rec_items").cast("double")
          / col("n_items").cast("double"), 6).as("coverage"),
        col("n_ild_users"), col("mean_ild"))
  }

  /** Capped user-user similarity (q240) — [[itemCf]]'s transpose,
    * neighbors-by-shared-parts, and the query that FORCES the
    * hot-key cap pattern: a part bought by m customers emits m²
    * pairs, and part popularity (unlike basket size) is unbounded at
    * 100 TB, so each part's customer list is capped at `cap` by a
    * deterministic md5 rank BEFORE pairing — per-part work is
    * O(cap²) forever, at a documented recall loss on hot parts (the
    * same trade as the q100/q155 hot-shingle cap). Margins for the
    * cosine stay the TRUE per-customer part counts; only pair
    * GENERATION is capped. Ranking on round-6 cosine, id tiebreak. */
  def userCf(spark: SparkSession, dir: String, cap: Int = 50,
      topN: Int = 5): DataFrame = {
    val cp = custParts(spark, dir)
    val margins = cp.groupBy(col("cust")).agg(count(lit(1)).as("n_parts"))
    val wCap = Window.partitionBy(col("part"))
      .orderBy(md5(concat_ws(":", col("part"), col("cust"))), col("cust"))
    val capped = cp.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= cap)
    val undirected = capped.select(col("part"), col("cust").as("cust_a"))
      .join(capped.select(col("part"), col("cust").as("cust_b")), "part")
      .filter(col("cust_a") < col("cust_b"))
      .groupBy(col("cust_a"), col("cust_b")).agg(count(lit(1)).as("n_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val directed = undirected.unionByName(undirected.select(
      col("cust_b").as("cust_a"), col("cust_a").as("cust_b"), col("n_ab")))
    val w = Window.partitionBy(col("cust_a"))
      .orderBy(col("cos").desc, col("cust_b"))
    directed
      .join(margins.select(col("cust").as("cust_a"),
        col("n_parts").as("n_a")), "cust_a")
      .join(margins.select(col("cust").as("cust_b"),
        col("n_parts").as("n_b")), "cust_b")
      .select(col("cust_a"), col("cust_b"), col("n_ab"),
        round(col("n_ab").cast("double") /
          sqrt(col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
  }

  /** Seasonal-naive forecast backtest (q241): predict each of the
    * last `holdout` days as same-day-last-week and report MAPE —
    * the baseline every fancier forecaster must beat, and the
    * verification discipline ([[seasonalTrend]] fits; this MEASURES
    * on a holdout). Rides the gap-filled day grid; per-day APE terms
    * go through round-6 integer surrogates so the mean is an exact
    * division (zero-revenue actuals are excluded from MAPE — the
    * standard undefined-APE convention — but counted). */
  def seasonalNaiveBacktest(spark: SparkSession, dir: String,
      holdout: Int = 28): DataFrame = {
    val w = Window.orderBy(col("day"))
    val scored = gapFillDaily(spark, dir)
      .select(col("day"), col("revenue_filled").as("actual"),
        lag(col("revenue_filled"), 7).over(w).as("pred"),
        row_number().over(Window.orderBy(col("day").desc)).as("rev_rn"))
      .filter(col("rev_rn") <= holdout && col("pred").isNotNull)
    scored.agg(count(lit(1)).as("n_days"),
      sum(when(col("actual") > 0.0, 1L).otherwise(0L)).as("n_scored"),
      sum(when(col("actual") > 0.0,
        round(abs(col("actual") - col("pred")) / col("actual") * 1e6, 0)
          .cast("long")).otherwise(0L)).as("ape_sur"))
      .select(col("n_days"), col("n_scored"),
        when(col("n_scored") > 0,
          round(col("ape_sur").cast("double") / 1e6
            / col("n_scored").cast("double"), 6)).as("mape"))
  }

  /** Kaplan–Meier churn curve (q223): survival S(t) over
    * days-until-last-activity, with users still active in the final
    * week CENSORED (their true lifetime is unknown — dropping them
    * or calling them churned both bias the curve; KM is the standard
    * answer). The fact table reduces to one row per user (first/last
    * timestamp — one shuffle), then to one row per distinct
    * duration-day (bounded domain); at-risk counts are running
    * integer sums over that tiny grid. The product Π(1 − d/n) runs
    * as exp of a running sum of round-9 ln surrogates (running
    * DOUBLE sums are engine-order-dependent; integer ones are not),
    * with a zero-factor flag forcing S = 0 from the first time
    * everyone at risk dies. */
  def kaplanMeier(spark: SparkSession, dir: String,
      horizonDays: Int = 7): DataFrame = {
    val us = unix_micros(col("ts"))
    // persisted: maxTs and the duration table both read it — without
    // the barrier each consumer re-expands the events scan
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(us).as("first_us"), max(us).as("last_us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxTs = perUser.agg(max(col("last_us")).as("max_us"))
    val dayUs = 86400000000L
    val durs = perUser.join(broadcast(maxTs))
      .select(((col("last_us") - col("first_us")) / dayUs).cast("long")
          .as("t"),
        (col("last_us") <= col("max_us") - lit(horizonDays) * dayUs)
          .as("observed"))
    val byT = durs.groupBy(col("t"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
        sum(when(col("observed"), 0L).otherwise(1L)).as("c"))
    val nTotal = durs.agg(count(lit(1)).as("n_users"))
    val wPrior = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val factor = lit(1.0) - col("d").cast("double") /
      col("n_at_risk").cast("double")
    byT.join(broadcast(nTotal))
      .withColumn("n_at_risk", col("n_users") -
        coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .withColumn("li", when(factor > 0.0,
        round(log(factor) * 1e9, 0).cast("long")).otherwise(0L))
      .withColumn("zeros",
        sum(when(factor === 0.0, 1L).otherwise(0L)).over(wCum))
      .select(col("t"), col("n_at_risk"), col("d"), col("c"),
        when(col("zeros") > 0, lit(0.0))
          .otherwise(round(exp(sum(col("li")).over(wCum)
            .cast("double") / 1e9), 6)).as("survival"))
  }

  /** Two-proportion A/B z-test (q224): split users by id parity,
    * conversion = first purchase within one day of first activity
    * (a time-boxed criterion — "ever purchased" saturates to p = 1
    * and the pooled variance degenerates), pooled-variance z-score —
    * the experiment-readout primitive. One scan reduces to per-user
    * flags (the same user_id shuffle every cohort query here
    * shares), then to a 2-row variant table folded into one row of
    * exact counts; the z chain is a single fixed IEEE expression
    * over those integers, NULL when a degenerate p ∈ {0, 1} zeroes
    * the variance (a throw would take the whole audit down). */
  def abTest(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val us = unix_micros(col("ts"))
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(us).as("first_us"),
        min(when(col("event_type") === "purchase", us)).as("purch_us"))
      .select((col("user_id") % 2 === 0).as("control"),
        when(col("purch_us").isNotNull &&
          col("purch_us") - col("first_us") <= windowUs, 1L)
          .otherwise(0L).as("conv"))
    val cells = perUser.agg(
      sum(when(col("control"), 1L).otherwise(0L)).as("n0"),
      sum(when(col("control"), col("conv")).otherwise(0L)).as("c0"),
      sum(when(!col("control"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("control"), col("conv")).otherwise(0L)).as("c1"))
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val p = (col("c0") + col("c1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    val se = sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / col("n0").cast("double")
        + lit(1.0) / col("n1").cast("double")))
    cells.select(col("n0"), col("c0"), col("n1"), col("c1"),
      round(p0, 6).as("rate_control"), round(p1, 6).as("rate_treat"),
      when(se > 0.0, round((p1 - p0) / se, 6)).as("z"))
  }

  /** SPRT sequential conversion monitor (q311) — Wald's sequential
    * probability ratio test as a DAILY dashboard: is the 24h
    * conversion rate at the design's p1 = 0.30 or the null's
    * p0 = 0.25 (α = β = 0.05)? Unlike [[abTest]]'s one-shot z, the
    * sequential form is what an experimentation platform actually
    * runs — peek every day, stop early when the evidence crosses
    * Wald's bounds ±ln(19). Scale shape: per-user conversion flags
    * reduce to a DAILY cohort grid (first-event day), the LLR
    * random walk is a cumulative sum over that bounded calendar
    * grid — never a per-user global window. Exactness: the two
    * per-user log-increments snap to round-9 integer surrogates, so
    * the walk is an exact-long cumsum and the crossing flags are
    * exact comparisons. */
  /** The three round-9 integer surrogates (win-increment,
    * lose-increment, Wald bound) shared verbatim by [[sprtMonitor]]
    * and its oracle — computed ONCE in Scala so neither engine's
    * ln/decimal-literal quirks can split them. */
  def sprtSurrogates(p0: Double = 0.25, p1: Double = 0.30)
      : (Long, Long, Long) = {
    def s9(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    (s9(math.log(p1 / p0)), s9(math.log((1.0 - p1) / (1.0 - p0))),
      s9(math.log(19.0)))
  }

  def sprtMonitor(spark: SparkSession, dir: String, p0: Double = 0.25,
      p1: Double = 0.30, windowUs: Long = 86400000000L): DataFrame =
    sprtFinalize(sprtDailyCohorts(spark, dir, windowUs), p0, p1)

  /** Per-user cohort rows (day_us, conv): first-event day and
    * converted-within-window flag — the upstream sessionizer output
    * the STREAMING monitor consumes
    * ([[graft.streaming.StreamOps.sprtMonitorStream]]). */
  def sprtUserCohorts(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val us = unix_micros(col("ts"))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(us).as("first_us"),
        min(when(col("event_type") === "purchase", us)).as("purch_us"))
      .select(
        (col("first_us") - pmod(col("first_us"), lit(86400000000L)))
          .as("day_us"),
        when(col("purch_us").isNotNull &&
          col("purch_us") - col("first_us") <= windowUs, 1L)
          .otherwise(0L).as("conv"))
  }

  /** The per-day cohort grid [[sprtMonitor]] walks: [[sprtUserCohorts]]
    * reduced to (day_us, n_users, n_conv). */
  def sprtDailyCohorts(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame =
    sprtUserCohorts(spark, dir, windowUs)
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))

  /** The SPRT walk over a (day_us, n_users, n_conv) grid — ONE
    * shared tail for the batch query and every micro-batch of
    * [[graft.streaming.StreamOps.sprtMonitorStream]] (the q228/PSI
    * sharing discipline): the exact-long LLR cumsum over the bounded
    * calendar grid and Wald's ±ln(19) crossing decisions, surrogates
    * from [[sprtSurrogates]] so no engine- or path-dependent ln can
    * split batch from stream. */
  private[graft] def sprtFinalize(daily: DataFrame, p0: Double,
      p1: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (lw9, ll9, bound9) = sprtSurrogates(p0, p1)
    val (lw, ll, bound) = (lit(lw9), lit(ll9), lit(bound9))
    val w = Window.orderBy(col("day_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val llr9 = sum(col("n_conv") * lw +
      (col("n_users") - col("n_conv")) * ll).over(w)
    daily
      .select(timestamp_micros(col("day_us")).as("day"), col("n_users"),
        col("n_conv"), llr9.as("llr9"))
      .select(col("day"), col("n_users"), col("n_conv"),
        round(col("llr9").cast("double") / 1e9, 6).as("llr"),
        when(col("llr9") >= bound, "accept_h1")
          .when(col("llr9") <= -bound, "accept_h0")
          .otherwise("continue").as("decision"))
  }

  /** Pareto / ABC inventory analysis (q226): rank parts by revenue,
    * class A = parts covering the first 80% of cumulative revenue,
    * B = to 95%, C = the tail — the assortment-rationalization
    * classic. The fact table reduces to per-part DECIMAL-exact
    * revenue in one scan; ranking and the running share run on the
    * bounded catalog table (parts, not line items), with the
    * cumulative sum kept in DECIMAL so the 80/95 cuts are made on
    * exact values (a running double would make boundary parts
    * engine-dependent). Output is the 3-row class summary. */
  def paretoClasses(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(28,6)")).as("rev"))
    val wCum = Window.orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val share = col("cum").cast("double") / col("total").cast("double")
    perPart
      .withColumn("cum", sum(col("rev")).over(wCum))
      .withColumn("total", sum(col("rev")).over(wAll))
      .withColumn("abc_class",
        when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev")).as("class_rev_dec"),
        max(col("total")).as("total_dec"))
      .select(col("abc_class"), col("n_parts"),
        round(col("class_rev_dec").cast("double"), 6).as("class_revenue"),
        round(col("class_rev_dec").cast("double")
          / col("total_dec").cast("double"), 6).as("revenue_share"))
  }

  /** Exact ROC-AUC via the Mann–Whitney rank-sum (q229): does a
    * user's total event value predict fast conversion ([[abTest]]'s
    * criterion)? AUC = P(score⁺ > score⁻), computed from ranks with
    * the standard average-rank tie correction — and kept EXACT by
    * carrying 2·avg_rank (= 2·rank + ties − 1, an integer) so no
    * fractional rank ever sums in float. One global rank over the
    * per-user table (users, not events — the intrinsic cost of exact
    * AUC; at extreme cardinality swap in a score-binned approximation
    * like the q172 histogram). NULL when a class is empty. */
  def aucConversion(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val us = unix_micros(col("ts"))
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("score"), min(us).as("first_us"),
        min(when(col("event_type") === "purchase", us)).as("purch_us"))
      .select(col("score"),
        when(col("purch_us").isNotNull &&
          col("purch_us") - col("first_us") <= windowUs, 1L)
          .otherwise(0L).as("pos"))
    val r2 = lit(2L) * rank().over(Window.orderBy(col("score"))) +
      count(lit(1)).over(Window.partitionBy(col("score"))) - lit(1L)
    val cells = perUser.select(col("pos"), r2.as("r2"))
      .agg(sum(when(col("pos") === 1L, col("r2")).otherwise(0L)).as("r2sum"),
        sum(col("pos")).as("n_pos"), sum(lit(1L) - col("pos")).as("n_neg"))
    val np = col("n_pos").cast("double")
    cells.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("r2sum").cast("double") / 2.0 - np * (np + 1.0) / 2.0)
          / (np * col("n_neg").cast("double")), 6)).as("auc"))
  }

  /** Gains / decile-lift table (q231) — [[aucConversion]]'s
    * actionable companion: rank users by score into deciles
    * (highest first), per decile the conversion rate, lift over
    * baseline, and cumulative capture share — "how deep must the
    * campaign go to reach X% of converters". ntile runs over the
    * per-user table with an explicit (score desc, user_id) order so
    * decile membership is engine-exact; every output number is a
    * division of exact longs. Cumulative capture runs over the
    * 10-row decile table. */
  def gainsTable(spark: SparkSession, dir: String,
      windowUs: Long = 86400000000L): DataFrame = {
    val us = unix_micros(col("ts"))
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(dsum(col("value")).as("score"), min(us).as("first_us"),
        min(when(col("event_type") === "purchase", us)).as("purch_us"))
      .select(col("user_id"), col("score"),
        when(col("purch_us").isNotNull &&
          col("purch_us") - col("first_us") <= windowUs, 1L)
          .otherwise(0L).as("conv"))
    val wN = Window.orderBy(col("score").desc, col("user_id"))
    val deciles = perUser
      .withColumn("decile", ntile(10).over(wN))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = deciles.agg(sum(col("n_users")).as("all_users"),
      sum(col("n_conv")).as("all_conv"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles.join(broadcast(tot))
      .withColumn("cum_conv", sum(col("n_conv")).over(wCum))
      .select(col("decile"), col("n_users"), col("n_conv"),
        round(col("n_conv").cast("double")
          / col("n_users").cast("double"), 6).as("conv_rate"),
        round((col("n_conv").cast("double") / col("n_users").cast("double"))
          / (col("all_conv").cast("double")
            / col("all_users").cast("double")), 6).as("lift"),
        round(col("cum_conv").cast("double")
          / col("all_conv").cast("double"), 6).as("cum_capture"))
  }

  /** RFM segmentation: per customer, recency (days since last
    * order), frequency (orders) and monetary (decimal-exact spend),
    * each quartile-coded by ntile with a customer-key tie-break so
    * the segmentation is deterministic; output is the segment-code
    * census (64 possible R·F·M cells). One orders scan; the ntile
    * windows run over the per-customer table. Recency anchors to the
    * corpus max date — self-contained and reproducible. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        dsum(col("o_totalprice")).as("monetary"))
    val anchor = Window.partitionBy()
    def quart(c: Column) = ntile(4).over(
      Window.orderBy(c, col("o_custkey")))
    per
      .withColumn("recency_days",
        datediff(max(col("last_day")).over(anchor), col("last_day")))
      .select(col("o_custkey"),
        quart(col("recency_days")).as("r"),
        quart(col("freq")).as("f"),
        quart(col("monetary")).as("m"))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Robust aggregation: per-priority 5%-trimmed mean of order value
    * beside the raw mean — the outlier-resistant statistic a metrics
    * pipeline wants when a few whale orders (or corrupt rows) drag
    * the mean. Trimmed, not winsorized, deliberately: the survivors
    * are all original 2-decimal prices, so the decimal-plane mean is
    * exact and order-independent, whereas winsorizing would inject
    * interpolated full-precision boundary values whose →decimal
    * rounding is a cross-engine tie hazard. Boundaries are exact
    * interpolated percentiles per group (the q95 precedent: both
    * engines interpolate sorted doubles identically); the exact sort
    * is per GROUP and swaps to approx_percentile at real scale, as
    * q95 documents. Two scans: one for boundaries, one filtered
    * aggregate (the boundary table is broadcast back). */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      // scale-ok: oracle artifact — the scaladoc's documented swap to
      // approx_percentile at real scale (q319 contract)
      .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
    Tables.orders(spark, dir)
      .join(broadcast(bounds), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        davg(col("o_totalprice")).as("raw_mean"),
        sum(when(col("o_totalprice") >= col("p05") &&
            col("o_totalprice") <= col("p95"), 1L).otherwise(0L))
          .as("n_kept"),
        (sum(when(col("o_totalprice") >= col("p05") &&
            col("o_totalprice") <= col("p95"), col("o_totalprice"))
          .otherwise(lit(null)).cast("decimal(28,6)")).cast("double") /
          sum(when(col("o_totalprice") >= col("p05") &&
            col("o_totalprice") <= col("p95"), 1L).otherwise(0L))
            .cast("double")).as("trimmed_mean"))
  }

  /** Semi-structured audit of the events `props` JSON column:
    * extract `$.k`, bucket it, and report per-bucket volume, user
    * reach, and range — plus the unparseable rows as their own
    * NULL-bucket row (a malformed-payload RATE is the first thing an
    * ingest gate wants from a JSON column, and dropping those rows
    * silently is how bad payloads go unnoticed; NULL, not a -1
    * sentinel, because floor-bucketed negative payloads legitimately
    * occupy every negative bucket id). get_json_object is a per-row
    * codegen'd expression — one scan, no UDF, and the bucket agg is
    * a tiny shuffle. Floor-division bucketing: int `/` truncates
    * toward zero on one engine and `//` on the other, so signed
    * values need explicit floor to agree. */
  def jsonPropsAudit(spark: SparkSession, dir: String): DataFrame =
    jsonPropsAuditOf(Tables.events(spark, dir))

  /** [[jsonPropsAudit]]'s core over any (user_id, props) relation —
    * separated so the malformed-payload contract is spec-testable on
    * fixtures the clean testdata doesn't contain. */
  def jsonPropsAuditOf(events: DataFrame): DataFrame =
    events
      // try_cast, not cast: under ANSI a non-integer payload value
      // ({"k":"abc"}) would THROW mid-scan; the audit's whole point
      // is that malformed payloads land in the NULL bucket instead of
      // killing (or silently skewing) the job
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").try_cast("int").as("k"))
      .groupBy(floor(col("k") / 10).cast("int").as("k_bucket"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Cohort lifetime value: [[retentionCohorts]]' weekly grid with
    * the money attached — per (cohort_week, week_offset), active
    * users, that week's value, and the RUNNING cumulative value (the
    * LTV curve). The cumulative sum runs on the DECIMAL plane inside
    * a cohort-partitioned window ordered by offset, so it is exact
    * and order-independent; the window operates on the tiny
    * (cohort × offset) grid, never the event stream. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.events(spark, dir)
      .select(col("user_id"), col("value"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
    val first = w.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    val grid = w.join(first, "user_id")
      .select(col("user_id"), col("value"), col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(28,6)")).as("wv"))
    val cum = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.select(col("cohort_week"), col("week_offset"), col("n_users"),
      col("wv").cast("double").as("week_value"),
      sum(col("wv")).over(cum).cast("double").as("cum_value"))
  }

  /** Top session paths: the ordered event-type string of each
    * 30-minute session ("view>click>purchase"), counted corpus-wide —
    * the path-mining companion to [[markovTransitions]] (full
    * sequences, not one-hop probabilities). Session assignment is
    * the same gap-split window as [[sessionize]]; the path is built
    * by sorting each session's (ts, event_id, type) structs INSIDE
    * the aggregated array — collect_list order is
    * partitioning-dependent, array_sort makes it canonical — so the
    * result is deterministic and hash-gates. Paths are bounded by
    * session length; the final count is a tiny path-keyed agg. */
  def sessionPaths(spark: SparkSession, dir: String, topN: Int = 25)
      : DataFrame = {
    withSessionIds(Tables.events(spark, dir))
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        transform(
          // scale-ok: group = one session — bounded by session length
          // (the gap-split window caps fan-in per (user, session))
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          e => e.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** Markov removal-effect attribution (q315) — the data-driven
    * multi-touch attribution model (Anderl et al. 2016) that
    * [[touchAttribution]]'s first/last/linear heuristics
    * approximate: model user journeys as a Markov chain
    * (START → channel states → CONV/NULL absorbing), compute the
    * chain's conversion probability by truncated power iteration,
    * then each channel's removal effect = 1 − p(convert | channel
    * redirected to NULL), normalized into attribution shares.
    * Journey semantics: events ordered by (ts, event_id) per user,
    * cut at the FIRST purchase (→ CONV; no purchase → NULL);
    * channels are the non-purchase event types. Scale shape: ONE
    * user-partitioned window pass builds the transition counts; the
    * chain grids are (channels+2)² — bounded by the event-type
    * vocabulary, not data volume — so the (scenarios × edges) power
    * loop runs on a coalesced tiny table, and per-src denominators
    * stay the FULL scenario's exact longs (redirection never changes
    * a row's out-count). Determinism: probabilities are exact
    * integer ratios, every mass reduction snaps to a round-12
    * surrogate (the q251/q308 device — so the oracle unrolls the
    * same loop as a recursive CTE), and removal effects snap to 1e9
    * before the share normalization. */
  def markovAttribution(spark: SparkSession, dir: String,
      iters: Int = 25, maxGrid: Int = graft.ext.Guards.defaultDriverGridMax): DataFrame = {
    import spark.implicits._
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val rows = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        us.as("us"))
      .withColumn("rn", row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fpr = rows.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rn")).as("fp_rn"))
    val flagged = rows.join(broadcast(fpr), Seq("user_id"), "left")
    val pre = flagged
      .filter(col("fp_rn").isNull || col("rn") < col("fp_rn"))
      .select(col("user_id"), col("rn"), col("event_type"),
        when(col("fp_rn").isNotNull, lit("CONV")).otherwise(lit("NULL"))
          .as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val trans = pre.select(col("event_type").as("src"),
      coalesce(lead(col("event_type"), 1).over(w2), col("term"))
        .as("dst"))
    val starts = pre.withColumn("rn2", row_number().over(w2))
      .filter(col("rn2") === 1)
      .select(lit("START").as("src"), col("event_type").as("dst"))
    // purchase-first users have an empty pre-journey: START → CONV
    val instant = flagged.filter(col("fp_rn") === 1)
      .select(col("user_id")).distinct()
      .select(lit("START").as("src"), lit("CONV").as("dst"))
    val edges = trans.unionByName(starts).unionByName(instant)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    // Driver-side scenario loop over the COLLECTED edge counts: the
    // grid is (event-type vocabulary + 2)² — bounded by vocab, never
    // by data volume (the Lloyd-fit / q316 altitude). The distributed
    // version ran 25 joins over a coalesced tiny table per window and
    // was pure scheduler overhead. Arithmetic replicates the gated
    // plan bit-for-bit: p = exact-long ratio (same IEEE divide), each
    // mass reduction sums round-HALF_UP 1e12 long surrogates (Spark
    // `round` = BigDecimal.valueOf(x).setScale(0, HALF_UP); exact
    // integer adds are order-free), removal effects snap to 1e9.
    // The vocabulary bound is an ASSUMPTION about events.event_type,
    // not a structural fact — boundedGrid turns an event_type column
    // full of URLs into a fail-fast error instead of a driver OOM.
    val edgeRows = graft.ext.Guards
      .boundedGrid(edges, maxGrid, "markovAttribution edge grid")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totM = edgeRows.groupBy(_._1)
      .map { case (s, es) => s -> es.map(_._3).sum }
    val chans = edgeRows.map(_._1)
      .filter(s => s != "START" && s != "CONV" && s != "NULL")
      .distinct.sorted
    def rnd(x: Double, scale: Double): Long =
      java.math.BigDecimal.valueOf(x * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // per scenario: drop the removed channel's out-edges, redirect
    // its in-edges to NULL; denominators stay the FULL totals
    def pConv(scenario: String): Double = {
      val chain = edgeRows.toSeq
        .filter { case (s, _, _) => scenario == "FULL" || s != scenario }
        .map { case (s, d, n) =>
          (s, if (scenario != "FULL" && d == scenario) "NULL" else d, n)
        }
        .groupBy(e => (e._1, e._2))
        .map { case ((s, d), es) =>
          (s, d, es.map(_._3).sum.toDouble / totM(s).toDouble)
        }.toSeq ++ Seq(("CONV", "CONV", 1.0), ("NULL", "NULL", 1.0))
      val out = chain.groupBy(_._1)
      var mass = Map("START" -> 1.0)
      for (_ <- 1 to iters) {
        val acc = scala.collection.mutable.Map.empty[String, Long]
        for ((state, m) <- mass; (_, d, p) <- out.getOrElse(state, Nil))
          acc(d) = acc.getOrElse(d, 0L) + rnd(m * p, 1e12)
        mass = acc.map { case (d, s) => d -> s / 1e12 }.toMap
      }
      mass.getOrElse("CONV", 0.0)
    }
    val pf = pConv("FULL")
    val rem = chans.map { c =>
      val pc = pConv(c)
      val re9 = rnd(if (pf > 0.0) 1.0 - pc / pf else 0.0, 1e9)
      (c, pc, re9)
    }
    val reTot = rem.map(_._3).sum
    rem.toSeq.map { case (c, pc, re9) =>
      (c, r6(pf), r6(pc), r6(re9.toDouble / 1e9),
        if (reTot > 0L) Some(r6(re9.toDouble / reTot.toDouble)) else None)
    }.toDF("channel", "p_full", "p_removed", "removal_effect", "share")
  }

  /** First-order Markov transition matrix over per-user event
    * streams: P(next event type | event type), the session-path
    * primitive behind "what do users do after X" product analytics.
    * One scan: a user-partitioned lead() window (shuffles once on
    * user_id, the same key every sessionization query here reuses),
    * then a tiny (from,to)-keyed aggregate. The probability is one
    * division of two exact longs — deterministic, so the matrix
    * hash-gates. Terminal events (a user's last) emit no transition
    * by construction (lead is null). */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame =
    // MEMOIZED per dir: q189's matrix and q251's HITS edge list both
    // pay the events window otherwise; the output is type-vocabulary²
    graft.ext.Memo.cached(markovCache, dir, spark) {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("event_type"))
    pairs.select(col("event_type"), col("next_type"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(totals)
        .cast("double")).as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Gapped sequential-pattern support (q214): for event-type pairs
    * (a, b), in how many sessions does SOME occurrence of `a`
    * precede SOME occurrence of `b` — any gap allowed, the
    * PrefixSpan-style 2-pattern that [[markovTransitions]] (adjacent
    * only) and [[sessionPaths]] (whole paths) don't answer. The
    * a-then-b existence test folds to span arithmetic: with per-user
    * event positions, `a` precedes `b` in a session iff
    * min_pos(a) < max_pos(b) — so each session reduces to one row
    * per DISTINCT type (bounded by the type vocabulary, not session
    * length) and the within-session self-join is ≤ |types|² rows per
    * session, never length². Positions come from the SAME
    * user-partitioned (ts, event_id) window sort sessionization
    * already paid for — one shuffle for the whole query. Support
    * denominators are exact longs. */
  def seqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
    val spans = withSessionIds(Tables.events(spark, dir))
      .select(col("user_id"), col("session_id"), col("event_type"),
        row_number().over(w).as("p"))
      .groupBy(col("user_id"), col("session_id"), col("event_type"))
      .agg(min(col("p")).as("first_p"), max(col("p")).as("last_p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSess = spans.select(col("user_id"), col("session_id")).distinct()
      .agg(count(lit(1)).as("n_total"))
    val a = spans.select(col("user_id"), col("session_id"),
      col("event_type").as("antecedent"), col("first_p"))
    val b = spans.select(col("user_id"), col("session_id"),
      col("event_type").as("consequent"), col("last_p"))
    a.join(b, Seq("user_id", "session_id"))
      .filter(col("antecedent") =!= col("consequent") &&
        col("first_p") < col("last_p"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_sessions"))
      .join(broadcast(nSess))
      .select(col("antecedent"), col("consequent"), col("n_sessions"),
        round(col("n_sessions").cast("double")
          / col("n_total").cast("double"), 6).as("support"))
  }

  /** Classical multiplicative seasonal decomposition (q216) on the
    * daily revenue series: per-day-of-week seasonal index
    * (dow mean / grand mean) plus the least-squares slope of the
    * DESEASONALIZED series — the "is growth real or just weekday
    * mix" question [[ewmaDaily]] and [[rollingZscore]] don't answer.
    * One fact scan reduces to the bounded day grid (10⁴ rows for
    * decades); everything after runs on that grid. Determinism: day
    * sums are DECIMAL-exact, both means are single divisions of
    * exact values, and the regression inputs go through the
    * nano-scaled integer surrogates (the zipfFit/heapsFit recipe) so
    * no float accumulates in engine order. Slope is per-day revenue
    * units per day, broadcast onto every dow row. */
  def seasonalTrend(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(28,6)")
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(dsum(col("o_totalprice")).as("rev"))
      .withColumn("dow", dayofweek(col("day")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = daily.agg(sum(dec(col("rev"))).as("tot_rev"),
      count(lit(1)).as("n_days_all"), min(col("day")).as("day0"))
    val byDow = daily.groupBy(col("dow"))
      .agg(sum(dec(col("rev"))).as("dow_rev"), count(lit(1)).as("n_dow"))
      .join(broadcast(tot))
      .select(col("dow"), col("n_dow"), col("day0"),
        (col("dow_rev").cast("double") / col("n_dow").cast("double"))
          .as("dow_mean"),
        ((col("dow_rev").cast("double") / col("n_dow").cast("double"))
          / (col("tot_rev").cast("double") / col("n_days_all").cast("double")))
          .as("seasonal_index"))
    def d19(c: Column) = c.cast("decimal(19,0)")
    val xy = daily
      .join(broadcast(byDow.select(col("dow"), col("day0"),
        col("seasonal_index"))), Seq("dow"))
      .select(datediff(col("day"), col("day0")).cast("long").as("xi"),
        round(col("rev") / col("seasonal_index") * 1000.0, 0).cast("long")
          .as("yi"))
    val fit = xy.agg(count(lit(1)).as("n_points"),
      sum(col("xi")).as("sxl"), sum(col("yi")).as("syl"),
      sum(d19(col("xi")) * d19(col("yi"))).as("sxyl"),
      sum(d19(col("xi")) * d19(col("xi"))).as("sxxl"))
    val n = col("n_points").cast("double")
    val sx = col("sxl").cast("double")
    val sy = col("syl").cast("double") / 1e3
    val sxy = col("sxyl").cast("double") / 1e3
    val sxx = col("sxxl").cast("double")
    val slopeDf = fit.select(
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).as("trend_slope"))
    byDow.select(col("dow"), col("n_dow").as("n_days"),
        round(col("dow_mean"), 6).as("dow_mean"),
        round(col("seasonal_index"), 6).as("seasonal_index"))
      .crossJoin(broadcast(slopeDf))
  }

  /** MAD-based robust outlier audit (q217): per group, the median,
    * the median absolute deviation, and how many rows sit beyond
    * k·1.4826·MAD (1.4826 = the normal-consistency constant, k = 3)
    * — the heavy-tail-safe alternative to [[rollingZscore]]'s
    * mean/std flags (one far outlier inflates a std but barely moves
    * a MAD). Two grouped exact-interpolated percentiles (the
    * q95/q205 precedent both engines reproduce bit-for-bit), with
    * the deviation table persisted for its two consumers; medians
    * broadcast back as scan-side predicates. */
  def madOutliers(spark: SparkSession, dir: String, k: Double = 3.0)
      : DataFrame = {
    val med = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      // scale-ok: oracle artifact — exact grouped median for DuckDB
      // bit-identity; at scale both medians swap to approx_percentile
      // (q319 contract)
      .agg(expr("percentile(o_totalprice, 0.5)").as("med"))
    val withAd = Tables.orders(spark, dir)
      .join(broadcast(med), Seq("o_orderpriority"))
      .withColumn("ad", abs(col("o_totalprice") - col("med")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = withAd.groupBy(col("o_orderpriority"))
      // scale-ok: oracle artifact — same swap as the median above
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    withAd.join(broadcast(mad), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("median"),
        round(max(col("mad")), 6).as("mad"),
        sum(when(col("ad") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Rolling z-score anomaly detection over the gap-filled daily
    * revenue: 28-day trailing mean/std with EXACT decimal-plane
    * moments (window sums of DECIMAL values and their DECIMAL
    * squares are associative and exact, so mean and variance come
    * out bit-identical on any engine; a double window-sum would be
    * summation-order-dependent and unhashable). Variance uses the
    * sum-of-squares identity evaluated in a fixed expression order
    * from the two exact sums. Only full 28-day windows are emitted.
    * The window runs over the DAY grid (10⁴ rows for decades) — the
    * fact table was reduced by gapFillDaily's one scan; partition by
    * series for the many-series case. */
  def rollingZscore(spark: SparkSession, dir: String, win: Int = 28,
      zFlag: Double = 3.0): DataFrame = {
    val w = Window.orderBy(col("day"))
    val frame = w.rowsBetween(-(win - 1), Window.currentRow)
    val x = col("revenue_filled")
    val n = lit(win.toDouble)
    gapFillDaily(spark, dir)
      // integer-CENT moments: revenue is an exact cent amount, so
      // cents are exact BIGINTs, the window sums are exact integers
      // (squares through a (19,0)² decimal — a cent square crosses
      // int64 around sf0.1), and every →double conversion is ONE
      // correctly-rounded step on either engine. The first cut summed
      // scale-4 decimals instead, and DuckDB's two-step
      // decimal→double (int/10^s) double-rounds a last ULP away from
      // the JVM's single-rounded BigDecimal.doubleValue.
      .select(col("day"), x,
        (x.cast("decimal(18,2)") * 100).cast("long").as("c"))
      .select(col("day"), x,
        row_number().over(w).as("rn"),
        sum(col("c")).over(frame).cast("double").as("s1c"),
        sum((col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)")))
          .over(frame).cast("double").as("s2c"),
        col("c").cast("double").as("cd"))
      .filter(col("rn") >= win)
      .select(col("day"), x, col("cd"),
        (col("s1c") / n).as("meanc"),
        sqrt((col("s2c") - col("s1c") * col("s1c") / n) / (n - 1.0))
          .as("sdc"))
      // null (not NaN) z on a zero-variance window: NaN round-trips
      // engines/sinks inconsistently, SQL NULL does not
      .select(col("day"), x,
        (col("meanc") / 100.0).as("mean28"),
        (col("sdc") / 100.0).as("sd28"),
        ((col("cd") - col("meanc")) /
          when(col("sdc") =!= 0.0, col("sdc"))).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > zFlag)
  }

  /** Explicit GROUPING SETS — the general form ROLLUP/CUBE
    * specialize: (status, priority), (priority), grand total.
    * Catalyst expands all sets into ONE Expand + hash aggregate —
    * a single scan and a single shuffle, not one job per set, which
    * is the property that matters when the fact table is 100 TB. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq.empty[Column]),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))

  /** String scalar functions: lower/upper/length/substring/split/
    * concat/regexp — codegen'd `functions._`, no UDFs. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        element_at(split(col("p_type"), " "), 1).as("type_first"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))

  /** Date/time functions + grouped time rollup by year/month. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))

  /** Tumbling 1-hour window over events (batch form of a streaming
    * windowed aggregate; SURVEY.md §2B streaming note). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** The session-assignment core shared by [[sessionize]] and
    * [[sessionPaths]] (and mirrored by their oracles): lag → gap
    * boundary flag → prefix-sum session id, all per user in one
    * window shuffle. The 30-minute gap lives HERE, once — the two
    * consumers and their SQL twins must agree on the session
    * definition or they quietly mine different sessions. Gap math in
    * integer microseconds so the oracle (ns-precision DuckDB) and
    * Spark (µs timestamps) agree exactly. */
  def withSessionIds(events: DataFrame,
      gapUs: Long = 1800000000L): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
    events
      .withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_us", "new_session")
  }

  /** Sessionization (gap > 30 min) — batch analog of
    * mapGroupsWithState session windows: [[withSessionIds]] →
    * per-user session stats. One shuffle on user_id shared by the
    * assignment windows and the first groupBy. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    withSessionIds(Tables.events(spark, dir))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        dsum(col("session_value")).as("total_value"))
  }

  /** JSON extraction from the events.props payload column. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .filter(col("prop_k") > 50)

  /** Scalar-subquery pattern: orders above the global average price.
    * Rewritten multiplicative (price·n > Σprice, decimal-exact) so
    * the cutoff is identical across engines; the 1-row aggregate is
    * broadcast — no shuffle of `orders`. */
  def aboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val tot = o.agg(sum(col("o_totalprice").cast("decimal(28,6)")).as("total_dec"),
      count(lit(1)).as("n_ord"))
    o.join(broadcast(tot),
        col("o_totalprice").cast("decimal(28,6)") * col("n_ord") > col("total_dec"))
      .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))
  }

  /** Correlated-subquery pattern (per-group threshold): lineitems with
    * quantity > 1.5× their part's average, via broadcast of the
    * per-part aggregate. Quantities are integral doubles so the
    * per-part mean is exact in both engines. */
  def abovePartAvg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("decimal(28,6)")).as("qty_sum"),
        count(lit(1)).as("qty_n"))
    li.join(broadcast(perPart),
        li("l_partkey") === col("pk") &&
        col("l_quantity").cast("decimal(28,6)") * col("qty_n") * 2 >
          col("qty_sum") * 3)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_above"), max(col("l_quantity")).as("max_qty"))
  }

  /** Conditional aggregation (pivot-style): per-user event-type
    * counts as columns — one pass, no PIVOT operator needed. */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("n_signup"))

  /** As-of join: each purchase event matched to the most recent
    * signup of the same user at-or-before its time. Implemented with
    * the scalable union+window pattern (ONE shuffle on user_id, no
    * join at all): tag rows, carry the last signup time forward with
    * an ignoreNulls window, keep purchases. At equal microseconds the
    * sort key orders signups first, matching the oracle's `>=` ASOF
    * semantics. The oracle is DuckDB's native ASOF LEFT JOIN — two
    * completely different algorithms, same answer. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .filter(col("event_type").isin("purchase", "signup"))
      .withColumn("k", when(col("event_type") === "signup", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("k"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("signup_us",
        last(when(col("event_type") === "signup", col("us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("signup_us"))
  }

  /** NEAREST-direction as-of join: each purchase matched to the
    * signup closest in time, before OR after (ties → the earlier
    * signup). Same union+window shape as [[asofJoin]] — ONE shuffle
    * on user_id, no join — but with both a carry-forward (last
    * signup ≤ t) and a carry-backward (first signup ≥ t) frame over
    * the same sorted partition, picked per row by distance. The
    * oracle is an independent algorithm entirely (per-purchase
    * LATERAL min-|Δt| subquery). */
  def nearestAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .filter(col("event_type").isin("purchase", "signup"))
      .withColumn("k", when(col("event_type") === "signup", 0).otherwise(1))
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("k"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("k"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sigUs = when(col("event_type") === "signup", col("us"))
    ev
      .withColumn("prev_us", last(sigUs, ignoreNulls = true).over(wPrev))
      .withColumn("next_us", first(sigUs, ignoreNulls = true).over(wNext))
      .filter(col("event_type") === "purchase")
      .withColumn("nearest_us",
        when(col("prev_us").isNull, col("next_us"))
          .when(col("next_us").isNull, col("prev_us"))
          .when(col("us") - col("prev_us") <= col("next_us") - col("us"),
            col("prev_us"))
          .otherwise(col("next_us")))
      .select(col("event_id"), col("user_id"), col("nearest_us"),
        abs(col("nearest_us") - col("us")).cast("long").as("diff_us"))
  }

  /** Range join: lineitem priced into static bands — a non-equi join
    * against a 10-row generated dimension (BroadcastNestedLoopJoin;
    * the broadcast side is tiny, so the NLJ is the right plan at any
    * scale). */
  private def priceBands(spark: SparkSession): DataFrame =
    spark.range(0, 10)
      .select(col("id").as("band_id"),
        (col("id") * 10000.0).as("lo"), ((col("id") + 1) * 10000.0).as("hi"))

  def rangeJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(priceBands(spark)),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("band_revenue"))

  /** Range join WITHOUT broadcast: overlap-binning turns the
    * interval predicate into an equi-join. Each range row explodes
    * into the fixed-width bins it covers; each fact row hashes to
    * exactly one bin; the residual interval predicate filters
    * bin-collisions after the hash join. Use when the RANGES side is
    * too big to broadcast — Spark's native plan for that case is a
    * nested-loop join, O(|fact|·|ranges|), while this is
    * O(|fact| + |ranges|·span/binWidth + matches) with an ordinary
    * shuffled equi-join's scale behavior (AQE, skew split, spill).
    * Pick binWidth near the median range span: wider ⇒ fewer
    * replicas per range but more false bin-collisions to filter. */
  def binnedRangeJoin(fact: DataFrame, ranges: DataFrame, v: String,
      lo: String, hi: String, binWidth: Double,
      hiInclusive: Boolean = false): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val fb = fact.withColumn("__bin", floor(col(v) / binWidth).cast("long"))
    val rb = ranges.withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val residual =
      if (hiInclusive) col(v) >= col(lo) && col(v) <= col(hi)
      else col(v) >= col(lo) && col(v) < col(hi)
    fb.join(rb, Seq("__bin")).filter(residual).drop("__bin")
  }

  /** q26's semantics through the binned path (q48): same oracle SQL,
    * different physical strategy — proves the rewrite exact. */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame =
    binnedRangeJoin(Tables.lineitem(spark, dir), priceBands(spark),
      "l_extendedprice", "lo", "hi", binWidth = 10000.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("band_revenue"))

  /** Statistical aggregates: stddev / exact interpolated percentile /
    * Pearson correlation (rounded — co-moment merge order differs
    * between engines at the 1e-12 level). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        // scale-ok: oracle artifact — exact median for DuckDB
        // bit-identity; approx_percentile at scale (q319 contract)
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  /** Ranking window functions: rank / dense_rank / percent_rank /
    * cume_dist / ntile over one total order (unique tiebreak ⇒
    * deterministic, and the rank family shares ONE sort). */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
  }

  /** Ordered collection aggregate: per customer, the sorted list of
    * order keys (sort_array ⇒ deterministic under any shuffle;
    * serialized to CSV so the oracle compare is list-type-agnostic). */
  def arrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      // scale-ok: group = one customer's orders — dimension-bounded
      // fan-in (TPC-H ~10/cust); a pathological hot key would need the
      // q185 rn ≤ cap window guard in front of the collect
      .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey"))))
          .as("orderkeys"),
        count(lit(1)).as("n_orders"))

  /** Sketch aggregates: HyperLogLog approximate distinct counts —
    * the at-scale substitute for exact countDistinct (one pass, fixed
    * memory, mergeable). Not oracled: DuckDB's HLL differs; the spec
    * asserts the estimate brackets the exact count instead. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_rows"))

  /** Array scalar functions over the embedding column. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        array_max(col("embedding")).as("max_val"),
        array_min(col("embedding")).as("min_val"))

  /** Multi-way star join + HAVING: order counts per region/priority
    * keeping only groups with ≥ 20 orders. */
  def havingFilter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 20)
  }

  /** PIVOT: order counts per priority, one column per status. The
    * pivot values are EXPLICIT — at scale an implicit pivot runs an
    * extra distinct-scan job just to discover the columns; coalesce
    * because pivot leaves absent combinations null, while the
    * conditional-agg oracle sums zeros. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** UNPIVOT (melt): wide part metrics → long (metric, value) rows.
    * Value columns are cast to one type up front (unpivot requires
    * it); the operator is a zero-shuffle narrow transform. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("p_retailprice"),
        col("p_size").cast("double").as("p_size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_retailprice"), col("p_size")), "metric", "value")

  /** posexplode: embedding array → one (pos, val) row per element —
    * the lateral-view/ordinality pattern. Bounded to a vec_id slice
    * so the oracle compare stays small; the operator itself is a
    * narrow per-row generator (no shuffle). */
  def posExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))

  /** RANGE-frame window: per customer, total spend over the trailing
    * 30 days — ordered by integer epoch-days so both engines use the
    * same numeric RANGE semantics. RANGE frames are peer-inclusive ⇒
    * deterministic without a tiebreak (unlike ROWS). */
  def rangeFrameSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(datediff(col("o_orderdate"), lit("1970-01-01").cast("date")))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        sum(col("o_totalprice").cast("decimal(28,6)")).over(w)
          .cast("double").as("spend_30d"))
  }

  /** EXACT percentiles per group (`percentile`, not the approx
    * sketch): distributed sort-based exact quantile — the per-group
    * value lists are aggregated partial→final like any other agg, no
    * global sort. Both engines interpolate linearly on the same
    * sorted doubles (`lower + (upper-lower)*frac`), so results are
    * bit-identical; q29 covers the approx path for cardinality, q74
    * the window-function distributions. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        // scale-ok: oracle artifact — exact interpolated percentiles
        // for DuckDB bit-identity; the scaladoc's documented at-scale
        // substitutes are q29 (approx) / q319 / q172
        percentile(col("l_extendedprice"), lit(0.25)).as("p25"),
        percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
        median(col("l_quantity")).as("med_qty"))

  /** CDC-style upsert compaction: latest order per customer —
    * row_number over (key, recency desc) = 1, the keep-latest dedup
    * every incremental ingest needs. One shuffle on the key; at
    * 100 TB the same plan compacts a day's changelog against any
    * partitioning because row_number is per-key, not global. */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderdate"))
  }

  /** Fact⋈fact join: revenue by part brand. `part` SCALES WITH the
    * data (unlike nation/region) so it is NOT hard-broadcast — the
    * plan shuffles both sides on partkey and AQE downgrades to
    * broadcast only when the built side is actually small. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(revenue).as("revenue"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))

  /** ntile quartiles of balance WITHIN each market segment: the
    * window is partitioned, so every segment's ranking runs parallel
    * — a global ntile would funnel 100 TB through one partition (the
    * scale path for global quantile bucketing is percentile_approx
    * boundaries broadcast as a when-chain). Unique (bal, custkey)
    * order makes bucket assignment engine-independent. */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("bucket"))
      .groupBy(col("c_mktsegment"), col("bucket"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
  }

  /** TPC-H Q3 shipping priority: filtered customer dim broadcast,
    * lineitem⋈orders is the only shuffle, top-10 via
    * TakeOrderedAndProject (never a global sort). All three filters
    * are pushed to the parquet scans. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1996-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cut)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cut)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Gaps-and-islands: longest run of consecutive active DAYS per
    * user. day − row_number(day) is constant within a consecutive
    * run (the classic islands key); everything after the distinct is
    * keyed on user_id so one shuffle feeds the window AND both
    * aggregations. */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    Tables.events(spark, dir)
      .select(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .withColumn("grp", date_sub(col("day"), col("rn")))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("streak_len"))
      .groupBy(col("user_id"))
      .agg(max(col("streak_len")).cast("int").as("max_streak"))
  }

  /** max_by/min_by (argmax) with DETERMINISTIC tie-breaks: richest /
    * poorest customer per nation. Ordering key is the (balance,
    * custkey) pair — `array` ordering is lexicographic, and negating
    * the key on the max side makes both sides resolve balance ties
    * to the SMALLEST custkey (what the oracle's join-back + min
    * computes). Single partial→final agg, no window, no join-back —
    * the plan a 100 TB groupwise-argmax wants. */
  def argExtremes(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        max_by(col("c_custkey"),
          array(col("c_acctbal"), -col("c_custkey").cast("double")))
          .as("top_custkey"),
        max(col("c_acctbal")).as("top_bal"),
        min_by(col("c_custkey"),
          array(col("c_acctbal"), col("c_custkey").cast("double")))
          .as("bottom_custkey"),
        min(col("c_acctbal")).as("bottom_bal"))

  /** Exact COUNT(DISTINCT) in its skew-safe two-stage form: first
    * reduce to (group, member) — this stage partially aggregates
    * map-side, so a hot group never funnels raw rows to one task —
    * then count members per group. The single-expression
    * countDistinct compiles to the same expand-based plan for ONE
    * distinct column, but the explicit form composes (e.g. carrying
    * n_events alongside without a second scan) and is the shape to
    * reach for when a hot key OOMs the fused version. Stage 2 counts
    * `user_id` (not `*`) so a NULL key group is excluded from
    * n_users exactly as COUNT(DISTINCT) excludes NULLs, while
    * n_events still sums every row including NULL-user events. */
  def distinctTwoStage(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(col("user_id")).as("n_users"), sum(col("n")).as("n_events"))

  /** TPC-H Q4 (order-priority checking) driven through the SQL
    * surface: `spark.sql` text over registered temp views, with a
    * correlated EXISTS that Catalyst rewrites to the same left-semi
    * plan the DataFrame API builds — one API, one plan. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o.o_orderkey
        |                AND l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Window over an aggregate: each nation's share of its region's
    * revenue. The window runs over the already-aggregated (region,
    * nation) table — a few hundred rows at any data scale — so the
    * second shuffle is free; the expensive star join happens once in
    * [[revenueByNation]]. */
  def revenueShare(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("r_name"))
    revenueByNation(spark, dir)
      .select(col("r_name"), col("n_name"), col("revenue"))
      .withColumn("region_share",
        round(col("revenue") /
          sum(col("revenue").cast("decimal(28,6)")).over(w).cast("double"),
          6))
  }

  /** Supplier-side revenue rollup: lineitem ⋈ supplier on l_suppkey —
    * the one fact→dimension path the rest of the catalog doesn't
    * exercise (customer-side star joins cover the other fork).
    * supplier/nation broadcast; lineitem never shuffles. */
  def supplierRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(revenue).as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"))

  /** Event debounce: keep only the FIRST event of each burst — a
    * burst being consecutive same-(user, type) events each within
    * `gapMin` of its predecessor. One lag window gives exact
    * first-per-session semantics without materializing session ids:
    * within a burst every row's gap to its RAW predecessor is under
    * the threshold except the burst head, so `gap >= threshold OR
    * first` keeps precisely the heads. The dedup shape for
    * double-click/retry storms at ingest; same single shuffle as any
    * per-key window. Gap math in integer microseconds (portable,
    * no DST/rounding surprises). */
  def debounceEvents(spark: SparkSession, dir: String,
      gapMin: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") >= gapMin * 60L * 1000000L)
      .drop("prev_us")
  }

  /** Point-in-time (temporal) join against an SCD2 dimension built
    * with [[scd2Periods]]' window shape: purchase facts resolve the
    * signup-version valid AT their timestamp. The plan property that
    * makes this scale: the join keeps an EQUI key (user_id) so Spark
    * picks a hash join partitioned by user, and the period bounds
    * are a residual filter — never a nested loop. Facts before a
    * user's first version drop (inner); versions tile half-open
    * [valid_from, valid_to), so exactly one version matches any
    * in-range fact. */
  def pointInTimeJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dim = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("d_user"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        row_number().over(w).as("version_no"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(dim, col("user_id") === col("d_user") &&
        col("valid_from") <= col("ts") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("event_id"), col("user_id"), col("ts"), col("version_no"))
  }

  /** Incremental DISTINCT maintenance — the sketch counterpart to
    * [[incrementalDailyAgg]]: exact counts merge by addition, but
    * distincts don't (users active on two days must not double-
    * count), so the rollup stores a DataSketches HLL PER (type, day)
    * and answers "distinct users over any day range" by UNIONING
    * sketches — never rescanning events. Base and delta sketch
    * tables merge exactly like the exact rollup's partials; the
    * estimate is taken only at read time. This is how daily-uniques
    * dashboards stay O(days × types) state at 100 TB/day. Rows-only
    * at the gate (sketch internals are engine-specific); the spec
    * brackets the estimate against exact COUNT(DISTINCT). */
  def incrementalDistinct(spark: SparkSession, dir: String,
      cut: String = "2024-01-20"): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("user_id"))
    def sketch(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val base = sketch(ev.filter(col("day") < lit(cut).cast("timestamp")))
    val delta = sketch(ev.filter(col("day") >= lit(cut).cast("timestamp")))
    base.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .cast("long").as("est_users"),
        count(lit(1)).as("n_day_sketches"))
  }

  /** K-minimum-values distinct estimator (q169) — the PORTABLE
    * sketch twin of the HLL paths (q29/q133): where Spark's HLL++
    * registers are engine-internal and gate rows-only, KMV's math is
    * pure order statistics an external engine reproduces verbatim.
    * h(user) = first 8 hex of md5 in [0, 2³²); keep the k smallest
    * DISTINCT hashes per group; when fewer than k exist the count is
    * EXACT, otherwise est = (k−1)·2³² / h_k (the classic KMV
    * estimator, σ ≈ 1/√(k−2)).
    *
    * Scale shape: the raw stream reduces to distinct
    * (group, hash) FIRST (one shuffle, map-side partial); the
    * per-group k-smallest cut is a bounded window over that reduced
    * table. KMV is mergeable — union two min-sets, re-take the k
    * smallest — so per-partition / per-day sketch tables compose
    * exactly like the q133 HLL table. */
  /** Portable 32-bit hash (first 8 md5 hex chars) — the same
    * primitive as `Sampling.hashBucket` without the modulus; shared
    * by both KMV paths so the DuckDB oracles stay in lockstep. */
  private def md5Hash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Shared KMV estimator tail: distinct (event_type, h) rows →
    * k-smallest cut → (event_type, n_kept, est_users). */
  private def kmvEstimate(hashes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    hashes.distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("event_type"), col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1) * 4294967296.0) / col("hk").cast("double")),
          4).as("est_users"))
  }

  def kmvDistinct(spark: SparkSession, dir: String,
      k: Int = 64): DataFrame =
    kmvEstimate(Tables.events(spark, dir)
      .select(col("event_type"), md5Hash32(col("user_id")).as("h")), k)

  /** KMV accuracy audit (q243) — the q167-style ground-truth report
    * for the distinct-count sketch: per group, the KMV estimate next
    * to the EXACT distinct count and the relative error. The exact
    * side is the expensive one — that is the point of an accuracy
    * audit (run at tuning time to size k, not in steady state; the
    * production path stays sketch-only). One extra exact-distinct
    * aggregate, one tiny join. */
  def kmvAccuracy(spark: SparkSession, dir: String, k: Int = 64)
      : DataFrame = {
    val exact = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    kmvDistinct(spark, dir, k)
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("est_users"),
        round(abs(col("est_users") - col("exact_users").cast("double"))
          / col("exact_users").cast("double"), 6).as("rel_err"))
  }

  /** Incremental distinct maintenance with a PORTABLE mergeable
    * sketch (q171) — the hash-gated upgrade of the q133 HLL
    * day-sketch pattern: per (event_type, day) keep a KMV min-set
    * (the k smallest distinct md5 hashes); merging day sketches =
    * union the min-sets and re-take the k smallest. A globally
    * k-smallest hash is k-smallest within its own day too, so the
    * merge reconstructs EXACTLY the state one scan over all days
    * would build — the oracle is therefore the single-pass q169 SQL,
    * and hash-matching it PROVES merge ≡ full recompute (what q133
    * can only spec-assert, since HLL registers aren't portable).
    * At scale: day tables are ≤ k longs per group-day, the daily
    * append touches one day of events, and the merge is a window
    * over k·days rows per group. */
  def incrementalKmv(spark: SparkSession, dir: String,
      cut: String = "2024-01-20", k: Int = 64): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        md5Hash32(col("user_id")).as("h"))
    val wDay = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("h"))
    def sketch(df: DataFrame): DataFrame =
      df.distinct()
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") <= k)
        .select(col("event_type"), col("day"), col("h"))
    val base  = sketch(ev.filter(col("day") <  lit(cut).cast("timestamp")))
    val delta = sketch(ev.filter(col("day") >= lit(cut).cast("timestamp")))
    kmvEstimate(
      base.unionByName(delta).select(col("event_type"), col("h")), k)
  }

  /** DAU / trailing-7-day WAU stickiness — the engagement staple.
    * Distinct (day, user) pairs reduce the event stream FIRST (the
    * only pass over raw events). The trailing window is then made
    * EQUI-shaped: each (day, user) pair is exploded into its ≤ 7
    * future anchor days (`sequence(day, day+6)`), and anchors that
    * never had activity are dropped with a broadcast semi join on
    * the tiny distinct-day table. That keeps the documented ≤ 7×
    * row amplification but runs as hash join + hash aggregate — a
    * plain inequality self-join here would compile to a
    * BroadcastNestedLoopJoin whose *comparison* cost is
    * |days| × |day×user|, quadratic in the date range at 100 TB.
    * [[stickinessApprox]] is the sketch path when day×user itself
    * is too big to shuffle. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    // du feeds THREE branches (anchors, dau, the exploded contrib) —
    // persisted so "the only pass over raw events" is literally true:
    // without the barrier Catalyst re-expands the distinct subtree
    // per branch and the corpus is scanned three times. day×user is
    // tiny next to the event stream (CacheManager dedupes repeated
    // calls by plan equality).
    val du = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchors = du.select(col("day")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    // a pair active on day d counts toward anchors d..d+6, i.e. the
    // anchor's window (anchor-7, anchor] — same semantics as the
    // range predicate `d2 <= day && d2 > day - 7 days`, equi-shaped
    val contrib = du.select(
      explode(sequence(col("day"),
        col("day") + expr("INTERVAL 6 DAYS"),
        expr("INTERVAL 1 DAY"))).as("day"),
      col("user_id"))
    val wau = contrib
      .join(broadcast(anchors), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** Approximate stickiness for when even the distinct day×user
    * table is too big to shuffle: one HLL sketch per day (the only
    * pass over events), then each day's sketch — kilobytes, not the
    * user list — is exploded to its ≤ 7 anchor days and union-merged
    * per anchor. DAU and WAU both come from sketch estimates so the
    * ratio is internally consistent. State per anchor is O(sketch),
    * independent of user count; the explode/semi-join shape matches
    * [[stickiness]] so the plan stays equi-join only. */
  def stickinessApprox(spark: SparkSession, dir: String): DataFrame = {
    // persisted for the same three-branch reason as [[stickiness]]'s
    // du — one sketch pass over events, kilobytes per day retained
    val daySk = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchors = daySk.select(col("day"))
    val dau = daySk.select(col("day"),
      hll_sketch_estimate(col("sk")).cast("long").as("dau"))
    val contrib = daySk.select(
      explode(sequence(col("day"),
        col("day") + expr("INTERVAL 6 DAYS"),
        expr("INTERVAL 1 DAY"))).as("day"),
      col("sk"))
    val wau = contrib
      .join(broadcast(anchors), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .cast("long").as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** Batch MERGE (upsert) for immutable-format tables: new/changed
    * rows replace their base versions, everything else passes
    * through — `base ANTI-JOIN updates  UNION ALL  updates`, the
    * rewrite every parquet-backed warehouse runs under its MERGE
    * INTO. The anti join keys on the primary key only; at 100 TB
    * compose with partition pruning so only partitions containing
    * updated keys rewrite (partition column in the join key makes
    * the pruning static). */
  def mergeUpsert(base: DataFrame, updates: DataFrame,
      key: String): DataFrame =
    base.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)

  /** The q131 query: apply a deterministic update batch (every
    * BUILDING customer's balance re-graded) to the customer table
    * via [[mergeUpsert]], reduced to a per-segment audit. */
  def upsertCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val updates = c.filter(col("c_mktsegment") === "BUILDING")
      .withColumn("c_acctbal", round(col("c_acctbal") * 1.1 + 100.0, 2))
    mergeUpsert(c, updates, "c_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_bal"))
  }

  /** Referential-integrity audit — the constraint checks an engine
    * without enforced constraints must RUN as queries: primary-key
    * uniqueness (count vs distinct count) and foreign-key orphans
    * (anti joins, ids only) across the schema's core relationships.
    * Each check is one aggregate or one anti-join count; the union
    * of one-row audits is the standard post-load gate at any scale. */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    // each check is a LAZY one-row frame; the union collects in ONE
    // job (four independent DAG branches scheduled together), not
    // four driver-synchronized actions
    def named(name: String, one: DataFrame): DataFrame =
      one.select(lit(name).as("check_name"),
        col(one.columns.head).cast("long").as("n_violations"))
    named("pk_orders_unique",
      o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("d")))
      .unionByName(named("pk_lineitem_unique",
        li.agg((count(lit(1)) -
          countDistinct(col("l_orderkey"), col("l_linenumber"))).as("d"))))
      .unionByName(named("fk_lineitem_orders",
        li.select(col("l_orderkey"))
          .join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("d"))))
      .unionByName(named("fk_orders_customer",
        o.select(col("o_custkey"))
          .join(c.select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("d"))))
  }

  /** Incremental aggregate maintenance — the rollup pattern that
    * never rescans history: yesterday's materialized daily rollup
    * (base) merges with today's increment (delta) by re-aggregating
    * PARTIAL aggregates (counts add; sums add through the same
    * decimal accumulation as the original), giving exactly the
    * full-recompute table. At 100 TB the base is a tiny rollup read,
    * the delta scans one day's partition, and the merge shuffles
    * |groups| rows — the full recompute the oracle runs here is the
    * thing this operator exists to avoid. Late-arriving data lands
    * as another delta; merge is associative so any grouping of
    * increments converges to the same table. */
  def incrementalDailyAgg(spark: SparkSession, dir: String,
      cut: String = "2024-01-20"): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("value"))
    def rollup(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val base = rollup(ev.filter(col("day") < lit(cut).cast("timestamp")))
    val delta = rollup(ev.filter(col("day") >= lit(cut).cast("timestamp")))
    base.unionByName(delta)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n_events")).as("n_events"),
        dsum(col("sum_value")).as("sum_value"))
  }

  /** TPC-H Q5 (local supplier volume): revenue by nation where the
    * ordering customer and the line's supplier sit in the SAME
    * nation, one region, one year. The interesting plan property is
    * the double nation constraint: customer and supplier each join
    * their dims, and `c_nationkey = s_nationkey` closes the cycle as
    * a residual equi-condition. Shuffle joins only where both sides
    * are facts (lineitem⋈orders, orders⋈customer); supplier/nation/
    * region broadcast; the year filter pushes to the orders scan. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(revenue).as("revenue"))
  }

  /** TPC-H Q10 (returned-item reporting): revenue lost to returns per
    * customer over one quarter, top 20. The quarter filter prunes
    * orders scan-side and the R-flag filter prunes lineitem
    * scan-side BEFORE the fact⋈fact join — the predicate-pushdown
    * shape that matters at 100 TB. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 (promotion effect): promo revenue share of one
    * month's shipments — conditional aggregation over a broadcast
    * part join, one output row. Both sums come from the same pass;
    * the share divides AFTER the decimal-exact sums surface as
    * doubles, so the ratio is partitioning-stable. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0)))
          .as("promo_rev"),
        dsum(revenue).as("total_rev"))
      .select(round(lit(100.0) * col("promo_rev") / col("total_rev"), 4)
        .as("promo_share_pct"), col("promo_rev"), col("total_rev"))

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds a threshold, with customer context. The HAVING reduces
    * lineitem to a small qualifying-order set BEFORE any dimension
    * join — aggregate-then-join, never join-then-aggregate, which is
    * the difference between shuffling keys and shuffling the fact
    * table twice. */
  def largeOrders(spark: SparkSession, dir: String,
      minQty: Double = 150.0): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q7 (volume shipping): revenue flowing between two specific
    * nations, split by which side supplied and which consumed, per
    * ship year. The join graph touches BOTH dimension paths of the
    * schema at once — lineitem→supplier→nation on the supply side,
    * lineitem→orders→customer→nation on the demand side — with the
    * pair filter as a residual OR over the two direction tuples.
    * Both nation dims broadcast under distinct aliases (they are the
    * same table twice — aliasing, not re-reading, is what keeps
    * Catalyst from conflating the two sides). */
  def volumeShipping(spark: SparkSession, dir: String,
      n1: String = "NATION_1", n2: String = "NATION_2"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val supN = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cusN = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(supN), s("s_nationkey") === col("sn_key"))
      .join(broadcast(cusN), c("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(revenue).as("revenue"))
  }

  /** TPC-H Q8 (national market share): one nation's share of a
    * region's revenue for one part type, per order year. Conditional
    * aggregation over the full star — share = Σ(nation's volume) /
    * Σ(all volume), both from ONE pass; the division happens after
    * the decimal-exact sums surface, so the ratio is
    * partitioning-stable (same discipline as promoRevenue). */
  def marketShare(spark: SparkSession, dir: String,
      nation: String = "NATION_3", region: String = "ASIA",
      ptype: String = "ECONOMY"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_type") === ptype)
    val supN = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cusN = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(cusN), c("c_nationkey") === col("cn_key"))
      .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(supN), s("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        dsum(when(col("supp_nation") === nation, revenue).otherwise(lit(0.0)))
          .as("nation_rev"),
        dsum(revenue).as("total_rev"))
      .select(col("o_year"),
        round(col("nation_rev") / col("total_rev"), 6).as("mkt_share"),
        col("nation_rev"), col("total_rev"))
  }

  /** TPC-H Q6 (forecasting revenue change): pure filter+aggregate —
    * no join at all. Its whole value is the SCAN: all three
    * predicates (date range, discount band, quantity cap) push to
    * the parquet reader, so the job reads row groups, not the table.
    * The one-row answer is what a 100 TB scan-shaped query should
    * cost: IO × selectivity. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q13 (customer distribution): how many customers placed
    * exactly k orders — INCLUDING zero (the left outer join is the
    * point; an inner join silently drops the never-ordered cohort,
    * which is usually the business question). Double aggregation:
    * orders-per-customer, then customers-per-count. */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q22-shaped (churned high-value customers): customers
    * whose balance beats the positive-balance average but who placed
    * NO order in the recent window — a scalar aggregate subquery
    * (broadcast single row) composed with an ANTI join against the
    * date-pruned order scan, grouped by a derived "country code"
    * (nationkey band stands in for the reference's phone prefix).
    * The anti join keys on custkey only — the 100 TB shape where the
    * order list shuffles ids, never rows — and the recency predicate
    * prunes the order scan before the ids are even extracted. */
  def salesOpportunity(spark: SparkSession, dir: String,
      since: String = "2000-01-01"): DataFrame = {
    val avgBal = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    Tables.customer(spark, dir)
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 5).cast("int").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
  }

  /** TPC-H Q17 (small-quantity-order revenue): lineitems whose
    * quantity is under 20% of their part's average quantity. The
    * correlated aggregate is computed as a WINDOW over the same scan
    * — one pass, no self-join re-read (the same one-scan argument as
    * tfidf's df) — and the brand filter narrows the window's
    * partition population scan-side. */
  def smallQuantityRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#13"): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_brand") === brand)
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("avg_yearly_rev_base"),
        count(lit(1)).as("n_small"))
  }

  /** TPC-H Q9-shaped (product-type profit): per supplier-nation,
    * per order year, profit ≈ revenue − cost (p_retailprice × qty
    * standing in for the missing partsupp supplycost). Full
    * fact⋈fact⋈dims star with only the two fact joins shuffling. */
  def productProfit(spark: SparkSession, dir: String,
      namePart: String = "widget"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val s = Tables.supplier(spark, dir)
    val p = Tables.part(spark, dir)
      .filter(col("p_name").contains(namePart))
    val n = Tables.nation(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(dsum(revenue - col("p_retailprice") * col("l_quantity") * 0.1)
        .as("profit"))
  }

  /** TPC-H Q19-shaped disjunctive-predicate join: revenue from three
    * OR'd (brand, size-range, quantity-range) branches. The partkey
    * equi-condition extracts cleanly so the join stays hash/broadcast
    * (NOT a nested loop — the classic Q19 planner trap); the
    * disjunction evaluates as a residual filter, and the shared
    * `l_quantity <= 40` bound pushes to the lineitem scan. */
  def brandDisjunction(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir).filter(col("l_quantity") <= 40.0)
    val branch = (brand: String, szLo: Int, szHi: Int, qLo: Double, qHi: Double) =>
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#13", 1, 10, 1.0, 20.0) ||
        branch("Brand#20", 10, 20, 10.0, 30.0) ||
        branch("Brand#23", 20, 30, 20.0, 40.0))
      .agg(dsum(revenue).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** GLOBAL quantile bucketing via broadcast boundaries: quartile
    * cutoffs from ONE aggregate (3 doubles), broadcast back over the
    * fact scan as comparisons — no global window, no
    * single-partition ntile funnel (contrast q83, which ntiles
    * WITHIN segments and documents this as the global path). Value
    * semantics (v > pXX), not row-position semantics: rows equal to
    * a boundary all land in the lower bucket, so buckets are
    * value-deterministic under any partitioning.
    *
    * The boundary fit here is EXACT `percentile` because the oracle
    * needs bit-identical cutoffs; exact percentile buffers the
    * column per group, so at 100 TB the production swap is
    * `approx_percentile` (mergeable sketch, no buffering) — the
    * broadcast-boundaries PATTERN is identical either way. */
  def quantileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val bounds = o.agg(
      // scale-ok: the ORACLE fit (q95 bit-identity) — measured 151× +
      // OOM at 100× (BASELINE r11); the catalog-gated production twin
      // is q319 = quantileBucketsApprox below (2.2× at 100×)
      percentile(col("o_totalprice"), lit(0.25)).as("p25"),
      percentile(col("o_totalprice"), lit(0.5)).as("p50"),
      percentile(col("o_totalprice"), lit(0.75)).as("p75"))
    o.join(broadcast(bounds))
      .select(col("o_totalprice"),
        (lit(1) + (col("o_totalprice") > col("p25")).cast("int")
          + (col("o_totalprice") > col("p50")).cast("int")
          + (col("o_totalprice") > col("p75")).cast("int")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  /** PRODUCTION path for [[quantileBuckets]]: identical broadcast-
    * boundaries plan with the fit swapped to `approx_percentile`
    * (KLL-style mergeable sketch — one map-side sketch per
    * partition, merged on the driver side of the agg; NO per-group
    * value buffering, so the fit is O(sketch) memory at any scale).
    * `accuracy` is the sketch's 1/ε knob: 10_000 bounds rank error
    * at 0.01 % of rows, which moves bucket populations by at most
    * that fraction around each cutoff — the spec asserts exactly
    * that tolerance against the exact path. q95 keeps the exact fit
    * because the DuckDB oracle needs bit-identical cutoffs; at
    * 100 TB this is the method to call. */
  def quantileBucketsApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val o = Tables.orders(spark, dir)
    val bounds = o.agg(
      approx_percentile(col("o_totalprice"), lit(0.25), lit(accuracy)).as("p25"),
      approx_percentile(col("o_totalprice"), lit(0.5), lit(accuracy)).as("p50"),
      approx_percentile(col("o_totalprice"), lit(0.75), lit(accuracy)).as("p75"))
    o.join(broadcast(bounds))
      .select(col("o_totalprice"),
        (lit(1) + (col("o_totalprice") > col("p25")).cast("int")
          + (col("o_totalprice") > col("p50")).cast("int")
          + (col("o_totalprice") > col("p75")).cast("int")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  /** Mergeable equi-width histogram quantiles (q172) — the PORTABLE
    * twin of the [[quantileBucketsApprox]] sketch path: per-group
    * counts in `bins` fixed-width buckets over the group's [min, max]
    * are trivially mergeable (vector addition across partitions /
    * days), and the p-quantile is linear interpolation inside the
    * bucket where the cumulative count crosses p·N. Unlike the
    * KLL-style approx_percentile sketch (whose internals DuckDB
    * cannot replay) every number here is reproducible arithmetic —
    * hash-gated end to end.
    *
    * Scale shape: pass 1 is a 3-value-per-group aggregate (min, max,
    * count) broadcast back; pass 2 is one groupBy over (group,
    * bucket) — `bins` rows per group regardless of data size; the
    * crossing search is a window over those tiny tables. Error is
    * bounded by bucket width (range/bins), the classic
    * fixed-histogram trade. */
  def histogramQuantiles(spark: SparkSession, dir: String,
      bins: Int = 100,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    val bounds = li.groupBy(col("l_returnflag").as("g"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("n"))
    val binned = li
      .join(broadcast(bounds), col("l_returnflag") === col("g"))
      .withColumn("w", (col("hi") - col("lo")) / bins)
      .withColumn("b",
        least(lit((bins - 1).toLong), floor((col("x") - col("lo")) / col("w"))))
      .groupBy(col("l_returnflag"), col("b"))
      .agg(count(lit(1)).as("c"),
        first(col("lo")).as("lo"), first(col("w")).as("w"),
        first(col("n")).as("n"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("cum", sum(col("c")).over(wCum))
    cum
      .select(col("*"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("target", col("p") * col("n").cast("double"))
      .filter(col("cum").cast("double") >= col("target") &&
        (col("cum") - col("c")).cast("double") < col("target"))
      .select(col("l_returnflag"), col("p"),
        round(col("lo") + col("w") * (col("b").cast("double") +
          (col("target") - (col("cum") - col("c")).cast("double")) /
            col("c").cast("double")), 6).as("est"))
  }

  /** SCD2 (slowly-changing-dimension type 2) period build from an
    * event log: each user event opens a version valid from its
    * timestamp until the user's next event (`lead`), the last
    * version staying open (`valid_to` NULL, `is_current` true) —
    * the standard warehouse pattern for turning CDC/event streams
    * into point-in-time-joinable dimensions (the as-of joins q25/
    * q102 would then probe). One shuffle on user_id feeds both
    * window functions; no self-join. Ties on ts break by event_id so
    * versions are total-ordered deterministically. */
  def scd2Periods(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .select(col("user_id"),
        row_number().over(w).as("version_no"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        lead(col("ts"), 1).over(w).isNull.as("is_current"),
        round(col("value"), 4).as("attr_value"))
  }

  /** TPC-H Q15 (top supplier): the supplier(s) with the maximum
    * 3-month revenue — the "view + scalar max + equality" query. The
    * revenue "view" is one date-pruned scan aggregated by suppkey;
    * the tie-preserving max-equality runs as a GLOBAL max window
    * over THAT rollup — |suppliers| rows (dimension-scale at any
    * corpus size), so the single-partition window is a few KB, and
    * the fact table is genuinely read once (the scalar-subquery
    * formulation re-scans lineitem for the max branch: Catalyst
    * can't reuse the exchange across the join's two subtrees).
    * Revenue rounds through decimal before the comparison so "the"
    * max is partitioning-stable. */
  def topSupplier(spark: SparkSession, dir: String,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(revenue).as("total_revenue"))
    rev
      .withColumn("max_revenue",
        max(col("total_revenue")).over(Window.partitionBy()))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q12-shaped (shipping-mode priority classes): for slow
    * shipments — lines shipped more than `lateDays` after their
    * order date — count high-priority vs other orders per line
    * status. ADAPTED to this dataset's columns: the testdata schema
    * carries no l_shipmode/l_commitdate/l_receiptdate, so lateness
    * derives from l_shipdate vs o_orderdate and l_linestatus stands
    * in as the grouping class; the analytic shape (join + derived
    * lateness predicate + conditional two-way counts) is Q12's.
    * Orders project to (key, date, priority) before the join, and
    * the high-priority test is a codegen'd CASE — one shuffle, one
    * pass. */
  def shipmodePriority(spark: SparkSession, dir: String,
      lateDays: Int = 90): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(hi.cast("long")).as("high_line_count"),
        sum((!hi).cast("long")).as("low_line_count"))
  }

  /** TPC-H Q21-shaped (suppliers who kept orders waiting): for
    * finished ('F') orders with at least two distinct suppliers,
    * find the supplier that was the ONLY late one on the order.
    * ADAPTED lateness (no l_receiptdate/l_commitdate in this
    * schema): a line is late when it ships more than `lateDays`
    * after the order date. The classic EXISTS/NOT-EXISTS pair
    * becomes one per-(order, supplier) aggregation carrying
    * order-level window counts — n suppliers on the order, n late
    * suppliers — so "another supplier exists" and "no OTHER
    * supplier was late" are column predicates, not two more joins
    * against lineitem. lineitem is scanned once, shuffled once on
    * l_orderkey; supplier names broadcast at the end. */
  def waitingSuppliers(spark: SparkSession, dir: String,
      lateDays: Int = 90, topN: Int = 100): DataFrame = {
    // repartition by l_orderkey BEFORE the pair aggregation:
    // HashPartitioning(l_orderkey) satisfies the clustered
    // distribution of groupBy(l_orderkey, l_suppkey) AND the window's
    // partitionBy(l_orderkey), so both run on ONE shuffle — without
    // it Spark shuffles on the pair for the agg and again on
    // l_orderkey for the window
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).cast("int"))
        .as("is_late"))
    val w = Window.partitionBy(col("l_orderkey"))
    val flagged = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("is_late")).over(w))
    flagged
      .filter(col("is_late") === 1 && col("n_supp") >= 2 &&
        col("n_late") === 1)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(topN)
  }

  /** first_value / last_value / nth_value over a FULL frame (the
    * UNBOUNDED FOLLOWING shape that trips engines defaulting to
    * CURRENT ROW), collapsed to one row per customer. */
  def firstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .distinct()
  }

  /** TPC-H Q2-shaped (minimum-cost supplier): for each qualifying
    * part, the supplier(s) in a region offering the lowest supply
    * cost. ADAPTED to this schema (no partsupp table): the
    * part-supplier relation and its cost derive from lineitem —
    * supplycost(part, supp) = MIN(l_extendedprice / l_quantity),
    * the best observed unit price. The classic correlated
    * MIN-subquery becomes a window MIN over partkey.
    *
    * Scale shape: part and the region-filtered supplier dim both
    * broadcast BEFORE the pair aggregation, so lineitem is scanned
    * once and shuffled once — the explicit repartition(l_partkey)
    * makes that single exchange satisfy BOTH the pair groupBy and
    * the window's partitionBy (same trick as waitingSuppliers).
    * The final ORDER BY + LIMIT is TakeOrderedAndProject with a
    * unique (p_partkey, s_name) tiebreak so the cut is
    * deterministic. */
  def minCostSupplier(spark: SparkSession, dir: String,
      regionName: String = "EUROPE", maxSize: Int = 10,
      partType: String = "SMALL", topN: Int = 100): DataFrame = {
    val suppIn = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name")))
    val partsIn = broadcast(Tables.part(spark, dir)
      .filter(col("p_size") <= maxSize && col("p_type") === partType)
      .select(col("p_partkey"), col("p_type")))
    val pairCost = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      .join(partsIn, col("l_partkey") === col("p_partkey"))
      .join(suppIn, col("l_suppkey") === col("s_suppkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_cost")).as("supplycost"),
        first(col("p_type")).as("p_type"),
        first(col("s_name")).as("s_name"),
        first(col("s_acctbal")).as("s_acctbal"),
        first(col("n_name")).as("n_name"))
    val w = Window.partitionBy(col("l_partkey"))
    pairCost
      .withColumn("min_cost", min(col("supplycost")).over(w))
      .filter(col("supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_type"),
        col("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(topN)
  }

  /** TPC-H Q11-shaped (important stock): parts whose total traded
    * value through one nation's suppliers exceeds a fraction of that
    * nation's total. ADAPTED (no partsupp): value(part) =
    * SUM(l_extendedprice) over the nation's lineitem. The scalar
    * threshold subquery is a 1-row aggregate cross-joined back —
    * a broadcast of three machine words, never a second shuffle of
    * the fact table. Both the per-part values and the grand total
    * go through DECIMAL(28,6) so the threshold comparison is
    * bit-identical across engines. */
  def importantParts(spark: SparkSession, dir: String,
      nationName: String = "NATION_7", frac: Double = 0.0015): DataFrame = {
    val suppIn = broadcast(Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")))
    val sv = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(suppIn, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(dsum(col("l_extendedprice")).as("value"))
    val cutoff = sv.agg(
      (dsum(col("value")) * lit(frac)).as("cutoff"))
    // 1-row broadcast nested-loop with the predicate AS the join
    // condition (the q21 aboveAvg pattern) — no cross-join config.
    sv.join(broadcast(cutoff), col("value") > col("cutoff"))
      .select(col("partkey"), col("value"))
  }

  /** TPC-H Q16-shaped (parts/supplier relationship): how many
    * distinct suppliers serve each (brand, type, size) bucket,
    * excluding one brand, one type, non-square sizes, and suppliers
    * flagged "complaints". ADAPTED: the part-supplier relation is
    * lineitem's (l_partkey, l_suppkey) pairs; the complaints flag
    * (a comment-field LIKE in classic Q16) is s_acctbal < 0.
    * COUNT(DISTINCT suppkey) over raw pair rows equals the classic
    * distinct-pair + count form, so no pre-distinct shuffle is
    * needed — one scan, broadcast filters, one two-stage distinct
    * aggregation. The NOT-IN-with-nulls trap is avoided outright:
    * the exclusion is a broadcast LEFT ANTI join. */
  def supplierCounts(spark: SparkSession, dir: String,
      notBrand: String = "Brand#5", notType: String = "MEDIUM",
      sizes: Seq[Int] = Seq(1, 4, 9, 16, 25, 36, 49)): DataFrame = {
    val flagged = broadcast(Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey")))
    val partsIn = broadcast(Tables.part(spark, dir)
      .filter(col("p_brand") =!= notBrand && col("p_type") =!= notType &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size")))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(partsIn, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20-shaped (potential part promotion): suppliers in the
    * given nations who DOMINATED a qualifying part's supply in a
    * year. ADAPTED (no partsupp.availqty): "has excess stock"
    * becomes "shipped more than `share` of the part's total
    * quantity that year" — the same nested-aggregate-subquery
    * analytic shape (per-pair qty vs per-part total) resolved as a
    * window SUM over one pair aggregation. The part-name prefix
    * filter broadcasts into the lineitem scan BEFORE any shuffle
    * (a part's total is unaffected by which parts qualify, so
    * pushing the filter early is semantics-preserving); the final
    * supplier lookup is a broadcast semi join on the tiny dominant
    * set. */
  def dominantSuppliers(spark: SparkSession, dir: String,
      namePrefix: String = "red",
      nations: Seq[String] = Seq("NATION_3", "NATION_8", "NATION_12",
        "NATION_20"),
      from: String = "1996-01-01", until: String = "1997-01-01",
      share: Double = 0.5): DataFrame = {
    val partsIn = broadcast(Tables.part(spark, dir)
      .filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey")))
    val pairQty = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(partsIn, col("l_partkey") === col("p_partkey"))
      .repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("supp_qty"))
    val w = Window.partitionBy(col("l_partkey"))
    val dominant = pairQty
      .withColumn("total_qty",
        sum(col("supp_qty").cast("decimal(28,6)")).over(w).cast("double"))
      .filter(col("supp_qty") > lit(share) * col("total_qty"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_name"), col("s_acctbal"))
  }

  /** Laspeyres / Paasche / Fisher price indices (q268) — the
    * classic composite "did prices move, holding the basket fixed"
    * aggregates, per month against the first month as base:
    * Laspeyres weights by BASE-period quantities (basket frozen at
    * m₀), Paasche by current quantities, Fisher is their geometric
    * mean. Unit prices come from per-(part, month) decimal-exact
    * revenue/quantity sums (ONE fact scan → a parts × months
    * aggregate; everything after runs on that reduced table); the
    * Σp·q cross terms fold through DECIMAL(28,6) so no float sums in
    * engine order. Only parts present in BOTH base and current month
    * enter (the matched-basket convention). */
  def priceIndex(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"),
        ((year(col("l_shipdate")) - 1992) * 12 +
          month(col("l_shipdate")) - 1).cast("long").as("m"))
      .agg(dsum(col("l_extendedprice")).as("ext"),
        dsum(col("l_quantity")).as("qty"))
      .select(col("l_partkey"), col("m"),
        (col("ext") / col("qty")).as("p"), col("qty"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = pm.crossJoin(broadcast(pm.agg(min(col("m")).as("m0"))))
      .filter(col("m") === col("m0"))
      .select(col("l_partkey"), col("p").as("p0"), col("qty").as("q0"))
    def dfold(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val j = pm.join(base, Seq("l_partkey"))
    j.groupBy(col("m"))
      .agg(count(lit(1)).as("n_parts"),
        dfold(col("p") * col("q0")).as("ptq0"),
        dfold(col("p0") * col("q0")).as("p0q0"),
        dfold(col("p") * col("qty")).as("ptqt"),
        dfold(col("p0") * col("qty")).as("p0qt"))
      .select(col("m").as("month_idx"), col("n_parts"),
        round(col("ptq0") / col("p0q0"), 6).as("laspeyres"),
        round(col("ptqt") / col("p0qt"), 6).as("paasche"),
        round(sqrt((col("ptq0") / col("p0q0")) *
          (col("ptqt") / col("p0qt"))), 6).as("fisher"))
  }

  /** Rolling-origin forecast backtest (q269) — [[seasonalNaiveBacktest]]
    * generalized to K sequential holdout folds (the time-series
    * cross-validation discipline: one holdout window can fluke; K
    * origins estimate the VARIANCE of forecast skill). Same
    * gap-filled day grid and seasonal-naive (lag-7) predictor; each
    * fold is an h-day test window walking back from the series end,
    * assigned by exact integer arithmetic on the reverse rank. APE
    * terms ride the round-6 integer surrogate; each fold's MAPE is
    * one exact division. The grid is days-sized — every window here
    * is bounded-domain. */
  def rollingOriginBacktest(spark: SparkSession, dir: String,
      folds: Int = 4, h: Int = 7): DataFrame = {
    val wAsc = Window.orderBy(col("day"))
    val scored = gapFillDaily(spark, dir)
      .select(col("day"), col("revenue_filled").as("actual"),
        lag(col("revenue_filled"), 7).over(wAsc).as("pred"),
        row_number().over(Window.orderBy(col("day").desc)).as("rev_rn"),
        count(lit(1)).over(Window.partitionBy()).as("n_total"))
    scored.filter(col("rev_rn") <= h * folds && col("pred").isNotNull)
      .withColumn("fold",
        (lit(folds) - 1 - ((col("rev_rn") - 1) / h).cast("long")).cast("int"))
      .groupBy(col("fold"))
      .agg(max(col("n_total")).as("nt"), count(lit(1)).as("n_days"),
        sum(when(col("actual") > 0.0, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("actual") > 0.0,
          round(abs(col("actual") - col("pred")) / col("actual") * 1e6, 0)
            .cast("long")).otherwise(0L)).as("ape_sur"))
      .select(col("fold"),
        (col("nt") - (lit(folds) - col("fold")).cast("long") * h)
          .as("n_train"),
        col("n_days"), col("n_scored"),
        when(col("n_scored") > 0,
          round(col("ape_sur").cast("double") / 1e6
            / col("n_scored").cast("double"), 6)).as("mape"))
  }

  /** Behavioral-entropy census (q264) — per-user event-type entropy
    * and top-type share, rolled into an entropy-bucket histogram:
    * the "how diverse is each user's behaviour" marginal a
    * personalization / anomaly system profiles before modelling
    * (entropy ~0 = single-action bots; high entropy = explorers).
    * One scan folds events to the per-(user, type) count table
    * (bounded by users × type vocabulary); each user's entropy sums
    * ≤ |types| round-12 surrogate terms — exact longs, so the
    * per-user values and the bucket assignment are cross-engine
    * identical — and the census aggregate is a ≤ 8-bucket group-by
    * with decimal-stable means. Per-user rows never leave the
    * executor tier un-aggregated. */
  def behavioralEntropy(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val t = sum(col("n")).over(Window.partitionBy(col("user_id")))
    val p = col("n").cast("double") / col("t").cast("double")
    val perUser = ut.withColumn("t", t)
      .select(col("user_id"), col("t"), col("n"),
        round(p * log(p) * 1e12, 0).cast("long").as("term"))
      .groupBy(col("user_id"))
      .agg(((-sum(col("term"))).cast("double") / 1e12).as("entropy"),
        (max(col("n")).cast("double") / max(col("t")).cast("double"))
          .as("top_share"))
    perUser
      .groupBy(floor(col("entropy") / 0.25).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("entropy").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("mean_entropy"),
        round(sum(col("top_share").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("mean_top_share"))
  }

  /** Theil–Sen robust trend (q252) over the monthly revenue series —
    * the median-of-pairwise-slopes estimator: a single wild month
    * (outage, backfill glitch) drags OLS but moves a median not at
    * all (~29% breakdown point). The series is aggregated FIRST
    * (months, not rows — the fact table folds to ≤ a few hundred
    * points via one decimal-stable group-by), so the O(m²) pair set
    * is a few-thousand-row self-join, trivially distributed and
    * independent of fact-table scale. Medians are exact order
    * statistics ((k·th + (k+1)·th)/2 via one row_number window on
    * the tiny pair/point sets) — never quantile interpolation, whose
    * evaluation order differs across engines. Emits slope (revenue
    * per month), intercept at month 0, and both medians' ranks. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the bounded month grid feeds both slope-pair sides
    // and the residual pass — without it every consumer re-expands
    // the orders scan (the PlanAuditSpec re-expansion guard)
    val monthly = Tables.orders(spark, dir)
      .groupBy(((year(col("o_orderdate")) - 1992) * 12 +
        month(col("o_orderdate")) - 1).cast("long").as("x"))
      .agg(sum(col("o_totalprice").cast("decimal(28,6)")).cast("double")
        .as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = monthly.select(col("x").as("x1"), col("y").as("y1"))
    val b = monthly.select(col("x").as("x2"), col("y").as("y2"))
    val slopes = a.join(b, col("x1") < col("x2"))
      .select(((col("y2") - col("y1")) /
        (col("x2") - col("x1")).cast("double")).as("slope"))
    def medianOf(df: DataFrame, c: String): DataFrame = {
      val rk = df
        .withColumn("rk", row_number().over(Window.orderBy(col(c))))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .withColumn("lowk", floor((col("np") + 1) / 2.0).cast("long"))
        .withColumn("highk", floor((col("np") + 2) / 2.0).cast("long"))
      rk.agg(max(col("np")).as("np"),
          max(when(col("rk") === col("lowk"), col(c))).as("lo"),
          max(when(col("rk") === col("highk"), col(c))).as("hi"))
        .select(col("np"), ((col("lo") + col("hi")) / 2.0).as("med"))
    }
    val slopeMed = medianOf(slopes, "slope")
      .select(col("np").as("n_pairs"), col("med").as("slope_med"))
    val resid = monthly.crossJoin(broadcast(slopeMed))
      .select(col("n_pairs"),
        (col("y") - col("slope_med") * col("x").cast("double"))
          .as("r"))
    val interMed = medianOf(resid.select(col("r")), "r")
      .select(col("np").as("n_points"), col("med").as("intercept_med"))
    slopeMed.crossJoin(broadcast(interMed))
      .select(col("n_points"), col("n_pairs"),
        round(col("slope_med"), 6).as("slope"),
        round(col("intercept_med"), 6).as("intercept"))
  }

  /** Per-brand OLS of quantity on discount (q253) — the grouped
    * closed-form regression a pricing/elasticity sweep runs: slope,
    * intercept and R² per brand from the five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy²), ONE scan + one per-brand aggregate
    * (adding a group never adds a pass; map-side partials collapse
    * per brand before the shuffle — the sufficient-statistic shape is
    * THE distributed regression plan). Inputs snap to exact integer
    * surrogates (discount in centi-units 0..10, quantity integral by
    * generation), so every sum is an exact BIGINT/DECIMAL(38) and
    * each coefficient is one fixed IEEE chain — hash-gates verbatim.
    * Zero-variance groups guard to NULL (ANSI division throws). */
  def olsByBrand(spark: SparkSession, dir: String): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val xy = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_discount") * 100.0, 0).cast("long").as("xi"),
        round(col("l_quantity"), 0).cast("long").as("yi"))
      .join(broadcast(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val s = xy.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("sx"), sum(col("yi")).as("sy"),
        sum(d19(col("xi")) * d19(col("yi"))).as("sxy"),
        sum(d19(col("xi")) * d19(col("xi"))).as("sxx"),
        sum(d19(col("yi")) * d19(col("yi"))).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val sxxVar = n * d("sxx") - d("sx") * d("sx")
    val syyVar = n * d("syy") - d("sy") * d("sy")
    val cov = n * d("sxy") - d("sx") * d("sy")
    s.select(col("p_brand"), col("n"),
      when(sxxVar > 0.0, round(cov / sxxVar, 6)).as("slope_per_pct"),
      when(sxxVar > 0.0,
        round((d("sy") - (cov / sxxVar) * d("sx")) / n, 6)).as("intercept"),
      when(sxxVar > 0.0 && syyVar > 0.0,
        round(cov * cov / (sxxVar * syyVar), 6)).as("r2"))
  }

  /** Snapshot diff (q250) — the CDC-without-a-changelog primitive:
    * given yesterday's and today's full snapshots of a keyed table,
    * classify every key as added / removed / changed / unchanged.
    * The scale shape is the whole point: each side reduces to
    * (key, payload-digest) AT THE SCAN — one fixed-width hash per
    * row crosses the shuffle instead of the row itself — then ONE
    * key-partitioned full outer join classifies in a single pass
    * (change detection is digest inequality, never column-by-column
    * compare after the join). At 100 TB both sides co-partition on
    * the key, and the output audit is four groups, so map-side
    * partials collapse before the final shuffle.
    *
    * The two snapshots are derived deterministically from `orders`
    * (old = keys ∤97; new = keys ∤89, with status rewritten to 'U'
    * on keys |53), so the expected diff is a pure function of the
    * key — the DuckDB oracle rebuilds both sides verbatim. Digest is
    * md5 over a canonical '|'-joined string form (portable); a
    * production run swaps in xxhash64 for an 8-byte digest, same
    * plan. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def digestRow(df: DataFrame): DataFrame =
      df.select(col("o_orderkey").as("key"),
        md5(concat_ws("|", col("o_orderstatus"),
          // centi-unit integer surrogate: double→string differs
          // between engines, the rounded long's string form does not
          round(col("o_totalprice") * 100.0, 0).cast("long").cast("string"),
          col("o_orderdate").cast("date").cast("string"),
          col("o_orderpriority"))).as("digest"))
    val old = digestRow(orders.filter(col("o_orderkey") % 97 =!= 0))
    val neu = digestRow(orders.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 53 === 0, lit("U"))
          .otherwise(col("o_orderstatus"))))
    old.select(col("key"), col("digest").as("old_digest"))
      .join(neu.select(col("key"), col("digest").as("new_digest")),
        Seq("key"), "full_outer")
      .select(col("key"),
        when(col("old_digest").isNull, "added")
          .when(col("new_digest").isNull, "removed")
          .when(col("old_digest") =!= col("new_digest"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
  }
}
