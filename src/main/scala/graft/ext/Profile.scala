package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Column profiling — the data-quality gate of an ingest pipeline
  * (null rates, cardinalities, ranges; what you look at before
  * trusting 100 TB of new parquet).
  *
  * ONE pass: every per-column statistic is an aggregate expression in
  * a single global agg (one scan, one reduce), and the wide result is
  * reshaped to long form plan-side via an array-of-structs explode —
  * no second job, no driver loop. Exact COUNT(DISTINCT …) over many
  * columns expands the aggregate (one shuffle copy per distinct
  * column); at real scale swap in approx_count_distinct, which
  * collapses the expansion at ~2% error — the exact form here is what
  * the cross-engine oracle can check. */
object Profile {

  /** Long-format profile: one row per column with
    * (n_rows, n_null, n_distinct, min_val, max_val) — min/max as
    * double for numeric columns, null otherwise (double-vs-string
    * rendering of numerics is not portable across engines). */
  def profile(df: DataFrame, numericCols: Seq[String],
      otherCols: Seq[String] = Nil): DataFrame = {
    val cols = numericCols ++ otherCols
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs =
      Seq(count(lit(1)).as("n_rows")) ++
        cols.flatMap { c =>
          Seq(count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"))
        } ++
        numericCols.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"mn_$c"),
            max(col(c)).cast("double").as(s"mx_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val (mn, mx) =
        if (numericCols.contains(c)) (col(s"mn_$c"), col(s"mx_$c"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      struct(lit(c).as("column_name"), col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"nn_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        mn.as("min_val"), mx.as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** The q58 query: profile of the lineitem columns a loader would
    * sanity-check first. */
  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.lineitem(spark, dir),
      numericCols = Seq("l_orderkey", "l_quantity", "l_extendedprice"),
      otherCols = Seq("l_returnflag"))

  /** Count–min-sketch heavy-hitter estimates — the third mergeable
    * sketch in the catalog (HLL counts distincts q29, the KLL-style
    * percentile sketch fits quantiles q95-approx; CMS estimates
    * per-item frequencies). One pass builds the sketch
    * (`stat.countMinSketch`, fixed seed ⇒ deterministic), then a tiny
    * watchlist is probed driver-side — the shape for "how often did
    * each of these K tokens appear in 100 TB" without a groupBy over
    * the full token stream. CMS error is ONE-SIDED: estimate ≥ truth,
    * and ≤ truth + eps·N with probability 1-δ — the spec brackets
    * both sides. Rows-only at the gate (DuckDB has no CMS); the
    * bracket spec against exact counts is the correctness story. */
  def cmsTokenCounts(spark: SparkSession, dir: String,
      watchlist: Seq[String] = Seq("the", "a", "and", "of", "to"),
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok"))
    val cms = toks.stat.countMinSketch(col("tok"), eps, confidence, seed = 42)
    watchlist.map(w => (w, cms.estimateCount(w)))
      .toDF("token", "est_count")
      .orderBy(col("token"))
  }

  /** Count–min heavy hitters with PORTABLE hash rows (q170) — the
    * sketch-MATH twin of [[cmsTokenCounts]] (whose
    * `stat.countMinSketch` internals DuckDB cannot reproduce):
    * depth × width counters where row r's hash is the md5-bucket of
    * "r:token" (the q76/q47 portable family), the counter table is a
    * (row, bucket) COUNT over one token scan, and each candidate's
    * estimate is the MIN of its depth counters — CMS's one-sided
    * guarantee (est ≥ truth, ≤ truth + collision mass) holds row for
    * row, and every number is reproducible arithmetic.
    *
    * Scale shape: the counter table is depth·width rows REGARDLESS of
    * corpus size (that is the point of CMS) and broadcasts into the
    * candidate probe. Honesty about the default: probing EVERY
    * distinct token (candidates = None) re-derives what a plain
    * groupBy-count gives — it exists to hash-gate the sketch math at
    * gate scale. The production path passes a bounded `candidates`
    * watchlist (the q122 shape: "how often did each of these K
    * tokens appear in 100 TB"), where the corpus is scanned ONCE for
    * counters and the probe costs K·depth lookups against the
    * broadcast table. */
  def cmsPortableHitters(spark: SparkSession, dir: String,
      depth: Int = 4, width: Int = 256, topN: Int = 10,
      candidates: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    // row-r hash of a token = the repo's ONE portable-hash primitive
    // over the salted key "r:token" — oracle stays in lockstep with
    // every other md5-bucket consumer (q47/q76/q168)
    def bucket(r: Column, t: Column): Column =
      graft.ext.Sampling.hashBucket(
        concat(r.cast("string"), lit(":"), t), width)
    val rowsLit = array((0 until depth).map(lit): _*)
    // persisted: with candidates = None this frame feeds BOTH the
    // counter build and the candidate set — without the barrier the
    // tokenize+explode subtree runs twice (the stickiness lesson)
    val toks = Tables.documents(spark, dir)
      .select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok"))
      .persist()
    val counters = toks
      .select(col("tok"), explode(rowsLit).as("r"))
      .withColumn("b", bucket(col("r"), col("tok")))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
    val cand = candidates match {
      case Some(ws) => ws.toDF("tok")
      case None     => toks.distinct()
    }
    // LEFT join: an empty (r, b) cell is PROOF of absence — a
    // watchlist token the corpus never produced must report
    // est_count = 0 (an inner join would silently drop it, or worse,
    // min() over only its non-empty cells would inflate the estimate)
    cand
      .select(col("tok"), explode(rowsLit).as("r"))
      .withColumn("b", bucket(col("r"), col("tok")))
      .join(broadcast(counters), Seq("r", "b"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
      .orderBy(col("est_count").desc, col("tok"))
      .limit(topN)
  }

  /** k-anonymity audit over a quasi-identifier tuple — the release
    * gate for any dataset that leaves the pipeline (a record is
    * re-identifiable when its QI combination is shared by fewer than
    * k rows). QIs here: (nation, market segment, account-balance
    * kilobucket). ONE groupBy — the audit costs a single shuffle on
    * the QI tuple at any scale; the flag is per GROUP, so the result
    * is |QI-space|-sized, not row-sized. Generalization (coarser
    * buckets) is the dial when too many groups fail. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("int").as("bal_bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("k_anonymous", col("n") >= k)

  /** Pearson chi-square contingency between order priority and order
    * status, emitted PER CELL (observed, expected, contribution):
    * the per-cell form is deterministic — a single total would sum
    * float contributions in engine-dependent order — and more useful
    * anyway (the big cells ARE the finding). Expected counts come
    * from window totals over exact longs (order-independent), and
    * each contribution is a fixed chain of IEEE ops, so the whole
    * table hash-gates. One scan, one small shuffle; the window runs
    * over the |priorities|×|statuses| cell table, not the fact
    * table. */
  def chiSquareCells(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val rowT = sum(col("n")).over(Window.partitionBy(col("o_orderpriority")))
    val colT = sum(col("n")).over(Window.partitionBy(col("o_orderstatus")))
    val grand = sum(col("n")).over(Window.partitionBy())
    cells
      .select(col("o_orderpriority"), col("o_orderstatus"), col("n"),
        (rowT.cast("double") * colT.cast("double") / grand.cast("double"))
          .as("expected"))
      .withColumn("contrib",
        (col("n").cast("double") - col("expected"))
          * (col("n").cast("double") - col("expected")) / col("expected"))
  }
}
