package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic (hash-based) sampling for training-data curation.
  *
  * `df.sample()` draws from a seeded RNG streamed over partitions, so
  * its output changes with partitioning, task retries, and row order —
  * three things a 100 TB pipeline cannot pin down. Hash sampling
  * decides membership per ROW (a pure function of a stable key), so
  * the same corpus always yields the same sample: resumable jobs,
  * reproducible ablations, and consistent joins between a sample and
  * its derived artifacts. The rate dial is exact in expectation and
  * the decision needs no coordination — it vectorizes inside the scan.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a row key: first 8 hex chars
    * of md5(key) as an integer. md5 (not xxhash64) deliberately:
    * every engine agrees on md5 of a decimal string, so the bucket —
    * and therefore the sample — is reproducible outside Spark too
    * (the DuckDB oracle recomputes it verbatim). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep rows whose key-bucket < pct (a deterministic ~pct% sample). */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Stratified deterministic sample: per-stratum keep-percentages
    * (e.g. downsample dominant languages, keep all of rare ones).
    * Unlisted strata fall back to `defaultPct`. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
      pcts: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pctCol = pcts.foldLeft(lit(defaultPct): Column) {
      case (acc, (s, p)) => when(stratum === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(key) < pctCol)
  }

  /** Deterministic train/test split: rows tagged by key-bucket, so
    * the assignment is stable across runs, partitionings, and
    * engines — a document can never drift between splits when the
    * corpus is re-processed, and joining any derived artifact back
    * to its split is exact. The split column rides along; no data
    * moves. */
  def trainTestSplit(df: DataFrame, key: Column, testPct: Int): DataFrame = {
    require(testPct >= 0 && testPct <= 100, "testPct in [0,100]")
    df.withColumn("split",
      when(hashBucket(key) < testPct, lit("test")).otherwise(lit("train")))
  }

  /** The q76 query: per-language split sizes of a 10% held-out test
    * set — the audit table you check before training. */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    trainTestSplit(Tables.documents(spark, dir), col("doc_id"), 10)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))

  /** Leakage-safe train/test split (q168): split assignment is
    * decided per NEAR-DUP CLUSTER, not per document. A plain
    * per-doc hash split ([[trainTestSplit]]) leaks evaluation
    * signal whenever a test document's near-duplicate lands in
    * train — the classic contamination path a q94-style n-gram
    * decontaminator then has to patch after the fact. Hashing the
    * cluster REPRESENTATIVE instead keeps every near-dup family on
    * one side of the boundary by construction; singletons (most of
    * the corpus) hash on their own id, so the split fraction stays
    * ~testPct.
    *
    * Scale shape: the cluster table is the already-sub-quadratic
    * LSH pipeline's output (banded candidates → jaccard verify →
    * min-label components). Its SIZE is data-dependent — one row per
    * document touched by any near-dup edge, which on a dup-heavy
    * web corpus is a large fraction of the corpus — so the join back
    * is deliberately NOT a forced broadcast: it runs as a plain
    * equi-join and AQE downgrades it to a broadcast only when the
    * cluster table actually measures small. The assignment itself is
    * pure per-row column math. Portable md5 bucketing end to end, so
    * the whole chain — clustering included — is hash-gated. */
  def leakageSafeSplit(spark: SparkSession, dir: String,
      testPct: Int = 10, k: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val clusters = graft.ext.Dedup.lshDedupClustersPortable(
      spark, dir, k, threshold)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col("doc_id")))
      .withColumn("split",
        when(hashBucket(col("rep_id")) < testPct, lit("test"))
          .otherwise(lit("train")))
  }

  /** The q47 query: stratified sample of documents by language —
    * half of `en`, a fifth of `fr`, 10% of everything else. */
  def stratifiedDocs(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      col("doc_id"), col("lang"),
      Map("en" -> 50, "fr" -> 20), defaultPct = 10)
      .select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id")).as("bucket"))

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    * keep the k rows maximizing ln(u)/w, where u is a deterministic
    * uniform derived from the row key (the portable md5 pattern of
    * [[hashBucket]] — every engine agrees, so the sample is
    * reproducible outside Spark) and w the row's weight. Equivalent
    * to sequential weighted draws without replacement, but as ONE
    * scan + a global top-k (TakeOrderedAndProject — no full sort,
    * no sequential state, the only shape that works at 100 TB).
    * Here weight = n_chars, so longer documents are
    * proportionally likelier — the "sample by token mass" dial a
    * data-mixing pipeline actually wants. Keys are rounded before
    * ordering (ties then break by doc_id) so the selection is
    * identical in any engine that reproduces the arithmetic.
    * Zero-weight rows (n_chars = 0) get key -Infinity — i.e. they
    * are never drawn while any positive-weight row remains, which is
    * exactly weight-0 semantics. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + 0.5) / 4294967296.0
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("es_key", round(log(u) / col("n_chars").cast("double"), 6))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)
  }

  /** Deterministic EPOCH SHUFFLE — the data-delivery order for
    * multi-epoch training: every (epoch, doc) pair hashes to a
    * reshuffle position via the portable md5 pattern, so each epoch
    * is a different-but-reproducible permutation and any worker can
    * recompute its slice without coordination. Scale shape: hash →
    * `buckets` delivery shards (one shuffle), rank WITHIN each shard
    * (parallel windows) — never a global row_number, which would
    * funnel the corpus through one partition. A reader consumes
    * shard b in `pos` order; (bucket, pos) is a total order over the
    * corpus for a fixed epoch. */
  def epochShuffle(spark: SparkSession, dir: String, epoch: Int = 1,
      buckets: Int = 8): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(lit(epoch.toString), lit(":"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .withColumn("h", h)
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))))
      .select(col("doc_id"), col("bucket"), col("pos"))
  }

  /** Corpus mixing: cap every source at `cap` documents, selected by
    * deterministic hash ORDER (not hash threshold) — a threshold
    * keeps ~pct% but can't hit an exact per-source count; ranking by
    * md5(key) takes exactly min(cap, n) docs per source AND the
    * selection is stable as the corpus grows (a doc already selected
    * stays selected unless new docs hash below it — the property that
    * keeps re-mixed training sets mostly unchanged between snapshots).
    * One shuffle on source; the window ranks inside each source
    * partition in parallel. Emits the per-source audit row (selected
    * count + id checksum) a mixing job logs before training. */
  def corpusMix(spark: SparkSession, dir: String, cap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_available"),
        sum(when(col("rk") <= cap, 1).otherwise(0)).cast("long")
          .as("n_selected"),
        sum(when(col("rk") <= cap, col("doc_id")).otherwise(0L)).cast("long")
          .as("sel_checksum"))
  }

  /** Mixture-to-target sampling: select documents to hit explicit
    * per-stratum COUNTS (the "40% en / 20% fr / …" data-mixture spec
    * every pretraining run starts from), selected within each
    * stratum by the same stable md5-rank as [[corpusMix]] — exact
    * counts where availability allows, graceful shortfall where it
    * doesn't (audit shows n_selected < n_target), and snapshot-stable
    * selection as the corpus grows. The targets join in as a tiny
    * broadcast literal table; one shuffle on the stratum feeds both
    * the rank window and the audit aggregation. */
  def targetMixture(spark: SparkSession, dir: String,
      targets: Map[String, Int] = Map(
        "en" -> 80, "fr" -> 40, "de" -> 20, "es" -> 20, "zh" -> 20))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val caps = targets.toSeq.toDF("lang", "n_target")
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w))
      .join(broadcast(caps), Seq("lang"))
      .groupBy(col("lang"), col("n_target").cast("long").as("n_target"))
      .agg(count(lit(1)).as("n_available"),
        sum(when(col("rk") <= col("n_target"), 1).otherwise(0)).cast("long")
          .as("n_selected"),
        sum(when(col("rk") <= col("n_target"), col("doc_id")).otherwise(0L))
          .cast("long").as("sel_checksum"))
  }

  /** Temperature-scaled domain mixture weights: w_s ∝ n_s^alpha,
    * normalized — the standard multilingual/multi-domain rebalancing
    * (alpha = 1 keeps natural proportions, alpha → 0 flattens to
    * uniform; pretraining runs typically pick 0.3–0.7 to lift
    * low-resource domains without drowning high-resource ones).
    * `eff_docs` is the per-epoch expected document budget the weight
    * implies. The per-source counts are a tiny aggregate; the
    * normalizer joins back as a broadcast single row — the same
    * broadcast-scalar shape as quantileBuckets, nothing global ever
    * shuffles. */
  def temperatureWeights(spark: SparkSession, dir: String,
      alpha: Double = 0.5): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val norm = counts.agg(
      sum(pow(col("n_docs"), alpha)).as("z"),
      sum(col("n_docs")).as("n_total"))
    counts.join(broadcast(norm))
      .select(col("source"), col("n_docs"),
        round(pow(col("n_docs"), alpha) / col("z"), 6).as("weight"),
        round(pow(col("n_docs"), alpha) / col("z") * col("n_total"), 2)
          .as("eff_docs"))
  }

  /** DSIR-style importance weights (q177) — Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"
    * (arXiv:2302.03169): each document scores the log-likelihood
    * ratio of a TARGET unigram distribution (the `targetLang` slice
    * stands in for the target domain) against the RAW corpus
    * distribution, over hashed token buckets (`buckets`-way portable
    * md5 bucket — [[hashBucket]], so the features are reproducible
    * outside Spark) with add-one smoothing. Resampling proportional
    * to exp(weight) tilts a 100 TB crawl toward the target domain;
    * the weight itself is the audit column. Plan shape: ONE
    * exploded-token pass feeds both histograms (a `buckets`-row
    * aggregate — broadcast back), a second pass scores documents;
    * per-doc terms sum in DECIMAL(28,12) so the score is
    * shuffle-stable (the q145 log-determinism recipe). */
  def importanceWeights(spark: SparkSession, dir: String,
      targetLang: String = "en", buckets: Int = 64): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        hashBucket(col("tok"), buckets).as("b"))
    toks.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
      .join(broadcast(importanceRatioTable(toks, targetLang, buckets)),
        Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tok"),
        round(sum((col("n") * col("lr")).cast("decimal(28,12)"))
          .cast("double"), 6).as("dsir_weight"))
  }

  /** The (bucket, log-likelihood-ratio) table behind
    * [[importanceWeights]] — `buckets` rows, the model artifact a
    * scoring job broadcasts (batch) or collects into a literal map
    * (streaming — [[importanceRatios]]). `toks` must carry
    * (lang, b) per token occurrence. */
  private def importanceRatioTable(toks: DataFrame, targetLang: String,
      buckets: Int): DataFrame = {
    val hist = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("n_bg"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("n_tgt"))
    val tot = hist.agg(sum(col("n_bg")).as("t_bg"),
      sum(col("n_tgt")).as("t_tgt"))
    hist.join(broadcast(tot)) // buckets × 1-row totals
      .select(col("b"),
        (log((col("n_tgt") + 1).cast("double") /
            (col("t_tgt") + buckets).cast("double")) -
          log((col("n_bg") + 1).cast("double") /
            (col("t_bg") + buckets).cast("double"))).as("lr"))
  }

  /** The fitted DSIR model as a driver-side map: bucket → log ratio,
    * `buckets` entries collected from the reference corpus — the
    * bounded model artifact (64 doubles, the Lloyd-fit altitude) a
    * STREAMING scorer captures as a literal
    * ([[graft.streaming.StreamOps.dsirScoreStream]]). Buckets absent
    * from the reference corpus are absent here; scorers treat them
    * as lr = 0 (no evidence either way). */
  def importanceRatios(spark: SparkSession, dir: String,
      targetLang: String = "en", buckets: Int = 64): Map[Long, Double] = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("lang"), hashBucket(col("tok"), buckets).as("b"))
    // collect-ok: ≤ `buckets` rows — the ratio table is keyed by the
    // fixed hash-bucket domain, never by corpus size
    importanceRatioTable(toks, targetLang, buckets).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Per-source distribution drift (q180): smoothed KL divergence of
    * each source's hashed-unigram distribution from the corpus-wide
    * one — the mixture monitor a curation pipeline watches so a
    * source that shifts (new crawl, format change, spam influx)
    * surfaces as a KL jump BEFORE it pollutes the mix. Same portable
    * md5 buckets and add-one smoothing as [[importanceWeights]].
    * The sum runs over the full source × observed-bucket GRID
    * (n_sources · `buckets` rows — constant-size, broadcast), so
    * zero-count cells contribute their smoothed mass and the result
    * is a true KL ≥ 0, not a support-truncated one; per-source terms
    * sum in DECIMAL(28,12) (the q145 recipe). */
  def sourceKl(spark: SparkSession, dir: String, buckets: Int = 64): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("source"), hashBucket(col("tok"), buckets).as("b"))
    // sb is the whole corpus reduced to <= n_sources·buckets rows and
    // feeds three aggregates plus the grid join — persist it so the
    // corpus is scanned ONCE, not once per consumer
    val sb = toks.groupBy(col("source"), col("b")).agg(count(lit(1)).as("n_sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcTot = sb.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
    val bktTot = sb.groupBy(col("b")).agg(sum(col("n_sb")).as("n_cb"))
    val corpTot = bktTot.agg(sum(col("n_cb")).as("n_c"),
      count(lit(1)).as("n_obs"))
    // smoothing mass = the OBSERVED grid width, not `buckets`: a small
    // vocabulary fills few buckets, and smoothing by 64 would leave
    // both distributions summing < 1 (KL could then go negative)
    val ps = (coalesce(col("n_sb"), lit(0L)) + 1).cast("double") /
      (col("n_s") + col("n_obs")).cast("double")
    val pc = (col("n_cb") + 1).cast("double") /
      (col("n_c") + col("n_obs")).cast("double")
    srcTot.crossJoin(broadcast(bktTot)) // grid: n_sources × ≤buckets
      .join(sb, Seq("source", "b"), "left")
      .join(broadcast(corpTot))
      .select(col("source"), col("n_s"), (ps * log(ps / pc)).as("term"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tok"),
        round(sum(col("term").cast("decimal(28,12)")).cast("double"), 6)
          .as("kl"))
  }

  /** Neyman optimal stratified-sample allocation (q254) — the
    * sampling-design step before any budgeted corpus draw: allocate
    * n_h ∝ N_h·S_h (stratum size × stratum std of the target metric,
    * here tokens/doc), which minimizes the variance of the stratified
    * mean for a fixed total budget; emitted next to the proportional
    * allocation so the delta IS the audit (a high-variance stratum
    * pulls budget from homogeneous ones). One scan folds each
    * stratum to exact sufficient statistics (n, Σy, Σy² via
    * DECIMAL(19,0) squares); S_h is one IEEE chain per stratum, and
    * the Σ N_h·S_h denominator crosses strata through a round-9
    * integer surrogate — no float ever accumulates in engine order. */
  def neymanAllocation(spark: SparkSession, dir: String,
      budget: Int = 10000): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val s = Tables.documents(spark, dir)
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("sy"),
        sum(d19(col("y")) * d19(col("y"))).as("syy"))
    val n = col("n_docs").cast("double")
    val sh = sqrt((n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")) /
      (n * (n - lit(1.0))))
    val w = s.select(col("source"), col("n_docs"), sh.as("s_h"),
      (n * sh).as("w"))
    val tot = w.agg(
      sum(round(col("w") * 1e9, 0).cast("long")).as("wsum"),
      sum(col("n_docs")).as("n_total"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), round(col("s_h"), 6).as("s_h"),
        round(col("w") / (col("wsum").cast("double") / 1e9), 6)
          .as("share_neyman"),
        round(col("w") / (col("wsum").cast("double") / 1e9) * budget, 0)
          .cast("long").as("n_neyman"),
        round(col("n_docs").cast("double") /
          col("n_total").cast("double") * budget, 0)
          .cast("long").as("n_prop"))
  }

  /** Pairwise Jensen–Shannon divergence (q256) between source
    * unigram-bucket distributions — [[sourceKl]]'s symmetric,
    * bounded companion for SOURCE-VS-SOURCE comparison (KL against
    * the corpus mean says "who drifted"; the JS matrix says which
    * sources are near-duplicates of each other's token mix — the
    * signal for merging or down-weighting correlated crawls). JS
    * needs no smoothing: a zero-probability term contributes exactly
    * 0 by definition, so each side uses its raw exact-long MLE.
    * Same portable md5 buckets; the whole computation after the one
    * corpus scan runs on the pairs × observed-bucket grid (tiny),
    * with per-pair terms summed in DECIMAL(28,12). js_norm = JS/ln 2
    * ∈ [0,1]. */
  def sourceJs(spark: SparkSession, dir: String,
      buckets: Int = 64): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("source"), hashBucket(col("tok"), buckets).as("b"))
    val sb = toks.groupBy(col("source"), col("b")).agg(count(lit(1)).as("n_sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val st = sb.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
    val pairs = st.select(col("source").as("source_a"), col("n_s").as("n_a"))
      .crossJoin(st.select(col("source").as("source_b"), col("n_s").as("n_b")))
      .filter(col("source_a") < col("source_b"))
    val grid = pairs.crossJoin(broadcast(sb.select(col("b")).distinct()))
      .join(sb.select(col("source").as("source_a"), col("b"),
        col("n_sb").as("n_ab")), Seq("source_a", "b"), "left")
      .join(sb.select(col("source").as("source_b"), col("b"),
        col("n_sb").as("n_bb")), Seq("source_b", "b"), "left")
    val pa = coalesce(col("n_ab"), lit(0L)).cast("double") /
      col("n_a").cast("double")
    val pb = coalesce(col("n_bb"), lit(0L)).cast("double") /
      col("n_b").cast("double")
    val m = (pa + pb) / 2.0
    val term = when(pa > 0.0, lit(0.5) * pa * log(pa / m)).otherwise(0.0) +
      when(pb > 0.0, lit(0.5) * pb * log(pb / m)).otherwise(0.0)
    grid.select(col("source_a"), col("source_b"),
        term.cast("decimal(28,12)").as("t"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(round(sum(col("t")).cast("double"), 6).as("js_nats"),
        round(sum(col("t")).cast("double") / log(lit(2.0)), 6).as("js_norm"))
  }

  /** Two-sample Kolmogorov–Smirnov drift (q213): each source's
    * document-length ECDF against the REST of the corpus, D =
    * max |F_s − F_rest| — [[sourceKl]]'s continuous companion (KL
    * watches the token mix; KS watches a numeric marginal, the
    * classic "did this crawl's length distribution shift" monitor).
    * One corpus scan reduces to per-(source, length) counts; from
    * there everything runs on the tiny source × observed-length GRID
    * (lengths are a bounded domain — ≤ ~10⁵ distinct values no
    * matter how many rows), so the per-source cumulative windows and
    * the max-gap reduce never touch corpus-sized data. Both ECDFs at
    * every observed length are divisions of exact longs (IEEE-exact
    * rounding → cross-engine identical), so the max gap hash-gates.
    * Single-source corpora produce zero rows (no complement). */
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
    ksFinalize(Tables.documents(spark, dir)
      .groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The KS tail of [[ksDrift]] over the reduced per-(source,
    * n_chars) count grid `cells` — factored out so the STREAMING
    * monitor ([[graft.streaming.StreamOps.ksMonitorStream]]) finalizes
    * each micro-batch's running counts with the SAME arithmetic the
    * batch query ends with: stream/batch parity is structural, not
    * re-implemented (the psiFinalize/sprtFinalize recipe). Everything
    * below runs on the tiny source × observed-length grid; both ECDFs
    * are divisions of exact longs, so the max gap hash-gates. */
  private[graft] def ksFinalize(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcTot = cells.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    // corpus-wide cumulative counts: a window over the distinct-length
    // table (bounded), not the corpus
    val wv = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vals = cells.groupBy(col("n_chars")).agg(sum(col("c")).as("c_v"))
      .withColumn("cum_all", sum(col("c_v")).over(wv))
      .select(col("n_chars"), col("cum_all"))
    val tot = cells.agg(sum(col("c")).as("n_tot"))
    val ws = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    srcTot.crossJoin(broadcast(vals))
      .join(cells, Seq("source", "n_chars"), "left")
      .withColumn("cum_s", sum(coalesce(col("c"), lit(0L))).over(ws))
      .join(broadcast(tot))
      .filter(col("n_tot") > col("n_s"))
      .select(col("source"), col("n_s"),
        abs(col("cum_s").cast("double") / col("n_s").cast("double")
          - (col("cum_all") - col("cum_s")).cast("double")
            / (col("n_tot") - col("n_s")).cast("double")).as("gap"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        round(max(col("gap")), 6).as("ks"))
  }

  /** Kish effective sample size of the temperature-weighted corpus
    * (q246): ESS = (Σw)²/Σw² — how many "effective" documents the
    * τ=0.5 source-rebalanced mixture really contains (upweighting
    * rare sources costs statistical efficiency; ESS is the number
    * that says how much). Per-doc weights are constant within a
    * source, so both sums collapse to per-source closed forms
    * (w_raw = √(n_s/N), Σw = Σ w_raw, Σw² = Σ w_raw²/n_s) — the
    * whole corpus reduces to one source-count aggregate; τ=0.5
    * deliberately, because √ is IEEE-exact where pow(x, τ) is a
    * libm gamble. Source terms pass through round-9/round-12
    * surrogates (order-free). ESS is scale-invariant so weights
    * stay unnormalized. */
  def effectiveSampleSize(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum(col("n_s")).as("n_docs"),
      count(lit(1)).as("n_sources"))
    val wRaw = sqrt(col("n_s").cast("double") / col("n_docs").cast("double"))
    val agg = counts.join(broadcast(tot))
      .select(
        round(wRaw * 1e9, 0).cast("long").as("ai"),
        round(wRaw * wRaw / col("n_s").cast("double") * 1e12, 0)
          .cast("long").as("bi"))
      .agg(sum(col("ai")).as("sa"), sum(col("bi")).as("sb"))
    val sw = col("sa").cast("double") / 1e9
    val sww = col("sb").cast("double") / 1e12
    agg.join(broadcast(tot))
      .select(col("n_docs"), col("n_sources"),
        round(sw * sw / sww, 6).as("ess"),
        round(sw * sw / sww / col("n_docs").cast("double"), 6)
          .as("ess_ratio"))
  }

  /** Token-budget corpus selection, two-phase so no global sort ever
    * touches the corpus: (1) docs reduce to a SCORE-BUCKET histogram
    * (type-token ratio rounded to 3 decimals → ≤ 1001 buckets —
    * constant-size regardless of corpus), (2) a running token total
    * over that tiny histogram picks the lowest score bucket that
    * still fits the budget whole, (3) the cutoff broadcasts back as
    * a scan-side filter `score >= cutoff`. The greedy-by-rank
    * alternative (SUM OVER one global ORDER BY) funnels 100 TB
    * through one partition; this form's only ordered window is over
    * the histogram. Whole buckets only — selection under-fills by at
    * most one bucket's tokens, the price of never ranking documents
    * globally. If even the best bucket exceeds the budget, cutoff is
    * NULL and nothing is selected (audit shows zero rows). Output is
    * the per-source audit of the selected set. */
  def tokenBudgetSelect(spark: SparkSession, dir: String,
      budget: Long = 30000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("source"),
        size(col("ws")).cast("long").as("n_tok"),
        round(size(array_distinct(col("ws"))).cast("double") /
          size(col("ws")).cast("double"), 3).as("score"))
      .filter(col("n_tok") > 0)
    val hist = scored.groupBy(col("score"))
      .agg(sum(col("n_tok")).as("bucket_tokens"))
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoff = hist
      .withColumn("cum", sum(col("bucket_tokens")).over(wCum))
      .filter(col("cum") <= budget)
      .agg(min(col("score")).as("cutoff"))
    scored.join(broadcast(cutoff))
      .filter(col("score") >= col("cutoff"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        round(min(col("score")), 3).as("min_score"))
  }

  /** END-TO-END training-set assembly — the composition a data job
    * actually ships, every stage the scale-shaped form of its
    * standalone query: curation (quality gates + exact dedup +
    * decontamination, [[TextAnalysis.curatedDocs]]) → token-budget
    * selection over the SURVIVORS (the q107 histogram-cutoff form —
    * the only ordered window is over a ≤1001-row score histogram,
    * never the corpus) → deterministic epoch-shuffle shard
    * assignment ([[epochShuffle]]'s md5 arithmetic). Output is the
    * per-shard manifest (docs, token mass) a trainer consumes.
    * Fully portable arithmetic end to end, so the WHOLE pipeline is
    * one hash-checked query — the capstone gate that the stages
    * compose correctly, not just pass alone. */
  def trainingManifest(spark: SparkSession, dir: String,
      budget: Long = 30000L, epoch: Int = 1, buckets: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val surv = graft.ext.TextAnalysis.curatedDocs(spark, dir)
      .select(col("doc_id"), col("n_tok"),
        round(col("n_distinct").cast("double") /
          col("n_tok").cast("double"), 3).as("score"))
    val hist = surv.groupBy(col("score"))
      .agg(sum(col("n_tok")).as("bucket_tokens"))
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // If even the top bucket alone exceeds the budget, the strict
    // cum<=budget cutoff is NULL and the manifest would silently be
    // EMPTY — an all-or-nothing edge a caller won't expect. Coalesce
    // to the max score: the top bucket is always selected (bounded
    // overshoot), and the manifest is never empty while survivors
    // exist.
    val cutoff = hist
      .withColumn("cum", sum(col("bucket_tokens")).over(wCum))
      .agg(coalesce(
        min(when(col("cum") <= budget, col("score"))),
        max(col("score"))).as("cutoff"))
    val h = conv(substring(md5(concat(lit(epoch.toString), lit(":"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    surv.join(broadcast(cutoff))
      .filter(col("score") >= col("cutoff"))
      .withColumn("shard", pmod(h, lit(buckets.toLong)).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"))
  }

  /** Deterministic contrastive NEGATIVE sampling: K pseudo-random
    * negatives per anchor, reproducible across runs/partitionings/
    * engines (the property `df.sample` can't give — see file header).
    * Never a cross join: each (anchor, slot) hashes to a target
    * BUCKET, docs carry their own hash bucket, and the join is equi
    * on bucket — per-slot work is one bucket's ~N/B docs, and B
    * scales with the corpus exactly like [[hashBucket]]'s dial. The
    * winner within a bucket is the min md5(anchor|doc) — stable, and
    * different anchors pick different docs from the same bucket.
    * Collision with the anchor itself is excluded; a slot whose
    * bucket holds no other docs yields no row (audited shortfall,
    * same contract as [[targetMixture]]). */
  def negativePairs(spark: SparkSession, dir: String, k: Int = 4,
      nAnchors: Long = 50L, buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("neg_id"),
        hashBucket(col("doc_id"), buckets).as("bucket"))
    val slots = Tables.documents(spark, dir)
      .filter(col("doc_id") < nAnchors)
      .select(col("doc_id").as("anchor_id"),
        explode(sequence(lit(0), lit(k - 1))).as("slot"))
      .withColumn("bucket",
        hashBucket(concat_ws(":", col("anchor_id"), col("slot")), buckets))
    val w = Window.partitionBy(col("anchor_id"), col("slot"))
      .orderBy(col("pick"), col("neg_id"))
    slots.join(docs, Seq("bucket"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .withColumn("pick",
        md5(concat_ws("|", col("anchor_id"), col("neg_id"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("slot"), col("neg_id"))
  }

  /** Packed sequences WITH offsets (q174) — the artifact a training
    * loader actually consumes: [[packBins]] (q97) audits how full
    * the bins are; this emits, per (source, bin), the ORDERED doc
    * list and each doc's token offset inside the bin — the
    * boundaries an attention mask / position-id reset needs. Same
    * single partitioned-window pass as q97 (cumulative tokens per
    * source in id order — parallel across sources, never a global
    * window); the in-bin lists assemble in one groupBy via
    * array_sort on (offset, doc_id) structs, so the order is
    * deterministic under any partitioning. Arrays serialize
    * comma-joined for the gate (the q64 convention). */
  def packedSequences(spark: SparkSession, dir: String,
      budget: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_before",
        sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin",
        floor(col("cum_before") / lit(budget.toDouble)).cast("int"))
      .withColumn("off",
        (col("cum_before") - col("bin").cast("long") * budget).cast("long"))
    // scale-ok: group = one token-budget bin — fan-in bounded by
    // `budget` (a bin holds at most `budget` docs even at 1-token docs)
    val ordered = array_sort(collect_list(struct(col("off"), col("doc_id"))))
    packed
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(ordered,
          s => s.getField("doc_id").cast("string")), ",").as("doc_ids"),
        array_join(transform(ordered,
          s => s.getField("off").cast("string")), ",").as("offsets"))
  }

  /** Curriculum ordering (q175): the easy-first training-delivery
    * order — tier documents by a difficulty proxy (length quartiles)
    * and shuffle reproducibly WITHIN each tier per epoch. Scale
    * discipline: tiers come from ONE exact-percentile aggregate
    * broadcast back as three comparisons (the q95 pattern — never a
    * global ntile, which funnels the corpus through one partition),
    * and the in-tier order is the q148 epoch-hash shard pattern
    * ((tier, bucket) windows in parallel; a reader drains tiers
    * ascending, then buckets, then pos). Deterministic per epoch,
    * different across epochs, reproducible in any engine. */
  def curriculumOrder(spark: SparkSession, dir: String, epoch: Int = 1,
      buckets: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val cuts = d.agg(
      // scale-ok: oracle artifact — the scaladoc's "q95 pattern" exact
      // fit; at scale the tier boundaries swap to approx_percentile
      // (q319 contract)
      expr("percentile(n_chars, 0.25)").as("c1"),
      expr("percentile(n_chars, 0.5)").as("c2"),
      expr("percentile(n_chars, 0.75)").as("c3"))
    val h = conv(substring(md5(concat(lit(epoch.toString), lit(":"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    d.join(broadcast(cuts))
      .select(col("doc_id"),
        (lit(1) + (col("n_chars") > col("c1")).cast("int")
          + (col("n_chars") > col("c2")).cast("int")
          + (col("n_chars") > col("c3")).cast("int")).as("tier"),
        h.as("h"))
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("tier"), col("bucket"))
          .orderBy(col("h"), col("doc_id"))))
      .select(col("doc_id"), col("tier"), col("bucket"), col("pos"))
  }

  /** Length-bucketed inference batching: group documents into
    * fixed-size batches WITHIN coarse length buckets so each batch
    * pads to its own max, not the corpus max — the standard serving /
    * tokenize-and-pad efficiency move. Emits the per-batch audit
    * (size, max length, padding waste) that quantifies what the
    * bucketing saved. The only window is a row_number per length
    * bucket — same parallel shape as packBins. */
  def lengthBatches(spark: SparkSession, dir: String,
      batchSize: Int = 16, bucketChars: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("len_bucket")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        floor(col("n_chars") / lit(bucketChars.toDouble)).cast("int")
          .as("len_bucket"))
      .withColumn("batch_no",
        ((row_number().over(w) - 1) / batchSize).cast("int"))
      .groupBy(col("len_bucket"), col("batch_no"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_chars")).as("batch_max_chars"),
        (max(col("n_chars")) * count(lit(1)) - sum(col("n_chars")))
          .cast("long").as("padding_waste"))
  }

  /** Poisson bootstrap (q249) — the CI method built FOR map-reduce
    * scale (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google 2012): classical bootstrap resampling needs the
    * whole dataset addressable to draw n-of-n with replacement, which
    * is impossible across partitions; the Poisson trick replaces the
    * multinomial draw with an independent Poisson(1) weight PER ROW
    * PER REPLICA, a pure row-local function — so all `b` replicas
    * ride ONE scan (explode ×b, then map-side partial aggregation
    * collapses to b groups before the shuffle; bytes shuffled are
    * O(b), not O(rows)).
    *
    * Determinism: the per-(replica, doc) uniform is the repo's
    * portable md5 pattern, and the Poisson(1) inverse CDF is a CASE
    * ladder whose thresholds are exp(-1)·c with c exact small
    * rationals — the identical IEEE chain in Spark and DuckDB, so
    * every weight (and hence every exact integer Σw, Σw·x) matches
    * bit-for-bit. Weights are truncated at 7 (P ≈ 8·10⁻⁶ per draw),
    * identically in both engines. Replica means are single IEEE
    * divisions over exact BIGINT sums; the CI is ORDER STATISTICS
    * over the b means (rank 2 / rank b−1 for b=32 ≈ a 94% interval) —
    * never quantile interpolation, whose (1−g)·a+g·b evaluation order
    * differs between engines. Summary moments fold through round-9
    * integer surrogates so no float accumulates in engine order. */
  def poissonBootstrap(spark: SparkSession, dir: String,
      b: Int = 32): DataFrame = {
    require(b >= 4, s"need >= 4 replicas for order-stat CI, got $b")
    val e1 = exp(lit(-1.0))
    val u = (conv(substring(md5(concat_ws(":", col("rep").cast("string"),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") + 0.5) / 4294967296.0
    val w = when(u < e1, 0L).when(u < e1 * 2.0, 1L)
      .when(u < e1 * 2.5, 2L).when(u < e1 * (lit(8.0) / 3.0), 3L)
      .when(u < e1 * (lit(65.0) / 24.0), 4L)
      .when(u < e1 * (lit(163.0) / 60.0), 5L)
      .when(u < e1 * (lit(1957.0) / 720.0), 6L).otherwise(7L)
    val reps = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(lit(0), lit(b - 1))).as("rep"))
      .select(col("rep"), w.as("w"), col("n_tok"))
      .groupBy(col("rep"))
      .agg(sum(col("w")).as("n_drawn"),
        sum(col("w") * col("n_tok")).as("tok_sum"))
      .select(col("rep"), col("n_drawn"),
        (col("tok_sum").cast("double") / col("n_drawn").cast("double"))
          .as("m"))
    val ranked = reps.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("m"), col("rep"))))
    // b rows: the rank window and the final fold are driver-trivial
    ranked.agg(
        count(lit(1)).as("n_replicas"),
        sum(round(col("m") * 1e9, 0).cast("long")).as("s1"),
        sum(round(col("m") * 1e9, 0).cast("long").cast("decimal(19,0)") *
          round(col("m") * 1e9, 0).cast("long").cast("decimal(19,0)"))
          .as("s2"),
        max(when(col("rk") === 2, col("m"))).as("lo"),
        max(when(col("rk") === b - 1, col("m"))).as("hi"))
      .select(col("n_replicas"),
        round(col("s1").cast("double") / 1e9 / col("n_replicas"), 6)
          .as("boot_mean"),
        round(sqrt((col("s2").cast("double") / 1e18 -
          (col("s1").cast("double") / 1e9) *
            (col("s1").cast("double") / 1e9) / col("n_replicas")) /
          (col("n_replicas") - lit(1.0))), 6).as("boot_se"),
        round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"))
  }

  /** Sequence packing: assign documents to fixed token-budget bins —
    * the pre-training step that concatenates docs into ~context-length
    * training sequences. Deterministic first-fit-in-id-order per
    * source: bin = floor(exclusive-cumulative-tokens / budget), so a
    * doc straddling a boundary starts a new bin's worth of overflow
    * but assignment never depends on partitioning. Packing is
    * per-source (the window is partitioned — parallel at any scale);
    * a global pack would funnel the corpus through one partition.
    * Emits per-(source, bin) audit counts. */
  def packBins(spark: SparkSession, dir: String, budget: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_before",
        sum(col("n_tok")).over(w) - col("n_tok"))
      .groupBy(col("source"),
        floor(col("cum_before") / lit(budget.toDouble)).cast("int").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("sum_tokens"))
  }

}
