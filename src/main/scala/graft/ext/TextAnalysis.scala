package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token stats, term frequencies, quality scoring,
  * language ID, document fingerprinting. All pure `functions._`
  * column expressions — whole-stage-codegen friendly, no UDFs, so a
  * 100 TB corpus scans once and never leaves Tungsten rows.
  */
object TextAnalysis {

  /** Whitespace tokenizer; drops empty tokens so leading/trailing
    * spaces can't skew counts. */
  def tokens(c: Column): Column = filter(split(c, " "), t => length(t) > 0)

  /** Per-document token statistics. Tokenization is STAGED in its own
    * projection: HOF-bearing expressions are excluded from Catalyst's
    * common-subexpression elimination (lambda variables bind at
    * runtime), so repeating `tokens(text)` per output column re-runs
    * the split per reference — and CollapseProject keeps the stage
    * because a non-cheap alias referenced more than once is not
    * inlined. Same pattern throughout this file. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        tokens(col("text")).as("tok"))
      .select(col("doc_id"), col("lang"),
        size(col("tok")).as("n_tokens"),
        col("n_chars"),
        size(array_distinct(col("tok"))).as("n_distinct_tokens"))

  /** Corpus term frequency: explode tokens → count → top 20.
    * Map-side partial agg shrinks the shuffle to |vocab| per
    * partition; deterministic via (count desc, word) ordering. */
  def wordFreq(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** Quality scoring: length, type-token ratio, stopword ratio —
    * the classic cheap heuristics for corpus filtering. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stop = array(lit("the"), lit("a"), lit("and"), lit("of"), lit("to"))
    // tok staged once (see tokenStats) — the old inline form re-ran
    // the tokenizer 6× per row
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("tok"))
      .select(col("doc_id"),
        size(col("tok")).as("n_tokens"),
        round(size(array_distinct(col("tok"))).cast("double") /
          size(col("tok")), 4).as("ttr"),
        round(size(filter(col("tok"), t => array_contains(stop, t)))
          .cast("double") / size(col("tok")), 4).as("stopword_ratio"),
        round(col("n_chars").cast("double") / size(col("tok")), 4)
          .as("avg_token_len"))
  }

  /** Language ID: deterministic n-gram/stopword-profile heuristic.
    * Scores each candidate language by hits of its marker tokens and
    * takes the argmax (ties → language order). On real corpora the
    * marker lists would be per-language character n-gram profiles;
    * the mechanism (score columns + greatest/argmax, single scan) is
    * the scale path. Synthetic testdata text shares one vocabulary,
    * so this validates the operator's determinism, not accuracy. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "es" -> Seq("el", "la", "los", "de"),
      "fr" -> Seq("le", "la", "les", "des"),
      "de" -> Seq("der", "die", "das", "und"),
      "zh" -> Seq("zh0", "zh1", "zh2", "zh3"))
    // argmax struct staged once: greatest(scored…) carries HOF
    // lambdas, which Catalyst CSE skips — referencing it twice
    // (getField lang / score) would re-run all 5 marker filters per
    // row. The non-cheap multi-referenced alias also blocks
    // CollapseProject, so the plan keeps one evaluation.
    val scored = profiles.map { case (langName, markers) =>
      val markerArr = array(markers.map(lit): _*)
      struct(size(filter(col("tok"), t => array_contains(markerArr, t))).as("score"),
        lit(langName).as("lang"))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("label_lang"),
        tokens(col("text")).as("tok"))
      .select(col("doc_id"), col("label_lang"),
        greatest(scored: _*).as("best"))
      .select(col("doc_id"), col("label_lang"),
        col("best").getField("lang").as("pred_lang"),
        col("best").getField("score").as("pred_score"))
  }

  /** Document fingerprint: ORDER-SENSITIVE position-weighted token
    * digest — Σᵢ h(tᵢ)·w(i) mod p, with h = first 8 hex chars of
    * md5 and w(i) = Knuth-multiplier position weight. Identical
    * token sequences collide; any reorder/edit moves the digest.
    * Per-term mod keeps every intermediate inside ANSI-long range
    * (h < p ≈ 1e9, w < p, product < 1e18; ≤ thousands of terms sum
    * < 1e13). The per-term form (vs a sequential fold) is chosen
    * deliberately: it's embarrassingly parallel, and every operation
    * is portable integer math the DuckDB oracle reproduces exactly —
    * so the whole operator is hash-checked, not rows-only. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val m = 1000000007L
    val tokHash =
      pmod(conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long"), lit(m))
    val posWeight = pmod(lit(2654435761L) * (col("pos") + 1), lit(m))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "t")))
      .select(col("doc_id"), pmod(tokHash * posWeight, lit(m)).as("term"))
      .groupBy(col("doc_id"))
      .agg(pmod(sum(col("term")), lit(m)).as("fingerprint"))
      .select(col("doc_id"), col("fingerprint"),
        pmod(col("fingerprint"), lit(1024)).as("fp_bucket"))
  }

  /** BPE-ish tokenization: GPT-2-style pre-tokenizer regex classes
    * (letter runs, digit runs, single non-space symbols) as a cheap
    * proxy for subword token counting — the standard way to estimate
    * LLM token budgets over a corpus without shipping a tokenizer. */
  def bpeTokenCount(spark: SparkSession, dir: String): DataFrame = {
    val pieces = expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")
    Tables.documents(spark, dir)
      .select(col("doc_id"), pieces.as("pieces"))
      .select(col("doc_id"),
        size(col("pieces")).as("n_bpeish"),
        size(array_distinct(col("pieces"))).as("n_distinct_pieces"))
  }

  /** Top TF-IDF terms per document: tf(doc, word) × ln(N / df(word)),
    * top `topN` by score (ties → lexicographic) — the classic
    * keyword-extraction / relevance-weighting primitive.
    *
    * Shape at scale: ONE corpus scan (df as a word-partitioned window
    * COUNT over the tf table, not a separate aggregate — a groupBy +
    * self-join would re-run the whole scan+explode subtree for the
    * second branch, doubling the dominant cost), then a bounded
    * per-doc top-N window. N (corpus size) is a 1-row aggregate
    * broadcast-cross-joined into the plan — lazy, column-pruned, and
    * ONE job, not a separate eager count() action. */
  def tfidfTop(spark: SparkSession, dir: String, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val wDf = Window.partitionBy(col("word"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.withColumn("df", count(lit(1)).over(wDf))
      .join(broadcast(nDocs))
      .withColumn("score", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topN)
      .select(col("doc_id"), col("word"),
        round(col("score"), 6).as("tfidf"), col("rn"))
  }

  /** BM25 keyword retrieval: score every document against a fixed
    * query-term set and keep the top `topN` — the lexical-search
    * primitive (Robertson/Spärck Jones; the Lucene `+1` idf variant
    * so scores stay positive at any df). score(d, q) =
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Shape at scale — TWO corpus scans, not four: the match
    * extraction stages tokens once, carries the doc length alongside,
    * and explodes+filters to the query terms IMMEDIATELY (per-term
    * rows leaving the scan are |terms|-bounded per doc, never the
    * full posting explosion); df per term is a WINDOW count over
    * that tiny tf table (the tfidf discipline — a groupBy+join-back
    * would re-run the whole scan+explode subtree for the df branch);
    * the two scalars (avgdl, N) come from ONE shared second pass —
    * agg(avg(dl), count(*)) broadcast into the score (at 100 TB they
    * ship precomputed from [[tokenStats]] instead). Final score is
    * one |terms|-bounded sum per matching doc + a global top-N
    * (TakeOrderedAndProject, no full sort). */
  def bm25(spark: SparkSession, dir: String,
      terms: Seq[String] = Seq("shuffle", "broadcast", "join"),
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val avgdl = docs
      .select(size(tokens(col("text"))).cast("double").as("dl"))
      .agg(avg(col("dl")).as("avgdl"),
        count(lit(1)).cast("double").as("n_docs"))
    val tf = docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
      .join(broadcast(avgdl))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("contrib",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      // decimal accumulation: a ≤|terms|-element double sum could
      // still reorder under partitioning; decimal is associative so
      // the rounded score is partitioning-stable and oracle-exact
      .agg(round(sum(col("contrib").cast("decimal(28,12)")).cast("double"), 6)
          .as("bm25"),
        count(lit(1)).cast("long").as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topN)
  }

  /** Overlapping fixed-size document chunks — the context-window
    * preparation step of an embedding/RAG pipeline (chunk = what gets
    * embedded; stride < chunk preserves continuity across
    * boundaries). A pure per-row generator: sequence of start
    * offsets + posexplode + substring, no shuffle, no UDF — chunking
    * 100 TB is exactly one scan. Emits the chunk digest rather than
    * the chunk text so downstream exact-dedup of chunks (and the
    * driver compare) move digests, not kilobytes. */
  def chunkDocs(spark: SparkSession, dir: String, chunk: Int = 200,
      stride: Int = 150): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      "need 0 < stride <= chunk")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(sequence(lit(1), greatest(length(col("text")), lit(1)),
          lit(stride))).as(Seq("chunk_idx", "start")),
        col("text"))
      .select(col("doc_id"), col("chunk_idx"),
        length(substring_index_free(col("text"), col("start"), chunk)).as("n_chars_chunk"),
        md5(substring_index_free(col("text"), col("start"), chunk)).as("chunk_md5"))
  }

  /** substring with a COLUMN start (the literal-only `substring`
    * helper can't take one). */
  private def substring_index_free(s: Column, start: Column, len: Int): Column =
    s.substr(start, lit(len))

  /** PII scrubbing — the redaction pass a training corpus goes
    * through before anything else reads it: emails, phone-shaped
    * number runs, and IPv4 literals replaced with typed placeholder
    * tags, plus per-document match counts so redaction volume is
    * auditable. Chained `regexp_replace` column expressions — one
    * scan, codegen'd, no UDF; the regexes stay in the portable
    * subset (char classes, bounded repetition) so the DuckDB oracle
    * runs them verbatim. */
  def emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  def ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  def phoneRe = "\\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\\b"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(scrubPii(col("text"))).as("scrubbed_md5"),
        // Column-API regexp_extract_all: SQL-literal backslash
        // escaping would corrupt \b inside expr() strings
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(ipRe), lit(0))).as("n_ips"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"))

  /** Token histogram by language: per-lang total/avg token counts. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // token count staged once pre-aggregation (see tokenStats)
      .select(col("lang"), col("n_chars"),
        size(tokens(col("text"))).as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        round(avg(col("n_toks")), 4).as("avg_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"))

  /** Corpus bigram frequency, top-k. Adjacent-token pairs via
    * zip_with over two offset slices of ONE staged token array — a
    * narrow per-row generator (no self-join on position); the only
    * shuffle is the count aggregation. `greatest(…,0)` keeps the
    * slice length legal for empty/one-token docs (they contribute no
    * bigrams, same as the oracle's empty range). */
  def bigramFreq(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val n1 = greatest(size(col("ws")) - 1, lit(0))
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("ws"))
      .select(explode(zip_with(
        slice(col("ws"), lit(1), n1), slice(col("ws"), lit(2), n1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topK)
  }

  /** Repetition quality stats (the Gopher-style repetition filters):
    * per-document duplicate-bigram fraction (1 − distinct/total) and
    * top-bigram fraction (most frequent bigram's share) — the two
    * cheap signals that catch boilerplate, keyword stuffing, and
    * looping generations that length/TTR gates miss. Two-stage
    * aggregate exactly like the skew-safe distinct (q90): explode →
    * (doc, bigram) partial counts map-side → per-doc fold, so a
    * pathological document (one bigram repeated millions of times)
    * compresses at the first stage instead of funnelling raw rows.
    * Documents with < 2 tokens have no bigrams and are absent — they
    * can't repeat, and the oracle's empty range agrees. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val n1 = greatest(size(col("ws")) - 1, lit(0))
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), n1), slice(col("ws"), lit(2), n1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top"))
      .select(col("doc_id"),
        col("n_bigrams").cast("long").as("n_bigrams"),
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_bigrams").cast("double"), 4).as("dup_bigram_frac"),
        round(col("top").cast("double") /
          col("n_bigrams").cast("double"), 4).as("top_bigram_frac"))
  }

  /** Trigram language-model head: top continuations by count with
    * conditional probability p(next | prefix) = c(prefix,next) /
    * c(prefix). The prefix total is a window SUM over the trigram
    * count table — NOT a separate bigram aggregate joined back,
    * which would re-run the scan+explode subtree (the same
    * one-scan argument as tfidf's df). Shuffle is on (prefix, next)
    * then prefix — both partial-aggregated map-side. */
  def trigramLm(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n2 = greatest(size(col("ws")) - 2, lit(0))
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("ws"))
      .select(
        explode(zip_with(
          zip_with(slice(col("ws"), lit(1), n2), slice(col("ws"), lit(2), n2),
            (a, b) => concat(a, lit(" "), b)),
          slice(col("ws"), lit(3), n2),
          (p, c) => struct(p.as("prefix"), c.as("next_word")))).as("tg"))
      .select(col("tg.prefix").as("prefix"), col("tg.next_word").as("next_word"))
      .groupBy(col("prefix"), col("next_word"))
      .agg(count(lit(1)).as("c"))
      .withColumn("p", round(col("c").cast("double") /
        sum(col("c")).over(Window.partitionBy(col("prefix"))), 4))
      .orderBy(col("c").desc, col("prefix"), col("next_word"))
      .limit(topK)
  }

  /** Per-document perplexity under the corpus's own trigram LM —
    * the fluency/repetition signal a curation pipeline scores with
    * when no external LM is available (self-perplexity: low =
    * formulaic/repetitive, high = unusual token sequences).
    * p(next | prefix) comes from the SAME corpus counts [[trigramLm]]
    * reports, so every doc trigram has p > 0 and no smoothing is
    * needed.
    *
    * One corpus scan: per-(doc, trigram) counts first (one shuffle),
    * then BOTH count marginals — c3(prefix, next) and c2(prefix) —
    * as window sums over that aggregated table (no join back to the
    * corpus, no second scan; the tfidf/trigramLm discipline), then
    * one weighted-NLL reduce per doc. Decimal accumulation keeps the
    * average partitioning-stable. Docs with < 3 tokens have no
    * trigrams and are absent by construction. Skew note: the c2
    * window partitions by prefix, so a mega-prefix's partition holds
    * its distinct (doc, next) rows — already one row per doc×next,
    * not per occurrence; if a prefix's continuation set itself
    * outgrows a partition at extreme scale, pre-aggregate c2/c3 into
    * broadcast tables instead (the LM table would be materialized at
    * that scale anyway). */
  def trigramPerplexity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n2 = greatest(size(col("ws")) - 2, lit(0))
    val dtc = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        explode(zip_with(
          zip_with(slice(col("ws"), lit(1), n2), slice(col("ws"), lit(2), n2),
            (a, b) => concat(a, lit(" "), b)),
          slice(col("ws"), lit(3), n2),
          (p, c) => struct(p.as("prefix"), c.as("next_word")))).as("tg"))
      .select(col("doc_id"), col("tg.prefix").as("prefix"),
        col("tg.next_word").as("next_word"))
      .groupBy(col("doc_id"), col("prefix"), col("next_word"))
      .agg(count(lit(1)).as("n"))
    dtc
      .withColumn("c3",
        sum(col("n")).over(Window.partitionBy(col("prefix"), col("next_word"))))
      .withColumn("c2", sum(col("n")).over(Window.partitionBy(col("prefix"))))
      .withColumn("nll",
        col("n") * -log(col("c3").cast("double") / col("c2")))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_trigrams"),
        (sum(col("nll").cast("decimal(28,12)")).cast("double") /
          sum(col("n")).cast("double")).as("a"))
      .select(col("doc_id"), col("n_trigrams"),
        round(col("a"), 6).as("avg_nll"),
        round(exp(col("a")), 4).as("perplexity"))
  }

  /** Fixed-weight logistic quality scorer — the classifier-inference
    * shape of a fasttext-style quality filter, with the model
    * reduced to published literal weights so the whole forward pass
    * is codegen'd column arithmetic (score = σ(w·x + b); at scale a
    * real model's weights broadcast the same way, the plan does not
    * change). Features from ONE staged tokenization: log-length,
    * type-token ratio, mean token length. Emits the per-source audit
    * (docs, kept-at-0.5, decimal-stable mean score) a filter job
    * logs before dropping anything. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityScoreDocs(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("score") > 0.5).cast("long")).as("n_keep"),
        round(sum(col("score").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("mean_score"))

  /** The classifier's per-document forward pass — split out so
    * downstream operators ([[bestCopyDedup]]) can rank on the raw
    * score; also carries two dedup digests computed in the same scan:
    * the exact text md5 and the BAG-OF-WORDS digest (md5 of the
    * sorted distinct token set — identical for reordered /
    * repetition-padded copies that byte-level dedup misses). */
  def qualityScoreDocs(spark: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        tokens(col("text")).as("ws"), md5(col("text")).as("txt_md5"))
      .select(col("doc_id"), col("source"), col("txt_md5"),
        md5(concat_ws(" ", array_sort(array_distinct(col("ws")))))
          .as("bow_md5"),
        size(col("ws")).cast("double").as("n_tok"),
        size(array_distinct(col("ws"))).cast("double").as("n_distinct"),
        col("n_chars").cast("double").as("n_chars_d"))
      .withColumn("ttr",
        when(col("n_tok") > 0, col("n_distinct") / col("n_tok")).otherwise(0.0))
      .withColumn("mean_tok_len",
        when(col("n_tok") > 0, col("n_chars_d") / col("n_tok")).otherwise(0.0))
    val z = lit(-3.0) + lit(0.9) * log(col("n_tok") + 1.0) +
      lit(2.0) * col("ttr") + lit(0.1) * col("mean_tok_len")
    feats.withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
      .select(col("doc_id"), col("source"), col("txt_md5"),
        col("bow_md5"), col("score"))
  }

  /** Calibration / reliability audit (q248) of the fixed-weight
    * logistic scorer against the RULE-based quality gate — the check
    * a pipeline runs before swapping expensive hand-written rules for
    * a cheap learned filter: if the classifier is well calibrated,
    * score≈p really means "p of these docs pass the rules", and a
    * threshold can be chosen from the score alone. Emits the
    * standard reliability table (per score-decile: n, mean predicted
    * probability, empirical pass rate, |gap| — the per-bin ECE
    * terms — and the bin's Brier contribution).
    *
    * One scan: features, the σ(w·x+b) forward pass (same literal
    * weights as [[qualityScoreDocs]]) and the rule label (the
    * [[curatedDocs]] per-doc gates: n_chars ≥ 100, n_tok ≥ 20,
    * TTR > 0.2) all come from a single staged tokenization; the
    * aggregate is 10 groups, so map-side partials collapse before the
    * shuffle. Determinism: the bin is floor(score·10) over identical
    * IEEE doubles; per-bin means fold decimal sums (score) and exact
    * longs (labels) — no float accumulates in engine order. */
  def calibrationAudit(spark: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("ws"))
      .select(col("n_chars"),
        size(col("ws")).cast("double").as("n_tok"),
        size(array_distinct(col("ws"))).cast("double").as("n_distinct"))
      .withColumn("ttr",
        when(col("n_tok") > 0, col("n_distinct") / col("n_tok")).otherwise(0.0))
      .withColumn("mean_tok_len",
        when(col("n_tok") > 0,
          col("n_chars").cast("double") / col("n_tok")).otherwise(0.0))
    val z = lit(-3.0) + lit(0.9) * log(col("n_tok") + 1.0) +
      lit(2.0) * col("ttr") + lit(0.1) * col("mean_tok_len")
    val scored = feats
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
      .withColumn("label",
        (col("n_chars") >= 100 && col("n_tok") >= 20.0 &&
          col("ttr") > 0.2).cast("long"))
      .withColumn("bin", least(floor(col("score") * 10.0), lit(9.0))
        .cast("int"))
    scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("score").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("mean_pred"),
        round(sum(col("label")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"),
        round(abs(sum(col("score").cast("decimal(28,12)")).cast("double") /
            count(lit(1)) -
          sum(col("label")).cast("double") / count(lit(1))), 6)
          .as("abs_gap"),
        round(sum(((col("score") - col("label").cast("double")) *
            (col("score") - col("label").cast("double")))
          .cast("decimal(28,12)")).cast("double") / count(lit(1)), 6)
          .as("brier"))
  }

  /** Dedup that keeps the BEST copy, not the first: groups documents
    * by their BAG-OF-WORDS digest (same distinct token set — the
    * reordered/shuffled-copy class byte-level dedup misses while
    * still being an EXACT equality grouping, no similarity join) and
    * keeps the member with the highest [[qualityScoreDocs]] score
    * (ties → min doc_id) — what a shipped pipeline wants when copies
    * differ in quality: the longest/cleanest variant survives, not
    * whichever arrived first. One scan, one digest-partitioned
    * window; emits the duplicate groups only (kept doc + copy count
    * + its score) — singletons pass a dedup untouched and would
    * swamp the audit. */
  def bestCopyDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bow_md5"))
    val rankW = w.orderBy(col("score").desc, col("doc_id"))
    qualityScoreDocs(spark, dir)
      .withColumn("rk", row_number().over(rankW))
      .withColumn("n_copies", count(lit(1)).over(w))
      .filter(col("rk") === 1 && col("n_copies") >= 2)
      .select(col("doc_id"), col("source"),
        col("n_copies").cast("long").as("n_copies"),
        round(col("score"), 6).as("score"))
  }

  /** Vocabulary coverage (OOV-rate complement) per language against
    * the corpus top-`vocabSize` tokens — the tokenizer-fit diagnostic
    * a training pipeline runs before committing a vocab. Two corpus
    * scans by construction (one fits the vocab, one measures
    * coverage); the fitted vocab is a tiny broadcast so the measure
    * pass never shuffles the token stream — per-doc coverage folds
    * into the same groupBy. */
  def vocabCoverage(spark: SparkSession, dir: String,
      vocabSize: Int = 10): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("in_v"))
    val perDoc = tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("in_v"), lit(0))).as("n_in"))
    perDoc
      .groupBy(col("lang"))
      .agg(
        round(
          sum((col("n_in").cast("double") / col("n_tok").cast("double"))
            .cast("decimal(28,6)")).cast("double") / count(lit(1)),
          4).as("avg_coverage"),
        count(lit(1)).as("n_docs"))
  }

  /** n-token shingle STRINGS from a staged token-array column `ws`
    * (the portable cousin of the hashed `WordShingles` native
    * expression — plain strings so an external engine can reproduce
    * them). Guarded: `sequence(1, k)` RUNS DESCENDING when k < 1, so
    * short docs get an explicit empty array. */
  private[graft] def shingleStrings(n: Int): Column = {
    val k = size(col("ws")) - lit(n - 1)
    when(k >= 1,
      transform(sequence(lit(1), k), i =>
        concat_ws(" ", (0 until n).map(j => element_at(col("ws"), i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * n-token shingle with an eval/benchmark set — the overlap check
    * a training pipeline runs before a corpus ships (here the eval
    * set is the doc_id < `evalMax` slice; in production it's the
    * benchmark suite). The blocklist is DISTINCT eval shingles —
    * small by construction (benchmarks are tiny next to the corpus)
    * — broadcast into a left-semi join against one corpus scan, so
    * the 100 TB side never shuffles; per-source audit counts come
    * from joining the contaminated-id set (ids only) back. */
  /** Distinct corpus doc_ids sharing any n-token shingle with the
    * eval slice — the contaminated-id set [[decontaminate]] audits
    * and [[curatedCorpus]] excludes. */
  def contaminatedIds(spark: SparkSession, dir: String, n: Int = 4,
      evalMax: Long = 5L): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(shingleStrings(n)).as("shingle"))
    val block = sh.filter(col("doc_id") < evalMax)
      .select(col("shingle")).distinct()
    sh.filter(col("doc_id") >= evalMax)
      .join(broadcast(block), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  def decontaminate(spark: SparkSession, dir: String, n: Int = 4,
      evalMax: Long = 5L): DataFrame = {
    val contam = contaminatedIds(spark, dir, n, evalMax)
      .withColumn("c", lit(1))
    Tables.documents(spark, dir).filter(col("doc_id") >= evalMax)
      .select(col("doc_id"), col("source"))
      .join(contam, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("c"), lit(0))).cast("long").as("n_contaminated"),
        sum(when(col("c").isNull, 1).otherwise(0)).cast("long").as("n_clean"))
  }

  /** End-to-end corpus curation — the composition a training-data
    * pipeline actually ships: quality gates (length, token count,
    * type-token ratio), exact dedup (keep the min-id copy per
    * identical text), benchmark decontamination, eval-slice
    * exclusion — reduced to the per-(source, lang) audit table.
    * Every stage is the scale-shaped form used by its standalone
    * query: gates are scan-side predicates, dedup is one window on
    * the text digest, contamination is a broadcast semi-join feeding
    * a left-anti join of ids only. */
  /** Per-doc survivor set of the curation pipeline (gates + exact
    * dedup + decontamination) — the shared core of [[curatedCorpus]]
    * and [[curatedCorpusNearDup]], public so audits can join against
    * the survivor ids directly. */
  def curatedDocs(spark: SparkSession, dir: String, n: Int = 4,
      evalMax: Long = 5L, bloomPrefilter: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        tokens(col("text")).as("ws"), md5(col("text")).as("txt_md5"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(col("ws")).cast("long").as("n_tok"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        col("txt_md5"))
    val dupW = Window.partitionBy(col("txt_md5")).orderBy(col("doc_id"))
    val gated = m.withColumn("dup_rk", row_number().over(dupW))
      .filter(col("doc_id") >= evalMax && col("dup_rk") === 1 &&
        col("n_chars") >= 100 && col("n_tok") >= 20 &&
        col("n_distinct").cast("double") / col("n_tok").cast("double") > 0.2)
    // `bloomPrefilter` is the 100 TB form of the exclusion: when the
    // contaminated-id set outgrows a broadcast, the plain anti join
    // shuffles every gate survivor against it — the bloom split
    // (graft.rel.Reduce.bloomAntiJoin) lets bloom-negative docs
    // bypass that shuffle entirely and resolves only the positive
    // sliver exactly. Results are identical either way (parity spec).
    // The bloom path consumes the id set THREE times (sizing action,
    // filter aggregation, exact anti join for positives), so it gets
    // persisted — ids only, kilobytes per million contaminated docs;
    // Spark's CacheManager dedupes by plan equality across calls.
    if (bloomPrefilter) {
      val contam = contaminatedIds(spark, dir, n, evalMax)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // gated is consumed by BOTH bloom branches (definitely-clean +
      // maybe); persisting it (metadata columns only, no text) keeps
      // the documented "two cheap scans" from re-running the gate
      // window twice over the raw corpus
      graft.rel.Reduce.bloomAntiJoin(
        gated.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        contam, "doc_id")
    } else
      gated.join(contaminatedIds(spark, dir, n, evalMax),
        Seq("doc_id"), "left_anti")
  }

  def curatedCorpus(spark: SparkSession, dir: String, n: Int = 4,
      evalMax: Long = 5L, bloomPrefilter: Boolean = false): DataFrame =
    curatedDocs(spark, dir, n, evalMax, bloomPrefilter)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"))

  /** [[curatedCorpus]] with the NEAR-dup stage a shipped training
    * corpus actually runs: after the exact-dedup/gate/decontamination
    * survivors, drop every non-representative member of an LSH
    * near-dup cluster (MinHash banding → candidate pairs → Jaccard
    * verify → connected components; `Dedup.lshDedupClusters`), i.e.
    * keep only cluster reps. ID-only anti-join — the clusters table
    * carries (doc_id, rep_id), never text — so the added stage
    * shuffles ids, not the corpus. Rows-only at the gate (the cluster
    * path hashes with xxhash64, which DuckDB lacks); the spec pins
    * the audit equality: docs dropped vs [[curatedCorpus]] ==
    * gate-surviving non-rep members. */
  def curatedCorpusNearDup(spark: SparkSession, dir: String, n: Int = 4,
      evalMax: Long = 5L, k: Int = 3, threshold: Double = 0.7,
      portable: Boolean = false): DataFrame = {
    val clusters =
      if (portable) graft.ext.Dedup.lshDedupClustersPortable(spark, dir, k, threshold)
      else graft.ext.Dedup.lshDedupClusters(spark, dir, k, threshold)
    val nonReps = clusters
      .filter(col("rep_id") =!= col("doc_id"))
      .select(col("doc_id"))
    curatedDocs(spark, dir, n, evalMax)
      .join(nonReps, Seq("doc_id"), "left_anti")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"))
  }

  /** Cross-source overlap matrix: for every source pair, how many
    * distinct n-token shingles they share — the dataset-provenance
    * diagnostic behind "which of my sources are re-crawls of each
    * other". Grouped self-join ON THE SHINGLE (co-occurrence within
    * a shingle's source list, ≤ sources² pairs per shingle —
    * sources number in the hundreds, not the billions, so the join
    * fan-out is bounded at any corpus size); the corpus is scanned
    * once per side and reduced to DISTINCT (shingle, source) before
    * the join.
    *
    * HOT-SHINGLE CAP (`maxSources`): shingles present in more than
    * `maxSources` sources are dropped BEFORE the self-join. A
    * near-universal shingle (boilerplate, license headers) carries no
    * pairwise provenance signal — it votes for every pair equally —
    * yet contributes sources² join rows apiece; at 100 TB millions of
    * such shingles are pure skewed waste. The cap is a window count
    * partitioned on the same shingle key the join shuffles on (the
    * exchange is reused), and the per-shingle row count is already
    * ≤ #sources, so the window itself cannot skew. */
  /** Cross-document duplicated n-gram stats (q178) — the per-document
    * duplication audit of Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better" (arXiv:2107.06499), at
    * n-gram rather than suffix granularity: for each document, the
    * fraction of its DISTINCT n-gram shingles that also appear in
    * another document. High-fraction docs are the boilerplate /
    * template mass that whole-doc near-dedup misses when the
    * documents differ overall. Sub-quadratic by construction — one
    * shingle aggregate (n_docs per shingle; map-side partial
    * aggregation absorbs hot shingles, there is NO pair explosion to
    * guard) and one join back. At 100 TB the join key drops to a
    * 64-bit shingle hash (collision-tolerant for an audit); plain
    * strings keep the oracle exact here. Short docs (< n tokens)
    * carry zero shingles and report dup_frac 0. */
  def dupNgramStats(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        explode_outer(array_distinct(shingleStrings(n))).as("shingle"))
    val counts = sh.filter(col("shingle").isNotNull)
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    sh.join(counts, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("shingle")).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(when(col("n_shingles") > 0,
          col("n_dup").cast("double") / col("n_shingles")).otherwise(0.0), 6)
          .as("dup_frac"))
  }

  /** Duplicated-SPAN coverage (q182) — the positional refinement of
    * [[dupNgramStats]], the shape of Lee et al.'s exact-substring
    * dedup: which token POSITIONS of each document sit inside some
    * n-gram that also occurs in another document. That coverage
    * fraction is what span-removal dedup would actually delete
    * (overlapping duplicated n-grams merge by position, so a long
    * shared passage counts once, not once per n-gram). Plan shape:
    * positional shingles (posexplode — one scan), cross-doc shingles
    * via one countDistinct aggregate, a semi join back, and the
    * covered-position union as explode(sequence(i, i+n−1)) →
    * countDistinct — set algebra in columns, no interval-merge UDF.
    * The n× position blow-up is bounded and scan-local; everything
    * after the semi join carries (doc_id, position) longs only. */
  def dupSpanStats(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
    val sh = base.select(col("doc_id"),
      posexplode(shingleStrings(n)).as(Seq("i", "shingle")))
    val dup = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("shingle"))
    val cov = sh.join(dup, Seq("shingle"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + n - 1)).as("p"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("p")).as("n_cov"))
    base.select(col("doc_id"), size(col("ws")).cast("long").as("n_tok"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_cov"), lit(0L)).as("n_cov"),
        round(when(col("n_tok") > 0,
          coalesce(col("n_cov"), lit(0L)).cast("double") / col("n_tok"))
          .otherwise(0.0), 6).as("dup_span_frac"))
  }

  private val overlapCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), DataFrame]

  /** Unpersist + drop the memoized source-overlap edge tables
    * (long-session hygiene; the Dedup.clearCaches contract). */
  def clearCaches(): Unit = {
    overlapCache.values.foreach(df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () })
    overlapCache.clear()
  }

  /** Cross-source shingle-overlap edge list — MEMOIZED + persisted
    * per (dir, n, maxSources): SEVEN consumers (q100's matrix, q155
    * triangles, q116 PageRank, q270 k-core, q292 BFS, q297
    * modularity, clustering coefficient) each need the same edge
    * build, and the shingle self-join under it is the expensive
    * step at any scale. The same compute-once discipline as
    * [[graft.ext.Dedup.shingleTable]]; entries are session-validated
    * (see [[Memo]]) and [[clearCaches]] unpersists everything. */
  def sourceOverlap(spark: SparkSession, dir: String, n: Int = 4,
      maxSources: Int = 4): DataFrame =
    graft.ext.Memo.cached(overlapCache, (dir, n, maxSources), spark) {
      import org.apache.spark.sql.expressions.Window
      val sh = Tables.documents(spark, dir)
        .select(col("source"), tokens(col("text")).as("ws"))
        .select(col("source"), explode(shingleStrings(n)).as("shingle"))
        .distinct()
        .withColumn("ns",
          count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("ns") <= maxSources)
      val a = sh.select(col("shingle"), col("source").as("source_a"))
      val b = sh.select(col("shingle"), col("source").as("source_b"))
      a.join(b, Seq("shingle"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Provenance-graph TRIANGLE census over the source-overlap graph:
    * how clustered is the re-crawl structure — a triangle (three
    * sources pairwise sharing ≥ `minShared` shingles) is the
    * signature of a common upstream, where a mere edge could be
    * coincidence. Per source: degree and triangle membership count
    * (the local clustering signal). The graph has one node per
    * SOURCE (hundreds at any corpus size — the expensive step is
    * [[sourceOverlap]]'s edge build, which is the already-audited
    * shingle join; the triangle join itself runs on the tiny edge
    * set). The edge table feeds FOUR consumers (three triangle-join
    * aliases + degree), so it is persisted — without the barrier the
    * whole shingle-join subtree would re-run per alias (the
    * re-expansion class PlanAuditSpec guards). */
  def sourceTriangles(spark: SparkSession, dir: String, n: Int = 4,
      minShared: Long = 3L): DataFrame = {
    val e = sourceOverlap(spark, dir, n)
      .filter(col("n_shared") >= minShared)
      .select(col("source_a").as("sa"), col("source_b").as("sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("sa").as("source"))
      .unionByName(e.select(col("sb").as("source")))
      .groupBy(col("source")).agg(count(lit(1)).as("degree"))
    // oriented triangles (a < b < c by the edge orientation) counted
    // once; each corner then credits its source
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.sb") === col("e2.sa"))
      .join(e.as("e3"),
        col("e3.sa") === col("e1.sa") && col("e3.sb") === col("e2.sb"))
      .select(col("e1.sa").as("a"), col("e1.sb").as("b"), col("e2.sb").as("c"))
    val corners = tri.select(explode(array(col("a"), col("b"), col("c")))
        .as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_triangles"))
    deg.join(corners, Seq("source"), "left")
      .select(col("source"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Per-source template/boilerplate score (q259) — the curation
    * probe for auto-generated content: if a large fraction of a
    * source's documents OPEN with the same 4-token prefix, the
    * source is template-stamped (listings, mirrors, generated spam)
    * and its dedup/quality treatment should change. Each doc
    * contributes exactly ONE row (its opening shingle — no explode
    * of the whole text), so the scan reduces to a per-(source,
    * prefix) count table; the winner per source is one
    * source-partitioned window with a total order (count desc, then
    * prefix asc — ties deterministic). template_score = top-prefix
    * share of the source's docs, an exact-long division. Docs
    * shorter than 4 tokens are excluded (no 4-prefix exists) but
    * still counted in n_docs — absence of a prefix is not evidence
    * of a template. */
  def templateScore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("ws"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val prefixes = docs.filter(size(col("ws")) >= 4)
      .select(col("source"),
        concat_ws(" ", col("ws")(0), col("ws")(1), col("ws")(2),
          col("ws")(3)).as("prefix"))
      .groupBy(col("source"), col("prefix")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("df").desc, col("prefix"))
    prefixes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(nDocs, Seq("source"))
      .select(col("source"), col("n_docs"), col("prefix").as("top_prefix"),
        col("df").as("top_df"),
        round(col("df").cast("double") / col("n_docs").cast("double"), 6)
          .as("template_score"))
  }

  /** Local clustering coefficients + global transitivity (q255) over
    * the provenance graph — [[sourceTriangles]] says WHO sits in
    * triangles; the coefficient normalizes that by each node's
    * opportunity (C_i = 2·T_i / deg_i·(deg_i−1)), turning raw counts
    * into the "is this source's neighbourhood one upstream family"
    * score, with transitivity = ΣT_i / ΣC(deg_i,2) as the one-number
    * graph summary (attached per row — the node table is
    * sources-sized). Every ratio is a division of exact longs from
    * the census, so the whole table hash-gates; cost is the same
    * already-persisted edge build as q155 plus arithmetic. Degree-1
    * nodes take NULL (no wedge to close — 0 would claim a measured
    * absence). */
  def clusteringCoeff(spark: SparkSession, dir: String, n: Int = 4,
      minShared: Long = 3L): DataFrame = {
    val t = sourceTriangles(spark, dir, n, minShared)
    val wedges = (col("degree") * (col("degree") - 1) / 2).cast("long")
    val withW = t.withColumn("n_wedges", wedges)
    val tot = withW.agg(sum(col("n_triangles")).as("tri3"),
      sum(col("n_wedges")).as("w_tot"))
    withW.crossJoin(broadcast(tot))
      .select(col("source"), col("degree"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") > 0,
          round(col("n_triangles").cast("double") /
            col("n_wedges").cast("double"), 6)).as("local_cc"),
        when(col("w_tot") > 0,
          round(col("tri3").cast("double") /
            col("w_tot").cast("double"), 6)).as("transitivity"))
  }

  /** k-core membership (q270) by iterative peeling — the
    * degeneracy view of the provenance graph: a node in the k-core
    * survives repeated removal of all degree-<k nodes, so 2-core
    * members sit on CYCLES of overlap (mutual re-crawl families)
    * and 3-core members in densely-wired cores, where raw degree
    * (q155) can be inflated by one hub. Peeling runs a FIXED
    * `rounds` iterations of [degree → filter → induced subgraph] —
    * each round is one small aggregate + two semi joins on the
    * edge list, and a fixed unroll keeps the DuckDB oracle an exact
    * mirror (6 rounds peel any graph whose removal cascade is ≤ 6
    * deep; the spec asserts the fixpoint really was reached on this
    * corpus). Scale: every step is edge-list-sized, keyed on node
    * ids. */
  def kcore(spark: SparkSession, dir: String, n: Int = 4,
      minShared: Long = 3L, rounds: Int = 6,
      driverGridMax: Int = graft.ext.Guards.defaultDriverGridMax): DataFrame = {
    // Adaptive collapse (shared q251 rule): the SOURCE-level edge
    // grid is bounded (pairs of source names, not documents) —
    // running the 12-round peel loop at spark.sql.shuffle.partitions
    // width was pure scheduler overhead (measured 17.8 s → ~3 s) —
    // but the rule, not an unconditional coalesce(1), so a
    // URL-cardinality source column would keep its parallelism; the
    // heavy shingle join inside sourceOverlap is persisted either way
    val eAll = sourceOverlap(spark, dir, n)
      .filter(col("n_shared") >= minShared)
      .select(col("source_a").as("sa"), col("source_b").as("sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = eAll.count()
    // Altitude switch (the hits/pageRank/CC rule): the peel loop is
    // pure exact set logic — `rounds` × 2 core values × (degree agg +
    // two semi-joins + checkpoint) Spark jobs on a bounded source
    // grid were scheduler overhead. Collect (boundedGrid-guarded)
    // and peel driver-side; a document-cardinality graph keeps the
    // distributed loop. Bit-identity is structural (integers only) —
    // pinned by a parity spec.
    if (nEdges > 0 && nEdges <= driverGridMax)
      return kcoreDriver(eAll, rounds, driverGridMax)
    val e0 = graft.ext.Guards.coalesceTiny(eAll, nEdges)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("sa").as("node"))
        .unionByName(e.select(col("sb").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    def survivors(k: Int): DataFrame = {
      var e = e0
      for (i <- 1 to rounds) {
        val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
        e = e
          .join(keep.select(col("node").as("sa")), Seq("sa"), "left_semi")
          .join(keep.select(col("node").as("sb")), Seq("sb"), "left_semi")
          // every round, back down: each round's degrees + two
          // semi-joins re-widen the grid to the session shuffle
          // width; the adaptive re-collapse keeps every peel job one
          // task on a tiny grid (and the lineage flat) without
          // serializing a genuinely large graph
          .transform(graft.ext.Guards.coalesceTiny(_, nEdges))
          .localCheckpoint(eager = true)
      }
      e.select(col("sa").as("node"))
        .unionByName(e.select(col("sb").as("node"))).distinct()
    }
    degrees(e0)
      .join(survivors(2).withColumn("c2", lit(1L)), Seq("node"), "left")
      .join(survivors(3).withColumn("c3", lit(1L)), Seq("node"), "left")
      .select(col("node").as("source"), col("deg").as("degree"),
        coalesce(col("c2"), lit(0L)).as("in_2core"),
        coalesce(col("c3"), lit(0L)).as("in_3core"))
  }

  /** Driver-altitude [[kcore]] peel over the collected bounded edge
    * grid — exact integer set logic replicating the distributed
    * rounds verbatim: per round, degrees over both endpoints, keep
    * nodes with deg ≥ k, keep edges with BOTH endpoints kept. */
  private def kcoreDriver(eAll: DataFrame, rounds: Int,
      driverGridMax: Int): DataFrame = {
    val spark = eAll.sparkSession
    val grid = graft.ext.Guards
      .boundedGrid(eAll, math.max(driverGridMax, 1), "kcore edge grid")
      .map(r => (r.getString(0), r.getString(1))).toSeq
    def degrees(es: Seq[(String, String)]): Map[String, Long] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      es.foreach { case (a, b) =>
        m(a) = m.getOrElse(a, 0L) + 1L
        m(b) = m.getOrElse(b, 0L) + 1L
      }
      m.toMap
    }
    def survivors(k: Int): Set[String] = {
      var es = grid
      for (_ <- 1 to rounds) {
        val keep = degrees(es).filter(_._2 >= k).keySet
        es = es.filter { case (a, b) => keep(a) && keep(b) }
      }
      es.flatMap { case (a, b) => Seq(a, b) }.toSet
    }
    val deg0 = degrees(grid)
    val c2 = survivors(2)
    val c3 = survivors(3)
    import spark.implicits._
    deg0.toSeq.sortBy(_._1)(graft.ext.Guards.utf8Ordering)
      .map { case (node, d) =>
        (node, d, if (c2(node)) 1L else 0L, if (c3(node)) 1L else 0L)
      }
      .toDF("source", "degree", "in_2core", "in_3core")
  }

  /** BFS hop distances (q292) — breadth-first traversal over the
    * [[sourceOverlap]] content-similarity graph from its
    * lexicographically-smallest node: per source, the shortest hop
    * count within `hops` (NULL = unreachable that close) — the
    * "how connected is this provenance cluster" view that
    * complements [[kcore]]'s density and [[clusteringCoeff]]'s
    * transitivity with DISTANCE. Classic distributed BFS: each
    * round joins only the FRONTIER against the edge list (never the
    * whole reached set), dedups, anti-joins the seen set, and the
    * loop is bounded by `hops` — per-round cost is O(frontier
    * edges), the scalable Pregel shape, with the frontier persisted
    * and the seen set checkpoint-truncated like [[Dedup
    * .connectedComponents]]. The 1-row root lookup is the only
    * driver collect. */
  def bfsHops(spark: SparkSession, dir: String, n: Int = 4,
      minShared: Long = 3L, hops: Int = 4,
      driverGridMax: Int = graft.ext.Guards.defaultDriverGridMax): DataFrame = {
    val e0 = sourceOverlap(spark, dir, n)
      .filter(col("n_shared") >= minShared)
      .select(col("source_a").as("sa"), col("source_b").as("sb"))
    val edges = e0.unionByName(
        e0.select(col("sb").as("sa"), col("sa").as("sb")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Altitude switch (the hits/kcore rule): BFS over a bounded
    // source grid is exact set logic — run it driver-side when the
    // symmetrized edge list collects (boundedGrid-guarded); the
    // distributed frontier loop below stays the scale path.
    val bfsCount = edges.count()
    if (bfsCount > 0 && bfsCount <= driverGridMax)
      return bfsDriver(edges, hops, driverGridMax)
    val nodes = edges.select(col("sa").as("node")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val root = nodes.agg(min(col("node"))).head().getString(0)
    var dist = nodes.filter(col("node") === root)
      .select(col("node"), lit(0).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var frontier = dist
    for (i <- 1 to hops) {
      val nxt = frontier
        .join(edges, frontier("node") === edges("sa"))
        .select(col("sb").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(i).as("d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dist = dist.unionByName(nxt).localCheckpoint(eager = true)
      frontier = nxt
    }
    val deg = edges.groupBy(col("sa").as("node"))
      .agg(count(lit(1)).as("degree"))
    deg.join(dist, Seq("node"), "left")
      .select(col("node").as("source"), col("degree"),
        col("d").cast("int").as("hop"))
  }

  /** Driver-altitude [[bfsHops]] over the collected SYMMETRIZED edge
    * grid: classic BFS from the UTF-8-minimum node (Spark's binary
    * string min), hop-bounded exactly like the distributed frontier
    * loop; degree = out-edge count in the symmetrized table. */
  private def bfsDriver(edges: DataFrame, hops: Int,
      driverGridMax: Int): DataFrame = {
    val spark = edges.sparkSession
    val grid = graft.ext.Guards
      .boundedGrid(edges, math.max(driverGridMax, 1), "bfs edge grid")
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val adj = grid.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val nodeSeq = grid.map(_._1).distinct
      .sorted(graft.ext.Guards.utf8Ordering)
    val root = nodeSeq.head
    val dist = scala.collection.mutable.HashMap[String, Int](root -> 0)
    var frontier = Seq(root)
    for (i <- 1 to hops) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Nil)).distinct
        .filterNot(dist.contains)
      nxt.foreach(dist(_) = i)
      frontier = nxt
    }
    val rows = nodeSeq.map { nd =>
      org.apache.spark.sql.Row(nd, adj(nd).size.toLong,
        dist.get(nd).map(Int.box).orNull)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("degree",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("hop",
        org.apache.spark.sql.types.IntegerType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** Newman modularity (q297) — score the partition the engine
    * itself produces: connected components of the [[sourceOverlap]]
    * graph as communities, Q = Σ_c [e_c/m − (d_c/2m)²] (Newman &
    * Girvan 2004) — positive contribution means a community has
    * more internal edges than a degree-preserving random graph
    * would give it, i.e. the provenance clusters are real structure
    * and not degree artifacts. The companion quality gate to
    * [[clusteringCoeff]] / [[kcore]]: those describe the graph,
    * this scores a PARTITION of it. All counts are exact integers
    * on the bounded source grid (coalesced to one partition — the
    * q270 lesson); each community's contribution is one fixed IEEE
    * chain, reported per community. */
  def modularity(spark: SparkSession, dir: String, n: Int = 4,
      minShared: Long = 3L): DataFrame = {
    // adaptive collapse (shared q251 rule): the SOURCE-level grid is
    // tiny here, but a huge provenance graph keeps its parallelism —
    // count the persisted edge list once, then collapse only if tiny
    val eAll = sourceOverlap(spark, dir, n)
      .filter(col("n_shared") >= minShared)
      .select(col("source_a").as("sa"), col("source_b").as("sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = eAll.count()
    val e0 = graft.ext.Guards.coalesceTiny(eAll, nEdges)
    val comp = graft.ext.Guards.coalesceTiny(
      graft.ext.Dedup.connectedComponents(e0, "sa", "sb",
          algorithm = "auto")
        .select(col("id"), col("label")), nEdges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mRow = e0.agg(count(lit(1)).as("m"))
    val ein = e0
      .join(comp.select(col("id").as("sa"), col("label").as("la")), "sa")
      .join(comp.select(col("id").as("sb"), col("label").as("lb")), "sb")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("e_in"))
    val dtot = e0.select(col("sa").as("node"))
      .unionByName(e0.select(col("sb").as("node")))
      .join(comp.select(col("id").as("node"), col("label")), "node")
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("d_tot"),
        countDistinct(col("node")).as("n_nodes"))
    dtot.join(ein, Seq("community"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        round(coalesce(col("e_in"), lit(0L)).cast("double")
          / col("m").cast("double")
          - (col("d_tot").cast("double")
              / (lit(2.0) * col("m").cast("double")))
            * (col("d_tot").cast("double")
              / (lit(2.0) * col("m").cast("double"))), 6)
          .as("contribution"))
  }

  /** Sparse TF-IDF cosine similarity join (q267) — the SPARSE-vector
    * companion to the dense embedding cosine (q50): documents as
    * tf·idf bags, pairs generated by an inverted-index join on
    * SHARED TERMS (a pair with no common term never materializes —
    * the fundamental sparse-join advantage over all-pairs), dot
    * products and norms folded through DECIMAL(28,12) so the float
    * sums are order-independent. Run EXACTLY inside the bounded id
    * window (the q137 ground-truth device); the corpus-scale path is
    * the same plan with a df-cap on the join terms (hot terms
    * contribute ~0 weight anyway: idf → 0 as df → N — the documented
    * trade, cf. the PPJoin prefix filter at q150 for the exact
    * sub-quadratic alternative). */
  def sparseCosinePairs(spark: SparkSession, dir: String,
      maxId: Long = 400L, threshold: Double = 0.8): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val nd = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val wts = tf
      .join(tf.groupBy(col("term")).agg(count(lit(1)).as("df")), Seq("term"))
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = wts.groupBy(col("doc_id"))
      .agg(sum((col("w") * col("w")).cast("decimal(28,12)")).as("nrm"))
    val dots = wts.select(col("doc_id").as("doc_a"), col("term"),
        col("w").as("wa"))
      .join(wts.select(col("doc_id").as("doc_b"), col("term"),
        col("w").as("wb")), Seq("term"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum((col("wa") * col("wb")).cast("decimal(28,12)")).as("dot"))
    val cos = col("dot").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")),
        Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")),
        Seq("doc_b"))
      .filter(cos >= threshold)
      .select(col("doc_a"), col("doc_b"), round(cos, 6).as("cosine"))
  }

  /** Degree assortativity (q262) of the provenance graph — Pearson
    * correlation of endpoint degrees over the (symmetrized) edge
    * list: positive means hub sources overlap with other hubs (one
    * big upstream family), negative means hubs fan out to satellites
    * (mirror-of-mirrors). Completes the graph-shape kit (q116
    * centrality, q155 triangles, q255 clustering). All sufficient
    * statistics are exact-long sums over the edges × degrees join
    * (DECIMAL(19,0) cross products), finished by one fixed IEEE
    * chain — the same recipe as the q238 correlation matrix, on a
    * graph-sized table. */
  def degreeAssortativity(spark: SparkSession, dir: String, n: Int = 4,
      minShared: Long = 3L): DataFrame = {
    def d19(c: Column) = c.cast("decimal(19,0)")
    val e0 = sourceOverlap(spark, dir, n)
      .filter(col("n_shared") >= minShared)
      .select(col("source_a").as("sa"), col("source_b").as("sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = e0.unionByName(e0.select(col("sb").as("sa"), col("sa").as("sb")))
    val deg = e.groupBy(col("sa").as("node")).agg(count(lit(1)).as("deg"))
    val pairs = e
      .join(deg.select(col("node").as("sa"), col("deg").as("dx")), Seq("sa"))
      .join(deg.select(col("node").as("sb"), col("deg").as("dy")), Seq("sb"))
    val s = pairs.agg(count(lit(1)).as("m"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(d19(col("dx")) * d19(col("dy"))).as("sxy"),
      sum(d19(col("dx")) * d19(col("dx"))).as("sxx"),
      sum(d19(col("dy")) * d19(col("dy"))).as("syy"))
    val m = col("m").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = m * d("sxy") - d("sx") * d("sy")
    val den = sqrt(m * d("sxx") - d("sx") * d("sx")) *
      sqrt(m * d("syy") - d("sy") * d("sy"))
    s.select((col("m") / 2).cast("long").as("n_edges"),
      when(den > 0.0, round(num / den, 6)).as("assortativity"))
  }

  /** Document-length histogram: fixed-width 200-char buckets by
    * floor division — single partial→final agg, no window, no sort;
    * the portable form of width_bucket (which the oracle engine
    * lacks). */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(floor(col("n_chars") / lit(200.0)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Zipf-law fit of the corpus frequency distribution: least-squares
    * slope/intercept of ln(freq) on ln(rank) — the one-number
    * diagnostic for "does this corpus look like natural language"
    * (natural text ≈ −1; boilerplate/spam corpora bend it). The
    * regression sums are taken over NANO-SCALED INTEGER surrogates
    * (round(ln·10⁹) as long; the cross products through a (19,0)²
    * decimal): exact integers sum order-independently, every →double
    * conversion is one correctly-rounded step, and the closed-form
    * fit is then a fixed IEEE chain — bit-identical across engines.
    * (Two rejected designs: a plain double SUM is summation-order-
    * dependent; a RUNNING window sum pins the order in principle but
    * the oracle engine evaluates cumulative frames through a segment
    * tree, which re-associates the additions.) The quantization
    * perturbs each ln by ≤5e-10 — noise four orders below the fit's
    * own residuals. One scan → vocab-sized agg; the rank window runs
    * over the vocabulary table only. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val wr = Window.orderBy(col("n").desc, col("word"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val agg = freq
      .select(row_number().over(wr).as("rank"), col("n"))
      .select(
        round(log(col("rank").cast("double")) * 1e9, 0).cast("long").as("xi"),
        round(log(col("n").cast("double")) * 1e9, 0).cast("long").as("yi"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("xi")).as("sxi"), sum(col("yi")).as("syi"),
        sum(dec(col("xi")) * dec(col("yi"))).as("sxyi"),
        sum(dec(col("xi")) * dec(col("xi"))).as("sxxi"))
    val r = col("n_terms").cast("double")
    val sx = col("sxi").cast("double") / 1e9
    val sy = col("syi").cast("double") / 1e9
    val sxy = col("sxyi").cast("double") / 1e18
    val sxx = col("sxxi").cast("double") / 1e18
    val slope = (r * sxy - sx * sy) / (r * sxx - sx * sx)
    agg.select(col("n_terms"), slope.as("slope"),
      ((sy - slope * sx) / r).as("intercept"))
  }

  /** Kneser-Ney–smoothed bigram probabilities (fixed discount
    * D = 0.75) — the LM-data counterpart of the MLE trigram LM
    * (q105): KN backs off to CONTINUATION counts ("in how many
    * contexts does w2 appear") rather than raw unigram frequency,
    * the smoothing that actually works for corpus scoring.
    * Everything derives from exact integer counts (bigram counts,
    * context totals, distinct-continuation counts via windows over
    * the bigram TABLE, never the corpus), and P_kn is one fixed IEEE
    * chain per row — deterministic, hash-gated. One corpus scan
    * builds the bigram table; the windows and joins that follow run
    * on |V|²-bounded aggregates. */
  def knBigrams(spark: SparkSession, dir: String, discount: Double = 0.75,
      topN: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(posexplode(col("ws")).as(Seq("i", "w1")), col("ws"))
      .select(col("w1"),
        // get(): 0-based and null past the end (element_at throws
        // under ANSI for an out-of-bounds index)
        get(col("ws"), col("i") + 1).as("w2"))
      .filter(col("w2").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val byW1 = Window.partitionBy(col("w1"))
    val byW2 = Window.partitionBy(col("w2"))
    val all = Window.partitionBy()
    bg.select(col("w1"), col("w2"), col("c"),
        sum(col("c")).over(byW1).as("c1"),
        count(lit(1)).over(byW1).as("n1fw"),
        count(lit(1)).over(byW2).as("n1bw"),
        count(lit(1)).over(all).as("nAll"))
      .select(col("w1"), col("w2"), col("c"),
        ((greatest(col("c").cast("double") - discount, lit(0.0))
          / col("c1").cast("double"))
          + (lit(discount) * col("n1fw").cast("double")
            / col("c1").cast("double"))
            * (col("n1bw").cast("double") / col("nAll").cast("double")))
          .as("p_kn"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Term burstiness: variance-to-mean ratio of a term's per-document
    * count over ALL documents (zeros included) — Church/Gale's
    * dispersion diagnostic (content words are bursty, VMR ≫ 1;
    * function words are Poisson-ish, VMR ≈ 1; generated/boilerplate
    * text flattens the profile). Moments come from exact integer
    * sums (Σc, Σc² per term; zeros contribute nothing, so the docs
    * that lack the term never materialize) and the VMR is a fixed
    * IEEE chain — hash-gated. One scan → (doc, term) counts →
    * term-keyed agg. */
  def burstiness(spark: SparkSession, dir: String, minCf: Long = 10L)
      : DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    perDoc.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
        sum(col("c") * col("c")).as("s2"))
      .filter(col("cf") >= minCf)
      .join(broadcast(nDocs))
      .select(col("word"), col("df"), col("cf"),
        ((col("s2").cast("double") / col("n_docs").cast("double")
          - (col("cf").cast("double") / col("n_docs").cast("double"))
            * (col("cf").cast("double") / col("n_docs").cast("double")))
          / (col("cf").cast("double") / col("n_docs").cast("double")))
          .as("vmr"))
  }

  /** Gini coefficient of token mass across sources — the one-number
    * "is my corpus mix dominated by a few sources" diagnostic
    * (0 = perfectly even, →1 = one source is the corpus). Computed
    * ENTIRELY on exact integers until one final expression: source
    * totals are exact longs, the rank weighting Σ i·xᵢ is an exact
    * long (ranked ascending by (tokens, source) — deterministic
    * tie-break), and gini = (2Σi·xᵢ − (n+1)Σx) / (nΣx) is one IEEE
    * division — hash-gated with no summation-order exposure. The
    * rank window runs over the SOURCE table (dozens of rows). */
  def sourceGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySource = Tables.documents(spark, dir)
      .select(col("source"), tokens(col("text")).as("tok"))
      .select(col("source"), size(col("tok")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("x"))
    val wr = Window.orderBy(col("x"), col("source"))
    bySource
      .select(col("x"), row_number().over(wr).cast("long").as("i"))
      .agg(count(lit(1)).as("n_sources"), sum(col("x")).as("total_tokens"),
        sum(col("i") * col("x")).as("iwx"))
      .select(col("n_sources"), col("total_tokens"),
        ((lit(2.0) * col("iwx").cast("double")
          - (col("n_sources") + 1).cast("double")
            * col("total_tokens").cast("double"))
          / (col("n_sources").cast("double")
            * col("total_tokens").cast("double"))).as("gini"))
  }

  /** Heaps'-law fit — [[zipfFit]]'s companion: vocabulary growth
    * V(n) ≈ K·n^β against cumulative token count, the diagnostic for
    * "is new data still adding new vocabulary" (corpus saturation;
    * dedup/curation bends β). The growth curve needs distinct-so-far,
    * which distributes cleanly as FIRST OCCURRENCES: each word's
    * minimum doc_id is one agg, the per-doc count of first
    * occurrences joins the per-doc token counts, and two running
    * integer window sums give (cum_tokens, cum_vocab) per prefix —
    * all exact longs, order-free. The ln-ln least squares reuses the
    * nano-scaled integer-surrogate recipe (see zipfFit for why
    * neither a double SUM nor a running double sum survives the
    * cross-engine gate). Windows run over the per-doc table. */
  def heapsFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize ONCE: the staged ws array feeds both the explode leg
    // (first occurrences) and the size leg (per-doc counts) —
    // persisted for its two consumers, the multi-consumer pattern
    // used throughout (an unstaged form re-runs the tokenizer per
    // consumer over the full corpus)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = base.select(col("doc_id"), explode(col("ws")).as("word"))
    val perDoc = base
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tok"))
    val firsts = toks.groupBy(col("word"))
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("n_new"))
    val run = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = perDoc
      .join(firsts, perDoc("doc_id") === firsts("first_doc"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .select(col("doc_id"),
        sum(col("n_tok")).over(run).as("cum_tokens"),
        sum(col("n_new")).over(run).as("cum_vocab"))
      .filter(col("cum_tokens") > 0 && col("cum_vocab") > 0)
    def dec(c: Column) = c.cast("decimal(19,0)")
    val agg = curve
      .select(
        round(log(col("cum_tokens").cast("double")) * 1e9, 0).cast("long")
          .as("xi"),
        round(log(col("cum_vocab").cast("double")) * 1e9, 0).cast("long")
          .as("yi"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("xi")).as("sxi"), sum(col("yi")).as("syi"),
        sum(dec(col("xi")) * dec(col("yi"))).as("sxyi"),
        sum(dec(col("xi")) * dec(col("xi"))).as("sxxi"))
    val r = col("n_points").cast("double")
    val sx = col("sxi").cast("double") / 1e9
    val sy = col("syi").cast("double") / 1e9
    val sxy = col("sxyi").cast("double") / 1e18
    val sxx = col("sxxi").cast("double") / 1e18
    val slope = (r * sxy - sx * sy) / (r * sxx - sx * sx)
    agg.select(col("n_points"), slope.as("beta"),
      ((sy - slope * sx) / r).as("intercept"))
  }

  /** Flesch reading-ease per document (q219): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/word), with the
    * classic vowel-group syllable heuristic — the readability axis a
    * curation quality gate adds next to length/stopword ratios
    * (academic-register vs conversational text separate cleanly).
    * All three counts are exact integers from staged
    * split/filter/transform chains (the tokenizer is staged ONCE,
    * never inlined in a lambda — re-eval cost), and the score is one
    * fixed IEEE chain per row, so the per-doc table hash-gates. One
    * scan, fully codegen'd, embarrassingly parallel. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        greatest(lit(1L), size(filter(split(col("text"), "[.!?]"),
          s => length(trim(s)) > 0)).cast("long")).as("n_sentences"),
        coalesce(aggregate(
          transform(col("ws"), w => size(filter(
            split(lower(w), "[^aeiouy]+"), p => length(p) > 0)).cast("long")),
          lit(0L), (acc, x) => acc + x), lit(0L)).as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") > 0, round(
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double")), 6)).as("flesch"))

  /** Distinctive terms per source (q220): Monroe–Colaresi–Quinn
    * log-odds with an informative Dirichlet prior ("Fightin' Words",
    * Political Analysis 2008) — the principled "what words
    * characterize source X against the rest" profiler (raw TF-IDF
    * over-ranks rare words; the prior shrinks them). Per (source,
    * word): δ = ln((y+α_w)/(n_s+α₀−y−α_w)) − ln the same for the
    * complement, z = δ/√(1/(y+α_w) + 1/(y_rest+α_w)), α_w = corpus
    * frequency × α₀. One token scan reduces to (source, word)
    * counts; the word-marginal join shuffles the vocabulary table
    * (not the corpus), source marginals broadcast, and the top-N
    * rank runs per source on z ROUNDED to 6 first (ranking raw
    * doubles would make the cut order engine-sensitive at ties). */
  def distinctiveTerms(spark: SparkSession, dir: String,
      alpha0: Double = 1000.0, topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("y_sw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wTot = sw.groupBy(col("word")).agg(sum(col("y_sw")).as("y_w"))
    val sTot = sw.groupBy(col("source")).agg(sum(col("y_sw")).as("n_s"))
    val corpus = sTot.agg(sum(col("n_s")).as("n_c"))
    val aw = lit(alpha0) * (col("y_w").cast("double")
      / col("n_c").cast("double"))
    val y = col("y_sw").cast("double")
    val yr = (col("y_w") - col("y_sw")).cast("double")
    val ns = col("n_s").cast("double")
    val nr = (col("n_c") - col("n_s")).cast("double")
    val delta = log((y + aw) / (ns + lit(alpha0) - y - aw)) -
      log((yr + aw) / (nr + lit(alpha0) - yr - aw))
    val z = delta / sqrt(lit(1.0) / (y + aw) + lit(1.0) / (yr + aw))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("z").desc, col("word"))
    sw.join(wTot, Seq("word"))
      .join(broadcast(sTot), Seq("source"))
      .join(broadcast(corpus))
      .select(col("source"), col("word"), col("y_sw"),
        round(z, 6).as("z"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
  }

  /** Collocation discovery via windowed PMI (q227): unordered word
    * pairs co-occurring within ±3 token positions, scored by
    * pointwise mutual information ln(p(a,b)/(p(a)·p(b))) — the
    * collocation-extraction classic ([[knBigrams]] models ADJACENT
    * continuation probability; PMI finds "strongly associated even
    * if 3 apart" pairs). Pair generation is LINEAR in corpus size —
    * per offset k ∈ 1..3 a slice-zip of the staged token array, not
    * a positional self-join (which goes quadratic on long docs) —
    * and the scoring joins run on the bounded pair/vocabulary
    * tables. min-count 5 prunes noise pairs before the margins join;
    * ranking is on ROUND-6 pmi with lexicographic tiebreaks. */
  def collocations(spark: SparkSession, dir: String, maxDist: Int = 3,
      minCount: Long = 5L, topN: Int = 25): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairRows = (1 to maxDist).map { k =>
      base.filter(size(col("ws")) > k)
        .select(explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - k),
          slice(col("ws"), lit(k + 1), size(col("ws")) - k),
          (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
        .select(least(col("p.x"), col("p.y")).as("word_a"),
          greatest(col("p.x"), col("p.y")).as("word_b"))
    }.reduce(_ unionByName _)
    val pairs = pairRows.groupBy(col("word_a"), col("word_b"))
      .agg(count(lit(1)).as("n_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.agg(sum(col("n_ab")).as("n_p"))
    val uni = base.select(explode(col("ws")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_w"))
    val nTok = uni.agg(sum(col("n_w")).as("n_t"))
    val pmi = log((col("n_ab").cast("double") / col("n_p").cast("double"))
      / ((col("n_a").cast("double") / col("n_t").cast("double"))
        * (col("n_b").cast("double") / col("n_t").cast("double"))))
    pairs.filter(col("n_ab") >= minCount)
      .join(uni.select(col("word").as("word_a"), col("n_w").as("n_a")),
        "word_a")
      .join(uni.select(col("word").as("word_b"), col("n_w").as("n_b")),
        "word_b")
      .join(broadcast(nPairs)).join(broadcast(nTok))
      .select(col("word_a"), col("word_b"), col("n_ab"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("word_a"), col("word_b"))
      .limit(topN)
  }

  /** Lexical-richness profile per source (q233): type-token ratio,
    * hapax-legomena rate (words occurring exactly once IN THAT
    * SOURCE), and dis-legomena — the vocabulary-health companions to
    * [[heapsFit]]'s corpus-level curve (template/boilerplate farms
    * crater the hapax rate long before dedup catches them; a
    * too-high rate flags OCR noise). One token scan to (source,
    * word) counts; everything after runs on the vocabulary table.
    * All ratios are divisions of exact longs. */
  def lexicalRichness(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("n") === 2L, 1L).otherwise(0L)).as("n_dis"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("n_dis"),
        round(col("n_types").cast("double")
          / col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("n_hapax").cast("double")
          / col("n_types").cast("double"), 6).as("hapax_rate"))

  /** Materialized inverted index: per term, document frequency,
    * corpus frequency, and the first `cap` postings (doc_ids
    * ascending, comma-joined — a STRING, deliberately: postings are
    * an index artifact, not a relational column, and a bounded string
    * survives any sink). The scale contract is per-term state
    * BOUNDED AT `cap`: postings come from a row_number()≤cap filter
    * over distinct (word, doc_id) pairs, never an unbounded
    * collect_list over a hot term's full posting list — at 100 TB a
    * stopword's postings are the corpus itself, and an unbounded
    * collect is an executor OOM. All three aggregates (df, cf,
    * postings) hash-partition on `word`, so the assembling joins are
    * co-located zero-exchange under AQE. */
  def invertedIndex(spark: SparkSession, dir: String, cap: Int = 20)
      : DataFrame = {
    // ONE corpus scan: per-(word, doc) counts carry everything —
    // df = rows per word, cf = Σ counts, postings from the capped
    // rank filter (Spark plans it as WindowGroupLimit: the per-group
    // top-cap is pre-pruned map-side before the window sort)
    val wd = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"), col("doc_id")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = wd.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("word")).orderBy(col("doc_id"))
    val postings = wd
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .groupBy(col("word"))
      .agg(concat_ws(",",
        // scale-ok: postings already rn ≤ cap filtered above — the
        // capped-postings design bounds fan-in per word by `cap`
        transform(sort_array(collect_list(col("doc_id"))),
          d => d.cast("string"))).as("postings"))
    stats.join(postings, "word")
      .select(col("word"), col("df"), col("cf"), col("postings"))
  }

  /** Bottom-k sketch Jaccard audit (q290) — estimate pairwise
    * source content overlap from KMV (bottom-k) sketches and report
    * the error against exact Jaccard: the sketch that makes
    * all-pairs source comparison affordable at 100 TB (k hashes per
    * source travel to one node; the corpus never self-joins), with
    * the estimator ĵ = |K_k(A∪B) ∩ K_k(A) ∩ K_k(B)| / |K_k(A∪B)|
    * (Bar-Yossef et al. 2002; the KMV cousin of minhash banding).
    * The exact side (distinct-shingle equi-join — the q100 shape)
    * exists to CALIBRATE k, tuning-time only. Portable md5 hashes
    * end to end, so every stage hash-gates. */
  def sketchJaccard(spark: SparkSession, dir: String, n: Int = 3,
      k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = Tables.documents(spark, dir)
      .select(col("source"), tokens(col("text")).as("ws"))
      .select(col("source"), explode(shingleStrings(n)).as("shingle"))
      .distinct()
      .select(col("source"),
        conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long")
          .as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bk = sh
      .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // merged bottom-k of the union per (sa, sb) pair: union the two
    // k-sets, rank, keep k; a member counts when BOTH sides hold it
    val srcs = bk.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("sa"))
      .crossJoin(srcs.select(col("source").as("sb")))
      .filter(col("sa") < col("sb"))
    val merged = pairs
      .join(bk.select(col("source").as("sa"), col("h")), Seq("sa"))
      .unionByName(pairs
        .join(bk.select(col("source").as("sb"), col("h")), Seq("sb"))
        .select(col("sa"), col("sb"), col("h")))
      .groupBy(col("sa"), col("sb"), col("h"))
      .agg(count(lit(1)).as("n_sides"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rn") <= k)
    val est = merged.groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("n_kept"),
        sum(when(col("n_sides") === 2, 1L).otherwise(0L)).as("n_both"))
      .select(col("sa"), col("sb"),
        round(col("n_both").cast("double")
          / col("n_kept").cast("double"), 6).as("est_jaccard"))
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val inter = sh.select(col("source").as("sa"), col("h"))
      .join(sh.select(col("source").as("sb"), col("h")), Seq("h"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_inter"))
    est
      .join(inter, Seq("sa", "sb"), "left")
      .join(sizes.select(col("source").as("sa"), col("nd").as("na")), "sa")
      .join(sizes.select(col("source").as("sb"), col("nd").as("nb")), "sb")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("est_jaccard"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double")
          / (col("na") + col("nb")
            - coalesce(col("n_inter"), lit(0L))).cast("double"), 6)
          .as("exact_jaccard"))
      .withColumn("abs_err",
        round(abs(col("est_jaccard") - col("exact_jaccard")), 6))
  }

  /** Content-novelty audit (q291) — what does each source ADD? Every
    * doc-distinct shingle is credited to the document where it FIRST
    * appears (min doc_id — the deterministic stand-in for ingest
    * order), and each source scores the fraction of its shingle mass
    * that is first-occurrence: the marginal-value curve behind "do
    * we still need to crawl source X", and the complement of
    * [[dupNgramStats]] (which scores how much of a doc is seen
    * ELSEWHERE; this scores how much of a source was seen FIRST
    * here). Shapes: one exploded scan to the (doc, shingle) table,
    * one shingle-keyed min-agg, one keyed join back (aggregate
    * before join — the hot-shingle row never fans out), one bounded
    * per-source fold. */
  def noveltyCurve(spark: SparkSession, dir: String,
      n: Int = 3): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(shingleStrings(n))).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstSeen = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, Seq("shingle"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("source"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double")
          / col("n_shingles").cast("double"), 6).as("novelty_rate"))
  }

  /** RAKE keyword extraction (q277) — Rapid Automatic Keyword
    * Extraction (Rose et al. 2010): candidate phrases are the
    * maximal token runs between stopword breakers, each word scores
    * degree/frequency over the phrase table (degree = Σ phrase-len
    * across its occurrences, self included), and a phrase scores
    * the sum of its words' scores — the zero-model keyphrase
    * extractor a corpus-exploration pass runs per source. Phrase
    * segmentation is the islands trick (running breaker count per
    * doc — one doc-partitioned window); runs longer than `maxLen`
    * are dropped (RAKE convention — unbounded runs are boilerplate,
    * not keyphrases). Determinism: word scores snap to round-6 and
    * phrase scores fold them as exact DECIMAL sums (order-free);
    * ranks tie-break on the phrase string (ASCII — both engines
    * byte-order). Scale shape: the only windows are per-doc; word
    * stats and phrase scores are keyed aggregates; the phrase table
    * persists once for its two consumers (stats + scores). */
  def rakeKeywords(spark: SparkSession, dir: String, maxLen: Int = 4,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stop = Seq("the", "a", "and", "of", "to")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrases = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("brk", col("w").isin(stop: _*))
      .withColumn("pid",
        sum(when(col("brk"), 1L).otherwise(0L)).over(wDoc))
      .filter(!col("brk"))
      .groupBy(col("doc_id"), col("source"), col("pid"))
      // scale-ok: group = one stopword-delimited phrase segment —
      // bounded by document length (and consumed at size ≤ maxLen)
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("s"))
      .select(col("source"),
        transform(col("s"), e => e.getField("w")).as("ws"))
      .filter(size(col("ws")) <= maxLen)
      .select(col("source"), concat_ws(" ", col("ws")).as("phrase"),
        col("ws"), size(col("ws")).cast("long").as("plen"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wordStats = phrases
      .select(col("source"), explode(col("ws")).as("w"), col("plen"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("source"), col("w"),
        round(col("deg").cast("double") / col("freq").cast("double"), 6)
          .as("wscore"))
    val occ = phrases.groupBy(col("source"), col("phrase"))
      .agg(count(lit(1)).as("n_occur"), first(col("ws")).as("ws"))
    val scored = occ
      .select(col("source"), col("phrase"), col("n_occur"),
        explode(col("ws")).as("w"))
      .join(wordStats, Seq("source", "w"))
      .groupBy(col("source"), col("phrase"), col("n_occur"))
      .agg(sum(col("wscore").cast("decimal(28,6)")).cast("double")
        .as("score"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("phrase"))).cast("int"))
      .filter(col("rk") <= topK)
      .select(col("source"), col("phrase"), col("n_occur"),
        round(col("score"), 6).as("score"), col("rk"))
  }

  /** TextRank keyword extraction (q308) — PageRank over the word
    * co-occurrence graph (Mihalcea & Tarau, EMNLP'04): words are
    * nodes, edges weight by co-occurrence count within a ±2 token
    * window, and centrality in that graph IS keywordness — the
    * graph-structural companion to [[collocations]]' pairwise PMI
    * and [[rakeKeywords]]' degree scores. Pair generation is the
    * linear slice-zip (never a positional self-join); the graph is
    * pruned to edges with count ≥ minCount, so the power loop runs
    * on a bounded vocabulary grid, coalesced to 1 partition (the
    * q251 tiny-graph fast path — a few-k-node graph does not deserve
    * 32 near-empty tasks per iteration).
    *
    * Determinism device (the [[graft.ext.Dedup.hits]] recipe, which
    * lets the DuckDB oracle unroll the SAME loop as a recursive
    * CTE): edge probabilities are exact-integer ratios, and each
    * per-node incoming sum snaps to a round-12 integer surrogate —
    * the rank trajectory is bit-identical in any engine and any
    * partitioning. */
  def textRank(spark: SparkSession, dir: String, maxDist: Int = 2,
      minCount: Long = 5L, iters: Int = 8, topN: Int = 25,
      driverGridMax: Int = graft.ext.Guards.defaultDriverGridMax): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairRows = (1 to maxDist).map { k =>
      base.filter(size(col("ws")) > k)
        .select(explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - k),
          slice(col("ws"), lit(k + 1), size(col("ws")) - k),
          (x, y) => struct(x.as("x"), y.as("y")))).as("p"))
        .select(least(col("p.x"), col("p.y")).as("word_a"),
          greatest(col("p.x"), col("p.y")).as("word_b"))
    }.reduce(_ unionByName _)
    val und = pairRows
      .filter(col("word_a") =!= col("word_b"))
      .groupBy(col("word_a"), col("word_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    // symmetrize, normalize by out-weight (exact long / exact long),
    // and collapse the small graph to one partition for the loop
    val eBoth = und.select(col("word_a").as("a"), col("word_b").as("b"),
        col("n_ab").as("w"))
      .unionByName(und.select(col("word_b").as("a"),
        col("word_a").as("b"), col("n_ab").as("w")))
    val outW = eBoth.groupBy(col("a")).agg(sum(col("w")).as("out_w"))
    // adaptive collapse (the shared q251 rule, Guards.coalesceTiny):
    // this corpus prunes to a tiny vocab graph where one task per
    // power-iteration job is right, but a LARGE pruned graph must
    // keep its parallelism — so count nodes first, then collapse
    // only if tiny. Arithmetic is partitioning-free (round-12 long
    // surrogates), so the width choice never touches the hash gate.
    val e1 = eBoth.join(outW, Seq("a"))
      .select(col("a"), col("b"),
        (col("w").cast("double") / col("out_w").cast("double")).as("p"))
      .localCheckpoint(eager = true)
    // Altitude switch (the Dedup.hits/pageRank rule): the minCount-
    // pruned co-occurrence graph on this corpus is a few hundred
    // edges — `iters` join+agg jobs are scheduler overhead. When the
    // normalized edge table is ≤ driverGridMax rows, run the SAME
    // round-12 surrogate loop driver-side (boundedGrid-guarded,
    // spec-pinned bit-identical); a dense million-edge graph keeps
    // the distributed loop below. driverGridMax = 0 forces it.
    val trCount = e1.count()
    if (trCount > 0 && trCount <= driverGridMax)
      return textRankDriver(e1, iters, topN, driverGridMax)
    val nodes1 = e1.select(col("a").as("node")).distinct()
    val n = nodes1.count()
    // the EDGE frame collapses on its own count, not the node count:
    // a dense co-occurrence graph can carry millions of edges over
    // <10k nodes, and those edges — not the nodes — are the per-
    // iteration join work (ADVICE r10; the kcore rule). e1 is already
    // materialized (eager localCheckpoint), so the count is a scan.
    val e = graft.ext.Guards.coalesceTiny(e1, e1.count())
    val nodes = graft.ext.Guards.coalesceTiny(nodes1, n)
      .localCheckpoint(eager = true)
    def sur12sum(c: Column): Column =
      sum(round(c * 1e12, 0).cast("long")).cast("double") / 1e12
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contrib = e.join(ranks, e("a") === ranks("node"))
        .groupBy(col("b")).agg(sur12sum(col("p") * col("rank")).as("c"))
      // undirected pruned graph: every node has in-edges, no
      // dangling mass — the left join is belt-and-braces only
      ranks = nodes.join(contrib, nodes("node") === col("b"), "left")
        .select(col("node"), (lit(0.15 / n) +
          lit(0.85) * coalesce(col("c"), lit(0.0))).as("rank"))
      if (i % 4 == 0 && i < iters)
        ranks = graft.ext.Guards.coalesceTiny(ranks, n)
          .localCheckpoint(eager = true)
    }
    ranks
      .select(col("node").as("word"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word")).limit(topN)
  }

  /** Driver-altitude [[textRank]] loop over the collected normalized
    * edge grid — the Dedup.hits/pageRank altitude. Replicates the
    * distributed chain step for step (spec-pinned bit-identical):
    * `sur12sum(p·rank)` ⇒ per-group Σ round((p·rank)·1e12, 0) as
    * exact longs (Spark round on a double = BigDecimal.valueOf
    * setScale(0, HALF_UP) back through double, then the long cast),
    * /1e12 back; the 0.15/n teleport + 0.85 damping and the final
    * round(·, 6) are the same IEEE/HALF_UP ops; the top-N order is
    * the same (rank desc, word asc) sort. */
  private def textRankDriver(e1: DataFrame, iters: Int, topN: Int,
      driverGridMax: Int): DataFrame = {
    val spark = e1.sparkSession
    val grid = graft.ext.Guards
      .boundedGrid(e1, math.max(driverGridMax, 1), "textRank edge grid")
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def rnd12(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1e12)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // symmetrized table: every node appears on the a-side
    val nodeSeq: Seq[String] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      grid.foreach(e => seen += e._1)
      seen.toSeq
    }
    val n = nodeSeq.size
    val byDst = grid.groupBy(_._2)
    var ranks: Map[String, Double] = nodeSeq.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val r = ranks
      ranks = nodeSeq.map { nd =>
        val c = byDst.get(nd)
          .map(_.map(e => rnd12(e._3 * r(e._1))).sum.toDouble / 1e12)
          .getOrElse(0.0)
        nd -> (0.15 / n + 0.85 * c)
      }.toMap
    }
    import spark.implicits._
    // the top-N order must match Spark's (rank desc, word asc) with
    // the BINARY string collation — String.compareTo would order
    // supplementary characters differently on a tie
    val ord = new Ordering[(String, Double)] {
      def compare(x: (String, Double), y: (String, Double)): Int = {
        val c = java.lang.Double.compare(y._2, x._2)
        if (c != 0) c
        else graft.ext.Guards.utf8Ordering.compare(x._1, y._1)
      }
    }
    nodeSeq.map(nd => (nd, r6(ranks(nd))))
      .sorted(ord)
      .take(topN)
      .toDF("word", "rank")
  }

  /** Good–Turing frequency smoothing (q312) — the
    * frequency-of-frequencies table N_r and the Turing-smoothed
    * count r* = (r+1)·N_{r+1}/N_r for r ≤ maxR, plus the
    * missing-mass estimate P(unseen) = N_1/N: what [[knBigrams]]'
    * absolute discounting approximates, computed exactly — and the
    * standard answer to "how much probability mass do n-grams we
    * have never seen deserve" when sizing contamination/novelty
    * checks at corpus scale. Granularity is the 4-token SHINGLE
    * (this corpus has a closed ~31-word vocabulary — the word level
    * has no tail; the shingle level is Zipfian, and is also the unit
    * the dedup family operates on). Two bounded aggregates after the
    * one shingle scan: occurrence counts → count-of-counts
    * (|distinct r| rows, tiny); r* is a self-join on r+1 over that
    * grid; every ratio is exact-long division. */
  def goodTuring(spark: SparkSession, dir: String, maxR: Int = 10)
      : DataFrame = {
    // all OCCURRENCES (not the dedup family's distinct sets): stage
    // tokens first (the inline-HOF cost gotcha), then slide
    val wc = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 4),
        i => concat_ws(" ", slice(col("ws"), i + lit(1), lit(4)))))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nr = wc.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = wc.agg(sum(col("r")).as("n_tok"))
      .crossJoin(nr.filter(col("r") === 1L)
        .select(col("n_r").as("n1")))
    nr.filter(col("r") <= maxR)
      .join(nr.select((col("r") - 1L).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(totals))
      .select(col("r"), col("n_r"),
        round((col("r") + 1L).cast("double") *
          coalesce(col("n_r1"), lit(0L)).cast("double") /
          col("n_r").cast("double"), 6).as("r_star"),
        round(col("n1").cast("double") / col("n_tok").cast("double"), 6)
          .as("p_unseen"))
  }

  /** Multinomial Naive Bayes language ID (q309) — train word→lang
    * likelihoods with Laplace smoothing on a deterministic 80/20
    * doc_id split, score the held-out fold, report per-language
    * accuracy: the supervised companion to the n-gram-heuristic
    * [[langId]], and the canonical "does a bag-of-words model train
    * at this scale" probe (training IS one groupBy — the model is a
    * (vocab × langs)-sized table, broadcast back at scoring time).
    *
    * Determinism: every log-likelihood ln((c+1)/(tot+V)) and the
    * log-prior snap to round-9 integer surrogates, so each test
    * doc's per-language score is an EXACT long sum (libm's last ulp
    * is unobservable off rounding boundaries) and the argmax — ties
    * to the lexicographically smaller language — is exact, which is
    * what lets the oracle replay the whole train/score/argmax
    * pipeline. Unseen-in-train words contribute the same smoothed
    * floor via the left join's coalesce. */
  def naiveBayesLangId(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lnSur9(c: Column): Column = round(log(c) * 1e9, 0).cast("long")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("word"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // model: per (lang, word) token counts, per-lang totals, vocab V
    val cw = train.groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = cw.groupBy(col("lang")).agg(sum(col("c")).as("t"))
    val vocab = cw.select(col("word")).distinct()
      .agg(count(lit(1)).as("v"))
    val priors = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .groupBy(col("lang")).agg(count(lit(1)).as("nd"))
    val prior = priors.crossJoin(broadcast(
        priors.agg(sum(col("nd")).as("ndt"))))
      .select(col("lang").as("cand"),
        lnSur9(col("nd").cast("double") / col("ndt").cast("double"))
          .as("lp_prior"))
    val langGrid = tot.crossJoin(broadcast(vocab))
      .select(col("lang").as("cand"), col("t"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // test docs: per (doc, word) counts × each candidate language;
    // the model join is a broadcast (vocab×langs is model-sized)
    val testWords = docs.filter(col("doc_id") % 5 === 0)
      .groupBy(col("doc_id"), col("lang"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val scored = testWords
      .crossJoin(broadcast(langGrid))
      .join(broadcast(cw.select(col("lang").as("cand"), col("word"),
        col("c"))), Seq("cand", "word"), "left")
      .select(col("doc_id"), col("lang"), col("cand"), col("cnt"),
        lnSur9((coalesce(col("c"), lit(0L)).cast("double") + 1.0) /
          (col("t").cast("double") + col("v").cast("double")))
          .as("lp_w"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum(col("cnt") * col("lp_w")).as("ll"))
      .join(broadcast(prior), Seq("cand"))
      .select(col("doc_id"), col("lang"), col("cand"),
        (col("ll") + col("lp_prior")).as("score"))
    val best = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cand"))))
      .filter(col("rn") === 1)
    best.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cand") === col("lang"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("lang"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double") /
          col("n_docs").cast("double"), 6).as("accuracy"))
  }
}
