package graft.rel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.{Dedup, Profile, Similarity, TextAnalysis}

/** Sanity specs for the statistics / curation-audit operators
  * (q273-q291). The DuckDB oracle in Verify is the authoritative
  * gate; these pin internal invariants (conservation, bounds,
  * formula consistency) that a hash compare alone would not explain
  * when it breaks. */
class AuditOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()
  val sf = TestSpark.sf

  test("permutation test: p-value in (0,1], counts consistent") {
    val r = Relational.permutationTest(spark, sf, reps = 16).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_reps") == 16L)
    val p = row.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
    assert(row.getAs[Long]("n_ge") <= 16L)
  }

  test("target encoding: rate sits between the two LOO faces") {
    val rows = Profile.targetEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(r.getAs[Double]("loo_pos") <= rate + 1e-9)
      assert(r.getAs[Double]("loo_neg") >= rate - 1e-9)
      // LOO leakage gap is exactly 1/(n-1) up to output rounding
      val gap = r.getAs[Double]("loo_neg") - r.getAs[Double]("loo_pos")
      assert(math.abs(gap - 1.0 / (r.getAs[Long]("n") - 1)) < 2e-6)
    }
  }

  test("mmr: k picks per query, no duplicates, rank-1 is pure relevance") {
    val rows = Similarity.mmrRerank(spark, sf).collect()
    assert(rows.length == 15) // 3 queries x 5 picks
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 3)
    byQ.values.foreach { qs =>
      assert(qs.map(_.getAs[Long]("vec_id")).distinct.length == 5)
      assert(qs.map(_.getAs[Int]("pick")).sorted.sameElements(1 to 5))
      // the first pick maximizes relevance alone -> its rel is the max
      val first = qs.find(_.getAs[Int]("pick") == 1).get
      assert(qs.forall(_.getAs[Double]("rel") <=
        first.getAs[Double]("rel") + 1e-9))
    }
  }

  test("holt: 7 horizons, abs_err consistent with forecast/actual") {
    val rows = Relational.holtForecast(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("h")).sorted.sameElements(1 to 7))
    rows.foreach { r =>
      val err = math.abs(r.getAs[Double]("forecast") -
        r.getAs[Double]("actual"))
      assert(math.abs(err - r.getAs[Double]("abs_err")) < 1e-3)
    }
  }

  test("rake: top-5 per source, phrases never contain a breaker word") {
    val stop = Set("the", "a", "and", "of", "to")
    val rows = TextAnalysis.rakeKeywords(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("rk") <= 5)
      assert(r.getAs[Double]("score") > 0.0)
      assert(r.getAs[String]("phrase").split(" ")
        .forall(w => !stop.contains(w)))
    }
  }

  test("whitening parity: overlap bounded by k, jaccard consistent") {
    val rows = Similarity.whiteningParity(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 10L)
      val j = r.getAs[Double]("jaccard")
      assert(math.abs(j - ov.toDouble / (20.0 - ov)) < 1e-6)
    }
  }

  test("split leakage: categories partition the verified edge table") {
    val r = Dedup.splitLeakage(spark, sf).collect().head
    val total = r.getAs[Long]("n_pairs")
    assert(total == Dedup.jaccardVerifyPortable(spark, sf).count())
    assert(r.getAs[Long]("n_both_train") + r.getAs[Long]("n_both_test")
      + r.getAs[Long]("n_cross") == total)
  }

  test("rec eval: coverage in (0,1], recommended items exist in catalog") {
    val r = Relational.recEval(spark, sf).collect().head
    assert(r.getAs[Long]("n_rec_items") <= r.getAs[Long]("n_items"))
    val cov = r.getAs[Double]("coverage")
    assert(cov > 0.0 && cov <= 1.0)
  }

  test("dp counts: noisy release differs from truth by exactly |noise|") {
    val rows = Profile.dpCounts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val shift = math.abs(r.getAs[Double]("noisy_n") -
        r.getAs[Long]("n_docs"))
      assert(math.abs(shift - r.getAs[Double]("abs_noise")) < 1e-3)
    }
  }

  test("wilson: interval brackets the rate, inside [0,1]") {
    Profile.wilsonIntervals(spark, sf).collect().foreach { r =>
      val (lo, hi, p) = (r.getAs[Double]("wilson_lo"),
        r.getAs[Double]("wilson_hi"), r.getAs[Double]("rate"))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi)
    }
  }

  test("correlations: rolling and lagged stay in [-1,1]") {
    val rc = Relational.rollingCorr(spark, sf).collect()
    assert(rc.nonEmpty)
    rc.flatMap(r => Option(r.getAs[java.lang.Double]("corr")))
      .foreach(c => assert(math.abs(c) <= 1.0 + 1e-9))
    val xc = Relational.xcorrLag(spark, sf).collect()
    assert(xc.length == 25)
    xc.flatMap(r => Option(r.getAs[java.lang.Double]("corr")))
      .foreach(c => assert(math.abs(c) <= 1.0 + 1e-9))
  }

  test("feature table: label matches recency, tenure non-negative") {
    Relational.featureTable(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("is_active") ==
        (r.getAs[Int]("recency_days") < 7))
      assert(r.getAs[Int]("tenure_days") >= 0)
      assert(r.getAs[Int]("recency_days") >= 0)
    }
  }

  test("zone maps: price layout prunes price predicates, month cannot") {
    val rows = Relational.zonemapAudit(spark, sf).collect()
    assert(rows.length == 10)
    val pruneBy = rows.groupBy(_.getAs[String]("layout"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("n_pruned")).sum }
    assert(pruneBy("by_price") > pruneBy("by_month"))
  }

  test("sketch jaccard: estimator within sketch error of exact") {
    val rows = TextAnalysis.sketchJaccard(spark, sf).collect()
    assert(rows.length == 190) // C(20,2) source pairs
    // bottom-k with k=256: stderr ~ sqrt(j(1-j)/k) <= 0.031; allow 10x
    rows.foreach(r => assert(r.getAs[Double]("abs_err") <= 0.31))
  }

  test("novelty: first-occurrence credits sum to the distinct-shingle count") {
    val rows = TextAnalysis.noveltyCurve(spark, sf).collect()
    assert(rows.length == 20)
    val novel = rows.map(_.getAs[Long]("n_novel")).sum
    import org.apache.spark.sql.functions._
    // every corpus-distinct shingle is credited exactly once
    val distinctShingles = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      .select(explode(TextAnalysis.shingleStrings(3)).as("s"))
      .distinct().count()
    assert(novel == distinctShingles)
  }

  test("hill tail: alpha positive with a sane se") {
    val r = Profile.hillTail(spark, sf).collect().head
    val a = r.getAs[Double]("hill_alpha")
    assert(a > 0.0)
    assert(math.abs(r.getAs[Double]("alpha_se") - a / 10.0) < 1e-3)
  }

  test("periodogram: three candidate periods, non-negative amplitude") {
    val rows = Relational.periodogram(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("period")).sorted.sameElements(
      Seq(7, 14, 30)))
    rows.foreach(r => assert(r.getAs[Double]("amplitude") >= 0.0))
  }

  test("event study: offsets bounded, counts positive") {
    val rows = Relational.eventStudy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val o = r.getAs[Int]("day_offset")
      assert(o >= -7 && o <= 7)
      assert(r.getAs[Long]("n_events") > 0L)
    }
  }
}
