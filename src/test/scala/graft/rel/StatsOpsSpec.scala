package graft.rel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.{Profile, Similarity, TextAnalysis}

/** Sanity specs for the round-9 statistics / ML-audit operators
  * (q301-q314). The DuckDB oracle in Verify is the authoritative
  * gate; these pin internal invariants (bounds, consistency between
  * reported columns, structural shape) that a hash compare alone
  * would not explain when it breaks. */
class StatsOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()
  val sf = TestSpark.sf

  test("cramers v: both pairs present, v in [0,1], chi2 nonnegative") {
    val rows = Profile.cramersV(spark, sf).collect()
    assert(rows.map(_.getAs[String]("pair")).sorted.sameElements(
      Seq("lang_x_source", "priority_x_status")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L)
      assert(r.getAs[Double]("chi2") >= 0.0)
      val v = r.getAs[Double]("cramers_v")
      assert(v >= 0.0 && v <= 1.0 + 1e-9)
    }
  }

  test("pairwise means: 10 ordered pairs, t consistent with diff/se") {
    val rows = Profile.pairwiseMeans(spark, sf).collect()
    assert(rows.length == 10) // C(5 segments, 2)
    rows.foreach { r =>
      assert(r.getAs[String]("seg_a") < r.getAs[String]("seg_b"))
      assert(r.getAs[Double]("se") > 0.0)
      assert(math.abs(r.getAs[Double]("t") -
        r.getAs[Double]("mean_diff") / r.getAs[Double]("se")) < 2e-5)
    }
  }

  test("logistic newton: starts at zero, moves, stays finite") {
    val rows = Relational.logisticNewton(spark, sf).collect()
      .sortBy(_.getAs[Int]("iter"))
    assert(rows.map(_.getAs[Int]("iter")).sameElements(0 to 3))
    assert(rows.head.getAs[Double]("intercept") == 0.0)
    assert(rows.head.getAs[Double]("slope") == 0.0)
    rows.foreach { r =>
      assert(!r.getAs[Double]("intercept").isNaN)
      assert(!r.getAs[Double]("slope").isNaN)
    }
    assert(rows.last.getAs[Double]("slope") != 0.0)
  }

  test("kmeans1d: 3 ordered clusters, counts conserve rows") {
    val rows = Relational.kmeans1d(spark, sf).collect()
      .sortBy(_.getAs[Int]("cluster"))
    assert(rows.map(_.getAs[Int]("cluster")).sameElements(0 to 2))
    // 1-D Lloyd preserves centroid order from the quartile init
    val cents = rows.map(_.getAs[Double]("centroid"))
    assert(cents.sameElements(cents.sorted))
    val nOrders = graft.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
    rows.foreach(r => assert(r.getAs[Long]("inertia") >= 0L))
  }

  test("kmeans1d production approx-init converges to the exact-init clustering") {
    // exactInit = true is the oracle artifact and the measured 100×
    // limit (super-linear + OOM at default heap — BASELINE r11); the
    // production sketch init must land on the same Lloyd fixpoint on
    // well-separated data: identical cluster populations, inertia
    // within a whisker (final centroids may differ in the last
    // decimals when a boundary point sits between the two inits)
    def canon(exact: Boolean) =
      Relational.kmeans1d(spark, sf, exactInit = exact).collect()
        .sortBy(_.getAs[Int]("cluster"))
        .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n"),
          r.getAs[Long]("inertia")))
    val (e, a) = (canon(true), canon(false))
    assert(e.map(t => (t._1, t._2)).sameElements(a.map(t => (t._1, t._2))),
      s"cluster populations diverged: exact=${e.toSeq} approx=${a.toSeq}")
    e.zip(a).foreach { case ((_, _, ie), (_, _, ia)) =>
      assert(math.abs(ie - ia) <= math.max(1L, ie / 100),
        s"inertia diverged: $ie vs $ia")
    }
  }

  test("kruskal-wallis: h nonnegative, ties only inflate h") {
    val r = Profile.kruskalWallis(spark, sf).collect().head
    assert(r.getAs[Long]("df") == r.getAs[Long]("k") - 1L)
    assert(r.getAs[Double]("h") >= 0.0)
    val c = r.getAs[Double]("tie_c")
    assert(c > 0.0 && c <= 1.0)
    assert(r.getAs[Double]("h_corrected") >= r.getAs[Double]("h") - 1e-9)
  }

  test("kendall tau-b: bounded, pair accounting closes") {
    val r = Profile.kendallTau(spark, sf).collect().head
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    assert(r.getAs[Long]("c") + r.getAs[Long]("d") <= r.getAs[Long]("n0"))
    assert(r.getAs[Long]("n1") < r.getAs[Long]("n0"))
    assert(r.getAs[Long]("n2") < r.getAs[Long]("n0"))
  }

  test("l-diversity: l bounded by global langs, flag consistent") {
    val nLangs = graft.Tables.documents(spark, sf)
      .select("lang").distinct().count()
    val rows = Profile.lDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(l >= 1L && l <= nLangs)
      assert(r.getAs[Boolean]("l_diverse") == (l >= 2L))
      assert(r.getAs[Long]("n") >= l)
    }
  }

  test("textrank: top-25 distinct words, ranks positive descending") {
    val rows = TextAnalysis.textRank(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[String]("word")).distinct.length == 25)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(_ > 0.0))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }

  test("textrank: driver altitude is bit-identical to the distributed loop") {
    // driverGridMax = 0 forces the distributed loop on the same
    // corpus; the default takes the driver path. Bit-for-bit equality
    // including the (rank desc, word asc) top-N order.
    val drv = TextAnalysis.textRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1).toString)).toSeq
    val dist = TextAnalysis.textRank(spark, sf, driverGridMax = 0).collect()
      .map(r => (r.getString(0), r.getDouble(1).toString)).toSeq
    assert(drv == dist && drv.nonEmpty)
  }

  test("naive bayes: per-lang accuracy consistent and bounded") {
    val rows = TextAnalysis.naiveBayesLangId(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val c = r.getAs[Long]("n_correct")
      assert(c >= 0L && c <= n)
      assert(math.abs(r.getAs[Double]("accuracy") -
        c.toDouble / n.toDouble) < 2e-6)
    }
  }

  test("brown-forsythe: f positive, dof accounting closes") {
    val r = Profile.brownForsythe(spark, sf).collect().head
    assert(r.getAs[Long]("df1") == r.getAs[Long]("k") - 1L)
    assert(r.getAs[Long]("df2") ==
      r.getAs[Long]("n") - r.getAs[Long]("k"))
    assert(r.getAs[Double]("f") >= 0.0)
  }

  test("sprt: conversions bounded, llr walk matches the increments") {
    val (lw9, ll9, _) = Relational.sprtSurrogates()
    val rows = Relational.sprtMonitor(spark, sf).collect()
      .sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_users"); val c = r.getAs[Long]("n_conv")
      assert(c >= 0L && c <= n)
      cum += c * lw9 + (n - c) * ll9
      assert(math.abs(r.getAs[Double]("llr") - cum / 1e9) < 2e-6)
      assert(Set("accept_h1", "accept_h0", "continue")
        .contains(r.getAs[String]("decision")))
    }
  }

  test("good-turing: hapaxes exist, r* and p_unseen well-formed") {
    val rows = TextAnalysis.goodTuring(spark, sf).collect()
    assert(rows.exists(_.getAs[Long]("r") == 1L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_r") > 0L)
      assert(r.getAs[Double]("r_star") >= 0.0)
      val p = r.getAs[Double]("p_unseen")
      assert(p > 0.0 && p < 1.0)
    }
  }

  test("silhouette: per-label means within [-1, 1]") {
    val rows = Similarity.centroidSilhouette(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L)
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
  }

  test("jl distortion: sample pairs exist, ratio summary ordered") {
    val r = Similarity.jlDistortion(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") > 0L)
    val (lo, mid, hi) = (r.getAs[Double]("min_ratio"),
      r.getAs[Double]("mean_ratio"), r.getAs[Double]("max_ratio"))
    assert(lo <= mid + 1e-9 && mid <= hi + 1e-9)
    // JL with k=16 of 64 dims: distortion is bounded in practice
    assert(lo > 0.0 && hi < 10.0)
  }

  test("markov attribution: shares sum to 1, removal lowers p_conv") {
    import graft.rel.Relational
    val rows = Relational.markovAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pf, pr) = (r.getAs[Double]("p_full"),
        r.getAs[Double]("p_removed"))
      assert(pf >= 0.0 && pf <= 1.0 && pr >= 0.0 && pr <= 1.0)
      // removing a channel cannot create conversion paths
      assert(pr <= pf + 1e-6)
      assert(r.getAs[Double]("removal_effect") >= -1e-9)
    }
    val shares = rows.map(_.getAs[Double]("share"))
    if (shares.exists(_ > 0.0))
      assert(math.abs(shares.sum - 1.0) < 1e-4)
  }

  test("markov attribution: boundedGrid fails fast on an unbounded event-type vocabulary") {
    import graft.rel.Relational
    import spark.implicits._
    // Adversarial fixture (VERDICT r9 item 1): event_type carries
    // per-row URLs, so the (vocab+2)² edge grid grows with DATA, not
    // vocabulary — the driver-altitude assumption q315 relies on.
    // The guard must turn that into a named error, never an OOM.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-adv-events").toString
    val rows = (1 to 120).flatMap { u =>
      (1 to 4).map { i =>
        (u.toLong * 10 + i,
          new java.sql.Timestamp(1700000000000L + u * 1000L + i * 7L),
          u.toLong, s"https://spam.example/$u/$i")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException] {
      Relational.markovAttribution(spark, dir, maxGrid = 100).collect()
    }
    assert(ex.getMessage.contains("markovAttribution edge grid"))
    assert(ex.getMessage.contains("maxRows=100"))
  }

  test("boundedGrid: returns the full grid under the cap, throws past it") {
    import graft.ext.Guards
    import spark.implicits._
    val df = (1 to 50).toDF("v")
    assert(Guards.boundedGrid(df, 50, "test grid").length == 50)
    val ex = intercept[IllegalStateException] {
      Guards.boundedGrid(df, 49, "test grid")
    }
    assert(ex.getMessage.contains("test grid"))
  }

  test("coalesceTiny: collapses tiny grids to 1 partition, leaves big ones alone") {
    import graft.ext.Guards
    import spark.implicits._
    val df = (1 to 100).toDF("v").repartition(4)
    assert(Guards.coalesceTiny(df, 100L).rdd.getNumPartitions == 1)
    assert(Guards.coalesceTiny(df, 20000L).rdd.getNumPartitions == 4)
  }

  test("pca top: unit loading norm, 0 < share <= 1, lambda <= trace") {
    val rows = Similarity.pcaTopComponent(spark, sf).collect()
    assert(rows.length == 64)
    val norm2 = rows.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum
    assert(math.abs(norm2 - 1.0) < 1e-3)
    val lam = rows.head.getAs[Double]("lambda")
    val share = rows.head.getAs[Double]("explained_share")
    assert(lam > 0.0)
    assert(share > 0.0 && share <= 1.0 + 1e-9)
    assert(rows.forall(r => r.getAs[Double]("lambda") == lam &&
      r.getAs[Double]("explained_share") == share))
    // dominant-eigenvector residual: cov·v ≈ λ·v would need the grid
    // here; share <= 1 already pins λ <= trace = Σ eigenvalues.
  }
}
