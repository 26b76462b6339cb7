package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's failure accounting (pure core). A harness that
  * swallows per-query exceptions records ~0 s for a broken query and
  * IMPROVES the total — the summary must count failures and exclude
  * them from timing stats so a nonzero failure count can never read
  * as a fast run. */
class BenchSpec extends AnyFunSuite {

  test("summarize: all passes succeed -> min, zero failures") {
    assert(Bench.summarize(Seq(1.5, 1.2, 1.8)) == ((1.2, 0)))
  }

  test("summarize: failed pass (negative sentinel) is counted and " +
      "excluded from the min") {
    // the failure's elapsed time (0.01 s — a fast throw) must NOT
    // become the min
    assert(Bench.summarize(Seq(1.5, -0.01, 1.2)) == ((1.2, 1)))
  }

  test("summarize: every pass failed -> -1 sentinel min, full count") {
    assert(Bench.summarize(Seq(-0.3, -0.2)) == ((-1.0, 2)))
  }

  test("summarize: zero is a valid (successful) sample") {
    assert(Bench.summarize(Seq(0.0, -1.0)) == ((0.0, 1)))
  }

  test("failureSentinel is strictly negative even for dt = 0.0 " +
      "(a -0.0 sentinel would count as a 0-second success)") {
    assert(Bench.failureSentinel(0.0) < 0.0)
    assert(Bench.summarize(Seq(1.5, Bench.failureSentinel(0.0))) == ((1.5, 1)))
    // normal failures keep their (negated) elapsed time for the artifact
    assert(Bench.failureSentinel(2.5) == -2.5)
  }

  test("loadAvg1m reads a plausible 1-minute load on Linux") {
    val l = Bench.loadAvg1m()
    assert(l == -1.0 || (l >= 0.0 && l < 10000.0))
  }

  test("vsAnchor: uniform inflation reads as tight median≈mean ratios") {
    val anchor = (1 to 20).map(i => s"q$i" -> i.toDouble).toMap
    val cur = anchor.map { case (k, v) => k -> v * 1.1 }
    val r = Bench.vsAnchor(cur, anchor).get
    assert(r("n_shared") == 20.0)
    assert(math.abs(r("median_ratio") - 1.1) < 1e-9)
    assert(math.abs(r("mean_ratio") - 1.1) < 1e-9)
    assert(math.abs(r("p90_ratio") - r("p10_ratio")) < 1e-9)
  }

  test("vsAnchor: one real regression fattens the spread, not the median") {
    val anchor = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val cur = anchor.updated("q7", 8.0)
    val r = Bench.vsAnchor(cur, anchor).get
    assert(r("median_ratio") == 1.0 && r("p90_ratio") >= 1.0)
    assert(r("mean_ratio") > 1.3) // the outlier shows in the mean
  }

  test("vsAnchor quantiles are nearest-rank (ceil(p·n)−1), not one rank high") {
    // ratios 1..20: nearest-rank p10 = 2nd smallest, median(n even) =
    // lower-middle (10th), p90 = 18th — the old (p·n).toInt indexing
    // returned 3.0 / 11.0 / 19.0 (one rank high, r13 ADVICE)
    val anchor = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val cur = (1 to 20).map(i => s"q$i" -> i.toDouble).toMap
    val r = Bench.vsAnchor(cur, anchor).get
    assert(r("p10_ratio") == 2.0, r)
    assert(r("median_ratio") == 10.0, r)
    assert(r("p90_ratio") == 18.0, r)
  }

  test("vsAnchor: failed samples and tiny overlaps are excluded") {
    val anchor = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val cur = Map("a" -> -0.5, "b" -> 1.0, "z" -> 1.0)
    assert(Bench.vsAnchor(cur, anchor).isEmpty) // < 5 shared
    val big = (1 to 6).map(i => s"q$i" -> 1.0).toMap
    assert(Bench.vsAnchor(big + ("q1" -> -1.0), big).exists(
      _("n_shared") == 5.0)) // the failed sample dropped from the subset
  }
}
