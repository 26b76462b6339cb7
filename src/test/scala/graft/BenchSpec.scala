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
}
