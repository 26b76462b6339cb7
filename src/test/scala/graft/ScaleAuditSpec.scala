package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable audit for the SECOND driver-altitude hazard (VERDICT
  * r11 item 5): unbounded object-agg buffers. The r11 100× table
  * measured the failure class — exact `percentile` buffers every
  * group value in an ObjectHashAggregate buffer, and q95's exact fit
  * went 151× super-linear and OOM'd the default heap at 100× data
  * while its KLL twin stayed flat (2.2×). `collect_list`/
  * `collect_set`/`median` are the same buffer by other names.
  *
  * Rule: every exact-percentile/median/collect_list/collect_set call
  * in src/main must carry an adjacent `scale-ok:` marker naming the
  * BOUND (day-grid, d=64 cells, cap-filtered postings, config-sized
  * stage, …) or the PRODUCTION TWIN it is the oracle artifact for
  * (approx_percentile — the q319/q320 registrations). Marker
  * adjacency is the [[AuditRules]] contiguity rule: same line, or
  * upward through only blank/comment/same-hazard lines — a new
  * exact-fit site fails CI until classified.
  *
  * Pure-JVM spec — reads the source tree, starts no SparkSession. */
class ScaleAuditSpec extends AnyFunSuite {

  // exact percentile/median (NOT approx_percentile / percentile_approx
  // — the mergeable-sketch paths are the fix, not the hazard) and the
  // collect_* object aggregates, called as functions
  private val objAggRe =
    """(?<![\w.])(percentile|median|collect_list|collect_set)\s*\(""".r.unanchored

  // SparkEntry.scala is the catalog + DuckDB-oracle SQL text: `median(`
  // etc. inside oracle strings are DuckDB-side, and every queries()
  // entry delegates to an operator in the audited tree
  private def exempt(f: java.nio.file.Path): Boolean =
    f.getFileName.toString == "SparkEntry.scala"

  test("every unbounded-object-agg site in src/main is classified (scale-ok marker)") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"audit must run from the repo root; missing $root")
    val unclassified =
      AuditRules.unclassifiedSites(root, objAggRe, "scale-ok:", exempt)
    assert(unclassified.isEmpty,
      "unclassified object-agg buffer site(s) — name the bound or the " +
        "production twin with a `// scale-ok: <bound | twin>` marker " +
        "adjacent to the call (q95's exact fit OOM'd at 100×; " +
        "BASELINE r11):\n" + unclassified.mkString("\n"))
  }

  test("the audit itself still sees the known classified sites (no silent regex rot)") {
    // the exact-percentile oracle fits and the d-bounded vector
    // re-assemblies must stay visible to the regex, or the audit has
    // gone vacuously green
    val all = AuditRules
      .scalaSources(java.nio.file.Paths.get("src/main/scala"))
      .filterNot(exempt)
      .map(f => java.nio.file.Files.readString(f))
    assert(all.count(objAggRe.findFirstIn(_).isDefined) >= 5,
      "audit sees fewer object-agg-bearing files than the known floor")
    assert(all.exists(_.contains("scale-ok:")),
      "no scale-ok markers visible — audit blind")
  }
}
