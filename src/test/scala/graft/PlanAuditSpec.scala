package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural regression net over the WHOLE catalog: no query may scan
  * the same base table four or more times (the multi-consumer
  * re-expansion bug class — a derived frame feeding N branches without
  * a persist re-runs its subtree N times; stickiness/funnel/
  * curated-bloom all had it before round 7's sweep). Counts PARQUET
  * leaves per location in the optimized plan — cached subtrees
  * (InMemoryRelation) are the fix, so they don't count against their
  * source. Adjudicated exceptions are allowlisted with the reason. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()
  val sf = "/root/testdata/sf0.001"

  // query -> max same-table parquet scans permitted (with why)
  private val allow: Map[String, Int] = Map(
    "q12_setops" -> 4 // union/intersect/except legs over one dimension table by design
  )

  test("no query scans the same base table 4+ times (re-expansion guard)") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val perPath = plan.collectLeaves()
          .flatMap {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case hfs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  hfs.location.rootPaths.headOption.map(_.toString)
                case _ => None
              }
            case _ => None
          }
          .groupBy(identity).view.mapValues(_.size)
        val cap = allow.getOrElse(name, 3)
        perPath.foreach { case (path, n) =>
          if (n > cap)
            offenders += s"$name scans ${path.split('/').last} $n times (cap $cap)"
        }
      } catch {
        case e: Throwable => offenders += s"$name failed to plan: ${e.getMessage}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
