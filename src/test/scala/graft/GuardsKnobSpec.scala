package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Guards, Memo}

/** Specs for the r13 hardening items: the memory-derived
  * driver-grid knob, the Memo re-arm rollback, the ccIncrement seed
  * contract, and dirty-input parity of the altitude switches. */
class GuardsKnobSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()

  test("defaultDriverGridMax: memory rule is bounded [1024, 65536]") {
    val v = Guards.defaultDriverGridMax
    assert(v >= 0)
    if (sys.props.get("graft.driverGridMax").isEmpty &&
        sys.env.get("SPARK_GRAFT_DRIVER_GRID_MAX").isEmpty)
      assert(v >= 1024 && v <= 65536)
  }

  test("defaultDriverGridMax: property override wins, 0 forces distributed") {
    import spark.implicits._
    val prev = sys.props.get("graft.driverGridMax")
    try {
      System.setProperty("graft.driverGridMax", "12345")
      assert(Guards.defaultDriverGridMax == 12345)
      System.setProperty("graft.driverGridMax", "0")
      assert(Guards.defaultDriverGridMax == 0)
      // 0 through the DEFAULT argument must force the distributed
      // loop: the result is still correct and the plan is not a
      // driver-built local relation
      val edges = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
      val out = Dedup.connectedComponents(edges)
      assert(!out.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]))
      assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    } finally {
      prev match {
        case Some(p) => System.setProperty("graft.driverGridMax", p)
        case None    => System.clearProperty("graft.driverGridMax")
      }
    }
  }

  test("defaultDriverGridMax: blank knob reads as unset, malformed names the knob") {
    val prev = sys.props.get("graft.driverGridMax")
    try {
      // set-but-blank (the `VAR=` shell accident) falls back to the
      // memory rule instead of throwing NumberFormatException
      System.setProperty("graft.driverGridMax", "  ")
      val v = Guards.defaultDriverGridMax
      assert(v >= 1024 && v <= 65536)
      // malformed fails fast NAMING the knob, not a bare NFE from an
      // unrelated-looking pageRank/CC call
      System.setProperty("graft.driverGridMax", "lots")
      val e = intercept[IllegalArgumentException](Guards.defaultDriverGridMax)
      assert(e.getMessage.contains("driverGridMax"))
      assert(e.getMessage.contains("lots"))
    } finally {
      prev match {
        case Some(p) => System.setProperty("graft.driverGridMax", p)
        case None    => System.clearProperty("graft.driverGridMax")
      }
    }
  }

  test("Memo re-arm: an externally unpersisted entry is re-persisted and stays tracked") {
    import spark.implicits._
    val cache = scala.collection.concurrent.TrieMap.empty[String,
      org.apache.spark.sql.DataFrame]
    val df = Memo.cached(cache, "k", spark) {
      Seq(1, 2, 3).toDF("x")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    df.count()
    df.unpersist(blocking = true) // the external clearCache actor
    val again = Memo.cached(cache, "k", spark)(fail("must not rebuild"))
    assert(again eq df)
    // normal path: the membership re-check must NOT roll back the
    // re-arm (the key is still present and maps to this frame)
    assert(df.storageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
    df.unpersist(blocking = true)
    cache.clear()
  }

  test("ccIncrement validatePrev: invalid synthetic seed fails fast, valid seed passes") {
    import spark.implicits._
    val edges = Seq((10L, 11L)).toDF("doc_a", "doc_b")
    // label 99 is not an id anywhere — violates label = min member id
    val bad = Seq((10L, 99L)).toDF("id", "label")
    val e = intercept[IllegalArgumentException] {
      Dedup.ccIncrement(bad, edges, validatePrev = true).collect()
    }
    assert(e.getMessage.contains("label-invariant"))
    val good = Dedup.connectedComponents(Seq((10L, 11L)).toDF("doc_a", "doc_b"))
    val out = Dedup.ccIncrement(good, Seq((11L, 12L)).toDF("doc_a", "doc_b"),
      validatePrev = true).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("pageRank/hits: null weights behave identically on both altitudes") {
    import spark.implicits._
    val dirty = Seq(
      ("a", "b", Some(1.0)), ("b", "c", Some(2.0)),
      ("c", "a", None), ("d", "a", None)) // null edges: dropped everywhere
      .toDF("src", "dst", "weight")
    val drv = Dedup.pageRank(dirty).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Dedup.pageRank(dirty, driverGridMax = 0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(drv == dist && drv.keySet == Set("a", "b", "c"))
    val hDrv = Dedup.hits(dirty).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    val hDist = Dedup.hits(dirty, driverGridMax = 0).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    assert(hDrv == hDist && hDrv.nonEmpty)
  }
}
