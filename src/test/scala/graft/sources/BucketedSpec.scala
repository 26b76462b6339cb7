package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The co-located-join guarantee: a join of two tables bucketed on
  * the join key plans with ZERO shuffle exchanges, while the same
  * join over plain parquet shuffles both sides. This is the
  * pay-at-ingest layout a 100 TB deployment relies on for fact-fact
  * joins too big to broadcast. */
class BucketedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()
  val sf = TestSpark.sf

  test("bucketed-by-key join plans with zero shuffles; unbucketed shuffles both sides") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketed.writeBucketed(orders, "orders_b", s"$wh/orders_b", "o_orderkey", 8)
    Bucketed.writeBucketed(lineitem, "lineitem_b", s"$wh/lineitem_b", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.colocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val n = joined.count()
      assert(n > 0)
      assert(Bucketed.countShuffles(joined) == 0,
        "bucketed join must not exchange either side")

      // control: identical join over the raw parquet shuffles both sides
      val plain = orders.join(lineitem, "o_orderkey")
      plain.count()
      assert(Bucketed.countShuffles(plain) >= 2,
        "unbucketed sort-merge join should exchange both sides")

      // row parity: layout changes the plan, never the result
      assert(n == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
