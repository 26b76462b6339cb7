package graft.exec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SnappedGram exactness contract: snap12's fast fma path must be
  * BIT-IDENTICAL to Spark's cast(double as decimal(28,12)) — which
  * rounds the SHORTEST-REPR string value of the double at scale 12,
  * HALF_UP (Decimal.set(Double) → BigDecimal(Double.toString(d)),
  * NOT the exact binary value — they diverge at e.g. 5e-13, whose
  * nearest double is 4.9999…e-13 in binary but prints "5.0E-13";
  * ADVICE r11) — and the one-scan GramMomentAgg must reproduce the
  * literal cast-and-sum DataFrame cell for cell. q316's hash-matched
  * oracle rides on both. */
class SnappedGramSpec extends AnyFunSuite {

  lazy val spark = TestSpark.init()

  private def ref12(x: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .movePointRight(12).longValueExact()

  // the values where string-repr and exact-binary rounding DISAGREE
  // (double just below the decimal tie, shortest repr exactly on it)
  // plus ordinary adversarial ties/unrepresentables
  private val targeted = Seq(
    0.0, -0.0, 1.0, -1.0, 1e-12, -1e-12, 5e-13, -5e-13, // the .5 tie scale
    1.5e-12, 2.5e-12, -2.5e-12, // ties at 1.5, 2.5 (HALF_UP away from zero)
    4.9999999999995e-1, 0.5, 0.1, 0.3, 0.7, // classic unrepresentables
    1.0000000000005, -1.0000000000005, // tie at integer+.5 scale
    java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE, // subnormals → 0
    2.220446049250313e-16, 0.9999999999999999,
    4503.599627370495, 4503.599627370497, // straddle the FastMax/1e12 edge
    123456.789012345678, -98765.4321098765)

  test("snap12 equals Spark's ACTUAL cast(decimal(28,12)) unscaled value — divergent ties included") {
    import spark.implicits._
    // the authority itself, not a hand-rolled model of it: push every
    // targeted value through Catalyst's cast and compare unscaled longs
    val got = targeted.toDF("x")
      .select(col("x"), col("x").cast("decimal(28,12)").as("d"))
      .collect()
      .map(r => r.getDouble(0) ->
        r.getDecimal(1).movePointRight(12).longValueExact())
    got.foreach { case (x, u) =>
      assert(SnappedGram.snap12(x) == u, s"spark cast parity x=$x")
      assert(ref12(x) == u, s"ref12 models the cast wrongly at x=$x")
    }
    // the ADVICE divergence is REAL on this Spark build: the exact-
    // binary rounding lands on the other side for these ties — if this
    // ever fails, the cast semantics changed and slow12 must follow
    def binary12(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .movePointRight(12).longValueExact()
    assert(ref12(5e-13) == 1L && binary12(5e-13) == 0L)
    assert(ref12(2.5e-12) == 3L && binary12(2.5e-12) == 2L)
  }

  test("snap12 equals the string-based BigDecimal reference on adversarial values") {
    targeted.foreach { x =>
      assert(SnappedGram.snap12(x) == ref12(x), s"targeted x=$x")
    }
    // seeded sweep across the magnitudes embeddings produce (products
    // of [-10, 10] values) plus wider exponents; the guard-band and
    // fast-path branches must agree with the reference everywhere
    val rnd = new scala.util.Random(20260815L)
    (1 to 200000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(9) - 4)
      assert(SnappedGram.snap12(x) == ref12(x), s"swept x=$x")
    }
    // values engineered CLOSE to a .5 boundary: take an exact k+0.5,
    // nudge by a few ulps each way — these force the guard band
    (1 to 1000).foreach { k =>
      val tie = (k.toLong * 10 + 5).toDouble / 10.0 / 1e12 // ≈ (10k+5)/1e13
      var x = tie
      (1 to 3).foreach { _ =>
        x = Math.nextUp(x)
        assert(SnappedGram.snap12(x) == ref12(x), s"nextUp of $tie: $x")
      }
      x = tie
      (1 to 3).foreach { _ =>
        x = Math.nextDown(x)
        assert(SnappedGram.snap12(x) == ref12(x), s"nextDown of $tie: $x")
      }
      assert(SnappedGram.snap12(tie) == ref12(tie), s"tie $tie")
    }
  }

  test("GramMomentAgg reproduces the literal decimal cast-and-sum grid cell for cell") {
    import spark.implicits._
    val d = 3
    // values chosen to exercise rounding: irrational-ish doubles whose
    // pairwise products land off the 12-dp lattice
    val rows = Seq(
      Array(0.1, -0.2345678901234567, 3.3333333333333335),
      Array(1e-7, 0.9999999999999999, -2.718281828459045),
      Array(0.5, -0.5, 0.0),
      // string-vs-binary divergent ties AS PRODUCTS: 5e-13·1 and
      // 2.5e-12·1 land exactly on the ADVICE r11 values where the
      // old exact-binary snap disagreed with the cast — this fixture
      // fails against a binary-rounding snap12
      Array(5e-13, 1.0, 2.5e-12),
      Array(1.4142135623730951, 0.3010299956639812, -1e-13))
    val ds = rows.toDF("e").as[Array[Double]]
    val got = ds
      .select(SnappedGram.GramMomentAgg(d).toColumn.name("buf"))
      .select(posexplode(col("buf")).as(Seq("i", "v")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(28,12)")).cast("double")
    val prods = ds.select(explode(flatten(transform(col("e"), (x, p) =>
        transform(col("e"), (y, q) => struct(
          p.as("p"), q.as("q"), (x * y).as("xy")))))).as("c"))
      .select(col("c.p"), col("c.q"), col("c.xy"))
      .groupBy(col("p"), col("q")).agg(dsum(col("xy")).as("s2"))
      .collect().map(r => (r.getInt(0) * d + r.getInt(1)) -> r.getDouble(2))
      .toMap
    val sums = ds.select(posexplode(col("e")).as(Seq("p", "c")))
      .groupBy(col("p")).agg(dsum(col("c")).as("s"))
      .collect().map(r => (d * d + r.getInt(0)) -> r.getDouble(1)).toMap
    (prods ++ sums).foreach { case (i, v) =>
      assert(got(i) == v, s"cell $i: agg=${got(i)} sql=$v")
    }
    assert(got.size == d * d + d)
  }

  test("GramMomentAgg fails by name on a row of the wrong dimension") {
    import spark.implicits._
    val ds = Seq(Array(1.0, 2.0), Array(1.0, 2.0, 3.0)).toDF("e")
      .as[Array[Double]]
    val ex = intercept[Exception] {
      ds.select(SnappedGram.GramMomentAgg(2).toColumn.name("buf")).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(msgs.contains("GramMomentAgg"), msgs.take(500))
  }
}
