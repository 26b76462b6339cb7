package graft.exec

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact snapped-decimal Gram/moment accumulation for the PCA grid
  * (q316) — the typed-Aggregator altitude for "sum a d×d outer
  * product over the corpus" when every per-product term must match
  * `sum(cast(xy as decimal(28,12)))` BIT-FOR-BIT.
  *
  * Why not the SQL explode: emitting n·d² (p, q, xy) structs through
  * an interpreted nested-transform lambda and hash-aggregating them
  * costs ~500 ns/product in generator+cast overhead — at d = 64
  * that is 4096 interpreted rows per corpus row, and the grid scan
  * dominates the whole query (BENCH_SF1 q316 8.8× at 10×). This
  * Aggregator runs the same multiset of products in a tight JVM
  * loop per partition and ships ONE (d²+d)-cell buffer per
  * partition, so the shuffle is partitions×buffer, never row-level.
  *
  * Exactness contract: Spark's `cast(x as decimal(28,12))` does NOT
  * round the exact binary value of the double — `Decimal.set(Double)`
  * goes through `scala.math.BigDecimal.decimal(d)` =
  * `java.math.BigDecimal(java.lang.Double.toString(d))`, i.e. it
  * rounds the SHORTEST-DECIMAL-REPRESENTATION value at scale 12 with
  * HALF_UP (away from zero). The two semantics demonstrably differ:
  * the double nearest 5e-13 is 4.9999…e-13 in exact binary (→ 0 at
  * scale 12) but prints as "5.0E-13" (→ 1); DuckDB's double→decimal
  * cast agrees with the STRING side on these ties (verified:
  * cast(5e-13) = 1e-12, cast(2.5e-12) = 3e-12), so string-repr
  * HALF_UP is the authoritative semantics (ADVICE r11) — [[slow12]]
  * implements it literally and the spec pins [[snap12]] against
  * Spark's actual cast on the divergent values. The decimal SUM is
  * then exact integer addition of the scaled values.
  *
  * [[SnappedGram.snap12]] reproduces the cast with a fast path —
  * p = fl(|x|·1e12) plus the fma residual e = |x|·1e12 − p recovers
  * the exact binary value p + e, and the round-half-up decision over
  * the STRING value is provable whenever the fractional part is
  * farther from 0.5 than the value-dependent band
  * ulp(|x|)·1e12/2 + 1e-9: the shortest-repr value lies within
  * ulp/2 of the binary value (it must round back to the same
  * double), so outside the band both values sit on the same side of
  * the tie and the decisions coincide (the 1e-9 term covers the
  * < 2^−50 frac-arithmetic error). Inside the band — ~1e-4 of
  * unit-scale inputs — and for |x|·1e12 ≥ 2^52 (where floor/frac
  * arithmetic loses integer resolution) it falls back to the exact
  * string-based path. The accumulator is a Long per cell (exact adds;
  * decimal(28,12) sums that overflow a Long are out of this
  * operator's domain — unit-scale embedding products over ≤ 10⁶
  * rows stay < 2^60), converted once at `finish` through
  * BigDecimal(sum, 12).doubleValue — the same conversion
  * `cast(decimal as double)` performs. The equality is spec-pinned
  * against the literal cast-and-sum DataFrame on fixtures AND
  * property-tested against java.math.BigDecimal over adversarial
  * doubles (ties, near-ties, subnormals, negatives).
  */
object SnappedGram {
  private val Guard = 1e-9
  // |x|·1e12 at or above 2^52 leaves floor()/frac arithmetic without
  // sub-integer resolution — punt to the exact path (never hit by
  // unit-scale embeddings; correctness, not speed, owns that range)
  private val FastMax = 4.503599627370496e15

  // the authoritative semantics (= Spark's Decimal.set(Double), which
  // routes through Double.toString; = DuckDB's cast on the verified
  // tie values): round the shortest-repr decimal string HALF_UP at
  // scale 12. NOT new BigDecimal(x) — that rounds the exact binary
  // value and lands on the other side for 5e-13 / 2.5e-12 (ADVICE r11)
  private def slow12(x: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .movePointRight(12).longValueExact()

  /** round-half-away-from-zero of x·10¹² over the SHORTEST-REPR
    * string value of x — bit-identical to Spark
    * `cast(x as decimal(28,12))`'s unscaled long (spec-pinned against
    * the actual cast, divergent ties included). */
  def snap12(x: Double): Long = {
    if (x == 0.0) return 0L
    val ax = math.abs(x)
    val p = ax * 1e12
    if (!(p < FastMax)) return slow12(x) // also catches NaN/Inf → exact path throws
    val e = java.lang.Math.fma(ax, 1e12, -p) // exact: ax·1e12 = p + e
    val base = math.floor(p)
    val frac = (p - base) + e // p−base exact below 2^52; one rounding in the add
    // the string value differs from the exact binary value by at most
    // ulp(ax)/2 (shortest repr rounds back to the same double), so the
    // tie-side decision transfers only when frac clears that margin
    // scaled to the 1e12 lattice, plus the frac-arithmetic slack
    val band = 0.5e12 * Math.ulp(ax) + Guard
    val up =
      if (frac > 0.5 + band) true
      else if (frac < 0.5 - band) false
      else return slow12(x) // within the guard band: decide exactly
    val mag = base.toLong + (if (up) 1L else 0L)
    if (x > 0) mag else -mag
  }

  /** finish-side conversion: decimal(28,12) → double. */
  def toDouble12(sum: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 12)
      .doubleValue()

  /** One-scan moment buffer: cells [0, d²) hold Σ snap12(x_p·x_q)
    * (row-major), cells [d², d²+d) hold Σ snap12(x_p). `finish`
    * converts every cell to the double the decimal-sum cast yields.
    * Rows whose vector length differs from `d` fail fast with a
    * named error (the ADVICE r10 fail-fast discipline — a 65-dim
    * corpus must die here, not as an index error downstream). */
  final case class GramMomentAgg(d: Int)
      extends Aggregator[Array[Double], Array[Long], Array[Double]] {
    override def zero: Array[Long] = new Array[Long](d * d + d)
    override def reduce(b: Array[Long], row: Array[Double]): Array[Long] = {
      if (row.length != d)
        throw new IllegalStateException(
          s"GramMomentAgg: expected $d-dim vectors, got ${row.length}")
      var p = 0
      while (p < d) {
        val xp = row(p)
        val off = p * d
        var q = 0
        while (q < d) {
          b(off + q) += snap12(xp * row(q))
          q += 1
        }
        b(d * d + p) += snap12(xp)
        p += 1
      }
      b
    }
    override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += c(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Double] = b.map(toDouble12)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
