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
  * Exactness contract: Spark's `cast(x as decimal(28,12))` rounds
  * the EXACT binary value of the double at scale 12 with HALF_UP
  * (away from zero), and the decimal SUM is exact integer addition
  * of the scaled values. [[SnappedGram.snap12]] reproduces the cast
  * with a fast path — p = fl(|x|·1e12) plus the fma residual
  * e = |x|·1e12 − p recovers the exact value p + e, and the
  * round-half-up decision is provable whenever the fractional part
  * is ≥ 1e-9 away from 0.5 (accumulated error < 2^−50) — and an
  * exact BigDecimal fallback inside that guard band and for
  * |x|·1e12 ≥ 2^52 (where floor/frac arithmetic loses integer
  * resolution). The accumulator is a Long per cell (exact adds;
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

  private def slow12(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .movePointRight(12).longValueExact()

  /** round-half-away-from-zero of x·10¹² over the EXACT binary value
    * of x — bit-identical to Spark `cast(x as decimal(28,12))`'s
    * unscaled long. */
  def snap12(x: Double): Long = {
    if (x == 0.0) return 0L
    val ax = math.abs(x)
    val p = ax * 1e12
    if (!(p < FastMax)) return slow12(x) // also catches NaN/Inf → exact path throws
    val e = java.lang.Math.fma(ax, 1e12, -p) // exact: ax·1e12 = p + e
    val base = math.floor(p)
    val frac = (p - base) + e // p−base exact below 2^52; one rounding in the add
    val up =
      if (frac > 0.5 + Guard) true
      else if (frac < 0.5 - Guard) false
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
