package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for operators where composed built-ins
  * are measurably wrong at scale (SURVEY.md §7 "custom Catalyst vs
  * built-in"). Hosted under org.apache.spark.sql.* to reach the
  * private[sql] expression APIs, the standard pattern for Spark
  * extension libraries; the public face is graft.functions.exprs.
  *
  *  - [[CosineSim]]: fused dot+norms in ONE codegen'd loop over
  *    float arrays. The zip_with/aggregate composition evaluates an
  *    interpreted lambda per element and breaks whole-stage codegen;
  *    this stays inside it.
  *  - [[MinHashSig]]: the full k-permutation MinHash signature in a
  *    single pass over the shingle array — one expression eval per
  *    row instead of perms × |shingles| interpreted lambda calls.
  *
  * Codegen policy — deliberate, not an omission: [[CosineSim]]
  * implements `doGenCode` because it runs once per CANDIDATE PAIR in
  * top-k scoring (millions of cheap calls — the per-call boxing of a
  * fallback would dominate). The others (MinHashSig, SimHash,
  * WordShingles, IvfCells, LshBucket, JaccardSim) are per-ROW
  * expressions whose single eval does hundreds-to-thousands of hash /
  * distance operations in tight compiled JVM loops inside
  * `nullSafeEval`; a CodegenFallback there costs one boxed call per
  * row — noise next to the row's intrinsic work — while hand-written
  * codegen for array-building loops would add real defect risk for no
  * measurable win. All stay inside the enclosing stage's generated
  * code as leaf calls.
  *
  * MEASURED (r9, DevTime sf0.1, warm min of 7 reps, [[SimHashGen]] vs
  * [[SimHash]] via GRAFT_SIMHASH_CODEGEN=1): q44 0.40 s vs 0.40 s —
  * identical; q46 0.95 s (fallback) vs 1.31 s (codegen) — the
  * hand-written codegen was consistently ~35% SLOWER on the banded
  * self-join (inlining the vote loop bloats the stage's generated
  * method where the fallback keeps it a compact JVM-JIT'd leaf call).
  * The fallback policy stands on evidence, not an argument.
  *
  * All are deterministic pure functions, so results stay
  * reproducible across partitionings and retries.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Fused cosine similarity over two ArrayType(FloatType) columns,
  * accumulated in double, left-to-right — bit-identical to the
  * sequential fold the DuckDB oracle computes. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Set Jaccard similarity |A∩B| / |A∪B| over two string-array
  * columns (duplicates ignored). One hash-set pass replaces the
  * array_intersect + array_union + two size() composition — three
  * interpreted passes and two materialized arrays per pair — with
  * zero intermediate allocation beyond the sets. Counting semantics
  * match Spark's array_intersect/array_union (and DuckDB's
  * list_intersect / list_distinct(list_concat)) exactly, so the
  * oracle contract is unchanged. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < x.numElements()) { setA.add(x.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var inter = 0
    i = 0
    while (i < y.numElements()) {
      val s = y.getUTF8String(i)
      if (setB.add(s) && setA.contains(s)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature of a string-array column: for each permutation
  * p ∈ [0, perms), min over h_p(shingle). Single pass over the array
  * computes the whole signature.
  *
  * Two hash families behind the SAME min-selection loop:
  *  - production (`portable = false`): XXH64(shingle bytes, seed = p)
  *    — the fast path; its internals are not reproducible in DuckDB,
  *    so queries built on it carry the rows-only gate.
  *  - `portable = true`: ONE md5 per shingle, then the classic
  *    universal-hash permutation family over its 60-bit prefix —
  *    hm = (first 15 hex chars of md5(shingle), parsed base-16) mod P
  *    with P = 2³¹−1, and permutation p's hash is
  *    (a_p·hm + p·40503) mod P with a_p = (2654435761·(p+1)) mod P
  *    (Knuth's multiplier — a_p spans the full 31-bit range, so every
  *    permutation WRAPS and the per-p orderings decorrelate). One
  *    digest per shingle instead of one per (perm, shingle) — 32×
  *    fewer md5 calls at perms = 32. Two rejected variants, measured:
  *    Kirsch–Mitzenmacher h1 + p·h2 (h1's high bits dominate — band
  *    keys collapse toward single-shingle equality, 5× candidate
  *    volume) and small multipliers a_p = p+1 (no wrap in the
  *    small-value range minima live in — the global min-hm shingle
  *    biases every permutation, 2× candidates). Every step is
  *    overflow-free BIGINT arithmetic (a_p·hm < 2⁶²), so DuckDB
  *    reproduces it exactly and the REAL signature-min code runs
  *    under a full hash gate (q156, the q153/q154 verification-twin
  *    recipe). */
case class MinHashSig(child: Expression, perms: Int,
    portable: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(perms > 0, "perms must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  // one digest instance per task thread — MessageDigest is stateful
  // and not thread-safe, and per-call getInstance would dominate the
  // portable hash's cost
  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  // permutation multipliers hoisted off the (shingle × perm) hot loop
  @transient private lazy val mults: Array[Long] =
    Array.tabulate(perms)(MinHashSig.mult)

  /** Portable base hash: ONE md5 of the shingle, big-endian first 8
    * bytes >>> 4 (= first 15 hex chars, 60 bits) mod [[MinHashSig.P]]. */
  private def portableBase(
      s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) % MinHashSig.P
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (portable) {
        val hm = portableBase(s)
        var p = 0
        while (p < perms) {
          val h = (mults(p) * hm + p * MinHashSig.B) % MinHashSig.P
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      } else {
        var p = 0
        while (p < perms) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, p.toLong)
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Universal-hash modulus (2³¹−1, prime), offset, and multiplier
    * base of the portable permutation family — public so the in-repo
    * HOF reference and external oracles name the same numbers. */
  val P: Long = 2147483647L
  val B: Long = 40503L
  val A: Long = 2654435761L
  /** Permutation p's multiplier: (A·(p+1)) mod P — full-31-bit, so
    * the permutation wraps and per-p orderings decorrelate. */
  def mult(p: Int): Long = (A * (p + 1)) % P
}

/** SimHash of a token-hash (long-array) column: per bit b, sum ±1
  * votes of bit b across the hashes; output bit b is set iff the vote
  * is positive. One pass over the array replaces `bits` interpreted
  * `aggregate` lambdas per row (bits × |tokens| lambda evals).
  *
  * Vote semantics are bit-identical to the HOF composition in
  * graft.ext.Dedup.simhashFromHashesHof: bit test = pmod(h >> b, 2)
  * == 1 (i.e. (h >> b) & 1), null elements fall to the `otherwise`
  * branch and vote -1 on every bit. */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.hash(input.asInstanceOf[ArrayData], bits)

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** The vote loop shared by [[SimHash]] (CodegenFallback, the
  * production form) and [[SimHashGen]] (hand-written codegen, the
  * policy's A/B instrument). */
private[graft] object SimHashImpl {
  def hash(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

/** [[SimHash]] with hand-written `doGenCode` — the measurement
  * instrument behind the header's codegen policy: routing the q44/q46
  * family through this (GRAFT_SIMHASH_CODEGEN=1, see
  * graft.functions.exprs.simhash) vs the CodegenFallback form
  * measures what one boxed call per row actually costs next to the
  * row's |hashes| × bits vote work. Generated code is the same loop
  * as [[SimHashImpl.hash]] over the UnsafeArrayData accessors;
  * ExpressionsSpec pins the two forms bit-identical (incl. null
  * elements). */
case class SimHashGen(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_gen"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.hash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |int[] $votes = new int[$bits];
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) {
         |    for (int $b = 0; $b < $bits; $b++) $votes[$b] -= 1;
         |  } else {
         |    final long $h = $c.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) ${ev.value} |= 1L << $b;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashGen =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket id of an array<float> embedding:
  * sign bits of `bits` hyperplane projections. The hyperplane matrix
  * is row-independent and derived deterministically from
  * xxhash64(d, p) (seed 42, int-hash chaining — exactly Spark's
  * XxHash64 over (d, p)), so it is PRECOMPUTED once per expression
  * instance instead of re-hashed bits × dim times per row, and
  * executors need no shared state.
  *
  * Bit-identical to the HOF composition in
  * graft.ext.Similarity.lshBucketHof for arrays of length ≤ dim
  * (component = pmod(h, 1000)/1000 - 0.5, projection folded
  * left-to-right in double; short arrays and null elements null the
  * HOF projection via zip_with padding ⇒ no bit set ⇒ bucket 0, which
  * this expression matches). The forms DIVERGE outside that contract:
  * for arrays LONGER than dim, zip_with pads the sequence side with
  * null and xxhash64 skips null children, so the HOF projection stays
  * non-null and can set bits while this expression returns 0; a null
  * array is 0 under the HOF form but NULL here (nullIntolerant). The
  * embeddings table is fixed dim-64, so query paths never leave the
  * contract. */
case class LshBucket(child: Expression, dim: Int, bits: Int,
    planesOverride: Seq[Seq[Double]] = Nil)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(dim > 0, "dim must be positive")
  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")
  require(planesOverride.isEmpty ||
    (planesOverride.length == bits && planesOverride.forall(_.length == dim)),
    "planesOverride must be bits x dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  // planesOverride (a Seq, so it participates in case-class equality /
  // plan canonicalization) lets callers inject externally-reproducible
  // planes — the oracle-twin hook (q154); production paths leave it
  // empty and get the xxhash-seeded pseudo-random planes.
  @transient private lazy val planes: Array[Array[Double]] =
    if (planesOverride.nonEmpty) planesOverride.map(_.toArray).toArray
    else Array.tabulate(bits) { p =>
      Array.tabulate(dim) { d =>
        val h = XXH64.hashInt(p, XXH64.hashInt(d, 42L))
        (((h % 1000L) + 1000L) % 1000L).toDouble / 1000.0 - 0.5
      }
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0L
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val hp = planes(p)
      var s = 0.0
      var d = 0
      while (d < dim) { s += arr.getFloat(d).toDouble * hp(d); d += 1 }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** Word k-shingles of a token (string-array) column: the distinct
  * space-joined k-grams, first-occurrence order — exactly
  * array_distinct(transform(sequence(...), i → concat_ws(" ",
  * slice(toks, i+1, k)))) with the short-input (< k tokens ⇒ one
  * shingle of all tokens) branch, but in ONE pass per row. The HOF
  * composition allocates a position sequence, a sliced sub-array and
  * an interpreted lambda frame per shingle position — the dominant
  * scan-side cost of the MinHash pipeline (VERDICT r1 q42 profile).
  * Null tokens are skipped inside a shingle (concat_ws semantics);
  * a null token ARRAY yields null in both forms. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  @transient private lazy val space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    // LinkedHashSet = array_distinct's keep-first-occurrence order
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      out.add(UTF8String.concatWs(space, toks: _*))
    } else {
      val win = new Array[UTF8String](k)
      i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) { win(j) = toks(i + j); j += 1 }
        out.add(UTF8String.concatWs(space, win: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Block-intensity perceptual hash of a media payload: split the
  * input into `blocks` equal ranges, region intensity = non-space
  * element count, output bit b set iff `intensity_b · blocks > total`
  * (the integer cross-product form of "above the mean" — no float
  * arithmetic anywhere, so the value is bit-reproducible in any
  * engine). ONE pass replaces the explode(blocks)+substr+window
  * composition — per-row work identical, but no row explosion and NO
  * per-media window shuffle, and the expression is stateless so the
  * SAME hash runs on a stream (graft.streaming.StreamOps media dedup)
  * and in batch (graft.ext.Multimodal.perceptualHash, q157).
  *
  * TWO input forms:
  *  - BINARY (the production media path): intensity over RAW BYTES —
  *    non-0x20 count per byte range — with NO charset decode anywhere,
  *    so an arbitrary blob (JPEG, PCM, anything non-UTF8) hashes
  *    byte-exactly. Block boundaries are byte ranges.
  *  - STRING (the text stand-in / oracle shape): intensity over code
  *    points, boundaries as code-point ranges (floor(b·n/blocks),
  *    floor((b+1)·n/blocks)] — exactly the substr composition's and
  *    the DuckDB oracle's character arithmetic.
  * On pure-ASCII payloads (one byte per code point — the gate corpus)
  * the two forms coincide bit-for-bit; PHashSpec pins both that
  * coincidence and the binary form's stability on non-UTF8 bytes that
  * a UTF-8 decode would mangle. */
case class PHash(child: Expression, blocks: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(blocks > 0 && blocks <= 63, "blocks must fit a long's bits")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, BinaryType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash"

  @transient private lazy val isBinary = child.dataType == BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (isBinary) hashBytes(input.asInstanceOf[Array[Byte]])
    else {
      // code-point array: Spark's substring/length count code points,
      // and the hash must agree with that composition exactly
      val cps = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString.codePoints().toArray
      hashIntensities(cps.length, i => cps(i) != ' ')
    }

  private def hashBytes(bytes: Array[Byte]): Long =
    hashIntensities(bytes.length, i => bytes(i) != 0x20)

  private def hashIntensities(n: Int, ink: Int => Boolean): Long = {
    val its = new Array[Long](blocks)
    var b = 0
    while (b < blocks) {
      val lo = b.toLong * n / blocks       // exclusive of position lo
      val hi = (b + 1).toLong * n / blocks // inclusive range end
      var i = lo.toInt
      var c = 0L
      while (i < hi) {
        if (ink(i)) c += 1
        i += 1
      }
      its(b) = c
      b += 1
    }
    var tot = 0L
    b = 0
    while (b < blocks) { tot += its(b); b += 1 }
    var out = 0L
    b = 0
    while (b < blocks) {
      if (its(b) * blocks > tot) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PHash =
    copy(child = newChild)
}

/** IVF (inverted-file) cell assignment: ids of the `nProbe` nearest
  * centroids — squared L2, nearest first — for an array<float>
  * embedding. The centroid matrix is a plan-time constant (fit
  * offline on a bounded sample, see graft.ext.Similarity.ivfCentroids)
  * shipped inside the expression, so assignment is one fused
  * k × dim double loop per row with no join and no shared state.
  * nProbe = 1 is the index-build assignment; probe time uses
  * nProbe > 1 to trade scan cost for recall.
  *
  * `centroids` is a Seq (not Array) so case-class equality keeps plan
  * canonicalization/caching correct. Ties broken by lower centroid id
  * (stable selection ⇒ deterministic across partitionings). Arrays
  * shorter than the centroid dim score only the shared prefix. */
case class IvfCells(child: Expression, centroids: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(centroids.nonEmpty, "centroids must be non-empty")
  require(nProbe > 0 && nProbe <= centroids.size,
    "nProbe must be in [1, centroids.size]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_cells"

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = cents.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(arr.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val d = arr.getFloat(i).toDouble - cent(i)
          s += d * d
        }
        i += 1
      }
      dists(c) = s
      c += 1
    }
    // selection of the nProbe smallest, stable on ties (lower id wins)
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < nProbe) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < k) {
        if (!taken(c) && dists(c) < bestD) { best = c; bestD = dists(c) }
        c += 1
      }
      if (best < 0) {
        // every remaining distance is NaN (NaN-poisoned embedding:
        // NaN < bestD is always false) — degrade to the lowest
        // untaken centroid id instead of indexing with -1
        c = 0
        while (best < 0 && c < k) {
          if (!taken(c)) best = c
          c += 1
        }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCells =
    copy(child = newChild)
}
