package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{bridge, CosineSim, IvfCells, JaccardSim, LshBucket, MinHashSig, PHash, SimHash, SimHashGen, WordShingles}

/** Public Column API over the native expressions (implementation in
  * org.apache.spark.sql.graft — see that file's scaladoc). */
object exprs {

  /** cosine(a, b) over array<float> columns (fused, codegen'd). */
  def cosine_sim(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))

  /** MinHash signature: array<long> of length `perms`, one pass. */
  def minhash_sig(shingles: Column, perms: Int): Column =
    bridge.column(MinHashSig(bridge.expression(shingles), perms))

  /** [[minhash_sig]] with the portable permutation family — the
    * oracle-twin hook (q156): the REAL expression's signature-min
    * loop runs over hashes an external engine can reproduce (ONE md5
    * per shingle, hm = first-15-hex-chars mod 2³¹−1, permutation p's
    * hash = (a_p·hm + p·40503) mod (2³¹−1) with a_p =
    * (2654435761·(p+1)) mod (2³¹−1) — see
    * [[org.apache.spark.sql.graft.MinHashSig]]). */
  def minhash_sig_portable(shingles: Column, perms: Int): Column =
    bridge.column(MinHashSig(bridge.expression(shingles), perms,
      portable = true))

  /** Set Jaccard |A∩B|/|A∪B| over string arrays, one hash-set pass. */
  def jaccard_sim(a: Column, b: Column): Column =
    bridge.column(JaccardSim(bridge.expression(a), bridge.expression(b)))

  /** SimHash of a long-array (token hashes): `bits`-bit signature,
    * one pass over the array. GRAFT_SIMHASH_CODEGEN=1 swaps in the
    * hand-written-codegen twin — the measurement instrument for the
    * codegen policy A/B (see the expressions.scala header); the
    * CodegenFallback form is the measured-equal production default. */
  def simhash(hashes: Column, bits: Int): Column =
    if (sys.env.get("GRAFT_SIMHASH_CODEGEN").contains("1"))
      bridge.column(SimHashGen(bridge.expression(hashes), bits))
    else bridge.column(SimHash(bridge.expression(hashes), bits))

  /** Random-hyperplane LSH bucket of an array<float> embedding:
    * `bits` sign bits over a precomputed deterministic hyperplane
    * matrix. */
  def lsh_bucket(emb: Column, dim: Int, bits: Int): Column =
    bridge.column(LshBucket(bridge.expression(emb), dim, bits))

  /** [[lsh_bucket]] with caller-supplied hyperplanes (bits × dim) —
    * the oracle-twin hook: the REAL expression's fold/threshold code
    * runs over planes an external engine can reproduce. */
  def lsh_bucket_planes(emb: Column, planes: Seq[Seq[Double]]): Column =
    bridge.column(LshBucket(bridge.expression(emb),
      planes.head.length, planes.length, planes))

  /** Distinct word k-shingles of a token array in one pass (the
    * staged HOF composition's semantics, minus its per-position
    * lambda + slice allocations). */
  def word_shingles(toks: Column, k: Int): Column =
    bridge.column(WordShingles(bridge.expression(toks), k))

  /** Block-intensity perceptual hash: `blocks`-bit signature in one
    * pass, no explode/window — and stateless, so it runs on streams.
    * Takes BINARY (raw-byte intensity, no charset decode — the
    * byte-safe production media path) or STRING (code-point
    * intensity, the oracle/text shape); the two coincide on ASCII. */
  def phash(payload: Column, blocks: Int): Column =
    bridge.column(PHash(bridge.expression(payload), blocks))

  /** IVF cell assignment: the `nProbe` nearest centroid ids (squared
    * L2, nearest first) — one fused k × dim loop per row against a
    * plan-time centroid matrix. */
  def ivf_cells(emb: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    bridge.column(IvfCells(bridge.expression(emb), centroids, nProbe))
}
