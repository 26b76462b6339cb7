package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Similarity

/** Generators for DATA-DEPENDENT DuckDB oracle SQL.
  *
  * The fitted-codebook ANN family (q55/q56/q142/q143/q144) runs on
  * Lloyd-fitted centroids/codebooks. The fit is byte-stable by
  * construction — bounded deterministic sample (first sampleN rows by
  * vec_id, sorted driver-side), evenly-spaced init, fixed iteration
  * count ([[Similarity.ivfCentroids]] / [[Similarity.pqCodebooks]]) —
  * so the fitted values are reproducible CONSTANTS of (data dir,
  * parameters). That makes them inlinable: at Verify time the fit runs
  * once and the resulting doubles are embedded as literals into
  * generated DuckDB SQL (the q149/q154 fixed-formula recipe, but with
  * the production-fitted books), which hash-gates the REAL production
  * path — encode argmin, ADC lookup-table scoring, coarse-cell probe
  * pruning — not a synthetic twin.
  *
  * Literal round-trip: `Double.toString` emits the shortest decimal
  * that parses back to the identical bit pattern (Java shortest
  * round-trip repr); DuckDB's strtod is correctly rounded, so the
  * inlined literal reconstructs the exact double. `dlit` forces the
  * DOUBLE literal parse path (scientific notation) so DuckDB never
  * routes the value through DECIMAL.
  */
object OracleGen {

  /** Shortest-round-trip double literal, forced to DuckDB's DOUBLE
    * parse path (a plain `0.125` literal would parse as DECIMAL and
    * change downstream arithmetic types). */
  def dlit(d: Double): String = {
    require(java.lang.Double.isFinite(d), s"non-finite literal: $d")
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  private def l1(xs: Seq[Double]): String =
    xs.map(dlit).mkString("[", ", ", "]")
  private def l2(xss: Seq[Seq[Double]]): String =
    xss.map(l1).mkString("[", ", ", "]")

  /** Per-vector squared-distance list to `k` centroids held in a
    * single-row CTE column `cents` — element c+1 is the distance to
    * centroid c, accumulated over dims in ascending order exactly like
    * IvfCells' `s += d*d` loop (list_sum folds in list order; q149
    * proved the parity). */
  private def distsSql(k: Int, dim: Int): String =
    s"""list_transform(range(0, $k), c ->
       |      list_sum(list_transform(range(0, $dim), i ->
       |        (CAST(embedding[i + 1] AS DOUBLE) - cents[c + 1][i + 1])
       |        * (CAST(embedding[i + 1] AS DOUBLE) - cents[c + 1][i + 1]))))""".stripMargin

  /** argmin as 0-based cell id: first position of the min distance —
    * DuckDB's list_position returns the FIRST match, reproducing
    * IvfCells' strict-< lower-id tie-break. */
  private val cellSql =
    "CAST(list_position(dists, list_min(dists)) - 1 AS INTEGER)"

  /** Shared CTE prefix: coarse assignment of every vector (and the
    * probe query's nProbe nearest cells, selected by (distance, id)
    * ascending — identical to IvfCells' repeated strict-< argmin). */
  private def coarseCtes(cents: Seq[Seq[Double]], queryId: Long,
      nProbe: Int): String = {
    val k = cents.length
    val dim = cents.head.length
    s"""cc AS (SELECT ${l2(cents)} AS cents),
       |d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
       |    ${distsSql(k, dim)} AS dists
       |  FROM embeddings, cc),
       |asgn AS (SELECT vec_id, label, emb, $cellSql AS cell FROM d),
       |q AS (SELECT emb AS q_emb, dists AS qdists FROM d WHERE vec_id = $queryId),
       |qc AS (SELECT list(CAST(c AS INTEGER) ORDER BY qdists[c + 1], c) AS cl
       |  FROM q, UNNEST(range(0, $k)) AS t(c)),
       |qcells AS (SELECT cl[1:$nProbe] AS cells FROM qc)""".stripMargin
  }

  /** q56: IVF index build report — coarse argmin assignment + cell
    * occupancy, with the FITTED centroids inlined. */
  def ivfIndexStatsSql(cents: Seq[Seq[Double]]): String = {
    val k = cents.length
    val dim = cents.head.length
    s"""WITH cc AS (SELECT ${l2(cents)} AS cents),
       |d AS (SELECT vec_id, ${distsSql(k, dim)} AS dists
       |  FROM embeddings, cc)
       |SELECT $cellSql AS cell, COUNT(*) AS n_vectors,
       |  MIN(vec_id) AS min_vec_id
       |FROM d GROUP BY 1""".stripMargin
  }

  /** q55: IVF probe — only vectors in the query's nProbe nearest
    * cells are exact-cosine scored (list_dot_product matches
    * CosineSim's fold bit-for-bit; q50/q53 proven). */
  def ivfProbeSql(cents: Seq[Seq[Double]], queryId: Long = 0L,
      nProbe: Int = 4, topK: Int = 10): String =
    s"""WITH ${coarseCtes(cents, queryId, nProbe)}
       |SELECT a.vec_id, a.label,
       |  round(list_dot_product(a.emb, q.q_emb) /
       |    (sqrt(list_dot_product(a.emb, a.emb)) *
       |     sqrt(list_dot_product(q.q_emb, q.q_emb))), 6) AS cos_sim
       |FROM asgn a, q, qcells
       |WHERE list_contains(qcells.cells, a.cell) AND a.vec_id <> $queryId
       |ORDER BY cos_sim DESC, a.vec_id LIMIT $topK""".stripMargin

  /** PQ-encode CTEs: per-subspace squared-distance argmin against the
    * FITTED codebooks (held once in a single-row `bk` CTE; the dists
    * list per subspace is a named column so list_position/list_min
    * reference it instead of recomputing). Emits `enc(vec_id, label,
    * codes)` — codes 0-based INTEGER, exactly [[Similarity.pqIndex]]. */
  private def encodeCtes(books: Seq[Seq[Seq[Double]]]): String = {
    val m = books.length
    val ksub = books.head.length
    val sub = books.head.head.length
    val bookCols = books.indices.map(j => s"${l2(books(j))} AS b$j").mkString(",\n    ")
    val distCols = books.indices.map { j =>
      s"""list_transform(range(0, $ksub), c ->
         |      list_sum(list_transform(range(0, $sub), i ->
         |        (CAST(embedding[${j * sub} + i + 1] AS DOUBLE) - b$j[c + 1][i + 1])
         |        * (CAST(embedding[${j * sub} + i + 1] AS DOUBLE) - b$j[c + 1][i + 1])))) AS d$j""".stripMargin
    }.mkString(",\n    ")
    val codeExprs = books.indices.map(j =>
      s"CAST(list_position(d$j, list_min(d$j)) - 1 AS INTEGER)").mkString(",\n    ")
    s"""bk AS (SELECT $bookCols),
       |pd AS (SELECT vec_id, label, embedding,
       |    $distCols
       |  FROM embeddings, bk),
       |enc AS (SELECT vec_id, label, embedding,
       |    [$codeExprs] AS codes
       |  FROM pd)""".stripMargin
  }

  /** ADC score expression over `codes`: the per-subspace dot/norm
    * lookup tables are computed DRIVER-side from the fitted books and
    * the query vector — the same Scala arithmetic (left-to-right Seq
    * sums) as Similarity.adcCosApprox's typedLit tables — and inlined
    * as literal lists; the per-row score is m element_at lookups per
    * table with left-associated addition, matching `.reduce(_ + _)`. */
  private def adcSql(books: Seq[Seq[Seq[Double]]], qEmb: Seq[Double]): String = {
    val m = books.length
    val sub = books.head.head.length
    val qNorm = math.sqrt(qEmb.map(x => x * x).sum)
    val dotLuts = books.indices.map(j => books(j).map(c =>
      c.indices.map(i => c(i) * qEmb(j * sub + i)).sum))
    val normLuts = books.indices.map(j => books(j).map(c => c.map(x => x * x).sum))
    val dot = books.indices.map(j =>
      s"${l1(dotLuts(j))}[codes[${j + 1}] + 1]").mkString(" + ")
    val nrm = books.indices.map(j =>
      s"${l1(normLuts(j))}[codes[${j + 1}] + 1]").mkString(" + ")
    s"""round(($dot)
       |    / (${dlit(qNorm)} * sqrt($nrm)), 6)""".stripMargin
  }

  /** q142: PQ probe — codes-only ADC scoring with the FITTED books. */
  def pqProbeSql(books: Seq[Seq[Seq[Double]]], qEmb: Seq[Double],
      queryId: Long = 0L, topK: Int = 10): String =
    s"""WITH ${encodeCtes(books)}
       |SELECT vec_id, label, ${adcSql(books, qEmb)} AS cos_approx
       |FROM enc WHERE vec_id <> $queryId
       |ORDER BY cos_approx DESC, vec_id LIMIT $topK""".stripMargin

  /** q143: PQ code-usage audit over the FITTED-book encode. */
  def pqIndexStatsSql(books: Seq[Seq[Seq[Double]]]): String = {
    val m = books.length
    s"""WITH ${encodeCtes(books)},
       |x AS (SELECT CAST(j AS INTEGER) AS subspace, codes[j + 1] AS code
       |  FROM enc, UNNEST(range(0, $m)) AS t(j))
       |SELECT subspace, COUNT(DISTINCT code) AS live_codes,
       |  COUNT(*) AS n_rows, MAX(code) AS max_code
       |FROM x GROUP BY subspace""".stripMargin
  }

  /** q144: IVF+PQ probe — coarse-cell pruning (fitted centroids) +
    * codes-only ADC scoring (fitted books), the production FAISS-shape
    * path end to end. */
  def ivfPqProbeSql(cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]],
      qEmb: Seq[Double], queryId: Long = 0L, nProbe: Int = 4,
      topK: Int = 10): String =
    s"""WITH ${coarseCtes(cents, queryId, nProbe)},
       |${encodeCtes(books)}
       |SELECT e.vec_id, e.label, ${adcSql(books, qEmb)} AS cos_approx
       |FROM enc e JOIN asgn a USING (vec_id), qcells
       |WHERE list_contains(qcells.cells, a.cell) AND e.vec_id <> $queryId
       |ORDER BY cos_approx DESC, e.vec_id LIMIT $topK""".stripMargin

  /** The five fitted-family oracles for one data dir: runs the
    * byte-stable fits (cached — the catalog queries reuse them) and
    * inlines the results. Called by Verify AFTER the Spark results are
    * dumped, with the same (dir, parameter) defaults the catalog
    * entries use. */
  def fittedAnnOracles(spark: SparkSession, dir: String): Map[String, String] = {
    val cents = Similarity.ivfCentroids(spark, dir)
    val books = Similarity.pqCodebooks(spark, dir)
    val qEmb = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    Map(
      "q55_ivf_probe"    -> ivfProbeSql(cents),
      "q56_ivf_index"    -> ivfIndexStatsSql(cents),
      "q142_pq_probe"    -> pqProbeSql(books, qEmb),
      "q143_pq_stats"    -> pqIndexStatsSql(books),
      "q144_ivfpq_probe" -> ivfPqProbeSql(cents, books, qEmb))
  }
}
