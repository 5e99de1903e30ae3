package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FIXED-POINT PCA over the embedding corpus — the decomposition face of
  * the embedding family (stats/quantize/delta exist; this adds the
  * dominant principal axis and each vector's projection onto it, the
  * standard curation signals for embedding whitening, duplicate-axis
  * detection and diversity scoring).
  *
  * Everything is engine-exact, so the whole op oracle-gates by hash
  * (the parts_pagerank / k-means-fit determinism recipe):
  *
  *  - The ONE distributed pass accumulates the upper triangle of
  *    C = Σ x̂·x̂ᵀ over the fixed-point unit vectors x̂ = graft_fp_unit(e)
  *    as BIGINTs via the [[graft.functions.OuterProductSum]] aggregate
  *    (map-side combinable long[2080] buffers — a 64-wide `sum()` list
  *    would blow the codegen field budget and run interpreted).
  *    Integer sums are order-free: any partitioning yields the same C.
  *  - The power iteration runs DRIVER-LOCAL on the collected 64×64
  *    matrix (constant-size, the documented fit/score split — the same
  *    shape as the k-means codebook fit and the BPE fitLocal): BigInt
  *    arithmetic, v₀ = (10⁶, …, 10⁶), and per-round MAX-NORM rescaling
  *    v' = (C·v)·10⁶ div max|C·v| — an integer division (toward zero,
  *    DuckDB's `//`), chosen over the L2 norm precisely because it
  *    needs NO sqrt: the entire fit is integer arithmetic end to end,
  *    and any positive rescaling leaves power iteration's fixed
  *    direction unchanged. A zero C·v keeps the previous v (mirrored in
  *    the oracle's CASE; unreachable on a nonempty corpus but the guard
  *    must agree on both sides).
  *  - Scoring is one map pass: proj = Σ x̂ᵢ·vᵢ with |x̂ᵢ|, |vᵢ| ≤ 10⁶ —
  *    per-term ≤ 10¹², total ≤ 6.4·10¹³ < 2⁵³, so the codegen'd
  *    graft_dot double fold is EXACT and the oracle's integer SUM
  *    reproduces it bit-for-bit regardless of order.
  *
  * Overflow headroom: C entries are ≤ rows·10¹², exact in the BIGINT
  * pass to ~9.2·10⁶ vectors; a bigger corpus fits on a sample (the
  * k-means sampleFraction discipline). Zero vectors carry no direction:
  * they are excluded from the fit and projected to null.
  */
object Pca {
  val Scale = 1000000L
  val Rounds = 8

  /** The fitted dominant axis as fixed-point components (|vᵢ| ≤ 10⁶). */
  def fitTopAxis(emb: DataFrame, rounds: Int = Rounds): Array[Long] = {
    require(rounds >= 1, s"Pca.fitTopAxis: rounds must be >= 1, got $rounds")
    val dim = graft.functions.Codebooks.Dim
    val xh = Similarity.vectors(emb)
      .withColumn("xh", expr("graft_fp_unit(e)"))
      .filter(col("xh").isNotNull)
    val tri = xh.agg(expr("graft_outer_sum(xh)").as("c"))
      .head().getSeq[Long](0)
    val c = Array.ofDim[BigInt](dim, dim)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      c(i)(j) = BigInt(tri(idx)); c(j)(i) = c(i)(j); idx += 1
    }
    var v = Array.fill(dim)(BigInt(Scale))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((s, j) => s + c(i)(j) * v(j)))
      val m = w.map(_.abs).max
      // BigInt '/' truncates toward zero — DuckDB's '//' semantics
      if (m != 0) v = w.map(x => x * Scale / m)
    }
    v.map(_.toLong)
  }

  /** The registered `embedding_pca_project` query: every vector's exact
    * fixed-point projection onto the fitted dominant axis. Zero vectors
    * are out of the fit's domain and project to null (kept — the corpus
    * report should show them, not drop them).
    */
  def project(emb: DataFrame, rounds: Int = Rounds): DataFrame = {
    val axis = fitTopAxis(emb, rounds)
    val axisCol: Column = array(axis.map(a => lit(a.toDouble)): _*)
    Similarity.vectors(emb)
      .withColumn("xh", expr("graft_fp_unit(e)"))
      .select(col("vec_id"),
        call_function("graft_dot", col("xh"), axisCol).cast("long").as("proj_fp"))
      .orderBy(col("vec_id"))
  }
}
