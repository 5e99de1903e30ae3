package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FIXED-POINT PCA over the embedding corpus — the decomposition face of
  * the embedding family (stats/quantize/delta exist; this adds the
  * dominant principal axes and each vector's projection onto them, the
  * standard curation signals for embedding whitening, duplicate-axis
  * detection and diversity scoring).
  *
  * Everything is engine-exact, so the whole op oracle-gates by hash
  * (the parts_pagerank / k-means-fit determinism recipe):
  *
  *  - The ONE distributed pass accumulates the upper triangle of
  *    C = Σ x̂·x̂ᵀ over the fixed-point unit vectors x̂ = graft_fp_unit(e)
  *    as BIGINTs via the [[graft.functions.OuterProductSum]] aggregate
  *    (map-side combinable long[2081] buffers — a 64-wide `sum()` list
  *    would blow the codegen field budget and run interpreted).
  *    Integer sums are order-free: any partitioning yields the same C.
  *  - The fit pass runs on a BOUNDED DETERMINISTIC SAMPLE (r13, the
  *    100-TB guard): when the corpus exceeds [[FitCap]] rows the fit
  *    keeps only ids with ((vec_id % 2147483647)·48271) % 2147483647
  *    ≡ 0 (mod m), m = ⌈n/FitCap⌉ — pure integer arithmetic both
  *    engines replay (the minstd LCG; 48271 is invertible mod the
  *    prime 2³¹−1, so distinct in-range ids map to distinct residues).
  *    m = 1 at every gate scale (identity — plans and oracles
  *    unchanged), ~FitCap expected rows beyond it: a 10⁹–10¹⁰-vector
  *    corpus fits on ~4.2M rows, 2.2× inside the BIGINT headroom,
  *    while SCORING stays corpus-wide (the fit/score split). The
  *    aggregate counts its rows in a trailing buffer slot and
  *    [[fitAxes]] REQUIRES the count within [[FitHeadroom]] — past it
  *    the triangle would wrap silently, so the fit now fails loudly
  *    instead (round-12 ADVICE).
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
  *  - TOP-K axes (r13) come from HOTELLING DEFLATION over the SAME
  *    collected triangle — zero extra distributed passes: after axis a
  *    converges, λ_fp = (vᵀCv) div (vᵀv) and C ← C − (λ_fp·v·vᵀ) div
  *    (vᵀv), every step a truncating BigInt division the oracle
  *    replays in HUGEINT (per-term magnitudes ≤ ~10³⁰, well inside
  *    int128). Truncation dust perturbs the deflated matrix at ~10⁻¹²
  *    relative — the recurrence, not exact algebra, is the spec, and
  *    both engines run the identical recurrence. den = vᵀv ≥ 10¹² > 0
  *    always (rescaling pins max|vᵢ| = 10⁶; a zero-C·v round keeps the
  *    previous v, and v₀ is all-10⁶).
  *  - Scoring is one map pass: proj = Σ x̂ᵢ·vᵢ with |x̂ᵢ|, |vᵢ| ≤ 10⁶ —
  *    per-term ≤ 10¹², total ≤ 6.4·10¹³ < 2⁵³, so the codegen'd
  *    graft_dot double fold is EXACT and the oracle's integer SUM
  *    reproduces it bit-for-bit regardless of order.
  *
  * Overflow headroom: C entries are ≤ fit-rows·10¹², exact in the
  * BIGINT pass to [[FitHeadroom]] = 9,223,372 rows — now ENFORCED, and
  * unreachable by construction under the m = ⌈n/FitCap⌉ ladder for any
  * id distribution that keeps the sampled count ≤ 2.2·FitCap (sequential
  * and LCG-equidistributed ids land at ~n/m ≈ FitCap). Zero vectors
  * carry no direction: they are excluded from the fit and projected to
  * null.
  */
object Pca {
  val Scale = 1000000L
  val Rounds = 8

  /** Default axis count for [[projectTopK]] — whitening / duplicate-axis
    * analysis wants a handful, not the spectrum. */
  val Axes = 4

  /** Deeper power iteration for the deflated fit: the residual
    * cross-axis cosine after deflation is bounded by the iterate's
    * distance from the true eigenvector (~(λ₂/λ₁)^rounds), and the
    * corpus' mid-spectrum is near-degenerate — 16 rounds keep all
    * pairwise cosines ≤ 0.1 where 8 left 2–3 at 0.108 (measured,
    * pinned in PcaSpec). Driver-local cost only: the distributed
    * covariance pass is round-count-free. */
  val TopkRounds = 16

  /** Hard exactness bound of the BIGINT covariance pass:
    * (2⁶³−1) / 10¹² rows at per-row |x̂ᵢx̂ⱼ| ≤ S². ENFORCED via the
    * aggregate's count slot. */
  val FitHeadroom = 9223372L

  /** Fit-sample target: m = ⌈n/FitCap⌉ keeps the expected sampled count
    * at ~4.2M rows — 2.2× inside [[FitHeadroom]]. */
  val FitCap = 4194304L

  /** The N-adaptive fit modulus (the sizedNlist / sizedEstK pattern):
    * identity (1) through every gate scale, ⌈n/FitCap⌉ beyond. Mirrored
    * verbatim in the oracle's psizing CTE. */
  def sizedFitModulus(n: Long): Long =
    if (n <= FitCap) 1L else (n + FitCap - 1L) / FitCap

  /** The deterministic fit-sample predicate: minstd-permuted id ≡ 0 mod
    * m. Products stay ≤ (2³¹)·48271 ≈ 2⁴⁷ — no ANSI overflow. */
  private def fitFilter(m: Long): Column =
    (((col("vec_id") % 2147483647L) * 48271L) % 2147483647L) % m === 0L

  private def fitFilterSql(mExpr: String): String =
    s"((vec_id % 2147483647) * 48271) % 2147483647 % $mExpr = 0"

  /** The oracle-side sample predicate text (composed by the PCA oracles
    * against their psizing CTE's `m` column). */
  def fitFilterSqlText: String = fitFilterSql("m")

  /** The fitted top-`nAxes` axes as fixed-point components (|vᵢ| ≤ 10⁶),
    * variance-ordered by construction (power iteration + deflation). */
  def fitAxes(emb: DataFrame, nAxes: Int = Axes,
              rounds: Int = Rounds): Array[Array[Long]] =
    fitAxesStats(emb, nAxes, rounds)._1

  /** [[fitAxes]] plus the spectrum card's numbers: per-axis λ_fp — the
    * truncating Rayleigh quotient (vᵀCv) div (vᵀv) of each converged
    * axis against ITS deflated matrix — and the trace of the original
    * C (Σ Cᵢᵢ, the total fixed-point variance mass; ≤ fit-rows·10¹² <
    * 2⁶³ under the enforced headroom). One extra driver-local matvec
    * per axis; the distributed pass is unchanged. */
  def fitAxesStats(emb: DataFrame, nAxes: Int = Axes,
                   rounds: Int = Rounds): (Array[Array[Long]], Array[Long], Long) = {
    require(rounds >= 1, s"Pca.fitAxes: rounds must be >= 1, got $rounds")
    val dim = graft.functions.Codebooks.Dim
    require(nAxes >= 1 && nAxes <= dim,
      s"Pca.fitAxes: nAxes must be in 1..$dim, got $nAxes")
    val m = sizedFitModulus(emb.count())
    val xh = Similarity.vectors(emb)
      .filter(fitFilter(m))
      .withColumn("xh", expr("graft_fp_unit(e)"))
      .filter(col("xh").isNotNull)
    val tri = xh.agg(expr("graft_outer_sum(xh)").as("c"))
      .head().getSeq[Long](0)
    val len = dim * (dim + 1) / 2
    val fitted = tri(len) // the aggregate's trailing count slot
    require(fitted <= FitHeadroom,
      s"Pca.fitAxes: $fitted sampled rows exceed the BIGINT covariance " +
        s"headroom $FitHeadroom — the triangle would wrap silently; " +
        s"raise the modulus ladder (sizedFitModulus) for this id space")
    val c = Array.ofDim[BigInt](dim, dim)
    var idx = 0
    var trace = BigInt(0)
    for (i <- 0 until dim; j <- i until dim) {
      c(i)(j) = BigInt(tri(idx)); c(j)(i) = c(i)(j)
      if (i == j) trace += c(i)(j)
      idx += 1
    }
    def matvec(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((s, j) => s + c(i)(j) * v(j)))
    val axes = Array.ofDim[Array[Long]](nAxes)
    val lams = Array.ofDim[Long](nAxes)
    for (a <- 0 until nAxes) {
      var v = Array.fill(dim)(BigInt(Scale))
      for (_ <- 1 to rounds) {
        val w = matvec(v)
        val mx = w.map(_.abs).max
        // BigInt '/' truncates toward zero — DuckDB's '//' semantics
        if (mx != 0) v = w.map(x => x * Scale / mx)
      }
      axes(a) = v.map(_.toLong)
      // Rayleigh quotient of the converged axis on the CURRENT matrix —
      // the card's λ_fp, and (below) the Hotelling deflation coefficient.
      // den ≥ S² > 0 always (max-norm rescale pins max|vᵢ| = S).
      val w = matvec(v)
      val num = (0 until dim).foldLeft(BigInt(0))((s, i) => s + v(i) * w(i))
      val den = (0 until dim).foldLeft(BigInt(0))((s, i) => s + v(i) * v(i))
      val lam = num / den
      lams(a) = lam.toLong
      if (a < nAxes - 1)
        for (i <- 0 until dim; j <- 0 until dim)
          c(i)(j) -= lam * v(i) * v(j) / den
    }
    (axes, lams, trace.toLong)
  }

  /** The fitted dominant axis — axis 1 of [[fitAxes]] (deflation never
    * touches the first axis, so the single-axis contract is unchanged).
    */
  def fitTopAxis(emb: DataFrame, rounds: Int = Rounds): Array[Long] =
    fitAxes(emb, nAxes = 1, rounds = rounds)(0)

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

  /** The registered `embedding_pca_topk` query (r13): every vector's
    * exact fixed-point projections onto the top-`nAxes` deflated axes —
    * wide columns proj1_fp..projK_fp (variance-ordered). One fit
    * collection + ONE scoring map pass; zero vectors project to null on
    * every axis.
    */
  def projectTopK(emb: DataFrame, nAxes: Int = Axes,
                  rounds: Int = TopkRounds): DataFrame = {
    val axes = fitAxes(emb, nAxes, rounds)
    val projCols = axes.zipWithIndex.map { case (ax, i) =>
      val axisCol: Column = array(ax.map(a => lit(a.toDouble)): _*)
      call_function("graft_dot", col("xh"), axisCol)
        .cast("long").as(s"proj${i + 1}_fp")
    }
    Similarity.vectors(emb)
      .withColumn("xh", expr("graft_fp_unit(e)"))
      .select(col("vec_id") +: projCols: _*)
      .orderBy(col("vec_id"))
  }

  /** The registered `embedding_pca_card` query (r13) — the SPECTRUM
    * card: one row per fitted axis with its fixed-point eigenvalue
    * estimate λ_fp (the truncating Rayleigh quotient on the deflated
    * matrix — exact integers both engines) and its explained-variance
    * share λ/trace (ONE pinned IEEE shape: both casts round the same
    * integers, one division). The first number anyone asks of an
    * embedding corpus — how concentrated is it? — as a 4-row card.
    */
  def varianceCard(emb: DataFrame, nAxes: Int = Axes,
                   rounds: Int = TopkRounds): DataFrame = {
    val (_, lams, trace) = fitAxesStats(emb, nAxes, rounds)
    val spark = emb.sparkSession
    import spark.implicits._
    lams.zipWithIndex.map { case (lam, i) =>
      (i + 1, lam, lam.toDouble / trace.toDouble)
    }.toSeq.toDF("axis", "lam_fp", "share").orderBy(col("axis"))
  }

  /** The registered `embedding_pca_whiten` query (r13) — the whitened
    * residual VECTOR itself (the outliers card's per-component face):
    * ŵ = x̂ − Σ_a (proj_a/den_a)·v_a, each component truncated to a
    * fixed-point BIGINT and the 64 of them PACKED as a comma string
    * (check.py hashes scalar columns only — the array_join/longs
    * packing discipline). Per component the arithmetic is one pinned
    * IEEE chain mirrored verbatim: t_a = (projᵈ·v_aᵢᵈ)/denᵈ (one
    * multiply — proj·v can exceed 2⁵³, the rounding is deterministic —
    * one divide), left-associated subtraction, then trunc-toward-zero
    * (Spark's cast-to-long == DuckDB's trunc()::BIGINT; a bare DuckDB
    * CAST would ROUND and diverge). Zero vectors → null string.
    *
    * FUSED (r14, round-13 VERDICT #1): the r13 HOF formulation
    * (array_join ∘ transform referencing the four projection columns
    * inside the lambda) hit the documented inlining landmine —
    * project-collapse inlined the graft_dot folds INTO the lambda and
    * interpreted HOF eval re-computed all four 64-element dots PER
    * COMPONENT (measured 3.4× wall). The whole chain now runs in ONE
    * codegen'd [[graft.functions.PcaWhiten]] call per row (projections
    * computed once, identical pinned IEEE order, identical packing) —
    * byte-identical output, oracle unchanged. The function is
    * createOrReplace'd (not register-once) because the axes are
    * data-fitted per corpus; Dataset analysis is eager at select-time,
    * so the resolved plan pins THIS fit's expression instance even if a
    * later whiten call re-registers.
    */
  def whiten(emb: DataFrame, nAxes: Int = Axes,
             rounds: Int = TopkRounds): DataFrame = {
    val axes = fitAxes(emb, nAxes, rounds)
    val dens = axes.map(ax =>
      ax.foldLeft(BigInt(0))((s, v) => s + BigInt(v) * BigInt(v)).toDouble)
    val axesD = axes.map(_.map(_.toDouble))
    emb.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pca_whiten",
      exprs => graft.functions.PcaWhiten(exprs.head, axesD, dens), "built-in")
    Similarity.vectors(emb)
      .withColumn("xh", expr("graft_fp_unit(e)"))
      .select(col("vec_id"),
        call_function("graft_pca_whiten", col("xh")).as("wfp"))
      .orderBy(col("vec_id"))
  }

  /** The registered `embedding_pca_outliers` query (r13) — the
    * RECONSTRUCTION-RESIDUAL curation card the axes exist for: how much
    * of each vector's energy the top-`nAxes` principal directions fail
    * to explain. High `resid_frac` = a vector the corpus' dominant
    * structure does not represent — the standard embedding-space
    * outlier / junk / off-distribution signal (the SSL-prototype and
    * SemDeDup-outlier recipe).
    *
    * Engine-exact by pinned shapes: proj_a = Σ x̂ᵢ·v_aᵢ and
    * n2x = Σ x̂ᵢ² are EXACT integers (< 2⁵³) from the codegen'd
    * graft_dot fold; den_a = Σ v_aᵢ² is an exact integer computed
    * driver-side from the fitted axes and interpolated as the same
    * literal both engines (the oracle re-derives it as SUM(pv·pv) —
    * equal exactly, both are the same integer ≤ 6.4·10¹³). The
    * residual is then a FIXED IEEE shape evaluated in one pinned
    * order: r_a = (projᵈ·projᵈ)/denᵈ (proj² ≈ 4·10²⁷ exceeds 2⁵³, so
    * the square IS rounded — but it is ONE deterministic multiply,
    * identical bits both engines), resid = (((n2x − r₁) − r₂) − r₃)
    * − r₄ left-associated, resid_frac = resid / n2x. Zero vectors →
    * null. Truncation dust can push resid a hair negative — shipped
    * as computed (the spec bounds |negative| by ulp-scale dust);
    * clamping would diverge from any engine that doesn't.
    */
  def outliers(emb: DataFrame, nAxes: Int = Axes,
               rounds: Int = TopkRounds): DataFrame = {
    val axes = fitAxes(emb, nAxes, rounds)
    val base = Similarity.vectors(emb)
      .withColumn("xh", expr("graft_fp_unit(e)"))
      .withColumn("n2x", call_function("graft_dot", col("xh"), col("xh")))
    val resid = axes.foldLeft(col("n2x")) { (acc, ax) =>
      val axisCol: Column = array(ax.map(a => lit(a.toDouble)): _*)
      val den = ax.foldLeft(BigInt(0))((s, v) => s + BigInt(v) * BigInt(v))
      val p = call_function("graft_dot", col("xh"), axisCol)
      acc - (p * p / lit(den.toDouble))
    }
    base
      .select(col("vec_id"), resid.as("resid"),
        (resid / col("n2x")).as("resid_frac"))
      .orderBy(col("vec_id"))
  }
}
