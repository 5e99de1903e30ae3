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
}
