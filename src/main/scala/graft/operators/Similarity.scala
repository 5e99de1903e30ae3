package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Embedding similarity operators (SURVEY.md §2c): exact cosine top-k as
  * the baseline and random-hyperplane LSH as the 100-TB path.
  *
  * Hyperplane coefficients are derived from a fixed integer LCG and
  * inlined as literals into both the Spark plan and the DuckDB oracle SQL,
  * so bucket assignment is bit-identical in both engines. All dot products
  * are sequential left folds over array<double> (exact float→double
  * widening), identical across partitionings.
  */
object Similarity {

  val Dim = 64
  val NPlanes = 8
  val EmbBands = 2 // 2 bands x 4 sign bits = 16 buckets per band

  /** plane(p)(i) = (((1103515245*(p*Dim+i) + 12345) mod 2001) - 1000) / 1000 */
  val planes: IndexedSeq[IndexedSeq[Double]] =
    (0 until NPlanes).map(p => (0 until Dim).map(i =>
      (((1103515245L * (p * Dim + i) + 12345L) % 2001L) - 1000L) / 1000.0))

  /** (vec_id, e: array<double>, nrm) — shared normalized-view projection. */
  def vectors(emb: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(emb.sparkSession)
    emb.select(col("vec_id"), toDoubleVec(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
  }

  private def bucketVal(band: Int): Column =
    (0 until 4).map { r =>
      val p = band * 4 + r
      when(planeDot(col("e"), planes(p)) >= 0, lit(1 << r)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Adds band0..band{EmbBands-1} sign-bucket columns. */
  def withBuckets(v: DataFrame): DataFrame =
    v.select(col("*") +: (0 until EmbBands).map(b => bucketVal(b).as(s"band$b")): _*)

  private def explodeBands(v: DataFrame): DataFrame =
    v.select(col("vec_id"), col("e"), col("nrm"),
      explode(array((0 until EmbBands).map { b =>
        struct(lit(b).as("band_id"), col(s"band$b").as("band_val"))
      }: _*)).as("band"))
      .select(col("vec_id"), col("e"), col("nrm"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))

  /** IVF coarse quantizer: K deterministic centroids (LCG literals — the
    * stand-in for offline k-means centroids a real deployment would fit
    * and broadcast). centroid(c)(i) uses the same generator family as the
    * LSH planes with an offset so the two codebooks differ.
    */
  val NCentroids = 16
  val centroids: IndexedSeq[IndexedSeq[Double]] =
    (0 until NCentroids).map(c => (0 until Dim).map(i =>
      (((1103515245L * ((c + 100) * Dim + i) + 12345L) % 2001L) - 1000L) / 1000.0))

  private def centroidNorm(c: Int): Double =
    math.sqrt(centroids(c).map(x => x * x).sum)

  /** Array of cosine similarities to each centroid (fold order fixed);
    * shared with SimilarityStream so stream and batch bucket identically.
    */
  private[graft] def centroidCos: Column =
    array((0 until NCentroids).map { c =>
      planeDot(col("e"), centroids(c)) / (col("nrm") * lit(centroidNorm(c)))
    }: _*)

  /** IVF-bucketed ANN: corpus vectors live in their nearest-centroid
    * bucket (argmax cosine, first-index tie-break); each query probes its
    * top-`probes` centroid buckets and reranks candidates exactly. The
    * candidate set is bounded by the probed buckets' population — the
    * 100-TB path when sign-LSH recall is too blunt.
    */
  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int = 10, probes: Int = 2): DataFrame = {
    val v = vectors(emb)
    val withCos = v.withColumn("cc", centroidCos)
    val corpus = withCos.filter(!isQuery)
      .withColumn("bucket", array_position(col("cc"), array_max(col("cc"))))
      .select(col("vec_id").as("corpus_id"), col("bucket"))
    val sorted = sort_array(col("cc"), asc = false)
    val queries = withCos.filter(isQuery)
      .withColumn("probe_bucket", explode(array(
        (1 to probes).map(p => array_position(col("cc"), element_at(sorted, p))): _*)))
      .select(col("vec_id").as("query_id"), col("probe_bucket").as("bucket"))
    val cand = corpus.join(broadcast(queries), "bucket")
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val vq = v.select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val vc = v.select(col("vec_id").as("corpus_id"), col("e").as("ec"), col("nrm").as("nc"))
    val scored = cand.join(broadcast(vq), "query_id").join(vc, "corpus_id")
      .withColumn("cos", expr("graft_dot(eq, ec)") / (col("nq") * col("nc")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }

  /** Cosine near-dup pairs: banded-LSH candidates, exact cosine verify.
    * The candidate join keys on (band_id, band_val); the quadratic part is
    * confined to per-bucket populations.
    */
  def embeddingPairs(emb: DataFrame, tau: Double = 0.4): DataFrame = {
    val v = vectors(emb)
    val ex = explodeBands(withBuckets(v)).select(col("vec_id"), col("band_id"), col("band_val"))
    val a = ex.alias("a")
    val b = ex.alias("b")
    val cand = a.join(b,
        col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val va = v.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("nrm").as("na"))
    val vb = v.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("nrm").as("nb"))
    cand.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .filter(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Exact cosine top-k: broadcast the (small) query set against the
    * corpus — one narrow pass over the corpus, then a per-query window
    * top-k (single shuffle on query_id).
    */
  def bruteForceTopK(emb: DataFrame, isQuery: Column, k: Int = 10): DataFrame = {
    val v = vectors(emb)
    val q = v.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val c = v.filter(!isQuery)
      .select(col("vec_id").as("corpus_id"), col("e").as("ec"), col("nrm").as("nc"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", expr("graft_dot(eq, ec)") / (col("nq") * col("nc")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }

  /** LSH-bucketed ANN: queries and corpus hash into the same sign buckets;
    * only same-bucket candidates are scored and ranked. Recall vs the
    * brute-force baseline is asserted in the spec.
    */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int = 10): DataFrame = {
    val bk = withBuckets(vectors(emb))
    val q = explodeBands(bk.filter(isQuery))
      .select(col("vec_id").as("query_id"), col("band_id"), col("band_val"))
    val c = explodeBands(bk.filter(!isQuery))
      .select(col("vec_id").as("corpus_id"), col("band_id"), col("band_val"))
    val cand = c.join(broadcast(q), Seq("band_id", "band_val"))
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val v = vectors(emb)
    val vq = v.select(col("vec_id").as("query_id"), col("e").as("eq"), col("nrm").as("nq"))
    val vc = v.select(col("vec_id").as("corpus_id"), col("e").as("ec"), col("nrm").as("nc"))
    val scored = cand.join(broadcast(vq), "query_id").join(vc, "corpus_id")
      .withColumn("cos", expr("graft_dot(eq, ec)") / (col("nq") * col("nc")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rnk"))
  }
}
