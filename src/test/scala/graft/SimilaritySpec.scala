package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {

  private def emb = Tables.load(spark, sf, "embeddings")
  private val isQuery = col("vec_id") < 8

  test("brute-force top-k returns exactly k ranked neighbors per query, cosine in [-1,1]") {
    val out = Similarity.bruteForceTopK(emb, isQuery, k = 10).cache()
    val perQuery = out.groupBy("query_id").count()
    assert(perQuery.filter(col("count") =!= 10).count() === 0)
    assert(out.filter(col("cos") < -1.0 || col("cos") > 1.0).count() === 0)
    assert(out.filter(col("query_id") === col("corpus_id")).count() === 0)
    out.unpersist()
  }

  test("LSH top-k scores candidates identically to brute force (only recall differs)") {
    val bf = Similarity.bruteForceTopK(emb, isQuery, k = 1000)
      .select(col("query_id"), col("corpus_id"), col("cos"))
    val lsh = Similarity.lshTopK(emb, isQuery, k = 10)
      .select(col("query_id"), col("corpus_id"), col("cos"))
    // every LSH hit exists in the exhaustive scoring with the same cosine
    assert(lsh.except(bf).count() === 0)
  }

  test("LSH top-10 recall vs brute-force top-10 is nontrivial and reported") {
    val bf = Similarity.bruteForceTopK(emb, isQuery, k = 10)
      .select(col("query_id"), col("corpus_id")).cache()
    val lsh = Similarity.lshTopK(emb, isQuery, k = 10)
      .select(col("query_id"), col("corpus_id")).cache()
    val hit = lsh.intersect(bf).count().toDouble
    val recall = hit / bf.count()
    info(f"sign-LSH (2 bands x 4 bits) top-10 recall vs brute force: $recall%.2f")
    assert(recall > 0.05) // random-vector corpus: buckets are near-uniform
    bf.unpersist(); lsh.unpersist()
  }

  test("IVF top-k hits score identically to brute force; recall reported") {
    val bf = Similarity.bruteForceTopK(emb, isQuery, k = 1000)
      .select(col("query_id"), col("corpus_id"), col("cos"))
    val ivf = Similarity.ivfTopK(emb, isQuery, k = 10)
      .select(col("query_id"), col("corpus_id"), col("cos")).cache()
    assert(ivf.except(bf).count() === 0)
    val bf10 = Similarity.bruteForceTopK(emb, isQuery, k = 10)
      .select(col("query_id"), col("corpus_id")).cache()
    val recall = ivf.select("query_id", "corpus_id").intersect(bf10).count().toDouble / bf10.count()
    info(f"IVF (16 centroids, 2 probes) top-10 recall vs brute force: $recall%.2f")
    assert(recall > 0.05)
    bf10.unpersist(); ivf.unpersist()
  }

  test("embedding near-dup pairs verify exact cosine above threshold, canonical order") {
    val p = Similarity.embeddingPairs(emb, tau = 0.4).cache()
    assert(p.filter(col("vec_a") >= col("vec_b")).count() === 0)
    assert(p.filter(col("cos") < 0.4).count() === 0)
    p.unpersist()
  }
}
