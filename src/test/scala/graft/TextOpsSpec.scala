package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextOps}
import graft.sources.Tables

class TextOpsSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("quality ratios are bounded and the score is their fixed-weight sum") {
    val q = TextOps.quality(docs).cache()
    for (c <- Seq("uniq_ratio", "stop_ratio", "alpha_ratio"))
      assert(q.filter(col(c) < 0 || col(c) > 1).count() === 0, c)
    val bad = q.filter(
      abs(col("quality") -
        (lit(0.3) * col("uniq_ratio") + lit(0.3) * col("stop_ratio")
          + lit(0.4) * col("alpha_ratio"))) > 1e-12)
    assert(bad.count() === 0)
    q.unpersist()
  }

  test("token counts: regex tokens match whitespace tokens on space-only text") {
    val t = TextOps.tokens(docs).cache()
    // test corpus is [a-z ]-only, so the BPE-ish regex degenerates to words
    assert(t.filter(col("n_re_tokens") =!= col("n_ws_tokens")).count() === 0)
    assert(t.filter(col("chars_per_token") <= 0).count() === 0)
    t.unpersist()
  }

  test("lang id predicts a language from the configured set for every doc") {
    val langs = TextOps.stopwords.map(_._1)
    val out = TextOps.langId(docs).cache()
    assert(out.filter(!col("pred_lang").isInCollection(langs)).count() === 0)
    assert(out.count() === docs.count())
    out.unpersist()
  }

  test("fingerprint is deterministic and min-gram-hash bounded by the full-hash domain") {
    val f1 = TextOps.fingerprint(docs)
    val f2 = TextOps.fingerprint(docs)
    assert(f1.except(f2).count() === 0)
    assert(f1.filter(col("min_gram_hash") < 0).count() === 0)
  }

  test("multimodal decode stub: mapPartitions features agree with the column-level meta") {
    val meta = Multimodal.meta(docs)
      .select("doc_id", "checksum", "size_bytes", "width", "height")
    val decoded = Multimodal.decodeFeatures(spark, Multimodal.asBlobs(docs), batchSize = 7)
      .toDF().select("doc_id", "checksum", "size_bytes", "width", "height")
    assert(meta.except(decoded).count() === 0)
    assert(decoded.except(meta).count() === 0)
  }

  test("approximate aggregates stay within their error bounds vs exact") {
    val events = Tables.load(spark, sf, "events")
    val approx = graft.queries.AnalyticsQueries.queries("events_approx")(spark, sf)
      .select("event_type", "approx_users")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type")
    val bad = joined.filter(
      abs(col("approx_users") - col("exact_users")) > col("exact_users") * 0.1 + 1)
    assert(bad.count() === 0, "HLL++ rsd=0.02 should stay well within 10%")
  }

  test("multimodal features are 8-dim and normalized to [0,1]") {
    val d = Multimodal.decodeFeatures(spark, Multimodal.asBlobs(docs)).cache()
    assert(d.filter(size(col("feature")) =!= 8).count() === 0)
    assert(d.filter(exists(col("feature"), f => f < 0.0f || f > 1.0f)).count() === 0)
    d.unpersist()
  }
}
