package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeImpl
import graft.operators.Bpe

/** Corpus-fitted BPE tokenizer invariants (operators/Bpe.scala,
  * functions/BpeNative.scala).
  */
class BpeSpec extends SparkSpec {

  test("merge pass is greedy left-to-right without overlap (the Sennrich scan)") {
    def m(word: String, a: String, b: String): Seq[String] =
      BpeImpl.mergePassStr(word.map(_.toString).toArray, a, b).toSeq
    assert(m("aaa", "a", "a") === Seq("aa", "a"))
    assert(m("aaaa", "a", "a") === Seq("aa", "aa"))
    assert(m("abab", "a", "b") === Seq("ab", "ab"))
    assert(m("aab", "a", "b") === Seq("a", "ab"))
    assert(m("aba", "a", "b") === Seq("ab", "a"))
    assert(m("xyz", "a", "b") === Seq("x", "y", "z"))
    // a symbol merged this pass is consumed — it can't re-match as `a`
    assert(BpeImpl.mergePassStr(Array("x", "x", "x"), "x", "x").toSeq === Seq("xx", "x"))
  }

  test("fit learns the hand-computable merge sequence on a tiny corpus and " +
      "stops when pairs run out") {
    import spark.implicits._
    // words: aa ×3, ab ×1, b ×1 → round 1 argmax (a,a,3); round 2 (a,b,1);
    // round 3 finds no adjacent pairs anywhere → fit stops at 2 merges
    val docs = Seq((1L, "aa aa ab"), (2L, "aa b")).toDF("doc_id", "text")
    val merges = Bpe.fit(docs, vocabSize = 10, rounds = 16)
    assert(merges === Seq((1, "a", "a", 3L), (2, "a", "b", 1L)))
  }

  test("score face: token counts under fitted merges are exact per word") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab b aaa"), (2L, "   ")).toDF("doc_id", "text")
    val out = Bpe.tokenCounts(docs, Seq(("a", "a"), ("a", "b"))).collect()
    // doc 2 has zero nonempty words and is dropped (oracle join parity)
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L)
    // aa→[aa]=1, ab→[ab]=1, b→[b]=1, aaa→[aa,a]=2 ⇒ 4 words, 5 tokens
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 5L)
  }

  test("corpus fit/score sanity: merges strictly compress, token counts are " +
      "bounded by chars below and words above, and the fit is deterministic") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val merges = Bpe.fit(docs)
    assert(merges.nonEmpty && merges.size <= Bpe.MergeRounds)
    // pair counts are non-increasing in rank ties aside — each round's
    // argmax can only see counts the previous round's merge left behind
    assert(merges === Bpe.fit(docs), "fit must be deterministic")
    val scored = Bpe.tokenCounts(docs, merges.map(m => (m._2, m._3)))
      .join(Bpe.tokenCounts(docs, Seq.empty)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_chars")), "doc_id")
      .cache()
    assert(scored.filter(col("n_bpe_tokens") > col("n_chars")).count() === 0,
      "merges can never increase the token count")
    assert(scored.filter(col("n_bpe_tokens") < col("n_words")).count() === 0,
      "a word is at least one token")
    assert(scored.filter(col("n_bpe_tokens") === col("n_chars")).count() < scored.count(),
      "16 corpus-fitted merges must compress SOMETHING")
    scored.unpersist()
  }

  test("driver-local merge recurrence == the distributed per-round loop " +
      "(the r12 rounds-ceiling lift changes WHERE the argmax runs, never " +
      "its bits), and 64 rounds are the default") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    // 16 rounds keeps the distributed witness cheap; equality per round
    // covers the induction — identical pair counts, identical tie-break,
    // identical merge pass
    val local = Bpe.fit(docs, rounds = 16)
    val dist = Bpe.fitDistributed(docs, rounds = 16)
    assert(local === dist,
      "fitLocal must reproduce the distributed per-round argmax bit-for-bit")
    assert(Bpe.MergeRounds === 64)
    val m64 = Bpe.fit(docs)
    assert(m64.size > 16 && m64.size <= 64,
      s"the corpus supports more than 16 merges; got ${m64.size}")
    assert(m64.take(16) === local,
      "a longer fit must extend, never alter, the shorter one's prefix")
  }

  test("hostile symbols: backslash words survive the fit (typed literals, " +
      "not SQL interpolation) and US/RS in a document act as separators") {
    import spark.implicits._
    // words contain backslashes: the round-1 argmax is ('\', '\') —
    // interpolating that into a SQL literal would corrupt the merge pair
    // or fail to parse (r11 ADVICE); call_function must pass it through
    val bs = Seq((1L, "a\\\\b a\\\\b"), (2L, "a\\\\b")).toDF("doc_id", "text")
    val m1 = Bpe.fit(bs, vocabSize = 10, rounds = 2)
    assert(m1.head._2 == "\\" && m1.head._3 == "\\",
      s"backslash pair must fit cleanly: $m1")
    assert(Bpe.tokenCounts(bs, m1.map(m => (m._2, m._3)))
      .filter(col("doc_id") === 1L).head().getLong(2) ===
      2L * ("a\\\\b".length - m1.size),
      "each fitted merge shortens each backslash word by one symbol")

    // US/RS inside a document are SEPARATORS (the split-class guarantee):
    // they can never land inside a symbol, the fit sees the same words as
    // a space-separated twin, and the segment artifact stays exact
    val hostile = Seq((1L, "aa\u001faa\u001eab b"), (2L, "aa aa ab b"))
      .toDF("doc_id", "text")
    val merges = Bpe.fit(hostile, vocabSize = 10, rounds = 16)
    assert(merges.head._2 == "a" && merges.head._3 == "a" && merges.head._4 == 4L,
      s"US/RS must split words exactly like whitespace: $merges")
    val seg = Bpe.segmentDocs(hostile, merges.map(m => (m._2, m._3))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(seg(1L) === seg(2L),
      "the US/RS document must segment identically to its space-separated twin")
  }

  test("segments face: hand segmentation exact, separators strip back to the " +
      "normalized text, and the string-derived count equals the score face " +
      "on the whole corpus") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab b aaa"), (2L, "   ")).toDF("doc_id", "text")
    val out = Bpe.segmentDocs(docs, Seq(("a", "a"), ("a", "b"))).collect()
    assert(out.length === 1) // the all-whitespace doc drops (score-face parity)
    // aa->[aa], ab->[ab], b->[b], aaa->[aa,a]: words RS-joined, symbols US-joined
    assert(out.head.getString(2) === "aa\u001eab\u001eb\u001eaa\u001fa")
    assert(out.head.getLong(1) === 5L)

    val corpus = graft.sources.Tables.load(spark, sf, "documents")
    val seg = Bpe.fitAndSegment(corpus).cache()
    // loss-free: stripping both separators reconstructs the normalized text
    val recon = seg.join(corpus, "doc_id")
      .withColumn("stripped",
        regexp_replace(regexp_replace(col("segments"), "\u001f", ""), "\u001e", " "))
      .withColumn("norm",
        regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    assert(recon.filter(col("stripped") =!= col("norm")).count() === 0,
      "segmentation must be loss-free over the corpus")
    // the artifact and the bill can never disagree
    val counts = Bpe.fitAndScore(corpus)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_score"))
    assert(seg.join(counts, "doc_id")
      .filter(col("n_bpe_tokens") =!= col("n_score")).count() === 0)
    assert(seg.count() === counts.count())
    seg.unpersist()
  }
}
