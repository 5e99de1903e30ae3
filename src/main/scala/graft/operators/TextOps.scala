package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators (SURVEY.md §2c): language ID, quality scoring,
  * token counting, fingerprinting. All are narrow per-row projections —
  * zero shuffle, linear scale — built from codegen'd built-ins and HOFs.
  */
object TextOps {

  /** Per-language stopword lists (canonical table in TextFunctions so the
    * fused LangScores expression shares it).
    */
  val stopwords: Seq[(String, Seq[String])] = langStopwords

  /** Greedy argmax over per-language stopword hit counts; ties resolve in
    * list order (en > es > de > fr > zh), mirrored by the oracle's CASE
    * chain. Scores come from the fused native expression — one tokenize
    * pass for all languages instead of 5 interpreted HOF filters.
    */
  def langId(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    val scored = docs
      .select(col("doc_id"), col("lang"), expr("graft_lang_scores(text)").as("scores"))
      .select(
        col("doc_id") +: col("lang") +:
          stopwords.zipWithIndex.map { case ((l, _), i) =>
            element_at(col("scores"), i + 1).as(s"s_$l")
          }: _*)
    val langs = stopwords.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), els) =>
      val ge = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
      .select(col("doc_id") +: col("lang") +: col("pred_lang") +:
        langs.map(l => col(s"s_$l")): _*)
  }

  /** Length/uniqueness/stopword/alpha ratios and a fixed-weight quality
    * score. Pure per-row arithmetic in a fixed operation order so the
    * doubles are bit-identical to the oracle.
    */
  def quality(docs: DataFrame): DataFrame =
    qualityCols(docs)
      .select("doc_id", "n_chars", "n_words", "n_uniq", "avg_word_len",
        "uniq_ratio", "stop_ratio", "alpha_ratio", "quality")

  /** [[quality]]'s column set APPENDED to the input (text and any other
    * columns ride along) — the form streaming pipelines need, since a
    * stream can't self-join the metrics back onto the text.
    */
  def qualityCols(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    // NOTE (r17, measured): spreadScan here was tried and REVERTED —
    // the text-stats kernel is light (~0.2 s single-core at sf0.1) and
    // quality consumers aggregate immediately, so the repair exchange
    // cost more than the parallelism bought (+0.18..0.55 s on the
    // quality-family rows).
    docs
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("st", expr("graft_text_stats(text)"))
      .withColumn("n_words", element_at(col("st"), 1))
      .withColumn("n_uniq", element_at(col("st"), 2))
      .withColumn("word_chars", element_at(col("st"), 3))
      .withColumn("stop_hits", element_at(col("st"), 4))
      .withColumn("alpha_chars", element_at(col("st"), 5))
      .withColumn("avg_word_len", col("word_chars").cast("double") / col("n_words"))
      .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_words"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_words"))
      .withColumn("alpha_ratio", col("alpha_chars").cast("double") / col("n_chars"))
      .withColumn("quality",
        lit(0.3) * col("uniq_ratio") + lit(0.3) * col("stop_ratio") + lit(0.4) * col("alpha_ratio"))
      .drop("st")
  }

  /** The first two stages of [[cleanCorpus]] — quality filter, then exact
    * dedup keeping the min-id copy — exposed because the streaming twin
    * ([[graft.streaming.DedupStream.cleanIngestStream]]) probes exactly
    * this survivor set as its static near-dup index.
    */
  def qualityExactSurvivors(docs: DataFrame, minQuality: Double = 0.48): DataFrame = {
    val q = quality(docs).filter(col("quality") >= minQuality)
      .select("doc_id", "quality")
    val survivors = docs.join(q, "doc_id")
    val keepers = Dedup.exact(survivors).select(col("keeper_id").as("doc_id"))
    survivors.join(keepers, "doc_id")
  }

  /** The end-to-end corpus-cleaning pipeline, composed as ONE declarative
    * plan (Catalyst sees everything): quality-filter → exact dedup (keep
    * the min-id copy) → near-dup removal (drop the higher-id doc of every
    * Jaccard ≥ tau pair). The shape every training-data prep run takes;
    * each stage is the operator verified on its own above.
    *
    * The near-dup stage is PLUGGABLE (round-3 VERDICT #2): the default is
    * the exact full-inverted-index join — the oracle-replayable baseline,
    * whose candidate count SURVEY §5 measured growing 98× for 10× docs —
    * but the 100-TB run should pass the banded MinHash stage
    * ([[cleanCorpusMinhash]]) or `Dedup.ngramJaccardPrefixPairs`, whose
    * candidate volume is capped by banding / the lossless prefix filter.
    */
  def cleanCorpus(docs: DataFrame, minQuality: Double = 0.48, tau: Double = 0.5,
                  nearDupPairs: (DataFrame, Double) => DataFrame =
                    Dedup.ngramJaccardPairs(_, _)): DataFrame = {
    val afterExact = qualityExactSurvivors(docs, minQuality)
    val nearDupLosers = nearDupPairs(afterExact, tau)
      .select(col("doc_b").as("doc_id")).distinct()
    afterExact.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select("doc_id", "quality")
  }

  /** [[cleanCorpus]] with the TRANSITIVELY-correct near-dup stage: keep
    * exactly one doc per connected component of the MinHash near-dup
    * graph ([[Dedup.components]]) instead of dropping every pair's
    * higher id. The pairwise rule can keep TWO docs of one near-dup
    * cluster (a~c, b~c with a≁b keeps both a and b); the component rule
    * keeps only the cluster minimum. Component keepers never appear as
    * a pair's doc_b, so CC survivors ⊆ pairwise survivors (spec).
    */
  def cleanCorpusComponents(docs: DataFrame, minQuality: Double = 0.48,
                            tau: Double = 0.5,
                            kEst: Int = Dedup.MinhashK): DataFrame = {
    // the quality+exact-dedup subtree feeds BOTH the pair stage inside
    // components (whose label loop materializes it eagerly, per round
    // without the cache — round-7 VERDICT #6) and the final keeper join:
    // persist it across the whole computation, checkpoint the (tiny,
    // survivors-only) result eagerly, then free the cache.
    val afterExact = qualityExactSurvivors(docs, minQuality).persist()
    try {
      val comp = Dedup.components(afterExact, tau, kEst = kEst)
      afterExact.join(comp, "doc_id")
        .filter(col("component_id") === col("doc_id"))
        .select("doc_id", "quality")
        .localCheckpoint(true)
    } finally afterExact.unpersist()
  }

  /** [[cleanCorpus]] riding the scale-safe banded-MinHash near-dup stage —
    * the default 100-TB form: candidate pairs come from 4×4 MinHash band
    * buckets (high-cardinality keys, quadratic work confined to tiny
    * buckets) instead of the full inverted-index self-join, with the same
    * exact-Jaccard verification on candidates. Detection is the LSH
    * recall of dedup_minhash (total on this corpus's J≥0.99 planted dups,
    * DedupSpec); gate-checked against its own DuckDB oracle.
    */
  def cleanCorpusMinhash(docs: DataFrame, minQuality: Double = 0.48,
                         tau: Double = 0.5,
                         kEst: Int = Dedup.MinhashK): DataFrame =
    cleanCorpus(docs, minQuality, tau, Dedup.minhashPairs(_, _, 4, kEst))

  /** BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
    * Documented contract of the fused re_tokens count in [[graft.functions.TextStats]].
    */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Both token counts come from the single-pass TextStats kernel (round 1
    * ran two full regexp_extract_all passes here — 11× the fused cost).
    */
  def tokens(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs
      .withColumn("st", expr("graft_text_stats(text)"))
      .withColumn("n_ws_tokens", element_at(col("st"), 1))
      .withColumn("n_re_tokens", element_at(col("st"), 6))
      .withColumn("n_chars", length(col("text")).cast("long"))
      // null, not a division: empty/whitespace-only text has zero tokens,
      // and the engines disagree on double x/0 (IEEE inf vs error)
      .withColumn("chars_per_token",
        when(col("n_re_tokens") > 0,
          col("n_chars").cast("double") / col("n_re_tokens")))
      .select("doc_id", "n_ws_tokens", "n_re_tokens", "n_chars", "chars_per_token")
  }

  /** Gopher-style intra-document repetition signals (Rae et al. 2021
    * §A1.1 analogues): duplicate word / 2-gram / 3-gram fractions and the
    * most-frequent-token share, plus the `kept` verdict of the repetition
    * filter. One fused kernel pass per row (graft_rep_stats — the HOF
    * n-gram formulation would be re-evaluated per element_at reference),
    * zero shuffles: the filter is embarrassingly parallel and runs at
    * scan speed, which is what makes it a first-pass gate at 100 TB.
    * Ratios are double divisions of exact integer pairs in a fixed
    * operation order — bit-identical to the DuckDB oracle.
    */
  def repetition(docs: DataFrame, dup2Max: Double, topTokMax: Double): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs
      .withColumn("rs", expr("graft_rep_stats(text)"))
      .withColumn("n_tokens", element_at(col("rs"), 1))
      .withColumn("uniq1", element_at(col("rs"), 2))
      .withColumn("uniq2", element_at(col("rs"), 3))
      .withColumn("uniq3", element_at(col("rs"), 4))
      .withColumn("max_cnt", element_at(col("rs"), 5))
      .withColumn("dup_word_frac",
        (col("n_tokens") - col("uniq1")).cast("double") / col("n_tokens"))
      // null, not a division, below the n-gram arity (engines disagree on
      // double x/0) — mirrored as CASE WHEN in the oracle
      .withColumn("dup_2gram_frac",
        when(col("n_tokens") >= 2,
          (col("n_tokens") - 1 - col("uniq2")).cast("double") / (col("n_tokens") - 1)))
      .withColumn("dup_3gram_frac",
        when(col("n_tokens") >= 3,
          (col("n_tokens") - 2 - col("uniq3")).cast("double") / (col("n_tokens") - 2)))
      .withColumn("top_token_frac", col("max_cnt").cast("double") / col("n_tokens"))
      .withColumn("kept",
        col("n_tokens") >= 2 && col("dup_2gram_frac") <= dup2Max &&
          col("top_token_frac") <= topTokMax)
      .select("doc_id", "n_tokens", "dup_word_frac", "dup_2gram_frac",
        "dup_3gram_frac", "top_token_frac", "kept")
  }

  /** Corpus-level token frequency top-k — the vocabulary report feeding
    * mixture/contamination analysis. Map-side partial aggregation means
    * the shuffle carries at most |vocab| rows per task, and the global
    * top-k is a TakeOrdered (no full sort materialization) — at 100 TB
    * the cost is one scan + a vocabulary-sized exchange. Ties break by
    * token text so the result is deterministic in both engines.
    */
  def tokenTopK(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      .select(explode(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)

  /** Cross-source MIRROR detection — which hosts republish each other's
    * content (CommonCrawl-style mirror/syndication discovery, the
    * source-level face of near-dup dedup): source pairs ranked by how
    * many RARE shingles they share. "Rare" (source-df ∈ [2, maxSources])
    * is both the signal and the scale bound: a shingle on 2-10 hosts is
    * mirror evidence, a shingle on hundreds is boilerplate — and capping
    * source-df caps the self-join fan-out per shingle at maxSources²/2,
    * so the ubiquitous-boilerplate key that would otherwise quadratically
    * dominate the join is EXCLUDED by the semantics, not salted around.
    *
    * Scale shape: (source, shingle) pairs deduplicate through one hash
    * aggregate (map-side combine); the df filter drops the skew mass;
    * the pair join is shingle-keyed with bounded fan-out; the final
    * aggregate is source-pair-keyed (a bounded domain). Top-k rides a
    * 20-row window.
    */
  def mirrorPairs(docs: DataFrame, maxSources: Int = 10, k: Int = 20): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    // explode_outer + null filter (r17): plain explode lets
    // InferFiltersFromGenerate inline the shingle kernel into a
    // size()>0 filter — two kernel evals per row (the GENERATE
    // landmine, filter form). Row set identical.
    val sh = graft.sources.Tables.spreadScan(docs, "doc_id")
      .select(col("source"), explode_outer(expr("graft_shingle_hashes(text)")).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
    val d = sh.groupBy(col("h")).agg(count(lit(1)).as("nsrc"))
    val keep = sh.join(d.filter(col("nsrc").between(2, maxSources)), "h")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("shared").desc, col("source_a"), col("source_b"))
    keep.as("a").join(keep.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("shared").desc, col("source_a"), col("source_b"))
      .limit(k)
      .select(col("source_a"), col("source_b"), col("shared"),
        row_number().over(w).as("rnk"))
  }

  /** Out-of-vocabulary rate against a corpus-fitted top-V vocabulary —
    * the integer-exact stand-in for the KenLM-perplexity quality filter
    * every public pipeline runs (CCNet §4.2, Gopher, Dolma): a doc whose
    * tokens keep missing the corpus's own frequent vocabulary is
    * boilerplate, code, another language, or noise. A real LM score
    * needs logs (engine-varying floats); the OOV rate ranks similarly at
    * the tails and is exact counts + ONE final IEEE division.
    *
    * Fit/score split (the DSIR/stream_importance shape): the vocabulary
    * is fitted ONCE (map-side-combined token counts → top-V) and is
    * BOUNDED BY CONSTRUCTION at V rows — broadcasting it is free and
    * correct at any corpus size, unlike broadcasting a raw vocabulary.
    * Scoring is a narrow broadcast left-join + one doc_id-keyed
    * aggregate. Deterministic: ties at the V boundary break by token.
    */
  def oovRate(docs: DataFrame, vocabSize: Int = 200): DataFrame = {
    val vocab = tokenTopK(docs, vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    docs.select(col("doc_id"), explode(words(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-document top-k KEYWORDS by TF-IDF — the lexical keyword-
    * extraction card (search indexing, topic labeling, dedup
    * explanations), in FIXED-POINT integer arithmetic: a float
    * ln(N/df) would make the ranking engine- and order-dependent, so
    * idf_fp = (scale·N) div df and score = tf·idf_fp — rank-equivalent
    * to linear TF-IDF, bit-exact everywhere. Bounds: tf ≤ doc tokens
    * (~1e5), idf_fp ≤ scale·N (1e6·1e9 at 100 TB) ⇒ score < 2^60 —
    * no overflow in ANSI mode.
    *
    * Scale shape: tf is a hash agg on (doc_id, token) — skew-free by
    * construction; df re-aggregates tf's output on token with MAP-SIDE
    * combine (a stopword's count partials merge, its rows never pile on
    * one reducer); the tf⋈df join is token-keyed with ONE row per token
    * on the build side — AQE skew-split friendly, NOT broadcast (a
    * 100-TB vocabulary outgrows any broadcast); the per-doc top-k is a
    * rank window whose `rk <= k` filter becomes a PARTIAL map-side
    * WindowGroupLimit. N arrives as a one-row crossJoin, never a
    * driver-side collect.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 5, scale: Long = 1000000L): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val idf = dfreq.crossJoin(n).withColumn("idf_fp", expr(s"($scale * n_docs) DIV df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.join(idf, "token")
      .withColumn("score", col("tf") * col("idf_fp"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rk"))
  }

  /** Zipf profile card — rank × frequency over the top-k vocabulary:
    * Zipf's law predicts rank·count ≈ constant, so the `zipf_product`
    * column reads as a flatness profile (head deviations = stopword
    * saturation, tail deviations = vocabulary truncation) — the
    * one-glance sanity card for a corpus's token distribution before
    * tokenizer decisions. Pure integers (rank from the deterministic
    * (count DESC, token) total order; product is BIGINT), so the card
    * hash-matches under any partitioning. Same plan as [[tokenTopK]]:
    * map-side partial agg → vocabulary-keyed shuffle → top-k; the rank
    * window runs on k rows only.
    */
  def zipfCard(docs: DataFrame, k: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("token"))
    tokenTopK(docs, k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("zipf_product", col("rank") * col("n_occurrences"))
      .select("rank", "token", "n_occurrences", "zipf_product")
  }

  /** Burstiness card — collection frequency vs document frequency over
    * the top-k vocabulary: burstiness = cf/df (mean occurrences per
    * containing doc) separates tokens that are common because MANY docs
    * use them once (cf/df ≈ 1, function words) from tokens a FEW docs
    * repeat heavily (cf/df ≫ 1, boilerplate/template payloads — a
    * dedup-miss signal at the vocabulary level). One explode feeds both
    * counts: cf = count per token, df = distinct docs per token — a
    * single token-keyed aggregate with map-side partials (count +
    * count(distinct doc_id) share the shuffle); top-k by (cf DESC,
    * token). cf and df are exact integers; burstiness is their IEEE
    * quotient, identical in both engines.
    */
  def burstiness(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("cf").desc, col("token"))
      .limit(k)
      .withColumn("burstiness", col("cf").cast("double") / col("df").cast("double"))

  /** Per-language equi-depth quality binning (NTILE deciles) — the
    * mixture-building block between raw scores and top-q cuts: decile 1
    * is each language's best tenth, so downstream sampling can weight by
    * bin instead of re-sorting scores. One shuffle on lang (the window);
    * ties broken by doc_id so bin edges are deterministic in both
    * engines. At 100 TB a stratum outgrowing one partition moves to the
    * sketch path (percentile_approx thresholds, the topq_approx
    * pattern); the exact form is the oracle.
    */
  def qualityDeciles(docs: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"qualityDeciles: bins must be >= 2, got $bins")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    qualityCols(docs)
      .select(col("doc_id"), col("lang"), col("quality"))
      .withColumn("decile", ntile(bins).over(w).cast("long"))
  }

  /** Corpus-level n-gram frequency top-k (default bigrams) — the phrase
    * report behind contamination triage and boilerplate detection.
    * Grams are built declaratively with `lead` over (doc, position) — no
    * UDF, no interpreted HOF array: posexplode keeps scan order, ONE
    * shuffle on doc_id for the window, then the vocabulary-sized
    * aggregate and a TakeOrdered. (A RepStats-style fused kernel
    * emitting grams directly would drop the first shuffle at the cost
    * of a per-n expression — the declarative form wins until profiling
    * says otherwise.) Ties break by gram text, deterministic in both
    * engines.
    */
  def ngramTopK(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 2 && n <= 4, s"ngramTopK: n must be in [2,4], got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs.select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+")))
      .toDF("doc_id", "pos", "tok")
    val withNext = (1 until n).foldLeft(toks)((df, i) =>
      df.withColumn(s"t$i", lead(col("tok"), i).over(w)))
    withNext
      .filter((1 until n).map(i => col(s"t$i").isNotNull).reduce(_ && _))
      .select(concat_ws(" ", col("tok") +: (1 until n).map(i => col(s"t$i")): _*).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)
  }

  /** Association-lift card — PMI's division-friendly sibling over
    * adjacent word pairs: lift(a,b) = P(ab)/(P(a)·P(b)) =
    * n_ab·T / (n_a·n_b), top-k by lift at a minimum pair support (the
    * collocation-mining number: lift ≫ 1 = a genuine collocation,
    * ≈ 1 = independence — what raw bigram counts can't distinguish
    * because frequent-word pairs dominate them).
    *
    * Engine-exactness: counts are BIGINT; the lift is ONE fixed shape
    * of IEEE ops — (n_ab·T as doubles) / (n_a·n_b as doubles) — so both
    * engines compute bit-identical doubles (multiplying the BIGINTs
    * first would overflow at corpus scale; the double products round
    * identically in both engines). Ties broken by (a, b).
    *
    * Scale shape: same per-doc lead window as [[ngramTopK]] (ONE doc_id
    * exchange), then vocabulary-keyed hash aggregates with map-side
    * combine; the support filter runs BEFORE the unigram enrich joins,
    * and the totals row broadcasts.
    */
  def liftTopK(docs: DataFrame, k: Int = 20, minSupport: Long = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs.select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+")))
      .toDF("doc_id", "pos", "tok")
    val pairCounts = toks.withColumn("nb", lead(col("tok"), 1).over(w))
      .filter(col("nb").isNotNull)
      .groupBy(col("tok").as("a"), col("nb").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val totals = pairCounts.agg(sum(col("n_ab")).as("t"))
    pairCounts.filter(col("n_ab") >= minSupport)
      .join(uni.select(col("tok").as("a"), col("n").as("n_a")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        (col("n_ab").cast("double") * col("t").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select("a", "b", "n_ab", "n_a", "n_b", "lift")
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Token-budget packing: assign each document to a training pack of
    * ≤ `budget` tokens (first-fit in doc_id order; a doc whose exclusive
    * running total crosses a pack boundary starts the next pack, so a
    * pack can overflow by at most one document — the standard streaming
    * approximation). Packing is per-SHARD: the cumulative sum runs inside
    * `doc_id % shards`, so the sort is shard-local and shards are the
    * parallelism unit — at 100 TB shard by input split and the window
    * never sees more than one shard's documents. All-integer arithmetic
    * (token counts from the fused TextStats kernel), bit-identical to the
    * oracle.
    */
  def tokenPack(docs: DataFrame, budget: Long = 2048, shards: Int = 8): DataFrame =
    packAssign(docs, budget, shards)
      .select("doc_id", "shard", "pack_id", "n_tokens", "cum")

  /** The pack-assignment plan with every input column retained — shared
    * by [[tokenPack]] (the narrow assignment view) and [[concatPacks]]
    * (which needs the text to ride the same single shard shuffle).
    */
  private def packAssign(docs: DataFrame, budget: Long, shards: Int): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("n_tokens", element_at(expr("graft_text_stats(text)"), 6))
      .withColumn("shard", pmod(col("doc_id"), lit(shards)).cast("int"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) DIV $budget"))
  }

  /** Materialize [[tokenPack]]'s assignment into the actual training
    * sequences: each pack's documents concatenated in doc_id order with
    * an EOS separator — the step that turns a pack PLAN into model input.
    *
    * The text rides THROUGH the assignment window (no join back to the
    * corpus — the first form paid two extra doc_id shuffles for it), and
    * the groupBy's clustering on (shard, pack_id) is satisfied by the
    * window's hash partitioning on shard alone — so the whole operator is
    * ONE Exchange (plan-pinned in PlanSpec). The in-pack sort is
    * `array_sort(collect_list(struct(doc_id, text)))`, deterministic
    * because doc_id is unique, and safe because a pack's payload is
    * bounded by the token budget BY CONSTRUCTION (never a skew risk —
    * the one case where collect_list at scale is fine). Oracle replays
    * it as `string_agg(... ORDER BY doc_id)`.
    */
  def concatPacks(docs: DataFrame, budget: Long = 2048, shards: Int = 8,
                  sep: String = "<|eos|>"): DataFrame =
    packAssign(docs, budget, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          sep).as("pack_text"))
      .withColumn("pack_chars", length(col("pack_text")).cast("long"))

  /** Benchmark decontamination: flag corpus documents sharing ≥ `minShared`
    * distinct 3-gram shingles with the evaluation set — the standard
    * train/eval n-gram overlap check. The benchmark's distinct shingle set
    * is broadcast (eval sets are small by definition); the corpus side is
    * one narrow explode + broadcast semi-join + per-doc count, so cost is
    * linear in corpus shingles and never pairs documents.
    */
  def decontaminate(docs: DataFrame, isBench: Column, minShared: Long = 2): DataFrame = {
    // spread=false (r17, measured): this consumer's corpus pass is one
    // light explode + broadcast semi-join — the parallelism repair's
    // exchange cost more than it bought here (+0.32 s at sf0.1)
    val hashes = Dedup.shingleHashes(docs, spread = false)
    val benchSh = hashes.filter(isBench)
      .select(explode_outer(col("hs")).as("h")).filter(col("h").isNotNull)
      .distinct()
      .withColumn("hit", lit(1))
    // ONE corpus pass: explode_outer keeps sub-3-word docs (n_sh = 0),
    // the left join marks benchmark shingles, and since hs is a distinct
    // set, count(h) IS n_sh — no second scan to recover per-doc counts
    hashes.filter(!isBench)
      .select(col("doc_id"), explode_outer(col("hs")).as("h"))
      .join(broadcast(benchSh), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(col("h")).as("n_sh"), count(col("hit")).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minShared)
  }

  /** Benchmark decontamination at SPAN granularity — the production form
    * of [[decontaminate]]: a hit is an n-word CONTIGUOUS span shared with
    * the evaluation set (default 8 words), not a single 3-gram shingle.
    * An 8-word verbatim span is strong evidence of leakage where one
    * 3-gram is a common phrase; one shared span suffices (minShared = 1).
    * Same scale shape: benchmark span set broadcast, corpus side one
    * narrow explode + semi-join + per-doc count — linear, never pairs
    * documents.
    */
  def decontaminateSpans(docs: DataFrame, isBench: Column, span: Int = 8,
                         minShared: Long = 1): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    val hashes = graft.sources.Tables.spreadScan(docs, "doc_id")
      .select(col("doc_id"),
        expr(s"graft_span_hashes(text, $span)").as("hs"))
      .withColumn("n_spans", size(col("hs")).cast("long"))
    val benchSp = hashes.filter(isBench)
      .select(explode_outer(col("hs")).as("h")).filter(col("h").isNotNull)
      .distinct()
      .withColumn("hit", lit(1))
    hashes.filter(!isBench)
      .select(col("doc_id"), explode_outer(col("hs")).as("h"))
      .join(broadcast(benchSp), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(col("h")).as("n_spans"), count(col("hit")).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minShared)
  }

  /** Corpus-level repeated-substring signal (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499,
    * §4 ExactSubstr): for each doc, the share of its DISTINCT
    * `span`-word windows that also occur in at least one OTHER
    * document. High dup_frac flags boilerplate and template families
    * that pairwise near-dup thresholds miss; within-doc repetition is
    * deliberately NOT counted (that is `text_repetition`'s signal) —
    * span hash lists are distinct per doc, so a span's occurrence
    * count IS its document frequency.
    *
    * Scale shape: spans are 8-byte hashes, never text — the df
    * aggregate and the flag-back join both shuffle on the hash. The df
    * side is deliberately a HASH aggregate, not a window over h:
    * boilerplate spans are precisely the high-df skew case, and
    * partial map-side combine collapses a span occurring in millions
    * of docs to one row per map task where a window would buffer the
    * whole partition (plan-asserted in TextOpsSpec). The join's build
    * side holds only the REPEATED vocabulary (df >= 2); the per-doc
    * count then shuffles doc_id+counts only. Nothing is ever pairwise.
    * dup_frac is exact-integer division in IEEE doubles, identical in
    * both engines.
    */
  def spanDupes(docs: DataFrame, span: Int = 8): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    val hashes = graft.sources.Tables.spreadScan(docs, "doc_id")
      .select(col("doc_id"),
        expr(s"graft_span_hashes(text, $span)").as("hs"))
    // explode_outer + null filter (r17): see mirrorPairs — stops the
    // span-hash kernel from re-evaluating inside an inferred filter
    val occ = hashes
      .select(col("doc_id"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val repeated = occ.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("h")
    val dup = occ.join(repeated, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
    hashes.select(col("doc_id"), size(col("hs")).cast("long").as("n_spans"))
      .join(dup, Seq("doc_id"), "left")
      .withColumn("dup_spans", coalesce(col("dup_spans"), lit(0L)))
      .withColumn("dup_frac",
        when(col("n_spans") > 0,
          col("dup_spans").cast("double") / col("n_spans")))
  }

  /** ExactSubstr span REMOVAL — the rewrite stage [[spanDupes]] is the
    * audit card for (Lee et al., arXiv:2107.06499 §4: dropping duplicated
    * substrings beats dropping whole documents). Every word covered by an
    * n-word span whose hash occurs in ≥ 2 documents is removed; the doc
    * is rebuilt from the surviving tokens of its canonical form
    * (trim/lower/single-space — the token stream span hashes are defined
    * over, so the mask can never desynchronize from the hashes).
    *
    * Scale shape: the df aggregate and dup-vocabulary join are EXACTLY
    * [[spanDupes]]' plan (8-byte hashes, hash agg with map-side combine —
    * boilerplate spans are the high-df skew case and collapse per map
    * task). The only additions are a per-doc collect_list of that doc's
    * repeated hashes — bounded by the doc's own distinct span count, a
    * per-doc quantity, never corpus-scale — and ONE linear codegen'd
    * kernel call (graft_span_remove) doing the positional re-hash + mask
    * + rebuild, so the rewrite itself is scan-speed and shuffle-free.
    * Docs with no repeated span skip the join entirely (left join against
    * the dup side, empty-array fallback).
    */
  def spanDedup(docs: DataFrame, span: Int = 8): DataFrame =
    spanDedupWithVocab(docs, spanVocab(docs, span), span)

  /** The dup-span VOCABULARY (span hashes with corpus df ≥ 2) — the
    * offline fit of the removal: [[spanDedup]] derives it from the same
    * corpus it rewrites; a streaming deployment materializes it bucketed
    * by `h` and probes it per trigger ([[graft.streaming.SpanStream]]).
    */
  def spanVocab(docs: DataFrame, span: Int = 8): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.select(col("doc_id"), expr(s"graft_span_hashes(text, $span)").as("hs"))
      .select(explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("h")
  }

  /** Span removal against a FITTED dup-span vocabulary — the shared body
    * of the batch operator and the streaming per-trigger sink. The
    * per-doc collect_list is bounded by the doc's own span count, and
    * the rewrite is one linear codegen'd kernel call.
    */
  def spanDedupWithVocab(docs: DataFrame, vocab: DataFrame,
                         span: Int = 8): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    val occ = graft.sources.Tables.spreadScan(docs, "doc_id")
      .select(col("doc_id"), expr(s"graft_span_hashes(text, $span)").as("hs"))
      .select(col("doc_id"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val docDup = occ.join(vocab.select(col("h")), Seq("h"))
      .groupBy("doc_id").agg(collect_list(col("h")).as("dup_hs"))
    docs.join(docDup, Seq("doc_id"), "left")
      .withColumn("dup_hs",
        coalesce(col("dup_hs"), lit(Array.emptyLongArray)))
      .withColumn("__r", expr(s"graft_span_remove(text, dup_hs, $span)"))
      .select(col("doc_id"), col("__r.clean_text").as("clean_text"),
        col("__r.n_words").as("n_words"), col("__r.n_removed").as("n_removed"),
        (col("__r.n_removed") > 0).as("rewritten"))
  }

  /** Synthetic line-structured "pages" from the flat corpus — the
    * fixture stage for [[cleanLines]] (the test corpus has no newlines
    * or punctuation, so line filtering over it raw is vacuous; same
    * build-then-process pattern as the multimodal container builders).
    * Purely narrow: one codegen'd kernel call per row.
    */
  def toPages(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("graft_build_page(text)").as("page"))
  }

  /** C4-style line-level filtering (Raffel et al., arXiv:1910.10683
    * §2.2): keep a line iff it ends in terminal punctuation, has ≥
    * `minWords` words, and carries no '{' / "lorem ipsum" /
    * "javascript"; rebuild the doc from the kept lines and keep the DOC
    * iff ≥ `minLines` lines survive (C4 drops too-short pages).
    *
    * Scale shape: ONE linear codegen'd kernel call per row
    * (graft_clean_lines) — no explode, no shuffle, scan speed at any
    * scale; the doc-keep flag is a scalar comparison on the returned
    * counts.
    */
  def cleanLines(pages: DataFrame, minWords: Int = 3, minLines: Int = 3): DataFrame = {
    graft.functions.NativeHash.register(pages.sparkSession)
    pages.withColumn("__c", expr(s"graft_clean_lines(page, $minWords)"))
      .select(col("doc_id"), col("__c.clean_text").as("clean_text"),
        col("__c.n_lines").as("n_lines"), col("__c.n_kept").as("n_kept"),
        (col("__c.n_kept") >= minLines).as("kept"))
  }

  /** In-document line-level exact dedup (Dolma's within-page pass,
    * arXiv:2402.00159 §2.2): drop every line whose trimmed form already
    * appeared earlier in the SAME page (repeated nav/boilerplate), keep
    * first occurrences in order, rebuild the doc. Cross-document
    * repetition is [[spanDedup]]'s job — this pass needs no corpus
    * state at all.
    *
    * Scale shape: ONE linear codegen'd kernel call per row
    * (graft_dedup_lines, per-row hash set) — purely narrow, zero
    * shuffle, scan speed at any scale.
    */
  def dedupLines(pages: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(pages.sparkSession)
    pages.withColumn("__d", expr("graft_dedup_lines(page)"))
      .select(col("doc_id"), col("__d.clean_text").as("clean_text"),
        col("__d.n_lines").as("n_lines"), col("__d.n_kept").as("n_kept"),
        (col("__d.n_kept") < col("__d.n_lines")).as("changed"))
  }

  /** Redaction regexes — one Scala constant interpolated into BOTH the
    * Spark plan and the DuckDB oracle (repo-wide oracle convention), kept
    * to the RE2 ∩ java.util.regex dialect (character classes + bounded
    * repeats only — no backreferences, no lookaround).
    */
  private[graft] val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private[graft] val PhoneRe = "\\+1-555-[0-9]{3}-[0-9]{4}"
  private[graft] val IpRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.77"
  private[graft] val SsnRe = "123-45-[0-9]{4}"

  /** PII redaction — the contact-string scrub every public corpus
    * pipeline runs before training (C4 strips pages on bad-word/PII
    * heuristics; CCNet and Dolma mask emails/phones/IPs in place, which
    * is the form here: typed placeholder tokens preserve the surrounding
    * context for the LM instead of dropping the page). The corpus tables
    * carry no contact strings, so a deterministic fixture
    * (graft_plant_pii) plants email/phone/IPv4/SSN tokens AND a
    * near-miss negative per coin, and the real scrub then masks them
    * with Spark's native regexp machinery.
    *
    * Scale shape: one codegen'd kernel call + four RegExpReplace and
    * four RegExpCount native expressions per row — purely narrow, zero
    * shuffle, scan speed at any scale; counts ride the same projection.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("graft_plant_pii(text)").as("pii_text"))
      .withColumn("n_emails", regexp_count(col("pii_text"), lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col("pii_text"), lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(col("pii_text"), lit(IpRe)).cast("long"))
      .withColumn("n_ssns", regexp_count(col("pii_text"), lit(SsnRe)).cast("long"))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("pii_text"), EmailRe, "<EMAIL>"),
              PhoneRe, "<PHONE>"),
            IpRe, "<IP>"),
          SsnRe, "<SSN>"))
      .withColumn("n_pii",
        col("n_emails") + col("n_phones") + col("n_ips") + col("n_ssns"))
      .select(col("doc_id"), col("clean_text"), col("n_emails"), col("n_phones"),
        col("n_ips"), col("n_ssns"), col("n_pii"), (col("n_pii") > 0).as("had_pii"))
  }

  /** Canonical-form normalization — the cleaning stage that runs BEFORE
    * any hashing/dedup so byte-level variants of one document (composed
    * vs decomposed accents, case, whitespace runs) collapse to one
    * canonical string. One codegen'd kernel call per row
    * (graft_norm_text: NFC → casefold → whitespace collapse + trim);
    * purely narrow — zero shuffle, scan speed at any scale. `changed`
    * reports which docs were already canonical (the usual audit
    * number: near-100% on a previously-cleaned corpus).
    */
  def normalize(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.select(col("doc_id"), col("text"))
      .withColumn("norm_text", expr("graft_norm_text(text)"))
      .select(col("doc_id"), col("norm_text"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("norm_text")).cast("long").as("n_chars_norm"),
        (col("text") =!= col("norm_text")).as("changed"))
  }

  /** DSIR-shaped importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * score every raw doc by how target-like its hashed n-gram bag is,
    * where the target is a small curated/eval sample. The classic form
    * multiplies per-feature likelihood ratios; floats make that
    * order-dependent across engines, so the ratio is FIXED-POINT — per
    * shingle w(h) = ((t(h)+1) · scale) DIV (r(h)+1) with add-1
    * smoothing over document frequencies, and the doc score is the
    * BIGINT sum of w over its distinct shingles (order-free by
    * construction). `importance` = score / (n_sh · scale) is the mean
    * likelihood ratio; `keep` selects docs at least neutral (>= 1),
    * decided on the INTEGER form so the cut never hinges on rounding.
    *
    * Scale shape: the target df table is an eval/quality sample —
    * small — and BROADCASTS; the raw df table comes from a hash
    * aggregate with map-side combine (high-df boilerplate shingles
    * collapse per map task), and the weight probe joins on the 8-byte
    * hash. Shingle-less docs score null, like the other cards.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        scale: Long = 10000L): DataFrame = {
    val hashes = importanceHashes(docs)
    scoreImportance(hashes.filter(!isTarget),
      importanceWeightTable(docs, isTarget, scale), scale)
  }

  /** The shingle frame both importance stages consume: (doc_id, hs,
    * n_sh). A stateless projection — reused verbatim by the streaming
    * twin on the arriving side.
    */
  def importanceHashes(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    // NOTE (r17, measured): spreadScan tried and REVERTED — the weight
    // table is consumed through small aggregates and the repair
    // exchange cost more than it bought (pipeline_importance +0.45 s).
    docs.select(col("doc_id"), expr("graft_shingle_hashes(text)").as("hs"))
      .withColumn("n_sh", size(col("hs")).cast("long"))
  }

  /** The OFFLINE fit of [[importanceWeights]]: the per-shingle
    * fixed-point weight table (h, w) from target/raw document
    * frequencies. At 100 TB this is what a deployment materializes once
    * (bucketed by h — see graft.streaming.ImportanceStream) and probes
    * forever; the target df side broadcasts, the raw df side
    * partial-aggregates.
    */
  def importanceWeightTable(docs: DataFrame, isTarget: Column,
                            scale: Long = 10000L): DataFrame = {
    val occ = importanceHashes(docs)
      .select(col("doc_id"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val tgt = occ.filter(isTarget).groupBy("h").agg(count(lit(1)).as("t"))
    val raw = occ.filter(!isTarget).groupBy("h").agg(count(lit(1)).as("r"))
    raw.join(broadcast(tgt), Seq("h"), "left")
      .select(col("h"),
        expr(s"((coalesce(t, CAST(0 AS BIGINT)) + 1) * $scale) DIV (r + 1)").as("w"))
  }

  /** The scoring stage of [[importanceWeights]] over a pre-built weight
    * table: explode the doc's shingles, LEFT-join the weights (so
    * shingle-less docs survive to the card; a left join also keeps docs
    * whose shingles a FITTED index has never seen — they score only
    * their known shingles), BIGINT-sum per doc, derive the mean ratio
    * and the integer-decided keep cut.
    */
  def scoreImportance(hashes: DataFrame, weights: DataFrame,
                      scale: Long = 10000L): DataFrame =
    reduceImportance(explodeJoinWeights(hashes, weights), scale)

  /** The probe half of [[scoreImportance]]: explode_outer keeps
    * shingle-less docs; the left join keeps docs whose shingles a fitted
    * index has never seen. Split out so the streaming twin can apply it
    * to the arriving stream BEFORE the sink (the stream-static join must
    * sit in the streaming plan) and run [[reduceImportance]] per batch.
    */
  def explodeJoinWeights(hashes: DataFrame, weights: DataFrame): DataFrame =
    hashes.select(col("doc_id"), col("n_sh"), explode_outer(col("hs")).as("h"))
      .join(weights, Seq("h"), "left")

  /** The reduce half of [[scoreImportance]]: BIGINT-sum per doc, mean
    * ratio, integer-decided keep. Batch-local — a doc's exploded
    * shingles always co-locate in one micro-batch.
    */
  def reduceImportance(joined: DataFrame, scale: Long = 10000L): DataFrame =
    joined.groupBy("doc_id", "n_sh")
      .agg(coalesce(sum("w"), lit(0L)).as("importance_num"))
      .withColumn("importance",
        when(col("n_sh") > 0,
          col("importance_num").cast("double") / (col("n_sh") * scale).cast("double")))
      .withColumn("keep",
        when(col("n_sh") > 0, col("importance_num") >= col("n_sh") * scale))
      .select("doc_id", "n_sh", "importance_num", "importance", "keep")

  /** Per-language top-q quality selection: keep the best ceil(n·q) docs of
    * each language by (quality desc, doc_id) — the stratified curation
    * step after scoring. q is the rational qNum/qDen so the cut is
    * integer-exact (a float percentile threshold would interpolate
    * differently across engines). This is the exact reference form: the
    * rank window sorts each stratum, fine up to one stratum per executor
    * worth of data; the 100-TB path computes an approximate per-stratum
    * threshold (percentile_approx sketch, mergeable) and broadcast-filters
    * on it — same selection modulo boundary ties.
    */
  def qualityTopQ(docs: DataFrame, qNum: Int = 1, qDen: Int = 2): DataFrame = {
    val scored = quality(docs).select("doc_id", "quality")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .filter(col("rk") <= expr(s"(n_lang * $qNum + ${qDen - 1}) DIV $qDen"))
      .select("doc_id", "lang", "quality", "rk")
  }

  /** The 100-TB form of [[qualityTopQ]]: a mergeable percentile sketch
    * computes each stratum's approximate quality cutoff in one aggregate
    * (no per-stratum sort, state bounded by sketch accuracy), and the
    * corpus is filtered by a broadcast of the 5-row threshold table —
    * fully shuffle-bounded regardless of stratum size. Selection differs
    * from the exact form only near the cutoff (sketch error); the spec
    * bounds the symmetric difference.
    */
  def qualityTopQApprox(docs: DataFrame, q: Double = 0.5,
                        accuracy: Int = 10000): DataFrame = {
    val scored = quality(docs).select("doc_id", "quality")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val cuts = scored.groupBy("lang")
      .agg(percentile_approx(col("quality"), lit(1.0 - q), lit(accuracy)).as("cutoff"))
    scored.join(broadcast(cuts), "lang")
      .filter(col("quality") >= col("cutoff"))
      .select("doc_id", "lang", "quality", "cutoff")
  }

  /** The validated card behind the registered `pipeline_quality_topq_approx`
    * row (r15 VERDICT #5): run [[qualityTopQApprox]]'s sketch cutoffs
    * distributed, then verify them IN-PLAN against the GK sketch's
    * proven N/accuracy rank band (the TextOpsSpec replay-gate formula
    * verbatim) so every output column is engine-reproducible and the
    * row hash-gates. Per lang: the exact doc count, whether the sketch
    * cutoff's exact rank sits inside its band, and whether the >= cutoff
    * selection kept a TIE-AWARE q-fraction of the stratum: the kept
    * count can never undershoot (q−ε)·n−1, and the kept count MINUS the
    * docs tied exactly at the cutoff (selection keeps every tie, which
    * the rank guarantee says nothing about — measured at sf1, where
    * integer-ratio qualities tie freely) can never overshoot
    * (q+ε)·n+1. Booleans are stable even
    * though percentile_approx is merge-order-dependent: ANY valid GK
    * output satisfies the band, so the verdicts — not the cutoff
    * values — are deterministic. A broken sketch flips a boolean and
    * the DuckDB hash gate goes red; the raw selection (the production
    * surface) stays pinned by the spec's rank-band + exact-filter
    * replay.
    */
  def qualityTopQApproxCard(docs: DataFrame, q: Double = 0.5,
                            accuracy: Int = 10000): DataFrame = {
    val eps = 1.0 / accuracy
    val scored = quality(docs).select("doc_id", "quality")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val cuts = scored.groupBy("lang")
      .agg(percentile_approx(col("quality"), lit(1.0 - q), lit(accuracy)).as("cutoff"))
    scored.join(broadcast(cuts), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("quality") < col("cutoff"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("quality") <= col("cutoff"), 1L).otherwise(0L)).as("le"),
        sum(when(col("quality") >= col("cutoff"), 1L).otherwise(0L)).as("nsel"))
      .select(col("lang"), col("n").as("n_docs"),
        (col("lt").cast("double") <= (lit(1.0 - q) + eps) * col("n") + 1.0 &&
          col("le").cast("double") >= (lit(1.0 - q) - eps) * col("n") - 1.0)
          .as("cutoff_in_band"),
        (col("nsel").cast("double") >= (lit(q) - eps) * col("n") - 1.0 &&
          (col("nsel") - (col("le") - col("lt"))).cast("double")
            <= (lit(q) + eps) * col("n") + 1.0)
          .as("sel_frac_in_band"))
  }

  /** Deterministic data-mixture sampling: downsample each source to its
    * configured rate using a CONTENT-HASH coin — `polyhash(text) mod
    * denom < rate`. Deterministic (reruns and engines agree exactly, so
    * it's oracle-checkable unlike rand()-based sampling), stable (a
    * duplicated doc draws the same coin everywhere), and stateless (a
    * broadcast of the rates table + a narrow filter; nothing shuffles).
    * `rates` is (source, rate_pct in [0, denom]).
    */
  def mixtureSample(docs: DataFrame, rates: DataFrame, denom: Int = 100): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.join(broadcast(rates), "source")
      .withColumn("coin", pmod(polyhashNative(col("text")), lit(denom.toLong)))
      .filter(col("coin") < col("rate_pct"))
      .select("doc_id", "source", "lang", "coin", "rate_pct")
  }

  /** Per-(source, lang) corpus card — the stratum inventory every
    * mixture/curation decision starts from: doc and token volumes plus
    * quality extremes. One partial-aggregated shuffle on the (tiny)
    * stratum key. Aggregates are chosen to be ORDER-INDEPENDENT so the
    * report is oracle-exact: counts and integer sums (exact under any
    * partitioning), min/max of doubles (associative), and a final
    * exact-integer division for the mean — never a float SUM.
    */
  def sourceStats(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    qualityCols(docs)
      .withColumn("n_re_tokens", element_at(expr("graft_text_stats(text)"), 6))
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_re_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .withColumn("avg_tokens_per_doc",
        col("n_tokens").cast("double") / col("n_docs"))
      .orderBy(col("source"), col("lang"))
  }

  /** Weighted-fair INTERLEAVE schedule — the mixture as an ORDERING
    * (heterogeneous-mixture epoch scheduling): every document gets a
    * fixed-point virtual time vt = position·SCALE div weight, and
    * reading in vt order interleaves sources proportionally to their
    * weights (weighted fair queueing's virtual-clock, deterministic
    * and resumable — where pipeline_mixture SAMPLES a mixture, this
    * SCHEDULES one without dropping anything).
    *
    * Positions are per-(source, bucket) ranks composed as
    * p = rank·B + bucket — dense per source in aggregate but computed
    * in B parallel windows, so a 10%-hot source costs B-way parallel
    * sorts, never one serialized window partition (the same shard trick
    * as [[shardedShuffle]], for the same reason). Weights are a
    * deterministic function of the source id interpolated into both
    * engines; all arithmetic is integer, so the schedule is bit-stable
    * under any partitioning.
    */
  def interleave(docs: DataFrame, buckets: Int = 16,
                 scale: Long = 1000000L, salt: String = "ilv1"): DataFrame = {
    require(buckets >= 1, s"interleave: buckets must be >= 1, got $buckets")
    graft.functions.NativeHash.register(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("bucket")).orderBy(col("hkey"), col("doc_id"))
    docs
      .withColumn("hkey", polyhashNative(concat(lit(salt + ":"), col("doc_id").cast("string"))))
      .withColumn("bucket", pmod(col("hkey"), lit(buckets.toLong)).cast("int"))
      .withColumn("weight",
        (expr("CAST(substr(source, 4) AS BIGINT)") % 3L + 1L).cast("long"))
      .withColumn("rank_in_bucket", row_number().over(w).cast("long"))
      .withColumn("p", (col("rank_in_bucket") - 1) * buckets + col("bucket"))
      .withColumn("vt", expr(s"(p * $scale) DIV weight"))
      .select("doc_id", "source", "weight", "bucket", "p", "vt")
  }

  /** ONE-ROW DATASET CARD — the "Datasheets for Datasets" summary every
    * corpus release ships (Gebru et al., arXiv:1803.09010): volume
    * (docs/tokens/chars), composition (sources/langs/strata), exact-dup
    * mass, and the holdout-split census, in a single row of exact
    * integers. Composes three operators this engine already gates
    * ([[sourceStats]], [[Dedup.exact]], [[holdoutSplit]]) — the card is
    * their one-row reductions crossJoined (constant-size frames, the
    * broadcast-trivial shape), so it costs three scans and aggregates,
    * no new machinery, and inherits their oracle-exactness.
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val strata = sourceStats(docs)
    val volume = strata.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      count(lit(1)).as("n_strata"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"))
    val dups = Dedup.exact(docs).agg(
      sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
      sum(col("n_copies") - 1).as("n_dup_docs"))
    val splits = holdoutSplit(docs).agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    volume.crossJoin(dups).crossJoin(splits)
  }

  /** Deterministic train/validation/test holdout split by CONTENT-HASH
    * range — the standard eval-set carve-out, done so reruns, engines,
    * and duplicated documents all agree (a rand() split is none of
    * those): coin = polyhash(text) mod denom; [0, testPm) → test,
    * [testPm, testPm+valPm) → val, rest → train. Content (not id)
    * hashing means a near-identical doc pair that survived dedup still
    * lands in ONE split — no train/eval leakage through duplicates.
    * Zero shuffle, scan-speed; the split is a column, so downstream
    * filters prune at the scan.
    */
  def holdoutSplit(docs: DataFrame, testPm: Int = 10, valPm: Int = 10,
                   denom: Int = 1000): DataFrame = {
    require(testPm >= 0 && valPm >= 0 && testPm + valPm <= denom,
      s"holdoutSplit: invalid split sizes test=$testPm val=$valPm of $denom")
    graft.functions.NativeHash.register(docs.sparkSession)
    docs
      .withColumn("coin", pmod(polyhashNative(col("text")), lit(denom.toLong)))
      .withColumn("split",
        when(col("coin") < testPm, "test")
          .when(col("coin") < testPm + valPm, "val")
          .otherwise("train"))
      .select("doc_id", "source", "lang", "coin", "split")
  }

  /** Per-document n-gram NOVELTY — the share of a doc's distinct
    * 3-gram shingles that occur in no other document (corpus document
    * frequency 1). Low novelty flags boilerplate/templated text that
    * pairwise near-dup ops miss: a page assembled from fragments of
    * MANY documents is far from every single one of them, yet novel in
    * almost nothing. Reuses the exact shingle kernel + document-
    * frequency aggregate the prefix-filter dedup runs (Dedup.scala:92),
    * so the plan is the proven one: fused codegen shingles → explode →
    * df aggregate on the shingle hash → count df==1 per doc — shuffle
    * keys are always the 8-byte hash or doc_id, never text. Docs too
    * short to shingle surface with n_ngrams = 0 and null novelty
    * (a left join back to the corpus), not silently dropped.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    // explode_outer + null filter (r17): see mirrorPairs (kernel-in-filter)
    val ex = Dedup.shingleHashes(docs)
      .select(col("doc_id"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val perDoc = ex.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty",
        when(col("n_ngrams") > 0, col("n_unique").cast("double") / col("n_ngrams")))
  }

  /** Deterministic SHARDED training-order shuffle — the global random
    * permutation every training run needs, in the only form that scales:
    * key = polyhash(salt ":" doc_id), shard = key mod `buckets`, position
    * = rank of (key, doc_id) within the shard; the reader consumes shards
    * in (bucket, pos) order. A single global position would need either a
    * one-partition window (serializes the whole corpus through one task)
    * or zipWithIndex (imperative, partition-order-dependent); the sharded
    * form is fully declarative — ONE hash exchange on `bucket` and
    * `buckets`-way parallel in-shard sorts — and matches how large
    * pipelines materialize shuffles anyway (shard files, read in order).
    * Id (not content) hashing keeps exact duplicates apart; changing
    * `salt` reshuffles — one salt per epoch gives independent epoch
    * orders for free. Deterministic ⇒ resumable and oracle-replayable.
    */
  def shardedShuffle(docs: DataFrame, buckets: Int = 64,
                     salt: String = "shuf1"): DataFrame = {
    require(buckets >= 1, s"shardedShuffle: buckets must be >= 1, got $buckets")
    graft.functions.NativeHash.register(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("hkey"), col("doc_id"))
    docs
      .withColumn("hkey", polyhashNative(concat(lit(salt + ":"), col("doc_id").cast("string"))))
      .withColumn("bucket", pmod(col("hkey"), lit(buckets.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "hkey", "bucket", "pos")
  }

  /** Deterministic per-source document CAP — the RefinedWeb/Dolma
    * "no host dominates the corpus" stage: keep at most `cap` documents
    * per source, chosen by hash rank so the sample is (a) uniform over
    * the source's docs, (b) independent of input order and partitioning,
    * and (c) reproducible run-to-run — a rand() sample is none of those.
    * Sources under the cap pass through whole; `rk` is the doc's rank in
    * its source's keep order, so downstream can tighten the cap by
    * filtering rk without re-ranking.
    *
    * Scale shape: the `row_number <= cap` filter triggers Spark's
    * InferWindowGroupLimit rewrite — a PARTIAL map-side WindowGroupLimit
    * prunes every task to `cap` rows per source BEFORE the exchange, so
    * shuffle volume is bounded by sources×cap×tasks, not corpus size,
    * and a 10%-hot host costs what any other host costs (plan-asserted
    * in TextOpsSpec). Id (not content) hashing keeps exact duplicates
    * independently sampled; `salt` gives fresh draws.
    */
  def stratifiedCap(docs: DataFrame, cap: Int = 10,
                    salt: String = "strat"): DataFrame = {
    require(cap >= 1, s"stratifiedCap: cap must be >= 1, got $cap")
    graft.functions.NativeHash.register(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
    docs
      .withColumn("hkey", polyhashNative(concat(lit(salt + ":"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select("doc_id", "source", "lang", "hkey", "rk")
  }

  /** Log2 document-length histogram — the size card that decides
    * pack-budget and min/max-length filter thresholds. Bins are the BIT
    * LENGTH of n_chars (floor(log2)+1), computed as length(bin(n)) —
    * integer-exact in both engines, where a libm log2 could differ in
    * the last ulp across implementations and flip a boundary doc's bin.
    * Zero-length docs (if any) take bin 0. Pure scan + partial-agg on a
    * pre-existing integer column: the scan prunes to one column, no row
    * ever shuffles (only the tiny per-bin partials do).
    */
  def lengthHist(docs: DataFrame): DataFrame =
    docs
      .withColumn("bin",
        when(col("n_chars") > 0, length(bin(col("n_chars")))).otherwise(0))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("bin"))

  /** Deterministic CURRICULUM order — quality-decile-major training
    * order with an in-tier sharded shuffle: the reader consumes
    * (decile asc, bucket, pos), so training anneals from the highest
    * quality tier down while order WITHIN a tier stays uniformly
    * shuffled (a plain quality sort would feed near-identical docs
    * consecutively). Composition of [[qualityDeciles]] (exact NTILE
    * tiers) and [[shardedShuffle]]'s hash ordering; same scale shape —
    * the per-(tier, shard) windows parallelize, nothing serializes
    * through one partition. Salt-per-epoch re-shuffles within tiers
    * while the tier ramp stays fixed.
    */
  def curriculum(docs: DataFrame, buckets: Int = 16,
                 salt: String = "curr1"): DataFrame = {
    require(buckets >= 1, s"curriculum: buckets must be >= 1, got $buckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("decile"), col("bucket"))
      .orderBy(col("hkey"), col("doc_id"))
    qualityDeciles(docs)
      .withColumn("hkey", polyhashNative(concat(lit(salt + ":"), col("doc_id").cast("string"))))
      .withColumn("bucket", pmod(col("hkey"), lit(buckets.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "decile", "bucket", "pos")
  }

  /** Deterministic quality-weighted UPSAMPLING — the mixture counterpart
    * of [[mixtureSample]]'s downsampling: each document repeats
    * `epochs(decile)` times in the output (training-mixture weighting à
    * la quality-tiered epoch counts), implemented as a narrow explode
    * over a sequence bounded by the per-tier epoch cap. Top decile gets
    * `maxEpochs`, linearly down to 1 for the bottom tiers; `epoch` is
    * the copy index so downstream shuffling/packing can interleave
    * copies. Deterministic (tier from the exact NTILE binning) ⇒
    * oracle-replayable; fan-out bounded by maxEpochs per doc.
    */
  def qualityUpsample(docs: DataFrame, maxEpochs: Int = 4, bins: Int = 10): DataFrame = {
    require(maxEpochs >= 1, s"qualityUpsample: maxEpochs must be >= 1, got $maxEpochs")
    // decile 1 = best tenth → maxEpochs; linear taper, floor 1:
    // epochs = max(1, maxEpochs + 1 - decile)
    qualityDeciles(docs, bins)
      .withColumn("n_epochs",
        greatest(lit(1L), lit(maxEpochs + 1L) - col("decile")))
      .withColumn("epoch", explode(sequence(lit(1L), col("n_epochs"))))
      .select("doc_id", "lang", "quality", "decile", "n_epochs", "epoch")
  }

  /** Whole-document polynomial hash plus the minimum `gram`-char hash via
    * the native O(len) rolling-hash expression (winnowing-style); the
    * DuckDB oracle recomputes each gram hash independently — algebraically
    * identical.
    */
  def fingerprint(docs: DataFrame, gram: Int = 8): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.select(col("doc_id"),
      polyhashNative(col("text")).as("fingerprint"),
      expr(s"graft_min_gram_hash(text, $gram)").as("min_gram_hash"),
      length(col("text")).cast("long").as("n_chars"))
  }
}
