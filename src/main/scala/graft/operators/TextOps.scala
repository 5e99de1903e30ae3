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
  def quality(docs: DataFrame): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
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
      .select("doc_id", "n_chars", "n_words", "n_uniq", "avg_word_len",
        "uniq_ratio", "stop_ratio", "alpha_ratio", "quality")
  }

  /** The end-to-end corpus-cleaning pipeline, composed as ONE declarative
    * plan (Catalyst sees everything): quality-filter → exact dedup (keep
    * the min-id copy) → near-dup removal (drop the higher-id doc of every
    * Jaccard ≥ tau pair). The shape every training-data prep run takes;
    * each stage is the operator verified on its own above.
    */
  def cleanCorpus(docs: DataFrame, minQuality: Double = 0.48,
                  tau: Double = 0.5): DataFrame = {
    val q = quality(docs).filter(col("quality") >= minQuality)
      .select("doc_id", "quality")
    val survivors = docs.join(q, "doc_id")
    val keepers = Dedup.exact(survivors).select(col("keeper_id").as("doc_id"))
    val afterExact = survivors.join(keepers, "doc_id")
    val nearDupLosers = Dedup.ngramJaccardPairs(afterExact, tau)
      .select(col("doc_b").as("doc_id")).distinct()
    afterExact.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select("doc_id", "quality")
  }

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
      .withColumn("chars_per_token", col("n_chars").cast("double") / col("n_re_tokens"))
      .select("doc_id", "n_ws_tokens", "n_re_tokens", "n_chars", "chars_per_token")
  }

  /** Whole-document polynomial hash plus the minimum `gram`-char hash via
    * the native O(len) rolling-hash expression (winnowing-style); the
    * DuckDB oracle recomputes each gram hash independently — algebraically
    * identical.
    */
  def fingerprint(docs: DataFrame, gram: Int = 8): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    docs.select(col("doc_id"),
      polyhash(col("text")).as("fingerprint"),
      expr(s"graft_min_gram_hash(text, $gram)").as("min_gram_hash"),
      length(col("text")).cast("long").as("n_chars"))
  }
}
