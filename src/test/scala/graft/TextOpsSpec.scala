package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextOps}
import graft.sources.Tables

class TextOpsSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("clean-corpus MinHash twin keeps a superset of the exact pipeline (equal on " +
      "this corpus: banding recall is total on the planted dups)") {
    val exact = graft.operators.TextOps.cleanCorpus(docs).cache()
    val mh = graft.operators.TextOps.cleanCorpusMinhash(docs).cache()
    // a lossy candidate stage can only MISS pairs ⇒ only keep MORE docs
    assert(exact.except(mh).count() === 0,
      "every exact survivor must survive the minhash pipeline")
    assert(mh.except(exact).count() === 0,
      "on this corpus minhash recall is total, so the results must be equal")
    exact.unpersist(); mh.unpersist()
  }

  test("component clean-corpus keeps exactly one doc per near-dup cluster — a subset " +
      "of the pairwise form (which can keep two docs of one cluster)") {
    val cc = graft.operators.TextOps.cleanCorpusComponents(docs).cache()
    val pw = graft.operators.TextOps.cleanCorpusMinhash(docs).cache()
    // a component keeper is its cluster minimum, so it is never any
    // pair's doc_b — pairwise keeps it too
    assert(cc.select("doc_id").except(pw.select("doc_id")).count() === 0)
    // exactly one survivor per component
    val afterExact = graft.operators.TextOps.qualityExactSurvivors(docs)
    val nComponents = graft.operators.Dedup.components(afterExact)
      .select("component_id").distinct().count()
    assert(cc.count() === nComponents)
    cc.unpersist(); pw.unpersist()
  }

  test("repetition signals: exact fractions on a hand-built doc, kept flag respects " +
      "thresholds, and the gate runs shuffle-free at scan speed") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a a a b"), // n=4 uniq1=2; 2grams {aa,aa,ab}→uniq2=2; 3grams {aaa,aab}→uniq3=2; max=3
      (2L, "x y z w"), // fully unique
      (3L, "p p p p") // degenerate: one token repeated
    ).toDF("doc_id", "text")
    val r = TextOps.repetition(tiny, dup2Max = 0.4, topTokMax = 0.6)
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(r(0).fieldIndex("dup_word_frac")) === 0.5)
    assert(r(0).getDouble(r(0).fieldIndex("dup_2gram_frac")) === 1.0 / 3)
    assert(r(0).getDouble(r(0).fieldIndex("dup_3gram_frac")) === 0.0)
    assert(r(0).getDouble(r(0).fieldIndex("top_token_frac")) === 0.75)
    assert(!r(0).getBoolean(r(0).fieldIndex("kept"))) // top 0.75 > 0.6
    assert(r(1).getDouble(r(1).fieldIndex("dup_word_frac")) === 0.0)
    assert(r(1).getBoolean(r(1).fieldIndex("kept")))
    assert(r(2).getDouble(r(2).fieldIndex("dup_2gram_frac")) === 2.0 / 3)
    assert(!r(2).getBoolean(r(2).fieldIndex("kept")))
    // scan-speed gate: per-row arithmetic only, no Exchange anywhere
    val plan = TextOps.repetition(docs, 0.05, 0.12).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition filter must not shuffle:\n$plan")
  }

  test("token top-k: exact counts, count-then-token ordering, TakeOrdered plan") {
    import spark.implicits._
    val tiny = Seq((1L, "b a b"), (2L, "a c b")).toDF("doc_id", "text")
    val got = TextOps.tokenTopK(tiny, k = 2).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("b", 3L), ("a", 2L)))
    val plan = TextOps.tokenTopK(docs).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered, not a global sort:\n$plan")
  }

  test("ngram top-k: exact bigram/trigram counts, ordering, and totals match token math") {
    import spark.implicits._
    val tiny = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigrams: doc1 {a b, b a, a b}, doc2 {a b, b c} → "a b"×3, "b a"×1, "b c"×1
    val bi = TextOps.ngramTopK(tiny, n = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(bi === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
    val tri = TextOps.ngramTopK(tiny, n = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tri === Seq(("a b a", 1L), ("a b c", 1L), ("b a b", 1L)))
    // total bigram occurrences = Σ (n_tokens - 1) over the corpus
    val total = TextOps.ngramTopK(docs, n = 2, k = 1000000)
      .agg(sum("n_occurrences")).head().getLong(0)
    val expected = TextOps.repetition(docs, 0.05, 0.12)
      .agg(sum(col("n_tokens") - 1)).head().getLong(0)
    assert(total === expected)
  }

  test("quality deciles: per-language bins are equi-depth (±1), best scores in bin 1, " +
      "every doc binned") {
    val d = TextOps.qualityDeciles(docs).cache()
    assert(d.count() === docs.count())
    // equi-depth: within a language, bin sizes differ by at most 1
    val spreadOff = d.groupBy("lang", "decile").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d"))
      .filter(col("d") > 1).count()
    assert(spreadOff === 0)
    // monotone: a language's worst bin-1 score >= its best bin-10 score
    val b = d.groupBy("lang").agg(
      min(when(col("decile") === 1, col("quality"))).as("worst_top"),
      max(when(col("decile") === 10, col("quality"))).as("best_bottom"))
    assert(b.filter(col("worst_top") < col("best_bottom")).count() === 0)
    d.unpersist()
  }

  test("audio windows: audio docs only, window 0 at offset 0, offsets step by hop, " +
      "tail truncated at the payload end") {
    val w = Multimodal.audioWindows(docs).cache()
    val m = Multimodal.meta(docs).filter(col("format") === "audio")
    assert(w.select("doc_id").distinct().count() === m.count())
    assert(w.filter(col("win_idx") === 0 && col("sample_offset") =!= 0).count() === 0)
    val hop = expr("(sample_rate DIV 100) DIV 2")
    assert(w.filter(col("sample_offset") =!= col("win_idx") * hop).count() === 0)
    assert(w.filter(col("win_actual") > col("win_len") || col("win_actual") < 1).count() === 0)
    // windows cover the payload: the last window ends exactly at size_bytes
    val lastEnd = w.groupBy("doc_id", "size_bytes")
      .agg(max(col("sample_offset") + col("win_actual")).as("covered"))
    assert(lastEnd.filter(col("covered") =!= col("size_bytes")).count() === 0)
    w.unpersist()
  }

  test("span decontamination: an 8-word span hit implies a 3-gram hit; spans are rarer") {
    val bench = org.apache.spark.sql.functions.col("doc_id") % 97 === 0
    import org.apache.spark.sql.functions.col
    val spans = graft.operators.TextOps.decontaminateSpans(docs, bench).cache()
    val shingles = graft.operators.TextOps.decontaminate(docs, bench, minShared = 1).cache()
    // a shared 8-word span contains shared 3-grams, so span hits are a
    // subset of single-shingle hits — the span form trades recall of
    // common phrases for precision on verbatim leakage
    val spanHits = spans.filter(col("contaminated")).select("doc_id")
    val shingleHits = shingles.filter(col("contaminated")).select("doc_id")
    assert(spanHits.except(shingleHits).count() === 0)
    assert(spanHits.count() <= shingleHits.count())
    assert(spans.filter(col("n_overlap") > col("n_spans")).count() === 0)
    assert(spans.filter(bench).count() === 0, "benchmark docs are excluded from the output")
    spans.unpersist(); shingles.unpersist()
  }

  test("span dupes: planted cross-doc copy saturates dup_frac, counts conserve, " +
      "and the df aggregate reuses the occurrence exchange") {
    val base = docs.select(col("doc_id"), col("text"))
    val copied = base.filter(col("doc_id") === 7)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val out = TextOps.spanDupes(base.unionByName(copied)).cache()
    // every span of doc 7 now occurs in its copy too — both saturate
    for (id <- Seq(7L, 1000007L)) {
      val r = out.filter(col("doc_id") === id).head()
      assert(r.getAs[Long]("n_spans") > 0)
      assert(r.getAs[Long]("dup_spans") === r.getAs[Long]("n_spans"))
      assert(r.getAs[Double]("dup_frac") === 1.0)
    }
    // conservation: dup_spans never exceeds n_spans; span-less docs
    // report null dup_frac, everything else stays in [0, 1]
    assert(out.filter(col("dup_spans") > col("n_spans")).count() === 0)
    assert(out.filter(col("n_spans") === 0 && col("dup_frac").isNotNull).count() === 0)
    assert(out.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() === 0)
    out.unpersist()
    // scale shape (revealed with broadcast disabled): the span df comes
    // from a HASH aggregate with map-side partial combine — the skew
    // crusher for boilerplate spans — never a window buffering a whole
    // h partition, and nothing pairwise
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = TextOps.spanDupes(base).queryExecution.executedPlan.toString
      assert(plan.contains("partial_count"),
        "span df must partial-aggregate map-side")
      assert(!plan.contains("Window"), "df must not be a window over h")
      assert(!plan.contains("Cartesian"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("span dedup: planted copy removed from both docs, removals only where the " +
      "dupes card flags spans, unique docs byte-identical to canonical form") {
    val base = docs.select(col("doc_id"), col("text"))
    val copied = base.filter(col("doc_id") === 7)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val planted = base.unionByName(copied)
    val out = TextOps.spanDedup(planted).cache()
    val card = TextOps.spanDupes(planted).cache()
    // the full copy saturates every span of doc 7 and its clone — every
    // word sits under a df>=2 span, so BOTH rebuild to empty
    for (id <- Seq(7L, 1000007L)) {
      val r = out.filter(col("doc_id") === id).head()
      assert(r.getAs[String]("clean_text") === "")
      assert(r.getAs[Long]("n_removed") === r.getAs[Long]("n_words"))
      assert(r.getAs[Boolean]("rewritten"))
    }
    // containment (the VERDICT done-criterion): a doc loses words ONLY
    // if corpus_span_dupes flags at least one of its spans — and always
    // does lose some when it has a flagged span (cover is >= span words)
    val joined = out.join(card, "doc_id")
    assert(joined.filter(col("n_removed") > 0 && col("dup_spans") === 0).count() === 0)
    assert(joined.filter(col("n_removed") === 0 && col("dup_spans") > 0).count() === 0)
    // a doc with any flagged span loses at least `span` words (the cover
    // of one 8-word span), never more than all of them
    assert(joined.filter(col("dup_spans") > 0 && col("n_removed") < 8).count() === 0)
    assert(out.filter(col("n_removed") > col("n_words")).count() === 0)
    // untouched docs come back as their canonical token join, verbatim
    val untouched = out.filter(!col("rewritten"))
      .join(planted, "doc_id")
      .withColumn("canon",
        concat_ws(" ", split(lower(trim(col("text"))), "[ \\t\\n\\f\\r]+")))
    assert(untouched.filter(col("clean_text") =!= col("canon")).count() === 0)
    assert(out.count() === planted.count())
    out.unpersist(); card.unpersist()
  }

  test("clean lines: every C4 rule fires on a hand-built page, corpus pages keep " +
      "only terminal-punct boilerplate-free lines, zero shuffle in the plan") {
    import spark.implicits._
    // one page per rule: kept / no-punct / too-short / brace / lorem /
    // javascript / whitespace-only — exact expected rebuild
    val page = Seq(
      "a good line stays here.",
      "no terminal punctuation on this line",
      "too short.",
      "code ahead function() { return 1; }.",
      "Lorem Ipsum dolor sit amet.",
      "please enable JavaScript to continue.",
      "   ",
      "  padded but fine line?  ").mkString("\n")
    val out = TextOps.cleanLines(Seq((1L, page)).toDF("doc_id", "page")).head()
    assert(out.getAs[String]("clean_text") ===
      "a good line stays here.\npadded but fine line?")
    assert(out.getAs[Long]("n_lines") === 8)
    assert(out.getAs[Long]("n_kept") === 2)
    assert(!out.getAs[Boolean]("kept")) // 2 < minLines=3
    // corpus-wide: kept lines of every cleaned doc all satisfy the rules
    val cleaned = TextOps.cleanLines(TextOps.toPages(docs)).cache()
    val lines = cleaned.filter(col("n_kept") > 0)
      .select(explode(split(col("clean_text"), "\n")).as("l"))
    assert(lines.filter(!col("l").rlike("[.!?\"]$")).count() === 0)
    assert(lines.filter(col("l").contains("{") ||
      lower(col("l")).contains("lorem ipsum") ||
      lower(col("l")).contains("javascript")).count() === 0)
    assert(lines.filter(size(split(col("l"), "\\s+")) < 3).count() === 0)
    // conservation + the fixture exercises both polarity of every rule
    assert(cleaned.filter(col("n_kept") > col("n_lines")).count() === 0)
    assert(cleaned.filter(col("n_kept") < col("n_lines")).count() > 0)
    assert(cleaned.filter(col("kept")).count() > 0)
    assert(cleaned.filter(!col("kept")).count() > 0)
    cleaned.unpersist()
    // purely narrow: no Exchange anywhere in the build+clean plan
    val plan = TextOps.cleanLines(TextOps.toPages(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"clean_lines must be shuffle-free:\n$plan")
  }

  test("in-document line dedup: first occurrence kept in order on a hand-built page, " +
      "corpus pages end up duplicate-free, zero shuffle in the plan") {
    import spark.implicits._
    val page = Seq("alpha beta.", "  alpha beta. ", "gamma!", "alpha beta.",
      "gamma!", "delta").mkString("\n")
    val out = TextOps.dedupLines(Seq((1L, page)).toDF("doc_id", "page")).head()
    assert(out.getAs[String]("clean_text") === "alpha beta.\ngamma!\ndelta")
    assert(out.getAs[Long]("n_lines") === 6)
    assert(out.getAs[Long]("n_kept") === 3)
    assert(out.getAs[Boolean]("changed"))
    // corpus-wide: no doc keeps a line twice, and an unchanged doc is
    // exactly its trimmed page (whether boilerplate repeats within one
    // page at this toy scale is a coin outcome — the hand-built page
    // above is the guaranteed positive)
    val ded = TextOps.dedupLines(TextOps.toPages(docs)).cache()
    val dup = ded.select(col("doc_id"), explode(split(col("clean_text"), "\n")).as("l"))
      .groupBy("doc_id", "l").count().filter(col("count") > 1)
    assert(dup.count() === 0, "a deduped page must not repeat a line")
    val un = ded.filter(!col("changed")).join(TextOps.toPages(docs), "doc_id")
      .withColumn("canon",
        array_join(transform(split(col("page"), "\n"), l => trim(l)), "\n"))
    assert(un.count() > 0)
    assert(un.filter(col("clean_text") =!= col("canon")).count() === 0,
      "an unchanged doc must round-trip as its trimmed page")
    assert(ded.filter(col("n_kept") > col("n_lines")).count() === 0)
    ded.unpersist()
    val plan = TextOps.dedupLines(TextOps.toPages(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line dedup must be shuffle-free:\n$plan")
  }

  test("pii redact: every planted contact string masked, near-misses survive, " +
      "counts equal placeholder occurrences, zero shuffle in the plan") {
    val out = TextOps.redactPii(docs).cache()
    // nothing PII-shaped survives the scrub
    for (re <- Seq(TextOps.EmailRe, TextOps.PhoneRe, TextOps.IpRe, TextOps.SsnRe))
      assert(out.filter(col("clean_text").rlike(re)).count() === 0,
        s"pattern $re must not survive redaction")
    // each count is exactly the number of its typed placeholder in the
    // rebuilt text — masks neither drop nor duplicate
    def occ(tok: String) =
      (length(col("clean_text")) -
        length(regexp_replace(col("clean_text"), java.util.regex.Pattern.quote(tok), ""))) /
        tok.length
    assert(out.filter(occ("<EMAIL>") =!= col("n_emails")).count() === 0)
    assert(out.filter(occ("<PHONE>") =!= col("n_phones")).count() === 0)
    assert(out.filter(occ("<IP>") =!= col("n_ips")).count() === 0)
    assert(out.filter(occ("<SSN>") =!= col("n_ssns")).count() === 0)
    // the fixture exercises every type and both polarities of the flag
    assert(out.filter(col("n_emails") > 0).count() > 0)
    assert(out.filter(col("n_phones") > 0).count() > 0)
    assert(out.filter(col("n_ips") > 0).count() > 0)
    assert(out.filter(col("n_ssns") > 0).count() > 0)
    assert(out.filter(col("had_pii")).count() > 0)
    assert(out.filter(!col("had_pii")).count() > 0)
    // the near-miss negative (no TLD) must pass through untouched
    assert(out.filter(col("clean_text").rlike("u[0-9]+@ex( |$)")).count() > 0)
    out.unpersist()
    // purely narrow: one kernel + native regex projections, no Exchange
    val plan = TextOps.redactPii(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pii redact must be shuffle-free:\n$plan")
  }

  test("importance weights: hand-computed fixed-point ratios on a micro corpus, " +
      "coverage and null contracts on the real one") {
    // target 0: "a b c d e" (3 shingles). raw 1 = exact copy: every
    // shingle has t=1, r=1 -> w = (2*10000)//2 = 10000 -> num = 30000,
    // mean ratio exactly 1.0, keep. raw 2 disjoint: t=0, r=1 ->
    // w = 10000//2 = 5000 -> num = 15000, ratio 0.5, drop. raw 3 too
    // short for a shingle: null importance, null keep.
    val micro = spark.range(1).select(lit(0L).as("doc_id"), lit("a b c d e").as("text"))
      .unionByName(spark.range(1).select(lit(1L).as("doc_id"), lit("a b c d e").as("text")))
      .unionByName(spark.range(1).select(lit(2L).as("doc_id"), lit("p q r s t").as("text")))
      .unionByName(spark.range(1).select(lit(3L).as("doc_id"), lit("x y").as("text")))
    val m = TextOps.importanceWeights(micro, col("doc_id") === 0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet === Set(1L, 2L, 3L), "target excluded, all raw docs present")
    assert(m(1L).getAs[Long]("importance_num") === 30000L)
    assert(m(1L).getAs[Double]("importance") === 1.0)
    assert(m(1L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Long]("importance_num") === 15000L)
    assert(m(2L).getAs[Double]("importance") === 0.5)
    assert(!m(2L).getAs[Boolean]("keep"))
    assert(m(3L).getAs[Long]("n_sh") === 0L)
    assert(m(3L).isNullAt(m(3L).fieldIndex("importance")))
    assert(m(3L).isNullAt(m(3L).fieldIndex("keep")))
    // real corpus: every raw doc surfaces once, scores non-negative,
    // keep defined exactly where shingles exist
    val out = TextOps.importanceWeights(docs, col("doc_id") % 97 === 0).cache()
    assert(out.count() === docs.filter(col("doc_id") % 97 =!= 0).count())
    assert(out.filter(col("importance_num") < 0).count() === 0)
    assert(out.filter((col("n_sh") > 0) =!= col("keep").isNotNull).count() === 0)
    out.unpersist()
    // scale plan: both df aggregates and the per-doc sum partial-combine
    // map-side; the target df broadcasts via the explicit hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = TextOps.importanceWeights(docs, col("doc_id") % 97 === 0)
        .queryExecution.executedPlan.toString
      assert(plan.contains("partial_count"), "df aggregates must partial-combine")
      assert(plan.contains("partial_sum"), "doc score must partial-combine")
      assert(plan.contains("BroadcastExchange"), "target df must broadcast by hint")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zipf card: sequential ranks, non-increasing counts, exact products, " +
      "consistent with the token top-k") {
    val z = TextOps.zipfCard(docs, 20).orderBy("rank").collect()
    assert(z.length === 20)
    assert(z.map(_.getAs[Long]("rank")).toSeq === (1L to 20L))
    val counts = z.map(_.getAs[Long]("n_occurrences"))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)), "counts must be non-increasing")
    z.foreach(r => assert(r.getAs[Long]("zipf_product") ===
      r.getAs[Long]("rank") * r.getAs[Long]("n_occurrences")))
    val topk = TextOps.tokenTopK(docs, 20).collect().map(_.getString(0)).toSeq
    assert(z.map(_.getAs[String]("token")).toSeq === topk)
  }

  test("burstiness: cf bounds df, quotient at least 1, exact, and the top-k " +
      "set matches the token top-k") {
    val b = TextOps.burstiness(docs, 20).collect()
    assert(b.length === 20)
    val nDocs = docs.count()
    b.foreach { r =>
      val cf = r.getAs[Long]("cf"); val df = r.getAs[Long]("df")
      assert(df >= 1 && df <= nDocs && cf >= df)
      assert(r.getAs[Double]("burstiness") === cf.toDouble / df.toDouble)
      assert(r.getAs[Double]("burstiness") >= 1.0)
    }
    val topk = TextOps.tokenTopK(docs, 20).collect().map(_.getString(0)).toSet
    assert(b.map(_.getAs[String]("token")).toSet === topk)
  }

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

  test("token packing: packs fill to budget, overflow by at most the boundary doc") {
    val budget = 2048L
    val packed = TextOps.tokenPack(docs, budget).cache()
    assert(packed.count() === docs.count(), "every doc lands in exactly one pack")
    // exclusive running total within the pack stays under budget — the
    // pack can only overflow by its final (boundary) document
    assert(packed.filter(
      expr(s"(cum - n_tokens) - pack_id * $budget") >= budget).count() === 0)
    // cum really is the shard-local inclusive running total
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    assert(packed.withColumn("cum2", sum(col("n_tokens")).over(w))
      .filter(col("cum") =!= col("cum2")).count() === 0)
    // pack ids are dense non-negative per shard
    assert(packed.filter(col("pack_id") < 0).count() === 0)
    packed.unpersist()
  }

  test("decontamination: benchmark excluded, overlap bounded by doc shingles, flag matches rule") {
    val isBench = col("doc_id") % 97 === 0
    val out = TextOps.decontaminate(docs, isBench, minShared = 2).cache()
    assert(out.filter(col("doc_id") % 97 === 0).count() === 0)
    assert(out.count() === docs.filter(col("doc_id") % 97 =!= 0).count())
    assert(out.filter(col("n_overlap") > col("n_sh")).count() === 0)
    assert(out.filter(col("contaminated") =!= (col("n_overlap") >= 2)).count() === 0)
    // an exact copy of a benchmark doc must be flagged (plant one)
    val benchText = docs.filter(isBench).select("text").head().getString(0)
    val planted = docs.unionByName(
      spark.range(1).select(lit(990001L).as("doc_id"), lit(benchText).as("text"),
        lit("en").as("lang"), lit("planted").as("source"),
        length(lit(benchText)).cast("long").as("n_chars")))
    val flagged = TextOps.decontaminate(planted, isBench, minShared = 2)
      .filter(col("doc_id") === 990001L).head()
    assert(flagged.getAs[Boolean]("contaminated"),
      "verbatim benchmark copy must be contaminated")
    out.unpersist()
  }

  test("top-q quality: keeps exactly ceil(n/2) per language, all at or above every dropped score") {
    val kept = TextOps.qualityTopQ(docs).cache()
    val perLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val keptCounts = kept.groupBy("lang").agg(count(lit(1)).as("k"))
    val bad = perLang.join(keptCounts, "lang")
      .filter(col("k") =!= expr("(n * 1 + 1) DIV 2"))
    assert(bad.count() === 0, "kept count must be ceil(n*q) per language")
    val all = TextOps.quality(docs).select("doc_id", "quality")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val dropped = all.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val minKept = kept.groupBy("lang").agg(min("quality").as("min_kept"))
    val maxDrop = dropped.groupBy("lang").agg(max("quality").as("max_drop"))
    assert(minKept.join(maxDrop, "lang")
      .filter(col("max_drop") > col("min_kept")).count() === 0,
      "no dropped doc may outscore a kept doc in its language")
    kept.unpersist()
  }

  test("mixture sampling is deterministic, coin-bounded, and tracks the configured rate") {
    val rates = docs.select("source").distinct().withColumn("rate_pct", lit(40))
    val s1 = TextOps.mixtureSample(docs, rates).cache()
    val s2 = TextOps.mixtureSample(docs, rates)
    // content-hash coin: exact rerun determinism, no rand() anywhere
    assert(s1.except(s2).count() === 0)
    assert(s2.except(s1).count() === 0)
    assert(s1.filter(col("coin") >= col("rate_pct")).count() === 0)
    val frac = s1.count().toDouble / docs.count()
    assert(frac > 0.25 && frac < 0.55, s"40% target, kept fraction $frac")
    s1.unpersist()
  }

  test("approx top-q (sketch threshold + broadcast filter) tracks the exact rank selection") {
    val exact = TextOps.qualityTopQ(docs).select("doc_id").cache()
    val approx = TextOps.qualityTopQApprox(docs).select("doc_id").cache()
    val diff = exact.except(approx).count() + approx.except(exact).count()
    // the sketch can only disagree in a narrow band around each cutoff
    assert(diff <= (0.05 * docs.count()).toLong,
      s"approx selection should differ from exact only near cutoffs, diff=$diff")
    exact.unpersist(); approx.unpersist()
  }

  test("multimodal decode: every modality carries container-parsed fields — " +
      "image (BMP), video (AVI), audio (WAV) — each agreeing with its " +
      "expression face") {
    val decoded = Multimodal.decodeFeatures(spark, Multimodal.asBlobs(docs), batchSize = 7)
      .toDF().cache()
    val meta = Multimodal.meta(docs)
      .select("doc_id", "checksum", "size_bytes", "width", "height")
    // video: dims/frames/checksum/size all come from the parsed AVI and
    // must equal the expression face (one container semantics, two
    // surfaces); n_frames parse == meta declare
    val video = decoded.filter(col("format") === "video")
      .select(col("doc_id"), col("checksum"), col("size_bytes"),
        col("width"), col("height"), col("n_frames"))
    val am = Multimodal.aviMeta(docs).select(col("doc_id"),
      col("pixel_hash"), col("avi_bytes"), col("width").as("aw"),
      col("height").as("ah"), col("total_frames"))
    assert(video.count() > 0)
    val badVid = video.join(am, "doc_id")
      .filter(col("checksum") =!= col("pixel_hash") ||
        col("size_bytes") =!= col("avi_bytes") ||
        col("width") =!= col("aw") || col("height") =!= col("ah") ||
        col("n_frames") =!= col("total_frames"))
    assert(badVid.count() === 0)
    // image: dimensions parse == declare; checksum comes from the DECODED
    // pixel bytes and size from the physical container — both must equal
    // the expression face (one container semantics, two surfaces)
    val image = decoded.filter(col("format") === "image")
      .select(col("doc_id"), col("checksum"), col("size_bytes"),
        col("width"), col("height"))
    val bm = Multimodal.bmpMeta(docs).select(col("doc_id"),
      col("pixel_hash"), col("bmp_bytes"), col("width").as("bw"), col("height").as("bh"))
    assert(image.count() > 0)
    val badImg = image.join(bm, "doc_id")
      .filter(col("checksum") =!= col("pixel_hash") ||
        col("size_bytes") =!= col("bmp_bytes") ||
        col("width") =!= col("bw") || col("height") =!= col("bh"))
    assert(badImg.count() === 0)
    // audio: checksum comes from the DECODED samples and must equal the
    // pre-wrap text hash; size_bytes is payload + the 44-byte header
    val audio = decoded.filter(col("format") === "audio")
      .select("doc_id", "checksum", "size_bytes", "data_len", "width", "sample_rate")
    assert(audio.count() > 0)
    val bad = audio.join(meta.select(col("doc_id"), col("checksum").as("want"),
        col("size_bytes").as("raw_bytes")), "doc_id")
      .filter(col("checksum") =!= col("want") ||
        col("size_bytes") =!= col("raw_bytes") + 44 ||
        col("data_len") =!= col("raw_bytes") ||
        col("width").isNotNull || col("sample_rate").isNull)
    assert(bad.count() === 0)
    decoded.unpersist()
  }

  test("concat packs: one row per planned pack, token/doc sums match the plan, " +
      "and the concatenation is length-exact in doc order") {
    val packs = TextOps.concatPacks(docs).cache()
    val plan = TextOps.tokenPack(docs)
    assert(packs.count() === plan.select("shard", "pack_id").distinct().count())
    val want = plan.join(docs.select("doc_id", "text"), "doc_id")
      .groupBy("shard", "pack_id")
      .agg(sum(col("n_tokens")).as("want_tokens"), count(lit(1)).as("want_docs"),
        sum(length(col("text"))).as("txt_chars"),
        min(col("doc_id")).as("first_doc"))
    val j = packs.join(want, Seq("shard", "pack_id"))
    assert(j.filter(col("pack_tokens") =!= col("want_tokens") ||
      col("n_docs") =!= col("want_docs")).count() === 0)
    // chars = doc chars + 7-char separator between consecutive docs
    assert(j.filter(col("pack_chars") =!=
      col("txt_chars") + lit(7) * (col("n_docs") - 1)).count() === 0)
    // doc order: each pack's text starts with its smallest doc_id's text
    val bad = j.join(docs.select(col("doc_id").as("first_doc"),
        col("text").as("first_text")), "first_doc")
      .filter(!col("pack_text").startsWith(col("first_text")))
    assert(bad.count() === 0)
    packs.unpersist()
  }

  test("source stats: one row per stratum, doc counts partition the corpus, " +
      "extremes bound every doc's quality") {
    val s = TextOps.sourceStats(docs).cache()
    assert(s.count() ===
      docs.select("source", "lang").distinct().count())
    assert(s.agg(sum("n_docs")).head().getLong(0) === docs.count())
    val q = TextOps.quality(docs).join(docs.select("doc_id", "source", "lang"), "doc_id")
    val bad = q.join(s, Seq("source", "lang"))
      .filter(col("quality") < col("min_quality") || col("quality") > col("max_quality"))
    assert(bad.count() === 0)
    s.unpersist()
  }

  test("ngram novelty: dup'd text scores 0, uniques bounded, every doc surfaces") {
    val nv = TextOps.ngramNovelty(docs).cache()
    assert(nv.count() === docs.count(), "every doc must surface, shingle-less included")
    assert(nv.filter(col("n_unique") > col("n_ngrams")).count() === 0)
    assert(nv.filter(col("n_ngrams") === 0 && col("novelty").isNotNull).count() === 0)
    // plant exact dups: union a re-labeled copy of 5 docs — every
    // shingle of both twins then has df>=2 ⇒ novelty exactly 0
    val twinIds = docs.orderBy("doc_id").limit(5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val planted = TextOps.ngramNovelty(docs.unionByName(twinIds))
    val twinAndOrig = planted.filter(
      col("doc_id") < 5 || col("doc_id") >= 1000000L)
    assert(twinAndOrig.filter(col("n_ngrams") > 0).count() > 0)
    assert(twinAndOrig.filter(col("n_ngrams") > 0 && col("novelty") =!= 0.0)
      .count() === 0, "an exact-dup doc can have no corpus-unique shingle")
    // n_unique totals the df==1 shingle population exactly once
    val ex = graft.operators.Dedup.shingleHashes(docs)
      .select(explode(col("hs")).as("h"))
    val singletons = ex.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") === 1).count()
    assert(nv.agg(sum("n_unique")).collect()(0).getLong(0) === singletons)
    nv.unpersist()
  }

  test("sharded shuffle: a permutation (each doc once, in-shard positions contiguous), " +
      "deterministic, partitioning-invariant, salt reshuffles") {
    val s = TextOps.shardedShuffle(docs, buckets = 16).cache()
    assert(s.count() === docs.count())
    assert(s.select("doc_id").distinct().count() === docs.count())
    assert(s.filter(col("bucket") < 0 || col("bucket") >= 16).count() === 0)
    // positions are exactly 1..count within each shard (a true permutation)
    val perShard = s.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("pos").as("pmin"), max("pos").as("pmax"),
        countDistinct(col("pos")).as("npos"))
    assert(perShard.filter(col("pmin") =!= 1 || col("pmax") =!= col("n") ||
      col("npos") =!= col("n")).count() === 0)
    // hash balance: no shard above 2x the mean (loose uniformity gate)
    val mean = docs.count().toDouble / 16
    assert(perShard.filter(col("n") > mean * 2).count() === 0,
      "a shard holds >2x the mean — hash badly skewed")
    // deterministic + invariant to input partitioning (the cluster
    // repartitioning a 100-TB scan must not change the training order)
    val again = TextOps.shardedShuffle(docs.repartition(7), buckets = 16)
    assert(s.except(again).count() === 0)
    assert(again.except(s).count() === 0)
    // a different salt produces a genuinely different order
    val other = TextOps.shardedShuffle(docs, buckets = 16, salt = "shuf2")
    assert(s.join(other, Seq("doc_id", "bucket", "pos"), "inner").count() < docs.count())
    s.unpersist()
  }

  test("length histogram: exact power-of-two bin walls, conservation, pruned scan") {
    val h = TextOps.lengthHist(docs).cache()
    assert(h.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    assert(h.agg(sum("sum_chars")).collect()(0).getLong(0) ===
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    // bin b holds exactly [2^(b-1), 2^b) — the integer bit-length walls
    assert(h.filter(col("bin") > 0 &&
      (expr("min_chars < shiftleft(1L, bin - 1)") ||
        expr("max_chars >= shiftleft(1L, bin)"))).count() === 0)
    val p = TextOps.lengthHist(docs).queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<n_chars:bigint>"),
      s"scan must prune to the one aggregated column:\n$p")
    assert(p.contains("partial_count"), s"per-bin agg needs map-side combine:\n$p")
    h.unpersist()
  }

  test("curriculum: decile-major permutation, contiguous in-shard positions, " +
      "partitioning-invariant") {
    val c = TextOps.curriculum(docs, buckets = 8).cache()
    assert(c.count() === docs.count())
    assert(c.select("doc_id").distinct().count() === docs.count())
    assert(c.filter(col("decile") < 1 || col("decile") > 10).count() === 0)
    val perShard = c.groupBy("decile", "bucket")
      .agg(count(lit(1)).as("n"), min("pos").as("pmin"), max("pos").as("pmax"),
        countDistinct(col("pos")).as("npos"))
    assert(perShard.filter(col("pmin") =!= 1 || col("pmax") =!= col("n") ||
      col("npos") =!= col("n")).count() === 0)
    val again = TextOps.curriculum(docs.repartition(5), buckets = 8)
    assert(c.except(again).count() === 0)
    assert(again.except(c).count() === 0)
    c.unpersist()
  }

  test("holdout split: every doc assigned once, duplicate texts land in ONE split, " +
      "train is the bulk") {
    val s = TextOps.holdoutSplit(docs).cache()
    assert(s.count() === docs.count())
    // content hashing: identical text ⇒ identical split (no leakage
    // through duplicates) — the fixture contains planted exact dups
    val perText = docs.select("doc_id", "text").join(s.select("doc_id", "split"), "doc_id")
      .groupBy("text").agg(countDistinct(col("split")).as("n_splits"))
    assert(perText.filter(col("n_splits") =!= 1).count() === 0)
    val train = s.filter(col("split") === "train").count()
    assert(train > s.count() * 8 / 10, "train must hold the bulk of the corpus")
    assert(s.filter(!col("split").isin("train", "val", "test")).count() === 0)
    s.unpersist()
  }

  test("quality upsample: copy count equals the tier's epoch budget, copies are " +
      "sequential, top tier gets the max and the tail gets one") {
    val u = TextOps.qualityUpsample(docs).cache()
    val per = u.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(col("epoch")).as("mx"),
        min(col("epoch")).as("mn"), max(col("n_epochs")).as("ne"))
    assert(per.filter(col("n") =!= col("ne") || col("mx") =!= col("ne") ||
      col("mn") =!= 1).count() === 0)
    assert(u.filter(col("decile") === 1 && col("n_epochs") =!= 4).count() === 0)
    assert(u.filter(col("decile") >= 4 && col("n_epochs") =!= 1).count() === 0)
    // upsampling grew the corpus
    assert(u.count() > docs.count())
    u.unpersist()
  }

  test("approximate aggregates stay within their error bounds vs exact") {
    val events = Tables.load(spark, sf, "events")
    val approx = graft.queries.AnalyticsQueries.eventsApproxSketch(events)
      .select("event_type", "approx_users")
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type")
    val bad = joined.filter(
      abs(col("approx_users") - col("exact_users")) > col("exact_users") * 0.1 + 1)
    assert(bad.count() === 0, "HLL++ rsd=0.02 should stay well within 10%")
  }

  test("events_approx REPLAY gate (r13, the CheckSemDedup pattern for sketches): " +
      "the distributed HLL++ estimate equals a sequential driver replay through " +
      "the same register algebra EXACTLY (sketch inserts commute), and each " +
      "percentile sketch lands inside its PROVEN rank-error band vs the exact " +
      "order statistics") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.LongType
    val events = Tables.load(spark, sf, "events")
    val approx = graft.queries.AnalyticsQueries.eventsApproxSketch(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // --- HLL++: driver-sequential inserts through the SAME helper class
    // the aggregate runs (register updates are max-commutative, so any
    // partitioning/merge order must produce the same registers — this
    // pins the distributed merge bit-exactly, not just within a bound)
    val helper = new org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper(0.02)
    val buffers = scala.collection.mutable.Map[String, GenericInternalRow]()
    // null inputs are skipped by the aggregate — mirror that in the replay
    events.select("event_type", "user_id")
      .filter(col("user_id").isNotNull).collect().foreach { r =>
      val buf = buffers.getOrElseUpdate(r.getString(0),
        new GenericInternalRow(Array.fill[Any](helper.numWords)(0L)))
      helper.update(buf, 0, r.getLong(1), LongType)
    }
    assert(approx.map(_._1).toSet === buffers.keySet)
    for ((et, users, _, _) <- approx)
      assert(users === helper.query(buffers(et), 0),
        s"$et: distributed HLL++ must equal the sequential replay exactly")
    // --- percentile_approx(accuracy=10000): the GK-sketch guarantee is a
    // rank error ≤ N/accuracy; check the returned values against the
    // EXACT order statistics (strict/weak rank band, ±1 for ties)
    val byType = events.select("event_type", "value")
      .filter(col("value").isNotNull).collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)) }
    for ((et, _, p50, p95) <- approx; (q, p) <- Seq(0.5 -> p50, 0.95 -> p95)) {
      val vs = byType(et)
      val n = vs.length.toDouble
      val eps = 1.0 / 10000.0
      val lt = vs.count(_ < p)
      val le = vs.count(_ <= p)
      assert(lt <= (q + eps) * n + 1 && le >= (q - eps) * n - 1,
        s"$et q=$q: value $p has rank band [$lt, $le] outside ${(q * n).toInt} ± ${eps * n}")
    }
    // --- the registered VALIDATED card (r15): every in-band verdict the
    // in-plan validation emits must agree with this replay — all true on
    // healthy sketches — and the exact distinct matches countDistinct
    val card = graft.queries.AnalyticsQueries.queries("events_approx")(spark, sf)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(card.map(_._1).toSet === buffers.keySet)
    assert(card.forall(c => c._3 && c._4 && c._5),
      "healthy sketches must validate in-band in-plan")
    val exactUsers = events.filter(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((et, eu, _, _, _) <- card) assert(eu === exactUsers(et))
  }

  test("pipeline_quality_topq_approx card: per-lang counts are exact and the " +
      "in-plan band verdicts hold on healthy sketches") {
    val card = TextOps.qualityTopQApproxCard(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    val nByLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card.map(_._1).toSet === nByLang.keySet)
    for ((lang, n, cutOk, selOk) <- card) {
      assert(n === nByLang(lang))
      assert(cutOk && selOk, s"$lang: band verdicts must hold")
    }
  }

  test("pipeline_quality_topq_approx REPLAY gate (r13): the sketch cutoff sits " +
      "inside its proven rank band of the exact per-lang quality order " +
      "statistics, and the selection is EXACTLY the >= cutoff filter") {
    val out = TextOps.qualityTopQApprox(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val scored = TextOps.quality(docs).select("doc_id", "quality")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byLang = scored.groupBy(_._3)
    // one cutoff per lang, and it lands in the (1-q) ± 1/accuracy rank band
    val cuts = out.map(r => r._2 -> r._4).toMap
    for ((lang, cut) <- cuts) {
      val vs = byLang(lang).map(_._2)
      val n = vs.length.toDouble
      val q = 0.5; val eps = 1.0 / 10000.0
      val lt = vs.count(_ < cut)
      val le = vs.count(_ <= cut)
      assert(lt <= (q + eps) * n + 1 && le >= (q - eps) * n - 1,
        s"$lang: cutoff $cut rank band [$lt, $le] outside ${(q * n).toInt} ± ${eps * n}")
    }
    // given the cutoffs, the selection is deterministic: exactly the
    // docs with quality >= cutoff, with the quality copied verbatim
    val expected = scored.filter { case (_, quality, lang) =>
      cuts.contains(lang) && quality >= cuts(lang)
    }.map(t => (t._1, t._3, t._2)).toSet
    assert(out.map(r => (r._1, r._2, r._3)).toSet === expected,
      "the approx top-q selection must be exactly the >= cutoff filter")
  }

  test("frame sampling: videos only, frame 0 always sampled, stride respected, " +
      "byte windows tile within the blob") {
    val fs = Multimodal.frameSample(docs).cache()
    val meta = Multimodal.meta(docs).filter(col("format") === "video").cache()
    // every video contributes its frame-0 row; nothing else contributes
    assert(fs.filter(col("frame_idx") === 0).count() === meta.count())
    assert(fs.select("doc_id").distinct().count() === meta.count())
    assert(fs.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    assert(fs.filter(col("frame_idx") >= col("n_frames")).count() === 0)
    // windows stay inside the blob: last sampled byte < size_bytes
    val joined = fs.join(meta.select("doc_id", "size_bytes"), "doc_id")
    assert(joined.filter(col("byte_offset") + col("frame_len") > col("size_bytes"))
      .count() === 0)
    fs.unpersist(); meta.unpersist()
  }

  test("multimodal features are 8-dim and normalized to [0,1]") {
    val d = Multimodal.decodeFeatures(spark, Multimodal.asBlobs(docs)).cache()
    assert(d.filter(size(col("feature")) =!= 8).count() === 0)
    assert(d.filter(exists(col("feature"), f => f < 0.0f || f > 1.0f)).count() === 0)
    d.unpersist()
  }

  test("tfidf keywords: min(k, vocab) contiguous ranks per doc, scores descend, " +
      "an everywhere-token scores tf·scale, group limit is map-side partial") {
    val k = 5
    val out = TextOps.tfidfTopK(docs, k = k).cache()
    // per-doc row count = min(k, distinct tokens); ranks contiguous 1..c
    val vocabPerDoc = docs
      .select(col("doc_id"), explode(graft.functions.TextFunctions.words(col("text"))).as("t"))
      .groupBy(col("doc_id")).agg(countDistinct(col("t")).as("v"))
    assert(out.groupBy(col("doc_id")).agg(count(lit(1)).as("c"), max(col("rk")).as("m"))
      .join(vocabPerDoc, "doc_id")
      .filter(col("c") =!= least(lit(k.toLong), col("v")) || col("m") =!= col("c"))
      .count() === 0)
    // scores never increase with rank inside a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rk"))
    assert(out.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev")).count() === 0)
    // df = corpus size ⇒ idf_fp = scale exactly ⇒ score = tf·scale
    val n = docs.count()
    assert(out.filter(col("df") === n && col("score") =!= col("tf") * 1000000L)
      .count() === 0)
    out.unpersist()
    val p = TextOps.tfidfTopK(docs, k = k).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"per-doc top-k must push down:\n$p")
    assert(p.contains("partial_count"), s"tf/df aggregates need map-side combine:\n$p")
  }

  test("interleave: the virtual clock serves every backlogged source within a " +
      "bucket-width of its weighted fair share; positions stay near-dense") {
    import org.apache.spark.sql.functions._
    val B = 16
    val out = TextOps.interleave(docs, buckets = B).cache()
    // positions stay near-dense per source: hash imbalance across the B
    // buckets stretches p by at most ~the worst bucket's excess — 2n+B
    // is a loose wall that still catches a broken composition (measured
    // max p = 47 at n = 25, B = 16)
    val dense = out.groupBy(col("source"))
      .agg(max(col("p")).as("mp"), count(lit(1)).as("n"))
    assert(dense.filter(col("mp") >= col("n") * 2 + B).count() === 0,
      "positions drifted away from dense — fairness would break")
    // WFQ fairness: at the 100th-smallest virtual time, every source has
    // been served within ±(B+1) of weight·T/SCALE
    val t = out.orderBy(col("vt")).limit(100)
      .agg(max(col("vt"))).head().getLong(0)
    val served = out.filter(col("vt") <= t)
      .groupBy(col("source"), col("weight")).agg(count(lit(1)).as("served"))
    val off = served
      .withColumn("share", col("weight") * t / 1000000L)
      .filter(abs(col("served") - col("share")) > B + 1)
    assert(off.count() === 0,
      s"unfair prefix: ${off.collect().mkString(";")}")
    // higher weight ⇒ more service in the prefix, aggregated by class
    val byW = out.filter(col("vt") <= t).groupBy(col("weight"))
      .agg((count(lit(1)).cast("double") /
        countDistinct(col("source"))).as("per_source"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byW(3L) > byW(1L), "a weight-3 source must outpace a weight-1 source")
    out.unpersist()
  }

  test("mirror pairs: a planted cross-source mirror ranks first; the boilerplate " +
      "wall excludes ubiquitous shingles from the join") {
    import spark.implicits._
    // plant a mirror: five documents republished WHOLE by two fresh
    // sources — their shingles now have source-df ≥ 2 through the pair,
    // outweighing any naturally-shared mass between real sources
    val txts = docs.orderBy(col("n_chars").desc).limit(5)
      .select("text").collect().map(_.getString(0))
    val planted = txts.zipWithIndex.flatMap { case (t, i) =>
      Seq((90001L + 2 * i, t, "xx", "mirrorX", t.length.toLong),
        (90002L + 2 * i, t, "xx", "mirrorY", t.length.toLong))
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.mirrorPairs(docs.unionByName(planted)).cache()
    val top = out.filter(col("rnk") === 1).head()
    assert(Set(top.getString(0), top.getString(1)) === Set("mirrorX", "mirrorY"),
      s"the planted mirror must rank first, got ${top.mkString(",")}")
    // rank order is strict on shared counts
    assert(out.count() === out.select("rnk").distinct().count())
    out.unpersist()
    // the boilerplate wall: no surviving shingle joins more than
    // maxSources sources, so no pair's count can exceed the total kept
    // shingle population of either source (sanity, not tightness)
    val base = TextOps.mirrorPairs(docs, maxSources = 2)
    val wide = TextOps.mirrorPairs(docs, maxSources = 10)
    assert(base.agg(sum("shared")).head().getLong(0) <=
      wide.agg(sum("shared")).head().getLong(0),
      "tightening the df band can only drop evidence")
  }

  test("oov rate: token conservation, bounds, a full-corpus vocabulary zeroes every " +
      "rate, and the fitted vocab joins broadcast") {
    val out = TextOps.oovRate(docs).cache()
    assert(out.count() === docs.count())
    assert(out.filter(col("n_oov") < 0 || col("n_oov") > col("n_tokens")).count() === 0)
    // token conservation: per-doc n_tokens sums to the corpus token count
    val total = docs.select(explode(graft.functions.TextFunctions.words(col("text"))))
      .count()
    assert(out.agg(sum("n_tokens")).collect()(0).getLong(0) === total)
    out.unpersist()
    // a vocabulary bigger than the corpus vocabulary ⇒ nothing is OOV
    val vocabAll = docs.select(explode(graft.functions.TextFunctions.words(col("text"))))
      .distinct().count().toInt + 1
    assert(TextOps.oovRate(docs, vocabSize = vocabAll)
      .filter(col("n_oov") =!= 0L).count() === 0)
    val p = TextOps.oovRate(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"the V-row vocab must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the token stream must not shuffle to score:\n$p")
  }

  test("stratified cap: every source keeps min(cap, n) docs, ranks are contiguous, " +
      "the draw is salt-deterministic, and the group limit is map-side partial") {
    val cap = 2
    val out = TextOps.stratifiedCap(docs, cap = cap).cache()
    val kept = out.groupBy(col("source")).count()
    val have = docs.groupBy(col("source")).count().withColumnRenamed("count", "n")
    // min(cap, n) per source — under-cap sources pass through whole
    assert(kept.join(have, "source")
      .filter(col("count") =!= least(lit(cap.toLong), col("n"))).count() === 0)
    // ranks are 1..k contiguous per source
    assert(out.filter(col("rk") < 1 || col("rk") > cap).count() === 0)
    assert(out.groupBy(col("source")).agg(max(col("rk")).as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c")).count() === 0)
    // same salt → identical draw; different salt → a genuinely different one
    val again = TextOps.stratifiedCap(docs, cap = cap)
    assert(out.exceptAll(again).count() === 0)
    val fresh = TextOps.stratifiedCap(docs, cap = cap, salt = "strat2")
      .select("doc_id")
    assert(fresh.exceptAll(out.select("doc_id")).count() > 0)
    out.unpersist()
    // rank<=cap must become a PARTIAL map-side WindowGroupLimit so a hot
    // source is pruned per-task before the exchange
    val p = TextOps.stratifiedCap(docs, cap = cap)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"group limit must push down:\n$p")
    assert(p.contains("Partial"), s"the pre-shuffle half must be Partial mode:\n$p")
  }
}
