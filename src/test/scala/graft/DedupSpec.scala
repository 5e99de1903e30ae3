package graft

import org.apache.spark.sql.functions._

import graft.functions.{ShingleHashImpl, TextFunctions}
import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("band stats card: pair mass equals the banded join's with-multiplicity count, " +
      "per-band doc totals equal the shingled corpus") {
    val hashes = Dedup.shingleHashes(docs)
    val stats = Dedup.bandStats(docs).cache()
    assert(stats.count() === 4)
    // Σ c·(c−1)/2 over buckets IS the banded self-join's row count
    // (per-band multiplicity, before the cross-band distinct)
    val banded = Dedup.minhashBands(hashes).drop("hs")
    val withMult = banded.as("a").join(banded.as("b"),
      col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id")).count()
    assert(stats.agg(sum("cand_pairs")).collect()(0).getLong(0) === withMult)
    val nDocs = hashes.filter(size(col("hs")) > 0).count()
    assert(stats.filter(col("n_docs") =!= nDocs).count() === 0,
      "every band carries every shingled doc exactly once")
    assert(stats.filter(col("max_bucket") > col("n_docs")).count() === 0)
    stats.unpersist()
  }

  test("native ShingleHashes3 expression matches the HOF formulation exactly") {
    val viaHof = docs
      .select(col("doc_id"), TextFunctions.words(col("text")).as("w"))
      .select(col("doc_id"), transform(col("w"), w => TextFunctions.polyhash(w)).as("wh"))
      .select(col("doc_id"), TextFunctions.combineShingles3(col("wh")).as("hs"))
    val viaNative = Dedup.shingleHashes(docs).select(col("doc_id"), col("hs"))
    assert(viaHof.except(viaNative).count() === 0)
    assert(viaNative.except(viaHof).count() === 0)
  }

  test("r18 sentinel contract: a 0-shingle doc (short or null text) produces ZERO " +
      "minhashBands rows — the band_val != \"\" guard fires (ADVICE pin: the guard " +
      "silently couples to array_min-NULL minhashes + concat_ws null-skipping; if " +
      "either changes, shingle-less docs flood one \"\" bucket quadratically)") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "one two"), // < 3 words -> zero 3-gram shingles
      (2L, null.asInstanceOf[String]), // null text -> zero shingles
      (3L, "a normal document with plenty of words to shingle properly"))
      .toDF("doc_id", "text")
    val banded = Dedup.minhashBands(Dedup.shingleHashes(tiny)).cache()
    assert(banded.filter(col("doc_id").isin(1L, 2L)).count() === 0,
      "shingle-less docs must produce no band rows at all")
    assert(banded.filter(col("doc_id") === 3L).count() > 0,
      "a shingled doc must still band (else this spec proves nothing)")
    assert(banded.filter(col("band_val") === "").count() === 0,
      "the \"\" sentinel band value must never survive into the index")
    banded.unpersist()
  }

  test("exact dedup partitions the corpus: keeper counts sum to corpus size") {
    val out = Dedup.exact(docs).cache()
    assert(out.agg(sum("n_copies")).head().getLong(0) === docs.count())
    assert(out.filter(col("n_copies") < 1).count() === 0)
    out.unpersist()
  }

  test("minhash LSH pairs are a subset of exact n-gram Jaccard pairs (verify step is exact)") {
    val exact = Dedup.ngramJaccardPairs(docs).cache()
    val lsh = Dedup.minhashPairs(docs).cache()
    assert(lsh.except(exact).count() === 0)
    // the planted near-dups (J≈0.99) are band-certain: recall is total here
    val recall = lsh.count().toDouble / exact.count().max(1)
    assert(recall >= 0.9, s"minhash recall $recall")
    exact.unpersist(); lsh.unpersist()
  }

  test("minhash band sweep: recall rises as bands narrow (more, shorter bands); all exact-verified") {
    val exact = Dedup.ngramJaccardPairs(docs)
      .select("doc_a", "doc_b").cache()
    val n = exact.count().toDouble.max(1)
    // k=16 fixed: 2 bands × 8 rows (collision prob s^8 per band — strict),
    // 4×4 (the default), 8×2 (loose). LSH theory: fewer rows per band ⇒
    // higher per-band collision probability ⇒ recall is monotone in bands.
    val recalls = Seq(2, 4, 8).map { bands =>
      val r = Dedup.minhashPairs(docs, bands = bands)
        .select("doc_a", "doc_b").intersect(exact).count() / n
      bands -> r
    }
    info(recalls.map { case (b, r) => f"bands=$b recall=$r%.3f" }.mkString("  "))
    recalls.sliding(2).foreach { case Seq((b1, r1), (b2, r2)) =>
      assert(r2 >= r1, s"recall must not drop when bands go $b1 -> $b2 ($r1 -> $r2)")
    }
    // every configuration stays exact-verified: candidates are a subset
    // of the exact pairs regardless of banding
    val loose = Dedup.minhashPairs(docs, bands = 8).select("doc_a", "doc_b")
    assert(loose.except(exact).count() === 0)
    exact.unpersist()
  }

  test("prefix-filtered Jaccard returns exactly the full inverted-index pairs (lossless filter)") {
    val full = Dedup.ngramJaccardPairs(docs)
    val pref = Dedup.ngramJaccardPrefixPairs(docs)
    assert(pref.except(full).count() === 0)
    assert(full.except(pref).count() === 0)
  }

  test("pair histogram conserves the candidate population and bins tightly") {
    import graft.operators.Dedup
    val hist = Dedup.pairHist(docs, bands = 4, bins = 20).cache()
    val allPairs = Dedup.minhashPairs(docs, tau = 0.0, bands = 4).count()
    assert(hist.agg(sum("n_pairs")).collect()(0).getLong(0) === allPairs,
      "every candidate pair lands in exactly one bin")
    assert(hist.filter(col("bin") < 0 || col("bin") > 19).count() === 0)
    assert(hist.filter(col("n_pairs") <= 0).count() === 0, "empty bins must not surface")
    // per-bin min/max sit inside the bin's jaccard range (bin 19 takes 1.0)
    assert(hist.filter(
      col("min_j") < col("bin") / 20.0 ||
        (col("bin") < 19 && col("max_j") >= (col("bin") + 1) / 20.0) ||
        col("max_j") > 1.0).count() === 0)
    hist.unpersist()
  }

  test("connected components equal a driver-side union-find over the same pairs; " +
      "fixpoint is idempotent and component ids are member minima") {
    val comp = Dedup.components(docs).cache()
    // independent reference: classic union-find on the collected pair list
    val pairs = Dedup.minhashPairs(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(got.size === n)
    got.foreach { case (doc, c) =>
      assert(c === find(doc), s"doc $doc: got component $c, union-find says ${find(doc)}")
    }
    // component id is the minimum member — so it is itself in the component
    assert(got.forall { case (_, c) => got(c) == c })
    // one more propagation round changes nothing (true fixpoint, not maxIter)
    val again = Dedup.components(docs)
    assert(comp.except(again).count() === 0 && again.except(comp).count() === 0)
    assert(got.values.toSet.size < n, "fixture must contain at least one real cluster")
    comp.unpersist()
  }

  test("large-star/small-star contraction equals min-label propagation on chain, " +
      "clique and random graphs (the O(log n) form is provably identical)") {
    import spark.implicits._
    val chain = (0L until 60L).sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    val clique = for (a <- 100L until 110L; b <- (a + 1) until 110L) yield (a, b)
    val rng = new scala.util.Random(42)
    val random = Seq.fill(80)((200L + rng.nextInt(60), 200L + rng.nextInt(60)))
      .filter { case (a, b) => a != b }
    // two chains joined at the far end + reversed-order edges: labels must
    // flow against edge direction too
    val bridge = Seq((300L, 301L), (302L, 301L), (303L, 302L), (59L, 0L))
    for (pairs <- Seq(chain, clique, random, chain ++ clique ++ random ++ bridge)) {
      val df = pairs.toDF("doc_a", "doc_b")
      val prop = Dedup.propagateMinLabels(df, maxIter = 100)
      val star = Dedup.starContract(df, maxIter = 100)
      // starContract omits self-labeled roots; compare on the union domain
      val all = df.select(col("doc_a").as("doc_id"))
        .unionByName(df.select(col("doc_b").as("doc_id"))).distinct()
      def full(labels: org.apache.spark.sql.DataFrame) =
        all.join(labels, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), coalesce(col("component_id"), col("doc_id")).as("component_id"))
      assert(full(star).except(prop).count() === 0)
      assert(prop.except(full(star)).count() === 0)
    }
  }

  test("star contraction converges in far fewer rounds than the chain diameter " +
      "(maxIter=8 handles a 60-chain that min-label propagation cannot)") {
    import spark.implicits._
    val chain = (0L until 60L).sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
      .toDF("doc_a", "doc_b")
    // O(log 60) rounds suffice for the star form...
    val star = Dedup.starContract(chain, maxIter = 12)
    assert(star.filter(col("component_id") =!= 0L).count() === 0)
    // ...where label propagation needs diameter rounds and must THROW, not
    // silently return non-minimal labels (round-7 ADVICE)
    val ex = intercept[IllegalStateException](Dedup.propagateMinLabels(chain, maxIter = 8))
    assert(ex.getMessage.contains("still changing"))
  }

  test("cluster stats histogram partitions the corpus and re-aggregates the " +
      "component structure exactly") {
    val stats = Dedup.clusterStats(docs).cache()
    assert(stats.agg(sum("n_docs")).head().getLong(0) === docs.count())
    val want = Dedup.componentsLogN(docs)
      .groupBy("component_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    assert(stats.except(want).count() === 0 && want.except(stats).count() === 0)
    assert(stats.filter(col("cluster_size") > 1).count() > 0,
      "fixture must contain at least one real cluster")
    stats.unpersist()
  }

  test("componentsOf handles an arbitrary id domain (embedding near-dup graph)") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val pairs = Similarity.embeddingPairs(emb, 0.4)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val comp = Dedup.componentsOf(emb.select(col("vec_id").as("doc_id")), pairs).cache()
    assert(comp.count() === emb.count())
    // labels are component minima: every label maps to itself
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.forall { case (_, c) => labels(c) == c })
    // every pair's endpoints share a component
    val bad = pairs.join(comp.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("component_id", "ca"), "doc_a")
      .join(comp.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("component_id", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb"))
    assert(bad.count() === 0)
    comp.unpersist()
  }

  test("componentsLogN equals components end-to-end on the corpus fixture") {
    val a = Dedup.components(docs)
    val b = Dedup.componentsLogN(docs)
    assert(a.except(b).count() === 0)
    assert(b.except(a).count() === 0)
  }

  test("fuzzy decontamination: planted copies of a bench doc are caught with the " +
      "right best match; clean docs report zero candidates and null matches") {
    val isBench = col("doc_id") % 97 === 0
    val benchText = docs.filter(col("doc_id") === 97).select("text").head().getString(0)
    // 1000001: verbatim copy; 1000002: light edit (one appended word) —
    // neither id is 0 mod 97, so both land on the corpus side
    val planted = docs.select(col("doc_id"), col("text")).unionByName(
      spark.range(1).select(lit(1000001L).as("doc_id"), lit(benchText).as("text")).unionByName(
        spark.range(1).select(lit(1000002L).as("doc_id"),
          lit(benchText + " extraword").as("text"))))
    val out = Dedup.decontaminateFuzzy(planted, isBench).cache()
    // output covers exactly the corpus side, bench never leaks in
    assert(out.count() === planted.filter(col("doc_id") % 97 =!= 0).count())
    assert(out.filter(col("doc_id") % 97 === 0).count() === 0)
    val copy = out.filter(col("doc_id") === 1000001L).head()
    assert(copy.getAs[Boolean]("contaminated"))
    assert(copy.getAs[Long]("best_bench") === 97L)
    assert(copy.getAs[Double]("best_jaccard") === 1.0)
    val near = out.filter(col("doc_id") === 1000002L).head()
    assert(near.getAs[Boolean]("contaminated"), "lightly-edited copy must band and verify")
    assert(near.getAs[Long]("best_bench") === 97L)
    assert(near.getAs[Double]("best_jaccard") < 1.0)
    // no-candidate docs: zero count, null match, never contaminated
    val clean = out.filter(col("n_cand") === 0)
    assert(clean.count() > 0)
    assert(clean.filter(col("contaminated") || col("best_bench").isNotNull ||
      col("best_jaccard").isNotNull).count() === 0)
    out.unpersist()
    // scale plan (broadcast threshold off; the bench side still
    // broadcasts via the EXPLICIT hint): count + rank ride ONE window
    // partition — two Window ops, a WindowGroupLimit rank-1 pushdown,
    // and no extra Exchange between them
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.decontaminateFuzzy(planted, isBench)
        .queryExecution.executedPlan.toString
      assert(plan.sliding(8).count(_ == "Window [") === 2, s"two windows:\n$plan")
      assert(plan.contains("WindowGroupLimit"), "rank-1 must push down")
      assert(plan.contains("BroadcastExchange"), "bench side must broadcast by hint")
      val exchanges = plan.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      assert(exchanges === 4,
        s"cand distinct + probe + verify + enrich only — windows add none:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("near-dup pairs are canonical (doc_a < doc_b) and within threshold bounds") {
    val p = Dedup.ngramJaccardPairs(docs).cache()
    assert(p.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(p.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() === 0)
    p.unpersist()
  }

  test("simhash pairs of identical docs have hamming 0; all pairs within threshold") {
    val p = Dedup.simhashPairs(docs).cache()
    assert(p.filter(col("hamming") > 6).count() === 0)
    p.unpersist()
    // direct impl check: identical token multisets → identical simhash,
    // and the 60-bit signature stays non-negative (sign-free banding)
    val hs = ShingleHashImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c a b c d e f"))
    val hs2 = ShingleHashImpl.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c a b c d e f"))
    val s60 = graft.functions.SimHash60Impl.compute(hs)
    assert(s60 === graft.functions.SimHash60Impl.compute(hs2))
    assert(s60 >= 0L && s60 < (1L << 60))
    assert(graft.functions.SimHashImpl.compute(hs) === graft.functions.SimHashImpl.compute(hs2))
  }

  test("simhash/embedding band cardinality: per-bucket candidate load is measured " +
      "and bounded (round-3 VERDICT #6)") {
    // simhash: 4 bands × 15 bits = 32,768 values per band; with ~N docs
    // per band the worst bucket must hold a tiny fraction of the corpus
    // (the old 8-bit bands held N/256 per bucket → quadratic pair growth)
    val sims = Dedup.shingleHashes(docs).filter(size(col("hs")) > 0)
      .select(col("doc_id"), expr("graft_simhash60(hs)").as("sim"))
    val n = sims.count().toDouble
    val worst = sims
      .select(explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("sim"), 15 * b).bitwiseAND(32767L).as("band_val"))): _*)).as("band"))
      .groupBy("band.band_id", "band.band_val").count()
      .agg(max("count")).head().getLong(0)
    info(f"simhash: n=$n%.0f worst bucket=$worst")
    assert(worst <= math.max(4, n * 0.2).toLong,
      s"a 15-bit simhash band bucket holds $worst of $n docs — banding is not spreading")
  }

  test("containment: a short doc embedded whole in a long one is found at ~1.0 " +
      "while symmetric Jaccard misses it; superset of jaccard pairs at equal tau") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    // plant: doc 91001's text appears VERBATIM inside doc 91002
    val short = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val long = ("one two three four five six seven eight nine ten " * 12) +
      short + (" eleven twelve thirteen fourteen fifteen sixteen " * 12)
    val planted = Seq((91001L, short, "xx", "pl", short.length.toLong),
      (91002L, long, "xx", "pl", long.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val all = docs.unionByName(planted)
    val cont = Dedup.containmentPairs(all).cache()
    val hit = cont.filter(col("doc_a") === 91001L && col("doc_b") === 91002L)
    assert(hit.count() === 1, "the embedded pair must surface")
    val r = hit.head()
    assert(r.getAs[Double]("containment") > 0.99, "the short doc is fully contained")
    assert(r.getAs[Double]("jaccard") < 0.5, "symmetric Jaccard must miss this pair")
    assert(Dedup.ngramJaccardPairs(all, 0.5)
      .filter(col("doc_a") === 91001L && col("doc_b") === 91002L).count() === 0)
    // containment >= jaccard always ⇒ at equal tau the pair set contains
    // the jaccard pairs
    assert(cont.filter(col("containment") < col("jaccard")).count() === 0)
    val jac8 = Dedup.ngramJaccardPairs(all, 0.8).select("doc_a", "doc_b")
    assert(jac8.exceptAll(cont.select("doc_a", "doc_b")).count() === 0)
    cont.unpersist()
  }

  test("minhash estimator calibration: exact duplicates estimate 1.0, matches bounded " +
      "by K, the estimate is unbiased enough to trust the banding math") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val est = Dedup.minhashEstimate(docs).cache()
    assert(est.count() > 0)
    assert(est.filter(col("matches") < 0 || col("matches") > 16).count() === 0)
    assert(est.filter(col("est") =!= col("matches").cast("double") / 16).count() === 0)
    // an exact-content duplicate pair has identical shingle sets ⇒ every
    // minimum matches ⇒ est = jaccard = 1 exactly
    assert(est.filter(col("jaccard") === 1.0 && col("est") =!= 1.0).count() === 0)
    // over CANDIDATES the estimate is biased UP by construction — the
    // banding selected pairs for agreeing minima; the card shows that
    // selection effect, and the spec pins it as such
    val candBias = est.agg(avg(col("est") - col("jaccard"))).head().getDouble(0)
    info(f"minhash estimator mean bias over BANDED candidates: $candBias%.4f")
    assert(candBias > 0.0, "band selection must inflate the conditional estimate")
    est.unpersist()
    // UNCONDITIONED calibration (the E[est]=J the threshold math uses):
    // all pairs of the spec corpus, no banding
    import graft.operators.Dedup.{minhashA, minhashB, MinhashK}
    import graft.functions.TextFunctions.minhash
    val sig = Dedup.shingleHashes(docs).filter(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"),
        array((0 until MinhashK).map(j =>
          minhash(col("hs"), minhashA(j), minhashB(j))): _*).as("sg"))
    val all = sig.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("sg").as("sa"))
      .crossJoin(sig.select(col("doc_id").as("doc_b"), col("hs").as("hb"), col("sg").as("sb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("matches",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), v => v)))
      .withColumn("inter", expr("graft_intersect_size(ha, hb)"))
      .withColumn("jac",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
    val bias = all.agg(avg(col("matches").cast("double") / MinhashK - col("jac")))
      .head().getDouble(0)
    info(f"minhash estimator mean bias over ALL pairs: $bias%.4f")
    assert(math.abs(bias) < 0.05,
      s"unconditioned estimator bias $bias — the threshold math assumes E[est]=J")
  }

  test("corpus-sized candidate filters leave the verified pair set unchanged " +
      "(recall spec for sizedEstK: the est cut and length filter drop only " +
      "pairs the verify join would reject)") {
    def pairSet(kEst: Int) =
      Dedup.minhashPairs(docs, 0.5, 4, kEst).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = pairSet(Dedup.MinhashK) // est cut vacuous at 16 = the r9 plan
    assert(base.nonEmpty, "fixture must contain near-dup pairs")
    assert(pairSet(32) == base)
    assert(pairSet(64) == base)
  }

  test("sizedEstK steps one doubling per corpus decade and the est cut is " +
      "vacuous by construction at the base K (a shared 4-row band implies " +
      "ceil(16*tau/2) = 4 matches at tau = 0.5)") {
    assert(Dedup.sizedEstK(500) == 16)
    assert(Dedup.sizedEstK(2000) == 16)
    assert(Dedup.sizedEstK(2001) == 32)
    assert(Dedup.sizedEstK(20000) == 32)
    assert(Dedup.sizedEstK(20001) == 64)
    assert(Dedup.sizedEstK(50000) == 64)
    assert(math.ceil(16 * 0.5 / 2).toLong == (Dedup.MinhashK / 4).toLong)
  }

  test("sizing card: stage counts telescope (banded >= sized >= verified) and " +
      "the verified count is the pair operator's own") {
    val n = docs.count()
    val row = Dedup.sizingCard(docs, 0.5, 4, n).collect()(0)
    assert(row.getAs[Long]("n_docs") == n)
    val banded = row.getAs[Long]("cand_banded")
    val sized = row.getAs[Long]("cand_sized")
    val verified = row.getAs[Long]("pairs_verified")
    assert(banded >= sized && sized >= verified)
    assert(verified ==
      Dedup.minhashPairs(docs, 0.5, 4, row.getAs[Long]("k_est").toInt).count())
  }

  test("native minhash signature kernel: the first 16 positions equal the " +
      "declarative banding minima, and graft_match_count agrees with the " +
      "zip_with formulation") {
    graft.functions.NativeHash.register(spark)
    val hashes = Dedup.shingleHashes(docs).filter(size(col("hs")) > 0).limit(50)
    val both = hashes.select(
      col("doc_id"),
      expr("graft_minhash_sig(hs, 64)").as("sg"),
      array((0 until Dedup.MinhashK).map(j =>
        TextFunctions.minhash(col("hs"), Dedup.minhashA(j), Dedup.minhashB(j))): _*).as("legacy"))
    assert(both.filter(expr("slice(sg, 1, 16)") =!= col("legacy")).isEmpty)
    val pairs = both.limit(10).alias("a").crossJoin(both.limit(10).alias("b"))
      .select(expr("graft_match_count(a.sg, b.sg)").as("native"),
        expr("size(filter(zip_with(a.sg, b.sg, (x, y) -> x = y), v -> v))")
          .cast("long").as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("snapshot delta: exact beats near, base matches are deterministic, " +
      "and new-vs-new duplication is out of scope by construction") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fixture = Seq(
      (0L, base),                                  // base
      (1L, base + " lambda mu nu xi"),             // base
      (2L, "totally different words entirely here now ok fine yes"), // base
      (10L, base),                                 // new: exact dup of 0
      (11L, base + " lambda mu nu XI"),            // new: near dup of 1
      (12L, "unrelated fresh content nothing shared with anything at all"), // new
      (13L, "unrelated fresh content nothing shared with anything at all")  // new: dup of 12 — but NEW
    ).toDF("doc_id", "text")
    val out = Dedup.snapshotDelta(fixture, col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out(10L)._1 == "exact_dup" && out(10L)._2.contains(0L))
    assert(out(11L)._1 == "near_dup" && out(11L)._2.contains(1L))
    assert(out(12L)._1 == "novel" && out(12L)._2.isEmpty)
    // 13 duplicates 12 but both are NEW — the delta is vs base only
    assert(out(13L)._1 == "novel")
    // exact rows carry jaccard 1.0
    val j10 = Dedup.snapshotDelta(fixture, col("doc_id") >= 10L)
      .filter(col("doc_id") === 10L).collect()(0).getDouble(3)
    assert(j10 == 1.0)
    // sized est filter changes nothing on true matches
    val sized = Dedup.snapshotDelta(fixture, col("doc_id") >= 10L, kEst = 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sized == out.map { case (k, v) => k -> v._1 })
  }
}
