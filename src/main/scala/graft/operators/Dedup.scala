package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline (SURVEY.md §2c).
  *
  * All near-dup operators follow the same scale shape: candidate
  * generation via a high-cardinality band/bucket key (never a raw corpus
  * self-join), then exact verification on candidates only. At 100 TB the
  * candidate join shuffles on the band key whose per-bucket population is
  * tiny; the quadratic blow-up is confined inside buckets.
  *
  * Everything is built from codegen'd built-ins/HOFs with integer
  * arithmetic (polyhash mod 1e9+7), so results are bit-identical across
  * partitionings and engines — see the matching DuckDB oracle SQL in
  * [[graft.queries.PipelineQueries]].
  */
object Dedup {

  /** MinHash universal-hash params (h*a+b mod 2^31-1), Knuth/Numerical
    * Recipes multipliers; mirrored literally in the oracle SQL.
    */
  val MinhashK = 16
  val minhashA: Seq[Long] = (0 until MinhashK).map(j => ((j + 1) * 2654435761L) % MinhashP match {
    case 0L => 1L
    case a  => a
  })
  val minhashB: Seq[Long] = (0 until MinhashK).map(j => ((j + 1) * 1013904223L) % MinhashP)

  /** (doc_id, hs: array<long> distinct shingle hashes, n_sh) — the shared
    * input of every text near-dup operator. One narrow projection, no
    * shuffle; computed per-partition at scan time.
    */
  def shingleHashes(docs: DataFrame, spread: Boolean = true): DataFrame = {
    graft.functions.NativeHash.register(docs.sparkSession)
    // r17 opt (guide §2.5): the whole map side of every near-dup
    // candidate stage (kernel + explode + band build + partial agg /
    // broadcast build) runs straight above this projection, so a
    // single-row-group corpus file must not serialize it on one scan
    // task. spreadScan hash-repartitions the narrow (doc_id, text)
    // rows only when the planned scan is narrower than the session —
    // a no-op on any real multi-split layout (the 100-TB case) and a
    // pass-through for streaming frames.
    (if (spread) graft.sources.Tables.spreadScan(docs, "doc_id") else docs)
      .select(col("doc_id"), expr("graft_shingle_hashes(text)").as("hs"))
      .withColumn("n_sh", size(col("hs")).cast("long"))
  }

  /** Exact dedup: one hash aggregate on the content digest (map-side
    * combine; AQE splits skewed digests, which only occur under heavy
    * duplication — exactly when splitting pays off).
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard pairs via an inverted shingle index: explode →
    * self-join on shingle hash → per-pair intersection count. The join key
    * (shingle hash) has ~|vocab|^n cardinality so buckets stay small; this
    * is the exact baseline the LSH variants are verified against.
    */
  def ngramJaccardPairs(docs: DataFrame, tau: Double = 0.5): DataFrame = {
    // r17 opt: explode_outer + null filter, not explode — plain explode
    // lets InferFiltersFromGenerate inline the shingle kernel into a
    // size()>0 filter below the projection, evaluating the kernel twice
    // per row (the documented GENERATE landmine, filter form; measured
    // ~45% of the scan stage at sf0.1). Row set identical: elements are
    // never null, and empty/null arrays drop either way.
    val ex = shingleHashes(docs)
      .select(col("doc_id"), col("n_sh"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val a = ex.alias("a")
    val b = ex.alias("b")
    a.join(b, col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"), max(col("a.n_sh")).as("na"), max(col("b.n_sh")).as("nb"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** CONTAINMENT near-dup pairs — the asymmetric measure symmetric
    * Jaccard structurally misses: a short document embedded whole in a
    * long one has containment max(|A∩B|/|A|, |A∩B|/|B|) ≈ 1 while its
    * Jaccard ≈ |A|/|B| can sit far below any dedup threshold (quote
    * farms, scraped snippets, page-in-page syndication — Lee et al.'s
    * ExactSubstr motivation at the DOCUMENT level). Same exact
    * shingle-intersection plan as [[ngramJaccardPairs]] — shuffle keys
    * are 8-byte hashes, candidate pairs are shingle-sharing pairs —
    * plus one extra fixed IEEE division per pair; `jaccard` ships
    * alongside so the card shows exactly the asymmetric mass a
    * Jaccard-τ pass would have kept or lost.
    */
  def containmentPairs(docs: DataFrame, tau: Double = 0.8): DataFrame = {
    // explode_outer + null filter: see ngramJaccardPairs (kernel-in-filter)
    val ex = shingleHashes(docs)
      .select(col("doc_id"), col("n_sh"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val a = ex.alias("a")
    val b = ex.alias("b")
    a.join(b, col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"), max(col("a.n_sh")).as("na"), max(col("b.n_sh")).as("nb"))
      .withColumn("containment",
        greatest(col("inter").cast("double") / col("na"),
          col("inter").cast("double") / col("nb")))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("containment") >= tau)
      .select(col("doc_a"), col("doc_b"), col("containment"), col("jaccard"))
  }

  /** Prefix-filtered exact Jaccard (PPJoin-style) — the 100-TB form of
    * [[ngramJaccardPairs]]: each doc indexes only its
    * `n - ceil(tau*n) + 1` globally-rarest shingles (order: document
    * frequency asc, hash asc). Two docs with Jaccard ≥ tau MUST share a
    * prefix shingle (pigeonhole on the overlap bound), so no pair is
    * lost, while the inverted index shrinks to the rare tail — hot
    * (frequent) shingles never generate candidates. Exact verification
    * runs on candidates only; output is identical to the full
    * inverted-index operator (asserted in DedupSpec).
    *
    * tau is the rational tauNum/tauDen so the prefix bound is integer
    * arithmetic, bit-identical in the DuckDB oracle.
    *
    * Crossover: at toy scale the df-ranking + per-candidate set
    * intersection costs more than the full inverted join it avoids
    * (sf0.1: 2.8× fewer candidates but ~2.5× slower). The filter wins
    * when corpus size makes the quadratic candidate join the bottleneck —
    * exactly the 100-TB regime this variant exists for.
    */
  def ngramJaccardPrefixPairs(docs: DataFrame,
                              tauNum: Int = 1, tauDen: Int = 2): DataFrame = {
    val tau = tauNum.toDouble / tauDen
    val hashes = shingleHashes(docs)
    val prefix = prefixIndex(hashes, tauNum, tauDen)
    val cand = selfJoinCandidates(prefix)
    val ha = hashes.select(col("doc_id").as("doc_a"), col("hs").as("ha"))
    val hb = hashes.select(col("doc_id").as("doc_b"), col("hs").as("hb"))
    cand.join(ha, "doc_a").join(hb, "doc_b")
      .withColumn("inter", expr("graft_intersect_size(ha, hb)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** The PPJoin prefix index: each doc's `n - ceil(tau*n) + 1`
    * globally-rarest shingles (df asc, hash asc; all-integer prefix
    * bound). Shared by the operator and the scale-curve measurement
    * (ScaleCurves), so measured candidate counts are the operator's own.
    */
  private[graft] def prefixIndex(hashes: DataFrame,
                                 tauNum: Int, tauDen: Int): DataFrame = {
    // explode_outer + null filter: see ngramJaccardPairs (kernel-in-filter)
    val ex = hashes
      .select(col("doc_id"), col("n_sh"), explode_outer(col("hs")).as("h"))
      .filter(col("h").isNotNull)
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    ex.join(dfreq, "h")
      .withColumn("rk", row_number().over(w))
      // prefix length = n - ceil(n*tau) + 1, all-integer
      .filter(col("rk") <= expr(s"n_sh - (n_sh * $tauNum + ${tauDen - 1}) DIV $tauDen + 1"))
      .select(col("doc_id"), col("h"))
  }

  /** Distinct (doc_a < doc_b) pairs sharing a key in an inverted
    * (doc_id, h) index — the candidate join every exact-verify variant
    * funnels through.
    */
  private[graft] def selfJoinCandidates(index: DataFrame): DataFrame = {
    val a = index.alias("a")
    val b = index.alias("b")
    a.join(b, col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** (doc_id, hs, band_id, band_val) — the exploded MinHash LSH band index
    * of a (doc_id, hs) frame. Stateless projections only, so it applies
    * identically to a streaming frame (DedupStream). Docs with empty
    * shingle sets are dropped BEFORE banding: their minhashes are all NULL
    * and concat_ws would fold every short doc into one "" band bucket — a
    * quadratic candidate blow-up of guaranteed-unverifiable pairs.
    */
  def minhashBands(hashes: DataFrame, bands: Int = 4): DataFrame = {
    val rows = MinhashK / bands
    // r17 opt: the shingle-less-doc guard moved from a pre-sig
    // filter(size(hs) > 0) — whose pushdown inlined the shingle kernel
    // into the filter condition, one extra kernel eval per row — to a
    // post-explode filter on band_val: an empty hs makes every minhash
    // NULL (array_min over empty), and concat_ws skips nulls, so
    // band_val = "" EXACTLY for the shingle-less docs the old filter
    // dropped (a real band value is `rows` longs joined by commas,
    // never empty). band_val is a stored post-Generate attribute, so
    // nothing can inline through it. Row set identical; the quadratic
    // ""-bucket blow-up the old comment feared stays impossible. The
    // hs→sig projection boundary is safe from CollapseProject (hs is
    // referenced 16×, too expensive to duplicate by that rule).
    val sig = hashes.select(
      col("doc_id") +: col("hs") +: col("n_sh") +:
        (0 until MinhashK).map(j => minhash(col("hs"), minhashA(j), minhashB(j)).as(s"s$j")): _*)
    sig.select(col("doc_id"), col("hs"), col("n_sh"),
      explode(array((0 until bands).map { bd =>
        struct(lit(bd).as("band_id"),
          concat_ws(",", (0 until rows).map(r => col(s"s${bd * rows + r}")): _*).as("band_val"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("hs"), col("n_sh"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
      .filter(col("band_val") =!= "")
  }

  /** Corpus-sized estimator length for the MinHash candidate pre-filter
    * (round-9 VERDICT #3). The banding geometry (4×4 over K=16) is NOT
    * resized with the corpus — widening rows was measured to LOSE
    * moderate-J recall (sf1: 2,020 → 1,699 true pairs at 8×8) — instead
    * the signature is EXTENDED and candidates are pre-filtered on
    * signature agreement est = matches/kEst ≥ tau/2 before the verify
    * join ships any shingle array. Random band collisions (measured
    * 99.1% of sf1 candidates sit at J < 0.1) fail the cut with
    * overwhelming probability while a true pair at J ≥ tau sits ≥ 4σ
    * above it (σ = √(J(1−J)/kEst)). One decade of corpus growth doubles
    * kEst because random-collision mass grows ~N² while filter
    * sharpness grows only as √kEst. At kEst = 16 the cut is vacuous by
    * construction (a shared 4-row band already implies 4 = ⌈16·tau/2⌉
    * matches at tau = 0.5), so small corpora keep the exact round-8
    * plan. Measured (tools/proto sf1, 50k docs): banded 241,897 →
    * filtered 67,874 candidates, true pairs 2,020 → 2,020 (zero loss;
    * ratio 120:1 → 33.6:1).
    */
  def sizedEstK(n: Long): Int =
    if (n <= 2000) MinhashK else if (n <= 20000) 32 else 64

  /** Banded MinHash candidates with the two pre-verify filters of the
    * sized plan: the LOSSLESS length filter (J ≥ tau forces
    * min(n_sh) ≥ tau·max(n_sh), so the predicate rides the band join and
    * prunes before the distinct) and the signature-agreement estimator
    * cut (matches ≥ ⌈kEst·tau/2⌉ over the extended kEst-long signature,
    * computed by the one-pass codegen'd kernel so the big hs arrays ship
    * only for est-passing pairs). Thresholds are Scala-computed integers
    * interpolated into both engines.
    */
  private[graft] def minhashCandidatesSized(hashes: DataFrame, bands: Int,
                                            tau: Double, kEst: Int): DataFrame = {
    require(kEst >= MinhashK && kEst <= graft.functions.MinhashSigImpl.MaxK,
      s"minhashCandidatesSized: kEst=$kEst outside [$MinhashK, ${graft.functions.MinhashSigImpl.MaxK}]")
    val minMatches = math.ceil(kEst * tau / 2).toLong
    val banded = minhashBands(hashes, bands)
      .select(col("doc_id"), col("n_sh"), col("band_id"), col("band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b,
        col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n_sh"), col("b.n_sh")).cast("double") >=
            lit(tau) * greatest(col("a.n_sh"), col("b.n_sh")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // r17 opt: the size(hs) > 0 pre-filter dropped — its pushdown
    // inlined the shingle kernel into the filter condition (one extra
    // kernel eval per row), and it was redundant: sig is consumed
    // through INNER joins against band-derived candidates, whose docs
    // all banded (non-empty hs). A shingle-less doc's sg is the all-P
    // sentinel (MinhashSigImpl on an empty array), cheap and never
    // joined.
    val sig = hashes
      .select(col("doc_id"), expr(s"graft_minhash_sig(hs, $kEst)").as("sg"))
    val sa = sig.select(col("doc_id").as("doc_a"), col("sg").as("sga"))
    val sb = sig.select(col("doc_id").as("doc_b"), col("sg").as("sgb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .filter(expr("graft_match_count(sga, sgb)") >= minMatches)
      .select(col("doc_a"), col("doc_b"))
  }

  /** MinHash+LSH near-dup: k=16 signature in 4 bands of 4 rows; candidate
    * pairs share at least one band; exact Jaccard (on the full shingle
    * hash sets) verifies candidates. Bands are the scale path — the join
    * key is (band_id, band_val) and the verify join touches candidates
    * only.
    */
  def minhashPairs(docs: DataFrame, tau: Double = 0.5, bands: Int = 4,
                   kEst: Int = MinhashK): DataFrame = {
    val hashes = shingleHashes(docs)
    // kEst == MinhashK keeps the exact unfiltered plan (both sized-plan
    // filters are no-ops there — see sizedEstK); larger corpora pass
    // kEst = sizedEstK(n) and candidates are pre-filtered before the
    // verify join ships shingle arrays
    val cand = if (kEst > MinhashK) minhashCandidatesSized(hashes, bands, tau, kEst)
               else minhashCandidates(hashes, bands)
    val ha = hashes.select(col("doc_id").as("doc_a"), col("hs").as("ha"))
    val hb = hashes.select(col("doc_id").as("doc_b"), col("hs").as("hb"))
    cand.join(ha, "doc_a").join(hb, "doc_b")
      .withColumn("inter", expr("graft_intersect_size(ha, hb)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Band-occupancy sizing card for the MinHash LSH index — the
    * operational face of SURVEY §5's "band cardinality is a SIZING
    * PARAMETER": per band, the number of occupied buckets, banded docs,
    * worst bucket population, and the total in-bucket candidate-pair
    * mass Σ c·(c−1)/2 (the exact count the verify join will pay). Run
    * this on a corpus BEFORE the pair join — when cand_pairs grows
    * superlinearly against the expected dup mass, widen the bands
    * (more rows per band) or raise the band count (the sf1 scale curve
    * measured 242k candidates against 2,020 true pairs with the
    * toy-sized defaults — this card is how that is seen WITHOUT paying
    * for the join).
    *
    * Scale shape: one hash aggregate on the high-cardinality
    * (band_id, band_val) key with map-side partial combine, then a
    * `bands`-row aggregate; integer-exact (the pair mass divides by 2
    * integrally — c·(c−1) is even).
    */
  def bandStats(docs: DataFrame, bands: Int = 4): DataFrame = {
    val banded = minhashBands(shingleHashes(docs), bands).drop("hs")
    banded.groupBy(col("band_id"), col("band_val")).agg(count(lit(1)).as("c"))
      .groupBy(col("band_id").cast("long").as("band_id"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).as("n_docs"),
        max(col("c")).as("max_bucket"),
        sum(expr("c * (c - 1)")).as("__c2"))
      .withColumn("cand_pairs", expr("__c2 div 2"))
      .select("band_id", "n_buckets", "n_docs", "max_bucket", "cand_pairs")
  }

  /** Distinct band-bucket candidate pairs of the MinHash LSH index —
    * shared by [[minhashPairs]] and the scale-curve measurement.
    */
  /** MinHash ESTIMATOR-CALIBRATION card — per banded candidate pair, the
    * signature estimate (matching minima / K) NEXT TO the exact Jaccard
    * it estimates. The banding/threshold knobs are chosen by trusting
    * E[matches/K] = J; this card is where that trust is checked on the
    * actual corpus (a skewed shingle distribution or a too-small K shows
    * up as bias here long before it shows up as missed dups). K=16 means
    * the estimate is quantized to 1/16 — visible in the card, which is
    * the point.
    *
    * Scale shape: identical to [[minhashPairs]] (banded candidates, the
    * same per-doc signature arrays) plus one 16-element zip per pair —
    * the card costs what the verify join already costs, nothing more.
    * Every column is either an integer or ONE fixed IEEE division, so
    * both engines agree bit-for-bit.
    */
  def minhashEstimate(docs: DataFrame, bands: Int = 4): DataFrame = {
    val hashes = shingleHashes(docs)
    val cand = minhashCandidates(hashes, bands)
    // size(hs) > 0 pre-filter dropped — see minhashCandidatesSized
    // (inner joins against banded candidates absorb shingle-less docs)
    val sig = hashes.select(col("doc_id"), col("hs"),
      array((0 until MinhashK).map(j =>
        minhash(col("hs"), minhashA(j), minhashB(j))): _*).as("sig"))
    val a = sig.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("sig").as("sa"))
    val b = sig.select(col("doc_id").as("doc_b"), col("hs").as("hb"), col("sig").as("sb"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("matches",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), v => v)).cast("long"))
      .withColumn("inter", expr("graft_intersect_size(ha, hb)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
      .withColumn("est", col("matches").cast("double") / MinhashK)
      .select(col("doc_a"), col("doc_b"), col("matches"), col("jaccard"), col("est"))
  }

  /** The corpus-sizing decision card — what [[sizedEstK]] chose for THIS
    * corpus and what it bought: the derived parameters (k_est,
    * min_matches) next to the measured per-stage candidate mass (raw
    * banded pairs → size+est filtered pairs → verified true pairs). Run
    * it before a dedup campaign the way [[bandStats]] is run before a
    * band join — when cand_sized still dwarfs pairs_verified, the next
    * kEst step is due. Three aggregate-only passes over the same banded
    * index; all counts integer-exact.
    */
  def sizingCard(docs: DataFrame, tau: Double, bands: Int, n: Long): DataFrame = {
    val kEst = sizedEstK(n)
    val minMatches = math.ceil(kEst * tau / 2).toLong
    val hashes = shingleHashes(docs)
    val banded = minhashCandidates(hashes, bands).agg(count(lit(1)).as("cand_banded"))
    val sized = minhashCandidatesSized(hashes, bands, tau, kEst)
      .agg(count(lit(1)).as("cand_sized"))
    val verified = minhashPairs(docs, tau, bands, kEst)
      .agg(count(lit(1)).as("pairs_verified"))
    banded.crossJoin(sized).crossJoin(verified)
      .select(lit(n).as("n_docs"), lit(MinhashK.toLong).as("k_band"),
        lit(bands.toLong).as("n_bands"), lit(kEst.toLong).as("k_est"),
        lit(minMatches).as("min_matches"),
        col("cand_banded"), col("cand_sized"), col("pairs_verified"))
  }

  private[graft] def minhashCandidates(hashes: DataFrame, bands: Int): DataFrame = {
    val banded = minhashBands(hashes, bands).drop("hs")
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash-banded fuzzy decontamination — the NEAR-duplicate form of
    * train/eval overlap checking. Exact n-gram containment
    * (TextOps.decontaminate / decontaminateSpans) only catches verbatim
    * leakage; lightly-edited eval copies slip through. Here benchmark
    * docs are banded exactly like [[minhashBands]], corpus docs probe
    * the bench bands, and every banded candidate is verified with the
    * exact shingle Jaccard. Per corpus doc: candidate count, the best
    * bench match by (jaccard DESC, bench_id ASC — deterministic), and
    * the verdict at `tau`. Shingle-less docs report zero candidates.
    *
    * Scale shape: the bench side is an eval suite — thousands of docs,
    * not billions — so its band table and shingle lists BROADCAST; the
    * corpus is never self-joined and never shuffles text. n_cand and
    * the best match ride ONE doc_id window partition (count + rank
    * share the exchange); the final enrich join is on the 8-byte
    * doc_id. Candidates stay band-bounded exactly as in
    * [[minhashPairs]].
    */
  def decontaminateFuzzy(docs: DataFrame, isBench: Column, tau: Double = 0.5,
                         bands: Int = 4): DataFrame = {
    val hashes = shingleHashes(docs)
    val banded = minhashBands(hashes, bands).drop("hs")
    val benchBands = banded.filter(isBench)
      .select(col("doc_id").as("bench_id"), col("band_id"), col("band_val"))
    val cand = banded.filter(!isBench)
      .join(broadcast(benchBands), Seq("band_id", "band_val"))
      .select(col("doc_id"), col("bench_id")).distinct()
    val ha = hashes.select(col("doc_id"), col("hs").as("ha"))
    // bench-only: broadcasting the unfiltered shingle table would ship
    // the whole corpus to every executor at scale
    val hb = hashes.filter(isBench)
      .select(col("doc_id").as("bench_id"), col("hs").as("hb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val best = cand.join(ha, "doc_id").join(broadcast(hb), "bench_id")
      .withColumn("inter", expr("graft_intersect_size(ha, hb)"))
      .withColumn("best_jaccard",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
      .withColumn("n_cand", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("best_jaccard").desc, col("bench_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("n_cand"), col("bench_id").as("best_bench"),
        col("best_jaccard"))
    hashes.filter(!isBench).select(col("doc_id"), col("n_sh").as("n_shingles"))
      .join(best, Seq("doc_id"), "left")
      .withColumn("n_cand", coalesce(col("n_cand"), lit(0L)))
      .withColumn("contaminated", coalesce(col("best_jaccard") >= tau, lit(false)))
  }

  /** INCREMENTAL snapshot delta — the recurring-ingestion workflow: a
    * NEW shard classified against the BASE corpus as exact_dup (same
    * content hash as a base doc), near_dup (banded-MinHash candidate
    * verified at Jaccard ≥ tau against a base doc), or novel. The scale
    * property is the asymmetry: the new shard probes base indexes and is
    * NEVER self-joined — at 100 TB the base band/hash tables are
    * materialized once (Bucketing / DedupStream.writeNearDupIndex is the
    * streaming twin) and per-ingest cost tracks the SHARD, not the
    * corpus. New-vs-new duplication is deliberately out of scope (that
    * is the full dedup pass's job); a doc can be both exact- and
    * near-dup — exact wins. The sized est pre-filter applies exactly as
    * in [[minhashCandidatesSized]] (pass kEst = sizedEstK(corpus n)).
    *
    * Output per NEW doc: (doc_id, status, base_id, jaccard) — base_id =
    * the smallest matching base doc (exact) or the best verified match
    * by (jaccard DESC, base_id ASC) (near); jaccard = 1.0 for exact
    * (byte-identical text), null for novel.
    */
  def snapshotDelta(docs: DataFrame, isNew: Column, tau: Double = 0.5,
                    bands: Int = 4, kEst: Int = MinhashK): DataFrame = {
    val minMatches = math.ceil(kEst * tau / 2).toLong
    val withHash = docs.withColumn("__ch", md5(col("text").cast("binary")))
    val nw = withHash.filter(isNew)
    val base = withHash.filter(!isNew)
    val exact = nw.select(col("doc_id"), col("__ch"))
      .join(base.groupBy(col("__ch")).agg(min(col("doc_id")).as("base_id")), "__ch")
      .select(col("doc_id"), col("base_id"))
    val hashes = shingleHashes(docs)
    val banded = minhashBands(hashes, bands)
      .select(col("doc_id"), col("n_sh"), col("band_id"), col("band_val"))
    val newB = banded.join(nw.select(col("doc_id")), "doc_id")
    val baseB = banded.join(base.select(col("doc_id")), "doc_id")
      .select(col("doc_id").as("base_id"), col("n_sh").as("base_n_sh"),
        col("band_id"), col("band_val"))
    val cand = newB.join(baseB, Seq("band_id", "band_val"))
      .filter(least(col("n_sh"), col("base_n_sh")).cast("double") >=
        lit(tau) * greatest(col("n_sh"), col("base_n_sh")))
      .select(col("doc_id"), col("base_id")).distinct()
    // r17 opt: the size(hs) > 0 pre-filter dropped — its pushdown
    // inlined the shingle kernel into the filter condition (one extra
    // kernel eval per row), and it was redundant: sig is consumed
    // through INNER joins against band-derived candidates, whose docs
    // all banded (non-empty hs). A shingle-less doc's sg is the all-P
    // sentinel (MinhashSigImpl on an empty array), cheap and never
    // joined.
    val sig = hashes
      .select(col("doc_id"), expr(s"graft_minhash_sig(hs, $kEst)").as("sg"))
    val candEst = cand
      .join(sig.select(col("doc_id"), col("sg").as("sga")), "doc_id")
      .join(sig.select(col("doc_id").as("base_id"), col("sg").as("sgb")), "base_id")
      .filter(expr("graft_match_count(sga, sgb)") >= minMatches)
      .select(col("doc_id"), col("base_id"))
    val ha = hashes.select(col("doc_id"), col("hs").as("ha"))
    val hb = hashes.select(col("doc_id").as("base_id"), col("hs").as("hb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("base_id"))
    val near = candEst.join(ha, "doc_id").join(hb, "base_id")
      .withColumn("inter", expr("graft_intersect_size(ha, hb)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("ha")) + size(col("hb")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("base_id").as("near_id"), col("jaccard"))
    nw.select(col("doc_id"))
      .join(exact.select(col("doc_id"), col("base_id").as("exact_id")), Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_id").isNotNull, "exact_dup")
          .when(col("near_id").isNotNull, "near_dup")
          .otherwise("novel").as("status"),
        coalesce(col("exact_id"), col("near_id")).as("base_id"),
        when(col("exact_id").isNotNull, lit(1.0)).otherwise(col("jaccard")).as("jaccard"))
  }

  /** Connected components of the banded-MinHash near-dup graph —
    * CLUSTER-level dedup. Pairwise loser-dropping is not transitive (in a
    * chain a~b~c it drops b AND c even though c only resembles b, and a
    * pairwise rule applied per-pair can drop both endpoints of an edge
    * whose partners were already dropped); the correct keeper rule needs
    * the component: every doc maps to the SMALLEST doc_id reachable
    * through near-dup pairs (singletons map to themselves), keep one doc
    * per component_id.
    *
    * Iterative min-label propagation: each round every doc takes the min
    * of its own label and its neighbors' labels — two hash joins + one
    * aggregate per round, converging in graph-diameter rounds (near-dup
    * clusters are near-cliques, so 2-3 in practice; `maxIter` bounds
    * pathological chains). `localCheckpoint` truncates the plan lineage
    * per round — without it the iteration re-analyzes a plan that doubles
    * every round. At 100 TB the same loop runs with the alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce") to cut rounds to O(log n); the per-round
    * dataflow — join, min-aggregate, join — is identical.
    *
    * Deterministic: labels only decrease toward the unique per-component
    * minimum, so the fixpoint is partition- and order-independent. The
    * oracle replays it as a recursive transitive closure.
    */
  def components(docs: DataFrame, tau: Double = 0.5, bands: Int = 4,
                 maxIter: Int = 20, kEst: Int = MinhashK): DataFrame = {
    val pairs = minhashPairs(docs, tau, bands, kEst).select("doc_a", "doc_b")
    joinBackLabels(docs, propagateMinLabels(pairs, maxIter))
  }

  /** [[components]] with the alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the 100-TB form: rounds are O(log n) in the component size instead
    * of O(diameter), so a pathological near-dup chain of length L costs
    * ~log2(L) rounds, not L. Output is provably identical (both converge
    * to the per-component minimum label; DedupSpec asserts equality on
    * chain, clique and random graphs).
    */
  def componentsLogN(docs: DataFrame, tau: Double = 0.5, bands: Int = 4,
                     maxIter: Int = 25, kEst: Int = MinhashK): DataFrame = {
    val pairs = minhashPairs(docs, tau, bands, kEst).select("doc_a", "doc_b")
    joinBackLabels(docs, starContract(pairs, maxIter))
  }

  /** Connected components of an ARBITRARY pair list over an arbitrary id
    * domain (columns `doc_a`/`doc_b`; `ids` supplies the full vertex set
    * as `doc_id`) via the O(log n) star contraction — the graph machinery
    * of [[componentsLogN]] decoupled from MinHash candidate generation,
    * e.g. for the embedding-cosine near-dup graph (`dedup_embedding_cc`).
    */
  def componentsOf(ids: DataFrame, pairs: DataFrame, maxIter: Int = 25): DataFrame =
    joinBackLabels(ids, starContract(pairs, maxIter))

  /** Cluster-size histogram of the near-dup component structure — the
    * corpus duplication report (how many clusters of each size, how many
    * docs they hold): the number every dedup run is judged by before
    * anyone looks at pairs. Two small aggregates over the component
    * labels; cluster_size=1 rows count the unduplicated corpus.
    */
  def clusterStats(docs: DataFrame, tau: Double = 0.5, bands: Int = 4,
                   kEst: Int = MinhashK): DataFrame =
    componentsLogN(docs, tau, bands, kEst = kEst)
      .groupBy(col("component_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .orderBy(col("cluster_size"))

  /** Similarity-distribution histogram over the banded-MinHash candidate
    * pairs — the tuning card for every near-dup threshold decision: how
    * many pairs live in each jaccard band, and how tight the bands run.
    * Unthresholded (tau = 0) so the whole candidate distribution shows;
    * candidates stay band-bounded, so the histogram costs what the dedup
    * run already pays. Per-bin stats are COUNT/MIN/MAX only — selections,
    * not float accumulations, so the doubles stay order-independent and
    * engine-exact (a mean would sum doubles in shuffle order).
    */
  def pairHist(docs: DataFrame, bands: Int = 4, bins: Int = 20): DataFrame = {
    require(bins >= 1, s"pairHist: bins must be >= 1, got $bins")
    minhashPairs(docs, tau = 0.0, bands)
      .withColumn("bin", least(floor(col("jaccard") * bins), lit((bins - 1).toLong)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("jaccard")).as("min_j"), max(col("jaccard")).as("max_j"))
      .orderBy(col("bin"))
  }

  /** Every corpus doc gets its component label; non-edge vertices
    * (singletons — the overwhelming majority) are their own component.
    */
  private def joinBackLabels(docs: DataFrame, labels: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("component_id"), col("doc_id")).as("component_id"))

  /** Frees the storage blocks of a superseded `localCheckpoint` — without
    * this every iteration's label snapshot lingers until the
    * ContextCleaner happens to GC it (round-7 VERDICT #2). A checkpointed
    * frame's plan is the bare `LogicalRDD` over the persisted RDD.
    */
  /** Rounds taken by the most recent components loop on this driver —
    * a measurement diagnostic read by the scale-curve tool (ScaleCurves)
    * right after a loop returns; not part of any operator contract.
    */
  @volatile private[graft] var lastRounds: Int = 0

  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Min-label propagation over a pair list: every vertex takes the min of
    * its own and its neighbors' labels per round — two hash joins + one
    * aggregate — until no label decreases. Rounds = graph diameter
    * (near-dup clusters are near-cliques, so 2-3 in practice; use
    * [[starContract]] when diameter is unbounded). Only EDGE vertices are
    * iterated — the (small) near-dup vertex set, never the whole corpus.
    *
    * Each round's state is a `localCheckpoint` (truncates the otherwise
    * per-round-doubling plan lineage), materialized BY the convergence
    * count — one driver-blocking job per round where the previous form
    * paid an eager-checkpoint job plus a join-shaped label-compare job;
    * the superseded round's blocks are freed immediately.
    *
    * @throws IllegalStateException when `maxIter` rounds pass while labels
    *         are still decreasing — a silently-unconverged result would be
    *         wrong with no signal (round-7 ADVICE).
    */
  private[graft] def propagateMinLabels(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // r17 opt (guide §1.2): symmetrize with a map-side explode, not a
    // self-union — the union's two branches each re-ran the whole pair
    // generation (MinHash banding + verify join) before the persist
    // caught the result; the explode computes pairs ONCE (the
    // coPurchaseEdges idiom). Row set identical: explode(array(a→b,
    // b→a)) emits exactly the union's rows.
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a"), col("doc_b")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .persist()
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("component_id"), lit(true).as("__changed"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges.join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(edges("doc_a").as("doc_id"))
        .agg(min(col("component_id")).as("nbr_min"))
      // labels only decrease — any strict decrease means another round.
      // The checkpoint is LAZY and the convergence count is what
      // materializes it: one driver-blocking job per round instead of
      // eager-checkpoint + separate scan (count touches every partition,
      // so the checkpoint is complete before the next round reads it).
      val next = labels.join(nbrMin, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          least(col("component_id"), coalesce(col("nbr_min"), col("component_id")))
            .as("component_id"),
          (coalesce(col("nbr_min"), col("component_id")) < col("component_id"))
            .as("__changed"))
        .localCheckpoint(false)
      converged = next.filter(col("__changed")).count() == 0
      unpersistCheckpoint(labels)
      labels = next
      it += 1
    }
    edges.unpersist()
    lastRounds = it
    if (!converged)
      throw new IllegalStateException(
        s"propagateMinLabels: labels still changing after $maxIter rounds " +
          "(graph diameter exceeds maxIter) — raise maxIter or use starContract")
    labels.select("doc_id", "component_id")
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.) over a
    * pair list; returns (doc_id, component_id) for every non-root edge
    * vertex (roots and singletons label themselves via the caller's
    * join-back). Each round halves the height of the hanging trees, so
    * rounds are O(log n) regardless of graph diameter; per-round dataflow
    * is the same two-hash-join + min-aggregate shape as
    * [[propagateMinLabels]], and the fixpoint is a star forest: every
    * vertex points directly at its component minimum.
    *
    *   - large-star: for each vertex u (over the symmetric adjacency),
    *     connect every strictly-larger neighbor to m = min(N(u) ∪ {u});
    *   - small-star: for each vertex u (over larger→smaller edges),
    *     connect u and all its smaller neighbors to min(N(u)).
    *
    * Both preserve connectivity, emit only (larger, smaller) edges, and
    * strictly shrink the potential function; convergence = edge-set
    * fixpoint, checked as equal count + empty anti-join on the (tiny,
    * checkpointed) edge frames.
    */
  private[graft] def starContract(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    var edges = pairs.filter(col("doc_a") =!= col("doc_b"))
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var prevCount = edges.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // NOTE (r17 opt, measured): `large` is read twice (minsS and the
      // small-star join) but BOTH readers re-shuffle it by `u` over the
      // same distinct subtree — canonically identical exchanges that
      // AQE's stage reuse already dedupes at runtime. An explicit
      // persist here was tried and REGRESSED the starContract consumers
      // (dedup_embedding_cc +34%, knn_consumer_card +16% at sf0.1):
      // it replaced free stage reuse with a per-round cache
      // materialization. Left as-is deliberately.
      val large = sym.join(minsL, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val minsS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      // lazy checkpoint materialized by the count below (one job), like
      // the propagation loop; set equality = same count + empty anti-join
      // (both sides distinct), with the previous round's count carried in
      // a var instead of recounted
      val small = large.join(minsS, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(minsS.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(false)
      val n = small.count()
      converged = n == prevCount &&
        small.join(edges, Seq("u", "v"), "left_anti").isEmpty
      prevCount = n
      unpersistCheckpoint(edges)
      edges = small
      it += 1
    }
    lastRounds = it
    if (!converged)
      throw new IllegalStateException(
        s"starContract: edge set still changing after $maxIter rounds")
    edges.select(col("u").as("doc_id"), col("v").as("component_id"))
  }

  /** SimHash signature width and per-bit universal-hash params (shared
    * with the oracle SQL, see [[graft.functions.SimHash60Impl]]).
    */
  val SimhashBits: Int = graft.functions.SimHash60Impl.Bits
  def simhashBitA: Seq[Long] = graft.functions.SimHash60Impl.A.toSeq
  def simhashBitB: Seq[Long] = graft.functions.SimHash60Impl.B.toSeq

  /** SimHash near-dup: 60-bit universal-hash simhash, banded into
    * `bands` equal bit-slices (default 4 × 15 bits = 32,768 values per
    * band — band cardinality is the scale knob, round-3 VERDICT #6: the
    * old 4 × 8-bit banding had 1,024 TOTAL buckets, so per-bucket
    * population — and the quadratic in-bucket pair join — grew linearly
    * with the corpus). Pairs sharing a band are verified by Hamming
    * distance ≤ tau. Shingle (not word) hashes keep signatures
    * well-spread even when the corpus shares one small vocabulary.
    */
  def simhashPairs(docs: DataFrame, tau: Int = 6, bands: Int = 4): DataFrame = {
    // integer truncation would silently band only bands*(60/bands) LOW
    // bits and never key on the top remainder — lost candidate recall
    // with no error (round-4 ADVICE); the banding below covers all 60
    // bits only when bands divides SimhashBits exactly
    require(SimhashBits % bands == 0,
      s"simhashPairs: bands=$bands must divide the $SimhashBits-bit signature exactly")
    val bits = SimhashBits / bands
    val mask = (1L << bits) - 1
    val sims = shingleHashes(docs).filter(size(col("hs")) > 0)
      .select(col("doc_id"), expr("graft_simhash60(hs)").as("sim"))
    val banded = sims.select(col("doc_id"), col("sim"),
      explode(array((0 until bands).map { bd =>
        struct(lit(bd).as("band_id"),
          shiftright(col("sim"), bits * bd).bitwiseAND(mask).as("band_val"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("sim"), col("band.band_id").as("band_id"),
        col("band.band_val").as("band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") && col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(max(col("a.sim")).as("sim_a"), max(col("b.sim")).as("sim_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= tau)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
