package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components — PageRank in
  * FIXED-POINT integer arithmetic, over graphs the engine already builds
  * (the co-purchase graph here; the ANN kNN graph of
  * [[Similarity.knnJoinIvf]] is the drop-in curation variant — PageRank
  * centrality over a similarity graph is a standard diversity/
  * representative-selection signal).
  *
  * Float PageRank is engine- and order-dependent (a parallel float sum
  * per destination); this one is exact: ranks are BIGINT fixed-point
  * (`scale` = 1.0), each round is
  *   r'(v) = (15·scale) div 100 + (85 · Σ_{u→v} r(u) div deg(u)) div 100
  * — every operation an integer div/sum, so any partitioning, any engine,
  * any round order produces the same bits. Mass is conserved up to
  * integer-truncation dust (asserted in the spec).
  *
  * Scale shape: each round is ONE join of the edge list against the
  * current ranks (both keyed by the 8-byte node id) plus a map-side
  * combinable SUM per destination — the identical shuffle pattern
  * [[Dedup.componentsOf]] runs, with the same skew answer (a celebrity
  * node's incoming sum is a hash-aggregate, never a window). The round
  * count is FIXED (power iteration, not convergence-detection), so the
  * plan is a straight 2·rounds-exchange chain; edges/degrees are built
  * once and reused by every round. Overflow headroom: 85·(total mass) =
  * 85·n·scale must stay under 2^63 — pick `scale` ≤ 9·10^16/n (the
  * default 10^12 is good to n ≈ 90k nodes; shrink it for bigger graphs,
  * the ranking is scale-invariant).
  */
object Graph {

  /** Undirected co-purchase edge list: parts that appear in the same
    * order, symmetrized, deduplicated. Pair fan-out per order is bounded
    * by lines-per-order² (TPC-H ≤ 7 lines ⇒ ≤ 21 pairs) — the self-join
    * is orderkey-keyed and never all-pairs across orders.
    */
  def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val a = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
    val pairs = a.join(b, Seq("ok"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb"))
      .distinct()
    pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(pairs.select(col("pb").as("src"), col("pa").as("dst")))
  }

  /** Power iteration over an (src, dst) edge list; returns every node's
    * fixed-point rank. Nodes are edge endpoints — an isolated vertex has
    * no edges to rank it by and is out of scope by construction.
    */
  def pageRank(edges: DataFrame, rounds: Int = 5,
               scale: Long = 1000000000000L,
               broadcastRanks: Boolean = false): DataFrame = {
    require(rounds >= 1, s"pageRank: rounds must be >= 1, got $rounds")
    val e = edges.persist()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d")).persist()
    val nodes = deg.select(col("id"))
    val base = (15L * scale) / 100L
    var ranks = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to rounds) {
      // per-node outgoing share FIRST (node-sized join), then ONE pass
      // over the edge list — the previous form joined the edge list
      // twice per round (once for ranks, once for degrees), doubling the
      // dominant shuffle (round-10: 6.7 s → measured below on the bench).
      // sum(r DIV d) is unchanged bit-for-bit: the share is computed
      // per source node and summed per destination exactly as before.
      val sharesPlain = ranks.join(deg, "id")
        .select(col("id").as("src"), expr("r DIV d").as("s"))
      // the share table is node-sized; when the node set is a bounded
      // dimension (parts), broadcasting it removes EVERY per-round
      // exchange of the fat edge list — the edges never reshuffle after
      // their one persist. At graph scale (nodes ≫ broadcast budget)
      // keep the default shuffle join.
      val shares = if (broadcastRanks) broadcast(sharesPlain) else sharesPlain
      val contrib = e.join(shares, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("s")).as("m"))
      ranks = nodes.join(contrib, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) DIV 100")).as("r"))
    }
    // eager finalize: the rank table is node-sized; materializing it here
    // lets the (edge-sized) persisted frames unpersist immediately instead
    // of leaking one cached edge list per invocation (bench reps
    // accumulated three) — the operator's total work is unchanged, it
    // just runs at construction
    val out = ranks.localCheckpoint(true)
    e.unpersist(false)
    deg.unpersist(false)
    out
  }

  /** The top-k co-purchase-centrality card over the lineitem graph. */
  def partsPageRank(lineitem: DataFrame, rounds: Int = 5, k: Int = 20,
                    scale: Long = 1000000000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("r").desc, col("id"))
    // the node set is the part dimension — bounded by construction, so
    // the per-round share table broadcasts and the edge list never
    // reshuffles after its one persist
    pageRank(coPurchaseEdges(lineitem), rounds, scale, broadcastRanks = true)
      .orderBy(col("r").desc, col("id"))
      .limit(k)
      .select(col("id").as("part_id"), col("r").as("rank_fp"),
        row_number().over(w).as("rnk"))
  }
}
