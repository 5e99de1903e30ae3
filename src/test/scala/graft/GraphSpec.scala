package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Fixed-point PageRank invariants (operators/Graph.scala). */
class GraphSpec extends SparkSpec {

  private val Scale = 1000000000000L
  private def lineitem = graft.sources.Tables.load(spark, sf, "lineitem")

  test("co-purchase edges are symmetric, deduplicated, and never self-looped") {
    val e = Graph.coPurchaseEdges(lineitem).cache()
    assert(e.filter(col("src") === col("dst")).count() === 0)
    assert(e.count() === e.distinct().count(), "edge list must be deduplicated")
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    assert(e.exceptAll(rev).count() === 0, "every edge must have its reverse")
    e.unpersist()
  }

  test("pagerank: mass conserved to integer-truncation dust, every rank >= the " +
      "teleport base, bit-identical across runs, and a hub outranks a leaf") {
    val edges = Graph.coPurchaseEdges(lineitem)
    val r = Graph.pageRank(edges, rounds = 5, scale = Scale).cache()
    val n = r.count()
    // each of the 5 rounds loses < 1 unit per (edge-contrib + node) to
    // integer division — dust, not drift
    val mass = r.agg(sum("r")).head().getLong(0)
    assert(mass <= n * Scale, "integer truncation can only lose mass")
    assert(n * Scale - mass < n * 500L, s"lost ${n * Scale - mass} — more than dust")
    val base = 15L * Scale / 100L
    assert(r.filter(col("r") < base).count() === 0, "teleport mass is a floor")
    // deterministic: a rerun reproduces every bit
    val again = Graph.pageRank(edges, rounds = 5, scale = Scale)
    assert(r.exceptAll(again).count() === 0)
    r.unpersist()
    // a hand-built 4-star: the hub must outrank the leaves, leaves tie
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("pa", "pb")
    val starEdges = star.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(star.select(col("pb").as("src"), col("pa").as("dst")))
    val sr = Graph.pageRank(starEdges, rounds = 5, scale = Scale)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(sr(1L) > sr(2L), "the hub must outrank a leaf")
    assert(Set(2L, 3L, 4L, 5L).map(sr).size === 1, "symmetric leaves must tie exactly")
  }

  test("broadcast-ranks variant is bit-identical to the shuffle-join plan " +
      "(the dimension-graph fast path changes the exchange, never the math)") {
    val edges = Graph.coPurchaseEdges(
      graft.sources.Tables.load(spark, sf, "lineitem"))
    val plain = Graph.pageRank(edges, rounds = 3)
    val bcast = Graph.pageRank(edges, rounds = 3, broadcastRanks = true)
    assert(bcast.exceptAll(plain).isEmpty && plain.exceptAll(bcast).isEmpty)
  }

  test("knn pagerank: planted dense-cluster members outrank scattered " +
      "periphery vectors (the representative-selection contract)") {
    import spark.implicits._
    val dim = graft.operators.Similarity.Dim
    // cluster: 8 near-identical unit vectors along e0 (tiny distinct
    // perturbations); periphery: 12 vectors each along its own axis with
    // a 0.3 pull toward the cluster — their nearest neighbors are cluster
    // members, never each other
    val cluster = (0 until 8).map { j =>
      val v = Array.fill(dim)(0.0f); v(0) = 1.0f; v(j + 1) = 0.05f
      (j.toLong, v.toSeq, 0)
    }
    val periphery = (0 until 12).map { j =>
      val v = Array.fill(dim)(0.0f); v(0) = 0.3f; v(j + 20) = 1.0f
      (100L + j, v.toSeq, 1)
    }
    val emb = (cluster ++ periphery).toDF("vec_id", "embedding", "label")
    val top = graft.operators.Graph.knnPageRank(emb, k = 5, probes = 2, topK = 8)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(top === (0L until 8L).toSet,
      s"the dense cluster must fill the top-8 representatives, got $top")
  }

  test("knn_pagerank_indexed: rank-from-index equals the direct build " +
      "bit-for-bit, and the bucketed edge scans plan with ZERO Exchange " +
      "(the build-once/rank-many contract)") {
    def exchanges(p: String): Int =
      p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val direct = Graph.knnPageRank(emb, k = 5, probes = 2).cache()
    val indexed = Graph.knnPageRankIndexed(emb,
      table = "graft_knn_edges_spec", k = 5, probes = 2)
    assert(indexed.exceptAll(direct).isEmpty && direct.exceptAll(indexed).isEmpty,
      "the bucketed layout must never change answers")
    direct.unpersist()
    // plan pins (broadcast disabled so bucketing, not a broadcast, is
    // what removes the shuffles): the degree aggregate and the
    // chunked-adjacency build both cluster on `src`, which the bucketed
    // layout already satisfies — the edge list is NEVER exchanged by
    // any rank-side consumer
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.table("graft_knn_edges_spec")
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      val pd = deg.queryExecution.executedPlan.toString
      assert(exchanges(pd) === 0,
        s"degree aggregate over the bucketed edges must not shuffle:\n$pd")
      val adj = e.join(deg.select(col("src"), col("d")), "src")
        .groupBy(col("src"), col("d"),
          expr("pmod(hash(dst), CAST((d + 1023) DIV 1024 AS INT))").as("__ck"))
        .agg(collect_list(col("dst")).as("dsts"))
      val pa = adj.queryExecution.executedPlan.toString
      assert(exchanges(pa) === 0,
        s"adjacency build over the bucketed edges must not shuffle:\n$pa")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("chunked-adjacency pagerank is bit-identical to the edge-list form — " +
      "on the symmetric co-purchase graph (both fast-path flags) and on a " +
      "DIRECTED chain where no-in-edge nodes must re-enter at the teleport base") {
    val edges = Graph.coPurchaseEdges(lineitem)
    val ref = Graph.pageRank(edges, rounds = 3).cache()
    // chunk = 4 forces real multi-chunk splits at any degree > 4
    val adjacency = Graph.pageRankAdjacency(edges, rounds = 3, chunk = 4)
    assert(adjacency.exceptAll(ref).isEmpty && ref.exceptAll(adjacency).isEmpty)
    val fast = Graph.pageRankAdjacency(edges, rounds = 3, chunk = 4,
      broadcastRanks = true, symmetric = true)
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
    ref.unpersist()
    // directed chain 1→2→3→4: node 1 has no in-edges and must hold the
    // teleport base every round — the completion join symmetric=true drops
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val chainRef = Graph.pageRank(chain, rounds = 3)
    val chainAdj = Graph.pageRankAdjacency(chain, rounds = 3, chunk = 4)
    assert(chainAdj.exceptAll(chainRef).isEmpty && chainRef.exceptAll(chainAdj).isEmpty)
    val base = 15L * Scale / 100L
    assert(chainAdj.filter(col("id") === 1L).head().getLong(1) === base)
  }
}
