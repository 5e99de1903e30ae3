package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Co-located-join proof: a join of two tables bucketed on the join key
  * (same bucket count) plans with ZERO Exchange nodes, while the same
  * join over plain parquet shuffles both sides. Broadcast is disabled
  * for the comparison so bucketing — not a broadcast — is what removes
  * the shuffle (the fact-fact case broadcast can't help with).
  */
class BucketingSpec extends SparkSpec {

  private def exchanges(p: String): Int =
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")

  test("co-bucketed fact-fact join plans without any Exchange; results unchanged") {
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
    Bucketing.writeBucketed(orders, "orders_b", 4, "o_orderkey")
    Bucketing.writeBucketed(lineitem, "lineitem_b", 4, "l_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketing.cobucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey", "l_orderkey")
        .select(col("o_orderkey"), col("o_orderpriority"), col("l_quantity"))
      val pb = bucketed.queryExecution.executedPlan.toString
      assert(exchanges(pb) === 0,
        s"co-bucketed join must not shuffle either side:\n$pb")

      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("l_quantity"))
      val pp = plain.queryExecution.executedPlan.toString
      assert(exchanges(pp) >= 2,
        s"the unbucketed twin should shuffle both sides (else this spec proves nothing):\n$pp")

      // layout must not change answers
      assert(bucketed.except(plain).count() === 0)
      assert(plain.except(bucketed).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("co-bucketed ask: record⋈decision join AND decision dedup plan with zero " +
      "Exchange on the topic surface; results equal the broadcast twin") {
    import graft.operators.TopicOps
    import graft.sources.Topics
    val t = Topics.events(spark, sf)
    val decisions = t.filter(col("offset") % 3 === 0)
      .select(col("topic"), col("partition"), col("offset"),
        when(col("offset") % 2 === 0, "merge").otherwise("purge").as("action"))
    TopicOps.writeAskTables(t, decisions, "topic_b", "decisions_b", numBuckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = TopicOps.routeWithDecisionsCobucketed(
        spark, "topic_b", "decisions_b", "events.v2")
      val pb = bucketed.queryExecution.executedPlan.toString
      // the FULL ask pipeline — dedup aggregate + fact-fact left join +
      // fan-out projection — rides the (topic, partition, offset)
      // bucketing end to end: no Exchange anywhere
      assert(exchanges(pb) === 0,
        s"co-bucketed ask must not shuffle either side:\n$pb")

      val batch = TopicOps.routeWithDecisions(t, decisions, "events.v2")
      assert(bucketed.count() === batch.count())
      assert(bucketed.drop("headers").except(batch.drop("headers")).count() === 0)
      assert(batch.drop("headers").except(bucketed.drop("headers")).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS topic_b")
      spark.sql("DROP TABLE IF EXISTS decisions_b")
    }
  }

  test("co-bucketed join works when both sides share the SAME key name") {
    val orders = Tables.load(spark, sf, "orders")
      .withColumnRenamed("o_orderkey", "orderkey")
    val lineitem = Tables.load(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "orderkey")
    Bucketing.writeBucketed(orders, "orders_sk", 4, "orderkey")
    Bucketing.writeBucketed(lineitem, "lineitem_sk", 4, "orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // ADVICE round 2 #3: col(leftKey) === col(rightKey) raised
      // AMBIGUOUS_REFERENCE here — the most common co-bucketed layout
      val joined = Bucketing.cobucketedJoin(spark, "orders_sk", "lineitem_sk",
        "orderkey", "orderkey")
      val pj = joined.queryExecution.executedPlan.toString
      assert(exchanges(pj) === 0,
        s"same-name co-bucketed join must not shuffle either side:\n$pj")
      val expected = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_sk")
      spark.sql("DROP TABLE IF EXISTS lineitem_sk")
    }
  }

  test("r18 N-adaptive edge-index buckets: writeKnnEdgeIndex lays out " +
      "max(8, session shuffle width) buckets, and an explicit count still wins") {
    import graft.operators.Graph
    val emb = Tables.load(spark, sf, "embeddings")
    val width = spark.sessionState.conf.numShufflePartitions
    assert(Graph.sizedIndexBuckets(spark) === math.max(8, width),
      "the bucket ladder is session width floored at the historical 8")
    def numBuckets(table: String): Int =
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec.map(_.numBuckets)
        .getOrElse(fail(s"$table lost its bucket spec"))
    try {
      Graph.writeKnnEdgeIndex(emb, "graft_knn_bkt_spec")
      assert(numBuckets("graft_knn_bkt_spec") === Graph.sizedIndexBuckets(spark),
        "default writes must follow the session-width ladder")
      Graph.writeKnnEdgeIndex(emb, "graft_knn_bkt_spec8", buckets = 8)
      assert(numBuckets("graft_knn_bkt_spec8") === 8,
        "an explicit bucket count must be honored verbatim")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_knn_bkt_spec")
      spark.sql("DROP TABLE IF EXISTS graft_knn_bkt_spec8")
    }
  }
}
