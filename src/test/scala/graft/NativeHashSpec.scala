package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeHash

/** Edge-case behavior of the native expressions (null propagation, empty
  * and short inputs) — the paths the corpus-driven specs never hit.
  */
class NativeHashSpec extends SparkSpec {

  private def df = {
    NativeHash.register(spark)
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'a b c d'), (2L, ''), (3L, 'one two'), (4L, CAST(NULL AS STRING))
        |AS t(id, text)""".stripMargin)
  }

  test("shingle hashes: null text -> null, short/empty text -> empty array") {
    val out = df.select(col("id"), expr("graft_shingle_hashes(text)").as("hs"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(out(4L) == null)
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty) // 2 words < 3-gram
    assert(out(1L).size === 2)
  }

  test("simhash/min-gram/lang-scores/text-stats propagate null and handle empties") {
    val out = df.select(col("id"),
      expr("graft_simhash32(graft_shingle_hashes(text))").as("sh"),
      expr("graft_min_gram_hash(text, 8)").as("mg"),
      expr("graft_lang_scores(text)").as("ls"),
      expr("graft_text_stats(text)").as("ts"))
    val r4 = out.filter(col("id") === 4).head
    assert((1 to 4).forall(r4.isNullAt))
    val r2 = out.filter(col("id") === 2).head
    assert(r2.getLong(1) === 0L) // empty shingle set -> all-zero votes
    assert(r2.getLong(2) === 0L) // polyhash('') = 0
    assert(r2.getSeq[Long](3).forall(_ === 0L))
  }

  test("intersect-size and dot kernels match their HOF formulations") {
    val pairs = spark.sql(
      """SELECT array(1L,2L,3L,4L) AS a, array(3L,4L,5L) AS b,
        |       array(1.5D, -2.0D, 0.25D) AS x, array(2.0D, 0.5D, 4.0D) AS y""".stripMargin)
    NativeHash.register(spark)
    val r = pairs.select(
      expr("graft_intersect_size(a, b)"),
      size(array_intersect(col("a"), col("b"))).cast("long"),
      expr("graft_dot(x, y)"),
      aggregate(zip_with(col("x"), col("y"), (p, q) => p * q), lit(0.0), (s, v) => s + v)).head
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getDouble(2) === r.getDouble(3))
  }
}
