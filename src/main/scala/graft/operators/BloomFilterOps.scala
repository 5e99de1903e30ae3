package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hand-built broadcast Bloom filter — the runtime join-pruning filter as
  * an EXPLICIT, measurable operator.
  *
  * Spark's own runtime bloom (`spark.sql.optimizer.runtime.bloomFilter.*`)
  * is planner-internal: it fires or not by cost estimate and its false-
  * positive behavior is unobservable. At 100 TB the decision "ship a 8 KiB
  * filter to every probe task vs shuffle 10 TB of fact rows that will not
  * join" is worth making deliberately, with the filter's quality measured
  * on the actual key distribution — that measurement is [[card]].
  *
  * Design:
  *   - k=2 independent LCG hash positions per key over `mBits` bits packed
  *     into 60-bit words (words stay NON-NEGATIVE so `>>`/`&` probing is
  *     sign-free in every engine — same convention as the simhash bands).
  *     All arithmetic is (key mod P)·a + b mod P mod m on BIGINTs with
  *     a < 2^31 — products stay under 2^61, no overflow in Spark's ANSI
  *     mode and bit-identical in DuckDB.
  *   - The build side collapses to `mBits/60` words via ONE map-side
  *     combinable bit_or hash aggregate — the word table is a constant
  *     ~`mBits/8`-byte dimension regardless of build-key count.
  *   - The probe side never shuffles: positions are narrow projections and
  *     the word table joins BROADCAST (twice, once per hash) — exactly the
  *     shape a planner-injected runtime filter compiles to, but explicit.
  */
object BloomFilterOps {
  val P = 1000000007L
  val BitsPerWord = 60
  /** (a, b) LCG multipliers — classic glibc/Borland constants, both < 2^31. */
  val Hashes: Seq[(Long, Long)] = Seq((1103515245L, 12345L), (22695477L, 1L))

  private def hashPos(key: Column, h: (Long, Long), mBits: Long): Column =
    pmod(pmod(pmod(key, lit(P)) * h._1 + h._2, lit(P)), lit(mBits))

  /** The filter itself: (w, word) rows, one per occupied 60-bit word. */
  def wordTable(keys: DataFrame, mBits: Long): DataFrame =
    keys
      .select(explode(array(Hashes.map(h => hashPos(col("k"), h, mBits)): _*)).as("h"))
      .groupBy(expr(s"h DIV $BitsPerWord").as("w"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(h % $BitsPerWord AS INT)))")
        .as("word"))

  /** Probe rows with a `pass` flag — the pruned scan is `filter(pass)`.
    * A missing word reads as 0 (coalesce), so an empty filter passes
    * nothing and probing never null-poisons downstream predicates.
    */
  def probe(probeKeys: DataFrame, words: DataFrame, mBits: Long): DataFrame = {
    val withPos = Hashes.zipWithIndex.foldLeft(probeKeys) { case (df, (h, i)) =>
      df.withColumn(s"h${i + 1}", hashPos(col("k"), h, mBits))
    }
    val joined = Hashes.indices.foldLeft(withPos) { case (df, i) =>
      val j = i + 1
      df.join(
        broadcast(words.select(col("w").as(s"w$j"), col("word").as(s"word$j"))),
        expr(s"h$j DIV $BitsPerWord") === col(s"w$j"), "left_outer")
    }
    joined.withColumn("pass",
      Hashes.indices.map { i =>
        val j = i + 1
        expr(s"(shiftright(coalesce(word$j, CAST(0 AS BIGINT)), " +
          s"CAST(h$j % $BitsPerWord AS INT)) & 1) = 1")
      }.reduce(_ && _))
  }

  /** One-row quality card: build size, occupancy, probe volume, pass
    * volume, exact-match truth, false positives, and the measured FP rate
    * over true negatives. Every count is integer-exact; fp_rate is ONE
    * IEEE division of exact longs, so both engines agree bit-for-bit.
    */
  def card(probeKeys: DataFrame, buildKeys: DataFrame,
           mBits: Long = 61440L): DataFrame = {
    require(mBits % BitsPerWord == 0, s"mBits must be a multiple of $BitsPerWord")
    val words = wordTable(buildKeys, mBits)
    val passStats = probe(probeKeys, words, mBits)
      .agg(count(lit(1)).as("n_probe"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
    val truth = probeKeys.join(buildKeys, Seq("k"), "left_semi")
      .agg(count(lit(1)).as("n_true"))
    buildKeys.agg(count(lit(1)).as("n_build_keys"))
      .crossJoin(words.agg(sum(bit_count(col("word")).cast("long")).as("bits_set")))
      .crossJoin(passStats)
      .crossJoin(truth)
      .select(col("n_build_keys"), col("bits_set"), col("n_probe"), col("n_pass"),
        col("n_true"), (col("n_pass") - col("n_true")).as("n_false_pos"),
        ((col("n_pass") - col("n_true")).cast("double") /
          (col("n_probe") - col("n_true")).cast("double")).as("fp_rate"))
  }
}
