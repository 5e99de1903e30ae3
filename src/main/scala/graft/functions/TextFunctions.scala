package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline ops.
  *
  * Everything here is built from codegen'd built-in functions and
  * higher-order functions (no Scala UDFs) so the hot path stays inside
  * whole-stage codegen AND the exact same integer arithmetic can be
  * replicated in the DuckDB oracle SQL (see PipelineQueries fragments).
  */
object TextFunctions {

  /** Modulus for the polynomial rolling hash; fits h*31+cp in a long. */
  val HashMod = 1000000007L

  /** Lowercased whitespace tokens. The split class is RE2's \s spelled
    * out — [ \t\n\f\r], WITHOUT vertical tab — because the DuckDB oracle
    * (RE2) is the semantics contract and Java's \s would also swallow
    * U+000B. Kernels use the identical class.
    */
  def words(text: Column): Column = split(lower(trim(text)), "[ \\t\\n\\f\\r]+")

  /** Polynomial rolling hash over codepoints: h = (h*31 + cp) mod 1e9+7.
    * Left fold — deterministic, order-fixed, identical in Spark (aggregate),
    * DuckDB (list_reduce) and JVM Scala (Multimodal.polyhashStr).
    */
  def polyhash(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (h, cp) => (h * 31L + cp) % HashMod)

  /** Native twin of [[polyhash]] (the graft_polyhash kernel): identical
    * codepoint fold as ONE codegen'd JVM call instead of an interpreted
    * split→transform→aggregate chain that allocates a per-character
    * array per row. Call sites must `NativeHash.register` the session
    * first (idempotent). HOF/native parity is pinned in NativeHashSpec.
    */
  def polyhashNative(s: Column): Column = call_function("graft_polyhash", s)

  /** Distinct word n-gram shingles. Guarded: Spark's sequence(1, 0) counts
    * DOWN, so short docs must short-circuit to an empty array explicitly.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = words(text)
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + o)): _*))
    array_distinct(when(size(ws) < n, array().cast("array<string>")).otherwise(grams))
  }

  /** Distinct 3-gram shingle hashes from a pre-materialized word-hash array
    * column: gram hash = ((h1*31+h2) mod M * 31 + h3) mod M — pure integer
    * combine, no per-shingle string building or char folding.
    *
    * IMPORTANT: `wh` must be a bound attribute (its own projection), not an
    * inline expression — interpreted HOF eval re-computes an inlined array
    * for every element_at reference (observed 20×+ slowdown).
    */
  def combineShingles3(wh: Column): Column = {
    val grams = transform(
      sequence(lit(1), size(wh) - 2),
      i => (((element_at(wh, i) * 31L + element_at(wh, i + 1)) % HashMod) * 31L
        + element_at(wh, i + 2)) % HashMod)
    array_distinct(when(size(wh) < 3, array().cast("array<long>")).otherwise(grams))
  }

  /** Count of tokens (a pre-split words array) contained in `list`. */
  def stopwordHits(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(list)))

  /** Per-language stopword lists for language ID (common closed-class
    * words per language); the baked-in table of [[LangScores]].
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "que"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you", "he"))

  /** MinHash signature entry j: min over shingle hashes of (a*h + b) mod p.
    * p = 2^31-1 keeps a*h inside a long.
    */
  val MinhashP = 2147483647L

  def minhash(shingleHashes: Column, a: Long, b: Long): Column =
    array_min(transform(shingleHashes, h => (h * a + b) % MinhashP))

  /** 32-bit SimHash over token hashes: bit i is set when more than half the
    * tokens have bit i set in their hash.
    */
  def simhash32(tokenHashes: Column): Column =
    (0 until 32).map { i =>
      val votes = aggregate(tokenHashes, lit(0L),
        (s, h) => s + shiftright(h, i).bitwiseAND(1L))
      when(votes * 2 > size(tokenHashes), lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
}
