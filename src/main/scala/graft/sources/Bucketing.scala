package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins — the storage-side half of
  * the 100-TB design (SURVEY.md §5).
  *
  * A fact-fact join (e.g. orders ⋈ lineitem, or the repeated
  * (topic, partition, key) joins of the DLQ/replay workflows) shuffles
  * BOTH sides on every run. Writing each table bucketed (and sorted)
  * by its join key pays that shuffle ONCE at write time; every
  * subsequent join of two co-bucketed tables (same key, same bucket
  * count) planned as a sort-merge join needs no Exchange at all — at
  * 100 TB that converts the dominant per-query cost into a one-time
  * layout cost. Asserted in BucketingSpec: the co-bucketed join plans
  * with zero Exchange nodes while the identical unbucketed join
  * shuffles both sides.
  *
  * Bucket count is a layout decision: pick `numBuckets` so one bucket
  * of the LARGER table fits an executor core's working set
  * (~SF × rowWidth / numBuckets ≤ a few hundred MB). Both sides must
  * use the same count — Spark only elides the exchange when the
  * output partitionings match.
  */
object Bucketing {

  /** Writes `df` as a managed parquet table bucketed AND sorted by
    * `key` — sorting inside buckets lets the sort-merge join skip its
    * sort too (files are read pre-ordered).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, key: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-located equi-join of two bucketed tables on their bucket key.
    * Plain `join` — the zero-shuffle plan falls out of the matching
    * bucket partitionings, not special code. Join columns are resolved
    * off each side's DataFrame, so the most common co-bucketed layout —
    * the SAME key name on both sides (one dimension key everywhere) —
    * doesn't raise AMBIGUOUS_REFERENCE.
    */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
                     leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
