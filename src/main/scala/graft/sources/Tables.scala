package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All operators take a scale-factor directory and read parquet directly so
  * Catalyst sees the scan — filters/projections push down to the parquet
  * reader (checked via `.explain` in the specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true` (the
    * events table carries TIMESTAMP(NANOS), which Spark's vectorized reader
    * otherwise rejects) and SHOULD set
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false` so naive
    * `timestamp[us]` columns (isAdjustedToUTC=false) infer directly as
    * session-zone TIMESTAMP — inferring NTZ and casting after the scan
    * would sit a Cast between the filter and the parquet reader and lose
    * predicate pushdown on those columns. [[normalize]] still casts any
    * NTZ column that slips through a foreign session's inference.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalizes timestamp storage variants across test-data generations to
    * session-zone TIMESTAMP, the type watermarks and the typed topic
    * encoders require: a raw nanos long is floored to micros with integer
    * DIV (double division loses precision above 2^53), and naive
    * `timestamp[us]` columns (isAdjustedToUTC=false, inferred as
    * TIMESTAMP_NTZ) are cast in place. Sessions run in UTC, so both casts
    * are value-identical to DuckDB's naive read of the same parquet.
    */
  /** Scale-adaptive parallelism repair for per-row-HEAVY downstream work
    * (r17, guide §2.5 "input skew — one huge unsplittable file"): parquet
    * splits align to row groups, so a single-row-group file scans as ONE
    * task no matter what maxPartitionBytes says — and a codec/kernel
    * seam above it then runs the whole corpus on one core (measured:
    * mm_decode_jpeg 4.2 s at sf0.1 on the driver's single-row-group
    * documents.parquet — 1,667 JPEG roundtrips serialized on 1 of 32
    * cores). When the planned scan width is below the session's
    * parallelism, hash-repartition the NARROW pre-kernel rows by `key`
    * (deterministic routing — no round-robin retry hazard, no
    * sort-before-repartition); when the input already splits to session
    * width (any real multi-file / multi-row-group layout — the 100-TB
    * case), this is a NO-OP and the plan is unchanged. Every caller's
    * per-row computation is partitioning-invariant by the engine-exact
    * discipline (DeterminismSpec), so results are bit-identical either
    * way. UNBOUNDED streaming frames pass through untouched (no RDD to
    * inspect; micro-batch parallelism is the trigger's own dial) — but
    * a foreachBatch micro-batch frame has isStreaming=false and a
    * LogicalRDD leaf, i.e. it IS scan-shaped and DOES get spread when
    * it arrives narrower than the session (r18, ADVICE: the r17 comment
    * claimed otherwise). That is intentional: a file-stream batch reads
    * as one split exactly like the batch corpus, so per-row-heavy
    * ingest probes would serialize per batch; StreamingSpec pins the
    * resulting (bounded, batch-side) exchange count.
    */
  def spreadScan(df: DataFrame, key: String): DataFrame = {
    if (df.isStreaming || !df.columns.contains(key)) return df
    // Probe ONLY scan-shaped frames (projection/filter/generate/limit
    // chains over a relation): anything with a shuffle-producing node
    // (join, aggregate, window, sort, repartition, union) already runs
    // at session width — and, decisively, materializing `.rdd` on such
    // an AQE plan EXECUTES its shuffle stages eagerly in a throwaway
    // query execution (measured: +0.6-0.8 s on the clean-corpus rows
    // whose near-dup stage sits over a join output). For a scan-shaped
    // plan `.rdd` is pure planning — it just exposes the file-split
    // count.
    // Deduplicate is deliberately NOT whitelisted (r18, ADVICE):
    // distinct/dropDuplicates plans a shuffle, so the .rdd probe below
    // would eagerly execute it (the +0.6-0.8 s throwaway-execution cost
    // this guard exists to avoid) — and its output already runs at
    // session width, so the spread would buy nothing.
    import org.apache.spark.sql.catalyst.plans.logical._
    val scanShaped = df.queryExecution.analyzed.collect {
      case n @ (_: Project | _: Filter | _: Generate | _: SubqueryAlias |
                _: GlobalLimit | _: LocalLimit) => n
      case l: LeafNode => l
    }.size == df.queryExecution.analyzed.collect { case n => n }.size
    if (!scanShaped) return df
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= width) df
    else df.repartition(width, col(key))
  }

  def normalize(df: DataFrame): DataFrame = {
    val nanosFixed =
      if (df.columns.contains("ts") && df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      else df
    nanosFixed.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(nanosFixed)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }
}
