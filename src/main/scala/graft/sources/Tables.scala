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
