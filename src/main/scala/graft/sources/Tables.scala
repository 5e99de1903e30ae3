package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

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

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`: the
    * events table carries TIMESTAMP(NANOS) which Spark's vectorized reader
    * otherwise rejects. The raw long is floored to micros with integer DIV
    * (a double division would lose precision above 2^53 — epoch-nanos are
    * ~1.7e18), matching DuckDB's `CAST(ts AS TIMESTAMP)` truncation used by
    * every oracle.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
}
