package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table ingress/egress — the source/sink seam beyond
  * parquet. A training-data pipeline's rawest inputs arrive as JSONL
  * (crawl dumps, API exports) or CSV (catalog/ledger extracts); both
  * readers here are SCHEMA-FIRST: inference would scan the data twice
  * and guess types per-run (a silently different schema per day is how
  * pipelines rot), so callers pass the authoritative schema and Spark's
  * reader plans a single typed scan with column pruning.
  *
  * Timestamps are written/read with explicit microsecond precision —
  * Spark's default JSON/CSV timestamp pattern carries milliseconds only,
  * which would silently truncate the micro-resolved `events.ts` and
  * break oracle parity (the same class of hazard as the nanos parquet
  * note in Tables.load).
  */
object Formats {

  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFormat)
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** CSV null sentinel: Spark's defaults write BOTH null and "" as an
    * empty field and read empty fields back as null, silently conflating
    * the two (round-4 ADVICE — a latent break for exactly the free-text
    * tables this seam exists for). Writing nulls as an explicit sentinel
    * and empty strings as a quoted empty field keeps the round trip
    * lossless; the residual CSV limitation — a data value LITERALLY equal
    * to the sentinel would collide — is the documented contract (pick a
    * table-safe sentinel, or use JSONL, whose null is first-class).
    */
  private val CsvNull = "\\N"

  /** CSV with a header row; `multiLine` covers quoted embedded newlines
    * (free-text columns), at the cost of file-at-a-time parallelism — at
    * scale prefer JSONL for such columns.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", CsvNull)
      .option("emptyValue", "\"\"")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", CsvNull)
      .option("emptyValue", "")
      .option("multiLine", multiLine.toString)
      .option("timestampFormat", TsFormat)
      .csv(path)
}
