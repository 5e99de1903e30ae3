package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextOps

/** Streaming corpus data cards — the live-ingest twin of the batch corpus
  * reports (TextOps.sourceStats). A crawl that lands parquet files
  * continuously keeps the per-(source, lang) inventory current without
  * rescanning the corpus: every aggregate in the card is
  * order-independent (counts, integer sums, min/max), so complete-mode
  * streaming aggregation state is ONE row per stratum — bounded by the
  * stratum count, never by documents — and an AvailableNow replay of the
  * whole corpus reproduces the batch card exactly (batch oracle
  * verbatim; StreamingSpec pins multi-batch replay equality).
  */
object CorpusStream {

  /** Complete-mode per-(source, lang) stats over a documents file stream.
    * Derived columns (avg tokens/doc) and the presentation sort ride
    * AFTER the aggregate, on stratum-count rows — both legal in complete
    * mode and free at any scale.
    */
  def sourceStatsStream(spark: SparkSession, docsPath: String,
                        outDir: String, checkpointDir: String,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val docs = TopicStream.fileStream(spark, docsPath, maxFilesPerTrigger)
    TopicStream.completeToParquet(spark, TextOps.sourceStats(docs),
      outDir, checkpointDir)
  }
}
