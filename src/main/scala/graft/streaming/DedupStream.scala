package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Dedup

/** Streaming set-similarity join: near-dup detection ON INGEST — the shape
  * a training-data pipeline actually needs ("is this newly crawled doc a
  * near-duplicate of anything in the corpus?").
  *
  * The incoming stream is shingled + MinHash-banded with the SAME
  * stateless projections as the batch operator, then stream-static joined
  * against the corpus band index; exact Jaccard verifies candidates. No
  * streaming state at all — each micro-batch is a bounded probe of the
  * (re-readable) corpus index, so this scales with the batch size, not
  * the stream history. At 100 TB the corpus index lives partitioned by
  * band_val; each probe shuffles only the micro-batch.
  */
object DedupStream {

  /** Pairs (corpus doc, new doc, jaccard ≥ tau). By default ANY distinct
    * corpus doc can match (a new doc's id may be smaller than its
    * duplicate's — detection must not depend on the id scheme);
    * `pairFilter` tightens this for the self-ingest replay gate, where
    * `corpus_id < new_id` emits each pair exactly once. Per-pair distinct
    * runs inside the sink (a new doc's exploded bands land in one
    * micro-batch, so per-batch distinct is complete — no cross-batch
    * state needed).
    */
  def nearDupIngest(corpusDocs: DataFrame, incoming: DataFrame,
                    tau: Double = 0.5, bands: Int = 4,
                    pairFilter: Column = col("corpus_id") =!= col("new_id")): DataFrame =
    nearDupIngestHashed(Dedup.shingleHashes(corpusDocs), incoming, tau, bands, pairFilter)

  /** As [[nearDupIngest]] but over a pre-computed (possibly persisted)
    * corpus shingle-hash frame — every micro-batch probes the index, so
    * callers should cache it rather than re-hash the corpus per trigger.
    */
  def nearDupIngestHashed(corpusHashes: DataFrame, incoming: DataFrame,
                          tau: Double = 0.5, bands: Int = 4,
                          pairFilter: Column = col("corpus_id") =!= col("new_id")): DataFrame = {
    val corpusIndex = Dedup.minhashBands(corpusHashes, bands)
      .select(col("doc_id").as("corpus_id"), col("band_id"), col("band_val"))
    val corpusSets = corpusHashes
      .select(col("doc_id").as("corpus_id"), col("hs").as("corpus_hs"))
    val streamBands = Dedup.minhashBands(Dedup.shingleHashes(incoming), bands)
      .select(col("doc_id").as("new_id"), col("hs").as("new_hs"),
        col("band_id"), col("band_val"))
    streamBands.join(corpusIndex, Seq("band_id", "band_val"))
      .filter(pairFilter)
      .join(corpusSets, "corpus_id")
      .withColumn("inter", expr("graft_intersect_size(corpus_hs, new_hs)"))
      .withColumn("jaccard",
        col("inter").cast("double")
          / (size(col("corpus_hs")) + size(col("new_hs")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("corpus_id").as("doc_a"), col("new_id").as("doc_b"), col("jaccard"))
  }

  /** Streams `docsPath` against the corpus at the same path (self-ingest:
    * replaying the corpus through the ingest detector reproduces exactly
    * the batch minhashPairs result — gate-checked with its oracle).
    */
  def nearDupIngestStream(spark: SparkSession, docsPath: String,
                          outDir: String, checkpointDir: String,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    TopicStream.deleteRecursively(Paths.get(outDir))
    java.nio.file.Files.createDirectories(Paths.get(outDir))
    // the corpus index is probed by EVERY micro-batch — cache it instead
    // of re-hashing the whole corpus per trigger
    val corpusHashes = Dedup.shingleHashes(spark.read.parquet(docsPath)).persist()
    try {
      val incoming = TopicStream.fileStream(spark, docsPath, maxFilesPerTrigger)
      val pairs = nearDupIngestHashed(corpusHashes, incoming,
        pairFilter = col("corpus_id") < col("new_id"))
      val q = pairs.writeStream
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // multi-band hits duplicate within the batch; distinct here is
          // complete because one doc's bands never span batches
          batch.dropDuplicates("doc_a", "doc_b")
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir)
    } finally corpusHashes.unpersist()
  }
}
