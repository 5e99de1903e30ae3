package graft

import org.apache.spark.sql.SparkSession

/** Driver gate (r15, the third CheckStream* twin — text side): runs the
  * streaming clean-corpus ingest (DedupStream.cleanIngestStream, the
  * documents replayed as 3 ordered splits through the file-stream
  * transport) over the given sf dir and checks its batched union ROW
  * FOR ROW against the batch flagship (TextOps.cleanCorpus) on the
  * same corpus. The static survivor/shingle indexes are fitted from
  * the full corpus (the stream's own offline-fit step), so every
  * content hash is index-known and the replay is arrival-order
  * independent by construction — what this gate adds over the
  * sf0.001..0.1 DuckDB oracles is the AT-SCALE plan: the bucketed
  * zero-Exchange probe joins and the exact inverted-index near-dup
  * probe at sf1+ row counts. Exits nonzero on any mismatch.
  *
  * Usage: runMain graft.CheckStreamClean <sfDir>
  */
object CheckStreamClean {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsPath = s"$sfDir/documents.parquet"
    val (out, ckpt) = streaming.TopicStream.scratchDirs("check_stream_clean", sfDir)
    // ascending-id splits: index-known hashes are order-independent
    // anyway (reconciliation), this just mirrors the production shape
    val splitDir = streaming.TopicStream.orderedSplitInput(
      spark, docsPath, 3, s"$out-input", idCol = "doc_id")
    val t0 = System.nanoTime()
    val streamed = graft.streaming.DedupStream.cleanIngestStream(
      spark, splitDir, out, ckpt, maxFilesPerTrigger = Some(1),
      tablePrefix = "graft_check_stream_clean")
      .select("doc_id", "quality").cache()
    val nStream = streamed.count()
    val tStream = (System.nanoTime() - t0) / 1e9
    println(f"[check-stream-clean] streamed $nStream rows in $tStream%.1f s (3 batches, fit included)")
    val t1 = System.nanoTime()
    val batch = graft.operators.TextOps.cleanCorpus(
      spark.read.parquet(docsPath))
      .select("doc_id", "quality").cache()
    val nBatch = batch.count()
    val tBatch = (System.nanoTime() - t1) / 1e9
    println(f"[check-stream-clean] batch    $nBatch rows in $tBatch%.1f s (same corpus)")
    // row-for-row: exceptAll both ways catches duplicates AND misses
    val missing = batch.exceptAll(streamed).count()
    val extra = streamed.exceptAll(batch).count()
    streamed.unpersist(); batch.unpersist()
    println(s"[check-stream-clean] rows=$nStream/$nBatch missing=$missing extra=$extra " +
      (if (missing == 0 && extra == 0 && nStream == nBatch) "(stream union == batch)"
       else "(MISMATCH)"))
    spark.stop()
    if (missing != 0 || extra != 0 || nStream != nBatch) sys.exit(1)
  }
}
