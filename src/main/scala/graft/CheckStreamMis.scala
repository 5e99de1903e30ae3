package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Driver gate (r15 VERDICT #3): the first at-scale gate for a
  * STREAMING twin. Runs the multi-batch streaming MIS assignment
  * (GraphStream.misAssignStream, 3 ordered splits replayed through the
  * file-stream transport) over the given sf dir and checks its batched
  * union ROW FOR ROW against the batch operator
  * (Graph.misAssignFromIndex) on the SAME materialized edge index —
  * the stream fits the index + MIS once, so the comparison isolates
  * the per-trigger assignment path, exactly what serves online. The
  * sf0.001..0.1 DuckDB oracles already gate both faces; this extends
  * the equality to sf1+, where the broadcast-free membership joins and
  * the bucketed probes take their at-scale plans. Exits nonzero on any
  * mismatch.
  *
  * Usage: runMain graft.CheckStreamMis <sfDir>
  */
object CheckStreamMis {
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
    val embPath = s"$sfDir/embeddings.parquet"
    val (out, ckpt) = streaming.TopicStream.scratchDirs("check_stream_mis", sfDir)
    val t0 = System.nanoTime()
    val streamed = graft.streaming.GraphStream.misAssignStream(
      spark, embPath, out, ckpt, splits = 3,
      tablePrefix = "graft_check_stream_mis")
      .select("vec_id", "rep_id", "cos", "is_rep").cache()
    val nStream = streamed.count()
    val tStream = (System.nanoTime() - t0) / 1e9
    println(f"[check-stream-mis] streamed $nStream rows in $tStream%.1f s (3 batches, fit included)")
    val t1 = System.nanoTime()
    val batch = graft.operators.Graph.misAssignFromIndex(
      spark, "graft_check_stream_mis_idx")
      .select("vec_id", "rep_id", "cos", "is_rep").cache()
    val nBatch = batch.count()
    val tBatch = (System.nanoTime() - t1) / 1e9
    println(f"[check-stream-mis] batch    $nBatch rows in $tBatch%.1f s (same index)")
    // row-for-row: exceptAll both ways catches duplicates AND misses
    val missing = batch.exceptAll(streamed).count()
    val extra = streamed.exceptAll(batch).count()
    streamed.unpersist(); batch.unpersist()
    println(s"[check-stream-mis] rows=$nStream/$nBatch missing=$missing extra=$extra " +
      (if (missing == 0 && extra == 0 && nStream == nBatch) "(stream union == batch)"
       else "(MISMATCH)"))
    spark.stop()
    if (missing != 0 || extra != 0 || nStream != nBatch) sys.exit(1)
  }
}
