package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Driver gate (late r15, the fourth CheckStream* twin): the two
  * stateless SCORING twins replayed multi-batch at scale and checked
  * row-for-row against their batch operators —
  *
  *   - stream_importance: the DSIR scorer probing the bucketed
  *     history-fitted weight index (vs TextOps.importanceWeights);
  *   - stream_pca_score: the fitted-axis projection (vs Pca.project).
  *
  * Both fit offline from the full corpus and score statelessly per
  * trigger, so a 3-ordered-split replay must equal batch exactly; the
  * sf0.001..0.1 DuckDB oracles already gate both faces — this extends
  * the equality to sf1+, where the bucketed weight probe and the
  * fitted-literal map take their at-scale plans. Exits nonzero on any
  * mismatch.
  *
  * Usage: runMain graft.CheckStreamScore <sfDir>
  */
object CheckStreamScore {
  private def compare(name: String, streamed: DataFrame,
                      batch: DataFrame): Boolean = {
    val s = streamed.cache(); val b = batch.cache()
    val nS = s.count(); val nB = b.count()
    val missing = b.exceptAll(s).count()
    val extra = s.exceptAll(b).count()
    s.unpersist(); b.unpersist()
    println(s"[check-stream-score] $name rows=$nS/$nB missing=$missing extra=$extra " +
      (if (missing == 0 && extra == 0 && nS == nB) "(stream union == batch)"
       else "(MISMATCH)"))
    missing == 0 && extra == 0 && nS == nB
  }

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

    val (outI, ckptI) = streaming.TopicStream.scratchDirs("check_stream_imp", sfDir)
    val docsSplit = streaming.TopicStream.orderedSplitInput(
      spark, s"$sfDir/documents.parquet", 3, s"$outI-input", idCol = "doc_id")
    val t0 = System.nanoTime()
    val streamedImp = streaming.ImportanceStream.importanceStream(
      spark, sfDir, outI, ckptI, maxFilesPerTrigger = Some(1),
      docsPath = Some(docsSplit))
    val tImp = (System.nanoTime() - t0) / 1e9
    val batchImp = operators.TextOps.importanceWeights(
      sources.Tables.load(spark, sfDir, "documents"), col("doc_id") % 97 === 0)
    val okImp = compare("importance", streamedImp, batchImp)
    println(f"[check-stream-score] importance stream wall $tImp%.1f s (3 batches, fit included)")

    val (outP, ckptP) = streaming.TopicStream.scratchDirs("check_stream_pca", sfDir)
    val embSplit = streaming.TopicStream.orderedSplitInput(
      spark, s"$sfDir/embeddings.parquet", 3, s"$outP-input", idCol = "vec_id")
    val t1 = System.nanoTime()
    val streamedPca = streaming.PcaStream.pcaScoreStream(
      spark, sfDir, outP, ckptP, maxFilesPerTrigger = Some(1),
      embPath = Some(embSplit))
    val tPca = (System.nanoTime() - t1) / 1e9
    val batchPca = operators.Pca.project(
      sources.Tables.load(spark, sfDir, "embeddings"))
    val okPca = compare("pca_score", streamedPca, batchPca)
    println(f"[check-stream-score] pca_score stream wall $tPca%.1f s (3 batches, fit included)")

    spark.stop()
    if (!okImp || !okPca) sys.exit(1)
  }
}
