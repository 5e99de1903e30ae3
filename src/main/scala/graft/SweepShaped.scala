package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r17b): recall pricing for the residual-book SHAPE dials
  * the r17 sweep left unswept — subspace count (M=8 → 16) and the fit
  * sample size (the measured K=64 overfit: 32 rows/cell on the 2048-row
  * sample vs the narrow book's 128). Arms ride
  * [[graft.operators.Similarity.ivfPqTopKFittedSizedShaped]]; the hq
  * row's composition (K=64 × refine×4, sample 2048) is re-measured
  * in-session as the calibration point.
  *
  * Usage: runMain graft.SweepShaped <sfDir>
  */
object SweepShaped {
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
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val isQuery = col("vec_id") < 8
    val S = graft.operators.Similarity
    val exactCos = S.bruteForceTopK(emb, isQuery, k = 10)
      .select("query_id", "corpus_id").cache()
    val nCos = exactCos.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "corpus_id").intersect(exactCos).count() / nCos
    // (label, pqM, pqK, sample, seedBase, refineMul)
    val arms = Seq(
      ("hq(8x64 s2048 r4)  [calibration]", 8, 64, 2048, 30000, 4),
      ("wideS8(8x64 s8192 r4)", 8, 64, 8192, 30000, 4),
      ("m16(16x16 s2048 r4)", 16, 16, 2048, 40000, 4),
      ("m16s8(16x16 s8192 r4)", 16, 16, 8192, 40000, 4),
      ("m16w(16x64 s8192 r4)", 16, 64, 8192, 41000, 4))
    for ((label, m, k, samp, base, rmul) <- arms) {
      val t0 = System.nanoTime()
      val r = recall(S.ivfPqTopKFittedSizedShaped(emb, isQuery, k = 10,
        pqM = m, pqK = k, pqFitSample = samp, pqSeedRowBase = base,
        refineMul = rmul))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[sweep-shaped] $sfDir $label%-28s recall@10=$r%.3f wall=$secs%.1fs")
    }
    exactCos.unpersist()
    spark.stop()
  }
}
