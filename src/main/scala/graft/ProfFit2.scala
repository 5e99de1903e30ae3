package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch (r18): A/B the fit-sample layout — (A) as-shipped-r17
  * 1-partition xh cache, (B) spread raw rows then kernels, (C) kernels
  * then repartition the narrow xh — timing cache materialization and
  * the 3 assign/sum rounds separately. Usage: ProfFit2 <sfDir> [reps]
  */
object ProfFit2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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
    import graft.operators.Similarity
    graft.functions.NativeHash.register(spark)
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val dim = graft.functions.Codebooks.Dim
    val cents = graft.functions.Codebooks.fpCentroidsFor(128)
    val ones = Array.fill(128)(1.0)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "prof_assign",
      exprs => graft.functions.IvfBucket(exprs.head, cents, ones), "built-in")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def xhOf(src: DataFrame): DataFrame =
      Similarity.vectors(src)
        .withColumn("xh", expr("graft_fp_unit(e)"))
        .filter(col("xh").isNotNull)
        .select(col("xh"))
    def rounds(v: DataFrame, label: String): Unit = {
      t(s"$label cache materialize")(v.count())
      for (r <- 1 to 3)
        t(s"$label round $r") {
          v.withColumn("bucket", expr("prof_assign(xh)").cast("long"))
            .groupBy("bucket")
            .agg(count(lit(1)).as("n"),
              (0 until dim).map(i =>
                sum(element_at(col("xh"), i + 1).cast("long")).as(s"m$i")): _*)
            .collect()
        }
      v.unpersist()
    }
    for (rep <- 1 to reps) {
      println(s"[prof] --- rep $rep ---")
      rounds(xhOf(emb).persist(), "A(1-part)     ")
      rounds(xhOf(graft.sources.Tables.spreadScan(
        emb.select(col("vec_id"), col("embedding")), "vec_id")).persist(),
        "B(spread raw) ")
      rounds(xhOf(emb).repartition(cpus.toInt).persist(), "C(repart xh)  ")
      for (p <- Seq(2, 4, 8))
        rounds(xhOf(emb).repartition(p).persist(), f"D(repart $p%2d)  ")
    }
    spark.stop()
  }
}
