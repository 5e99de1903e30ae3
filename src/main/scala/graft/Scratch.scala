package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only perf probe (sbt console can't host Spark on JDK17). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = sources.Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"### $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("ngram")(operators.Dedup.ngramJaccardPairs(docs).count())
    time("simhash")(operators.Dedup.simhashPairs(docs).count())
    time("minhash")(operators.Dedup.minhashPairs(docs).count())
    spark.stop()
  }
}
