package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time a comma-separated subset of SparkEntry.queries on a
  * warm session (same harness shape as Bench, min of reps) without
  * paying the full headliner sweep — for iterating on one operator.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // single-FILE test tables only split on row-group boundaries;
      // 4 MB splits let a one-file corpus (ScaleGen writes 4 MB row
      // groups) scan in parallel instead of one straggler task (r12)
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bench-one] $name%-32s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
