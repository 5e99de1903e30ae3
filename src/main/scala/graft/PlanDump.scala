package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Dev tool (r17 optimization round): dump `.explain("formatted")` for a
  * comma-separated list of declared queries to `<outDir>/<name>_<tag>.txt`.
  * Usage: PlanDump <names|all> <sfDir> <outDir> <tag>
  * The session mirrors Bench's configuration so the captured plan is the
  * plan the bench actually times (same shuffle partitions, split size,
  * nanos handling).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <names|all> <sfDir> <outDir> <tag>")
    val names =
      if (args(0) == "all") Bench.headliners
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args(1)
    val outDir = Paths.get(args(2))
    val tag = args(3)
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_NOAQE=1: disable AQE so the static planner's
    // ReuseExchange markers show in the dump — a readable proxy for the
    // runtime stage reuse AQE performs but explain() hides.
    val aqe = if (sys.env.get("SPARK_GRAFT_NOAQE").contains("1")) "false" else "true"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${name}_$tag.txt"),
          plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"[plandump] $name ok (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
