package graft

/** Shared preflight for the heavy at-scale gate mains (r16 VERDICT #5):
  * the sf10 CheckCard run died once on 16 GB of stale stream-scratch
  * before it succeeded (~40 GB transient candidate-sort spill; ~60 GB
  * free needed) — and the root error of an undersized heap is a single
  * "Java heap space" line buried far above a cascade of
  * SPILL_OUT_OF_MEMORY noise. This applies the check_one.py
  * assert-loud discipline to the Spark side: wipe stale scratch, ASSERT
  * usable disk, and surface the driver heap that actually applied, all
  * BEFORE the expensive build starts.
  */
object GatePreflight {

  private def deleteRecursively(f: java.io.File): Unit = {
    val fs = f.listFiles()
    if (fs != null) fs.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Wipe stale per-run scratch, assert `minFreeGb` usable space on the
    * scratch filesystem, and print the JVM heap cap. Call before
    * building the SparkSession (nothing here needs one).
    */
  def run(minFreeGb: Long, main: String): Unit = {
    val scratch = new java.io.File("target/stream-scratch")
    if (scratch.exists()) {
      val sz = java.nio.file.Files.walk(scratch.toPath)
        .mapToLong(p => p.toFile.length).sum() / (1024L * 1024 * 1024)
      println(s"[$main] preflight: wiping stale target/stream-scratch (~$sz GB)")
      deleteRecursively(scratch)
    }
    val freeGb = new java.io.File("target").getUsableSpace / (1024L * 1024 * 1024)
    require(freeGb >= minFreeGb,
      s"[$main] preflight: only $freeGb GB usable under target/ but the " +
        s"gate needs >= $minFreeGb GB transient spill headroom (r16: the " +
        "sf10 kNN candidate sort spills ~40 GB) — free disk before gating")
    val heapGb = Runtime.getRuntime.maxMemory / (1024L * 1024 * 1024)
    println(s"[$main] preflight: $freeGb GB disk free, driver heap cap " +
      s"~$heapGb GB (SPARK_DRIVER_MEM=${sys.env.getOrElse("SPARK_DRIVER_MEM", "unset — 8g default")})")
  }
}
