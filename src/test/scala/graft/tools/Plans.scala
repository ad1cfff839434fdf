package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway (verify-skill recipe): dump `.explain("formatted")` for the
  * named declared queries to <outDir>/<name>_<tag>.txt — the plans/r18
  * before/after artifacts. Local-regime queries do their gated collects
  * at build time, so the dumped plan honestly shows the shipped shape
  * (a LocalTableScan-rooted frame after, the iterative chain before). */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"PLANS wrote $name")
      } catch {
        case t: Throwable => println(s"PLANS FAILED $name: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
