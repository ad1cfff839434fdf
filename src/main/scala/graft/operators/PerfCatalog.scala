package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Query-performance catalog + SLA admission — the reference's
 * `performancedb` machinery (`ddl/perfdb.sql`: `graph_performance_data`
 * with (graph_name, date_time, worker_count, execution_time) and
 * `graph_sla` with per-category sla_value; the `sla` frontend command
 * reports recorded values per graph/partition count,
 * `src/frontend/JasmineGraphFrontEnd.cpp:3938-3990`).
 *
 * Spark-first shape: the catalog is an APPEND-ONLY parquet table (one
 * small file per recorded run — a real deployment points this at a
 * Delta/warehouse path), reads are grouped aggregates over it. Nothing
 * here is driver-state: history survives restarts and merges across
 * concurrent writers, which the reference's single-node SQLite cannot.
 *
 * `admit` is the SLA gate a resident service runs before an expensive
 * query: predicted cost = an upper-quantile of the recorded history for
 * (command, partitions) — the same attempt-based signal the reference
 * stores per `graph_sla.attempt` — admitted iff it fits the caller's
 * SLA. No history → admit (first attempt must be able to record one).
 */
final class PerfCatalog(dir: String) {

  /** Append one run record; `elapsedMs` as measured by the caller. */
  def record(spark: SparkSession, command: String, graphName: String,
             partitions: Int, elapsedMs: Long): Unit = {
    import spark.implicits._
    Seq((command, graphName, partitions, elapsedMs, System.currentTimeMillis()))
      .toDF("command", "graph_name", "partitions", "elapsed_ms", "recorded_at")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)
  }

  def history(spark: SparkSession): DataFrame = spark.read.parquet(dir)

  /** The `sla <command>` report: per (graph, partitions) run count and
    * median / max elapsed — the reference prints exactly this grid. */
  def slaReport(spark: SparkSession, command: String): DataFrame =
    history(spark)
      .where(col("command") === command)
      .groupBy("graph_name", "partitions")
      .agg(count(lit(1)).as("attempts"),
        expr("percentile_approx(elapsed_ms, 0.5, 10000)").as("median_ms"),
        max(col("elapsed_ms")).as("max_ms"))
      .orderBy("graph_name", "partitions")

  /** Admission decision: true iff the `quantile` of recorded elapsed
    * times for (command, partitions) fits `slaMs`; no history admits. */
  def admit(spark: SparkSession, command: String, partitions: Int,
            slaMs: Long, quantile: Double = 0.9): Boolean = {
    require(quantile > 0 && quantile <= 1, s"quantile in (0,1]: $quantile")
    val hist =
      try history(spark).where(col("command") === command &&
        col("partitions") === partitions)
      catch { case _: org.apache.spark.sql.AnalysisException => return true }
    val row = hist
      .agg(expr(s"percentile_approx(elapsed_ms, $quantile, 10000)").as("p"))
      .collect()(0)
    row.isNullAt(0) || row.getLong(0) <= slaMs
  }

  /** Time `body`, record it, return its result — the instrumented-run
    * helper a service wraps query execution in. */
  def timed[T](spark: SparkSession, command: String, graphName: String,
               partitions: Int)(body: => T): T = {
    val t0 = System.nanoTime()
    val out = body
    record(spark, command, graphName, partitions, (System.nanoTime() - t0) / 1000000L)
    out
  }
}
