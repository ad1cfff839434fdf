package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface itself lives in [[Queries]]. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + exact-decimal aggregation over the star schema. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for LSH-family ops whose bucketing
    * hash has no DuckDB equivalent → driver records a rows-only check.
    *
    * HARNESS CONTRACT (learned round 8): declared outputs must contain NO
    * raw array/map columns — the driver's pandas compare sort_values over
    * every column and crashes on unhashable cells (numpy.ndarray). Flatten
    * vectors to CSV strings (array_join / array_to_string) or explode to
    * per-element rows, and mirror the shape in the DuckDB SQL. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
