package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed table storage — the co-located-join lever at 100 TB: two
 * tables bucketed by the same key into the same bucket count join
 * WITHOUT a shuffle (each task reads matching buckets from both sides),
 * so a fact-to-fact join that would otherwise exchange terabytes runs
 * map-side. Bucket layout also pre-hashes groupBy keys, turning repeated
 * aggregations over the same key into exchange-free plans.
 *
 * Thin, intentionally-boring wrappers over Spark's native
 * `bucketBy`/`saveAsTable` — the value is the documented contract plus
 * the plan-posture spec that pins the no-exchange property (bucketing
 * silently degrades to full shuffles if the bucket counts diverge or
 * `spark.sql.sources.bucketing.enabled` is off; the spec is the
 * regression guard).
 */
object BucketedStore {

  /** Save as a bucketed managed parquet table. `sortCols` additionally
    * sorts within each bucket file (sort-merge-join friendly: no
    * per-task sort when both sides are bucket-sorted on the join key). */
  def save(df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
           sortCols: Seq[String] = Seq.empty,
           mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(numBuckets > 0, "numBuckets must be positive")
    val w = df.write.format("parquet").mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog, so
    * only this path — not a raw parquet read of the files — preserves
    * the exchange-free join property). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Drop a bucketed table and its files. */
  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")
}
