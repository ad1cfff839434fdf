package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming forms of the exact-dedup family ([[graft.pipeline.Dedup]]):
 * emit the FIRST occurrence of every content digest, drop later
 * duplicates, with watermark-bounded state — the ingest-time dedup pass
 * of a continuously-fed training corpus.
 *
 * State contract (the standard unbounded-stream trade-off): duplicates
 * are suppressed exactly within the watermark horizon; a duplicate
 * arriving later than `delay` after the original may be re-emitted,
 * because its digest's state has been GC'd. Batch [[graft.pipeline.Dedup.exact]]
 * remains the exactness backstop over the landed corpus.
 *
 * Scale posture: one shuffle on the 16-byte digest; per-key state is a
 * single marker row, expired by the watermark, so state size tracks the
 * distinct-digest arrival rate × horizon, not stream length.
 */
object StreamDedup {

  /** First occurrence per exact text digest. `tsCol` is the event-time
    * column carrying the watermark. */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
                 delay: String = "1 hour"): DataFrame =
    docs.withColumn("digest", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("digest")

  /** First occurrence per whitespace/case-normalized digest
    * (the streaming form of [[graft.pipeline.Dedup.normalizedExact]]). */
  def dedupNormalized(docs: DataFrame, textCol: String, tsCol: String,
                      delay: String = "1 hour"): DataFrame =
    docs.withColumn("digest",
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("digest")
}
