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

  /** One bucketed signature row: a document appears once per 16-bit
    * SimHash chunk, so near-dups (Hamming ≤ 3) share ≥1 bucket by
    * pigeonhole — the streaming twin of [[graft.pipeline.Dedup.simhashPairs]]'
    * banding. */
  private[streaming] final case class BucketRow(chunk: Int, v: Long, id: Long, sig: Long,
                                     ts: java.sql.Timestamp)
  private[streaming] final case class NearDupPair(idA: Long, idB: Long, hamming: Int,
                                       ts: java.sql.Timestamp)

  private def parseDelayMs(delay: String): Long = {
    val m = "(\\d+)\\s*(second|minute|hour|day)s?".r.findFirstMatchIn(delay.trim.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse delay '$delay' (expected e.g. '30 minutes')"))
    val unit = m.group(2) match {
      case "second" => 1000L
      case "minute" => 60000L
      case "hour" => 3600000L
      case "day" => 86400000L
    }
    m.group(1).toLong * unit
  }

  private[streaming] final case class MinhashBucketRow(band: Int, bucket: Long, id: Long,
                                                       sig: Seq[Long], ts: java.sql.Timestamp)
  private[streaming] final case class MinhashPair(idA: Long, idB: Long, jaccard_est: Double,
                                                  ts: java.sql.Timestamp)

  /**
   * Streaming NEAR-duplicate detection by MinHash banded LSH — the
   * streaming twin of [[graft.pipeline.Dedup.minhashPairs]]: the one-pass
   * [[graft.functions.MinhashSignature]] expression computes each
   * document's H-component signature, the signature is banded (bands of
   * H/bands components, bucket key = hash of the band slice), and bucket
   * members verify against new arrivals IN STATE.
   *
   * Divergence from the batch form, documented: the batch pipeline
   * verifies EXACT Jaccard from posting lists; keeping posting lists in
   * stream state would grow it with document length, so the streaming
   * form emits the signature ESTIMATE (matching components / H — the
   * standard unbiased MinHash estimator, ±1/√H ≈ 0.125 at H=64). Batch
   * minhashPairs over the landed corpus remains the exactness backstop,
   * the same contract as [[dedupExact]]'s horizon.
   *
   * Emits (idA, idB, jaccard_est, ts) with idA < idB, at-least-once (a
   * pair agreeing in several bands reports from each shared bucket) —
   * downstream dedup on (idA, idB) is the caller's contract. State per
   * bucket: (id, signature, ts) members, horizon-pruned on every visit,
   * idle buckets expired by event-time timeout — exactly the
   * [[nearDupSimhash]] state contract.
   */
  def nearDupMinhash(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
                     threshold: Double = 0.8, shingleSize: Int = 5,
                     numHashes: Int = 64, bands: Int = 16,
                     delay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = parseDelayMs(delay)
    val rowsPerBand = numHashes / bands

    val sigs = docs.select(
        col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"),
        graft.pipeline.Dedup.minhashSigCol(textCol, shingleSize, numHashes).as("sig"))
      .where(col("sig").isNotNull)
      .withWatermark("ts", delay)
    val bucketed = sigs.select(col("id"), col("sig"), col("ts"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("string"))
              .as("bucket")))).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("sig"), col("ts"))
      .as[MinhashBucketRow]

    val pairs = bucketed
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), rows: Iterator[MinhashBucketRow],
         state: GroupState[List[(Long, Seq[Long], Long)]]) => {
          val wm = state.getCurrentWatermarkMs()
          var members = state.getOption.getOrElse(Nil).filter(_._3 >= wm - horizonMs)
          if (!state.hasTimedOut) {
            val out = scala.collection.mutable.ArrayBuffer.empty[MinhashPair]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
              members.foreach { case (mid, msig, _) =>
                if (mid != r.id) {
                  val matches = msig.iterator.zip(r.sig.iterator).count { case (a, b) => a == b }
                  val est = matches.toDouble / msig.size
                  if (est >= threshold)
                    out += MinhashPair(math.min(mid, r.id), math.max(mid, r.id), est, r.ts)
                }
              }
              members = (r.id, r.sig, r.ts.getTime) :: members
            }
            state.update(members)
            state.setTimeoutTimestamp(math.max(wm + 1, members.map(_._3).max + horizonMs))
            out.iterator
          } else {
            if (members.isEmpty) state.remove()
            else {
              state.update(members)
              state.setTimeoutTimestamp(math.max(wm + 1, members.map(_._3).max + horizonMs))
            }
            Iterator.empty
          }
        })
    pairs.toDF()
  }

  /**
   * Streaming NEAR-duplicate detection by SimHash banding: each document's
   * 64-bit signature is split into four 16-bit chunks; documents sharing a
   * chunk value land in the same state bucket, where the new arrival is
   * verified (bit_count(xor) ≤ maxHamming) against the bucket's recent
   * members — exactly [[graft.pipeline.Dedup.simhashPairs]]' candidate
   * generation, with the bucket join replaced by per-bucket
   * `flatMapGroupsWithState` state.
   *
   * Emits (idA, idB, hamming, ts) with idA < idB, at-least-once: a pair
   * agreeing in several chunks is reported from each shared bucket —
   * downstream exact-dedup on (idA, idB) (or a set-union consumer) is the
   * caller's contract, mirroring the batch pipeline's dropDuplicates.
   *
   * State contract: bucket members older than `delay` behind the
   * watermark are pruned on every visit, and idle buckets expire via
   * event-time timeout — state size tracks bucket arrival rate × horizon,
   * not stream length. A duplicate arriving later than the horizon is not
   * paired (same trade-off as [[dedupExact]]); batch simhashPairs over the
   * landed corpus is the exactness backstop.
   */
  def nearDupSimhash(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
                     maxHamming: Int = 3, delay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = parseDelayMs(delay)

    val sigs = docs.select(
        col(idCol).cast("long").as("id"),
        col(tsCol).as("ts"),
        graft.pipeline.Dedup.simhash(textCol).as("sig"))
      .withWatermark("ts", delay)
    val bucketed = sigs.select(col("id"), col("sig"), col("ts"),
        explode(transform(sequence(lit(0), lit(3)),
          c => struct(c.as("chunk"),
            call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL).as("v")))).as("ck"))
      .select(col("ck.chunk").as("chunk"), col("ck.v").as("v"),
        col("id"), col("sig"), col("ts"))
      .as[BucketRow]

    val pairs = bucketed
      .groupByKey(r => (r.chunk, r.v))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), rows: Iterator[BucketRow], state: GroupState[List[(Long, Long, Long)]]) => {
          val wm = state.getCurrentWatermarkMs()
          var members = state.getOption.getOrElse(Nil).filter(_._3 >= wm - horizonMs)
          if (!state.hasTimedOut) {
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
            rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).foreach { r =>
              members.foreach { case (mid, msig, _) =>
                if (mid != r.id) {
                  val h = java.lang.Long.bitCount(msig ^ r.sig)
                  if (h <= maxHamming)
                    out += NearDupPair(math.min(mid, r.id), math.max(mid, r.id), h, r.ts)
                }
              }
              members = (r.id, r.sig, r.ts.getTime) :: members
            }
            state.update(members)
            // expire the bucket once every member is past the horizon
            // (clamped above the watermark — required by the API)
            state.setTimeoutTimestamp(math.max(wm + 1, members.map(_._3).max + horizonMs))
            out.iterator
          } else {
            if (members.isEmpty) state.remove()
            else {
              state.update(members)
              state.setTimeoutTimestamp(math.max(wm + 1, members.map(_._3).max + horizonMs))
            }
            Iterator.empty
          }
        })
    pairs.toDF()
  }
}
