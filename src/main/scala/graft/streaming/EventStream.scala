package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-stream analytics over the `events` shape (ts, user_id,
 * event_type, value) — the Structured-Streaming counterparts of the
 * batch `q_events_hourly` / `q_sessionize` queries, built on the three
 * canonical streaming primitives:
 *
 *  - event-time WATERMARK bounding state and lateness,
 *  - tumbling-window aggregation (append mode: a window emits exactly
 *    once, when the watermark passes its end),
 *  - `flatMapGroupsWithState` with event-time timeout for custom
 *    session state (the reference has no analog — its streaming surface
 *    is ingest-only, `StreamHandler.cpp:66-140`; parity-plus).
 *
 * Scale posture: both operators shuffle once on their grouping key
 * (window×type / user_id), state is per-key-bounded (one open window
 * aggregate / one open session), and the watermark GCs state — the
 * standard unbounded-stream memory contract.
 */
object EventStream {

  /** One event for sessionization (event-time `ts` must carry the
    * stream's watermark). */
  final case class SessionEvent(user_id: Long, ts: Timestamp)

  /** Open-session state: epoch-millis bounds + event count. */
  final case class SessionState(start: Long, last: Long, events: Long)

  /** A closed session. */
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           events: Long)

  /**
   * Tumbling hourly counts with an event-time watermark — the streaming
   * form of `q_events_hourly`. In append mode each (hour, event_type) row
   * is emitted exactly once, `delay` after the hour closes; late events
   * beyond the watermark are dropped (counted consistently by re-runs).
   */
  def hourlyCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("events"), col("sum_value"))

  /**
   * Streaming distinct-count SKETCH per event-time window: the
   * HyperLogLog register stream. Emits `(window_start, bucket, max_rho)`
   * rows in append mode once a window closes — ≤ 256 rows per window
   * regardless of stream volume, the bounded-state way to count
   * distincts on an unbounded stream (exact distinct state grows with
   * the key cardinality; HLL state is 256 bytes).
   *
   * The registers are the SAME mergeable sketch
   * [[graft.pipeline.Sketches.hllRegisters]] builds in batch — grouped
   * MAX merges shards, windows, or batch-vs-stream builds
   * interchangeably, and [[graft.pipeline.Sketches.hllEstimate]] turns
   * any merged register set into the cardinality. Batch/stream register
   * equality is spec-pinned.
   */
  def hllRegisterStream(events: DataFrame, keyCol: String,
                        windowDuration: String = "1 hour",
                        delay: String = "1 hour"): DataFrame =
    events
      .where(col(keyCol).isNotNull)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDuration),
        graft.pipeline.Sketches.hllBucket(col(keyCol)).as("bucket"))
      .agg(max(graft.pipeline.Sketches.hllRho(col(keyCol))).as("max_rho"))
      .select(col("window.start").as("window_start"), col("bucket"),
        col("max_rho"))

  /**
   * Streaming count-min sketch per event-time window — the heavy-hitter
   * companion to [[hllRegisterStream]]: emits
   * `(window_start, hrow, hcol, cnt)` cells in append mode once a
   * window closes, ≤ depth·width rows per window regardless of stream
   * volume (exact per-key counts grow with cardinality; CMS state is a
   * fixed grid). Cells are the SAME mergeable sketch
   * [[graft.pipeline.Sketches.cmsSketch]] builds in batch — grouped SUM
   * merges shards, windows or batch-vs-stream builds, and
   * [[graft.pipeline.Sketches.cmsEstimate]] serves point queries off
   * any merged grid. Batch/stream cell equality is spec-pinned.
   */
  def cmsSketchStream(events: DataFrame, keyCol: String,
                      windowDuration: String = "1 hour",
                      delay: String = "1 hour",
                      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1 && width <= 256,
      s"need 1 <= depth and 1 <= width <= 256: depth=$depth width=$width")
    events
      .withWatermark("ts", delay)
      .where(col(keyCol).isNotNull)
      .select(col("ts"), col(keyCol).cast("string").as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("hrow"))
      .groupBy(window(col("ts"), windowDuration), col("hrow"),
        graft.pipeline.Sketches.cmsHcol(col("hrow"), col("__k"), width).as("hcol"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("hrow"),
        col("hcol"), col("cnt"))
  }

  /**
   * Gap-based sessionization with custom state — the streaming form of
   * `q_sessionize` (30-minute default gap): a session closes when no
   * event arrives within `gapMinutes` of its last event, enforced by an
   * event-time timeout, so sessions are emitted as soon as the watermark
   * proves the gap. Within a micro-batch the group's events are sorted
   * in memory (bounded by per-key batch volume, not stream length).
   */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30,
                 delay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // the watermark passed last + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.events))
          } else {
            val ts = batch.map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = Iterator.newBuilder[Session]
            ts.foreach { t =>
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(SessionState(s.start, math.max(s.last, t), s.events + 1))
                case Some(s) =>
                  closed += Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.events)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /**
   * Stream-stream event-time INTERVAL join — the click-attribution
   * shape, and the fourth canonical streaming primitive next to
   * watermarked windows, sketches and custom session state: every
   * conversion event pairs with the SAME user's impression events whose
   * timestamp lies within `[conv_ts - horizon, conv_ts]`. Both sides
   * carry event-time watermarks and the join condition bounds the time
   * range in BOTH directions, so Spark's stream-stream join keeps only
   * `watermark + horizon` of per-key state on each side and GCs the
   * rest — the bounded-state contract an unbounded 100 TB/day stream
   * needs (an unconstrained stream-stream join would buffer forever).
   *
   * Inputs are `events`-shaped (ts, user_id, event_type, value);
   * `impressionType`/`conversionType` select the two roles from either
   * stream. Emits (user_id, imp_ts, conv_ts, lag_seconds, imp_value,
   * conv_value) in append mode once the watermark proves a pair final.
   */
  def attributeWithin(impressions: DataFrame, conversions: DataFrame,
                      impressionType: String = "view",
                      conversionType: String = "purchase",
                      horizon: String = "30 minutes",
                      delay: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .where(col("event_type") === impressionType)
      .select(col("user_id").as("imp_user"), col("ts").as("imp_ts"),
        col("value").as("imp_value"))
      .withWatermark("imp_ts", delay)
    val conv = conversions
      .where(col("event_type") === conversionType)
      .select(col("user_id").as("conv_user"), col("ts").as("conv_ts"),
        col("value").as("conv_value"))
      .withWatermark("conv_ts", delay)
    imp.join(conv,
      col("imp_user") === col("conv_user") &&
        col("conv_ts") >= col("imp_ts") &&
        col("conv_ts") <= col("imp_ts") + expr(s"INTERVAL $horizon"))
      .select(col("imp_user").as("user_id"), col("imp_ts"), col("conv_ts"),
        ((col("conv_ts").cast("long")) - col("imp_ts").cast("long"))
          .as("lag_seconds"),
        col("imp_value"), col("conv_value"))
  }

  /**
   * OUTER form of [[attributeWithin]]: every conversion emits — matched
   * rows as they pair, UNATTRIBUTED conversions with null impression
   * columns once the watermark proves no in-horizon impression can
   * still arrive (the organic-vs-driven split a marketing pipeline
   * feeds its models). Same bounded-state contract: the two-sided time
   * bound plus both watermarks let Spark GC join state at
   * `watermark + horizon`.
   */
  def attributeLeftOuter(impressions: DataFrame, conversions: DataFrame,
                         impressionType: String = "view",
                         conversionType: String = "purchase",
                         horizon: String = "30 minutes",
                         delay: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .where(col("event_type") === impressionType)
      .select(col("user_id").as("imp_user"), col("ts").as("imp_ts"),
        col("value").as("imp_value"))
      .withWatermark("imp_ts", delay)
    val conv = conversions
      .where(col("event_type") === conversionType)
      .select(col("user_id").as("conv_user"), col("ts").as("conv_ts"),
        col("value").as("conv_value"))
      .withWatermark("conv_ts", delay)
    conv.join(imp,
      col("imp_user") === col("conv_user") &&
        col("conv_ts") >= col("imp_ts") &&
        col("conv_ts") <= col("imp_ts") + expr(s"INTERVAL $horizon"),
      "leftOuter")
      .select(col("conv_user").as("user_id"), col("imp_ts"), col("conv_ts"),
        ((col("conv_ts").cast("long")) - col("imp_ts").cast("long"))
          .as("lag_seconds"),
        col("imp_value"), col("conv_value"))
  }
}
