package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operators Spark lacks as built-ins, composed from existing
 * primitives (preference (a) of the custom-operator ladder — no custom
 * physical plan needed).
 */
object Relational {

  /**
   * Backward as-of join: every left row picks the LATEST right row (per
   * key) whose timestamp is ≤ the left row's timestamp; left rows with no
   * eligible right row keep nulls (left-outer semantics). The classic
   * event-stream primitive ("state as of this moment") that plain SQL
   * needs a correlated LIMIT 1 for.
   *
   * Implementation is the union + running-`last` window pattern, NOT a
   * range cross join: tag both sides, sort each key's rows by (ts, side),
   * and carry the most recent right payload forward with
   * `last(ignoreNulls) OVER rowsBetween(unboundedPreceding, current)`.
   * One shuffle on the key columns, O(n log n) in the key's row count —
   * survives 100 TB where the naive `l JOIN r ON key AND r.ts <= l.ts`
   * (then max-per-group) explodes quadratically on hot keys.
   *
   * Ordering details that make the result deterministic:
   *  - at equal timestamps the right row is visible to the left row
   *    (right sorts first — `<=` semantics);
   *  - among right rows with identical (key, ts), the one with the
   *    largest payload struct wins, comparing the right frame's columns
   *    in order — callers wanting a specific tie-break put that column
   *    first in `right`. When the payload contains a MapType column
   *    (maps are unorderable — a struct tiebreak would fail analysis),
   *    the tiebreak falls back to the largest canonical-JSON rendering
   *    of the payload: still deterministic, but lexicographic rather
   *    than column-ordered.
   *
   * Null keys follow EQUI-JOIN semantics: a null-keyed right row matches
   * nothing (it is filtered out), and a null-keyed left row keeps nulls —
   * unlike a raw window partitionBy, which groups nulls together and
   * would match them to each other.
   *
   * Output: all left columns, then every right column prefixed with
   * `rightPrefix` (the key columns are emitted once, unprefixed).
   */
  /**
   * Skew-salted inner equi-join: the LEFT (large, skewed) side gets a
   * random salt in [0, salts); the RIGHT side is replicated once per
   * salt value, so a hot key's rows spread across `salts` reducers
   * instead of melting one. Semantics are exactly
   * `left.join(right, keys)` — every left row still meets every matching
   * right row exactly once (each left row carries ONE salt; the right
   * replica set covers all salts).
   *
   * Use when a handful of keys dominate (power-law join keys at 100 TB)
   * and AQE's skew-join split isn't available or isn't enough — e.g.
   * when the skew is in a hash-aggregate's input rather than detectable
   * post-shuffle. Cost model: right side shuffles `salts`× its size; pick
   * the smallest `salts` that levels the hot partitions.
   *
   * The salt is `pmod(hash(monotonically_increasing_id()), salts)` —
   * per-ROW (not per-key, so literal duplicate rows of a hot key still
   * spread), stable across task retries (the id is a function of
   * partition layout), never part of the output. Non-key column names
   * must be disjoint between the two sides (same rule as an unaliased
   * join).
   */
  def skewJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(keyCols.nonEmpty, "skewJoin needs at least one key column")
    val leftCols = left.columns.toSeq
    val rightOut = right.columns.toSeq.filterNot(keyCols.contains)
    val l = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keyCols :+ "__salt")
      .select((keyCols ++ leftCols.filterNot(keyCols.contains) ++ rightOut)
        .map(col): _*)
  }

  /**
   * Scalable RANGE join: inner-join every point row to the interval rows
   * that contain it (`start ≤ point ≤ end`, optionally also matching on
   * equi-key columns). Spark has no shuffle strategy for a bare range
   * predicate — it falls back to BroadcastNestedLoopJoin or a cartesian
   * product, both quadratic at 100 TB. This is the standard bucketed
   * formulation instead:
   *
   *  - every interval explodes to the fixed-width buckets it overlaps
   *    (`floor(start/w) .. floor(end/w)`), every point maps to exactly
   *    one bucket — so the join becomes an EQUI-join on (keys, bucket)
   *    followed by the exact range filter, one hash shuffle, no product;
   *  - a point lies in exactly one bucket, so no post-join dedup is
   *    needed — each qualifying (point, interval) pair appears once.
   *
   * Cost model: interval replication is ceil(len/w)+1 rows; pick
   * `bucketWidth` near the median interval length so replication stays
   * O(1) while bucket membership stays selective. Degenerate long
   * intervals (≫ w) are the skew risk — cap or split them upstream.
   *
   * Numeric columns only (cast timestamps to epoch first); values must
   * stay within double's 2^53 exact-integer range for the bucket
   * arithmetic. Null points, null bounds and null keys match nothing
   * (equi-join semantics). Output: all point columns, then every
   * interval column prefixed `rightPrefix` (key columns emitted once,
   * unprefixed).
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                bucketWidth: Long, rightPrefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val ivCols = intervals.columns.toSeq.filterNot(keyCols.contains)
    val pCols = points.columns.toSeq
    val w = lit(bucketWidth.toDouble)
    val iv = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .where(keyCols.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select(keyCols.map(col) ++ ivCols.map(c => col(c).as(s"__iv_$c")) :+
        explode(sequence(floor(col(startCol) / w).cast("long"),
          floor(col(endCol) / w).cast("long"))).as("__bucket"): _*)
    val pts = points
      .where(col(pointCol).isNotNull)
      .withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    pts.join(iv, keyCols :+ "__bucket")
      .where(col(pointCol) >= col(s"__iv_$startCol") &&
        col(pointCol) <= col(s"__iv_$endCol"))
      .select((keyCols ++ pCols.filterNot(keyCols.contains)).map(col) ++
        ivCols.map(c => col(s"__iv_$c").as(s"$rightPrefix$c")): _*)
  }

  /** `direction = "backward"` (default) matches the latest right row with
    * rightTs ≤ leftTs — the classic as-of; `"forward"` matches the
    * EARLIEST right row with rightTs ≥ leftTs (pandas merge_asof
    * direction semantics). Same one-shuffle union + running-window shape
    * either way — the window just orders descending for forward; among
    * equal-timestamp right rows the greatest canonical payload wins in
    * both directions. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "r_",
               direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward': $direction")
    val rightPayloadCols = right.columns.filterNot(keyCols.contains).toSeq
    val leftCols = left.columns.toSeq

    // a right row with no timestamp has no as-of position; without this
    // filter it would sort before every real row (nulls-first) and become
    // a spurious universal fallback match. Null-keyed right rows are
    // dropped for the same reason: equi-join semantics, null matches
    // nothing (see Scaladoc).
    val rTagged = right
      .where(col(rightTs).isNotNull)
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
      keyCols.map(col) :+
        col(rightTs).as("__ts") :+
        lit(0).as("__side") :+
        struct(rightPayloadCols.map(col): _*).as("__r"): _*)
    val rStructType = rTagged.schema("__r").dataType

    val lTagged = left.select(
      keyCols.map(col) :+
        col(leftTs).as("__ts") :+
        lit(1).as("__side") :+
        lit(null).cast(rStructType).as("__r") :+
        struct(leftCols.map(col): _*).as("__l"): _*)

    val unioned = rTagged
      .withColumn("__l", lit(null).cast(lTagged.schema("__l").dataType))
      .unionByName(lTagged)

    // maps are unorderable — ordering by the raw payload struct would
    // fail at analysis if any right column is a MapType
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val tiebreak = if (hasMap(rStructType)) to_json(col("__r")).asc else col("__r").asc
    val tsOrder = if (direction == "forward") col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side").asc, tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    matched.select(
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightPayloadCols.map(c => col("__m").getField(c).as(s"$rightPrefix$c")): _*)
  }

  /**
   * SCD type-2 interval derivation — the warehouse companion of
   * [[asofJoin]]: collapse a change-event stream (key, ts, value) into
   * validity intervals. Consecutive rows with the SAME value merge; a
   * version starts where the value differs from the key's previous row
   * and runs until the next version starts (`valid_to` null on the open
   * current version). Ties at one timestamp keep the LAST value in the
   * deterministic (ts, tiebreakCol) order; with no tiebreak column the
   * VALUE itself breaks ties (max value survives), so equal-ts
   * survivors are total-order deterministic either way. Returns all key
   * columns + `valueCol`, `valid_from`, `valid_to`.
   *
   * Shape: ONE shuffle on the key columns; the change filter (lag) and
   * the interval close (lead over the surviving rows) are two windows
   * sharing that partitioning. At 100 TB per-key history is
   * human-bounded, so no task ever sees more than one key's rows.
   */
  def scd2(events: DataFrame, keyCols: Seq[String], tsCol: String,
           valueCol: String, tiebreakCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    // last-wins at equal ts: keep only the final row per (key, ts);
    // with no tiebreak column, order by the value itself — a constant
    // here would make the equal-ts survivor partition-order-dependent
    val perTs = events
      .withColumn("__rn", row_number().over(
        Window.partitionBy((keyCols :+ tsCol).map(col): _*)
          .orderBy(col(tiebreakCol.getOrElse(valueCol)).desc)))
      .where(col("__rn") === 1).drop("__rn")
    // after the dedup (key, ts) is unique, so ts alone totally orders
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol).asc)
    val changed = perTs
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(valueCol))
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(keyCols.map(col) ++
        Seq(col(valueCol), col("valid_from"), col("valid_to")): _*)
  }

  /**
   * Distributed EXCLUSIVE prefix sum: appends `outCol` = the sum of
   * `sumCol` (must be LONG) over all rows strictly earlier in ascending
   * `orderCol` order. The scalable replacement for
   * `sum(...).over(Window.orderBy(...))`, whose un-partitioned window
   * funnels every row through ONE task.
   *
   * Shape: one range-partitioned sort (pinned by an eager
   * localCheckpoint so both passes see identical partitions), one
   * per-partition-totals job collecting exactly `numPartitions` longs to
   * the driver (the same bounded footprint as `zipWithIndex`), then a
   * per-partition scan seeded with the partition's offset. No partition
   * ever holds more than its range share; nothing row-shaped reaches
   * the driver.
   */
  def prefixSum(df: DataFrame, orderCol: String, sumCol: String,
                outCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val sumIdx = schema.fieldIndex(sumCol)
    require(schema(sumIdx).dataType ==
      org.apache.spark.sql.types.LongType, s"$sumCol must be LONG")
    val sorted = df.orderBy(col(orderCol)).localCheckpoint(true)
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = 0L; it.foreach(s += _.getLong(sumIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var run = offsets(i)
      it.map { r =>
        val row = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(sumIdx)
        row
      }
    }
    spark.createDataFrame(out,
      schema.add(outCol, org.apache.spark.sql.types.LongType, nullable = false))
  }
}
