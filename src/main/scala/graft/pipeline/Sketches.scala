package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable data sketches over md5 — the approximate-query infrastructure
 * a 100 TB pipeline runs when exact groupBys are too expensive to keep
 * around: HyperLogLog registers for cardinality (Flajolet et al. 2007)
 * and count-min for frequency/heavy-hitters (Cormode & Muthukrishnan
 * 2005). The reference keeps per-graph aggregates in a central store
 * (`metadb`/`performancedb` DDL); sketches are the scale-correct
 * equivalent for streaming/distributed maintenance.
 *
 * Both sketches hash with md5 hex digits (the [[Dedup.simhash]]
 * precedent) so ANY engine replays the identical sketch — the register /
 * counter tables are exact integer contracts, verifiable row for row.
 * Sketch MERGE is trivially distributed: HLL registers merge by
 * grouped MAX, count-min counters by grouped SUM — union two shards'
 * tables and re-aggregate; no driver state anywhere.
 */
object Sketches {

  /** Integer value of one lowercase hex char. */
  private def hexVal(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  /** Integer value of the two hex chars at 1-based `pos` — 0..255. */
  private def hex2(m: Column, pos: Int): Column =
    hexVal(substring(m, pos, 1)) * 16 + hexVal(substring(m, pos + 1, 1))

  /**
   * HyperLogLog register table with m = 256 buckets: bucket = first md5
   * byte; rho = 1 + the number of leading zero BITS of the next 64 bits
   * (hex digits 3..18), computed exactly from the hex string — 4 per
   * leading '0' digit plus a 4-way CASE on the first non-zero digit —
   * or 65 when all 16 digits are zero. Returns (bucket, max_rho), one
   * row per non-empty bucket.
   *
   * This IS the sketch: one narrow map + one 256-group aggregate per
   * shard, merged across shards by the same grouped MAX. Feed it to
   * [[hllEstimate]] for the cardinality.
   */
  def hllRegisters(df: DataFrame, keyCol: String): DataFrame =
    df.where(col(keyCol).isNotNull)
      .select(hllBucket(col(keyCol)).as("bucket"), hllRho(col(keyCol)).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("max_rho"))

  /** HLL bucket of a key: first md5 byte (0..255). Shared with the
    * streaming register build ([[graft.streaming.EventStream.hllRegisterStream]]). */
  private[graft] def hllBucket(key: Column): Column = hex2(md5(key.cast("string")), 1)

  /** HLL rho of a key: 1 + leading zero bits of md5 bits 8..72 (65 when
    * all zero), computed exactly from the hex string. */
  private[graft] def hllRho(key: Column): Column = {
    val m = md5(key.cast("string"))
    val w = substring(m, 3, 16)
    val z = length(regexp_extract(w, "^0*", 0))
    val d = hexVal(w.substr(z + 1, lit(1)))
    val lz = when(d === 1, 3).when(d <= 3, 2).when(d <= 7, 1).otherwise(0)
    when(z === 16, lit(65)).otherwise(lit(4) * z + lz + 1)
  }

  /**
   * Cardinality estimate from a register table (driver-side arithmetic
   * on ≤ 256 rows): alpha·m²/Σ2^(−M_j) with the standard small-range
   * linear-counting correction. Empty buckets count as 2⁰.
   */
  def hllEstimate(registers: DataFrame, m: Int = 256): Double = {
    val regs = registers.collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    val alpha = 0.7213 / (1.0 + 1.079 / m) // standard constant for m >= 128
    val sum = (0 until m).map(j => math.pow(2.0, -regs.getOrElse(j, 0).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = (0 until m).count(j => !regs.contains(j))
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Column form of [[hllEstimate]] for DISTRIBUTED read paths (e.g.
    * per-vertex ball sizes in
    * [[graft.algorithms.GraphAlgorithms.effectiveDiameter]]):
    * `presentSum` = Σ 2^(−rho) over the present buckets, `presentCount`
    * = how many buckets are present; empty buckets contribute 2⁰ and
    * the small-range linear-counting correction matches the driver-side
    * form exactly. */
  private[graft] def hllEstimateCol(presentSum: Column, presentCount: Column,
                                    m: Int): Column = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val zeros = lit(m.toDouble) - presentCount.cast("double")
    val s = presentSum + zeros
    val raw = lit(alpha * m * m) / s
    when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
  }

  /**
   * Count-min sketch: `depth` independent hash rows (md5 of "k:key",
   * two hex digits → column 0..width−1, width ≤ 256), counters = total
   * key occurrences per cell. Returns (hrow, hcol, cnt) — depth·width
   * cells max, merged across shards by grouped SUM.
   *
   * Shape: the key column explodes by depth (a constant), then ONE
   * shuffle on (row, col) — at 100 TB the sketch build is a single
   * bounded-cardinality aggregate, never a per-key table.
   */
  def cmsSketch(df: DataFrame, keyCol: String,
                depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1 && width <= 256,
      s"need 1 <= depth and 1 <= width <= 256: depth=$depth width=$width")
    val rows = df.where(col(keyCol).isNotNull).select(
      col(keyCol).cast("string").as("__k"),
      explode(sequence(lit(0), lit(depth - 1))).as("hrow"))
    rows.select(col("hrow"), cmsHcol(col("hrow"), col("__k"), width).as("hcol"))
      .groupBy("hrow", "hcol").agg(count(lit(1)).as("cnt"))
  }

  /** CMS column of a key under hash row `hrow`: first md5 byte of
    * "row:key", mod width. Shared with the streaming sketch build
    * ([[graft.streaming.EventStream.cmsSketchStream]]). */
  private[graft] def cmsHcol(hrow: Column, key: Column, width: Int): Column =
    pmod(hex2(md5(concat_ws(":", hrow, key.cast("string"))), 1), lit(width))

  /**
   * Bloom filter as a (word, bits) table: `bits` filter bits packed 32
   * per BIGINT word — 32, not 64, so no engine's `<<` ever crosses the
   * sign bit and the word values replay as plain positive integers —
   * with `k` md5-derived hash functions: hash i of a key sets bit
   * (4 hex digits of md5("i:key")) mod bits. Build = one constant-k
   * explode + ONE bounded aggregate (≤ bits/32 groups); shards merge by
   * the same grouped BIT_OR. The classic join-prefilter at 100 TB: ship
   * the (bits/32)-row table broadcast, drop probe rows whose k bits
   * aren't all set before the real join.
   */
  def bloomFilter(df: DataFrame, keyCol: String,
                  bits: Int = 4096, k: Int = 5): DataFrame = {
    require(bits >= 32 && bits <= 65536 && Integer.bitCount(bits) == 1,
      s"bits must be a power of two in [32, 65536]: $bits")
    require(k >= 1 && k <= 16, s"k must be in [1, 16]: $k")
    val cells = df.where(col(keyCol).isNotNull).select(
        col(keyCol).cast("string").as("__k"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
    val m = md5(concat_ws(":", col("i"), col("__k")))
    val pos = pmod(hex2(m, 1) * 256 + hex2(m, 3), lit(bits))
    cells.select(floor(pos / 32).cast("int").as("word"),
        call_function("shiftleft", lit(1L), pos % 32).as("mask"))
      .groupBy("word").agg(call_function("bit_or", col("mask")).as("bits"))
  }

  /**
   * Membership probe: key MIGHT be in the set iff every one of its k
   * bits is set (1) — 0 only for keys definitely absent. Same hash
   * derivation as [[bloomFilter]]; absent words read as empty (0).
   * Returns (key, might_contain INT 0/1).
   */
  def bloomMightContain(sketch: DataFrame, probes: DataFrame, keyCol: String,
                        bits: Int = 4096, k: Int = 5): DataFrame = {
    val cells = probes.select(col(keyCol).as("key"))
      .withColumn("i", explode(sequence(lit(0), lit(k - 1))))
    val m = md5(concat_ws(":", col("i"), col("key").cast("string")))
    val pos = pmod(hex2(m, 1) * 256 + hex2(m, 3), lit(bits))
    cells.select(col("key"), floor(pos / 32).cast("int").as("word"),
        call_function("shiftleft", lit(1L), pos % 32).as("mask"))
      .join(sketch, Seq("word"), "left")
      .groupBy("key")
      .agg(min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) === col("mask"), 1)
        .otherwise(0)).as("might_contain"))
  }

  /**
   * Point-query read path: estimated occurrence count of each probe key
   * = MIN over rows of the counter at that row's hash column (the
   * classic CMS upper-bound estimate, exact integer arithmetic).
   * Returns (key, est); keys hashing only to empty cells estimate 0.
   */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val cells = probes.select(col(keyCol).as("key"))
      .withColumn("hrow", explode(sequence(lit(0), lit(depth - 1))))
      .select(col("key"), col("hrow"),
        pmod(hex2(md5(concat_ws(":", col("hrow"), col("key").cast("string"))), 1),
          lit(width)).as("hcol"))
    cells.join(sketch, Seq("hrow", "hcol"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** KMV hash of a key: the first 14 md5 hex digits as a 56-bit BIGINT —
    * small enough that (k−1)·2⁵⁶ stays inside BIGINT for k ≤ 128. */
  private[graft] def kmvHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 14), 16, 10).cast("long")

  /**
   * KMV (k-minimum-values / bottom-k) distinct sketch per group — the
   * third mergeable cardinality tool next to [[hllRegisters]] (HLL wins
   * on size; KMV additionally supports set operations and yields an
   * UNBIASED estimator with a trivially exact small-range mode): the
   * sketch is the k smallest DISTINCT 56-bit hash values of the key per
   * group (Bar-Yossef et al. 2002). Returns (groupCols*, rank, hval),
   * rank 1..k ascending — ≤ k rows per group regardless of volume.
   *
   * MERGE is union + re-bottom-k (the same window); shards, partitions
   * and batch-vs-stream builds compose. Shape: one distinct-aggregate
   * shuffle on (group, hash) + one per-group window over ≤ k·shards
   * rows. Feed to [[kmvEstimate]] for cardinalities.
   */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int = 32,
                groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(k >= 2 && k <= 128, s"need 2 <= k <= 128: $k")
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val hashed = df.where(col(keyCol).isNotNull)
      .select(grp :+ kmvHash(col(keyCol)).as("hval"): _*)
      .distinct()
    // scale guard: the final per-group rank would otherwise pull EVERY
    // distinct hash of a group through one window task — prune to each
    // PARTITION's bottom-k first (a superset of the global bottom-k, so
    // the result is layout-invariant), leaving <= k * numPartitions rows
    val withPid = hashed.withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy(grp :+ col("__pid"): _*).orderBy(col("hval"))
    val pruned = withPid
      .withColumn("__lr", row_number().over(localW))
      .where(col("__lr") <= k).drop("__pid", "__lr")
    val w = if (groupCols.isEmpty) Window.orderBy(col("hval"))
      else Window.partitionBy(grp: _*).orderBy(col("hval"))
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(grp ++ Seq(col("rank"), col("hval")): _*)
  }

  /**
   * Distinct-count estimate from a KMV sketch: a group holding fewer
   * than k values has seen its WHOLE distinct set (the sketch is exact
   * below k); at k values the estimate is the standard (k−1)·D / h(k)
   * with D = 16¹⁴ the hash domain and h(k) the k-th smallest hash —
   * all-BIGINT floor arithmetic, replayable in plain SQL. Returns
   * (groupCols*, est).
   */
  def kmvEstimate(sketch: DataFrame, k: Int = 32,
                  groupCols: Seq[String] = Seq.empty): DataFrame = {
    val grp = groupCols.map(col)
    val domain = 72057594037927936L // 16^14
    val agg = if (groupCols.isEmpty) sketch.groupBy()
      else sketch.groupBy(grp: _*)
    agg.agg(count(lit(1)).as("n"), max(col("hval")).as("hk"))
      .select(grp :+
        when(col("n") < k, col("n"))
          .otherwise(expr(s"CAST(${k - 1} AS BIGINT) * CAST($domain AS BIGINT) DIV hk"))
          .as("est"): _*)
  }
}
