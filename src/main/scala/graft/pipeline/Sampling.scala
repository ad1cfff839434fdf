package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Deterministic sampling and sequence-packing operators for
 * training-data pipelines. A 100 TB corpus is never shuffled to sample
 * it: every operator here is a pure narrow filter or a per-shard window
 * — no global sort, no driver-side randomness, and reruns are
 * bit-identical (the property that makes dataset versions auditable).
 *
 * Two hash modes, mirroring `Dedup.simhashSigs`:
 *  - `verifiable = true`: a Knuth multiplicative hash on the numeric key
 *    — replayable in any engine with 64-bit arithmetic (DuckDB oracle).
 *  - `verifiable = false` (production default): `xxhash64` of the key,
 *    better mixing for adversarial/sequential key patterns.
 *
 * The key is reduced mod `buckets` BEFORE the multiply so the product
 * stays far from Long overflow (ANSI mode throws on overflow); with the
 * multiplier coprime to `buckets` the map is a bijection on residues, so
 * sequential ids sample uniformly at exactly the requested rate.
 */
object Sampling {

  private val Multiplier = 2654435761L // Knuth's 2^32 / phi, odd → coprime to 10^6
  private val Buckets = 1000000L

  /** Bucket assignment in [0, Buckets) for a numeric key column. */
  private[pipeline] def bucketOf(key: Column, verifiable: Boolean): Column =
    if (verifiable) pmod(pmod(key.cast(LongType), lit(Buckets)) * Multiplier, lit(Buckets))
    else pmod(xxhash64(key), lit(Buckets))

  /**
   * Deterministic Bernoulli sampling: keep rows whose key hashes below
   * `fraction` of the bucket space. A pure codegen'd filter — at scale it
   * rides the parquet scan (no shuffle, no sort, no RNG state).
   */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 verifiable: Boolean = false): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    df.where(bucketOf(col(keyCol), verifiable) < lit((fraction * Buckets).toLong))
  }

  /**
   * Stratified cap: at most `n` rows per stratum, chosen by hash priority
   * (lowest buckets win) with the key as the total tie-break — a
   * deterministic "uniform n per group". One shuffle on the stratum
   * column; skewed strata are bounded by the cap itself. Emits the input
   * columns unchanged.
   */
  def stratifiedCap(df: DataFrame, strataCol: String, keyCol: String, n: Int,
                    verifiable: Boolean = false): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(bucketOf(col(keyCol), verifiable), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /**
   * Deterministic train/validation/test splits: assign each row a split
   * name by hash range — `splits` are (name, fraction) pairs in order;
   * fractions must sum to ≤ 1 and any remainder falls to the LAST split.
   * The same pure narrow filter shape as [[hashSample]] (one codegen'd
   * CASE over the bucket, no shuffle), and the same auditability
   * guarantee: reruns produce bit-identical splits, and a row's split
   * never depends on the presence of other rows.
   */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
                verifiable: Boolean = false): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "fractions must be non-negative")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val bucket = bucketOf(col(keyCol), verifiable)
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + (f * Buckets).toLong
    }.tail
    val cases = splits.zip(bounds).dropRight(1).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        val c = when(bucket < hi, lit(name))
        Some(acc.fold(c)(prev => prev.when(bucket < hi, lit(name))))
    }
    val splitCol = cases.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn("split", splitCol)
  }

  /**
   * Token-budget packing — the pretraining layout step: documents are
   * (logically) concatenated in key order within each shard and the
   * stream is cut every `budget` tokens. Emits per-document placement:
   * `chunk` (which context window the document STARTS in) and `offset`
   * (token position within that chunk); a document may straddle chunk
   * boundaries, exactly as concat-then-split training pipelines do.
   *
   * The window is partitioned by `shardCol` — the global order a naive
   * packer would need is replaced by per-shard order, so at 100 TB each
   * shard packs independently (one shuffle on the shard key, bounded
   * partition state).
   */
  def packByTokenBudget(df: DataFrame, shardCol: String, keyCol: String,
                        tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(keyCol))
    val start = coalesce(
      sum(col(tokenCol)).over(w) - col(tokenCol), lit(0L)).cast(LongType)
    df.withColumn("chunk", floor(start / budget).cast(LongType))
      .withColumn("offset", pmod(start, lit(budget.toLong)))
  }
}
