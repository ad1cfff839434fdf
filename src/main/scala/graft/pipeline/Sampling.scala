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
   * Temperature-reweighted mixture sampling — the multilingual/multi-source
   * training-mix step (Conneau & Lample 2019 §3.1; the reference has no
   * analogue — this is training-pipeline surface): group g with c_g rows
   * gets target share ∝ c_g^alpha, so alpha = 1 preserves the natural
   * distribution, alpha → 0 approaches uniform-over-groups, and
   * low-resource groups are upsampled RELATIVELY (never beyond their own
   * size: rates cap at 1 — this is sampling without replacement).
   *
   * Per-group keep rate: rate_g = min(1, targetFraction·N·w_g / (Σw·c_g))
   * with w_g = round(c_g^alpha) held in EXACT integer arithmetic — the one
   * inexact step is the single pow() per group (Math.pow is ≤1 ulp, so a
   * flip needs the true value within an ulp of a half-integer); everything
   * after is integer sums plus one correctly-rounded IEEE multiply/divide
   * chain, making rates bit-replayable by any engine. Rows are then kept
   * by the same deterministic bucket filter as [[hashSample]].
   *
   * Scale shape: one aggregate over the group column (group cardinality ≪
   * rows — languages, sources), the tiny rate table broadcast back, and
   * the keep decision a pure codegen'd filter riding the scan. No global
   * shuffle of the corpus.
   */
  def temperatureSample(df: DataFrame, groupCol: String, keyCol: String,
                        alpha: Double, targetFraction: Double,
                        verifiable: Boolean = false): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0,1]: $targetFraction")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__w", round(pow(col("__c").cast("double"), lit(alpha)), 0).cast(LongType))
    val totals = counts.agg(sum(col("__c")).as("__n"), sum(col("__w")).as("__sw"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("__rate", least(lit(1.0),
        (lit(targetFraction) * col("__n").cast("double") * col("__w").cast("double")) /
          (col("__sw") * col("__c")).cast("double")))
      .withColumn("__thr", floor(col("__rate") * lit(Buckets.toDouble)).cast(LongType))
      .select(col(groupCol).as("__g"), col("__thr"))
    df.join(broadcast(rates), col(groupCol) === col("__g"))
      .where(bucketOf(col(keyCol), verifiable) < col("__thr"))
      .drop("__g", "__thr")
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

  /**
   * Deterministic epoch shuffle — the training-data ordering step.
   * Each epoch permutes the corpus by hashing the key WITH the epoch
   * folded in, then assigns every row a shard and a position inside that
   * shard: the global order of epoch e is (shard, pos). No global sort
   * exists anywhere — the only wide operation is the per-shard window,
   * so at 100 TB each shard orders independently (this is how epoch
   * shuffling actually ships: shard-level shuffle + within-shard order,
   * readers interleave shards).
   *
   * Verifiable mode keeps the whole chain in exact 64-bit arithmetic
   * (the [[hashSample]] Knuth bucket with the epoch mixed in mod the
   * bucket space), so any engine replays the permutation; production
   * mode uses xxhash64(key, epoch) for better mixing.
   */
  def epochShuffle(df: DataFrame, keyCol: String, epoch: Int, nShards: Int,
                   verifiable: Boolean = false): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    require(epoch >= 0, s"epoch must be non-negative: $epoch")
    val mixed =
      if (verifiable)
        pmod(pmod(pmod(col(keyCol).cast(LongType), lit(Buckets)) + lit(epoch.toLong * 7919L), lit(Buckets))
          * Multiplier, lit(Buckets))
      else pmod(xxhash64(col(keyCol), lit(epoch)), lit(Buckets))
    val withBucket = df.withColumn("__b", mixed)
      .withColumn("shard", pmod(col("__b"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__b"), col(keyCol))
    withBucket.withColumn("pos", row_number().over(w).cast(LongType)).drop("__b")
  }

  /**
   * Domain mixture weights — the table a training sampler consumes
   * (DoReMi-style temperature reweighting, Xie et al. 2023; the α-scaled
   * mixture of multilingual LM pretraining). Per domain: document count,
   * total token volume, and the normalized sampling weight
   * w_d = tokens_d^alpha / Σ tokens^alpha, flattened toward uniform as
   * alpha -> 0.
   *
   * Determinism contract (all-integer outputs, no float in the result):
   * the α-power is rounded to an integer ONCE per domain (`raw_w`, the
   * [[temperatureSample]] trick — the single ≤1-ulp pow is followed only
   * by exact arithmetic), and the normalized weight ships as parts-per-
   * million computed with INTEGER division: weight_ppm = raw_w·10⁶ div
   * Σraw_w. Hash-replayable by any engine, no rounding-mode fine print.
   *
   * Scale shape: one map-side-combinable aggregate over the corpus (the
   * token count rides the scan as a codegen'd column), then a broadcast-
   * sized domain table; nothing else touches the data.
   */
  def domainMixtureWeights(df: DataFrame, domainCol: String, textCol: String,
                           alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val agg = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(textCol).cast(LongType)).as("total_tokens"))
      .withColumn("raw_w",
        round(pow(col("total_tokens").cast("double"), lit(alpha)), 0).cast(LongType))
    val tot = agg.agg(sum(col("raw_w")).as("__sw"))
    agg.crossJoin(broadcast(tot))
      .withColumn("weight_ppm", expr("CAST((raw_w * 1000000) DIV __sw AS BIGINT)"))
      .select(col("domain"), col("n_docs"), col("total_tokens"),
        col("raw_w"), col("weight_ppm"))
  }

  /**
   * Weighted sampling WITHOUT replacement by PRIORITY SAMPLING
   * (Duffield, Lund & Thorup, JACM 2007): every row draws the
   * deterministic uniform u = (h+1)/2⁵⁶ from the first 14 md5 hex
   * digits of its key, gets priority q = w/u, and the k highest
   * priorities per group are the sample — heavy rows surface with
   * probability ≈ min(1, w/τ) and the scheme supports unbiased
   * subset-sum estimation, which plain weighted-Bernoulli doesn't.
   *
   * Replayability: the whole chain is hash digits → one BIGINT→DOUBLE
   * cast → two IEEE divisions. Casts and divisions are CORRECTLY
   * ROUNDED by IEEE 754 in every engine (unlike ln/pow, which vary by
   * libm), so priorities are bit-identical and the ranking replays
   * exactly; ties (impossible unless keys collide in 56 bits) break on
   * the key.
   *
   * Scale shape: narrow map for the priority, then the kmvSketch
   * two-level rank — per-PARTITION top-k first (layout-invariant
   * superset), so no single window task ever holds a whole group.
   * Returns the sampled rows with `priority` and `rank` (1..k).
   */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val grp = groupCols.map(col)
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 14), 16, 10)
      .cast(LongType)
    val priority = col(weightCol).cast("double") /
      ((h + lit(1L)).cast("double") / lit(72057594037927936.0)) // 16^14
    val scored = df
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("priority", priority)
    val localW = Window
      .partitionBy(grp :+ col("__pid"): _*)
      .orderBy(col("priority").desc, col(keyCol))
    val pruned = scored.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(localW))
      .where(col("__lr") <= k).drop("__pid", "__lr")
    val w = if (groupCols.isEmpty)
      Window.orderBy(col("priority").desc, col(keyCol))
    else Window.partitionBy(grp: _*).orderBy(col("priority").desc, col(keyCol))
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
