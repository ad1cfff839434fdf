package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines, exact → fuzzy:
 *
 *  - exact / normalized-exact: hash-groupBy, one shuffle on the digest.
 *  - MinHash + LSH: shingles → k minhashes (columnar, no explode of the
 *    hash space) → banded bucket join → exact-Jaccard verification of
 *    candidates only. The classic near-dup pipeline at corpus scale: cost
 *    is one narrow map over documents plus a shuffle on (band, bucket),
 *    never an all-pairs product.
 *  - SimHash: 64-bit signature via per-bit token-hash voting; near-dups
 *    found by 16-bit chunk banding + Hamming verification (bit_count(xor)).
 *
 * Everything is built from codegen'd higher-order functions — zero UDFs.
 */
object Dedup {

  // ----- exact ------------------------------------------------------------

  /** Keep the lowest-id row per exact text digest. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dupes"))

  /** Exact dedup after whitespace/case normalization. */
  def normalizedExact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dupes"))

  /**
   * Cross-source PRIORITY dedup — the corpus-union step of a curation
   * pipeline: when the same content arrives from several sources
   * (curated dump vs crawl vs mirror), each duplicate group keeps ONE
   * document chosen by source priority, not arrival order. `key` is the
   * grouping column (a digest, a normalized-prefix hash for templated
   * docs, or a near-dup cluster label); `priority` lists sources best
   * first — unlisted sources rank behind every listed one, ties break on
   * the smallest id, so the winner is total-order deterministic.
   * Returns one row per group: (digest, idCol, sourceCol, dupes).
   *
   * Shape: ONE shuffle on the group key; both window functions (rank
   * row_number + group count) share that partitioning. At 100 TB this
   * is the same cost as exact dedup — the priority logic is free.
   */
  def priorityDedup(df: DataFrame, idCol: String, sourceCol: String,
                    key: Column, priority: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rank = priority.zipWithIndex.foldRight(lit(priority.size): Column) {
      case ((s, i), acc) => when(col(sourceCol) === s, lit(i)).otherwise(acc)
    }
    val byKey = Window.partitionBy(col("digest"))
    df.select(key.as("digest"), col(idCol), col(sourceCol), rank.as("__rank"))
      .withColumn("__rn",
        row_number().over(byKey.orderBy(col("__rank"), col(idCol))))
      .withColumn("dupes", count(lit(1)).over(byKey))
      .where(col("__rn") === 1)
      .select(col("digest"), col(idCol), col(sourceCol), col("dupes"))
  }

  // ----- MinHash + LSH ----------------------------------------------------

  /** Deterministic permutation parameters (a_i, b_i) for H hash functions,
    * from a fixed LCG seed so signatures are reproducible run-to-run. */
  private[pipeline] def hashParams(numHashes: Int): (Seq[Long], Seq[Long]) = {
    val p = 1000000007L
    var state = 42L
    def next(): Long = { state = (state * 6364136223846793005L + 1442695040888963407L); math.floorMod(state, p - 1) + 1 }
    val as = Seq.fill(numHashes)(next())
    val bs = Seq.fill(numHashes)(next())
    (as, bs)
  }

  private val P = 1000000007L

  /** The (id, s0..s{H-1}) signature table, computed by the one-pass
    * [[graft.functions.MinhashSignature]] expression: no shingle explode,
    * no 64-min aggregate, no exchange on the signature path (the explode +
    * aggregate formulation it replaces measured ~2.5 s of the sf0.1
    * pipeline's ~3.7 s — dominating banding and verification; parity with
    * it is spec-asserted). Documents shorter than `shingleSize` chars
    * have no shingles and are absent, exactly like the row formulation. */
  private def sigTable(df: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int, numHashes: Int): DataFrame = {
    val (as, bs) = hashParams(numHashes)
    df.select(col(idCol).as("id"),
        graft.functions.minhashSig(
          regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
          shingleSize, as.toArray, bs.toArray, P).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("id") +: (0 until numHashes).map(j =>
        col("sig").getItem(j).as(s"s$j")): _*)
  }

  /** The one-pass MinHash signature as a column over RAW text (same
    * normalization and deterministic hash params as [[sigTable]]); NULL
    * for documents shorter than `shingleSize`. Shared with the streaming
    * near-dup form ([[graft.streaming.StreamDedup.nearDupMinhash]]). */
  def minhashSigCol(textCol: String, shingleSize: Int, numHashes: Int): Column = {
    val (as, bs) = hashParams(numHashes)
    graft.functions.minhashSig(
      regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
      shingleSize, as.toArray, bs.toArray, P)
  }

  /** MinHash signature (array of numHashes longs) over a shingle-array
    * column. h_i(s) = (a_i * (xxhash64(s) mod P) + b_i) mod P; signature_i
    * = min over shingles. Computed columnar with transform/array_min. */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    val (as, bs) = hashParams(numHashes)
    val aArr = array(as.map(lit): _*)
    val bArr = array(bs.map(lit): _*)
    val hashed = transform(shingles, s => pmod(xxhash64(s), lit(P)))
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(hashed,
        h => pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1), lit(P)))))
  }

  /**
   * One row per distinct character shingle: (id, shingle). Built with
   * explode-then-substr so the normalized text is computed ONCE per
   * document — a lambda-captured expression would be re-evaluated per
   * array element (observed quadratic blow-up), and higher-order
   * functions don't participate in whole-stage codegen at all. Explode +
   * projection + hash-aggregate do.
   */
  /** `dedup = false` skips the distinct — a full-data shuffle that
    * aggregates insensitive to duplicates (min over a multiset == min
    * over its set) don't need. */
  private def shinglePosting(df: DataFrame, textCol: String, idCol: String, k: Int,
                             dedup: Boolean = true): DataFrame = {
    val raw = df.select(col(idCol).as("id"),
      regexp_replace(lower(trim(col(textCol))), "\\s+", " ").as("norm"))
      .where(length(col("norm")) >= k)
      .select(col("id"), col("norm"),
        explode(sequence(lit(0), length(col("norm")) - k)).as("pos"))
      // posting key is the 64-bit hash, not the string: every downstream
      // join/aggregate shuffles 8-byte keys (collisions are ~(n^2)/2^65 —
      // negligible and deterministic)
      .select(col("id"), xxhash64(col("norm").substr(col("pos") + 1, lit(k))).as("shingle"))
    if (dedup) raw.distinct() else raw
  }

  /** One row per distinct word n-gram: (id, shingle). Tokens are exploded
    * with positions and n-grams assembled with window lead()s — same
    * no-lambda-capture, codegen-friendly shape as [[shinglePosting]].
    * Shared with [[TextAnalysis.contamination]]. */
  private[pipeline] def ngramPosting(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(lower(trim(col(textCol))), "\\s+")))
      .where(length(col("col")) > 0)
      .select(col("id"), col("pos"), col("col").as("tok"))
    val w = Window.partitionBy("id").orderBy("pos")
    val grams = (1 until n).foldLeft(toks.withColumn("g", col("tok"))) { (d, i) =>
      d.withColumn("g", concat_ws(" ", col("g"), lead(col("tok"), i).over(w)))
        .withColumn(s"ok$i", lead(col("tok"), i).over(w).isNotNull)
    }
    val okCols = (1 until n).map(i => col(s"ok$i")).reduceOption(_ && _).getOrElse(lit(true))
    grams.where(okCols).select(col("id"), xxhash64(col("g")).as("shingle")).distinct()
  }

  /** Materialize a small result frame and release the pinned
    * intermediates that produced it: localCheckpoint(eager) computes the
    * result with full parallelism and truncates its lineage, so the
    * unpersists can't trigger a recompute at the caller's terminal
    * action. This is the leak fix for the persist()-without-unpersist
    * pattern (each invocation used to pin MEMORY_AND_DISK blocks for the
    * session lifetime) AND the fix for downstream single-task consumers
    * (union-find's coalesce(1) used to re-run the whole pair pipeline in
    * one thread once the cache was gone). */
  private def materializeAndRelease(result: DataFrame, pinned: Seq[DataFrame]): DataFrame = {
    val out = result.localCheckpoint(true)
    pinned.foreach(_.unpersist())
    out
  }

  /** Exact Jaccard for candidate pairs, from posting lists alone:
    * |A∩B| via a shingle-equality join restricted to the candidates,
    * |A∪B| = |A| + |B| − |A∩B|. Only narrow rows ever shuffle.
    * Returns the result plus the frames it pinned, for the caller to
    * release once the result is materialized. */
  private def verifyJaccard(candidates0: DataFrame, posting0: DataFrame,
                            threshold: Double, eager: Boolean): (DataFrame, Seq[DataFrame]) = {
    // both inputs feed ≥3 joins below. Eager mode: the caller passes
    // already-materialized candidates and the posting is checkpointed
    // here — row-store blocks, no columnar cache build, nothing pinned
    // past the call. Lazy mode: persist() pins one computation of each
    // (the posting side carries a full shingle explode + distinct) and
    // ownership of the pins transfers to the caller via the return.
    val (candidates, posting, pinned) =
      if (eager) (candidates0, posting0.localCheckpoint(true), Seq.empty[DataFrame])
      else {
        val c = candidates0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val p = posting0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (c, p, Seq(c, p))
      }
    val sizes = posting.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(posting.select(col("id").as("idA"), col("shingle")), Seq("idA"))
      .join(posting.select(col("id").as("idB"), col("shingle")), Seq("idB", "shingle"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("inter"))
    val res = candidates
      .join(inter, Seq("idA", "idB"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("id").as("idA"), col("sz").as("szA")), Seq("idA"))
      .join(sizes.select(col("id").as("idB"), col("sz").as("szB")), Seq("idB"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("szA") + col("szB") - col("inter")).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
    (res, Seq(candidates, posting))
  }

  /**
   * Candidate near-duplicate pairs via banded LSH over MinHash signatures.
   * Returns (idA, idB, jaccard) with idA < idB and exact shingle-set
   * Jaccard ≥ threshold. bands * rowsPerBand = numHashes.
   *
   * Shape at scale: posting explode (narrow) → one hash-aggregate with
   * numHashes min() columns (the signature; all codegen'd) → banded
   * bucket self-join on (band, bucket, id) only → exact verification via
   * posting-intersection joins. No all-pairs product, no wide shuffles.
   *
   * `eager = true` (default) materializes the (small) pair list via
   * localCheckpoint and releases every pinned intermediate before
   * returning — no cache blocks outlive the call, and downstream
   * consumers (e.g. [[nearDupClusters]]' single-task union-find) read
   * checkpointed blocks instead of re-running the pipeline. Pass
   * `eager = false` to get the fully lazy plan (plan-inspection /
   * composition into a larger lazy pipeline); the caller then owns the
   * lifecycle of the pinned intermediates (clear with
   * `spark.sharedState.cacheManager.clearCache()` or accept the leak).
   */
  def minhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, prefilterMargin: Double = 0.25,
      eager: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val (as, bs) = hashParams(numHashes)

    // sigs feeds THREE consumers (the banded bucket join's two sides and
    // the agreement prefilter's A/B sides) — one materialization is
    // mandatory; relying on runtime exchange reuse instead was observed
    // NOT to fire here (the consumers sit under differently-shaped parent
    // exchanges), which re-ran the signature computation per consumer.
    // Eager mode checkpoints (row-store blocks, self-cleaning via the
    // ContextCleaner); lazy mode persists (the columnar cache build and
    // the pin outliving the call are acceptable only for plan
    // inspection / caller-owned caches).
    val sigsPlan = sigTable(df, textCol, idCol, shingleSize, numHashes)
    val sigs =
      if (eager) sigsPlan.localCheckpoint(true)
      else sigsPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val bucketCols = (0 until bands).map { b =>
      val bandSig = (b * rows until (b + 1) * rows).map(i => col(s"s$i"))
      struct(lit(b).as("band"), xxhash64(bandSig: _*).as("bucket"))
    }
    val banded = sigs.select(col("id"), explode(array(bucketCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val l = banded.select(col("band"), col("bucket"), col("id").as("idA"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("idB"))
    val collided = l.join(r, Seq("band", "bucket"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"))
      .distinct()

    // Signature-agreement prefilter: the banding S-curve at r rows/band is
    // permissive well below the threshold (r=4 collides j≈0.3 pairs at
    // ~1% per band), and every surviving candidate costs |A|+|B| posting
    // rows in the exact-verify join — the dominant term when the corpus
    // has broad template overlap. The estimated jaccard (fraction of the
    // numHashes already-computed mins agreeing — a codegen'd sum of
    // equality flags, ~numHashes ops per PAIR instead of per shingle)
    // drops candidates more than `prefilterMargin` below the threshold.
    // At 64 hashes the estimator's σ is ≤ 0.0625, so the default margin
    // of 0.25 is a ≥4σ guard: miss probability ~3e-7 per true pair —
    // orders of magnitude below the banding's own miss rate (~2e-4 at
    // j = 0.8), i.e. strictly within the existing LSH recall budget.
    // The signature aggregate is the same exchange the banding read, so
    // Spark reuses it rather than recomputing (ReusedExchange).
    val minAgree = math.ceil((threshold - prefilterMargin) * numHashes)
    val candidates = if (minAgree <= 0) collided else {
      val aSig = sigs.select(col("id").as("idA") +:
        (0 until numHashes).map(i => col(s"s$i").as(s"a$i")): _*)
      val bSig = sigs.select(col("id").as("idB") +:
        (0 until numHashes).map(i => col(s"s$i").as(s"b$i")): _*)
      val agree = (0 until numHashes)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      collided.join(aSig, Seq("idA")).join(bSig, Seq("idB"))
        .where(agree >= lit(minAgree))
        .select(col("idA"), col("idB"))
    }
    // the candidate list feeds the doc semi-join AND both verify joins;
    // eager mode pins the (tiny) list once so the banding join never re-runs
    val cand =
      if (eager) candidates.localCheckpoint(true) else candidates

    // exact verification touches only the docs that appear in some
    // candidate pair — and the semi-join runs against the DOCUMENTS
    // table, BEFORE the shingle explode. Semi-joining the exploded
    // posting instead would re-run the full-corpus shingle generation
    // a second time (Catalyst cannot push a join through the generate),
    // doubling the dominant cost; here the verify-side explode touches
    // candidate docs only, and the posting-dedup distinct runs over that
    // same small corpus.
    val candDocs = cand.select(col("idA").as("id"))
      .unionByName(cand.select(col("idB").as("id")))
      .distinct()
    val candCorpus = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(candDocs, Seq("id"), "left_semi")
    val posting = shinglePosting(candCorpus, "__text", "id", shingleSize, dedup = true)
    val (res, pinned) = verifyJaccard(cand, posting, threshold, eager)
    if (eager) materializeAndRelease(res, pinned) else res
  }

  /**
   * CROSS-corpus fuzzy contamination: near-duplicate (corpus, benchmark)
   * pairs via the same banded-MinHash construction as [[minhashPairs]],
   * but with the two sides coming from different frames — the fuzzy
   * complement of [[TextAnalysis.contamination]]'s exact-gram overlap
   * (a paraphrased or lightly-edited benchmark leak shares most shingles
   * without sharing any exact 8-gram). Returns (idA, idB, jaccard) with
   * idA from `corpus`, idB from `bench`, exact shingle Jaccard ≥
   * threshold.
   *
   * Shape at scale: signatures are computed per side (the benchmark side
   * is tiny — typically thousands of eval documents vs billions of
   * training docs), the bucket join shuffles only (band, bucket, id), and
   * exact verification explodes candidate documents only. Everything is
   * eagerly checkpointed and released — no cache blocks outlive the call.
   */
  def crossMinhashPairs(
      corpus: DataFrame, bench: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, prefilterMargin: Double = 0.25): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    def sigsOf(df: DataFrame): DataFrame =
      sigTable(df, textCol, idCol, shingleSize, numHashes)
        .localCheckpoint(true)
    val bucketCols = (0 until bands).map { b =>
      val bandSig = (b * rows until (b + 1) * rows).map(i => col(s"s$i"))
      struct(lit(b).as("band"), xxhash64(bandSig: _*).as("bucket"))
    }
    def bandedOf(sigs: DataFrame, side: String): DataFrame =
      sigs.select(col("id").as(side), explode(array(bucketCols: _*)).as("bb"))
        .select(col(side), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val sigsA = sigsOf(corpus)
    val sigsB = sigsOf(bench)
    val collided = bandedOf(sigsA, "idA").join(bandedOf(sigsB, "idB"), Seq("band", "bucket"))
      .select(col("idA"), col("idB")).distinct()

    // signature-agreement prefilter, same ≥4σ-margin contract as
    // minhashPairs (the estimator reads the already-computed mins)
    val minAgree = math.ceil((threshold - prefilterMargin) * numHashes)
    val candidates = if (minAgree <= 0) collided else {
      val aSig = sigsA.select(col("id").as("idA") +:
        (0 until numHashes).map(i => col(s"s$i").as(s"a$i")): _*)
      val bSig = sigsB.select(col("id").as("idB") +:
        (0 until numHashes).map(i => col(s"s$i").as(s"b$i")): _*)
      val agree = (0 until numHashes)
        .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
        .reduce(_ + _)
      collided.join(aSig, Seq("idA")).join(bSig, Seq("idB"))
        .where(agree >= lit(minAgree))
        .select(col("idA"), col("idB"))
    }
    val cand = candidates.localCheckpoint(true)

    // exact verification: explode only the candidate documents per side
    def postingOf(df: DataFrame, keep: DataFrame): DataFrame =
      shinglePosting(
        df.select(col(idCol).as("id"), col(textCol).as("__text"))
          .join(keep, Seq("id"), "left_semi"),
        "__text", "id", shingleSize, dedup = true).localCheckpoint(true)
    val postA = postingOf(corpus, cand.select(col("idA").as("id")).distinct())
    val postB = postingOf(bench, cand.select(col("idB").as("id")).distinct())
    val szA = postA.groupBy("id").agg(count(lit(1)).as("szA"))
    val szB = postB.groupBy("id").agg(count(lit(1)).as("szB"))
    val inter = cand
      .join(postA.select(col("id").as("idA"), col("shingle")), Seq("idA"))
      .join(postB.select(col("id").as("idB"), col("shingle")), Seq("idB", "shingle"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("inter"))
    val res = cand
      .join(inter, Seq("idA", "idB"), "left").na.fill(0L, Seq("inter"))
      .join(szA.select(col("id").as("idA"), col("szA")), Seq("idA"))
      .join(szB.select(col("id").as("idB"), col("szB")), Seq("idB"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("szA") + col("szB") - col("inter")).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
    materializeAndRelease(res, Seq.empty)
  }

  /**
   * Exact n-gram Jaccard similarity for all candidate pairs sharing at
   * least one n-gram (inverted-index join; quadratic only within posting
   * lists).
   *
   * `maxDocFreq` caps candidate generation: n-grams shared by more than
   * that many documents (stopword grams) are excluded from the inverted-
   * index self-join, whose cost is Σ df² over posting lists — one gram in
   * 10⁶ docs alone makes 10¹² candidate rows at corpus scale. Verification
   * still uses the FULL posting lists, so reported jaccard values stay
   * exact; the (documented) approximation is that a pair sharing ONLY
   * frequent grams is never considered. With near-dup thresholds ≥ 0.3
   * such pairs share many grams, so any rare one recovers the pair.
   */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Long = Long.MaxValue,
      eager: Boolean = true): DataFrame = {
    // the posting (tokenize + window-lead n-grams + distinct) feeds the
    // size aggregate, the inverted index AND the capped add-back joins —
    // pin one materialization instead of re-running the explode per
    // consumer (same fix as minhashPairs' signature aggregate). Eager →
    // checkpoint (self-cleaning); lazy → persist (caller-owned pin).
    val postingPlan = ngramPosting(df, textCol, idCol, n)
    val posting =
      if (eager) postingPlan.localCheckpoint(true)
      else postingPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = posting.groupBy("id").agg(count(lit(1)).as("sz"))
    val dfreq = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    val indexed = posting
      .join(dfreq.where(col("df") <= maxDocFreq).select("shingle"), Seq("shingle"))

    // ONE pass produces both the candidate pairs and their rare-gram
    // intersection counts — the count the old shape threw away and then
    // recomputed by re-joining every candidate against its FULL posting
    // list (|candidates| × avg-grams-per-doc intermediate rows, the
    // dominant cost of this operator).
    val l = indexed.select(col("shingle"), col("id").as("idA"))
    val r = indexed.select(col("shingle"), col("id").as("idB"))
    val interRare = l.join(r, Seq("shingle"))
      .where(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("interR"))

    // capped runs add back the FREQUENT-gram intersections, but only for
    // the candidate pairs and only over the few df>cap grams — so the
    // reported jaccard stays exact while the Σdf² explosion never happens
    val inter =
      if (maxDocFreq == Long.MaxValue)
        interRare.select(col("idA"), col("idB"), col("interR").as("inter"))
      else {
        val freqPost = posting
          .join(dfreq.where(col("df") > maxDocFreq).select("shingle"), Seq("shingle"))
        val interFreq = interRare.select(col("idA"), col("idB"))
          .join(freqPost.select(col("id").as("idA"), col("shingle")), Seq("idA"))
          .join(freqPost.select(col("id").as("idB"), col("shingle")), Seq("idB", "shingle"))
          .groupBy("idA", "idB").agg(count(lit(1)).as("interF"))
        interRare.join(interFreq, Seq("idA", "idB"), "left")
          .select(col("idA"), col("idB"),
            (col("interR") + coalesce(col("interF"), lit(0L))).as("inter"))
      }

    val res = inter
      .join(sizes.select(col("id").as("idA"), col("sz").as("szA")), Seq("idA"))
      .join(sizes.select(col("id").as("idB"), col("sz").as("szB")), Seq("idB"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("szA") + col("szB") - col("inter")).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
    if (eager) materializeAndRelease(res, Seq.empty) else res
  }

  // ----- SimHash ----------------------------------------------------------

  /** Value 0-15 of a single lowercase hex digit column. */
  private def hexVal(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  /** 64-bit SimHash of the token multiset: bit b of the signature is set
    * iff the sum over tokens of (bit b of the token hash ? +1 : -1) is
    * non-negative. The token hash is the first 64 bits of md5 read as 16
    * hex digits (bit b = bit b%4 of digit b/4) — chosen over xxhash64
    * because every engine can replay md5, making signatures verifiable
    * against an independent implementation. */
  def simhash(textCol: String): Column = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)), b => {
          val d = hexVal(md5(t).substr(call_function("shiftright", b, lit(2)) + 1, lit(1)))
          call_function("shiftright", d, pmod(b, lit(4))).bitwiseAND(lit(1)).cast(LongType)
        }),
        (a, bit) => a + bit * 2 - 1))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, b) => when(v >= 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash signatures computed the codegen-friendly way: tokens exploded
    * once, the token hash computed once per token, 64 per-bit vote sums in
    * one hash aggregate, signature folded from the votes with compile-time
    * shift constants. Semantically identical to [[simhash]] (kept as the
    * column-level API).
    *
    * Two token-hash modes:
    *  - `verifiable = true` (default): first 64 bits of md5 read as 16 hex
    *    digits — every engine can replay md5, so signatures are checkable
    *    against an independent implementation (the DuckDB oracle does);
    *  - `verifiable = false`: xxhash64 token bits — ~2× cheaper per token
    *    (the md5 mode costs ≈2× in the sf0.1 bench), same signature
    *    properties, for production corpora where cross-engine replay
    *    isn't needed. */
  private def simhashSigs(df: DataFrame, textCol: String, idCol: String,
                          verifiable: Boolean = true): DataFrame = {
    if (verifiable) {
      // one-pass native expression (the MinhashSignature treatment): no
      // token explode, no 16-digit projection, no 64 sum() aggregates —
      // parity with the row formulation is spec-asserted
      return df.select(col(idCol).as("id"),
          graft.functions.simhashSig(lower(trim(col(textCol)))).as("sig"))
        .where(col("sig").isNotNull)
    }
    val toksRaw = df.select(col(idCol).as("id"),
      posexplode(split(lower(trim(col(textCol))), "\\s+")))
      .where(length(col("col")) > 0)
    val votes = {
        val toks = toksRaw.select(col("id"), xxhash64(col("col")).as("h"))
        val voteCols = (0 until 64).map { b =>
          sum(call_function("shiftright", col("h"), lit(b)).bitwiseAND(lit(1)) * 2 - 1).as(s"v$b")
        }
        toks.groupBy("id").agg(voteCols.head, voteCols.tail: _*)
      }
    val sig = (0 until 64).map(b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    votes.select(col("id"), sig.as("sig"))
  }

  /** Near-duplicate pairs by SimHash: band the 64-bit signature into four
    * 16-bit chunks (any exact chunk match → candidate, guaranteeing recall
    * for Hamming distance ≤ 3 within wrong-chunks), then verify
    * bit_count(xor) ≤ maxHamming. `verifiable = false` switches to the
    * xxhash64 production token hash (see [[simhashSigs]]). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3,
                   verifiable: Boolean = true): DataFrame = {
    val sigs = simhashSigs(df, textCol, idCol, verifiable)
    val chunked = sigs.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk"), call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL).as("v")))).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk").as("chunk"), col("cc.v").as("v"))
    val l = chunked.select(col("chunk"), col("v"), col("id").as("idA"), col("sig").as("sigA"))
    val r = chunked.select(col("chunk"), col("v"), col("id").as("idB"), col("sig").as("sigB"))
    l.join(r, Seq("chunk", "v"))
      .where(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", call_function("bit_count", col("sigA").bitwiseXOR(col("sigB"))))
      .where(col("hamming") <= maxHamming)
      .select(col("idA"), col("idB"), col("hamming"))
  }

  // ----- embedding near-dup ----------------------------------------------

  /**
   * Near-duplicate pairs by embedding cosine ≥ threshold, via BANDED
   * random-hyperplane LSH (the sign-bucket analogue of [[minhashPairs]]'
   * OR-of-bands construction):
   *
   *  - `bands` independent bands, each hashing the vector's sign pattern
   *    under `rowsPerBand` deterministic ±1 (Rademacher) hyperplanes into
   *    one bucket key;
   *  - a pair collides if it shares a bucket in ANY band (OR semantics),
   *    so pair recall is 1 − (1 − p^r)^b with p = 1 − θ/π per plane.
   *    At cosine 0.99 (θ ≈ 0.14 rad, p ≈ 0.955) and the default 16×8 the
   *    miss probability is (1 − 0.955⁸)¹⁶ ≈ 3e-9 — recall-safe, unlike a
   *    single AND-of-planes bucket (recall ≈ 0.69 at the same cosine);
   *  - exact cosine verification on the candidate pairs only.
   *
   * Scale notes: the shuffle key is (band, bucket) with bands·2^r distinct
   * values; per-band-bucket membership is what must stay sub-quadratic,
   * so `rowsPerBand = 0` (the default) AUTO-SCALES r with the corpus —
   * r = ⌈log₂(n/4)⌉ clamped [8, 20], holding expected occupancy ~4 as n
   * grows (a FIXED r made candidate pairs grow quadratically: 10× the
   * embeddings measured 14× the wall in the round-9 sf1 spot bench).
   * `bands = 0` then derives b from the threshold's per-plane collision
   * probability to pin miss ≤ 1e-6 (clamped [8, 64]; at thresholds
   * ≲0.85 the cap binds — pass explicit geometry there). Auto mode pays
   * one bounded count; explicit (bands, rowsPerBand) skips it and is the
   * replayable-oracle regime. Vectors shuffle once into buckets; no
   * all-pairs product.
   */
  /** Deterministic ±1 Rademacher hyperplane matrix (planes × dim) from a
    * fixed LCG — precomputed driver-side so bucketing costs multiply-adds
    * only, never a per-element hash evaluation inside a lambda. */
  private[pipeline] def planeSignMatrix(planes: Int, dim: Int): Array[Array[Double]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Array.fill(planes) { Array.fill(dim) { if (((next() >>> 32) & 1L) == 1L) 1.0 else -1.0 } }
  }

  def embeddingCosinePairs(
      df: DataFrame, vecCol: String, idCol: String,
      bands: Int = 0, rowsPerBand: Int = 0, threshold: Double = 0.95): DataFrame = {
    require(bands >= 0 && rowsPerBand >= 0, "bands/rowsPerBand must be >= 0 (0 = auto)")
    val v = col(vecCol)
    // dimensionality probed from the first row with a non-empty vector
    // (null vectors produce a null size and are skipped); empty input
    // short-circuits dim to 1 and yields zero candidates
    val dim = df.select(size(v).as("d")).where(col("d") > 0).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)

    // rows whose vector is null or differently-sized are excluded up
    // front — zip_with null-padding would otherwise send them all to
    // bucket 0, degenerating the bucket join to an all-pairs product
    val clean = df.where(size(v) === dim)

    // auto LSH geometry (see scaladoc): r holds ~4 rows per band-bucket,
    // b pins the OR-of-bands miss probability at ≤1e-6 for this threshold
    val autoRows =
      if (rowsPerBand > 0) rowsPerBand
      else {
        val n = math.max(1L, clean.count())
        math.max(8, math.min(20,
          math.ceil(math.log(n / 4.0) / math.log(2.0)).toInt))
      }
    val autoBands =
      if (bands > 0) bands
      else {
        val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
        val denom = math.log1p(-math.pow(p, autoRows))
        if (!(denom < 0.0)) 8 // p^r ~ 1: one band already catches everything
        else math.max(8, math.min(64, math.ceil(math.log(1e-6) / denom).toInt))
      }
    val planes = autoBands * autoRows
    val signs = planeSignMatrix(planes, dim)

    // Bucketing in the simhashSigs shape: the vector exploded ONCE, the
    // (pos → plane sign) matrix broadcast as a dim-row table, and all
    // plane dots computed in ONE codegen'd hash aggregate. The previous
    // formulation evaluated bands·rowsPerBand interpreted
    // aggregate(zip_with(vec, literal)) expressions per row — higher-order
    // functions don't codegen, costing ~22 ms/row and >1 MiB task
    // binaries. Identical planes, identical buckets, same candidates.
    val spark = df.sparkSession
    val planeSchema = StructType(StructField("pos", IntegerType, nullable = false) +:
      (0 until planes).map(p => StructField(s"sg$p", DoubleType, nullable = false)))
    val planeRows = (0 until dim).map { d =>
      org.apache.spark.sql.Row.fromSeq(d +: (0 until planes).map(p => signs(p)(d)))
    }
    val planesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(planeRows, 1), planeSchema)

    val exploded = clean.select(col(idCol).as("id"), posexplode(v).as(Seq("pos", "x")))
    val dotCols = (0 until planes).map(p => sum(col("x") * col(s"sg$p")).as(s"dot$p"))
    val dots = exploded.join(broadcast(planesDf), Seq("pos"))
      .groupBy("id").agg(dotCols.head, dotCols.tail: _*)
    val bucketCols = (0 until autoBands).map { b =>
      val sig = (0 until autoRows).map { r =>
        when(col(s"dot${b * autoRows + r}") >= 0, lit(1L << r)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
      struct(lit(b).as("band"), sig.as("bucket"))
    }

    val vecs = clean.select(col(idCol).as("id"), v.as("vec"),
      graft.functions.vecNorm(v).as("nrm"))

    // candidate generation shuffles ONLY (band, bucket, id) — vectors are
    // joined back for the verification pass, never through the bucket join
    val banded = dots.select(col("id"), explode(array(bucketCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("idA"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("idB"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"))
      .distinct()

    candidates
      .join(vecs.select(col("id").as("idA"), col("vec").as("vA"), col("nrm").as("nA")), Seq("idA"))
      .join(vecs.select(col("id").as("idB"), col("vec").as("vB"), col("nrm").as("nB")), Seq("idB"))
      .withColumn("cosine",
        graft.functions.vecDot(col("vA"), col("vB")) / (col("nA") * col("nB")))
      .where(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }

  /**
   * SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
   * arXiv:2303.09540): k-means-cluster the embedding space, then find
   * near-duplicate pairs by exact cosine WITHIN each cluster only — the
   * cluster bound is what makes the quadratic verify tractable (per-
   * cluster cost (n/k)²; `k = 0`, the default, AUTO-SCALES k ≈ √n via
   * [[Similarity.autoBuckets]] so total pair work grows ~n^1.5 at EVERY
   * corpus size — flat trained k-means up to ~16.7M vectors, two-level
   * coarse-k-means + sign-plane refinement beyond, so no flat-cap
   * quadratic at billion-vector scale — pass an explicit k for
   * replayable-oracle or known-scale regimes; vs
   * [[embeddingCosinePairs]], which band-hashes for near-exact duplicates,
   * this catches semantically-close rewrites at lower thresholds where
   * hyperplane LSH would need impractically many bands).
   *
   * Returns a TOTAL map (id, canonical) over every input row with a
   * usable vector: canonical = smallest id in the row's within-cluster
   * cosine-component ([[nearDupClusters]]), or the row itself when it has
   * no semantic duplicate. Compaction keeps rows where id == canonical.
   * Deterministic end to end ([[Similarity.trainCentroids]] seeds from
   * the k smallest ids). Null/empty/zero-norm vectors are excluded (they
   * have no cosine direction).
   *
   * Scale shape: training is the sampled-k-means cost; assignment is one
   * broadcast pass; pair generation shuffles vectors ONCE on cluster id;
   * clustering of the (tiny) pair list is adaptive union-find /
   * star-contraction. The assignment frame feeds both join sides, so it
   * is materialized eagerly (minhashPairs' checkpoint pattern) and
   * nothing stays pinned after the call.
   */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
                    k: Int = 0, iters: Int = 5, threshold: Double = 0.9): DataFrame = {
    require(k >= 0, s"k must be >= 0 (0 = auto): $k")
    val clean = df
      .select(col(idCol).as("id"), transform(col(vecCol), _.cast(DoubleType)).as("vec"))
      .where(col("vec").isNotNull && size(col("vec")) > 0)
      .withColumn("nrm", graft.functions.vecNorm(col("vec")))
      .where(col("nrm") > 0)
    val assigned = (if (k == 0) Similarity.autoBuckets(clean, iters)
      else {
        val cents = Similarity.trainCentroids(clean, "id", "vec", k, iters)
        Similarity.assignClusters(clean, "id", "vec", cents, "cid", "cvec")
          .select(col("cid"), col("id"), col("vec"), col("nrm"))
      })
      .localCheckpoint(true)
    val l = assigned.select(col("cid"), col("id").as("idA"),
      col("vec").as("vA"), col("nrm").as("nA"))
    val r = assigned.select(col("cid"), col("id").as("idB"),
      col("vec").as("vB"), col("nrm").as("nB"))
    val pairs = l.join(r, Seq("cid"))
      .where(col("idA") < col("idB"))
      .where(graft.functions.vecDot(col("vA"), col("vB")) / (col("nA") * col("nB"))
        >= lit(threshold))
      .select(col("idA"), col("idB"))
    val clusters = nearDupClusters(pairs)
    assigned.select(col("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id"), coalesce(col("canonical"), col("id")).as("canonical"))
  }

  /**
   * One-call near-duplicate corpus COMPACTION — the operation a training
   * pipeline actually runs: [[minhashPairs]] → [[nearDupClusters]] →
   * anti-join, keeping every document that is its cluster's canonical
   * (smallest id) plus every document in no near-dup pair at all. The
   * pair list and cluster map are tiny relative to the corpus, so the
   * only full-corpus costs are the minhash scan and one broadcast-sized
   * anti-join against the loser set.
   */
  def compact(df: DataFrame, textCol: String, idCol: String,
              shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
              threshold: Double = 0.8): DataFrame = {
    val pairs = minhashPairs(df, textCol, idCol, shingleSize, numHashes, bands, threshold)
    val clusters = nearDupClusters(pairs)
    val losers = clusters.where(col("id") =!= col("canonical"))
      .select(col("id").as("__loser"))
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }

  /**
   * Corpus compaction keeping the BEST member of each near-dup cluster —
   * the selection policy real training pipelines use (keep the longest /
   * highest-scoring copy, drop the rest) instead of [[compact]]'s
   * smallest-id canonical. The representative is argmax(score), ties to
   * the smaller id; the score is the house integer token count of
   * `textCol` (an exact, engine-replayable ranking — no float ordering).
   * Documents in no near-dup pair survive untouched.
   *
   * Shape at scale: pairs and clusters are near-dup-sized by
   * construction; the winner pick is one window over clusters; the full
   * corpus is touched only by the final left_anti join on id.
   */
  def compactBest(df: DataFrame, textCol: String, idCol: String,
                  shingleSize: Int = 5, numHashes: Int = 64, bands: Int = 16,
                  threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = minhashPairs(df, textCol, idCol, shingleSize, numHashes, bands, threshold)
    val clusters = nearDupClusters(pairs)
    val scored = clusters.join(
      df.select(col(idCol).as("id"), TextAnalysis.tokenCount(textCol).as("__score")),
      Seq("id"))
    val w = Window.partitionBy("canonical")
      .orderBy(col("__score").desc, col("id"))
    val losers = scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") > 1)
      .select(col("id").as("__loser"))
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }

  // ----- near-dup clustering ------------------------------------------------

  /**
   * Connected components over a near-duplicate PAIR list (the output of
   * [[minhashPairs]] / [[simhashPairs]] / [[ngramJaccardPairs]] /
   * [[embeddingCosinePairs]]): returns (id, canonical) for every document
   * appearing in some pair, where canonical is the smallest id in the
   * component — a corpus compaction keeps exactly the rows with
   * canonical == id (plus every document in no pair at all).
   *
   * Adaptive execution: the pair graph is SMALL relative to the corpus
   * by construction (only near-dup members appear), so up to
   * `localThreshold` pairs the components are solved exactly by a
   * single-task union-find ON AN EXECUTOR (union-by-min-root + path
   * compression — the root invariant makes the final root the component
   * minimum, i.e. the same canonical the iterative form computes). 10M
   * pairs ≈ a few hundred MB in one task — cheap next to the dedup scan
   * that produced them. Beyond the threshold (a 100 TB corpus can emit
   * billions of pairs) the distributed path takes over:
   *
   * alternating large-star/small-star contraction (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC'14): each round
   * re-points nodes at their neighborhood minimum, converging in
   * O(log n) rounds REGARDLESS of component diameter — a long duplicate
   * chain (templated documents) that would starve min-label propagation
   * (O(diameter) rounds) contracts in a handful. Each round is two
   * grouped-min + join passes over the pair graph only, localCheckpointed
   * to keep plan depth O(1). `maxRounds` is a runaway bound, not a
   * semantic knob; non-convergence throws rather than returning wrong
   * canonicals.
   */
  def nearDupClusters(pairs: DataFrame, idA: String = "idA", idB: String = "idB",
                      maxRounds: Int = 50,
                      localThreshold: Long = 10000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val rawEdges = pairs.select(col(idA).as("a"), col(idB).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nPairs = rawEdges.count()
    if (nPairs <= localThreshold) {
      // materialize BEFORE unpersisting: the union-find runs in one
      // coalesced task, and leaving it lazy meant the caller's terminal
      // action re-ran the entire upstream pair pipeline single-threaded
      // once the cache below was dropped (observed 16 s vs 2 s for the
      // identical minhash pipeline)
      val out = unionFindClusters(rawEdges).localCheckpoint(true)
      rawEdges.unpersist()
      return out
    }
    val out = starContractionClusters(rawEdges, maxRounds, nPairs)
    rawEdges.unpersist()
    out
  }

  /** One large-star round: every node's strictly-larger neighbors re-point
    * at the minimum of its full neighborhood (incl. itself). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val m = nbrs.groupBy("a").agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    nbrs.join(m, Seq("a"))
      .where(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
  }

  /** One small-star round: every node and its ≤-neighbors re-point at the
    * minimum of that ≤-neighborhood. */
  private def smallStar(e: DataFrame): DataFrame = {
    val nbrs = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
      .where(col("b") <= col("a"))
    val m = nbrs.groupBy("a").agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    nbrs.join(m, Seq("a"))
      .select(col("b").as("x"), col("m"))
      .unionAll(m.select(col("a").as("x"), col("m")))
      .where(col("x") =!= col("m"))
      .select(col("x").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Distributed connected components by alternating star contraction.
    * Convergence is detected by an order-insensitive (count, XOR of
    * xxhash64) signature of the edge set — two consecutive identical
    * signatures on a distinct-ed set mean the set is fixed (collision
    * odds ~2⁻⁶⁴, strictly below the minhash pipeline's own error
    * budget; XOR rather than sum because an ANSI-mode sum of 2⁶³-scale
    * hashes overflows). At the fixpoint the edge set IS the star:
    * (member, component-min) rows; roots are added back as their own
    * canonical. */
  private[pipeline] def starContractionClusters(rawEdges: DataFrame, maxRounds: Int,
                                                nPairs: Long): DataFrame = {
    var edges = rawEdges.where(col("a") =!= col("b")).distinct().localCheckpoint(true)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)).as("c"),
        coalesce(call_function("bit_xor", xxhash64(col("a"), col("b"))), lit(0L)).as("h"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      edges = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = signature(edges)
      converged = nsig == sig
      sig = nsig
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"nearDupClusters: star contraction did not converge in $maxRounds rounds " +
        s"($nPairs pairs) — converging runs need ~2·log2(n) rounds, so this points at " +
        "a bug or a pathological id domain, not a deep component")
    val roots = edges.select(col("b")).distinct()
      .join(edges.select(col("a").as("b")), Seq("b"), "left_anti")
    // degenerate self-pairs (a == b) are dropped by the contraction but
    // are members of the pair list — keep them as singletons unless a
    // real pair already placed them in a component (union-find parity)
    val selfOnly = rawEdges.where(col("a") === col("b")).select(col("a")).distinct()
      .join(edges.select(col("a")), Seq("a"), "left_anti")
      .join(edges.select(col("b").as("a")), Seq("a"), "left_anti")
    edges.select(col("a").as("id"), col("b").as("canonical"))
      .unionAll(roots.select(col("b").as("id"), col("b").as("canonical")))
      .unionAll(selfOnly.select(col("a").as("id"), col("a").as("canonical")))
  }

  /** Exact connected components of a pair list in ONE executor task:
    * union-find with union-by-min-root and path compression, so the final
    * root of every member is the smallest id of its component. Ids are
    * compared numerically for integral columns, as strings otherwise. */
  private def unionFindClusters(edges: DataFrame): DataFrame = {
    val dt = edges.schema("a").dataType
    val ord: Ordering[Any] = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Ordering.by((x: Any) => x.asInstanceOf[Number].longValue)
      case _ => Ordering.by((x: Any) => String.valueOf(x))
    }
    val spark = edges.sparkSession
    val outRdd = edges.rdd.coalesce(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x0: Any): Any = {
        var x = x0
        while (parent(x) != x) {
          val gp = parent(parent(x))
          parent(x) = gp // path halving
          x = gp
        }
        x
      }
      it.foreach { r =>
        val (a, b) = (r.get(0), r.get(1))
        if (a != null && b != null) {
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            // min root absorbs: the invariant that makes root == min(component)
            if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
          }
        }
      }
      // snapshot keys before the final finds — path halving mutates values
      val ks = parent.keys.toArray
      ks.iterator.map(k => org.apache.spark.sql.Row(k, find(k)))
    }
    spark.createDataFrame(outRdd, StructType(Seq(
      StructField("id", dt), StructField("canonical", dt))))
  }
}
