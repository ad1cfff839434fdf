package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Engine-side link-prediction TRAINING — the other half of the
 * reference's `train` verb. The reference ships each graph partition to
 * a Python worker that fits a GraphSAGE + inner-product link classifier
 * with Keras (`src_python/models/supervised.py:86-133`: sigmoid 'ip'
 * head, binary cross-entropy, Adam) and federates the weights through
 * `src_python/fl_server.py`. Here the same supervised objective trains
 * INSIDE the engine as a sequence of Spark aggregations, so no Python
 * round-trip, no per-partition model shipping:
 *
 *  - node representations come from [[Gcn.forward]] (the engine's
 *    GraphSAGE-style convolution);
 *  - an edge example is the Hadamard product of its endpoint embeddings
 *    (the node2vec/GraphSAGE binary-operator family; the reference's
 *    'ip' inner-product head is this feature map with all-ones weights);
 *  - negatives are DETERMINISTIC rotation samples (below) rather than
 *    `EdgeSplitter`'s seeded RNG — reruns are bit-identical, which is
 *    what makes the training auditable and oracle-replayable;
 *  - the optimizer is full-batch gradient descent on the logistic loss:
 *    each iteration is ONE map-side-combinable aggregation producing the
 *    d+1 gradient sums, and the driver holds only the weight vector.
 *    Full-batch GD over Spark replaces mini-batch Adam: same objective,
 *    deterministic trajectory, and the per-iteration cost is a single
 *    scan however large the example set is — the right trade at 100 TB
 *    where a shuffled mini-batch stream would dominate runtime.
 *
 * Scale shape: `trainLogistic` is iters × (one scan + partial agg);
 * nothing but a (d+1)-vector ever reaches the driver. `edgeFeatures` is
 * two equi-joins against the embedding frame (broadcast when small).
 * `rotationNegatives` sorts only the DISTINCT destination set — fine
 * whenever destinations are label-like (bipartite product/category/IP
 * graphs); for a billion-destination social graph swap in a hash-range
 * rotation (documented on the method).
 */
object LinkPrediction {

  private val Multiplier = 2654435761L // Knuth 2^32/phi (Sampling.scala discipline)
  private val Buckets = 1000000L
  private def knuth(c: Column): Column =
    pmod(pmod(c.cast(LongType), lit(Buckets)) * Multiplier, lit(Buckets))

  /**
   * Deterministic negative sampling by destination rotation: index the
   * distinct destinations 0..n-1 in sorted order; a positive edge whose
   * destination sits at index j yields the candidate negative at index
   * `(j + 1 + knuth(hashKey) mod (n-1)) mod n` — never j itself, and the
   * Knuth-hash shift decorrelates the rotation from insertion order.
   * Candidates that happen to be REAL edges are dropped by an anti-join,
   * so the output is a true negative set of ≤ one row per positive.
   *
   * The destination index is a DISTRIBUTED range-partitioned sort of
   * the distinct dst set plus `zipWithIndex` partition offsets (the
   * `denseIdsByOrder` pattern) — no single-partition `row_number()`
   * window anywhere, so a billion-destination set still indexes as a
   * normal sort. The positives themselves are never globally sorted.
   *
   * @param edges      positive edges.
   * @param hashKeyCol numeric column of `edges` seeding the per-edge
   *                   rotation shift.
   * @return (srcCol, dstCol) negative pairs (same column names).
   */
  def rotationNegatives(edges: DataFrame, srcCol: String, dstCol: String,
                        hashKeyCol: String): DataFrame = {
    val spark = edges.sparkSession
    val dsts = edges.select(col(dstCol)).distinct()
    // dense 0-based index in engine sort order: DataFrame orderBy is a
    // range-partitioned sort whose partitions ascend by index, so
    // zipWithIndex yields exactly the global rank — same values the
    // window produced, without the one-task funnel
    val idxRdd = dsts.orderBy(col(dstCol)).rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    val idx = spark.createDataFrame(idxRdd,
      dsts.schema.add("__j", LongType, nullable = false))
    val n = idx.count()
    require(n >= 2, "need at least two distinct destinations to rotate")
    val cand = edges.select(col(srcCol), col(dstCol), col(hashKeyCol))
      .join(idx, Seq(dstCol))
      .select(col(srcCol),
        pmod(col("__j") + 1 + pmod(knuth(col(hashKeyCol)), lit(n - 1)),
          lit(n)).as("__nj"))
      .join(idx.withColumnRenamed("__j", "__nj"), Seq("__nj"))
      .select(col(srcCol), col(dstCol))
    cand.join(edges.select(col(srcCol), col(dstCol)),
      Seq(srcCol, dstCol), "left_anti")
  }

  /**
   * Hadamard edge features: join endpoint embeddings onto (src, dst)
   * pairs and emit `x_k = h_src[k] * h_dst[k]` per embedding column —
   * the symmetric binary operator under which a linear scorer with
   * all-ones weights recovers the reference's inner-product head.
   * Carries through any extra columns of `pairs` (e.g. a label).
   */
  def edgeFeatures(pairs: DataFrame, emb: DataFrame, idCol: String,
                   featCols: Seq[String], srcCol: String = "src",
                   dstCol: String = "dst"): DataFrame = {
    val hs = emb.select(col(idCol).as(srcCol) +:
      featCols.map(c => col(c).as(s"__s_$c")): _*)
    val hd = emb.select(col(idCol).as(dstCol) +:
      featCols.map(c => col(c).as(s"__d_$c")): _*)
    val joined = pairs.join(hs, Seq(srcCol)).join(hd, Seq(dstCol))
    val keep = pairs.columns.map(col).toSeq
    val xs = featCols.zipWithIndex.map { case (c, k) =>
      (col(s"__s_$c") * col(s"__d_$c")).as(s"x$k")
    }
    joined.select(keep ++ xs: _*)
  }

  /**
   * Full-batch logistic-regression training by gradient descent.
   *
   * Model: p = sigmoid(w · x + b); loss = mean binary cross-entropy
   * (the reference head's objective, `supervised.py:127`). Update per
   * iteration, zero-initialized:
   *
   *   g_k = Σ (p_i − y_i) x_ik / n      g_b = Σ (p_i − y_i) / n
   *   w_k ← w_k − lr · g_k              b ← b − lr · g_b
   *
   * Each iteration executes as ONE aggregation (d+1 sums + a count,
   * all map-side combinable); the weight vector lives on the driver as
   * d+1 doubles and is folded into the next iteration's expressions as
   * literals — no broadcast, no shuffle beyond the partial-agg exchange.
   * Deterministic given the example set up to floating-point summation
   * order; callers comparing cross-engine round the scores.
   *
   * @return weights (aligned with featCols) :+ bias.
   */
  def trainLogistic(examples: DataFrame, featCols: Seq[String],
                    labelCol: String, iters: Int, lr: Double): Array[Double] = {
    require(iters >= 0 && lr > 0, "iters >= 0, lr > 0")
    val d = featCols.size
    val w = Array.fill(d + 1)(0.0)
    // eager localCheckpoint: the example frame is scanned once per
    // iteration — pin the computed values, self-cleaning via the
    // ContextCleaner (the Dedup.scala cache-leak discipline)
    val ex = examples.select(
        featCols.map(c => col(c).cast(DoubleType)) :+
          col(labelCol).cast(DoubleType).as(labelCol): _*)
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val p = sigmoid(margin(featCols, w))
      val r = p - col(labelCol)
      val aggs = featCols.map(c => sum(r * col(c))) :+ sum(r) :+ count(lit(1))
      val row: Row = ex.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(d + 1).toDouble
      var k = 0
      while (k <= d) { w(k) -= lr * row.getDouble(k) / n; k += 1 }
      it += 1
    }
    w
  }

  /**
   * FEDERATED logistic training — the engine counterpart of the
   * reference's worker-federation loop (`src_python/fl_server.py:85-105`
   * `update_model`: global = Σ nₖ·wₖ / Σ nₖ, FedAvg weighted by each
   * client's example count, for `rounds` training cycles;
   * `src_python/fl_client.py:133-136`: each cycle a client sets the
   * received global weights and fits `epochs` local epochs on its own
   * partition before reporting back).
   *
   * Here the "workers" are the groups of `partCol` (the engine's graph
   * partitions — e.g. a hash of the partitioning key, exactly what the
   * reference's partitioner assigns to workers), and one GLOBAL
   * aggregation per local epoch trains every worker simultaneously:
   * the K current weight vectors live in a K-row broadcast frame joined
   * onto the examples, and `groupBy(partCol)` produces all K gradient
   * sums map-side-combined in a single pass. The driver holds K×(d+1)
   * doubles; rounds × localEpochs passes total — the same per-iteration
   * cost shape as [[trainLogistic]] however large the example set is.
   * No worker sockets, no model shipping: the federation schedule is
   * replayed exactly, as Spark aggregations.
   *
   * With `localEpochs = 1` FedAvg degenerates to the centralized step —
   * Σ nₖ(w − lr·gₖ)/Σ nₖ = w − lr·g — so the trajectory equals
   * [[trainLogistic]] up to float associativity (spec-pinned).
   *
   * The reference's ORGANIZATION-level hierarchy
   * (`src_python/org_agg.py:74-90` — org servers FedAvg their own
   * workers, a top aggregator FedAvgs the orgs) needs no separate code
   * path: both levels weight by example count, and a weighted average
   * of weighted averages IS the flat weighted average over all workers
   * — `trainFederated` with the flat worker partition computes the
   * identical global model. Likewise the SCHEDULED variant
   * (`fl_server_shed.py:78-102` / `fl_client_shed.py`: one client
   * machine trains several partitions sequentially under the C++
   * memory scheduler, the server still averages per-PARTITION models
   * by partition size) — the global update is the same flat
   * partition-weighted FedAvg; which physical machine computes which
   * partition is exactly what Spark's own scheduler decides here.
   *
   * @param partCol integral worker/partition id column (K distinct
   *                values = the worker fleet; gated to ≤ 65536 — the
   *                reference's `max_conn` is single digits).
   * @return FedAvg'd global weights (aligned with featCols) :+ bias.
   */
  def trainFederated(examples: DataFrame, featCols: Seq[String],
                     labelCol: String, partCol: String, rounds: Int,
                     localEpochs: Int, lr: Double): Array[Double] = {
    require(rounds >= 0 && localEpochs >= 1 && lr > 0,
      "rounds >= 0, localEpochs >= 1, lr > 0")
    val spark = examples.sparkSession
    val d = featCols.size
    val ex = examples.select(col(partCol).cast(LongType).as(partCol) +:
        (featCols.map(c => col(c).cast(DoubleType)) :+
          col(labelCol).cast(DoubleType).as(labelCol)): _*)
      .localCheckpoint(true)
    // the worker fleet: K partition ids + FedAvg sizes. K is the
    // reference's client count — a fleet, not data; gate before collect
    val sizeRows = ex.groupBy(col(partCol)).agg(count(lit(1)).as("__n"))
    val kCount = sizeRows.count()
    require(kCount >= 1 && kCount <= 65536,
      s"partCol must carry a worker fleet (1..65536 partitions), got $kCount")
    val sized = sizeRows.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val parts = sized.map(_._1)
    val totalN = sized.map(_._2).sum.toDouble
    var global = Array.fill(d + 1)(0.0)
    val wSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(partCol, LongType,
        nullable = false) +:
        ((0 until d).map(k => org.apache.spark.sql.types
          .StructField(s"__w$k", DoubleType, nullable = false)) :+
          org.apache.spark.sql.types.StructField("__wb", DoubleType,
            nullable = false)))
    var round = 0
    while (round < rounds) {
      // every client starts the cycle from the received global model
      val local = scala.collection.mutable.LinkedHashMap(
        parts.map(p => p -> global.clone()): _*)
      var epoch = 0
      while (epoch < localEpochs) {
        val wdf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            parts.map(p => Row.fromSeq(p +: local(p).toSeq)).toSeq, 1),
          wSchema)
        val j = ex.join(broadcast(wdf), Seq(partCol))
        val marginC = featCols.zipWithIndex
          .map { case (c, k) => col(c) * col(s"__w$k") }
          .foldLeft(col("__wb"))(_ + _)
        val r = sigmoid(marginC) - col(labelCol)
        val aggs = featCols.map(c => sum(r * col(c))) :+
          sum(r) :+ count(lit(1))
        j.groupBy(col(partCol)).agg(aggs.head, aggs.tail: _*)
          .collect().foreach { row =>
            val w = local(row.getLong(0))
            val n = row.getLong(d + 2).toDouble
            var k = 0
            while (k <= d) { w(k) -= lr * row.getDouble(k + 1) / n; k += 1 }
          }
        epoch += 1
      }
      // fl_server.update_model: global = Σ nₖ·wₖ / Σ nₖ
      global = Array.tabulate(d + 1)(k =>
        sized.map { case (p, n) => n * local(p)(k) }.sum / totalN)
      round += 1
    }
    global
  }

  /** sigmoid(w · x + b) as a column over the feature columns. */
  def scoreColumn(featCols: Seq[String], weights: Array[Double]): Column = {
    require(weights.length == featCols.size + 1,
      s"need ${featCols.size} weights + bias, got ${weights.length}")
    sigmoid(margin(featCols, weights))
  }

  /**
   * Classifier evaluation — the engine-side half of the reference's
   * `evaluate()` (`supervised.py:146-152, 195-207` logs accuracy,
   * recall, AUC, F1, precision on the held-out split). One row:
   * (accuracy, precision, recall, f1, auc), each NULL when its
   * denominator is empty (no predicted positives, one-class set).
   *
   * Accuracy/precision/recall/F1 threshold `scoreCol` at `threshold`;
   * AUC is the exact Mann–Whitney statistic via average ranks. Ranks
   * never globally sort the rows: the score HISTOGRAM (one
   * map-side-combinable aggregate) carries per-score counts, a
   * range-partitioned distributed prefix sum ([[graft.operators
   * .Relational.prefixSum]]) yields each score's preceding-row count,
   * and avgrank = cumless + (ties+1)/2 — ties counted ½ as the
   * statistic requires. Every term is an integer or half-integer, so
   * the statistic is EXACT regardless of summation order; callers
   * wanting cross-engine replay round the score column first so both
   * engines tie identically.
   */
  def evaluate(scored: DataFrame, scoreCol: String, labelCol: String,
               threshold: Double = 0.5): DataFrame = {
    val s = col(scoreCol).cast(DoubleType)
    val y = col(labelCol).cast(DoubleType)
    val pred = (s > lit(threshold)).cast(DoubleType)
    val base = scored.select(s.as("__s"), y.as("__y"), pred.as("__p"))
    val hist = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__y")).as("__pos"))
    val ranked = graft.operators.Relational
      .prefixSum(hist, "__s", "__cnt", "__cumless")
      .select((col("__cumless") + (col("__cnt") + 1).cast(DoubleType) / 2)
        .as("__avgrk"), col("__pos"))
    val rankAgg = ranked.agg(
      sum(col("__avgrk") * col("__pos")).as("posranks"))
    val agg = base.agg(
      sum(col("__y") * col("__p")).as("tp"),
      sum((lit(1.0) - col("__y")) * col("__p")).as("fp"),
      sum(col("__y") * (lit(1.0) - col("__p"))).as("fn"),
      sum((lit(1.0) - col("__y")) * (lit(1.0) - col("__p"))).as("tn"),
      sum(col("__y")).as("npos"), sum(lit(1.0) - col("__y")).as("nneg"))
      .crossJoin(broadcast(rankAgg))
    agg.select(
      ((col("tp") + col("tn")) / (col("npos") + col("nneg"))).as("accuracy"),
      (col("tp") / nullIfZero(col("tp") + col("fp"))).as("precision"),
      (col("tp") / nullIfZero(col("tp") + col("fn"))).as("recall"),
      (lit(2.0) * col("tp") /
        nullIfZero(lit(2.0) * col("tp") + col("fp") + col("fn"))).as("f1"),
      ((col("posranks") - col("npos") * (col("npos") + 1) / 2)
        / nullIfZero(col("npos") * col("nneg"))).as("auc"))
  }

  private def nullIfZero(c: Column): Column = when(c =!= 0, c)

  private def margin(featCols: Seq[String], w: Array[Double]): Column =
    featCols.zipWithIndex
      .map { case (c, k) => col(c) * lit(w(k)) }
      .foldLeft(lit(w(featCols.size)).cast(DoubleType))(_ + _)

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))
}
