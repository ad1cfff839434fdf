package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Distributed GCN FORWARD pass — the engine-side half of the
 * reference's `predict` verb. The reference runs GraphSAGE-style
 * convolutions inside Python workers over per-partition exports
 * (`src_python/models/supervised.py:45-85`, fed by the
 * [[FeatureExport]] frames); here the same convolution executes as a
 * Spark plan, so scoring with an ALREADY-TRAINED model needs no Python
 * round-trip: load the trained weight matrices, run `forward`, join
 * the embeddings wherever they're consumed. [[trainLayerIp]] closes the
 * loop engine-side: it trains the layer weight matrix itself against
 * the reference's inner-product link objective (the federated
 * orchestration of `fl_server.py` — process management, socket
 * weight-averaging — is subsumed by Spark's own distribution).
 *
 * Layer rule (mean-aggregator GraphSAGE / random-walk-normalized GCN,
 * Kipf & Welling 2017 with D⁻¹Ã instead of the symmetric norm):
 *
 *   H⁽ˡ⁺¹⁾ = σ( mean over Ã-neighbors of H⁽ˡ⁾ · W⁽ˡ⁾ )
 *
 * where Ã adds a self-loop so isolated nodes keep their own signal.
 *
 * Scale shape per layer: ONE equi-join (edge list ⋈ features on the
 * source) + ONE map-side-combinable groupBy(dst) summing each feature
 * column — no arrays, no posexplode, no per-edge×dim row blowup; the
 * weight matmul and activation are pure narrow projections. A k-layer
 * net is k such shuffles, exactly the message-passing cost floor.
 *
 * Determinism: the aggregation sums each feature column THEN divides
 * by the neighbor count once, and the matmul folds coordinates in a
 * FIXED left-associated order (the emb_pq_adc parity discipline) — so
 * with integer input features the first layer is bit-replayable in any
 * engine (one correctly-rounded division per feature, one fixed-order
 * fold). Deeper layers sum already-inexact doubles under Spark's
 * partition order; callers comparing cross-engine round the output.
 */
object Gcn {

  /** ReLU. */
  val Relu: Column => Column = c => greatest(c, lit(0.0))
  /** Identity (for the output layer of a regression head). */
  val Linear: Column => Column = identity

  /**
   * One convolution layer over explicit feature COLUMNS.
   *
   * @param edges    directed message edges (src, dst) — pass both
   *                 orientations for undirected graphs
   *                 ([[graft.model.PropertyGraph.bothOrientations]]).
   * @param features (idCol, featCols…) node frame.
   * @param weights  W as rows×cols = featCols.size × outDim.
   * @param activation applied per output coordinate.
   * @param selfLoop include the node's own features in its mean (Ã).
   * @return (idCol, h0…h{outDim-1}); nodes with no in-message and no
   *         self-loop are absent (no neighborhood to aggregate).
   */
  def layer(edges: DataFrame, features: DataFrame, idCol: String,
            featCols: Seq[String], weights: Array[Array[Double]],
            activation: Column => Column = Relu,
            selfLoop: Boolean = true): DataFrame = {
    require(weights.length == featCols.size,
      s"weight rows ${weights.length} != feature count ${featCols.size}")
    val outDim = weights.head.length
    require(outDim > 0 && weights.forall(_.length == outDim),
      "weight matrix must be rectangular and non-empty")
    val withMeans = meanAggregate(edges, features, idCol, featCols, selfLoop)
    // fixed left-associated fold per output coordinate — replayable as
    // a left-to-right list_sum in any engine
    val outCols = (0 until outDim).map { j =>
      val termsIt = featCols.indices.map { i =>
        col(s"__m$i") * lit(weights(i)(j))
      }
      activation(termsIt.reduceLeft(_ + _)).as(s"h$j")
    }
    withMeans.select(col(idCol) +: outCols: _*)
  }

  /**
   * The Ã·X mean-aggregation alone — the layer rule before the weight
   * matmul. ONE equi-join + ONE map-side-combinable groupBy; sum-then-
   * divide keeps integer inputs exact (one correctly-rounded division
   * per feature). Output columns `__m0 … __m{d-1}` aligned with
   * `featCols`; shared by [[layer]] and [[trainLayerIp]].
   */
  def meanAggregate(edges: DataFrame, features: DataFrame, idCol: String,
                    featCols: Seq[String], selfLoop: Boolean = true): DataFrame = {
    require(featCols.nonEmpty, "need at least one feature column")
    val f = features.select(col(idCol) +: featCols.map(col): _*)
    // message rows: every in-edge carries the source's features to dst,
    // plus (optionally) the node's own row — the Ã self-loop
    val msgs0 = edges.select(col("src"), col("dst"))
      .join(f.withColumnRenamed(idCol, "src"), Seq("src"))
      .select(col("dst").as(idCol) +: featCols.map(col): _*)
    val msgs = if (selfLoop) msgs0.unionByName(f) else msgs0
    val sums = msgs.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        featCols.map(c => sum(col(c)).as(s"__s_$c")): _*)
    val means = featCols.zipWithIndex.map { case (c, i) =>
      (col(s"__s_$c") / col("__n")).as(s"__m$i")
    }
    sums.select(col(idCol) +: means: _*)
  }

  /**
   * Multi-layer forward pass: ReLU between layers, linear output layer
   * (the standard embedding/scoring head). Input features are the
   * columns of `features` minus `idCol`; layer l maps dims
   * `weights(l).length → weights(l).head.length`.
   */
  def forward(edges: DataFrame, features: DataFrame, idCol: String,
              weights: Seq[Array[Array[Double]]],
              selfLoop: Boolean = true): DataFrame = {
    require(weights.nonEmpty, "need at least one weight matrix")
    var h = features
    var cols = features.columns.filterNot(_ == idCol).toSeq
    weights.zipWithIndex.foreach { case (w, l) =>
      val act = if (l == weights.size - 1) Linear else Relu
      h = layer(edges, h, idCol, cols, w, act, selfLoop)
      cols = (0 until w.head.length).map(j => s"h$j")
    }
    h
  }

  /** Deterministic dyadic break-symmetry init: 1/8 on the cyclic
    * diagonal, −1/16 elsewhere — full rank, exactly representable,
    * trivially replayable as literals in any engine. */
  def defaultInit(d: Int, outDim: Int): Array[Array[Double]] =
    Array.tabulate(d, outDim)((i, j) => if (i == j % d) 0.125 else -0.0625)

  /**
   * End-to-end LAYER-WEIGHT training against the reference's link
   * objective — the part of the `train` verb [[LinkPrediction]]'s
   * logistic head left open. The reference fits the GraphSAGE layer
   * kernels with Keras (`supervised.py:113-133`: layers + sigmoid 'ip'
   * inner-product head, binary cross-entropy); here the same model
   *
   *   z_u = (Ã·X)_u W        s(u,v) = sigmoid(z_u · z_v)
   *
   * trains by full-batch gradient descent on W, executed Spark-first.
   *
   * The whole loop rides ONE algebraic identity: with the 'ip' head,
   * both the margin and the gradient factor through the pairwise
   * product tensor  P_ik = a_u[i]·a_v[k]  (a = aggregated features),
   * which does not depend on W:
   *
   *   margin(u,v) = Σ_ik M_ik P_ik          with M = W·Wᵀ  (d×d)
   *   ∂L/∂W       = (T + Tᵀ)·W / n          with T_ik = Σ_pairs δ·P_ik
   *
   * where δ = s − y. So P is computed ONCE (two equi-joins, then
   * checkpointed), and every iteration is a single map-side-combinable
   * aggregation producing the d² sums T — no joins, no shuffle beyond
   * the partial-agg exchange, the driver holding only W (d×outDim) and
   * the tiny d²-matrix products. Per-iteration cost is one scan of the
   * cached pair frame however large the example set — the same 100 TB
   * trade as [[LinkPrediction.trainLogistic]].
   *
   * Determinism: P entries are products of exact mean-aggregates;
   * margin and driver matrix products fold in fixed left-associated
   * order; the only cross-engine drift is the T summation order
   * (~1e-13 relative), absorbed by rounding scores at read time.
   * Pairs whose endpoints never receive a message (absent from Ã·X)
   * are dropped by the inner join — score them separately if needed.
   *
   * @param pairs  (srcCol, dstCol, labelCol) training examples, label
   *               1 = positive edge / 0 = negative sample.
   * @param outDim embedding width (W is featCols.size × outDim).
   * @param init   optional initial W; defaults to [[defaultInit]]
   *               (zero init is a fixed point — G = (T+Tᵀ)·0 = 0).
   * @return the trained W, rows aligned with featCols.
   */
  def trainLayerIp(edges: DataFrame, features: DataFrame, idCol: String,
                   featCols: Seq[String], pairs: DataFrame,
                   outDim: Int, iters: Int, lr: Double,
                   selfLoop: Boolean = true,
                   init: Option[Array[Array[Double]]] = None,
                   srcCol: String = "src", dstCol: String = "dst",
                   labelCol: String = "label"): Array[Array[Double]] = {
    require(iters >= 0 && lr > 0, "iters >= 0, lr > 0")
    val d = featCols.size
    var w = init.map(_.map(_.clone())).getOrElse(defaultInit(d, outDim))
    require(w.length == d && w.forall(_.length == outDim),
      s"init must be ${d}x$outDim")
    val a = meanAggregate(edges, features, idCol, featCols, selfLoop)
    val au = a.select(col(idCol).as(srcCol) +:
      (0 until d).map(i => col(s"__m$i").as(s"__u$i")): _*)
    val av = a.select(col(idCol).as(dstCol) +:
      (0 until d).map(k => col(s"__m$k").as(s"__v$k")): _*)
    val pCols = for (i <- 0 until d; k <- 0 until d)
      yield (col(s"__u$i") * col(s"__v$k")).as(s"__p_${i}_$k")
    // the W-independent pair tensor, computed once and pinned (eager
    // localCheckpoint — scanned every iteration, ContextCleaner-managed)
    val ex = pairs.select(col(srcCol), col(dstCol), col(labelCol))
      .join(au, Seq(srcCol)).join(av, Seq(dstCol))
      .select(col(labelCol).cast(DoubleType).as("__y") +: pCols: _*)
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      // M = W·Wᵀ on the driver, fixed j-ascending fold
      val m = Array.tabulate(d, d) { (i, k) =>
        var s = 0.0; var j = 0
        while (j < outDim) { s += w(i)(j) * w(k)(j); j += 1 }
        s
      }
      val margin = (for (i <- 0 until d; k <- 0 until d)
        yield col(s"__p_${i}_$k") * lit(m(i)(k))).reduceLeft(_ + _)
      val delta = lit(1.0) / (lit(1.0) + exp(-margin)) - col("__y")
      val aggs = (for (i <- 0 until d; k <- 0 until d)
        yield sum(delta * col(s"__p_${i}_$k"))) :+ count(lit(1))
      val row: Row = ex.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(d * d).toDouble
      val t = Array.tabulate(d, d)((i, k) => row.getDouble(i * d + k))
      val next = Array.tabulate(d, outDim) { (i, j) =>
        var g = 0.0; var k = 0
        while (k < d) { g += (t(i)(k) + t(k)(i)) * w(k)(j); k += 1 }
        w(i)(j) - lr * g / n
      }
      w = next
      it += 1
    }
    w
  }
}
