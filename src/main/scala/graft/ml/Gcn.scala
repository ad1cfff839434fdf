package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed GCN FORWARD pass — the engine-side half of the
 * reference's `predict` verb. The reference runs GraphSAGE-style
 * convolutions inside Python workers over per-partition exports
 * (`src_python/models/supervised.py:45-85`, fed by the
 * [[FeatureExport]] frames); here the same convolution executes as a
 * Spark plan, so scoring with an ALREADY-TRAINED model needs no Python
 * round-trip: load the trained weight matrices, run `forward`, join
 * the embeddings wherever they're consumed. (Training — the federated
 * gradient loop of `fl_server.py` — stays out of scope by design.)
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
    require(featCols.nonEmpty, "need at least one feature column")
    require(weights.length == featCols.size,
      s"weight rows ${weights.length} != feature count ${featCols.size}")
    val outDim = weights.head.length
    require(outDim > 0 && weights.forall(_.length == outDim),
      "weight matrix must be rectangular and non-empty")

    val f = features.select(col(idCol) +: featCols.map(col): _*)
    // message rows: every in-edge carries the source's features to dst,
    // plus (optionally) the node's own row — the Ã self-loop
    val msgs0 = edges.select(col("src"), col("dst"))
      .join(f.withColumnRenamed(idCol, "src"), Seq("src"))
      .select(col("dst").as(idCol) +: featCols.map(col): _*)
    val msgs = if (selfLoop) msgs0.unionByName(f) else msgs0

    // sum-then-divide: feature sums stay exact for integer inputs and
    // partial-aggregate map-side; ONE division per feature afterwards
    val sums = msgs.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        featCols.map(c => sum(col(c)).as(s"__s_$c")): _*)
    val means = featCols.map(c => (col(s"__s_$c") / col("__n")).as(s"__m_$c"))
    val withMeans = sums.select(col(idCol) +: means: _*)

    // fixed left-associated fold per output coordinate — replayable as
    // a left-to-right list_sum in any engine
    val outCols = (0 until outDim).map { j =>
      val termsIt = featCols.zipWithIndex.map { case (c, i) =>
        col(s"__m_$c") * lit(weights(i)(j))
      }
      activation(termsIt.reduceLeft(_ + _)).as(s"h$j")
    }
    withMeans.select(col(idCol) +: outCols: _*)
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
}
