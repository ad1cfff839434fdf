package graft

import org.apache.spark.sql.functions._

import graft.ml.LinkPrediction

/**
 * Engine-side link-prediction training (reference analogue: the `train`
 * verb's GraphSAGE + sigmoid-'ip' link classifier fitted in Python
 * workers, `src_python/models/supervised.py:86-133`; here the logistic
 * head trains as full-batch GD over Spark aggregations).
 */
class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  test("rotationNegatives: deterministic, never a positive, one per edge") {
    val edges = Seq(
      (1L, "a", "X"), (2L, "b", "Y"), (3L, "c", "Z"), (4L, "d", "X"))
      .toDF("hk", "src", "dst")
    val neg1 = LinkPrediction.rotationNegatives(edges, "src", "dst", "hk")
      .orderBy("src").collect().map(r => (r.getString(0), r.getString(1)))
    val neg2 = LinkPrediction.rotationNegatives(edges, "src", "dst", "hk")
      .orderBy("src").collect().map(r => (r.getString(0), r.getString(1)))
    assert(neg1.toSeq === neg2.toSeq, "must be rerun-identical")
    assert(neg1.length === 4)
    val pos = Set(("a", "X"), ("b", "Y"), ("c", "Z"), ("d", "X"))
    assert(neg1.forall(p => !pos(p)), s"sampled a positive: ${neg1.toSeq}")
    val dsts = Set("X", "Y", "Z")
    assert(neg1.forall(p => dsts(p._2)), "negative dst outside the dst set")
  }

  test("rotationNegatives drops rotation collisions with real edges") {
    // dense bipartite: src "a" linked to BOTH dsts, so any rotation from
    // either of a's edges lands on a real edge and must be anti-joined out
    val edges = Seq((1L, "a", "X"), (1L, "a", "Y"), (2L, "b", "X"))
      .toDF("hk", "src", "dst")
    val neg = LinkPrediction.rotationNegatives(edges, "src", "dst", "hk")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(neg.forall(_._1 == "b"), s"a is saturated, got ${neg.toSeq}")
  }

  test("edgeFeatures: Hadamard product of endpoint embeddings") {
    val emb = Seq(("u", 2.0, 3.0), ("v", 5.0, 7.0)).toDF("id", "h0", "h1")
    val pairs = Seq(("u", "v", 1)).toDF("src", "dst", "label")
    val out = LinkPrediction.edgeFeatures(pairs, emb, "id", Seq("h0", "h1"))
      .select("src", "dst", "label", "x0", "x1").head()
    assert((out.getDouble(3), out.getDouble(4)) === ((10.0, 21.0)))
  }

  test("trainLogistic separates a linearly-separable set; GD reduces loss") {
    // y = 1 iff x0 > 0 — cleanly separable on one feature
    val ex = Seq(
      (1.0, 0.3, 1), (2.0, -0.5, 1), (1.5, 0.9, 1), (3.0, 0.1, 1),
      (-1.0, 0.4, 0), (-2.0, -0.7, 0), (-1.5, 0.2, 0), (-3.0, -0.1, 0))
      .toDF("x0", "x1", "label")
    def loss(w: Array[Double]): Double = {
      val s = LinkPrediction.scoreColumn(Seq("x0", "x1"), w)
      ex.select(avg(-(col("label") * log(s) +
        (lit(1.0) - col("label")) * log(lit(1.0) - s)))).head().getDouble(0)
    }
    val w0 = Array(0.0, 0.0, 0.0)
    val w5 = LinkPrediction.trainLogistic(ex, Seq("x0", "x1"), "label",
      iters = 5, lr = 1.0)
    val w50 = LinkPrediction.trainLogistic(ex, Seq("x0", "x1"), "label",
      iters = 50, lr = 1.0)
    assert(loss(w5) < loss(w0), "5 GD steps must beat the zero model")
    assert(loss(w50) < loss(w5), "more steps must keep reducing full-batch loss")
    assert(w50(0) > 0, "separating direction is +x0")
    // trained model classifies the training set perfectly
    val acc = ex.select(
        (when(LinkPrediction.scoreColumn(Seq("x0", "x1"), w50) > 0.5, 1)
          .otherwise(0) === col("label")).cast("int").as("hit"))
      .agg(avg("hit")).head().getDouble(0)
    assert(acc === 1.0)
  }

  test("trainLogistic is deterministic across reruns") {
    val ex = Seq((1.0, 2.0, 1), (-1.0, 1.0, 0), (0.5, -1.0, 1))
      .toDF("x0", "x1", "label")
    val a = LinkPrediction.trainLogistic(ex, Seq("x0", "x1"), "label", 10, 0.25)
    val b = LinkPrediction.trainLogistic(ex, Seq("x0", "x1"), "label", 10, 0.25)
    assert(a.toSeq === b.toSeq)
  }

  test("evaluate: hand-checked threshold metrics and tie-aware AUC") {
    // scores: pos {0.9, 0.6, 0.4}, neg {0.6, 0.2} — one tie at 0.6
    val sc = Seq((0.9, 1), (0.6, 1), (0.4, 1), (0.6, 0), (0.2, 0))
      .toDF("score", "label")
    val m = LinkPrediction.evaluate(sc, "score", "label").head()
    // threshold 0.5: predicted pos = {0.9, 0.6, 0.6} → tp=2 fp=1 fn=1 tn=1
    assert(m.getDouble(0) === 3.0 / 5.0)       // accuracy
    assert(m.getDouble(1) === 2.0 / 3.0)       // precision
    assert(m.getDouble(2) === 2.0 / 3.0)       // recall
    assert(m.getDouble(3) === 2.0 * 2 / (2 * 2 + 1 + 1)) // f1
    // ranks ASC: 0.2→1, 0.4→2, 0.6→avg(3,4)=3.5, 0.9→5;
    // posranks = 2 + 3.5 + 5 = 10.5; AUC = (10.5 − 3·4/2)/(3·2) = 0.75
    // (check: pairs — 0.9 beats both; 0.6 beats 0.2, ties 0.6 (½);
    //  0.4 beats 0.2 only → (2 + 1.5 + 1)/6 = 0.75)
    assert(m.getDouble(4) === 0.75)            // auc

    // degenerate sets: no predicted positives → precision NULL;
    // one-class input → AUC NULL
    val none = LinkPrediction.evaluate(
      Seq((0.1, 1), (0.2, 0)).toDF("score", "label"), "score", "label").head()
    assert(none.isNullAt(1) && none.getDouble(2) === 0.0)
    val oneClass = LinkPrediction.evaluate(
      Seq((0.9, 1), (0.1, 1)).toDF("score", "label"), "score", "label").head()
    assert(oneClass.isNullAt(4))
  }

  test("trainFederated: FedSGD (E=1) equals centralized GD; K=1 equals trainLogistic") {
    // y = 1 iff x0 > 0, spread over 3 uneven "workers"
    val ex = Seq(
      (0L, 1.0, 0.3, 1), (0L, 2.0, -0.5, 1), (0L, -1.0, 0.4, 0),
      (1L, 1.5, 0.9, 1), (1L, -2.0, -0.7, 0),
      (2L, 3.0, 0.1, 1), (2L, -1.5, 0.2, 0), (2L, -3.0, -0.1, 0))
      .toDF("part", "x0", "x1", "label")
    // localEpochs = 1: FedAvg of single local steps IS the centralized
    // step (Σ nk(w − lr·gk)/Σ nk = w − lr·g) — trajectories must agree
    // up to float associativity
    val fed1 = LinkPrediction.trainFederated(
      ex, Seq("x0", "x1"), "label", "part", rounds = 6, localEpochs = 1,
      lr = 0.5)
    val cen = LinkPrediction.trainLogistic(
      ex, Seq("x0", "x1"), "label", iters = 6, lr = 0.5)
    fed1.zip(cen).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"FedSGD diverged: $a vs $b") }
    // a single worker federates with itself: R rounds × E epochs is the
    // same trajectory as R·E centralized iterations
    val one = ex.withColumn("part", lit(0L))
    val fedK1 = LinkPrediction.trainFederated(
      one, Seq("x0", "x1"), "label", "part", rounds = 3, localEpochs = 2,
      lr = 0.5)
    val cen6 = LinkPrediction.trainLogistic(
      one, Seq("x0", "x1"), "label", iters = 6, lr = 0.5)
    fedK1.zip(cen6).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"K=1 diverged: $a vs $b") }
    // genuinely federated (E=2, K=3) still separates the toy set and is
    // rerun-deterministic
    val fed = LinkPrediction.trainFederated(
      ex, Seq("x0", "x1"), "label", "part", rounds = 4, localEpochs = 2,
      lr = 0.5)
    val fed2 = LinkPrediction.trainFederated(
      ex, Seq("x0", "x1"), "label", "part", rounds = 4, localEpochs = 2,
      lr = 0.5)
    assert(fed.toSeq === fed2.toSeq, "must be rerun-identical")
    assert(fed(0) > 0, s"x0 weight should be positive: ${fed.toSeq}")
    val scored = ex.select(col("label"), LinkPrediction
      .scoreColumn(Seq("x0", "x1"), fed).as("s")).collect()
    val posMin = scored.filter(_.getInt(0) == 1).map(_.getDouble(1)).min
    val negMax = scored.filter(_.getInt(0) == 0).map(_.getDouble(1)).max
    assert(posMin > negMax, s"not separated: posMin=$posMin negMax=$negMax")
    // rejects
    intercept[IllegalArgumentException](LinkPrediction.trainFederated(
      ex, Seq("x0", "x1"), "label", "part", rounds = 1, localEpochs = 0,
      lr = 0.5))
    intercept[IllegalArgumentException](LinkPrediction.trainFederated(
      ex, Seq("x0", "x1"), "label", "part", rounds = -1, localEpochs = 1,
      lr = 0.5))
  }

  test("scoreColumn: sigmoid of the affine margin, bias last") {
    val ex = Seq((0.0, 0.0)).toDF("x0", "x1")
    val s0 = ex.select(LinkPrediction.scoreColumn(Seq("x0", "x1"),
      Array(3.0, -2.0, 0.0))).head().getDouble(0)
    assert(s0 === 0.5) // zero margin
    val sb = ex.select(LinkPrediction.scoreColumn(Seq("x0", "x1"),
      Array(3.0, -2.0, 100.0))).head().getDouble(0)
    assert(sb > 0.999) // bias drives the margin
  }
}
