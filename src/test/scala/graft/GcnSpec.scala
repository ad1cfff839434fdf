package graft

import org.apache.spark.sql.functions._

import graft.ml.Gcn

/**
 * GCN forward pass — hand-checked mean-aggregation convolutions
 * (reference analogue: the GraphSAGE mean aggregator the Python side
 * trains in `src_python/models/supervised.py:45-85`; here the forward
 * pass runs as a Spark plan).
 */
class GcnSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1–2–3, undirected = both orientations
  private lazy val edges = Seq(
    ("1", "2"), ("2", "1"), ("2", "3"), ("3", "2")).toDF("src", "dst")
  private lazy val feats = Seq(
    ("1", 1.0, 2.0), ("2", 3.0, 4.0), ("3", 5.0, 6.0)).toDF("id", "f0", "f1")

  test("one layer: self-loop mean aggregation then fixed-order matmul") {
    val w = Array(Array(1.0, -1.0), Array(0.5, 1.0))
    val out = Gcn.layer(edges, feats, "id", Seq("f0", "f1"), w)
      .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // means with self-loop: n1=(2,3), n2=(3,4), n3=(4,5);
    // h0 = m0 + 0.5*m1, h1 = -m0 + m1
    assert(out.toSeq === Seq(("1", 3.5, 1.0), ("2", 5.0, 1.0), ("3", 6.5, 1.0)))
  }

  test("ReLU clamps negative coordinates; linear head does not") {
    val w = Array(Array(-1.0), Array(0.0))
    val relu = Gcn.layer(edges, feats, "id", Seq("f0", "f1"), w)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(relu.toSeq === Seq(0.0, 0.0, 0.0)) // -m0 < 0 everywhere
    val lin = Gcn.layer(edges, feats, "id", Seq("f0", "f1"), w, Gcn.Linear)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(lin.toSeq === Seq(-2.0, -3.0, -4.0))
  }

  test("selfLoop=false aggregates neighbors only; isolated nodes drop") {
    val w = Array(Array(1.0), Array(0.0))
    val withIso = feats.unionByName(Seq(("9", 7.0, 7.0)).toDF("id", "f0", "f1"))
    val out = Gcn.layer(edges, withIso, "id", Seq("f0", "f1"), w,
        Gcn.Linear, selfLoop = false)
      .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
    // neighbor-only means: n1←{2}:3, n2←{1,3}:3, n3←{2}:3; node 9 absent
    assert(out.toSeq === Seq(("1", 3.0), ("2", 3.0), ("3", 3.0)))
    // with the self-loop the isolated node keeps its own signal
    val iso = Gcn.layer(edges, withIso, "id", Seq("f0", "f1"), w, Gcn.Linear)
      .where(col("id") === "9").collect()
    assert(iso.length === 1 && iso(0).getDouble(1) === 7.0)
  }

  test("two-layer forward: ReLU between layers, linear head, hand-checked") {
    val w1 = Array(Array(1.0, -1.0), Array(0.5, 1.0))
    val w2 = Array(Array(1.0), Array(1.0))
    val out = Gcn.forward(edges, feats, "id", Seq(w1, w2))
      .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
    // layer-1 (above): n1=(3.5,1), n2=(5,1), n3=(6.5,1); layer-2 means:
    // n1=(4.25,1), n2=(5,1), n3=(5.75,1); head sums the pair
    assert(out.toSeq === Seq(("1", 5.25), ("2", 6.0), ("3", 6.75)))
  }

  test("shape validation rejects ragged or mismatched weights") {
    intercept[IllegalArgumentException](
      Gcn.layer(edges, feats, "id", Seq("f0"), Array(Array(1.0), Array(2.0))))
    intercept[IllegalArgumentException](
      Gcn.layer(edges, feats, "id", Seq("f0", "f1"),
        Array(Array(1.0, 2.0), Array(3.0))))
    intercept[IllegalArgumentException](
      Gcn.forward(edges, feats, "id", Seq.empty))
  }

  // ----- layer-weight training (trainLayerIp) ------------------------------

  // driver-side replica of the trained objective over the path graph:
  // a = self-loop means (hand-checked in the layer spec), z = aW,
  // L = mean BCE of sigmoid(z_u . z_v)
  private val aggMeans = Map(
    "1" -> Array(2.0, 3.0), "2" -> Array(3.0, 4.0), "3" -> Array(4.0, 5.0))
  private val trainPairs = Seq(
    ("1", "2", 1.0), ("2", "3", 1.0), ("1", "3", 0.0), ("3", "1", 0.0))
  private def replicaLoss(w: Array[Array[Double]]): Double = {
    val o = w.head.length
    def z(u: String): Array[Double] = Array.tabulate(o)(j =>
      w.indices.map(i => aggMeans(u)(i) * w(i)(j)).sum)
    trainPairs.map { case (u, v, y) =>
      val m = z(u).zip(z(v)).map { case (a, b) => a * b }.sum
      val s = 1.0 / (1.0 + math.exp(-m))
      -(y * math.log(s) + (1 - y) * math.log(1 - s))
    }.sum / trainPairs.size
  }

  test("trainLayerIp: one GD step matches finite differences of the BCE loss") {
    val pairs = trainPairs.map { case (u, v, y) => (u, v, y.toInt) }
      .toDF("src", "dst", "label")
    val lr = 0.5
    val w0 = Gcn.defaultInit(2, 2)
    val w1 = Gcn.trainLayerIp(edges, feats, "id", Seq("f0", "f1"), pairs,
      outDim = 2, iters = 1, lr = lr)
    val eps = 1e-6
    for (i <- 0 until 2; j <- 0 until 2) {
      val engineGrad = (w0(i)(j) - w1(i)(j)) / lr
      val wp = w0.map(_.clone); wp(i)(j) += eps
      val wm = w0.map(_.clone); wm(i)(j) -= eps
      val numeric = (replicaLoss(wp) - replicaLoss(wm)) / (2 * eps)
      assert(math.abs(engineGrad - numeric) < 1e-5,
        s"dL/dW($i)($j): engine $engineGrad vs numeric $numeric")
    }
  }

  test("trainLayerIp: deterministic reruns, descending loss, shape checks") {
    val pairs = trainPairs.map { case (u, v, y) => (u, v, y.toInt) }
      .toDF("src", "dst", "label")
    def train(iters: Int) = Gcn.trainLayerIp(
      edges, feats, "id", Seq("f0", "f1"), pairs, outDim = 2,
      iters = iters, lr = 0.1)
    val a = train(6); val b = train(6)
    assert(a.flatten.toSeq === b.flatten.toSeq) // bit-identical reruns
    assert(replicaLoss(train(6)) < replicaLoss(train(2)))
    assert(replicaLoss(train(2)) < replicaLoss(Gcn.defaultInit(2, 2)))
    intercept[IllegalArgumentException](train(-1))
    intercept[IllegalArgumentException](Gcn.trainLayerIp(
      edges, feats, "id", Seq("f0", "f1"), pairs, outDim = 2, iters = 1,
      lr = 0.1, init = Some(Array(Array(1.0)))))
  }
}
