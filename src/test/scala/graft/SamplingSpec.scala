package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("id")

  test("hashSample: deterministic, rate-accurate, subset-monotone") {
    val df = ids(10000)
    val s10 = Sampling.hashSample(df, "id", 0.1, verifiable = true)
    val n10 = s10.count()
    // bijective residue map → exactly fraction*buckets residues qualify;
    // 10k sequential ids hit them at very close to the nominal rate
    // (999 is the exact deterministic count for this key range)
    assert(n10 === 999L)
    // identical rerun
    assert(Sampling.hashSample(df, "id", 0.1, verifiable = true).count() === n10)
    // a 5% sample is a strict subset of the 10% sample (same hash, lower cut)
    val s5 = Sampling.hashSample(df, "id", 0.05, verifiable = true)
    assert(s5.join(s10, Seq("id"), "left_anti").count() === 0L)
    // production mode: same contract, xxhash64 mixing
    val p = Sampling.hashSample(df, "id", 0.1).count()
    assert(math.abs(p - 1000L) <= 120, s"got $p")
    // edges
    assert(Sampling.hashSample(df, "id", 0.0, verifiable = true).count() === 0L)
    assert(Sampling.hashSample(df, "id", 1.0, verifiable = true).count() === 10000L)
  }

  test("stratifiedCap: at most n per stratum, deterministic choice") {
    val df = (0 until 300).map(i => (i.toLong, s"lang${i % 3}")).toDF("id", "lang")
    val capped = Sampling.stratifiedCap(df, "lang", "id", 10, verifiable = true)
    val perStratum = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum === Map("lang0" -> 10L, "lang1" -> 10L, "lang2" -> 10L))
    // small stratum passes through whole
    val small = (0 until 4).map(i => (i.toLong, "rare")).toDF("id", "lang")
    assert(Sampling.stratifiedCap(small, "lang", "id", 10, verifiable = true).count() === 4L)
    // deterministic: same rows both runs
    val a = capped.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedCap(df, "lang", "id", 10, verifiable = true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // schema unchanged
    assert(capped.columns.toSeq === Seq("id", "lang"))
  }

  test("packByTokenBudget: contiguous concat-then-split placement per shard") {
    val docs = Seq(
      // shard A: tokens 40, 70, 30, 100 → starts 0, 40, 110, 140
      ("A", 1L, 40), ("A", 2L, 70), ("A", 3L, 30), ("A", 4L, 100),
      // shard B: tokens 120 → starts 0 (doc straddles chunk 0→1)
      ("B", 5L, 120)
    ).toDF("shard", "id", "tokens")
    val packed = Sampling.packByTokenBudget(docs, "shard", "id", "tokens", budget = 100)
      .select("id", "chunk", "offset").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(packed === Map(
      1L -> ((0L, 0L)),   // starts at token 0
      2L -> ((0L, 40L)),  // starts at 40, straddles into chunk 1
      3L -> ((1L, 10L)),  // starts at 110
      4L -> ((1L, 40L)),  // starts at 140
      5L -> ((0L, 0L))))  // shard B packs independently
    // total stream length is preserved: max(start+tokens) = sum(tokens)
    val withEnd = Sampling.packByTokenBudget(docs, "shard", "id", "tokens", 100)
      .select(col("shard"), (col("chunk") * 100 + col("offset") + col("tokens")).as("end"))
      .groupBy("shard").agg(max("end").as("len")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withEnd === Map("A" -> 240L, "B" -> 120L))
  }

  test("hashSplit: exhaustive, disjoint, deterministic, remainder to last") {
    val df = ids(10000)
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val out = Sampling.hashSplit(df, "id", splits, verifiable = true)
    // every row gets exactly one split; fractions hold near-exactly on the
    // bijective residue map
    assert(out.count() === 10000L)
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    assert(byName("train") > 7800 && byName("train") < 8200)
    // deterministic rerun
    val again = Sampling.hashSplit(df, "id", splits, verifiable = true)
    assert(out.exceptAll(again).count() === 0L)
    // remainder (fractions summing under 1) falls to the LAST split
    val under = Sampling.hashSplit(df, "id", Seq(("a", 0.5), ("b", 0.1)), verifiable = true)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(under("b") > 4000) // 0.1 nominal + 0.4 remainder
    // splits are consistent with hashSample at the same fraction: the
    // first split IS the 80% sample (same hash, same cut)
    val sample80 = Sampling.hashSample(df, "id", 0.8, verifiable = true)
    val train = out.where(col("split") === "train").select("id")
    assert(train.exceptAll(sample80.select("id")).count() === 0L)
  }

  test("temperatureSample: alpha reweights shares, rates cap at group size") {
    // 9000 'big' + 100 'small' rows: natural share of 'small' is ~1%;
    // alpha=0.5 weights sqrt(9000)≈95 vs sqrt(100)=10 → small's target
    // share rises to ~9.5% of the sampled rows
    val df = ((0 until 9000).map(i => (i.toLong, "big")) ++
      (9000 until 9100).map(i => (i.toLong, "small"))).toDF("id", "g")
    val out = Sampling.temperatureSample(df, "g", "id", alpha = 0.5,
      targetFraction = 0.2, verifiable = true)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected rates: n=9100, w=(95,10), sw=105
    // big:   0.2*9100*95/(105*9000) ≈ 0.183 → ~1646 rows
    // small: 0.2*9100*10/(105*100)  ≈ 1.733 → capped at 1.0 → all 100
    assert(byG("small") === 100L, s"small group should be kept whole: $byG")
    assert(byG("big") > 1450 && byG("big") < 1850, s"big group off nominal: $byG")
    // deterministic rerun
    val again = Sampling.temperatureSample(df, "g", "id", alpha = 0.5,
      targetFraction = 0.2, verifiable = true)
    assert(out.exceptAll(again).count() === 0L)
    // alpha = 1 → natural distribution: every group sampled at the same
    // rate (rate_g = targetFraction exactly, since w_g = c_g)
    val nat = Sampling.temperatureSample(df, "g", "id", alpha = 1.0,
      targetFraction = 0.5, verifiable = true)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(nat("big") - 4500L) < 200, s"alpha=1 big: $nat")
    assert(math.abs(nat("small") - 50L) < 20, s"alpha=1 small: $nat")
    // kept rows are a subset of the input rows for their group (no
    // replacement, no cross-group leakage)
    assert(out.join(df, Seq("id", "g"), "left_anti").count() === 0L)
  }

  test("plan posture: sampling filters/splits add NO shuffle") {
    // hashSample and hashSplit must stay narrow — a pure filter/projection
    // over the scan. An Exchange in these plans would mean the 100 TB
    // sampling pass shuffles the corpus; fail loudly if one appears.
    val df = ids(1000)
    val samplePlan = Sampling.hashSample(df, "id", 0.1, verifiable = true)
      .queryExecution.executedPlan.toString
    assert(!samplePlan.contains("Exchange"), s"hashSample shuffles:\n$samplePlan")
    val splitPlan = Sampling.hashSplit(df, "id", Seq(("a", 0.5), ("b", 0.5)))
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"), s"hashSplit shuffles:\n$splitPlan")
    // stratifiedCap is allowed exactly ONE shuffle (on the stratum key)
    val strat = Sampling.stratifiedCap(
      ids(1000).withColumn("g", col("id") % 7), "g", "id", 3)
      .queryExecution.executedPlan.toString
    assert(strat.split("Exchange").length - 1 <= 1, s"stratifiedCap shuffles twice:\n$strat")
  }

  test("domainMixtureWeights: integer ppm contract, alpha flattens toward uniform") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "big", "a b c d e f g h"), (2L, "big", "a b c d e f g h"),
      (3L, "big", "a b c d e f g h"), (4L, "small", "a b")
    ).toDF("doc_id", "source", "text")
    val w = Sampling.domainMixtureWeights(corpus, "source", "text", alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // alpha=1: raw_w == total_tokens; ppm = tokens*1e6 div 26
    assert(w("big") === ((3L, 24L, 24L, 24L * 1000000 / 26)))
    assert(w("small") === ((1L, 2L, 2L, 2L * 1000000 / 26)))
    // ppm sums to at most 1e6 (integer truncation) and within #domains of it
    val ppmSum = w.values.map(_._4).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - w.size)
    // alpha -> 0 flattens: the small domain's share strictly grows
    val flat = Sampling.domainMixtureWeights(corpus, "source", "text", alpha = 0.25)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(flat("small") > w("small")._4)
  }

  test("epochShuffle: deterministic per epoch, epochs differ, per-shard positions contiguous") {
    import spark.implicits._
    val df = ids(500)
    val e1 = Sampling.epochShuffle(df, "id", epoch = 1, nShards = 4, verifiable = true)
    val e1b = Sampling.epochShuffle(df, "id", epoch = 1, nShards = 4, verifiable = true)
    val rows1 = e1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows1 === e1b.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // a different epoch is a different permutation
    val e2 = Sampling.epochShuffle(df, "id", epoch = 2, nShards = 4, verifiable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows1 !== e2)
    // every row appears once; positions are 1..n inside each shard
    assert(rows1.size === 500)
    rows1.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).toSeq.sorted === (1L to g.size).toSeq) }
    // posture: the only wide op is the per-shard window (one Exchange)
    val plan = Sampling.epochShuffle(df, "id", 1, 4, verifiable = true)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1, s"epochShuffle wide ops:\n$plan")
  }

  test("prioritySample: per-group k bound, weight bias, determinism, zero-weight drop") {
    import spark.implicits._
    import graft.pipeline.Sampling
    // 10 heavy rows (w=1000) among 500 light (w=1): top-5 priorities are
    // overwhelmingly heavy (a light row needs u < ~1e-4 to compete)
    val rows = ((1 to 10).map(i => (s"h$i", 1000L, "g")) ++
      (11 to 510).map(i => (s"l$i", 1L, "g"))).toDF("key", "w", "g")
    val s1 = Sampling.prioritySample(rows, "key", "w", k = 5, groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(4))).toSeq
    assert(s1.length === 5)
    assert(s1.map(_._2).sorted === Seq(1, 2, 3, 4, 5))
    assert(s1.count(_._1.startsWith("h")) >= 4,
      s"priority sampling under-selected heavy rows: $s1")
    // deterministic
    val s2 = Sampling.prioritySample(rows, "key", "w", k = 5, groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(4))).toSeq
    assert(s2 === s1)
    // zero/negative weights never sampled; ungrouped form caps globally
    val mixed = Seq(("a", 0L), ("b", -3L), ("c", 7L), ("d", 2L)).toDF("key", "w")
    val s3 = Sampling.prioritySample(mixed, "key", "w", k = 10)
      .collect().map(_.getString(0)).toSet
    assert(s3 === Set("c", "d"))
  }
}
