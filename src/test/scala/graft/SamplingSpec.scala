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
}
