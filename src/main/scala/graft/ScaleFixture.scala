package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic fixture scale-up for cross-SF spot benchmarks:
 * replicate every fact table `factor`× with key offsets while the
 * dimension tables (region, nation) stay fixed — the shape a real
 * TPC-H-style scale-up has. Usage:
 *
 *   sbt "runMain graft.ScaleFixture /root/testdata/sf0.1 /tmp/sf1 10"
 *
 * Workload CHARACTER is preserved, not just row counts:
 *  - Foreign keys offset consistently (replica i's orders reference
 *    replica i's customers), so join fan-outs match the source SF.
 *  - `documents.text` passes through a per-replica substitution cipher
 *    (a rotated `translate` alphabet): bijective per character, so
 *    length/token/shingle statistics and WITHIN-replica similarity are
 *    exactly preserved while cross-replica near-dup similarity drops to
 *    noise — naive copies would put every document in a factor-sized
 *    near-dup cluster and quadratically distort the dedup benchmarks.
 *  - `embeddings.embedding` is coordinate-rotated by replica index: a
 *    permutation is orthogonal, so within-replica cosine geometry is
 *    exact while cross-replica cosines decorrelate.
 *  - `events` keeps its time range (10× density, the realistic form of
 *    event-stream growth) with offset user/event ids.
 */
object ScaleFixture {

  private val KeyOffset = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .appName("graft-scale-fixture").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try scale(spark, src, out, factor) finally spark.stop()
  }

  def scale(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dimensions: fixed (25 nations / 5 regions at every SF)
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    /** Union `factor` replicas of `df`, transformed per replica index. */
    def reps(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduceLeft(_ unionByName _)

    def off(c: String, i: Int) = (col(c) + lit(i * KeyOffset)).as(c)

    wr(reps(rd("customer")) { (d, i) =>
      d.select(off("c_custkey", i), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    }, "customer")
    wr(reps(rd("supplier")) { (d, i) =>
      d.select(off("s_suppkey", i), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
    }, "supplier")
    wr(reps(rd("part")) { (d, i) =>
      d.select(off("p_partkey", i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
    }, "part")
    wr(reps(rd("orders")) { (d, i) =>
      d.select(off("o_orderkey", i), off("o_custkey", i), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    }, "orders")
    wr(reps(rd("lineitem")) { (d, i) =>
      d.select(off("l_orderkey", i), off("l_partkey", i), off("l_suppkey", i),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }, "lineitem")
    wr(reps(rd("events")) { (d, i) =>
      d.select(off("event_id", i), col("ts"), off("user_id", i),
        col("event_type"), col("value"), col("props"))
    }, "events")

    // documents: per-replica substitution cipher on the text. A full
    // LCG-shuffled permutation per replica (26! >> any factor), not a
    // rotation — rotations wrap at 26, and the r11 100× probe showed
    // replicas i and i+26 becoming EXACT copies, inflating every
    // near-dup cluster 4× and quadratically distorting the dedup
    // benches at factor 100.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def permutedAlpha(i: Int): String = {
      val arr = alpha.toCharArray
      var state = 0x9E3779B97F4A7C15L ^ (i.toLong * 0x6A09E667F3BCC909L)
      def next(): Long = {
        state = state * 6364136223846793005L + 1442695040888963407L; state
      }
      var j = arr.length - 1
      while (j >= 1) {
        val k = ((next() >>> 33) % (j + 1)).toInt
        val t = arr(j); arr(j) = arr(k); arr(k) = t
        j -= 1
      }
      new String(arr)
    }
    wr(reps(rd("documents")) { (d, i) =>
      val mapped = if (i == 0) alpha else permutedAlpha(i)
      d.select(off("doc_id", i),
        translate(col("text"), alpha + alpha.toUpperCase,
          mapped + mapped.toUpperCase).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, "documents")

    // embeddings: a SIGNED coordinate rotation per replica — rotate by
    // i mod dim, then flip each coordinate's sign from a per-replica
    // LCG bit pattern. A signed permutation is orthogonal, so
    // within-replica cosine geometry stays exact, and the dim·2^dim
    // distinct maps keep replicas decorrelated at any factor (a bare
    // rotation wraps at dim — replicas i and i+dim shared geometry).
    val embDim = rd("embeddings")
      .select(size(col("embedding")).as("d")).where(col("d") > 0)
      .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(1)
    def signPattern(i: Int): Seq[Float] = {
      var state = 0x9E3779B97F4A7C15L ^ (i.toLong * 0xC2B2AE3D27D4EB4FL)
      def next(): Long = {
        state = state * 6364136223846793005L + 1442695040888963407L; state
      }
      Seq.fill(embDim)(if (((next() >>> 32) & 1L) == 1L) -1.0f else 1.0f)
    }
    wr(reps(rd("embeddings")) { (d, i) =>
      val r = i % embDim
      val rotated =
        if (r == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(r + 1), size(col("embedding")) - lit(r)),
          slice(col("embedding"), lit(1), lit(r)))
      val dcol =
        if (i == 0) rotated
        else zip_with(rotated, typedlit(signPattern(i)), (x, s) => x * s)
      d.select(off("vec_id", i), dcol.as("embedding"), col("label"))
    }, "embeddings")
  }
}
