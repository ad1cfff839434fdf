package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Streaming greedy edge partitioning — the reference's `adstrmk`
 * placement stage (`src/partitioner/stream/Partitioner.cpp:28-43`
 * dispatches HASH / FENNEL / LDG per incoming edge; LDG at
 * `Partitioner.cpp:49-108`, Fennel at `Partitioner.cpp:163-175`, hash at
 * `Partitioner.cpp:110-121`). These algorithms are INHERENTLY
 * sequential — each placement depends on every earlier one — and the
 * reference runs them single-threaded per stream; the faithful Spark
 * analog is the same sequential fold applied per micro-batch on the
 * driver (the [[StreamingTriangles]] accumulator pattern), with the
 * distributed path being plain `hash(id) % k` as a column (SURVEY §2.5).
 *
 * Semantics are the CLEAN published forms, not the reference's quirks
 * (its `ldgPartitioning` never sets `firstVertextAlreadyExist` and
 * early-returns without scoring the second endpoint — documented
 * divergence, like the planner's Distinct/NOT fixes):
 *
 *  - LDG (Stanton & Kliot, KDD 2012): an unplaced vertex v goes to the
 *    partition maximizing `max(1, |N(v) ∩ Si|) · (1 − |Si|/C)` — the
 *    reference's exact score shape with capacity C supplied by the
 *    caller (it uses the running `totalVertices/k`). Ties → lowest id.
 *  - Fennel (Tsourakakis et al., WSDM 2014): score
 *    `|N(v) ∩ Si| − α·γ·|Si|^(γ−1)` with `α = m·k^(γ−1)/n^γ` over the
 *    RUNNING edge/vertex totals (the reference's comment block, clean
 *    formula).
 *  - HASH: `floorMod(id, k)` for numeric ids (reference `stoi(id) % k`),
 *    hashCode fallback otherwise.
 *
 * Placements are STABLE (a vertex never moves — matching the
 * reference's partition-residency model) and deterministic for a given
 * arrival order. Edges whose endpoints land in different partitions are
 * edge CUTS, counted on both sides exactly like `addToEdgeCuts`.
 * State (vertex→partition + seen adjacency) lives on the driver and
 * grows with the vertex set — the same footprint the reference's
 * single-node partitioner carries.
 */
final class StreamingPartitioner(k: Int, mode: String = "ldg",
                                 capacity: Double = 1000.0,
                                 gamma: Double = 1.5) {
  require(k >= 1, s"k must be >= 1: $k")
  require(Seq("ldg", "fennel", "hash").contains(mode), s"unknown mode: $mode")
  require(capacity > 0, s"capacity must be positive: $capacity")

  private val part = scala.collection.mutable.HashMap.empty[String, Int]
  private val nbrs = scala.collection.mutable.HashMap
    .empty[String, scala.collection.mutable.HashSet[String]]
  private val sizes = new Array[Long](k)
  private val cutsPerPart = new Array[Long](k)
  private var edgesSeen = 0L
  private var internalEdges = 0L

  private def neighbors(x: String) =
    nbrs.getOrElseUpdate(x, scala.collection.mutable.HashSet.empty[String])

  private def hashOf(x: String): Int = {
    val n = scala.util.Try(x.trim.toLong).toOption
    n.map(v => java.lang.Math.floorMod(v, k.toLong).toInt)
      .getOrElse(java.lang.Math.floorMod(x.hashCode, k))
  }

  /** Greedy placement of one unplaced vertex. */
  private def place(x: String): Int = mode match {
    case "hash" => hashOf(x)
    case "ldg" =>
      // published form: |N(v) ∩ Si| · (1 − |Si|/C). The reference floors
      // the intersection at 1 (`Partitioner.cpp:70-73`), which makes an
      // EMPTY partition (score 1·1) always beat a single-neighbor one
      // (score 1·(1−s/C) < 1) and splits every early pair — a quirk, not
      // the algorithm; here zero-score vertices tie-break least-loaded
      // (Stanton & Kliot's unweighted rule), then lowest id.
      argmaxWithLoadTieBreak { i =>
        neighbors(x).count(n => part.get(n).contains(i)).toDouble *
          (1.0 - sizes(i) / capacity)
      }
    case "fennel" =>
      val n = math.max(1L, part.size.toLong).toDouble
      val m = math.max(1L, edgesSeen).toDouble
      val alpha = m * math.pow(k.toDouble, gamma - 1) / math.pow(n, gamma)
      argmaxWithLoadTieBreak { i =>
        neighbors(x).count(nn => part.get(nn).contains(i)).toDouble -
          alpha * gamma * math.pow(sizes(i).toDouble, gamma - 1)
      }
  }

  /** Argmax over partitions; equal scores prefer the least-loaded
    * partition, then the lowest index — deterministic. */
  private def argmaxWithLoadTieBreak(score: Int => Double): Int = {
    var best = 0
    var bestScore = score(0)
    var i = 1
    while (i < k) {
      val s = score(i)
      if (s > bestScore || (s == bestScore && sizes(i) < sizes(best))) {
        best = i; bestScore = s
      }
      i += 1
    }
    best
  }

  /** Place one edge; returns (srcPartition, dstPartition). Self-loops
    * place the vertex once. Synchronized — micro-batches arrive from
    * the streaming thread. */
  def addEdge(u: String, v: String): (Int, Int) = synchronized {
    // adjacency first: LDG/Fennel score the CURRENT neighborhood,
    // including this edge's other endpoint if already placed
    neighbors(u) += v
    neighbors(v) += u
    val pu = part.getOrElseUpdate(u, { val p = place(u); sizes(p) += 1; p })
    val pv = part.getOrElseUpdate(v, { val p = place(v); sizes(p) += 1; p })
    edgesSeen += 1
    if (pu == pv) internalEdges += 1
    else { cutsPerPart(pu) += 1; cutsPerPart(pv) += 1 } // both sides, like addToEdgeCuts
    (pu, pv)
  }

  /** Assign every (src, dst) row of a batch in row order; returns the
    * annotated batch (src, dst, src_part, dst_part). Order within the
    * batch follows the DataFrame's row order (use a sequence column
    * upstream when exact replay matters). */
  def addBatch(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val rows = edges.select("src", "dst").collect().map { r =>
      val (pu, pv) = addEdge(r.get(0).toString, r.get(1).toString)
      Row(r.get(0).toString, r.get(1).toString, pu, pv)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("src", StringType), StructField("dst", StringType),
        StructField("src_part", IntegerType), StructField("dst_part", IntegerType))))
  }

  /** Per-partition placement stats — the `printStats`/`updateMetaDB`
    * analog: (partition, vertices, edge_cuts); total internal edges and
    * the cut ratio are one aggregate away. */
  def stats(spark: SparkSession): DataFrame = synchronized {
    val rows = (0 until k).map(i => Row(i, sizes(i), cutsPerPart(i)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("partition", IntegerType),
        StructField("vertices", LongType), StructField("edge_cuts", LongType))))
  }

  def internalEdgeCount: Long = synchronized(internalEdges)
  def cutEdgeCount: Long = synchronized((edgesSeen - internalEdges))
  def vertexCount: Int = synchronized(part.size)
  def partitionOf(x: String): Option[Int] = synchronized(part.get(x))
}
