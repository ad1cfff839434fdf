package graft.algorithms

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.PropertyGraph

/**
 * GraphX-backed variants of the analytic algorithms (`pgrnk`, `trian`,
 * plus connected components, which the reference lacks). The DataFrame
 * implementations in [[GraphAlgorithms]] are the oracle-checked primary
 * path; these exist for workloads where GraphX's Pregel machinery wins —
 * many-iteration PageRank (vertex-cut partitioning amortizes the edge
 * join that the DataFrame loop pays per iteration) and algorithms that
 * are naturally message-passing.
 *
 * String vertex ids are dictionary-encoded to longs with a deterministic
 * zipWithIndex, the standard GraphX bridge for non-numeric ids.
 */
object GraphXAlgorithms {

  /** Build a GraphX graph + id dictionary from a PropertyGraph.
    *
    * Partition count is sized to the VERTEX COUNT (~100k vertices per
    * partition, min 1, capped at the session default): Pregel runs one
    * task per partition per superstep, so a 25-node graph inheriting the
    * session's 32 shuffle partitions schedules ~64 near-empty tasks per
    * iteration — pure scheduling latency that dominated alg_scc at bench
    * scale and wastes the same per-superstep overhead on a cluster. The
    * dict count is free: zipWithIndex has already materialized it. */
  private def toGraphX(g: PropertyGraph): (Graph[Unit, Unit], DataFrame) = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val dict = g.nodes.select(col("id"))
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF("id", "vid")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = dict.count()
    val defaultPar = spark.sparkContext.defaultParallelism
    val parts = math.max(1, math.min(defaultPar, (n / 100000L).toInt + 1))
    val edgeRdd: RDD[Edge[Unit]] = g.orientedEdges
      .select(col("src"), col("dst"))
      .join(dict.withColumnRenamed("id", "src").withColumnRenamed("vid", "svid"), "src")
      .join(dict.withColumnRenamed("id", "dst").withColumnRenamed("vid", "dvid"), "dst")
      .select(col("svid"), col("dvid"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
      .coalesce(parts)
    val vertexRdd: RDD[(VertexId, Unit)] =
      dict.select(col("vid")).rdd.map(r => (r.getLong(0), ())).coalesce(parts)
    (Graph(vertexRdd, edgeRdd), dict)
  }

  /** PageRank via GraphX's static implementation; same unnormalized
    * per-vertex formulation as [[GraphAlgorithms.pageRank]]
    * (resetProb = 1 - alpha). Returns (id, rank). */
  def pageRank(g: PropertyGraph, alpha: Double = 0.85, iterations: Int = 10): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val (gx, dict) = toGraphX(g)
    val ranks = gx.staticPageRank(iterations, resetProb = 1 - alpha)
      .vertices.toDF("vid", "rank")
    ranks.join(dict, "vid").select(col("id"), col("rank"))
  }

  /** Triangle count via GraphX's TriangleCount (canonicalized). */
  def triangleCount(g: PropertyGraph): Long = {
    val (gx, _) = toGraphX(g)
    val canon = gx.partitionBy(PartitionStrategy.RandomVertexCut)
    // GraphX counts each triangle at all 3 vertices
    canon.triangleCount().vertices.map(_._2.toLong).fold(0L)(_ + _) / 3
  }

  /** Connected components (undirected reachability); returns
    * (id, component) where component is the minimal member vid. */
  def connectedComponents(g: PropertyGraph): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val (gx, dict) = toGraphX(g)
    val cc = gx.connectedComponents().vertices.toDF("vid", "component")
    cc.join(dict, "vid").select(col("id"), col("component"))
  }

  /** Strongly connected components (directed mutual reachability,
    * parity-plus); returns (id, component) where component is an
    * arbitrary-but-consistent member vid — remap to min(id) per
    * component for a stable labeling. `numIter` bounds the internal
    * coloring iterations; it must cover the longest cycle for exactness. */
  def stronglyConnectedComponents(g: PropertyGraph, numIter: Int): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val (gx, dict) = toGraphX(g)
    val scc = gx.stronglyConnectedComponents(numIter).vertices.toDF("vid", "component")
    scc.join(dict, "vid").select(col("id"), col("component"))
  }
}
