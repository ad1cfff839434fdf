package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.algorithms.GraphAlgorithms
import graft.model.PropertyGraph

/**
 * Incremental triangle counting over an edge stream — the reference's
 * `strian` (`src/query/algorithms/triangles/StreamingTriangles.cpp`):
 * rather than recounting the whole graph per update, only triangles
 * *closed by new edges* are counted each micro-batch and added to a
 * running total.
 *
 * Per batch with accumulated canonical edge set E and batch delta D
 * (D disjoint from E):
 *   ΔT = tri(E ∪ D) − tri(E)
 *      = (# triangles with ≥1 edge in D)
 *      = join(D, E, E) + join(D, D, E) + join(D, D, D)   [by which sides
 *        of the triangle are new — computed as one 3-way join over
 *        (E ∪ D) requiring at least one D edge]
 *
 * The accumulated edge set is kept as a localCheckpointed DataFrame so
 * lineage stays O(1); at cluster scale this would be a Delta/parquet
 * compact-on-write table instead — the plan shape is identical.
 */
final class StreamingTriangles(spark: SparkSession) {

  @volatile private var accumulated: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("src", "dst")
  }
  @volatile private var total: Long = 0L

  def currentCount: Long = total
  def edgeCount: Long = accumulated.count()

  /** Ingest one batch of raw (src,dst) edges; returns the new total. */
  def addBatch(rawEdges: DataFrame): Long = synchronized {
    val delta = PropertyGraph.canonicalUndirected(
      rawEdges.select(col("src").cast(StringType).as("src"), col("dst").cast(StringType).as("dst")))
      .join(accumulated.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
      .localCheckpoint(true)

    if (!delta.isEmpty) {
      total += StreamingTriangles.deltaTriangles(delta, accumulated).count()
      accumulated = accumulated.unionByName(delta).localCheckpoint(true)
    }
    total
  }

  /** Full recount for drift checking (the reference periodically recounts
    * on the native store; we can assert ΔT bookkeeping exactly). */
  def recount(): Long = GraphAlgorithms.triangleCount(accumulated)

  /** Attach to a streaming edge-record source (see [[EdgeStream]]). */
  def listen(records: DataFrame, checkpoint: String): StreamingQuery =
    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          addBatch(batch.select(col("source.id").as("src"), col("destination.id").as("dst")))
        ()
      }
      .start()
}

object StreamingTriangles {

  /**
   * ΔT = tri(E ∪ D) − tri(E) as a DataFrame of the closing (a,b,c)
   * triples, decomposed by the FIRST triangle edge that is new so the
   * three cases are disjoint AND every join chain is anchored on the
   * delta:
   *
   *   e1=(a,b) e2=(b,c) e3=(a,c) over canonical a<b<c edges,
   *   case1: e1∈D, e2∈U, e3∈U     — D ⋈ U ⋈ U
   *   case2: e1∈E, e2∈D, e3∈U     — D ⋈ E ⋈ U
   *   case3: e1∈E, e2∈E, e3∈D     — D ⋈ E ⋈ E
   *
   * Each chain's first join has D as a side, so per-batch intermediate
   * size is O(|D|·deg), never O(|E|·deg) — the whole point of the
   * reference's incremental formula (StreamingTriangles.cpp:287-325):
   * batch cost scales with the delta, not the accumulated graph.
   */
  private[streaming] def deltaTriangles(delta: DataFrame, acc: DataFrame): DataFrame = {
    val u = acc.unionByName(delta)
    def e(df: DataFrame, c1: String, c2: String): DataFrame =
      df.select(col("src").as(c1), col("dst").as(c2))
    val case1 = e(delta, "a", "b")
      .join(e(u, "b", "c"), Seq("b"))
      .join(e(u, "a", "c"), Seq("a", "c"))
    val case2 = e(delta, "b", "c")
      .join(e(acc, "a", "b"), Seq("b"))
      .join(e(u, "a", "c"), Seq("a", "c"))
    val case3 = e(delta, "a", "c")
      .join(e(acc, "a", "b"), Seq("a"))
      .join(e(acc, "b", "c"), Seq("b", "c"))
    case1.select("a", "b", "c")
      .unionByName(case2.select("a", "b", "c"))
      .unionByName(case3.select("a", "b", "c"))
  }
}
