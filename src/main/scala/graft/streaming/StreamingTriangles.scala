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
      val marked = accumulated.withColumn("isNew", lit(false))
        .unionByName(delta.withColumn("isNew", lit(true)))
        .localCheckpoint(true)

      // canonical a<b<c triangle join over the union, keeping only
      // triangles that use at least one new edge
      val e1 = marked.select(col("src").as("a"), col("dst").as("b"), col("isNew").as("n1"))
      val e2 = marked.select(col("src").as("b2"), col("dst").as("c2"), col("isNew").as("n2"))
      val e3 = marked.select(col("src").as("a3"), col("dst").as("c3"), col("isNew").as("n3"))
      val deltaTri = e1
        .join(e2, col("b") === col("b2"))
        .join(e3, col("a3") === col("a") && col("c3") === col("c2"))
        .where(col("n1") || col("n2") || col("n3"))
        .count()

      total += deltaTri
      accumulated = marked.select(col("src"), col("dst")).localCheckpoint(true)
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
