package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.PropertyGraph

/**
 * Feature export for the reference's federated GCN train/predict loop.
 *
 * The reference trains one GraphSAGE model per graph partition: its
 * training scheduler hands each Python worker a pair of CSVs —
 * `<graphId>_nodes_<partitionId>.csv` (node id index + float feature
 * columns) and `<graphId>_edges_<partitionId>.csv` (source,target) —
 * which `fl_server.py` / `fl_client.py` load into a StellarGraph
 * (reference `src_python/fl_server.py:227-255`,
 * `src_python/models/supervised.py:45-85`). The GCN itself stays in
 * Python; what the engine owes it is exactly these per-partition frames.
 *
 * Spark-side this is a projection + hash partitioner, not a subsystem:
 *  - every node gets a stable home partition `pmod(xxhash64(id), n)`
 *    (the reference uses METIS/fennel placement — a quality/locality
 *    optimization, not a correctness contract; hash placement keeps the
 *    export deterministic with zero coordination);
 *  - an edge lives in its source's partition;
 *  - a partition's node list additionally carries GHOST rows for edge
 *    targets homed elsewhere, so each partition's subgraph is closed
 *    over its edge list — mirroring the reference's local/central-store
 *    duplication (`RelationBlock.h:121-122`).
 *
 * Both outputs are plain DataFrames; `writeTrainingData` lays them out
 * one directory per partition for the Python side to pick up.
 */
object FeatureExport {

  /** Assemble float features from node property keys: each key becomes
    * one DOUBLE column (null/non-numeric → 0.0, StellarGraph needs dense
    * numerics). Output: (id, f0..fk). */
  def featuresFromProperties(g: PropertyGraph, keys: Seq[String]): DataFrame = {
    val cols = keys.zipWithIndex.map { case (k, i) =>
      coalesce(element_at(col("properties"), k).try_cast(DoubleType), lit(0.0)).as(s"f$i")
    }
    g.nodes.select(col("id") +: cols: _*)
  }

  /**
   * Per-partition training frames.
   *
   * @param features (id, numeric feature columns) — e.g. from
   *                 [[featuresFromProperties]] or an embeddings table.
   * @return (nodes, edges):
   *         nodes = (partition_id, id, features...) with ghost rows;
   *         edges = (partition_id, source, target).
   */
  def trainingPartitions(g: PropertyGraph, features: DataFrame,
                         numPartitions: Int): (DataFrame, DataFrame) = {
    require(numPartitions > 0, "numPartitions must be positive")
    def home(c: Column): Column = pmod(xxhash64(c), lit(numPartitions)).cast(IntegerType)

    val edges = g.edges
      .select(home(col("src")).as("partition_id"),
        col("src").as("source"), col("dst").as("target"))

    // node membership per partition: every node in its home partition,
    // plus ghosts — endpoints referenced by a partition's edges but homed
    // elsewhere (partition subgraphs must be closed for StellarGraph)
    val membership = features.select(home(col("id")).as("partition_id"), col("id"))
      .unionByName(edges.select(col("partition_id"), col("target").as("id")))
      .distinct()
    val nodes = membership.join(features, Seq("id"))
      .select(col("partition_id") +: features.columns.map(c => col(s"`$c`")): _*)

    (nodes, edges)
  }

  /** Materialize the training layout: one directory per partition under
    * `outDir/nodes` and `outDir/edges` (`partition_id=<p>/…csv`, header
    * included — the Python loader reads them with pandas). */
  def writeTrainingData(g: PropertyGraph, features: DataFrame,
                        numPartitions: Int, outDir: String): Unit = {
    val (nodes, edges) = trainingPartitions(g, features, numPartitions)
    nodes.repartition(col("partition_id")).write.mode("overwrite")
      .partitionBy("partition_id").option("header", "true").csv(s"$outDir/nodes")
    edges.repartition(col("partition_id")).write.mode("overwrite")
      .partitionBy("partition_id").option("header", "true").csv(s"$outDir/edges")
  }
}
