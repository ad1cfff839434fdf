package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.model.{GraphCatalog, PropertyGraph}
import graft.sources.GraphSources

/**
 * Streaming graph ingest — the reference's `adstrmk`/`adhdfs` path
 * (Kafka/HDFS JSON edge streams consumed by `StreamHandler::
 * listen_to_kafka_topic`, `src/util/kafka/StreamHandler.cpp:66-140`,
 * partitioned per edge and upserted into per-worker incremental stores)
 * re-expressed as Structured Streaming:
 *
 *   readStream (file source or kafka) → from_json(edge schema) →
 *   foreachBatch: upsert into the catalog graph.
 *
 * The `"-1"` end-of-stream sentinel becomes a stop marker row the caller
 * can watch for; partition residency is Spark's concern, not ours.
 */
object EdgeStream {

  /** File-source stream of JSON edge lines (same schema as batch ingest).
    * For Kafka swap `.format("kafka")` + `from_json(col("value"))` — the
    * schema and downstream plan are identical. */
  def readJsonEdgeStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
      .select(from_json(col("value"), GraphSources.edgeStreamSchema).as("e"))
      .where(col("e").isNotNull && col("e.source.id").isNotNull)
      .select(col("e.source").as("source"), col("e.destination").as("destination"),
        col("e.properties").as("properties"))

  /**
   * Kafka variant of the edge stream — the reference's `adstrmk` topic
   * consumer (`StreamHandler::listen_to_kafka_topic`). The downstream
   * plan (schema, upsert, incremental triangles) is byte-identical to the
   * file source; only the source format differs. Requires the
   * spark-sql-kafka connector on the classpath (not shipped in this
   * container, so this path is compile-checked but exercised via the file
   * source in tests).
   */
  def readKafkaEdgeStream(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load()
      .select(from_json(col("value").cast(StringType), GraphSources.edgeStreamSchema).as("e"))
      .where(col("e").isNotNull && col("e.source.id").isNotNull)
      .select(col("e.source").as("source"), col("e.destination").as("destination"),
        col("e.properties").as("properties"))

  /**
   * CSV edge payloads (`adstrmkcsv` — declared in the reference protocol,
   * `JasmineGraphFrontEndProtocol.cpp:32`, with no dispatched handler;
   * the CSV shape is the JSON stream's flat form): each line/message is
   * `src,dst[,type]`. Emits records in [[GraphSources.edgeStreamSchema]]
   * shape so the downstream plan — [[GraphSources.fromEdgeRecords]],
   * catalog upsert, incremental triangles — is byte-identical to the
   * JSON path. Works on a batch DataFrame of lines or a streaming
   * `value` column alike; pure codegen'd column work.
   */
  def parseCsvEdges(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val emptyProps = map().cast(MapType(StringType, StringType))
    val f = split(trim(col(lineCol)), "\\s*,\\s*")
    lines
      .select(f.as("f"))
      .where(size(col("f")) >= 2 && col("f").getItem(0) =!= "" && col("f").getItem(1) =!= "")
      .select(
        struct(col("f").getItem(0).as("id"), emptyProps.as("properties")).as("source"),
        struct(col("f").getItem(1).as("id"), emptyProps.as("properties")).as("destination"),
        when(size(col("f")) >= 3, map(lit("type"), col("f").getItem(2)))
          .otherwise(emptyProps).as("properties"))
  }

  /**
   * Apply a stream of edge records to a named catalog graph: each
   * micro-batch is converted with the same derivation as batch ingest and
   * unioned in (node upsert = richest-property-map-wins re-aggregation on
   * the combined node set, mirroring the reference's incremental store
   * upsert `JasmineGraphIncrementalLocalStore.h:39-52`).
   *
   * Write amplification is O(|batch|), not O(|graph|): only the DELTA is
   * materialized per micro-batch (an append-only delta log, the same
   * shape a Delta-Lake-backed store would use at cluster scale), and the
   * registered graph is recomposed lazily as base ∪ deltas with ONE
   * richest-wins dedup over the union. Every `compactEvery` batches the
   * composed graph is materialized and the log reset, bounding read-side
   * union fan-in — the standard log-structured write/read trade,
   * amortizing the O(|graph|) rewrite across the log length.
   */
  def applyToCatalog(records: DataFrame, graphName: String, isDirected: Boolean,
                     checkpoint: String, compactEvery: Int = 10): StreamingQuery = {
    // foreachBatch runs serially on the driver for one query — plain
    // mutable log state is safe here
    var base: Option[PropertyGraph] = GraphCatalog.get(graphName)
    val deltaLog = scala.collection.mutable.ArrayBuffer.empty[PropertyGraph]
    val byRichness = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(size(col("properties")).desc, to_json(col("properties")).asc)

    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val d = GraphSources.fromEdgeRecords(batch, isDirected)
          // O(|batch|) materialization — the only eager work per batch
          deltaLog += PropertyGraph(
            d.nodes.localCheckpoint(true), d.edges.localCheckpoint(true), isDirected)

          val nodeParts = base.map(_.nodes).toSeq ++ deltaLog.map(_.nodes)
          val edgeParts = base.map(_.edges).toSeq ++ deltaLog.map(_.edges)
          val nodes = nodeParts.reduce(_ unionByName _)
            .withColumn("rn", row_number().over(byRichness))
            .where(col("rn") === 1)
            .drop("rn")
          val merged = PropertyGraph(nodes, edgeParts.reduce(_ unionByName _), isDirected)

          if (deltaLog.size >= compactEvery) {
            val compacted = PropertyGraph(
              merged.nodes.localCheckpoint(true),
              merged.edges.localCheckpoint(true), isDirected)
            base = Some(compacted)
            deltaLog.clear()
            GraphCatalog.register(graphName, compacted)
          } else GraphCatalog.register(graphName, merged)
        }
        ()
      }
      .start()
  }
}
