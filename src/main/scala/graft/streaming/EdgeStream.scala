package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

import graft.model.{GraphCatalog, PropertyGraph}
import graft.sources.GraphSources

/** One node upsert candidate flowing through the stateful ingest plan. */
final case class NodeUpsert(id: String, properties: Map[String, String])

/**
 * Handle over the pair of streaming queries a catalog ingest runs (the
 * stateful node upsert + the append-only edge log). Mirrors the
 * [[StreamingQuery]] control surface the callers use.
 */
final class CatalogIngest(val nodeQuery: StreamingQuery, val edgeQuery: StreamingQuery) {
  def processAllAvailable(): Unit = {
    // edges first so a reader composing after this call sees every edge's
    // endpoints too (both queries read the same source independently)
    edgeQuery.processAllAvailable()
    nodeQuery.processAllAvailable()
  }
  def stop(): Unit = { nodeQuery.stop(); edgeQuery.stop() }
  def isActive: Boolean = nodeQuery.isActive || edgeQuery.isActive
}

/**
 * Streaming graph ingest — the reference's `adstrmk`/`adhdfs` path
 * (Kafka/HDFS JSON edge streams consumed by `StreamHandler::
 * listen_to_kafka_topic`, `src/util/kafka/StreamHandler.cpp:66-140`,
 * partitioned per edge and upserted into per-worker incremental stores)
 * re-expressed as Structured Streaming:
 *
 *   readStream (file source or kafka) → from_json(edge schema) →
 *   stateful node upsert + edge append → catalog view over the logs.
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

  /** Richer-map-wins total order (the reference's incremental-store
    * upsert keeps the most informative node definition,
    * `JasmineGraphIncrementalLocalStore.h:39-52`): larger property map
    * first, ties broken by the canonical sorted-entry JSON rendering
    * ascending. Used identically by the driver-side state comparator
    * and the read-side resolution window, so the emitted log always
    * contains the row the read side picks. */
  private[graft] def richerThan(a: Map[String, String], b: Map[String, String]): Boolean =
    if (a.size != b.size) a.size > b.size
    else canonical(a) < canonical(b)

  private def canonical(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => k + "\u0000" + v }.mkString("\u0001")

  /** The same canonical rendering as a column (map_entries sorts by key
    * struct-lexicographically; keys are unique so value order never
    * matters). */
  private[graft] def canonicalCol(props: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(transform(array_sort(map_entries(props)),
      e => concat(e.getField("key"), lit("\u0000"), e.getField("value"))), "\u0001")

  /**
   * Apply a stream of edge records to a named catalog graph with
   * per-batch work O(|batch|) — the Spark-native twin of the reference's
   * per-edge incremental upsert (`JasmineGraphIncrementalLocalStore
   * .h:39-52`), replacing the r17 log-structured design whose every
   * `compactEvery`-th batch re-windowed the FULL node store (amortized
   * O(|store|/compactEvery) per micro-batch — a scale-killer for
   * sustained ingest).
   *
   * Two streaming queries over the same source:
   *
   *  - NODES: endpoints → `groupByKey(id)` →
   *    [[OutputMode.Append]] `flatMapGroupsWithState` holding the
   *    richest-properties row per id in the state store (RocksDB/HDFS
   *    backed at cluster scale — Spark maintains it incrementally, so
   *    per-batch I/O is proportional to the batch's keys, never the
   *    store). A row is EMITTED only when it improves on the held
   *    state; the sink appends emitted rows to a parquet node log.
   *  - EDGES: stateless derivation (same as batch ingest) appended to a
   *    parquet edge log.
   *
   * The registered graph is a LAZY view over the two logs: edges scan
   * as-is; nodes resolve richest-wins with one window over the log
   * scan. Because the log is parquet directories, the view's plan size
   * is CONSTANT regardless of batch count (no union-of-deltas lineage
   * growth, no localCheckpoint chain), and because the stateful
   * operator emits only improvements, the log grows with the number of
   * DISTINCT node upgrades, not with re-deliveries. Read-side
   * resolution cost is inherent to any immutable-file store; the
   * per-batch ingest cost — the thing that bounds sustained 100 TB
   * throughput — stays O(|batch|).
   *
   * A pre-registered graph under `graphName` becomes the base: written
   * into the store ONCE as a seed batch, so the view is always
   * logs-only and a RESTART over the same checkpoint + store resumes
   * exactly — offsets and node state replay from the checkpoint, and
   * the batchId-keyed sink directories make replayed batches overwrite
   * (not double-append) their own output. Richest-wins resolution
   * handles base-vs-stream precedence, so the state store needs no
   * seeding.
   */
  def applyToCatalog(records: DataFrame, graphName: String, isDirected: Boolean,
                     checkpoint: String, storeDir: String = ""): CatalogIngest = {
    val spark = records.sparkSession
    import spark.implicits._
    val store = if (storeDir.nonEmpty) storeDir else s"$checkpoint/store"
    val nodeDir = s"$store/nodes"
    val edgeDir = s"$store/edges"
    val storeTag = s"store:$store"

    // log directories exist from the start; reads carry EXPLICIT schemas
    // so the view composes before the first batch lands (no inference
    // over an empty directory)
    val nodeSchema = StructType(Seq(
      StructField("id", StringType), StructField("label", StringType),
      StructField("properties", MapType(StringType, StringType))))
    val edgeSchema = StructType(Seq(
      StructField("eid", LongType), StructField("src", StringType),
      StructField("dst", StringType), StructField("type", StringType),
      StructField("properties", MapType(StringType, StringType))))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(nodeDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(edgeDir))

    // A pre-registered graph under `graphName` becomes the base: seeded
    // INTO the store once (batch=seed), so the composed view is always
    // logs-only and a restart over the same store can never double-read
    // it. A registration that is this store's own view from a previous
    // run (tagged with the store path) is the restart case — the logs
    // already hold everything, nothing to seed.
    GraphCatalog.get(graphName)
      .filterNot(_ => GraphCatalog.sourcePath(graphName).contains(storeTag))
      .foreach { b =>
        b.nodes.select(col("id"), col("label"), col("properties"))
          .write.mode("overwrite").parquet(s"$nodeDir/batch=seed")
        b.edges.select(col("eid"), col("src"), col("dst"), col("type"), col("properties"))
          .write.mode("overwrite").parquet(s"$edgeDir/batch=seed")
      }

    def registerView(): Unit = {
      val logNodes = spark.read.schema(nodeSchema)
        .option("recursiveFileLookup", "true").parquet(nodeDir)
      val byRichness = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(size(col("properties")).desc, canonicalCol(col("properties")).asc)
      val nodes = logNodes
        .withColumn("__rn", row_number().over(byRichness))
        .where(col("__rn") === 1).drop("__rn")
      val edges = spark.read.schema(edgeSchema)
        .option("recursiveFileLookup", "true").parquet(edgeDir)
      GraphCatalog.register(graphName, PropertyGraph(nodes, edges, isDirected), storeTag)
    }
    registerView()

    // ---- NODE query: keyed incremental upsert -------------------------
    val upserts = records
      .select(explode(array(col("source"), col("destination"))).as("n"))
      .where(col("n.id").isNotNull)
      .select(col("n.id").as("id"),
        coalesce(col("n.properties"), map().cast(MapType(StringType, StringType)))
          .as("properties"))
      .as[NodeUpsert]
      .groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[NodeUpsert], state: GroupState[Map[String, String]]) =>
          val best = rows.map(_.properties)
            .reduceOption((a, b) => if (richerThan(a, b)) a else b)
          best match {
            case Some(props) if state.getOption.forall(cur =>
              richerThan(props, cur)) =>
              state.update(props)
              Iterator.single(NodeUpsert(id, props))
            case _ => Iterator.empty
          }
      }

    // IDEMPOTENT sink: each micro-batch writes (overwrites) its OWN
    // batchId-named subdirectory, so foreachBatch's at-least-once replay
    // after a crash rewrites the same files instead of double-appending
    // — the standard exactly-once batchId pattern for file sinks. The
    // view reads the directory tree with recursiveFileLookup (no
    // partition-column inference over the batch=N names).
    val nodeQuery = upserts.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpoint/nodes")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch
          .select(col("id"),
            coalesce(element_at(col("properties"), "label"), lit("")).as("label"),
            col("properties"))
          .write.mode("overwrite").parquet(s"$nodeDir/batch=$batchId")
        registerView()
        ()
      }
      .start()

    // ---- EDGE query: stateless append ---------------------------------
    val edgeQuery = records.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpoint/edges")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rawEdges = batch.select(
          col("source.id").as("src"),
          col("destination.id").as("dst"),
          coalesce(element_at(col("properties"), "type"), lit("")).as("type"),
          coalesce(col("properties"), map().cast(MapType(StringType, StringType)))
            .as("properties"))
        PropertyGraph.withEid(rawEdges).write.mode("overwrite")
          .parquet(s"$edgeDir/batch=$batchId")
        registerView()
        ()
      }
      .start()

    new CatalogIngest(nodeQuery, edgeQuery)
  }
}
