package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.PropertyGraph

/**
 * Graph ingest: the two canonical input formats of the reference engine
 * (see FIXTURES.md) re-expressed as declarative Spark reads.
 */
object GraphSources {

  /** Schema of the JSON edge stream — one object per line/message; the
    * reference parses the same shape at `src/util/kafka/StreamHandler.cpp:104-121`. */
  val edgeStreamSchema: StructType = StructType(Seq(
    StructField("source", StructType(Seq(
      StructField("id", StringType),
      StructField("properties", MapType(StringType, StringType))))),
    StructField("destination", StructType(Seq(
      StructField("id", StringType),
      StructField("properties", MapType(StringType, StringType))))),
    StructField("properties", MapType(StringType, StringType))))

  /**
   * Plain whitespace-separated edge list (`src dst` per line), the `adgr`
   * batch format (reference `tests/integration/env_init/data/powergrid.dl`).
   * Nodes are the distinct endpoint ids; no labels/properties.
   */
  def readEdgeList(spark: SparkSession, path: String, isDirected: Boolean = false): PropertyGraph =
    parseEdgeList(spark.read.text(path), isDirected)

  /** [[readEdgeList]] over an already-loaded DataFrame of lines. */
  def parseEdgeList(rawLines: DataFrame, isDirected: Boolean = false,
                    lineCol: String = "value"): PropertyGraph = {
    val lines = rawLines
      .select(split(trim(col(lineCol)), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
    val rawEdges = lines.select(
      col("f").getItem(0).as("src"),
      col("f").getItem(1).as("dst"),
      lit("").as("type"),
      map().cast(MapType(StringType, StringType)).as("properties"))
    val nodes = rawEdges.select(col("src").as("id"))
      .union(rawEdges.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), lit("").as("label"),
        map().cast(MapType(StringType, StringType)).as("properties"))
    PropertyGraph(nodes, PropertyGraph.withEid(rawEdges), isDirected)
  }

  /**
   * `adgr-cust` custom graph upload (reference frontend
   * `JasmineGraphFrontEnd.cpp:979-1080`): an edge list PLUS a per-vertex
   * attribute file — whitespace-separated `vertexId v1 v2 ... vk` lines
   * (the reference's text-attribute form; its JSON/XML forms differ only
   * in file parsing, and its numpy dtype knob is storage advice, not
   * semantics). Attribute i lands in the node property map as key `a<i>`,
   * so downstream property access / [[graft.ml.FeatureExport]] see them
   * like any other node property. Vertices absent from the attribute
   * file keep an empty map; attribute rows for unknown vertices are
   * dropped (the edge list defines the vertex set).
   */
  def readEdgeListWithAttributes(spark: SparkSession, edgePath: String, attrPath: String,
                                 isDirected: Boolean = false): PropertyGraph =
    parseEdgeListWithAttributes(spark.read.text(edgePath), spark.read.text(attrPath), isDirected)

  /** [[readEdgeListWithAttributes]] over already-loaded line DataFrames. */
  def parseEdgeListWithAttributes(edgeLines: DataFrame, attrLines: DataFrame,
                                  isDirected: Boolean = false): PropertyGraph = {
    val g = parseEdgeList(edgeLines, isDirected)
    val attrs = attrLines
      .select(split(trim(col("value")), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
      .select(
        col("f").getItem(0).as("id"),
        map_from_arrays(
          transform(sequence(lit(0), size(col("f")) - 2), i => concat(lit("a"), i)),
          slice(col("f"), lit(2), size(col("f")) - 1)).as("__attrs"))
    val nodes = g.nodes.drop("properties")
      .join(attrs, Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("__attrs"), map().cast(MapType(StringType, StringType)))
          .as("properties"))
    PropertyGraph(nodes, g.edges, isDirected)
  }

  /**
   * JSON edge file/stream in the canonical property-graph format (§1.3 of
   * SURVEY.md). Node upsert semantics: the reference's incremental store
   * upserts node properties as edges stream in
   * (`src/localstore/incremental/JasmineGraphIncrementalLocalStore.h:39-52`);
   * batch-side we keep, per node id, the richest observed property map
   * (most keys — deterministic tie-break on the map's JSON rendering).
   */
  def readJsonEdges(spark: SparkSession, path: String, isDirected: Boolean = false): PropertyGraph = {
    val parsed = spark.read.schema(edgeStreamSchema).json(path)
    fromEdgeRecords(parsed, isDirected)
  }

  /**
   * RDF triple ingest (`adrdf`, reference frontend
   * `JasmineGraphFrontEndProtocol.cpp:17`). Accepts N-Triples-style lines
   * (`<subj> <pred> <obj> .`) and the reference's bare whitespace/TSV
   * form (`subject predicate object`, reference
   * `RDFPartitioner.cpp:loadDataSet`: split on tab → subject, predicate,
   * object). Semantics mirror the reference:
   *  - every subject and object becomes a node — the reference interns
   *    each URI string to a numeric id (`addToNodes`), an in-memory
   *    optimization Spark doesn't need: the URI string IS the node id;
   *  - each triple becomes one edge typed by its predicate
   *    (`addToPredicates` + `addToMap`);
   *  - literal objects are unquoted (a trailing `@lang` / `^^<type>`
   *    qualifier is dropped) and become nodes like any URI — the
   *    reference does not distinguish literals from URIs.
   * Comment (`#`) and blank lines are skipped. Parsing is pure codegen'd
   * column work: one regexp_extract per field, no UDFs, no driver loop —
   * a 100 TB triple dump parses as a narrow scan.
   */
  def parseRdfTriples(lines: DataFrame, isDirected: Boolean = true,
                      lineCol: String = "value"): PropertyGraph = {
    val l = trim(col(lineCol))
    // subject/predicate: a <...> URI (may contain spaces) or a bare token;
    // object: the rest of the line minus the optional terminating dot
    val pat = "^(<[^>]*>|\\S+)\\s+(<[^>]*>|\\S+)\\s+(.*?)\\s*\\.?\\s*$"
    def clean(c: org.apache.spark.sql.Column) =
      when(c.startsWith("<"), regexp_replace(c, "^<|>$", ""))
        .when(c.startsWith("\""), regexp_extract(c, "^\"(.*)\"", 1))
        .otherwise(c)
    val triples = lines
      .where(length(l) > 0 && !l.startsWith("#"))
      .select(
        regexp_extract(l, pat, 1).as("s"),
        regexp_extract(l, pat, 2).as("p"),
        regexp_extract(l, pat, 3).as("o"))
      .where(col("s") =!= "" && col("p") =!= "" && col("o") =!= "")
      .select(clean(col("s")).as("s"), clean(col("p")).as("p"), clean(col("o")).as("o"))
    val emptyProps = map().cast(MapType(StringType, StringType))
    val rawEdges = triples.select(
      col("s").as("src"), col("o").as("dst"), col("p").as("type"),
      emptyProps.as("properties"))
    val nodes = rawEdges.select(col("src").as("id"))
      .union(rawEdges.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), lit("").as("label"), emptyProps.as("properties"))
    PropertyGraph(nodes, PropertyGraph.withEid(rawEdges), isDirected)
  }

  /** File-based `adrdf`: read a triple file (any Hadoop-visible path) and
    * build the graph via [[parseRdfTriples]]. */
  def readRdfTriples(spark: SparkSession, path: String, isDirected: Boolean = true): PropertyGraph =
    parseRdfTriples(spark.read.text(path), isDirected)

  /**
   * `sdhdfs` graph export (reference frontend
   * `JasmineGraphFrontEndProtocol.cpp:29`, `send_graph_hdfs_command`):
   * the reference exports each worker's shard and merges them into one
   * HDFS edge-list file; here the whole distributed write IS the export —
   * plain `src dst` lines (the same shape [[readEdgeList]] ingests) to
   * any Hadoop-visible path.
   */
  def writeEdgeList(g: PropertyGraph, path: String): Unit =
    g.edges.select(concat_ws(" ", col("src"), col("dst")).as("value"))
      .write.mode("overwrite").text(path)

  /** Full-fidelity parquet export — labels, property maps and eids
    * preserved; the natural cluster-scale persistence format. Round-trips
    * through [[readGraph]]. */
  def writeGraph(g: PropertyGraph, dir: String): Unit = {
    g.nodes.write.mode("overwrite").parquet(s"$dir/nodes")
    g.edges.write.mode("overwrite").parquet(s"$dir/edges")
  }

  /** Read a graph persisted by [[writeGraph]]. */
  def readGraph(spark: SparkSession, dir: String, isDirected: Boolean): PropertyGraph =
    PropertyGraph(
      spark.read.parquet(s"$dir/nodes"),
      spark.read.parquet(s"$dir/edges"),
      isDirected)

  /**
   * Embedding-at-ingest (reference `TextEmbedder.h:29-43` wired into the
   * incremental store): embed a node text property into the graph's
   * vector-store companion table (id, embedding ARRAY<FLOAT>) via
   * batched `mapPartitions` calls — see [[graft.pipeline.Embedder]].
   * Nodes missing the property embed the empty string, mirroring the
   * reference (which embeds whatever the property bytes are). Call after
   * [[fromEdgeRecords]]/[[readJsonEdges]] as the optional ingest step;
   * the result feeds [[graft.pipeline.Similarity]] unchanged.
   */
  def embedNodes(g: PropertyGraph, textProp: String,
                 embedder: graft.pipeline.Embedder, batchSize: Int = 64): DataFrame =
    graft.pipeline.Embedder.embed(
      g.nodes.select(col("id"),
        coalesce(element_at(col("properties"), textProp), lit("")).as("__text")),
      "__text", embedder, "embedding", batchSize)
      .select(col("id"), col("embedding"))

  /** Build a PropertyGraph from a DataFrame shaped like [[edgeStreamSchema]]
    * (shared by the batch reader and the streaming foreachBatch path). */
  def fromEdgeRecords(parsed: DataFrame, isDirected: Boolean): PropertyGraph = {
    val endpoints = parsed.select(col("source.id").as("id"), col("source.properties").as("properties"))
      .unionByName(parsed.select(col("destination.id").as("id"), col("destination.properties").as("properties")))
    val byRichness = Window.partitionBy(col("id"))
      .orderBy(size(col("properties")).desc, to_json(col("properties")).asc)
    val nodes = endpoints
      .withColumn("rn", row_number().over(byRichness))
      .where(col("rn") === 1)
      .select(
        col("id"),
        coalesce(element_at(col("properties"), "label"), lit("")).as("label"),
        col("properties"))
    val rawEdges = parsed.select(
      col("source.id").as("src"),
      col("destination.id").as("dst"),
      coalesce(element_at(col("properties"), "type"), lit("")).as("type"),
      col("properties"))
    PropertyGraph(nodes, PropertyGraph.withEid(rawEdges), isDirected)
  }
}
