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
        // escape-aware literal body (same regex as [[parseRdfQuads]] —
        // a greedy `.*` would mis-span when the literal is followed by
        // another quoted token or ends in an escaped backslash); drops
        // @lang / ^^<iri> qualifiers, resolves backslash escapes
        .when(c.startsWith("\""), regexp_replace(
          regexp_extract(c, "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1),
          "\\\\(.)", "$1"))
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
   * N-Quads lines → a (g, s, p, o) QUAD frame for the SPARQL dataset
   * surface ([[graft.sparql.Sparql.run]] §13): `s p o [g] .` — the
   * optional fourth term names the graph, its absence (a plain
   * N-Triples line) lands the statement in the DEFAULT graph (g null).
   * Same `<iri>` / `"literal"` / bare-token cleaning as
   * [[parseRdfTriples]]; comment and blank lines skipped. One
   * regex-projected scan — no UDFs, pushdown-friendly.
   */
  // object term: an <iri>, a quoted literal (backslash escapes honored,
  // optional @lang or ^^<datatype> suffix), or a bare token; the graph
  // term must not BE the terminating dot (a bare '.' ends the
  // statement; graph labels never start with one)
  private val quadLiteral =
    "\"(?:[^\"\\\\]|\\\\.)*\"(?:@[A-Za-z][A-Za-z0-9-]*|\\^\\^<[^>]*>)?"
  // bare-token alternatives exclude a leading quote: a quote-prefixed
  // term must parse as a PROPER literal or the line is a reject —
  // otherwise an unterminated literal silently truncates at whitespace
  private val quadPat = "^(<[^>]*>|[^\"\\s]\\S*)\\s+(<[^>]*>|[^\"\\s]\\S*)\\s+" +
    s"(<[^>]*>|$quadLiteral|[^\"\\s]\\S*)(?:\\s+(<[^>]*>|[^.\"\\s]\\S*))?\\s*\\.?\\s*$$"

  def parseRdfQuads(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val l = trim(col(lineCol))
    def clean(c: org.apache.spark.sql.Column) =
      when(c.startsWith("<"), regexp_replace(c, "^<|>$", ""))
        // literal body (escapes resolved); a trailing @lang / ^^<iri>
        // qualifier is dropped, as in [[parseRdfTriples]]
        .when(c.startsWith("\""), regexp_replace(
          regexp_extract(c, "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1),
          "\\\\(.)", "$1"))
        .otherwise(c)
    lines
      .where(length(l) > 0 && !l.startsWith("#"))
      .select(
        regexp_extract(l, quadPat, 4).as("g"),
        regexp_extract(l, quadPat, 1).as("s"),
        regexp_extract(l, quadPat, 2).as("p"),
        regexp_extract(l, quadPat, 3).as("o"))
      .where(col("s") =!= "" && col("p") =!= "" && col("o") =!= "")
      .select(
        when(col("g") === "", lit(null)).otherwise(clean(col("g"))).as("g"),
        clean(col("s")).as("s"), clean(col("p")).as("p"),
        clean(col("o")).as("o"))
  }

  /** Ingest diagnostics for [[parseRdfQuads]]: the non-comment,
    * non-blank lines the quad pattern CANNOT parse (malformed IRIs,
    * unterminated literals, stray tokens). Silent loss is the failure
    * mode this surfaces — count it, sample it, or gate on it via
    * [[readRdfQuads]]'s strict mode. */
  def rdfQuadRejects(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val l = trim(col(lineCol))
    lines.where(length(l) > 0 && !l.startsWith("#") && !l.rlike(quadPat))
  }

  /** File-based N-Quads ingest — see [[parseRdfQuads]]. `strict = true`
    * fails fast (with sample lines) when any non-comment line is
    * unparseable instead of silently dropping it. */
  def readRdfQuads(spark: SparkSession, path: String,
                   strict: Boolean = false): DataFrame = {
    val lines = spark.read.text(path)
    if (strict) {
      val bad = rdfQuadRejects(lines).limit(5).collect().map(_.getString(0))
      require(bad.isEmpty,
        s"unparseable N-Quads lines in $path (first ${bad.length}): " +
          bad.mkString(" | "))
    }
    parseRdfQuads(lines)
  }

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

  /** Parsed line shape of the `process_dataset` JSONL citation format
    * (reference `src/partitioner/local/JSONParser.cpp:134-136,180-186`):
    * a paper `id`, its `references` (cited paper ids) and its `fos`
    * fields-of-study, each a `{name, w}` weight pair. */
  val citationSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("references", ArrayType(StringType)),
    StructField("fos", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("w", DoubleType)))))))

  /** Result of [[processJsonDataset]]:
    *  - `vertexIds` — (vertex BIGINT, id BIGINT): the dense first-seen
    *    id map (the reference's `vertexToIDMap`);
    *  - `edges` — (src BIGINT, dst BIGINT): the reindexed edge list,
    *    bag semantics (one row per reference, duplicates preserved —
    *    the reference writes each ref line verbatim);
    *  - `fields` — (field STRING, field_id BIGINT): qualifying
    *    fields-of-study and their one-hot positions;
    *  - `attributes` — (line BIGINT, id BIGINT, attrs ARRAY<INT>): one
    *    row per input line whose id is in the vertex map, with the
    *    one-hot field vector (the reference's `attributeList.txt`). */
  final case class JsonDataset(vertexIds: DataFrame, edges: DataFrame,
                               fields: DataFrame, attributes: DataFrame)

  /** Distributed dense-rank: assign 0-based consecutive ids in
    * `(line, pos)` order. A distributed range-partitioned sort plus
    * per-partition offsets (`zipWithIndex` = one extra count job) — the
    * scalable alternative to a single-partition `row_number()` window,
    * which would funnel the whole vertex set through one task. */
  private def denseIdsByOrder(df: DataFrame, keyCol: String,
                              lineCol: String, posCol: String,
                              outCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(lineCol).cast(LongType), col(posCol).cast(LongType),
        col(keyCol).cast(LongType))
      .rdd
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortByKey()
      .zipWithIndex()
      .map { case (((_, _), v), i) => org.apache.spark.sql.Row(v, i) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(keyCol, LongType, nullable = false),
      StructField(outCol, LongType, nullable = false))))
  }

  /**
   * `process_dataset` (reference frontend
   * `JasmineGraphFrontEnd.cpp:306-307,2818-2839` →
   * `JSONParser::jsonParse`, `src/partitioner/local/JSONParser.cpp:43-58`):
   * reformat a JSONL citation dataset (the MAG/DBLP shape — see
   * [[citationSchema]]) into a dense-reindexed edge list plus a one-hot
   * field-of-study attribute table. Faithful semantics:
   *
   *  - lines whose `references` array is empty or absent are skipped by
   *    the edge/id pass entirely — their `id` gets no dense id unless it
   *    appears elsewhere (`JSONParser.cpp:136-139`);
   *  - dense ids are assigned in FIRST-SEEN order: lines in file order,
   *    and within a line the subject id before its references, the
   *    references in array order (`JSONParser.cpp:140-160`);
   *  - one output edge per reference occurrence — duplicates preserved;
   *  - a field-of-study occurrence counts only when its weight is
   *    STRICTLY above `minFieldWeight` (`w > 0.5`,
   *    `JSONParser.cpp:185-187`), and a field qualifies for the one-hot
   *    vocabulary only when its count is STRICTLY above `minFieldCount`
   *    (`> 821`, `JSONParser.cpp:200`); every line contributes counts,
   *    including reference-free lines the edge pass skipped;
   *  - field one-hot positions follow SORTED field-name order — the
   *    reference iterates a `std::map` (`JSONParser.cpp:199-206`);
   *  - the attribute pass emits one row per input LINE whose id is in
   *    the vertex map (`JSONParser.cpp:227-230`), with bit i set when
   *    the line carries qualifying field i at `w > minFieldWeight`.
   *
   * The whole pipeline is declarative column work — `from_json`,
   * `posexplode`, two aggregations, equi-joins — plus two distributed
   * sort+`zipWithIndex` passes for the dense ranks; nothing funnels
   * through the driver, so a 100 TB dump reformats as a handful of
   * shuffles.
   *
   * @param lines     raw JSONL lines.
   * @param lineCol   column holding the JSON text.
   * @param lineNoCol optional explicit 0-based/monotone line-order
   *                  column; when absent, file order is taken from the
   *                  partition-ordered RDD (`zipWithIndex`).
   */
  def processJsonDataset(lines: DataFrame, lineCol: String = "value",
                         lineNoCol: Option[String] = None,
                         minFieldWeight: Double = 0.5,
                         minFieldCount: Long = 821L): JsonDataset = {
    val spark = lines.sparkSession
    val ordered: DataFrame = lineNoCol match {
      case Some(c) =>
        lines.select(col(c).cast(LongType).as("__line"), col(lineCol).as("__raw"))
      case None =>
        val rdd = lines.select(col(lineCol)).rdd.zipWithIndex()
          .map { case (r, i) => org.apache.spark.sql.Row(i, r.getString(0)) }
        spark.createDataFrame(rdd, StructType(Seq(
          StructField("__line", LongType, nullable = false),
          StructField("__raw", StringType))))
    }
    val parsed = ordered
      .select(col("__line"), from_json(col("__raw"), citationSchema).as("j"))
      .select(col("__line"),
        col("j.id").cast(LongType).as("__v"),
        coalesce(col("j.references"), array().cast(ArrayType(StringType))).as("__refs"),
        coalesce(col("j.fos"), array().cast(citationSchema("fos").dataType)).as("__fos"))

    // ---- dense first-seen ids over lines that HAVE references ----
    val withRefs = parsed.where(size(col("__refs")) > 0)
    // occurrence stream: subject at pos 0, references at pos 1..k
    val occ = withRefs
      .select(col("__line"),
        posexplode(concat(array(col("__v").cast(StringType)), col("__refs"))))
      .select(col("__line"), col("pos").cast(LongType).as("__pos"),
        col("col").cast(LongType).as("__v"))
    val firstSeen = occ.groupBy("__v")
      .agg(min(struct(col("__line"), col("__pos"))).as("__fs"))
      .select(col("__v"), col("__fs.__line").as("__line"), col("__fs.__pos").as("__pos"))
    val vertexIds = denseIdsByOrder(firstSeen, "__v", "__line", "__pos", "id")
      .withColumnRenamed("__v", "vertex")

    val srcIds = vertexIds.select(col("vertex").as("__v"), col("id").as("__sid"))
    val dstIds = vertexIds.select(col("vertex").as("__rv"), col("id").as("__did"))
    val edges = withRefs
      .select(col("__line"), col("__v"), explode(col("__refs")).as("__r"))
      .select(col("__line"), col("__v"), col("__r").cast(LongType).as("__rv"))
      .join(srcIds, Seq("__v"))
      .join(dstIds, Seq("__rv"))
      .select(col("__sid").as("src"), col("__did").as("dst"))

    // ---- qualifying field vocabulary (strict > on weight and count;
    // one-hot positions in sorted-name order — the std::map iteration) ----
    val counted = parsed
      .select(explode(col("__fos")).as("f"))
      .where(col("f.w") > minFieldWeight)
      .groupBy(col("f.name").as("field"))
      .agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") > minFieldCount)
      .select(col("field"))
    // rank by NAME (not first-seen): same distributed sort+zipWithIndex
    val fieldRdd = counted.rdd
      .map(_.getString(0)).sortBy(identity).zipWithIndex()
      .map { case (f, i) => org.apache.spark.sql.Row(f, i) }
    val fieldsByName = spark.createDataFrame(fieldRdd, StructType(Seq(
      StructField("field", StringType, nullable = false),
      StructField("field_id", LongType, nullable = false))))

    // ---- one-hot attribute rows: every line whose id is in the map ----
    val lineBits = parsed
      .select(col("__line"), explode(col("__fos")).as("f"))
      .where(col("f.w") > minFieldWeight)
      .join(fieldsByName, col("f.name") === col("field"))
      .groupBy("__line").agg(collect_set(col("field_id")).as("__set"))
    val nFields = fieldsByName.agg(count(lit(1)).as("__nf"))
    val attributes = parsed.select(col("__line"), col("__v"))
      .join(srcIds, Seq("__v"))
      .join(lineBits, Seq("__line"), "left")
      .crossJoin(broadcast(nFields))
      .select(col("__line").as("line"), col("__sid").as("id"),
        when(col("__nf") > 0,
          transform(sequence(lit(0L), col("__nf") - 1), i =>
            when(array_contains(
              coalesce(col("__set"), array().cast(ArrayType(LongType))), i), 1)
              .otherwise(0)))
          .otherwise(array().cast(ArrayType(IntegerType))).as("attrs"))

    JsonDataset(vertexIds, edges, fieldsByName, attributes)
  }

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
