package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.PropertyGraph

/**
 * Knowledge-graph construction from free text — the reference's
 * `constructkg` pipeline (HDFS text → chunks → LLM tuple extraction →
 * edges streamed into partitions; `knowledgegraph/construction/
 * Pipeline.h:31-60`, Ollama/vLLM streamers).
 *
 * The Spark plumbing is real and scale-shaped: chunk → per-chunk tuple
 * extraction → dedup → nodes/edges DataFrames → PropertyGraph. The
 * extractor itself is a deterministic pattern-based STUB standing in for
 * the LLM call (this container has no model endpoint): it reads
 * `Subject verb-phrase Object` shapes where Subject/Object are
 * capitalized tokens. A production deployment swaps ONLY
 * [[extractTuples]]'s inner expression for a `mapPartitions` batch call
 * to an inference endpoint; everything downstream is unchanged.
 */
object KgConstruction {

  /** Split documents into sentence chunks: (doc_id, chunk). */
  def chunk(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), "[.!?]+")).as("chunk"))
      .where(length(trim(col("chunk"))) > 0)

  /** Default prose pattern: `Capitalized (lowercase words) Capitalized`. */
  val prosePattern: String = "([A-Z][a-z]+)\\s+([a-z]+(?:\\s+[a-z]+)*?)\\s+([A-Z][a-z]+)"

  /** Lexicon pattern tuned to the driver's lowercase synthetic corpus:
    * entity nouns joined by relation verbs (`table join customer`, …). */
  val lexiconPattern: String = {
    val entities = "customer|table|query|column|row|vector|data|stream|window|spark|key|value|batch|line|part|group"
    val relations = "join|scan|filter|merge|sort|hash|agg"
    s"\\b($entities)\\s+($relations)\\s+($entities)\\b"
  }

  /**
   * ===================== STUB — replace in production =====================
   * Deterministic (subject, relation, object) extraction: the first match
   * of a 3-group regex per chunk (default: `Capitalized words Capitalized`
   * prose shapes). A real deployment replaces this single expression with
   * a batched LLM call; the pattern parameter exists so the stub fires on
   * any corpus' entity vocabulary.
   * ========================================================================
   */
  def extractTuples(chunks: DataFrame, pattern: String = prosePattern): DataFrame =
    chunks.select(
      col("doc_id"),
      regexp_extract(col("chunk"), pattern, 1).as("subj"),
      regexp_extract(col("chunk"), pattern, 2).as("rel"),
      regexp_extract(col("chunk"), pattern, 3).as("obj"))
      .where(col("subj") =!= "" && col("rel") =!= "" && col("obj") =!= "")

  /** Assemble extracted tuples into a PropertyGraph (nodes = entities,
    * edges typed by the relation phrase, provenance kept as properties). */
  def toGraph(tuples: DataFrame): PropertyGraph = {
    val dedup = tuples.dropDuplicates("subj", "rel", "obj")
    val nodes = dedup.select(col("subj").as("id"))
      .union(dedup.select(col("obj").as("id")))
      .distinct()
      .select(col("id"), lit("Entity").as("label"),
        map(lit("name"), col("id")).as("properties"))
    val edges = dedup.select(
      col("subj").as("src"), col("obj").as("dst"),
      regexp_replace(upper(col("rel")), "\\s+", "_").as("type"),
      map(lit("doc_id"), col("doc_id").cast(StringType), lit("phrase"), col("rel")).as("properties"))
    PropertyGraph(nodes, PropertyGraph.withEid(edges), isDirected = true)
  }

  /** End-to-end: documents → knowledge graph. */
  def constructKg(docs: DataFrame, textCol: String, idCol: String,
                  pattern: String = prosePattern): PropertyGraph =
    toGraph(extractTuples(chunk(docs, textCol, idCol), pattern))
}
