package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.PropertyGraph

/** One extracted fact. The reference's LLM returns
  * [subject, predicate, object, subject_type, object_type] arrays
  * (`knowledgegraph/construction/Prompt.h:16-23`); types default to
  * "Entity" for extractors that don't produce them. */
final case class KgTuple(subj: String, rel: String, obj: String,
                         subjType: String = "Entity", objType: String = "Entity")

/**
 * Tuple-extraction seam — the analogue of the reference's pluggable LLM
 * streamers (`OllamaTupleStreamer`/`VLLMTupleStreamer`, selected by the
 * `llmInferenceEngine` parameter of `Pipeline.h:34-38`). Spark-side the
 * seam is the same shape as [[Embedder]]: executors batch chunks per
 * partition and call the extractor once per batch, so a production HTTP
 * inference endpoint drops in without touching the plan.
 *
 * Implementations must be Serializable (they ship to executors) and may
 * return zero or many tuples per chunk.
 */
trait TupleExtractor extends Serializable {
  /** Extract facts from one batch of text chunks; must return exactly one
    * (possibly empty) tuple list per input chunk, in order. */
  def extractBatch(chunks: Seq[String]): Seq[Seq[KgTuple]]
}

object TupleExtractor {

  /** Deterministic default: ALL (non-overlapping) matches of a 3-group
    * regex per chunk — the executor-side twin of
    * [[KgConstruction.extractTuples]]'s columnar expression (same
    * pattern, same leftmost-first multi-match semantics), so the seam
    * can be verified against the codegen'd path. */
  final class RegexExtractor(pattern: String = KgConstruction.prosePattern)
      extends TupleExtractor {
    @transient private lazy val rx = pattern.r
    def extractBatch(chunks: Seq[String]): Seq[Seq[KgTuple]] =
      chunks.map { c =>
        rx.findAllMatchIn(c).collect {
          case m if m.groupCount >= 3 &&
            m.group(1).nonEmpty && m.group(2).nonEmpty && m.group(3).nonEmpty =>
            KgTuple(m.group(1), m.group(2), m.group(3))
        }.toSeq
      }
  }

  /**
   * Production LLM extractor skeleton — Ollama/vLLM-generate-shaped HTTP
   * POST, one call per batch, mirroring the reference's curl loop
   * (`OllamaTupleStreamer.cpp:178-200`) minus response streaming (the
   * batch call is the Spark-native unit of work). Expected response body:
   * a JSON object whose "response" field contains a JSON array of
   * [subject, predicate, object, subject_type, object_type] arrays —
   * the reference's `KNOWLEDGE_EXTRACTION` prompt contract
   * (`Prompt.h:16-23`). Exercised end-to-end against an in-process
   * loopback HTTP stub in `HttpSeamSpec` (this container has no egress
   * and no live model endpoint).
   */
  final class LlmHttpExtractor(endpoint: String, model: String,
                               promptPrefix: String, timeoutMs: Int = 60000)
      extends TupleExtractor {
    def extractBatch(chunks: Seq[String]): Seq[Seq[KgTuple]] =
      chunks.map { chunk =>
        val prompt = promptPrefix + "\n" + chunk
        val payload = s"""{"model":${jstr(model)},"prompt":${jstr(prompt)},"stream":false}"""
        val conn = new java.net.URL(endpoint).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          conn.setDoOutput(true)
          conn.getOutputStream.write(payload.getBytes("UTF-8"))
          parseTuples(new String(conn.getInputStream.readAllBytes(), "UTF-8"))
        } finally conn.disconnect()
      }

    private def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r") + "\""

    /** Parse `[["s","p","o","st","ot"], ...]` out of the response text;
      * malformed entries are skipped (the reference logs-and-continues on
      * array parse failures, `OllamaTupleStreamer.cpp:140-145`).
      *
      * The Ollama/vLLM envelopes carry the array as a JSON-ENCODED STRING
      * (`"response":"[[\"s\",...]]"` / `"text":["..."]`) — quotes arrive
      * backslash-escaped, so the envelope field is unwrapped and
      * JSON-unescaped before tuple matching; a body with no envelope
      * (plain array, tests, other engines) is matched as-is. */
    private[graft] def parseTuples(body: String): Seq[KgTuple] = {
      val content =
        "\"(?:response|text)\"\\s*:\\s*\\[?\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
          .findFirstMatchIn(body).map(m => unescapeJson(m.group(1)))
          .getOrElse(body)
      "\\[\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\"(?:\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\")?(?:\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\")?\\s*\\]".r
        .findAllMatchIn(content).map { m =>
          KgTuple(m.group(1), m.group(2), m.group(3),
            Option(m.group(4)).getOrElse("Entity"),
            Option(m.group(5)).getOrElse("Entity"))
        }.toSeq
    }

    private def unescapeJson(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' if i + 5 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case other => sb.append(other); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
  }
}

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
   * Deterministic (subject, relation, object) extraction: EVERY
   * (non-overlapping, leftmost-first) match of a 3-group regex per chunk
   * (default: `Capitalized words Capitalized` prose shapes) — the
   * reference streams many tuples per chunk
   * (`knowledgegraph/construction/Pipeline.h:31-60`), so a chunk with n
   * fact shapes emits n rows. A real deployment replaces this expression
   * with a batched LLM call; the pattern parameter exists so the stub
   * fires on any corpus' entity vocabulary.
   * ========================================================================
   */
  def extractTuples(chunks: DataFrame, pattern: String = prosePattern): DataFrame =
    chunks.select(
      col("doc_id"),
      explode(arrays_zip(
        regexp_extract_all(col("chunk"), lit(pattern), lit(1)).as("subj"),
        regexp_extract_all(col("chunk"), lit(pattern), lit(2)).as("rel"),
        regexp_extract_all(col("chunk"), lit(pattern), lit(3)).as("obj"))).as("t"))
      .select(col("doc_id"),
        col("t.subj").as("subj"), col("t.rel").as("rel"), col("t.obj").as("obj"))
      .where(col("subj") =!= "" && col("rel") =!= "" && col("obj") =!= "")

  /**
   * Extraction through the [[TupleExtractor]] seam: chunks batch through
   * the extractor per partition (one `extractBatch` call per `batchSize`
   * chunks — connection/model setup amortizes across the batch), any
   * number of tuples per chunk. Same output schema as [[extractTuples]]
   * plus the type columns, so [[toGraph]] accepts either. Use the
   * columnar [[extractTuples]] when the extractor IS a regex (codegen'd,
   * no serialization boundary); use this for anything with per-batch
   * state — an HTTP LLM endpoint, a local model, a test fake.
   */
  def extractTuplesWith(chunks: DataFrame, extractor: TupleExtractor,
                        batchSize: Int = 16): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = chunks.sparkSession
    val docIdType = chunks.schema("doc_id").dataType
    val outSchema = StructType(Seq(
      StructField("doc_id", docIdType),
      StructField("subj", StringType), StructField("rel", StringType),
      StructField("obj", StringType),
      StructField("subj_type", StringType), StructField("obj_type", StringType)))
    val rdd = chunks.select(col("doc_id"), col("chunk")).rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val tuples = extractor.extractBatch(batch.map(_.getString(1)))
        batch.lazyZip(tuples).flatMap { (r, ts) =>
          ts.map(t => Row(r.get(0), t.subj, t.rel, t.obj, t.subjType, t.objType))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

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
