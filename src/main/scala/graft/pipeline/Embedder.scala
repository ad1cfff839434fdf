package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Embedding-at-ingest seam — the reference embeds node text as edges
 * stream in, via an HTTP embedding service wired into the incremental
 * store (`src/vectorstore/TextEmbedder.h:29-43`,
 * `JasmineGraphIncrementalLocalStore.h:30-45`). Spark-side the seam is a
 * `mapPartitions` batch call: executors hold the rows, each partition
 * batches its texts and calls the embedder once per batch — the same
 * shape as `KgConstruction`'s extractor swap-in, so a production HTTP
 * endpoint drops in without touching the plan.
 *
 * Implementations must be Serializable (they ship to executors).
 */
trait Embedder extends Serializable {
  /** Embedding dimensionality — fixed per embedder. */
  def dim: Int

  /** Embed one batch of texts; must return exactly one vector (of length
    * [[dim]]) per input, in order. Called once per `batchSize` rows per
    * partition — implementations amortize connection/model setup across
    * the batch. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

object Embedder {

  /**
   * Deterministic CONTAINER STUB (clearly marked, mirrors the
   * `Multimodal.decodeStub` posture): no embedding model or HTTP endpoint
   * exists in this container, so vectors are derived from a per-text
   * seeded LCG and L2-normalized. Deterministic (same text → same
   * vector), dimension-correct, unit-norm — everything the Spark-side
   * plumbing and downstream similarity operators need to be tested for
   * real. Production swaps in [[HttpEmbedder]] (or any [[Embedder]]).
   */
  final class HashEmbedder(val dim: Int = 16) extends Embedder {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      // seed from a stable 64-bit FNV-1a of the UTF-8 bytes (String.hashCode
      // is 32-bit; collisions would silently alias embeddings)
      var h = 0xcbf29ce484222325L
      t.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      var state = h
      def next(): Double = {
        state = state * 6364136223846793005L + 1442695040888963407L
        ((state >>> 33).toDouble / (1L << 31).toDouble) * 2.0 - 1.0 // [-1, 1)
      }
      val raw = Array.fill(dim)(next())
      val norm = math.sqrt(raw.map(x => x * x).sum) max 1e-12
      raw.map(x => (x / norm).toFloat)
    }
  }

  /**
   * Production HTTP embedder skeleton — the direct analogue of the
   * reference's `TextEmbedder` (HTTP POST of a text batch to an embedding
   * service, one call per batch). The request/response wire format is the
   * one documented swap-in point; exercised end-to-end against an
   * in-process loopback HTTP stub in `HttpSeamSpec` (this container has
   * no egress, so no live service run is possible).
   *
   * One connection per batch per partition; at cluster scale the batch
   * size bounds concurrent requests at (executors × cores), which is the
   * natural client-side rate limit.
   */
  final class HttpEmbedder(endpoint: String, val dim: Int,
                           timeoutMs: Int = 30000) extends Embedder {
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
      val payload = texts.map(t =>
        "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r") + "\"")
        .mkString("{\"texts\":[", ",", "]}")
      val conn = new java.net.URL(endpoint).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setDoOutput(true)
        conn.getOutputStream.write(payload.getBytes("UTF-8"))
        val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        // expected response: {"embeddings":[[f,...],[f,...],...]}
        parseEmbeddings(body, texts.size)
      } finally conn.disconnect()
    }

    private def parseEmbeddings(body: String, expected: Int): Seq[Array[Float]] = {
      val arrays = "\\[([-0-9.eE,\\s]+)\\]".r.findAllMatchIn(body)
        .map(_.group(1).split(",").map(_.trim.toFloat)).toSeq
      require(arrays.size == expected && arrays.forall(_.length == dim),
        s"embedding service returned ${arrays.size} vectors for $expected texts")
      arrays
    }
  }

  /**
   * Degrade-on-failure wrapper — the documented embed-at-ingest failure
   * posture: try `primary` for each batch; on any non-fatal failure
   * (connection refused, HTTP error status, response-contract violation)
   * embed THAT batch with `fallback` instead, so ingest never stalls on
   * the embedding service. With the deterministic [[HashEmbedder]] as
   * fallback, affected rows stay dimension-correct and reproducible — a
   * later backfill can recompute exactly the hash-embedded vectors.
   */
  final class FallbackEmbedder(primary: Embedder, fallback: Embedder)
      extends Embedder {
    require(primary.dim == fallback.dim,
      s"primary dim ${primary.dim} != fallback dim ${fallback.dim}")
    val dim: Int = primary.dim
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      try primary.embedBatch(texts)
      catch { case scala.util.control.NonFatal(_) => fallback.embedBatch(texts) }
  }

  /**
   * Attach an embedding column to `df` by batching `textCol` through the
   * embedder, `batchSize` texts per call, per partition. Null texts embed
   * as "". Output schema = input schema + `outCol ARRAY<FLOAT>`.
   */
  def embed(df: DataFrame, textCol: String, embedder: Embedder,
            outCol: String = "embedding", batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType))
    val rdd = df.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(
          batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
