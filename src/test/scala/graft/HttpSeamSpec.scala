package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.pipeline.{Embedder, KgConstruction, KgTuple, TupleExtractor}

/**
 * The two production HTTP seams — [[TupleExtractor.LlmHttpExtractor]]
 * (reference `OllamaTupleStreamer.cpp:178-200`, prompt contract
 * `knowledgegraph/construction/Prompt.h:16-23`) and
 * [[Embedder.HttpEmbedder]] (reference `src/vectorstore/TextEmbedder.h:
 * 30-43`) — driven through REAL HTTP against an in-process loopback
 * `com.sun.net.httpserver` stub serving canned Ollama/vLLM/embedding
 * JSON. The container has no egress, so this is the closest possible
 * exercise of the wire path: request marshalling, connection handling,
 * envelope unwrapping, malformed-response degradation, and the
 * failure → deterministic-fallback posture all run for real.
 */
class HttpSeamSpec extends SparkSpec {

  /** Start a loopback server with one handler; hands the base URL to the
    * body and always shuts the server down. */
  private def withServer[T](handler: HttpExchange => (Int, String))
                           (body: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (status, resp) = handler(ex)
      val bytes = resp.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  /** JSON-string-encode `s` the way a real server would. */
  private def jenc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  test("LlmHttpExtractor: Ollama envelope over real HTTP — escaped response field unwraps") {
    val arr = """[["Alice","knows","Bob","Person","Person"],["Bob","works_at","Acme"]]"""
    val requests = mutable.ArrayBuffer.empty[String]
    withServer { ex =>
      requests.synchronized(requests += readBody(ex))
      (200, s"""{"model":"m","created_at":"t","response":"${jenc(arr)}","done":true}""")
    } { base =>
      import spark.implicits._
      val chunks = Seq((1L, "Alice and Bob."), (2L, "Bob at Acme."))
        .toDF("doc_id", "chunk")
      val ex = new TupleExtractor.LlmHttpExtractor(
        base + "/api/generate", "test-model", "Extract tuples:")
      val out = KgConstruction.extractTuplesWith(chunks, ex, batchSize = 2)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5))).toSet
      // each chunk got the full canned pair back (one request per chunk —
      // the Ollama generate API is single-prompt)
      assert(out === Set(
        (1L, "Alice", "knows", "Bob", "Person", "Person"),
        (1L, "Bob", "works_at", "Acme", "Entity", "Entity"),
        (2L, "Alice", "knows", "Bob", "Person", "Person"),
        (2L, "Bob", "works_at", "Acme", "Entity", "Entity")))
      val reqs = requests.synchronized(requests.toList)
      assert(reqs.size === 2)
      // request marshalling: model + prompt-prefix + chunk text all on the wire
      reqs.foreach { r =>
        assert(r.contains("\"model\":\"test-model\"") &&
          r.contains("Extract tuples:") && r.contains("\"stream\":false"), r)
      }
      assert(reqs.exists(_.contains("Alice and Bob.")) &&
        reqs.exists(_.contains("Bob at Acme.")))
    }
  }

  test("LlmHttpExtractor: vLLM text-array envelope and plain-body responses parse too") {
    val inner = """[["S","p","O"]]"""
    withServer { _ =>
      (200, s"""{"text":["prefix ${jenc(inner)}"]}""")
    } { base =>
      val ex = new TupleExtractor.LlmHttpExtractor(base, "m", "x")
      assert(ex.extractBatch(Seq("chunk")) === Seq(Seq(KgTuple("S", "p", "O"))))
    }
  }

  test("LlmHttpExtractor: malformed entries degrade to the parseable subset, never throw") {
    val messy = """Sure! Here are the tuples:
      |[["Good","rel","Tuple"], [1, 2, 3], ["only-one"], not json at all,
      |["A","b"], ["X","y","Z","T1"]] trailing prose""".stripMargin
    withServer { _ =>
      (200, s"""{"response":"${jenc(messy)}","done":true}""")
    } { base =>
      val ex = new TupleExtractor.LlmHttpExtractor(base, "m", "x")
      // logs-and-continues contract (OllamaTupleStreamer.cpp:140-145):
      // the two well-formed arrays survive, everything else is skipped
      assert(ex.extractBatch(Seq("c")) === Seq(Seq(
        KgTuple("Good", "rel", "Tuple"),
        KgTuple("X", "y", "Z", "T1", "Entity"))))
    }
  }

  test("HttpEmbedder: batch POST + embeddings response over real HTTP, one call per batch") {
    val dim = 4
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet()
      val body = readBody(ex)
      // parse the texts array the server-side way: string literals after "texts":[
      val texts = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(body.substring(body.indexOf("texts") + 7))
        .map(_.group(1)).toSeq
      val vecs = texts.map(t =>
        (0 until dim).map(i => (t.length * 10 + i).toFloat).mkString("[", ",", "]"))
      (200, vecs.mkString("""{"embeddings":[""", ",", "]}"))
    } { base =>
      import spark.implicits._
      val df = Seq("a", "bb", "ccc").toDF("text").repartition(1)
      val emb = new Embedder.HttpEmbedder(base + "/embed", dim)
      val out = Embedder.embed(df, "text", emb, batchSize = 2)
        .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
      assert(out("a") === Seq(10f, 11f, 12f, 13f))
      assert(out("bb") === Seq(20f, 21f, 22f, 23f))
      assert(out("ccc") === Seq(30f, 31f, 32f, 33f))
      // 3 rows at batchSize=2 in one partition = exactly 2 HTTP calls —
      // the connection-amortization contract of the seam
      assert(calls.get() === 2)
    }
  }

  test("HttpEmbedder: dimension-contract violation is rejected, not silently mis-shaped") {
    withServer { _ => (200, """{"embeddings":[[1.0,2.0]]}""") } { base =>
      val emb = new Embedder.HttpEmbedder(base, dim = 4)
      val e = intercept[IllegalArgumentException](emb.embedBatch(Seq("t")))
      assert(e.getMessage.contains("embedding service"))
    }
  }

  test("FallbackEmbedder: HTTP failure degrades to the deterministic HashEmbedder per batch") {
    val hash = new Embedder.HashEmbedder(dim = 8)
    withServer { _ => (500, "internal error") } { base =>
      val primary = new Embedder.HttpEmbedder(base, dim = 8)
      val fb = new Embedder.FallbackEmbedder(primary, hash)
      val texts = Seq("alpha", "beta")
      val got = fb.embedBatch(texts)
      val want = hash.embedBatch(texts)
      // deterministic fallback: exactly the vectors a later backfill can
      // recompute to find hash-embedded rows
      assert(got.map(_.toSeq) === want.map(_.toSeq))
    }
    // dead endpoint (connection refused) degrades the same way
    val fbDead = new Embedder.FallbackEmbedder(
      new Embedder.HttpEmbedder("http://127.0.0.1:1/embed", dim = 8, timeoutMs = 500), hash)
    assert(fbDead.embedBatch(Seq("x")).map(_.toSeq) ===
      hash.embedBatch(Seq("x")).map(_.toSeq))
    // mismatched dims are a construction-time error
    intercept[IllegalArgumentException] {
      new Embedder.FallbackEmbedder(new Embedder.HashEmbedder(4), new Embedder.HashEmbedder(8))
    }
  }
}
