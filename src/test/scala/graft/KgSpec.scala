package graft

import org.apache.spark.sql.functions._

import graft.cypher.Cypher
import graft.model.GraphCatalog
import graft.pipeline.KgConstruction

/** KG construction pipeline + catalog admin ops. */
class KgSpec extends SparkSpec {

  test("constructkg extracts tuples and builds a queryable graph") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Alice manages Bob. Bob visits Paris! Charlie knows Alice."),
      (2L, "Paris hosts Conferences. noise line without capitals."),
      (3L, "")).toDF("doc_id", "text")
    val g = KgConstruction.constructKg(docs, "text", "doc_id")
    val types = g.edges.select("type").collect().map(_.getString(0)).toSet
    assert(types === Set("MANAGES", "VISITS", "KNOWS", "HOSTS"))
    assert(g.vertexCount === 5L) // Alice Bob Paris Charlie Conferences
    // the constructed graph is immediately Cypher-queryable
    val who = Cypher.run(g, "MATCH (a)-[r:MANAGES]->(b) RETURN a.id AS a, b.id AS b").collect()
    assert(who.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("Alice", "Bob")))
  }

  test("extractTuples streams MANY tuples per chunk, dedup across chunks preserved") {
    import spark.implicits._
    // one chunk carrying two non-overlapping fact shapes (the reference
    // streams every tuple of a chunk, Pipeline.h:31-60), plus a second
    // doc repeating a fact — the cross-chunk dedup must keep one edge
    val docs = Seq(
      (1L, "Alice manages Bob and Carol visits Paris."),
      (2L, "Alice manages Bob.")).toDF("doc_id", "text")
    val tuples = KgConstruction.extractTuples(
      KgConstruction.chunk(docs, "text", "doc_id"))
    val got = tuples.select("doc_id", "subj", "rel", "obj").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got === Set(
      (1L, "Alice", "manages", "Bob"),
      (1L, "Carol", "visits", "Paris"),
      (2L, "Alice", "manages", "Bob")))
    // "manages Bob and Carol visits": the greedy-enough middle group must
    // NOT swallow the second subject — 2 tuples from doc 1's single chunk
    assert(got.count(_._1 == 1L) === 2)
    val g = KgConstruction.toGraph(tuples)
    assert(g.edgeCount === 2L) // Alice->Bob deduped across docs
    // the seam twin replays the same multi-match semantics
    val seam = KgConstruction.extractTuplesWith(
      KgConstruction.chunk(docs, "text", "doc_id"),
      new graft.pipeline.TupleExtractor.RegexExtractor(), batchSize = 2)
      .select("doc_id", "subj", "rel", "obj").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(seam === got)
  }

  test("TupleExtractor seam: batched fake extractor feeds the same graph assembly") {
    import spark.implicits._
    import graft.pipeline.{KgTuple, TupleExtractor}
    val docs = Seq(
      (1L, "alpha sentence. beta sentence."),
      (2L, "gamma sentence.")).toDF("doc_id", "text")
    val chunks = KgConstruction.chunk(docs, "text", "doc_id")
    // fake LLM: emits two typed tuples for chunks containing "alpha",
    // none otherwise — exercises multi-tuple-per-chunk and empty output
    val fake = new TupleExtractor {
      def extractBatch(cs: Seq[String]): Seq[Seq[KgTuple]] = cs.map { c =>
        if (c.contains("alpha"))
          Seq(KgTuple("Alice", "manages", "Bob", "Person", "Person"),
            KgTuple("Alice", "visits", "Paris", "Person", "City"))
        else Seq.empty
      }
    }
    val tuples = KgConstruction.extractTuplesWith(chunks, fake, batchSize = 2)
    assert(tuples.columns.toSeq ===
      Seq("doc_id", "subj", "rel", "obj", "subj_type", "obj_type"))
    val got = tuples.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getString(4), r.getString(5))).toSet
    assert(got === Set(
      (1L, "Alice", "manages", "Bob", "Person", "Person"),
      (1L, "Alice", "visits", "Paris", "Person", "City")))
    // the seam's output plugs straight into the shared graph assembly
    val g = KgConstruction.toGraph(tuples)
    assert(g.vertexCount === 3L && g.edgeCount === 2L)
  }

  test("RegexExtractor through the seam matches the columnar extractTuples path") {
    import spark.implicits._
    import graft.pipeline.TupleExtractor
    val docs = Seq(
      (1L, "Alice manages Bob. Bob visits Paris! no capitals here."),
      (2L, "Paris hosts Conferences.")).toDF("doc_id", "text")
    val chunks = KgConstruction.chunk(docs, "text", "doc_id")
    val columnar = KgConstruction.extractTuples(chunks)
      .select("doc_id", "subj", "rel", "obj").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val seam = KgConstruction.extractTuplesWith(
      chunks, new TupleExtractor.RegexExtractor(), batchSize = 1)
      .select("doc_id", "subj", "rel", "obj").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(seam === columnar && seam.nonEmpty)
  }

  test("LlmHttpExtractor parses the reference's array-of-arrays response contract") {
    val ex = new graft.pipeline.TupleExtractor.LlmHttpExtractor(
      "http://localhost:9/generate", "m", "extract")
    val parsed = ex.parseTuples(
      """[["Alice", "manages", "Bob", "Person", "Person"],
        |["Paris","hosts","Conf"], ["malformed"] ] trailing junk""".stripMargin)
    assert(parsed === Seq(
      graft.pipeline.KgTuple("Alice", "manages", "Bob", "Person", "Person"),
      graft.pipeline.KgTuple("Paris", "hosts", "Conf")))
  }

  test("catalog ktop: kafka topic names from registered source paths") {
    import spark.implicits._
    val g = KgConstruction.constructKg(
      Seq((1L, "Alice manages Bob.")).toDF("doc_id", "text"), "text", "doc_id")
    GraphCatalog.register("k1", g, "kafka:edges-prod")
    GraphCatalog.register("k2", g, "kafka:edges-prod") // duplicate topic
    GraphCatalog.register("k3", g, "kafka:clicks")
    GraphCatalog.register("f1", g, "/data/batch/edges.txt") // non-kafka ignored
    try {
      assert(GraphCatalog.kafkaTopics === Seq("clicks", "edges-prod"))
      // exposed on the Cypher surface as CALL graft.kafkaTopics()
      val viaCall = Cypher.run(g, "CALL graft.kafkaTopics() YIELD topic RETURN topic")
        .collect().map(_.getString(0)).toSeq.sorted
      assert(viaCall === Seq("clicks", "edges-prod"))
    } finally Seq("k1", "k2", "k3", "f1").foreach(GraphCatalog.remove)
    assert(GraphCatalog.kafkaTopics.isEmpty)
  }

  test("catalog truncate and merge commands") {
    import spark.implicits._
    val docs = Seq((1L, "Alice manages Bob.")).toDF("doc_id", "text")
    val g1 = KgConstruction.constructKg(docs, "text", "doc_id")
    GraphCatalog.register("kg", g1)
    val docs2 = Seq((2L, "Bob visits Paris.")).toDF("doc_id", "text")
    val merged = GraphCatalog.merge("kg", KgConstruction.constructKg(docs2, "text", "doc_id"))
    assert(merged.edgeCount === 2L)
    assert(merged.vertexCount === 3L) // Bob deduped
    val truncated = GraphCatalog.truncate("kg")
    assert(truncated.vertexCount === 0L && truncated.edgeCount === 0L)
    GraphCatalog.remove("kg")
  }
}
