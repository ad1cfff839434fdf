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
