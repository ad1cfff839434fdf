package graft

import graft.sparql.Sparql

/**
 * SPARQL 1.1 Update (W3C sparql11-update) — the functional
 * copy-on-write surface: each form returns the updated SET graph.
 */
class SparqlUpdateSpec extends SparkSpec {

  private def triples(rows: (String, String, String)*) = {
    import spark.implicits._
    rows.toDF("s", "p", "o")
  }

  private def setOf(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().toSet.map((r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1), r.getString(2)))

  test("INSERT DATA / DELETE DATA: constant statements, set semantics") {
    val g = triples(("a", "p", "1"), ("b", "p", "2"))
    val ins = Sparql.update(g,
      """PREFIX ex: <http://e/> INSERT DATA { <c> ex:p "3" . <a> <p> "1" . }""")
    assert(setOf(ins) === Set(("a", "p", "1"), ("b", "p", "2"),
      ("c", "http://e/p", "3")))
    val del = Sparql.update(g, """DELETE DATA { <a> <p> "1" . <zz> <p> "9" . }""")
    assert(setOf(del) === Set(("b", "p", "2")))
    // variables are illegal in DATA blocks
    intercept[IllegalArgumentException](Sparql.update(g,
      "INSERT DATA { ?x <p> \"1\" . }"))
  }

  test("DELETE WHERE: the matched pattern instantiations are removed") {
    val g = triples(("a", "tag", "x"), ("b", "tag", "y"), ("a", "p", "1"))
    val out = Sparql.update(g, "DELETE WHERE { ?s <tag> ?t . }")
    assert(setOf(out) === Set(("a", "p", "1")))
    // multi-pattern shortcut: both instantiated triples of each
    // solution are removed
    val g2 = triples(("a", "tag", "x"), ("a", "p", "1"), ("b", "tag", "y"))
    val out2 = Sparql.update(g2, "DELETE WHERE { ?s <tag> ?t . ?s <p> ?v . }")
    assert(setOf(out2) === Set(("b", "tag", "y")))
  }

  test("DELETE/INSERT WHERE: templates instantiate over the solutions, delete-then-insert") {
    val g = triples(("a", "status", "old"), ("b", "status", "old"),
      ("c", "status", "done"))
    // the classic rename: deletes compute on the ORIGINAL graph,
    // inserts apply after
    val out = Sparql.update(g,
      """DELETE { ?s <status> "old" } INSERT { ?s <status> "new" }
        |WHERE { ?s <status> "old" }""".stripMargin)
    assert(setOf(out) === Set(("a", "status", "new"), ("b", "status", "new"),
      ("c", "status", "done")))
    // INSERT-only with a richer WHERE (OPTIONAL in the group)
    val g3 = triples(("a", "p", "1"), ("a", "tag", "x"), ("b", "p", "2"))
    val out3 = Sparql.update(g3,
      """INSERT { ?s <seen> "1" } WHERE { ?s <p> ?v . OPTIONAL { ?s <tag> ?t } FILTER(BOUND(?t)) }""")
    assert(setOf(out3) === setOf(g3) + (("a", "seen", "1")))
    // DELETE-only form; unbound template vars skip the instantiation
    val out4 = Sparql.update(g3,
      """DELETE { ?s <tag> ?t } WHERE { ?s <p> ?v . OPTIONAL { ?s <tag> ?t } }""")
    assert(setOf(out4) === Set(("a", "p", "1"), ("b", "p", "2")))
  }

  test("CLEAR and rejects") {
    val g = triples(("a", "p", "1"))
    assert(Sparql.update(g, "CLEAR ALL").count() === 0)
    assert(Sparql.update(g, "CLEAR DEFAULT").count() === 0)
    intercept[IllegalArgumentException](Sparql.update(g, "CLEAR NAMED"))
    // LOAD is implemented (see its own test); a non-Hadoop scheme
    // surfaces Spark's own unsupported-filesystem error
    intercept[Exception](Sparql.update(g, "LOAD <http://x>").count())
    // templates may not carry paths or filters
    intercept[IllegalArgumentException](Sparql.update(g,
      "DELETE { ?s <p>/<q> ?o } WHERE { ?s <p> ?o }"))
    intercept[IllegalArgumentException](Sparql.update(g,
      "INSERT { ?s <p> ?o . FILTER(?o > 1) } WHERE { ?s <p> ?o }"))
  }
  private def quads(rows: (String, String, String, String)*) = {
    import spark.implicits._
    rows.toDF("g", "s", "p", "o")
  }

  private def qset(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, String)] =
    df.collect().toSet.map((r: org.apache.spark.sql.Row) =>
      (Option(r.getString(0)).getOrElse("∅"), r.getString(1),
        r.getString(2), r.getString(3)))

  test("quad update: GRAPH-scoped DATA blocks, null-safe default graph") {
    val g = quads((null, "a", "type", "Doc"), ("g1", "a", "score", "5"),
      ("g2", "x", "tag", "t1"))
    // bare triples land in the DEFAULT graph, GRAPH blocks in theirs
    val ins = Sparql.update(g,
      """INSERT DATA { <b> <type> "Doc" . GRAPH <g1> { <b> <score> "7" } }""")
    assert(qset(ins) === qset(g) ++ Set(("∅", "b", "type", "Doc"),
      ("g1", "b", "score", "7")))
    // deleting a default-graph statement must not touch the named
    // graphs (null-safe g matching), and vice versa
    val del = Sparql.update(g, """DELETE DATA { <a> <type> "Doc" . }""")
    assert(qset(del) === Set(("g1", "a", "score", "5"), ("g2", "x", "tag", "t1")))
    val delG = Sparql.update(g, """DELETE DATA { GRAPH <g1> { <a> <score> "5" } }""")
    assert(qset(delG) === Set(("∅", "a", "type", "Doc"), ("g2", "x", "tag", "t1")))
  }

  test("quad update: DELETE WHERE and INSERT with GRAPH ?g templates") {
    val g = quads((null, "a", "type", "Doc"), ("g1", "a", "score", "5"),
      ("g1", "b", "score", "7"), ("g2", "a", "score", "9"))
    // the shortcut form removes the matched quads across named graphs
    val dw = Sparql.update(g, "DELETE WHERE { GRAPH ?g { ?s <score> ?v } }")
    assert(qset(dw) === Set(("∅", "a", "type", "Doc")))
    // a WHERE-bound ?g in the insert template: per-graph derived rows
    val ins = Sparql.update(g,
      """INSERT { GRAPH ?g { ?s <seen> "1" } }
        |WHERE { GRAPH ?g { ?s <score> ?v } FILTER(?v > 6) }""".stripMargin)
    assert(qset(ins) === qset(g) ++ Set(("g1", "b", "seen", "1"),
      ("g2", "a", "seen", "1")))
  }

  test("quad update: CLEAR forms and ADD/COPY/MOVE graph management") {
    val g = quads((null, "a", "p", "1"), ("g1", "b", "p", "2"),
      ("g2", "c", "p", "3"))
    assert(qset(Sparql.update(g, "CLEAR DEFAULT")) ===
      Set(("g1", "b", "p", "2"), ("g2", "c", "p", "3")))
    assert(qset(Sparql.update(g, "CLEAR NAMED")) === Set(("∅", "a", "p", "1")))
    assert(qset(Sparql.update(g, "CLEAR GRAPH <g1>")) ===
      Set(("∅", "a", "p", "1"), ("g2", "c", "p", "3")))
    assert(Sparql.update(g, "CLEAR ALL").count() === 0)
    // ADD keeps the source, COPY replaces the target, MOVE drops the source
    assert(qset(Sparql.update(g, "ADD DEFAULT TO GRAPH <g1>")) ===
      Set(("∅", "a", "p", "1"), ("g1", "b", "p", "2"), ("g1", "a", "p", "1"),
        ("g2", "c", "p", "3")))
    assert(qset(Sparql.update(g, "COPY GRAPH <g2> TO GRAPH <g1>")) ===
      Set(("∅", "a", "p", "1"), ("g1", "c", "p", "3"), ("g2", "c", "p", "3")))
    assert(qset(Sparql.update(g, "MOVE GRAPH <g2> TO DEFAULT")) ===
      Set(("∅", "c", "p", "3"), ("g1", "b", "p", "2")))
    // no-op when source = target
    assert(qset(Sparql.update(g, "COPY DEFAULT TO DEFAULT")) === qset(g))
  }

  test("WITH <g>: templates and WHERE both scope to the named graph") {
    val g = quads((null, "a", "st", "old"), ("g1", "a", "st", "old"),
      ("g1", "b", "st", "done"), ("g2", "c", "st", "old"))
    // only g1's "old" flips: the default graph's and g2's are untouched
    // (WHERE matched against g1, templates instantiate into g1)
    val out = Sparql.update(g,
      """WITH <g1> DELETE { ?s <st> "old" } INSERT { ?s <st> "new" }
        |WHERE { ?s <st> "old" }""".stripMargin)
    assert(qset(out) === Set(("∅", "a", "st", "old"), ("g1", "a", "st", "new"),
      ("g1", "b", "st", "done"), ("g2", "c", "st", "old")))
    // an explicit GRAPH block in the template overrides WITH
    val out2 = Sparql.update(g,
      """WITH <g1> DELETE { ?s <st> "old" }
        |INSERT { GRAPH <g2> { ?s <st> "moved" } }
        |WHERE { ?s <st> "old" }""".stripMargin)
    assert(qset(out2) === Set(("∅", "a", "st", "old"),
      ("g1", "b", "st", "done"), ("g2", "a", "st", "moved"),
      ("g2", "c", "st", "old")))
    // WITH + explicit GRAPH inside the WHERE (§3.1.3: WITH scopes only
    // the patterns OUTSIDE explicit GRAPH blocks — the GRAPH block
    // still ranges over the store's named graphs, g2 included)
    val out3 = Sparql.update(g,
      """WITH <g1> INSERT { ?s <also_in> ?og }
        |WHERE { ?s <st> ?v . GRAPH ?og { ?s <st> ?v2 } FILTER(?og != "g1") }"""
        .stripMargin)
    assert(qset(out3) === qset(g))  // a,b live only in g1 → no extra row
    val g4 = quads(("g1", "a", "st", "old"), ("g2", "a", "st", "old"))
    val out4 = Sparql.update(g4,
      """WITH <g1> INSERT { ?s <also_in> ?og }
        |WHERE { ?s <st> ?v . GRAPH ?og { ?s <st> ?v2 } FILTER(?og != "g1") }"""
        .stripMargin)
    assert(qset(out4) === qset(g4) + (("g1", "a", "also_in", "g2")))
    // grammar: WITH is Modify-only
    intercept[IllegalArgumentException](Sparql.update(g,
      """WITH <g1> INSERT DATA { <x> <p> "1" . }"""))
    intercept[IllegalArgumentException](Sparql.update(g,
      "WITH <g1> CLEAR DEFAULT"))
    intercept[IllegalArgumentException](Sparql.update(g,
      """WITH <g1> DELETE WHERE { ?s <st> ?v . }"""))
  }

  test("USING / USING NAMED: the WHERE dataset, overriding WITH for matching") {
    val g = quads((null, "d", "st", "x"), ("g1", "a", "st", "x"),
      ("g2", "b", "st", "x"), ("g3", "c", "st", "x"))
    // USING <g1> USING <g2>: WHERE's default graph = g1 ∪ g2; the
    // un-scoped INSERT template targets the DEFAULT graph (no WITH)
    val out = Sparql.update(g,
      """INSERT { ?s <seen> "1" } USING <g1> USING <g2>
        |WHERE { ?s <st> "x" }""".stripMargin)
    assert(qset(out) === qset(g) ++ Set(("∅", "a", "seen", "1"),
      ("∅", "b", "seen", "1")))
    // WITH + USING: USING wins for matching, WITH still scopes templates
    val out2 = Sparql.update(g,
      """WITH <g3> INSERT { ?s <seen> "1" } USING <g1>
        |WHERE { ?s <st> "x" }""".stripMargin)
    assert(qset(out2) === qset(g) ++ Set(("g3", "a", "seen", "1")))
    // USING NAMED restricts the GRAPH-visible named set to the listed
    // graphs (and empties the default graph, §13.2 dataset rules)
    val out3 = Sparql.update(g,
      """INSERT { ?s <from> ?g } USING NAMED <g2>
        |WHERE { GRAPH ?g { ?s <st> "x" } }""".stripMargin)
    assert(qset(out3) === qset(g) ++ Set(("∅", "b", "from", "g2")))
  }

  test("outer FROM / FROM NAMED reach sub-SELECTs (§13.2 whole-query scope)") {
    val g = quads((null, "a", "v", "1"), ("g1", "a", "v", "2"),
      ("g1", "b", "v", "3"), ("g2", "b", "v", "9"))
    // without the dataset clause the subquery reads the default graph
    assert(Sparql.run(g,
      "SELECT ?m WHERE { { SELECT (MAX(?o) AS ?m) WHERE { ?s <v> ?o } } }")
      .collect().map(_.getString(0)).toSeq === Seq("1"))
    // FROM <g1>: the subquery must see g1 as the default graph too
    assert(Sparql.run(g,
      "SELECT ?m FROM <g1> WHERE { { SELECT (MAX(?o) AS ?m) WHERE { ?s <v> ?o } } }")
      .collect().map(_.getString(0)).toSeq === Seq("3"))
    // a subquery carrying its own dataset clause is rejected (grammar)
    intercept[IllegalArgumentException](Sparql.run(g,
      "SELECT ?m WHERE { { SELECT (MAX(?o) AS ?m) FROM <g1> WHERE { ?s <v> ?o } } }"))
  }

  test("LOAD: document statements merge in, INTO GRAPH retargets (§3.1.4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-load")
    val f = dir.resolve("doc.nq")
    java.nio.file.Files.writeString(f,
      """<x> <p> "1" .
        |<y> <p> "2" <gdoc> .
        |# comment
        |<a> <p> "1" .""".stripMargin)
    try {
      val g = triples(("a", "p", "1"), ("b", "p", "2"))
      // triple frame: every statement (graph terms dropped) merges into
      // the one graph, set semantics
      assert(setOf(Sparql.update(g, s"LOAD <${f.toUri}>")) ===
        Set(("a", "p", "1"), ("b", "p", "2"), ("x", "p", "1"), ("y", "p", "2")))
      // quad frame: in-file graph terms kept; INTO GRAPH overrides them
      val gq = quads((null, "a", "p", "1"))
      assert(qset(Sparql.update(gq, s"LOAD <${f.toUri}>")) ===
        Set(("∅", "a", "p", "1"), ("∅", "x", "p", "1"), ("gdoc", "y", "p", "2")))
      assert(qset(Sparql.update(gq, s"LOAD <${f.toUri}> INTO GRAPH <g9>")) ===
        Set(("∅", "a", "p", "1"), ("g9", "x", "p", "1"), ("g9", "y", "p", "2"),
          ("g9", "a", "p", "1")))
      // INTO GRAPH on a triple frame is rejected with a clear message
      val e = intercept[IllegalArgumentException](
        Sparql.update(g, s"LOAD <${f.toUri}> INTO GRAPH <g9>"))
      assert(e.getMessage.contains("quad frame"))
      // LOAD SILENT (§3.1.4): a missing document leaves the store
      // unchanged on BOTH frame shapes; without SILENT it still errors
      assert(setOf(Sparql.update(g,
        s"LOAD SILENT <${dir.resolve("absent.nq").toUri}>")) === setOf(g))
      assert(qset(Sparql.update(gq,
        s"LOAD SILENT <${dir.resolve("absent.nq").toUri}> INTO GRAPH <g9>"))
        === qset(gq))
      intercept[Exception](Sparql.update(g,
        s"LOAD <${dir.resolve("absent.nq").toUri}>").count())
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("posture: INSERT forms never re-shuffle the full store") {
    val g = triples(("a", "p", "1"), ("b", "p", "2"))
    val plan = Sparql.update(g, """INSERT DATA { <c> <p> "3" . }""")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"INSERT DATA hash-shuffles the store:\n$plan")
    val gq = quads((null, "a", "p", "1"), ("g1", "b", "p", "2"))
    val planQ = Sparql.update(gq, """INSERT DATA { GRAPH <g1> { <c> <p> "3" . } }""")
      .queryExecution.executedPlan.toString
    assert(!planQ.contains("Exchange hashpartitioning"),
      s"quad INSERT DATA hash-shuffles the store:\n$planQ")
  }
}
