package graft

import org.apache.spark.sql.functions._

import graft.sources.GraphSources

/**
 * `process_dataset` reformat semantics (reference
 * `src/partitioner/local/JSONParser.cpp`), pinned on a hand-built JSONL
 * fixture that exercises every branch the reference's three passes take:
 * empty-reference skip, first-seen dense ids (subject before refs, refs
 * in array order), duplicate-reference bag edges, strict weight/count
 * thresholds, sorted-name field positions, and line-scoped attribute
 * rows restricted to mapped ids.
 */
class JsonDatasetSpec extends SparkSpec {

  // Line fixture (ids chosen so sorted order ≠ first-seen order):
  //  l0: 10 → [30, 20]      fos: alpha .9, beta .5 (beta NOT counted: not > .5)
  //  l1: 20 → []            SKIPPED by edge pass; fos alpha .6 counts
  //  l2: 30 → [10, 30, 30]  self-ref + duplicate ref; fos beta .8, gamma .6
  //  l3: 40 → [20]          fos alpha .7
  //  l4: 50 → []            id 50 never referenced → NO dense id, no attr row
  private val lines = Seq(
    """{"id":"10","references":["30","20"],"fos":[{"name":"alpha","w":0.9},{"name":"beta","w":0.5}]}""",
    """{"id":"20","references":[],"fos":[{"name":"alpha","w":0.6}]}""",
    """{"id":"30","references":["10","30","30"],"fos":[{"name":"beta","w":0.8},{"name":"gamma","w":0.6}]}""",
    """{"id":"40","references":["20"],"fos":[{"name":"alpha","w":0.7}]}""",
    """{"id":"50","references":[],"fos":[{"name":"gamma","w":0.9}]}""")

  private lazy val ds = {
    import spark.implicits._
    // alpha counts 3 (l0 .9, l1 .6, l3 .7), beta 1 (l2; l0's .5 is not
    // strictly above), gamma 2 (l2, l4) → minFieldCount = 1 keeps
    // alpha + gamma (strict >), drops beta
    GraphSources.processJsonDataset(
      lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("ln", "value"),
      lineNoCol = Some("ln"), minFieldCount = 1L)
  }

  test("dense ids follow first-seen order, subject before refs, skipping ref-free lines") {
    val ids = ds.vertexIds.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // l0 assigns 10→0, 30→1, 20→2; l2 adds nothing new except… nothing
    // (10, 30 seen); l3 assigns 40→3. 50 never appears.
    assert(ids === Map(10L -> 0L, 30L -> 1L, 20L -> 2L, 40L -> 3L))
  }

  test("edge list is reindexed with bag semantics (duplicates preserved)") {
    val es = ds.edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (e, v) => e -> v.length }
    assert(es === Map(
      (0L, 1L) -> 1, (0L, 2L) -> 1, // l0: 10→30, 10→20
      (1L, 0L) -> 1, (1L, 1L) -> 2, // l2: 30→10, 30→30 twice
      (3L, 2L) -> 1)) // l3: 40→20
  }

  test("field vocabulary: strict thresholds, sorted-name one-hot positions") {
    val fs = ds.fields.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fs === Map("alpha" -> 0L, "gamma" -> 1L))
  }

  test("attribute rows: one per mapped line, one-hot over qualifying fields") {
    val rows = ds.attributes.orderBy("line")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList))
    // l4 (id 50) is unmapped → absent; l2's beta is not in the vocabulary
    assert(rows.toList === List(
      (0L, 0L, List(1, 0)), // l0: alpha .9 (beta .5 fails strict >)
      (1L, 2L, List(1, 0)), // l1: ref-free line but id 20 IS mapped
      (2L, 1L, List(0, 1)), // l2: gamma (beta dropped from vocab)
      (3L, 3L, List(1, 0)))) // l3: alpha
  }

  test("file-order fallback (no explicit line column) matches the explicit one") {
    import spark.implicits._
    val auto = GraphSources.processJsonDataset(
      lines.toDF("value"), minFieldCount = 1L)
    val ids = auto.vertexIds.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids === Map(10L -> 0L, 30L -> 1L, 20L -> 2L, 40L -> 3L))
  }

  test("empty vocabulary yields empty attribute vectors, not a crash") {
    import spark.implicits._
    val none = GraphSources.processJsonDataset(
      lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("ln", "value"),
      lineNoCol = Some("ln"), minFieldCount = 100L)
    assert(none.fields.isEmpty)
    val attrs = none.attributes.collect().map(_.getSeq[Int](2))
    assert(attrs.length === 4 && attrs.forall(_.isEmpty))
  }
}
