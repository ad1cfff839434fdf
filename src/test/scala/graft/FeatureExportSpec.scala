package graft

import org.apache.spark.sql.functions._

import graft.ml.FeatureExport
import graft.model.PropertyGraph
import graft.sources.GraphSources

/** Feature export for the reference's per-partition GCN training
  * (fl_server.py input shape): schema, hash placement, ghost closure. */
class FeatureExportSpec extends SparkSpec {

  lazy val g: PropertyGraph = GraphSources.readJsonEdges(spark,
    "/root/reference/tests/integration/env_init/data/graph_with_properties.txt").cache()

  test("featuresFromProperties yields dense double columns, 0.0 for missing") {
    val f = FeatureExport.featuresFromProperties(g, Seq("age", "no_such_key"))
    assert(f.columns.toSeq === Seq("id", "f0", "f1"))
    val rows = f.collect()
    assert(rows.length === g.vertexCount)
    // Fiona (id 10) has age=25; the missing key is densified to 0.0
    val fiona = rows.find(_.getString(0) == "10").get
    assert(fiona.getDouble(1) === 25.0 && fiona.getDouble(2) === 0.0)
    rows.foreach(r => { r.getDouble(1); r.getDouble(2) }) // all dense
  }

  test("trainingPartitions: home placement, edge locality, ghost closure") {
    val feats = FeatureExport.featuresFromProperties(g, Seq("age"))
    val (nodes, edges) = FeatureExport.trainingPartitions(g, feats, numPartitions = 3)
    assert(nodes.columns.toSeq === Seq("partition_id", "id", "f0"))
    assert(edges.columns.toSeq === Seq("partition_id", "source", "target"))

    // every edge is homed with its source
    val misplaced = edges
      .where(col("partition_id") =!= pmod(xxhash64(col("source")), lit(3)).cast("int"))
      .count()
    assert(misplaced === 0L)

    // closure: each partition's node list covers both endpoints of its edges
    val nodeKeys = nodes.select(col("partition_id"), col("id"))
    val unmatched = edges.select(col("partition_id"), col("source").as("id"))
      .unionByName(edges.select(col("partition_id"), col("target").as("id")))
      .distinct()
      .join(nodeKeys, Seq("partition_id", "id"), "left_anti")
      .count()
    assert(unmatched === 0L)

    // every node appears in its home partition (ghosts are additive)
    val missingHome = feats.select(col("id"),
        pmod(xxhash64(col("id")), lit(3)).cast("int").as("partition_id"))
      .join(nodeKeys, Seq("partition_id", "id"), "left_anti")
      .count()
    assert(missingHome === 0L)
  }

  test("golden fixture: per-partition CSVs match the committed expectation (ghosts included)") {
    // committed tiny graph (6 nodes, 6 edges) + committed expected CSV
    // contents per partition, loaded the way fl_server.py:225-256 loads
    // them (CSV with header; row order is not part of the contract, so
    // data lines compare as sets). xxhash64 homes: n1,n2,n3 → p0 and
    // n4,n5,n6 → p1; the p0 edge n1→n4 makes n4 a ghost in p0, and the
    // p1 edges n5→n3 / n6→n1 make n3 and n1 ghosts in p1.
    def resource(name: String): java.nio.file.Path =
      java.nio.file.Paths.get(getClass.getResource(s"/feature_export/$name").toURI)
    import scala.jdk.CollectionConverters._
    def expectedLines(name: String): Set[String] =
      java.nio.file.Files.readAllLines(resource(name)).asScala.drop(1).toSet
    def producedLines(dir: String): Set[String] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
        .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).asScala.drop(1)).toSet
    val gg = GraphSources.readJsonEdges(spark, resource("graph.json").toString)
    val out = java.nio.file.Files.createTempDirectory("graft-golden").toString
    try {
      val feats = FeatureExport.featuresFromProperties(gg, Seq("age"))
      FeatureExport.writeTrainingData(gg, feats, numPartitions = 2, out)
      for (p <- 0 to 1) {
        assert(producedLines(s"$out/nodes/partition_id=$p") ===
          expectedLines(s"expected_nodes_partition$p.csv"), s"nodes partition $p")
        assert(producedLines(s"$out/edges/partition_id=$p") ===
          expectedLines(s"expected_edges_partition$p.csv"), s"edges partition $p")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("writeTrainingData lays out per-partition CSV directories") {
    val out = java.nio.file.Files.createTempDirectory("graft-ml").toString
    try {
      val feats = FeatureExport.featuresFromProperties(g, Seq("age"))
      FeatureExport.writeTrainingData(g, feats, numPartitions = 2, out)
      val nodeParts = new java.io.File(s"$out/nodes").listFiles()
        .filter(_.getName.startsWith("partition_id=")).map(_.getName).toSet
      assert(nodeParts === Set("partition_id=0", "partition_id=1"))
      val reread = spark.read.option("header", "true").csv(s"$out/nodes")
      assert(reread.columns.toSet === Set("id", "f0", "partition_id"))
      assert(reread.count() >= g.vertexCount)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }
}
