package graft

import graft.algorithms.{GraphAlgorithms, GraphXAlgorithms}
import graft.sources.GraphSources

/** GraphX variants agree with the DataFrame implementations. */
class GraphXSpec extends SparkSpec {

  val powergrid = "/root/reference/tests/integration/env_init/data/powergrid.dl"
  lazy val pg = GraphSources.readEdgeList(spark, powergrid).cache()

  test("GraphX triangle count matches golden 651") {
    assert(GraphXAlgorithms.triangleCount(pg) === 651L)
  }

  test("GraphX static PageRank agrees with the DataFrame loop") {
    val fixture = GraphSources.readJsonEdges(spark,
      "/root/reference/tests/integration/env_init/data/graph_with_properties.txt")
    val df = GraphAlgorithms.pageRank(fixture, alpha = 0.85, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gx = GraphXAlgorithms.pageRank(fixture, alpha = 0.85, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df.keySet === gx.keySet)
    // same formulation → values agree to FP noise
    df.foreach { case (id, r) => assert(math.abs(r - gx(id)) < 1e-6, s"node $id: $r vs ${gx(id)}") }
  }

  test("connected components find the powergrid's single component") {
    val cc = GraphXAlgorithms.connectedComponents(pg)
    assert(cc.select("component").distinct().count() === 1L)
  }
}
