package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
                 localGate: Int = ConnectedComponents.LocalGate): Map[Long, Long] =
    ConnectedComponents.run(
      nodes.toDF("node"),
      edges.toDF("src", "dst"), localGate = localGate)
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component labeled by its min node") {
    val comp = cc(Seq(1L, 2L, 3L, 4L, 5L), Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(comp.values.toSet == Set(1L))
  }

  test("two cliques and an isolate give three components") {
    val comp = cc(
      Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L)))
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L && comp(12L) == 10L)
    assert(comp(99L) == 99L)
  }

  test("no edges: every node is its own component") {
    val comp = cc(Seq(7L, 8L, 9L), Seq.empty[(Long, Long)])
    assert(comp == Map(7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("directionality does not matter (edges symmetrized)") {
    val fwd = cc(Seq(1L, 2L), Seq((1L, 2L)))
    val rev = cc(Seq(1L, 2L), Seq((2L, 1L)))
    assert(fwd == rev && fwd(2L) == 1L)
  }

  test("local union-find and distributed propagation agree") {
    val rnd = new scala.util.Random(7L)
    val nodes = (0L until 60L).toSeq
    val edges = Seq.fill(50)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val local = cc(nodes, edges) // under the gate → union-find
    val dist = cc(nodes, edges, localGate = 0) // forced distributed path
    assert(local == dist)
  }

  test("gate overflow falls back to the distributed path (results equal)") {
    val nodes = (0L until 20L).toSeq
    val edges = (0L until 19L).map(i => (i, i + 1))
    // gate smaller than the graph: must still produce the single chain
    val comp = cc(nodes, edges, localGate = 5)
    assert(comp.values.toSet == Set(0L))
  }

  test("distributed path FAILS LOUDLY instead of returning unconverged labels") {
    // a 12-hop chain cannot converge in 3 rounds of min propagation;
    // returning partial labels would silently split the component
    val nodes = (0L until 12L).toSeq
    val edges = (0L until 11L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.run(
        nodes.toDF("node"), edges.toDF("src", "dst"),
        maxIter = 3, localGate = 0)
        .collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // the same graph with enough rounds is fine
    val ok = cc(nodes, edges, localGate = 0)
    assert(ok.values.toSet == Set(0L))
  }
}
