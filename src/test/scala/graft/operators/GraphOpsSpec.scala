package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)],
                     maxLocalEdges: Long = 2000000L): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("src", "dst"), "src", "dst",
        maxLocalEdges = maxLocalEdges)
      .as[(Long, Long)].collect().toMap

  test("chain graph collapses to one component (multi-hop closure)") {
    // 1-2, 2-3, ..., 9-10: diameter 9, needs transitive closure;
    // exercised on BOTH the distributed star path and the local endgame
    Seq(0L, 2000000L).foreach { threshold =>
      val out = labels((1L to 9L).map(i => (i, i + 1)), threshold)
      assert(out.keySet == (1L to 10L).toSet)
      assert(out.values.toSet == Set(1L))
    }
  }

  test("disjoint cliques + bridge merge into one, others stay apart") {
    val cliqueA = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val cliqueB = Seq((10L, 11L), (11L, 12L))
    val cliqueC = Seq((20L, 21L))
    val bridge = Seq((3L, 10L)) // joins A and B, C untouched
    val out = labels(cliqueA ++ cliqueB ++ cliqueC ++ bridge)
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).map(out).toSet == Set(1L))
    assert(Seq(20L, 21L).map(out).toSet == Set(20L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val out = labels(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 4L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("matches brute-force union-find on a random-ish sparse graph") {
    // deterministic pseudo-random edges over 200 nodes
    val edges = (0 until 150).map { i =>
      val a = (i * 2654435761L) % 200
      val b = (i * 40503L + 7) % 200
      (a.min(b), a.max(b))
    }.filter { case (a, b) => a != b }
    val expected = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node id in component
      val byRoot = nodes.groupBy(find)
      byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
    }
    assert(labels(edges) == expected)                    // local endgame
    assert(labels(edges, maxLocalEdges = 0L) == expected) // star rounds
  }
}
