package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  test("bfs computes minimal hop counts and stops on empty frontier") {
    // a->b->c->d plus shortcut a->c; e isolated from source
    val edges = edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c", "e" -> "a")
    val out = GraphOps.bfs(edges, Seq("a").toDF("id"), maxIter = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
  }

  test("bfs respects maxIter") {
    val edges = edgeDf("a" -> "b", "b" -> "c", "c" -> "d")
    val out = GraphOps.bfs(edges, Seq("a").toDF("id"), maxIter = 2)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b", "c"))
  }

  test("connected components: two components + chain") {
    val edges = edgeDf("a" -> "b", "b" -> "c", "x" -> "y", "c" -> "d", "d" -> "e")
    val out = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set("a", "b", "c", "d", "e").map(out) == Set("a"))
    assert(Set("x", "y").map(out) == Set("x"))
  }

  test("star-contraction CC matches label propagation on fixtures and testdata") {
    // deep chain (the case star-contraction exists for) + clique + isolated pair
    val chain = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val extra = Seq("x1" -> "x2", "x1" -> "x3", "y1" -> "y2")
    val edges = edgeDf((chain ++ extra): _*)
    val star = GraphOps.connectedComponentsStar(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val prop = GraphOps.connectedComponents(edges, maxIter = 50)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(star == prop)
    assert(star("n30") == "n00" && star("x3") == "x1" && star("y2") == "y1")

    val td = graph.TestGraph.partSupplierEdges(spark, sf)
    val a = GraphOps.connectedComponentsStar(td)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = GraphOps.connectedComponents(td)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("pagerank: ranks sum to vertex count and sinks rank lowest") {
    // star: everyone points at z
    val edges = edgeDf("a" -> "z", "b" -> "z", "c" -> "z")
    val ranks = GraphOps.pageRank(edges, iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("z") > ranks("a"))
    assert(math.abs(ranks("a") - ranks("b")) < 1e-9)
  }

  test("degrees") {
    val edges = edgeDf("a" -> "b", "a" -> "c", "b" -> "c")
    val d = GraphOps.degrees(edges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val m = d.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(m("a") == ((2L, 0L, 2L)))
    assert(m("c") == ((0L, 2L, 2L)))
  }
}
