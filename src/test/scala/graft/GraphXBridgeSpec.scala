package graft

import org.apache.spark.sql.functions._

import graft.graph.{GraphOps, GraphXBridge, TestGraph}

class GraphXBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("GraphX connected components agree with the DataFrame implementation") {
    val edges = TestGraph.partSupplierEdges(spark, sf)
    val df = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gx = GraphXBridge.connectedComponents(GraphOps.undirected(edges))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(df == gx)
  }

  test("GraphX triangle count agrees with the DataFrame implementation") {
    // K4 + pendant + square fixture (same as GraphOpsSpec) plus the
    // testdata co-purchase graph at spec scale
    val fix = Seq(
      "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d",
      "d" -> "p", "w" -> "x", "x" -> "y", "y" -> "z", "z" -> "w").toDF("src", "dst")
    val dfFix = GraphOps.triangles(fix)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gxFix = GraphXBridge.triangleCount(fix)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfFix == gxFix)

    val co = TestGraph.coPurchaseEdges(spark, sf)
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
    val df = GraphOps.triangles(co)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gx = GraphXBridge.triangleCount(co)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == gx)
  }

  test("GraphX SCC separates cycles from DAG tails") {
    // cycle a->b->c->a is one SCC; d,e hang off it as singletons;
    // second cycle x<->y independent
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d", "d" -> "e",
      "x" -> "y", "y" -> "x").toDF("src", "dst")
    val out = GraphXBridge.stronglyConnectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == "a" && out("b") == "a" && out("c") == "a")
    assert(out("d") == "d" && out("e") == "e")
    assert(out("x") == "x" && out("y") == "x")
  }

  test("DataFrame SCC matches GraphX Pregel SCC (cycles, DAG tails, self-loop, chained rings)") {
    val fix = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d", "d" -> "e",
      "x" -> "y", "y" -> "x", "s" -> "s").toDF("src", "dst")
    val dfOut = GraphOps.sccDataFrame(fix)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gxOut = GraphXBridge.stronglyConnectedComponents(fix)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dfOut == gxOut)
    assert(dfOut("s") == "s" && dfOut("b") == "a" && dfOut("y") == "x")

    // 12 five-cycles chained by one-way bridges: SCC = each ring; the
    // condensation is a 12-deep chain, exercising multi-round settling
    val rings = (0 until 12).flatMap { c =>
      val ids = (0 until 5).map(i => s"r${c}n$i")
      ids.zip(ids.tail :+ ids.head)
    }
    val bridges = (0 until 11).map(c => s"r${c}n1" -> s"r${c + 1}n0")
    val chained = (rings ++ bridges).toDF("src", "dst")
    val df2 = GraphOps.sccDataFrame(chained, maxRounds = 30)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val gx2 = GraphXBridge.stronglyConnectedComponents(chained, maxIter = 30)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(df2 == gx2)
    assert((0 until 12).forall(c => df2(s"r${c}n3") == s"r${c}n0"))
  }

  test("GraphX pagerank ranks the same top vertex as the DataFrame implementation") {
    val edges = Seq(("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")).toDF("src", "dst")
    val df = GraphOps.pageRank(edges, iters = 15)
      .orderBy(col("rank").desc).limit(1).collect().head.getString(0)
    val gx = GraphXBridge.pageRank(edges, iters = 15)
      .orderBy(col("rank").desc).limit(1).collect().head.getString(0)
    assert(df == gx && df == "z")
  }

  test("densification is memoized per (session, edge plan): repeat calls reuse one dictionary") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val (d1, g1) = GraphXBridge.toGraphX(edges)
    val (d2, g2) = GraphXBridge.toGraphX(edges)
    assert((d1 eq d2) && (g1 eq g2)) // second call: no new zipWithIndex joins
    // a DIFFERENT frame with the same canonicalized plan also hits
    val same = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val (d3, _) = GraphXBridge.toGraphX(same)
    assert(d3 eq d1)
    // a semantically different frame misses
    val other = Seq(("x", "y")).toDF("src", "dst")
    val (d4, _) = GraphXBridge.toGraphX(other)
    assert(!(d4 eq d1))
  }

  test("memo is LRU-bounded: many distinct edge frames can't grow it past the cap") {
    val base = Seq(("k0", "k1")).toDF("src", "dst")
    val (dBase, _) = GraphXBridge.toGraphX(base)
    (1 to 18).foreach { i =>
      GraphXBridge.toGraphX(Seq((s"u$i", s"v$i")).toDF("src", "dst"))
    }
    assert(GraphXBridge.memoSize <= 16)
    // the untouched oldest entry was evicted: a re-request rebuilds
    val (dBase2, _) = GraphXBridge.toGraphX(base)
    assert(!(dBase2 eq dBase))
  }
}
