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

  test("randomWalk: deterministic, edge-respecting, sink-stopping") {
    val e = edgeDf("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "b" -> "z")
    val edgeSet = e.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val w1 = GraphOps.randomWalk(e, walksPerNode = 2, walkLength = 4)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    val w2 = GraphOps.randomWalk(e, walksPerNode = 2, walkLength = 4)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    // bit-identical on rerun (the house determinism rule)
    assert(w1 == w2 && w1.size == 4 * 2) // 4 vertices x walksPerNode
    // every consecutive pair in every path is a real edge
    assert(w1.values.forall { p =>
      val ns = p.split(">")
      ns.sliding(2).filter(_.length == 2).forall(s => edgeSet((s(0), s(1))))
    })
    // a different seed may pick different walks but stays valid
    val w3 = GraphOps.randomWalk(e, walksPerNode = 2, walkLength = 4, seed = 7L)
    assert(w3.count() == 8)
    // z is a sink: its walks stop at step 0
    assert(w1("z#0") == "z" && w1("z#1") == "z")
    intercept[IllegalArgumentException](GraphOps.randomWalk(e, walkLength = 0))
  }

  test("node2vecWalk: deterministic biased steps follow Grover-Leskovec α (r12)") {
    // a's only out-neighbor is b; from b (prev = a) the candidates
    // split exactly into node2vec's three α classes: a = RETURN (1/p),
    // c = ADJACENT to prev (c→a exists; d(prev,c)=1 → weight 1),
    // d = DISTANCE-2 (1/q)
    val e = edgeDf("a" -> "b", "b" -> "a", "b" -> "c", "b" -> "d", "c" -> "a")
    def walkOfA(p: Double, q: Double): String =
      GraphOps.node2vecWalk(e, walksPerNode = 1, walkLength = 2, p = p, q = q)
        .filter(col("walk_id") === "a#0").collect().head.getString(3)
    // tiny p → the walk returns; huge p + huge q → stays near prev
    // (adjacent c); huge p + tiny q → explores outward (d)
    assert(walkOfA(p = 1e-9, q = 1.0) == "a>b>a")
    assert(walkOfA(p = 1e9, q = 1e9) == "a>b>c")
    assert(walkOfA(p = 1e9, q = 1e-9) == "a>b>d")
    // deterministic rerun, every hop a real edge, sinks stop (d)
    val edgeSet = e.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val w1 = GraphOps.node2vecWalk(e, walksPerNode = 2, walkLength = 4,
        p = 2.0, q = 0.5)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    val w2 = GraphOps.node2vecWalk(e, walksPerNode = 2, walkLength = 4,
        p = 2.0, q = 0.5)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(w1 == w2 && w1.size == 2 * 4) // 4 vertices x walksPerNode
    assert(w1.values.forall { pth =>
      val ns = pth.split(">")
      ns.sliding(2).filter(_.length == 2).forall(s => edgeSet((s(0), s(1))))
    })
    assert(w1("d#0") == "d") // sink
    intercept[IllegalArgumentException](
      GraphOps.node2vecWalk(e, p = 0.0, q = 1.0))
    // CALL surface: returnFactor/inOutFactor route to the biased walk
    import spark.implicits._
    val nodes = Seq("a", "b", "c", "d").map(i => (i, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = e.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.randomWalk({walkLength: 2, returnFactor: 0.000000001}) " +
        "YIELD walk_id, path WHERE walk_id = 'a#0' RETURN path")
      .collect().map(_.getString(0))
    assert(viaCall.toSeq == Seq("a>b>a"))
  }

  test("node2vecWalk: relationshipWeightProperty — steps sample " +
      "∝ weight × α (r14)") {
    import spark.implicits._
    // dominance: s's two out-edges weigh 1000 : 1 — every one of the
    // 8 deterministic draws lands on the heavy edge (P(light) ≈ 1e-3
    // per draw; the fixed hash draws here all pick heavy, pinned)
    val wE = Seq(("s", "hv", 1000.0), ("s", "lt", 1.0)).toDF("src", "dst", "w")
    val walks = GraphOps.node2vecWalk(wE, walksPerNode = 8, walkLength = 1,
        weightCol = Some("w"))
      .filter(col("start") === "s")
      .collect().map(_.getString(3))
    assert(walks.length == 8 && walks.forall(_ == "s>hv"))
    // uniform weights ≡ unweighted, bit-identically: scaling every wt
    // by c scales cum/tot/u together, so every interval test is
    // unchanged
    val e = edgeDf("a" -> "b", "b" -> "a", "b" -> "c", "b" -> "d", "c" -> "a")
    val e5 = e.withColumn("w", lit(5.0))
    val un = GraphOps.node2vecWalk(e, walksPerNode = 2, walkLength = 4,
        p = 2.0, q = 0.5)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    val uw = GraphOps.node2vecWalk(e5, walksPerNode = 2, walkLength = 4,
        p = 2.0, q = 0.5, weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(uw == un)
    // parallel edges ADD mass: s→t twice at 500 each ≡ once at 1000
    val par = Seq(("s", "hv", 500.0), ("s", "hv", 500.0), ("s", "lt", 1.0))
      .toDF("src", "dst", "w")
    val parWalks = GraphOps.node2vecWalk(par, walksPerNode = 8,
        walkLength = 1, weightCol = Some("w"))
      .filter(col("start") === "s").collect().map(_.getString(3))
    assert(parWalks.forall(_ == "s>hv"))
    // loud: non-positive weight
    intercept[IllegalArgumentException](
      GraphOps.node2vecWalk(Seq(("a", "b", 0.0)).toDF("src", "dst", "w"),
        weightCol = Some("w")).count())
    // CALL: relationshipWeightProperty routes to the biased walker
    // even at p = q = 1; uniform weights ≡ the direct unweighted
    // node2vec sampler (NOT the rank-mod randomWalk)
    val nodes = Seq("a", "b", "c", "d").map(i => (i, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = e.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map("wp" -> "3")))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.randomWalk({walksPerNode: 2, walkLength: 4, " +
        "relationshipWeightProperty: 'wp'}) YIELD walk_id, path " +
        "RETURN walk_id, path")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val direct = GraphOps.node2vecWalk(e, walksPerNode = 2, walkLength = 4)
      .collect().map(r => (r.getString(0), r.getString(3))).toMap
    assert(viaCall == direct)
  }

  test("node2vecWalk: no walk ever vanishes (r13 clamp) across seeds; " +
      "hub neighborhoods spread over bounded window partitions") {
    // a hub with 40 out-neighbors that are themselves interconnected —
    // candidate weights mix all three α classes, so the cumulative
    // intervals exercise the two-stage offsets; every (vertex × walk)
    // must yield exactly one output row for EVERY seed (the r12-advice
    // silent-drop bug dropped a walk when u·total rounded to total)
    val hubEdges = (1 to 40).map(i => ("hub", f"n$i%02d")) ++
      (1 to 39).map(i => (f"n$i%02d", f"n${i + 1}%02d")) ++
      (1 to 40).map(i => (f"n$i%02d", "hub"))
    val e = hubEdges.toDF("src", "dst")
    val nVerts = 41
    // BOTH adaptive paths (r13): threshold 1 forces the two-stage
    // bucketed sum, the default takes the single-window fast path —
    // each must emit exactly one row per walk for every seed
    for (seed <- Seq(1L, 7L, 42L, 999L); thr <- Seq(1L, 4096L)) {
      val out = GraphOps.node2vecWalk(e, walksPerNode = 2, walkLength = 3,
        p = 2.0, q = 0.5, seed = seed, bucketDegreeThreshold = thr)
      assert(out.count() == nVerts * 2L,
        s"seed $seed thr $thr: a walk vanished (expected ${nVerts * 2})")
      // one row per walk_id — the clamp arm and the interval arm are
      // mutually exclusive, so no walk may duplicate either
      assert(out.select(col("walk_id")).distinct().count() == nVerts * 2L)
    }
    // α classes hold on the forced two-stage path too (the fast path's
    // classes are the r12 spec above)
    val aEdges = edgeDf("a" -> "b", "b" -> "a", "b" -> "c", "b" -> "d", "c" -> "a")
    def walkOfA(p0: Double, q0: Double): String =
      GraphOps.node2vecWalk(aEdges, walksPerNode = 1, walkLength = 2,
          p = p0, q = q0, bucketDegreeThreshold = 1L)
        .filter(col("walk_id") === "a#0").collect().head.getString(3)
    assert(walkOfA(1e-9, 1.0) == "a>b>a")
    assert(walkOfA(1e9, 1e9) == "a>b>c")
    assert(walkOfA(1e9, 1e-9) == "a>b>d")
  }

  test("k1Coloring: self-loop-only and looped vertices still get a color (r13)") {
    // z's only edge is a self-loop; a—b a real edge; b also carries a
    // self-loop on top of its real edge (must NOT change its coloring)
    val e = edgeDf("a" -> "b", "z" -> "z", "b" -> "b")
    val out = GraphOps.k1Coloring(e).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out.keySet == Set("a", "b", "z"))
    assert(out("z") == 0) // loop-only: color 0 by convention
    assert(out("a") != out("b")) // the real edge still constrains
  }

  test("kShortestPaths: ranked loopless paths, reroute, pruning, bounds") {
    // weighted diamond + a back edge d->a (proves looplessness) + a
    // direct heavy edge: ranks must follow (dist, hops, path)
    val e = Seq(("a", "b", 1.0), ("b", "d", 1.0), ("a", "c", 5.0),
      ("c", "d", 1.0), ("a", "d", 10.0), ("d", "a", 1.0)).toDF("src", "dst", "w")
    val out = GraphOps.kShortestPaths(e, "a", "d", k = 5, maxHops = 4,
        weightCol = Some("w"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2.0, 2L, "a>b>d"),
      (2L, 6.0, 2L, "a>c>d"),
      (3L, 10.0, 1L, "a>d")))
    // unweighted: dist = hops, path string breaks ties
    val u = GraphOps.kShortestPaths(e, "a", "d", k = 2, maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(3)))
    assert(u.toSeq == Seq((1L, 1.0, "a>d"), (2L, 2.0, "a>b>d")))
    // the corridor pruning never drops a within-budget path
    val two = GraphOps.kShortestPaths(e, "a", "d", k = 5, maxHops = 2,
        weightCol = Some("w"))
      .collect().map(_.getString(3))
    assert(two.toSeq == Seq("a>b>d", "a>c>d", "a>d"))
    // unreachable target => empty result, correct schema
    val none = GraphOps.kShortestPaths(e, "a", "zz", k = 3, maxHops = 4)
    assert(none.columns.toSeq == Seq("rank", "dist", "hops", "path") &&
      none.count() == 0)
    // loud contracts: source==target, non-positive weights, hop bound
    intercept[IllegalArgumentException](GraphOps.kShortestPaths(e, "a", "a"))
    intercept[IllegalArgumentException](
      GraphOps.kShortestPaths(e.withColumn("w", lit(0.0)), "a", "d",
        weightCol = Some("w")))
    intercept[IllegalArgumentException](
      GraphOps.kShortestPaths(e, "a", "d", maxHops = 11))
  }

  test("topologicalSort: longest-path levels, cycle exclusion, loud bounds") {
    // diamond a->b, a->c, b->d, c->d plus a long way round a->e->f->d:
    // d's level is the LONGEST path (3), not the BFS distance (2)
    val dag = edgeDf("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d",
      "a" -> "e", "e" -> "f", "f" -> "d")
    val lv = GraphOps.topologicalSort(dag)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lv == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "e" -> 1L,
      "f" -> 2L, "d" -> 3L))
    // every edge crosses strictly upward => (level, id) is a topo order
    assert(dag.collect().forall(r => lv(r.getString(0)) < lv(r.getString(1))))
    // a cycle and everything downstream of it are EXCLUDED (GDS
    // contract); upstream and independent vertices still settle
    val cyc = edgeDf("z" -> "x", "x" -> "y", "y" -> "x", "y" -> "t",
      "p" -> "q")
    val out = GraphOps.topologicalSort(cyc)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("z" -> 0L, "p" -> 0L, "q" -> 1L))
    // requireDag turns the exclusion into a loud error
    val err = intercept[IllegalArgumentException] {
      GraphOps.topologicalSort(cyc, requireDag = true)
    }
    assert(err.getMessage.contains("cycle"))
    // maxIter while still progressing is loud, never a silent truncation
    val chain = edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val err2 = intercept[IllegalArgumentException] {
      GraphOps.topologicalSort(chain, maxIter = 2)
    }
    assert(err2.getMessage.contains("maxIter"))
    // empty input => empty output, correct schema
    val empty = GraphOps.topologicalSort(edgeDf().limit(0))
    assert(empty.columns.toSeq == Seq("id", "level") && empty.count() == 0)
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

  test("cc local finisher ≡ forced-distributed path; int ids; empty input") {
    val chain = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val edges = edgeDf((chain ++ Seq("x1" -> "x2", "y1" -> "y2")): _*)
    val loc = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = GraphOps.connectedComponents(edges, maxIter = 50,
        localFinishEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(loc == dist && loc("n30") == "n00")
    // integer-typed ids keep their type and numeric min-ordering
    val ei = Seq((10, 2), (2, 1), (7, 8)).toDF("src", "dst")
    val gi = GraphOps.connectedComponents(ei)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(gi == Map(10 -> 1, 2 -> 1, 1 -> 1, 7 -> 7, 8 -> 7))
    assert(GraphOps.connectedComponents(edgeDf()).isEmpty)
  }

  test("pagerank: ranks sum to vertex count and sinks rank lowest") {
    // star: everyone points at z
    val edges = edgeDf("a" -> "z", "b" -> "z", "c" -> "z")
    val ranks = GraphOps.pageRank(edges, iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("z") > ranks("a"))
    assert(math.abs(ranks("a") - ranks("b")) < 1e-9)
  }

  test("dagLongestPath: critical paths with lex tie-break; weighted ties; " +
      "parallel edges keep max weight; cycles loud (r16)") {
    // diamond + tail: s→{a,b}→t→u — unweighted both s>a>t and s>b>t
    // reach t at dist 2; lex-min s>a>t must win and propagate to u
    val e = edgeDf("s" -> "a", "s" -> "b", "a" -> "t", "b" -> "t", "t" -> "u")
    val got = GraphOps.dagLongestPath(e)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(got("s") == ((0.0, "s")))
    assert(got("a") == ((1.0, "s>a")) && got("b") == ((1.0, "s>b")))
    assert(got("t") == ((2.0, "s>a>t")))
    assert(got("u") == ((3.0, "s>a>t>u")))
    // weighted: s→a:1, s→b:3, a→t:3, b→t:1 — dist(t)=4 both ways,
    // lex-min path wins the tie; duplicate parallel edge keeps MAX w
    val ew = Seq(("s", "a", 1L), ("s", "b", 1L), ("s", "b", 3L),
      ("a", "t", 3L), ("b", "t", 1L), ("t", "u", 2L)).toDF("src", "dst", "w")
    val gw = GraphOps.dagLongestPath(ew, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(gw("b") == ((3.0, "s>b")))
    assert(gw("t") == ((4.0, "s>a>t")))
    assert(gw("u") == ((6.0, "s>a>t>u")))
    // cycles are loud on BOTH paths, empty graph is empty
    intercept[IllegalArgumentException](
      GraphOps.dagLongestPath(edgeDf("x" -> "y", "y" -> "x")).collect())
    intercept[IllegalArgumentException](
      GraphOps.dagLongestPath(edgeDf("x" -> "y", "y" -> "x"),
        localFinishEdges = 0L).collect())
    assert(GraphOps.dagLongestPath(edgeDf()).isEmpty)
    // local ≡ forced-distributed BITWISE (each dist is the same
    // sequential additions along the same tie-broken path), on the
    // fixtures and a seeded random layered DAG
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    val rnd = new scala.util.Random(777)
    val layers = (0 until 5).map(l => (0 until 6).map(i => s"L$l-$i"))
    val rndPairs = for { l <- 0 until 4; i <- 0 until 6; j <- 0 until 6
      if rnd.nextDouble() < 0.3 } yield (layers(l)(i), layers(l + 1)(j), (rnd.nextInt(5) + 1).toLong)
    val rdag = rndPairs.toDF("src", "dst", "w")
    for ((g, wc) <- Seq((e, None), (ew, Some("w")), (rdag, Some("w")))) {
      assert(rowsOf(GraphOps.dagLongestPath(g, weightCol = wc)) ==
        rowsOf(GraphOps.dagLongestPath(g, weightCol = wc, localFinishEdges = 0L)),
        "local/distributed divergence")
    }
  }

  test("articleRank: hand-computed 2-iteration values; regular graphs " +
      "stay uniform; empty graph empty (r16)") {
    // a→b, a→c, b→c: |E|=3, |V|=3, avg=1; outdeg a=2, b=1
    // it1: b = .15+.85·(1/3) ; c = .15+.85·(1/3 + 1/2) ; a = .15
    // it2: b = .15+.85·(.15/3) = .1925
    //      c = .15+.85·(.15/3 + (.15+.85/3)/2) = .3766…
    val e = edgeDf("a" -> "b", "a" -> "c", "b" -> "c")
    val r2 = GraphOps.articleRank(e, iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r2("a") - 0.15) < 1e-12)
    assert(math.abs(r2("b") - 0.1925) < 1e-12)
    val cExp = 0.15 + 0.85 * (0.15 / 3.0 + (0.15 + 0.85 / 3.0) / 2.0)
    assert(math.abs(r2("c") - cExp) < 1e-12)
    // directed 4-cycle: every vertex outdeg 1, avg 1 — uniform ranks,
    // and LOWER than pageRank's uniform 1.0 (divisor 2 instead of 1)
    val cyc = edgeDf("w" -> "x", "x" -> "y", "y" -> "z", "z" -> "w")
    val rc = GraphOps.articleRank(cyc, iters = 15)
      .collect().map(_.getDouble(1))
    assert(rc.max - rc.min < 1e-12 && rc.head < 1.0)
    assert(GraphOps.articleRank(edgeDf()).isEmpty)
  }

  test("degrees") {
    val edges = edgeDf("a" -> "b", "a" -> "c", "b" -> "c")
    val d = GraphOps.degrees(edges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val m = d.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(m("a") == ((2L, 0L, 2L)))
    assert(m("c") == ((0L, 2L, 2L)))
  }

  test("bfsPaths: shortest paths materialized, lexicographic tie-break on diamonds") {
    // two shortest s->t paths: s>a>t and s>b>t — the lex-min (s>a>t) must
    // win deterministically; d hangs off t, inheriting the choice
    val edges = edgeDf("s" -> "a", "s" -> "b", "a" -> "t", "b" -> "t", "t" -> "d",
      "b" -> "z") // z only reachable via b
    val out = GraphOps.bfsPaths(edges, Seq("s").toDF("id"), maxIter = 5)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out("t") == ((2, "s>a>t")))
    assert(out("d") == ((3, "s>a>t>d")))
    assert(out("z") == ((2, "s>b>z")))
    assert(out("s") == ((0, "s")))
  }

  test("nodeSimilarity: neighbor-set Jaccard with inverted-index candidates") {
    // p1={x,y,z}, p2={x,y,w} → J=2/4=0.5; p3={q} shares nothing
    val edges = edgeDf("p1" -> "x", "p1" -> "y", "p1" -> "z",
      "p2" -> "x", "p2" -> "y", "p2" -> "w", "p3" -> "q")
    val out = GraphOps.nodeSimilarity(edges, 0.1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("p1", "p2", 0.5)))
  }

  test("nodeSimilarity hub cap: results identical under capping, hub stays out of candidates") {
    // 20 sources all pointing at one HUB (in-degree 22 ≫ cap) plus 3
    // unique dsts each — the telemetry shape (every process loads the
    // same system DLL); (pa, pb) share all 4 neighbors (J = 1.0)
    val hubby = (1 to 20).flatMap(i =>
      Seq(s"s$i" -> "HUB", s"s$i" -> s"u${i}a", s"s$i" -> s"u${i}b", s"s$i" -> s"u${i}c"))
    val planted = Seq("pa" -> "HUB", "pa" -> "r1", "pa" -> "r2", "pa" -> "r3",
      "pb" -> "HUB", "pb" -> "r1", "pb" -> "r2", "pb" -> "r3")
    val edges = edgeDf((hubby ++ planted): _*)
    // naive uncapped inverted-index reference
    val e = edges.select(col("src"), col("dst")).distinct()
    val sizes = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("n"))
    val naive = e.alias("x").join(e.alias("y"),
        col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("id1"), col("y.src").as("id2"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .filter(col("i").cast("double") / (col("n1") + col("n2") - col("i")) >= 0.1)
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(naive.size == 231, s"fixture: expected all C(22,2) pairs, got ${naive.size}")
    for (cap <- Seq(2L, 1000L)) {
      val out = GraphOps.nodeSimilarity(edges, 0.1, hubCap = cap)
        .select(col("id1"), col("id2"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == naive, s"hubCap=$cap diverged from the uncapped reference")
    }
    // at θ=0.5 the hub ranks into every source's un-indexed suffix:
    // candidate generation sees only the rare dsts → 1 candidate pair,
    // vs 231 hub-driven pairs in the naive inverted index
    val rows = edges.select(col("src").as("id"), col("dst").as("item"))
    val szs = rows.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val freq = rows.groupBy(col("item")).agg(count(lit(1)).as("df"))
    val cand = graft.operators.JaccardJoin.candidates(rows, szs, freq, 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cand == Set(("pa", "pb")), s"hub leaked into prefix candidates: $cand")
    val capped = GraphOps.nodeSimilarity(edges, 0.5, hubCap = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(capped == Set(("pa", "pb", 1.0)))
    // r12 metric variants on the same hub fixture, both cap regimes:
    // each metric's capped result equals its own naive reference
    for (metric <- Seq("overlap", "cosine"); cap <- Seq(2L, 1000L)) {
      val thr = 0.4
      val ref = e.alias("x").join(e.alias("y"),
          col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
        .groupBy(col("x.src").as("id1"), col("y.src").as("id2"))
        .agg(count(lit(1)).as("i"))
        .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
        .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
        .withColumn("s", if (metric == "overlap")
            col("i").cast("double") / least(col("n1"), col("n2"))
          else col("i").cast("double") / sqrt(col("n1").cast("double") * col("n2")))
        .filter(col("s") >= thr)
        .select(col("id1"), col("id2"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val got = GraphOps.nodeSimilarity(edges, thr, hubCap = cap, metric = metric)
        .select(col("id1"), col("id2"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == ref, s"$metric hubCap=$cap diverged: got ${got.size}, " +
        s"want ${ref.size}; missing=${(ref -- got).take(3)} extra=${(got -- ref).take(3)}")
      assert(ref.nonEmpty, s"$metric fixture vacuous")
    }
  }

  test("nodeSimilarityFiltered: filters select pairs, never change " +
      "similarities; hub fixture re-run filtered (r13)") {
    val edges = edgeDf("p1" -> "x", "p1" -> "y", "p1" -> "z",
      "p2" -> "x", "p2" -> "y", "p2" -> "w",
      "p3" -> "x", "p3" -> "y", "p3" -> "z")
    import spark.implicits._
    def f(ids: String*) = Some(ids.toDF("id"))
    // reference: full directed expansion post-filtered
    val full = GraphOps.nodeSimilarity(edges, 0.1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val directedRef = (full.map(t => (t._1, t._2, t._3)) ++
      full.map(t => (t._2, t._1, t._3))).toSet
    val both = GraphOps.nodeSimilarityFiltered(edges, 0.1,
        sourceFilter = f("p1"), targetFilter = f("p2", "p3"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(both == directedRef.filter(t => t._1 == "p1" && t._2 != "p1"))
    // one-sided source filter: similarity values match the unfiltered
    // run exactly (restriction must not perturb the metric)
    val src = GraphOps.nodeSimilarityFiltered(edges, 0.1, sourceFilter = f("p2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(src == directedRef.filter(_._1 == "p2"))
    // topK composes: keep the best neighbor per source
    val top1 = GraphOps.nodeSimilarityFiltered(edges, 0.1,
        sourceFilter = f("p1", "p2", "p3"), topK = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(top1 == Set(("p1", "p3"), ("p2", "p1"), ("p3", "p1")))
    // hub fixture under capping (the B12 hub spec, filtered): capped
    // filtered result == naive post-filtered reference
    val hubby = (1 to 20).flatMap(i =>
      Seq(s"s$i" -> "HUB", s"s$i" -> s"u${i}a", s"s$i" -> s"u${i}b", s"s$i" -> s"u${i}c"))
    val planted = Seq("pa" -> "HUB", "pa" -> "r1", "pa" -> "r2", "pa" -> "r3",
      "pb" -> "HUB", "pb" -> "r1", "pb" -> "r2", "pb" -> "r3")
    val hubEdges2 = edgeDf((hubby ++ planted): _*)
    val evens = (2 to 20 by 2).map(i => s"s$i") :+ "pa"
    val odds = (1 to 19 by 2).map(i => s"s$i") :+ "pb"
    val refPairs = GraphOps.nodeSimilarity(hubEdges2, 0.1, hubCap = 1000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val refDirected = (refPairs ++ refPairs.map(t => (t._2, t._1, t._3)))
      .filter(t => evens.contains(t._1) && odds.contains(t._2)).toSet
    val gotF = GraphOps.nodeSimilarityFiltered(hubEdges2, 0.1,
        sourceFilter = Some(evens.toDF("id")), targetFilter = Some(odds.toDF("id")),
        hubCap = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotF == refDirected && gotF.nonEmpty,
      s"filtered+capped diverged: missing=${(refDirected -- gotF).take(3)} " +
        s"extra=${(gotF -- refDirected).take(3)}")
  }

  test("spanningTree: unique Borůvka forest — reroute, ties, " +
      "disconnected forest, loud nulls (r13)") {
    import spark.implicits._
    def wEdges(rows: (String, String, Double)*) = rows.toDF("src", "dst", "w")
    // square a-b-c-d with a heavy diagonal: MST drops the heaviest
    // cycle edge (c-d at 4), keeps a-b, a-c, b-d
    val sq = wEdges(("a", "b", 1.0), ("a", "c", 2.0), ("b", "d", 2.0),
      ("c", "d", 4.0))
    val mst = GraphOps.spanningTree(sq, Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(mst == Set(("a", "b", 1.0), ("a", "c", 2.0), ("b", "d", 2.0)))
    // all-tied weights: the (w, a, b) order keeps the lexicographically
    // smallest forest — a triangle keeps (a,b) and (a,c), drops (b,c)
    val tri = wEdges(("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0))
    val tied = GraphOps.spanningTree(tri, Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(tied == Set(("a", "b"), ("a", "c")))
    // disconnected input → a forest, one tree per component; parallel
    // edges collapse to the lightest; direction is ignored
    val two = wEdges(("a", "b", 3.0), ("b", "a", 1.0), ("x", "y", 5.0))
    val forest = GraphOps.spanningTree(two, Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(forest == Set(("a", "b", 1.0), ("x", "y", 5.0)))
    // total weight on a known graph: star beats chain where it should
    val unw = GraphOps.spanningTree(edgeDf("a" -> "b", "b" -> "c", "a" -> "c"))
    assert(unw.count() == 2) // n-1 edges, unweighted default w=1
    intercept[IllegalArgumentException](GraphOps.spanningTree(
      wEdges(("a", "b", 1.0)).withColumn("w", lit(null).cast("double")),
      Some("w")))
    // r14: the local Kruskal finisher and the distributed Borůvka
    // rounds compute the SAME unique forest — force the distributed
    // path (localFinishEdges = 0) on every fixture above plus the
    // sf0.001 mst gate graph (both objectives)
    Seq(sq, tri, two).foreach { g =>
      val loc = GraphOps.spanningTree(g, Some("w"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val dist = GraphOps.spanningTree(g, Some("w"), localFinishEdges = 0L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(dist == loc, s"kruskal/borůvka divergence on ${g.collect().toSeq}")
    }
    val gate = graft.graph.TestGraph.mstEdges(spark, sf)
    Seq("minimum", "maximum").foreach { obj =>
      val loc = GraphOps.spanningTree(gate, Some("w"), objective = obj)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val dist = GraphOps.spanningTree(gate, Some("w"), objective = obj,
          localFinishEdges = 0L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(dist == loc && loc.nonEmpty, s"objective=$obj gate-graph divergence")
    }
  }

  test("dfs: sorted-adjacency preorder on hand fixtures, depth bound, " +
      "cycles, loud above the local bound (r14)") {
    // a→{b,c}, b→d, c→d: preorder dives b's subtree first — a,b,d,c
    val g = edgeDf("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d")
    def orderOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy(col("ord")).collect().map(_.getString(0)).toSeq
    assert(orderOf(GraphOps.dfs(g, "a")) == Seq("a", "b", "d", "c"))
    // a cycle terminates and revisits nothing
    val cyc = edgeDf("a" -> "b", "b" -> "c", "c" -> "a")
    assert(orderOf(GraphOps.dfs(cyc, "a")) == Seq("a", "b", "c"))
    // depth bound: maxDepth 1 stops below a's children
    assert(orderOf(GraphOps.dfs(g, "a", maxDepth = 1)) == Seq("a", "b", "c"))
    // unreachable vertices never appear; unknown source = just itself
    assert(orderOf(GraphOps.dfs(g, "b")) == Seq("b", "d"))
    assert(orderOf(GraphOps.dfs(g, "zz")) == Seq("zz"))
    // deterministic rerun
    assert(orderOf(GraphOps.dfs(g, "a")) == orderOf(GraphOps.dfs(g, "a")))
    // the bounded-local-finisher contract is loud, names the fallback
    val ex = intercept[IllegalArgumentException](
      GraphOps.dfs(g, "a", maxLocalEdges = 2L))
    assert(ex.getMessage.contains("bfs"))
    // CALL surface (orientation applies before the walk)
    import spark.implicits._
    val nodes = Seq("a", "b", "c", "d").map(i => (i, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = g.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.dfs({sourceNode: 'a', maxDepth: 1}) " +
        "YIELD id, ord RETURN id ORDER BY ord")
      .collect().map(_.getString(0)).toSeq
    assert(viaCall == Seq("a", "b", "c"))
  }

  test("spanningTree objective=maximum and kSpanningTree cuts (r14)") {
    import spark.implicits._
    def wEdges(rows: (String, String, Double)*) = rows.toDF("src", "dst", "w")
    // the r13 square inverted: MAX forest keeps c-d (4) and drops the
    // lightest cycle edge a-b (1)
    val sq = wEdges(("a", "b", 1.0), ("a", "c", 2.0), ("b", "d", 2.0),
      ("c", "d", 4.0))
    val maxst = GraphOps.spanningTree(sq, Some("w"), objective = "maximum")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(maxst == Set(("a", "c", 2.0), ("b", "d", 2.0), ("c", "d", 4.0)))
    // ties still break to the smaller (a, b) under maximum too
    val tri = wEdges(("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0))
    assert(GraphOps.spanningTree(tri, Some("w"), objective = "maximum")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("a", "b"), ("a", "c")))
    // parallel edges collapse to the MAXIMUM weight under maximum
    val par = wEdges(("a", "b", 3.0), ("b", "a", 1.0))
    assert(GraphOps.spanningTree(par, Some("w"), objective = "maximum")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      == Set(("a", "b", 3.0)))
    intercept[IllegalArgumentException](
      GraphOps.spanningTree(sq, Some("w"), objective = "median"))
    // kSpanningTree: path a-b-c-d with weights 1,5,2 — k=2 cuts the
    // heaviest tree edge (b-c), leaving {a-b}, {c-d}
    val path = wEdges(("a", "b", 1.0), ("b", "c", 5.0), ("c", "d", 2.0))
    val k2 = GraphOps.kSpanningTree(path, k = 2, "a", Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(k2 == Set(("a", "b"), ("c", "d")))
    // k=1 is the whole tree; k > edges+1 empties it; maximum cuts the
    // LIGHTEST edge instead
    assert(GraphOps.kSpanningTree(path, k = 1, "a", Some("w")).count() == 3)
    assert(GraphOps.kSpanningTree(path, k = 9, "a", Some("w")).count() == 0)
    assert(GraphOps.kSpanningTree(path, k = 2, "a", Some("w"),
        objective = "maximum")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("b", "c"), ("c", "d")))
    // the source picks ITS component's tree only
    val two = wEdges(("a", "b", 1.0), ("x", "y", 5.0), ("y", "z", 2.0))
    assert(GraphOps.kSpanningTree(two, k = 1, "x", Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("x", "y"), ("y", "z")))
    // absent source is loud
    intercept[IllegalArgumentException](
      GraphOps.kSpanningTree(path, k = 2, "zz", Some("w")))
    // CALL surface: objective + kSpanningTree dispatch
    val nodes = Seq("a", "b", "c", "d").map(i => (i, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = path.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", map(lit("wt"), col("w").cast("string")))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.kSpanningTree({k: 2, sourceNode: 'a', " +
        "relationshipWeightProperty: 'wt'}) " +
        "YIELD src, dst, weight RETURN src, dst ORDER BY src")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaCall == k2)
    val viaMax = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.spanningTree({relationshipWeightProperty: 'wt', " +
        "objective: 'maximum'}) YIELD src, dst, weight " +
        "RETURN src, dst ORDER BY src")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaMax == Set(("b", "c"), ("c", "d"), ("a", "b")))
  }

  test("bellmanFord: negative-weight reroute, negative-cycle loud, " +
      "unreachable omitted (r13)") {
    import spark.implicits._
    def wEdges(rows: (String, String, Double)*) = rows.toDF("src", "dst", "w")
    // the longer path wins BECAUSE of a negative edge: s→a→b→t costs
    // 1+1−3 = −1, beating the direct s→t at 0.5 — dijkstra-family
    // positivity would have refused this graph outright
    val e = wEdges(("s", "a", 1.0), ("a", "b", 1.0), ("b", "t", -3.0),
      ("s", "t", 0.5), ("q", "z", 1.0))
    val out = GraphOps.bellmanFord(e, "s")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getString(2))))
      .toMap
    assert(out("t") == ((-1.0, "s>a>b>t")))
    assert(out("a") == ((1.0, "s>a")) && out("b") == ((2.0, "s>a>b")))
    assert(!out.contains("z")) // unreachable from s
    // a NEGATIVE CYCLE reachable from the source is loud, with the
    // cycle named in the contract (never a silent -inf spiral)
    val cyc = wEdges(("s", "a", 1.0), ("a", "b", 1.0), ("b", "a", -2.0),
      ("b", "t", 1.0))
    val ex = intercept[IllegalArgumentException](GraphOps.bellmanFord(cyc, "s"))
    assert(ex.getMessage.contains("NEGATIVE CYCLE"))
    // a negative cycle NOT reachable from the source does not disturb
    // the run (GDS's own scoping)
    val off = wEdges(("s", "a", 1.0), ("x", "y", -2.0), ("y", "x", 1.0))
    assert(GraphOps.bellmanFord(off, "s").count() == 2)
    // zero-weight edges are legal here (the dijkstra family refuses)
    val zero = wEdges(("s", "a", 0.0), ("a", "t", 0.0))
    assert(GraphOps.bellmanFord(zero, "s")
      .filter(col("id") === "t").collect().head.getDouble(1) == 0.0)
    // null weight loud
    intercept[IllegalArgumentException](GraphOps.bellmanFord(
      e.withColumn("w", lit(null).cast("double")), "s"))
    // CALL surface parity
    val nodes = Seq("s", "a", "b", "t").map(i => (i, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = e.filter(col("src") =!= "q")
      .withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", map(lit("cost"), col("w").cast("string")))
      .select(col("etype"), col("src"), col("dst"), col("event_id"),
        col("props"), col("w"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg.drop("w"),
      "CALL graft.bellmanFord({sourceNode: 's', weightProperty: 'cost'}) " +
        "YIELD id, distance WHERE id = 't' RETURN id, distance")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaCall.toSeq == Seq(("t", -1.0)))
  }

  test("steinerTree: shared segments counted once, unreachable targets " +
      "omitted, direct-edge decoy loses (r13)") {
    import spark.implicits._
    val e = Seq(("s", "a", 1.0), ("a", "t1", 1.0), ("a", "t2", 1.0),
      ("s", "t1", 5.0), ("q", "z", 1.0)).toDF("src", "dst", "w")
    val tree = GraphOps.steinerTree(e, "s", Seq("t1", "t2", "z"),
        maxIter = 5, weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // s>a>t1 (2) beats the direct s>t1 (5); the s>a segment is shared
    // with s>a>t2 and appears once; z is unreachable → omitted
    assert(tree == Set(("s", "a", 1.0), ("a", "t1", 1.0), ("a", "t2", 1.0)))
    // target == source contributes no edges; unweighted default w = 1
    val self = GraphOps.steinerTree(e.select(col("src"), col("dst")), "s", Seq("s"))
    assert(self.isEmpty)
    intercept[IllegalArgumentException](GraphOps.steinerTree(e, "s", Seq.empty))
    // strictly-positive weights are loud (the dijkstra-family rule)
    intercept[IllegalArgumentException](GraphOps.steinerTree(
      e.withColumn("w", lit(0.0)), "s", Seq("t1"), weightCol = Some("w")))
  }

  test("bellmanFord: empty edge frame returns just the source row (r14)") {
    import spark.implicits._
    // nV = 0 without the floor — round 1 used to raise a spurious
    // NEGATIVE CYCLE on a trivially cycle-free (empty) input
    val empty = Seq.empty[(String, String, Double)].toDF("src", "dst", "w")
    val out = GraphOps.bellmanFord(empty, "s").collect()
    assert(out.length == 1 && out.head.getString(0) == "s" &&
      out.head.getDouble(1) == 0.0)
    // a source absent from a NONEMPTY edge frame behaves the same
    val off = Seq(("x", "y", 1.0)).toDF("src", "dst", "w")
    assert(GraphOps.bellmanFord(off, "s").count() == 1)
  }

  test("steinerTree: maxIter-truncated targets raise instead of silently " +
      "vanishing; proven-unreachable targets still omit (r14)") {
    import spark.implicits._
    val e = Seq(("s", "a", 1.0), ("a", "b", 1.0), ("b", "t", 1.0))
      .toDF("src", "dst", "w")
    // t sits 3 hops out; maxIter = 2 cuts an ACTIVE frontier, so t is
    // UNPROVEN-unreachable — exact-or-loud, with the target named
    val ex = intercept[IllegalArgumentException](
      GraphOps.steinerTree(e, "s", Seq("t"), maxIter = 2, weightCol = Some("w")))
    assert(ex.getMessage.contains("t") && ex.getMessage.contains("maxIter"))
    // reached exactly AT the bound (frontier still active) → no raise
    assert(GraphOps.steinerTree(e, "s", Seq("t"), maxIter = 3,
      weightCol = Some("w")).count() == 3)
    // frontier exhausts naturally → a missing target is PROVEN
    // unreachable and omits silently (GDS semantics)
    assert(GraphOps.steinerTree(e, "s", Seq("b", "zz"), maxIter = 10,
      weightCol = Some("w")).count() == 2)
  }

  test("articulationPoints/bridges: hand fixtures + component-delta " +
      "cross-check against cc() (r13)") {
    // path a—b—c: b is the cut vertex, both edges are bridges
    val path = edgeDf("a" -> "b", "b" -> "c")
    assert(GraphOps.articulationPoints(path).collect().map(_.getString(0)).toSeq
      == Seq("b"))
    assert(GraphOps.bridges(path).collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("a", "b"), ("b", "c")))
    // cycle: 2-edge-connected — no cut structure at all
    val cyc = edgeDf("a" -> "b", "b" -> "c", "c" -> "a")
    assert(GraphOps.articulationPoints(cyc).isEmpty)
    assert(GraphOps.bridges(cyc).isEmpty)
    // barbell: two triangles joined by one edge — the bridge, whose
    // endpoints are the two articulation points
    val barbell = edgeDf("a1" -> "a2", "a2" -> "a3", "a3" -> "a1",
      "b1" -> "b2", "b2" -> "b3", "b3" -> "b1", "a1" -> "b1")
    val aps = GraphOps.articulationPoints(barbell).collect().map(_.getString(0)).toSet
    assert(aps == Set("a1", "b1"))
    assert(GraphOps.bridges(barbell).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a1", "b1")))
    // two triangles SHARING a vertex: the shared vertex cuts, yet no
    // edge does (every edge sits on a cycle)
    val bowtie = edgeDf("a" -> "b", "b" -> "m", "m" -> "a",
      "m" -> "x", "x" -> "y", "y" -> "m")
    assert(GraphOps.articulationPoints(bowtie).collect()
      .map(_.getString(0)).toSeq == Seq("m"))
    assert(GraphOps.bridges(bowtie).isEmpty)
    // component-count-delta cross-check on the sf0.001 cut graph: an
    // INDEPENDENT in-memory replay of cut-ness (BFS component counting
    // with each vertex excluded — no lowlinks anywhere): v is an AP ⟺
    // its component splits into ≥ 2 parts without it
    val cut = graft.graph.TestGraph.cutEdges(spark, sf)
    val apSet = GraphOps.articulationPoints(cut).collect().map(_.getString(0)).toSet
    val pairs = GraphOps.undirected(cut)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def componentsOf(verts: Set[String]): Int = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      var n = 0
      verts.foreach { v0 =>
        if (!seen(v0)) {
          n += 1
          val q = scala.collection.mutable.Queue(v0); seen += v0
          while (q.nonEmpty) {
            val v = q.dequeue()
            adj.getOrElse(v, Set.empty).foreach { u =>
              if (verts(u) && !seen(u)) { seen += u; q += u }
            }
          }
        }
      }
      n
    }
    val allV = adj.keySet.toSet
    val base = componentsOf(allV)
    allV.foreach { v =>
      val after = componentsOf(allV - v)
      // removing v deletes one vertex from one component: AP ⟺ that
      // component now counts as ≥ 2 (after >= base + 1); a leaf or a
      // whole-component removal gives after <= base
      assert((after > base) == apSet.contains(v),
        s"vertex $v: components $base -> $after vs AP=${apSet.contains(v)}")
    }
    assert(apSet.nonEmpty, "cut-graph fixture vacuous: no APs at sf0.001")
    // r14: above the local bound the DISTRIBUTED Tarjan-Vishkin pass
    // takes over (B41) — same answers, no loud refusal anymore
    assert(GraphOps.articulationPoints(barbell, maxLocalEdges = 1L)
      .collect().map(_.getString(0)).toSet == Set("a1", "b1"))
    assert(GraphOps.bridges(barbell, maxLocalEdges = 1L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a1", "b1")))
  }

  test("coreDecomposition: coreness on fixtures; local peel ≡ " +
      "distributed H-index; kCore cross-check (r14)") {
    def cores(e: org.apache.spark.sql.DataFrame, forced: Boolean = false) =
      GraphOps.coreDecomposition(e, forceDistributed = forced)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // K5: everyone coreness 4
    val k5 = edgeDf((for { i <- 1 to 5; j <- (i + 1) to 5 }
      yield (s"v$i", s"v$j")): _*)
    val ck5 = cores(k5)
    assert(ck5.values.toSet == Set(4) && ck5.size == 5)
    assert(cores(k5, forced = true) == ck5)
    // path: all 1 (deep-cascade shape — the H-index worst case)
    val path = edgeDf((0 until 12).map(i => s"p$i" -> s"p${i + 1}"): _*)
    val cp = cores(path)
    assert(cp.values.toSet == Set(1) && cp.size == 13)
    assert(cores(path, forced = true) == cp)
    // K4 with a tail: clique 3, tail vertex 1, attach vertex keeps 3
    val k4t = edgeDf("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "a" -> "t")
    val ct = cores(k4t)
    assert(ct == Map("a" -> 3, "b" -> 3, "c" -> 3, "d" -> 3, "t" -> 1))
    assert(cores(k4t, forced = true) == ct)
    // seeded random graphs: forced ≡ local AND the level sets match
    // the independent kCore() extraction at k = 2 and 3
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729)
      val vs = (0 until 40).map(i => f"r$i%02d")
      val pairs = for { i <- vs.indices; j <- (i + 1) until vs.length
        if rnd.nextDouble() < 0.09 } yield (vs(i), vs(j))
      val e = edgeDf(pairs: _*)
      val loc = cores(e)
      assert(cores(e, forced = true) == loc, s"seed $seed: path divergence")
      Seq(2, 3).foreach { k =>
        val level = GraphOps.kCore(e, k).collect().map(_.getString(0)).toSet
        assert(loc.filter(_._2 >= k).keySet == level,
          s"seed $seed k=$k: decomposition/level mismatch")
      }
    }
    // loud: distributed fixpoint must not silently stop early
    intercept[IllegalArgumentException](
      GraphOps.coreDecomposition(path, maxIter = 1, forceDistributed = true))
    // CALL: the GDS-spelled kcore proc streams the decomposition
    import spark.implicits._
    val nodes = Seq("a", "b", "c", "d", "t").map((_, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = k4t.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.kcore({}) YIELD id, coreValue RETURN id, coreValue ORDER BY id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(viaCall == ct)
  }

  test("coreDecomposition: self-loop-only vertices emitted at core 0, " +
      "both paths (r15)") {
    // `solo` has only a self-loop; `t` hangs off the K4 by one edge;
    // `a` ALSO carries a self-loop (ignored for coreness)
    val e = edgeDf("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "a" -> "t", "a" -> "a", "solo" -> "solo")
    val expected = Map("a" -> 3, "b" -> 3, "c" -> 3, "d" -> 3,
      "t" -> 1, "solo" -> 0)
    Seq(false, true).foreach { forced =>
      val got = GraphOps.coreDecomposition(e, forceDistributed = forced)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == expected, s"forceDistributed=$forced")
    }
  }

  test("coreDecomposition: LOCAL path with self-loop-only vertices " +
      "outnumbering symmetric edges — loopOnly stays distributed (r16)") {
    // 1 real edge (2 symmetric rows) + 7 self-loop-only vertices: the
    // local-finisher gate sees nSym=2 but loopOnly is 7 — the r15 code
    // collected loopOnly onto the driver here; r16 unions it as a
    // frame on both paths (loopOnly cardinality is independent of nSym)
    val loops = (0 until 7).map(i => s"L$i" -> s"L$i")
    val e = edgeDf((Seq("x" -> "y") ++ loops): _*)
    val expected = Map("x" -> 1, "y" -> 1) ++
      (0 until 7).map(i => s"L$i" -> 0).toMap
    Seq(false, true).foreach { forced =>
      val got = GraphOps.coreDecomposition(e, forceDistributed = forced)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == expected, s"forceDistributed=$forced")
    }
  }

  test("sampleRwr: sample is induced subgraph, deterministic, covers the " +
      "ratio; disconnected under-coverage fails loudly; CALL dispatch (r15)") {
    // two K4s joined by a bridge — connected, 8 vertices
    val k4a = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (s"a$i", s"a$j")
    val k4b = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (s"b$i", s"b$j")
    val conn = edgeDf((k4a ++ k4b ++ Seq("a0" -> "b0")): _*)
    val und = GraphOps.undirected(conn)
    val inputSet = und.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val s1 = GraphOps.sampleRwr(und, samplingRatio = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(s1.nonEmpty && s1.subsetOf(inputSet), "sample must be induced edges")
    // visited ≥ ratio·|V|: the sample's endpoint set witnesses it
    assert(s1.flatMap(t => Seq(t._1, t._2)).size >= 4)
    // bit-exact rerun (hash-only draws, no floats in the output)
    val s2 = GraphOps.sampleRwr(und, samplingRatio = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(s2 == s1)
    // ratio 1 on a connected graph: the full edge set comes back
    val all = GraphOps.sampleRwr(und, samplingRatio = 1.0, maxSteps = 300)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all == inputSet)
    // disconnected: a start pinned in the triangle component can never
    // reach 90% of vertices — loud, naming the lever
    val disc = GraphOps.undirected(edgeDf(
      "t0" -> "t1", "t1" -> "t2", "t2" -> "t0",
      "z0" -> "z1", "z1" -> "z2", "z2" -> "z3", "z3" -> "z0"))
    val err = intercept[IllegalArgumentException] {
      GraphOps.sampleRwr(disc, samplingRatio = 0.9, maxSteps = 20,
        startNodes = Some(Seq("t0").toDF("id")))
    }
    assert(err.getMessage.contains("samplingRatio"))
    // CALL: the GDS proc name dispatches and matches the direct API
    val nodes = (0 until 4).flatMap(i => Seq(s"a$i", s"b$i")).toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val eg = und.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.graph.sample.rwr({samplingRatio: 0.5}) " +
        "YIELD src, dst RETURN src, dst ORDER BY src, dst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaCall == s1)
  }

  test("sampleCnarw: induced subgraph, deterministic, ratio-1 full " +
      "coverage; loud under-coverage; CALL dispatch (r16)") {
    // the B46 fixture: two K4s joined by a bridge
    val k4a = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (s"a$i", s"a$j")
    val k4b = for { i <- 0 until 4; j <- (i + 1) until 4 } yield (s"b$i", s"b$j")
    val conn = edgeDf((k4a ++ k4b ++ Seq("a0" -> "b0")): _*)
    val und = GraphOps.undirected(conn)
    val inputSet = und.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val s1 = GraphOps.sampleCnarw(und, samplingRatio = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(s1.nonEmpty && s1.subsetOf(inputSet), "sample must be induced edges")
    assert(s1.flatMap(t => Seq(t._1, t._2)).size >= 4)
    // bit-exact rerun (hash-only draws)
    val s2 = GraphOps.sampleCnarw(und, samplingRatio = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(s2 == s1)
    // ratio 1 on a connected graph: every edge comes back
    val all = GraphOps.sampleCnarw(und, samplingRatio = 1.0, maxSteps = 400)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all == inputSet)
    // triangle-free graph (CN = 0 everywhere): weights uniform 1,
    // walker still covers — the formula's floor never bites
    val path = GraphOps.undirected(
      edgeDf((0 until 6).map(i => s"p$i" -> s"p${i + 1}"): _*))
    val ps = GraphOps.sampleCnarw(path, samplingRatio = 1.0, maxSteps = 400,
        startNodes = Some(Seq("p3").toDF("id"))).collect()
    assert(ps.length == 12)
    // disconnected start: loud under-coverage naming the lever
    val disc = GraphOps.undirected(edgeDf("t0" -> "t1", "u0" -> "u1",
      "u1" -> "u2", "u2" -> "u3"))
    val err = intercept[IllegalArgumentException] {
      GraphOps.sampleCnarw(disc, samplingRatio = 0.9, maxSteps = 20,
        startNodes = Some(Seq("t0").toDF("id")))
    }
    assert(err.getMessage.contains("samplingRatio"))
    // CALL: GDS proc name dispatches ≡ direct API
    val nodes = (0 until 4).flatMap(i => Seq(s"a$i", s"b$i")).toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val eg = und.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.graph.sample.cnarw({samplingRatio: 0.5}) " +
        "YIELD src, dst RETURN src, dst ORDER BY src, dst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaCall == s1)
  }

  test("linkPrediction: hand-computed measures on the diagonal square; " +
      "centerCap loud; CALL dispatch with GDS alpha spellings (r15)") {
    // square a-b-c-d-a plus diagonal a-c: degrees a:3 b:2 c:3 d:2
    val e = edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a", "a" -> "c")
    val got = GraphOps.linkPrediction(e).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val invLn2 = r4(2.0 / math.log(2.0))
    val invLn3 = r4(1.0 / math.log(3.0))
    val expected = Map(
      ("a", "c") -> ((2L, invLn2, 1.0, 9L)),          // common {b, d}, both deg 2
      ("b", "d") -> ((2L, r4(2.0 / math.log(3.0)), r4(2.0 / 3.0), 4L)), // common {a, c}
      ("a", "b") -> ((1L, invLn3, r4(1.0 / 3.0), 6L)), // common {c}
      ("a", "d") -> ((1L, invLn3, r4(1.0 / 3.0), 6L)),
      ("b", "c") -> ((1L, invLn3, r4(1.0 / 3.0), 6L)), // common {a}
      ("c", "d") -> ((1L, invLn3, r4(1.0 / 3.0), 6L)))
    assert(got == expected)
    // hub above the cap fails LOUDLY naming the lever
    val star = edgeDf("h" -> "l1", "h" -> "l2", "h" -> "l3")
    val err = intercept[IllegalArgumentException](
      GraphOps.linkPrediction(star, centerCap = 2).collect())
    assert(err.getMessage.contains("centerCap"))
    // CALL: the GDS alpha function spelling lands on the proc; YIELD
    // narrows to the requested measure
    val nodes = Seq("a", "b", "c", "d").toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val eg = e.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.alpha.linkprediction.adamicAdar({}) " +
        "YIELD node1, node2, adamicAdar RETURN node1, node2, adamicAdar")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(viaCall == expected.map { case (k, v) => k -> v._2 })

    // r16: totalNeighbors = d1 + d2 − cn on the same frame
    val tn = GraphOps.linkPrediction(e).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(tn == Map(("a", "c") -> 4L, ("b", "d") -> 2L, ("a", "b") -> 4L,
      ("a", "d") -> 4L, ("b", "c") -> 4L, ("c", "d") -> 4L))
    // r16: sameCommunity — a,c share g1; b is g2; d carries NO
    // assignment (missing ⇒ 0, the measure needs both labels)
    val comm = Seq(("a", "g1"), ("c", "g1"), ("b", "g2")).toDF("id", "community")
    val sc = GraphOps.linkPrediction(e, communities = Some(comm)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(7)).toMap
    assert(sc == Map(("a", "c") -> 1L, ("b", "d") -> 0L, ("a", "b") -> 0L,
      ("a", "d") -> 0L, ("b", "c") -> 0L, ("c", "d") -> 0L))
    // CALL: sameCommunity spelling + communityProperty config; without
    // the config the column is NULL (undefined, not zero)
    val nodesC = Seq(("a", "g1"), ("b", "g2"), ("c", "g1"), ("d", "g1"))
      .toDF("id", "cm").withColumn("label", lit("V"))
      .withColumn("props", map(lit("cm"), col("cm"))).drop("cm")
    val viaSc = graft.graph.CypherCall.run(nodesC, eg,
      "CALL graft.alpha.linkprediction.sameCommunity({communityProperty: 'cm'}) " +
        "YIELD node1, node2, sameCommunity RETURN node1, node2, sameCommunity")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaSc == Map(("a", "c") -> 1L, ("b", "d") -> 0L, ("a", "b") -> 0L,
      ("a", "d") -> 1L, ("b", "c") -> 0L, ("c", "d") -> 1L))
    val viaTn = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.alpha.linkprediction.totalNeighbors({}) " +
        "YIELD node1, node2, totalNeighbors, sameCommunity " +
        "RETURN node1, node2, totalNeighbors, sameCommunity")
      .collect()
    assert(viaTn.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap == tn)
    assert(viaTn.forall(_.isNullAt(3)), "sameCommunity without config is NULL")
  }

  test("astar: result identical to dijkstra, admissible heuristic prunes (r12)") {
    def wEdges(rows: (String, String, Double)*) = rows.toDF("src", "dst", "w")
    // a line s=x0 → x1 → … → x5 = t (w=1 each, coords on a number
    // line) plus a CHEAP decoy chain s → d1 → … → d8 leading AWAY
    // (w=0.5: its g stays under the s→t cost, so distance-bound
    // pruning alone never kills it — only g + h does). Euclidean
    // |x − x(t)| is admissible (weights ≥ coord gaps), so A* must
    // return dijkstra's row while pruning the decoy.
    val line = (0 until 5).map(i => (s"x$i", s"x${i + 1}", 1.0))
    val decoy = ("x0", "d1", 0.5) +: (1 until 8).map(i => (s"d$i", s"d${i + 1}", 0.5))
    val edges = wEdges((line ++ decoy): _*)
    val coords = ((0 to 5).map(i => (s"x$i", 0.0, i.toDouble)) ++
      (1 to 8).map(i => (s"d$i", 0.0, -i.toDouble))).toDF("id", "lat", "lon")
    // euclidean-on-a-line heuristic: |lon - lon(t)| (admissible here)
    val h = coords.select(col("id"), abs(col("lon") - lit(5.0)).as("h"))
    val (got, expandedH) = GraphOps.astarInstrumented(
      edges, "x0", "x5", h, maxIter = 10, weightCol = "w")
    val gotRow = got.collect()
    assert(gotRow.length == 1)
    assert(gotRow.head.getDouble(2) == 5.0)
    assert(gotRow.head.getString(3) == "x0>x1>x2>x3>x4>x5")
    // dijkstra twin (empty heuristic): identical row
    val empty = Seq.empty[(String, Double)].toDF("id", "h")
    val (dij, expandedDij) = GraphOps.astarInstrumented(
      edges, "x0", "x5", empty, maxIter = 10, weightCol = "w")
    assert(dij.collect().toSeq == gotRow.toSeq)
    // ...and the plain ssspPathsFrom row agrees too
    val sssp = GraphOps.ssspPathsFrom(edges, Seq("x0").toDF("id"), maxIter = 10)
      .filter(col("id") === "x5").collect()
    assert(sssp.head.getDouble(2) == 5.0 &&
      sssp.head.getString(3) == "x0>x1>x2>x3>x4>x5")
    // goal-direction is real: the heuristic run expands fewer rows
    // (the decoy chain prunes once g + h exceeds the found best)
    assert(expandedH < expandedDij,
      s"astar expanded $expandedH rows vs dijkstra's $expandedDij — no pruning")
    // unreachable target → empty frame
    assert(GraphOps.astarPath(edges, "x5", "d1", h, maxIter = 10).count() == 0)
    // haversine helper: zero at the target, admissible shape, and the
    // CALL surface composes it end-to-end
    val geo = Seq(("s", 48.85, 2.35), ("m", 50.0, 8.0), ("t", 52.52, 13.40))
      .toDF("id", "lat", "lon")
    val hh = GraphOps.haversineHeuristic(geo, "t").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(hh("t") == 0.0 && hh("m") > 0 && hh("s") > hh("m"))
    // Paris→Berlin great-circle ≈ 878 km
    assert(math.abs(hh("s") - 878.0) < 10.0, s"haversine off: ${hh("s")}")
  }

  test("CALL graft.shortestPath.astar ≡ the direct API (incl. haversine config)") {
    // geo triangle with an admissible-weight detour: weights in km,
    // >= great-circle distance between endpoints
    val nodes = Seq(
      ("City", "s", Map("lat" -> "48.85", "lon" -> "2.35")),
      ("City", "m", Map("lat" -> "50.00", "lon" -> "8.00")),
      ("City", "t", Map("lat" -> "52.52", "lon" -> "13.40")))
      .toDF("label", "id", "props")
    val edges = Seq(
      ("ROAD", "s", "m", 1, Map("km" -> "480")),
      ("ROAD", "m", "t", 1, Map("km" -> "560")),
      ("ROAD", "s", "t", 1, Map("km" -> "1100")))
      .toDF("etype", "src", "dst", "event_id", "props")
    val viaCall = graft.graph.CypherCall.run(nodes, edges,
      "CALL graft.shortestPath.astar({sourceNode: 's', targetNode: 't', " +
        "weightProperty: 'km', latitudeProperty: 'lat', " +
        "longitudeProperty: 'lon'})")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(viaCall.toSeq == Seq(("t", 1040.0, "s>m>t")))
    // dijkstra fallback (no coordinates config) agrees
    val noH = graft.graph.CypherCall.run(nodes, edges,
      "CALL graft.shortestPath.astar({sourceNode: 's', targetNode: 't', " +
        "weightProperty: 'km'})")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    assert(noH.toSeq == viaCall.toSeq)
    // lat without lon is loud
    intercept[IllegalArgumentException](graft.graph.CypherCall.run(nodes, edges,
      "CALL graft.shortestPath.astar({sourceNode: 's', targetNode: 't', " +
        "latitudeProperty: 'lat'})"))
  }

  test("nodeSimilarityTopK: GDS's directed per-node top-k shape (r12)") {
    // p1={x,y,z}, p2={x,y,w}, p3={x} — sims: (p1,p2)=0.5,
    // (p1,p3)=1/3≈0.3333, (p2,p3)=1/3
    val edges = edgeDf("p1" -> "x", "p1" -> "y", "p1" -> "z",
      "p2" -> "x", "p2" -> "y", "p2" -> "w", "p3" -> "x")
    val all = GraphOps.nodeSimilarityTopK(edges, threshold = 0.1, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // every node keeps its best 2, DIRECTED (p3 sees both neighbors)
    assert(all.toSet == Set(
      ("p1", "p2", 0.5), ("p1", "p3", 0.3333),
      ("p2", "p1", 0.5), ("p2", "p3", 0.3333),
      ("p3", "p1", 0.3333), ("p3", "p2", 0.3333)))
    // topK = 1 cuts to each node's single best (ties → smaller id)
    val one = GraphOps.nodeSimilarityTopK(edges, threshold = 0.1, topK = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(one == Set(("p1", "p2"), ("p2", "p1"), ("p3", "p1")))
    // CALL topK config routes to the directed shape
    import spark.implicits._
    val nodes = Seq("p1", "p2", "p3", "x", "y", "z", "w")
      .map((_, "V", Map.empty[String, String])).toDF("id", "label", "props")
    val eg = edges.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.nodeSimilarity({similarityCutoff: 0.1, topK: 1}) " +
        "YIELD id1, id2 RETURN id1, id2 ORDER BY id1")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaCall == one)
  }

  test("k1Coloring: valid deterministic coloring within the greedy bound (r12)") {
    def validate(edges: org.apache.spark.sql.DataFrame,
                 colors: Map[String, Int]): Unit = {
      val sym = GraphOps.undirected(edges).filter(col("src") =!= col("dst"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(sym.forall { case (u, v) => colors(u) != colors(v) },
        s"monochrome edge in $colors")
      val maxDeg = sym.groupBy(_._1).values.map(_.size).max
      assert(colors.values.toSet.size <= maxDeg + 1)
      assert(colors.values.min == 0)
    }
    // odd cycle C5: needs 3 colors, greedy bound allows <= 3
    val c5 = edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "a")
    val g5 = GraphOps.k1Coloring(c5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    validate(c5, g5)
    assert(g5.values.toSet.size == 3)
    // bipartite path: 2 colors suffice and greedy finds them
    val path = edgeDf("p1" -> "p2", "p2" -> "p3", "p3" -> "p4")
    val gp = GraphOps.k1Coloring(path)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    validate(path, gp)
    assert(gp.values.toSet.size == 2)
    // star: hub + leaves = 2 colors even at high degree
    val star = edgeDf((1 to 9).map(i => "hub" -> s"l$i"): _*)
    val gs = GraphOps.k1Coloring(star)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    validate(star, gs)
    assert(gs.values.toSet.size == 2)
    // deterministic rerun; exact-or-loud on maxIter
    assert(GraphOps.k1Coloring(c5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap == g5)
    intercept[IllegalArgumentException](GraphOps.k1Coloring(c5, maxIter = 1))
    // CALL parity
    import spark.implicits._
    val nodes = Seq("a", "b", "c", "d", "e").map((_, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = c5.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.k1coloring({}) YIELD id, color RETURN id, color ORDER BY id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(viaCall == g5)
  }

  test("weightedDegrees: weight sums match the unweighted shape (r12)") {
    import spark.implicits._
    val e = Seq(("a", "b", 2.0), ("a", "c", 3.0), ("b", "c", 1.5))
      .toDF("src", "dst", "w")
    val got = GraphOps.weightedDegrees(e, "w")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == Set(("a", 5.0, 0.0, 5.0), ("b", 1.5, 2.0, 3.5),
      ("c", 0.0, 4.5, 4.5)))
    // null weight is loud
    val bad = Seq(("a", "b", null.asInstanceOf[java.lang.Double]))
      .toDF("src", "dst", "w")
    intercept[IllegalArgumentException](GraphOps.weightedDegrees(bad, "w"))
    // CALL relationshipWeightProperty routes here
    val nodes = Seq("a", "b", "c").map((_, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = Seq(("T", "a", "b", 1, Map("w" -> "2")),
        ("T", "a", "c", 1, Map("w" -> "3")))
      .toDF("etype", "src", "dst", "event_id", "props")
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.degree({relationshipWeightProperty: 'w'}) " +
        "YIELD id, outDegree RETURN id, outDegree ORDER BY id")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(viaCall.toSeq == Seq(("a", 5.0), ("b", 0.0), ("c", 0.0)))
  }

  test("triangleEnumerate: each triangle once, id-sorted, count-consistent (r12)") {
    // K4 on {a,b,c,d} (4 triangles) + pendant d→e (none)
    val e = edgeDf("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "d" -> "e")
    val tris = GraphOps.triangleEnumerate(e)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tris.toSet == Set(("a", "b", "c"), ("a", "b", "d"),
      ("a", "c", "d"), ("b", "c", "d")) && tris.length == 4)
    // per-vertex membership counts equal triangles()
    val fromEnum = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size).toMap
    val fromCount = GraphOps.triangles(e)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromCount == fromEnum.map { case (k, v) => k -> v.toLong })
    // CALL stream parity
    val nodes = Seq("a", "b", "c", "d", "e").map((_, "V", Map.empty[String, String]))
      .toDF("id", "label", "props")
    val eg = e.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.triangles({}) YIELD nodeA, nodeB, nodeC " +
        "RETURN nodeA, nodeB, nodeC ORDER BY nodeA, nodeB, nodeC")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(viaCall.toSet == tris.toSet)
  }

  test("conductance: two bridged triangles score cut/min-volume exactly (r12)") {
    // triangles {a,b,c} and {x,y,z} joined by c→x: sym vol = 7 each,
    // cut = 1 → φ = 1/7 for both communities
    val e = edgeDf("a" -> "b", "b" -> "c", "c" -> "a",
      "x" -> "y", "y" -> "z", "z" -> "x", "c" -> "x")
    val assign = Seq(("a", "A"), ("b", "A"), ("c", "A"),
      ("x", "B"), ("y", "B"), ("z", "B")).toDF("id", "community")
    val got = GraphOps.conductance(e, assign)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("A" -> 0.142857, "B" -> 0.142857))
    // weighted: bridge weight 3 → cut 3, vol(A) = 6 + 3 → φ = 3/9
    val we = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
      ("x", "y", 1.0), ("y", "z", 1.0), ("z", "x", 1.0), ("c", "x", 3.0))
      .toDF("src", "dst", "w")
    val wg = GraphOps.conductance(we, assign, Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wg == Map("A" -> 0.333333, "B" -> 0.333333))
    // a community holding ALL volume is omitted (φ undefined)
    val one = assign.select(col("id"), lit("Z").as("community"))
    assert(GraphOps.conductance(e, one).count() == 0)
    // CALL surface with communityProperty from node props
    val nodes = Seq(("a", "A"), ("b", "A"), ("c", "A"),
      ("x", "B"), ("y", "B"), ("z", "B"))
      .map { case (i, cm) => (i, "V", Map("cm" -> cm)) }
      .toDF("id", "label", "props")
    val eg = e.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.conductance({communityProperty: 'cm'}) " +
        "YIELD community, conductance RETURN community, conductance " +
        "ORDER BY community")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaCall == got)
  }

  test("label propagation: two cliques with one bridge settle into two communities") {
    def clique(pfx: String, n: Int) =
      for (i <- 0 until n; j <- i + 1 until n) yield (s"$pfx$i", s"$pfx$j")
    val edges = edgeDf((clique("a", 5) ++ clique("b", 5) :+ ("a0" -> "b0")): _*)
    val out = GraphOps.labelPropagation(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val aComm = (0 until 5).map(i => out(s"a$i")).toSet
    val bComm = (1 until 5).map(i => out(s"b$i")).toSet
    assert(aComm.size == 1, s"a-clique split: $out")
    assert(bComm.size == 1, s"b-clique split: $out")
    assert(aComm != bComm, s"cliques merged: $out")
    // determinism: identical re-run
    val again = GraphOps.labelPropagation(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == again)
  }

  test("weighted label propagation: edge and node weights steer votes; " +
      "uniform weights ≡ unweighted (r14)") {
    import spark.implicits._
    // edge weights flip b's vote: a—b (w 1) vs b—c (w 3) → after one
    // round b adopts c (vote 3 beats 1); unweighted it ties → a
    val e = Seq(("a", "b", 1.0), ("b", "c", 3.0)).toDF("src", "dst", "w")
    def comms(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val w1 = comms(GraphOps.labelPropagation(e, iters = 1, weightCol = Some("w")))
    assert(w1("b") == "c" && w1("a") == "b" && w1("c") == "b", w1.toString)
    val u1 = comms(GraphOps.labelPropagation(e.drop("w"), iters = 1))
    assert(u1("b") == "a", u1.toString) // tie → smaller label
    // node weights flip the same vote: star a—b, c—b; voter a weighing
    // 5 beats voter c; flipping the weights flips b's community
    val star = Seq(("a", "b", 1.0), ("c", "b", 1.0)).toDF("src", "dst", "w")
    val nwA = Seq(("a", 5.0), ("b", 1.0), ("c", 1.0)).toDF("id", "nw")
    val nwC = Seq(("a", 1.0), ("b", 1.0), ("c", 5.0)).toDF("id", "nw")
    assert(comms(GraphOps.labelPropagation(star, iters = 1,
      weightCol = Some("w"), nodeWeights = Some(nwA)))("b") == "a")
    assert(comms(GraphOps.labelPropagation(star, iters = 1,
      weightCol = Some("w"), nodeWeights = Some(nwC)))("b") == "c")
    // vertices absent from the node-weight frame weigh 1 (the default)
    assert(comms(GraphOps.labelPropagation(star, iters = 1,
      weightCol = Some("w"),
      nodeWeights = Some(Seq(("c", 5.0)).toDF("id", "nw"))))("b") == "c")
    // uniform weights ≡ unweighted on a one-direction edge list (the
    // weighted path is also the forced-distributed path, so this pins
    // distributed ≡ local-finisher votes too)
    def clique(pfx: String, n: Int) =
      for (i <- 0 until n; j <- i + 1 until n) yield (s"$pfx$i", s"$pfx$j")
    val edges = (clique("a", 5) ++ clique("b", 5) :+ ("a0" -> "b0"))
      .toDF("src", "dst")
    val uw = comms(GraphOps.labelPropagation(edges, iters = 5))
    val wu = comms(GraphOps.labelPropagation(
      edges.withColumn("w", lit(1.0)), iters = 5, weightCol = Some("w")))
    assert(uw == wu)
    // zero/negative weights are loud, never silent vote erasure
    intercept[IllegalArgumentException](GraphOps.labelPropagation(
      e.withColumn("w", lit(0.0)), iters = 1, weightCol = Some("w")).count())
    intercept[IllegalArgumentException](GraphOps.labelPropagation(
      star, iters = 1, weightCol = Some("w"),
      nodeWeights = Some(Seq(("a", -1.0)).toDF("id", "nw"))).count())
    // CALL surface: relationshipWeightProperty + nodeWeightProperty
    val nodes = Seq(("a", "V", Map("m" -> "5.0")), ("b", "V", Map("m" -> "1.0")),
      ("c", "V", Map("m" -> "1.0"))).toDF("id", "label", "props")
    val eg = star.withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", map(lit("wt"), col("w").cast("string")))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val viaCall = graft.graph.CypherCall.run(nodes, eg,
      "CALL graft.labelPropagation({maxIterations: 1, " +
        "relationshipWeightProperty: 'wt', nodeWeightProperty: 'm'}) " +
        "YIELD id, communityId WHERE id = 'b' RETURN communityId")
      .collect().map(_.getString(0))
    assert(viaCall.toSeq == Seq("a"))
  }

  test("personalized pagerank: zero mass outside the seeds' component") {
    // two disconnected identical cycles; seeding in A gives B exactly
    // zero rank (plain pagerank ranks both identically)
    val edges = edgeDf(
      "a1" -> "a2", "a2" -> "a3", "a3" -> "a1",
      "b1" -> "b2", "b2" -> "b3", "b3" -> "b1")
    val ppr = GraphOps.personalizedPageRank(edges, Seq("a1").toDF("id"), iters = 15)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ppr("a1") > 0 && ppr("a2") > 0 && ppr("a3") > 0, ppr.toString)
    assert(ppr("b1") == 0.0 && ppr("b2") == 0.0 && ppr("b3") == 0.0, ppr.toString)
    // seed gets the teleport mass on top of walk mass
    assert(ppr("a1") > ppr("a2"), ppr.toString)
    val plain = GraphOps.pageRank(edges, iters = 15)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(plain("a1") - plain("b1")) < 1e-9)
  }

  test("kCore: peeling strips tails and keeps the clique") {
    // K4 (degrees 3) with a chain hanging off it; 3-core = exactly the K4
    val edges = edgeDf(
      "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d",
      "d" -> "t1", "t1" -> "t2", "t2" -> "t3")
    val core3 = GraphOps.kCore(edges, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core3 == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // 4-core doesn't exist
    assert(GraphOps.kCore(edges, 4).isEmpty)
    // 1-core keeps everything (no isolated vertices in an edge list)
    assert(GraphOps.kCore(edges, 1).count() == 7)
  }

  test("triangles: K4 + pendant + triangle-free square") {
    // K4 on a,b,c,d: each vertex is in C(3,2)=3 triangles. A pendant
    // vertex p and a 4-cycle w-x-y-z (no chord) contribute none.
    val edges = edgeDf(
      "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d",
      "d" -> "p",
      "w" -> "x", "x" -> "y", "y" -> "z", "z" -> "w")
    val out = GraphOps.triangles(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("triangles: counts are orientation-independent (duplicate + reversed edges)") {
    // same K3 fed redundantly in both directions and with duplicates
    val edges = edgeDf("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b", "a" -> "c",
      "a" -> "b", "c" -> "a")
    val out = GraphOps.triangles(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("sssp: cheaper multi-hop path beats the direct edge; hop bound respected") {
    val weighted = Seq(
      ("s", "t", 10L), // direct but expensive
      ("s", "m", 2L), ("m", "t", 3L), // cheaper 2-hop: dist(t)=5
      ("t", "u", 1L)).toDF("src", "dst", "w")
    val out = GraphOps.sssp(weighted, Seq("s").toDF("id"), maxIter = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("s" -> 0L, "m" -> 2L, "t" -> 5L, "u" -> 6L))
    // with maxIter=1 only direct relaxations apply
    val one = GraphOps.sssp(weighted, Seq("s").toDF("id"), maxIter = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("s" -> 0L, "m" -> 2L, "t" -> 10L))
  }

  test("closeness centrality: hand-computed path graph; hop bound truncates") {
    // undirected path a-b-c-d: closeness(a) = 3/(1+2+3), closeness(b) =
    // 3/(1+1+2); ends and middles symmetric
    val e = GraphOps.undirected(edgeDf("a" -> "b", "b" -> "c", "c" -> "d"))
    val roots = Seq("a", "b", "c", "d").toDF("id")
    val got = GraphOps.closeness(e, roots)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 0.5, "b" -> 0.75, "c" -> 0.75, "d" -> 0.5))
    // maxIter bound: within 1 hop, each vertex sees only its neighbors
    val bounded = GraphOps.closeness(e, roots, maxIter = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(bounded == Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0))
    // disconnected component: scores stay within-component (no global n)
    val two = GraphOps.undirected(edgeDf("a" -> "b", "x" -> "y"))
    val g2 = GraphOps.closeness(two, Seq("a", "x").toDF("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(g2 == Map("a" -> 1.0, "x" -> 1.0))
  }

  test("betweenness (Brandes): exact on path, star, and cycle fixtures") {
    def bc(edges: org.apache.spark.sql.DataFrame, ids: Seq[String]): Map[String, Double] = {
      val und = GraphOps.undirected(edges)
      GraphOps.betweenness(und, ids.toDF("id"), undirectedInput = true)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    }
    // path a-b-c-d: b and c each sit on 2 pairs ((a,c),(a,d)) / ((b,d),(a,d))
    val path = bc(edgeDf("a" -> "b", "b" -> "c", "c" -> "d"), Seq("a", "b", "c", "d"))
    assert(path == Map("a" -> 0.0, "b" -> 2.0, "c" -> 2.0, "d" -> 0.0))
    // star: the hub carries all 3 leaf pairs
    val star = bc(edgeDf("m" -> "x", "m" -> "y", "m" -> "z"), Seq("m", "x", "y", "z"))
    assert(star == Map("m" -> 3.0, "x" -> 0.0, "y" -> 0.0, "z" -> 0.0))
    // 4-cycle: each opposite pair has TWO shortest paths (sigma = 2),
    // each intermediate gets 1/2 — the sigma-fraction case
    val cyc = bc(edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a"),
      Seq("a", "b", "c", "d"))
    assert(cyc == Map("a" -> 0.5, "b" -> 0.5, "c" -> 0.5, "d" -> 0.5))
    // sampled roots scale DOWN the estimate: with only root a on the
    // path, b sits on (a,c),(a,d) one-directionally → 2/2 = 1
    val sampled = GraphOps.betweenness(
        GraphOps.undirected(edgeDf("a" -> "b", "b" -> "c", "c" -> "d")),
        Seq("a").toDF("id"), undirectedInput = true)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(sampled("b") == 1.0 && sampled("c") == 0.5 && sampled("a") == 0.0)
  }

  test("bfsAllPathsFrom: double diamond keeps every tied shortest path") {
    // a→{b,c}→d→{e,f}→g: 2 tied paths to d, 4 to g — checked against
    // an in-memory BFS replay that enumerates all shortest paths
    val pairs = Seq("a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d",
      "d" -> "e", "d" -> "f", "e" -> "g", "f" -> "g")
    val got = GraphOps.bfsAllPathsFrom(edgeDf(pairs: _*), Seq("a").toDF("id"))
      .collect().map(r => (r.getString(1), r.getInt(2), r.getString(3))).toSet
    val adj = pairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = scala.collection.mutable.Set(("a", 0, "a"))
    val dist = scala.collection.mutable.Map("a" -> 0)
    var frontier = Map("a" -> Seq("a"))
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      val ext = frontier.toSeq.flatMap { case (u, ps) =>
        adj.getOrElse(u, Nil).flatMap(v => ps.map(p => (v, p + ">" + v)))
      }.filter { case (v, _) => !dist.contains(v) }
      frontier = ext.groupBy(_._1).map { case (v, vs) => v -> vs.map(_._2).distinct }
      frontier.foreach { case (v, ps) =>
        dist += v -> d
        ps.foreach(p => want += ((v, d, p)))
      }
    }
    assert(got == want.toSet && got.count(_._1 == "g") == 4 &&
      got.count(_._1 == "d") == 2)
  }

  test("betweenness: directed graph is correct under the safe default") {
    // a→b→c→d→x plus the shortcut a→x: x is reachable at depths 1 and
    // 4 — a depth gap > 2, exactly the case the two-frame undirected
    // dedup shortcut would get wrong (x re-enters the BFS and inflates
    // sigma). The default (full dedup) must stay exact.
    val e = edgeDf("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "x", "a" -> "x")
    val got = GraphOps.betweenness(e, Seq("a", "b", "c", "d", "x").toDF("id"),
        halve = false)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    // hand-computed directed Brandes: b on (a,c),(a,d); c on
    // (a,d),(b,d),(b,x); d on (b,x),(c,x); a→x is the direct edge
    assert(got == Map("a" -> 0.0, "b" -> 2.0, "c" -> 3.0, "d" -> 2.0, "x" -> 0.0))
    // on genuinely symmetric input, the opt-in two-frame shortcut and
    // the full dedup agree
    val und = GraphOps.undirected(edgeDf("a" -> "b", "b" -> "c", "c" -> "d"))
    val ids = Seq("a", "b", "c", "d").toDF("id")
    val full = GraphOps.betweenness(und, ids)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val fast = GraphOps.betweenness(und, ids, undirectedInput = true)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(full == fast && full("b") == 2.0)
  }

  test("betweenness: non-string vertex ids are compared as strings") {
    val ei = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val got = GraphOps.betweenness(GraphOps.undirected(ei),
        Seq(1, 2, 3).toDF("id"), undirectedInput = true)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("1" -> 0.0, "2" -> 1.0, "3" -> 0.0))
  }

  test("louvain: two cliques with a bridge resolve to the two cliques") {
    def clique(ids: Seq[String]): Seq[(String, String)] =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield ids(i) -> ids(j)
    val left = Seq("a", "b", "c", "d")
    val right = Seq("e", "f", "g", "h")
    val e = edgeDf(clique(left) ++ clique(right) :+ ("d" -> "e"): _*)
    val got = GraphOps.louvain(e)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.keySet == (left ++ right).toSet)
    // each clique lands in ONE community, and the two differ
    assert(left.map(got).distinct.size == 1)
    assert(right.map(got).distinct.size == 1)
    assert(got("a") != got("e"))
    // community labels are canonical smallest-member ids
    assert(got("a") == "a" && got("e") == "e")
  }

  test("modularityOptimization: flat move phase ≡ louvain level 1; " +
      "resolves bridged cliques; both paths agree (r16)") {
    def clique(ids: Seq[String]): Seq[(String, String)] =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield ids(i) -> ids(j)
    val left = Seq("a", "b", "c", "d")
    val right = Seq("e", "f", "g", "h")
    val e = edgeDf(clique(left) ++ clique(right) :+ ("d" -> "e"): _*)
    val got = GraphOps.modularityOptimization(e)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got.keySet == (left ++ right).toSet)
    assert(left.map(got).distinct.size == 1 && right.map(got).distinct.size == 1)
    assert(got("a") != got("e"))
    // structural contract: identical to louvain capped at one level
    // (the GDS pair relationship), on local AND forced-dist paths
    val lv1 = GraphOps.louvain(e, maxLevels = 1, moveIters = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == lv1)
    val dist = GraphOps.modularityOptimization(e, localFinishEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(dist == got)
    // seeded noisy graph: local ≡ dist and Q clears the LPA floor
    val rnd = new scala.util.Random(424243)
    val vs = (0 until 30).map(i => f"m$i%02d")
    val pairs = for { i <- vs.indices; j <- (i + 1) until vs.length
      if rnd.nextDouble() < 0.12 } yield (vs(i), vs(j))
    val g = edgeDf(pairs: _*)
    val a = GraphOps.modularityOptimization(g)
    val b = GraphOps.modularityOptimization(g, localFinishEdges = 0L)
    assert(a.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      b.collect().map(r => (r.getString(0), r.getString(1))).toSet)
    val qLpa = GraphOps.modularity(g, GraphOps.labelPropagation(g, iters = 5))
    assert(GraphOps.modularity(g, a) >= qLpa)
  }

  test("louvain: local finisher ≡ forced-distributed path, incl. empty input") {
    // two-clique fixture PLUS a noisier seeded graph: xxhash-derived
    // pseudo-random edges over 40 nodes so both paths cross a real
    // multi-community, multi-level shape
    def clique(ids: Seq[String]): Seq[(String, String)] =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield ids(i) -> ids(j)
    val rng = new scala.util.Random(7)
    val noisy = (0 until 160).map { _ =>
      f"n${rng.nextInt(40)}%02d" -> f"n${rng.nextInt(40)}%02d"
    }.filter(p => p._1 != p._2)
    for (edges <- Seq(clique(Seq("a", "b", "c", "d")) ++
                        clique(Seq("e", "f", "g", "h")) :+ ("d" -> "e"),
                      noisy)) {
      val e = edgeDf(edges: _*)
      val loc = GraphOps.louvain(e)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      val dist = GraphOps.louvain(e, localFinishEdges = 0L)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(loc == dist, "local-finish path must equal distributed path")
    }
    // degenerate inputs: empty and all-self-loop frames return empty,
    // not NPE (ADVICE r7)
    assert(GraphOps.louvain(edgeDf()).isEmpty)
    assert(GraphOps.louvain(edgeDf("a" -> "a")).isEmpty)
    assert(GraphOps.modularity(edgeDf(), edgeDf().select(
      col("src").as("id"), col("dst").as("community"))) == 0.0)
  }

  test("leiden refinement: splits a disconnected community, no-ops a sound one") {
    // the classic Louvain defect shape: a community labelled {a, c, e}
    // whose members only connect THROUGH b (labelled elsewhere) — the
    // induced subgraph of the community is three isolated vertices
    val e = GraphOps.undirected(edgeDf(
      "a" -> "b", "b" -> "c", "b" -> "e", // star through b
      "x" -> "y", "y" -> "z", "x" -> "z")) // sound triangle community
    val bad = Seq(("a", "a"), ("c", "a"), ("e", "a"), ("b", "b"),
      ("x", "x"), ("y", "x"), ("z", "x")).toDF("id", "community")
    val got = GraphOps.leidenRefine(e, bad)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // the phantom community splits into singletons; the triangle stays
    assert(got == Map("a" -> "a", "c" -> "c", "e" -> "e", "b" -> "b",
      "x" -> "x", "y" -> "x", "z" -> "x"))
    // the refinement's local finisher ≡ the distributed CC path
    val gotDist = GraphOps.leidenRefine(e, bad, localFinishEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == gotDist)
    // composed leiden(): every community's induced subgraph is connected
    val rng = new scala.util.Random(11)
    val noisy = (0 until 200).map { _ =>
      f"n${rng.nextInt(50)}%02d" -> f"n${rng.nextInt(50)}%02d"
    }.filter(p => p._1 != p._2)
    val g = edgeDf(noisy: _*)
    val refined = GraphOps.leiden(g)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val sym = GraphOps.undirected(g).collect()
      .map(r => (r.getString(0), r.getString(1)))
    refined.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.map(_._1).toSet
      if (ids.size > 1) {
        // BFS inside the induced subgraph must reach every member
        val adj = sym.filter(p => ids(p._1) && ids(p._2))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        var seen = Set(ids.head)
        var frontier = Set(ids.head)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          seen ++= next; frontier = next
        }
        assert(seen == ids, s"community not internally connected: $ids")
      }
    }
  }

  test("interleaved leiden: local ≡ distributed; coarse result on sound graphs") {
    def clique(ids: Seq[String]): Seq[(String, String)] =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield ids(i) -> ids(j)
    val rng = new scala.util.Random(13)
    val noisy = (0 until 200).map { _ =>
      f"m${rng.nextInt(48)}%02d" -> f"m${rng.nextInt(48)}%02d"
    }.filter(p => p._1 != p._2)
    for (edges <- Seq(clique(Seq("a", "b", "c", "d")) ++
                        clique(Seq("e", "f", "g", "h")) :+ ("d" -> "e"),
                      noisy)) {
      val e = edgeDf(edges: _*)
      val loc = GraphOps.louvain(e, maxLevels = 3, refine = true)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      val dist = GraphOps.louvain(e, maxLevels = 3, localFinishEdges = 0L, refine = true)
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(loc == dist, "refine=true: local-finish path must equal distributed path")
    }
    // on the two-clique fixture, refinement never splits a clique —
    // interleaved leiden and plain louvain agree
    val tc = edgeDf(clique(Seq("a", "b", "c", "d")) ++
      clique(Seq("e", "f", "g", "h")) :+ ("d" -> "e"): _*)
    val lv = GraphOps.louvain(tc).collect().map(r => (r.getString(0), r.getString(1))).toMap
    val ld = GraphOps.leiden(tc).collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(lv == ld)
    // degenerate inputs stay graceful with refine on
    assert(GraphOps.louvain(edgeDf(), refine = true).isEmpty)
  }

  test("louvain: modularity is monotone vs singletons and matches by hand") {
    val e = edgeDf("a" -> "b", "b" -> "c", "a" -> "c", // triangle
      "x" -> "y", "y" -> "z", "x" -> "z",              // triangle
      "c" -> "x")                                      // bridge
    val assign = GraphOps.louvain(e)
    val q = GraphOps.modularity(e, assign)
    val singletons = assign.select(col("id"), col("id").as("community"))
    val q0 = GraphOps.modularity(e, singletons)
    assert(q > q0, s"louvain Q=$q must beat singleton Q=$q0")
    // two triangles + bridge, split at the bridge: m=7,
    // Q = (3+3)/7 − (7² + 7²)/(2·7)² = 6/7 − 98/196 = 5/14
    assert(math.abs(q - 5.0 / 14.0) < 1e-9)
    // hand-checkable singleton value: Q0 = −Σk²/(2m)², degrees
    // (a,b,y,z)=2 and (c,x)=3 → Σk² = 4·4 + 2·9 = 34
    assert(math.abs(q0 - (-34.0 / 196.0)) < 1e-9)
  }

  test("harmonic centrality: hand-computed path graph, exact-integer sum") {
    // path a-b-c-d: harmonic(a) = 1 + 1/2 + 1/3 = 1.833333 (rounded),
    // harmonic(b) = 1 + 1 + 1/2 = 2.5
    val e = GraphOps.undirected(edgeDf("a" -> "b", "b" -> "c", "c" -> "d"))
    val roots = Seq("a", "b", "c", "d").toDF("id")
    val got = GraphOps.harmonic(e, roots)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 1.833333, "b" -> 2.5, "c" -> 2.5, "d" -> 1.833333))
    // the hop-bound guard: maxIter > 10 would break the lcm trick
    intercept[IllegalArgumentException] {
      GraphOps.harmonic(e, roots, maxIter = 11)
    }
  }
}
