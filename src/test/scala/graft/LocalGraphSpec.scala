package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** The bounded local finishers (LocalGraph) must be EXACT mirrors of
  * the distributed algorithms: these specs run every gated operator
  * twice — default (local path, the graphs are tiny) and
  * `localFinishEdges = 0` (forced fully distributed) — and pin the
  * results equal: bitwise for integer state (BFS dist, LPA labels),
  * after the operator's own rounding for float accumulations
  * (PageRank, Brandes δ). */
class LocalGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random digraph: ~n nodes, ~3n edges, string
    * ids; the same seed always yields the same graph. */
  private def randomEdges(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val pairs = Seq.fill(3 * n) {
      (s"v:${rnd.nextInt(n)}", s"v:${rnd.nextInt(n)}")
    }.filter(p => p._1 != p._2)
    pairs.toDF("src", "dst")
  }

  private def asSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: org.apache.spark.sql.Row) => r.toSeq)

  test("pageRank: local ≡ distributed after rounding, on random + star graphs") {
    for (edges <- Seq(randomEdges(60, 7),
        Seq(("hub", "a"), ("hub", "b"), ("a", "hub"), ("b", "hub")).toDF("src", "dst"))) {
      val local = GraphOps.pageRank(edges, iters = 8)
      val dist = GraphOps.pageRank(edges, iters = 8, localFinishEdges = 0L)
      val j = local.select(col("id"), col("rank").as("lr"))
        .join(dist.select(col("id"), col("rank").as("dr")), Seq("id"), "full_outer")
      assert(j.filter(col("lr").isNull || col("dr").isNull).count() == 0)
      val maxDiff = j.agg(max(abs(col("lr") - col("dr")))).collect()(0).getDouble(0)
      assert(maxDiff < 1e-9, s"pageRank local vs distributed drift: $maxDiff")
    }
  }

  test("articleRank: local ≡ distributed after rounding, on random + star " +
      "graphs (r16)") {
    for (edges <- Seq(randomEdges(60, 7),
        Seq(("hub", "a"), ("hub", "b"), ("a", "hub"), ("b", "hub")).toDF("src", "dst"))) {
      val local = GraphOps.articleRank(edges, iters = 8)
      val dist = GraphOps.articleRank(edges, iters = 8, localFinishEdges = 0L)
      val j = local.select(col("id"), col("rank").as("lr"))
        .join(dist.select(col("id"), col("rank").as("dr")), Seq("id"), "full_outer")
      assert(j.filter(col("lr").isNull || col("dr").isNull).count() == 0)
      val maxDiff = j.agg(max(abs(col("lr") - col("dr")))).collect()(0).getDouble(0)
      assert(maxDiff < 1e-9, s"articleRank local vs distributed drift: $maxDiff")
    }
  }

  test("bfsDistancesFrom: bitwise equal (root, id, dist) sets; off-graph sources keep self rows") {
    val edges = GraphOps.undirected(randomEdges(50, 11))
    val roots = (Seq("v:0", "v:7", "v:13") :+ "ghost").toDF("id")
    val local = GraphOps.bfsDistancesFrom(edges, roots, maxIter = 6)
    val dist = GraphOps.bfsDistancesFrom(edges, roots, maxIter = 6, localFinishEdges = 0L)
    assert(asSet(local) == asSet(dist))
    assert(asSet(local.filter(col("root") === "ghost")) ==
      Set(Seq[Any]("ghost", "ghost", 0)))
  }

  test("weighted pageRank: local ≡ distributed; heavy edges pull rank") {
    val rnd = new scala.util.Random(37)
    val wEdges = (0 until 120).map { _ =>
      (s"v:${rnd.nextInt(30)}", s"v:${rnd.nextInt(30)}", (rnd.nextInt(5) + 1).toDouble)
    }.filter(t => t._1 != t._2).toDF("src", "dst", "w")
    val local = GraphOps.pageRank(wEdges, iters = 8, weightCol = Some("w"))
    val dist = GraphOps.pageRank(wEdges, iters = 8, weightCol = Some("w"),
      localFinishEdges = 0L)
    val j = local.select(col("id"), col("rank").as("lr"))
      .join(dist.select(col("id"), col("rank").as("dr")), Seq("id"), "full_outer")
    assert(j.filter(col("lr").isNull || col("dr").isNull).count() == 0)
    val maxDiff = j.agg(max(abs(col("lr") - col("dr")))).collect()(0).getDouble(0)
    assert(maxDiff < 1e-9, s"weighted pageRank drift: $maxDiff")
    // a hub splitting rank 9:1 between two leaves ranks the heavy leaf higher
    val star = Seq(("hub", "heavy", 9.0), ("hub", "light", 1.0),
      ("heavy", "hub", 1.0), ("light", "hub", 1.0)).toDF("src", "dst", "w")
    val m = GraphOps.pageRank(star, iters = 10, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("heavy") > m("light"))
    // unweighted twin: same graph, weights ignored → symmetric leaves
    val u = GraphOps.pageRank(star.select(col("src"), col("dst")), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(u("heavy") - u("light")) < 1e-12)
  }

  test("weighted louvain: a heavy bridge merges what unweighted splits") {
    def clique(ids: Seq[String]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j), 1.0)
    val left = Seq("a", "b", "c"); val right = Seq("x", "y", "z")
    def graph(bridgeW: Double) =
      (clique(left) ++ clique(right) :+ (("c", "x", bridgeW)))
        .toDF("src", "dst", "w")
    // light bridge: two communities (the unweighted answer)
    val lightC = GraphOps.louvain(graph(1.0), weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(lightC("a") != lightC("x"))
    // overwhelming bridge: c and x must share a community
    val heavyC = GraphOps.louvain(graph(50.0), weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(heavyC("c") == heavyC("x"))
    // weighted local ≡ weighted distributed
    val dist = GraphOps.louvain(graph(50.0), weightCol = Some("w"),
      localFinishEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(heavyC == dist)
  }

  test("weighted modularity: hand-computed Q; louvain's weighted answer scores best") {
    // triangle {a,b,c} with weight 2 edges + bridge c—x weight 1 +
    // triangle {x,y,z} weight 2: m_w = 13 (sum of undirected weights)
    // split at the bridge: Σ_in = 6+6 = 12, Σ_tot = 13 per side
    // Q = 12/13 − 2·(13/26)² = 12/13 − 1/2
    val e = Seq(("a", "b", 2.0), ("b", "c", 2.0), ("a", "c", 2.0),
      ("x", "y", 2.0), ("y", "z", 2.0), ("x", "z", 2.0),
      ("c", "x", 1.0)).toDF("src", "dst", "w")
    val split = Seq(("a", "a"), ("b", "a"), ("c", "a"),
      ("x", "x"), ("y", "x"), ("z", "x")).toDF("id", "community")
    val q = GraphOps.modularity(e, split, weightCol = Some("w"))
    assert(math.abs(q - (12.0 / 13.0 - 0.5)) < 1e-9, s"Q=$q")
    // the weighted louvain run at least matches the hand split's Q
    val lv = GraphOps.louvain(e, weightCol = Some("w"))
    val qLv = GraphOps.modularity(e, lv, weightCol = Some("w"))
    assert(qLv >= q - 1e-9)
    // unweighted Q over the same frame ignores w (2-arg compatibility)
    val qU = GraphOps.modularity(e.select(col("src"), col("dst")), split)
    assert(math.abs(qU - 5.0 / 14.0) < 1e-9) // the unweighted fixture value
  }

  test("bfs (single wave): bitwise-equal (id, dist) sets, multi-source min-dist") {
    val edges = GraphOps.undirected(randomEdges(50, 29))
    val roots = Seq("v:0", "v:9").toDF("id")
    val local = GraphOps.bfs(edges, roots, maxIter = 6)
    val dist = GraphOps.bfs(edges, roots, maxIter = 6, localFinishEdges = 0L)
    assert(asSet(local) == asSet(dist))
    // dist-0 rows for both sources, one wave (no per-root duplication)
    assert(local.filter(col("dist") === 0).count() == 2)
    assert(local.groupBy(col("id")).count().filter(col("count") > 1).count() == 0)
  }

  test("closeness and harmonic ride the bfs finisher unchanged") {
    val edges = GraphOps.undirected(randomEdges(40, 3))
    val roots = edges.select(col("src").as("id")).distinct()
    val viaLocal = GraphOps.closeness(edges, roots, maxIter = 6)
    val viaDist = {
      val d = GraphOps.bfsDistancesFrom(edges, roots, maxIter = 6, localFinishEdges = 0L)
      d.filter(col("dist") > 0)
        .groupBy(col("root").as("id"))
        .agg(count(lit(1)).as("reached"), sum(col("dist")).as("total"))
        .select(col("id"),
          round(col("reached").cast("double") / col("total"), 6).as("closeness"))
    }
    assert(asSet(viaLocal) == asSet(viaDist))
    val h1 = GraphOps.harmonic(edges, roots, maxIter = 6)
    assert(h1.count() == roots.count()) // all roots reach someone here
  }

  test("labelPropagation: bitwise equal labels (integer counts, total tie order)") {
    for (seed <- Seq(5L, 21L)) {
      val edges = randomEdges(45, seed)
      val local = GraphOps.labelPropagation(edges, iters = 4)
      val dist = GraphOps.labelPropagation(edges, iters = 4, localFinishEdges = 0L)
      assert(asSet(local) == asSet(dist))
    }
  }

  test("betweenness: equal after round-6, directed and undirected paths") {
    // directed random graph, default (directed-safe) dedup
    val edges = randomEdges(40, 17)
    val roots = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val local = GraphOps.betweenness(edges, roots, maxIter = 10, halve = false)
    val dist = GraphOps.betweenness(edges, roots, maxIter = 10, halve = false,
      localFinishEdges = 0L)
    val j = local.select(col("id"), col("betweenness").as("lb"))
      .join(dist.select(col("id"), col("betweenness").as("db")), Seq("id"), "full_outer")
    assert(j.filter(col("lb").isNull || col("db").isNull).count() == 0)
    val maxDiff = j.agg(max(abs(col("lb") - col("db")))).collect()(0).getDouble(0)
    assert(maxDiff <= 2e-6, s"betweenness local vs distributed drift: $maxDiff")

    // undirected: symmetrized input + the 2-frame dedup shortcut + halve
    val sym = GraphOps.undirected(edges)
    val symRoots = sym.select(col("src").as("id")).distinct()
    val lu = GraphOps.betweenness(sym, symRoots, halve = true, undirectedInput = true)
    val du = GraphOps.betweenness(sym, symRoots, halve = true, undirectedInput = true,
      localFinishEdges = 0L)
    val ju = lu.select(col("id"), col("betweenness").as("lb"))
      .join(du.select(col("id"), col("betweenness").as("db")), Seq("id"), "full_outer")
    val maxDiffU = ju.agg(max(abs(col("lb") - col("db")))).collect()(0).getDouble(0)
    assert(maxDiffU <= 2e-6, s"undirected betweenness drift: $maxDiffU")
  }

  test("hop bound respected identically on a deep path graph") {
    val path = (0 until 15).map(i => (s"n:$i", s"n:${i + 1}")).toDF("src", "dst")
    val roots = Seq("n:0").toDF("id")
    val local = GraphOps.bfsDistancesFrom(path, roots, maxIter = 5)
    val dist = GraphOps.bfsDistancesFrom(path, roots, maxIter = 5, localFinishEdges = 0L)
    assert(asSet(local) == asSet(dist))
    assert(local.agg(max(col("dist"))).collect()(0).getInt(0) == 5)
  }

  test("eigenvector: local ≡ distributed; star center dominates") {
    val star = (1 to 6).map(i => ("hub", s"leaf:$i")).toDF("src", "dst")
    val rnd = randomEdges(40, 23)
    for (edges <- Seq(star, rnd)) {
      val local = GraphOps.eigenvector(edges, iters = 6)
      val dist = GraphOps.eigenvector(edges, iters = 6, localFinishEdges = 0L)
      val j = local.select(col("id"), col("score").as("ls"))
        .join(dist.select(col("id"), col("score").as("ds")), Seq("id"), "full_outer")
      assert(j.filter(col("ls").isNull || col("ds").isNull).count() == 0)
      val maxDiff = j.agg(max(abs(col("ls") - col("ds")))).collect()(0).getDouble(0)
      assert(maxDiff < 1e-9, s"eigenvector drift: $maxDiff")
    }
    val top = GraphOps.eigenvector(star, iters = 6)
      .orderBy(col("score").desc).collect()
    assert(top.head.getString(0) == "hub")
    // unit L2 norm after the final normalization
    val n2 = top.map(r => r.getDouble(1)).map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-9)
    assert(GraphOps.eigenvector(Seq.empty[(String, String)].toDF("src", "dst")).count() == 0)
  }

  test("weighted eigenvector: uniform ≡ unweighted; heavy edges pull; local ≡ dist") {
    val rnd = new scala.util.Random(41)
    // ONE direction per pair: the weighted contract SUMS directed
    // occurrences, so an (a,b)+(b,a) input would weight that edge 2×
    // relative to single-direction edges — not a uniform scale
    val base = (0 until 100).map { _ =>
      (s"v:${rnd.nextInt(25)}", s"v:${rnd.nextInt(25)}")
    }.filter(p => p._1 < p._2).distinct
    // uniform weight 3 ≡ unweighted (per-iteration normalization kills scale)
    val uW = base.map(t => (t._1, t._2, 3.0)).toDF("src", "dst", "w")
    val u0 = base.toDF("src", "dst")
    val a = GraphOps.eigenvector(uW, iters = 6, weightCol = Some("w"))
      .select(col("id"), round(col("score"), 9).as("s"))
    val b = GraphOps.eigenvector(u0, iters = 6)
      .select(col("id"), round(col("score"), 9).as("s"))
    assert(asSet(a) == asSet(b))
    // local ≡ distributed under weights
    val wEdges = base.map(t => (t._1, t._2, (t._1.hashCode % 5 + 6).toDouble))
      .toDF("src", "dst", "w")
    val loc = GraphOps.eigenvector(wEdges, iters = 6, weightCol = Some("w"))
    val dist = GraphOps.eigenvector(wEdges, iters = 6, weightCol = Some("w"),
      localFinishEdges = 0L)
    val j = loc.select(col("id"), col("score").as("ls"))
      .join(dist.select(col("id"), col("score").as("ds")), Seq("id"), "full_outer")
    assert(j.filter(col("ls").isNull || col("ds").isNull).count() == 0)
    assert(j.agg(max(abs(col("ls") - col("ds")))).collect()(0).getDouble(0) < 1e-9)
    // a hub's heavy leaf dominates its light one
    val star = Seq(("hub", "heavy", 9.0), ("hub", "light", 1.0)).toDF("src", "dst", "w")
    val m = GraphOps.eigenvector(star, iters = 6, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("heavy") > m("light"))
  }

  test("hits: local ≡ distributed; bipartite split into pure hubs and auths") {
    val bip = Seq(("p1", "s1"), ("p1", "s2"), ("p2", "s2"), ("p3", "s2"), ("p3", "s3"))
      .toDF("src", "dst")
    for (edges <- Seq(bip, randomEdges(35, 31))) {
      val local = GraphOps.hits(edges, iters = 6)
      val dist = GraphOps.hits(edges, iters = 6, localFinishEdges = 0L)
      val j = local.select(col("id"), col("hub").as("lh"), col("auth").as("la"))
        .join(dist.select(col("id"), col("hub").as("dh"), col("auth").as("da")),
          Seq("id"), "full_outer")
      assert(j.filter(col("lh").isNull || col("dh").isNull).count() == 0)
      val maxDiff = j.agg(greatest(max(abs(col("lh") - col("dh"))),
        max(abs(col("la") - col("da"))))).collect()(0).getDouble(0)
      assert(maxDiff < 1e-9, s"hits drift: $maxDiff")
    }
    val m = GraphOps.hits(bip, iters = 6).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // parts have no in-edges → auth 0; suppliers no out-edges → hub 0
    assert(Seq("p1", "p2", "p3").forall(p => m(p)._2 == 0.0 && m(p)._1 > 0.0))
    assert(Seq("s1", "s2", "s3").forall(s0 => m(s0)._1 == 0.0 && m(s0)._2 > 0.0))
    // s2 (in-degree 3) is the strongest authority
    assert(m("s2")._2 > m("s1")._2 && m("s2")._2 > m("s3")._2)
  }

  test("work/output overruns decline locally (None) instead of OOMing the driver") {
    val pairs = Array.tabulate(100)(i => (s"a:$i": Any, s"a:${(i + 1) % 100}": Any))
    val roots: Array[Any] = Array.tabulate(100)(i => s"a:$i")
    // output bound: 100 roots × 100 vertices > 50 rows → decline
    assert(graft.graph.LocalGraph.bfsDistancesFrom(spark, pairs, roots,
      maxIter = 10, org.apache.spark.sql.types.StringType, maxOutputRows = 50L).isEmpty)
    // work bound: 100 roots × 100 edges > 99 visits → decline
    assert(graft.graph.LocalGraph.betweenness(spark, pairs,
      roots.map(_.toString), maxIter = 10, halve = false, maxEdgeVisits = 99L).isEmpty)
  }

  test("binary ids decline the local path and still compute correctly") {
    // Array[Byte] has reference equality — the driver HashMaps would
    // shatter the graph; the gate must fall through to the distributed
    // joins, which compare binary by value
    val be = Seq((Array[Byte](1), Array[Byte](2)), (Array[Byte](2), Array[Byte](3)))
      .toDF("src", "dst")
    val pr = GraphOps.pageRank(be, iters = 3)
    assert(pr.count() == 3) // one row per distinct binary vertex
    val d = GraphOps.bfs(be, Seq(Array[Byte](1)).toDF("id"), maxIter = 5)
    assert(d.count() == 3 &&
      d.agg(max(col("dist"))).collect()(0).getInt(0) == 2)
  }

  test("bfs/bfsDistancesFrom: seeds of a different numeric type are cast to the edge id type") {
    // Int seeds over Long edges: the local finishers key HashMaps on
    // exact runtime values, so without the cast the lookup silently
    // misses and the seed reads as unreachable — the cast contract
    // makes local ≡ distributed (review r8 ADVICE, medium)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seedsInt = Seq(1).toDF("id") // IntegerType, edges are LongType
    val local = GraphOps.bfs(edges, seedsInt, maxIter = 5)
    val dist = GraphOps.bfs(edges, seedsInt, maxIter = 5, localFinishEdges = 0L)
    assert(asSet(local) == asSet(dist))
    assert(local.count() == 4 &&
      local.agg(max(col("dist"))).collect()(0).getInt(0) == 3)
    val localD = GraphOps.bfsDistancesFrom(edges, seedsInt, maxIter = 5)
    val distD = GraphOps.bfsDistancesFrom(edges, seedsInt, maxIter = 5,
      localFinishEdges = 0L)
    assert(asSet(localD) == asSet(distD) && localD.count() == 4)
  }

  test("eigenvector: weighted and unweighted share one input contract") {
    // self-loops dropped and ids stringified in BOTH variants, so
    // relationshipWeightProperty never changes the yielded id dtype or
    // the vertex arithmetic (review r8 ADVICE)
    // no reciprocal directed pairs (those occurrence-sum to w=2 under
    // the weighted contract, documented); self-loop on 2
    val loops = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
      (2L, 2L, 1.0))
      .toDF("src", "dst", "w")
    val unw = GraphOps.eigenvector(loops.select(col("src"), col("dst")), iters = 6)
    val wtd = GraphOps.eigenvector(loops, iters = 6, weightCol = Some("w"))
    assert(unw.schema("id").dataType == org.apache.spark.sql.types.StringType)
    assert(wtd.schema("id").dataType == org.apache.spark.sql.types.StringType)
    val j = unw.select(col("id"), col("score").as("a"))
      .join(wtd.select(col("id"), col("score").as("b")), Seq("id"), "full_outer")
    assert(j.filter(col("a").isNull || col("b").isNull).count() == 0)
    val maxDiff = j.agg(max(abs(col("a") - col("b")))).collect()(0).getDouble(0)
    assert(maxDiff < 1e-9, s"uniform-weight vs unweighted drift: $maxDiff")
  }

  test("degenerate inputs: empty edge frame") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(GraphOps.pageRank(empty).count() == 0)
    assert(GraphOps.betweenness(empty, Seq("x").toDF("id")).count() == 0)
    // bfs distances: off-graph sources still produce their self rows
    val d = GraphOps.bfsDistancesFrom(empty, Seq("x").toDF("id"))
    assert(asSet(d) == Set(Seq[Any]("x", "x", 0)))
  }
}
