package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.{CypherCall, GraphOps}

/** B20w/B18w — weighted betweenness (Dijkstra-based Brandes) and
  * weighted closeness: hand-computed fixtures, local ≡ distributed
  * equivalence, uniform-weight ≡ unweighted cross-checks, and the CALL
  * surface dispatch. */
class WeightedBrandesSpec extends SparkSpec {
  import spark.implicits._

  private def bMap(df: DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("weighted betweenness: weights reroute paths the unweighted measure splits") {
    // a→b(1), b→c(1), a→d(1), d→c(10): the only shortest a→c path runs
    // through b — b carries the whole pair, d none (unweighted would
    // split 0.5/0.5 across the two tied 2-hop paths)
    val w = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "d", 1L), ("d", "c", 10L))
      .toDF("src", "dst", "w")
    val roots = Seq("a", "b", "c", "d").toDF("id")
    val wb = bMap(GraphOps.betweenness(w, roots, maxIter = 5, halve = false,
      weightCol = Some("w")))
    assert(wb("b") == 1.0 && wb("d") == 0.0 && wb("a") == 0.0 && wb("c") == 0.0)
    val ub = bMap(GraphOps.betweenness(w.select(col("src"), col("dst")), roots,
      maxIter = 5, halve = false))
    assert(ub("b") == 0.5 && ub("d") == 0.5)
  }

  test("weighted betweenness: tied minimal-weight paths split sigma-fractions") {
    // a→b1→c and a→b2→c both cost 2; σ_ac = 2 → each broker carries 1/2
    val w = Seq(("a", "b1", 1L), ("a", "b2", 1L), ("b1", "c", 1L), ("b2", "c", 1L))
      .toDF("src", "dst", "w")
    val roots = Seq("a", "b1", "b2", "c").toDF("id")
    val wb = bMap(GraphOps.betweenness(w, roots, maxIter = 5, halve = false,
      weightCol = Some("w")))
    assert(wb("b1") == 0.5 && wb("b2") == 0.5 && wb("a") == 0.0 && wb("c") == 0.0)
  }

  test("weighted betweenness: longer-but-lighter path wins over the direct edge") {
    // a→c direct costs 5; a→b→c costs 2 — b brokers the pair even
    // though a→c exists (the case hop-BFS cannot express)
    val w = Seq(("a", "c", 5L), ("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val roots = Seq("a", "b", "c").toDF("id")
    val wb = bMap(GraphOps.betweenness(w, roots, maxIter = 5, halve = false,
      weightCol = Some("w")))
    assert(wb("b") == 1.0)
  }

  test("uniform weight 1 reproduces the unweighted betweenness exactly") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(90)((s"v:${rnd.nextInt(25)}", s"v:${rnd.nextInt(25)}"))
      .filter(p => p._1 != p._2).distinct.toDF("src", "dst")
    val roots = edges.select(col("src").as("id")).distinct()
    val u = bMap(GraphOps.betweenness(edges, roots, maxIter = 8, halve = false))
    val w = bMap(GraphOps.betweenness(edges.withColumn("w", lit(1L)), roots,
      maxIter = 8, halve = false, weightCol = Some("w")))
    assert(u.keySet == w.keySet)
    val maxDiff = u.keys.map(k => math.abs(u(k) - w(k))).max
    assert(maxDiff <= 2e-6, s"uniform-weight vs unweighted drift: $maxDiff")
    assert(u.values.exists(_ > 0)) // non-vacuous
  }

  test("weighted betweenness: local ≡ distributed on a seeded random weighted graph") {
    val rnd = new scala.util.Random(23)
    val triples = Seq.fill(120)((s"v:${rnd.nextInt(30)}", s"v:${rnd.nextInt(30)}",
        (rnd.nextInt(5) + 1).toLong))
      .filter(t => t._1 != t._2).distinct.toDF("src", "dst", "w")
    val roots = triples.select(col("src").as("id")).distinct()
    val local = bMap(GraphOps.betweenness(triples, roots, maxIter = 8,
      halve = false, weightCol = Some("w")))
    val dist = bMap(GraphOps.betweenness(triples, roots, maxIter = 8,
      halve = false, weightCol = Some("w"), localFinishEdges = 0L))
    assert(local.keySet == dist.keySet)
    val maxDiff = local.keys.map(k => math.abs(local(k) - dist(k))).max
    assert(maxDiff <= 2e-6, s"local vs distributed drift: $maxDiff")
    assert(local.values.exists(_ > 0))
  }

  test("hop bound binds identically on both paths") {
    // path a→b→c→d→e, all weight 1; maxIter = 2 sees only ≤2-edge
    // pairs: b brokers (a,c), c brokers (b,d) and (a,?): a reaches c
    // at 2 hops through b only — d is out of range from a
    val w = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L), ("d", "e", 1L))
      .toDF("src", "dst", "w")
    val roots = Seq("a", "b", "c", "d", "e").toDF("id")
    val local = bMap(GraphOps.betweenness(w, roots, maxIter = 2, halve = false,
      weightCol = Some("w")))
    val dist = bMap(GraphOps.betweenness(w, roots, maxIter = 2, halve = false,
      weightCol = Some("w"), localFinishEdges = 0L))
    assert(local == dist)
    // each interior vertex brokers exactly the one 2-hop pair through it
    assert(local("b") == 1.0 && local("c") == 1.0 && local("d") == 1.0)
    assert(local("a") == 0.0 && local("e") == 0.0)
  }

  test("hop-bound pathologies refuse loudly and identically on both paths") {
    // (i) strict-layering violation (review r9 finding 1): within 3
    // hops, u's dist ties at 3 via both the 1-hop heavy edge and the
    // 3-hop light path (hops = 3), while v = u+1 is only reachable at
    // 2 recorded hops — the DAG edge u→v DECREASES the layering, so
    // the layer-synchronized sweep would silently drop the r>u>v path
    val g1 = Seq(("r", "a", 1L), ("a", "b", 1L), ("b", "u", 1L),
      ("r", "u", 3L), ("u", "v", 1L)).toDF("src", "dst", "w")
    val roots1 = Seq("r").toDF("id")
    for (lfe <- Seq(250000L, 0L)) {
      val err = intercept[IllegalStateException] {
        GraphOps.betweenness(g1, roots1, maxIter = 3, halve = false,
          weightCol = Some("w"), localFinishEdges = lfe).count()
      }
      assert(err.getMessage.contains("hop bound binds"), s"lfe=$lfe")
    }
    // raising maxIter past the weighted hop diameter computes, and
    // local ≡ distributed
    val ok = bMap(GraphOps.betweenness(g1, roots1, maxIter = 6, halve = false,
      weightCol = Some("w")))
    val okD = bMap(GraphOps.betweenness(g1, roots1, maxIter = 6, halve = false,
      weightCol = Some("w"), localFinishEdges = 0L))
    assert(ok == okD)
    assert(ok("u") == 1.0) // r>…>u>v: u brokers (r, v); σ-unique path
    // (ii) zero-σ reached vertex (review r9 finding 2): u reaches dist
    // 6 through p's STALE dist at round 2, p later improves, so no
    // bounded DAG path reaches u — σ(u) = 0 while u is reached
    val g2 = Seq(("r", "p", 5L), ("r", "q1", 1L), ("q1", "q2", 1L),
      ("q2", "p", 1L), ("p", "u", 1L), ("u", "z", 1L)).toDF("src", "dst", "w")
    val roots2 = Seq("r").toDF("id")
    for (lfe <- Seq(250000L, 0L)) {
      val err = intercept[IllegalStateException] {
        GraphOps.betweenness(g2, roots2, maxIter = 3, halve = false,
          weightCol = Some("w"), localFinishEdges = lfe).count()
      }
      assert(err.getMessage.contains("hop bound binds"), s"lfe=$lfe")
    }
    val ok2 = bMap(GraphOps.betweenness(g2, roots2, maxIter = 8, halve = false,
      weightCol = Some("w")))
    val ok2D = bMap(GraphOps.betweenness(g2, roots2, maxIter = 8, halve = false,
      weightCol = Some("w"), localFinishEdges = 0L))
    assert(ok2 == ok2D)
    assert(!ok2.values.exists(v => v.isNaN || v.isInfinite))
  }

  test("weighted betweenness rejects null/zero/negative weights loudly") {
    val bad = Seq(("a", "b", 0L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val err = intercept[IllegalArgumentException] {
      GraphOps.betweenness(bad, Seq("a").toDF("id"), weightCol = Some("w"))
    }
    assert(err.getMessage.contains("strictly positive"))
  }

  test("ssspFrom / weighted closeness reject zero/negative weights loudly") {
    // advisor r9: a zero-weight shortest distance fails closeness's
    // dist > 0 filter and reads as unreachable — refuse like weighted
    // betweenness does, instead of silently skewing scores
    val bad = Seq(("a", "b", 0L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val err = intercept[IllegalArgumentException] {
      GraphOps.ssspFrom(bad, Seq("a").toDF("id"))
    }
    assert(err.getMessage.contains("strictly positive"))
    val neg = Seq(("a", "b", -1L)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      GraphOps.closeness(neg, Seq("a").toDF("id"), weightCol = Some("w"))
    }
    // null weights stay DROPPED (edge-not-present), not loud: b→c
    // remains reachable, a→b does not exist for weighted distances
    val withNull = Seq(("a", "b", Some(2L)), ("b", "c", None: Option[Long]))
      .toDF("src", "dst", "w")
    val d = GraphOps.ssspFrom(withNull, Seq("a").toDF("id"))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(d == Map("a" -> 0.0, "b" -> 2.0))
  }

  test("ssspFrom: keyed multi-root distances match per-root sssp") {
    val rnd = new scala.util.Random(31)
    val triples = Seq.fill(100)((s"v:${rnd.nextInt(20)}", s"v:${rnd.nextInt(20)}",
        (rnd.nextInt(4) + 1).toLong))
      .filter(t => t._1 != t._2).distinct.toDF("src", "dst", "w")
    val roots = Seq("v:0", "v:3", "ghost").toDF("id")
    val keyed = GraphOps.ssspFrom(triples, roots, maxIter = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (r <- Seq("v:0", "v:3")) {
      val single = GraphOps.sssp(triples, Seq(r).toDF("id"), maxIter = 8)
        .collect().map(x => x.getString(0) -> x.getLong(1).toDouble).toMap
      val mine = keyed.collect { case ((`r`, id), d) => id -> d }
      assert(mine == single, s"root $r: keyed $mine vs single $single")
    }
    // off-graph roots keep their self row only
    assert(keyed.keys.count(_._1 == "ghost") == 1 && keyed(("ghost", "ghost")) == 0.0)
    // r9: the default path above runs the LOCAL mirror (sub-gate
    // graph); the forced-distributed twin must agree exactly
    val dist = GraphOps.ssspFrom(triples, roots, maxIter = 8,
        localFinishEdges = 0L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(keyed == dist)
  }

  test("ssspPathsFrom: reroute, fewest-hops preference, diamond tie-break, multi-root") {
    // reroute: direct a→c costs 5, a→b→c costs 2 — the path follows
    // the lighter two-hop route (the case hop-BFS paths cannot express)
    val reroute = Seq(("a", "c", 5L), ("a", "b", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "w")
    val p1 = GraphOps.ssspPathsFrom(reroute, Seq("a").toDF("id"), maxIter = 5)
      .collect().map(r => r.getString(1) -> (r.getDouble(2), r.getString(3))).toMap
    assert(p1("c") == (2.0, "a>b>c") && p1("b") == (1.0, "a>b"))
    // fewest-hops preference: a→c direct costs 2, a→b→c also costs 2 —
    // the 1-hop path is accepted first and the later equal-weight
    // candidate never replaces it (strict-improvement acceptance)
    val hops = Seq(("a", "c", 2L), ("a", "b", 1L), ("b", "c", 1L))
      .toDF("src", "dst", "w")
    val p2 = GraphOps.ssspPathsFrom(hops, Seq("a").toDF("id"), maxIter = 5)
      .collect().map(r => r.getString(1) -> r.getString(3)).toMap
    assert(p2("c") == "a>c")
    // diamond: two tied minimal-weight 2-hop paths — the within-round
    // struct-min keeps the lexicographically smaller path string
    val diamond = Seq(("a", "b1", 1L), ("a", "b2", 1L), ("b1", "c", 1L),
      ("b2", "c", 1L)).toDF("src", "dst", "w")
    val p3 = GraphOps.ssspPathsFrom(diamond, Seq("a").toDF("id"), maxIter = 5)
      .collect().map(r => r.getString(1) -> (r.getDouble(2), r.getString(3))).toMap
    assert(p3("c") == (2.0, "a>b1>c"))
    // multi-root: one keyed frontier, per-root results match per-root
    // runs; dist agrees with ssspFrom on every (root, id) pair
    val rnd = new scala.util.Random(47)
    val g = Seq.fill(80)((s"v:${rnd.nextInt(15)}", s"v:${rnd.nextInt(15)}",
        (rnd.nextInt(3) + 1).toLong))
      .filter(t => t._1 != t._2).distinct.toDF("src", "dst", "w")
    val roots = Seq("v:0", "v:7").toDF("id")
    val keyed = GraphOps.ssspPathsFrom(g, roots, maxIter = 8)
    val dists = GraphOps.ssspFrom(g, roots, maxIter = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val got = keyed.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getString(3)))
      .toMap
    assert(got.keySet == dists.keySet)
    got.foreach { case (k, (d, path)) =>
      assert(d == dists(k), s"dist mismatch at $k")
      // the path must be a genuine walk of that exact weight
      val hopsArr = path.split(">")
      assert(hopsArr.head == k._1 && hopsArr.last == k._2)
      // parallel edges can carry different weights — a minimal path
      // always rides the lightest one
      val wmap = g.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      val pw = hopsArr.sliding(2).filter(_.length == 2)
        .map(p => wmap((p(0), p(1))).toDouble).sum
      assert(pw == d, s"path $path costs $pw, state says $d")
    }
    // zero/negative weights refuse loudly (the sssp probe)
    intercept[IllegalArgumentException](GraphOps.ssspPathsFrom(
      Seq(("a", "b", 0L)).toDF("src", "dst", "w"), Seq("a").toDF("id")))
  }

  test("CALL graft.shortestPath: weighted path extraction through the GDS surface") {
    val nodes = Seq("a", "b", "c").map(i => (i, "N")).toDF("id", "label")
      .withColumn("props", map())
    val edges = Seq(("a", "c", "5"), ("a", "b", "1"), ("b", "c", "1"))
      .toDF("src", "dst", "cost")
      .withColumn("etype", lit("E"))
      .withColumn("props", map(lit("cost"), col("cost"))).drop("cost")
    val got = CypherCall.run(nodes, edges,
      """CALL graft.shortestPath({sourceNodes: 'a', weightProperty: 'cost'})
        |YIELD root, id, distance, path ORDER BY id""".stripMargin)
      .collect().map(r => r.getString(1) -> (r.getDouble(2), r.getString(3))).toMap
    assert(got("c") == (2.0, "a>b>c"))
    assert(got("b") == (1.0, "a>b"))
    assert(got("a") == (0.0, "a"))
    // no weightProperty: hop-count weights (w = 1), direct edge wins
    val hop = CypherCall.run(nodes, edges,
      """CALL graft.shortestPath({sourceNodes: 'a'})
        |YIELD id, distance, path WHERE id = 'c' RETURN distance, path""".stripMargin)
      .collect()
    assert(hop.length == 1 && hop(0).getDouble(0) == 1.0 && hop(0).getString(1) == "a>c")
    // a typo'd weight property is loud, not silent hop fallback
    intercept[IllegalArgumentException](CypherCall.run(nodes, edges,
      "CALL graft.shortestPath({sourceNodes: 'a', weightProperty: 'nope'}) YIELD id"))
  }

  test("weighted closeness: hand-computed star and CALL-surface dispatch") {
    // undirected star, spokes weighted 2: closeness(hub) = 3/(2+2+2);
    // closeness(spoke) = 3/(2+4+4)
    val star0 = Seq(("h", "x", 2L), ("h", "y", 2L), ("h", "z", 2L))
      .toDF("src", "dst", "w")
    val star = star0.unionByName(
      star0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val roots = Seq("h", "x", "y", "z").toDF("id")
    val c = bMap(GraphOps.closeness(star, roots, maxIter = 5, weightCol = Some("w")))
    assert(c("h") == 0.5)
    assert(c("x") == 0.3 && c("y") == 0.3 && c("z") == 0.3)
    // unweighted twin for contrast: hub 3/3 = 1.0
    val cu = bMap(GraphOps.closeness(star.select(col("src"), col("dst")), roots,
      maxIter = 5))
    assert(cu("h") == 1.0)
    // CALL surface: closeness with relationshipWeightProperty ≡ direct
    val nodes = Seq("h", "x", "y", "z").map(i => (i, "N")).toDF("id", "label")
      .withColumn("props", map())
    val edges = star.withColumn("etype", lit("E"))
      .withColumn("props", map(lit("cost"), col("w").cast("string")))
      .drop("w")
    val called = CypherCall.run(nodes, edges,
      """CALL graft.closeness({relationshipWeightProperty: 'cost'})
        |YIELD id, score ORDER BY id""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(called == c)
    // and weighted betweenness through CALL ≡ direct API
    val wb = CypherCall.run(nodes, edges,
      """CALL graft.betweenness({relationshipWeightProperty: 'cost'})
        |YIELD id, score ORDER BY id""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val direct = bMap(GraphOps.betweenness(star, roots, maxIter = 20,
      halve = false, weightCol = Some("w")))
    assert(wb == direct)
  }
}
