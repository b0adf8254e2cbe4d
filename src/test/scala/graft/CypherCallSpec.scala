package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.{CypherCall, CypherLite, GraphOps}

/** J7 — the GDS-style CALL procedure surface: every textual CALL must
  * produce exactly what the direct Scala API produces (CALL is a
  * parser, not a second engine), the YIELD/WHERE/RETURN tail must
  * compose with the Cypher expression machinery, and typos must fail
  * loudly (unknown procedure / config key / yield column). */
class CypherCallSpec extends SparkSpec {
  import spark.implicits._

  /** Two triangles bridged by one edge, plus one isolated Host node —
    * enough structure for communities, triangles, components, and
    * label/type selection. */
  private lazy val (nodes, edges) = {
    val n = Seq(
      ("a", "Process"), ("b", "Process"), ("c", "Process"),
      ("x", "Ip"), ("y", "Ip"), ("z", "Ip"), ("lone", "Host"))
      .toDF("id", "label")
      .withColumn("props", map(lit("k"), col("id")))
    val e = Seq(
      ("a", "b", "SPAWNS"), ("b", "c", "SPAWNS"), ("c", "a", "SPAWNS"),
      ("x", "y", "CONNECTED_TO"), ("y", "z", "CONNECTED_TO"), ("z", "x", "CONNECTED_TO"),
      ("c", "x", "CONNECTED_TO"))
      .toDF("src", "dst", "etype")
      .withColumn("props", map(lit("weight"), lit("2")))
    (n, e)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("pageRank CALL ≡ direct API, with YIELD rename + ORDER BY + LIMIT") {
    val direct = GraphOps.pageRank(
        GraphOps.undirected(edges.select(col("src"), col("dst"))), iters = 5)
      .select(col("id").as("node"), round(col("rank"), 6).as("pr"))
      .orderBy(col("pr").desc, col("node")).limit(4)
    val called = CypherLite.run(nodes, edges,
      """CALL graft.pageRank({maxIterations: 5, orientation: 'UNDIRECTED'})
        |YIELD id AS node, score
        |RETURN node, round(score, 6) AS pr ORDER BY pr DESC, node LIMIT 4""".stripMargin)
    assert(rows(called) == rows(direct))
  }

  test("articleRank CALL ≡ direct API; differs from pageRank on " +
      "degree-skewed graphs (r16)") {
    val direct = GraphOps.articleRank(
        GraphOps.undirected(edges.select(col("src"), col("dst"))), iters = 5)
      .select(col("id"), round(col("rank"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
    val called = CypherCall.run(nodes, edges,
      """CALL graft.articleRank({maxIterations: 5, orientation: 'UNDIRECTED'})
        |YIELD id, score RETURN id, round(score, 6) AS score
        |ORDER BY score DESC, id""".stripMargin)
    assert(rows(called) == rows(direct))
    // the avg-degree divisor must actually bite: scores are NOT the
    // pageRank scores on this degree-skewed fixture
    val pr = CypherCall.run(nodes, edges,
      """CALL graft.pageRank({maxIterations: 5, orientation: 'UNDIRECTED'})
        |YIELD id, score RETURN id, round(score, 6) AS score
        |ORDER BY score DESC, id""".stripMargin)
    assert(rows(called) != rows(pr))
  }

  test("dag.longestPath CALL ≡ direct API on a DAG projection; weight " +
      "from props (r16)") {
    // the SPAWNS triangle is a cycle — project the acyclic subset via
    // relationshipTypes plus the bridge: c→x→(y,z) after dropping the
    // closing z→x edge with a dst filter is not expressible, so build
    // a dedicated DAG fixture instead
    val n = Seq("p", "q", "r", "t").toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val e = Seq(("p", "q", "2"), ("p", "r", "5"), ("q", "t", "4"), ("r", "t", "1"))
      .toDF("src", "dst", "w0")
      .withColumn("etype", lit("T"))
      .withColumn("props", map(lit("weight"), col("w0"))).drop("w0")
    val direct = GraphOps.dagLongestPath(
        e.select(col("src"), col("dst"),
          element_at(col("props"), "weight").cast("double").as("w")),
        weightCol = Some("w"))
      .select(col("id"), col("dist").as("distance"), col("path"))
      .orderBy(col("id"))
    val called = CypherCall.run(n, e,
      """CALL graft.dag.longestPath({relationshipWeightProperty: 'weight'})
        |YIELD id, distance, path RETURN id, distance, path ORDER BY id""".stripMargin)
    assert(rows(called) == rows(direct))
    // p→q→t = 6 beats p→r→t = 6? no: 2+4=6 vs 5+1=6 — tie, lex-min
    val m = called.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(m("t") == "p>q>t")
  }

  test("modularityOptimization CALL ≡ direct API (r16)") {
    val direct = GraphOps.modularityOptimization(
        GraphOps.undirected(edges.select(col("src"), col("dst"))),
        maxIterations = 5)
      .select(col("id"), col("community").as("communityId"))
      .orderBy(col("id"))
    val called = CypherCall.run(nodes, edges,
      """CALL graft.modularityOptimization({maxIterations: 5, orientation: 'UNDIRECTED'})
        |YIELD id, communityId RETURN id, communityId ORDER BY id""".stripMargin)
    assert(rows(called) == rows(direct))
    // each fixture triangle collapses into one community
    val m = called.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("a", "b", "c").map(m).distinct.size == 1)
    assert(Seq("x", "y", "z").map(m).distinct.size == 1)
  }

  test("pageRank sourceNodes config = personalized pageRank") {
    val seeds = Seq("a").toDF("id")
    val direct = GraphOps.personalizedPageRank(
        edges.select(col("src"), col("dst")), seeds, iters = 5)
      .select(col("id"), round(col("rank"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
    val called = CypherCall.run(nodes, edges,
      """CALL graft.pageRank({maxIterations: 5, sourceNodes: ['a']})
        |YIELD id, score RETURN id, round(score, 6) AS score
        |ORDER BY score DESC, id""".stripMargin)
    assert(rows(called) == rows(direct))
  }

  test("wcc: componentId rename; the bridged triangles are one component") {
    val out = CypherCall.run(nodes, edges,
      "CALL graft.wcc YIELD id, componentId ORDER BY id")
    assert(out.columns.toSeq == Seq("id", "componentId"))
    val comps = out.collect().map(r => r.getString(0) -> r.get(1).toString).toMap
    assert(comps.values.toSet.size == 1) // c—x bridges the triangles
    assert(comps.keySet == Set("a", "b", "c", "x", "y", "z"))
  }

  test("relationshipType + nodeLabel selection: SPAWNS among Processes only") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.degree({relationshipType: 'SPAWNS', nodeLabel: 'Process'})
        |YIELD id, degree ORDER BY id""".stripMargin)
    // each triangle vertex: one out + one in SPAWNS edge
    assert(rows(out) == Seq(Seq("a", 2L), Seq("b", 2L), Seq("c", 2L)))
  }

  test("triangleCount finds both triangles; the bridge adds none") {
    val out = CypherCall.run(nodes, edges,
      "CALL graft.triangleCount YIELD id, triangles ORDER BY id")
    assert(rows(out) == Seq("a", "b", "c", "x", "y", "z").map(Seq(_, 1L)))
  }

  test("tail WHERE + aggregate RETURN over yielded rows") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.louvain YIELD id, communityId
        |WHERE id <> 'zzz'
        |RETURN communityId, count(*) AS members
        |ORDER BY members DESC, communityId""".stripMargin)
    // two 3-cliques → two communities of 3
    assert(rows(out).map(_(1)) == Seq(3L, 3L))
  }

  test("leiden over the two-clique graph matches louvain here (both connected)") {
    val l1 = CypherCall.run(nodes, edges,
      "CALL graft.leiden YIELD id, communityId ORDER BY id")
    val l2 = CypherCall.run(nodes, edges,
      "CALL graft.louvain YIELD id, communityId ORDER BY id")
    assert(rows(l1) == rows(l2))
  }

  test("sssp: weightProperty + UNDIRECTED keeps weights through symmetrization") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.sssp({sourceNodes: ['a'], weightProperty: 'weight',
        |                 orientation: 'UNDIRECTED'})
        |YIELD id, distance ORDER BY id""".stripMargin)
    // every edge has weight 2; a→b 2, a→c 2, a→x 4 (via c), …
    val d = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d("a") == 0.0 && d("b") == 2.0 && d("c") == 2.0 && d("x") == 4.0)
    assert(d("y") == 6.0 && d("z") == 6.0)
  }

  test("betweenness on a path graph ≡ direct API") {
    val pathEdges = Seq(("p1", "p2"), ("p2", "p3"), ("p3", "p4"))
      .toDF("src", "dst")
    val pn = Seq("p1", "p2", "p3", "p4").toDF("id")
      .withColumn("label", lit("N")).withColumn("props", map())
    val sym = GraphOps.undirected(pathEdges)
    val direct = GraphOps.betweenness(sym,
        sym.select(col("src").as("id")).distinct(),
        halve = true, undirectedInput = true)
      .select(col("id"), col("betweenness").as("score")).orderBy(col("id"))
    val called = CypherCall.run(pn, pathEdges,
      """CALL graft.betweenness({orientation: 'UNDIRECTED', undirectedInput: true})
        |YIELD id, score ORDER BY id""".stripMargin)
    assert(rows(called) == rows(direct))
  }

  test("betweenness samplingSize: deterministic hash-ordered root sample " +
      "≡ direct API on the same roots; full-size ≡ full-root (r14)") {
    val pathEdges = Seq(("p1", "p2"), ("p2", "p3"), ("p3", "p4"), ("p4", "p5"))
      .toDF("src", "dst")
    val pn = Seq("p1", "p2", "p3", "p4", "p5").toDF("id")
      .withColumn("label", lit("N")).withColumn("props", map())
    val sym = GraphOps.undirected(pathEdges)
    def called(k: Int) = CypherCall.run(pn, pathEdges,
      s"""CALL graft.betweenness({orientation: 'UNDIRECTED',
         |undirectedInput: true, samplingSize: $k})
         |YIELD id, score ORDER BY id""".stripMargin)
    // the sample is the k smallest (xxhash64(id), id) vertices — replay
    // it directly and the CALL must match exactly
    def sample(k: Int) = sym.select(col("src").as("id")).distinct()
      .orderBy(xxhash64(col("id").cast("string")), col("id").cast("string"))
      .limit(k)
    for (k <- Seq(2, 3)) {
      val direct = GraphOps.betweenness(sym, sample(k),
          halve = true, undirectedInput = true)
        .select(col("id"), col("betweenness").as("score")).orderBy(col("id"))
      assert(rows(called(k)) == rows(direct), s"samplingSize $k diverged")
    }
    // samplingSize = |V| degenerates to the full-root run
    val full = GraphOps.betweenness(sym,
        sym.select(col("src").as("id")).distinct(),
        halve = true, undirectedInput = true)
      .select(col("id"), col("betweenness").as("score")).orderBy(col("id"))
    assert(rows(called(5)) == rows(full))
    // deterministic: identical rerun; loud on conflicts and bad sizes
    assert(rows(called(2)) == rows(called(2)))
    intercept[IllegalArgumentException](CypherCall.run(pn, pathEdges,
      "CALL graft.betweenness({samplingSize: 2, sourceNodes: ['p1']}) YIELD id, score"))
    intercept[IllegalArgumentException](CypherCall.run(pn, pathEdges,
      "CALL graft.betweenness({samplingSize: 0}) YIELD id, score"))
  }

  test("harmonic with sourceNodes restricts the root set") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.harmonic({sourceNodes: ['a'], orientation: 'UNDIRECTED'})
        |YIELD id, score""".stripMargin)
    assert(rows(out).map(_.head) == Seq("a"))
  }

  test("kCore: k required, peels the bridge-degree vertices correctly") {
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges, "CALL graft.kCore YIELD id, degree")
    }
    assert(err.getMessage.contains("'k' is required"))
    val out = CypherCall.run(nodes, edges,
      "CALL graft.kCore({k: 2}) YIELD id, degree ORDER BY id")
    // both triangles survive 2-core (the c—x bridge raises c,x to 3 but
    // the core is about the induced subgraph: all 6 stay)
    assert(rows(out).map(_.head) == Seq("a", "b", "c", "x", "y", "z"))
  }

  test("fastRP: embeddingDimension honored, isolated node embedded via nodes frame") {
    val out = CypherCall.run(nodes, edges,
      "CALL graft.fastRP({embeddingDimension: 8}) YIELD id, embedding")
    val m = out.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(m.keySet == Set("a", "b", "c", "x", "y", "z", "lone"))
    assert(m.values.forall(_.length == 8))
  }

  test("nodeSimilarity: cutoff config, GDS yield names") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.nodeSimilarity({similarityCutoff: 0.3})
        |YIELD id1, id2, similarity ORDER BY id1, id2""".stripMargin)
    assert(out.columns.toSeq == Seq("id1", "id2", "similarity"))
    assert(out.count() > 0) // a,b,c share out-neighborhoods in the triangle
  }

  test("scc on the directed 3-cycle") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.scc({relationshipType: 'SPAWNS'})
        |YIELD id, componentId ORDER BY id""".stripMargin)
    val comps = out.collect().map(r => r.get(1).toString).toSet
    assert(comps.size == 1) // a→b→c→a is one SCC
  }

  test("bfs: sourceNodes required, dist matches hop count") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.bfs({sourceNodes: ['a'], orientation: 'UNDIRECTED'})
        |YIELD id, dist ORDER BY dist, id""".stripMargin)
    val d = out.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(d("a") == 0 && d("b") == 1 && d("x") == 2 && d("y") == 3)
  }

  test("review regressions: typed seeds, underscore aliases, quoted spaces, sssp typo") {
    // Long-id graph: string sourceNodes must cast to the edge id type
    // so the local finisher's exact-equality lookups hit
    val le = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val ln = Seq(1L, 2L, 3L, 4L).toDF("id")
      .withColumn("label", lit("N")).withColumn("props", map())
    val d = CypherCall.run(ln, le,
      "CALL graft.bfs({sourceNodes: [1]}) YIELD id, dist ORDER BY dist")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    // an alias with a keyword suffix must not split the scan
    val al = CypherCall.run(nodes, edges,
      "CALL graft.degree YIELD id, degree AS deg_limit ORDER BY id LIMIT 2")
    assert(al.columns.toSeq == Seq("id", "deg_limit") && al.count() == 2)
    // whitespace inside a quoted literal survives normalization
    val sn = Seq(("sp", "Big  Label"), ("oth", "Other")).toDF("id", "label")
      .withColumn("props", map())
    val se = Seq(("sp", "oth", "T"), ("oth", "sp", "T")).toDF("src", "dst", "etype")
    val only = CypherCall.run(sn, se,
      "CALL graft.degree({nodeLabel: 'Big  Label'}) YIELD id, degree")
    assert(only.count() == 0) // no edge has BOTH endpoints in that label
    val both = CypherCall.run(sn, se, "CALL graft.degree YIELD id, degree")
    assert(both.count() == 2) // but the graph itself is intact
    // sssp weightProperty typo: loud, never null distances
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.sssp({sourceNodes: ['a'], weightProperty: 'wieght'}) YIELD id, distance")
    }
    assert(err.getMessage.contains("missing or non-numeric"))
  }

  test("loud failures: unknown procedure, unknown config key, bad YIELD column") {
    val e1 = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges, "CALL graft.pagerank YIELD id, score")
    }
    assert(e1.getMessage.contains("unknown procedure"))
    assert(e1.getMessage.contains("pageRank")) // the list helps the typo
    val e2 = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.pageRank({dampeningFactor: 0.9}) YIELD id, score")
    }
    assert(e2.getMessage.contains("dampeningFactor"))
    assert(e2.getMessage.contains("dampingFactor")) // allowed keys listed
    val e3 = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges, "CALL graft.wcc YIELD id, score")
    }
    assert(e3.getMessage.contains("componentId"))
  }

  test("CALL … YIELD composes with a MATCH stage (GDS idiom)") {
    // degree scores joined back into graph patterns: for each SPAWNS
    // source, carry its degree into the pattern match
    val out = CypherCall.run(nodes, edges,
      """CALL graft.degree YIELD id, degree
        |MATCH (id)-[:SPAWNS]->(x)
        |RETURN id, degree, x ORDER BY id, x""".stripMargin)
    assert(out.columns.toSeq == Seq("id", "degree", "x"))
    val rows0 = out.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // a, b, c each have one SPAWNS out-edge; degrees: a=2(S), b=2, c=3(+bridge)
    assert(rows0.map(t => (t._1, t._3)).toSeq ==
      Seq(("a", "b"), ("b", "c"), ("c", "a")))
    assert(rows0.map(t => t._1 -> t._2).toMap.apply("c") == 3L)
    // WHERE over yielded columns before the MATCH continuation
    val filtered = CypherCall.run(nodes, edges,
      """CALL graft.degree YIELD id, degree
        |WHERE degree >= 3
        |MATCH (id)-[:CONNECTED_TO]->(y)
        |RETURN id, y ORDER BY id, y""".stripMargin)
    // degree ≥ 3: c and x (bridge endpoints); c→x, x→y
    assert(filtered.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("c", "x"), ("x", "y")))
    // the continuation supports the full grammar (aggregation here)
    val agg = CypherCall.run(nodes, edges,
      """CALL graft.wcc YIELD id, componentId
        |MATCH (id)-[:CONNECTED_TO]->(z)
        |RETURN componentId, count(*) AS n""".stripMargin)
    assert(agg.collect().map(r => r.getLong(1)).sum == 4) // 4 CONNECTED_TO edges
  }

  test("relationshipWeightProperty resolves from the edge props map") {
    // fixture edges carry props = {weight: '2'}: weighted pageRank
    // with uniform weight 2 ≡ unweighted (contributions rank·2/Σ2)
    val w = CypherCall.run(nodes, edges,
      """CALL graft.pageRank({maxIterations: 5, relationshipWeightProperty: 'weight'})
        |YIELD id, score RETURN id, round(score, 9) AS score ORDER BY id""".stripMargin)
    val u = CypherCall.run(nodes, edges,
      """CALL graft.pageRank({maxIterations: 5})
        |YIELD id, score RETURN id, round(score, 9) AS score ORDER BY id""".stripMargin)
    assert(rows(w) == rows(u))
    // missing property: loud, never a silently zeroed graph
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.louvain({relationshipWeightProperty: 'nope'}) YIELD id, communityId")
    }
    assert(err.getMessage.contains("missing or non-numeric"))
    // an EXISTING weight column gets the same loud probe: a null (or a
    // value the double cast nulls) must not silently drop that edge
    val eNullW = edges.withColumn("cost",
      when(col("src") === "c" && col("dst") === "x", lit(null).cast("string"))
        .otherwise(lit("1.5")))
    val err2 = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, eNullW,
        "CALL graft.pageRank({relationshipWeightProperty: 'cost'}) YIELD id, score")
    }
    assert(err2.getMessage.contains("null or non-numeric"))
    // and a fully populated existing column still resolves fine
    val ok = CypherCall.run(nodes, edges.withColumn("cost", lit("1.5")),
      """CALL graft.pageRank({maxIterations: 3, relationshipWeightProperty: 'cost'})
        |YIELD id, score""".stripMargin)
    assert(ok.count() == 6L)
    // the probe runs on the PROJECTED edge set (review r9): a null
    // weight on an edge EXCLUDED by relationshipType must not abort
    val eMixed = edges.withColumn("cost",
      when(col("etype") === "SPAWNS", lit("2")).otherwise(lit(null).cast("string")))
    val sel = CypherCall.run(nodes, eMixed,
      """CALL graft.pageRank({maxIterations: 3, relationshipTypes: ['SPAWNS'],
        |relationshipWeightProperty: 'cost'}) YIELD id, score""".stripMargin)
    assert(sel.count() == 3L) // the a-b-c triangle only
    // …while a null INSIDE the projection still refuses
    intercept[IllegalArgumentException] {
      CypherCall.run(nodes, eMixed,
        """CALL graft.pageRank({maxIterations: 3, relationshipTypes: ['CONNECTED_TO'],
          |relationshipWeightProperty: 'cost'}) YIELD id, score""".stripMargin)
    }
  }

  test("eigenvector and hits procedures dispatch with GDS yield names") {
    val ev = CypherCall.run(nodes, edges,
      """CALL graft.eigenvector({maxIterations: 5})
        |YIELD id, score ORDER BY score DESC, id LIMIT 3""".stripMargin)
    assert(ev.columns.toSeq == Seq("id", "score") && ev.count() == 3)
    val ht = CypherCall.run(nodes, edges,
      "CALL graft.hits YIELD id, hub, auth ORDER BY id")
    assert(ht.columns.toSeq == Seq("id", "hub", "auth"))
    assert(ht.count() == 6) // the seven fixture nodes minus isolated 'lone'
  }

  test("gate equivalence: g_call (textual) ≡ g_pagerank (Scala API) on testdata") {
    val called = graft.operators.GraphQueries.gCall(spark, sf)
    val direct = graft.operators.GraphQueries.gPagerank(spark, sf)
    assert(rows(called) == rows(direct))
    assert(called.columns.toSeq == direct.columns.toSeq)
  }

  test("yens CALL ≡ direct kShortestPaths, weightProperty resolves from props") {
    // unweighted: hop ranking on the bridged triangles (a..c, x..z)
    val direct = GraphOps.kShortestPaths(
      edges.select(col("src"), col("dst")).withColumn("w", lit(1L)),
      "a", "x", k = 3, maxHops = 5, weightCol = Some("w"))
    val called = CypherCall.run(nodes, edges,
      """CALL graft.yens({sourceNode: 'a', targetNode: 'x', k: 3, maxHops: 5})
        |YIELD rank, dist, hops, path RETURN rank, dist, hops, path
        |ORDER BY rank""".stripMargin)
    assert(rows(called) == rows(direct) && called.count() > 0)
    // weightProperty: every edge weighs 2 => dist = 2 * hops
    val w = CypherCall.run(nodes, edges,
      """CALL graft.yens({sourceNode: 'a', targetNode: 'x', k: 3, maxHops: 5,
        |weightProperty: 'weight'})
        |YIELD rank, dist, hops RETURN rank, dist, hops ORDER BY rank""".stripMargin)
      .collect()
    assert(w.nonEmpty && w.forall(r =>
      r.getDouble(1) == 2.0 * r.getLong(2)))
    // loud: missing sourceNode
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.yens({targetNode: 'x'}) YIELD rank RETURN rank")
    }
    assert(err.getMessage.contains("sourceNode"))
  }

  test("wcc relationshipWeightProperty + threshold prune edges; pruned-" +
      "isolated vertices stay as singletons (r14)") {
    // every fixture edge weighs 2: threshold 1 keeps the graph intact,
    // threshold 5 prunes everything — each vertex becomes a singleton
    val base = CypherCall.run(nodes, edges,
      "CALL graft.wcc({}) YIELD id, componentId RETURN id, componentId ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val kept = CypherCall.run(nodes, edges,
      "CALL graft.wcc({relationshipWeightProperty: 'weight', threshold: 1.0}) " +
        "YIELD id, componentId RETURN id, componentId ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(kept == base)
    val pruned = CypherCall.run(nodes, edges,
      "CALL graft.wcc({relationshipWeightProperty: 'weight', threshold: 5.0}) " +
        "YIELD id, componentId RETURN id, componentId ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(pruned.size == base.size && pruned.forall { case (v, c) => v == c })
    // loud: threshold without a weight
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.wcc({threshold: 1.0}) YIELD id RETURN id")
    }
    assert(err.getMessage.contains("relationshipWeightProperty"))
  }

  test("wcc: threshold gates on VALUE, not key presence — bare weight " +
      "property and explicit threshold 0.0 both leave edges unpruned (r16)") {
    // a—b weighs 0: GDS's own gate is threshold > 0, so spelling the
    // 0.0 default explicitly must be identical to omitting the key
    // (r15 advice — key-presence gating made them diverge)
    val e0 = Seq(("a", "b", "T", "0"), ("b", "c", "T", "2"))
      .toDF("src", "dst", "etype", "w0")
      .withColumn("props", map(lit("weight"), col("w0"))).drop("w0")
    val n0 = Seq("a", "b", "c").toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    def comps(call: String): Array[(String, String)] = CypherCall.run(n0, e0,
      s"CALL graft.wcc($call) YIELD id, componentId " +
        "RETURN id, componentId ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bare = comps("{relationshipWeightProperty: 'weight'}")
    assert(bare.map(_._2).distinct.length == 1, "one component — nothing pruned")
    val zero = comps("{relationshipWeightProperty: 'weight', threshold: 0.0}")
    assert(zero.sameElements(bare),
      "explicit threshold 0.0 ≡ omitted (the documented default)")
    val pos = comps("{relationshipWeightProperty: 'weight', threshold: 1.0}")
      .toMap
    assert(pos("a") != pos("b"), "threshold 1.0 prunes the 0-weight edge")
    assert(pos("b") == pos("c"), "the weight-2 edge survives")
  }

  test("shortestPath accepts GDS's singular sourceNode + targetNode filter; " +
      "shortestPath.dijkstra single-pair spelling runs verbatim (r15)") {
    val viaPlural = CypherCall.run(nodes, edges,
      "CALL graft.shortestPath({sourceNodes: ['a']}) " +
        "YIELD root, id, distance, path RETURN id, distance, path ORDER BY id")
    val viaSingular = CypherCall.run(nodes, edges,
      "CALL graft.shortestPath({sourceNode: 'a'}) " +
        "YIELD root, id, distance, path RETURN id, distance, path ORDER BY id")
    assert(rows(viaSingular) == rows(viaPlural))
    // the GDS single-pair call a user migrates verbatim: one row, the
    // target's distance/path from the full one-source run
    val pair = CypherCall.run(nodes, edges,
      "CALL graft.shortestPath.dijkstra({sourceNode: 'a', targetNode: 'y'}) " +
        "YIELD id, distance, path RETURN id, distance, path")
      .collect()
    assert(pair.length == 1 && pair(0).getString(0) == "y")
    assert(rows(viaPlural).exists(r => r(0) == "y" && r(1) == pair(0).get(1)))
    // both seed spellings at once stays loud
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.shortestPath({sourceNodes: ['a'], sourceNode: 'b'}) YIELD id RETURN id")
    }
    assert(err.getMessage.contains("not both"))
  }

  test("modularity CALL: per-community Q sums to the global Newman Q (r14)") {
    // the two triangles as communities; the c—x bridge is the only
    // inter-community edge
    val n2 = Seq(("a", "1"), ("b", "1"), ("c", "1"), ("x", "2"),
      ("y", "2"), ("z", "2")).toDF("id", "cm")
      .select(col("id"), lit("P").as("label"),
        map(lit("community"), col("cm")).as("props"))
    val got = CypherCall.run(n2, edges,
      "CALL graft.modularity({communityProperty: 'community', " +
        "orientation: 'UNDIRECTED'}) YIELD communityId, modularity " +
        "RETURN communityId, modularity ORDER BY communityId")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("1", "2"))
    val globalQ = GraphOps.modularity(
      GraphOps.undirected(edges.select(col("src"), col("dst"))),
      Seq(("a", "1"), ("b", "1"), ("c", "1"), ("x", "2"), ("y", "2"),
        ("z", "2")).toDF("id", "community"))
    assert(math.abs(got.values.sum - globalQ) < 1e-6,
      s"sum ${got.values.sum} != global $globalQ")
    // hand value: 7 undirected edges, m2 = 14; community 1 has
    // in = 6 (3 edges both ways), tot = 7 → 6/14 − (7/14)² = 0.178571
    assert(math.abs(got("1") - (6.0 / 14 - 0.25)) < 1e-5)
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(n2, edges, "CALL graft.modularity({}) YIELD communityId " +
        "RETURN communityId")
    }
    assert(err.getMessage.contains("communityProperty"))
  }

  test("localClusteringCoefficient CALL: hand-computed coefficients (r14)") {
    val got = CypherCall.run(nodes, edges,
      "CALL graft.localClusteringCoefficient({}) YIELD id, " +
        "localClusteringCoefficient AS c RETURN id, round(c, 4) AS c ORDER BY id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // triangle corners: 1.0; the bridge endpoints c/x have deg 3 and
    // one closed wedge of three: 2·1/(3·2) = 1/3; lone has no edges
    assert(got == Map("a" -> 1.0, "b" -> 1.0, "y" -> 1.0, "z" -> 1.0,
      "c" -> 0.3333, "x" -> 0.3333))
  }

  test("kmeans CALL: FastRP-composed clustering, deterministic coverage (r14)") {
    val q = "CALL graft.kmeans({k: 2, maxIterations: 2}) YIELD id, " +
      "communityId, similarity RETURN id, communityId, similarity ORDER BY id"
    val got = CypherCall.run(nodes, edges, q).collect()
    // every node (incl. the isolated one — the nodes frame rides the
    // embed call) gets exactly one cluster in [0, k)
    assert(got.length == 7)
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 2))
    assert(got.map(_.getLong(1)).distinct.length == 2) // both clusters used
    // bit-identical rerun (hash init + deterministic Lloyd)
    val again = CypherCall.run(nodes, edges, q).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("GDS variant spellings alias to the single implementation (r14)") {
    // delta/dijkstra are Neo4j-internal ALGORITHM picks; the engine
    // has one scale-shaped shortest-path frontier — all spellings hit it
    val base = CypherCall.run(nodes, edges,
      "CALL graft.shortestPath({sourceNodes: 'a'}) YIELD root, id, distance, path " +
        "RETURN root, id, distance, path ORDER BY id")
    Seq("allShortestPaths.delta", "allShortestPaths.dijkstra",
        "shortestPath.dijkstra").foreach { alias =>
      val got = CypherCall.run(nodes, edges,
        s"CALL graft.$alias({sourceNodes: 'a'}) YIELD root, id, distance, path " +
          "RETURN root, id, distance, path ORDER BY id")
      assert(rows(got) == rows(base), s"alias $alias diverges")
    }
    // .stream strips BEFORE aliasing (the GDS full spelling works)
    val streamed = CypherCall.run(nodes, edges,
      "CALL graft.allShortestPaths.delta.stream({sourceNodes: 'a'}) " +
        "YIELD root, id, distance RETURN root, id, distance ORDER BY id")
    assert(streamed.count() == base.count())
    // shortestPath.yens routes to the yens proc (its own yield schema)
    val y = CypherCall.run(nodes, edges,
      "CALL graft.shortestPath.yens({sourceNode: 'a', targetNode: 'x', k: 2, " +
        "maxHops: 5}) YIELD rank, dist, hops, path RETURN rank ORDER BY rank")
    assert(y.count() > 0)
    // astar stays its own proc, never aliased away
    val known = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        "CALL graft.shortestPath.astar({}) YIELD root RETURN root")
    }
    assert(known.getMessage.contains("sourceNode")) // astar's OWN error
  }

  test("topologicalSort CALL ≡ direct API on a DAG projection") {
    // SPAWNS triangle is a cycle — excluded; select only the DAG-ish
    // CONNECTED_TO subgraph minus its triangle via relationshipType +
    // a fixture-specific check through the direct API instead
    import spark.implicits._
    val dagN = Seq(("r", "N"), ("s", "N"), ("t", "N"), ("u", "N"))
      .toDF("id", "label").withColumn("props", map())
    val dagE = Seq(("r", "s", "T"), ("s", "t", "T"), ("r", "t", "T"), ("t", "u", "T"))
      .toDF("src", "dst", "etype").withColumn("props", map())
    val direct = GraphOps.topologicalSort(dagE.select(col("src"), col("dst")))
      .orderBy(col("id"))
    val called = CypherCall.run(dagN, dagE,
      """CALL graft.topologicalSort({}) YIELD id, level
        |RETURN id, level ORDER BY id""".stripMargin)
    assert(rows(called) == rows(direct) && called.count() == 4)
    // requireDag raises on the cyclic SPAWNS subgraph
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, edges,
        """CALL graft.topologicalSort({relationshipType: 'SPAWNS',
          |requireDag: true}) YIELD id RETURN id""".stripMargin)
    }
    assert(err.getMessage.contains("cycle"))
  }

  test("knn CALL: FastRP -> top-k similarity edges, k bound per node") {
    val out = CypherCall.run(nodes, edges,
      """CALL graft.knn({topK: 2, embeddingDimension: 16, nbits: 1,
        |ntables: 4}) YIELD id1, id2, rank, similarity
        |RETURN id1, id2, rank ORDER BY id1, rank""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.nonEmpty)
    assert(out.groupBy(_._1).values.forall(_.size <= 2))
    assert(out.forall { case (a, b, _) => a != b })
  }

  test("randomWalk CALL ≡ direct API, config dispatch") {
    val direct = GraphOps.randomWalk(edges.select(col("src"), col("dst")),
        walksPerNode = 2, walkLength = 3, seed = 7L)
      .orderBy(col("walk_id"))
    val called = CypherCall.run(nodes, edges,
      """CALL graft.randomWalk({walksPerNode: 2, walkLength: 3, randomSeed: 7})
        |YIELD walk_id, start, steps, path
        |RETURN walk_id, start, steps, path ORDER BY walk_id""".stripMargin)
    assert(rows(called) == rows(direct) && called.count() > 0)
  }

  test("scaleProperties CALL: minMax over a numeric node property") {
    import spark.implicits._
    val sn = Seq(("a", "1"), ("b", "3"), ("c", "5")).map { case (i, v) =>
      (i, "N", Map("score" -> v))
    }.toDF("id", "label", "props")
    val se = Seq(("a", "b", "T")).toDF("src", "dst", "etype")
      .withColumn("props", map())
    val out = CypherCall.run(sn, se,
      """CALL graft.scaleProperties({nodeProperties: ['score'],
        |scaler: 'minMax'}) YIELD id, scaled RETURN id, scaled
        |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Double](1).toList))
    assert(out.toSeq == Seq(("a", List(0.0)), ("b", List(0.5)), ("c", List(1.0))))
    // missing property is loud
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(sn, se,
        "CALL graft.scaleProperties({nodeProperties: ['nope']}) YIELD id RETURN id")
    }
    assert(err.getMessage.contains("nope"))
  }

  test("spanningTree CALL: weight from props, sourceNode = that component's tree (r13)") {
    // two components: the Process 3-cycle and the Ip 3-cycle joined by
    // c→x; sourceNode 'a' keeps only a's component of the forest
    val forest = CypherCall.run(nodes, edges,
      "CALL graft.spanningTree({relationshipWeightProperty: 'weight'}) " +
        "YIELD src, dst, weight RETURN src, dst, weight ORDER BY src, dst")
    val direct = GraphOps.spanningTree(
        edges.withColumn("w", element_at(col("props"), "weight").cast("double")),
        Some("w"))
      .orderBy(col("src"), col("dst"))
      .select(col("src"), col("dst"), col("w").as("weight"))
    // 6 edge-bearing vertices ('lone' has no edges), one component → 5
    assert(rows(forest) == rows(direct) && forest.count() == 5)
    val fromA = CypherCall.run(nodes, edges,
      "CALL graft.spanningTree({sourceNode: 'c', relationshipType: 'SPAWNS'}) " +
        "YIELD src, dst RETURN src, dst ORDER BY src, dst")
    // SPAWNS-only projection: the a-b-c cycle → its unique 2-edge tree
    assert(rows(fromA).map(_.mkString(">")) == Seq("a>b", "a>c"))
  }

  test("steinerTree CALL: sourceNode + targetNodes required, weight from props (r13)") {
    val tree = CypherCall.run(nodes, edges,
      "CALL graft.steinerTree({sourceNode: 'a', targetNodes: ['c', 'y'], " +
        "relationshipWeightProperty: 'weight'}) " +
        "YIELD src, dst, weight RETURN src, dst ORDER BY src, dst")
    // directed graph: a→b→c→x→y; both targets ride the same chain
    assert(rows(tree).map(_.mkString(">")) ==
      Seq("a>b", "b>c", "c>x", "x>y"))
    intercept[IllegalArgumentException](CypherCall.run(nodes, edges,
      "CALL graft.steinerTree({targetNodes: ['c']})"))
    intercept[IllegalArgumentException](CypherCall.run(nodes, edges,
      "CALL graft.steinerTree({sourceNode: 'a'})"))
  }

  test("articulationPoints + bridges CALLs dispatch the cut pass (r13)") {
    // full graph: two cycles joined by the bridge c—x: APs = {c, x}
    val aps = CypherCall.run(nodes, edges,
      "CALL graft.articulationPoints({}) YIELD id RETURN id ORDER BY id")
    assert(rows(aps).map(_.head) == Seq("c", "x"))
    val brs = CypherCall.run(nodes, edges,
      "CALL graft.bridges({}) YIELD src, dst RETURN src, dst")
    assert(rows(brs) == Seq(Seq("c", "x")))
    // r14: the full block partition — two cycle components plus the
    // singleton bridge component, labels = min canonical edge key
    val bcc = CypherCall.run(nodes, edges,
      "CALL graft.biconnectedComponents({}) YIELD src, dst, component " +
        "RETURN src, dst, component")
    val byComp = rows(bcc).groupBy(_(2)).map { case (k, v) => k -> v.size }
    assert(byComp(("c|x")) == 1 && byComp.size == 3)
  }

  test("nodeSimilarity sourceNodeFilter/targetNodeFilter: label and id-list " +
      "spellings route to the filtered variant (r13)") {
    // co-out-neighbor graph: a,b both SPAWN/connect; use the full edge
    // frame — sources a and b share dst-sets partially
    val e2 = Seq(("a", "t1"), ("a", "t2"), ("b", "t1"), ("b", "t2"),
      ("c", "t1"), ("c", "t3")).toDF("src", "dst")
      .withColumn("etype", lit("T"))
      .withColumn("props", typedLit(Map.empty[String, String]))
    val n2 = Seq(("a", "Left"), ("b", "Right"), ("c", "Right"))
      .toDF("id", "label")
      .withColumn("props", typedLit(Map.empty[String, String]))
    // id-list spelling
    val byIds = CypherCall.run(n2, e2,
      "CALL graft.nodeSimilarity({similarityCutoff: 0.1, " +
        "sourceNodeFilter: ['a'], targetNodeFilter: ['b', 'c']}) " +
        "YIELD id1, id2, similarity RETURN id1, id2 ORDER BY id2")
    assert(rows(byIds) == Seq(Seq("a", "b"), Seq("a", "c")))
    // label spelling: a single string naming an existing label
    val byLabel = CypherCall.run(n2, e2,
      "CALL graft.nodeSimilarity({similarityCutoff: 0.1, " +
        "sourceNodeFilter: 'Left', targetNodeFilter: 'Right'}) " +
        "YIELD id1, id2, similarity RETURN id1, id2 ORDER BY id2")
    assert(rows(byLabel) == rows(byIds))
    // a non-label single string is an id filter, not an error
    val asId = CypherCall.run(n2, e2,
      "CALL graft.nodeSimilarity({similarityCutoff: 0.1, " +
        "sourceNodeFilter: 'b'}) YIELD id1, id2 RETURN id1, id2 ORDER BY id2")
    assert(rows(asId).forall(_.head == "b") && asId.count() > 0)
    // r14 (advice): a single string matching BOTH a label and a node id
    // is ambiguous and raises loudly; the list spelling forces id
    // semantics and keeps the collided node addressable
    val n3 = Seq(("a", "Left"), ("b", "Right"), ("Right", "Left"))
      .toDF("id", "label")
      .withColumn("props", typedLit(Map.empty[String, String]))
    val e3 = e2.unionByName(Seq(("Right", "t1"), ("Right", "t2"))
      .toDF("src", "dst").withColumn("etype", lit("T"))
      .withColumn("props", typedLit(Map.empty[String, String])))
    val ex = intercept[IllegalArgumentException](CypherCall.run(n3, e3,
      "CALL graft.nodeSimilarity({similarityCutoff: 0.1, " +
        "sourceNodeFilter: 'Right'}) YIELD id1, id2 RETURN id1, id2"))
    assert(ex.getMessage.contains("both a label and a node id"))
    val forced = CypherCall.run(n3, e3,
      "CALL graft.nodeSimilarity({similarityCutoff: 0.1, " +
        "sourceNodeFilter: ['Right']}) YIELD id1, id2 RETURN id1, id2 ORDER BY id2")
    assert(rows(forced).forall(_.head == "Right") && forced.count() > 0)
  }

  test("similarity CALL: hand-computed pairwise metrics over a vector " +
      "node property; per-metric GDS spellings alias; loud guards (r17)") {
    // va=(1,0) vb=(0,1) vd=(2,0) ve=(3,3); 'lone' carries no vec prop
    val n = Seq(
      ("a", "V", "1,0"), ("b", "V", "0,1"), ("d", "V", "2,0"),
      ("e", "V", "3,3"))
      .toDF("id", "label", "vec")
      .withColumn("props", map(lit("vec"), col("vec"))).drop("vec")
      .unionByName(Seq(("lone", "Host")).toDF("id", "label")
        .withColumn("props", map(lit("k"), col("id"))))
    val got = CypherCall.run(n, edges,
      "CALL graft.similarity({nodeProperty: 'vec'}) " +
        "YIELD node1, node2, cosine, euclidean, euclideanDistance, pearson " +
        "RETURN node1, node2, cosine, euclidean, euclideanDistance, pearson " +
        "ORDER BY node1, node2")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val s2 = math.sqrt(2.0)
    assert(got.size == 6, "4 vec-bearing nodes -> 6 pairs; lone excluded")
    // a-(1,0) vs b-(0,1): orthogonal, anti-correlated
    assert(got(("a", "b")) ==
      ((0.0, r4(1 / (1 + s2)), r4(s2), -1.0)))
    // a-(1,0) vs d-(2,0): parallel, perfectly correlated
    assert(got(("a", "d")) == ((1.0, r4(1.0 / 2.0), 1.0, 1.0)))
    // e-(3,3) has zero variance: pearson guards to 0; cos(a,e)=3/√18
    assert(got(("a", "e"))._1 == r4(3.0 / math.sqrt(18.0)))
    assert(got(("a", "e"))._4 == 0.0)
    // the per-metric GDS function spellings land on the proc
    val viaAlias = CypherCall.run(n, edges,
      "CALL graft.similarity.pearson({nodeProperty: 'vec'}) " +
        "YIELD node1, node2, pearson RETURN node1, node2, pearson " +
        "ORDER BY node1, node2")
    assert(viaAlias.columns.toSeq == Seq("node1", "node2", "pearson"))
    assert(viaAlias.count() == 6)
    // loud: non-numeric vector entry
    val bad = Seq(("a", "V", "1,oops")).toDF("id", "label", "vec")
      .withColumn("props", map(lit("vec"), col("vec"))).drop("vec")
    val e1 = intercept[IllegalArgumentException](CypherCall.run(bad, edges,
      "CALL graft.similarity({nodeProperty: 'vec'})").collect())
    assert(e1.getMessage.contains("non-numeric"))
    // loud: pairCap names the lever
    val e2 = intercept[IllegalArgumentException](CypherCall.run(n, edges,
      "CALL graft.similarity({nodeProperty: 'vec', pairCap: 2})").collect())
    assert(e2.getMessage.contains("pairCap"))
    // loud: the config key is required
    val e3 = intercept[IllegalArgumentException](CypherCall.run(n, edges,
      "CALL graft.similarity({})").collect())
    assert(e3.getMessage.contains("nodeProperty"))
  }

  test("CypherLite.run dispatches CALL, with $params substituted into config") {
    val out = CypherLite.run(nodes, edges,
      """CALL graft.pageRank.stream({maxIterations: $iters, orientation: 'UNDIRECTED'})
        |YIELD id, score WHERE score > $cut
        |RETURN id ORDER BY id""".stripMargin,
      Map("iters" -> 5, "cut" -> 0.0))
    assert(out.count() == 6)
  }
}
