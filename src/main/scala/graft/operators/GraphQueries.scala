package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Num
import graft.graph.{GraphOps, TestGraph}

/** Oracle-checkable graph queries (SURVEY §2 B1-B8) over the testdata-
  * derived graphs, plus the node/edge MERGE-semantics analogs (A3/A4).
  *
  * These exercise the same operator implementations
  * ([[graft.graph.GraphOps]]) that [[graft.graph.SysmonGraph]] queries
  * use on the reference's trace graphs.
  */
object GraphQueries {

  /** B1 — node lookup + property filter (Cypher `MATCH (c:Customer) WHERE …`). */
  def gLookup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_nationkey") === 3 && col("c_acctbal") > 1000)
      .select(concat(lit("c:"), col("c_custkey")).as("id"),
        col("c_name").as("name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("id"))

  /** B2 — fixed-length motif: (customer)-[:PLACED]->(order)-[:HAS]->
    * (lineitem)-[:OF_PART]->(part {p_size>40}); counts per customer. */
  def gMotif(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val p = broadcast(Tables.part(s, dir).filter(col("p_size") > 40))
    val c = broadcast(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_paths"), countDistinct(col("p_partkey")).as("n_parts"))
      .orderBy(col("c_custkey"))
  }

  /** B3 — variable-length traversal: BFS down the region→nation→customer
    * →order forest from region r:0; node count per depth. */
  def gTree(s: SparkSession, dir: String): DataFrame = {
    val src = s.range(1).select(lit("r:0").as("id"))
    GraphOps.bfs(TestGraph.hierarchyEdges(s, dir), src, maxIter = 10)
      .groupBy(col("dist")).agg(count(lit(1)).as("n"))
      .orderBy(col("dist"))
  }

  /** B4 — reachability with minimal hop count on the undirected
    * part—supplier graph from s:1. */
  def gReach(s: SparkSession, dir: String): DataFrame = {
    val src = s.range(1).select(lit("s:1").as("id"))
    val edges = GraphOps.undirected(TestGraph.partSupplierEdges(s, dir))
    GraphOps.bfs(edges, src, maxIter = 8)
      .groupBy(col("dist")).agg(count(lit(1)).as("n"))
      .orderBy(col("dist"))
  }

  /** B5 — connected components of the part—supplier graph: component
    * representative (min id) + size, largest first. */
  def gCc(s: SparkSession, dir: String): DataFrame =
    GraphOps.connectedComponents(TestGraph.partSupplierEdges(s, dir))
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .orderBy(col("component"))

  /** B27 — topological layering of the supply-chain DAG (Kahn levels =
    * longest path from the sources; GDS `gds.dag.topologicalSort`
    * parity — sorting by (level, id) is a valid deterministic
    * topological order). */
  def gToposort(s: SparkSession, dir: String): DataFrame =
    GraphOps.topologicalSort(TestGraph.supplyChainDagEdges(s, dir), maxIter = 10)
      .select(col("id"), col("level").cast("long").as("level"))
      .orderBy(col("id"))

  /** B51 — DAG longest path over the supply-chain DAG, DuckDB-gated:
    * the g_toposort walk oracle extended to carry path strings and
    * pick the per-vertex argmax (max level, then lexicographically
    * smallest path) — pins dist AND the critical path itself. */
  def gLongestpath(s: SparkSession, dir: String): DataFrame =
    GraphOps.dagLongestPath(TestGraph.supplyChainDagEdges(s, dir), maxIter = 10)
      .select(col("id"), col("dist").cast("long").as("dist"), col("path"))
      .orderBy(col("id"))

  /** B7 — degree per vertex of the part—supplier graph. */
  def gDegree(s: SparkSession, dir: String): DataFrame =
    GraphOps.degrees(TestGraph.partSupplierEdges(s, dir))
      .select(col("id"), col("out_deg"), col("in_deg"), col("deg"))
      .orderBy(col("id"))

  /** B7w — WEIGHTED degrees (GDS degree relationshipWeightProperty,
    * r12) over the weighted symmetric part—supplier graph; integral
    * weights, so the double sums compare exactly. */
  def gWDegree(s: SparkSession, dir: String): DataFrame =
    GraphOps.weightedDegrees(weightedSym(s, dir), "w")
      .select(col("id"), col("out_deg"), col("in_deg"), col("deg"))
      .orderBy(col("id"))

  /** B8 — top-10 parts by distinct supplier count (graph aggregation +
    * top-k; ties broken by part id). */
  def gTopdeg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("n_supp").desc, col("l_partkey"))
      .limit(10)

  /** B6 — PageRank over the part—supplier graph: top-20 by rank
    * (rows-only check; the rank math is spec-verified on fixtures). */
  def gPagerank(s: SparkSession, dir: String): DataFrame =
    GraphOps.pageRank(GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), iters = 10)
      .select(col("id"), round(col("rank"), 4).as("rank"))
      .orderBy(col("rank").desc, col("id"))
      .limit(20)

  /** Forced-distributed twin of [[gPagerank]] (`localFinishEdges = 0`):
    * every sf0.1 graph falls under the 250k-edge local-finisher gate,
    * so without these twins the bench would only exercise the in-memory
    * mirrors — the DISTRIBUTED plans are the ones that run at 100 TB,
    * and they need a per-round regression guard of their own. Results
    * are identical by the local≡distributed equivalence specs (and this
    * entry shares g_pagerank's DuckDB oracle verbatim). */
  def gPagerankDist(s: SparkSession, dir: String): DataFrame =
    GraphOps.pageRank(GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)),
        iters = 10, localFinishEdges = 0L)
      .select(col("id"), round(col("rank"), 4).as("rank"))
      .orderBy(col("rank").desc, col("id"))
      .limit(20)

  /** B49 — ArticleRank on the part–supplier graph, DuckDB-gated: the
    * recursive-CTE twin replays the exact iteration with the
    * `deg + avgdeg` divisor, so the whole convention (init, base,
    * average over the distinct symmetrized edge set) is hash-pinned. */
  def gArticlerank(s: SparkSession, dir: String): DataFrame =
    GraphOps.articleRank(GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), iters = 10)
      .select(col("id"), round(col("rank"), 4).as("rank"))
      .orderBy(col("rank").desc, col("id"))
      .limit(20)

  /** B16 — personalized PageRank on the testdata graph, DuckDB-gated
    * (the corpus-graph `sg_ppr` stays rows-only — DuckDB never sees
    * that graph). Seeds: every 5th part node; fixed 10 iterations so
    * the recursive-CTE twin replays the exact power iteration. */
  def gPpr(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.undirected(TestGraph.partSupplierEdges(s, dir))
    val seeds = e.select(col("src").as("id")).distinct()
      .filter(col("id").startsWith("p:") &&
        substring(col("id"), 3, 100).cast("int") % 5 === 0)
    GraphOps.personalizedPageRank(e, seeds, iters = 10)
      .filter(col("rank") > 0)
      .select(col("id"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("id"))
      .limit(25)
  }

  /** B10 — per-part triangle count on the co-purchase graph (two parts
    * are adjacent when they share an order). Degree-ordered wedge
    * generation — see [[GraphOps.triangles]]. */
  def gTriangles(s: SparkSession, dir: String): DataFrame =
    GraphOps.triangles(TestGraph.coPurchaseEdges(s, dir))
      .select(col("id").as("l_partkey"), col("n_tri"))
      .orderBy(col("l_partkey"))

  /** B33 — triangle ENUMERATION (gds.triangles stream parity, r12) on
    * the co-purchase graph; the DuckDB twin is the same id-oriented
    * 3-way join the count oracle already builds. */
  def gTriEnum(s: SparkSession, dir: String): DataFrame =
    GraphOps.triangleEnumerate(TestGraph.coPurchaseEdges(s, dir))
      .orderBy(col("a"), col("b"), col("c")).limit(5000)

  /** B11 — weighted single-source shortest paths from s:1 over the
    * part—supplier graph (undirected, deterministic integer weights),
    * hop-bounded at 8 so the recursive-CTE oracle is enumerable. */
  /** Symmetrized weighted part–supplier graph — ONE copy of the
    * recipe shared by every weighted gate (g_sssp, g_wcloseness,
    * g_wbetweenness), so the Spark queries and their DuckDB oracle
    * twins cannot silently desynchronize. */
  private def weightedSym(s: SparkSession, dir: String): DataFrame = {
    val we = TestGraph.weightedPartSupplierEdges(s, dir)
    we.unionByName(
      we.select(col("dst").as("src"), col("src").as("dst"), col("w"))).distinct()
  }

  /** Deterministic supplier root subset for the weighted-centrality
    * gates (matches the oracles' `% 40` filter verbatim). */
  private def supplierRoots(s: SparkSession, dir: String): DataFrame =
    TestGraph.weightedPartSupplierEdges(s, dir)
      .select(col("dst").as("id")).distinct()
      .filter(substring(col("id"), 3, 100).cast("int") % 40 === 0)

  def gSssp(s: SparkSession, dir: String): DataFrame = {
    val src = s.range(1).select(lit("s:1").as("id"))
    GraphOps.sssp(weightedSym(s, dir), src, maxIter = 8)
      .orderBy(col("id"))
  }

  /** B10b — local clustering coefficient on the co-purchase graph:
    * 2·Δ(v) / (deg(v)·(deg(v)−1)) with deg = distinct-neighbor count;
    * only vertices in ≥1 triangle (coef > 0) are reported. */
  def gClusterCoef(s: SparkSession, dir: String): DataFrame = {
    val co = TestGraph.coPurchaseEdges(s, dir)
    val sym = GraphOps.undirected(co)
    val deg = sym.groupBy(col("src").as("l_partkey")).agg(count(lit(1)).as("deg"))
    GraphOps.triangles(co)
      .select(col("id").as("l_partkey"), col("n_tri"))
      .join(deg, Seq("l_partkey"))
      .select(col("l_partkey"), col("n_tri"), col("deg"),
        Num.roundTies(lit(2.0) * col("n_tri") / (col("deg") * (col("deg") - 1)), 4).as("coef"))
      .orderBy(col("l_partkey"))
  }

  /** B17 — k-core of the part—supplier graph: the mutually-dense
    * subgraph after peeling (rows-only: iterative peeling has no
    * tractable SQL twin; semantics pinned by the clique/tail spec). */
  def gKcore(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    GraphOps.kCore(TestGraph.partSupplierEdges(s, dir), k)
      .orderBy(col("id"))

  /** B18 — closeness centrality for a deterministic root subset
    * (l_partkey % 200 = 0) of the undirected part—supplier graph:
    * closeness = reached / Σdist within 10 hops, all roots in ONE
    * multi-source keyed BFS. The root subset keeps the DuckDB
    * recursive-CTE oracle's (root × vertex × depth) state bounded. */
  def gCloseness(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 200 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("id")).distinct()
    GraphOps.closeness(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), roots, maxIter = 10)
      .orderBy(col("id"))
  }

  /** B19 — harmonic centrality, same roots/graph/bound as
    * [[gCloseness]] (one multi-source BFS; exact-integer sum — see
    * [[GraphOps.harmonic]]). */
  def gHarmonic(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 200 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("id")).distinct()
    GraphOps.harmonic(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), roots, maxIter = 10)
      .orderBy(col("id"))
  }

  /** B20 — betweenness centrality (Brandes), estimated from the same
    * deterministic root subset as [[gCloseness]] (exact when roots =
    * all vertices; the sample is the standard scale move). Rows-only:
    * σ-fraction accumulation has no tractable SQL twin — the
    * path/star/cycle fixtures pin exact values. */
  def gBetweenness(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 200 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("id")).distinct()
    GraphOps.betweenness(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), roots, maxIter = 10,
        undirectedInput = true) // edges symmetrized above → 2-frame dedup is safe
      .filter(col("betweenness") > 0)
      .orderBy(col("id"))
  }

  /** B20 gate — hop-4 Brandes betweenness from the deterministic root
    * subset, DuckDB-ORACLE-GATED: the oracle unrolls the exact forward
    * σ-level recurrence (σ_v = Σ over depth-(d−1) predecessors) and the
    * backward δ sweep (δ_u = σ_u·Σ (1+δ_w)/σ_w) as plain CTE stages —
    * no path enumeration, O(|E|) per level, the same arithmetic the
    * engine runs. Hop 4 keeps the unrolled SQL readable; the full
    * hop-10 run stays the rows-only `g_betweenness` bench entry.
    * Rounding = Num.roundTies(…, 6) on all three implementations
    * (local mirror, distributed sweep, oracle) — δ sums are rational
    * σ-fraction sums, the exact tie class. */
  def gBetweennessSql(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 200 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("id")).distinct()
    GraphOps.betweenness(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), roots, maxIter = 4,
        undirectedInput = true)
      .filter(col("betweenness") > 0)
      .orderBy(col("id"))
  }

  /** Hash-gated forced-distributed Brandes: the [[gBetweennessSql]]
    * recipe (hop 4, same roots) with `localFinishEdges = 0`, sharing
    * its unrolled level-by-level CTE oracle verbatim — the distributed
    * sweep (the plan that runs at 100 TB) must produce EXACTLY what
    * the local mirror produces, checked by DuckDB every round, not
    * just by fixture specs. The hop-10 [[gBetweennessDist]] stays the
    * bench entry. */
  def gBetweennessDistSql(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 200 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("id")).distinct()
    GraphOps.betweenness(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), roots, maxIter = 4,
        undirectedInput = true, localFinishEdges = 0L)
      .filter(col("betweenness") > 0)
      .orderBy(col("id"))
  }

  /** Forced-distributed Brandes twin (see [[gPagerankDist]]'s rationale). */
  def gBetweennessDist(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.lineitem(s, dir)
      .filter(col("l_partkey") % 200 === 0)
      .select(concat(lit("p:"), col("l_partkey")).as("id")).distinct()
    GraphOps.betweenness(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)), roots, maxIter = 10,
        undirectedInput = true, localFinishEdges = 0L)
      .filter(col("betweenness") > 0)
      .orderBy(col("id"))
  }

  /** B18w gate — WEIGHTED closeness (relationshipWeightProperty) over
    * the symmetrized weighted part–supplier graph from a deterministic
    * supplier root subset: closeness = reached / Σ weighted dist, with
    * distances from the keyed hop-bounded Bellman-Ford
    * ([[GraphOps.ssspFrom]]). Oracle: bounded state-dedup walk CTE
    * (the g_sssp twin, multi-root). */
  def gWCloseness(s: SparkSession, dir: String): DataFrame =
    GraphOps.closeness(weightedSym(s, dir), supplierRoots(s, dir),
        maxIter = 6, weightCol = Some("w"))
      .orderBy(col("id"))

  /** B20w gate — WEIGHTED betweenness (Dijkstra-based Brandes) on the
    * same graph/roots as [[gWCloseness]]. Oracle: walk-CTE distances →
    * shortest-path DAG → DAG-path enumeration (≤ maxIter edges, same
    * bound as the engine's σ propagation) → Brandes pair dependencies
    * Σ (paths through v)/σ_st — the combinatorial identity the
    * backward δ recursion computes. */
  def gWBetweenness(s: SparkSession, dir: String): DataFrame =
    GraphOps.betweenness(weightedSym(s, dir), supplierRoots(s, dir),
        maxIter = 6, halve = true, weightCol = Some("w"))
      .filter(col("betweenness") > 0)
      .orderBy(col("id"))

  /** Forced-distributed twin of [[gWBetweenness]] (`localFinishEdges =
    * 0`): the four-phase Dijkstra-Brandes — dense-long keys, annotated
    * DAG, single running pending frame — hash-gated against the SAME
    * DAG-path-enumeration oracle, and benched per round (the r10
    * scale-hardening's regression guard). */
  def gWBetweennessDist(s: SparkSession, dir: String): DataFrame =
    GraphOps.betweenness(weightedSym(s, dir), supplierRoots(s, dir),
        maxIter = 6, halve = true, weightCol = Some("w"), localFinishEdges = 0L)
      .filter(col("betweenness") > 0)
      .orderBy(col("id"))

  /** B13w gate — WEIGHTED shortest-path EXTRACTION
    * ([[GraphOps.ssspPathsFrom]]) over the weighted symmetric
    * part–supplier graph from the supplier root subset (the
    * g_wcloseness graph/roots). Oracle: the round-synchronous
    * Bellman-Ford with path carry UNROLLED stage by stage — each stage
    * a window-min over extensions (struct-min (dist, path), the
    * engine's within-round tie-break) followed by a strict-improvement
    * merge (fewest-hops preference, the engine's acceptance rule) —
    * because the per-round greedy path choice is not in general the
    * global lexicographic minimum, so a "min over all walks" oracle
    * would diverge on reconvergent tie shapes. */
  def gWPaths(s: SparkSession, dir: String): DataFrame =
    GraphOps.ssspPathsFrom(weightedSym(s, dir), supplierRoots(s, dir),
        maxIter = 6, weightCol = "w")
      .select(col("root"), col("id"), col("dist"), col("path"))
      .orderBy(col("root"), col("id"))

  /** B29 — deterministic random walks over the undirected part—supplier
    * graph (rows-only: the xxhash64 step choice has no SQL oracle;
    * GraphOpsSpec pins determinism + per-step edge validity). */
  def gRandomWalk(s: SparkSession, dir: String): DataFrame =
    GraphOps.randomWalk(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)),
        walksPerNode = 1, walkLength = 4)
      .orderBy(col("walk_id"))

  /** B34 — k1 coloring rows (gds.k1coloring shape, r12) on the
    * undirected part—supplier graph (rows-only: the hash-priority
    * rounds have no SQL oracle; `g_k1_valid` gates the invariants). */
  def gK1Coloring(s: SparkSession, dir: String): DataFrame =
    GraphOps.k1Coloring(TestGraph.partSupplierEdges(s, dir))
      .orderBy(col("id"))

  /** B34 validity gate — 1-row flags the oracle pins at 1: no
    * monochrome edge exists (validity), and the palette respects the
    * greedy bound (#colors ≤ maxdeg + 1). */
  def gK1Valid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e0 = TestGraph.partSupplierEdges(s, dir)
    val sym = GraphOps.undirected(e0).filter(col("src") =!= col("dst"))
      .persist()
    val c = GraphOps.k1Coloring(e0).persist()
    val conflicts = sym
      .join(c.select(col("id").as("src"), col("color").as("cs")), Seq("src"))
      .join(c.select(col("id").as("dst"), col("color").as("cd")), Seq("dst"))
      .filter(col("cs") === col("cd")).count()
    val maxDeg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).collect()(0).getLong(0)
    val nColors = c.select(col("color")).distinct().count()
    sym.unpersist(); c.unpersist()
    Seq((if (conflicts == 0) 1L else 0L,
        if (nColors <= maxDeg + 1) 1L else 0L))
      .toDF("no_conflict_ok", "bound_ok")
  }

  /** B32 — per-community conductance (gds.conductance parity, r12) of
    * the deterministic (key % 4) partition of the part—supplier
    * graph; the DuckDB twin recomputes the cut/min-volume closed form
    * directly. */
  def gConductance(s: SparkSession, dir: String): DataFrame = {
    val e = TestGraph.partSupplierEdges(s, dir)
    val ids = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val assign = ids.select(col("id"),
      (col("id").substr(lit(3), lit(18)).cast("long") % 4)
        .cast("string").as("community"))
    GraphOps.conductance(e, assign).orderBy(col("community"))
  }

  /** B30 — A* single-pair shortest path (gds.shortestPath.astar
    * parity, r12), pinned pair s:40 → p:20 on the weighted symmetric
    * part—supplier graph. The gate runs the dijkstra-equivalent empty
    * heuristic (TPC-H nodes carry no coordinates; an inadmissible
    * synthetic h would change answers) — A*'s CONTRACT is a
    * bit-identical dijkstra row, which this pins against the unrolled
    * Bellman-Ford oracle; goal-directed pruning with a real euclidean/
    * haversine heuristic is spec-pinned (GraphOpsSpec). */
  def gAstar(s: SparkSession, dir: String): DataFrame = {
    val empty = s.range(0)
      .select(col("id").cast("string").as("id"),
        org.apache.spark.sql.functions.lit(0.0).as("h"))
    GraphOps.astarPath(weightedSym(s, dir), source = "s:40",
        target = "p:20", heuristic = empty, maxIter = 6)
      .select(col("root"), col("id"), col("dist"), col("path"))
  }

  /** B31 — node2vec-biased walks (GDS randomWalk returnFactor/
    * inOutFactor; rows-only like B29: the weighted deterministic
    * choice has no SQL oracle; GraphOpsSpec pins the α classes). */
  def gNode2vec(s: SparkSession, dir: String): DataFrame =
    GraphOps.node2vecWalk(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)),
        walksPerNode = 1, walkLength = 4, p = 2.0, q = 0.5)
      .orderBy(col("walk_id"))

  /** B28 — k shortest loopless paths (gds.shortestPath.yens parity)
    * on the weighted symmetric part—supplier graph, pinned pair
    * s:40 → p:20, integral weights so dist compares exactly. */
  def gKPaths(s: SparkSession, dir: String): DataFrame =
    GraphOps.kShortestPaths(weightedSym(s, dir), source = "s:40",
        target = "p:20", k = 7, maxHops = 3, weightCol = Some("w"))
      .select(col("rank"), col("dist").cast("long").as("dist"),
        col("hops"), col("path"))
      .orderBy(col("rank"))

  /** B12 — GDS-style node similarity: Jaccard over supplier neighbor
    * sets of the (sparsified) part—supplier graph. */
  def gNodesim(s: SparkSession, dir: String): DataFrame =
    GraphOps.nodeSimilarity(TestGraph.partSupplierEdges(s, dir), threshold = 0.2)
      .orderBy(col("id1"), col("id2"))

  /** B12 metric variants (r12, GDS similarityMetric): same candidate
    * machinery, per-metric closed form — the DuckDB twins change one
    * formula. Overlap's threshold sits higher (it dominates jaccard:
    * i/min ≥ i/union) so the gate exercises real filtering. */
  def gNodesimOverlap(s: SparkSession, dir: String): DataFrame =
    GraphOps.nodeSimilarity(TestGraph.partSupplierEdges(s, dir),
        threshold = 0.5, metric = "overlap")
      .orderBy(col("id1"), col("id2"))

  def gNodesimCosine(s: SparkSession, dir: String): DataFrame =
    GraphOps.nodeSimilarity(TestGraph.partSupplierEdges(s, dir),
        threshold = 0.35, metric = "cosine")
      .orderBy(col("id1"), col("id2"))

  /** B12k — GDS's default topK result shape (r12): 3 best neighbors
    * per node as directed rows; the DuckDB twin ranks the same
    * directed expansion with QUALIFY. */
  def gNodesimTopK(s: SparkSession, dir: String): DataFrame =
    GraphOps.nodeSimilarityTopK(TestGraph.partSupplierEdges(s, dir),
        threshold = 0.2, topK = 3)
      .orderBy(col("id"), col("sim").desc, col("neighbor"))

  /** B12f — gds.nodeSimilarity.filtered parity (r13): directed rows
    * (id ∈ source filter, neighbor ∈ target filter) over the same
    * jaccard machinery; the DuckDB twin adds one WHERE to the
    * g_nodesim directed expansion. Filters: parts with key % 3 = 0
    * (sources) vs key % 3 = 1 (targets). */
  def gNodesimFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = TestGraph.partSupplierEdges(s, dir)
    val parts = e.select(col("src").as("id")).distinct()
    val key = substring(col("id"), 3, 100).cast("int")
    GraphOps.nodeSimilarityFiltered(e, threshold = 0.2,
        sourceFilter = Some(parts.filter(key % 3 === 0)),
        targetFilter = Some(parts.filter(key % 3 === 1)))
      .orderBy(col("id"), col("neighbor"))
  }

  /** B44 — link prediction (r15): the four classic neighborhood
    * measures per candidate pair over the part–supplier graph; the
    * DuckDB twin recomputes every closed form from the same wedge
    * join. Snake-case aliases keep the cross-engine column compare
    * case-trivial. */
  def gLinkpred(s: SparkSession, dir: String): DataFrame = {
    val e = TestGraph.partSupplierEdges(s, dir)
    // r16: sameCommunity needs an assignment DuckDB can replay in
    // closed form — community = numeric key part mod 7
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val comm = verts.select(col("id"),
      (substring_index(col("id"), ":", -1).cast("long") % 7).as("community"))
    GraphOps.linkPrediction(e, communities = Some(comm))
      .select(col("node1"), col("node2"),
        col("commonNeighbors").as("common_neighbors"),
        col("adamicAdar").as("adamic_adar"),
        col("resourceAllocation").as("resource_allocation"),
        col("preferentialAttachment").as("preferential_attachment"),
        col("totalNeighbors").as("total_neighbors"),
        col("sameCommunity").as("same_community"))
      .orderBy(col("node1"), col("node2"))
      .limit(5000)
  }

  /** B35 — minimum spanning forest (gds.spanningTree parity, r13) on
    * the sparse weighted part—supplier graph. The (w, src, dst) total
    * order makes the forest UNIQUE, so the DuckDB twin recomputes it
    * independently via the CYCLE PROPERTY: an edge is in the MSF iff
    * its head is NOT reachable from its tail through strictly lighter
    * edges. Integral weights compare exactly. */
  def gMst(s: SparkSession, dir: String): DataFrame =
    GraphOps.spanningTree(TestGraph.mstEdges(s, dir), weightCol = Some("w"))
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .orderBy(col("src"), col("dst"))

  /** B35 objective=maximum gate (r14) — the MAXIMUM spanning forest on
    * the same graph, DuckDB-ORACLE-GATED by the INVERTED cycle
    * property: an edge is in the maximum forest iff its endpoints are
    * NOT connected using only edges strictly greater in the
    * (−w, a, b) total order. */
  def gMaxst(s: SparkSession, dir: String): DataFrame =
    GraphOps.spanningTree(TestGraph.mstEdges(s, dir), weightCol = Some("w"),
        objective = "maximum")
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .orderBy(col("src"), col("dst"))

  /** B35k gate (r14) — `gds.kSpanningTree`: the deterministic
    * min-vertex source's minimum spanning tree cut into k = 3
    * sub-trees. Oracle: the g_mst cycle-property forest, restricted to
    * the source's component by reachability over the FOREST edges,
    * minus the 2 heaviest under (w, src, dst) — a fully independent
    * recomputation of both the tree and the cut. */
  def gKmst(s: SparkSession, dir: String): DataFrame = {
    val e = TestGraph.mstEdges(s, dir)
    val source = e.agg(min(least(col("src"), col("dst")))).collect()(0).getString(0)
    GraphOps.kSpanningTree(e, k = 3, source, weightCol = Some("w"))
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .orderBy(col("src"), col("dst"))
  }

  /** B39 — Bellman-Ford with NEGATIVE weights (gds.bellmanFord parity,
    * r13) from r:0 over the supply-chain DAG, weights
    * (key(src) + key(dst)) % 5 − 2 ∈ {−2..2} — a DAG is negative-safe
    * by construction, so distances are well-defined and the DuckDB
    * twin recomputes them as min over the enumerated root-anchored
    * walks (the g_toposort oracle's walk, summed). Integral weights →
    * exact longs. Distances only: path tie-breaks are round-greedy
    * (the g_wpaths UNROLLING story), and the distance objective is
    * tie-free. */
  def gBellman(s: SparkSession, dir: String): DataFrame = {
    val key = (c: org.apache.spark.sql.Column) => substring(c, 3, 100).cast("int")
    val e = TestGraph.supplyChainDagEdges(s, dir)
      .withColumn("w", (pmod(key(col("src")) + key(col("dst")), lit(5)) - 2)
        .cast("double"))
    GraphOps.bellmanFord(e, source = "r:0")
      .select(col("id"), col("dist").cast("long").as("dist"))
      .orderBy(col("id"))
  }

  /** B38 — Steiner tree (gds.steinerTree parity, r13): the
    * shortest-path-tree heuristic from s:40 to three pinned part
    * targets on the weighted symmetric graph; the DuckDB twin unions
    * the SAME tie-broken oracle paths (the g_wpaths unrolled
    * Bellman-Ford) and explodes them to edges — path-exact, so the
    * edge sets must match bit-for-bit. */
  def gSteiner(s: SparkSession, dir: String): DataFrame =
    GraphOps.steinerTree(weightedSym(s, dir), source = "s:40",
        targets = Seq("p:20", "p:40", "p:60"), maxIter = 6,
        weightCol = Some("w"))
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .orderBy(col("src"), col("dst"))

  /** B37 — articulation points (gds.articulationPoints parity, r13) of
    * the sparse cut-structure graph; the DuckDB twin recomputes each
    * vertex's cut-ness by REACHABILITY AVOIDING THE VERTEX (from its
    * min neighbor — any unreached neighbor ⟺ articulation point),
    * an independent formulation of the same property the Tarjan
    * lowlink pass computes. */
  def gArticulation(s: SparkSession, dir: String): DataFrame =
    GraphOps.articulationPoints(TestGraph.cutEdges(s, dir))
      .orderBy(col("id"))

  /** B37b — bridges: the twin walks reachability avoiding the EDGE
    * (tail→head without using either direction of the edge itself). */
  def gBridges(s: SparkSession, dir: String): DataFrame =
    GraphOps.bridges(TestGraph.cutEdges(s, dir))
      .orderBy(col("src"), col("dst"))

  /** B41 (r14) — the same articulation points, FORCED through the
    * distributed Tarjan-Vishkin pass (Borůvka forest → Euler tour →
    * list ranking → RMQ → auxiliary-graph CC; no DFS anywhere),
    * hash-gated against the SAME independent reachability-avoidance
    * oracle as `g_articulation` — the r13 local-finisher bound is no
    * longer a scale ceiling, and the gate proves it on real data. */
  def gArticulationDist(s: SparkSession, dir: String): DataFrame =
    GraphOps.articulationPoints(TestGraph.cutEdges(s, dir),
        forceDistributed = true)
      .orderBy(col("id"))

  /** B41b (r14) — distributed bridges, vs the edge-avoidance oracle. */
  def gBridgesDist(s: SparkSession, dir: String): DataFrame =
    GraphOps.bridges(TestGraph.cutEdges(s, dir), forceDistributed = true)
      .orderBy(col("src"), col("dst"))

  /** B41c (r14) — the full biconnected-component partition (one row
    * per edge, component = min canonical edge key). Rows-recorded; the
    * partition itself is spec-gated (distributed ≡ local Hopcroft-
    * Tarjan edge stack on fixtures + seeded random graphs), and its
    * two reductions are the hash gates above. */
  def gBicc(s: SparkSession, dir: String): DataFrame =
    GraphOps.biconnectedComponents(TestGraph.cutEdges(s, dir),
        forceDistributed = true)
      .orderBy(col("src"), col("dst"))

  /** B43 (r14) — k-core DECOMPOSITION (the real gds.kcore shape:
    * coreValue per vertex) on the part—supplier graph, FORCED through
    * the distributed H-index fixpoint. Rows-recorded; the invariant
    * gate below cross-checks it against the independently HASH-GATED
    * g_kcore level query. */
  def gKcoreDec(s: SparkSession, dir: String): DataFrame =
    GraphOps.coreDecomposition(TestGraph.partSupplierEdges(s, dir),
        forceDistributed = true)
      .orderBy(col("id"))

  /** B43 quality gate — 1-row flags the oracle pins at 1:
    * `level_ok` — {v : coreValue ≥ 3} equals the vertex set of the
    * SQL-HASH-GATED kCore(3) extraction (g_kcore's own operator), so
    * the decomposition is transitively checked against g_kcore's
    * DuckDB recursive-CTE peeling oracle;
    * `bound_ok` — coreValue ≤ degree everywhere;
    * `paths_ok` — local peel ≡ distributed H-index on this graph. */
  def gKcoreDecOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val dec = GraphOps.coreDecomposition(e, forceDistributed = true)
      .persist()
    val atLeast3 = dec.filter(col("coreValue") >= 3).select(col("id"))
    val level3 = GraphOps.kCore(e, 3).select(col("id"))
    val levelOk = atLeast3.exceptAll(level3).isEmpty &&
      level3.exceptAll(atLeast3).isEmpty
    val deg = GraphOps.undirected(e).filter(col("src") =!= col("dst"))
      .groupBy(col("src").as("id")).agg(countDistinct(col("dst")).as("deg"))
    val boundOk = dec.join(deg, Seq("id"))
      .filter(col("coreValue") > col("deg")).isEmpty
    val local = GraphOps.coreDecomposition(e)
    val pathsOk = dec.exceptAll(local).isEmpty && local.exceptAll(dec).isEmpty
    dec.unpersist()
    Seq((if (levelOk) 1L else 0L, if (boundOk) 1L else 0L,
        if (pathsOk) 1L else 0L))
      .toDF("level_ok", "bound_ok", "paths_ok")
  }

  /** B42 (r14) — SLLPA overlapping communities (gds.alpha.sllpa) on
    * the part—supplier graph: one (id, communityId) row per
    * membership — possibly several per vertex, which is the point.
    * Rows-recorded (an 11-round stochastic-process replay has no
    * tractable SQL twin; the draws are deterministic so rows are
    * stable); semantics spec-pinned, invariants hash-gated below. */
  def gSllpa(s: SparkSession, dir: String): DataFrame =
    graft.graph.Sllpa.run(TestGraph.partSupplierEdges(s, dir),
        maxIterations = 5)
      .orderBy(col("id"), col("communityId"))

  /** B42 quality gate — 1-row flags the oracle pins at 1 (the
    * g_hashgnn_ok pattern; all deterministic, a 0 is a code change):
    * `coverage_ok` — every vertex of the graph holds ≥ 1 membership
    * (the keep-strongest fallback contract);
    * `samecomp_ok` — every communityId is a real vertex id in the SAME
    * connected component as its member (labels can only propagate
    * along edges — a violation means the join plumbing leaked);
    * `overlap_ok` — at least one vertex belongs to ≥ 2 communities
    * (the overlapping-output non-vacuity witness on this graph). */
  def gSllpaOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val m = graft.graph.Sllpa.run(e, maxIterations = 5)
      .persist()
    val verts = GraphOps.undirected(e).select(col("src").as("id")).distinct()
    val coverageOk = verts.join(m, Seq("id"), "left_anti").isEmpty
    val cc = GraphOps.connectedComponents(e)
    val sameCompOk = m
      .join(cc, Seq("id"))
      .join(cc.select(col("id").as("communityId"), col("component").as("c2")),
        Seq("communityId"))
      .filter(col("component") =!= col("c2")).isEmpty
    val overlapOk = m.groupBy(col("id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).limit(1).count() > 0
    m.unpersist()
    Seq((if (coverageOk) 1L else 0L, if (sameCompOk) 1L else 0L,
        if (overlapOk) 1L else 0L))
      .toDF("coverage_ok", "samecomp_ok", "overlap_ok")
  }

  /** B36 — hashgnn embeddings (gds.hashgnn parity, r13) on the
    * part—supplier graph. The embedding is hash-min selection only —
    * NO floats — so the per-node feature-set fingerprint is
    * bit-stable and the driver records/hashes real rows. */
  def gHashgnn(s: SparkSession, dir: String): DataFrame =
    graft.graph.HashGNN.embed(TestGraph.partSupplierEdges(s, dir))
      .select(col("id"), size(col("features")).cast("long").as("n_feat"),
        xxhash64(to_json(col("features"))).as("fp"))
      .orderBy(col("id"))

  /** B36 quality gate — 1-row flags the oracle pins at 1 (the
    * e_recall/g_k1_valid pattern for non-SQL-expressible checks, all
    * deterministic so a 0 is a code change, never noise):
    * `homophily_ok` — adjacent nodes' feature sets are more similar
    * (mean Jaccard) than a deterministic half-rotation pairing of the
    * id space (the property hashgnn exists to produce);
    * `rerun_ok` — a second embed run is bit-identical;
    * `coverage_ok` — every vertex got ≥ 1 feature. */
  def gHashgnnOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val emb = graft.graph.HashGNN.embed(e)
      .select(col("id"), col("features")).persist()
    val nv = GraphOps.undirected(e).select(col("src")).distinct().count()
    val jac = (size(array_intersect(col("f1"), col("f2"))).cast("double") /
      size(array_union(col("f1"), col("f2"))))
    def meanJac(pairsDf: DataFrame): Double = {
      val row = pairsDf
        .join(emb.select(col("id").as("a"), col("features").as("f1")), Seq("a"))
        .join(emb.select(col("id").as("b"), col("features").as("f2")), Seq("b"))
        .agg(avg(jac)).collect()(0)
      if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    }
    val adjMean = meanJac(GraphOps.undirected(e)
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")))
    // deterministic non-adjacent baseline: pair rank r with rank
    // r + n/2 (mod n) over the sorted id space, adjacency removed
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val ranked = emb.select(col("id")).withColumn("r", row_number().over(w))
    val half = (nv / 2).toInt
    val rot = ranked.alias("x").join(ranked.alias("y"),
        col("y.r") === (col("x.r") + half - 1) % nv.toInt + 1 &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .join(GraphOps.undirected(e).select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
    val rotMean = meanJac(rot)
    val emb2 = graft.graph.HashGNN.embed(e).select(col("id"), col("features"))
    val rerunOk = emb.exceptAll(emb2).isEmpty && emb2.exceptAll(emb).isEmpty
    val coverageOk = emb.count() == nv &&
      emb.filter(size(col("features")) < 1).isEmpty
    emb.unpersist()
    Seq((if (adjMean > rotMean) 1L else 0L,
        if (rerunOk) 1L else 0L,
        if (coverageOk) 1L else 0L))
      .toDF("homophily_ok", "rerun_ok", "coverage_ok")
  }

  /** B45 (r15) — node2vec EMBEDDINGS over the part–supplier graph
    * (rows-only: SGNS floats have no SQL twin; semantics are pinned by
    * the g_n2v_ok flags below and the Node2VecSpec fixtures). */
  def gNode2vecEmb(s: SparkSession, dir: String): DataFrame =
    graft.graph.Node2Vec.embeddings(TestGraph.partSupplierEdges(s, dir),
        dim = 16, walksPerNode = 2, walkLength = 5, iterations = 3)
      .select(col("id"), size(col("embedding")).as("d"))
      .orderBy(col("id"))

  /** B45 quality flags — PLANTED-CLIQUE homophily (the judge-specified
    * bar; the HashGNN-gate pattern with cosine): a partition graph of
    * 40 cliques over the part keys, ring-linked so walks can cross,
    * must embed with intra-clique cosine beating a deterministic
    * cross-clique baseline BY MARGIN (not just noise — SGNS's
    * first-order objective makes planted communities separate hard;
    * the real part–supplier graph is bipartite, where U·U similarity
    * is second-order and the test would be vacuous). Plus rerun
    * agreement within float-sum tolerance (bit-exactness is not
    * promised for float aggregation — FastRP's documented class) and
    * full coverage at the configured dimension. */
  def gN2vOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // planted partition: part keys < 320, clique = key mod 40 (all
    // pairs within a clique), one ring edge between consecutive
    // clique minima — derived from the testdata table, deterministic
    val mem = Tables.part(s, dir).select(col("p_partkey").as("k"))
      .filter(col("k") < 320)
      .select(concat(lit("n:"), col("k")).as("id"), (col("k") % 40).as("grp"))
      .persist()
    val intra = mem.alias("x").join(mem.alias("y"),
        col("x.grp") === col("y.grp") && col("x.id") < col("y.id"))
      .select(col("x.id").as("src"), col("y.id").as("dst"))
    val minima = mem.groupBy(col("grp")).agg(min(col("id")).as("id"))
    val ring = minima.alias("x").join(minima.alias("y"),
        col("y.grp") === (col("x.grp") + 1) % 40)
      .select(col("x.id").as("src"), col("y.id").as("dst"))
    val e = intra.unionByName(ring)
    def run() = graft.graph.Node2Vec.embeddings(e,
      dim = 16, walksPerNode = 4, walkLength = 6, windowSize = 3,
      iterations = 8, learningRate = 0.1)
    val emb = run().persist()
    val nv = mem.count()
    val dot = aggregate(zip_with(col("f1"), col("f2"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    def nrm(c: Column) = sqrt(aggregate(zip_with(c, c, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x))
    val cosine = dot / (nrm(col("f1")) * nrm(col("f2")))
    def meanCos(pairsDf: DataFrame): Double = {
      val row = pairsDf
        .join(emb.select(col("id").as("a"), col("embedding").as("f1")), Seq("a"))
        .join(emb.select(col("id").as("b"), col("embedding").as("f2")), Seq("b"))
        .agg(avg(cosine)).collect()(0)
      if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    }
    val intraMean = meanCos(intra.select(col("src").as("a"), col("dst").as("b")))
    // cross baseline: every pair between a clique and the clique 20
    // steps around the ring (maximally distant) — deterministic
    val crossMean = meanCos(
      mem.alias("x").join(mem.alias("y"), col("y.grp") === (col("x.grp") + 20) % 40)
        .select(col("x.id").as("a"), col("y.id").as("b")))
    // rerun: per-node cosine between the two runs within tolerance
    val emb2 = run().select(col("id"), col("embedding").as("f2"))
    val minSelfCos = emb.select(col("id"), col("embedding").as("f1"))
      .join(emb2, Seq("id"))
      .agg(min(cosine)).collect()(0).getDouble(0)
    val coverageOk = emb.count() == nv &&
      emb.filter(size(col("embedding")) =!= 16).isEmpty
    emb.unpersist(); mem.unpersist()
    Seq((if (intraMean > crossMean + 0.05) 1L else 0L,
        if (minSelfCos > 1.0 - 1e-6) 1L else 0L,
        if (coverageOk) 1L else 0L))
      .toDF("homophily_ok", "rerun_ok", "coverage_ok")
  }

  /** B46 (r15) — RWR graph sampling over the undirected part–supplier
    * graph (rows-only; the invariants — sample ⊆ graph, seed
    * determinism, loud under-coverage — are spec-pinned). Starts at a
    * deterministic supplier subset so the giant component covers the
    * ratio. */
  def gRwr(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.undirected(TestGraph.partSupplierEdges(s, dir))
    val starts = e.select(col("src").as("id")).distinct()
      .filter(col("id").startsWith("s:") &&
        substring(col("id"), 3, 100).cast("int") % 10 === 0)
    GraphOps.sampleRwr(e, samplingRatio = 0.2, startNodes = Some(starts))
      .orderBy(col("src"), col("dst"))
  }

  /** B52 (r16) — CNARW sampling over the same graph and start set as
    * [[gRwr]] (rows-only; subset/determinism/under-coverage invariants
    * are spec-pinned like B46's). */
  def gCnarw(s: SparkSession, dir: String): DataFrame = {
    val e = GraphOps.undirected(TestGraph.partSupplierEdges(s, dir))
    val starts = e.select(col("src").as("id")).distinct()
      .filter(col("id").startsWith("s:") &&
        substring(col("id"), 3, 100).cast("int") % 10 === 0)
    GraphOps.sampleCnarw(e, samplingRatio = 0.2, startNodes = Some(starts))
      .orderBy(col("src"), col("dst"))
  }

  /** B47 (r15) — influence maximization over the undirected
    * part–supplier graph (rows-only; the invariants are the flags
    * below and the InfluenceSpec fixtures). */
  def gCelf(s: SparkSession, dir: String): DataFrame =
    graft.graph.Influence.influenceMaximization(
        GraphOps.undirected(TestGraph.partSupplierEdges(s, dir)),
        seedSetSize = 5, monteCarloSimulations = 50)
      .orderBy(col("rank"))

  /** B47 invariant flags (oracle pins 1s): exactly k seeds in rank
    * order, spread monotone non-decreasing and ≤ |V| (the estimate is
    * a coverage fraction times |V|), seeds are real vertices, and a
    * rerun is BIT-EXACT (integer counts + hash draws end to end). */
  def gCelfOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = GraphOps.undirected(TestGraph.partSupplierEdges(s, dir))
    def run() = graft.graph.Influence.influenceMaximization(
      e, seedSetSize = 5, monteCarloSimulations = 50)
    val r1 = run().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val nv = e.select(col("src")).distinct().count()
    val vset = e.select(col("src")).distinct().collect().map(_.getString(0)).toSet
    val kOk = r1.length == 5 && r1.map(_._1).toSeq == (1 to 5)
    val monoOk = r1.sliding(2).forall(p =>
      p.length < 2 || p(1)._3 >= p(0)._3) && r1.forall(t => t._3 <= nv + 1e-9)
    val realOk = r1.forall(t => vset(t._2)) && r1.map(_._2).distinct.length == 5
    val rerunOk = run().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sameElements(r1)
    Seq((if (kOk) 1L else 0L, if (monoOk) 1L else 0L,
        if (realOk) 1L else 0L, if (rerunOk) 1L else 0L))
      .toDF("k_ok", "monotone_ok", "seeds_ok", "rerun_ok")
  }

  /** B48 (r15) — approx max-k-cut communities (rows-only; flags below
    * + MaxKCutSpec). */
  def gMaxkcut(s: SparkSession, dir: String): DataFrame =
    graft.graph.MaxKCut.maxKCut(TestGraph.partSupplierEdges(s, dir), k = 3)
      .orderBy(col("id"))

  /** B48 invariant flags (oracle pins 1s): full coverage with
    * communityId ∈ [0, k), the local search never loses to its own
    * hash init (move gating accepts strict improvements only, so the
    * cut is monotone), and a rerun is bit-exact (unit weights →
    * integer sums). */
  def gMaxkcutOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val nv = GraphOps.undirected(e).select(col("src")).distinct().count()
    val out = graft.graph.MaxKCut.maxKCut(e, k = 3).persist()
    val coverOk = out.count() == nv &&
      out.filter(col("communityId") < 0 || col("communityId") >= 3).isEmpty
    val init = graft.graph.MaxKCut.maxKCut(e, k = 3, iterations = 0)
    val cutInit = graft.graph.MaxKCut.cutWeight(e, init)
    val cutFinal = graft.graph.MaxKCut.cutWeight(e, out)
    val monoOk = cutFinal >= cutInit - 1e-9 && cutFinal > 0
    val again = graft.graph.MaxKCut.maxKCut(e, k = 3)
    val rerunOk = out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty
    out.unpersist()
    Seq((if (coverOk) 1L else 0L, if (monoOk) 1L else 0L,
        if (rerunOk) 1L else 0L))
      .toDF("cover_ok", "monotone_ok", "rerun_ok")
  }

  /** B13 — shortest-path EXTRACTION (Cypher `shortestPath` parity):
    * one materialized path per vertex reachable from r:0 down the
    * hierarchy forest, lexicographic tie-break. */
  def gPaths(s: SparkSession, dir: String): DataFrame = {
    val src = s.range(1).select(lit("r:0").as("id"))
    GraphOps.bfsPaths(TestGraph.hierarchyEdges(s, dir), src, maxIter = 3)
      .orderBy(col("id"))
  }

  /** B13b — allShortestPaths parity: every tied minimal path from each
    * region root over the region→nation→customer→order hierarchy, one
    * multi-source keyed BFS. The hierarchy is a forest (ties are pinned
    * by the diamond fixture spec); this entry gates the multi-root
    * plumbing against a recursive-CTE oracle. */
  def gAllPaths(s: SparkSession, dir: String): DataFrame = {
    val roots = graft.Tables.region(s, dir)
      .select(concat(lit("r:"), col("r_regionkey")).as("id"))
    GraphOps.bfsAllPathsFrom(TestGraph.hierarchyEdges(s, dir), roots, maxIter = 3)
      .orderBy(col("root"), col("id"), col("path"))
  }

  /** B40 gate (r14) — `gds.dfs`: depth-first preorder from r:0 over
    * the region→nation→customer→order FOREST, DuckDB-ORACLE-GATED: on
    * a forest the sorted-adjacency preorder equals ordering the
    * enumerated root paths COMPONENT-WISE (a parent's path-list is a
    * strict prefix of its children's, and sibling subtrees order by
    * the first differing id), which the oracle does with
    * `ORDER BY string_split(path, '>')` — an independent
    * recomputation that never runs a DFS. */
  def gDfs(s: SparkSession, dir: String): DataFrame =
    GraphOps.dfs(TestGraph.hierarchyEdges(s, dir), "r:0")
      .orderBy(col("ord"))

  /** B14 — deterministic label-propagation communities on the
    * part—supplier graph: community sizes, largest first (rows-only:
    * iterative mode-of-neighbors has no tractable SQL twin; the
    * algorithm's behavior is pinned by the two-clique fixture spec). */
  def gLpa(s: SparkSession, dir: String): DataFrame =
    GraphOps.labelPropagation(TestGraph.partSupplierEdges(s, dir), iters = 5)
      .groupBy(col("community")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))

  /** B14w gate (r14) — WEIGHTED label propagation, DuckDB-ORACLE-GATED
    * (the `g_lpa` recursive CTE with weighted votes): edge weights from
    * the deterministic (key-sum % 5 + 1) construction, node weights
    * (key % 3 + 1) — a voter's label counts edgeWeight·nodeWeight-fold,
    * tie to the smaller label. All vote sums are small-integer products
    * (exact in FP on the Spark side, BIGINT on the oracle side), so the
    * winner comparison is tie-safe. This path always runs the
    * DISTRIBUTED rounds (the local finisher is unweighted-only), so
    * the gate is also the forced-distributed check. */
  def gWLpa(s: SparkSession, dir: String): DataFrame = {
    val e = TestGraph.weightedPartSupplierEdges(s, dir)
    val nw = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .select(col("id"),
        (substring(col("id"), 3, 100).cast("int") % 3 + 1).cast("double").as("nw"))
    GraphOps.labelPropagation(e, iters = 5, weightCol = Some("w"),
        nodeWeights = Some(nw))
      .groupBy(col("community")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))
  }

  /** B21 — Louvain modularity communities on the part—supplier graph:
    * community sizes, largest first (rows-only: local-move +
    * contraction rounds have no tractable SQL twin; behavior is pinned
    * by the two-clique fixture + modularity-monotonicity specs). */
  def gLouvain(s: SparkSession, dir: String): DataFrame =
    GraphOps.louvain(TestGraph.partSupplierEdges(s, dir))
      .groupBy(col("community")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))

  /** B50 — modularityOptimization community-size profile (rows gate;
    * partitions aren't hash-comparable across implementations, the
    * quality gate is [[gModoptOk]]). */
  def gModopt(s: SparkSession, dir: String): DataFrame =
    GraphOps.modularityOptimization(TestGraph.partSupplierEdges(s, dir))
      .groupBy(col("community")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))

  /** B50 quality gate — the [[gModularity]] pattern: q_lpa pins the
    * closed-form Q arithmetic against the DuckDB replay, and the flag
    * pins that ONE flat move phase (no contraction) already clears the
    * LPA quality floor. Shares the modularity oracle verbatim. */
  def gModoptOk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val qLpa = GraphOps.modularity(e, GraphOps.labelPropagation(e, iters = 5))
    val qModopt = GraphOps.modularity(e, GraphOps.modularityOptimization(e))
    Seq((math.floor(qLpa * 1e6 + 0.5) / 1e6,
      if (qModopt >= qLpa) 1L else 0L)).toDF("q_lpa", "louvain_ge_lpa")
  }

  /** B22 gate — modularity() DuckDB-ORACLE-GATED: Q of the LPA
    * partition (the partition DuckDB can replay exactly — g_lpa's
    * recursive CTE), computed by [[GraphOps.modularity]] on the Spark
    * side and by the closed-form Q = internal/2m − Σtot²/(2m)² on the
    * oracle side from exact integer counts (identical doubles,
    * tie-safe rounded). Second column: the quality floor — louvain's Q
    * on the same graph must be ≥ the LPA partition's Q (louvain
    * optimizes Q; LPA doesn't) — the oracle pins it to 1, so a louvain
    * regression that drops below the LPA floor goes red in the gate. */
  def gModularity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val qLpa = GraphOps.modularity(e, GraphOps.labelPropagation(e, iters = 5))
    val qLouvain = GraphOps.modularity(e, GraphOps.louvain(e))
    Seq((math.floor(qLpa * 1e6 + 0.5) / 1e6,
      if (qLouvain >= qLpa) 1L else 0L)).toDF("q_lpa", "louvain_ge_lpa")
  }

  /** Quality gate for the forced-distributed Louvain: the
    * [[gModularity]] recipe with the louvain side forced distributed
    * (`localFinishEdges = 0`), sharing its oracle — q_lpa pins the
    * closed-form Q arithmetic, and `louvain_ge_lpa = 1` pins that the
    * DISTRIBUTED move/contraction rounds still beat the LPA floor
    * (partitions aren't hash-comparable across implementations;
    * their QUALITY is). */
  def gModularityDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val qLpa = GraphOps.modularity(e, GraphOps.labelPropagation(e, iters = 5))
    val qLouvainDist = GraphOps.modularity(e,
      GraphOps.louvain(e, localFinishEdges = 0L))
    Seq((math.floor(qLpa * 1e6 + 0.5) / 1e6,
      if (qLouvainDist >= qLpa) 1L else 0L)).toDF("q_lpa", "louvain_ge_lpa")
  }

  /** r10 — Leiden quality gate, the [[gModularity]] pattern: Leiden =
    * Louvain + connectivity refinement must still clear the LPA
    * quality floor (its partitions aren't hash-comparable; its QUALITY
    * is — the connectivity guarantee itself is pinned by the
    * cut-vertex fixture spec). */
  def gModularityLeiden(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = TestGraph.partSupplierEdges(s, dir)
    val qLpa = GraphOps.modularity(e, GraphOps.labelPropagation(e, iters = 5))
    val qLeiden = GraphOps.modularity(e, GraphOps.leiden(e))
    Seq((math.floor(qLpa * 1e6 + 0.5) / 1e6,
      if (qLeiden >= qLpa) 1L else 0L)).toDF("q_lpa", "louvain_ge_lpa")
  }

  /** Forced-distributed Louvain twin (see [[gPagerankDist]]'s rationale):
    * every level runs the distributed move/contraction rounds. */
  def gLouvainDist(s: SparkSession, dir: String): DataFrame =
    GraphOps.louvain(TestGraph.partSupplierEdges(s, dir), localFinishEdges = 0L)
      .groupBy(col("community")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))

  /** B24 — Leiden-guaranteed communities (Louvain + connectivity
    * refinement). Rows-only like `g_louvain`; the connectivity
    * guarantee itself is pinned by spec. */
  def gLeiden(s: SparkSession, dir: String): DataFrame =
    GraphOps.leiden(TestGraph.partSupplierEdges(s, dir))
      .groupBy(col("community")).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))

  /** B23 — FastRP node embeddings, composed with the E-suite shape:
    * embed the part—supplier graph, then top-3 cosine neighbors for a
    * deterministic query sample (broadcast queries, one corpus pass,
    * window top-k — E1's plan). Rows-only: float-sum ordering forbids
    * a hash oracle; the algorithm is pinned by the clique-structure
    * spec. */
  def gFastrp(s: SparkSession, dir: String): DataFrame = {
    // embed() returns an RDD-backed materialized leaf (Borrow.reclaim)
    // — both scans below read its blocks; re-persisting would only add
    // a redundant cache layer whose parallel first-computation races
    val emb = graft.graph.FastRP.embed(TestGraph.partSupplierEdges(s, dir), dim = 32)
    val q = emb.filter(pmod(xxhash64(col("id")), lit(50)) === 0)
      .select(col("id").as("q_id"), col("embedding").as("qe"))
    val scored = emb.join(broadcast(q), col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"),
        // native codegen cosine (graft.functions.CosineSimilarity) —
        // the HOF zip_with/aggregate twin interprets per element
        graft.functions.VectorFunctions.cosine_sim(s, col("qe"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("id").as("neighbor"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** J6 — Cypher WRITE surface end-to-end: build a graph from a
    * reference-shaped MERGE statement batched over the events table
    * (one parameter row per event), then read it back through
    * CypherLite. Edge MERGE dedups (user, type) pairs, so the oracle
    * is count(DISTINCT user) per type — a full write→read SQL gate. */
  def sgMerge(s: SparkSession, dir: String): DataFrame = {
    val (n0, e0) = graft.graph.CypherWrite.emptyGraph(s)
    val params = graft.Tables.events(s, dir)
      .select(col("user_id").cast("string").as("uid"), col("event_type").as("et"))
    val (n1, e1) = graft.graph.CypherWrite.merge(n0, e0,
      """MERGE (u:User {uid: $uid})
        |MERGE (t:EType {name: $et})
        |MERGE (u)-[:DID]->(t)""".stripMargin, params)
    graft.graph.CypherLite.run(n1, e1,
      "MATCH (u:User)-[:DID]->(t:EType) RETURN t, count(*) AS n ORDER BY t")
  }

  /** J6 delete-verb gate — build the user→event-type graph through
    * CypherWrite MERGE, retention-trim every 7th user with a batched
    * `DETACH DELETE` (the production idiom the verb exists for), and
    * read the surviving edges back through CypherLite. DuckDB twin
    * filters the same users out relationally. */
  def sgDelete(s: SparkSession, dir: String): DataFrame = {
    val (n0, e0) = graft.graph.CypherWrite.emptyGraph(s)
    val events = graft.Tables.events(s, dir)
    val params = events
      .select(col("user_id").cast("string").as("uid"), col("event_type").as("et"))
    val (n1, e1) = graft.graph.CypherWrite.merge(n0, e0,
      """MERGE (u:User {uid: $uid})
        |MERGE (t:EType {name: $et})
        |MERGE (u)-[:DID]->(t)""".stripMargin, params)
    val expired = events.filter(col("user_id") % 7 === 0)
      .select(col("user_id").cast("string").as("uid")).distinct()
    val (n2, e2) = graft.graph.CypherWrite.merge(n1, e1,
      "MATCH (u:User {uid: $uid}) DETACH DELETE u", expired)
    graft.graph.CypherLite.run(n2, e2,
      "MATCH (u:User)-[:DID]->(t:EType) RETURN t, count(*) AS n ORDER BY t")
  }

  /** J6 WHERE-in-write gate (r12) — the triage idiom hash-gated: build
    * the user→event-type graph through CypherWrite MERGE, flag uids
    * ending in '3' (mapless MATCH + WHERE + SET), retention-trim uids
    * starting with '1' (WHERE + DETACH DELETE), read the flagged
    * survivors back per type WITH a read-side predicate on the written
    * prop. DuckDB twin applies the same string predicates
    * relationally. */
  def sgWhere(s: SparkSession, dir: String): DataFrame = {
    val (n0, e0) = graft.graph.CypherWrite.emptyGraph(s)
    val params = graft.Tables.events(s, dir)
      .select(col("user_id").cast("string").as("uid"), col("event_type").as("et"))
    val (n1, e1) = graft.graph.CypherWrite.merge(n0, e0,
      """MERGE (u:User {uid: $uid})
        |MERGE (t:EType {name: $et})
        |MERGE (u)-[:DID]->(t)""".stripMargin, params)
    val (n2, e2) = graft.graph.CypherWrite.mergeOne(n1, e1,
      "MATCH (u:User) WHERE u.uid ENDS WITH '3' SET u.flagged = '1'")
    val (n3, e3) = graft.graph.CypherWrite.mergeOne(n2, e2,
      "MATCH (u:User) WHERE u.uid STARTS WITH '1' DETACH DELETE u")
    graft.graph.CypherLite.run(n3, e3,
      "MATCH (u:User)-[:DID]->(t:EType) WHERE u.flagged = '1' " +
        "RETURN t, count(*) AS n ORDER BY t")
  }

  /** J6 read→write composition gate (r12) — one statement aggregates
    * through the read pipeline and SETs the result back (the Neo4j
    * enrich-then-tag idiom), then a read with a numeric predicate on
    * the written prop. DuckDB twin: GROUP BY + HAVING. */
  def sgCompose(s: SparkSession, dir: String): DataFrame = {
    val (n0, e0) = graft.graph.CypherWrite.emptyGraph(s)
    val params = graft.Tables.events(s, dir)
      .select(col("user_id").cast("string").as("uid"), col("event_type").as("et"))
    val (n1, e1) = graft.graph.CypherWrite.merge(n0, e0,
      """MERGE (u:User {uid: $uid})
        |MERGE (t:EType {name: $et})
        |MERGE (u)-[:DID]->(t)""".stripMargin, params)
    val (n2, e2) = graft.graph.CypherWrite.runComposed(n1, e1,
      """MATCH (u:User)-[:DID]->(t:EType)
        |WITH u AS uid, count(*) AS n
        |MATCH (v:User {uid: uid}) SET v.breadth = n""".stripMargin)
    graft.graph.CypherLite.run(n2, e2,
      "MATCH (u:User) WHERE u.breadth >= 2 " +
        "RETURN u, u.breadth AS breadth ORDER BY u")
  }

  /** A3 analog (N1) — MERGE first-non-null node semantics: one node per
    * user carrying the properties of its earliest event (`min_by`,
    * map-side partial agg — shuffle is |users|, not |events|). */
  def n1NodeMerge(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), col("event_id")).as("first_type"),
        min_by(col("props"), col("event_id")).as("first_props"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** B6w — WEIGHTED PageRank (GDS relationshipWeightProperty) over
    * the symmetrized weighted part—supplier graph: contributions are
    * rank·w/Σw, everything else as `g_pagerank`. */
  def gWPagerank(s: SparkSession, dir: String): DataFrame = {
    val we = TestGraph.weightedPartSupplierEdges(s, dir)
    val sym = we.unionByName(
      we.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    GraphOps.pageRank(sym, iters = 10, weightCol = Some("w"))
      .select(col("id"), round(col("rank"), 4).as("rank"))
      .orderBy(col("rank").desc, col("id"))
      .limit(20)
  }

  /** B25 — eigenvector centrality of the part—supplier graph
    * (symmetrized power iteration, L2-normalized per round, 8 fixed
    * iterations so the recursive-CTE oracle replays it exactly). */
  def gEigen(s: SparkSession, dir: String): DataFrame =
    GraphOps.eigenvector(TestGraph.partSupplierEdges(s, dir), iters = 8)
      .select(col("id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(25)

  /** B26 — HITS hubs & authorities over the DIRECTED part→supplier
    * graph (parts are pure hubs, suppliers pure authorities — the
    * bipartite shape makes the split visible), Jacobi updates so the
    * two-reference recursive-CTE oracle matches step for step. */
  def gHits(s: SparkSession, dir: String): DataFrame =
    GraphOps.hits(TestGraph.partSupplierEdges(s, dir), iters = 8)
      .select(col("id"), round(col("hub"), 6).as("hub"),
        round(col("auth"), 6).as("auth"))
      .orderBy(col("hub").desc, col("auth").desc, col("id"))
      .limit(25)

  /** J7 — the GDS-style CALL procedure surface end-to-end: the same
    * PageRank computation as `g_pagerank`, requested TEXTUALLY
    * (`CALL graft.pageRank({...}) YIELD … RETURN …`) instead of
    * through the Scala API, against the same DuckDB recursive-CTE
    * oracle — proving CALL is a parser over the one engine, not a
    * second implementation. */
  def gCall(s: SparkSession, dir: String): DataFrame = {
    val e = TestGraph.partSupplierEdges(s, dir)
    val n = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().withColumn("label", lit("Node"))
      .withColumn("props", map())
    graft.graph.CypherLite.run(n, e,
      "CALL graft.pageRank({maxIterations: 10, orientation: 'UNDIRECTED'}) " +
        "YIELD id, score " +
        "RETURN id, round(score, 4) AS rank ORDER BY rank DESC, id LIMIT 20")
  }

  /** A4 analog (N2) — last-write-wins edge property semantics: one edge
    * per (user, event_type) carrying the latest value. */
  def n2EdgeMerge(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        round(max_by(col("value"), col("event_id")), 2).as("last_value"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("event_type"))
}
