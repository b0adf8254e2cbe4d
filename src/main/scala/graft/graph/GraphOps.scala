package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.jdk.CollectionConverters._

/** Generic distributed graph operators over edge DataFrames.
  *
  * Conventions: an edge frame has columns `src` and `dst` (any orderable
  * type); a vertex frame has column `id`. All operators are pure
  * DataFrame programs above the `localFinishEdges` gate — no
  * driver-side adjacency, no unbounded `collect()` — so they scale
  * with the cluster, not the driver. BELOW the gate (250k edge rows, a
  * few MB) the iterative algorithms switch to exact in-memory mirrors
  * ([[LocalGraph]]): at that size a distributed round is pure AQE
  * scheduling overhead, measured ~65 ms/stage-job at r8. Equivalence
  * specs force both paths and pin them equal.
  *
  * Capability analog: variable-length Cypher traversal
  * (`MATCH (a)-[:T*]->(b)`) and the Neo4j GDS algorithms users run on
  * graphs like the reference's (degree, WCC, PageRank).
  */
object GraphOps {

  /** Symmetrize a directed edge frame (for undirected algorithms). */
  def undirected(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** BFS from `sources` (a frame with column `id`) following `src`→`dst`.
    *
    * Returns (id, dist) with the minimal hop count. Frontier-based:
    * each round joins only the new frontier against the edge frame,
    * anti-joins already-visited vertices, and stops as soon as the
    * frontier empties (or `maxIter`). Frontiers are persisted and
    * lineage is truncated with `localCheckpoint` so round k doesn't
    * replay rounds 1..k-1.
    */
  def bfs(edges: DataFrame, sources: DataFrame, maxIter: Int = 20,
          localFinishEdges: Long = 250000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (LocalGraph.equatableId(e.schema("src").dataType) &&
        e.count() <= localFinishEdges) {
      // sources CAST to the edge id type before collecting: the local
      // HashMaps key on exact runtime values, while the distributed
      // joins coerce (Int seeds over Long edges would silently miss
      // locally); a cast that nulls out mirrors a join that can't match
      val idType = e.schema("src").dataType
      val roots = sources.select(col("id").cast(idType).as("id"))
        .filter(col("id").isNotNull).distinct()
        .limit(localFinishEdges.toInt + 1).collect().map(_.get(0))
      if (roots.length <= localFinishEdges) {
        val pairs = e.collect().map(r => (r.get(0), r.get(1)))
        e.unpersist()
        return LocalGraph.bfs(edges.sparkSession, pairs, roots, maxIter, idType)
      }
    }
    // distributed seed takes the same cast (one id dtype on both paths)
    val seed = sources.select(col("id").cast(e.schema("src").dataType).as("id"),
        lit(0).as("dist"))
      .filter(col("id").isNotNull).distinct().localCheckpoint()
    // visited = union of per-depth frontier frames, each already
    // checkpointed: anti-joining against the union of cached leaves
    // avoids re-materializing a growing visited frame every round
    // (one fewer Spark job per depth; the union plan is depth-deep but
    // every leaf is cached, so nothing recomputes)
    var frontiers = List(seed)
    var frontier = seed
    // localCheckpoint is eager (truncates lineage, which iterative
    // self-joins need); count() on the checkpointed frame doubles as
    // the emptiness check
    var frontierCount = frontier.count()
    var depth = 0
    while (depth < maxIter && frontierCount > 0) {
      depth += 1
      val visited = frontiers.map(_.select(col("id"))).reduce(_ unionByName _)
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"))
        .distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(false) // lazy: the count below materializes it
      frontierCount = next.count()
      if (frontierCount > 0) frontiers ::= next
      frontier = next
    }
    e.unpersist()
    frontiers.map(_.select(col("id"), col("dist"))).reduce(_ unionByName _)
  }

  /** Connected components by iterative min-label propagation.
    *
    * Returns (id, component) where component is the minimum vertex id
    * in the component. Converges in O(diameter) rounds with one shuffle
    * per round; early-stops when no label changes. (For adversarially
    * deep graphs the O(log n) star-contraction variant drops in behind
    * the same signature — diameter on real telemetry/co-occurrence
    * graphs is small, so label propagation is the cheaper default.)
    *
    * Local finisher (same rationale + bound as [[louvain]]'s,
    * measured at r8): under `localFinishEdges` symmetric edge rows —
    * a few MB — union-find on the driver replaces rounds of
    * label-propagation jobs whose cost at that size is pure AQE stage
    * scheduling. Identical contract (min member id), pinned by a
    * forced-path equivalence spec; ids of non-string/int/long types
    * always take the distributed path. `localFinishEdges = 0` forces
    * distributed. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
                          localFinishEdges: Long = 250000L): DataFrame = {
    val sym = undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val symCount = sym.count() // materializes the persist either way
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val idType = sym.schema("src").dataType
    val comparable = idType == StringType || idType == IntegerType || idType == LongType
    if (symCount <= localFinishEdges && comparable) {
      val spark = edges.sparkSession
      val pairs = sym.collect().map(r => (r.get(0), r.get(1)))
      sym.unpersist()
      import scala.collection.mutable
      val parent = mutable.Map.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(rb) = ra
      }
      val lt: (Any, Any) => Boolean = idType match {
        case StringType  => (a, b) => a.asInstanceOf[String] < b.asInstanceOf[String]
        case IntegerType => (a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int]
        case _           => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      }
      val minRep = mutable.Map.empty[Any, Any]
      parent.keys.foreach { n =>
        val r = find(n)
        if (!minRep.contains(r) || lt(n, minRep(r))) minRep(r) = n
      }
      val rows = parent.keys.toSeq
        .map(n => org.apache.spark.sql.Row(n, minRep(find(n))))
      return spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("id", idType), StructField("component", idType))))
    }
    var labels = sym.select(col("src").as("id"))
      .union(sym.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    // convergence proxy: labels only ever decrease under min-label
    // propagation, so the hash-sum over all labels changes whenever any
    // label changes (one cheap aggregation instead of a self-join).
    // Decimal accumulator: a long sum of random 64-bit hashes would
    // overflow under ANSI mode.
    def sig(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(xxhash64(col("id"), col("component")).cast("decimal(20,0)")))
        .collect()(0).getDecimal(0)
    var prevSig = sig(labels)
    var converged = false
    var iter = 0
    while (iter < maxIter && !converged) {
      iter += 1
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("component"))
      // (pointer-jumping shortcut measured net-negative here: the extra
      // self-join per round outweighs saved rounds on shallow telemetry
      // graphs; connectedComponentsStar covers adversarial-depth inputs)
      val next = labels.unionByName(msgs)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint(false) // lazy: the signature below materializes it
      val s = sig(next)
      converged = s.compareTo(prevSig) == 0
      prevSig = s
      labels = next
    }
    sym.unpersist()
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): converges in O(log n) rounds regardless of
    * graph diameter — the variant to use when the graph may contain
    * deep paths (label propagation needs O(diameter) rounds).
    *
    * Same contract as [[connectedComponents]]: (id, component) with
    * component = min vertex id of the component.
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val vertices = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    def sig(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(xxhash64(col("src"), col("dst")).cast("decimal(20,0)")))
        .collect()(0).getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var prevSig = sig(e)
    var converged = e.isEmpty
    var iter = 0
    while (iter < maxIter && !converged) {
      iter += 1
      // large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u})
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val e1 = sym.join(mins, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      // small-star on larger→smaller orientation: u and all smaller
      // neighbors link to m = min(Γ≤(u) ∪ {u})
      val dir = e1.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val mins2 = dir.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val withM = dir.join(mins2, Seq("src"))
      val small = withM.select(col("dst").as("v"), col("m"))
        .unionByName(mins2.select(col("src").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
        .localCheckpoint()
      val s = sig(small)
      converged = s.compareTo(prevSig) == 0
      prevSig = s
      e = small
    }
    val out = vertices
      .join(e.select(col("src").as("id"), col("dst").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .localCheckpoint()
    vertices.unpersist()
    out
  }

  /** PageRank by power iteration (standard damping formulation).
    * Returns (id, rank). Out-degrees are computed once; each round is
    * one join + one aggregation. */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
               localFinishEdges: Long = 250000L,
               weightCol: Option[String] = None): DataFrame = {
    // weighted variant (GDS relationshipWeightProperty): contributions
    // are rank·w/Σ_out w instead of rank/outdeg; distinct runs on the
    // (src, dst, w) TRIPLE, so parallel edges with different weights
    // stay distinct rows (their contributions sum), matching the
    // local mirror and the DuckDB twin
    val e = (weightCol match {
      case Some(wc) => edges.select(col("src"), col("dst"),
        col(wc).cast("double").as("w"))
      case None => edges.select(col("src"), col("dst"))
    }).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // bounded local finisher (see LocalGraph): below the gate the
    // power iteration is pure scheduling overhead distributed — the
    // count materializes the persist either way
    if (LocalGraph.equatableId(e.schema("src").dataType) &&
        e.count() <= localFinishEdges) {
      val idType = e.schema("src").dataType
      val out = weightCol match {
        case Some(_) =>
          // null weights: the distributed sums IGNORE them (both in
          // Σ_out w and contributions) while the endpoint still counts
          // as a vertex — NaN is the mirror's ignore sentinel
          val triples = e.collect().map(r => (r.get(0), r.get(1),
            if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
          LocalGraph.pageRankWeighted(edges.sparkSession, triples, iters, damping, idType)
        case None =>
          val pairs = e.collect().map(r => (r.get(0), r.get(1)))
          LocalGraph.pageRank(edges.sparkSession, pairs, iters, damping, idType)
      }
      e.unpersist()
      return out
    }
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    // r17 (guide §2.4 — remove per-round work, measured first; a
    // full-chain rewrite was tried and REGRESSED ~25%: under AQE every
    // stage re-optimizes the remaining plan, so one 50-stage query
    // costs more than ten 5-stage ones. What stays:)
    //  1. out-degrees PRE-JOINED into the cached edge frame — the
    //     per-round outDeg join (one exchange + SMJ × iters) drops;
    //     arithmetic is untouched (still rank/deg per edge row).
    //  2. the per-round |V|-row fill JOIN replaced by a UNION with the
    //     constant no-in-edge frame: sums covers exactly the vertices
    //     with ≥1 in-edge every round (every src holds a rank, so every
    //     dst receives a contribution), and a vertex with no in-edge
    //     has msum ≡ 0, i.e. the CONSTANT rank 1−d — same value, now a
    //     cached 0-exchange union instead of a join. Per-round plan:
    //     one equi-join + one aggregation, nothing else.
    val eod = e.join(
        (weightCol match {
          case Some(_) => e.groupBy(col("src")).agg(sum(col("w")).as("deg"))
          case None => e.groupBy(col("src")).count().withColumnRenamed("count", "deg")
        }), Seq("src"))
      .repartition(col("src")) // cached pre-partitioned on the join key:
      // the per-round join shuffles only the (tiny next to |E|) rank side
      .persist(StorageLevel.MEMORY_AND_DISK)
    val noIn = vertices.join(e.select(col("dst").as("id")).distinct(),
        Seq("id"), "left_anti")
      .select(col("id"), lit(1 - damping).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.withColumn("rank", lit(1.0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = eod.join(ranks, eod("src") === ranks("id"))
        .select(col("dst").as("id"),
          (weightCol match {
            case Some(_) => col("rank") * col("w") / col("deg")
            case None => col("rank") / col("deg")
          }).as("contrib"))
      val sums = contribs.groupBy(col("id")).agg(sum(col("contrib")).as("msum"))
      // coalesce stays: on the WEIGHTED path a vertex whose every
      // in-contribution is null (all-null weights) sums to NULL and
      // must land on the base 1−d, exactly as the fill join did
      ranks = sums
        .select(col("id"),
          (lit(1 - damping) + lit(damping) * coalesce(col("msum"), lit(0.0))).as("rank"))
        .unionByName(noIn)
        .localCheckpoint()
    }
    graft.Borrow.reclaim(ranks, e, vertices, eod, noIn)
  }

  /** B49 — ArticleRank (gds.articleRank): the PageRank variant that
    * damps low-out-degree amplification by dividing each contribution
    * by `outDeg(u) + avgOutDeg` instead of `outDeg(u)` (avgOutDeg =
    * |E|/|V| over the distinct edge set — dangling vertices count in
    * |V|, exactly the GDS average). Same house conventions as [[pageRank]]
    * (init 1.0, base `1−d`, no dangling redistribution, edge-derived
    * vertex set); the DuckDB twin replays the iteration verbatim, so
    * the convention is oracle-pinned rather than GDS-number-matched.
    * Per round: one equi-join + one aggregation on (src)-keyed frames
    * — the avg is a single scalar folded as a literal, so the 100 TB
    * plan is exactly pageRank's. Returns (id, rank). */
  def articleRank(edges: DataFrame, iters: Int = 10,
                  damping: Double = 0.85,
                  localFinishEdges: Long = 250000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded local finisher (the pageRank rule — below the gate the
    // power iteration is pure AQE scheduling overhead distributed)
    if (LocalGraph.equatableId(e.schema("src").dataType) &&
        e.count() <= localFinishEdges) {
      val idType = e.schema("src").dataType
      val pairs = e.collect().map(r => (r.get(0), r.get(1)))
      e.unpersist()
      return LocalGraph.articleRank(spark, pairs, iters, damping, idType)
    }
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nV = vertices.count()
    if (nV == 0) {
      val out = vertices.select(col("id"), lit(1.0).as("rank")).limit(0)
      return graft.Borrow.reclaim(out, e, vertices)
    }
    val avgOutDeg = e.count().toDouble / nV
    // r17 — the pageRank per-round shape: out-degrees pre-joined into
    // the cached (src-partitioned) edge frame, the per-round fill join
    // replaced by the constant no-in-edge union (msum ≡ 0 there ⇒ rank
    // ≡ 1−d). One equi-join + one aggregation per round; arithmetic
    // unchanged, oracle-pinned.
    val eod = e.join(
        e.groupBy(col("src")).count().withColumnRenamed("count", "deg"),
        Seq("src"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val noIn = vertices.join(e.select(col("dst").as("id")).distinct(),
        Seq("id"), "left_anti")
      .select(col("id"), lit(1 - damping).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.withColumn("rank", lit(1.0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = eod.join(ranks, eod("src") === ranks("id"))
        .select(col("dst").as("id"),
          (col("rank") / (col("deg") + lit(avgOutDeg))).as("contrib"))
      val sums = contribs.groupBy(col("id")).agg(sum(col("contrib")).as("msum"))
      ranks = sums
        .select(col("id"),
          (lit(1 - damping) + lit(damping) * col("msum")).as("rank"))
        .unionByName(noIn)
        .localCheckpoint()
    }
    graft.Borrow.reclaim(ranks, e, vertices, eod, noIn)
  }

  /** B25 — eigenvector centrality (Neo4j GDS catalog staple): power
    * iteration x_{t+1} = normalize(A x_t) over the SYMMETRIZED graph,
    * L2-normalized per iteration (keeps magnitudes bounded at any
    * iteration count / degree scale — normalizing once at the end
    * would overflow doubles around degree^iters ≈ 1e308). One
    * equi-join + aggregation per iteration; the norm is a scalar agg
    * riding the same materialization (louvain's one-action-per-round
    * rule). Returns (id, score) for every vertex. */
  def eigenvector(edges: DataFrame, iters: Int = 8,
                  localFinishEdges: Long = 250000L,
                  weightCol: Option[String] = None): DataFrame = {
    // weighted: s(v) = Σ w(u,v)·x(u) over the weighted symmetrization.
    // BOTH variants share [[weightedSymInput]]'s input contract (ids
    // cast to string, self-loops dropped, reciprocal directed pairs
    // occurrence-summed) so setting relationshipWeightProperty never
    // changes the yielded id dtype or the vertex set; per-iteration L2
    // normalization is scale-invariant, so a uniform weight reproduces
    // the unweighted scores exactly on graphs without reciprocal
    // directed pairs (spec-pinned; reciprocal pairs sum occurrences by
    // the louvain-shared contract)
    val sym = weightedSymInput(edges, weightCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (LocalGraph.equatableId(sym.schema("src").dataType) &&
        sym.count() <= localFinishEdges) {
      val idType = sym.schema("src").dataType
      val out = weightCol match {
        case Some(_) =>
          val triples = sym.collect().map(r => (r.get(0), r.get(1), r.getDouble(2)))
          LocalGraph.eigenvectorWeighted(edges.sparkSession, triples, iters, idType)
        case None =>
          val pairs = sym.collect().map(r => (r.get(0), r.get(1)))
          LocalGraph.eigenvector(edges.sparkSession, pairs, iters, idType)
      }
      sym.unpersist()
      return out
    }
    val vertices = sym.select(col("src").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // symmetric: src covers all
    var x = vertices.withColumn("x", lit(1.0)).localCheckpoint()
    for (_ <- 1 to iters) {
      val s = sym.join(x, sym("src") === x("id"))
        .groupBy(sym("dst").as("id"))
        .agg((weightCol match {
          case Some(_) => sum(col("w") * col("x"))
          case None => sum(col("x"))
        }).as("s"))
      val s2 = vertices.join(s, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
        .localCheckpoint(false)
      // the norm agg materializes the lazy checkpoint — one action/round
      val n2 = s2.agg(sum(col("s") * col("s"))).collect()(0).getDouble(0)
      val norm = math.sqrt(n2)
      x = s2.select(col("id"),
        (if (norm == 0.0) col("s") else col("s") / lit(norm)).as("x"))
    }
    graft.Borrow.reclaim(x.select(col("id"), col("x").as("score")), sym, vertices)
  }

  /** B26 — HITS hubs & authorities (Kleinberg), JACOBI form: both
    * scores advance from the previous iteration's values —
    * a_{t+1} = normalize(Aᵀ h_t), h_{t+1} = normalize(A a_t) — the
    * single-recursive-reference shape the DuckDB oracle can replay.
    * Directed input; one equi-join + aggregation per score per
    * iteration, norms riding the materializing aggs. Returns
    * (id, hub, auth) for every vertex (no out-edges → hub 0, no
    * in-edges → auth 0). */
  def hits(edges: DataFrame, iters: Int = 8,
           localFinishEdges: Long = 250000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (LocalGraph.equatableId(e.schema("src").dataType) &&
        e.count() <= localFinishEdges) {
      val idType = e.schema("src").dataType
      val pairs = e.collect().map(r => (r.get(0), r.get(1)))
      e.unpersist()
      return LocalGraph.hits(edges.sparkSession, pairs, iters, idType)
    }
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var h = vertices.withColumn("v", lit(1.0)).localCheckpoint()
    var a = h
    for (_ <- 1 to iters) {
      def step(state: DataFrame, joinOn: String, outOn: String): DataFrame = {
        val s = e.join(state, e(joinOn) === state("id"))
          .groupBy(e(outOn).as("id")).agg(sum(col("v")).as("s"))
        val s2 = vertices.join(s, Seq("id"), "left")
          .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
          .localCheckpoint(false)
        val norm = math.sqrt(s2.agg(sum(col("s") * col("s"))).collect()(0).getDouble(0))
        s2.select(col("id"),
          (if (norm == 0.0) col("s") else col("s") / lit(norm)).as("v"))
      }
      val aNext = step(h, "src", "dst") // auth from previous hubs
      val hNext = step(a, "dst", "src") // hub from previous auths
      a = aNext
      h = hNext
    }
    graft.Borrow.reclaim(
      h.select(col("id"), col("v").as("hub"))
        .join(a.select(col("id"), col("v").as("auth")), Seq("id")),
      e, vertices)
  }

  /** Synchronous label-propagation community detection (Neo4j GDS LPA),
    * made DETERMINISTIC: each round every vertex adopts its neighbors'
    * strongest label — the most frequent one unweighted, the largest
    * Σ edgeWeight·nodeWeight(voter) weighted — ties broken by the
    * smaller label, so runs are reproducible (async LPA, the textbook
    * version, is not). Fixed round count; one join + two aggregations
    * per round. Returns (id, community).
    *
    * GDS parity (r14): `weightCol` is `relationshipWeightProperty`
    * (votes scale with the edge weight; input contract like
    * [[louvain]] — a directed edge list whose undirected weight is
    * the sum of its directed occurrences after triple-dedup, self-
    * loops dropped), `nodeWeights` is `nodeWeightProperty` as an
    * (id, nw) frame (a voter's label counts nw-fold; vertices absent
    * from the frame weigh 1). Both must be strictly positive — a
    * zero/negative weight would silently erase or invert votes, so
    * it's loud (one limit-1 probe each, the house rule).
    *
    * The weighted path always runs the DISTRIBUTED rounds (the local
    * finisher mirrors the unweighted vote only), so its sql gate
    * doubles as the forced-distributed check the unweighted twin gets
    * from `localFinishEdges = 0`. Weighted determinism matches the
    * oracle exactly when weight products are integer-representable
    * (the gate's fixtures are); arbitrary floats follow the standard
    * FP-sum caveat. */
  def labelPropagation(edges: DataFrame, iters: Int = 5,
                       localFinishEdges: Long = 250000L,
                       weightCol: Option[String] = None,
                       nodeWeights: Option[DataFrame] = None): DataFrame = {
    val weighted = weightCol.nonEmpty || nodeWeights.nonEmpty
    // unweighted input is EXACTLY the r12 construction (id type and
    // self-loop semantics preserved); weighted goes through the louvain
    // contract (string ids, self-loops dropped, directed weights sum)
    val sym = (
      if (!weighted) undirected(edges).withColumn("w", lit(1.0))
      else if (weightCol.nonEmpty) weightedSymInput(edges, weightCol)
      else weightedSymInput(edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")), None) // node-weights-only:
      // string ids so the nw join below matches (the louvain contract)
    ).repartition(col("src")) // r17: cached pre-partitioned on the
      // per-round vote-join key — the round's join shuffles only the
      // (|V|-row) label side, not the edge frame (the broadcast nw
      // join below preserves this partitioning on the weighted path)
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (weighted) {
      require(sym.filter(col("w").isNull || col("w") <= 0).limit(1).count() == 0,
        s"labelPropagation: weight column '${weightCol.getOrElse("w")}' must " +
          "be strictly positive on every edge (zero/negative weights " +
          "silently erase or invert votes)")
    }
    val nwFrame = nodeWeights.map { nw0 =>
      val nw = nw0.select(col("id").cast("string").as("id"),
        col("nw").cast("double").as("nw"))
      require(nw.filter(col("nw").isNull || col("nw") <= 0).limit(1).count() == 0,
        "labelPropagation: nodeWeights.nw must be strictly positive on " +
          "every row (zero/negative weights silently erase or invert votes)")
      nw.persist(StorageLevel.MEMORY_AND_DISK)
    }
    val idType = sym.schema("src").dataType
    LocalGraph.orderingFor(idType) match {
      case Some(lt) if !weighted && sym.count() <= localFinishEdges =>
        val pairs = sym.collect().map(r => (r.get(0), r.get(1)))
        sym.unpersist()
        return LocalGraph.labelPropagation(edges.sparkSession, pairs, iters, idType, lt)
      case _ =>
    }
    // voter-side weight rider: edge weight × the SOURCE vertex's node
    // weight (the voter's), defaulting to 1 when absent
    val symW = nwFrame match {
      case Some(nw) =>
        sym.join(nw.select(col("id").as("src"), col("nw")), Seq("src"), "left")
          .select(col("src"), col("dst"),
            (col("w") * coalesce(col("nw"), lit(1.0))).as("w"))
      case None => sym
    }
    var labels = sym.select(col("src").as("id")).union(sym.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("community"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val counted = symW.join(labels, symW("src") === labels("id"))
        .groupBy(symW("dst").as("v"), col("community"))
        .agg(sum(col("w")).as("cnt"))
      // max vote weight, then min label: max_by on (cnt, negated-order
      // label) isn't expressible generically for strings, so use
      // min_by over (-cnt, label) lexicographic struct ordering.
      // r17: the per-round isolated-vertex fill JOIN is gone — the
      // input is ALWAYS symmetrized (undirected()/weightedSymInput),
      // so every vertex is a dst and receives votes every round; the
      // vote aggregation's id set IS the vertex set, and the old
      // left-join + coalesce was a structural no-op costing one join +
      // exchange per round.
      labels = counted
        .groupBy(col("v").as("id"))
        .agg(min_by(col("community"),
          struct((-col("cnt")).as("nc"), col("community").as("l"))).as("community"))
        .localCheckpoint()
    }
    sym.unpersist()
    nwFrame.foreach(_.unpersist())
    labels
  }

  /** B21 — Louvain modularity communities, as keyed frames.
    *
    * Parallel Louvain: per LEVEL, a few rounds of simultaneous local
    * moves (each node scores every neighbor community c by the
    * standard gain  k_{u,c} − k_u·Σ'_tot(c)/2m  and moves to the
    * argmax when it strictly beats staying), then the graph CONTRACTS
    * — communities become super-nodes, parallel edges sum their
    * weights, internal edges accumulate into self-loop weight — and
    * the next level runs on the (much smaller) contracted graph.
    *
    * Determinism + convergence: simultaneous moves oscillate on
    * symmetric shapes (two nodes endlessly swapping into each other's
    * community), so rounds alternate move DIRECTION — even rounds take
    * only moves to a smaller community id, odd rounds only to a larger
    * one (a hash-parity gate is NOT enough: two same-parity nodes can
    * still pairwise-swap; opposite directions cannot). Deterministic
    * across runs; gain ties break to the smallest community id, and
    * community labels canonicalize to the smallest member id at each
    * contraction.
    *
    * Scale shape: every step is an equi-join + aggregation keyed on
    * node or community id over the CURRENT level's edge frame —
    * nothing is per-community or driver-side, and each contraction
    * shrinks the frame the next level iterates on (the classic Louvain
    * cost profile: level 1 dominates). Input edges are symmetrized and
    * deduplicated here; weights are 1 per undirected edge. Returns
    * (id, community) for every non-isolated vertex, community = the
    * smallest member id.
    *
    * Local finisher: once a level's edge list fits under
    * `localFinishEdges` symmetric rows (a few MB — bounded, like the
    * nlist-sized centroid collect in IVF), the REMAINING levels run
    * on the driver through an exact in-memory mirror of the same move
    * semantics (same gain formula, tie-breaks, direction gate, 95%
    * stop — a spec pins distributed ≡ local on forced-path runs).
    * Rationale, measured at r8: a move round is ~15 AQE stage-jobs at
    * ~65 ms driver overhead each, so a contracted level of a few
    * thousand super-nodes costs seconds of pure scheduling for
    * milliseconds of arithmetic. At 100 TB level 1 is far above the
    * bound and runs fully distributed; contraction shrinks levels
    * geometrically toward the local path. Set `localFinishEdges = 0`
    * to force every level distributed. */
  def louvain(edges0: DataFrame, maxLevels: Int = 2, moveIters: Int = 3,
              localFinishEdges: Long = 250000L, refine: Boolean = false,
              weightCol: Option[String] = None): DataFrame = {
    // weighted (GDS relationshipWeightProperty): the move/contraction
    // machinery below is already weight-generic — only the input
    // construction differs (see [[weightedSymInput]]).
    var e = weightedSymInput(edges0, weightCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-super-node internal (self-loop) weight; zero at level 0.
    // Checkpoints below are LAZY (eager = false): each severs lineage
    // in the plan immediately but materializes as a side effect of the
    // level's next scalar job, so the whole run pays one driver
    // barrier per move round + two per contraction instead of the r7
    // shape's two-per-round (r8: g_louvain was the slowest bench
    // entry, dominated by barrier count at toy scale).
    var self = e.select(col("src").as("id")).distinct()
      .withColumn("sw", lit(0.0)).localCheckpoint(false)
    var mapping = e.select(col("src").as("id")).distinct()
      .select(col("id").as("orig"), col("id").as("cur")).localCheckpoint(false)
    // 2m: conserved across contractions (edge weight folds into self
    // weight, both count twice in Σk) — plus the level-1 vertex count,
    // one job for the whole run. Null sum = no surviving edges (empty
    // or all-self-loop input): every vertex is isolated, return the
    // empty frame rather than NPE.
    val m2row = e.agg(sum(col("w")), countDistinct(col("src")), count(lit(1)))
      .collect()(0)
    if (m2row.isNullAt(0)) {
      e.unpersist()
      return mapping.select(col("orig").as("id"), col("cur").as("community"))
    }
    val m2 = m2row.getDouble(0)
    // current level's node count: |V| at level 1, then = the previous
    // level's community count (communities become the super-nodes)
    var nNodes = m2row.getLong(1)
    // current level's symmetric edge-row count (rides the same jobs)
    var eRows = m2row.getLong(2)
    var level = 0
    var done = false
    // Leiden interleaving (refine = true): the initial community of
    // each super-node at level > 1 is its PARENT coarse community from
    // the previous level's move phase — contraction is by the REFINED
    // (connectivity-split) partition, so the move phase resumes from
    // the coarse partition instead of singletons (Traag et al. 2019).
    var init: Option[DataFrame] = None
    while (level < maxLevels && !done) {
      if (eRows <= localFinishEdges) {
        // ---- local finisher: run the remaining levels on the driver
        val eArr = e.select(col("src"), col("dst"), col("w")).collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        val swMap = self.select(col("id"), col("sw")).collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        val initMap = init.map(_.collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap).getOrElse(Map.empty[String, String])
        val assignLocal =
          louvainLocalFinish(eArr, swMap, m2, maxLevels - level, moveIters, nNodes,
            initMap, refine)
        val spark = e.sparkSession
        val assignDf = spark.createDataFrame(
            assignLocal.toSeq.map(p => org.apache.spark.sql.Row(p._1, p._2)).asJava,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("cur",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("c",
                org.apache.spark.sql.types.StringType))))
        // EAGER: materialize while e is still persisted (the full-local
        // case never materialized mapping's lazy checkpoint)
        mapping = mapping.join(broadcast(assignDf), Seq("cur"))
          .select(col("orig"), col("c").as("cur")).localCheckpoint()
        done = true
      } else {
      level += 1
      // comm state carries (id, cu, k) in ONE checkpointed frame — k is
      // constant within a level, and riding along kills two joins per
      // move round; k_u = adjacent weight + twice the internal weight
      // (level 1 has no internal weight yet — skip the self join on
      // the biggest level's frame)
      val kBase = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("kadj"))
      val kFrame = if (level == 1)
          kBase.select(col("id"), col("kadj").as("k"))
        else kBase.join(self, Seq("id"), "full")
          .select(col("id"),
            (coalesce(col("kadj"), lit(0.0)) + lit(2.0) * coalesce(col("sw"), lit(0.0))).as("k"))
      var comm = (init match {
        case Some(i0) => kFrame.join(i0, Seq("id"), "left")
          .select(col("id"), coalesce(col("cu0"), col("id")).as("cu"), col("k"))
        case None => kFrame.select(col("id"), col("id").as("cu"), col("k"))
      }).localCheckpoint(false) // materialized by round 1's move job
      var moves = 1L
      var it = 0
      while (it < moveIters && moves > 0) {
        // Σ_tot per community (small: ≤ |V| rows, broadcastable)
        val ctot = comm.groupBy(col("cu").as("c")).agg(sum(col("k")).as("tot"))
        // weight from u into each NEIGHBOR community, scored in place;
        // u's own community (when adjacent) scores with Σ'_tot = tot−k
        val nbr = e.join(comm.select(col("id").as("dst"), col("cu").as("c")), Seq("dst"))
          .groupBy(col("src").as("id"), col("c")).agg(sum(col("w")).as("wc"))
          .join(ctot, Seq("c")).join(comm, Seq("id"))
          .withColumn("gain", col("wc") - col("k") *
            when(col("c") === col("cu"), col("tot") - col("k")).otherwise(col("tot")) / lit(m2))
        // ONE aggregation yields both the argmax move target (gain desc,
        // community id asc on ties) and the stay-gain when u has
        // neighbors at home; the no-home-neighbor stay-gain (wc = 0)
        // is computed directly from Σ_tot(cu) below
        val agg = nbr.groupBy(col("id")).agg(
          min_by(struct(col("c").as("c"), col("gain").as("g")),
            struct((-col("gain")).as("ng"), col("c").as("tc"))).as("b"),
          max(when(col("c") === col("cu"), col("gain"))).as("ghome"))
        val dirOk = if (it % 2 == 0) col("b.c") < col("cu") else col("b.c") > col("cu")
        val nxt = comm
          .join(ctot.select(col("c").as("cu"), col("tot").as("totcu")), Seq("cu"))
          .join(agg, Seq("id"), "left") // isolated supers have no nbr rows
          .withColumn("gstay",
            coalesce(col("ghome"), -col("k") * (col("totcu") - col("k")) / lit(m2)))
          .withColumn("cnext",
            when(col("b").isNotNull && col("b.c") =!= col("cu") &&
                col("b.g") > col("gstay") + lit(1e-9) && dirOk,
              col("b.c")).otherwise(col("cu")))
          .select(col("id"), col("cu"), col("cnext"), col("k"))
          .localCheckpoint(false)
        // ONE action per round: the move count rides the aggregation
        // that materializes the lazy checkpoint (r7 ran an eager
        // checkpoint THEN a count — two barriers per round)
        moves = nxt.agg(count(when(col("cnext") =!= col("cu"), lit(1))))
          .collect()(0).getLong(0)
        comm = nxt.select(col("id"), col("cnext").as("cu"), col("k"))
        it += 1
      }
      // canonical label = smallest member id (deterministic across runs)
      val canon = comm.groupBy(col("cu")).agg(min(col("id")).as("cc"))
      val assign = comm.join(canon, Seq("cu"))
        .select(col("id"), col("cc").as("c")).localCheckpoint(false)
      // Refined contraction partition (Leiden): each coarse community
      // splits into its connected components within its own induced
      // subgraph; `rf` labels canonicalize to the smallest member (the
      // CC contract), so the coarse label c is always itself an rf
      // label — the coarse partition stays expressible over the
      // refined super-nodes, which is what lets the next level resume
      // from it. Computed only when a contraction will follow.
      val nComms0 =
        if (refine) assign.agg(countDistinct(col("c"))).collect()(0).getLong(0) else -1L
      if (!refine) {
        mapping = mapping.join(assign.select(col("id").as("cur"), col("c")), Seq("cur"))
          .select(col("orig"), col("c").as("cur")).localCheckpoint(false)
      }
      // one job per level: the community count rides the aggregation
      // that materializes mapping's checkpoint (and, transitively,
      // assign's), so the returned frame never has to recompute from
      // the by-then-unpersisted edge frame. distinct(mapping.cur) ==
      // distinct(assign.c): both are the canonical community labels.
      // (With refine, the coarse count came from assign above and
      // mapping updates AFTER the refinement below.)
      val nComms =
        if (refine) nComms0
        else mapping.agg(countDistinct(col("cur"))).collect()(0).getLong(0)
      // stop on no merge (converged) or a MARGINAL contraction: when
      // fewer than 5% of nodes merged, another level of move rounds on
      // a barely-smaller graph buys noise, not modularity. Also stop
      // when this was the last level — contracting a graph no further
      // level will read is wasted shuffle (r7 paid it).
      if (nComms >= (nNodes * 0.95).toLong || level == maxLevels) {
        if (refine) {
          // final level reports the COARSE partition; materialize the
          // mapping (small agg) before e unpersists below
          mapping = mapping.join(assign.select(col("id").as("cur"), col("c")), Seq("cur"))
            .select(col("orig"), col("c").as("cur")).localCheckpoint(false)
          mapping.agg(count(lit(1))).collect()
        }
        done = true
      }
      else {
        // contract: communities become super-nodes; internal edges
        // (counted twice in the symmetric list) fold into self weight
        val a2 = if (!refine) assign else {
          val intra = e
            .join(assign.select(col("id").as("src"), col("c").as("cs")), Seq("src"))
            .join(assign.select(col("id").as("dst"), col("c").as("cd")), Seq("dst"))
            .filter(col("cs") === col("cd"))
            .select(col("src"), col("dst"))
          val comps = connectedComponents(intra, localFinishEdges = localFinishEdges)
          val refA = assign
            .join(comps.select(col("id"), col("component")), Seq("id"), "left")
            .select(col("id"), coalesce(col("component"), col("id")).as("rf"), col("c"))
            .localCheckpoint(false)
          mapping = mapping.join(refA.select(col("id").as("cur"), col("rf")), Seq("cur"))
            .select(col("orig"), col("rf").as("cur")).localCheckpoint(false)
          // materializes mapping + refA before the old e unpersists;
          // the distinct rf count is the next level's node count
          nNodes = mapping.agg(countDistinct(col("cur"))).collect()(0).getLong(0)
          init = Some(refA.select(col("rf").as("id"), col("c").as("cu0"))
            .distinct().localCheckpoint(false))
          refA.select(col("id"), col("rf").as("c"))
        }
        val eC = e.join(a2.select(col("id").as("src"), col("c").as("cs")), Seq("src"))
          .join(a2.select(col("id").as("dst"), col("c").as("cd")), Seq("dst"))
          .select(col("cs"), col("cd"), col("w"))
        val newSelf = eC.filter(col("cs") === col("cd"))
          .groupBy(col("cs").as("id")).agg((sum(col("w")) / 2).as("swe"))
          .join(self.join(a2, Seq("id"))
            .groupBy(col("c").as("id")).agg(sum(col("sw")).as("sws")), Seq("id"), "full")
          .select(col("id"),
            (coalesce(col("swe"), lit(0.0)) + coalesce(col("sws"), lit(0.0))).as("sw"))
          // EAGER: lineage reads the old level's e, which unpersists
          // below — lazy here would recompute that frame from scratch
          .localCheckpoint()
        val newE = eC.filter(col("cs") =!= col("cd"))
          .groupBy(col("cs").as("src"), col("cd").as("dst")).agg(sum(col("w")).as("w"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        eRows = newE.count() // materialize before the old frame goes away
        e.unpersist()
        e = newE
        self = newSelf
        if (!refine) nNodes = nComms // refine set nNodes = |distinct rf| above
      }
      }
    }
    e.unpersist()
    mapping.select(col("orig").as("id"), col("cur").as("community"))
  }

  /** Driver-side mirror of [[louvain]]'s per-level semantics, applied
    * to a collected sub-`localFinishEdges` (contracted) graph: same
    * simultaneous moves, gain formula, ε = 1e-9 move margin,
    * direction-alternating rounds, smallest-id tie-breaks and
    * canonical labels, 95% contraction stop. String comparisons use
    * Java ordering ≡ Spark's UTF8String binary ordering for the ASCII
    * ids this engine produces. All sums are of integral edge weights,
    * so double arithmetic is exact and the two paths agree bitwise —
    * pinned by the forced-path equivalence spec.
    * Returns current-level node id → final canonical community. */
  private def louvainLocalFinish(
      edgesSym: Array[(String, String, Double)],
      self0: Map[String, Double], m2: Double, levelsLeft: Int,
      moveIters: Int, nNodes0: Long,
      init0: Map[String, String] = Map.empty,
      refine: Boolean = false): Map[String, String] = {
    import scala.collection.mutable
    var eArr = edgesSym
    var sw = self0
    var nNodes = nNodes0
    var curInit = init0
    val entryNodes = (eArr.iterator.map(_._1) ++ sw.keysIterator).toSet
    var toCur: mutable.Map[String, String] =
      mutable.Map(entryNodes.iterator.map(n => n -> n).toSeq: _*)
    var level = 0
    var done = false
    while (level < levelsLeft && !done) {
      level += 1
      val nodes = (eArr.iterator.map(_._1) ++ sw.keysIterator).toSet.toArray
      val kadj = mutable.Map.empty[String, Double].withDefaultValue(0.0)
      eArr.foreach { case (s, _, w) => kadj(s) += w }
      val k = nodes.iterator
        .map(n => n -> (kadj(n) + 2.0 * sw.getOrElse(n, 0.0))).toMap
      var comm: Map[String, String] =
        nodes.iterator.map(n => n -> curInit.getOrElse(n, n)).toMap
      var moves = 1L
      var it = 0
      while (it < moveIters && moves > 0) {
        val ctot = mutable.Map.empty[String, Double].withDefaultValue(0.0)
        nodes.foreach(n => ctot(comm(n)) += k(n))
        // wc: weight from u into each neighbor community
        val wc = mutable.Map.empty[String, mutable.Map[String, Double]]
        eArr.foreach { case (s, d, w) =>
          val m = wc.getOrElseUpdate(s, mutable.Map.empty.withDefaultValue(0.0))
          m(comm(d)) += w
        }
        var moved = 0L
        val nxt = nodes.iterator.map { n =>
          val cu = comm(n); val kn = k(n)
          var bestC: String = null; var bestG = 0.0; var ghome = Double.NaN
          wc.get(n).foreach(_.foreach { case (c, w) =>
            val g = w - kn *
              (if (c == cu) ctot(c) - kn else ctot(c)) / m2
            if (c == cu) ghome = g
            if (bestC == null || g > bestG || (g == bestG && c < bestC)) {
              bestC = c; bestG = g
            }
          })
          val gstay = if (!ghome.isNaN) ghome
                      else -kn * (ctot(cu) - kn) / m2
          val dirOk = if (it % 2 == 0) bestC != null && bestC < cu
                      else bestC != null && bestC > cu
          val cnext = if (bestC != null && bestC != cu &&
                          bestG > gstay + 1e-9 && dirOk) bestC else cu
          if (cnext != cu) moved += 1
          n -> cnext
        }.toMap
        moves = moved
        comm = nxt
        it += 1
      }
      // canonical label = smallest member id
      val canon = mutable.Map.empty[String, String]
      nodes.foreach { n =>
        val c = comm(n)
        if (!canon.contains(c) || n < canon(c)) canon(c) = n
      }
      val assign: Map[String, String] =
        nodes.iterator.map(n => n -> canon(comm(n))).toMap
      val nComms = assign.values.toSet.size
      if (nComms >= (nNodes * 0.95).toLong || level == levelsLeft) {
        toCur = toCur.map { case (orig, cur) => orig -> assign(cur) }
        done = true
      }
      else {
        // contraction partition: coarse (Louvain) or connectivity-
        // refined (Leiden) — mirror of the distributed branch
        val contract: String => String =
          if (!refine) assign
          else LocalGraph.unionFindMinLabel(eArr.iterator.collect {
            case (s, d, _) if assign(s) == assign(d) => (s, d)
          })
        toCur = toCur.map { case (orig, cur) => orig -> contract(cur) }
        if (refine) {
          // next level resumes from the coarse partition over the
          // refined super-nodes (rf label of a coarse canon IS itself)
          curInit = nodes.iterator.map(n => contract(n) -> assign(n)).toMap
        }
        val newEAgg = mutable.Map.empty[(String, String), Double]
          .withDefaultValue(0.0)
        val newSelf = mutable.Map.empty[String, Double].withDefaultValue(0.0)
        eArr.foreach { case (s, d, w) =>
          val cs = contract(s); val cd = contract(d)
          if (cs == cd) newSelf(cs) += w / 2.0
          else newEAgg((cs, cd)) += w
        }
        sw.foreach { case (n, w) => newSelf(contract(n)) += w }
        // every community gets a self entry (even weight 0), mirroring
        // the distributed full join that keeps isolated super-nodes
        nodes.foreach(n => newSelf(contract(n)) += 0.0)
        eArr = newEAgg.iterator.map { case ((s, d), w) => (s, d, w) }.toArray
        sw = newSelf.toMap
        nNodes = if (refine) newSelf.size.toLong else nComms.toLong
      }
    }
    toCur.toMap
  }

  /** B24 — Leiden-style refinement (Traag, Waltman & van Eck 2019,
    * "From Louvain to Leiden"): the guarantee Louvain lacks is that
    * every community is internally CONNECTED — a local move can pull
    * the cut vertex out of its community and leave the rest in two
    * pieces that still share a label. This pass restores the paper's
    * connectivity guarantee over a FINISHED partition: each community
    * splits into its connected components within the community's own
    * induced subgraph. [[leiden]] interleaves the same rule BETWEEN
    * levels (`louvain(refine = true)`) and applies this pass once at
    * the end for the final level's moves.
    *
    * Scale shape: two equi-joins tag each edge with its endpoints'
    * communities, the intra-community edge subset runs one
    * [[connectedComponents]] (label-prop rounds bounded by the largest
    * community's diameter — small by construction), and members whose
    * every edge leaves their community become singletons. Returns
    * (id, community), community = smallest member id — same contract
    * as [[louvain]]. */
  /** B50 — gds.modularityOptimization: the standalone modularity
    * local-move procedure — exactly [[louvain]]'s level-1 move phase
    * (same gain formula, ε margin, direction-alternating simultaneous
    * rounds, smallest-member canonical labels) with contraction OFF:
    * nodes start as singletons, run up to `maxIterations` move rounds,
    * and the flat partition is returned without building a hierarchy.
    * Delegates to the louvain machinery at `maxLevels = 1` so the two
    * procs can never drift (the GDS pair has the same relationship);
    * the bounded local finisher and the weighted variant ride along.
    * Returns (id, community) for every non-isolated vertex. */
  def modularityOptimization(edges0: DataFrame, maxIterations: Int = 10,
                             localFinishEdges: Long = 250000L,
                             weightCol: Option[String] = None): DataFrame =
    louvain(edges0, maxLevels = 1, moveIters = maxIterations,
      localFinishEdges = localFinishEdges, refine = false, weightCol = weightCol)

  def leidenRefine(edges0: DataFrame, assign: DataFrame,
                   localFinishEdges: Long = 250000L): DataFrame = {
    val e = undirected(edges0.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded local finisher: the intra-community union-find is linear
    // in the edge list, the assign frame is ≤ |V| ≤ 2|E| rows
    if (e.count() <= localFinishEdges) {
      val spark = edges0.sparkSession
      val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
      val aArr = assign.select(col("id").cast("string"), col("community").cast("string"))
        .collect().map(r => r.getString(0) -> r.getString(1))
      e.unpersist()
      val comm = aArr.toMap
      val rf = LocalGraph.unionFindMinLabel(pairs.iterator.filter { case (s, d) =>
        comm.get(s).exists(cs => comm.get(d).contains(cs))
      })
      import scala.jdk.CollectionConverters._
      val rows = aArr.map { case (id, _) =>
        org.apache.spark.sql.Row(id, rf(id))
      }.toSeq
      return spark.createDataFrame(rows.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("community",
            org.apache.spark.sql.types.StringType))))
    }
    val a = assign.select(col("id").cast("string").as("id"),
      col("community").cast("string").as("c"))
    val intra = e
      .join(a.select(col("id").as("src"), col("c").as("cs")), Seq("src"))
      .join(a.select(col("id").as("dst"), col("c").as("cd")), Seq("dst"))
      .filter(col("cs") === col("cd"))
      .select(col("src"), col("dst"))
    val comps = connectedComponents(intra, localFinishEdges = localFinishEdges)
    graft.Borrow.reclaim(
      a.join(comps, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("community")),
      e)
  }

  /** Leiden (Traag, Waltman & van Eck 2019): [[louvain]] with
    * INTERLEAVED refinement — between levels each coarse community
    * splits into its connected components, contraction is by the
    * refined partition, and the next level's moves resume from the
    * coarse partition (`refine = true`) — plus a final
    * [[leidenRefine]] pass, because the last level's move phase runs
    * with no refinement after it (a no-op when the partition is
    * already well-connected). Deterministic variant: the refinement
    * rule is connectivity (the paper's guarantee); the randomized
    * γ-merge strengthening is out of scope by the house determinism
    * rule. */
  def leiden(edges0: DataFrame, maxLevels: Int = 2, moveIters: Int = 3,
             localFinishEdges: Long = 250000L,
             weightCol: Option[String] = None): DataFrame =
    leidenRefine(edges0,
      louvain(edges0, maxLevels, moveIters, localFinishEdges, refine = true,
        weightCol = weightCol))

  /** Newman modularity Q of a community assignment over an unweighted
    * undirected graph: Q = Σ_in/m − Σ_c (Σ_tot(c)/2m)². Edges are
    * symmetrized/deduplicated like [[louvain]]'s input (self-loops
    * dropped); `assign` is (id, community). The [[louvain]] spec pins
    * monotonicity against this. */
  /** Shared weighted/unweighted symmetric (src, dst, w) input for the
    * modularity family ([[louvain]], [[leiden]], [[modularity]]).
    * Weighted contract: the input is a DIRECTED edge list; each
    * undirected edge's weight is the SUM of its directed occurrences'
    * weights after triple-dedup (positive weights). Unweighted:
    * symmetrized, deduplicated, w = 1. */
  private def weightedSymInput(edges0: DataFrame,
                               weightCol: Option[String]): DataFrame =
    weightCol match {
      case Some(wc) =>
        val raw = edges0.select(col("src").cast("string").as("src"),
            col("dst").cast("string").as("dst"),
            col(wc).cast("double").as("w"))
          .filter(col("src") =!= col("dst"))
          .distinct()
        raw.unionByName(raw.select(col("dst").as("src"), col("src").as("dst"), col("w")))
          .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      case None =>
        undirected(edges0.select(col("src").cast("string").as("src"),
            col("dst").cast("string").as("dst")))
          .filter(col("src") =!= col("dst"))
          .withColumn("w", lit(1.0))
    }

  /** B34 — K-1 COLORING (GDS `gds.k1coloring` shape, r12): greedy
    * distributed Luby/Jones-Plassmann over the symmetrized simple
    * graph. Each round, every UNCOLORED vertex whose priority is the
    * strict maximum among its uncolored neighbors takes the smallest
    * color its already-colored neighbors don't use — the mex of the
    * COLLECTED DISTINCT neighbor-color set (bounded by #colors ≤
    * maxdeg+1, never degree-sized). Winners form an independent set
    * of the uncolored subgraph by construction, so no two adjacent
    * vertices ever take the same color — VALIDITY is structural.
    *
    * Priorities are FRESH PER ROUND — (xxhash64(id, round), id), the
    * Luby re-randomization — so convergence is O(log n) rounds w.h.p.
    * regardless of graph shape (a STATIC priority order measured 310
    * stuck vertices after 50 rounds at sf0.1: on hub-heavy bipartite
    * graphs its dependency chains run long); still fully
    * deterministic — reruns and engines agree where GDS would hand
    * back a permutation. Exact-or-loud on `maxIter` (default 100:
    * Luby needs ~c·log n rounds and late rounds cost little — the
    * frontier has shrunk). Returns (id, color), colors 0-based. */
  def k1Coloring(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val sym = undirected(edges).filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // vertices whose ONLY incident edges are self-loops vanish from
    // `sym` but are still projected nodes — GDS colors every projected
    // node, and self-loops are conventionally ignored for coloring, so
    // they take color 0 (r13, advice: they used to get no output row)
    val loopOnly = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
      .join(sym.select(col("src").as("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(0).as("color"))
    var uncolored = graft.Borrow.severLazy(
      sym.select(col("src").as("id")).distinct())
    var colored = uncolored.select(col("id"), lit(0).as("color")).limit(0)
    var n = uncolored.count()
    var iter = 0
    while (iter < maxIter && n > 0) {
      iter += 1
      val prio = struct(xxhash64(col("id"), lit(iter)).as("h"), col("id").as("i"))
      val unc = uncolored.select(col("id"), prio.as("p"))
      // max uncolored-neighbor priority per uncolored vertex
      val nbrMax = sym
        .join(unc.select(col("id").as("dst"), col("p").as("np")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(max(col("np")).as("mx"))
      // forbidden colors from already-colored neighbors
      val nbrColors = sym
        .join(colored.select(col("id").as("dst"), col("color")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(collect_set(col("color")).as("nc"))
      val winners = graft.Borrow.severLazy(unc
        .join(nbrMax, Seq("id"), "left")
        .filter(col("mx").isNull || col("p") > col("mx"))
        .join(nbrColors, Seq("id"), "left")
        .select(col("id"),
          aggregate(
            array_sort(coalesce(col("nc"), array().cast("array<int>"))),
            lit(0), (acc, x) => when(x === acc, acc + 1).otherwise(acc))
            .as("color")))
      colored = graft.Borrow.severLazy(
        colored.unionByName(winners.select(col("id"), col("color"))))
      uncolored = graft.Borrow.severLazy(
        uncolored.join(winners.select(col("id")), Seq("id"), "left_anti"))
      n = uncolored.count()
    }
    if (n != 0) { // release the borrow BEFORE raising (r14, advice):
      sym.unpersist() // the reclaim below never runs on this path
      throw new IllegalArgumentException(
        s"requirement failed: k1Coloring: $n vertices uncolored after " +
          s"$maxIter rounds — raise maxIter")
    }
    val out = colored.unionByName(loopOnly)
    graft.Borrow.reclaim(out, sym)
  }

  /** B32 — per-community CONDUCTANCE (r12):
    * φ(C) = cut(C) / min(vol(C), vol(G) − vol(C)) over the
    * symmetrized (optionally weighted) graph — the standard
    * community-quality metric (the NCP definition, Leskovec et al.
    * 2008; GDS ships it as `gds.conductance`). One pass: per-
    * community volume (Σ degrees) + cut (Σ cross-community edge
    * weight, counted from each side's perspective like GDS), the
    * total volume attached via a broadcast 1-row literal join (the P6
    * pattern — no driver scalar, no second data shuffle). Communities
    * whose min(vol, rest) = 0 (all volume, or none) are OMITTED — φ
    * is undefined there, and silence beats a NaN. Returns
    * (community, conductance). */
  def conductance(edges0: DataFrame, assign: DataFrame,
                  weightCol: Option[String] = None,
                  reclaim: Boolean = true): DataFrame = {
    val e = weightedSymInput(edges0, weightCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = assign.select(col("id").cast("string").as("id"),
      col("community").cast("string").as("c"))
    val vols = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .join(a, Seq("id"))
      .groupBy(col("c")).agg(sum(col("k")).as("vol"))
    val cut = e
      .join(a.select(col("id").as("src"), col("c").as("cs")), Seq("src"))
      .join(a.select(col("id").as("dst"), col("c").as("cd")), Seq("dst"))
      .filter(col("cs") =!= col("cd"))
      .groupBy(col("cs").as("c")).agg(sum(col("w")).as("cut"))
    val total = vols.agg(sum(col("vol")).as("tot"))
    val out = vols.join(cut, Seq("c"), "left")
      .join(broadcast(total))
      .filter(least(col("vol"), col("tot") - col("vol")) > 0)
      .select(col("c").as("community"),
        graft.operators.Num.roundTies(
          coalesce(col("cut"), lit(0.0)) /
            least(col("vol"), col("tot") - col("vol")), 6).as("conductance"))
    if (reclaim) graft.Borrow.reclaim(out, e) else out
  }

  /** B35 — minimum spanning FOREST by distributed Borůvka
    * (`gds.spanningTree` capability; GDS runs Prim from a sourceNode —
    * filter the forest to that node's component for the same tree).
    * Deterministic and UNIQUE: effective edge weights are the total
    * order (w, a, b) over canonicalized a < b endpoints, so ties can't
    * create cycles and every engine computes the same forest — the
    * classic Borůvka precondition (distinct weights) holds by
    * construction.
    *
    * Scale shape: per round ONE keyed min-aggregation picks each
    * component's lightest incident edge (map-side combinable — never a
    * per-component sort), then components contract through
    * [[connectedComponents]] over the PICKED edge set at COMPONENT
    * level (≤ #components rows, geometrically shrinking; the CC local
    * finisher absorbs the tail). Components at least halve per round →
    * ≤ log₂(V) rounds. Labels stay min-member-id canonical.
    *
    * Input edges are treated UNDIRECTED; self-loops dropped; parallel
    * (a, b) edges collapse to the minimum weight; `weightCol = None`
    * weighs every edge 1 (the forest is then BFS-ish but still the
    * unique (w, a, b)-minimal one). Null weights are loud. Returns
    * (src, dst, w) with src < dst — the forest's edge set.
    *
    * `objective` (r14, GDS's own config key): `minimum` (default) or
    * `maximum`. Maximum runs the SAME Borůvka on negated weights —
    * the effective total order becomes (−w, a, b), still unique, so
    * the maximum forest is deterministic too; parallel edges then
    * collapse to the MAXIMUM weight (min of negated), and equal-weight
    * ties still break to the smaller (a, b) in both objectives.
    *
    * r14 (the CC/louvain pattern): under `localFinishEdges` simple
    * canonical edges the forest comes from an exact driver-side
    * KRUSKAL over the same (w, a, b) strict total order — the minimal
    * spanning forest under a strict total order is UNIQUE, so Kruskal
    * and Borůvka return the identical edge set by construction
    * (forced-path equivalence spec-pinned); at that size a Borůvka
    * round is pure AQE scheduling (the r14 bicc profile measured the
    * distributed forest at 10 s on a 4k-edge gate graph). Above the
    * bound the distributed rounds run unchanged. */
  def spanningTree(edges0: DataFrame, weightCol: Option[String] = None,
                   maxIter: Int = 30, objective: String = "minimum",
                   localFinishEdges: Long = 250000L): DataFrame = {
    val maxObj = objective.toLowerCase match {
      case "minimum" => false
      case "maximum" => true
      case other => throw new IllegalArgumentException(
        s"spanningTree: objective must be 'minimum' or 'maximum', got '$other'")
    }
    val base0 = weightCol match {
      case Some(wc) => edges0.select(col("src").cast("string").as("s"),
        col("dst").cast("string").as("d"), col(wc).cast("double").as("w"))
      case None => edges0.select(col("src").cast("string").as("s"),
        col("dst").cast("string").as("d"), lit(1.0).as("w"))
    }
    require(base0.filter(col("w").isNull).limit(1).count() == 0,
      "spanningTree: weight is null or non-numeric on at least one edge")
    // maximum = Borůvka on negated weights; weights un-negate on output
    val base = if (maxObj) base0.withColumn("w", -col("w")) else base0
    val e = base.filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"), col("w"))
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nE = e.count()
    if (nE <= localFinishEdges) {
      // exact local Kruskal on the (w, a, b) strict total order — the
      // same unique forest the distributed rounds compute
      val rows = e.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy { case (a, b, w) => (w, a, b) }
      val parent = scala.collection.mutable.Map.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      val picked = rows.filter { case (a, b, _) =>
        val ra = find(a); val rb = find(b)
        if (ra == rb) false else { parent(rb) = ra; true }
      }
      val spark = edges0.sparkSession
      import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
      val wOutL: Double => Double = if (maxObj) w => -w else w => w
      val out = spark.createDataFrame(
        picked.map { case (a, b, w) =>
          org.apache.spark.sql.Row(a, b, wOutL(w)) }.toSeq.asJava,
        StructType(Seq(StructField("src", StringType),
          StructField("dst", StringType), StructField("w", DoubleType))))
      return graft.Borrow.reclaim(out, e)
    }
    var comp = graft.Borrow.severLazy(
      e.select(col("a").as("id")).unionByName(e.select(col("b").as("id")))
        .distinct().select(col("id"), col("id").as("comp")))
    var forest = List.empty[DataFrame]
    var round = 0
    var crossing = 1L
    while (round < maxIter && crossing > 0) {
      round += 1
      val ce = e
        .join(comp.select(col("id").as("a"), col("comp").as("ca")), Seq("a"))
        .join(comp.select(col("id").as("b"), col("comp").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb"))
      // each component's minimal incident edge under the (w, a, b)
      // total order; ca/cb ride the struct tail (never tie-relevant —
      // (w, a, b) is already unique) so contraction needs no re-join
      val cand = struct(col("w"), col("a"), col("b"), col("ca"), col("cb"))
      val picked = graft.Borrow.severLazy(
        ce.select(col("ca").as("c"), cand.as("m"))
          .unionByName(ce.select(col("cb").as("c"), cand.as("m")))
          .groupBy(col("c")).agg(min(col("m")).as("m"))
          .select(col("m.a").as("a"), col("m.b").as("b"), col("m.w").as("w"),
            col("m.ca").as("ca"), col("m.cb").as("cb"))
          .distinct())
      crossing = picked.count()
      if (crossing > 0) {
        forest ::= picked.select(col("a"), col("b"), col("w"))
        val merged = connectedComponents(
          picked.select(col("ca").as("src"), col("cb").as("dst")))
        comp = graft.Borrow.severLazy(
          comp.join(merged.withColumnRenamed("id", "comp"), Seq("comp"), "left")
            .select(col("id"), coalesce(col("component"), col("comp")).as("comp")))
        comp.count()
      }
    }
    require(crossing == 0,
      s"spanningTree: components still merging after $maxIter rounds — raise maxIter")
    val wOut = if (maxObj) (-col("w")).as("w") else col("w")
    val out =
      if (forest.isEmpty) e.select(col("a").as("src"), col("b").as("dst"), wOut).limit(0)
      else forest.reduce(_ unionByName _).distinct()
        .select(col("a").as("src"), col("b").as("dst"), wOut)
    graft.Borrow.reclaim(out, e)
  }

  /** B35k — K-SPANNING-TREE (`gds.kSpanningTree`, r14): split the
    * sourceNode's spanning tree into k sub-trees by removing the k−1
    * edges at the objective's FAR end (heaviest for minimum, lightest
    * for maximum) — GDS's k-clustering-by-tree-cutting. Deterministic:
    * the tree is the unique [[spanningTree]] forest filtered to the
    * source's component, and removal ranks by the inverse of the
    * construction's (effective-w, src, dst) total order, so the cut
    * set is unique too. k ≥ #tree-edges + 1 removes everything
    * (every vertex its own cluster). Returns (src, dst, w) — the
    * surviving tree edges.
    *
    * Scale shape: the forest + one CC pass (component lookup), a
    * broadcast semi-join for the component filter, and a bounded
    * TakeOrdered(k−1) for the cut — no new shuffle patterns on top of
    * [[spanningTree]]. */
  def kSpanningTree(edges: DataFrame, k: Int, source: String,
                    weightCol: Option[String] = None, maxIter: Int = 30,
                    objective: String = "minimum"): DataFrame = {
    require(k >= 1, s"kSpanningTree: k must be >= 1, got $k")
    val forest = spanningTree(edges, weightCol, maxIter, objective)
    val comps = connectedComponents(forest)
    val mine = comps.filter(col("id").cast("string") === source)
      .select(col("component"))
    require(mine.limit(1).count() > 0,
      s"kSpanningTree: sourceNode '$source' has no spanning-tree edges " +
        "(absent from the graph, or self-loop-only) — nothing to split")
    val tree = forest
      .join(comps.withColumnRenamed("id", "src"), Seq("src"))
      .join(broadcast(mine), Seq("component"), "left_semi")
      .select(col("src"), col("dst"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // cut rank = inverse construction order: minimum drops the
    // (w, src, dst)-largest, maximum the (−w, src, dst)-largest
    val ord =
      if (objective.toLowerCase == "maximum")
        Seq(col("w").asc, col("src").desc, col("dst").desc)
      else Seq(col("w").desc, col("src").desc, col("dst").desc)
    val drop = tree.orderBy(ord: _*).limit(k - 1)
      .select(col("src"), col("dst"))
    val out = tree.join(drop, Seq("src", "dst"), "left_anti")
    graft.Borrow.reclaim(out, tree)
  }

  /** B38 — STEINER TREE (`gds.steinerTree` shape; r13): a low-weight
    * tree connecting `source` to every reachable target, by the
    * SHORTEST-PATH-TREE heuristic GDS ships — the union of the
    * source→target minimal-weight paths (GDS's base algorithm before
    * its optional rerouting pass; a classic 2-approximation family).
    * Deterministic: paths come from [[ssspPathsFrom]]'s tie-broken
    * keyed Bellman-Ford, so the edge set is engine-reproducible and
    * oracle-checkable. Unreachable targets (within `maxIter` hops) are
    * OMITTED like GDS; weights must be strictly positive (loud, the
    * dijkstra-family rule); parallel edges collapse to the lightest.
    *
    * Scale shape: ONE multi-target shortest-path run (the keyed
    * frontier — never a per-target loop) + a path explosion over
    * |targets| rows (bounded by the target list, not the graph) + one
    * equi-join back to the edge frame for weights. Returns
    * (src, dst, w) — tree edges in traversal direction. */
  def steinerTree(edges: DataFrame, source: String, targets: Seq[String],
                  maxIter: Int = 10, weightCol: Option[String] = None): DataFrame = {
    require(targets.nonEmpty, "steinerTree: targets must be non-empty")
    val spark = edges.sparkSession
    val base = weightCol match {
      case Some(wc) => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col(wc).cast("double").as("w"))
      case None => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), lit(1.0).as("w"))
    }
    val e = base.groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcFrame = spark.range(1).select(lit(source).as("id"))
    val (allPaths, truncated) = ssspPathsFromImpl(e, srcFrame, maxIter, "w")
    val paths = allPaths.filter(col("id").isin(targets: _*))
    // exact-or-loud (r14, advice): when the hop bound cut an ACTIVE
    // frontier, a missing target is UNPROVEN-unreachable — GDS omits
    // only truly unreachable targets, so silence here would diverge
    if (truncated) {
      val missing = targets.toSet --
        paths.select(col("id")).collect().map(_.getString(0)).toSet
      require(missing.isEmpty,
        s"steinerTree: targets ${missing.toSeq.sorted.mkString(", ")} were " +
          s"not reached within maxIter = $maxIter hops while paths were " +
          "still extending — they may be reachable; raise maxIter (GDS " +
          "omits only PROVEN-unreachable targets)")
    }
    val steps = paths
      .select(split(col("path"), ">").as("ns"))
      .filter(size(col("ns")) >= 2) // target == source: no edges
      .select(explode(expr(
        "transform(sequence(0, size(ns) - 2), " +
          "i -> struct(ns[i] AS src, ns[i + 1] AS dst))")).as("st"))
      .select(col("st.src").as("src"), col("st.dst").as("dst"))
      .distinct()
    val out = steps.join(e, Seq("src", "dst"))
      .select(col("src"), col("dst"), col("w"))
    graft.Borrow.reclaim(out, e)
  }

  /** B37 — ARTICULATION POINTS (`gds.articulationPoints`) and BRIDGES
    * (`gds.bridges`): the cut vertices / cut edges of the undirected
    * simple graph — on telemetry graphs the choke-point processes and
    * single links in lateral-movement paths.
    *
    * Under `maxLocalEdges` symmetric edge rows the exact driver-side
    * Hopcroft-Tarjan runs (iterative, explicit stack — no
    * recursion-depth ceiling; neighbor order sorted, so output is
    * deterministic). ABOVE the bound — where r13 refused loudly,
    * DFS lowlinks being inherently sequential — the r14 DISTRIBUTED
    * Tarjan-Vishkin pass ([[Biconnectivity]], B41) takes over: no DFS,
    * O(log V) rounds of equi-joins, the same answers (equivalence
    * spec-pinned on fixtures and seeded random graphs). Self-loops are
    * ignored; parallel edges collapse (set semantics, like every
    * operator here); ids compare as strings.
    *
    * [[articulationPoints]] returns (id); [[bridges]] returns
    * (src, dst) with src < dst; [[biconnectedComponents]] returns
    * (src, dst, component) — component = the biconnected component's
    * min canonical edge key rendered `a|b`. `forceDistributed` pins
    * the Tarjan-Vishkin path regardless of size (gates and specs). */
  def articulationPoints(edges: DataFrame, maxLocalEdges: Long = 250000L,
                         forceDistributed: Boolean = false): DataFrame = {
    cutLocal(edges, maxLocalEdges, forceDistributed) match {
      case Some((aps, _, _)) =>
        val spark = edges.sparkSession
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        spark.createDataFrame(
          aps.sorted.map(org.apache.spark.sql.Row(_)).toSeq.asJava,
          StructType(Seq(StructField("id", StringType))))
      case None => Biconnectivity.articulationPoints(edges).orderBy(col("id"))
    }
  }

  /** See [[articulationPoints]]. */
  def bridges(edges: DataFrame, maxLocalEdges: Long = 250000L,
              forceDistributed: Boolean = false): DataFrame = {
    cutLocal(edges, maxLocalEdges, forceDistributed) match {
      case Some((_, brs, _)) =>
        val spark = edges.sparkSession
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        spark.createDataFrame(
          brs.sorted.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.toSeq.asJava,
          StructType(Seq(StructField("src", StringType), StructField("dst", StringType))))
      case None => Biconnectivity.bridges(edges).orderBy(col("src"), col("dst"))
    }
  }

  /** See [[articulationPoints]]: the full biconnected-component
    * partition (r14, B41) — one row per undirected simple edge. */
  def biconnectedComponents(edges: DataFrame, maxLocalEdges: Long = 250000L,
                            forceDistributed: Boolean = false): DataFrame = {
    cutLocal(edges, maxLocalEdges, forceDistributed) match {
      case Some((_, _, comps)) =>
        val spark = edges.sparkSession
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        spark.createDataFrame(
          comps.sortBy(t => (t._1, t._2))
            .map { case (a, b, c) => org.apache.spark.sql.Row(a, b, c) }.toSeq.asJava,
          StructType(Seq(StructField("src", StringType),
            StructField("dst", StringType), StructField("component", StringType))))
      case None =>
        Biconnectivity.biconnectedComponents(edges).orderBy(col("src"), col("dst"))
    }
  }

  /** Local-finisher dispatch: Some(result) when the graph fits under
    * the bound (and the caller didn't force the distributed path),
    * None to hand over to [[Biconnectivity]]. */
  private def cutLocal(edges: DataFrame, maxLocalEdges: Long, forceDistributed: Boolean)
      : Option[(Array[String], Array[(String, String)], Array[(String, String, String)])] = {
    if (forceDistributed) return None
    val sym = undirected(edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = sym.count()
    if (n > maxLocalEdges) { sym.unpersist(); return None }
    val pairs = sym.collect().map(r => (r.getString(0), r.getString(1)))
    sym.unpersist()
    Some(cutStructure(pairs))
  }

  /** Shared Hopcroft-Tarjan pass: (articulation points, bridges,
    * biconnected components). The component pass is the textbook edge
    * stack: push tree and upward back edges; when a child's lowlink
    * cannot climb above its parent, pop through the tree edge — those
    * edges are one biconnected component. Labels = min canonical edge
    * key per component, computed over the SAME U+0001-joined keys the
    * distributed twin orders by (a '|'-joined min can order
    * differently when ids contain characters above '|'), rendered
    * `a|b`. */
  private def cutStructure(pairs: Array[(String, String)])
      : (Array[String], Array[(String, String)], Array[(String, String, String)]) = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
    }
    val sortedAdj = adj.map { case (k, v) => k -> v.sorted.toArray }
    val verts = sortedAdj.keys.toArray.sorted
    val disc = mutable.HashMap.empty[String, Int]
    val low = mutable.HashMap.empty[String, Int]
    val aps = mutable.HashSet.empty[String]
    val brs = mutable.ArrayBuffer.empty[(String, String)]
    val estack = mutable.ArrayBuffer.empty[(String, String)]
    val comps = mutable.ArrayBuffer.empty[Array[(String, String)]]
    var time = 0
    verts.foreach { root =>
      if (!disc.contains(root)) {
        var rootChildren = 0
        // explicit stack of (vertex, parent, next-neighbor index)
        val stack = mutable.ArrayBuffer((root, null: String, 0))
        disc(root) = time; low(root) = time; time += 1
        while (stack.nonEmpty) {
          val (v, par, idx) = stack.last
          val nbrs = sortedAdj(v)
          if (idx < nbrs.length) {
            stack(stack.length - 1) = (v, par, idx + 1)
            val c = nbrs(idx)
            if (!disc.contains(c)) {
              if (v == root) rootChildren += 1
              disc(c) = time; low(c) = time; time += 1
              estack += ((v, c))
              stack += ((c, v, 0))
            } else if (c != par) {
              low(v) = math.min(low(v), disc(c))
              // upward back edge only — the downward sighting of the
              // same edge was already pushed from the other side
              if (disc(c) < disc(v)) estack += ((v, c))
            }
          } else {
            stack.remove(stack.length - 1)
            if (par != null) {
              low(par) = math.min(low(par), low(v))
              if (low(v) > disc(par))
                brs += ((if (par < v) par else v, if (par < v) v else par))
              if (par != root && low(v) >= disc(par)) aps += par
              if (low(v) >= disc(par)) {
                // pop one biconnected component, through (par, v)
                val comp = mutable.ArrayBuffer.empty[(String, String)]
                var done = false
                while (!done) {
                  val e = estack.remove(estack.length - 1)
                  comp += e
                  done = e == ((par, v))
                }
                comps += comp.toArray
              }
            }
          }
        }
        if (rootChildren >= 2) aps += root
      }
    }
    val labeled = comps.toArray.flatMap { comp =>
      val canon = comp.map { case (x, y) => if (x < y) (x, y) else (y, x) }.distinct
      val label = canon.map { case (x, y) => x + "\u0001" + y }.min.replace('\u0001', '|')
      canon.map { case (x, y) => (x, y, label) }
    }
    (aps.toArray, brs.toArray, labeled)
  }

  /** B40 — DFS (`gds.dfs`, r14): depth-first PREORDER from `source`
    * over the directed edge frame, neighbors explored in sorted-id
    * order so the order is deterministic and engine-reproducible
    * (GDS's is traversal-dependent; a fixed order is the house rule).
    * A DFS's entire OUTPUT is a visitation order — inherently
    * sequential, like the B37 cut pass — so this is the explicit
    * BOUNDED LOCAL FINISHER contract again: under `maxLocalEdges` edge
    * rows the exact iterative driver-side DFS runs (explicit stack, no
    * recursion-depth ceiling); above it the call fails LOUDLY (shard
    * by component, or use [[bfs]] — frontier BFS is the distributed
    * traversal). `maxDepth` bounds the descent (GDS parity); vertices
    * deeper than it are not visited. On a FOREST the preorder equals
    * ordering root-paths component-wise — which is exactly how the
    * g_dfs DuckDB oracle recomputes it. Returns (id, ord), preorder
    * index from 0 at the source; only vertices reachable from
    * `source` within `maxDepth` appear. */
  def dfs(edges: DataFrame, source: String, maxDepth: Int = Int.MaxValue,
          maxLocalEdges: Long = 250000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    require(n <= maxLocalEdges,
      s"dfs: $n edge rows exceed the bounded-local-finisher contract " +
        s"($maxLocalEdges). A DFS order is sequential by definition; " +
        "shard the graph by component and walk components under the " +
        "bound, or use bfs() for a distributed traversal.")
    val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
    e.unpersist()
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
    }
    val sortedAdj = adj.map { case (k, v) => k -> v.sorted.toArray }
    val visited = mutable.LinkedHashSet.empty[String]
    // stack of (vertex, depth); push children REVERSED so the smallest
    // id pops (and is visited) first
    val stack = mutable.ArrayBuffer((source, 0))
    while (stack.nonEmpty) {
      val (v, d) = stack.remove(stack.length - 1)
      if (!visited.contains(v)) {
        visited += v
        if (d < maxDepth)
          sortedAdj.getOrElse(v, Array.empty).reverseIterator
            .filterNot(visited.contains).foreach(c => stack += ((c, d + 1)))
      }
    }
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    spark.createDataFrame(
      visited.iterator.zipWithIndex
        .map { case (id, i) => org.apache.spark.sql.Row(id, i.toLong) }
        .toSeq.asJava,
      StructType(Seq(StructField("id", StringType), StructField("ord", LongType))))
  }

  def modularity(edges0: DataFrame, assign: DataFrame,
                 weightCol: Option[String] = None): Double = {
    // weighted Q uses the same formula over edge weights; the input
    // matches [[louvain]]'s weighted contract exactly so
    // louvain(weightCol) output scores against the graph it optimized
    val e = weightedSymInput(edges0, weightCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = assign.select(col("id").cast("string").as("id"),
      col("community").cast("string").as("c"))
    val m2row = e.agg(sum(col("w"))).collect()(0) // symmetric list = 2m
    if (m2row.isNullAt(0)) { e.unpersist(); return 0.0 } // no edges → Q = 0
    val m2 = m2row.getDouble(0)
    val internal = e // both endpoints in the same community: = 2·Σ_in
      .join(a.select(col("id").as("src"), col("c").as("cs")), Seq("src"))
      .join(a.select(col("id").as("dst"), col("c").as("cd")), Seq("dst"))
      .filter(col("cs") === col("cd"))
      .agg(coalesce(sum(col("w")), lit(0.0))).collect()(0).getDouble(0)
    val sumTot2 = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .join(a, Seq("id"))
      .groupBy(col("c")).agg(sum(col("k")).as("tot"))
      .agg(coalesce(sum(col("tot") * col("tot")), lit(0.0))).collect()(0).getDouble(0)
    e.unpersist()
    internal / m2 - sumTot2 / (m2 * m2)
  }

  /** PER-COMMUNITY modularity (`gds.modularity.stream` shape, r14):
    * Q_c = in_c/2m − (tot_c/2m)² over the symmetric weighted list
    * (in_c = within-community weight counted in both directions, so
    * the divisor is the symmetric total m2 — exactly [[modularity]]'s
    * terms split by community: Σ_c Q_c = Newman Q, spec-pinned).
    * Same weighted-input contract as louvain/modularity. Returns
    * (community, modularity), one row per community holding ≥ 1
    * vertex with an incident edge; ONE edge join + two keyed
    * aggregations, all map-side combinable. */
  def modularityByCommunity(edges0: DataFrame, assign: DataFrame,
                            weightCol: Option[String] = None): DataFrame = {
    val e = weightedSymInput(edges0, weightCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = assign.select(col("id").cast("string").as("id"),
      col("community").cast("string").as("c"))
    val m2row = e.agg(sum(col("w"))).collect()(0)
    if (m2row.isNullAt(0)) {
      val out = a.select(col("c").as("community"),
        lit(0.0).as("modularity")).limit(0)
      return graft.Borrow.reclaim(out, e)
    }
    val m2 = m2row.getDouble(0)
    val inC = e
      .join(a.select(col("id").as("src"), col("c").as("cs")), Seq("src"))
      .join(a.select(col("id").as("dst"), col("c").as("cd")), Seq("dst"))
      .filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("c")).agg(sum(col("w")).as("in2"))
    val tot = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .join(a, Seq("id"))
      .groupBy(col("c")).agg(sum(col("k")).as("tot"))
    val out = tot.join(inC, Seq("c"), "left")
      .select(col("c").as("community"),
        graft.operators.Num.roundTies(
          coalesce(col("in2"), lit(0.0)) / m2 -
            (col("tot") / m2) * (col("tot") / m2), 6).as("modularity"))
    graft.Borrow.reclaim(out, e)
  }

  /** Neo4j-GDS-style node similarity over out-neighbor sets for every
    * source pair sharing at least one neighbor, with GDS's
    * `similarityMetric` config (r12): `jaccard` (default), `overlap`
    * (i/min — subset detection), `cosine` (set-cosine i/√(n1·n2)).
    * Delegates to [[graft.operators.JaccardJoin.exactPairsMetric]]
    * (items = neighbors): a hub destination of in-degree d — on
    * telemetry graphs the COMMON case, e.g. every process loading the
    * same system DLL — would emit d²/2 inverted-index rows; the
    * df-cap + per-metric prefix-filter hybrid bounds that exactly as
    * D4 does for boilerplate shingles, with recall-exact results.
    * Returns (id1, id2, sim), id1 < id2, sim ≥ threshold. */
  def nodeSimilarity(edges: DataFrame, threshold: Double,
                     hubCap: Long = 1000L,
                     metric: String = "jaccard"): DataFrame =
    graft.operators.JaccardJoin.exactPairsMetric(
        edges.select(col("src").as("id"), col("dst").as("item")),
        threshold, hubCap, metric)
      .withColumn("sim", graft.operators.Num.roundTies(col("sim"), 4))
      .select(col("id1"), col("id2"), col("sim"))

  /** B12k — nodeSimilarity's `topK` shape (r12): GDS's DEFAULT result
    * form — each node with its K most similar neighbors as DIRECTED
    * rows (node, neighbor, sim), both orientations of a pair
    * considered from each endpoint. Built on [[nodeSimilarity]]'s
    * recall-exact pair machinery: expand pairs to both directions,
    * keep K per node by (sim DESC, neighbor ASC). Ties break
    * deterministically.
    *
    * r13 (the r12 watch item): the per-node top-k is TWO-STAGE (the
    * C12/P3/randomWalk pattern) — rank within (id, neighbor-hash
    * bucket) and prune to K, then rank the ≤ B·K survivors per id.
    * At GDS's default similarityCutoff ≈ 0 a hub-ish node's candidate
    * set is every pair it qualifies in; the old single
    * Window.partitionBy(id) funneled that set through one task, the
    * staged prune bounds every partition. Result identical (top-k is
    * decomposable: the global top K is inside the union of per-bucket
    * top Ks). */
  def nodeSimilarityTopK(edges: DataFrame, threshold: Double, topK: Int,
                         hubCap: Long = 1000L,
                         metric: String = "jaccard"): DataFrame = {
    require(topK >= 1, "nodeSimilarityTopK: topK >= 1")
    import org.apache.spark.sql.expressions.Window
    val pairs = nodeSimilarity(edges, threshold, hubCap, metric)
    val directed = pairs.select(col("id1").as("id"), col("id2").as("neighbor"),
        col("sim"))
      .unionByName(pairs.select(col("id2").as("id"), col("id1").as("neighbor"),
        col("sim")))
    directedTopK(directed, topK)
  }

  /** Two-stage per-node top-k over a directed (id, neighbor, sim)
    * frame — the shared finisher for [[nodeSimilarityTopK]] and
    * [[nodeSimilarityFiltered]]. Exact: the global top K is contained
    * in the union of per-bucket top Ks. */
  private def directedTopK(directed: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBuckets = 64
    val pruned = directed
      .withColumn("__bkt", pmod(xxhash64(col("neighbor")), lit(nBuckets)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id"), col("__bkt"))
          .orderBy(col("sim").desc, col("neighbor"))))
      .filter(col("__rk") <= topK)
    pruned
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("sim").desc, col("neighbor"))))
      .filter(col("__rk") <= topK)
      .select(col("id"), col("neighbor"), col("sim"))
  }

  /** B12f — `gds.nodeSimilarity.filtered` parity (r13):
    * sourceNodeFilter / targetNodeFilter restrict which node PAIRS are
    * reported — similarity itself is still computed over the full
    * neighbor sets (filters select result rows, they never change a
    * node's neighborhood, exactly like GDS). Result is the DIRECTED
    * shape (id ∈ source filter, neighbor ∈ target filter); an absent
    * filter means "all nodes" on that side; `topK > 0` keeps the K
    * best per source node (two-stage, [[directedTopK]]).
    *
    * Scale shape: when BOTH filters are present, pair GENERATION is
    * pre-restricted to ids in S ∪ T before the candidate machinery
    * runs — every reported pair has both endpoints there, and
    * [[graft.operators.JaccardJoin.exactPairsMetric]] stays
    * recall-exact on any id-subset (each id keeps its full item set;
    * df/prefix orders are computed over the same restricted row set
    * the joins use). With one side unrestricted the full pair set is
    * the honest cost, as in GDS. */
  def nodeSimilarityFiltered(edges: DataFrame, threshold: Double,
                             sourceFilter: Option[DataFrame] = None,
                             targetFilter: Option[DataFrame] = None,
                             hubCap: Long = 1000L,
                             metric: String = "jaccard",
                             topK: Int = 0): DataFrame = {
    val rows0 = edges.select(col("src").as("id"), col("dst").as("item"))
    val sf = sourceFilter.map(_.select(col("id")).distinct())
    val tf = targetFilter.map(_.select(col("id")).distinct())
    val rows = (sf, tf) match {
      case (Some(s), Some(t)) =>
        rows0.join(s.unionByName(t).distinct(), Seq("id"), "left_semi")
      case _ => rows0
    }
    val pairs = graft.operators.JaccardJoin
      .exactPairsMetric(rows, threshold, hubCap, metric)
      .withColumn("sim", graft.operators.Num.roundTies(col("sim"), 4))
    val directed = pairs
      .select(col("id1").as("id"), col("id2").as("neighbor"), col("sim"))
      .unionByName(pairs
        .select(col("id2").as("id"), col("id1").as("neighbor"), col("sim")))
    val srcF = sf.fold(directed)(s => directed.join(s, Seq("id"), "left_semi"))
    val out = tf.fold(srcF)(t => srcF.join(
      t.select(col("id").as("neighbor")), Seq("neighbor"), "left_semi"))
      .select(col("id"), col("neighbor"), col("sim"))
    if (topK > 0) directedTopK(out, topK) else out
  }

  /** B44 — link-prediction measures (r15; GDS
    * `gds.alpha.linkprediction.*`): for every CANDIDATE pair — two
    * distinct vertices sharing ≥ 1 neighbor in the symmetrized simple
    * graph, the only pairs any of the neighborhood measures can score
    * non-trivially — all four classic closed forms in one frame:
    *
    *   - commonNeighbors        |N(u) ∩ N(v)|
    *   - adamicAdar             Σ_{w ∈ N(u)∩N(v)} 1 / ln |N(w)|
    *   - resourceAllocation     Σ_{w ∈ N(u)∩N(v)} 1 / |N(w)|
    *   - preferentialAttachment |N(u)| · |N(v)|
    *
    * (Adamic & Adar 2003; Zhou, Lü & Zhang 2009 for RA; the GDS alpha
    * function catalog spells these as per-pair functions — the
    * streaming frame here is the set-returning form a Spark user
    * actually wants, and a per-pair lookup is one filter on it.)
    *
    * Scale shape: ONE wedge self-join keyed on the shared neighbor
    * (center) + one (u, v) aggregation + two degree joins. A center of
    * degree d emits d(d−1)/2 candidate rows — the same honest quadratic
    * a triangle count pays, and the reason `centerCap` exists: centers
    * above the cap fail LOUDLY naming the lever rather than silently
    * dropping recall (the Dedup clusterCap convention). A shared
    * neighbor has degree ≥ 2 by construction, so ln|N(w)| > 0 always.
    * Doubles round via [[graft.operators.Num.roundTies]] (4 digits) for
    * cross-engine gates. Returns (node1, node2, commonNeighbors,
    * adamicAdar, resourceAllocation, preferentialAttachment),
    * node1 < node2. */
  def linkPrediction(edges: DataFrame, centerCap: Long = 100000L,
                     communities: Option[DataFrame] = None): DataFrame = {
    val sym = undirected(edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val maxDeg = deg.agg(coalesce(max(col("d")), lit(0L))).collect()(0).getLong(0)
    require(maxDeg <= centerCap,
      s"linkPrediction: max degree $maxDeg exceeds centerCap=$centerCap — " +
        "a center of degree d emits d(d-1)/2 candidate pairs; raise " +
        "centerCap if that quadratic cost is intended, or pre-filter hubs")
    // wedge join through the center w, with the center's degree
    // attached BEFORE the pair aggregation (one row per wedge)
    val arcs = sym.select(col("dst").as("w"), col("src").as("u"))
      .join(deg.select(col("id").as("w"), col("d").as("dw")), Seq("w"))
    val pairsAgg = arcs.alias("l")
      .join(arcs.alias("r"), col("l.w") === col("r.w") && col("l.u") < col("r.u"))
      .groupBy(col("l.u").as("node1"), col("r.u").as("node2"))
      .agg(count(lit(1)).as("commonNeighbors"),
        sum(lit(1.0) / log(col("l.dw"))).as("aa"),
        sum(lit(1.0) / col("l.dw")).as("ra"))
    // sym stays session-lived (the triangles precedent in [[Borrow]]):
    // the output is the candidate-pair frame — potentially LARGER than
    // the borrow, exactly the shape reclaim's eager checkpoint is
    // documented not to fit
    val base = pairsAgg
      .join(deg.select(col("id").as("node1"), col("d").as("d1")), Seq("node1"))
      .join(deg.select(col("id").as("node2"), col("d").as("d2")), Seq("node2"))
      .select(col("node1"), col("node2"), col("commonNeighbors"),
        graft.operators.Num.roundTies(col("aa"), 4).as("adamicAdar"),
        graft.operators.Num.roundTies(col("ra"), 4).as("resourceAllocation"),
        (col("d1") * col("d2")).as("preferentialAttachment"),
        // r16: |Γ(u) ∪ Γ(v)| — union degree, closed-form on columns
        // the frame already carries
        (col("d1") + col("d2") - col("commonNeighbors")).as("totalNeighbors"))
    // r16: gds.alpha.linkprediction.sameCommunity — 1 iff both
    // endpoints carry the SAME non-null community label (two
    // broadcast-shaped equi-joins against the ≤|V|-row assignment)
    communities match {
      case Some(cs) =>
        val c = cs.select(col("id").cast("string").as("id"),
          col("community")).distinct()
        base
          .join(c.select(col("id").as("node1"), col("community").as("c1")),
            Seq("node1"), "left")
          .join(c.select(col("id").as("node2"), col("community").as("c2")),
            Seq("node2"), "left")
          .select(col("node1"), col("node2"), col("commonNeighbors"),
            col("adamicAdar"), col("resourceAllocation"),
            col("preferentialAttachment"), col("totalNeighbors"),
            when(col("c1").isNotNull && col("c1") === col("c2"), lit(1L))
              .otherwise(lit(0L)).as("sameCommunity"))
      case None => base
    }
  }

  /** BFS that also MATERIALIZES one shortest path per reached vertex —
    * the Cypher `MATCH p = shortestPath((a)-[*]->(b)) RETURN p`
    * capability, not just distances.
    *
    * Tie-break rule (deterministic, engine-reproducible): PER-HOP
    * GREEDY — at each depth a vertex keeps the minimum '>'-joined path
    * string among its incoming extensions. Note this is not always the
    * GLOBAL lexicographic minimum over all shortest paths when one
    * vertex id is a string prefix of another ("n:1" vs "n:12":
    * concatenation can reorder); any oracle on a non-forest graph must
    * mirror the per-hop rule (the g_paths fixture is a forest, where
    * greedy == global because paths are unique). Fixed-width ids, or
    * comparing (pred-path, vertex) as a struct, would make greedy ==
    * global if a consumer needs that. Same frontier/checkpoint scheme
    * as [[bfs]]. */
  def bfsPaths(edges: DataFrame, sources: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = sources.select(col("id"), lit(0).as("dist"),
      col("id").cast("string").as("path")).distinct().localCheckpoint()
    var frontier = visited
    var frontierCount = frontier.count()
    var depth = 0
    while (depth < maxIter && frontierCount > 0) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"),
          concat(col("path"), lit(">"), e("dst")).as("path"))
        .groupBy(col("id")).agg(min(col("path")).as("path"))
        .join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(depth))
        .select(col("id"), col("dist"), col("path"))
        .localCheckpoint(false) // lazy: count below materializes
      frontierCount = next.count()
      if (frontierCount > 0) visited = visited.unionByName(next).localCheckpoint()
      frontier = next
    }
    e.unpersist()
    visited
  }

  /** Multi-source [[bfsPaths]] — one BFS per source executed as a
    * SINGLE keyed frontier (the MS-BFS formulation): state rows are
    * (root, id, dist, path); every round is one equi-join of the whole
    * frontier against the edge frame plus one (root, id)-keyed
    * aggregation, so the per-round cost is |frontier across all
    * roots|, never #roots separate BFS jobs. Returns every (root,
    * reached) pair with the minimal dist and the per-hop-greedy
    * min-path (same tie-break rule as [[bfsPaths]], per root). */
  def bfsPathsFrom(edges: DataFrame, sources: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visited = sources.select(col("id")).distinct()
      .select(col("id").as("root"), col("id"), lit(0).as("dist"),
        col("id").cast("string").as("path"))
      .localCheckpoint()
    var frontier = visited
    var frontierCount = frontier.count()
    var depth = 0
    while (depth < maxIter && frontierCount > 0) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id"),
          concat(col("path"), lit(">"), e("dst")).as("path"))
        .groupBy(col("root"), col("id")).agg(min(col("path")).as("path"))
        .join(visited.select(col("root"), col("id")), Seq("root", "id"), "left_anti")
        .withColumn("dist", lit(depth))
        .select(col("root"), col("id"), col("dist"), col("path"))
        .localCheckpoint(false) // lazy: count below materializes
      frontierCount = next.count()
      if (frontierCount > 0) visited = visited.unionByName(next).localCheckpoint()
      frontier = next
    }
    e.unpersist()
    visited
  }

  /** ALL shortest paths (Cypher `allShortestPaths` parity): every
    * minimal-length path for every (root, reached) pair, as ONE
    * multi-source keyed frontier. Same loop as [[bfsPathsFrom]], but
    * the per-depth step keeps EVERY distinct path instead of the
    * per-hop-greedy minimum — a node first reached at depth d emits
    * one row per tied path. The anti-join is on (root, id) KEYS (kept
    * separately from the multi-row path state), so later depths never
    * re-reach a node, exactly like the single-path variant.
    *
    * Scale note: the number of tied paths per pair is σ — the Brandes
    * shortest-path COUNT — which grows combinatorially on
    * diamond-dense graphs; the frontier carries one row per (root,
    * node, path). Keep `maxIter` tight (Cypher callers bound it with
    * the hop pattern) and treat the output as per-pair enumerable, the
    * same contract Neo4j's allShortestPaths has. */
  def bfsAllPathsFrom(edges: DataFrame, sources: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = sources.select(col("id")).distinct()
      .select(col("id").as("root"), col("id"), lit(0).as("dist"),
        col("id").cast("string").as("path"))
      .localCheckpoint()
    var visitedKeys = frontier.select(col("root"), col("id")).localCheckpoint()
    var acc = frontier
    var frontierCount = frontier.count()
    var depth = 0
    while (depth < maxIter && frontierCount > 0) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id"),
          concat(col("path"), lit(">"), e("dst")).as("path"))
        .distinct() // parallel edges collapse; genuinely distinct ties stay
        .join(visitedKeys, Seq("root", "id"), "left_anti")
        .withColumn("dist", lit(depth))
        .select(col("root"), col("id"), col("dist"), col("path"))
        .localCheckpoint(false) // lazy: count below materializes
      frontierCount = next.count()
      if (frontierCount > 0) {
        visitedKeys = visitedKeys
          .unionByName(next.select(col("root"), col("id")).distinct())
          .localCheckpoint()
        acc = acc.unionByName(next) // union of checkpointed leaves: plan stays flat
      }
      frontier = next
    }
    e.unpersist()
    acc
  }

  /** Multi-source BFS DISTANCES: every (root, reached, dist) triple
    * for the given roots, as ONE keyed frontier (the [[bfsPathsFrom]]
    * loop without path strings — state rows are (root, id, dist), one
    * equi-join + one (root, id) anti-join per round; never a per-root
    * loop). */
  def bfsDistancesFrom(edges: DataFrame, sources: DataFrame, maxIter: Int = 20,
                       localFinishEdges: Long = 250000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (LocalGraph.equatableId(e.schema("src").dataType) &&
        e.count() <= localFinishEdges) {
      // the roots collect is bounded too (limit-probed): a caller
      // passing a giant source frame over a tiny graph falls through,
      // as does a |roots|·|V| output / |roots|·|E| work overrun
      // (LocalGraph returns None past its own bounds). Roots CAST to
      // the edge id type first — local HashMaps key on exact runtime
      // values where the distributed joins coerce (see [[bfs]]).
      val idType = e.schema("src").dataType
      val roots = sources.select(col("id").cast(idType).as("id"))
        .filter(col("id").isNotNull).distinct()
        .limit(localFinishEdges.toInt + 1).collect().map(_.get(0))
      if (roots.length <= localFinishEdges) {
        val pairs = e.collect().map(r => (r.get(0), r.get(1)))
        LocalGraph.bfsDistancesFrom(edges.sparkSession, pairs, roots,
            maxIter, idType).foreach { out =>
          e.unpersist()
          return out
        }
      }
    }
    var visited = sources.select(col("id").cast(e.schema("src").dataType).as("id"))
      .filter(col("id").isNotNull).distinct()
      .select(col("id").as("root"), col("id"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = visited
    var frontierCount = frontier.count()
    var depth = 0
    while (depth < maxIter && frontierCount > 0) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id")).distinct()
        .join(visited.select(col("root"), col("id")), Seq("root", "id"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(false) // lazy: count below materializes
      frontierCount = next.count()
      if (frontierCount > 0) visited = visited.unionByName(next).localCheckpoint()
      frontier = next
    }
    e.unpersist()
    visited
  }

  /** Keyed multi-source weighted shortest distances — the weighted twin
    * of [[bfsDistancesFrom]]: returns (root, id, dist) where dist is
    * the minimum total weight over paths of ≤ `maxIter` edges
    * (hop-bounded Bellman-Ford — exact SSSP once maxIter ≥ the
    * weighted-shortest-path hop diameter). Frontier-based: only
    * (root, id) pairs whose distance improved propagate, so settled
    * regions stop costing; every round is one equi-join + one
    * (root, id)-keyed min + one anti-join. `dist` is DOUBLE (sums of
    * the weight column — exact for integer-valued weights). */
  def ssspFrom(edges: DataFrame, roots: DataFrame, maxIter: Int = 10,
               weightCol: String = "w",
               localFinishEdges: Long = 250000L): DataFrame = {
    // null weights are dropped up front (an edge with no weight does
    // not exist for weighted distances) — also what the local mirror
    // assumes; weight-typo loudness lives at the CALL surface probes
    val e = edges.select(col("src"), col("dst"),
        col(weightCol).cast("double").as("w"))
      .filter(col("w").isNotNull).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eCount = e.count() // materializes the persist either way
    // zero/negative weights: a zero-weight shortest distance makes the
    // target fail closeness's dist > 0 filter (silently "unreachable"),
    // and negatives diverge from GDS — refuse loudly, same contract as
    // weighted betweenness (nulls stay dropped above: edge-not-present)
    require(e.filter(col("w") <= 0).limit(1).count() == 0,
      s"sssp: weight column '$weightCol' must be strictly positive on every " +
        "weighted edge (zero/negative weights silently skew closeness and " +
        "diverge from GDS)")
    if (LocalGraph.equatableId(e.schema("src").dataType) &&
        eCount <= localFinishEdges) {
      val idType = e.schema("src").dataType
      val rootArr = roots.select(col("id").cast(idType).as("id"))
        .filter(col("id").isNotNull).distinct()
        .limit(localFinishEdges.toInt + 1).collect().map(_.get(0))
      if (rootArr.length <= localFinishEdges) {
        val triples = e.collect().map(r => (r.get(0), r.get(1), r.getDouble(2)))
        LocalGraph.ssspFrom(edges.sparkSession, triples, rootArr, maxIter,
            idType).foreach { out =>
          e.unpersist()
          return out
        }
      }
    }
    var dist = roots.select(col("id").cast(e.schema("src").dataType).as("id"))
      .filter(col("id").isNotNull).distinct()
      .select(col("id").as("root"), col("id"), lit(0.0).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var n = frontier.count()
    var iter = 0
    while (iter < maxIter && n > 0) {
      iter += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("root"), col("id")).agg(min(col("nd")).as("nd"))
      val improved = cand
        .join(dist.select(col("root").as("o_root"), col("id").as("o_id"),
            col("dist").as("od")),
          cand("root") === col("o_root") && cand("id") === col("o_id"), "left")
        .filter(col("od").isNull || col("nd") < col("od"))
        .select(col("root"), col("id"), col("nd").as("dist"))
        .localCheckpoint()
      n = improved.count()
      if (n > 0)
        dist = dist
          .join(improved.select(col("root").as("i_root"), col("id").as("i_id")),
            dist("root") === col("i_root") && dist("id") === col("i_id"), "left_anti")
          .unionByName(improved).localCheckpoint()
      frontier = improved
    }
    e.unpersist()
    dist
  }

  /** Weighted shortest-path EXTRACTION — [[ssspFrom]]'s improvement
    * propagation composed with [[bfsPathsFrom]]'s path carry (the GDS
    * `gds.shortestPath.dijkstra.stream` capability): returns
    * (root, id, dist, path) where dist is the minimal total weight
    * over paths of ≤ `maxIter` edges and path materializes ONE such
    * minimal path as a '>'-joined id string.
    *
    * Determinism contract: among minimal-weight paths the FEWEST-EDGE
    * ones win (acceptance is strict improvement only, and round k
    * candidates have exactly k edges, so the minimal hop count arrives
    * first and later equal-weight candidates never replace it); among
    * same-round candidates the struct-min (dist, path-string) is kept —
    * the round-synchronous analogue of [[bfsPaths]]'s per-hop greedy
    * rule (NOT always the global lexicographic minimum over all
    * minimal paths: an oracle must replay the round-synchronous rule,
    * which the unrolled g_wpaths CTE does stage by stage). Weights
    * must be strictly positive (loud probe, like [[ssspFrom]]);
    * null-weight edges are dropped (edge-not-present).
    *
    * Scale shape: state is |roots|·|reached| keyed rows; every round
    * is one equi-join + one (root, id)-keyed struct-min + one
    * anti-join — the [[ssspFrom]] plan plus a path column, no extra
    * shuffle. */
  def ssspPathsFrom(edges: DataFrame, roots: DataFrame, maxIter: Int = 10,
                    weightCol: String = "w"): DataFrame =
    ssspPathsFromImpl(edges, roots, maxIter, weightCol)._1

  /** [[ssspPathsFrom]] plus a TRUNCATION flag (r14): true iff the
    * relaxation loop hit `maxIter` while the frontier was still
    * improving — i.e. distances past the hop bound are UNPROVEN, so a
    * caller that would otherwise treat absent ids as unreachable
    * ([[steinerTree]]) must raise instead of silently dropping them. */
  private[graph] def ssspPathsFromImpl(edges: DataFrame, roots: DataFrame,
                                       maxIter: Int = 10,
                                       weightCol: String = "w"): (DataFrame, Boolean) = {
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"),
        col(weightCol).cast("double").as("w"))
      .filter(col("w").isNotNull).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.filter(col("w") <= 0).limit(1).count() == 0,
      s"sssp: weight column '$weightCol' must be strictly positive on every " +
        "weighted edge (zero/negative weights silently skew closeness and " +
        "diverge from GDS)")
    var state = roots.select(col("id").cast("string").as("id"))
      .filter(col("id").isNotNull).distinct()
      .select(col("id").as("root"), col("id"), lit(0.0).as("dist"),
        col("id").as("path"))
      .localCheckpoint()
    var frontier = state
    var n = frontier.count()
    var iter = 0
    while (iter < maxIter && n > 0) {
      iter += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id"),
          (col("dist") + col("w")).as("nd"),
          concat(col("path"), lit(">"), e("dst")).as("npath"))
        .groupBy(col("root"), col("id"))
        .agg(min(struct(col("nd"), col("npath"))).as("b"))
        .select(col("root"), col("id"), col("b.nd").as("nd"),
          col("b.npath").as("npath"))
      val improved = cand
        .join(state.select(col("root").as("o_root"), col("id").as("o_id"),
            col("dist").as("od")),
          cand("root") === col("o_root") && cand("id") === col("o_id"), "left")
        .filter(col("od").isNull || col("nd") < col("od"))
        .select(col("root"), col("id"), col("nd").as("dist"),
          col("npath").as("path"))
        .localCheckpoint(false) // lazy: count below materializes
      n = improved.count()
      if (n > 0)
        state = state
          .join(improved.select(col("root").as("i_root"), col("id").as("i_id")),
            state("root") === col("i_root") && state("id") === col("i_id"),
            "left_anti")
          .unionByName(improved).localCheckpoint()
      frontier = improved
    }
    e.unpersist()
    (state, n > 0) // n > 0 here ⇔ the hop bound cut an active frontier
  }

  /** B39 — BELLMAN-FORD with NEGATIVE weights (`gds.bellmanFord`;
    * r13): single-source shortest paths where edge weights may be
    * negative — the GDS catalog's dijkstra escape hatch — with
    * NEGATIVE-CYCLE detection. The relaxation loop is
    * [[ssspPathsFrom]]'s verbatim (per round one candidate equi-join +
    * keyed struct-min + strictly-improving merge — round-synchronous
    * Bellman-Ford is exactly what that frontier already is; only the
    * positivity probe differs), and in a negative-cycle-free graph
    * shortest walks are simple, so it settles in < |V| rounds. An
    * improvement in round |V| proves a shortest walk with ≥ |V| edges
    * — necessarily a repeated vertex on a NEGATIVE cycle — and raises
    * LOUDLY (GDS streams the cycle; exact-or-loud is the house rule,
    * and the message says which). Deterministic tie-breaks as in
    * ssspPathsFrom (fewest-hops-first among equal-weight walks, struct
    * (dist, path) min within a round). Returns (id, dist, path) for
    * every vertex reachable from `source`. */
  def bellmanFord(edges: DataFrame, source: String,
                  weightCol: String = "w"): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"),
        col(weightCol).cast("double").as("w"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.filter(col("w").isNull).limit(1).count() == 0,
      s"bellmanFord: weight column '$weightCol' is null or non-numeric " +
        "on at least one edge")
    // the source is a vertex even when the edge frame is empty (or
    // doesn't mention it) — without the floor, nV = 0 would trip the
    // round-1 negative-cycle require on a trivially cycle-free input
    val nV = math.max(1L, e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().count())
    var state = spark.range(1)
      .select(lit(source).as("id"), lit(0.0).as("dist"),
        lit(source).as("path"))
      .localCheckpoint()
    var frontier = state
    var n = frontier.count()
    var round = 0L
    while (n > 0) {
      round += 1
      require(round <= nV, // improvement in round |V| ⇒ non-simple walk
        s"bellmanFord: still improving after $nV rounds — a NEGATIVE " +
          s"CYCLE is reachable from '$source' (shortest paths are " +
          "undefined on it)")
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"), (col("dist") + col("w")).as("nd"),
          concat(col("path"), lit(">"), e("dst")).as("npath"))
        .groupBy(col("id"))
        .agg(min(struct(col("nd"), col("npath"))).as("b"))
        .select(col("id"), col("b.nd").as("nd"), col("b.npath").as("npath"))
      val improved = cand
        .join(state.select(col("id").as("o_id"), col("dist").as("od")),
          cand("id") === col("o_id"), "left")
        .filter(col("od").isNull || col("nd") < col("od"))
        .select(col("id"), col("nd").as("dist"), col("npath").as("path"))
        .localCheckpoint(false) // lazy: count below materializes
      n = improved.count()
      if (n > 0)
        state = state
          .join(improved.select(col("id").as("i_id")),
            state("id") === col("i_id"), "left_anti")
          .unionByName(improved).localCheckpoint()
      frontier = improved
    }
    val out = state
    graft.Borrow.reclaim(out, e)
  }

  /** B30 — A* single-pair shortest path (`gds.shortestPath.astar`
    * parity, r12): the [[ssspPathsFrom]] Bellman-Ford frontier with
    * GOAL-DIRECTED PRUNING. `heuristic` is a per-node (id, h) frame of
    * ADMISSIBLE remaining-cost lower bounds (the caller's contract,
    * exactly as GDS leaves haversine-vs-weight consistency to the
    * user); ids absent from it read h = 0, and an EMPTY heuristic is
    * plain dijkstra. Each round, once a complete s→t path of cost B
    * is known, every improved frontier row with g + h(v) > B is
    * dropped: any completion costs ≥ g + h(v) > B, so it can affect
    * neither the target's distance nor its tie-break (ties need
    * total = B; pruning is STRICT for exactly that reason). The
    * relaxation itself — min(struct(nd, npath)) candidate pick,
    * strictly-improving state merge — is ssspPathsFrom's verbatim, so
    * the returned target row is bit-identical to dijkstra's (the sql
    * gate pins this against the unrolled Bellman-Ford oracle).
    *
    * Scale shape: per round one equi-join + one keyed agg + one
    * left-anti merge, all pre-pruned by the broadcastable heuristic
    * join; the target-distance probe is ONE bounded 1-row action per
    * round (the house probe budget). Returns (root, id, dist, path)
    * for the target — empty when unreachable within maxIter hops. */
  def astarPath(edges: DataFrame, source: String, target: String,
                heuristic: DataFrame, maxIter: Int = 10,
                weightCol: String = "w"): DataFrame =
    astarInstrumented(edges, source, target, heuristic, maxIter, weightCol)._1

  /** [[astarPath]] plus the total improved-row count across rounds —
    * the spec asserts goal-direction by comparing it against the
    * h = 0 run on the same graph. */
  private[graft] def astarInstrumented(
      edges: DataFrame, source: String, target: String,
      heuristic: DataFrame, maxIter: Int, weightCol: String)
      : (DataFrame, Long) = {
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"),
        col(weightCol).cast("double").as("w"))
      .filter(col("w").isNotNull).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.filter(col("w") <= 0).limit(1).count() == 0,
      "astar: weights must be strictly positive (GDS contract)")
    val h = heuristic.select(col("id").cast("string").as("id"),
      col("h").cast("double").as("h"))
    var state = spark.range(1)
      .select(lit(source).as("root"), lit(source).as("id"),
        lit(0.0).as("dist"), lit(source).as("path"))
      .localCheckpoint()
    var frontier = state
    var n = frontier.count()
    var best = Double.PositiveInfinity
    var expanded = 0L
    var iter = 0
    while (iter < maxIter && n > 0) {
      iter += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id"),
          (col("dist") + col("w")).as("nd"),
          concat(col("path"), lit(">"), e("dst")).as("npath"))
        .groupBy(col("root"), col("id"))
        .agg(min(struct(col("nd"), col("npath"))).as("b"))
        .select(col("root"), col("id"), col("b.nd").as("nd"),
          col("b.npath").as("npath"))
      val improved0 = cand
        .join(state.select(col("id").as("o_id"), col("dist").as("od")),
          cand("id") === col("o_id"), "left")
        .filter(col("od").isNull || col("nd") < col("od"))
        .select(col("root"), col("id"), col("nd").as("dist"),
          col("npath").as("path"))
      // goal-directed prune: g + h(v) > best-known complete cost
      val improved = (if (best.isPosInfinity) improved0
        else improved0.join(h, Seq("id"), "left")
          .filter(col("dist") + coalesce(col("h"), lit(0.0)) <= best)
          .select(col("root"), col("id"), col("dist"), col("path")))
        .localCheckpoint(false) // lazy: count below materializes
      n = improved.count()
      expanded += n
      if (n > 0) {
        state = state
          .join(improved.select(col("id").as("i_id")),
            state("id") === col("i_id"), "left_anti")
          .unionByName(improved).localCheckpoint()
        // bounded probe: the target's current best distance
        val t = state.filter(col("id") === target)
          .select(col("dist")).limit(1).collect()
        if (t.nonEmpty) best = math.min(best, t.head.getDouble(0))
      }
      frontier = improved
    }
    e.unpersist()
    (state.filter(col("id") === target)
      .select(col("root"), col("id"), col("dist"), col("path")), expanded)
  }

  /** GDS-style haversine heuristic for [[astarPath]]: h(v) = great-
    * circle distance from v to the target, from per-node latitude/
    * longitude property columns (degrees). `earthRadius` sets the
    * unit (default km, 6371.0) — ADMISSIBILITY requires edge weights
    * in the same unit and ≥ the great-circle distance between their
    * endpoints, the caller's contract exactly as in GDS's
    * gds.shortestPath.astar. */
  def haversineHeuristic(coords: DataFrame, target: String,
                         earthRadius: Double = 6371.0): DataFrame = {
    val t = coords.filter(col("id").cast("string") === target)
      .select(col("lat").cast("double"), col("lon").cast("double"))
      .limit(1).collect()
    require(t.nonEmpty, s"astar: target '$target' has no coordinates row")
    val (tLat, tLon) = (math.toRadians(t.head.getDouble(0)),
      math.toRadians(t.head.getDouble(1)))
    val lat = radians(col("lat").cast("double"))
    val lon = radians(col("lon").cast("double"))
    val a = pow(sin((lat - lit(tLat)) / 2), 2) +
      cos(lat) * lit(math.cos(tLat)) * pow(sin((lon - lit(tLon)) / 2), 2)
    coords.select(col("id").cast("string").as("id"),
      (lit(2 * earthRadius) * asin(sqrt(a))).as("h"))
  }

  /** B18 — closeness centrality: closeness(v) = reached / Σ dist(v, u)
    * over the vertices u ≠ v reachable from v within `maxIter` hops
    * (the GDS-style components-aware variant — no global (n−1)
    * numerator, so disconnected graphs don't drown every score).
    * Roots with no reachable vertex are omitted. All roots run as ONE
    * multi-source keyed BFS.
    *
    * `weightCol` (GDS relationshipWeightProperty): distances come from
    * the keyed weighted Bellman-Ford ([[ssspFrom]]) instead of the hop
    * BFS — closeness = reached / Σ weighted dist; maxIter bounds path
    * EDGES, not weight. */
  def closeness(edges: DataFrame, roots: DataFrame, maxIter: Int = 20,
                weightCol: Option[String] = None): DataFrame = {
    val d = weightCol match {
      case Some(wc) => ssspFrom(edges, roots, maxIter, wc)
      case None => bfsDistancesFrom(edges, roots, maxIter)
    }
    d.filter(col("dist") > 0)
      .groupBy(col("root").as("id"))
      .agg(count(lit(1)).as("reached"), sum(col("dist")).as("total"))
      .select(col("id"),
        // tie-safe rounding: reached/Σdist is an exact rational — see Num.roundTies
        graft.operators.Num.roundTies(
          col("reached").cast("double") / col("total"), 6).as("closeness"))
  }

  /** B19 — harmonic centrality: harmonic(v) = Σ 1/dist(v, u) over
    * reachable u ≠ v (the centrality that stays meaningful on
    * disconnected graphs). FLOAT-DETERMINISM: the sum runs in exact
    * integers — Σ (2520 / d) with 2520 = lcm(1..10), every term an
    * exact integer for d ≤ 10 — and divides by 2520 once at the end,
    * so partial-aggregation order (and the oracle engine's order)
    * cannot perturb the rounded result. Hence maxIter ≤ 10. */
  def harmonic(edges: DataFrame, roots: DataFrame, maxIter: Int = 10): DataFrame = {
    require(maxIter <= 10, "harmonic uses lcm(1..10)=2520 exact-integer arithmetic")
    bfsDistancesFrom(edges, roots, maxIter)
      .filter(col("dist") > 0)
      .groupBy(col("root").as("id"))
      .agg(sum((lit(2520) / col("dist")).cast("long")).as("num"))
      .select(col("id"), round(col("num").cast("double") / 2520.0, 6).as("harmonic"))
  }

  /** B20 — betweenness centrality, Brandes' algorithm as keyed frames.
    *
    * Forward: one multi-source BFS over (root, id, dist, sigma) state
    * rows where sigma accumulates shortest-path COUNTS (sum over
    * predecessor frontier — the only change vs [[bfsDistancesFrom]]).
    * Backward: dependency accumulation per level, deepest first —
    * δ(u) = Σ over successors w of σ(u)/σ(w)·(1 + δ(w)); in an
    * unweighted BFS DAG every contribution to depth d−1 comes from
    * depth d, so each level's δ is FINAL when processed (one join +
    * one aggregation per level). Betweenness(v) = Σ_{roots s≠v} δ(s,v),
    * halved when `halve` (pass [[undirected]] edges + halve=true for
    * the undirected measure — each unordered pair is counted from both
    * endpoints' BFS).
    *
    * EXACT when `roots` = all vertices; a deterministic root sample
    * gives the standard Brandes estimate (scale path — cost is
    * O(levels) joins per round over |roots|-keyed state, never a
    * per-root loop).
    *
    * `undirectedInput = true` is an OPT-IN shortcut for symmetric edge
    * lists (e.g. via [[undirected]]): BFS dedup then anti-joins only
    * the last TWO level frames (in an undirected graph a neighbor of a
    * depth-(d−1) node sits at depth d−2, d−1, or d). Passing true for
    * a DIRECTED graph silently produces wrong dist/sigma — nodes
    * re-reached across a depth gap > 2 re-enter the BFS — so the
    * default is false (correct for any input; undirected inputs merely
    * pay the larger dedup). Ids of any type are compared as strings
    * (the output id column is string). */
  /** Dense LONG vertex dictionary for the Brandes-family iterations
    * (shared by the unweighted and weighted paths): every shuffle,
    * join and aggregation in those phases is keyed on (root, id) —
    * hashing and comparing packed longs instead of strings measured
    * ~2× on the string-keyed r4/r5 shapes, and the |roots|×|V| state
    * rows shrink to fixed-width columns. The dictionary is |V| rows
    * (tiny next to |E|), built with the same zipWithIndex
    * densification the GraphX bridge uses; ids decode back to strings
    * only on the |V|-row result.
    *
    * Returns (dict, broadcastable). The broadcast decision is
    * BYTE-GATED — an explicit broadcast() hint overrides
    * autoBroadcastJoinThreshold and never falls back, so at cluster
    * scale (|V| ~ 10⁸–10⁹, a dictionary of tens of GB) a forced hint
    * would OOM the driver. The gate estimates the broadcast's
    * in-memory size from the mean id length (riding the same job that
    * materializes the dict cache; ~48 B/entry of HashedRelation
    * overhead on top of the string bytes) and allows it under 512 MB —
    * right for 10M 32-byte ids, refused for 10M 200-byte ids on 8 GiB
    * executors — with a 10M-row cap kept as a backstop against
    * avg-length underestimates. Under the gate the hint is the
    * measured win (the dict is persisted but its stats aren't known
    * until materialized, so without the hint the first encode plans
    * sort-merge); past it the joins go through the planner, which
    * picks shuffle joins — the right plan there. */
  private def vertexDict(eStr: DataFrame): (DataFrame, Boolean) = {
    val spark = eStr.sparkSession
    import spark.implicits._
    val dict = eStr.select(col("src").as("id"))
      .union(eStr.select(col("dst").as("id"))).distinct()
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF("id", "vid").persist(StorageLevel.MEMORY_AND_DISK)
    val dictStats = dict
      .agg(count(lit(1)), coalesce(avg(length(col("id"))), lit(0.0))).collect()(0)
    val nV = dictStats.getLong(0)
    val estDictBytes = (nV * (dictStats.getDouble(1) + 48.0)).toLong
    (dict, estDictBytes <= 512L * 1024 * 1024 && nV <= 10L * 1000 * 1000)
  }

  def betweenness(edges: DataFrame, roots: DataFrame, maxIter: Int = 20,
                  halve: Boolean = true, undirectedInput: Boolean = false,
                  localFinishEdges: Long = 250000L,
                  weightCol: Option[String] = None): DataFrame = {
    // weighted (GDS relationshipWeightProperty): a DIFFERENT algorithm,
    // not a parameter — Dijkstra/Bellman-Ford-based Brandes over the
    // weighted shortest-path DAG (see [[betweennessWeighted]])
    weightCol.foreach { wc =>
      return betweennessWeighted(edges, roots, maxIter, halve, wc, localFinishEdges)
    }
    val spark = edges.sparkSession
    import spark.implicits._
    // Dense LONG vertex ids for the whole iteration: every shuffle,
    // join and aggregation below is keyed on (root, id) — hashing and
    // comparing packed longs instead of strings measured ~2× on the
    // string-keyed r4/r5 shapes, and the |roots|×|V| state rows shrink
    // to 4 fixed-width columns. The dictionary is |V| rows (tiny next
    // to |E|), broadcast into the three encode/decode joins; the
    // zipWithIndex pass is the same densification the GraphX bridge
    // uses. Ids are decoded back to strings only on the |V|-row result.
    val eStr = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK) // raw, possibly with dup edges:
    // the dedup `distinct` runs AFTER encoding, on packed longs — a
    // string-keyed distinct over |E| was the single most expensive
    // step of the encode phase
    // Bounded local finisher (LocalGraph.betweenness — exact Brandes
    // mirror, hop bound and halve included): gated on RAW edge rows
    // (dedup happens in memory) and a limit-probed roots collect.
    if (eStr.count() <= localFinishEdges) {
      val rootArr = roots.select(col("id").cast("string").as("id")).distinct()
        .limit(localFinishEdges.toInt + 1).collect().map(_.getString(0))
      if (rootArr.length <= localFinishEdges) {
        val pairs = eStr.collect().map(r => (r.getString(0): Any, r.getString(1): Any))
        LocalGraph.betweenness(spark, pairs, rootArr, maxIter, halve).foreach { out =>
          eStr.unpersist()
          return out
        }
      }
    }
    val (dict, broadcastDict) = vertexDict(eStr)
    def encSide(keyAs: String, vidAs: String) = {
      val side = dict.select(col("id").as(keyAs), col("vid").as(vidAs))
      if (broadcastDict) broadcast(side) else side
    }
    val e = eStr
      .join(encSide("src", "src_vid"), Seq("src"))
      .join(encSide("dst", "dst_vid"), Seq("dst"))
      .select(col("src_vid").as("src"), col("dst_vid").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eRen = e.select(col("src").as("e_src"), col("dst").as("e_dst"))
    val eFwd = eRen
    val eBwd = eRen
    // Every level frame is SEVERED (lazy localCheckpoint → its plan is
    // a LogicalRDD leaf from the moment it exists; the per-level
    // count() below materializes the blocks). The r5 persist-only
    // variant kept full lineage: level k's plan embedded every prior
    // level's plan via the visited anti-join, doubling plan size per
    // level — analysis cost exponential in BFS depth, 13.6 → 78 s in
    // the driver artifact, and a driver hang waiting at depth-30
    // graphs. With leaf levels the anti-join's plan is a bounded set
    // of leaf references and the dedup union stays genuinely lazy
    // (the r5 win that IS kept — no O(levels²) re-materialization).
    var frontier = graft.Borrow.severLazy(
      roots.select(col("id").cast("string").as("id")).distinct()
        .join(encSide("id", "vid"), Seq("id")) // roots outside the graph seed nothing either way
        .select(col("vid").as("root"), col("vid").as("id"), lit(0).as("dist"),
          lit(1L).as("sigma")))
    var levels = List(frontier) // head = deepest when the loop ends
    var depth = 0
    var n = frontier.count()
    while (depth < maxIter && n > 0) {
      depth += 1
      // Dedup anti-joins: in an UNDIRECTED graph a neighbor of a
      // depth-(d−1) node sits at depth d−2, d−1, or d — only the last
      // TWO level frames can collide, so the dedup never touches the
      // full accumulated state (whose re-shuffle per level grows with
      // Σ levels — the directed fallback). CHAINED per-level anti-joins
      // rather than one anti-join against a union: the candidate frame
      // (post-aggregation) and every cached level frame are all
      // (root, id)-hash-partitioned, so each chained anti-join is
      // exchange-free, while a union would erase the level frames'
      // partitioning and force a shuffle of both sides.
      val seen = if (undirectedInput) levels.take(2) else levels
      val next = graft.Borrow.severLazy(
        seen.map(_.select(col("root"), col("id")))
          .foldLeft(
            frontier.join(eFwd, col("id") === col("e_src"))
              .groupBy(col("root"), col("e_dst").as("nid"))
              .agg(sum(col("sigma")).as("sigma"))
              .withColumnRenamed("nid", "id"))(
            (acc, lvl) => acc.join(lvl.hint("shuffle_hash"), Seq("root", "id"), "left_anti"))
          .withColumn("dist", lit(depth))
          .select(col("root"), col("id"), col("dist"), col("sigma")))
      n = next.count() // materializes the severed blocks — one job/level
      if (n > 0) { levels ::= next }
      frontier = next
    }
    // backward sweep: levels head→tail is deepest→depth-0 (depth 0 —
    // the roots frame — receives but never emits). A depth-d node's δ
    // comes ONLY from the depth-(d+1) processing (the BFS DAG has no
    // other forward edges into it), so each level joins just the
    // PREVIOUS contrib frame, and its predecessor candidates are
    // exactly the NEXT list entry (the depth-(d−1) level frame) —
    // never the accumulated visited state. Contribs are NOT cached or
    // checkpointed: each contrib's plan bottoms out in leaf levels +
    // the previous contrib, so total final-plan size is O(levels²)
    // small nodes (fine for maxIter ≤ 20), ONE terminal action runs
    // the whole sweep as a single job, and exchange reuse dedups the
    // shared contrib shuffles (each contrib feeds exactly two
    // consumers — the next contrib and the final union — so its agg
    // computes at most twice from the same reused shuffle data). No
    // persist in the sweep ⇒ no concurrent-cache 'Block already
    // exists' races, the r5 bench-tail storm.
    var prevDelta: DataFrame = null // the last level's (root, id, delta)
    val contribs = scala.collection.mutable.Buffer.empty[DataFrame]
    for (i <- 0 until levels.length - 1) {
      val dd = levels(i) // (root, id, dist, sigma) at this depth
      val w = (if (prevDelta == null) dd.withColumn("delta", lit(0.0))
               else dd.join(prevDelta.hint("shuffle_hash"), Seq("root", "id"), "left")
                 .withColumn("delta", coalesce(col("delta"), lit(0.0))))
        .select(col("root"), col("id"), col("sigma"), col("delta"))
      // δ(u) = σ_u · Σ_{w ∈ succ(u)} (1+δ_w)/σ_w — factor σ_u OUT of the
      // per-edge emission: each depth-d node w sends (1+δ_w)/σ_w to
      // every NEIGHBOR, and the partial aggregation runs in the same
      // stage as the join, so the |roots|-amplified per-edge expansion
      // is combined map-side and never crosses the wire (the r5 shape
      // shuffled it twice). Non-predecessor neighbors (depth d or d+1
      // for that root) are dropped by the inner join against the
      // depth-(d−1) level frame below, which also supplies σ_u; both
      // that join's inputs and the w-join with prevDelta above are
      // already (root, key)-hash-partitioned, so neither adds an
      // exchange. The e-side exchange is identical across levels and
      // reused within the one terminal job.
      val s = w.join(eBwd, col("id") === col("e_dst"))
        .select(col("root"), col("e_src"),
          ((lit(1.0) + col("delta")) / col("sigma").cast("double")).as("cpart"))
        .groupBy(col("root"), col("e_src")).agg(sum(col("cpart")).as("sfac"))
      val preds = levels(i + 1).select(col("root").as("proot"),
        col("id").as("uid"), col("sigma").as("usigma"))
      val contrib = s
        .join(preds.hint("shuffle_hash"),
          col("root") === col("proot") && col("e_src") === col("uid"))
        .select(col("root"), col("uid").as("id"),
          (col("usigma").cast("double") * col("sfac")).as("delta"))
      contribs += contrib
      prevDelta = contrib
    }
    val allV = dict.select(col("vid").as("id")) // dict IS the vertex set
    val summedVid =
      if (contribs.isEmpty) allV.withColumn("betweenness", lit(0.0))
      else allV.join(
          contribs.reduce(_ unionByName _)
            .filter(col("id") =!= col("root"))
            .groupBy(col("id")).agg(sum(col("delta")).as("b")),
          Seq("id"), "left")
        .select(col("id"),
          // tie-safe: δ sums are rationals (σ-fraction sums) that can
          // land exactly on a 6th-decimal tie — see Num.roundTies
          graft.operators.Num.roundTies(
            coalesce(col("b"), lit(0.0)) / lit(if (halve) 2.0 else 1.0), 6)
            .as("betweenness"))
    val dec0 = dict.select(col("id").as("str_id"), col("vid"))
    val dec = if (broadcastDict) broadcast(dec0) else dec0
    val summed = summedVid.join(dec, summedVid("id") === dec0("vid"))
      .select(col("str_id").as("id"), col("betweenness"))
    // materialize (small: |V| rows) before releasing the borrows —
    // the whole lazy backward sweep executes HERE as one job. The
    // severed level blocks are method-local: the ContextCleaner frees
    // them on GC (see Borrow.severLazy), warning-free.
    graft.Borrow.reclaim(summed, eStr, e, dict)
  }

  /** B20w — WEIGHTED betweenness (Dijkstra-based Brandes), as four
    * keyed-frame phases. The unweighted sweep's level-synchronous trick
    * (every successor exactly one BFS level deeper) does not hold on
    * weighted shortest-path DAGs, so the phases synchronize on the
    * LONGEST-PATH LAYERING of the DAG instead:
    *
    *  A. hop-bounded synchronous Bellman-Ford over (root, id) state
    *     carrying (dist, hops) where hops = the max edge count over
    *     minimal-weight paths — refined as (min dist, then max hops).
    *     Every DAG edge strictly increases hops, so hops IS a valid
    *     topological layering with ≤ maxIter layers.
    *  B. the shortest-path DAG: edges with dist(u) + w = dist(v) per
    *     root (exact for integer-valued weights; float weights may
    *     split ties by ulp — same caveat as every engine's weighted
    *     Brandes). Each DAG edge is annotated with its SOURCE
    *     endpoint's layer (`ulvl`) — phase D keys its emissions on it.
    *  C. σ by DAG-path counting: p_k(v) = paths of exactly k DAG
    *     edges, propagated frontier-style (one join + keyed sum per
    *     round, like the unweighted BFS); σ = Σ_k p_k. Terminates
    *     because every DAG path has ≤ maxIter edges (layer bound).
    *  D. backward δ by layer, deepest first: δ(u) = σ_u·Σ over DAG
    *     successors w of (1+δ_w)/σ_w. Successors may sit ANY number of
    *     layers deeper, so each layer's (1+δ)/σ emissions carry their
    *     TARGET's layer (the dag `ulvl` column) and partial-aggregate
    *     into ONE running pending frame keyed (root, id, tlvl); layer
    *     l consumes its tlvl = l slice and rolls the rest forward —
    *     one join + one keyed sum per layer over a frame bounded by
    *     the outstanding contributions. (The r9 shape re-unioned EVERY
    *     deeper layer's raw emission pool once per layer: O(layers²)
    *     scans of |roots|·|V|-shaped frames — the scale-killer this
    *     rewrite removes.)
    *
    * Parallel edges collapse to their minimum weight first (only
    * minimal-weight paths matter; σ counts simple-graph paths — the
    * local mirror and the oracle do the same); the collapse runs on
    * packed longs AFTER encoding (the unweighted lesson: a
    * string-keyed |E| aggregation was the most expensive encode step).
    * Weights must be strictly positive and non-null (loud probe —
    * zero/negative weights break the DAG layering). All four phases
    * run on dense LONG vertex ids ([[vertexDict]] — the unweighted
    * path's byte-gated dictionary, worth ~2× on exactly these shuffle
    * shapes); ids decode back to strings only on the |V|-row result.
    * Output (id, betweenness) over every vertex, halved when `halve`,
    * tie-safe-rounded at 6. Below `localFinishEdges` (RAW edge rows,
    * like the unweighted gate) an exact in-memory mirror runs instead
    * ([[LocalGraph.betweennessWeighted]]). */
  /** Shared refusal for the weighted-Brandes hop-bound pathologies —
    * thrown identically by the distributed path and the local mirror. */
  private[graph] val hopBoundMsg: String =
    "weighted betweenness: the maxIter hop bound binds on this graph (a " +
      "minimal-weight path's prefix is not hop-bounded-minimal), which makes " +
      "hop-bounded Brandes ill-defined — raise maxIter above the " +
      "weighted-shortest-path hop diameter"

  /** Shared loud-probe message for weighted-Brandes weight hygiene. */
  private def weightProbeMsg(weightCol: String): String =
    s"betweenness: weight column '$weightCol' must be strictly positive and " +
      "non-null on every edge (null/zero/negative weights break shortest-path " +
      "DAG layering)"

  private def betweennessWeighted(edges0: DataFrame, roots: DataFrame,
                                  maxIter: Int, halve: Boolean, weightCol: String,
                                  localFinishEdges: Long): DataFrame = {
    val spark = edges0.sparkSession
    val eStr = edges0.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"),
        col(weightCol).cast("double").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (eStr.count() <= localFinishEdges) {
      // sub-gate graphs: collapse + probe on the (small) string frame
      val eMin = eStr.groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      require(eMin.filter(col("w").isNull || col("w") <= 0).limit(1).count() == 0,
        weightProbeMsg(weightCol))
      val rootArr = roots.select(col("id").cast("string").as("id")).distinct()
        .limit(localFinishEdges.toInt + 1).collect().map(_.getString(0))
      if (rootArr.length <= localFinishEdges) {
        val triples = eMin.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        LocalGraph.betweennessWeighted(spark, triples, rootArr, maxIter, halve)
          .foreach { out => eMin.unpersist(); eStr.unpersist(); return out }
      }
      eMin.unpersist()
    }
    val (dict, broadcastDict) = vertexDict(eStr)
    def encSide(keyAs: String, vidAs: String) = {
      val side = dict.select(col("id").as(keyAs), col("vid").as(vidAs))
      if (broadcastDict) broadcast(side) else side
    }
    val e = eStr
      .join(encSide("src", "src_vid"), Seq("src"))
      .join(encSide("dst", "dst_vid"), Seq("dst"))
      .groupBy(col("src_vid").as("src"), col("dst_vid").as("dst"))
      .agg(min(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.filter(col("w").isNull || col("w") <= 0).limit(1).count() == 0,
      weightProbeMsg(weightCol))
    // ---- phase A: (dist, hops) fixpoint --------------------------
    var state = graft.Borrow.severLazy(
      roots.select(col("id").cast("string").as("id")).distinct()
        .join(encSide("id", "vid"), Seq("id")) // off-graph roots seed nothing
        .select(col("vid").as("root"), col("vid").as("id"), lit(0.0).as("dist"),
          lit(0).as("hops")))
    var frontier = state
    var n = frontier.count()
    var iter = 0
    while (iter < maxIter && n > 0) {
      iter += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(col("root"), e("dst").as("id"),
          (col("dist") + col("w")).as("nd"), (col("hops") + 1).as("nh"))
        .groupBy(col("root"), col("id"))
        // (min dist, then max hops): struct min compares nd first,
        // negated hops second
        .agg(min(struct(col("nd"), (-col("nh")).as("mh"))).as("b"))
        .select(col("root"), col("id"), col("b.nd").as("nd"), (-col("b.mh")).as("nh"))
      val improved = graft.Borrow.severLazy(cand
        .join(state.select(col("root").as("o_root"), col("id").as("o_id"),
            col("dist").as("od"), col("hops").as("oh")),
          cand("root") === col("o_root") && cand("id") === col("o_id"), "left")
        .filter(col("od").isNull || col("nd") < col("od") ||
          (col("nd") === col("od") && col("nh") > col("oh")))
        .select(col("root"), col("id"), col("nd").as("dist"), col("nh").as("hops")))
      n = improved.count()
      if (n > 0)
        state = graft.Borrow.severLazy(
          state.join(improved.select(col("root").as("i_root"), col("id").as("i_id")),
              state("root") === col("i_root") && state("id") === col("i_id"),
              "left_anti")
            .unionByName(improved))
      frontier = improved
    }
    // ---- phase B: shortest-path DAG ------------------------------
    val du = state.select(col("root").as("d_root"), col("id").as("u"),
      col("dist").as("ud"), col("hops").as("uh"))
    val dv = state.select(col("root").as("v_root"), col("id").as("v"),
      col("dist").as("vd"), col("hops").as("vh"))
    val dag0 = e.join(du, e("src") === col("u"))
      .join(dv, col("d_root") === col("v_root") && e("dst") === col("v"))
      .filter(col("ud") + col("w") === col("vd"))
    // HOP-BOUND PATHOLOGY PROBE (i): with UNBOUNDED true distances
    // every DAG edge strictly increases the max-hops layering; when
    // the maxIter bound binds on a prefix-suboptimal minimal walk the
    // invariant can break, and then the layer-synchronized sweeps
    // below silently under-credit. Exact-or-loud: refuse instead.
    if (dag0.filter(col("uh") >= col("vh")).limit(1).count() > 0)
      throw new IllegalStateException(hopBoundMsg)
    val dag = dag0
      .select(col("d_root").as("droot"), col("u"), col("v"), col("uh").as("ulvl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ---- phase C: σ = DAG-path counts, frontier-propagated -------
    var pfront = graft.Borrow.severLazy(
      state.filter(col("hops") === 0).select(col("root"), col("id"), lit(1L).as("p")))
    var sigmaParts = List(pfront)
    n = pfront.count()
    var k = 0
    while (n > 0 && k < maxIter) {
      k += 1
      val nxt = graft.Borrow.severLazy(
        pfront.join(dag, pfront("root") === dag("droot") && pfront("id") === dag("u"))
          .groupBy(col("droot").as("root"), col("v").as("id"))
          .agg(sum(col("p")).as("p")))
      n = nxt.count()
      if (n > 0) sigmaParts ::= nxt
      pfront = nxt
    }
    val sigma = sigmaParts.map(_.select(col("root"), col("id"), col("p")))
      .reduce(_ unionByName _)
      .groupBy(col("root"), col("id")).agg(sum(col("p")).as("sigma"))
    val sigmaState = state.join(sigma, Seq("root", "id"))
      .select(col("root"), col("id"), col("hops"), col("sigma"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // PATHOLOGY PROBE (ii): every reached (root, id) must carry σ ≥ 1
    // (roots have σ = 1 by seeding); a reached vertex with NO bounded
    // DAG path means its minimal walk's prefix was not hop-bounded-
    // minimal — same ill-posed class as probe (i), same refusal
    if (state.count() != sigmaState.count())
      throw new IllegalStateException(hopBoundMsg)
    val maxLvlRow = sigmaState.agg(max(col("hops"))).collect()(0)
    val maxLvl = if (maxLvlRow.isNullAt(0)) 0 else maxLvlRow.getInt(0)
    // ---- phase D: backward δ, ONE running pending frame ----------
    // pend: (root, id, tlvl, c) = outstanding Σ (1+δ_w)/σ_w
    // contributions addressed to vertex id at layer tlvl, partial-
    // aggregated; tlvl is functionally determined by (root, id) —
    // carrying it lets each layer consume its slice with a FILTER on
    // the severed leaf instead of a join against sigmaState
    var pend: DataFrame = null
    var deltas = List.empty[DataFrame]
    for (lvl <- maxLvl to 1 by -1) {
      val atLvl = sigmaState.filter(col("hops") === lvl)
      val dlvl = graft.Borrow.severLazy(
        (if (pend == null) atLvl.withColumn("cs", lit(0.0))
         else atLvl.join(
             pend.filter(col("tlvl") === lvl)
               .select(col("root"), col("id"), col("c").as("cs")),
             Seq("root", "id"), "left")
           .withColumn("cs", coalesce(col("cs"), lit(0.0))))
        .select(col("root"), col("id"), col("sigma"),
          (col("sigma").cast("double") * col("cs")).as("delta")))
      // emissions to DAG predecessors, keyed by the predecessor's
      // layer (ulvl rides the dag frame); the aggregation runs in the
      // same stage as the join, so the |roots|-amplified per-edge
      // expansion combines map-side before the shuffle — the
      // unweighted sweep's factoring, adapted to any-depth successors
      val em = dlvl.join(dag, dlvl("root") === dag("droot") && dlvl("id") === dag("v"))
        .select(col("droot").as("root"), col("u").as("id"),
          col("ulvl").as("tlvl"),
          ((lit(1.0) + col("delta")) / col("sigma").cast("double")).as("c"))
        .groupBy(col("root"), col("id"), col("tlvl")).agg(sum(col("c")).as("c"))
      pend = graft.Borrow.severLazy(
        if (pend == null) em
        else pend.filter(col("tlvl") < lvl).unionByName(em)
          .groupBy(col("root"), col("id"), col("tlvl")).agg(sum(col("c")).as("c")))
      deltas ::= dlvl.select(col("root"), col("id"), col("delta"))
    }
    val allV = dict.select(col("vid").as("id")) // dict IS the vertex set
    val outVid =
      if (deltas.isEmpty) allV.withColumn("betweenness", lit(0.0))
      else allV.join(
          deltas.reduce(_ unionByName _)
            .filter(col("id") =!= col("root"))
            .groupBy(col("id")).agg(sum(col("delta")).as("b")),
          Seq("id"), "left")
        .select(col("id"),
          graft.operators.Num.roundTies(
            coalesce(col("b"), lit(0.0)) / lit(if (halve) 2.0 else 1.0), 6)
            .as("betweenness"))
    val dec0 = dict.select(col("id").as("str_id"), col("vid"))
    val dec = if (broadcastDict) broadcast(dec0) else dec0
    val out = outVid.join(dec, outVid("id") === dec0("vid"))
      .select(col("str_id").as("id"), col("betweenness"))
    graft.Borrow.reclaim(out, eStr, e, dict, dag, sigmaState)
  }

  /** Per-vertex triangle count over the undirected simple graph.
    *
    * Degree-ordered orientation (every edge points from its lower-
    * (degree, id) endpoint to the higher one) makes each triangle
    * produce EXACTLY one wedge — at its lowest-ordered vertex — and
    * bounds total wedge generation by O(m^{3/2}) regardless of degree
    * skew (the node-iterator++ / compact-forward scheme): a star hub
    * with degree d would otherwise generate d² wedges, the classic
    * triangle-count blowup on power-law graphs.
    */
  /** Persist unless the canonicalized plan is already in the cache
    * manager (e.g. a second operator over the same edge frame — the
    * triangles/clustering-coefficient pair): re-persisting is a no-op
    * that only emits a CacheManager warning, and a clean log is what
    * lets REAL cache anomalies show. */
  private def persistIfNew(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist(StorageLevel.MEMORY_AND_DISK)
    else df

  /** Each distinct triangle once, as (a, b, c) in DEGREE-orientation
    * order — the shared core of [[triangles]] (count) and
    * [[triangleEnumerate]] (stream). */
  private def triangleTriples(edges: DataFrame): DataFrame = {
    // both persists deliberately stay registered for the session: the
    // returned frame is LAZY, so an unpersist here would run before the
    // caller materializes anything (the e3-style lifecycle bug), and an
    // eager localCheckpoint of `orient` measured ~3× slower than the
    // persist + runtime exchange-reuse plan. Frames are O(|edges|);
    // callers that need the memory back can clearCache().
    val sym = persistIfNew(undirected(edges).filter(col("src") =!= col("dst")))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val orient = persistIfNew(sym
      .join(deg.select(col("id").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("d").as("dd")), Seq("dst"))
      .filter(col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src").as("u"), col("dst").as("v")))
    // wedges at the lowest-ordered vertex (b, c ordered by id to avoid
    // emitting each wedge twice); the closing edge may carry either
    // orientation, so close against the id-canonical edge set
    val wedges = orient.alias("e1").join(orient.alias("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val closure = orient.select(
      least(col("u"), col("v")).as("b"), greatest(col("u"), col("v")).as("c"))
    wedges.join(closure, Seq("b", "c"), "left_semi")
  }

  def triangles(edges: DataFrame): DataFrame =
    triangleTriples(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))

  /** B33 — triangle ENUMERATION (`gds.triangles` stream parity, r12):
    * every distinct triangle once, vertices re-sorted to id order
    * (a < b < c) so the output is engine-canonical and directly
    * oracle-comparable. Same degree-oriented wedge join as the count —
    * the join size carries the standard Σ min-degree enumeration
    * bound, never the naive 3-way id-join blowup on hubs. */
  def triangleEnumerate(edges: DataFrame): DataFrame =
    triangleTriples(edges)
      .select(array_sort(array(col("a"), col("b"), col("c"))).as("t"))
      .select(col("t").getItem(0).as("a"), col("t").getItem(1).as("b"),
        col("t").getItem(2).as("c"))

  /** Single-source shortest paths over weighted edges (src, dst, w),
    * hop-bounded Bellman-Ford: after `maxIter` rounds, dist(id) is the
    * minimum total weight over paths of at most `maxIter` edges (exact
    * SSSP once maxIter ≥ the weighted-shortest-path hop diameter).
    *
    * Frontier-based like [[bfs]]: only vertices whose distance improved
    * in round k propagate in round k+1, so settled regions of the graph
    * drop out of the join; early-stops when nothing improves.
    */
  def sssp(edges: DataFrame, sources: DataFrame, maxIter: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("id"), lit(0L).as("dist"))
      .distinct().localCheckpoint()
    var frontier = dist
    var frontierCount = frontier.count()
    var iter = 0
    while (iter < maxIter && frontierCount > 0) {
      iter += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("id")).agg(min(col("nd")).as("nd"))
      val improved = cand
        .join(dist.select(col("id").as("oid"), col("dist").as("od")),
          cand("id") === col("oid"), "left")
        .filter(col("od").isNull || col("nd") < col("od"))
        .select(col("id"), col("nd").as("dist"))
        .localCheckpoint()
      frontierCount = improved.count()
      if (frontierCount > 0) {
        dist = dist
          .join(improved.select(col("id").as("iid")),
            dist("id") === col("iid"), "left_anti")
          .unionByName(improved).localCheckpoint()
      }
      frontier = improved
    }
    e.unpersist()
    dist
  }

  /** k-core: the maximal subgraph where every vertex has degree ≥ k
    * (Neo4j GDS kCore's fixed-k building block), by iterative peeling —
    * each round drops vertices below k and recomputes degrees on the
    * induced subgraph; stops when no vertex is dropped. Returns the
    * surviving (id, deg) frame (empty when no k-core exists). Peeling
    * rounds are bounded by the longest degeneracy chain; each round is
    * one aggregation + two semi-joins. */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    var e = undirected(edges).filter(col("src") =!= col("dst")).localCheckpoint()
    var dropped = 1L
    var iter = 0
    var deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    while (iter < maxIter && dropped > 0) {
      iter += 1
      val keep = deg.filter(col("deg") >= k).select(col("id"))
      val e2 = e
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(false) // lazy: deg2's count materializes the pair
      val deg2 = e2.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(false)
      dropped = deg.count() - deg2.count()
      e = e2; deg = deg2
    }
    deg.filter(col("deg") >= k)
  }

  /** B43 — K-CORE DECOMPOSITION (`gds.kcore` proper, r14): the
    * CORENESS of every vertex — the largest k such that it survives
    * in the k-core. [[kCore]] extracts ONE level's subgraph (a
    * graft-ism); GDS's actual kcore proc streams (nodeId, coreValue),
    * which is this.
    *
    * Distributed path: the H-INDEX fixpoint (Lü et al. 2016, Nature
    * Communications — "The H-index of a network node and its relation
    * to degree and coreness"): c₀(v) = deg(v); per round c(v) ← the
    * H-index of its neighbors' current values (the largest h with
    * ≥ h neighbors valued ≥ h); c is pointwise non-increasing and
    * converges EXACTLY to coreness. H computes WITHOUT per-neighbor
    * ranking: group neighbors by value — H = max over DISTINCT values
    * of min(value, #neighbors ≥ value), so the per-vertex window sees
    * one row per distinct value (≤ current max coreness, usually ≪
    * degree), the cumulative count rides a value-desc window, and the
    * value grouping itself is a map-side-combinable aggregation.
    * Convergence probe: Σc, one 1-row agg per round — monotone, so an
    * unchanged sum IS the fixpoint. Rounds are graph-dependent (a
    * path propagates one hop per round — the honest worst case, the
    * bellmanFord |V|-bound analog); `maxIter` exhaustion is LOUD.
    *
    * Under `localFinishEdges` symmetric rows the exact driver-side
    * min-degree peel runs instead (the CC/louvain pattern);
    * forced-path equivalence spec-pinned on fixtures and seeded
    * random graphs. Returns (id, coreValue); isolated vertices are
    * absent (edge-derived vertex set, house rule). */
  def coreDecomposition(edges: DataFrame, maxIter: Int = 100,
                        localFinishEdges: Long = 250000L,
                        forceDistributed: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = edges.sparkSession
    val strEdges = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    val sym = undirected(strEdges)
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // vertices whose ONLY incident edges are self-loops vanish from
    // `sym` but are still projected nodes — GDS emits them at core 0
    // (self-loops are conventionally ignored for coreness; k1Coloring
    // r13 precedent, applied here per the r14 verdict)
    val loopOnly = strEdges.select(col("src").as("id"))
      .unionByName(strEdges.select(col("dst").as("id"))).distinct()
      .join(sym.select(col("src").as("id")), Seq("id"), "left_anti")
      .select(col("id"), lit(0).as("coreValue"))
    val nSym = sym.count()
    if (!forceDistributed && nSym <= localFinishEdges) {
      // exact O(E log V) peel: repeatedly take the minimum-degree
      // vertex; its coreness is the running maximum of the degrees
      // seen at removal time
      val pairs = sym.collect().map(r => (r.getString(0), r.getString(1)))
      import scala.collection.mutable
      val adj = mutable.HashMap.empty[String, mutable.HashSet[String]]
      pairs.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, mutable.HashSet.empty) += b
      }
      val deg = mutable.HashMap(adj.map { case (v, s) => v -> s.size }.toSeq: _*)
      val queue = mutable.TreeSet.empty[(Int, String)](
        Ordering.Tuple2(Ordering.Int, Ordering.String))
      deg.foreach { case (v, d) => queue += ((d, v)) }
      val core = mutable.HashMap.empty[String, Int]
      var k = 0
      while (queue.nonEmpty) {
        val (d, v) = queue.head; queue -= ((d, v))
        k = math.max(k, d)
        core(v) = k
        adj(v).foreach { u =>
          if (!core.contains(u)) {
            val du = deg(u)
            queue -= ((du, u)); deg(u) = du - 1; queue += ((du - 1, u))
          }
        }
      }
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      // loopOnly stays a DataFrame on BOTH branches: its cardinality is
      // independent of nSym (10⁹ self-loop-only vertices pass the local
      // gate), so it must never be collected — union it, exactly like
      // the distributed branch below
      val localCores = spark.createDataFrame(
        core.toSeq.sortBy(_._1)
          .map { case (v, c) => org.apache.spark.sql.Row(v, c) }.asJava,
        StructType(Seq(StructField("id", StringType),
          StructField("coreValue", IntegerType))))
      return graft.Borrow.reclaim(localCores.unionByName(loopOnly), sym)
    }
    var c = graft.Borrow.severLazy(
      sym.groupBy(col("src").as("id")).agg(count(lit(1)).cast("int").as("c")))
    var prevSum = -1L
    var sum = c.agg(coalesce(org.apache.spark.sql.functions.sum(col("c")), lit(0L)))
      .collect()(0).getLong(0)
    var iter = 0
    while (sum != prevSum) {
      iter += 1
      require(iter <= maxIter,
        s"coreDecomposition: H-index fixpoint still moving after $maxIter " +
          "rounds — deep peel cascades (path-like graphs) need a larger " +
          "maxIter; the bound is the honest propagation cost, like " +
          "bellmanFord's")
      // neighbors' values, grouped by value: (v, val, n); H = max over
      // distinct vals of min(val, cumulative count from the top)
      val nbrVals = sym.select(col("src").as("v"), col("dst").as("u"))
        .join(c.select(col("id").as("u"), col("c").as("val")), Seq("u"))
        .groupBy(col("v"), col("val")).agg(count(lit(1)).as("n"))
      val wDesc = Window.partitionBy(col("v")).orderBy(col("val").desc)
      val h = nbrVals
        .withColumn("cumge", org.apache.spark.sql.functions.sum(col("n")).over(wDesc))
        .select(col("v"),
          least(col("val").cast("long"), col("cumge")).as("hc"))
        .groupBy(col("v")).agg(max(col("hc")).cast("int").as("c"))
        .select(col("v").as("id"), col("c"))
      c = graft.Borrow.severLazy(h)
      prevSum = sum
      sum = c.agg(coalesce(org.apache.spark.sql.functions.sum(col("c")), lit(0L)))
        .collect()(0).getLong(0)
    }
    val out = c.select(col("id"), col("c").as("coreValue"))
      .unionByName(loopOnly)
    graft.Borrow.reclaim(out, sym)
  }

  /** Personalized PageRank: the random walk teleports back to the
    * `sources` set (uniformly) instead of to all vertices — rank
    * becomes relevance TO THE SEEDS, the GDS-style primitive for
    * "what matters around this trace/account/incident". Same
    * power-iteration shape as [[pageRank]]; sources are a broadcast
    * semi/anti side, so the per-round cost is unchanged. */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
                           iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val seeds = broadcast(sources.select(col("id")).distinct()).persist()
    val nSeeds = seeds.count().toDouble
    require(nSeeds > 0, "personalizedPageRank needs a non-empty source set")
    val teleport = (1 - damping) / nSeeds
    // r17 — the pageRank per-round shape: out-degrees pre-joined into
    // the cached (src-partitioned) edge frame; the per-round fill join
    // over ALL vertices replaced by a broadcast seed-flag join on the
    // (in-edge-covering) sums plus the constant no-in-edge union
    // (msum ≡ 0 there ⇒ rank ≡ teleport·is_seed). Values unchanged.
    val eod = e.join(
        e.groupBy(col("src")).count().withColumnRenamed("count", "deg"),
        Seq("src"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedFlag = seeds.select(col("id"), lit(true).as("is_seed"))
    val noIn = vertices.join(e.select(col("dst").as("id")).distinct(),
        Seq("id"), "left_anti")
      .join(seedFlag, Seq("id"), "left")
      .select(col("id"),
        when(col("is_seed"), lit(teleport)).otherwise(lit(0.0)).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices
      .join(seedFlag, Seq("id"), "left")
      .select(col("id"),
        when(col("is_seed"), lit(1.0 / nSeeds)).otherwise(lit(0.0)).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = eod.join(ranks, eod("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("contrib"))
      val sums = contribs.groupBy(col("id")).agg(sum(col("contrib")).as("msum"))
      ranks = sums
        .join(seedFlag, Seq("id"), "left")
        .select(col("id"),
          (when(col("is_seed"), lit(teleport)).otherwise(lit(0.0)) +
            lit(damping) * col("msum")).as("rank"))
        .unionByName(noIn)
        .localCheckpoint()
    }
    graft.Borrow.reclaim(ranks, e, vertices, eod, noIn, seeds)
  }

  /** Strongly connected components, DataFrame-native (B15's default is
    * the GraphX Pregel SCC via [[GraphXBridge]]; this variant keeps the
    * computation in DataFrames — AQE, caching, no id densification —
    * and is cross-checked against Pregel in the spec).
    *
    * Trim + forward-color + backward-reach (the coloring SCC of
    * Orzan / Slota et al.), per round:
    *
    *  1. TRIM: iteratively peel vertices lacking in- or out-edges —
    *     singleton SCCs. Clears the DAG-shaped bulk of telemetry
    *     graphs (spawn trees!) without any fixpoint.
    *  2. COLOR: propagate min vertex id forward to fixpoint —
    *     color(v) = min id with a path to v. A path from a vertex of
    *     color c back to its pivot c stays inside color class c (a
    *     smaller-colored intermediate would recolor c itself), so:
    *  3. REACH: pivots (color(v) == v) propagate BACKWARD through
    *     same-color edges; every vertex reached belongs to the pivot's
    *     SCC. Assign, remove, repeat.
    *
    * Rounds are bounded by the pivot-chain depth of the SCC condensation
    * (each round settles every color class's pivot SCC); each fixpoint
    * is hash-signature-converged like [[connectedComponents]]. Returns
    * (id, component) labelled by the component's minimum member id. */
  def sccDataFrame(edges: DataFrame, maxRounds: Int = 15): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val isolated = edges.select(col("src"), col("dst"))
      .filter(col("src") === col("dst"))
      .select(col("src").as("id")).distinct()
      .join(verts, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component")).localCheckpoint()
    val done = scala.collection.mutable.ListBuffer[DataFrame](isolated)
    def sig(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(20,0)")))
        .collect()(0).getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var nVerts = verts.count()
    var round = 0
    while (round < maxRounds && nVerts > 0) {
      round += 1
      // 1. trim
      var trimming = true
      while (trimming && nVerts > 0) {
        val core = e.select(col("src").as("id")).distinct()
          .join(e.select(col("dst").as("id")).distinct(), Seq("id"))
        val singles = verts.join(core, Seq("id"), "left_anti").localCheckpoint()
        if (singles.isEmpty) trimming = false
        else {
          done += singles.select(col("id"), col("id").as("component"))
          verts = verts.join(singles, Seq("id"), "left_anti").localCheckpoint()
          nVerts = verts.count()
          e = e.join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi")
            .localCheckpoint()
        }
      }
      if (nVerts > 0) {
        // 2. forward min-color fixpoint
        var colors = verts.select(col("id"), col("id").as("color")).localCheckpoint()
        var prevSig = sig(colors)
        var stable = false
        while (!stable) {
          val msgs = e.join(colors, e("src") === colors("id"))
            .select(e("dst").as("id"), col("color"))
          val next = colors.unionByName(msgs)
            .groupBy(col("id")).agg(min(col("color")).as("color"))
            .localCheckpoint()
          val s = sig(next)
          stable = s.compareTo(prevSig) == 0
          prevSig = s
          colors = next
        }
        // 3. backward reach from pivots over same-color edges
        val eC = e
          .join(colors.select(col("id").as("src"), col("color").as("csrc")), Seq("src"))
          .join(colors.select(col("id").as("dst"), col("color").as("cdst")), Seq("dst"))
          .filter(col("csrc") === col("cdst"))
          .select(col("src"), col("dst"), col("csrc").as("color"))
          .localCheckpoint()
        var reach = colors.filter(col("id") === col("color")).localCheckpoint()
        var nReach = reach.count()
        var grown = true
        while (grown) {
          val msgs = eC.join(reach, eC("dst") === reach("id") && eC("color") === reach("color"))
            .select(eC("src").as("id"), eC("color").as("color"))
          val next = reach.unionByName(msgs).distinct().localCheckpoint()
          val n = next.count()
          grown = n > nReach
          nReach = n
          reach = next
        }
        done += reach.select(col("id"), col("color").as("component"))
        verts = verts.join(reach.select(col("id")), Seq("id"), "left_anti").localCheckpoint()
        nVerts = verts.count()
        e = e.join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint()
      }
    }
    require(nVerts == 0, s"SCC did not settle within $maxRounds rounds")
    done.reduce(_ unionByName _)
  }

  /** B46 — `gds.graph.sample.rwr` (r15): random-walk-with-restart
    * graph sampling (Leskovec & Faloutsos 2006, "Sampling from Large
    * Graphs" — their RWR sampler is the GDS catalog proc's method):
    * grow a visited set by walkers that at each step RESTART to their
    * start node with probability `restartProbability`, else step to a
    * uniform out-neighbor, until `samplingRatio` of the vertices are
    * visited; the sample is the INDUCED edge set on the visited
    * vertices. Deterministic the house way: the restart draw and the
    * neighbor choice both derive from xxhash64(walker, step) — reruns
    * and engines agree exactly where GDS hands back a fresh sample.
    *
    * Scale shape: the hub-safe two-stage neighbor index is built once
    * (the B29 pattern — no single-task hub window); each step is ONE
    * frontier×index equi-join (the rank filter keeps one row per
    * walker) plus one distinct-union into the severed visited frame;
    * the stop check is one count per 4-step batch (r17 — steps sever
    * per step, count per batch; first-visit stamps reconstruct the
    * EXACT per-step stop, so the sample is identical to a per-step
    * probe at half the driver scheduling), bounded by
    * `maxSteps` and LOUD on exhaustion — a start set whose component
    * holds fewer than ratio·|V| vertices can never finish, and silence
    * would ship an undersized sample. Walkers never die: sinks
    * restart.
    *
    * Returns the sampled edges (src, dst) ⊆ the input edge set. */
  def sampleRwr(edges: DataFrame, samplingRatio: Double = 0.15,
                restartProbability: Double = 0.1,
                startNodes: Option[DataFrame] = None,
                walkersPerStart: Int = 8, maxSteps: Int = 200,
                seed: Long = 42L): DataFrame = {
    require(samplingRatio > 0 && samplingRatio <= 1,
      s"sampleRwr: samplingRatio in (0,1], got $samplingRatio")
    require(restartProbability >= 0 && restartProbability < 1,
      s"sampleRwr: restartProbability in [0,1), got $restartProbability")
    require(walkersPerStart >= 1 && maxSteps >= 1,
      "sampleRwr: walkersPerStart and maxSteps must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nV = verts.count()
    if (nV == 0) {
      val out = e.limit(0)
      return graft.Borrow.reclaim(out, e, verts)
    }
    val target = math.max(1L, math.ceil(samplingRatio * nV).toLong)
    // default start: the min-hash vertex (GDS picks one uniformly at
    // random; the hash-argmin is the deterministic twin)
    val starts = startNodes
      .map(_.select(col("id").cast("string").as("id")).distinct())
      .getOrElse(verts
        .agg(min(struct(xxhash64(col("id"), lit(seed)).as("h"),
          col("id").as("i"))).as("m"))
        .select(col("m.i").as("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // hub-safe neighbor index (the B29 two-stage rank)
    val nB = 64
    val bucketed = e.withColumn("bkt",
      pmod(xxhash64(col("dst")), lit(nB)).cast("int"))
    val within = bucketed.withColumn("r0",
      row_number().over(
        Window.partitionBy(col("src"), col("bkt")).orderBy(col("dst"))) - 1)
    val offsets = bucketed.groupBy(col("src"), col("bkt"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off",
        sum(col("bn")).over(
          Window.partitionBy(col("src")).orderBy(col("bkt"))) - col("bn"))
      .withColumn("odeg", sum(col("bn")).over(Window.partitionBy(col("src"))))
    val idx = within.join(offsets, Seq("src", "bkt"))
      .select(col("src").as("cur"), col("dst"),
        (col("r0") + col("off")).as("rnk"), col("odeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var state = graft.Borrow.severLazy(starts
      .select(col("id").as("start"),
        explode(sequence(lit(0), lit(walkersPerStart - 1))).as("wi"))
      .select(concat(col("start"), lit("#"), col("wi")).as("wid"),
        col("start"), col("start").as("cur")))
    // visited carries (id, fs = FIRST step that reached it) so the
    // batched probe below can reconstruct the exact per-step stop
    var visited = graft.Borrow.severLazy(
      starts.select(col("id"), lit(0).as("fs")))
    var nVis = visited.count()
    var step = 0
    // r17 (the r16 advice): the coverage probe runs every `probeEvery`
    // steps, not every step — the per-step COUNT job was the driver
    // half of g_rwr's toy-scale cost. Each step still SEVERS its state
    // (one eager plan per step, no count): the per-step visited
    // projections must reference LEAF frames — an unsevered chain puts
    // step k's whole plan inside every later projection and the batch
    // union recomputes the chain quadratically (measured: g_cnarw 8 →
    // 18 s on the first, unsevered cut of this batching). One count
    // per batch. The walk may overshoot the target by at most
    // probeEvery−1 steps; the fs stamps make the final sample
    // IDENTICAL to the per-step-probe loop (reconstruction below).
    val probeEvery = 4
    while (nVis < target && step < maxSteps) {
      var batchVis = List.empty[DataFrame]
      var b = 0
      while (b < probeEvery && step < maxSteps) {
        b += 1; step += 1
        // one row per walker survives: the rank filter picks the hashed
        // neighbor; a sink (no index match) keeps its single null row
        val u = shiftrightunsigned(xxhash64(col("wid"), lit(step), lit(seed)), 11)
          .cast("double") / lit(9007199254740992.0)
        state = graft.Borrow.severLazy(state.join(idx, Seq("cur"), "left")
          .filter(col("rnk").isNull || col("rnk") ===
            pmod(xxhash64(col("wid"), lit(step), lit(seed + 1)), col("odeg")))
          .select(col("wid"), col("start"),
            when(u < restartProbability || col("rnk").isNull, col("start"))
              .otherwise(col("dst")).as("cur")))
        batchVis ::= state.select(col("cur").as("id"), lit(step).as("fs"))
      }
      visited = graft.Borrow.severLazy(
        batchVis.foldLeft(visited)(_ unionByName _)
          .groupBy(col("id")).agg(min(col("fs")).as("fs")))
      nVis = visited.count()
    }
    require(nVis >= target,
      s"sampleRwr: visited $nVis of target $target vertices after " +
        s"$maxSteps steps — the start set's component may hold fewer than " +
        "samplingRatio*|V| vertices; lower samplingRatio, pass more " +
        "startNodes, or raise maxSteps")
    // exact stop reconstruction: t* = the first step whose cumulative
    // visited count reaches the target — precisely where the per-step
    // probe would have stopped; vertices first reached after t* drop.
    // The per-step census is ≤ maxSteps+1 rows — a bounded collect.
    val perStep = visited.groupBy(col("fs")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val tStar = perStep.scanLeft((0, 0L)) { case ((_, acc), (fs, c)) =>
      (fs, acc + c) }.tail.find(_._2 >= target).get._1
    val vKeep = visited.filter(col("fs") <= tStar)
    val out = e
      .join(vKeep.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(vKeep.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    graft.Borrow.reclaim(out, e, verts, starts, idx)
  }

  /** B52 — gds.graph.sample.cnarw: common-neighbour-aware random walk
    * sampling (Li et al., WWW 2019 — the bias-reducing walker GDS
    * ships next to rwr). Same contract as [[sampleRwr]] — walk until
    * `samplingRatio·|V|` vertices are visited, LOUD under-coverage,
    * return the induced edge subgraph — but each step draws the next
    * neighbor v of u with probability ∝ 1 − |CN(u,v)| / min(d(u),
    * d(v)) (floored at 1e-6 so a fully-overlapping neighborhood keeps
    * an interval), de-prioritizing neighbors that see the same part of
    * the graph.
    *
    * Scale shape: CN per edge = triangles through the edge, computed
    * ONCE from the degree-oriented [[triangleTriples]] wedge join (the
    * B10 machinery — never an all-pairs join); the weighted choice is
    * a STATIC per-source interval index built with the B31 two-stage
    * bucketed cumulative sum (hub partitions bounded by maxdeg/64),
    * with bucket offsets chained by `lag` over the running sum — the
    * bitwise-adjacency construction of node2vecWalk's fast path, so
    * [0, tot) partitions gap-free and each step is ONE equi-join with
    * an interval filter, no per-step aggregation. Draws are hash-only
    * (xxhash64 of walker×step), bit-reproducible across runs. */
  def sampleCnarw(edges: DataFrame, samplingRatio: Double = 0.15,
                  restartProbability: Double = 0.1,
                  startNodes: Option[DataFrame] = None,
                  walkersPerStart: Int = 8, maxSteps: Int = 200,
                  seed: Long = 42L): DataFrame = {
    require(samplingRatio > 0 && samplingRatio <= 1,
      s"sampleCnarw: samplingRatio in (0,1], got $samplingRatio")
    require(restartProbability >= 0 && restartProbability < 1,
      s"sampleCnarw: restartProbability in [0,1), got $restartProbability")
    require(walkersPerStart >= 1 && maxSteps >= 1,
      "sampleCnarw: walkersPerStart and maxSteps must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nV = verts.count()
    if (nV == 0) {
      val out = e.limit(0)
      return graft.Borrow.reclaim(out, e, verts)
    }
    val target = math.max(1L, math.ceil(samplingRatio * nV).toLong)
    val starts = startNodes
      .map(_.select(col("id").cast("string").as("id")).distinct())
      .getOrElse(verts
        .agg(min(struct(xxhash64(col("id"), lit(seed)).as("h"),
          col("id").as("i"))).as("m"))
        .select(col("m.i").as("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // CN(u,v) per canonical undirected edge = triangles through it;
    // each (a,b,c) triple contributes to its three edges
    val sym = undirected(e).filter(col("src") =!= col("dst"))
    val tri = triangleTriples(e)
    def pair(p: Column, q: Column) =
      Seq(least(p, q).as("x"), greatest(p, q).as("y"))
    val cn = tri.select(pair(col("a"), col("b")): _*)
      .unionByName(tri.select(pair(col("a"), col("c")): _*))
      .unionByName(tri.select(pair(col("b"), col("c")): _*))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
    val sdeg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("sd"))
    val wEdge = e
      .join(sdeg.select(col("id").as("src"), col("sd").as("du")), Seq("src"), "left")
      .join(sdeg.select(col("id").as("dst"), col("sd").as("dv")), Seq("dst"), "left")
      .join(cn, least(col("src"), col("dst")) === col("x") &&
        greatest(col("src"), col("dst")) === col("y"), "left")
      .select(col("src"), col("dst"),
        greatest(lit(1.0) - coalesce(col("cn"), lit(0L)).cast("double") /
          least(coalesce(col("du"), lit(1L)), coalesce(col("dv"), lit(1L))),
          lit(1e-6)).as("wt"))
    // static two-stage interval index: [lo, hi) per neighbor, gap-free
    // by lag-chained construction (see Scaladoc)
    val nB = 64
    val bucketed = wEdge.withColumn("bkt",
      pmod(xxhash64(col("dst")), lit(nB)).cast("int"))
    val wBktO = Window.partitionBy(col("src"), col("bkt")).orderBy(col("dst"))
    val wBkt = Window.partitionBy(col("src"), col("bkt"))
    val staged = bucketed
      .withColumn("cumb", sum(col("wt")).over(wBktO))
      .withColumn("lob", coalesce(lag(col("cumb"), 1).over(wBktO), lit(0.0)))
      .withColumn("bn", max(col("cumb")).over(wBkt))
    val wSrcO = Window.partitionBy(col("src")).orderBy(col("bkt"))
    val wSrc = Window.partitionBy(col("src"))
    val offsets = staged.select(col("src"), col("bkt"), col("bn")).distinct()
      .withColumn("s", sum(col("bn")).over(wSrcO))
      .withColumn("off", coalesce(lag(col("s"), 1).over(wSrcO), lit(0.0)))
      .withColumn("tot", max(col("s")).over(wSrc))
      .select(col("src"), col("bkt"), col("off"), col("tot"))
    val idx = staged.join(offsets, Seq("src", "bkt"))
      .select(col("src").as("cur"), col("dst"),
        (col("off") + col("lob")).as("lo"),
        (col("off") + col("cumb")).as("hi"), col("tot"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var state = graft.Borrow.severLazy(starts
      .select(col("id").as("start"),
        explode(sequence(lit(0), lit(walkersPerStart - 1))).as("wi"))
      .select(concat(col("start"), lit("#"), col("wi")).as("wid"),
        col("start"), col("start").as("cur")))
    // (id, fs = first step that reached it) — see sampleRwr: the
    // batched probe reconstructs the exact per-step stop from fs
    var visited = graft.Borrow.severLazy(
      starts.select(col("id"), lit(0).as("fs")))
    var nVis = visited.count()
    var step = 0
    // r17: coverage probed every `probeEvery` steps (the r16 advice —
    // the per-step COUNT job was the driver half of g_cnarw's
    // toy-scale cost). Steps still sever per step — see sampleRwr: an
    // unsevered batch chain recomputes quadratically through the
    // per-step visited projections (measured 8 → 18 s on the first
    // cut). One count per batch, exact-output reconstruction below.
    val probeEvery = 4
    while (nVis < target && step < maxSteps) {
      var batchVis = List.empty[DataFrame]
      var b = 0
      while (b < probeEvery && step < maxSteps) {
        b += 1; step += 1
        val uRestart = shiftrightunsigned(
          xxhash64(col("wid"), lit(step), lit(seed)), 11)
          .cast("double") / lit(9007199254740992.0)
        val uStep = shiftrightunsigned(
          xxhash64(col("wid"), lit(step), lit(seed + 1)), 11)
          .cast("double") / lit(9007199254740992.0) * lit(1.0 - 1e-6)
        state = graft.Borrow.severLazy(state.join(idx, Seq("cur"), "left")
          .withColumn("u", uStep * col("tot"))
          .filter(col("lo").isNull ||
            (col("lo") <= col("u") && col("u") < col("hi")))
          .select(col("wid"), col("start"),
            when(uRestart < restartProbability || col("lo").isNull, col("start"))
              .otherwise(col("dst")).as("cur")))
        batchVis ::= state.select(col("cur").as("id"), lit(step).as("fs"))
      }
      visited = graft.Borrow.severLazy(
        batchVis.foldLeft(visited)(_ unionByName _)
          .groupBy(col("id")).agg(min(col("fs")).as("fs")))
      nVis = visited.count()
    }
    require(nVis >= target,
      s"sampleCnarw: visited $nVis of target $target vertices after " +
        s"$maxSteps steps — the start set's component may hold fewer than " +
        "samplingRatio*|V| vertices; lower samplingRatio, pass more " +
        "startNodes, or raise maxSteps")
    val perStep = visited.groupBy(col("fs")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val tStar = perStep.scanLeft((0, 0L)) { case ((_, acc), (fs, c)) =>
      (fs, acc + c) }.tail.find(_._2 >= target).get._1
    val vKeep = visited.filter(col("fs") <= tStar)
    val out = e
      .join(vKeep.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(vKeep.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    graft.Borrow.reclaim(out, e, verts, starts, idx)
  }

  /** B29 — random walks (GDS `gds.randomWalk` shape): `walksPerNode`
    * walks of up to `walkLength` steps from every vertex, stopping
    * early at sinks. DETERMINISTIC by the house rule — step t of walk
    * w takes out-neighbor number xxhash64(walk, t, seed) mod outdeg
    * (neighbors ranked by dst id), so reruns and engines agree exactly
    * where GDS would hand back a new sample; statistically it is the
    * same uniform per-step choice node2vec's p=q=1 case uses.
    *
    * Scale shape: the neighbor index (rank within src, out-degree) is
    * ONE window pass over the edge frame, then each step is a single
    * equi-join frontier × index with the hash-rank filter — no
    * per-walk driver loop, O(walkLength) rounds.
    * Returns (walk_id, start, steps, path). */
  def randomWalk(edges: DataFrame, walksPerNode: Int = 1,
                 walkLength: Int = 5, seed: Long = 42L): DataFrame = {
    require(walksPerNode >= 1 && walkLength >= 1 && walkLength <= 20,
      s"randomWalk: walksPerNode >= 1 and walkLength in 1..20")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
    import org.apache.spark.sql.expressions.Window
    // TWO-STAGE rank (r12, the C12/P3 pattern): ranking a hub's whole
    // out-neighborhood through one Window.partitionBy(src) task put a
    // single-task ceiling of max-degree on the index build. Stage 1
    // ranks within (src, hash-bucket of dst) — a hub's d rows spread
    // over B tasks; stage 2 turns per-bucket counts into offsets with
    // a window over ≤ B rows per src. Neighbor order becomes (bucket,
    // dst) — still total, deterministic and engine-reproducible, which
    // is all the step-choice hash needs.
    val nWalkBuckets = 64
    val bucketed = e.withColumn("bkt",
      pmod(xxhash64(col("dst")), lit(nWalkBuckets)).cast("int"))
    val within = bucketed.withColumn("r0",
      row_number().over(
        Window.partitionBy(col("src"), col("bkt")).orderBy(col("dst"))) - 1)
    val offsets = bucketed.groupBy(col("src"), col("bkt"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off",
        sum(col("bn")).over(
          Window.partitionBy(col("src")).orderBy(col("bkt"))) - col("bn"))
      .withColumn("odeg", sum(col("bn")).over(Window.partitionBy(col("src"))))
    val idx = within.join(offsets, Seq("src", "bkt"))
      .select(col("src"), col("dst"),
        (col("r0") + col("off")).as("rnk"), col("odeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // r17 (the sampleRwr batched shape): walks at a sink PARK in place
    // — the step join goes LEFT, a no-match row keeps its (cur, path,
    // steps) unchanged — so the fixed-length loop needs no per-step
    // sink split, no per-step sever and no per-step count. Each step
    // references the previous state exactly once, the plan grows
    // linearly in walkLength (≤ 20), and the whole walk materializes
    // as ONE terminal job (before: 2 severs + 2 counts per step). A
    // parked row joins no idx row on later steps either (its cur has
    // no out-edges), so outputs are row-identical to the split loop.
    var state =
      e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id")))
        .distinct()
        .select(col("id"), explode(sequence(lit(0), lit(walksPerNode - 1))).as("wi"))
        .select(concat(col("id"), lit("#"), col("wi")).as("walk_id"),
          col("id").as("start"), col("id").as("cur"), col("id").as("path"),
          lit(0).as("steps"))
    for (step <- 1 to walkLength) {
      // fresh aliases per step: the chained plan joins idx walkLength
      // times, and re-used attribute ids would be ambiguous self-joins
      val stepIdx = idx.select(col("src").as("cur"), col("dst").as("nxt"),
        col("rnk").as("srnk"), col("odeg").as("sodeg"))
      state = state.join(stepIdx, Seq("cur"), "left")
        .filter(col("srnk").isNull || col("srnk") ===
          pmod(xxhash64(col("walk_id"), lit(step), lit(seed)), col("sodeg")))
        .select(col("walk_id"), col("start"),
          coalesce(col("nxt"), col("cur")).as("cur"),
          when(col("nxt").isNull, col("path"))
            .otherwise(concat(col("path"), lit(">"), col("nxt"))).as("path"),
          when(col("nxt").isNull, col("steps")).otherwise(lit(step)).as("steps"))
    }
    val out = state
      .select(col("walk_id"), col("start"), col("steps").cast("long").as("steps"),
        col("path"))
    graft.Borrow.reclaim(out, idx)
  }

  /** B31 — node2vec-BIASED walks (r12): GDS's randomWalk
    * returnFactor/inOutFactor surface (the node2vec 2nd-order bias).
    * Step weights follow Grover & Leskovec's α: a candidate equal to
    * the PREVIOUS node weighs 1/p (returnFactor), a candidate
    * ADJACENT to it (an edge in either direction — node2vec's
    * undirected d(prev, x) = 1) weighs 1, anything else 1/q
    * (inOutFactor); the first step is uniform (no prev). The choice
    * stays DETERMINISTIC by the house rule: u = xxhash64(walk, t,
    * seed) mapped to [0,1), and the walk takes the candidate whose
    * cumulative-weight interval contains u·total; p = q = 1 is a
    * uniform pick, and reruns/engines agree where GDS would hand back
    * a new sample. A walk can NEVER silently vanish (the r12-advice
    * FP-drop case — u·total rounding up to exactly total): u carries a
    * 1e-6 multiplicative margin that provably lands it strictly below
    * the last cumulative value for any degree under ~2·10⁹ (see
    * `unit`), so interval membership matches exactly one candidate.
    *
    * Scale shape: per step one candidate equi-join + one adjacency
    * LEFT join against the symmetrized edge set; the cumulative weight
    * is ADAPTIVE (r13, the JaccardJoin probe pattern — the measured
    * bench cost of unconditional staging was +73% on a hub-free
    * graph): under `bucketDegreeThreshold` max out-degree (measured
    * once) the per-walk window is already bounded and runs single-
    * stage in dst order; above it the sum goes TWO-STAGE (the
    * randomWalk r12 pattern) — a running sum within (walk,
    * dst-hash-bucket) spreading a hub walk's d candidates over B
    * bounded partitions, then bucket offsets chained over ≤ B rows per
    * walk off each bucket's LAST running value (not a re-aggregated
    * sum); selection there is the struct-min of cum > u (r14 —
    * structurally exactly one winner regardless of ulp-level offset
    * arithmetic). On the FAST path selection is the interval filter
    * with lower = lag(cum) — the previous running value verbatim, so
    * intervals are bitwise adjacent BY CONSTRUCTION and exactly one
    * matches with zero extra exchange (the struct-min's aggregation
    * measured +64% on g_node2vec at sf0.1; the chosen candidate is
    * identical). Either way no FP gap can swallow or duplicate a walk,
    * and no window ever sees a whole hub neighborhood in one task.
    * The candidate order differs between paths (dst vs (bucket, dst) —
    * both total and deterministic), so walks SAMPLE differently across
    * the threshold; GDS's sampling contract allows any sample, and
    * validity/α-class/clamp invariants hold on both (spec-forced).
    * O(walkLength) rounds, no per-walk driver loop. Returns
    * (walk_id, start, steps, path). */
  def node2vecWalk(edges: DataFrame, walksPerNode: Int = 1,
                   walkLength: Int = 5, p: Double = 1.0, q: Double = 1.0,
                   seed: Long = 42L,
                   bucketDegreeThreshold: Long = 4096L,
                   weightCol: Option[String] = None): DataFrame = {
    require(walksPerNode >= 1 && walkLength >= 1 && walkLength <= 20,
      "node2vecWalk: walksPerNode >= 1 and walkLength in 1..20")
    require(p > 0 && q > 0, "node2vecWalk: returnFactor p and inOutFactor q " +
      "must be strictly positive")
    import org.apache.spark.sql.expressions.Window
    val nBuckets = 64 // the randomWalk two-stage bucket count
    // r14 — GDS relationshipWeightProperty: the step distribution
    // becomes weight × α (node2vec's own weighted formulation);
    // parallel (src, dst) edges ADD their weights (their probability
    // mass combines — the random-walk semantics of a multi-edge),
    // weights must be strictly positive (loud — a zero would make
    // walk intervals degenerate, a negative is meaningless mass)
    val e = (weightCol match {
      case Some(wc) =>
        val w0 = edges.select(col("src").cast("string").as("src"),
            col("dst").cast("string").as("dst"),
            col(wc).cast("double").as("ew"))
          .groupBy(col("src"), col("dst")).agg(sum(col("ew")).as("ew"))
        require(w0.filter(col("ew").isNull || col("ew") <= 0).limit(1).count() == 0,
          s"node2vecWalk: weight column '$wc' is null or non-positive " +
            "on at least one edge")
        w0
      case None =>
        edges.select(col("src").cast("string").as("src"),
          col("dst").cast("string").as("dst")).distinct()
          .withColumn("ew", lit(1.0))
    }).persist(StorageLevel.MEMORY_AND_DISK)
    // ADAPTIVE de-skew (the JaccardJoin max-df probe pattern): the
    // two-stage cumulative weight costs two extra candidate shuffles
    // per step, which only buys anything when some window partition is
    // hub-sized — measured once. Below the threshold the single
    // per-walk window (bounded by max out-degree) is the cheaper plan;
    // above it, buckets bound every partition. The candidate ORDER
    // differs between paths (dst vs (bucket, dst) — both total and
    // deterministic), so the sampled walks differ across the
    // threshold, which GDS's own sampling contract allows; validity,
    // α-class behavior and the never-drop struct-min hold on both.
    val maxDegRow = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).collect()(0)
    val twoStage = !maxDegRow.isNullAt(0) &&
      maxDegRow.getLong(0) > bucketDegreeThreshold
    val adj = e.select(col("src"), col("dst"))
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().select(col("src").as("a_prev"), col("dst").as("a_dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcs = e.select(col("src")).distinct()
    // u in [0, 1 − 1e-6]: top 53 bits of the step hash (the double-
    // precision mantissa width), engine-reproducible. Candidate
    // selection (r14, advice) is the STRUCT-MIN of cum > u — the
    // smallest running sum strictly above the draw — so exactly-one-
    // match is STRUCTURAL (an argmin over a nonempty set always has
    // exactly one winner under the (cum, dst) total order; interior
    // interval boundaries, where per-row `cum − wt` arithmetic could
    // open 1-ulp gaps or overlaps, no longer participate at all). The
    // 1e-6 margin then carries only NONEMPTINESS: both cum and tot err
    // ≤ n·ε relative to the true sum (n = candidate count, ε = 2⁻⁵²),
    // so u ≤ (1−1e-6)(1+nε)·S < (1−nε)·S ≤ cum_last for any
    // n < ~2·10⁹ — far beyond any degree — i.e. the last candidate
    // always satisfies cum > u and no walk ever vanishes. The margin
    // distorts sampling by ≤ 1e-6 relative, deterministically.
    def unit(stepNo: Int): Column =
      (shiftrightunsigned(xxhash64(col("walk_id"), lit(stepNo), lit(seed)), 11)
        .cast("double")) / lit(9007199254740992.0) * lit(1.0 - 1e-6) // 2^53
    var state = graft.Borrow.severLazy(
      e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id")))
        .distinct()
        .select(col("id"), explode(sequence(lit(0), lit(walksPerNode - 1))).as("wi"))
        .select(concat(col("id"), lit("#"), col("wi")).as("walk_id"),
          col("id").as("start"), lit(null).cast("string").as("prev"),
          col("id").as("cur"), col("id").as("path"), lit(0).as("steps")))
    // r17 (the randomWalk change): walks at a sink PARK — the anti-join
    // rows rejoin the state each step instead of splitting into counted
    // per-step `done` frames, so the loop runs its fixed length with
    // ONE sever per step and ZERO per-step count jobs (before: 2
    // severs + 2 counts). The sever stays (unlike randomWalk's pure
    // chain) because each step references the previous state twice —
    // candidates AND the parked anti-join — and a leaf keeps that
    // double reference from doubling the plan per step. Parked rows
    // never re-enter `cand` (their cur has no out-edges), so the
    // output rows are identical to the split loop's.
    for (step <- 1 to walkLength) {
      val parked = state
        .join(srcs.select(col("src").as("cur")), Seq("cur"), "left_anti")
        .select(col("walk_id"), col("start"), col("prev"), col("cur"),
          col("path"), col("steps"))
      val cand = state.join(e, state("cur") === e("src"))
        .join(adj, col("prev") === col("a_prev") && e("dst") === col("a_dst"),
          "left")
        .withColumn("cdst", e("dst"))
        // wt = α × edge weight (ew = 1 unweighted); first step has no
        // prev → α = 1, i.e. weight-proportional (GDS's rule)
        .withColumn("wt",
          when(col("prev").isNull, 1.0) // first step: α = 1
            .when(col("cdst") === col("prev"), lit(1.0 / p))
            .when(col("a_dst").isNotNull, 1.0)
            .otherwise(lit(1.0 / q)) * col("ew"))
        .withColumn("bkt",
          pmod(xxhash64(col("cdst")), lit(nBuckets)).cast("int"))
        .select(col("walk_id"), col("start"), col("cur"), col("path"),
          col("cdst"), col("wt"), col("bkt"))
      val chosen = if (twoStage) {
        // stage 1: running weight within (walk, bucket) — partitions
        // bounded by maxdeg/B; `bn` = the bucket's LAST running value
        // (max of a strictly increasing sum), so stage 2 chains offsets
        // off bitwise-identical numbers and intervals stay adjacent
        val wBkt = Window.partitionBy(col("walk_id"), col("bkt"))
        val staged = cand
          .withColumn("cumb", sum(col("wt")).over(wBkt.orderBy(col("cdst"))))
          .withColumn("bn", max(col("cumb")).over(wBkt))
        // stage 2: per-walk bucket offsets + total over ≤ B rows
        val wWalk = Window.partitionBy(col("walk_id"))
        val offsets = staged.select(col("walk_id"), col("bkt"), col("bn")).distinct()
          .withColumn("off",
            sum(col("bn")).over(wWalk.orderBy(col("bkt"))) - col("bn"))
          .withColumn("tot", sum(col("bn")).over(wWalk))
          .select(col("walk_id"), col("bkt"), col("off"), col("tot"))
        // struct-min of cum > u: on this path the cross-bucket offset
        // arithmetic can open 1-ulp seams, so selection must not rely
        // on interval adjacency — the argmin over a nonempty set is
        // total (never empty by the margin, never forked)
        staged.join(offsets, Seq("walk_id", "bkt"))
          .withColumn("cum", col("off") + col("cumb"))
          .withColumn("u", unit(step) * col("tot"))
          .filter(col("cum") > col("u"))
          .groupBy(col("walk_id"))
          .agg(min(struct(col("cum"), col("cdst"), col("start"),
            col("cur"), col("path"))).as("m"))
          .select(col("walk_id"), col("m.start").as("start"),
            col("m.cur").as("prev"), col("m.cdst").as("cur"),
            concat(col("m.path"), lit(">"), col("m.cdst")).as("path"),
            lit(step).as("steps"))
      } else {
        // fast path (maxdeg ≤ threshold): one per-walk window, dst
        // order. Selection (r14, the bench round-trip): the interval
        // filter with lower = lag(cum) — the previous row's running
        // sum VERBATIM, so consecutive intervals are bitwise adjacent
        // BY CONSTRUCTION (no per-row `cum − wt` re-derivation, the
        // r13-advice ulp case) and [0, cum_last) partitions gap-free:
        // exactly one candidate matches, structurally, with ZERO extra
        // exchange (lag rides the same window pass as the running
        // sum, where the r14 first cut's struct-min groupBy added an
        // aggregation exchange per step — measured +64% on g_node2vec
        // at sf0.1). u < cum_last by unit()'s margin, u ≥ 0 ≥ first
        // lower; selection equals the struct-min rule on these
        // adjacent intervals, so sampling is unchanged.
        val wo = Window.partitionBy(col("walk_id")).orderBy(col("cdst"))
        val w = Window.partitionBy(col("walk_id"))
        cand
          .withColumn("cum", sum(col("wt")).over(wo))
          .withColumn("lower", coalesce(lag(col("cum"), 1).over(wo), lit(0.0)))
          .withColumn("u", unit(step) * sum(col("wt")).over(w))
          .filter(col("lower") <= col("u") && col("u") < col("cum"))
          .select(col("walk_id"), col("start"), col("cur").as("prev"),
            col("cdst").as("cur"),
            concat(col("path"), lit(">"), col("cdst")).as("path"),
            lit(step).as("steps"))
      }
      state = graft.Borrow.severLazy(chosen.unionByName(parked))
    }
    val out = state
      .select(col("walk_id"), col("start"), col("steps").cast("long").as("steps"),
        col("path"))
    graft.Borrow.reclaim(out, e, adj)
  }

  /** B28 — k shortest LOOPLESS paths between a pinned (source, target)
    * pair (GDS `gds.shortestPath.yens` result parity: the k
    * minimal-weight simple paths, deterministically ranked by
    * (dist, hops, path) — Yen's output under the house total order, so
    * the result is engine-reproducible and oracle-checkable).
    *
    * NOT Yen's spur recursion: that is k·|path| SEQUENTIAL SSSP runs —
    * a driver-bound loop by construction. Instead ONE hop-bounded
    * frontier walk enumerates the simple source→target paths (B21's
    * documented per-path contract: combinatorial on diamond-dense
    * graphs by design, finite under the hop bound + loop guard),
    * pruned hard by a REVERSE hop-BFS from the target: a partial path
    * whose head cannot reach the target within its remaining hop
    * budget dies immediately, which collapses the walk to the
    * target's corridor. Top-k at the end is one sort+limit over the
    * finished paths. Returns (rank, dist, hops, path), rank 1..k.
    *
    * `weightCol = None` means every edge weighs 1 (dist = hops);
    * parallel (src, dst) duplicates collapse to the lightest edge (the
    * GDS projection rule). Paths are node-simple (loopless — Yen's
    * contract), never pass THROUGH the target, and weights must be
    * strictly positive (loud).
    */
  def kShortestPaths(edges: DataFrame, source: String, target: String,
                     k: Int = 3, maxHops: Int = 10,
                     weightCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"kShortestPaths: k must be >= 1, got $k")
    require(maxHops >= 1 && maxHops <= 10,
      s"kShortestPaths: maxHops must be in 1..10 (the path-surface bound), got $maxHops")
    require(source != target,
      "kShortestPaths: source == target (the empty path is not a path)")
    val base = weightCol match {
      case Some(wc) => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col(wc).cast("double").as("w"))
      case None => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), lit(1.0).as("w"))
    }
    val e = base.filter(col("w").isNotNull)
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.filter(col("w") <= 0).limit(1).count() == 0,
      "kShortestPaths: weights must be strictly positive (GDS dijkstra family rule)")
    val spark = edges.sparkSession
    // the pruning corridor: minimal hop count TO the target
    val rev = bfs(e.select(col("dst").as("src"), col("src").as("dst")),
        spark.range(1).select(lit(target).as("id")), maxIter = maxHops)
      .select(col("id"), col("dist").as("rd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rev.count()
    var frontier = spark.range(1)
      .select(lit(source).as("id"), lit(0.0).as("dist"),
        lit(source).as("path"), lit(0).as("hops"))
      .join(rev, Seq("id"), "left_semi") // unreachable source => empty walk
      .localCheckpoint()
    var fin = List.empty[DataFrame]
    var n = frontier.count()
    var r = 0
    while (r < maxHops && n > 0) {
      r += 1
      val cand = frontier.join(e, frontier("id") === e("src"))
        // node-simple: an id never repeats within one path (ids are
        // '>'-free by the path-surface contract, so the split is exact)
        .filter(!array_contains(split(col("path"), ">"), col("dst")))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"),
          concat(col("path"), lit(">"), col("dst")).as("path"),
          lit(r).as("hops"))
      val pruned = cand.join(rev, Seq("id")) // drops target-unreachable heads
        .filter(col("rd") <= maxHops - r)
        .select(col("id"), col("dist"), col("path"), col("hops"))
      val done = graft.Borrow.severLazy(pruned.filter(col("id") === target))
      val next = graft.Borrow.severLazy(pruned.filter(col("id") =!= target))
      if (done.count() > 0) fin ::= done
      n = next.count()
      frontier = next
    }
    val all = fin match {
      case Nil => frontier.limit(0)
      case fs => fs.reduce(_ unionByName _)
    }
    import org.apache.spark.sql.expressions.Window
    // the window runs on <= k rows (post-limit), so the unpartitioned
    // row_number is a single tiny task, not a global-sort hazard
    val ranked = all.orderBy(col("dist"), col("hops"), col("path")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("dist"), col("hops"), col("path"))))
      .select(col("rank").cast("long").as("rank"), col("dist"),
        col("hops").cast("long").as("hops"), col("path"))
    graft.Borrow.reclaim(ranked, e, rev)
  }

  /** Topological layering of a DAG (GDS `gds.dag.topologicalSort`
    * parity — the catalog's ordering procedure): returns (id, level)
    * where level is the LONGEST-path distance from any source (GDS's
    * `maxDistanceFromSource`), so sorting by (level, id) is a valid,
    * deterministic topological order — every edge crosses strictly
    * upward in level, and same-level vertices are never comparable.
    *
    * Vertices on or downstream of a CYCLE never settle and are
    * EXCLUDED from the result — GDS's own contract for non-DAG input —
    * so `result.count < |V|` is the cycle signal; `requireDag = true`
    * turns it into a loud error naming the count instead.
    *
    * Round-synchronous Kahn: a vertex settles at round r (level = r)
    * once NO in-edge starts at an unsettled vertex. Each round is one
    * semi-join (|E| keyed on src) + one anti-join — the BFS family's
    * scale shape: O(depth) rounds, O(|E|) shuffle each, severed level
    * frames so the plan stays leaf-sized at any depth. Exact-or-loud:
    * hitting `maxIter` while vertices are still settling raises
    * (a cycle is NOT progress and exits quietly instead). */
  def topologicalSort(edges: DataFrame, maxIter: Int = 50,
                      requireDag: Boolean = false): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    var unsettled = graft.Borrow.severLazy(verts)
    var unsettledCount = unsettled.count()
    val empty = unsettled.withColumn("level", lit(0L)).limit(0).localCheckpoint()
    var settledParts = List.empty[DataFrame]
    var round = 0
    var progressing = true
    while (unsettledCount > 0 && progressing) {
      require(round < maxIter,
        s"topologicalSort: depth exceeds maxIter=$maxIter with " +
          s"$unsettledCount vertices still settling — raise maxIter")
      val blocked = e
        .join(unsettled.select(col("id").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("id")).distinct()
      val newly = graft.Borrow.severLazy(
        unsettled.join(blocked, Seq("id"), "left_anti")
          .withColumn("level", lit(round.toLong)))
      val n = newly.count()
      if (n == 0) progressing = false
      else {
        settledParts ::= newly
        unsettled = graft.Borrow.severLazy(
          unsettled.join(newly.select(col("id")), Seq("id"), "left_anti"))
        unsettledCount -= n
        round += 1
      }
    }
    require(!requireDag || unsettledCount == 0,
      s"topologicalSort(requireDag = true): $unsettledCount vertices sit " +
        "on or downstream of a cycle")
    val out = (empty +: settledParts).reduce(_ unionByName _)
    graft.Borrow.reclaim(out, e)
  }

  /** B51 — gds.dag.longestPath: longest (critical) path from any
    * source to every vertex of a DAG, with the argmax path itself.
    *
    * DP over the Kahn layering [[topologicalSort]] already computes:
    * a vertex at level L has every predecessor at a lower level, so
    * one pass L = 1..depth settles dist(v) = max over in-edges of
    * dist(u) + w — two equi-joins per level, frontier-bounded, with
    * severed frames (constant plans; depth ≤ the toposort maxIter
    * bound, LOUD beyond). Ties break to the lexicographically
    * smallest path string — globally correct for the DP because two
    * distinct DAG paths to the same vertex can never be string
    * prefixes of each other (both end with that vertex, which a DAG
    * path visits once), so prefix-order and full-path order agree.
    * Parallel edges keep their MAX weight (the longest-path analog of
    * the shortest-path min rule). Cycles are loud (`requireDag`).
    * Returns (id, dist, path): dist 0.0 and path = id for sources. */
  def dagLongestPath(edges: DataFrame, weightCol: Option[String] = None,
                     maxIter: Int = 50,
                     localFinishEdges: Long = 250000L): DataFrame = {
    val spark = edges.sparkSession
    val e0 = weightCol match {
      case Some(wc) => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col(wc).cast("double").as("w"))
      case None => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), lit(1.0).as("w"))
    }
    val e = e0.groupBy(col("src"), col("dst")).agg(max(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bounded local finisher: each dist is built by the SAME sequential
    // additions along the SAME tie-broken path on either engine, so
    // local ≡ distributed BITWISE (unlike the float-SUM operators) —
    // spec-pinned on fixtures and a seeded random DAG
    if (e.count() <= localFinishEdges) {
      val rows = e.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      e.unpersist()
      return localDagLongestPath(spark, rows, maxIter)
    }
    val lv = topologicalSort(e, maxIter, requireDag = true)
    val maxLvlRow = lv.agg(max(col("level"))).collect()(0)
    if (maxLvlRow.isNullAt(0)) {
      val out = lv.select(col("id"), lit(0.0).as("dist"),
        col("id").as("path")).limit(0)
      return graft.Borrow.reclaim(out, e)
    }
    val maxLvl = maxLvlRow.getLong(0)
    var settled = graft.Borrow.severLazy(lv.filter(col("level") === 0L)
      .select(col("id"), lit(0.0).as("dist"), col("id").as("path")))
    var l = 1L
    while (l <= maxLvl) {
      val frontier = lv.filter(col("level") === l)
        .select(col("id").as("dst"))
      val cand = e.join(frontier, Seq("dst"), "left_semi")
        .join(settled.select(col("id").as("src"), col("dist").as("pd"),
          col("path").as("pp")), Seq("src"))
        .select(col("dst").as("id"), (col("pd") + col("w")).as("d"),
          concat(col("pp"), lit(">"), col("dst")).as("pth"))
      val newly = cand.groupBy(col("id"))
        .agg(min_by(struct(col("d"), col("pth")),
          struct((-col("d")).as("nd"), col("pth").as("tp"))).as("b"))
        .select(col("id"), col("b.d").as("dist"), col("b.pth").as("path"))
      settled = graft.Borrow.severLazy(settled.unionByName(newly))
      l += 1
    }
    graft.Borrow.reclaim(settled, e)
  }

  /** Driver-side mirror of [[dagLongestPath]]: Kahn order + the same
    * DP and (max dist, lex-min path) tie-break; cycles and
    * depth > maxIter stay loud with the distributed path's classes. */
  private def localDagLongestPath(spark: org.apache.spark.sql.SparkSession,
      rows: Array[(String, String, Double)], maxIter: Int): DataFrame = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[String, mutable.ArrayBuffer[(String, Double)]]
    val indeg = mutable.HashMap.empty[String, Int]
    val verts = mutable.LinkedHashSet.empty[String]
    rows.foreach { case (u, v, w) =>
      adj.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += ((v, w))
      indeg(v) = indeg.getOrElse(v, 0) + 1
      indeg.getOrElseUpdate(u, indeg.getOrElse(u, 0))
      verts += u; verts += v
    }
    val dist = mutable.HashMap.empty[String, Double]
    val path = mutable.HashMap.empty[String, String]
    val level = mutable.HashMap.empty[String, Int]
    val queue = mutable.Queue.empty[String]
    verts.foreach { v =>
      if (indeg.getOrElse(v, 0) == 0) {
        dist(v) = 0.0; path(v) = v; level(v) = 0; queue += v
      }
    }
    var processed = 0
    while (queue.nonEmpty) {
      val u = queue.dequeue(); processed += 1
      require(level(u) < maxIter,
        s"dagLongestPath: depth exceeds maxIter=$maxIter — raise maxIter")
      adj.get(u).foreach(_.foreach { case (v, w) =>
        val cand = dist(u) + w
        val cpath = path(u) + ">" + v
        val better = !dist.contains(v) || cand > dist(v) ||
          (cand == dist(v) && cpath < path(v))
        if (better) { dist(v) = cand; path(v) = cpath }
        level(v) = math.max(level.getOrElse(v, 0), level(u) + 1)
        indeg(v) -= 1
        if (indeg(v) == 0) queue += v
      })
    }
    require(processed == verts.size,
      s"dagLongestPath: ${verts.size - processed} vertices sit on or " +
        "downstream of a cycle")
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    spark.createDataFrame(
      verts.toSeq.sorted.map(v =>
        org.apache.spark.sql.Row(v, dist(v), path(v))).asJava,
      StructType(Seq(StructField("id", StringType),
        StructField("dist", DoubleType), StructField("path", StringType))))
  }

  /** In/out/total degree per vertex. */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .withColumn("deg", col("out_deg") + col("in_deg"))
  }

  /** B7w — WEIGHTED degrees (GDS degree `relationshipWeightProperty`,
    * r12): out/in/total degree = Σ edge weights instead of counts —
    * the same two keyed aggregations + full-outer merge. Weights must
    * be non-null (loud), negative allowed (GDS sums whatever the
    * property holds). */
  def weightedDegrees(edges: DataFrame, weightCol: String): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      col(weightCol).cast("double").as("w"))
    require(e.filter(col("w").isNull).limit(1).count() == 0,
      s"weightedDegrees: weight column '$weightCol' is null/non-numeric " +
        "on at least one edge")
    val out = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("out_deg"))
    val in = e.groupBy(col("dst").as("id")).agg(sum(col("w")).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0.0)).as("out_deg"),
        coalesce(col("in_deg"), lit(0.0)).as("in_deg"))
      .withColumn("deg", col("out_deg") + col("in_deg"))
  }
}
