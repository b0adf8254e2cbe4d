package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** B47 — influence maximization (`gds.influenceMaximization.celf`;
  * r15): the top-k seed set maximizing expected spread under the
  * INDEPENDENT CASCADE model (each edge forwards activation once with
  * probability p).
  *
  * GDS implements Leskovec et al. 2007's CELF — a lazily re-evaluated
  * greedy whose priority queue is inherently driver-sequential, each
  * evaluation a fresh forward Monte-Carlo batch. The distributed
  * standard for the SAME objective is REVERSE INFLUENCE SAMPLING
  * (Borgs et al. 2014; Tang et al. 2014/2015 TIM/IMM, what production
  * systems run at scale): sample R reverse-reachable (RR) sets — the
  * vertices that can reach a random root through edges kept alive
  * with probability p — and greedily max-cover them; the greedy
  * (1−1/e)-approximation guarantee carries over. Determinized the
  * house way: root_r = the vertex ranked xxhash64(r, seed) mod V in
  * the dense-id dictionary, edge (u,v) live in simulation r iff the
  * top-53-bit uniform of xxhash64(u, v, r, seed) < p — reruns and
  * engines agree exactly where MC implementations hand back noise.
  *
  * Scale shape: ALL R simulations run as ONE keyed reverse-BFS
  * (state rows (r, v), per round one reversed-edge equi-join + the
  * live filter + a per-sim visited anti-join — the multi-source-BFS
  * pattern, never a per-simulation loop); greedy is `seedSetSize`
  * bounded rounds of one integer count + a 1-row TakeOrdered argmax
  * ((count desc, id asc) — deterministic) + one anti-join on covered
  * sims. Counts are integers end to end: the output is bit-exact.
  *
  * Returns (id, spread): the k seeds in pick order with the running
  * spread estimate |covered sims| / R · |V| after adding each —
  * GDS's yield shape. */
object Influence {

  def influenceMaximization(edges: DataFrame, seedSetSize: Int,
                            monteCarloSimulations: Int = 100,
                            propagationProbability: Double = 0.1,
                            maxDepth: Int = 30,
                            seed: Long = 42L): DataFrame = {
    require(seedSetSize >= 1, "influenceMaximization: seedSetSize >= 1")
    require(monteCarloSimulations >= 1,
      "influenceMaximization: monteCarloSimulations >= 1")
    require(propagationProbability >= 0.0 && propagationProbability <= 1.0,
      "influenceMaximization: propagationProbability in [0,1]")
    val spark = edges.sparkSession
    import spark.implicits._
    val r = monteCarloSimulations
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dict = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF("id", "vid")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nV = dict.count()
    if (nV == 0) {
      // schema must match the normal path (rank, id, spread) so a
      // CALL ... YIELD rank on an edgeless projection resolves and
      // Verify writes a consistent parquet schema (r15 advice)
      val out = dict.select(lit(1).as("rank"), col("id"),
        lit(0.0).as("spread")).limit(0)
      return graft.Borrow.reclaim(out, e, dict)
    }
    val k = math.min(seedSetSize.toLong, nV).toInt

    // roots: simulation r starts at the vertex ranked hash(r) mod V
    val sims = spark.range(r).select(col("id").cast("int").as("sim"),
      pmod(xxhash64(col("id"), lit(seed)), lit(nV)).as("vid"))
    val roots = sims.join(dict, Seq("vid"))
      .select(col("sim"), col("id").as("v"))
    // reverse BFS over live edges, all sims in one keyed frontier
    val rev = e.select(col("dst").as("v"), col("src").as("u"))
    val unit = shiftrightunsigned(
      xxhash64(col("u"), col("v"), col("sim"), lit(seed)), 11)
      .cast("double") / lit(9007199254740992.0)
    var visited = graft.Borrow.severLazy(roots)
    var frontier = visited
    var depth = 0
    var n = frontier.count()
    while (n > 0 && depth < maxDepth) {
      depth += 1
      val next = graft.Borrow.severLazy(
        frontier.join(rev, Seq("v"))
          .filter(unit < propagationProbability)
          .select(col("sim"), col("u").as("v")).distinct()
          .join(visited, Seq("sim", "v"), "left_anti"))
      n = next.count()
      visited = graft.Borrow.severLazy(visited.unionByName(next))
      frontier = next
    }
    val rr = visited.persist(StorageLevel.MEMORY_AND_DISK)
    rr.count()

    // greedy max coverage: k bounded rounds, integer-exact argmax
    // ((count desc, id asc) through a 1-row TakeOrdered)
    var active = graft.Borrow.severLazy(sims.select(col("sim")))
    var picked = List.empty[(String, Double)]
    var covered = 0L
    var exhausted = false
    while (picked.length < k && !exhausted) {
      val top = rr.join(active, Seq("sim"))
        .groupBy(col("v")).agg(count(lit(1)).as("g"))
        .orderBy(col("g").desc, col("v")).limit(1).collect()
      if (top.nonEmpty) {
        val best = top(0).getString(0)
        covered += top(0).getLong(1)
        picked ::= (best, covered.toDouble / r * nV)
        val hit = rr.filter(col("v") === best).select(col("sim"))
        active = graft.Borrow.severLazy(active.join(hit, Seq("sim"), "left_anti"))
      } else exhausted = true
    }
    if (picked.length < k) {
      // every sim covered: remaining seeds add 0 marginal spread —
      // pad with the smallest unpicked ids at flat spread, BOUNDED by
      // k rows (the TakeOrdered pattern, never a full collect)
      val chosen = picked.map(_._1).toSet
      val flat = covered.toDouble / r * nV
      dict.select(col("id"))
        .filter(!col("id").isin(chosen.toSeq: _*))
        .orderBy(col("id")).limit(k - picked.length)
        .collect().map(_.getString(0))
        .foreach(id => picked ::= (id, flat))
    }
    val rows = picked.reverse.zipWithIndex
      .map { case ((id, s), i) => (i + 1, id, s) }
    val out = spark.createDataFrame(rows).toDF("rank", "id", "spread")
      .select(col("rank"), col("id"),
        graft.operators.Num.roundTies(col("spread"), 4).as("spread"))
    graft.Borrow.reclaim(out, e, dict, rr)
  }
}
