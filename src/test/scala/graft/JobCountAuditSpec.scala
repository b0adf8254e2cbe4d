package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** The r8 measurement lesson institutionalized ("COUNT THE JOBS"): at
  * toy scale iterative operators cost jobs × fixed driver overhead,
  * not shuffled bytes, so a change that doubles the per-round barrier
  * count regresses the bench by 2× while every correctness spec stays
  * green. These audits pin Spark-job budgets for the forced-distributed
  * iterative paths on a fixed fixture — generous enough for AQE
  * query-stage variance, tight enough that an extra driver action per
  * round (rounds × ~3 jobs here) fails the suite instead of a bench
  * round.
  *
  * Counting uses job groups + the status tracker (both updated
  * asynchronously — the helper polls until two consecutive samples
  * agree). */
class JobCountAuditSpec extends SparkSpec {
  import spark.implicits._

  private def countJobs(tag: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try body finally sc.clearJobGroup()
    var prev = -1
    var cur = sc.statusTracker.getJobIdsForGroup(tag).length
    var spins = 0
    while (cur != prev && spins < 100) {
      Thread.sleep(100)
      prev = cur
      cur = sc.statusTracker.getJobIdsForGroup(tag).length
      spins += 1
    }
    cur
  }

  /** Deterministic graph: ~n nodes, ~3n edges. */
  private def randomEdges(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(3 * n)((s"v:${rnd.nextInt(n)}", s"v:${rnd.nextInt(n)}"))
      .filter(p => p._1 != p._2).toDF("src", "dst")
  }

  private lazy val edges = randomEdges(150, 5).localCheckpoint()

  test("pageRank (forced distributed, 8 iters) stays within its job budget") {
    val jobs = countJobs("audit-pagerank") {
      GraphOps.pageRank(edges, iters = 8, localFinishEdges = 0L).count()
    }
    info(s"pageRank jobs: $jobs")
    assert(jobs <= 60, s"pageRank job count regressed: $jobs (was ~12 + AQE stages)")
  }

  test("connectedComponents (forced distributed) stays within its job budget") {
    val jobs = countJobs("audit-cc") {
      GraphOps.connectedComponents(edges, localFinishEdges = 0L).count()
    }
    info(s"cc jobs: $jobs")
    assert(jobs <= 60, s"cc job count regressed: $jobs")
  }

  test("louvain (forced distributed) stays within its job budget") {
    val jobs = countJobs("audit-louvain") {
      GraphOps.louvain(edges, localFinishEdges = 0L).count()
    }
    info(s"louvain jobs: $jobs")
    assert(jobs <= 120, s"louvain job count regressed: $jobs")
  }

  test("weighted betweenness (forced distributed) stays within its job budget") {
    // four phases: A (Bellman-Ford rounds) and C (σ propagation) pay
    // one materializing count per round (each fanning into ~4-6 AQE
    // query-stage jobs); B's probes are single actions; D is fully
    // lazy — the reclaim's terminal action computes the whole severed
    // pend chain, contributing stages but no per-layer driver action.
    // r10 measured ~210 on this fixture (10 A-rounds + 10 C-rounds +
    // ~10 D-layers of AQE stages); a new per-layer/per-round ACTION
    // (~+1 job each, the barrier-regression class) trips the bound.
    // weights in {5, 6}: ratio ≤ 1.2 keeps the weighted-shortest-path
    // hop diameter within ~1.2× the unweighted one, so the maxIter
    // bound never binds (the pathology probes would refuse loudly)
    val weighted = edges.withColumn("w",
      (pmod(xxhash64(col("src"), col("dst")), lit(2)) + 5).cast("double"))
    val roots = edges.select(col("src").as("id")).distinct().limit(40)
      .localCheckpoint()
    val jobs = countJobs("audit-wbetweenness") {
      GraphOps.betweenness(weighted, roots, maxIter = 10, halve = false,
        weightCol = Some("w"), localFinishEdges = 0L).count()
    }
    info(s"weighted betweenness jobs: $jobs")
    assert(jobs <= 260, s"weighted betweenness job count regressed: $jobs (r10 ~210)")
  }

  test("ssspPathsFrom stays within its job budget") {
    // one weight probe + per-round (cand join + struct-min shuffle,
    // the improved count, the EAGER state-union checkpoint, and their
    // AQE stage-jobs ≈ 10/round) — the ssspFrom shape plus a path
    // column, no extra shuffle; r10 measured 86 on this fixture
    val weighted = edges.withColumn("w",
      (pmod(xxhash64(col("src"), col("dst")), lit(2)) + 5).cast("double"))
    val roots = edges.select(col("src").as("id")).distinct().limit(20)
      .localCheckpoint()
    val jobs = countJobs("audit-ssspPaths") {
      GraphOps.ssspPathsFrom(weighted, roots, maxIter = 8).count()
    }
    info(s"ssspPathsFrom jobs: $jobs")
    assert(jobs <= 110, s"ssspPathsFrom job count regressed: $jobs (r10 ~86)")
  }

  test("r11 ops (toposort, k-paths, random walks) stay within their job budgets") {
    // topologicalSort on a layered DAG (id-ordered edges are acyclic):
    // per round one blocked-set semi-join + the newly count + the
    // shrink anti-join ≈ 3 actions + AQE stages
    val dag = edges.filter(col("src") < col("dst")).localCheckpoint()
    val topoJobs = countJobs("audit-toposort") {
      GraphOps.topologicalSort(dag, maxIter = 30).count()
    }
    info(s"topologicalSort jobs: $topoJobs")
    assert(topoJobs <= 75, s"topologicalSort job count regressed: $topoJobs (measured ~50)")
    // kShortestPaths: one reverse BFS (≤ maxHops rounds) + maxHops walk
    // rounds of (done count + next count) + the final top-k
    val weighted = edges.withColumn("w",
      (pmod(xxhash64(col("src"), col("dst")), lit(2)) + 5).cast("double"))
    val pair = edges.limit(1).collect().head
    val kpJobs = countJobs("audit-kpaths") {
      GraphOps.kShortestPaths(weighted, pair.getString(0), pair.getString(1),
        k = 3, maxHops = 4, weightCol = Some("w")).count()
    }
    info(s"kShortestPaths jobs: $kpJobs")
    assert(kpJobs <= 75, s"kShortestPaths job count regressed: $kpJobs (measured ~50)")
    // randomWalk: one neighbor-index window pass + walkLength rounds of
    // (sunk count + next count)
    val rwJobs = countJobs("audit-randomwalk") {
      GraphOps.randomWalk(edges, walksPerNode = 1, walkLength = 5).count()
    }
    info(s"randomWalk jobs: $rwJobs")
    assert(rwJobs <= 60, s"randomWalk job count regressed: $rwJobs (measured ~40)")
  }

  test("eigenvector and hits stay within their per-iteration job budgets") {
    // r9 measured: ~5 jobs/iteration either way — they are AQE
    // query-stage jobs from the round's join+agg shuffles, NOT the norm
    // collect (which rides the round's materializing aggregation). An
    // in-plan broadcast-scalar norm variant was built and measured at
    // the SAME count (51→50 @ 8 iters, 90→90 @ 16), so the simpler
    // collected-norm shape is kept; this audit pins the ~5/iter budget
    // so an extra per-round barrier (→ ~8/iter) fails here first.
    val j8 = countJobs("audit-eigen-8") {
      GraphOps.eigenvector(edges, iters = 8, localFinishEdges = 0L).count()
    }
    val j16 = countJobs("audit-eigen-16") {
      GraphOps.eigenvector(edges, iters = 16, localFinishEdges = 0L).count()
    }
    info(s"eigenvector jobs: 8 iters → $j8, 16 iters → $j16")
    assert(j16 - j8 <= 56, // 7/iter headroom over the measured ~5/iter
      s"eigenvector gained ${j16 - j8} jobs for 8 extra iterations (measured baseline ~40)")
    assert(j8 <= 70, s"eigenvector job count regressed: $j8 (measured ~51)")
    val hitsJobs = countJobs("audit-hits") {
      GraphOps.hits(edges, iters = 8, localFinishEdges = 0L).count()
    }
    info(s"hits jobs: $hitsJobs")
    assert(hitsJobs <= 140, s"hits job count regressed: $hitsJobs (two chains/iter)")
  }
}
