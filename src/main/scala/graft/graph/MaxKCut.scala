package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** B48 — approximate maximum k-cut (`gds.maxkcut`; r15): assign every
  * vertex one of k communities maximizing the total weight of edges
  * whose endpoints land in DIFFERENT communities. GDS runs a
  * randomized VNS local search; the house version is the same
  * local-search objective, determinized:
  *
  *   - init: community = xxhash64(id, seed) mod k;
  *   - per round, every vertex computes its weight into each community
  *     (one edge×assignment equi-join + one (v, community) sum) and
  *     the best move = the community minimizing internal weight
  *     ((min weight, min community) struct tie-break);
  *   - MOVE GATING makes monotonicity STRUCTURAL, not empirical: a
  *     vertex wanting to move (strict improvement only) actually
  *     moves iff its fresh round priority (xxhash64(id, round), id)
  *     beats every ADJACENT vertex that also wants to move — the
  *     k1Coloring/Luby independent-set rule. Movers are pairwise
  *     non-adjacent, so each mover's improvement is computed against
  *     a neighborhood that truly stays put, and the total cut gains
  *     Σ(strict improvements) > 0 — synchronous oscillation (two
  *     adjacent vertices swapping on each other's stale assignment)
  *     cannot happen at all;
  *   - fixed `iterations` rounds (GDS's own contract — VNS also runs
  *     a budget, not to optimality).
  *
  * Scale shape: per round one equi-join + two keyed aggregations over
  * severed frames (constant plans); weights resolve like louvain
  * (weightCol optional, default 1; parallel edges add). Self-loops
  * are never cuttable and drop; self-loop-only vertices keep their
  * init community (every projected vertex gets a row — the k1Coloring
  * rule). Integer/hash determinism end to end when weights are
  * integral; float weights follow the FastRP tolerance class.
  *
  * Returns (id, communityId). */
object MaxKCut {

  def maxKCut(edges: DataFrame, k: Int = 2, iterations: Int = 8,
              weightCol: Option[String] = None, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"maxKCut: k >= 2, got $k")
    require(iterations >= 0, s"maxKCut: iterations >= 0, got $iterations")
    val base = weightCol match {
      case Some(wc) => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col(wc).cast("double").as("w"))
      case None => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), lit(1.0).as("w"))
    }
    val allV = base.select(col("src").as("id"))
      .unionByName(base.select(col("dst").as("id"))).distinct()
    val sym = base.filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val und = sym.unionByName(
        sym.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var assign = graft.Borrow.severLazy(
      allV.select(col("id"),
        pmod(xxhash64(col("id"), lit(seed)), lit(k)).cast("int").as("c")))
    for (round <- 1 to iterations) {
      // weight from each vertex into each community, via neighbors'
      // current assignment
      val nbrC = und.join(
          assign.select(col("id").as("dst"), col("c").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"), col("nc"))
        .agg(sum(col("w")).as("win"))
      // candidate = every community (absent = weight 0): explode the
      // palette per vertex, left-join the measured weights
      val palette = assign.select(col("id"),
        explode(sequence(lit(0), lit(k - 1))).as("cand"))
      val best = palette
        .join(nbrC.withColumnRenamed("nc", "cand"), Seq("id", "cand"), "left")
        .select(col("id"), col("cand"),
          coalesce(col("win"), lit(0.0)).as("win"))
        .groupBy(col("id"))
        .agg(min(struct(col("win"), col("cand"))).as("m"))
        .select(col("id"), col("m.cand").as("bc"), col("m.win").as("bw"))
      // current internal weight, by a clean (id, c) left join
      val curW = assign.join(
          nbrC.select(col("id"), col("nc").as("c"), col("win").as("cw")),
          Seq("id", "c"), "left")
        .select(col("id"), col("c"), coalesce(col("cw"), lit(0.0)).as("cw"))
      // movers = the priority-maxima independent set among the
      // vertices with a strict improvement (fresh priorities per
      // round — the k1Coloring machinery)
      val want = curW.join(best, Seq("id"))
        .filter(col("bw") < col("cw"))
        .select(col("id"), col("c"), col("bc"),
          struct(xxhash64(col("id"), lit(round), lit(seed)).as("h"),
            col("id").as("i")).as("p"))
      val nbrMax = und.select(col("src"), col("dst"))
        .join(want.select(col("id").as("dst"), col("p").as("np")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(max(col("np")).as("mx"))
      val movers = want.join(nbrMax, Seq("id"), "left")
        .filter(col("mx").isNull || col("p") > col("mx"))
        .select(col("id"), col("bc"))
      assign = graft.Borrow.severLazy(
        assign.join(movers, Seq("id"), "left")
          .select(col("id"), coalesce(col("bc"), col("c")).as("c")))
    }
    val out = assign.select(col("id"), col("c").as("communityId"))
    graft.Borrow.reclaim(out, und)
  }

  /** Total cut weight of an assignment over the undirected simple
    * weight view — the objective, for gates and callers. */
  def cutWeight(edges: DataFrame, assign: DataFrame,
                weightCol: Option[String] = None): Double = {
    val base = weightCol match {
      case Some(wc) => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), col(wc).cast("double").as("w"))
      case None => edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"), lit(1.0).as("w"))
    }
    val sym = base.filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val canon = sym
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
    val row = canon
      .join(assign.select(col("id").as("a"), col("communityId").as("ca")), Seq("a"))
      .join(assign.select(col("id").as("b"), col("communityId").as("cb")), Seq("b"))
      .filter(col("ca") =!= col("cb"))
      .agg(coalesce(sum(col("w")), lit(0.0))).collect()(0)
    row.getDouble(0)
  }
}
