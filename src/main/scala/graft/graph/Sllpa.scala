package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** B42 — SLLPA: speaker-listener label propagation (Xie, Szymanski &
  * Liu 2011, "SLPA: Uncovering Overlapping Communities in Social
  * Networks"; GDS `gds.alpha.sllpa`) — OVERLAPPING community
  * detection, the one community shape the disjoint B14/B22/B24 family
  * cannot express (a vertex on the boundary of two dense groups
  * belongs to both).
  *
  * Semantics (the paper's, determinized the house way):
  *   - every vertex starts with a memory {self: 1};
  *   - per round, every vertex LISTENS once to each neighbor: the
  *     neighbor SPEAKS one label drawn from its memory with
  *     probability proportional to the label's count — here the draw
  *     is DETERMINISTIC: u = xxhash64(listener, speaker, round, seed)
  *     mod total, and the spoken label is the struct-min of
  *     (cum > u) over the speaker's cumulative counts (the node2vec
  *     selection rule, but over EXACT INTEGER sums — no FP boundary
  *     exists at all);
  *   - the listener adopts the most frequent received label
  *     ((max count, min label) tie-break — B14's rule) and appends it
  *     to its memory;
  *   - post-processing keeps labels seen at least
  *     ceil(minAssociationStrength · (maxIterations+1)) times; a
  *     vertex whose every label falls below the floor keeps its
  *     single strongest label (the paper keeps the highest-probability
  *     label; a memberless vertex is not a meaningful output).
  *
  * Scale shape: per round ONE edge×memory equi-join (≤ E·(round+1)
  * rows — memory size is bounded by the ROUND COUNT, never by degree,
  * so the per-speaker cumulative window sees ≤ maxIterations+1 rows),
  * one keyed struct-min, one (listener, label) count, one memory
  * re-aggregation; severed frames keep plans constant-size. Every
  * count is a long — the whole algorithm is integer-exact and
  * engine-reproducible.
  *
  * Returns (id, communityId) — one row per membership, possibly
  * several per vertex (that is the point). Labels are vertex ids. */
object Sllpa {

  def run(edges: DataFrame, maxIterations: Int = 10,
          minAssociationStrength: Double = 0.2, seed: Long = 42L): DataFrame = {
    require(maxIterations >= 1, s"sllpa: maxIterations must be >= 1, got $maxIterations")
    require(minAssociationStrength > 0.0 && minAssociationStrength <= 1.0,
      s"sllpa: minAssociationStrength must be in (0, 1], got $minAssociationStrength")
    val strEdges = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
    val sym = GraphOps.undirected(strEdges)
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // vertices whose ONLY incident edges are self-loops vanish from
    // `sym` but are still projected nodes — GDS emits every projected
    // node, with its own label as the sole community (the k1Coloring
    // r13 precedent, applied here per the r14 verdict)
    val loopOnly = strEdges.select(col("src").as("id"))
      .unionByName(strEdges.select(col("dst").as("id"))).distinct()
      .join(sym.select(col("src").as("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("communityId"))
    if (sym.limit(1).count() == 0) {
      return graft.Borrow.reclaim(loopOnly, sym)
    }
    var mem = graft.Borrow.severLazy(
      sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"), lit(1L).as("cnt")))
    val arcs = sym.select(col("src").as("listener"), col("dst").as("speaker"))
    for (t <- 1 to maxIterations) {
      // speaker's cumulative label distribution — the window partitions
      // on the speaker but holds ≤ t+1 rows (memory grows one label per
      // round), so there is no hub-degree task here to two-stage
      val wS = Window.partitionBy(col("speaker")).orderBy(col("label"))
      val spk = mem.select(col("id").as("speaker"), col("label"), col("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wS))
        .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("speaker"))))
      // one spoken label per (listener, speaker) arc: integer draw in
      // [0, tot), struct-min of the cum strictly above it — exactly one
      // candidate matches BY ARITHMETIC (integer cums are gap-free)
      val drawn = arcs.join(spk, Seq("speaker"))
        .withColumn("u", pmod(
          xxhash64(col("listener"), col("speaker"), lit(t), lit(seed)), col("tot")))
        .filter(col("cum") > col("u"))
        .groupBy(col("listener"), col("speaker"))
        .agg(min(struct(col("cum"), col("label"))).as("m"))
        .select(col("listener"), col("m.label").as("label"))
      // listener adopts the (max count, min label) received label
      val adopted = drawn.groupBy(col("listener"), col("label"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("listener"))
        .agg(min(struct((-col("n")).as("nn"), col("label"))).as("m"))
        .select(col("listener").as("id"), col("m.label").as("label"),
          lit(1L).as("cnt"))
      val merged = mem.unionByName(adopted)
        .groupBy(col("id"), col("label")).agg(sum(col("cnt")).as("cnt"))
      // sever alternate rounds (the B41 planning trade: severLazy
      // plans eagerly, and under AQE that runs the round's shuffles —
      // halving the sever points halves the scheduling floor while
      // plans stay two rounds deep at most)
      mem = if (t % 2 == 0 || t == maxIterations) graft.Borrow.severLazy(merged)
            else merged
    }
    // post-process: the paper's frequency floor, with the strongest
    // label as the keep-one fallback
    val floor = math.max(1L,
      math.ceil(minAssociationStrength * (maxIterations + 1)).toLong)
    val kept = mem.filter(col("cnt") >= floor)
      .select(col("id"), col("label").as("communityId"))
    val strongest = mem.groupBy(col("id"))
      .agg(min(struct((-col("cnt")).as("nc"), col("label"))).as("m"))
      .select(col("id"), col("m.label").as("communityId"))
    val out = kept.unionByName(
        strongest.join(kept.select(col("id")).distinct(), Seq("id"), "left_anti"))
      .distinct()
      .unionByName(loopOnly)
    graft.Borrow.reclaim(out, sym)
  }
}
