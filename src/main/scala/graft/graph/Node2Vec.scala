package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** B45 — node2vec EMBEDDINGS (r15; Grover & Leskovec 2016, "node2vec:
  * Scalable Feature Learning for Networks"): skip-gram with negative
  * sampling trained over the B31 biased walks — the VECTORS
  * `gds.node2vec` actually returns. The walks alone were the r14
  * surface; a GDS user typing the proc name expects embeddings
  * (reference capability: the GDS catalog over the events.py graph).
  *
  * Determinized the house way — no hogwild, no rand():
  *   - corpus: the deterministic [[GraphOps.node2vecWalk]] paths
  *     (xxhash64 draws, p/q biased);
  *   - positives: (center, context) pairs within `windowSize`,
  *     AGGREGATED to (t, c, weight) — the full-batch formulation.
  *     word2vec's per-example SGD order is the classic
  *     nondeterminism; summing gradients over the aggregated pair
  *     multiset has no update order at all;
  *   - negatives: `negativeSamples` per positive pair, drawn once by
  *     vid = xxhash64(t, c, j, seed) mod |V| (uniform — the unigram^¾
  *     table is a constant-factor refinement, disclosed);
  *   - init: U, V entries from xxhash64(vid, pos, salt) uniform in
  *     ±0.5/dim (the word2vec init);
  *   - per epoch (full-batch gradient descent, constant lr):
  *       s(t,c) = u_t·v_c               (one d-exploded join + agg)
  *       coeff  = σ(s)·(w⁺+w⁻) − w⁺     (Σ over the pair's rows of
  *                                       (σ(s)−y)·w, y = 1 pos / 0 neg)
  *       u_t −= lr·Σ_c coeff·v_c ;  v_c −= lr·Σ_t coeff·u_t
  *
  * Scale shape: embeddings live as EXPLODED (vid, pos, val) scalar
  * rows (the FastRP rule — every aggregation buffer is one double,
  * never an array); the pair table is built ONCE
  * (≤ walks·len·window·2 positive rows + negatives, persisted); an
  * epoch is two d-exploded equi-joins for the dot products + two for
  * the gradients + two keyed updates, all on dense-long vids (the B20
  * densification) with severed per-epoch frames (constant plans).
  * Float-SUM order is the only nondeterminism (FastRP's documented
  * class) — consumers compare with tolerance; the g_n2v_ok gate
  * checks structure (homophily, coverage, rerun tolerance) instead of
  * hashes.
  *
  * Returns (id, embedding: array<double>) — the input-side vectors U,
  * unnormalized (GDS's node2vec does not L2-normalize either).
  */
object Node2Vec {

  def embeddings(edges: DataFrame, dim: Int = 32, walksPerNode: Int = 4,
                 walkLength: Int = 8, windowSize: Int = 3,
                 iterations: Int = 5, learningRate: Double = 0.05,
                 negativeSamples: Int = 2, p: Double = 1.0, q: Double = 1.0,
                 seed: Long = 42L): DataFrame = {
    require(dim >= 2 && dim <= 512, s"node2vec: dim in [2,512], got $dim")
    require(windowSize >= 1 && iterations >= 1 && negativeSamples >= 0,
      "node2vec: windowSize/iterations >= 1, negativeSamples >= 0")
    require(learningRate > 0 && learningRate < 1,
      s"node2vec: learningRate in (0,1), got $learningRate")
    val spark = edges.sparkSession
    import spark.implicits._
    val lr = learningRate

    val walks = GraphOps.node2vecWalk(edges, walksPerNode, walkLength, p, q,
      seed)
    val toks = walks
      .select(col("walk_id"), posexplode(split(col("path"), ">"))
        .as(Seq("pos", "node")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dict = toks.select(col("node").as("id")).distinct()
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF("id", "vid")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nV = dict.count()
    if (nV == 0) {
      val out = dict.select(col("id"),
        array().cast("array<double>").as("embedding")).limit(0)
      return graft.Borrow.reclaim(out, toks, dict)
    }

    val enc = toks
      .join(dict.withColumnRenamed("id", "node"), Seq("node"))
      .select(col("walk_id"), col("pos"), col("vid"))
    // positives within the window, both directions (x is the center)
    val posPairs = enc.alias("x").join(enc.alias("y"),
        col("x.walk_id") === col("y.walk_id") &&
          col("y.pos") =!= col("x.pos") &&
          abs(col("y.pos") - col("x.pos")) <= windowSize)
      .groupBy(col("x.vid").as("t"), col("y.vid").as("c"))
      .agg(count(lit(1)).cast("double").as("w"))
    // negatives: fixed per positive pair; a hash collision with the
    // true context (or t itself) just carries its tiny opposing
    // gradient, as in word2vec's own resample-free implementations.
    // negativeSamples == 0 must SKIP this branch: sequence(1, 0) in
    // Spark is the DESCENDING [1, 0], which would silently emit two
    // draws instead of none (r15 advice)
    val negPairs = if (negativeSamples == 0) {
      posPairs.select(col("t"), col("c"), col("w")).limit(0)
    } else posPairs
      .select(col("t"), col("c"), col("w"),
        explode(sequence(lit(1), lit(negativeSamples))).as("j"))
      .select(col("t"),
        pmod(xxhash64(col("t"), col("c"), col("j"), lit(seed)), lit(nV))
          .as("c"),
        col("w"))
      .groupBy(col("t"), col("c")).agg(sum(col("w")).as("w"))
    // one row per (t, c): positive and negative mass together
    val pairs = posPairs.select(col("t"), col("c"), col("w").as("wp"),
        lit(0.0).as("wn"))
      .unionByName(negPairs.select(col("t"), col("c"), lit(0.0).as("wp"),
        col("w").as("wn")))
      .groupBy(col("t"), col("c"))
      .agg(sum(col("wp")).as("wp"), sum(col("wn")).as("wn"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    def initEmb(salt: Int): DataFrame = dict
      .select(col("vid"), explode(sequence(lit(0), lit(dim - 1))).as("pos"))
      .select(col("vid"), col("pos"),
        ((shiftrightunsigned(xxhash64(col("vid"), col("pos"), lit(salt),
            lit(seed)), 11).cast("double") / lit(9007199254740992.0)
          - lit(0.5)) / lit(dim.toDouble)).as("val"))
    var u = graft.Borrow.severLazy(initEmb(1))
    var v = graft.Borrow.severLazy(initEmb(2))

    for (_ <- 1 to iterations) {
      val ue = u.select(col("vid").as("t"), col("pos"), col("val").as("uv"))
      val ve = v.select(col("vid").as("c"), col("pos"), col("val").as("vv"))
      val dots = pairs.select(col("t"), col("c"))
        .join(ue, Seq("t"))
        .join(ve, Seq("c", "pos"))
        .groupBy(col("t"), col("c")).agg(sum(col("uv") * col("vv")).as("s"))
      val g = pairs.join(dots, Seq("t", "c"))
        .select(col("t"), col("c"),
          ((lit(1.0) / (lit(1.0) + exp(-col("s")))) *
            (col("wp") + col("wn")) - col("wp")).as("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val gU = g.join(ve, Seq("c"))
        .groupBy(col("t").as("vid"), col("pos"))
        .agg(sum(col("g") * col("vv")).as("gu"))
      val gV = g.join(ue, Seq("t"))
        .groupBy(col("c").as("vid"), col("pos"))
        .agg(sum(col("g") * col("uv")).as("gv"))
      val u2 = graft.Borrow.severLazy(
        u.join(gU, Seq("vid", "pos"), "left")
          .select(col("vid"), col("pos"),
            (col("val") - lit(lr) * coalesce(col("gu"), lit(0.0))).as("val")))
      val v2 = graft.Borrow.severLazy(
        v.join(gV, Seq("vid", "pos"), "left")
          .select(col("vid"), col("pos"),
            (col("val") - lit(lr) * coalesce(col("gv"), lit(0.0))).as("val")))
      // severLazy plans eagerly: both epoch frames exist before the
      // shared gradient cache is dropped. ONE materializing action for
      // both severed frames (r17 — halves the per-epoch driver
      // barriers; the union is two leaf scans, nothing recomputes)
      u2.select(col("vid")).unionByName(v2.select(col("vid"))).count()
      g.unpersist()
      u = u2; v = v2
    }

    val out = u
      .groupBy(col("vid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("val")))).as("pv"))
      .join(dict, Seq("vid"))
      .select(col("id"), expr("transform(pv, x -> x.val)").as("embedding"))
    graft.Borrow.reclaim(out, toks, dict, pairs)
  }
}
