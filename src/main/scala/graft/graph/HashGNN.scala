package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** B36 — HashGNN node embeddings (GDS `gds.hashgnn`; the hashing-based
  * message-passing scheme of Wu et al.'s #GNN / the GDS catalog's
  * deterministic-by-construction graph embedding). Closes the one GDS
  * surface where walks were handed back instead of vectors: hashgnn is
  * the embedding algorithm whose SEMANTICS are hash-based min-wise
  * selection, so the house determinism rule costs nothing — same seed,
  * same graph, same vectors, on any engine, any partitioning, with NO
  * float arithmetic anywhere (min-over-hash only; compare FastRP,
  * whose float sums force tolerance-based comparison).
  *
  * Algorithm (the GDS shape): every node holds a BINARY feature set
  * over `dimension` feature slots. `generateFeatures` seeds each node
  * with `densityLevel` hash-derived features. Each of `iterations`
  * rounds replaces a node's set with `embeddingDensity` (K) min-hash
  * selections over its own features and its neighbors' features —
  * self and neighbor candidates hashed under DIFFERENT salts (GDS's
  * separate self/neighbor hash functions), per-slot salts making the
  * K draws independent. A selected feature set mixes graph structure
  * in exactly the way min-hash mixes sets: nodes with similar
  * neighborhoods converge to similar feature sets (Jaccard-preserving)
  * — the property the quality gate pins.
  *
  * Scale shape: features live as (id, f) SCALAR rows (never an array
  * in an aggregation buffer — the E3/FastRP rule). Per round: one edge
  * equi-join (row count = edges × features-per-node ≤ edges × K), one
  * distinct, one explode by K, one (id, slot) min-aggregation —
  * map-side combinable, shuffle-bounded, no windows, no driver loop
  * over nodes. Candidate work is ≤ 2·dimension·K rows per node after
  * the distinct. Input edges are symmetrized (undirected message
  * passing, like [[FastRP.embed]]); ids compare as strings.
  *
  * Returns (id, features: array<int> ascending, embedding:
  * array<double> — the 0/1 dense binary vector of length `dimension`,
  * cosine-ready for the E-suite).
  */
object HashGNN {

  def embed(edges0: DataFrame, dimension: Int = 64, densityLevel: Int = 4,
            iterations: Int = 2, embeddingDensity: Int = 8,
            seed: Long = 42L, nodes: Option[DataFrame] = None): DataFrame = {
    require(dimension > 0 && densityLevel > 0 && densityLevel <= dimension,
      "hashgnn: 0 < densityLevel <= dimension")
    require(iterations >= 0 && embeddingDensity > 0,
      "hashgnn: iterations >= 0 and embeddingDensity > 0")
    val e = GraphOps.undirected(edges0.select(
        col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val endpoints = e.select(col("src").as("id")).distinct()
    val vset = nodes match {
      case Some(n) => endpoints
        .unionByName(n.select(col("id").cast("string").as("id"))).distinct()
      case None => endpoints
    }
    // generateFeatures: densityLevel hash-derived feature slots per node
    var feats = graft.Borrow.severLazy(vset
      .select(col("id"),
        explode(sequence(lit(0), lit(densityLevel - 1))).as("j"))
      .select(col("id"),
        pmod(xxhash64(col("id"), col("j"), lit(seed)), lit(dimension))
          .cast("int").as("f"))
      .distinct())
    var t = 0
    while (t < iterations) {
      t += 1
      // candidate features: own set (cls 0) + neighbors' sets (cls 1),
      // deduplicated BEFORE the K-fold explode so hub fan-in collapses
      // to ≤ dimension rows per (id, cls)
      val selfC = feats.select(col("id"), col("f"), lit(0).as("cls"))
      val nbrC = e.join(feats.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), col("f"), lit(1).as("cls"))
      val cands = selfC.unionByName(nbrC).distinct()
      // K min-hash selections; the slot k and class salt the hash (the
      // GDS self-vs-neighbor hash split); ties cannot happen — f rides
      // the struct tail to keep the min total-ordered anyway
      feats = graft.Borrow.severLazy(cands
        .select(col("id"), col("f"), col("cls"),
          explode(sequence(lit(0), lit(embeddingDensity - 1))).as("k"))
        .withColumn("h", xxhash64(col("f"), col("cls"), lit(t), col("k"), lit(seed)))
        .groupBy(col("id"), col("k"))
        .agg(min(struct(col("h"), col("f"))).as("m"))
        .select(col("id"), col("m.f").as("f"))
        .distinct())
      // r17: no per-round count — severLazy already plans (and under
      // AQE runs) the round's shuffles; the final stage materializes
      // lazily as the next round's (or the output's) parent
    }
    val out = feats
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("f"))).as("features"))
      .withColumn("embedding",
        expr(s"transform(sequence(0, ${dimension - 1}), " +
          "p -> CASE WHEN array_contains(features, p) THEN 1.0D ELSE 0.0D END)"))
      .select(col("id"), col("features"), col("embedding"))
    graft.Borrow.reclaim(out, e)
  }
}
