package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact all-pairs Jaccard over generic set rows `(id, item)` — the
  * Vernica et al. (SIGMOD'10) prefix-filter + df-cap hybrid, shared by
  * document similarity ([[Dedup.d4Jaccard]], items = word 3-gram
  * shingles) and graph node similarity
  * ([[graft.graph.GraphOps.nodeSimilarity]], items = out-neighbors,
  * where a hub destination is exactly the high-df blowup the cap
  * bounds).
  *
  * Scale shape (the reason this is not a naive inverted-index join):
  *
  *  1. Items with df ≤ dfCap are counted by the direct inverted-index
  *     co-occurrence join, whose output is Σ_{df≤cap} df² ≤
  *     dfCap · |rows| — LINEAR in the input for a fixed cap.
  *  2. Items with df > dfCap (boilerplate shingles / hub vertices — the
  *     quadratic case: one item of df d alone emits d²/2 pairs) are
  *     excluded from that join. Pairs that depend on them are still
  *     found because candidate membership comes from PREFIX FILTERING:
  *     order items globally by (df, item); each id indexes only its
  *     rarest |d| − ⌈θ·|d|⌉ + 1 items; any pair with J ≥ θ must share
  *     at least one prefix item (pigeonhole), so candidate recall is
  *     exact. High-df intersections are then counted by a join bounded
  *     by the candidate set, not by df².
  *
  * Adaptive fast path: when no item exceeds the cap (measured — one
  * tiny aggregation on the persisted df frame, the same kind of
  * runtime decision AQE makes), the direct join already covers every
  * intersection exactly and the prefix window + candidate self-join +
  * high-df join are skipped entirely. On low-skew corpora (the
  * synthetic testdata: max shingle df ≈ 25) this is ~4× cheaper; on
  * skewed corpora the hybrid engages automatically.
  */
object JaccardJoin {

  /** Prefix-filtered candidate pairs (id1 < id2) from `(id, item)`
    * rows: every pair with Jaccard ≥ threshold is included (recall is
    * exact); frequent items rank into the un-indexed suffix and never
    * self-join, which is what bounds the candidate blowup. */
  def candidates(rows: DataFrame, sizes: DataFrame, freq: DataFrame,
                 threshold: Double): DataFrame = {
    val pref = rows
      .join(freq, Seq("item"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("item"))))
      .join(sizes, Seq("id"))
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("item"))
    pref.alias("x").join(pref.alias("y"),
        col("x.item") === col("y.item") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
  }

  /** Prefix-filtered candidates for the normalized-OVERLAP metric
    * (i/min(n1,n2) ≥ θ). Overlap admits no per-record prefix bound on
    * the LARGER side (a subset pair scores 1 whatever the size ratio),
    * so the join is prefix(smaller) × FULL(larger): with the required
    * intersection c = ⌈θ·n_min⌉, at most c−1 shared items fit after
    * the min record's ⌈n−θn⌉+1-item prefix — pigeonhole, recall exact.
    * Items order by ASCENDING df so prefixes hold rare items: a hub
    * item only generates candidates from records whose prefix it
    * reaches, and those pairs are (by the subset property) mostly TRUE
    * results — overlap on hub-sharing records is genuinely quadratic
    * in the hub degree, a semantic fact, not a plan defect. */
  def overlapCandidates(rows: DataFrame, sizes: DataFrame, freq: DataFrame,
                        threshold: Double): DataFrame = {
    val ranked = rows
      .join(freq, Seq("item"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("item"))))
      .join(sizes, Seq("id"))
    val pref = ranked
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("item"), col("n"))
    val full = ranked.select(col("id"), col("item"), col("n"))
    pref.alias("x").join(full.alias("y"),
        col("x.item") === col("y.item") &&
          (col("x.n") < col("y.n") ||
            (col("x.n") === col("y.n") && col("x.id") =!= col("y.id"))))
      .select(
        when(col("x.id") < col("y.id"), col("x.id")).otherwise(col("y.id")).as("id1"),
        when(col("x.id") < col("y.id"), col("y.id")).otherwise(col("x.id")).as("id2"))
      .distinct()
  }

  /** Per-metric closed form over (intersection, set sizes) — the GDS
    * nodeSimilarity `similarityMetric` family (jaccard/overlap/cosine
    * over SETS; cosine here is the set-cosine i/√(n1·n2), GDS's
    * unweighted case). */
  private def simCol(metric: String): Column = {
    val i = col("i").cast("double")
    metric match {
      case "jaccard" => i / (col("n1") + col("n2") - col("i"))
      case "overlap" => i / least(col("n1"), col("n2")).cast("double")
      case "cosine"  => i / sqrt(col("n1").cast("double") * col("n2"))
      case other => throw new IllegalArgumentException(
        s"unknown similarity metric '$other' (jaccard | overlap | cosine)")
    }
  }

  /** Attach set sizes, filter on the UNROUNDED similarity (rounding is
    * display-only and belongs to callers), return (id1, id2, sim). */
  private def thresholded(pairs: DataFrame, sizes: DataFrame,
                          threshold: Double, metric: String): DataFrame =
    pairs
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .filter(simCol(metric) >= threshold)
      .withColumn("sim", simCol(metric))
      .select(col("id1"), col("id2"), col("sim"))

  /** All pairs (id1 < id2) with Jaccard(items(id1), items(id2)) ≥
    * threshold, with the exact (unrounded) Jaccard value. `rows` needs
    * columns `id` and `item`; duplicates are collapsed (set
    * semantics).
    *
    * With `reclaim` (the default) the thresholded pair list — tiny
    * relative to the inverted index — is materialized eagerly and the
    * internal caches are released ([[graft.Borrow.reclaim]]); pass
    * `reclaim = false` to get the lazy frame with its full plan (the
    * plan audits do, to inspect the join strategy). */
  def exactPairs(rows0: DataFrame, threshold: Double, dfCap: Long,
                 reclaim: Boolean = true): DataFrame =
    exactPairsMetric(rows0, threshold, dfCap, "jaccard", reclaim)
      .withColumnRenamed("sim", "jaccard")

  /** [[exactPairs]] generalized over the GDS similarityMetric family.
    * Same candidate machinery, per-metric prefix rule:
    * jaccard θ → per-record overlap ⌈θ·n⌉ (i ≥ θ·n_max follows from
    * the definition); cosine θ → ⌈θ²·n⌉ (n_other ≥ θ²·n, so
    * i ≥ θ√(n·θ²n) = θ²·n — the ppjoin bound); overlap θ → the
    * min-side prefix × full join ([[overlapCandidates]]). Returns
    * (id1, id2, sim), recall-exact for every metric. */
  def exactPairsMetric(rows0: DataFrame, threshold: Double, dfCap: Long,
                       metric: String, reclaim: Boolean = true): DataFrame = {
    simCol(metric) // reject unknown metrics before any work
    val rows = rows0.select(col("id"), col("item")).distinct().persist()
    val sizes = rows.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val freq = rows.groupBy(col("item")).agg(count(lit(1)).as("df")).persist()
    val maxDfRow = freq.agg(max(col("df"))).collect()(0)
    val maxDf = if (maxDfRow.isNullAt(0)) 0L else maxDfRow.getLong(0)
    if (maxDf <= dfCap) {
      // fast path: no item can blow up the inverted-index join, and it
      // alone counts every intersection exactly (metric-independent:
      // the closed form applies at the end)
      val iAll = rows.alias("x").join(rows.alias("y"),
          col("x.item") === col("y.item") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("i"))
      val out = thresholded(iAll, sizes, threshold, metric)
      if (reclaim) graft.Borrow.reclaim(out, rows, freq) else out
    } else {
      val cand = (metric match {
        case "overlap" => overlapCandidates(rows, sizes, freq, threshold)
        case "cosine"  => candidates(rows, sizes, freq, threshold * threshold)
        case _         => candidates(rows, sizes, freq, threshold)
      }).persist()
      val rf = rows.join(freq, Seq("item"))
      val low = rf.filter(col("df") <= dfCap).select(col("id"), col("item"))
      val iLow = low.alias("x").join(low.alias("y"),
          col("x.item") === col("y.item") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("i_low"))
      val high = rf.filter(col("df") > dfCap).select(col("id"), col("item"))
      // explicit two-key equi-join: joining on id2 alone would blow up
      // to |cand|×|high| rows before any item filter could apply
      val iHigh = cand
        .join(high.select(col("id").as("id1"), col("item")), Seq("id1"))
        .join(high.select(col("id").as("rid2"), col("item").as("item2")),
          col("id2") === col("rid2") && col("item") === col("item2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("i_high"))
      val pairs = cand
        .join(iLow, Seq("id1", "id2"), "left")
        .join(iHigh, Seq("id1", "id2"), "left")
        .withColumn("i",
          coalesce(col("i_low"), lit(0L)) + coalesce(col("i_high"), lit(0L)))
        .filter(col("i") > 0)
        .select(col("id1"), col("id2"), col("i"))
      val out = thresholded(pairs, sizes, threshold, metric)
      if (reclaim) graft.Borrow.reclaim(out, rows, freq, cand) else out
    }
  }
}
