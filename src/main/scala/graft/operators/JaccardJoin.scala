package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Attach set sizes, filter on the UNROUNDED Jaccard (rounding is
    * display-only and belongs to callers), return (id1, id2, jaccard). */
  private def thresholded(pairs: DataFrame, sizes: DataFrame,
                          threshold: Double): DataFrame =
    pairs
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .filter(col("i").cast("double") / (col("n1") + col("n2") - col("i")) >= threshold)
      .withColumn("jaccard", col("i").cast("double") / (col("n1") + col("n2") - col("i")))
      .select(col("id1"), col("id2"), col("jaccard"))

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
                 reclaim: Boolean = true): DataFrame = {
    val rows = rows0.select(col("id"), col("item")).distinct().persist()
    val sizes = rows.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val freq = rows.groupBy(col("item")).agg(count(lit(1)).as("df")).persist()
    val maxDfRow = freq.agg(max(col("df"))).collect()(0)
    val maxDf = if (maxDfRow.isNullAt(0)) 0L else maxDfRow.getLong(0)
    if (maxDf <= dfCap) {
      // fast path: no item can blow up the inverted-index join, and it
      // alone counts every intersection exactly
      val iAll = rows.alias("x").join(rows.alias("y"),
          col("x.item") === col("y.item") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("i"))
      val out = thresholded(iAll, sizes, threshold)
      if (reclaim) graft.Borrow.reclaim(out, rows, freq) else out
    } else {
      val cand = candidates(rows, sizes, freq, threshold).persist()
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
      val out = thresholded(pairs, sizes, threshold)
      if (reclaim) graft.Borrow.reclaim(out, rows, freq, cand) else out
    }
  }
}
