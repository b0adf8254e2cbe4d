package graft

import org.apache.spark.sql.DataFrame

/** Deterministic persist reclamation for operators that return frames
  * derived from cached intermediates (the SURVEY §5 session-lived-
  * persist trade-off).
  *
  * The hazard this replaces: an operator that `unpersist()`s its
  * intermediates before the CALLER materializes the returned lazy
  * frame silently recomputes the whole pipeline per downstream
  * reference (two such lifecycle bugs shipped before the session-lived
  * rule). `reclaim` instead materializes the result EAGERLY via
  * `localCheckpoint` — the returned frame then owns its blocks and
  * references no parent cache — and only then releases the borrowed
  * caches.
  *
  * Use when the result is small relative to the borrows (the usual
  * shape: thresholded pair lists, top-k's, aggregates); the extra cost
  * is storing the output once, which the caller's first action would
  * have paid anyway. NOT a blanket rule: checkpointing a large
  * INTERMEDIATE measured ~3× slower than persist + exchange reuse in
  * the triangle counter, which therefore keeps its orientation cache
  * session-lived (see [[graft.graph.GraphOps.triangles]]).
  */
object Borrow {

  /** Materialize `result` while `borrows` are cached, then release the
    * borrows. The borrows must already be persisted (this helper does
    * not persist them — operators persist at creation so their own
    * eager steps, e.g. an adaptive max-df probe, reuse the cache). */
  def reclaim(result: DataFrame, borrows: DataFrame*): DataFrame = {
    val r = result.localCheckpoint() // eager by default: lineage-free
    borrows.foreach(_.unpersist())
    r
  }

  /** Lazily sever lineage: the logical plan becomes a leaf NOW (so
    * downstream plans referencing this frame stay constant-size — the
    * iterative-algorithm plan-blowup guard), while the blocks
    * materialize at the frame's first action.
    *
    * Reclamation: severed blocks live at the RDD layer, NOT in the
    * CacheManager, so unlike `persist` they hold no session-lived
    * strong reference — the ContextCleaner frees them as soon as the
    * (method-local) Dataset is garbage-collected. Explicit
    * `RDD.unpersist` would be deterministic but logs a
    * cannot-recompute warning per frame; GC reclaim is silent and is
    * the mechanism Bench already leans on (System.gc() between
    * queries). */
  def severLazy(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

  /** Opt-in DETERMINISTIC release of severed/checkpointed blocks, for
    * memory-constrained sessions that cannot wait for the GC-driven
    * ContextCleaner path [[severLazy]] documents: unpersists the RDD
    * behind every `LogicalRDD` leaf of each frame's plan, immediately
    * (blocking = true waits for the executors to confirm).
    *
    * AFTER RELEASE THE FRAMES ARE DEAD — a localCheckpoint cannot
    * recompute (that is its point), so any later action on a released
    * frame fails. Call it the way the iterative operators would: once
    * the OUTPUT frame is materialized (e.g. via [[reclaim]]) and the
    * method-local level frames will never be read again. Spark logs
    * one cannot-recompute warning per released RDD — the documented
    * price of determinism over the silent GC path. */
  def release(frames: DataFrame*): Unit = frames.foreach { df =>
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = true))
  }
}
