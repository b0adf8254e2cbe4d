package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX adapters for the same edge-frame convention GraphOps uses.
  *
  * GraphX wants Long vertex ids; string ids are mapped through a
  * deterministic (id → dense long) dictionary (zipWithIndex) and mapped
  * back on output. Useful when an algorithm benefits from GraphX's
  * Pregel machinery; the DataFrame implementations in [[GraphOps]]
  * remain the default (they survive AQE, DataFrame caching, and don't
  * require the id densification pass).
  */
object GraphXBridge {

  private type MemoKey = (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  private type MemoVal = (DataFrame, Graph[Unit, Unit])

  /** Densification memo keyed by (session, canonicalized edge plan):
    * repeated bridge calls over the same edge frame (the usual shape —
    * cross-checking CC + triangles + SCC on one graph) pay the
    * zipWithIndex dictionary and its two mapping joins ONCE. Stopped
    * sessions are swept on access (the buildCached pattern), and the
    * map is LRU-BOUNDED so a long-lived session touching many distinct
    * edge frames can't grow it without limit. Eviction RELEASES both
    * halves of the entry: the graph's RDD blocks are freed by the
    * ContextCleaner once the last reference drops, but the dict's
    * DataFrame cache registers in the session CacheManager, which
    * holds a strong reference until an explicit unpersist — so the
    * eviction calls dict.unpersist(blocking = false) (non-blocking:
    * a concurrent reader of the evicted dict recomputes rather than
    * stalls or crashes). */
  private val MemoMax = 16
  private val memo = new java.util.LinkedHashMap[MemoKey, MemoVal](MemoMax, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[MemoKey, MemoVal]): Boolean = {
      val evict = size() > MemoMax
      if (evict && !e.getKey._1.sparkContext.isStopped) {
        try e.getValue._1.unpersist(false) catch { case _: Throwable => () }
      }
      evict
    }
  }

  /** (vertexDict, graphx Graph) from an edge frame with string src/dst.
    * Memoized per (session, edge plan); the dictionary frame and the
    * graph's RDDs are cached so every algorithm over the same frame
    * reuses one densification. */
  def toGraphX(edges: DataFrame): (DataFrame, Graph[Unit, Unit]) = memo.synchronized {
    val spark = edges.sparkSession
    val it = memo.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    val key: MemoKey = (spark, edges.queryExecution.analyzed.canonicalized)
    val hit = memo.get(key)
    if (hit != null) hit
    else {
      import spark.implicits._
      val verts = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .distinct()
      val dict = verts.rdd.map(_.getString(0)).zipWithIndex()
        .toDF("id", "vid").cache()
      val e = edges
        .join(dict.withColumnRenamed("vid", "src_vid"), col("src") === dict("id"))
        .drop("id")
        .join(dict.withColumnRenamed("vid", "dst_vid").withColumnRenamed("id", "id2"),
          col("dst") === col("id2"))
        .select(col("src_vid"), col("dst_vid"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
      val v: MemoVal = (dict, Graph.fromEdges(e, ()).cache())
      memo.put(key, v)
      v
    }
  }

  /** Test hook: current memo size (for the LRU-bound spec). */
  private[graft] def memoSize: Int = memo.synchronized(memo.size())

  /** Connected components via GraphX Pregel; returns (id, component)
    * with the component labelled by its minimum member id (same
    * contract as GraphOps.connectedComponents). */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (dict, g) = toGraphX(edges)
    val cc = g.connectedComponents().vertices.toDF("vid", "cvid")
    // GraphX labels by min vid; translate to min string id per component
    cc.join(dict, Seq("vid"))
      .groupBy(col("cvid"))
      .agg(min(col("id")).as("component"), collect_list(col("id")).as("members"))
      .select(explode(col("members")).as("id"), col("component"))
  }

  /** Per-vertex triangle count via GraphX TriangleCount; returns
    * (id, n_tri) for vertices in ≥1 triangle (same contract as
    * GraphOps.triangles). GraphX requires canonical (src < dst)
    * deduplicated edges — the dense vid mapping preserves order only
    * within the dictionary, so canonicalize on the vids. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (dict, g0) = toGraphX(edges)
    val canon = Graph.fromEdges(
      g0.edges.map(e =>
        Edge(math.min(e.srcId, e.dstId), math.max(e.srcId, e.dstId), ()))
        .filter(e => e.srcId != e.dstId).distinct(), ())
    val tc = canon.triangleCount().vertices
      .filter(_._2 > 0).toDF("vid", "n_tri")
    tc.join(dict, Seq("vid"))
      .select(col("id"), col("n_tri").cast("long").as("n_tri"))
  }

  /** Strongly connected components (directed) via GraphX's Pregel SCC —
    * the one analytics algorithm kept exclusively on the GraphX path: a
    * DataFrame SCC needs nested reachability fixpoints (forward ∩
    * backward per round), which Pregel expresses directly. Returns
    * (id, component) labelled by the component's minimum member id. */
  def stronglyConnectedComponents(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (dict, g) = toGraphX(edges)
    val scc = g.stronglyConnectedComponents(maxIter).vertices.toDF("vid", "cvid")
    scc.join(dict, Seq("vid"))
      .groupBy(col("cvid"))
      .agg(min(col("id")).as("component"), collect_list(col("id")).as("members"))
      .select(explode(col("members")).as("id"), col("component"))
  }

  /** PageRank via GraphX; returns (id, rank). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val (dict, g) = toGraphX(edges)
    g.staticPageRank(iters, 1 - damping).vertices.toDF("vid", "rank")
      .join(dict, Seq("vid"))
      .select(col("id"), col("rank"))
  }
}
