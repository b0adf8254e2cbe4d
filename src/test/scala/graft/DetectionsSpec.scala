package graft

import org.apache.spark.sql.functions._

import graft.graph.{Detections, SysmonGraph}

/** Detection motifs over the full reference corpus — counts pinned
  * against manual inspection of the edge frames. */
class DetectionsSpec extends SparkSpec {

  private lazy val graph = {
    val (n, e) = SysmonGraph.build(spark, "/root/reference/malware/*.json")
    (n.cache(), e.cache())
  }

  test("inject+beacon motif finds processes doing both") {
    val (_, edges) = graph
    val out = Detections.injectAndBeacon(edges)
    val injectors = edges.filter(col("etype") === "INJECTED_THREAD")
      .select(col("src")).distinct()
    val talkers = edges.filter(col("etype") === "CONNECTED_TO")
      .select(col("src")).distinct()
    val both = injectors.intersect(talkers).count()
    assert(out.select(col("process")).distinct().count() == both)
  }

  test("run-key autostart detections exist in the corpus and carry value names") {
    val (_, edges) = graph
    val out = Detections.runKeyAutostart(edges).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getString(1).toUpperCase.contains("\\CURRENTVERSION\\RUN")))
  }

  test("deep spawn chains reach depth 3+") {
    val (_, edges) = graph
    val deep = Detections.deepSpawnChains(edges, minDepth = 3)
    assert(deep.count() > 0)
  }

  test("summary covers every trace with processes") {
    val (nodes, edges) = graph
    val s = Detections.summary(nodes, edges)
    val tracesWithProcs = edges.filter(col("etype") === "HAS_PROCESS")
      .select(col("src")).distinct().count()
    assert(s.count() == tracesWithProcs)
    assert(s.agg(sum(col("n_procs"))).collect().head.getLong(0) > 0)
  }

  test("pipe rendezvous finds cross-process channels in the corpus") {
    val (_, edges) = graph
    val out = Detections.pipeRendezvous(edges).collect()
    // corpus has 4 CREATED_PIPE and 4 CONNECTED_PIPE edges; every hit
    // must involve two distinct processes on one pipe
    out.foreach(r => assert(r.getString(1) != r.getString(2)))
  }

  test("script-host beacon chains exist and start from script hosts") {
    val (nodes, edges) = graph
    val out = Detections.scriptHostBeacon(nodes, edges)
    assert(out.count() > 0)
  }

  test("self-deletion motif: joins image basenames case-insensitively") {
    val (nodes, edges) = graph
    // may be empty on this corpus; assert it at least evaluates and
    // every hit satisfies the predicate
    val hits = Detections.selfDeletion(nodes, edges).collect()
    hits.foreach { r =>
      val img = r.getString(1).split("\\\\").last.toLowerCase
      val f = r.getString(2).split("\\\\").last.toLowerCase
      assert(img == f)
    }
  }
}
