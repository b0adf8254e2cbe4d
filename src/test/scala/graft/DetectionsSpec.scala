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

  test("registry persistence and timestomp motifs match corpus replay counts") {
    // counts pinned from tools/sysmon_oracle.py replay over the corpus
    val (_, edges) = graph
    assert(Detections.persistenceRegistry(edges).count() == 51L)
    assert(Detections.timestomp(edges).count() == 4L)
  }

  test("tamper-and-beacon and ADS motifs fire on synthetic traces (corpus has none)") {
    val dir = java.nio.file.Files.createTempDirectory("motifs").toString
    def tag(k: String, v: String) = s"""{"key":"$k","type":"string","value":"$v"}"""
    def span(t: Long, tags: String*) =
      s"""{"spanID":"s$t","startTime":$t,"duration":1,"operationName":"op","tags":[${tags.mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.json"),
      s"""{"traceID":"TM","spans":[
         |${span(1, tag("EventID", "25"), tag("ProcessGuid", "GA"),
               tag("TargetProcessGuid", "GB"), tag("Details", "herpaderp"))},
         |${span(2, tag("EventID", "3"), tag("ProcessGuid", "GB"),
               tag("DestinationIp", "10.0.0.9"), tag("DestinationPort", "443"))},
         |${span(3, tag("EventID", "15"), tag("ProcessGuid", "GA"),
               tag("TargetFilename", "C:\\\\tmp\\\\payload.docx"),
               tag("StreamName", "evil.ps1"), tag("Hash", "MD5=AB"))},
         |${span(4, tag("EventID", "15"), tag("ProcessGuid", "GA"),
               tag("TargetFilename", "C:\\\\tmp\\\\dl.docx"),
               tag("StreamName", "Zone.Identifier"))}]}""".stripMargin)
    val (_, edges) = SysmonGraph.build(spark, s"$dir/t.json")
    val tb = Detections.tamperAndBeacon(edges)
      .select(col("tamperer"), col("process"), col("ip")).collect()
    assert(tb.length == 1)
    val row = tb.head
    assert(row.getString(0) == "GA" && row.getString(1) == "GB" && row.getString(2) == "10.0.0.9")
    val ads = Detections.adsDrops(edges).collect()
    assert(ads.length == 1 && ads.head.getAs[String]("stream") == "evil.ps1")
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
