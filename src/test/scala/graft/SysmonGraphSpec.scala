package graft

import org.apache.spark.sql.functions._

import graft.graph.SysmonGraph
import graft.sources.TraceJson

/** Expected values pinned from tools/sysmon_oracle.py — an independent
  * in-memory replay of the reference loader's semantics
  * (/root/reference/events.py) over the reference's own trace files. */
class SysmonGraphSpec extends SparkSpec {

  private val ref = "/root/reference/malware"

  private def counts(path: String): (Map[String, Long], Map[String, Long]) = {
    val (nodes, edges) = SysmonGraph.build(spark, path)
    val n = nodes.groupBy(col("label")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = edges.groupBy(col("etype")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (n, e)
  }

  test("single trace: simple process/file graph (T1001+T1001.002)") {
    val (n, e) = counts(s"$ref/T1001+T1001.002.json")
    assert(n == Map("File" -> 4L, "Process" -> 12L, "Trace" -> 1L))
    assert(e == Map("CREATED_FILE" -> 4L, "HAS_PROCESS" -> 12L, "SPAWNS" -> 16L))
  }

  test("single trace: registry + network events (T1031+T1050-2)") {
    val (n, e) = counts(s"$ref/T1031+T1050-2.json")
    assert(n == Map("File" -> 4L, "Ip" -> 4L, "Process" -> 64L,
      "RegistryKey" -> 13L, "RegistryValue" -> 14L, "Trace" -> 1L))
    assert(e == Map("CONNECTED_TO" -> 4L, "CREATED_FILE" -> 4L,
      "HAS_PROCESS" -> 64L, "SET_REG_VALUE" -> 14L, "SPAWNS" -> 58L,
      "UNDER_KEY" -> 14L))
  }

  test("multi-file load merges nodes across traces") {
    val (n, e) = counts(
      s"$ref/{T1001+T1001.002,T1003+T1003.003,T1031+T1050-2}.json")
    // single-file sums: Process 12+29+64=105; one guid collides → 104
    assert(n("Process") == 104L)
    assert(n("Trace") == 3L)
    assert(e("SPAWNS") == 112L)
    assert(e("HAS_PROCESS") == 105L)
  }

  test("process node props follow reference MERGE semantics") {
    val (nodes, _) = SysmonGraph.build(spark, s"$ref/T1031+T1050-2.json")
    val procs = nodes.filter(col("label") === "Process")
    // every main process carries an image prop (possibly ""), and
    // image values are path basenames by POSIX rules (no '/' inside)
    val imgs = procs.select(element_at(col("props"), "image"))
      .collect().flatMap(r => Option(r.getString(0)))
    assert(imgs.nonEmpty)
    assert(imgs.forall(i => !i.contains("/")))
  }

  test("tag falsiness: numeric zero and empty tags are skipped like the reference") {
    import spark.implicits._
    val df = Seq(("int64", "0"), ("int64", "5"), ("string", ""),
      ("string", "0"), ("bool", "false"), ("float64", "0.0")).toDF("t", "v")
    val out = df.select(TraceJson.isFalsy(col("v"), col("t")).as("f"))
      .collect().map(_.getBoolean(0))
    assert(out.sameElements(Array(true, false, true, false, true, true)))
  }

  test("A2 utils: toUtc, jsonOrList, lastSegment mirror the reference helpers") {
    import spark.implicits._
    val df = Seq("2025-09-20 09:00:09.888").toDF("t")
    val ts = df.select(TraceJson.toUtc(col("t"))).collect().head.getString(0)
    assert(ts == "2025-09-20T09:00:09Z")

    val lists = Seq(
      """["a","b"]""", "x, y; z", "-", "tok").toDF("v")
      .select(TraceJson.jsonOrList(col("v"))).collect().map(_.getSeq[String](0))
    assert(lists(0) == Seq("a", "b"))
    assert(lists(1) == Seq("x", "y", "z"))
    assert(lists(2).isEmpty)
    assert(lists(3) == Seq("tok"))

    val segs = Seq("C:\\Win\\foo.exe", "/usr/bin/ls", "plain").toDF("p")
      .select(TraceJson.lastSegment(col("p"))).collect().map(_.getString(0))
    assert(segs.sameElements(Array("foo.exe", "ls", "plain")))
  }

  // ---- synthetic-fixture tests for corner semantics the reference
  // corpus does not exercise (tools/sysmon_oracle.py replays these too;
  // expectations below were cross-checked against it) ----

  private def span(t: Long, kvs: (String, String)*): String = {
    val tags = kvs.map { case (k, v) =>
      s"""{"key":"$k","type":"string","value":"$v"}""" }.mkString(",")
    s"""{"spanID":"s$t","startTime":$t,"duration":1,"operationName":"op","tags":[$tags]}"""
  }

  private def writeTrace(name: String, traceId: String, spans: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name.json"),
      s"""{"traceID":"$traceId","spans":[${spans.mkString(",")}]}""")
    s"$dir/$name.json"
  }

  test("BIND_TO requires pre-existing WmiFilter AND WmiConsumer nodes (MATCH, not MERGE)") {
    // events.py:155-160 wmi_bind MATCHes both endpoints: binds seen
    // before their filter/consumer creation events produce no edge
    val path = writeTrace("bindgate", "TB", Seq(
      span(1, "EventID" -> "21", "ProcessGuid" -> "G1",
        "FilterName" -> "F1", "ConsumerName" -> "C1"), // dangling: neither exists
      span(2, "EventID" -> "19", "ProcessGuid" -> "G1",
        "FilterName" -> "F1", "Query" -> "Q1"),
      span(3, "EventID" -> "21", "ProcessGuid" -> "G1",
        "FilterName" -> "F1", "ConsumerName" -> "C1"), // consumer still missing
      span(4, "EventID" -> "20", "ProcessGuid" -> "G1",
        "ConsumerName" -> "C1", "Command" -> "CMD"),
      span(5, "EventID" -> "21", "ProcessGuid" -> "G1",
        "FilterName" -> "F1", "ConsumerName" -> "C1"))) // both exist now
    val (nodes, edges) = SysmonGraph.build(spark, path)
    val binds = edges.filter(col("etype") === "BIND_TO")
      .select(col("src"), col("dst"), col("n_events")).collect()
    assert(binds.length == 1)
    assert(binds.head.getString(0) == "F1" && binds.head.getString(1) == "C1")
    // only the span-5 bind survives the gate (spans 1 and 3 matched nothing)
    assert(binds.head.getLong(2) == 1L)
    assert(nodes.filter(col("label").isin("WmiFilter", "WmiConsumer")).count() == 2)
  }

  test("same-span double MERGE of one process key: second emission runs ON MATCH") {
    // event 10 with TargetProcessGuid == ProcessGuid: the main-process
    // MERGE creates the node (ON CREATE does not set ProcessGuid), the
    // target-process MERGE matches it and sets ProcessGuid — the Guid
    // must survive even though both emissions share one span
    val path = writeTrace("selfaccess", "TS", Seq(
      span(1, "EventID" -> "10", "ProcessGuid" -> "GSELF",
        "TargetProcessGuid" -> "GSELF", "GrantedAccess" -> "0x1fffff",
        "Image" -> "self.exe")))
    val (nodes, edges) = SysmonGraph.build(spark, path)
    val p = nodes.filter(col("label") === "Process").collect()
    assert(p.length == 1)
    val props = p.head.getMap[String, String](p.head.fieldIndex("props"))
    assert(props.get("ProcessGuid").contains("GSELF"))
    assert(props.get("image").contains("self.exe"))
    val acc = edges.filter(col("etype") === "ACCESSED_PROCESS").collect()
    assert(acc.length == 1 && acc.head.getAs[String]("src") == "GSELF"
      && acc.head.getAs[String]("dst") == "GSELF")
  }

  test("registry target split matches reference parse_reg_target") {
    import spark.implicits._
    val df = Seq(
      "HKLM\\Software\\Microsoft\\Run\\Updater",
      "NoSeparator",
      "HKLM\\Key\\").toDF("t")
    val out = df.select(
      TraceJson.regParent(col("t")).as("p"),
      TraceJson.regValueName(col("t")).as("v")).collect()
    assert(out(0).getString(0) == "HKLM\\Software\\Microsoft\\Run")
    assert(out(0).getString(1) == "Updater")
    assert(out(1).getString(0) == "NoSeparator" && out(1).isNullAt(1))
    assert(out(2).getString(0) == "HKLM" && out(2).getString(1) == "Key")
  }
}
