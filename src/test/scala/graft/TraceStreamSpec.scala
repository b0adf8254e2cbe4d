package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.graph.SysmonGraph
import graft.streaming.TraceStream

class TraceStreamSpec extends SparkSpec {

  private val ref = "/root/reference/malware"

  test("streaming ingestion + compaction equals the batch build") {
    val base = Files.createTempDirectory("tstream").toString
    val watch = s"$base/in"; Files.createDirectories(Paths.get(watch))
    val files = Seq("T1001+T1001.002.json", "T1003+T1003.003.json", "T1031+T1050-2.json")

    // batch ground truth over the same three files
    val (bn, be) = SysmonGraph.build(spark,
      s"$ref/{${files.map(_.stripSuffix(".json")).mkString(",")}}.json")
    val expectedNodes = bn.count(); val expectedEdges = be.count()

    val q = TraceStream.start(spark, watch, s"$base/store", s"$base/ckpt")
    try {
      // first batch: two files; second batch: one more
      files.take(2).foreach(f => Files.copy(Paths.get(s"$ref/$f"),
        Paths.get(s"$watch/$f"), StandardCopyOption.REPLACE_EXISTING))
      q.processAllAvailable()
      files.drop(2).foreach(f => Files.copy(Paths.get(s"$ref/$f"),
        Paths.get(s"$watch/$f"), StandardCopyOption.REPLACE_EXISTING))
      q.processAllAvailable()
    } finally q.stop()

    val (n, e) = TraceStream.compact(spark, s"$base/store")
    assert(n.count() == expectedNodes)
    assert(e.count() == expectedEdges)
    // spot-check merged props parity with the batch build
    val bProc = bn.filter(col("label") === "Process")
      .select(col("id"), element_at(col("props"), "CommandLine").as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val sProc = n.filter(col("label") === "Process")
      .select(col("id"), element_at(col("props"), "CommandLine").as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(bProc == sProc)
  }

  test("corrupt and zero-span files degrade to FILE:: fallback traces, no crash") {
    val base = Files.createTempDirectory("tcorrupt").toString
    Files.copy(Paths.get(s"$ref/T1001+T1001.002.json"), Paths.get(s"$base/ok.json"))
    Files.writeString(Paths.get(s"$base/corrupt.json"), "{ not valid json")
    Files.writeString(Paths.get(s"$base/empty.json"), "﻿{\"traceID\":\"empty1\",\"spans\":[]}")
    val (n, _) = SysmonGraph.build(spark, s"$base/*.json")
    val traces = n.filter(col("label") === "Trace").collect().map(_.getString(1)).toSet
    assert(traces.exists(_.startsWith("FILE::corrupt")))
    assert(traces.contains("empty1"))
    assert(traces.size == 3)
  }
}
