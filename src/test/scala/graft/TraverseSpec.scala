package graft

import org.apache.spark.sql.functions._

import graft.graph.{SysmonGraph, Traverse}

class TraverseSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(rows: (String, String, String)*) =
    rows.toDF("etype", "src", "dst")

  test("single and multi-hop traversal with filters") {
    val e = edgeDf(
      ("S", "a", "b"), ("S", "b", "c"), ("S", "c", "d"),
      ("F", "c", "file1.exe"), ("F", "d", "doc.txt"))
    val t = Traverse.from(e, Seq("a").toDF("id"))
      .out("S", 1 to 3)
      .out("F")
    assert(t.pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "file1.exe"), ("a", "doc.txt")))
    val exes = t.where(col("cur").endsWith(".exe")).ends
      .collect().map(_.getString(0)).toSet
    assert(exes == Set("file1.exe"))
  }

  test("zero-length lower bound includes the start; reverse hops work") {
    val e = edgeDf(("S", "a", "b"), ("S", "b", "c"))
    val zero = Traverse.from(e, Seq("b").toDF("id")).out("S", 0 to 1)
    assert(zero.ends.collect().map(_.getString(0)).toSet == Set("b", "c"))
    val rev = Traverse.from(e, Seq("c").toDF("id")).in("S", 1 to 2)
    assert(rev.ends.collect().map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("Cypher-parity query over a real trace graph") {
    // MATCH (p:Process)-[:SPAWNS*1..3]->(m)-[:CREATED_FILE]->(f) RETURN p, f
    val (_, edges) = SysmonGraph.build(spark, "/root/reference/malware/T1003+T1003.003.json")
    val starts = edges.filter(col("etype") === "SPAWNS").select(col("src")).distinct()
    val got = Traverse.from(edges, starts)
      .out("SPAWNS", 1 to 3)
      .out("CREATED_FILE")
      .pairs
    // manual composition of the same pattern
    val s = edges.filter(col("etype") === "SPAWNS").select(col("src").as("a"), col("dst").as("b"))
    val hop1 = s.select(col("a").as("start"), col("b").as("cur"))
    val hop2 = hop1.join(s, hop1("cur") === s("a")).select(col("start"), col("b").as("cur"))
    val hop3 = hop2.join(s, hop2("cur") === s("a")).select(col("start"), col("b").as("cur"))
    val spawned = hop1.union(hop2).union(hop3).distinct()
    val cf = edges.filter(col("etype") === "CREATED_FILE")
      .select(col("src").as("m"), col("dst").as("f"))
    val expected = spawned.join(cf, spawned("cur") === cf("m"))
      .select(col("start"), col("f").as("cur")).distinct()
    assert(got.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      expected.collect().map(r => (r.getString(0), r.getString(1))).toSet)
    assert(got.count() > 0)
  }
}
