package graft

import org.apache.spark.sql.functions._

import graft.graph.{CypherWrite, GraphStore, TestGraph}

class GraphStoreSpec extends SparkSpec {

  test("A6/I4 bucketed store: reload round-trips and 2-hop join plans without shuffle") {
    val edges = TestGraph.hierarchyEdges(spark, sf)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .withColumn("label", lit("v"))
    GraphStore.save(nodes, edges, "tg", buckets = 4)
    val back = GraphStore.edges(spark, "tg")
    assert(back.count() == edges.count())
    // at scale a fact-fact join can't broadcast — force SMJ to prove
    // the bucket layout removes the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = GraphStore.twoHop(spark, "tg").queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"2-hop join should be shuffle-free:\n$plan")
      val nHops = GraphStore.twoHop(spark, "tg").count()
      // region->nation->customer + nation->customer->order paths
      val expected = edges.alias("a").join(edges.alias("b"),
        col("a.dst") === col("b.src")).count()
      assert(nHops == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("textual querying over the persisted store: MATCH and CALL without a rebuild") {
    import spark.implicits._
    val nodes = Seq(("a", "Process"), ("b", "Process"), ("c", "Process"))
      .toDF("id", "label").withColumn("props", map(lit("k"), col("id")))
    val edges = Seq(("a", "b", "SPAWNS"), ("b", "c", "SPAWNS"))
      .toDF("src", "dst", "etype").withColumn("props", map())
      .withColumn("event_id", lit(1))
    GraphStore.save(nodes, edges, "qg", buckets = 2)
    // plain Cypher read with a $param over the stored graph
    val got = GraphStore.query(spark, "qg",
      "MATCH (p:Process)-[:SPAWNS]->(q) WHERE p.k = $k RETURN p, q", Map("k" -> "a"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a", "b")))
    // CALL procedure over the same stored frames
    val deg = GraphStore.query(spark, "qg",
      "CALL graft.degree YIELD id, degree ORDER BY id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(deg.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 1L)))
  }

  test("GraphStore.update: write and read→write statements persist back (r12)") {
    import spark.implicits._
    val nodes = Seq(("a", "Process", "powershell.exe"), ("b", "Process", "cmd.exe"),
        ("c", "Process", "powershell_ise.exe"))
      .toDF("id", "label", "img")
      .withColumn("props", map(lit("image"), col("img"))).drop("img")
      .select(col("label"), col("id"), col("props"))
    val edges = Seq(("a", "b", "SPAWNS"), ("b", "c", "SPAWNS"))
      .toDF("src", "dst", "etype").withColumn("props", map())
      .withColumn("event_id", lit(1))
    GraphStore.save(nodes, edges, "ug", buckets = 2)
    // the triage statement (WHERE-gated SET) against the stored graph;
    // ENDS WITH in the predicate must NOT route it to runComposed
    assert(!CypherWrite.isComposed(
      "MATCH (p:Process) WHERE p.image ENDS WITH '.exe' SET p.exe = '1'"))
    GraphStore.update(spark, "ug",
      "MATCH (p:Process) WHERE p.image CONTAINS 'powershell' SET p.flag = '1'")
    val flagged = GraphStore.query(spark, "ug",
      "MATCH (p:Process) WHERE p.flag = '1' RETURN p ORDER BY p")
      .collect().map(_.getString(0))
    assert(flagged.toSeq == Seq("a", "c"))
    // read→write composition persists too (spawn counts written back)
    assert(CypherWrite.isComposed(
      """MATCH (p:Process)-[:SPAWNS]->(q:Process)
        |WITH p AS pid, count(*) AS n
        |MATCH (v:Process {id: pid}) SET v.kids = n""".stripMargin))
    GraphStore.update(spark, "ug",
      """MATCH (p:Process)-[:SPAWNS]->(q:Process)
        |WITH p AS pid, count(*) AS n
        |MATCH (v:Process {id: pid}) SET v.kids = n""".stripMargin)
    val kids = GraphStore.query(spark, "ug",
      "MATCH (p:Process) WHERE p.kids >= 1 RETURN p, p.kids AS kids ORDER BY p")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(kids.toSeq == Seq(("a", "1"), ("b", "1")))
    // composed statements refuse a params map loudly
    intercept[IllegalArgumentException](GraphStore.update(spark, "ug",
      "MATCH (p:Process) WITH p AS x MATCH (v:Process {id: x}) SET v.y = '1'",
      Map("k" -> "v")))
  }

  test("assertUnique: holds on MERGE-built graphs, catches dup ids and key/id drift") {
    import spark.implicits._
    import graft.graph.GraphStore
    // by-construction graphs pass (the corpus graph is groupBy-MERGEd)
    val (n, _) = graft.graph.SysmonGraph.buildCached(spark, "/root/reference/malware/*.json")
    assert(GraphStore.assertUnique(n, "Process", prop = Some("key")).count() == 0)
    assert(GraphStore.assertUnique(n, "File").count() == 0)
    // a duplicated id within a label is caught, other labels unaffected
    val dup = Seq(("P", "x", Map("key" -> "x")), ("P", "x", Map("key" -> "x")),
      ("Q", "x", Map.empty[String, String]))
      .toDF("label", "id", "props")
    val err = intercept[IllegalArgumentException] {
      GraphStore.assertUnique(dup, "P")
    }
    assert(err.getMessage.contains("uniqueness violated"))
    assert(GraphStore.assertUnique(dup, "P", strict = false).count() == 1)
    assert(GraphStore.assertUnique(dup, "Q").count() == 0)
    // a props key entry disagreeing with the id is caught when named
    val drift = Seq(("P", "x", Map("key" -> "y"))).toDF("label", "id", "props")
    assert(GraphStore.assertUnique(drift, "P", strict = false).count() == 0)
    assert(GraphStore.assertUnique(drift, "P", prop = Some("key"),
      strict = false).count() == 1)
  }

  test("I1/I3 source round-trips: partitioned parquet, csv, jsonl") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("io").toString
    val df = Tables.documents(spark, sf).limit(100)

    df.write.partitionBy("lang").parquet(s"$base/p")
    assert(spark.read.parquet(s"$base/p").count() == 100)
    // partition pruning: only one lang dir scanned
    val pruned = spark.read.parquet(s"$base/p").filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == df.filter(col("lang") === "en").count())

    df.select(col("doc_id"), col("lang"), col("n_chars"))
      .write.option("header", "true").csv(s"$base/c")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/c")
    assert(csv.count() == 100)
    assert(csv.agg(sum("n_chars")).collect().head.getLong(0) ==
      df.agg(sum("n_chars")).collect().head.getLong(0))

    df.write.json(s"$base/j")
    assert(spark.read.json(s"$base/j").count() == 100)

    // ORC with predicate pushdown intact
    df.write.orc(s"$base/o")
    val orc = spark.read.orc(s"$base/o").filter(col("n_chars") > 200)
    assert(orc.count() == df.filter(col("n_chars") > 200).count())
    assert(orc.queryExecution.executedPlan.toString.contains("PushedFilters"), "orc pushdown")
  }
}
