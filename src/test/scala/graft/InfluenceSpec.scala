package graft

import org.apache.spark.sql.functions._

import graft.graph.{CypherCall, GraphOps, Influence, MaxKCut}

/** B47 influence maximization (RIS greedy) + B48 approx max-k-cut
  * (gated local search): structural fixtures, determinism, and CALL
  * dispatch. */
class InfluenceSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  test("influenceMaximization: hubs dominate planted stars; monotone " +
      "spread; bit-exact rerun; padding past coverage") {
    // two stars: hub h1 with 12 leaves, hub h2 with 6 — the two hubs
    // must be the first two seeds, larger first
    val star1 = (1 to 12).map(i => "h1" -> f"l$i%02d")
    val star2 = (1 to 6).map(i => "h2" -> f"m$i%02d")
    val e = GraphOps.undirected(edgeDf((star1 ++ star2): _*))
    val out = Influence.influenceMaximization(e, seedSetSize = 3,
        monteCarloSimulations = 200, propagationProbability = 0.2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(out.length == 3)
    assert(out(0)._2 == "h1", s"largest hub first, got ${out.toSeq}")
    assert(out(1)._2 == "h2", s"second hub next, got ${out.toSeq}")
    // spread is monotone non-decreasing and bounded by |V|
    assert(out.sliding(2).forall(p => p(1)._3 >= p(0)._3))
    assert(out.forall(_._3 <= 20.0))
    // bit-exact rerun (hash draws + integer counts end to end)
    val again = Influence.influenceMaximization(e, seedSetSize = 3,
        monteCarloSimulations = 200, propagationProbability = 0.2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(again.toSeq == out.toSeq)
    // k beyond what greedy can cover pads with smallest unpicked ids
    // at flat spread: ONE simulation with p = 0 has a single singleton
    // RR set — after the first pick everything is covered
    val tiny = GraphOps.undirected(edgeDf("a" -> "b", "b" -> "c"))
    val padded = Influence.influenceMaximization(tiny, seedSetSize = 2,
        monteCarloSimulations = 1, propagationProbability = 0.0)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(padded.length == 2 && padded.map(_._1).distinct.length == 2)
    assert(padded(0)._2 == padded(1)._2, "flat spread once sims are covered")
  }

  test("influenceMaximization CALL: GDS proc name, seedSetSize required") {
    val pairs = (1 to 5).map(i => "hub" -> s"x$i")
    val nodes = ("hub" +: (1 to 5).map(i => s"x$i")).toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val eg = GraphOps.undirected(edgeDf(pairs: _*))
      .withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val out = CypherCall.run(nodes, eg,
      "CALL graft.influenceMaximization.celf({seedSetSize: 2, " +
        "monteCarloSimulations: 100, propagationProbability: 0.3}) " +
        "YIELD rank, id, spread RETURN rank, id, spread ORDER BY rank")
      .collect()
    assert(out.length == 2 && out(0).getString(1) == "hub")
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, eg,
        "CALL graft.influenceMaximization.celf({}) YIELD id RETURN id")
    }
    assert(err.getMessage.contains("seedSetSize"))
  }

  test("maxKCut: K3,3 reaches the full bipartition cut; triangle at k=3 " +
      "separates; weighted path cuts both edges; monotone vs init") {
    // complete bipartite K3,3 at k=2: the max cut IS the bipartition
    val k33 = for { a <- Seq("u1", "u2", "u3"); b <- Seq("v1", "v2", "v3") }
      yield (a, b)
    val e33 = edgeDf(k33: _*)
    val cut = MaxKCut.maxKCut(e33, k = 2, iterations = 12)
    assert(MaxKCut.cutWeight(e33, cut) == 9.0,
      "local search must find the full K3,3 bipartition")
    val m = cut.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(Set("u1", "u2", "u3").map(m) != Set("v1", "v2", "v3").map(m) ||
      (Seq("u1", "u2", "u3").map(m).distinct.length == 1 &&
        Seq("v1", "v2", "v3").map(m).distinct.length == 1))
    // triangle at k=3: all three vertices in different communities
    val tri = edgeDf("a" -> "b", "b" -> "c", "c" -> "a")
    val triCut = MaxKCut.maxKCut(tri, k = 3, iterations = 12)
    assert(MaxKCut.cutWeight(tri, triCut) == 3.0)
    assert(triCut.collect().map(_.getInt(1)).distinct.length == 3)
    // weighted path a-10-b-1-c: both edges cut (b alone on one side)
    val wp = Seq(("a", "b", 10.0), ("b", "c", 1.0)).toDF("src", "dst", "w")
    val wCut = MaxKCut.maxKCut(wp, k = 2, iterations = 12,
      weightCol = Some("w"))
    assert(MaxKCut.cutWeight(wp, wCut, Some("w")) == 11.0)
    // monotone: the searched cut never loses to its own hash init
    val init33 = MaxKCut.maxKCut(e33, k = 2, iterations = 0)
    assert(MaxKCut.cutWeight(e33, cut) >= MaxKCut.cutWeight(e33, init33))
    // determinism + self-loop-only vertex keeps its row
    val loopy = edgeDf("a" -> "b", "solo" -> "solo")
    val l1 = MaxKCut.maxKCut(loopy, k = 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(l1.keySet == Set("a", "b", "solo"))
    val l2 = MaxKCut.maxKCut(loopy, k = 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(l2 == l1)
  }

  test("maxKCut CALL: k + relationshipWeightProperty dispatch") {
    val nodes = Seq("a", "b", "c").toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val eg = edgeDf("a" -> "b", "b" -> "c", "c" -> "a")
      .withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", map(lit("weight"), lit("2")))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val out = CypherCall.run(nodes, eg,
      "CALL graft.maxkcut({k: 3, relationshipWeightProperty: 'weight'}) " +
        "YIELD id, communityId RETURN id, communityId ORDER BY id")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(out.length == 3 && out.map(_._2).distinct.length == 3)
  }
}
