package graft

import org.apache.spark.sql.functions._

import graft.graph.{CypherCall, Node2Vec}

/** B45 — node2vec SGNS embeddings: community structure must separate
  * in cosine space (two cliques joined by one bridge), training must
  * actually move vectors (epoch-0 vs trained homophily), coverage and
  * shape invariants hold, reruns agree within float-sum tolerance, and
  * the CALL proc dispatches with GDS config spellings. */
class Node2VecSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  /** Two K5s (a0..a4, b0..b4) joined by a single bridge a0–b0. */
  private lazy val cliques: Seq[(String, String)] = {
    val a = for { i <- 0 until 5; j <- (i + 1) until 5 } yield (s"a$i", s"a$j")
    val b = for { i <- 0 until 5; j <- (i + 1) until 5 } yield (s"b$i", s"b$j")
    a ++ b ++ Seq("a0" -> "b0")
  }

  private def cos(x: Seq[Double], y: Seq[Double]): Double = {
    val d = x.zip(y).map { case (p, q) => p * q }.sum
    val nx = math.sqrt(x.map(v => v * v).sum)
    val ny = math.sqrt(y.map(v => v * v).sum)
    d / (nx * ny)
  }

  test("planted cliques separate: intra-clique cosine beats cross-clique") {
    val emb = Node2Vec.embeddings(edgeDf(cliques: _*), dim = 16,
        walksPerNode = 6, walkLength = 6, windowSize = 3, iterations = 8,
        learningRate = 0.1)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(emb.keySet == (0 until 5).flatMap(i => Seq(s"a$i", s"b$i")).toSet)
    assert(emb.values.forall(_.length == 16))
    val as = (0 until 5).map(i => s"a$i")
    val bs = (0 until 5).map(i => s"b$i")
    def meanCos(pairs: Seq[(String, String)]) =
      pairs.map { case (x, y) => cos(emb(x), emb(y)) }.sum / pairs.length
    val intra = meanCos(
      (for { i <- 0 until 5; j <- (i + 1) until 5 } yield (as(i), as(j))) ++
      (for { i <- 0 until 5; j <- (i + 1) until 5 } yield (bs(i), bs(j))))
    val cross = meanCos(for { x <- as; y <- bs } yield (x, y))
    assert(intra > cross + 0.05,
      s"intra-clique $intra must separate from cross-clique $cross")
  }

  test("rerun agrees within float tolerance; training moves vectors") {
    val e = edgeDf(cliques: _*)
    def run(iters: Int) = Node2Vec.embeddings(e, dim = 8, walksPerNode = 4,
        walkLength = 5, windowSize = 2, iterations = iters)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val r1 = run(4)
    val r2 = run(4)
    assert(r1.keySet == r2.keySet)
    r1.keys.foreach { k =>
      assert(cos(r1(k), r2(k)) > 1.0 - 1e-9, s"rerun drift at $k")
    }
    // gradients actually apply: a trained vector differs from init
    val r0Like = run(1)
    assert(r1.keys.exists(k => cos(r1(k), r0Like(k)) < 1.0 - 1e-6),
      "more epochs must move at least one vector")
  }

  test("CALL graft.node2vec dispatches with GDS config; yields vectors") {
    val nodes = cliques.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      .withColumn("label", lit("V"))
      .withColumn("props", map(lit("k"), col("id")))
    val eg = edgeDf(cliques: _*)
      .withColumn("etype", lit("T")).withColumn("event_id", lit(1))
      .withColumn("props", typedLit(Map.empty[String, String]))
      .select(col("etype"), col("src"), col("dst"), col("event_id"), col("props"))
    val out = CypherCall.run(nodes, eg,
      "CALL graft.node2vec({embeddingDimension: 8, walksPerNode: 2, " +
        "walkLength: 4, iterations: 2}) YIELD id, embedding " +
        "RETURN id, embedding ORDER BY id")
      .collect()
    assert(out.length == 10)
    assert(out.forall(_.getSeq[Double](1).length == 8))
    // unknown key stays loud
    val err = intercept[IllegalArgumentException] {
      CypherCall.run(nodes, eg, "CALL graft.node2vec({embedingDim: 8}) YIELD id")
    }
    assert(err.getMessage.contains("unknown config key"))
  }

  test("empty graph: empty output, correct schema") {
    val out = Node2Vec.embeddings(edgeDf(), iterations = 1)
    assert(out.columns.toSeq == Seq("id", "embedding") && out.isEmpty)
  }

  test("negativeSamples = 0: attraction-only training (r16 advice fix — " +
      "sequence(1, 0) must not emit phantom negative draws)") {
    // single edge: the ONLY pairs are the positive (x,y)/(y,x); with
    // zero negatives every epoch's coefficient is (σ(u·v)−1)·w ≤ 0,
    // so u_x·v_y strictly increases with epochs — a structural
    // invariant phantom hash-drawn negatives have no right to share
    val e = edgeDf("x" -> "y")
    def dot(iters: Int): Double = {
      val m = Node2Vec.embeddings(e, dim = 8, walksPerNode = 4,
          walkLength = 4, windowSize = 2, iterations = iters,
          learningRate = 0.1, negativeSamples = 0)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(m.keySet == Set("x", "y"))
      m("x").zip(m("y")).map { case (a, b) => a * b }.sum
    }
    val d1 = dot(1); val d4 = dot(4); val d8 = dot(8)
    assert(d1 < d4 && d4 < d8,
      s"attraction-only dots must increase monotonically: $d1, $d4, $d8")
  }
}
