package graft

import org.apache.spark.sql.functions._

import graft.graph.{CypherCall, GraphOps, Sllpa}

/** B42 — SLLPA overlapping communities: hand-replayable single-round
  * dynamics, structural invariants (labels live in the vertex's own
  * connected component; every vertex belongs somewhere), threshold
  * monotonicity, determinism, and CALL dispatch incl. the alpha-tier
  * prefix strip. */
class SllpaSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  private def memberships(df: org.apache.spark.sql.DataFrame): Map[String, Set[String]] =
    df.collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("one round on a path is hand-replayable") {
    // a—b—c, t=1: every memory is {self}, so speakers always speak
    // their own id. b hears {a, c} (tie → min = a); a hears {b};
    // c hears {b}. Memories: a{a,b} b{a,b} c{b,c}. With
    // minAssociationStrength 0.2 the floor is ceil(0.2·2)=1 — every
    // label survives.
    val m = memberships(Sllpa.run(edgeDf("a" -> "b", "b" -> "c"),
      maxIterations = 1, minAssociationStrength = 0.2))
    assert(m == Map("a" -> Set("a", "b"), "b" -> Set("a", "b"),
      "c" -> Set("b", "c")))
    // floor 1.0 → ceil(1.0·2)=2: only labels heard twice... none is —
    // every vertex falls back to its single strongest label
    val strict = memberships(Sllpa.run(edgeDf("a" -> "b", "b" -> "c"),
      maxIterations = 1, minAssociationStrength = 1.0))
    assert(strict.forall(_._2.size == 1))
    assert(strict("b") == Set("a")) // (max count, min label) over {a:1, b:1}
  }

  test("self-loop-only vertices stay in the output with their own label (r15)") {
    // `solo` has only a self-loop, `x` has a self-loop AND a real edge:
    // solo must still appear (own community — the k1Coloring r13
    // precedent), x participates normally
    val e = edgeDf("a" -> "b", "x" -> "x", "x" -> "a", "solo" -> "solo")
    val m = memberships(Sllpa.run(e, maxIterations = 3))
    assert(m.contains("solo") && m("solo") == Set("solo"))
    assert(m.keySet == Set("a", "b", "x", "solo"))
    // all-self-loop graph: every vertex its own community
    val all = memberships(Sllpa.run(edgeDf("p" -> "p", "q" -> "q")))
    assert(all == Map("p" -> Set("p"), "q" -> Set("q")))
  }

  test("structural invariants + determinism on cliques sharing a vertex") {
    // two 5-cliques sharing m: labels never leave the component (it is
    // one component here, but labels must still be REAL vertex ids),
    // every vertex gets >= 1 community, rerun is bit-identical
    def clique(p: String, ids: Seq[String]) =
      for (i <- ids.indices; j <- (i + 1) until ids.size)
        yield (p + ids(i)) -> (p + ids(j))
    // m is wired into both cliques fully
    val edges = (clique("a", Seq("1", "2", "3", "4")) ++
      clique("b", Seq("1", "2", "3", "4")) ++
      Seq("a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4").map("m" -> _))
    val out = Sllpa.run(edgeDf(edges: _*), maxIterations = 8,
      minAssociationStrength = 0.15)
    val m1 = memberships(out)
    val verts = (edges.map(_._1) ++ edges.map(_._2)).toSet
    assert(m1.keySet == verts, "every vertex belongs somewhere")
    assert(m1.values.flatten.toSet.subsetOf(verts), "labels are vertex ids")
    val again = memberships(Sllpa.run(edgeDf(edges: _*), maxIterations = 8,
      minAssociationStrength = 0.15))
    assert(again == m1, "bit-identical rerun")
    // threshold monotonicity: a higher floor can only shrink the
    // above-floor memberships; the fallback keeps everyone covered
    val tight = memberships(Sllpa.run(edgeDf(edges: _*), maxIterations = 8,
      minAssociationStrength = 0.5))
    assert(tight.keySet == verts)
    tight.foreach { case (v, cs) =>
      assert(cs.subsetOf(m1(v)) || cs.size == 1,
        s"$v: tightened set $cs not within ${m1(v)}")
    }
  }

  test("disconnected components never share labels") {
    val e = edgeDf("a" -> "b", "b" -> "c", "c" -> "a",
      "x" -> "y", "y" -> "z", "z" -> "x")
    val m = memberships(Sllpa.run(e, maxIterations = 6))
    val left = Set("a", "b", "c"); val right = Set("x", "y", "z")
    left.foreach(v => assert(m(v).subsetOf(left)))
    right.foreach(v => assert(m(v).subsetOf(right)))
    // loud contracts
    intercept[IllegalArgumentException](Sllpa.run(e, maxIterations = 0))
    intercept[IllegalArgumentException](
      Sllpa.run(e, minAssociationStrength = 0.0))
    // empty input: empty output, right schema
    val empty = Sllpa.run(edgeDf())
    assert(empty.columns.toSeq == Seq("id", "communityId") && empty.isEmpty)
  }

  test("CALL graft.sllpa dispatches; alpha-tier prefix strips (r14)") {
    val nodes = Seq(("a", "P"), ("b", "P"), ("c", "P")).toDF("id", "label")
      .withColumn("props", map(lit("k"), col("id")))
    val edges = Seq(("a", "b", "T"), ("b", "c", "T"))
      .toDF("src", "dst", "etype")
      .withColumn("props", map(lit("w"), lit("1")))
    val direct = Sllpa.run(edges.select(col("src"), col("dst")),
      maxIterations = 2, minAssociationStrength = 0.2)
      .orderBy(col("id"), col("communityId"))
      .collect().map(_.toSeq).toSeq
    Seq("graft.sllpa", "graft.alpha.sllpa", "graft.alpha.sllpa.stream")
      .foreach { name =>
        val got = CypherCall.run(nodes, edges,
          s"CALL $name({maxIterations: 2}) YIELD id, communityId " +
            "RETURN id, communityId ORDER BY id, communityId")
          .collect().map(_.toSeq).toSeq
        assert(got == direct, s"$name diverges from the direct API")
      }
    // beta. strips too (other procs): beta.kCore ≡ kCore
    val kc = CypherCall.run(nodes, edges,
      "CALL graft.beta.kCore({k: 1}) YIELD id RETURN id ORDER BY id")
    assert(kc.count() == 3)
  }
}
