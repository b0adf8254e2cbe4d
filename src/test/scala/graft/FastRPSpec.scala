package graft

import org.apache.spark.sql.functions._

import graft.graph.FastRP

class FastRPSpec extends SparkSpec {
  import spark.implicits._

  private def clique(ids: Seq[String]): Seq[(String, String)] =
    for (i <- ids.indices; j <- i + 1 until ids.size) yield ids(i) -> ids(j)

  private val left = Seq("a", "b", "c", "d")
  private val right = Seq("e", "f", "g", "h")
  private lazy val twoCliques =
    (clique(left) ++ clique(right) :+ ("d" -> "e")).toDF("src", "dst")

  test("local finisher ≡ distributed path (same hash, float-noise only)") {
    val rnd = new scala.util.Random(19)
    val noisy = (0 until 150).map { _ =>
      f"w${rnd.nextInt(35)}%02d" -> f"w${rnd.nextInt(35)}%02d"
    }.filter(p => p._1 != p._2).toDF("src", "dst")
    val nodesOpt = Some((Seq("w00", "offgrid")).toDF("id"))
    for (edges <- Seq(twoCliques, noisy)) {
      val loc = FastRP.embed(edges, dim = 12, nodes = nodesOpt)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val dist = FastRP.embed(edges, dim = 12, nodes = nodesOpt,
          localFinishEdges = 0L)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(loc.keySet == dist.keySet)
      loc.foreach { case (id, v) =>
        val dv = dist(id)
        v.zip(dv).foreach { case (x, y) =>
          assert(math.abs(x - y) < 1e-9, s"$id drift ${math.abs(x - y)}")
        }
      }
    }
  }

  test("every vertex gets a unit-norm vector of the requested width") {
    val emb = FastRP.embed(twoCliques, dim = 16).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(emb.keySet == (left ++ right).toSet)
    emb.values.foreach { v =>
      assert(v.length == 16)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"norm $n")
    }
  }

  test("isolated vertices from a nodes frame keep their normalized base vector") {
    val nodes = Some((left ++ right ++ Seq("lonely", "alone")).toDF("id"))
    val emb = FastRP.embed(twoCliques, dim = 16, nodes = nodes).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(emb.keySet == (left ++ right ++ Seq("lonely", "alone")).toSet)
    // the isolated vectors are unit-norm and equal to the embedding of
    // the same id with the same seed in a second run (pure base hash)
    Seq("lonely", "alone").foreach { id =>
      val n = math.sqrt(emb(id).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"norm $n for $id")
    }
    // connected vertices are unaffected by the extra nodes
    val plain = FastRP.embed(twoCliques, dim = 16).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    (left ++ right).foreach { id =>
      emb(id).zip(plain(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-12) }
    }
  }

  test("community structure: intra-clique cosine beats inter-clique") {
    val emb = FastRP.embed(twoCliques, dim = 32).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // compare interiors (the bridge endpoints d/e mix both hoods)
    def pairs(ids: Seq[String]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val intraL = pairs(Seq("a", "b", "c")).map { case (x, y) => cos(emb(x), emb(y)) }
    val intraR = pairs(Seq("f", "g", "h")).map { case (x, y) => cos(emb(x), emb(y)) }
    val inter = for (x <- Seq("a", "b", "c"); y <- Seq("f", "g", "h"))
      yield cos(emb(x), emb(y))
    val intraAvg = (intraL ++ intraR).sum / (intraL.size + intraR.size)
    val interAvg = inter.sum / inter.size
    assert(intraAvg > interAvg + 0.1,
      s"intra $intraAvg must clearly beat inter $interAvg")
  }

  test("deterministic: same seed reproduces identical vectors; seed changes them") {
    val e1 = FastRP.embed(twoCliques, dim = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val e2 = FastRP.embed(twoCliques, dim = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // same partitioning + same hash-derived projection → same sums
    e1.foreach { case (id, v) =>
      v.zip(e2(id)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
    }
    val e3 = FastRP.embed(twoCliques, dim = 8, seed = 7L).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(e1.exists { case (id, v) =>
      v.zip(e3(id)).exists { case (x, y) => math.abs(x - y) > 1e-6 } })
  }

  test("non-string ids and directed input are normalized like the other operators") {
    val ei = Seq((1, 2), (2, 3), (3, 1)).toDF("src", "dst") // directed triangle
    val emb = FastRP.embed(ei, dim = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(emb.keySet == Set("1", "2", "3"))
  }
}
