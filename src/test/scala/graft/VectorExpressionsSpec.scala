package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkSpec {

  test("native cosine_sim is bit-identical to the HOF formulation") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.alias("a").join(e.alias("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.v").as("v1"), col("b.v").as("v2"))
    val diff = pairs
      .withColumn("hof", Similarity.cosine(col("v1"), col("v2")))
      .withColumn("native", VectorFunctions.cosine_sim(spark, col("v1"), col("v2")))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0)
  }

  test("cosine_sim handles orthogonal, parallel and opposite vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 2.0), Array(2.0, 4.0), 1.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0)
    ).toDF("a", "b", "expected")
    val bad = df.withColumn("got", VectorFunctions.cosine_sim(spark, col("a"), col("b")))
      .filter(abs(col("got") - col("expected")) > 1e-12).count()
    assert(bad == 0)
  }

  test("cosine_sim yields null on null elements, matching the HOF semantics") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](null, 2.0)),
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
    // interpreted path
    val got = df.select(VectorFunctions.cosine_sim(spark, col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty && got(1).isEmpty && got(2).exists(v => math.abs(v - 1.0) < 1e-12))
    // HOF twin agrees on the null-element rows
    val hof = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.isNullAt(0))
    assert(hof(0) && hof(1) && !hof(2))
  }

  test("knnGraph: planted clusters find each other, k respected, deterministic") {
    import spark.implicits._
    // two tight clusters around orthogonal axes + their jittered copies
    def jit(base: Seq[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => x + eps * (i % 3 - 1) / 100.0 }
    val axis1 = Seq.fill(8)(0.0).updated(0, 1.0)
    val axis2 = Seq.fill(8)(0.0).updated(4, 1.0)
    val vecs = (0 until 6).map(i => (s"a$i", jit(axis1, i + 1))) ++
      (0 until 6).map(i => (s"b$i", jit(axis2, i + 1)))
    val df = vecs.toDF("id", "v")
    val out = Similarity.knnGraph(df, k = 3, nbits = 2, ntables = 6)
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // k respected per source id
    assert(got.groupBy(_._1).values.forall(_.size <= 3) && got.nonEmpty)
    // neighbors stay within the planted cluster (cosine across
    // clusters ~0, within ~1)
    assert(got.forall { case (a, b, _) => a.head == b.head })
    // every id found its cluster mates (recall on the planted corpus)
    assert(got.map(_._1).distinct.size == 12)
    // deterministic rerun
    val again = Similarity.knnGraph(df, k = 3, nbits = 2, ntables = 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(got.sorted == again.sorted)
    // no self-pairs
    assert(got.forall { case (a, b, _) => a != b })
  }

  test("knnGraph DEFAULT parameters sit at the measured operating point " +
       "(recall >= the e6 gate floor vs exact top-k)") {
    import spark.implicits._
    // r12: the direct-API defaults used to be the recall-0.2 config
    // (6 bits x 8 tables) while CALL graft.knn overrode to the
    // measured-good 3x16; this pins API defaults == CALL defaults ==
    // a recall above the e_recall gate's 0.6 e6 floor. Corpus: real
    // embeddings subset (the same space the 0.96 was measured on).
    val k = 3
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val approx = Similarity.knnGraph(vecs, k = k) // defaults: nbits/ntables
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val local = vecs.collect()
      .map(r => (r.get(0).toString, r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = local.flatMap { case (id, v) =>
      local.filter(_._1 != id).map { case (id2, v2) => (id, id2, cos(v, v2)) }
        .sortBy(-_._3).take(k).map(t => (t._1, t._2))
    }.toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.6, s"default-parameter knnGraph recall $recall < 0.6 floor")
  }

  test("kmeans: planted clusters separate, Lloyd refines, deterministic (r12)") {
    import spark.implicits._
    def jit(base: Seq[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => x + eps * (i % 3 - 1) / 50.0 }
    val axis1 = Seq.fill(6)(0.0).updated(0, 1.0)
    val axis2 = Seq.fill(6)(0.0).updated(3, 1.0)
    val vecs = ((0 until 8).map(i => (s"a$i", jit(axis1, i + 1))) ++
      (0 until 8).map(i => (s"b$i", jit(axis2, i + 1)))).toDF("id", "v")
    val out = Similarity.kmeans(vecs, k = 2, iters = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // the two planted clusters land in two distinct k-means clusters
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet ==
      Set((0 until 8).map(i => s"a$i").toSet, (0 until 8).map(i => s"b$i").toSet))
    // sims near 1 within tight clusters; deterministic rerun
    assert(out.forall(_._3 > 0.9))
    val again = Similarity.kmeans(vecs, k = 2, iters = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // the e7 gate terms hold on the real embeddings at spec scale
    val (ini, fin, nc) = Similarity.e7Quality(spark, sf)
    assert(fin >= ini - 1e-9, s"Lloyd degraded mean cosine: $ini -> $fin")
    assert(nc == 8L, s"expected 8 non-empty clusters, got $nc")
  }

  test("cosine_sim is codegen'd (appears inside WholeStageCodegen)") {
    val e = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
    val q = e.select(VectorFunctions.cosine_sim(spark, col("v"), col("v")).as("c"))
    // '*(n)' marks operators inside a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("cosinesimilarity")), plan)
  }
}
