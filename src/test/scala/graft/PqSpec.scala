package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** E8 — product quantization: compression contract (m tinyint codes
  * per vector, codebook bounded by ksub·D doubles), determinism,
  * duplicate-preservation, and the IVF-PQ + exact-refine gate shape.
  * The recall floor itself is the per-round `e_recall` e8 term. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** 24 deterministic 8-dim unit-ish vectors: 3 planted groups around
    * orthogonal anchors plus small per-id jitter, and ids 20/21 are
    * EXACT duplicates of ids 0/1. */
  private lazy val vectors = {
    val rows = (0 until 24).map { i =>
      val base = i % 3
      val src = if (i >= 20 && i < 22) i - 20 else i
      val v = (0 until 8).map { d =>
        val anchor = if (d / 3 == (if (src >= 20) src - 20 else src) % 3) 1.0 else 0.0
        val jitter = ((src * 31 + d * 17) % 7 - 3) * 0.02
        anchor + jitter
      }
      (i.toLong, v)
    }
    // ids 20..21 duplicate 0..1 exactly
    val fixed = rows.map { case (i, v) =>
      if (i >= 20 && i < 22) (i, rows(i.toInt - 20)._2) else (i, v)
    }
    fixed.toDF("id", "v0")
      .select(col("id"), col("v0").cast("array<double>").as("v"))
  }

  test("pqTrain/pqCodes: codebook + code shape, determinism, exact " +
      "duplicates share codes, compression ratio (r16)") {
    val m = 4; val ksub = 4
    val cb = Similarity.pqTrain(vectors, m, ksub)
    assert(cb.length == m * ksub)
    assert(cb.forall(_._3.length == 2)) // 8 dims / 4 subspaces
    // deterministic rerun, bitwise
    val cb2 = Similarity.pqTrain(vectors, m, ksub)
    assert(cb2.toSeq == cb.toSeq)
    val codes = Similarity.pqCodes(vectors, cb, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(codes.size == 24)
    assert(codes.values.forall(_.length == m), "m codes per vector")
    // compression: 8 doubles (64 bytes) -> 4 tinyint (4 bytes) = 16x
    val rawBytes = 8 * 8; val codeBytes = m
    assert(rawBytes / codeBytes == 16)
    // exact duplicates land on identical codes
    assert(codes(20L) == codes(0L) && codes(21L) == codes(1L))
    // codes address the declared codebook
    assert(codes.values.flatten.forall(c => c >= 0 && c < ksub))
  }

  test("pqCodes pick the NEAREST sub-centroid (reconstruction beats " +
      "any other code choice)") {
    val m = 4; val ksub = 4
    val cb = Similarity.pqTrain(vectors, m, ksub)
    val cbMap = cb.map { case (s, c, cv) => (s, c) -> cv }.toMap
    val codes = Similarity.pqCodes(vectors, cb, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val vecs = vectors.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def sq(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for ((id, v) <- vecs; sub <- 0 until m) {
      val sv = v.slice(sub * 2, sub * 2 + 2)
      val chosen = sq(sv, cbMap((sub, codes(id)(sub).toInt)))
      val best = (0 until ksub).map(c => sq(sv, cbMap((sub, c)))).min
      assert(chosen <= best + 1e-12, s"id=$id sub=$sub not nearest")
    }
  }

  test("e8PqIvf: k rows per query, valid neighbors, exact-refine " +
      "scores, deterministic rerun (r16)") {
    val out = Similarity.e8PqIvf(spark, sf).collect()
    val qs = out.map(_.getLong(0)).distinct.sorted
    assert(qs.sameElements(0L until 8L))
    qs.foreach { q =>
      val rows = out.filter(_.getLong(0) == q)
      assert(rows.length == 5)
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 5))
      assert(rows.forall(_.getLong(2) != q), "self excluded")
    }
    // cos_sim is the EXACT cosine (refine step), so it must match a
    // direct recomputation for every returned pair
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cosL(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { r =>
      val expect = math.floor(cosL(all(r.getLong(0)), all(r.getLong(2))) * 10000 + 0.5) / 10000
      assert(math.abs(r.getDouble(3) - expect) < 5e-4,
        s"refined score must be the exact cosine: ${r.getDouble(3)} vs $expect")
    }
    val out2 = Similarity.e8PqIvf(spark, sf).collect()
    assert(out2.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }
}
