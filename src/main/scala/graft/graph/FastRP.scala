package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** B23 — FastRP node embeddings (Chen et al. 2019, the GDS-catalog
  * staple): iterated degree-normalized neighbor averaging over a
  * sparse random projection, producing one dense vector per node.
  * Closes the graph→embedding→ANN loop: the output column feeds the
  * E-suite (brute-force / LSH / IVF cosine search) directly.
  *
  * Algorithm: each node starts from a deterministic sparse random
  * vector r_i with entries in {−√s, 0, +√s} (P[±√s] = 1/2s — the
  * Achlioptas/very-sparse projection); iteration k replaces every
  * vector with its neighbors' sum, L2-normalized (the paper's
  * degree-normalizing division is a per-id scalar scale, absorbed by
  * the normalization); the final embedding is the weighted sum
  * Σ_k w_k·e^(k), L2-normalized again.
  *
  * Scale shape: vectors live as EXPLODED (id, pos, val) scalar rows
  * through the whole iteration — every aggregation buffer is one
  * double (the same rule that keeps E3's Lloyd step OOM-free; a
  * collect_list-of-arrays would hold a neighborhood of vectors in one
  * buffer). Per iteration: one equi-join of the d-exploded state
  * against the edge list, one (id, pos) sum, one (id) norm
  * aggregation — shuffle-bounded, never per-node. Row amplification
  * is d× the edge list; d is the knob (GDS defaults 128-256; pick to
  * executor budget). Randomness is xxhash64-derived from (id, pos) —
  * deterministic across runs and partitionings; float-SUM ordering is
  * the only nondeterminism, so consumers compare with tolerance, not
  * hashes.
  *
  * Input edges are symmetrized + deduplicated here (undirected
  * semantics, like [[GraphOps.louvain]]); ids of any type compare as
  * strings.
  */
object FastRP {

  /** Node embeddings for the graph; returns (id, embedding) with
    * `embedding: array<double>` L2-normalized. The vertex set is
    * edge-derived by default; pass `nodes` (a frame with column `id`)
    * to also embed ISOLATED vertices — zero-degree nodes keep their
    * normalized random base vector, like GDS (without a nodes frame
    * the edge list cannot know they exist).
    *
    * @param dim        embedding width d
    * @param weights    one weight per neighbor-averaging iteration
    *                   (its length is the iteration count; GDS-style
    *                   default emphasizes 2-3 hop structure)
    * @param sparsity   s in the ±√s/0 projection (P[nonzero] = 1/s)
    * @param nodes      optional vertex frame; unioned with the edge
    *                   endpoints, so it may be partial
    */
  def embed(edges0: DataFrame, dim: Int = 64,
            weights: Seq[Double] = Seq(0.0, 1.0, 1.0),
            sparsity: Int = 3, seed: Long = 42L,
            nodes: Option[DataFrame] = None,
            localFinishEdges: Long = 250000L): DataFrame = {
    require(dim > 0 && weights.nonEmpty && sparsity >= 2)
    val e = GraphOps.undirected(edges0.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst")))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Bounded local finisher (the LocalGraph pattern): the base
    // projection replays the ENGINE'S OWN xxhash64 — the catalyst
    // XxHash64 expression evaluated per (id, pos), bit-identical to
    // the column below — so the only local-vs-distributed difference
    // is float-sum order (~1e-15; consumers compare with tolerance by
    // this operator's contract). Declines past an id×dim cell bound.
    if (e.count() <= localFinishEdges) {
      val extraIds: Option[Array[String]] = nodes match {
        case Some(n) =>
          val arr = n.select(col("id").cast("string").as("id")).distinct()
            .limit(localFinishEdges.toInt + 1).collect().map(_.getString(0))
          if (arr.length <= localFinishEdges) Some(arr) else None
        case None => Some(Array.empty[String])
      }
      extraIds.foreach { extra =>
        val pairs = e.collect().map(r => (r.getString(0), r.getString(1)))
        val nV = (pairs.iterator.map(_._1) ++ extra.iterator).toSet.size
        if (nV.toLong * dim <= 20L * 1000 * 1000) {
          e.unpersist()
          return localEmbed(edges0.sparkSession, pairs, extra, dim,
            weights, sparsity, seed)
        }
      }
    }
    // exploded base state: one row per (id, pos) — the sparse random
    // projection, derived from a hash so it's reproducible anywhere
    val h = xxhash64(col("id"), col("pos"), lit(seed))
    val bucket = pmod(h, lit(2L * sparsity))
    val root = math.sqrt(sparsity.toDouble)
    val endpoints = e.select(col("src").as("id")).distinct()
    val vset = nodes match {
      case Some(n) => endpoints
        .unionByName(n.select(col("id").cast("string").as("id"))).distinct()
      case None => endpoints
    }
    val base = vset
      .select(col("id"), explode(sequence(lit(0), lit(dim - 1))).as("pos"))
      .withColumn("val",
        when(bucket === 0, lit(root))
          .when(bucket === 1, lit(-root))
          .otherwise(lit(0.0)))
    // L2-normalize per id as a WINDOW over the exploded rows — one
    // id-shuffle, no join (the degree-normalizing division the paper
    // writes is a per-id scalar scale, so per-id L2 normalization
    // absorbs it — the /deg never needs computing)
    val byId = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    def normalized(st: DataFrame): DataFrame = st
      .withColumn("nrm", sqrt(sum(col("val") * col("val")).over(byId)))
      .select(col("id"), col("pos"),
        when(col("nrm") > 0, col("val") / col("nrm")).otherwise(lit(0.0)).as("val"))
    var state = normalized(base).localCheckpoint()
    // acc accumulates Σ w_k e^(k) in the exploded representation
    var acc: DataFrame = null
    weights.foreach { w =>
      // neighbor sum (≙ average under the normalization above), then
      // L2 normalize — two shuffles per iteration, zero joins beyond
      // the edge join itself
      val msgs = e.join(state.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("pos")).agg(sum(col("val")).as("val"))
      state = normalized(msgs).localCheckpoint()
      if (w != 0.0) {
        val contrib = state.select(col("id"), col("pos"), (col("val") * w).as("val"))
        acc = if (acc == null) contrib
          else acc.unionByName(contrib)
            .groupBy(col("id"), col("pos")).agg(sum(col("val")).as("val"))
      }
    }
    require(acc != null, "at least one iteration weight must be nonzero")
    // isolated vertices never appear in a neighbor sum — they keep
    // their normalized base vector, as the contract above promises
    val isolatedBase = nodes match {
      case Some(_) => Seq(normalized(
        base.join(endpoints, Seq("id"), "left_anti")))
      case None => Nil
    }
    val fin = isolatedBase.foldLeft(normalized(acc))(_ unionByName _)
    // assemble arrays: the collect buffer holds d scalars per node —
    // bounded by dim, not by the corpus or the neighborhood
    val out = fin
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("val")))).as("pv"))
      .select(col("id"),
        expr("transform(pv, x -> x.val)").as("embedding"))
    graft.Borrow.reclaim(out, e)
  }

  /** Driver-side mirror of [[embed]] (see the gate above): same base
    * projection (the catalyst XxHash64 expression itself — no
    * reimplemented hash to drift), same normalize/iterate/accumulate
    * semantics over the collected symmetric edge list, deterministic
    * edge-order summation. */
  private def localEmbed(spark: org.apache.spark.sql.SparkSession,
                         pairs: Array[(String, String)], extra: Array[String],
                         dim: Int, weights: Seq[Double], sparsity: Int,
                         seed: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val root = math.sqrt(sparsity.toDouble)
    val endpoints = pairs.map(_._1).distinct // symmetric: src covers all
    val endpointSet = endpoints.toSet
    val isolated = extra.distinct.filterNot(endpointSet)
    def baseVec(id: String): Array[Double] = {
      val v = new Array[Double](dim)
      var p = 0
      while (p < dim) {
        val h = XxHash64(Seq(Literal.create(id, StringType),
          Literal.create(p, IntegerType), Literal.create(seed, LongType)), 42L)
          .eval(null).asInstanceOf[Long]
        val m = 2L * sparsity
        val bucket = ((h % m) + m) % m // Spark pmod
        v(p) = if (bucket == 0L) root else if (bucket == 1L) -root else 0.0
        p += 1
      }
      v
    }
    def normalized(v: Array[Double]): Array[Double] = {
      var n2 = 0.0; var p = 0
      while (p < dim) { n2 += v(p) * v(p); p += 1 }
      val n = math.sqrt(n2)
      if (n > 0) v.map(_ / n) else new Array[Double](dim)
    }
    val idx = endpoints.zipWithIndex.toMap
    var state = endpoints.map(id => normalized(baseVec(id)))
    val acc = Array.fill(endpoints.length)(new Array[Double](dim))
    var accUsed = false
    weights.foreach { w =>
      val msgs = Array.fill(endpoints.length)(new Array[Double](dim))
      pairs.foreach { case (s, d) =>
        val sv = state(idx(s)); val dv = msgs(idx(d))
        var p = 0
        while (p < dim) { dv(p) += sv(p); p += 1 }
      }
      state = msgs.map(normalized)
      if (w != 0.0) {
        accUsed = true
        var i = 0
        while (i < endpoints.length) {
          val a = acc(i); val s0 = state(i)
          var p = 0
          while (p < dim) { a(p) += w * s0(p); p += 1 }
          i += 1
        }
      }
    }
    require(accUsed, "at least one iteration weight must be nonzero")
    val rows =
      endpoints.indices.map { i =>
        org.apache.spark.sql.Row(endpoints(i), normalized(acc(i)).toSeq)
      } ++ isolated.map { id =>
        org.apache.spark.sql.Row(id, normalized(baseVec(id)).toSeq)
      }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", StringType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))))
  }

  /** Cosine similarity over two embedding columns (arrays of equal
    * length) — the bridge into the E-suite's score shapes. */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (s, x) => s + x))
    val nb = sqrt(aggregate(zip_with(b, b, (x, y) => x * y), lit(0.0), (s, x) => s + x))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }
}
