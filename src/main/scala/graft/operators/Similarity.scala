package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (SURVEY §2 E1-E3).
  *
  * The embeddings table is (vec_id, embedding: array<float>, label).
  * Dot products run through `zip_with`/`aggregate` higher-order
  * functions — codegen'd columnar arithmetic, no UDF.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns. Sequential left
    * fold — the same evaluation order DuckDB's list_cosine_similarity
    * uses, so oracle comparisons match bit-for-bit. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Session-registered native codegen cosine (graft.functions.
    * CosineSimilarity); bit-identical to [[cosine]] but stays in
    * WholeStageCodegen. */
  private def cos(s: SparkSession, a: Column, b: Column): Column =
    VectorFunctions.cosine_sim(s, a, b)

  /** TWO-STAGE per-query top-k (the P3/F6 two-stage pattern applied to
    * similarity): a single `Window.partitionBy(q_id)` over the scored
    * corpus×|queries| frame funnels everything into |q| partitions —
    * each task sorts ~|corpus| rows (the low-cardinality-window trap).
    * Stage 1 here keeps the per-(input-partition, q_id) top k —
    * parallelism = partitions × |q|, every group bounded by its
    * partition's slice; stage 2 merges the ≤ k·P survivors per query, a
    * frame bounded by parallelism, never by corpus size. Top-k of a
    * union = top-k of per-part top-k's, so rows are identical to the
    * one-window form.
    *
    * `scored` must carry (q_id, keyCol, cos) and ONLY scalar columns —
    * callers project the vector payloads away first, so the stage-1
    * exchange ships (q_id, id, cos) rows, never embeddings. */
  private[graft] def perQueryTopK(scored: DataFrame, keyCol: String, k: Int,
                                  rankName: String): DataFrame = {
    val wLocal = Window.partitionBy(col("pid"), col("q_id"))
      .orderBy(col("cos").desc, col(keyCol))
    val wGlobal = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col(keyCol))
    scored
      .withColumn("pid", spark_partition_id())
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= k)
      .drop("lrk", "pid")
      .withColumn(rankName, row_number().over(wGlobal))
      .filter(col(rankName) <= k)
  }

  /** E1 — brute-force exact cosine top-k for a query set (vec_id < 8).
    * The query side is broadcast; every partition scores its slice of
    * the corpus, prunes to its local top-k per query, and only the
    * pruned (q_id, id, cos) scalars reach the merge window — one pass
    * over the data, no shuffle of the corpus or its vectors. */
  def e1TopK(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = broadcast(all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    val scored = queries.join(all, col("q_id") =!= col("vec_id"))
      .withColumn("cos", cos(s, col("qv"), col("v")))
      .select(col("q_id"), col("vec_id"), col("cos"))
    perQueryTopK(scored, "vec_id", k, "rank")
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** E4 — radius (range) search: ALL corpus vectors within cosine
    * `threshold` of each query — "every near-duplicate of this
    * document", the unbounded-k companion to [[e1TopK]]. Same scale
    * shape: broadcast query matrix, one corpus pass, no corpus
    * shuffle; the threshold filters on the UNROUNDED cosine (rounding
    * is display-only, mirrored by the oracle). Output size is
    * data-dependent, which is exactly what a radius search is for —
    * at scale the e2/e5 LSH candidates bound the scanned set instead. */
  def e4Radius(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = broadcast(all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    queries.join(all, col("q_id") =!= col("vec_id"))
      .withColumn("cos", cos(s, col("qv"), col("v")))
      .filter(col("cos") >= threshold)
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("q_id"), col("neighbor"))
  }

  /** E5 — kNN label prediction: each query vector takes the MAJORITY
    * label of its k nearest corpus vectors (cosine) — the
    * weak-labeling / label-propagation primitive of a training-data
    * pipeline (classify unlabeled docs from a labeled seed set).
    * Queries = vec_id < nQueries, corpus = the rest (labels come from
    * the corpus side only). Ties: higher vote count, then smaller
    * label — deterministic, engine-reproducible.
    *
    * Scale shape: identical to E1 — broadcast query matrix, ONE corpus
    * pass, two-stage per-query top-k over (q_id, id, label, cos)
    * scalars, then a vote count over ≤ |q|·k rows (tiny). At 10⁸+
    * corpus rows swap the scan for the E2 LSH candidate set; the vote
    * stage is unchanged. */
  def e5KnnLabel(s: SparkSession, dir: String, k: Int = 10, nQueries: Int = 8): DataFrame = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
    val queries = broadcast(all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    val corpus = all.filter(col("vec_id") >= nQueries)
    val scored = queries.join(corpus, col("q_id") =!= col("vec_id"))
      .withColumn("cos", cos(s, col("qv"), col("v")))
      .select(col("q_id"), col("vec_id"), col("label"), col("cos"))
    val knn = perQueryTopK(scored, "vec_id", k, "rn")
    val wv = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("label"))
    knn.groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
      .orderBy(col("q_id"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * ±1 from xxhash64 parity. */
  private def planeSign(plane: Int, dim: Column): Column =
    when(xxhash64(lit(plane), dim).bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (nbits sign bits packed into a
    * long); `planeSeed` offsets the plane ids so multiple independent
    * tables can be derived. */
  def lshBucket(v: Column, nbits: Int, planeSeed: Int = 0): Column =
    (0 until nbits).map { p =>
      val dot = aggregate(
        zip_with(v, transform(v, (_, i) => planeSign(planeSeed + p, i)), (x, sgn) => x * sgn),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, expr(s"CAST(1 AS BIGINT) << $p")).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** E2 — ANN top-k with multi-table random-hyperplane LSH: `ntables`
    * independent sign-bit sketches; candidates are vectors sharing a
    * bucket with the query in ANY table (union via the exploded
    * (table, bucket) inverted index), then exact re-rank. Recall vs E1
    * is measured in the spec; at scale the bucket join replaces the
    * full corpus scan. */
  def e2AnnTopK(s: SparkSession, dir: String, k: Int = 5,
                nbits: Int = 6, ntables: Int = 8): DataFrame = {
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // the inverted index carries IDS ONLY — a vector that lands in m
    // shared buckets must dedup to one candidate, and keying that
    // distinct on (q_id, vec_id) ids means the candidate shuffle never
    // hashes or carries embedding payloads
    val banded = base
      .withColumn("tb", explode(array((0 until ntables).map(t =>
        struct(lit(t).as("tbl"),
          lshBucket(col("v"), nbits, planeSeed = t * 1000).as("bucket"))): _*)))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    val qIndex = broadcast(banded.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket")))
    val candIds = qIndex.join(banded, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    // vectors re-attach AFTER the id-dedup: query vectors broadcast,
    // corpus vectors via one broadcast-hash probe of the scan (candIds
    // is ≤ |queries| × bucket-bounded — tiny)
    val qVecs = broadcast(base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    base.join(broadcast(candIds), Seq("vec_id"))
      .join(qVecs, Seq("q_id"))
      .withColumn("cos", cos(s, col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** E6 — k-nearest-neighbor GRAPH (GDS `gds.knn` result shape): the
    * top-k cosine neighbors for EVERY vector, as (id1, id2, rank,
    * similarity) edges. The all-pairs self-join is the classic
    * scale-killer, so candidates come from the E2 multi-table
    * hyperplane index SELF-joined per (table, bucket) — ids only
    * through the shuffle, vectors re-attach after the dedup — with a
    * `bucketCap` that drops degenerate buckets entirely (the D2 guard:
    * a bucket of b vectors contributes b² candidate pairs, and a
    * bucket that big carries no locality signal anyway). Approximate,
    * like GDS's own NN-Descent knn; recall pinned by spec on a planted
    * corpus, symmetric-candidate property by construction (the index
    * join is symmetric in id1/id2).
    *
    * Defaults are the MEASURED operating point (3-bit buckets × 16
    * tables: recall 0.96 @ sf0.01 on the real embedding space; the
    * earlier 6×8 default read 0.2 — too selective for moderate-cosine
    * neighbors) and match `CALL graft.knn`, so the direct API and the
    * procedure surface hand back the same graph. */
  def knnGraph(vectors: DataFrame, k: Int = 5, nbits: Int = 3,
               ntables: Int = 16, bucketCap: Int = 1000): DataFrame = {
    require(k >= 1, "knnGraph: k >= 1")
    val base = vectors.select(col("id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base
      .withColumn("tb", explode(array((0 until ntables).map(t =>
        struct(lit(t).as("tbl"),
          lshBucket(col("v"), nbits, planeSeed = t * 1000).as("bucket"))): _*)))
      .select(col("id"), col("tb.tbl"), col("tb.bucket"))
    val oversized = banded.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > bucketCap)
      .select(col("tbl"), col("bucket"))
    val kept = banded.join(oversized, Seq("tbl", "bucket"), "left_anti")
    val candIds = kept.select(col("tbl"), col("bucket"), col("id").as("id1"))
      .join(kept.select(col("tbl"), col("bucket"), col("id").as("id2")),
        Seq("tbl", "bucket"))
      .filter(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val scored = candIds
      .join(base.select(col("id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(base.select(col("id").as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("cos", cos(vectors.sparkSession, col("v1"), col("v2")))
      .select(col("id1").as("q_id"), col("id2"), col("cos"))
    val out = perQueryTopK(scored, "id2", k, "rank")
      .select(col("q_id").as("id1"), col("id2"), col("rank"),
        round(col("cos"), 6).as("similarity"))
    graft.Borrow.reclaim(out, base)
  }

  /** E6 driver row — knn graph over a deterministic embeddings subset
    * (rows-only: LSH candidates, recall pinned by the planted spec). */
  def e6Knn(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    knnGraph(
      Tables.embeddings(s, dir).filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v")),
      // API defaults (3-bit buckets x 16 tables, the measured-0.96
      // operating point) — passed explicitly so the driver row pins
      // the same configuration even if defaults evolve
      k = k, nbits = 3, ntables = 16)
      .orderBy(col("id1"), col("rank"))

  /** One distributed Lloyd refinement step: new centroid = element-wise
    * mean of each list's member vectors.
    *
    * SCALE SHAPE: the mean is computed by exploding members to
    * (cid, dim, x) rows and averaging per (cid, dim) — every
    * aggregation buffer holds one running (sum, count), and only the
    * FINAL nlist×dim mean rows are re-assembled into arrays. The naive
    * alternative (`groupBy(cid).agg(collect_list(v))`) materializes
    * ~|corpus|/nlist full vectors inside ONE aggregation buffer — a
    * multi-GB single-row allocation at 10⁸ vectors. Input: (cid, v). */
  private[graft] def lloydRefine(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      // collect_list here aggregates nlist×dim scalar (dim, mean) pairs
      // — bounded by the quantizer size, never by the corpus
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cid"), expr("transform(dm, e -> e.m)").as("cv"))

  /** E3 — IVF-style search: a deterministic coarse quantizer (centroids
    * = every (n/nlist)-th vector, refined by `lloydIters` distributed
    * k-means steps over a deterministic training sample), probe the
    * nearest `nprobe` lists only.
    *
    * `trainMod` bounds quantizer training at scale (the standard IVF
    * move: centroids converge on a sample long before the corpus size
    * matters): training uses only vectors with xxhash64(vec_id) ≡ 0
    * (mod trainMod) — deterministic, partition-invariant. Default 1 =
    * train on everything (right at test scale; at 10⁸+ vectors set
    * trainMod so the sample is ~10⁵-10⁶). Assignment always covers the
    * full corpus.
    *
    * ASSIGNMENT SHAPE: the quantizer is nlist rows — driver-resident by
    * construction (lloydRefine aggregates down to nlist×dim means). So
    * nearest-centroid assignment is a pure scalar expression: array_max
    * of cosines computed by a `transform` over the centroid matrix
    * carried as ONE array<struct> literal. No crossJoin, no
    * nlist×-amplified frame, ZERO shuffle in training or assignment,
    * and the expression tree is CONSTANT-size in nlist (the matrix is
    * plan data, not generated code — see nearestCid). The two rejected
    * shapes: crossJoin+window argmin exchanged corpus×nlist rows with
    * vector payloads twice (r4); per-centroid inline literals made
    * codegen O(nlist) — Janino compile time dominated at nlist=16 and
    * the 64 KB method limit breaks it at production nlist (r5). */
  def e3IvfTopK(s: SparkSession, dir: String, k: Int = 5,
                nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 2,
                trainMod: Int = 1, reclaim: Boolean = true): DataFrame = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val train = if (trainMod <= 1) all
      else all.filter(pmod(xxhash64(col("vec_id")), lit(trainMod)) === 0)
    val n = all.count()
    val stride = math.max(n / nlist, 1L)
    def collectCentroids(df: DataFrame): Array[(Int, Seq[Double])] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    // deterministic seed WITHOUT a global sort: the stride filter plus
    // the explicit id bound picks exactly the vectors at
    // vec_id ∈ {0, stride, …, (nlist−1)·stride} — a pure pushed-down
    // filter, partition-arrival-order-invariant (the previous
    // orderBy().limit() spent a whole sort job for the same rows)
    var centroids = collectCentroids(all
      .filter(col("vec_id") % stride === 0 && col("vec_id") < lit(stride * nlist))
      .select((col("vec_id") / stride).cast("int").as("cid"), col("v").as("cv")))
    // the stride pick assumes vec_ids dense from 0 (a Tables.embeddings
    // invariant); if the table ever arrives with offset/sparse ids,
    // don't silently shrink the quantizer — fall back to a bounded
    // ordered pick of the first nlist vectors (one small TakeOrdered,
    // only on the degenerate path)
    if (centroids.length < nlist)
      centroids = all.orderBy(col("vec_id")).limit(nlist)
        .select(col("v")).collect().zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](0) }
    // The quantizer rides along as ONE array<struct<cid,cv>> literal —
    // DATA in the plan, not code. The r5 form inlined a separate
    // typedLit vector + native cosine per centroid, so the generated
    // projection grew O(nlist): at nlist=16 Janino compilation cost
    // dominated the query (bench 0.59 → 1.71 s), and at a production
    // nlist (10³-10⁴) the method blows the 64 KB codegen limit
    // outright. A single literal + transform/array_max keeps the
    // expression tree CONSTANT-size in nlist (the lambda interprets,
    // but its body is the native CosineSimilarity eval — a fused
    // array pass), still zero joins and zero shuffles.
    def centMatrix: Column = typedLit(centroids)
    // argmax cosine over the centroid matrix; ties break to the
    // smallest cid (max of (cos, -cid) struct = lexicographic)
    def nearestCid(v: Column): Column = {
      val best = array_max(transform(centMatrix, c =>
        struct(cos(s, v, c.getField("_2")).as("c"),
          (-c.getField("_1")).as("ncid"))))
      (-best.getField("ncid")).cast("int")
    }
    for (_ <- 1 to lloydIters)
      centroids = collectCentroids(
        lloydRefine(train.select(nearestCid(col("v")).as("cid"), col("v"))))
    val assigned = all
      .select(col("vec_id"), col("v"), nearestCid(col("v")).as("cid"))
    // per-query probe lists: sort the (neg-cos, cid) struct scores over
    // the same matrix literal, keep nprobe — pure expression, no
    // crossJoin/window, constant-size plan in nlist
    val probes = transform(centMatrix, c =>
      struct((-cos(s, col("v"), c.getField("_2"))).as("negc"),
        c.getField("_1").as("cid")))
    val queries = broadcast(all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(slice(array_sort(probes), 1, nprobe)).as("p"))
      .select(col("q_id"), col("qv"), col("p.cid").as("cid")))
    val scored = queries.join(assigned, Seq("cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", cos(s, col("qv"), col("v")))
      .select(col("q_id"), col("vec_id"), col("cos"))
    val outRaw = perQueryTopK(scored, "vec_id", k, "rank")
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
    if (!reclaim) { all.unpersist(); outRaw } // audit path: full lazy plan
    else
      // materialize the (tiny, ≤ |queries|·k rows) result while `all` is
      // still cached, then release it. Borrow.reclaim checkpoints at the
      // RDD layer rather than persist(): a CacheManager persist of this
      // plan is canonically identical across calls, so repeated runs
      // (the bench loop) would both WARN 'already cached' and silently
      // serve the first run's cached result to later timed runs.
      graft.Borrow.reclaim(outRaw, all)
  }

  /** E-suite recall gate (r10): per-round floors on the approximate
    * paths vs the exact E1 top-k — the modularity quality-floor
    * pattern applied to ANN. The approximate RESULTS are
    * hash-family-dependent and legitimately un-oracle-able; their
    * RECALL against the exact twin is deterministic per scale factor
    * (no rand() anywhere in E1-E3), so a dip below the floor means a
    * changed hash/pruning path, never noise. Floors sit just under the
    * measured recalls (e2 0.30/0.375, e3 0.50/0.575 at sf0.01/sf0.1);
    * the oracle pins (1, 1). */
  /** E7 — K-MEANS clustering over (id, v) vectors (`gds.kmeans`
    * shape, r12): deterministic hash-order init (the k smallest
    * xxhash64(id) vectors — partition-arrival-invariant, one bounded
    * TakeOrdered), `iters` distributed Lloyd steps via [[lloydRefine]]
    * (scalar-exploded means, no corpus-sized buffers), cosine
    * nearest-centroid assignment through ONE array<struct> matrix
    * literal (plan DATA, constant-size codegen — the E3 lesson).
    * Returns (id, cluster, sim); sim = cosine to the assigned
    * centroid. Fully deterministic — reruns and engines agree. */
  def kmeans(vectors: DataFrame, k: Int, iters: Int = 2,
             trainMod: Int = 1): DataFrame = {
    require(k >= 1 && iters >= 0, "kmeans: k >= 1, iters >= 0")
    val s = vectors.sparkSession
    val all = vectors.select(col("id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = if (trainMod <= 1) all
      else all.filter(pmod(xxhash64(col("id").cast("string")), lit(trainMod)) === 0)
    var centroids: Array[(Int, Seq[Double])] = all
      .orderBy(xxhash64(col("id").cast("string")), col("id").cast("string"))
      .limit(k).select(col("v")).collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](0) }
    def centMatrix: Column = typedLit(centroids)
    def best(v: Column): Column =
      array_max(transform(centMatrix, c =>
        struct(cos(s, v, c.getField("_2")).as("c"),
          (-c.getField("_1")).as("ncid"))))
    for (_ <- 1 to iters)
      centroids = lloydRefine(train.select(
          (-best(col("v")).getField("ncid")).cast("int").as("cid"), col("v")))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val out = all.select(col("id"),
      (-best(col("v")).getField("ncid")).cast("int").as("cluster"),
      round(best(col("v")).getField("c"), 6).as("sim"))
    graft.Borrow.reclaim(out, all)
  }

  /** E7 driver row — kmeans over the embeddings table. */
  def e7Kmeans(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    kmeans(Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v")),
      k = k, iters = 2)
      .orderBy(col("id"))

  /** E7 gate terms: Lloyd refinement must not DEGRADE the mean
    * assignment cosine vs the init centroids (deterministic — a dip
    * means a changed code path, not sampling noise), and every
    * requested cluster must be non-empty on this corpus. */
  private[graft] def e7Quality(s: SparkSession, dir: String,
                               k: Int = 8): (Double, Double, Long) = {
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    def meanSim(df: DataFrame): Double =
      df.agg(avg(col("sim"))).collect()(0).getDouble(0)
    val init = meanSim(kmeans(vecs, k, iters = 0))
    val fin = kmeans(vecs, k, iters = 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val finMean = meanSim(fin)
    val nClusters = fin.select(col("cluster")).distinct().count()
    fin.unpersist()
    (init, finMean, nClusters)
  }

  def eRecallGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("neighbor").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(e1TopK(s, dir))
    val r2 = (exact & pairSet(e2AnnTopK(s, dir))).size.toDouble / exact.size
    val r3 = (exact & pairSet(e3IvfTopK(s, dir))).size.toDouble / exact.size
    val r6 = e6Recall(s, dir)
    // r12: kmeans quality terms — Lloyd must not degrade the init
    // assignment, and all 8 clusters must land non-empty
    val (e7i, e7f, e7n) = e7Quality(s, dir)
    // r16: the IVF-PQ path must keep ≥ half the exact neighbors —
    // codes are 64× narrower than the vectors, so this is the
    // compression-vs-recall contract, per-round gated
    val r8 = e8Recall(s, dir)
    Seq((if (r2 >= 0.25) 1L else 0L, if (r3 >= 0.45) 1L else 0L,
        if (r6 >= 0.6) 1L else 0L,
        if (e7f >= e7i - 1e-9) 1L else 0L, if (e7n == 8L) 1L else 0L,
        if (r8 >= 0.5) 1L else 0L))
      .toDF("e2_recall_ok", "e3_recall_ok", "e6_recall_ok",
        "e7_improve_ok", "e7_k_ok", "e8_recall_ok")
  }

  // ------------------------------------------------------------------
  // E8 — product quantization (r16): THE storage/IO lever at 10⁹+
  // vectors. A dim-D unit vector becomes m tinyint codes (one per
  // D/m-dim subspace, ksub centroids each) — 64 doubles → 8 bytes at
  // the defaults, a 64× scan-width reduction — and queries score
  // candidates by ASYMMETRIC DISTANCE: cos(q, x) ≈ Σ_j ⟨q_j,
  // c_{j,code_j(x)}⟩, a lookup-table sum that never touches the full
  // vectors. Composed with the E3 coarse quantizer (IVF restricts the
  // candidate lists, PQ scores them from codes — the IVF-PQ layout,
  // without residual encoding, disclosed). Everything deterministic:
  // stride init, fixed Lloyd rounds, no sampling.

  /** −‖a − b‖²: HOF fold, sequential order (codebooks are tiny — this
    * runs ksub× per subvector row only during train/encode). */
  private def negSqDist(a: Column, b: Column): Column =
    -aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2-normalize (zero-guarded); PQ trains and scores on unit vectors
    * so ADC inner products ARE approximate cosines. */
  private def unitV(v: Column): Column = {
    val norm = sqrt(aggregate(transform(v, x => x * x),
      lit(0.0), (acc, x) => acc + x))
    transform(v, x => x / greatest(norm, lit(1e-12)))
  }

  /** (id, sub, sv): each vector exploded into its m subvectors. */
  private def subFrame(vectors: DataFrame, m: Int, d: Int): DataFrame =
    vectors
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("v"))
      .select(col("id"), col("sub"),
        slice(col("v"), col("sub") * lit(d) + lit(1), lit(d)).as("sv"))

  /** Nearest sub-centroid: the E3 matrix-literal rule — the codebook
    * rides as ONE array<struct<_1:sub,_2:cid,_3:cv>> literal (plan
    * DATA, constant-size codegen), filtered per row to its subspace;
    * ties break to the smallest cid via the (negdist, −cid) struct
    * max. */
  private def nearestSubCid(codebook: Array[(Int, Int, Seq[Double])],
                            sv: Column, sub: Column): Column = {
    val cands = filter(typedLit(codebook), e => e.getField("_1") === sub)
    val best = array_max(transform(cands, e =>
      struct(negSqDist(sv, e.getField("_3")).as("nd"),
        (-e.getField("_2")).as("nc"))))
    (-best.getField("nc")).cast("int")
  }

  /** Train the PQ codebook: deterministic stride init per subspace
    * (the E3 pick — sub-centroid c = subvector of the vector at
    * id = c·stride), then `lloydIters` distributed refits over ALL
    * subspaces in one keyed frame (scalar-exploded means, the
    * [[lloydRefine]] rule — no corpus-sized buffers). Clusters that
    * lose every member keep their previous centroid. The codebook is
    * m·ksub·(D/m) = ksub·D doubles — driver-resident by construction
    * at any corpus size. Input must be (id dense-from-0, v UNIT). */
  private[graft] def pqTrain(vectors: DataFrame, m: Int, ksub: Int,
                             lloydIters: Int = 2,
                             trainMod: Int = 1): Array[(Int, Int, Seq[Double])] = {
    val d = vectors.select(size(col("v"))).limit(1).collect()(0).getInt(0)
    require(d % m == 0, s"pqTrain: dim $d not divisible by m=$m")
    val dSub = d / m
    val train = if (trainMod <= 1) vectors
      else vectors.filter(pmod(xxhash64(col("id")), lit(trainMod)) === 0)
    val n = vectors.count()
    require(n >= ksub, s"pqTrain: need at least ksub=$ksub vectors, got $n")
    val stride = math.max(n / ksub, 1L)
    var codebook = subFrame(vectors
        .filter(col("id") % stride === 0 && col("id") < lit(stride * ksub)),
        m, dSub)
      .select(col("sub"), (col("id") / stride).cast("int").as("cid"), col("sv"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    if (codebook.length < m * ksub) {
      // sparse/offset ids: bounded ordered fallback (the E3 rule)
      val first = vectors.orderBy(col("id")).limit(ksub)
        .select(col("v")).collect().map(_.getSeq[Double](0))
      codebook = (for { sub <- 0 until m; c <- 0 until ksub } yield
        (sub, c, first(c).slice(sub * dSub, (sub + 1) * dSub))).toArray
    }
    val trainSub = subFrame(train, m, dSub)
    for (_ <- 1 to lloydIters) {
      val cb = codebook
      val refit = trainSub
        .select(col("sub"), nearestSubCid(cb, col("sv"), col("sub")).as("cid"),
          col("sv"))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("sub"), col("cid"), col("dim")).agg(avg(col("x")).as("mn"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mn")))).as("dm"))
        .select(col("sub"), col("cid"), expr("transform(dm, e -> e.mn)").as("cv"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2))
        .toMap
      codebook = codebook.map { case (sub, c, cv) =>
        (sub, c, refit.getOrElse((sub, c), cv)) }
    }
    codebook
  }

  /** Encode: (id, codes array<tinyint>) — codes[j] = nearest
    * sub-centroid of subvector j. 8·D bytes → m bytes per vector. */
  private[graft] def pqCodes(vectors: DataFrame,
                             codebook: Array[(Int, Int, Seq[Double])],
                             m: Int): DataFrame = {
    val d = codebook(0)._3.length
    subFrame(vectors, m, d)
      .select(col("id"), col("sub"),
        nearestSubCid(codebook, col("sv"), col("sub")).as("cid"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cid")))).as("sc"))
      .select(col("id"), expr("transform(sc, e -> CAST(e.cid AS TINYINT))").as("codes"))
  }

  /** E8 gate — IVF-PQ top-k with exact re-ranking (the FAISS refine
    * layout): E3's coarse quantizer picks `nprobe` candidate lists per
    * query; candidates are scored by ADC from their CODES (explode
    * codes → equi-join the per-query LUT frame → one (q_id, vec_id)-
    * keyed sum — full vectors never touched); the ADC top-`rerank`
    * survivors per query are re-scored with the exact cosine and the
    * final top-k returned. At 10⁹+ vectors this is the IO contract:
    * the scan reads m-byte codes, full vectors load for only
    * |q|·rerank rows. The LUT is |q|·m·ksub rows — broadcast by
    * construction. `trainMod` bounds CODEBOOK training the E3 way
    * (xxhash64(id) ≡ 0 mod trainMod — at 10⁹ vectors a 1/256 hash
    * sample is the standard Lloyd cost; encoding still covers every
    * vector). Output (q_id, rank, neighbor, cos_sim); rows-gated
    * (the ADC cut is float-order-sensitive at ties), recall-floored
    * via [[eRecallGate]]'s e8 term. */
  def e8PqIvf(s: SparkSession, dir: String, k: Int = 5, m: Int = 16,
              ksub: Int = 16, nlist: Int = 16, nprobe: Int = 8,
              lloydIters: Int = 2, rerank: Int = 50,
              trainMod: Int = 1): DataFrame = {
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id"), unitV(col("embedding").cast("array<double>")).as("v"))
      .persist()
    val n = all.count()
    val d = all.select(size(col("v"))).limit(1).collect()(0).getInt(0)
    val dSub = d / m
    // coarse quantizer — the E3 stride-init + Lloyd + matrix-literal
    // assignment, verbatim (unit vectors, so cosine ranking is dot)
    val stride = math.max(n / nlist, 1L)
    var centroids = all
      .filter(col("vec_id") % stride === 0 && col("vec_id") < lit(stride * nlist))
      .select((col("vec_id") / stride).cast("int").as("cid"), col("v").as("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    def nearestCid(v: Column): Column = {
      val best = array_max(transform(typedLit(centroids), c =>
        struct(cos(s, v, c.getField("_2")).as("c"),
          (-c.getField("_1")).as("ncid"))))
      (-best.getField("ncid")).cast("int")
    }
    for (_ <- 1 to lloydIters)
      centroids = lloydRefine(all.select(nearestCid(col("v")).as("cid"), col("v")))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val assigned = all.select(col("vec_id"), nearestCid(col("v")).as("cid"))
    // PQ codebook + codes over the same unit vectors. `trainMod` is
    // the honest 10⁹-vector training cost (the E3 lever, r16 advice):
    // both Lloyd refits scan only vectors with xxhash64(id) ≡ 0
    // (mod trainMod) — deterministic, partition-invariant; default 1
    // trains on everything (right at gate scale). ENCODING always
    // covers the full corpus.
    val cb = pqTrain(all.select(col("vec_id").as("id"), col("v")), m, ksub,
      lloydIters, trainMod)
    val codes = pqCodes(all.select(col("vec_id").as("id"), col("v")), cb, m)
    // per-query LUT frame: ⟨q_j, c_{j,cid}⟩ for every (sub, cid)
    val cbDf = s.createDataFrame(cb.toIndexedSeq).toDF("sub", "ccid", "cv")
    val queries = all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val qsub = queries
      .select(col("q_id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        slice(col("qv"), col("sub") * lit(dSub) + lit(1), lit(dSub)).as("qsv"))
    val lut = broadcast(qsub.join(cbDf, Seq("sub"))
      .select(col("q_id"), col("sub"), col("ccid").as("cid"),
        dotHof(col("qsv"), col("cv")).as("pdot")))
    // probe lists per query (the E3 expression shape)
    val probes = transform(typedLit(centroids), c =>
      struct((-cos(s, col("qv"), c.getField("_2"))).as("negc"),
        c.getField("_1").as("cid")))
    val qProbes = broadcast(queries
      .select(col("q_id"),
        explode(slice(array_sort(probes), 1, nprobe)).as("p"))
      .select(col("q_id"), col("p.cid").as("cid")))
    val cand = qProbes.join(assigned, Seq("cid"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"))
    // ADC: codes → (vec_id, sub, cid) rows, LUT equi-join, keyed sum
    val codesEx = codes.select(col("id").as("vec_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col("vec_id"), col("sub").cast("int").as("sub"),
        col("code").cast("int").as("cid"))
    val scored = cand.join(codesEx, Seq("vec_id"))
      .join(lut, Seq("q_id", "sub", "cid"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("cos"))
    // refine: exact cosine over the |q|·rerank ADC survivors only
    val survivors = perQueryTopK(scored, "vec_id", rerank, "arank")
      .select(col("q_id"), col("vec_id"))
    val exactScored = survivors
      .join(all, Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .withColumn("cos", cos(s, col("qv"), col("v")))
      .select(col("q_id"), col("vec_id"), col("cos"))
    val out = perQueryTopK(exactScored, "vec_id", k, "rank")
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
    graft.Borrow.reclaim(out, all)
  }

  /** E9 (r17) — per-pair vector similarity metrics over a BOUNDED
    * (id, v: array<double>) frame: every unordered pair (node1 <
    * node2) with the classic function-catalog measures at once —
    *
    *   cosine             a·b / (‖a‖‖b‖)           (0 on a zero norm)
    *   euclideanDistance  ‖a − b‖
    *   euclidean          1 / (1 + ‖a − b‖)         (the GDS form)
    *   pearson            cov(a,b) / (σ_a σ_b)      (0 on zero variance)
    *
    * This is the `gds.similarity.*` per-pair FUNCTION surface (GDS
    * spells these as Cypher functions over two vector properties), not
    * an ANN engine: the all-pairs product is the point, so the input
    * is required BOUNDED — `pairCap` fails loudly naming the lever
    * (the linkPrediction centerCap convention). Corpus-scale
    * similarity goes through the E1-E8 candidate-bounded paths.
    * Mixed-dimension inputs fail loudly (zip_with would silently
    * null-pad). All measures sequential-fold HOFs (the [[cosine]]
    * rule), rounded 4 for cross-engine determinism. */
  def pairwiseMetrics(vecs: DataFrame, pairCap: Long = 10000L): DataFrame = {
    // input is cap-bounded and usually a cheap projection — the two
    // probe actions recompute it rather than pinning a cache the
    // (possibly large) pair output would then have to outlive
    val base = vecs.select(col("id"), col("v"))
    val n = base.count()
    require(n <= pairCap,
      s"pairwiseMetrics: $n vectors make ${n * (n - 1) / 2} pairs — " +
        s"exceeds pairCap=$pairCap; raise pairCap if the quadratic cost " +
        "is intended, or use the knn/ANN operators for corpus-scale input")
    val nDims = base.select(size(col("v")).as("d")).distinct().count()
    require(nDims <= 1,
      s"pairwiseMetrics: vectors must share one dimension ($nDims found)")
    val pairs = base.select(col("id").as("node1"), col("v").as("va"))
      .join(broadcast(base.select(col("id").as("node2"), col("v").as("vb"))),
        col("node1") < col("node2"))
    def fold(c: Column): Column = aggregate(c, lit(0.0), (acc, x) => acc + x)
    val dot = fold(zip_with(col("va"), col("vb"), (x, y) => x * y))
    val na = sqrt(fold(transform(col("va"), x => x * x)))
    val nb = sqrt(fold(transform(col("vb"), x => x * x)))
    val dist = sqrt(fold(zip_with(col("va"), col("vb"),
      (x, y) => (x - y) * (x - y))))
    val d = size(col("va")).cast("double")
    val out = pairs
      .withColumn("ma", fold(col("va")) / d)
      .withColumn("mb", fold(col("vb")) / d)
      .withColumn("cov", fold(zip_with(col("va"), col("vb"),
        (x, y) => (x - col("ma")) * (y - col("mb")))))
      .withColumn("sa", sqrt(fold(transform(col("va"),
        x => (x - col("ma")) * (x - col("ma"))))))
      .withColumn("sb", sqrt(fold(transform(col("vb"),
        x => (x - col("mb")) * (x - col("mb"))))))
      .select(col("node1"), col("node2"),
        Num.roundTies(when(na * nb === 0.0, lit(0.0))
          .otherwise(dot / (na * nb)), 4).as("cosine"),
        Num.roundTies(lit(1.0) / (lit(1.0) + dist), 4).as("euclidean"),
        Num.roundTies(dist, 4).as("euclideanDistance"),
        Num.roundTies(when(col("sa") * col("sb") === 0.0, lit(0.0))
          .otherwise(col("cov") / (col("sa") * col("sb"))), 4).as("pearson"))
    out
  }

  /** IVF-PQ recall vs the exact E1 top-k (deterministic per SF). */
  private[graft] def e8Recall(s: SparkSession, dir: String): Double = {
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("q_id").cast("long"), col("neighbor").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(e1TopK(s, dir))
    (exact & pairSet(e8PqIvf(s, dir))).size.toDouble / exact.size
  }

  /** knnGraph recall vs the exact top-k on the same deterministic
    * embeddings subset (the e6 gate term — deterministic per SF, so a
    * dip means a changed hash/pruning path, not sampling noise). */
  private[graft] def e6Recall(s: SparkSession, dir: String, k: Int = 3): Double = {
    val sub = Tables.embeddings(s, dir).filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val qs = broadcast(sub.select(col("id").as("q_id"), col("v").as("qv")))
    val exact = perQueryTopK(
        qs.join(sub, col("q_id") =!= col("id"))
          .withColumn("cos", cos(s, col("qv"), col("v")))
          .select(col("q_id"), col("id").as("id2"), col("cos")),
        "id2", k, "rank")
      .select(col("q_id").cast("long"), col("id2").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = e6Knn(s, dir, k)
      .select(col("id1").cast("long"), col("id2").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact & got).size.toDouble / exact.size
  }
}
