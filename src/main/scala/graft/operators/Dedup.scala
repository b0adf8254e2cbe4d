package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication suite for large text corpora (SURVEY §2 D1-D5).
  *
  * Everything here is shuffle-bounded: exact dedup is one hash groupBy;
  * near-dup never materializes the O(n²) pair space — candidates come
  * from LSH band buckets or a shingle inverted index, then get exactly
  * verified.
  */
object Dedup {

  /** Normalized text used as the dedup identity everywhere. */
  private def norm(c: org.apache.spark.sql.Column) = lower(trim(c))

  /** D1 — exact dedup: group by md5(normalized text), keep min doc_id.
    * Map-side partial aggregation makes the shuffle |distinct texts|. */
  def d1Exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(norm(col("text"))).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper"))

  /** Word 3-gram shingle set per document (distinct).
    *
    * The word array is materialized as a projection column FIRST: a
    * lambda body that references the `split(...)` expression tree
    * re-evaluates the split once per array element (O(len²) in text
    * length); referencing the bound attribute reads the already-
    * computed array. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = col("w")
    docs.select(col("doc_id"), split(norm(col("text")), "\\s+").as("w"))
      .select(col("doc_id"),
        array_distinct(
          filter(
            transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
              i => when(i + n <= size(w),
                concat_ws(" ", slice(w, i + 1, lit(n))))),
            x => x.isNotNull)).as("shingles"))
  }

  /** Distinct word n-gram shingles as ROWS (doc_id, g) — the fully
    * codegen'd formulation: posexplode + window lead, no higher-order
    * functions (Spark HOFs are CodegenFallback and re-evaluate captured
    * expression trees per element — interpreter-bound at corpus scale).
    * One shuffle on doc_id. */
  def shingleRows(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n == 3, "shingleRows is specialized for 3-grams")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"), posexplode(split(norm(col("text")), "\\s+")).as(Seq("pos", "w0")))
      .select(col("doc_id"), col("w0"),
        lead(col("w0"), 1).over(w).as("w1"), lead(col("w0"), 2).over(w).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w0"), col("w1"), col("w2")).as("g"))
      .distinct()
  }

  /** Exact Jaccard for candidate pairs from shingle rows:
    * |A∩B| via pair-wise equi-join, |A∪B| = n1 + n2 - |A∩B|. */
  private def jaccardOf(cand: DataFrame, sh: DataFrame, sizes: DataFrame,
                        threshold: Double): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("id1"), col("g")), Seq("id1"))
      // explicit two-key equi-join: joining on id2 alone would blow up
      // to |pair|×|shingles| rows before any g filter could apply
      .join(sh.select(col("doc_id").as("rid"), col("g").as("g2")),
        col("id2") === col("rid") && col("g") === col("g2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), Seq("id2"))
      // threshold on the UNROUNDED value (rounding is display-only, and
      // the oracle filters unrounded too)
      .filter(col("i").cast("double") / (col("n1") + col("n2") - col("i")) >= threshold)
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 4))
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))

  /** D4 — exact pairwise n-gram Jaccard over the full corpus, scale-
    * safe in two cooperating pieces (the Vernica et al. MapReduce
    * set-similarity-join recipe):
    *
    *  1. Intersection counts for shingles with df ≤ dfCap come from the
    *     direct inverted-index co-occurrence join — its size is
    *     Σ_{df≤cap} df² ≤ dfCap · |shingle rows|, i.e. LINEAR in the
    *     corpus for a fixed cap, never quadratic.
    *  2. Shingles with df > dfCap (boilerplate — the quadratic-blowup
    *     case) are excluded from that join; pairs whose shared shingles
    *     include such frequent shingles are still found because
    *     candidate membership comes from PREFIX FILTERING (globally
    *     ordering shingles by df, each doc indexes its rarest
    *     |d| − ⌈θ·|d|⌉ + 1 — any pair with J ≥ θ must collide there),
    *     and their frequent-shingle intersections are counted by a
    *     candidate-bounded join against only the df > dfCap rows.
    *
    * Every pair with J ≥ θ is reported with its exact Jaccard. */
  def d4Jaccard(s: SparkSession, dir: String, threshold: Double = 0.5,
                dfCap: Long = 1000L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sh = shingleRows(docs).persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val freq = sh.groupBy(col("g")).agg(count(lit(1)).as("df")).persist()
    val cand = prefixCandidates(sh, sizes, freq, threshold).persist()

    val shF = sh.join(freq, Seq("g"))
    val low = shF.filter(col("df") <= dfCap).select(col("doc_id"), col("g"))
    val iLow = low.alias("x").join(low.alias("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .agg(count(lit(1)).as("i_low"))
    val high = shF.filter(col("df") > dfCap).select(col("doc_id"), col("g"))
    val iHigh = cand
      .join(high.select(col("doc_id").as("id1"), col("g")), Seq("id1"))
      .join(high.select(col("doc_id").as("rid2"), col("g").as("g2")),
        col("id2") === col("rid2") && col("g") === col("g2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("i_high"))

    val out = cand
      .join(iLow, Seq("id1", "id2"), "left")
      .join(iHigh, Seq("id1", "id2"), "left")
      .withColumn("i", coalesce(col("i_low"), lit(0L)) + coalesce(col("i_high"), lit(0L)))
      .filter(col("i") > 0)
      .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), Seq("id2"))
      .filter(col("i").cast("double") / (col("n1") + col("n2") - col("i")) >= threshold)
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 4))
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
    out
  }

  /** Prefix-filtered candidate pairs (id1 < id2) from shingle rows:
    * every pair with Jaccard ≥ threshold is included (the prefix-
    * filtering guarantee); frequent shingles rank into the un-indexed
    * suffix and never join. */
  def prefixCandidates(sh: DataFrame, sizes: DataFrame, freq: DataFrame,
                       threshold: Double): DataFrame = {
    val pref = sh
      .join(freq, Seq("g"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .join(sizes, Seq("doc_id"))
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("g"))
    pref.alias("x").join(pref.alias("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
  }

  /** Prime modulus and deterministic (a, b) coefficients for the
    * minhash family — all values < 2³¹ so aᵢ·h+bᵢ stays within a long
    * (no ANSI overflow), the classic MOD-prime universal hash family. */
  private val MinhashPrime = 2147483647L // 2^31 - 1
  private lazy val minhashParams: IndexedSeq[(Long, Long)] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0 until 256).map(_ => ((next() & 0x7FFFFFFFL) | 1L, next() & 0x7FFFFFFFL))
  }

  /** MinHash signatures: each shingle is string-hashed ONCE (xxhash64,
    * folded into [0, 2³¹)); the k functions are (aᵢ·h+bᵢ) mod p —
    * the standard one-hash universal family. Per-row cost is one
    * string hash + k codegen'd long mult-add-mods instead of k string
    * hashes (~10× cheaper at corpus scale). One explode + one groupBy
    * with map-side partial min. */
  def minhashSignatures(docs: DataFrame, k: Int = 64): DataFrame = {
    val ex = shingleRows(docs)
      .select(col("doc_id"), pmod(xxhash64(col("g")), lit(MinhashPrime)).as("h"))
    val aggs = (0 until k).map { i =>
      val (a, b) = minhashParams(i)
      min(pmod(col("h") * lit(a) + lit(b), lit(MinhashPrime))).as(s"h$i")
    }
    ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** D2 — MinHash + LSH near-dup pairs.
    *
    * bands × rows = k; docs landing in the same (band, band-hash) bucket
    * become candidates; candidates are exactly verified with true
    * Jaccard, so precision is 1.0 and recall is the standard LSH
    * S-curve for (bands, rows).
    */
  def d2MinhashLsh(s: SparkSession, dir: String,
                   k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5): DataFrame = {
    // exact duplicates collapse to one representative per distinct
    // normalized text BEFORE the near-dup pass: a duplicate-heavy
    // corpus (the common case at scale) would otherwise spend its time
    // pairwise-verifying identical documents that D1 already groups.
    // Output pairs are therefore between representatives.
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    val docs = Tables.documents(s, dir)
      .withColumn("text_hash", md5(norm(col("text"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("text_hash", "rn")
      .persist() // referenced by signatures AND verification
    val rows = k / bands
    val sigs = minhashSignatures(docs, k)
    val banded = sigs.select(col("doc_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    // persist: verifyJaccard references the candidate frame three
    // times (both id sides + the pair join) — without this the whole
    // minhash pipeline re-executes per reference
    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
      .persist()
    verifyJaccard(docs, cand, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs (set counts via
    * shingle rows — identical math to array intersect/union). */
  def verifyJaccard(docs: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val ids = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    val sh = shingleRows(docs.join(ids, Seq("doc_id"), "left_semi")).persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    jaccardOf(cand, sh, sizes, threshold)
  }

  /** SimHash-64 per document: sign-aggregate of per-token hash bits
    * (computed with bit arithmetic over xxhash64 — no UDF). */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(norm(col("text")), "\\s+")).as("w"))
      .withColumn("h", xxhash64(col("w")))
    // per bit i: +1 if bit set else -1; simhash bit i = majority
    val bitCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    tok.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, expr(s"CAST(1 AS BIGINT) << $i"))
          .otherwise(lit(0L))).reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** D3 — SimHash near-dup: candidates share one of four 16-bit chunks
    * (guarantees recall for Hamming distance ≤ 3), then exact Hamming
    * filter. */
  def d3Simhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // same representative collapse as D2: exact duplicates share a
    // simhash by construction and would explode the chunk buckets
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    val docs = Tables.documents(s, dir)
      .withColumn("text_hash", md5(norm(col("text"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("text_hash", "rn")
    val sigs = simhash(docs).persist()
    val chunked = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFF).as("cv"))): _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.cv"))
    val popcount = (x: org.apache.spark.sql.Column) => bit_count(x)
    chunked.alias("x").join(chunked.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        popcount(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  /** D5 — embedding-cosine similar pairs over the full corpus (exact
    * pairwise, oracle-checkable; the LSH/IVF scale path lives in
    * [[Similarity]]). The default threshold is tuned to the synthetic
    * corpus's similarity ceiling (max pairwise cos ≈ 0.5) so the check
    * exercises real pairs rather than vacuously matching on zero rows. */
  def d5EmbDup(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("id1"), col("v").as("v1"))
    val b = e.select(col("vec_id").as("id2"), col("v").as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", graft.functions.VectorFunctions.cosine_sim(s, col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("id1"), col("id2"))
  }
}
