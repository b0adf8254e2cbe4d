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
  private[graft] def norm(c: org.apache.spark.sql.Column) = lower(trim(c))

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

  /** D6 — corpus boilerplate extraction: word 3-grams whose DOCUMENT
    * frequency reaches minDf (navigation chrome, license headers,
    * templated phrases — the stuff near-dup misses because no single
    * pair is similar enough). One shuffle on g with map-side combine;
    * output is the df-filtered tail, tiny by construction. */
  def d6Boilerplate(s: SparkSession, dir: String, minDf: Long = 5L): DataFrame =
    shingleRows(Tables.documents(s, dir))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("g"))

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
        Num.roundTies(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 4))
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))

  /** D4 — exact pairwise n-gram Jaccard over the full corpus, scale-
    * safe: the Vernica prefix-filter + df-cap hybrid, generalized in
    * [[JaccardJoin.exactPairs]] (see there for the linear-shape
    * argument and the adaptive low-skew fast path). Every pair with
    * J ≥ θ is reported with its exact Jaccard. */
  def d4Jaccard(s: SparkSession, dir: String, threshold: Double = 0.5,
                dfCap: Long = 1000L, reclaim: Boolean = true): DataFrame = {
    val docs = Tables.documents(s, dir)
    JaccardJoin.exactPairs(
        shingleRows(docs).select(col("doc_id").as("id"), col("g").as("item")),
        threshold, dfCap, reclaim)
      .select(col("id1"), col("id2"), Num.roundTies(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Prefix-filtered candidate pairs (id1 < id2) from shingle rows:
    * every pair with Jaccard ≥ threshold is included (the prefix-
    * filtering guarantee); frequent shingles rank into the un-indexed
    * suffix and never join. Thin shingle-named adapter over
    * [[JaccardJoin.candidates]]. */
  def prefixCandidates(sh: DataFrame, sizes: DataFrame, freq: DataFrame,
                       threshold: Double): DataFrame =
    JaccardJoin.candidates(
      sh.select(col("doc_id").as("id"), col("g").as("item")),
      sizes.select(col("doc_id").as("id"), col("n")),
      freq.select(col("g").as("item"), col("df")),
      threshold)

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
  def minhashSignatures(docs: DataFrame, k: Int = 64): DataFrame =
    minhashSignaturesOfShingles(shingleRows(docs), k)

  /** [[minhashSignatures]] over an ALREADY-SHINGLED (doc_id, g) frame —
    * lets a pipeline that also needs the shingles for verification
    * (d2) derive both stages from ONE persisted shingle frame instead
    * of shingling the corpus twice. */
  def minhashSignaturesOfShingles(sh: DataFrame, k: Int = 64): DataFrame = {
    val ex = sh
      .select(col("doc_id"), pmod(xxhash64(col("g")), lit(MinhashPrime)).as("h"))
    val aggs = (0 until k).map { i =>
      val (a, b) = minhashParams(i)
      min(pmod(col("h") * lit(a) + lit(b), lit(MinhashPrime))).as(s"h$i")
    }
    ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** D7 — near-dup CLUSTER assignment: connected components over the
    * verified exact-Jaccard pairs (D4), every member labeled with its
    * cluster's min doc_id. This is the transitive closure
    * `Curation.curate` applies implicitly (dropping `id2` of every
    * pair keeps exactly each cluster's min); materializing it gives
    * the cluster→members map a curation report needs. Only documents
    * that belong to some near-dup pair appear (singletons are not
    * clusters). Scale: pair count is bounded by the D4 hybrid
    * (Σdf² ≤ dfCap·|rows|); CC is min-label propagation over that
    * pair graph — O(cluster diameter) rounds, and near-dup clusters
    * are shallow (most are stars around a template). */
  def d7DupClusters(s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val pairs = d4Jaccard(s, dir, threshold)
    graft.graph.GraphOps.connectedComponents(
        pairs.select(col("id1").as("src"), col("id2").as("dst")))
      .select(col("id").as("doc_id"), col("component").as("cluster"))
      .orderBy(col("doc_id"))
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
                   threshold: Double = 0.5, bucketCap: Int = 1000): DataFrame = {
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
    // Persist policy — MEASURED, not assumed (sf0.1, local[32], min of
    // 4 cold runs): streaming the shingle explode straight into the
    // 64-way signature aggregation (one whole-stage-codegen pipeline,
    // nothing materialized) = 3.9-4.1 s; persisting the full shingle
    // frame to "share" it with verification = 7.3-17 s (the explode is
    // ~|corpus|×shingles rows — materializing it into the block store
    // costs far more than verification's re-shingle, which touches
    // only candidate docs via a semi-join); persisting the collapsed
    // docs frame instead = 6.2-12 s. So: NO corpus-sized persist; the
    // only cache is the tiny candidate pair frame, which verification
    // references three times (both id sides + the pair join). Reclaimed
    // behind the (tiny) verified pair list.
    val cand = d2Candidates(docs, k, bands, bucketCap).persist()
    // verifyJaccard materializes its result eagerly (reclaiming its own
    // shingle borrow), so the candidate cache can be released directly
    val out = verifyJaccard(docs, cand, threshold)
    cand.unpersist()
    out
  }

  /** LSH candidate pairs with the degenerate-bucket guard (SURVEY §5).
    *
    * Buckets of size ≤ bucketCap emit all pairs (the normal LSH path).
    * A DEGENERATE bucket (> bucketCap members — a near-identical
    * boilerplate cluster that the exact-dup collapse can't remove,
    * since the texts differ slightly) would emit O(b²) pairs per band;
    * instead its members are STAR-LINKED to the bucket's minimum
    * doc_id: O(b) candidates, and every member still gets exactly
    * verified against a representative — which is precisely what a
    * keep/drop curation decision needs (members of a boilerplate
    * cluster collapse onto the representative rather than onto each
    * other). Pair semantics on non-degenerate corpora are unchanged.
    */
  def d2Candidates(docs: DataFrame, k: Int = 64, bands: Int = 16,
                   bucketCap: Int = 1000): DataFrame =
    d2CandidatesOfShingles(shingleRows(docs), k, bands, bucketCap)

  /** [[d2Candidates]] over an already-shingled (doc_id, g) frame. */
  def d2CandidatesOfShingles(sh: DataFrame, k: Int = 64, bands: Int = 16,
                             bucketCap: Int = 1000): DataFrame = {
    val rows = k / bands
    val sigs = minhashSignaturesOfShingles(sh, k)
    val banded = sigs.select(col("doc_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bh"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bh"))
    // bucket size + representative in one pass; a degenerate bucket
    // lands in a single window task but costs O(b), not O(b²)
    val bw = Window.partitionBy(col("band"), col("bh"))
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(bw))
      .withColumn("bmin", min(col("doc_id")).over(bw))
    val small = sized.filter(col("bsz") <= bucketCap)
    val pairsSmall = small.alias("x").join(small.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
    val pairsLarge = sized
      .filter(col("bsz") > bucketCap && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("id1"), col("doc_id").as("id2"))
    pairsSmall.unionByName(pairsLarge).distinct()
  }

  /** Exact-Jaccard verification of candidate pairs (set counts via
    * shingle rows — identical math to array intersect/union). The
    * candidate-doc shingle frame is borrowed for the three downstream
    * references and reclaimed behind the (tiny) verified pair list. */
  def verifyJaccard(docs: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val ids = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    val sh = shingleRows(docs.join(ids, Seq("doc_id"), "left_semi")).persist()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    graft.Borrow.reclaim(jaccardOf(cand, sh, sizes, threshold), sh)
  }

  /** [[verifyJaccard]] over an already-shingled (doc_id, g) frame
    * (expected persisted by the caller — each of the three downstream
    * references re-applies only the cheap candidate-id semi-join). */
  def verifyJaccardOfShingles(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val ids = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    val shc = sh.join(ids, Seq("doc_id"), "left_semi")
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    jaccardOf(cand, shc, sizes, threshold)
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
    * filter.
    *
    * Chunk buckets get the same degenerate-bucket guard as D2
    * ([[d2Candidates]]): a near-identical cluster whose texts differ
    * only OUTSIDE a chunk lands all b members in one (chunk, value)
    * bucket — the exact-dup collapse can't remove it (texts differ) and
    * the self-join would emit O(b²) pairs. Buckets > bucketCap instead
    * STAR-LINK members to the bucket's minimum doc_id: O(b) candidates,
    * every member still exactly Hamming-verified against the
    * representative — the keep/drop shape curation needs. Pair
    * semantics on non-degenerate corpora are unchanged. */
  def d3Simhash(s: SparkSession, dir: String, maxHamming: Int = 3,
                bucketCap: Int = 1000): DataFrame = {
    // same representative collapse as D2: exact duplicates share a
    // simhash by construction and would explode the chunk buckets
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    val docs = Tables.documents(s, dir)
      .withColumn("text_hash", md5(norm(col("text"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("text_hash", "rn")
    val sigs = simhash(docs).persist()
    graft.Borrow.reclaim(d3SimhashPairs(sigs, maxHamming, bucketCap), sigs)
  }

  /** Chunk-banded Hamming pairs over a (doc_id, simhash) frame —
    * the candidate + verify core of [[d3Simhash]], parameterized so the
    * degenerate-cluster fixture can drive it directly. */
  def d3SimhashPairs(sigs: DataFrame, maxHamming: Int = 3,
                     bucketCap: Int = 1000): DataFrame = {
    val chunked = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFF).as("cv"))): _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.cv"))
    // bucket size + (min doc_id, its simhash) representative in one
    // window pass; a degenerate bucket costs O(b), not O(b²)
    val bw = Window.partitionBy(col("chunk"), col("cv"))
    val sized = chunked
      .withColumn("bsz", count(lit(1)).over(bw))
      .withColumn("rep", min(struct(col("doc_id"), col("simhash"))).over(bw))
    val popcount = (x: org.apache.spark.sql.Column) => bit_count(x)
    val small = sized.filter(col("bsz") <= bucketCap)
    val pairsSmall = small.alias("x").join(small.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        popcount(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
    val pairsLarge = sized
      .filter(col("bsz") > bucketCap && col("doc_id") =!= col("rep.doc_id"))
      .select(col("rep.doc_id").as("id1"), col("doc_id").as("id2"),
        popcount(col("rep.simhash").bitwiseXOR(col("simhash"))).as("hamming"))
    pairsSmall.unionByName(pairsLarge)
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  /** D5 — embedding-cosine near-dup pairs, the SCALE PATH: candidates
    * from multi-table random-hyperplane LSH (the same sign-bit sketch
    * family as [[Similarity.e2AnnTopK]] — a pair only joins if it
    * shares a (table, bucket) cell in any of `ntables` independent
    * tables), then EXACT cosine verification, so precision is 1.0 and
    * recall follows the hyperplane-LSH collision curve
    * p = (1 − θ/π)^nbits per table.
    *
    * Parameter note: the defaults (nbits=4, ntables=12) are tuned to
    * the synthetic corpus's similarity ceiling (max pairwise
    * cos ≈ 0.5; threshold 0.4 ⇒ per-bit collision ≈ 0.63, per-pair
    * recall ≈ 0.9). At the PRODUCTION near-dup operating point
    * (θ ≥ 0.95 ⇒ per-bit ≈ 0.9) the economics invert: nbits=12-16
    * gives thousands of buckets per table with per-pair recall ≥ 0.93
    * at ntables=8 — candidates collapse to near-linear. The spec
    * pins both regimes; [[d5EmbDupExact]] is the brute-force oracle
    * twin (O(n²) — NOT for production corpora). */
  def d5EmbDup(s: SparkSession, dir: String, threshold: Double = 0.4,
               nbits: Int = 4, ntables: Int = 12): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val cand = d5Candidates(e, nbits, ntables)
    val out = cand
      .join(e.select(col("vec_id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(e.select(col("vec_id").as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("cos", graft.functions.VectorFunctions.cosine_sim(s, col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("id1"), col("id2"))
    graft.Borrow.reclaim(out, e)
  }

  /** Candidate pairs (id1 < id2) sharing an LSH bucket in ≥ 1 of
    * `ntables` hyperplane tables, over a frame with (vec_id, v). */
  def d5Candidates(e: DataFrame, nbits: Int, ntables: Int): DataFrame = {
    val banded = e.select(col("vec_id"),
        explode(array((0 until ntables).map(t =>
          struct(lit(t).as("tbl"),
            Similarity.lshBucket(col("v"), nbits, planeSeed = t * 1000).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    banded.alias("x").join(banded.alias("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id1"), col("y.vec_id").as("id2"))
      .distinct()
  }

  /** D5 variant — SimHash-BAND candidates: ONE 64-bit sign sketch per
    * vector ([[Similarity.lshBucket]] with 64 planes), banded into
    * `bands` chunks — [[d3Simhash]]'s text scheme applied to the
    * embedding space. Candidates share at least one identical chunk.
    *
    * The recall condition is DETERMINISTIC on the sketch: a pair whose
    * sketches differ in ≤ bands-1 bits MUST share a chunk (pigeonhole),
    * where the multi-table variant ([[d5EmbDup]]) offers only a union
    * of independent per-table probabilities. At the production θ ≥ 0.9
    * operating point each bit flips with p = acos(θ)/π ≤ 0.144, so
    * near-dup sketches concentrate within a few bits of each other.
    * Same exact cosine verification; candidates bounded by chunk-
    * bucket sizes (2^(64/bands) buckets per band). */
  def d5EmbDupSimhash(s: SparkSession, dir: String, threshold: Double = 0.4,
                      bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val chunkBits = 64 / bands
    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val banded = e
      .withColumn("sk", Similarity.lshBucket(col("v"), 64))
      .select(col("vec_id"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("sk"), b * chunkBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "chunk")))
    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id1"), col("y.vec_id").as("id2"))
      .distinct()
    val out = cand
      .join(e.select(col("vec_id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(e.select(col("vec_id").as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("cos", graft.functions.VectorFunctions.cosine_sim(s, col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos_sim"))
      .orderBy(col("id1"), col("id2"))
    graft.Borrow.reclaim(out, e)
  }

  /** D5 exact twin — brute-force all-pairs cosine. Oracle-checkable
    * (DuckDB `list_cosine_similarity`) and the recall reference for
    * [[d5EmbDup]]'s LSH path; O(n²), small corpora only. */
  def d5EmbDupExact(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
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

  /** D-suite recall/subset gate (r10): per-round floors on the
    * LSH/banded near-dup paths vs their exact twins — the e_recall
    * pattern for dedup. Each approximate path must (a) stay a SUBSET
    * of its exact twin (banding only prunes, the verify step re-ranks
    * exactly) and (b) clear a recall floor just under the measured
    * values (d2 1.0/0.94, d5-LSH 0.88/0.90, d5-simhash-band 0.20/0.23
    * at sf0.01/sf0.1 — the simhash-band variant is LOW by design at
    * this θ, the pigeonhole bound only bites near θ=0.9). All paths
    * are hash-deterministic, so a dip means a changed banding/pruning
    * path, never noise. Oracle pins six 1s. */
  def dRecallGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id1").cast("long"), col("id2").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d4 = pairSet(d4Jaccard(s, dir))
    val d2 = pairSet(d2MinhashLsh(s, dir))
    val exact5 = pairSet(d5EmbDupExact(s, dir))
    val lsh5 = pairSet(d5EmbDup(s, dir))
    val sim5 = pairSet(d5EmbDupSimhash(s, dir))
    def flags(approx: Set[(Long, Long)], exact: Set[(Long, Long)],
              floor: Double): (Long, Long) = (
      if (exact.nonEmpty && (approx & exact).size.toDouble / exact.size >= floor) 1L else 0L,
      if (approx.subsetOf(exact)) 1L else 0L)
    val (r2, s2) = flags(d2, d4, 0.85)
    val (r5, s5) = flags(lsh5, exact5, 0.8)
    val (r5s, s5s) = flags(sim5, exact5, 0.15)
    Seq((r2, s2, r5, s5, r5s, s5s)).toDF(
      "d2_recall_ok", "d2_subset_ok", "d5lsh_recall_ok", "d5lsh_subset_ok",
      "d5sim_recall_ok", "d5sim_subset_ok")
  }

  /** D9 — SEMANTIC dedup (r14; SemDeDup, Abbas et al. 2023
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embedding space, then treat
    * WITHIN-CLUSTER cosine near-duplicates as one semantic group and
    * keep a single representative per group. The standard
    * embedding-level curation pass document-level dedup cannot see —
    * paraphrases and re-renderings share no shingles but sit on top of
    * each other in embedding space.
    *
    * `vectors` is (id, v: array<double>); `assign` is (id, cluster) —
    * typically [[Similarity.kmeans]]'s output, but pluggable so the
    * dedup half is independently oracle-checkable (the d9_planted
    * gate feeds a closed-form assignment). Groups are the CONNECTED
    * COMPONENTS of the within-cluster ≥ threshold cosine graph (the
    * keep-one-per-group rule needs a canonical group — pairwise
    * greedy orders aren't engine-reproducible); the representative is
    * the smallest id (deterministic, the D1 keeper rule). Returns one
    * row per input id: (id, cluster, action, keeper) with action ∈
    * kept (group representative) | dropped (non-representative group
    * member) | unique (no within-cluster near-dup).
    *
    * Scale shape: candidate pairs are WITHIN-CLUSTER only — exactly
    * SemDeDup's own cost model (the clustering exists to break the
    * O(n²) pair space; k scales with corpus size so clusters stay
    * bounded). The per-cluster pair join is quadratic in the cluster
    * size BY DESIGN, so an oversized cluster is LOUD (`clusterCap`,
    * one groupBy-count probe): the fix is a larger k, never a silent
    * quadratic blowup. Components run on the near-dup pair list
    * (tiny relative to the corpus), ids only. */
  def semDedup(vectors: DataFrame, assign: DataFrame, threshold: Double,
               clusterCap: Long = 100000L): DataFrame = {
    val s = vectors.sparkSession
    val withC = vectors.select(col("id"), col("v"))
      .join(assign.select(col("id"), col("cluster")), Seq("id"))
      .persist()
    val biggest = withC.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0)
    require(biggest.isNullAt(0) || biggest.getLong(0) <= clusterCap,
      s"semDedup: largest cluster has ${biggest.getLong(0)} members, over " +
        s"the quadratic-pair bound ($clusterCap) — raise k on the " +
        "clustering (SemDeDup's own scale lever), not this cap")
    val a = withC.select(col("cluster"), col("id").as("id1"), col("v").as("v1"))
    val b = withC.select(col("cluster"), col("id").as("id2"), col("v").as("v2"))
    val dup = a.join(b, Seq("cluster")).filter(col("id1") < col("id2"))
      .filter(graft.functions.VectorFunctions.cosine_sim(s, col("v1"), col("v2"))
        >= threshold)
      .select(col("id1"), col("id2"))
      .persist()
    dup.count()
    // component = smallest member id (the CC contract) = the keeper
    val comp = graft.graph.GraphOps.connectedComponents(
      dup.select(col("id1").as("src"), col("id2").as("dst")))
    val out = withC.select(col("id"), col("cluster"))
      .join(comp.select(col("id"), col("component").as("keeper")), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        when(col("keeper").isNull, lit("unique"))
          .when(col("keeper") === col("id"), lit("kept"))
          .otherwise(lit("dropped")).as("action"),
        coalesce(col("keeper"), col("id")).as("keeper"))
    graft.Borrow.reclaim(out, withC, dup)
  }

  /** D9 driver row — the full SemDeDup composition on the real
    * embeddings table: [[Similarity.kmeans]] (k = 8, the E7 recipe) →
    * within-cluster cosine groups at the corpus' d5 operating point.
    * Rows-only (kmeans partitions aren't oracle-replayable); the
    * dedup half is hash-gated by [[d9Planted]] and the composition's
    * invariants by [[d9SoundGate]]. */
  def d9SemDedup(s: SparkSession, dir: String, k: Int = 8,
                 threshold: Double = 0.4): DataFrame = {
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val assign = Similarity.kmeans(vecs, k = k, iters = 2)
      .select(col("id"), col("cluster"))
    semDedup(vecs, assign, threshold).orderBy(col("id"))
  }

  /** D9 planted gate — DuckDB-ORACLE-GATED end-to-end check of the
    * dedup half (the d8 synthesis pattern): vectors are SYNTHESIZED
    * from vec_id with closed-form structure — 4 orthogonal one-hot
    * groups (id % 4) plus a tiny deterministic perturbation
    * ((id·31 + j·17) % 7 − 3)/1000, so every same-group cosine is
    * ≥ 0.95 and every cross-group cosine is ≤ 0.05 (margins ~0.05 vs
    * the 0.9 threshold — float-representation differences can't flip
    * a comparison). The assignment is id % 2, which puts TWO groups in
    * each cluster: the θ filter is non-vacuous (cross-group pairs are
    * candidates and fail), groups never span clusters, and the oracle
    * can recompute everything — same vectors, within-cluster pairs,
    * `list_cosine_similarity`, transitive min-id closure — with zero
    * knowledge of the Spark path. Ids with id % 97 = 0 get SINGLETON
    * clusters (id + 2), so the `unique` action is non-vacuous too —
    * guaranteed closed-form, not perturbation-luck. */
  def d9Planted(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.embeddings(s, dir).select(col("vec_id").as("id"))
    val vecs = ids.select(col("id"),
      array((0 until 8).map { j =>
        when(pmod(col("id"), lit(4)) === lit(j), lit(1.0)).otherwise(lit(0.0)) +
          ((col("id") * 31 + lit(j * 17)) % 7 - 3).cast("double") / lit(1000.0)
      }: _*).as("v"))
    val assign = ids.select(col("id"),
      when(pmod(col("id"), lit(97)) === 0, col("id") + 2)
        .otherwise(pmod(col("id"), lit(2))).as("cluster"))
    semDedup(vecs, assign, threshold = 0.9)
      .orderBy(col("id"))
  }

  /** D9 invariant gate (the dRecallGate pattern — flags computed
    * Spark-side from INDEPENDENT recomputations, oracle pins 1s):
    * on the real-corpus composition ([[d9SemDedup]]),
    * (a) every dropped id has a ≥ θ cosine pair in the EXACT all-pairs
    * twin — soundness independent of the clustering;
    * (b) no two kept ids in one cluster are ≥ θ near-dups;
    * (c) an id is unique iff it has NO within-cluster ≥ θ neighbor;
    * (d) exactly one action row per embedding. */
  def d9SoundGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val theta = 0.4
    val out = d9SemDedup(s, dir, threshold = theta)
      .persist()
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val n = vecs.count()
    // exact all-pairs ≥ θ ids (clustering-independent recomputation)
    val exactIds = d5EmbDupExact(s, dir, theta)
      .select(col("id1").as("id")).unionByName(
        d5EmbDupExact(s, dir, theta).select(col("id2").as("id")))
      .distinct().collect().map(_.getLong(0)).toSet
    val acts = out.select(col("id"), col("cluster"), col("action"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val dropped = acts.filter(_._3 == "dropped").map(_._1).toSet
    val soundDrop = dropped.forall(exactIds.contains)
    // within-cluster ≥ θ pairs, recomputed from the raw table
    val withC = vecs.join(out.select(col("id"), col("cluster")), Seq("id"))
    val wcPairs = withC.select(col("cluster"), col("id").as("id1"), col("v").as("v1"))
      .join(withC.select(col("cluster"), col("id").as("id2"), col("v").as("v2")),
        Seq("cluster"))
      .filter(col("id1") < col("id2"))
      .filter(graft.functions.VectorFunctions.cosine_sim(s, col("v1"), col("v2"))
        >= theta)
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = acts.filter(_._3 == "kept").map(_._1).toSet
    val keptValid = !wcPairs.exists(p => kept(p._1) && kept(p._2))
    val paired = wcPairs.flatMap(p => Seq(p._1, p._2)).toSet
    val uniqueIffUnpaired = acts.forall { case (id, _, act) =>
      (act == "unique") == !paired(id) }
    val coverage = acts.length.toLong == n && acts.map(_._1).distinct.length == acts.length
    out.unpersist()
    Seq((if (soundDrop) 1L else 0L, if (keptValid) 1L else 0L,
      if (uniqueIffUnpaired) 1L else 0L, if (coverage) 1L else 0L))
      .toDF("d9_sound_ok", "d9_kept_ok", "d9_unique_ok", "d9_cover_ok")
  }

  /** D8 — EXACT cross-document SUBSTRING dedup (r13; Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * repeated-passage pass document-level dedup cannot see: two
    * different documents sharing one verbatim paragraph). Their
    * suffix-array formulation is a single-machine algorithm; the
    * Spark-shaped equivalent here seeds candidates with the F4
    * WINNOWING fingerprints and verifies/extends exactly:
    *
    *  1. char `gram`-gram hashes at every position (one explode, no
    *     HOFs), winnowed with window `window` — any two documents
    *     sharing a substring of length ≥ gram + window − 1 share a
    *     selected fingerprint (the winnowing guarantee), so candidate
    *     recall for matches ≥ `minLen` is EXACT when minLen ≥ that
    *     bound (enforced);
    *  2. fingerprints in more than `dfCap` documents are dropped from
    *     SEEDING (boilerplate chrome — the D4 df-cap rule; Lee et al.
    *     likewise drop super-frequent repeats), everything else joins
    *     doc×doc per fingerprint — bounded by dfCap² per value;
    *  3. candidate (doc1, doc2, offset-delta) alignments re-join the
    *     full gram frames (equi-join on (doc, hash, aligned pos)) and
    *     contiguous matched positions collapse to MAXIMAL spans via a
    *     gaps-and-islands window per alignment (bounded by the match
    *     length, never by the corpus);
    *  4. every span is verified by ONE exact substring comparison
    *     against the two normalized texts — hash collisions cannot
    *     survive to the output.
    *
    * Returns (doc1, doc2, pos1, pos2, match_len): maximal shared
    * substrings of length ≥ minLen, positions 0-based into the
    * NORMALIZED (lower/trim) text. doc1 < doc2. */
  def d8SubstringSpans(docs: DataFrame, gram: Int = 8, window: Int = 16,
                       minLen: Int = 40, dfCap: Long = 100L): DataFrame = {
    require(minLen >= gram + window - 1,
      s"d8: minLen must be >= gram + window - 1 = ${gram + window - 1} " +
        "(the winnowing recall guarantee)")
    val texts = docs.select(col("doc_id"), norm(col("text")).as("t"))
      .filter(length(col("t")) >= gram)
      .persist()
    val grams = texts
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), length(col("t")) - gram)).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("t").substr(col("pos") + 1, lit(gram))).as("h"),
        (length(col("t")) - gram).as("last_start"))
      .persist()
    // winnowed fingerprint VALUES per doc (the F4 selection), then the
    // df-cap over distinct docs per fingerprint
    val wWin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    val selected = grams
      .withColumn("wmin",
        when(col("pos") <= col("last_start") - (window - 1),
          min(col("h")).over(wWin)))
      .filter(col("wmin").isNotNull)
      .select(col("doc_id"), col("wmin").as("h")).distinct()
    // df counts documents CONTAINING the gram (the grams frame, not
    // the winnow-selected sets): window alignment differs per doc, so
    // a boilerplate gram might be SELECTED in only a few docs and slip
    // a selected-set df-cap — corpus df is the principled bound
    val df = grams.select(col("doc_id"), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val seedable = selected.join(df.filter(col("df") <= dfCap), Seq("h"))
      .select(col("doc_id"), col("h"))
    // candidate alignments: all positions of a seed fingerprint in both
    // docs → (doc1, doc2, delta); doc-unique grams never cross-join
    val posOf = grams.join(seedable, Seq("doc_id", "h"), "left_semi")
      .select(col("doc_id"), col("pos"), col("h"))
    val aligns = posOf.alias("x").join(posOf.alias("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        (col("y.pos") - col("x.pos")).as("delta"))
      .distinct()
      .persist()
    // exact extension: every gram pair matching under the alignment,
    // collapsed to contiguous runs (gaps-and-islands per alignment)
    val g1 = grams.select(col("doc_id").as("doc1"), col("pos").as("pos1"), col("h"))
    val g2 = grams.select(col("doc_id").as("doc2"), col("pos").as("pos2"),
      col("h").as("h2"))
    val matched = aligns
      .join(g1, Seq("doc1"))
      .join(g2, aligns("doc2") === g2("doc2") && col("h2") === col("h") &&
        col("pos2") === col("pos1") + col("delta"))
      .select(col("doc1"), aligns("doc2").as("doc2"), col("delta"), col("pos1"))
    val wIsle = Window.partitionBy(col("doc1"), col("doc2"), col("delta"))
      .orderBy(col("pos1"))
    val spans = matched
      .withColumn("grp", col("pos1") - row_number().over(wIsle))
      .groupBy(col("doc1"), col("doc2"), col("delta"), col("grp"))
      .agg(min(col("pos1")).as("pos1"), count(lit(1)).as("run"))
      .withColumn("match_len", col("run") + lit(gram - 1))
      .filter(col("match_len") >= minLen)
      .select(col("doc1"), col("doc2"), col("pos1"),
        (col("pos1") + col("delta")).as("pos2"), col("match_len"))
    // collision guard: one exact substring comparison per span
    val out = spans
      .join(texts.select(col("doc_id").as("doc1"), col("t").as("t1")), Seq("doc1"))
      .join(texts.select(col("doc_id").as("doc2"), col("t").as("t2")), Seq("doc2"))
      .filter(col("t1").substr(col("pos1") + 1, col("match_len")) ===
        col("t2").substr(col("pos2") + 1, col("match_len")))
      .select(col("doc1"), col("doc2"), col("pos1").cast("long").as("pos1"),
        col("pos2").cast("long").as("pos2"),
        col("match_len").cast("long").as("match_len"))
    graft.Borrow.reclaim(out, texts, grams, aligns)
  }

  /** D8a — substring-dedup APPLY (r15): compose [[d8SubstringSpans]]
    * into the actual deduplicated corpus — the Lee et al. 2022 output
    * the span finder alone never produced. Policy (theirs): for every
    * cross-document repeated span, KEEP the earliest document's copy
    * (doc1 < doc2 canonical, so doc1's occurrence survives) and CUT
    * the later document's. A document repeated against several earlier
    * ones loses the UNION of its matched intervals.
    *
    * Plan shape: spans → per-doc removal intervals → one
    * gaps-and-islands merge (running max end per doc — interval count
    * is span count, never corpus size) → ONE codegen'd HOF pass
    * (`aggregate` over the sorted interval array) that splices each
    * text, cursor-style, in a single projection — no UDF, no
    * per-interval string rebuilds. Returns (doc_id, text) over the
    * NORMALIZED text (the span positions' coordinate system). Every
    * input document appears exactly once. */
  def d8Apply(docs: DataFrame, gram: Int = 8, window: Int = 16,
              minLen: Int = 40, dfCap: Long = 100L): DataFrame = {
    val spans = d8SubstringSpans(docs, gram, window, minLen, dfCap)
    val ivs = spans.select(col("doc2").as("doc_id"), col("pos2").as("s"),
      (col("pos2") + col("match_len")).as("e"))
    // merge overlapping/touching intervals per doc
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val isles = ivs
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("fresh",
        when(col("pmax").isNull || col("s") > col("pmax"), 1).otherwise(0))
      .withColumn("isle", sum(col("fresh")).over(wOrd))
      .groupBy(col("doc_id"), col("isle"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val cutLists = isles.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("cuts"))
    // splice: walk the sorted intervals once, emitting the kept slices
    val spliced = aggregate(col("cuts"),
      struct(lit(0L).as("cur"), lit("").as("acc")),
      (acc, iv) => struct(
        iv.getField("e").as("cur"),
        concat(acc.getField("acc"),
          col("t").substr((acc.getField("cur") + 1).cast("int"),
            (iv.getField("s") - acc.getField("cur")).cast("int"))).as("acc")),
      acc => concat(acc.getField("acc"),
        col("t").substr((acc.getField("cur") + 1).cast("int"), length(col("t")))))
    docs.select(col("doc_id"), norm(col("text")).as("t"))
      .join(cutLists, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("cuts").isNull, col("t")).otherwise(spliced).as("text"))
  }

  /** The passage the D8 gate plants (shared with the oracle's closed
    * form — its length is the span floor the gate filters on). */
  private[graft] val d8Passage: String =
    " the quick brown fox jumps over the lazy dog again and again across documents"

  /** D8 driver gate — the synthetic corpus carries no cross-document
    * repeats, so the gate SYNTHESIZES them (the f9 pattern): doc-unique
    * filler (every 8-gram contains the doc_id, so fillers never match
    * across documents) with a fixed passage planted into doc_id ≡ 0
    * (mod 97). The full D8 pipeline — winnowing seeds, alignment,
    * island extension, exact verify — then reports exactly one
    * passage-length span per planted PAIR; the DuckDB twin recomputes
    * the pair set from the construction (choose-2 over the planted
    * ids). Span boundaries extend by the pairs' shared filler
    * punctuation, so the gate compares the pair list + the
    * span-count-at-threshold, which the construction fixes. */
  def d8Substr(s: SparkSession, dir: String): DataFrame = {
    val planted = col("doc_id") % 97 === 0
    val filler = (m: String) =>
      repeat(concat(lit(s" $m"), col("doc_id").cast("string"), lit("x ")), 6)
    val synth = Tables.documents(s, dir)
      .select(col("doc_id"), concat(
        filler("f"),
        when(planted, lit(d8Passage)).otherwise(lit("")),
        filler("h")).as("text"))
    d8SubstringSpans(synth, gram = 8, window = 16, minLen = 40)
      .filter(col("match_len") >= d8Passage.length)
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("n_long"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** D8a driver gate (r15) — the d8Substr corpus with one change that
    * makes the OUTPUT TEXT closed-form: a per-doc GUARD char
    * (chr(97 + doc_id/97), unique while doc_id/97 < 26 — hence the
    * plant cap) flanks the passage on both sides, so no planted pair
    * shares a boundary char and the maximal cross-doc span is EXACTLY
    * the passage. Lee et al. policy then fixes the whole corpus: the
    * earliest planted doc keeps its copy, every other planted doc has
    * precisely the passage cut, everything else is untouched — which
    * the DuckDB twin recomputes with one replace(). Hashes keep the
    * row payload small. */
  def d8ApplyGate(s: SparkSession, dir: String): DataFrame = {
    val planted = col("doc_id") % 97 === 0 && col("doc_id") < lit(97 * 26)
    val guard = expr("chr(97 + CAST(doc_id / 97 AS INT))")
    val filler = (m: String) =>
      repeat(concat(lit(s" $m"), col("doc_id").cast("string"), lit("x ")), 6)
    val synth = Tables.documents(s, dir)
      .select(col("doc_id"), concat(
        filler("f"),
        when(planted, concat(guard, lit(d8Passage), guard)).otherwise(lit("")),
        filler("h")).as("text"))
    d8Apply(synth, gram = 8, window = 16, minLen = 40)
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .orderBy(col("doc_id"))
  }
}
