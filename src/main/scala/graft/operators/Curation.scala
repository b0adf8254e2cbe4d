package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** End-to-end training-data curation: the composed pipeline a corpus
  * actually goes through before tokenization —
  *
  *   quality gate → exact dedup → near-dedup (MinHash-LSH) → language
  *   routing — emitting one decision row per document with the reason
  *   it was kept or dropped.
  *
  * Every stage is one of the §2 operators; the composition is itself
  * shuffle-bounded (no stage re-reads the corpus more than once).
  */
object Curation {

  /** Decision frame: (doc_id, lang, keep, reason). Reasons:
    * kept | low_quality | exact_dup | near_dup. */
  def curate(s: SparkSession, dir: String,
             minQuality: Double = 0.3,
             nearDupThreshold: Double = 0.8,
             nearDup: Boolean = true): DataFrame = {
    val docs = Tables.documents(s, dir)

    // 1. quality gate (same integer-exact score as F2)
    val w = split(lower(trim(col("text"))), "\\s+")
    val n = size(w).cast("long")
    val d = size(array_distinct(w)).cast("long")
    val st = size(filter(w, x => x === "the" || x === "a")).cast("long")
    val qNum = lit(4L) * least(n, lit(100L)) * n + lit(400L) * d + lit(200L) * st
    val qDen = lit(1000L) * n
    val quality = floor((qNum * lit(20000L) + qDen) / (qDen * lit(2L))) / lit(10000.0)
    val scored = docs.select(col("doc_id"), col("lang"), col("text"),
      quality.as("quality")).persist()

    val lowQ = scored.filter(col("quality") < minQuality)
      .select(col("doc_id"), col("lang"), lit(false).as("keep"), lit("low_quality").as("reason"))
    val qualified = scored.filter(col("quality") >= minQuality)

    // 2. exact dedup: keep min doc_id per normalized text
    val wh = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    val hashed = qualified
      .withColumn("text_hash", md5(lower(trim(col("text")))))
      .withColumn("rn", row_number().over(wh)).persist()
    val exactDups = hashed.filter(col("rn") > 1)
      .select(col("doc_id"), col("lang"), lit(false).as("keep"), lit("exact_dup").as("reason"))
    val reps = hashed.filter(col("rn") === 1)

    // 3. near-dedup among representatives: drop the larger id of each
    // verified near-dup pair (transitive chains collapse to the smallest
    // id). No corpus-sized persist: the shingle explode streams into
    // the signature aggregation and verification re-shingles only
    // candidate docs — measured ~2× cheaper than sharing a persisted
    // shingle frame (see Dedup.d2MinhashLsh's persist-policy note);
    // reps reads the already-persisted `hashed` frame either way.
    // `nearDup = false` runs the quality + exact-dedup prefix only —
    // every stage then has a SQL closed form, which is what the
    // p1_curate_sql gate hash-checks (the LSH stage itself carries the
    // d_recall gate + specs)
    val (nearDups, kept) = if (nearDup) {
      val cand = lshCandidates(reps.select(col("doc_id"), col("text")))
      // verifyJaccard is eager (it reclaims its own shingle borrow), so
      // the candidate cache can be released as soon as pairs exist
      val pairs = Dedup.verifyJaccard(
        reps.select(col("doc_id"), col("text")), cand, nearDupThreshold)
      cand.unpersist()
      val nearDupIds = pairs.select(col("id2").as("doc_id")).distinct()
      (reps.join(nearDupIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"), lit(false).as("keep"), lit("near_dup").as("reason")),
       reps.join(nearDupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), lit(true).as("keep"), lit("kept").as("reason")))
    } else {
      (reps.limit(0)
        .select(col("doc_id"), col("lang"), lit(false).as("keep"), lit("near_dup").as("reason")),
       reps.select(col("doc_id"), col("lang"), lit(true).as("keep"), lit("kept").as("reason")))
    }

    val out = lowQ.unionByName(exactDups).unionByName(nearDups).unionByName(kept)
      .orderBy(col("doc_id"))
    // the decision frame is the operator's actual output (one narrow
    // row per document) — materializing it once is what the caller's
    // first action pays anyway; the corpus-derived caches then release
    graft.Borrow.reclaim(out, scored, hashed)
  }

  /** P2 — deterministic train/val/test split, stratified reporting.
    *
    * Split assignment hashes the document's stable identity (md5 of the
    * id — NOT Bernoulli sampling, whose outcome depends on row order and
    * partitioning): the first hex digit buckets 16 ways → 12/2/2 =
    * 75% / 12.5% / 12.5%. Every engine that can md5 reproduces the
    * exact same split, so train/val leakage checks are replayable and
    * re-runs at any scale or partitioning are stable. Returns per
    * (lang, split) document counts and mean quality-relevant stats. */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val digit = substring(md5(col("doc_id").cast("string")), 1, 1)
    val split_ = when(digit.isin("c", "d"), "val")
      .when(digit.isin("e", "f"), "test")
      .otherwise("train")
    docs
      .withColumn("split", split_)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("lang"), col("split"))
  }

  /** P3 — deterministic per-stratum sampling: the k documents per
    * language with the smallest md5(doc_id) — a uniform-at-random
    * sample under the hash, but reproducible on any engine, any
    * partitioning, any run (a `sample()` call is none of those).
    * The balanced-subsampling primitive for mixing corpora.
    *
    * TWO-STAGE top-k: stage 1 takes the per-(input-partition, lang)
    * top k (parallelism = partitions × strata, so no stratum sorts the
    * whole corpus through one task — the low-cardinality-window trap);
    * stage 2 merges the ≤ k·P survivors per stratum, a bounded frame
    * regardless of corpus size. Same output as the one-window
    * formulation (top-k of a union = top-k of per-part top-k's). */
  def stratifiedSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid"), col("lang"))
      .orderBy(col("h"), col("doc_id"))
    val pruned = base
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= k)
      .drop("lrk", "pid")
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    pruned
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk").cast("int").as("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  /** P5 — deterministic weighted Bernoulli sampling: each document is
    * kept with probability min(n_chars, cap)/cap (longer documents
    * up-weighted, the usual quality-proportional mixing move), decided
    * by comparing a fixed-width hex slice of md5(doc_id) against an
    * integer threshold — NOT rand(), whose outcome depends on
    * partitioning and run. Lexicographic order on fixed-width
    * lowercase hex equals numeric order, so both engines compare
    * strings and never convert hex to int. The threshold is
    * floor(min(n_chars,cap)·65536/cap): an exact integer (the product
    * is < 2⁵³, and a quotient of integers is never within double-ulp
    * of a wrong floor at this magnitude), so DuckDB's integer `//`
    * reproduces it bit-for-bit. Pure per-row arithmetic — one scan,
    * no shuffle. */
  def p5WeightedSample(s: SparkSession, dir: String, cap: Long = 400L): DataFrame = {
    val thr = lpad(lower(hex(floor(least(col("n_chars"), lit(cap)) * lit(65536L)
      / lit(cap.toDouble)).cast("long"))), 4, "0")
    val u = substring(md5(col("doc_id").cast("string")), 1, 4)
    Tables.documents(s, dir)
      .filter(col("n_chars") >= cap || u < thr)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** P7 — DSIR importance weights (r15; Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how target-like it looks under two
    * bag-of-hashed-n-grams unigram models,
    *
    *   log w(x) = Σ_features c_b(x) · (ln p̂_target(b) − ln p̂_raw(b)),
    *
    * features = word unigrams + bigrams hashed into `buckets` buckets,
    * both models add-α smoothed ((c_b + α) / (total + α·buckets)).
    * Selection then resamples by weight ([[dsirResample]]).
    *
    * Scale shape: one explode over corpus tokens (linear), two
    * bounded aggregations (≤ `buckets` rows each — the model is a
    * FIXED-SIZE frame by construction, broadcast-joined back), one
    * per-doc sum. No shuffle keyed on anything unbounded except the
    * doc_id aggregation the result itself requires.
    *
    * `bucketOf` defaults to xxhash64 mod buckets (codegen, fast path);
    * the sql gate passes an md5-hex-prefix bucketing both engines
    * spell identically (the P5 convention). α defaults to 1 (Laplace). */
  def dsirLogWeights(docs: DataFrame, targetDocs: DataFrame,
                     buckets: Int = 8192, alpha: Double = 1.0,
                     bucketOf: Option[Column => Column] = None): DataFrame = {
    val bucket = bucketOf.getOrElse((g: Column) => pmod(xxhash64(g), lit(buckets)))
    def grams(d: DataFrame): DataFrame = {
      val toks = split(lower(trim(col("text"))), "\\s+")
      val uni = d.select(col("doc_id"), explode(toks).as("g"))
      val bi = d.select(col("doc_id"),
        explode(zip_with(slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("g"))
      uni.unionByName(bi).select(col("doc_id"), bucket(col("g")).as("b"))
    }
    val raw = grams(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val tgt = grams(targetDocs)
    val rc = raw.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tc = tgt.groupBy(col("b")).agg(count(lit(1)).as("ct"))
    // model = one fixed-size (≤ `buckets`-row) frame; the two corpus
    // totals are driver scalars read via count() and folded into the
    // llr as literals — two 1-row actions against the cached gram
    // frames, deterministic, no extra shuffle
    val totR = raw.count().toDouble
    val totT = tgt.count().toDouble
    val denomR = math.log(totR + alpha * buckets)
    val denomT = math.log(totT + alpha * buckets)
    val model = rc.join(tc, Seq("b"), "left")
      .select(col("b"),
        (log(coalesce(col("ct"), lit(0L)) + alpha) - lit(denomT)
          - log(col("cr") + alpha) + lit(denomR)).as("llr"))
    val out = raw.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("llr")).as("log_weight"))
    graft.Borrow.reclaim(out, raw)
  }

  /** P7 resampling tail: deterministic Gumbel top-k over the DSIR
    * log-weights — the paper's sampling-without-replacement trick
    * (key = log w + Gumbel noise; top-k by key ≡ weighted sampling),
    * with the noise derived from md5(doc_id, seed) instead of rand()
    * (the P5 house rule: partitioning can never change the draw).
    * u ∈ (0,1) from a 4-hex slice (midpoint-offset so u is never 0 or
    * 1); key = logw − ln(−ln u). Returns the k kept (doc_id,
    * log_weight) rows. */
  def dsirResample(logWeights: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":"), lit(seed))), 1, 4), 16, 10).cast("double") + 0.5) / 65536.0
    logWeights
      .withColumn("gkey", col("log_weight") - log(-log(u)))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("log_weight"))
  }

  /** P7 driver gate: weights over the testdata corpus with target =
    * the English subset, md5-hex bucketing (256 buckets) so DuckDB
    * replays the exact model arithmetic. */
  def p7Dsir(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val out = dsirLogWeights(docs, docs.filter(col("lang") === "en"),
      buckets = 256, alpha = 1.0,
      bucketOf = Some((g: Column) => substring(md5(g), 1, 2)))
    out.select(col("doc_id"),
        graft.operators.Num.roundTies(col("log_weight"), 4).as("log_weight"))
      .orderBy(col("doc_id"))
  }

  /** P8 (r16) — the CCNet-composed curation pass (Wenzek et al. 2020):
    * language-ID (F3's closed-form marker heuristic) → per-language
    * perplexity bucketing under the F11 Kneser-Ney LM (head / middle /
    * tail terciles — CCNet's actual quality signal) → the P7 DSIR
    * log-weight riding along for downstream resampling. One decision
    * row per document: drop reasons `lang_unknown` (no marker fired)
    * then `ppl_tail` (worst tercile); everything else keeps.
    *
    * Bucketing is VALUE-threshold based (all docs sharing the boundary
    * perplexity land in the same bucket — deterministic and
    * partition-invariant): the tercile thresholds come from a
    * VALUE-LEVEL cumulative count (group by (lang, rounded ppl), then
    * a window over the distinct-value rows — the B43 H-index
    * value-grouping trick), never a per-language window over the
    * corpus (the low-cardinality-window trap); distinct rounded
    * perplexities bound the window input at any corpus size. */
  def p8Ccnet(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // F3's marker heuristic, per doc (closed form, oracle-replayable)
    val w = split(lower(trim(col("text"))), "\\s+")
    def mk(m: String) = size(filter(w, x => x === m)).cast("long")
    val en = mk("the"); val de = mk("data"); val es = mk("spark")
    val fr = mk("query"); val zh = mk("vector")
    val top = greatest(en, de, es, fr, zh)
    val pred = when(en === top, "en").when(de === top, "de")
      .when(es === top, "es").when(fr === top, "fr").otherwise("zh")
    val lid = docs.select(col("doc_id"), pred.as("pred_lang"),
      (top > 0).cast("int").as("lang_known"))
    // F11 perplexity (corpus-trained KN, order 3 — the f11 recipe)
    val ppl = graft.operators.TextAnalysis
      .kneserNeyPerplexity(docs, docs, n = 3, discount = 0.75)
      .select(col("doc_id"), Num.roundTies(col("ppl"), 2).as("ppl"))
    // P7 DSIR log-weight (target = English subset, md5 buckets)
    val llw = dsirLogWeights(docs, docs.filter(col("lang") === "en"),
        buckets = 256, alpha = 1.0,
        bucketOf = Some((g: Column) => substring(md5(g), 1, 2)))
      .select(col("doc_id"), Num.roundTies(col("log_weight"), 4).as("log_weight"))
    val joined = lid.join(ppl, Seq("doc_id")).join(llw, Seq("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-language tercile thresholds from value-level cumulative
    // counts: t1 = smallest ppl with cum ≥ ⌈n/3⌉, t2 with ⌈2n/3⌉
    val vals = joined.groupBy(col("pred_lang"), col("ppl"))
      .agg(count(lit(1)).as("c"))
    val wl = Window.partitionBy(col("pred_lang")).orderBy(col("ppl"))
    val wn = Window.partitionBy(col("pred_lang"))
    val cum = vals.withColumn("cum", sum(col("c")).over(wl))
      .withColumn("n", sum(col("c")).over(wn))
    val th = cum.groupBy(col("pred_lang")).agg(
      min(when(col("cum") * 3 >= col("n"), col("ppl"))).as("t1"),
      min(when(col("cum") * 3 >= col("n") * 2, col("ppl"))).as("t2"))
    val out = joined.join(broadcast(th), Seq("pred_lang"))
      .withColumn("ppl_bucket",
        when(col("ppl") <= col("t1"), "head")
          .when(col("ppl") <= col("t2"), "middle").otherwise("tail"))
      .withColumn("keep",
        when(col("lang_known") === 0, 0)
          .when(col("ppl_bucket") === "tail", 0).otherwise(1).cast("int"))
      .withColumn("reason",
        when(col("lang_known") === 0, "lang_unknown")
          .when(col("ppl_bucket") === "tail", "ppl_tail").otherwise("kept"))
      .select(col("doc_id"), col("pred_lang"), col("ppl"), col("ppl_bucket"),
        col("log_weight"), col("keep"), col("reason"))
      .orderBy(col("doc_id"))
    graft.Borrow.reclaim(out, joined)
  }

  /** P4 — token-budget shard packing: documents in doc_id order are
    * packed greedily into shards of ~`budget` whitespace tokens
    * (shard = exclusive-prefix-sum div budget — a document starting
    * before a boundary stays in the earlier shard, the standard
    * streaming-pack rule).
    *
    * The prefix sum is the TWO-PASS distributed formulation, not a
    * global-order window (`Window.orderBy` without partitionBy funnels
    * the whole corpus through ONE task — the classic cumsum scale
    * trap): range-partition by doc_id, per-partition token totals
    * (a few hundred rows) hop to the driver to become cumulative
    * offsets, then each partition computes its local window cumsum +
    * its offset. The exclusive prefix sum — hence the shard layout —
    * is a pure function of doc_id order, so results are identical for
    * ANY partitioning (range boundaries may vary run to run; the
    * output cannot). */
  def packShards(s: SparkSession, dir: String, budget: Long = 2000L): DataFrame = {
    val toks = size(split(lower(trim(col("text"))), "\\s+")).cast("long")
    packShardsFrom(s, Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("n_tokens")), budget)
  }

  /** P4bpe (r16) — TOKENIZER-TRUE shard packing: the P4 prefix-sum
    * pack over F10's BPE token counts (the [[graft.operators
    * .TextAnalysis.f10Merges]] table) instead of whitespace counts —
    * the budget a training run actually meters. Docs whose text yields
    * no BPE tokens pack at weight 0 (they still occupy their doc_id
    * slot). Same two-pass distributed prefix sum; the oracle replays
    * the per-word merge chain AND the pack. */
  def p4ShardsBpe(s: SparkSession, dir: String, budget: Long = 2000L): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = graft.operators.TextAnalysis
      .bpeTokenCount(docs, graft.operators.TextAnalysis.f10Merges)
    packShardsFrom(s, docs.select(col("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens")),
      budget)
  }

  /** The P4 two-pass distributed exclusive prefix sum over a
    * (doc_id, n_tokens) frame. Returns (derived, cache): `derived`
    * carries (doc_id, n_tokens, cum_excl); `cache` is the persisted
    * repartitioned frame the pid→offset map was computed against —
    * the caller unpersists it AFTER materializing its result (pids
    * must not be recomputed under a different range sampling). The
    * prefix sum itself is a pure function of doc_id order, so the
    * OUTPUT is partitioning-invariant. */
  private def prefixSums(s: SparkSession,
                         tokens: DataFrame): (DataFrame, DataFrame) = {
    val sorted = tokens
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist()
    val partials = sorted.groupBy(col("pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partials.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .tail.zip(partials).map { case ((pid, cumIncl), (_, t)) => (pid, cumIncl - t) }
    val offDf = broadcast(s.createDataFrame(offsets.toSeq).toDF("pid", "offset"))
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val derived = sorted.join(offDf, Seq("pid"))
      .withColumn("cum_excl",
        col("offset") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    (derived, sorted)
  }

  private def packShardsFrom(s: SparkSession, tokens: DataFrame,
                             budget: Long): DataFrame = {
    val (sums, cache) = prefixSums(s, tokens)
    val out = sums
      .withColumn("shard", (col("cum_excl") / budget).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
      .persist()
    out.count()
    cache.unpersist()
    out
  }

  /** P9 (r16) — FIXED-LENGTH SEQUENCE PACKING: the layout an LLM
    * pretraining loader actually consumes — the concatenated token
    * stream (doc_id order) chopped into length-`seqLen` sequences,
    * with documents SPLITTING across sequence boundaries (sample
    * packing; the remainder carries into the next sequence). Output
    * is one SPAN per (document × sequence it touches): (doc_id,
    * seq_id, doc_offset, seq_offset, len) — exactly the index a
    * packed-batch reader needs to place each document slice.
    *
    * Shape: the P4 two-pass prefix sum gives each doc its global
    * token interval [cum, cum+n); its spans are the interval split at
    * seqLen multiples — an explode over sequence(firstSeq, lastSeq),
    * ≤ ⌈n/seqLen⌉+1 rows per doc (linear in tokens/seqLen, never
    * corpus-quadratic); every token lands in exactly one span by
    * construction. Zero-token docs emit no span. The whole layout is
    * a pure function of doc_id order — partitioning-invariant,
    * DuckDB-replayable in closed form. */
  def packSequences(s: SparkSession, dir: String,
                    seqLen: Long = 512L): DataFrame = {
    require(seqLen >= 1, s"packSequences: seqLen >= 1, got $seqLen")
    val toks = size(split(lower(trim(col("text"))), "\\s+")).cast("long")
    val (sums, cache) = prefixSums(s, Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("n_tokens")))
    val out = sums.filter(col("n_tokens") > 0)
      .withColumn("first_seq", (col("cum_excl") / seqLen).cast("long"))
      .withColumn("last_seq",
        ((col("cum_excl") + col("n_tokens") - 1) / seqLen).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("cum_excl"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .withColumn("start_tok",
        greatest(col("cum_excl"), col("seq_id") * seqLen))
      .withColumn("end_tok",
        least(col("cum_excl") + col("n_tokens"), (col("seq_id") + 1) * seqLen))
      .select(col("doc_id"), col("seq_id"),
        (col("start_tok") - col("cum_excl")).as("doc_offset"),
        (col("start_tok") - col("seq_id") * seqLen).as("seq_offset"),
        (col("end_tok") - col("start_tok")).as("len"))
      .orderBy(col("doc_id"), col("seq_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    cache.unpersist()
    out
  }

  /** P6 — feature scaling (GDS `gds.scaleProperties` parity, and the
    * standard pre-training feature-normalization pass): appends
    * `<col>_scaled` per input column under one scaler:
    *
    *   minMax   (x−min)/(max−min)        (0 when max = min)
    *   max      x/max(|x|)               (0 when all-zero)
    *   mean     (x−avg)/(max−min)        (0 when max = min)
    *   center   x−avg
    *   stdScore (x−avg)/σ_pop            (0 when σ = 0)
    *   log      ln(x)
    *
    * ONE aggregation pass computes every column's moments together
    * (min/max/Σx/Σx²/n — no per-column job), broadcast back as a
    * 1-row literal join. FLOAT-DETERMINISM: σ comes from the moments
    * formula over Σx/Σx² rather than a streaming stddev, so for
    * integer-valued features every aggregate is EXACT in a double and
    * the scaled value is bit-identical across engines (the oracle
    * recomputes the same closed form); float features get engine-level
    * determinism only (documented, same rule as the F2 score). */
  def scaleProperties(df: DataFrame, cols: Seq[String],
                      scaler: String): DataFrame = {
    require(cols.nonEmpty, "scaleProperties: at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"scaleProperties: no column '$c'"))
    val aggs = cols.flatMap { c =>
      val x = col(c).cast("double")
      Seq(min(x).as(s"__min_$c"), max(x).as(s"__max_$c"),
        max(abs(x)).as(s"__amax_$c"), sum(x).as(s"__sum_$c"),
        sum(x * x).as(s"__sq_$c"), count(x).as(s"__n_$c"))
    }
    val stats = broadcast(df.agg(aggs.head, aggs.tail: _*))
    val joined = df.crossJoin(stats)
    val scaled = cols.foldLeft(joined) { (d, c) =>
      val x = col(c).cast("double")
      val mn = col(s"__min_$c"); val mx = col(s"__max_$c")
      val avg = col(s"__sum_$c") / col(s"__n_$c")
      val varP = col(s"__sq_$c") / col(s"__n_$c") - avg * avg
      val expr = scaler match {
        case "minMax" =>
          when(mx === mn, lit(0.0)).otherwise((x - mn) / (mx - mn))
        case "max" =>
          when(col(s"__amax_$c") === 0.0, lit(0.0))
            .otherwise(x / col(s"__amax_$c"))
        case "mean" =>
          when(mx === mn, lit(0.0)).otherwise((x - avg) / (mx - mn))
        case "center" => x - avg
        case "stdScore" =>
          when(varP <= 0.0, lit(0.0)).otherwise((x - avg) / sqrt(varP))
        case "log" => log(x)
        case other => throw new IllegalArgumentException(
          s"scaleProperties: unknown scaler '$other' (minMax, max, mean, " +
            "center, stdScore, log)")
      }
      d.withColumn(s"${c}_scaled", expr)
    }
    scaled.drop(stats.columns: _*)
  }

  /** P1 sql-twin gate query: the curation pipeline with the LSH stage
    * disabled — quality gate + exact dedup, every stage a SQL closed
    * form (the F2 integer-exact score, md5 keeper ranking). keep cast
    * to int so the type-strict hash compares across engines. */
  def p1CurateSql(s: SparkSession, dir: String): DataFrame =
    curate(s, dir, nearDup = false)
      .select(col("doc_id"), col("lang"), col("keep").cast("int").as("keep"),
        col("reason"))
      .orderBy(col("doc_id"))

  /** P6 gate query — minMax + stdScore over lineitem.l_quantity
    * (integer-valued doubles, so every moment is exact — the oracle
    * recomputes the identical closed form), deterministic 1-in-50
    * order sample AFTER the full-table stats. */
  def p6Scale(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val a = scaleProperties(li, Seq("l_quantity"), "minMax")
      .withColumnRenamed("l_quantity_scaled", "q_minmax")
    val b = scaleProperties(a, Seq("l_quantity"), "stdScore")
      .withColumnRenamed("l_quantity_scaled", "q_std")
    b.filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("q_minmax"), 6).as("q_minmax"),
        round(col("q_std"), 6).as("q_std"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** LSH candidate pairs for an arbitrary (doc_id, text) frame — the
    * D2 banding stage (INCLUDING the degenerate-bucket star-link
    * guard) exposed for pipeline composition. Star-linking is exactly
    * right here: curate() drops the larger id of every verified pair,
    * so a boilerplate cluster collapses onto its representative
    * without the O(b²) pair blowup. */
  def lshCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16,
                    bucketCap: Int = 1000): DataFrame =
    Dedup.d2Candidates(docs, k, bands, bucketCap).persist()
}
