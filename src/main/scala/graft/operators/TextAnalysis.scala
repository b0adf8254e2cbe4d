package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis for training-data curation (SURVEY §2 F1-F5).
  * Pure column arithmetic end-to-end: every score is codegen'd and
  * runs inside the scan's WholeStageCodegen span.
  */
object TextAnalysis {

  private def words(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** F1 — token counts: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs / single non-alphanumerics). */
  def f1Tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("re_tokens"))
      .orderBy(col("doc_id"))

  /** F2 — quality scoring: length, lexical diversity, stopword ratio,
    * mean word length; combined into one deterministic score. */
  def f2Quality(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val n = size(w).cast("long")
    val d = size(array_distinct(w)).cast("long")
    val st = size(filter(w, x => x === "the" || x === "a")).cast("long")
    val chars = length(regexp_replace(lower(trim(col("text"))), "\\s+", "")).cast("long")
    // quality = 0.4*min(n,100)/100 + 0.4*d/n + 0.2*s/n, rounded to 4dp
    // with pure integer arithmetic so the oracle reproduces it exactly
    // (a float sum of three terms can land on a .00005 rounding
    // boundary differently per engine; a single integer-derived
    // division cannot).
    val qNum = lit(4L) * least(n, lit(100L)) * n + lit(400L) * d + lit(200L) * st
    val qDen = lit(1000L) * n
    val quality = floor((qNum * lit(20000L) + qDen) / (qDen * lit(2L))) / lit(10000.0)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        n.as("n_words"),
        round(d.cast("double") / n, 4).as("diversity"),
        round(st.cast("double") / n, 4).as("stop_ratio"),
        round(chars.cast("double") / n, 4).as("mean_word_len"),
        quality.as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Marker-word score for one language: how many tokens equal the marker. */
  private def markerCount(w: Column, marker: String): Column =
    size(filter(w, x => x === marker)).cast("long")

  /** F3 — language ID by marker-token scoring (argmax with fixed
    * tie-break order). A heuristic classifier with a fully
    * deterministic decision rule, so the oracle can replay it. */
  def f3LangId(s: SparkSession, dir: String): DataFrame = {
    val w = words(col("text"))
    val en = markerCount(w, "the")
    val de = markerCount(w, "data")
    val es = markerCount(w, "spark")
    val fr = markerCount(w, "query")
    val zh = markerCount(w, "vector")
    val top = greatest(en, de, es, fr, zh)
    val pred = when(en === top, "en").when(de === top, "de")
      .when(es === top, "es").when(fr === top, "fr").otherwise("zh")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled"), pred.as("predicted"))
      .groupBy(col("labeled"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("labeled"), col("predicted"))
  }

  /** F4 — 64-bit document fingerprints by winnowing: minimum of the
    * char 8-gram hashes in each window of 16, deduplicated — a compact,
    * shift-robust signature (Schleimer et al., MOSS). */
  /** Winnowing core — (doc_id, wmin) distinct selected fingerprints:
    * explode char-k-gram positions to rows, hash each gram with
    * `hashOf`, take the min over each sliding window of `window` via
    * min().over(rowsBetween), dedup. Codegen'd end to end. (The
    * array/HOF formulation interprets O(len × window) lambda calls per
    * document — see SURVEY §5 on HOF traps.) */
  private def winnowRows(docs: DataFrame, gram: Int, window: Int,
                         hashOf: Column => Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    docs
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .filter(length(col("t")) >= gram)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), length(col("t")) - gram)).as("pos"))
      .select(col("doc_id"), col("pos"),
        hashOf(col("t").substr(col("pos") + 1, lit(gram))).as("h"),
        (length(col("t")) - gram).as("last_start"))
      .withColumn("wmin",
        when(col("pos") <= col("last_start") - (window - 1), min(col("h")).over(w)))
      .filter(col("wmin").isNotNull)
      .select(col("doc_id"), col("wmin")).distinct()
  }

  def f4Fingerprint(s: SparkSession, dir: String, gram: Int = 8, window: Int = 16): DataFrame =
    winnowRows(Tables.documents(s, dir), gram, window, xxhash64(_))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_fp"),
        xxhash64(to_json(struct(sort_array(collect_list(col("wmin")))))).as("fp_hash"))
      .orderBy(col("doc_id"))

  /** F4 sql twin — the SAME winnowing pipeline under an ORACLE-
    * REPLICABLE gram hash: the closed-form base-31 polynomial over
    * code points mod 1000003, all in exact 64-bit integer arithmetic
    * (8 chars × codepoint ≤ 0x10FFFF × 31⁷ stays far below 2⁶³), so
    * DuckDB recomputes it bit-identically. Production keeps xxhash64
    * (better dispersion, one native call); this twin hash-gates the
    * winnowing MECHANICS — window min, boundary guard, dedup — every
    * round. Emits the selected fingerprints themselves, one row each. */
  def f4FingerprintSql(s: SparkSession, dir: String,
                       gram: Int = 8, window: Int = 16): DataFrame = {
    val polyHash: Column => Column = { g =>
      val terms = (0 until gram).map { i =>
        val pow = (0 until (gram - 1 - i)).foldLeft(1L)((a, _) => a * 31L)
        ascii(substring(g, i + 1, 1)).cast("long") * lit(pow)
      }
      terms.reduce(_ + _) % lit(1000003L)
    }
    winnowRows(Tables.documents(s, dir), gram, window, polyHash)
      .select(col("doc_id"), col("wmin").cast("long").as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  /** Distinct word n-grams as rows (doc_id, g) — posexplode + window
    * leads, fully codegen'd (see [[graft.operators.Dedup.shingleRows]]
    * for why not HOFs). One shuffle on doc_id. */
  private def ngramRows(docs: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("w0"), i).over(w).as(s"w$i"))
    val parts = (0 until n).map(i => col(s"w$i"))
    docs
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w0")))
      .select(col("doc_id") +: col("w0") +: leads: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ", parts: _*).as("g"))
      .distinct()
  }

  /** F7 — benchmark decontamination: flag training documents that share
    * word n-grams with a held-out eval slice (the GPT-3 n-gram-overlap
    * decontamination rule, at n=4 so the synthetic corpus produces
    * hits). The eval slice is doc_id ≡ 0 (mod evalMod) — a stand-in
    * for a benchmark table.
    *
    * Scale shape: the eval gram set is tiny relative to the corpus
    * (benchmarks are MBs, corpora are TBs) → broadcast; the training
    * side is one scan + one doc_id shuffle for the gram window + one
    * broadcast hash join. Nothing is quadratic in corpus size. */
  def f7Decontam(s: SparkSession, dir: String, n: Int = 4, evalMod: Int = 97): DataFrame = {
    val docs = Tables.documents(s, dir)
    val isEval = col("doc_id") % evalMod === 0
    // separate gram pipelines so the eval side's doc filter reaches its
    // scan (pushdown) instead of windowing the whole corpus twice
    val evalGrams = ngramRows(docs.filter(isEval), n)
      .select(col("g")).distinct()
    val train = ngramRows(docs.filter(!isEval), n)
    val sizes = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    train.join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_shared"), col("n_grams"),
        round(col("n_shared").cast("double") / col("n_grams"), 4).as("overlap"))
      .orderBy(col("doc_id"))
  }

  /** F8 — repetition metrics (Gopher-style quality rules, adapted to a
    * corpus with no line structure): duplicate-word fraction,
    * top-word fraction, duplicate-3-gram fraction, and a repetitive
    * flag on the UNROUNDED top-word fraction. Two doc_id-keyed
    * aggregations with map-side combine; no windows over the corpus. */
  def f8Repetition(s: SparkSession, dir: String, topWordFlag: Double = 0.12): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "w0")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wordStats = base
      .groupBy(col("doc_id"), col("w0")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("nw"), count(lit(1)).as("dw"), max(col("c")).as("topc"))
    val triStats = base
      .select(col("doc_id"), col("w0"),
        lead(col("w0"), 1).over(w).as("w1"), lead(col("w0"), 2).over(w).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w0"), col("w1"), col("w2")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("n3"), count(lit(1)).as("d3"))
    wordStats.join(triStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round((col("nw") - col("dw")).cast("double") / col("nw"), 4).as("dup_word_frac"),
        round(col("topc").cast("double") / col("nw"), 4).as("top_word_frac"),
        coalesce(round((col("n3") - col("d3")).cast("double") / col("n3"), 4), lit(0.0))
          .as("dup_3gram_frac"),
        (col("topc").cast("double") / col("nw") >= topWordFlag).cast("int").as("repetitive"))
      .orderBy(col("doc_id"))
  }

  /** F5 — corpus stats per source × lang. */
  def f5Corpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        size(words(col("text"))).as("n_words"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_words")), 2).as("avg_words"))
      .orderBy(col("source"), col("lang"))

  /** F6 — per-language top-k word bigrams (corpus n-gram statistics for
    * training-data analysis). Fully distributed: explode → count is one
    * map-side-combined shuffle on (lang, bigram); top-k is TWO-STAGE
    * (per-(partition, lang) prune → merge over ≤ k·P survivors) so the
    * per-language selection never sorts the distinct-bigram space —
    * corpus-scale cardinality — through one task per language.
    * Deterministic ties: count desc, bigram asc. */
  def f6TopNgrams(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), posexplode(words(col("text"))).as(Seq("pos", "w0")))
      .withColumn("w1", lead(col("w0"), 1).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w1").isNotNull)
      .select(col("lang"), concat_ws(" ", col("w0"), col("w1")).as("bigram"))
      .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid"), col("lang"))
      .orderBy(col("n").desc, col("bigram"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    counts
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= k)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk").cast("int").as("rk"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rk"))
  }

  /** F9 — PII REDACTION (r12): email → `<EMAIL>`, IPv4 → `<IP>`,
    * international-phone-ish → `<PHONE>`, applied in that fixed order.
    * The patterns are deliberately ENGINE-PORTABLE — no lookaround, no
    * backreferences — so Java regex (Spark codegen'd regexp_replace)
    * and RE2 (the DuckDB oracle) replace identically, which is what
    * lets the gate hash the exact redacted text. Curation-pipeline
    * shape: one narrow projection, no shuffle, scales as a map. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+\\d[\\d ()-]{6,}\\d" -> "<PHONE>")

  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** F9 driver gate — the synthetic corpus carries no PII, so the gate
    * SYNTHESIZES it deterministically from doc_id (identical
    * construction in the DuckDB twin) and hash-compares the redacted
    * text — mechanics non-vacuous, oracle exact. */
  def f9Redact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail-"), col("doc_id").cast("string"),
        lit(".example.com from 10."), (col("doc_id") % 200).cast("string"),
        lit(".0."), (col("doc_id") % 250).cast("string"),
        lit(" call +1 555 01"), col("doc_id").cast("string")).as("synth"))
      .select(col("doc_id"), redactPii(col("synth")).as("red"))
      .orderBy(col("doc_id")).limit(300)

  /** F9+ (r14) — SSN and credit-card redaction, the first PII classes
    * a curation user greps for after email/IP/phone. SSN is one more
    * engine-portable pattern; credit cards are pattern + CHECKSUM —
    * a 16-digit run is only a card if Luhn-valid, so blind pattern
    * replacement would eat order numbers. Candidates come from
    * `regexp_extract_all` (the card pattern, optional space/dash
    * groups), each is Luhn-tested by [[luhnOk]] — pure integer column
    * arithmetic inside whole-stage codegen, no UDF — and only valid
    * ones are replaced. Curation-pipeline shape: one narrow
    * projection, no shuffle, scales as a map. */
  val ssnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val cardPattern: String = "\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b"

  /** Luhn checksum validity of a digit string (ISO/IEC 7812): from the
    * RIGHTMOST digit, double every second digit, subtract 9 above 9,
    * valid iff the sum is ≡ 0 (mod 10). HOF-only (zip_with positions +
    * aggregate sum) — expressible identically in the DuckDB oracle as
    * integer arithmetic over substr positions. */
  def luhnOk(num: Column): Column = {
    val ds = filter(split(reverse(num), ""), d => length(d) === 1)
    val total = aggregate(
      zip_with(ds, sequence(lit(1), size(ds)), (d, i) => {
        val v = d.cast("int")
        when(i % 2 === 0,
          when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
      }),
      lit(0), (acc, x) => acc + x)
    total % 10 === 0
  }

  /** The full r14 redaction chain: email/IP/phone ([[redactPii]]) →
    * SSN → Luhn-gated card replacement. */
  def redactPiiFull(c: Column): Column = {
    val ssn = regexp_replace(redactPii(c), ssnPattern, "<SSN>")
    val cands = regexp_extract_all(ssn, lit(cardPattern), lit(0))
    aggregate(cands, ssn, (acc, cand) =>
      when(luhnOk(regexp_replace(cand, "[ -]", "")),
        replace(acc, cand, lit("<CARD>"))).otherwise(acc))
  }

  /** F9+ driver gate — synthesized SSN + 16-digit card per doc (the
    * f9Redact pattern): the card digits vary with doc_id (4532 +
    * 12 digits of doc_id·7919), so Luhn validity varies across the
    * corpus and BOTH branches (replaced / kept) are exercised; the
    * DuckDB twin recomputes the Luhn sum itself from the same
    * construction — an independent checksum recomputation, not a
    * pinned flag. */
  // ------------------------------------------------------------ F10: BPE

  /** F10 — BPE-TRUE token counting (r14; Sennrich et al. 2016). F1's
    * regex count is "BPE-ish"; real pipelines budget shards (P4) with
    * the actual tokenizer, so this is the actual merge machinery: a
    * word becomes its character symbols, and each merge rule (a, b) —
    * applied in rank order — fuses every adjacent (a, b) pair
    * left-to-right, exactly the reference BPE apply loop.
    *
    * The Spark shape is a SINGLE codegen'd projection per document —
    * no UDF, no driver loop: symbols are encoded into one string with
    * a \u0001 separator OWNING both symbol boundaries
    * (`␁sym␁␁sym␁…`), so each merge is ONE literal `replace` of
    * `␁a␁␁b␁` → `␁ab␁`. The double separator makes matches
    * boundary-exact: a pattern can neither start mid-symbol (symbol
    * interiors never contain ␁) nor swallow a longer symbol's prefix
    * (the trailing ␁ anchors the symbol END — `␁a␁␁b␁` cannot touch
    * `…␁a␁␁bc␁`), and left-to-right non-overlapping replacement over
    * runs (`aaaa` → `aa aa`) is exactly BPE's greedy pass in both
    * engines — DuckDB `replace` scans the same way, which is what
    * makes the gate hashable. Token count = symbols left after all
    * merges, summed per document (one map-side-combinable shuffle).
    *
    * At 100 TB the merges TABLE is tokenizer metadata (a few 10k
    * rules) compiled into the plan — the kmeans-centroid pattern —
    * and the scan stays embarrassingly parallel. */
  private val Sep = "\u0001"

  /** `␁c₁␁␁c₂␁…` symbol encoding of one word (see [[bpeTokenCount]]). */
  def bpeEncode(word: Column): Column =
    concat(lit(Sep), concat_ws(Sep + Sep, split(word, "")), lit(Sep))

  /** Token count of one word after applying `merges` in rank order. */
  def bpeApplyTokens(word: Column, merges: Seq[(String, String)]): Column = {
    val merged = merges.foldLeft(bpeEncode(word)) { case (acc, (a, b)) =>
      replace(acc, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep)) }
    size(split(merged, Sep + Sep))
  }

  /** (doc_id, n_tokens) under the given merge table. */
  def bpeTokenCount(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), bpeApplyTokens(col("w"), merges).cast("long").as("t"))
      .groupBy(col("doc_id")).agg(sum(col("t")).as("n_tokens"))

  /** F10 trainer — distributed BPE merge learning: per round ONE
    * adjacent-pair count (explode + map-side-combinable groupBy) and
    * ONE bounded TakeOrdered(1) argmax (count desc, then (a, b) asc —
    * deterministic where the reference breaks ties arbitrarily), then
    * the winning merge applies as the same single literal replace.
    * nMerges sequential rounds is the honest BPE training cost; at
    * corpus scale one trains on a sample (the P3 pattern) — the merge
    * table, not the corpus, is the artifact. */
  def bpeTrain(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 1, "bpeTrain: nMerges must be >= 1")
    var cur = docs.select(explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .select(bpeEncode(col("w")).as("enc"))
      .persist()
    cur.count()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var i = 0
    while (i < nMerges && !exhausted) {
      i += 1
      val top = cur
        .select(transform(split(col("enc"), Sep + Sep),
          s => replace(s, lit(Sep), lit(""))).as("a"))
        .filter(size(col("a")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS x, a[i + 1] AS y))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("x"), col("y")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += ((a, b))
        val next = cur.select(replace(col("enc"),
          lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep)).as("enc"))
          .persist()
        next.count()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    out.toList
  }

  /** The fixed gate merge table: common-English fusions the lorem-ish
    * corpus actually exercises, in a rank order where later merges
    * consume earlier ones (t+h → th+e). */
  val f10Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "o" -> "n", "r" -> "e", "in" -> "g", "e" -> "s", "o" -> "r",
    "an" -> "d", "a" -> "t")

  /** F10 driver gate — BPE-true token counts under [[f10Merges]]; the
    * DuckDB twin replays the identical encode → replace-chain → count
    * per word (generated from the same merge table, so the two can't
    * drift). */
  def f10Bpe(s: SparkSession, dir: String): DataFrame =
    bpeTokenCount(Tables.documents(s, dir), f10Merges)
      .orderBy(col("doc_id"))

  /** F10 trainer driver row — the learned merge table on the corpus
    * (rows-only: the trainer's argmax loop has no tractable SQL twin;
    * its semantics are pinned by the hand-computed fixture spec). */
  def f10BpeTrain(s: SparkSession, dir: String, nMerges: Int = 8): DataFrame = {
    import s.implicits._
    bpeTrain(Tables.documents(s, dir), nMerges).zipWithIndex
      .map { case ((a, b), i) => (i + 1L, a, b) }
      .toDF("rank", "x", "y")
  }

  /** F11 — n-gram LM PERPLEXITY scoring (r15; the CCNet quality
    * signal — Wenzek et al. 2020 rank Common Crawl documents by the
    * perplexity of a KenLM n-gram model; Kneser & Ney 1995 / Chen &
    * Goodman 1999 for the smoothing): a count-based INTERPOLATED
    * KNESER-NEY model fit distributed (one groupBy per count table
    * over the training token stream) and scored as closed-form column
    * arithmetic — no model binary, no UDF, the whole score inside
    * codegen.
    *
    * Model (single absolute discount D; c = the order's context):
    *   p_n(w|c) = max(c(cw)−D,0)/c(c) + D·N1+(c·)/c(c) · p_{n−1}
    *   p_k(w|c) = max(N1+(·cw)−D,0)/N1+(·c·)
    *              + D·N1+(c·)/N1+(·c·) · p_{k−1}          (1 < k < n)
    *   p_1(w)   = max(N1+(·w)−D,0)/N1+(··) + D·V1/N1+(··) · 1/(V+1)
    * where N1+ are continuation type counts (distinct-extension
    * counts from the next order's distinct gram types), an UNSEEN
    * context backs off to the lower order entirely, and the uniform
    * 1/(V+1) floor keeps every token — including OOV — finite.
    * Documents are BOS-padded with U+0001 (the house separator; never
    * in ingested text) so every position has a full context.
    *
    * Scale shape: count tables are |distinct grams|-bounded frames
    * from map-side-combining groupBys; scoring is (n−1) numerator +
    * (n−1) denominator equi-joins keyed on context strings + one
    * per-doc aggregation. The three unigram scalars (N1+(··), V1, V)
    * are 1-row probes. Returns (doc_id, n_scored, avg_nll, ppl) with
    * avg_nll = −mean ln p and ppl = exp(avg_nll). */
  def kneserNeyPerplexity(docs: DataFrame, trainDocs: DataFrame,
                          n: Int = 3, discount: Double = 0.75): DataFrame = {
    require(n >= 2 && n <= 6, s"kneserNeyPerplexity: order n in [2,6], got $n")
    require(discount > 0.0 && discount < 1.0,
      s"kneserNeyPerplexity: discount in (0,1), got $discount")
    val D = discount
    val bos = "\u0001"
    def stream(d: DataFrame): DataFrame =
      d.select(col("doc_id"),
          concat(array_repeat(lit(bos), n - 1), words(col("text"))).as("a"))
        .select(col("doc_id"), col("a"),
          explode(sequence(lit(n), size(col("a")))).as("i"))
    def ctxOf(k: Int): Column =
      array_join(slice(col("a"), col("i") - (k - 1), lit(k - 1)), " ")
    val wCol = element_at(col("a"), col("i"))

    val ts = stream(trainDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // highest order: raw counts
    val hi = ts.select(ctxOf(n).as("c"), wCol.as("w"))
    val numN = hi.groupBy(col("c"), col("w"))
      .agg(count(lit(1)).cast("double").as(s"cnt$n"))
    val denN = hi.groupBy(col("c"))
      .agg(count(lit(1)).cast("double").as(s"den$n"),
        countDistinct(col("w")).cast("double").as(s"fol$n"))
    // middle orders: continuation counts from distinct (k+1)-gram types
    val mids = (2 until n).map { k =>
      val types = ts.select(element_at(col("a"), col("i") - k).as("x"),
        ctxOf(k).as("c"), wCol.as("w")).distinct()
      val num = types.groupBy(col("c"), col("w"))
        .agg(count(lit(1)).cast("double").as(s"cnt$k"))
      val den = types.groupBy(col("c"))
        .agg(count(lit(1)).cast("double").as(s"den$k"),
          countDistinct(col("w")).cast("double").as(s"fol$k"))
      k -> (num, den)
    }.toMap
    // unigram: continuation counts from distinct bigram types + scalars
    val bity = ts.select(element_at(col("a"), col("i") - 1).as("x"), wCol.as("w"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val num1 = bity.groupBy(col("w"))
      .agg(count(lit(1)).cast("double").as("cnt1"))
    val den1 = bity.count().toDouble           // N1+(··)
    val v1 = num1.count().toDouble             // types with a continuation
    val vocab = hi.select(col("w")).distinct().count().toDouble

    // scoring: one stream, (n−1)+(n−1)+1 broadcast-eligible left joins
    var scored = stream(docs)
      .select(Seq(col("doc_id"), wCol.as("w")) ++
        (2 to n).map(k => ctxOf(k).as(s"c$k")): _*)
    scored = scored.join(num1, Seq("w"), "left")
    for (k <- 2 until n) {
      val (num, den) = mids(k)
      scored = scored
        .join(num.withColumnRenamed("c", s"c$k").withColumnRenamed("w", "w"),
          Seq(s"c$k", "w"), "left")
        .join(den.withColumnRenamed("c", s"c$k"), Seq(s"c$k"), "left")
    }
    scored = scored
      .join(numN.withColumnRenamed("c", s"c$n"), Seq(s"c$n", "w"), "left")
      .join(denN.withColumnRenamed("c", s"c$n"), Seq(s"c$n"), "left")

    // nested interpolation, built bottom-up with the SAME operation
    // shape the DuckDB twin spells (FP-parity by construction)
    var p: Column = lit(1.0 / (vocab + 1.0))
    p = greatest(coalesce(col("cnt1"), lit(0.0)) - D, lit(0.0)) / den1 +
      lit(D) * v1 / den1 * p
    for (k <- 2 to n) {
      val pk = greatest(coalesce(col(s"cnt$k"), lit(0.0)) - D, lit(0.0)) /
          col(s"den$k") +
        lit(D) * col(s"fol$k") / col(s"den$k") * p
      p = when(col(s"den$k").isNull, p).otherwise(pk)
    }
    val out = scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"), avg(log(p)).as("mll"))
      .select(col("doc_id"), col("n_scored"),
        (-col("mll")).as("avg_nll"), exp(-col("mll")).as("ppl"))
    graft.Borrow.reclaim(out, ts, bity)
  }

  /** F11 driver gate: trigram KN perplexity of every corpus document
    * under the corpus's own model — the DuckDB twin refits all count
    * tables and re-derives every token probability. */
  def f11Ppl(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    kneserNeyPerplexity(docs, docs, n = 3, discount = 0.75)
      .select(col("doc_id"), col("n_scored"),
        Num.roundTies(col("avg_nll"), 4).as("avg_nll"),
        Num.roundTies(col("ppl"), 2).as("ppl"))
      .orderBy(col("doc_id"))
  }

  def f9Luhn(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), concat(
        col("text"), lit(" ssn "),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" card 4532"),
        lpad((col("doc_id") * 7919 % 1000000000000L).cast("string"), 12, "0"),
        lit(" end")).as("synth"))
      .select(col("doc_id"), redactPiiFull(col("synth")).as("red"))
      .orderBy(col("doc_id")).limit(300)
}
