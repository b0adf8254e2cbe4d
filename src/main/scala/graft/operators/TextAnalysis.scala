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
}
