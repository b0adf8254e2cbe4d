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
  def f4Fingerprint(s: SparkSession, dir: String, gram: Int = 8, window: Int = 16): DataFrame = {
    // winnowing as codegen'd window functions: explode char-k-gram
    // positions to rows, take the min hash over each sliding window of
    // 16 via min().over(rowsBetween), dedup, aggregate back per doc.
    // (The array/HOF formulation interprets O(len × window) lambda
    // calls per document — see SURVEY §5 on HOF traps.)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    Tables.documents(s, dir)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .filter(length(col("t")) >= gram)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), length(col("t")) - gram)).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(col("t").substr(col("pos") + 1, lit(gram))).as("h"),
        (length(col("t")) - gram).as("last_start"))
      .withColumn("wmin",
        when(col("pos") <= col("last_start") - (window - 1), min(col("h")).over(w)))
      .filter(col("wmin").isNotNull)
      .select(col("doc_id"), col("wmin")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_fp"),
        xxhash64(to_json(struct(sort_array(collect_list(col("wmin")))))).as("fp_hash"))
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
}
