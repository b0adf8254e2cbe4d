package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("f1 token counts are positive and ws<=re for word text") {
    val rows = TextAnalysis.f1Tokens(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1)))
  }

  test("f2 quality components are in range") {
    val rows = TextAnalysis.f2Quality(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1.0)   // diversity
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)  // stop_ratio
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1.0)  // quality
    }
  }

  test("f3 predictions cover the corpus exactly once") {
    val n = TextAnalysis.f3LangId(spark, sf)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(n == Tables.documents(spark, sf).count())
  }

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("f7 decontamination flags exactly the docs sharing an eval 4-gram") {
    // doc 0 is the eval slice (0 % 97 == 0); doc 5 shares "a b c d"
    val dir = docsDir(Seq(
      0L -> "a b c d e",
      5L -> "a b c d x y z w",
      6L -> "p q r s t u"))
    val out = TextAnalysis.f7Decontam(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(5L))
    val r = out.head
    assert(r.getLong(1) == 1L) // n_shared: "a b c d"
    assert(r.getLong(2) == 5L) // n_grams of an 8-word doc
    assert(r.getDouble(3) == 0.2)
  }

  test("f7 never reports eval docs and overlap is in (0,1]") {
    val out = TextAnalysis.f7Decontam(spark, sf).collect()
    assert(out.forall(_.getLong(0) % 97 != 0))
    assert(out.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
    assert(out.forall(r => r.getLong(1) <= r.getLong(2)))
  }

  test("f8 repetition metrics on hand-checked fixtures") {
    val dir = docsDir(Seq(
      1L -> "x x x x x x",                      // fully repetitive
      2L -> "a b c d e f g h i j"))             // fully distinct
    val out = TextAnalysis.f8Repetition(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val rep = out(1L)
    assert(rep.getDouble(1) == 0.8333) // (6-1)/6
    assert(rep.getDouble(2) == 1.0)    // top word is every word
    assert(rep.getDouble(3) == 0.75)   // 4 trigrams, 1 distinct
    assert(rep.getInt(4) == 1)
    val dis = out(2L)
    assert(dis.getDouble(1) == 0.0)
    assert(dis.getDouble(2) == 0.1)    // 1/10 < 0.12
    assert(dis.getDouble(3) == 0.0)
    assert(dis.getInt(4) == 0)
  }

  test("f8 covers every document with metrics in [0,1]") {
    val out = TextAnalysis.f8Repetition(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    assert(out.forall(r => (1 to 3).forall(i =>
      r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)))
  }

  test("f11 KN perplexity: gibberish scores worse than in-domain text, " +
      "OOV stays finite, probabilities sum sanely (r15)") {
    import spark.implicits._
    // a tiny in-domain corpus with strong local structure
    val train = (1L to 20L).map(i =>
      (i, "the cat sat on the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
    val score = Seq(
      (100L, "the cat sat on the mat"),               // in-domain
      (101L, "zq xv plk wrm qqj zzt ashx vnb"),       // gibberish: all OOV
      (102L, "the dog sat on the mat")                // in-domain recombined
    ).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyPerplexity(score, train, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(100L, 101L, 102L))
    val (n100, nll100, ppl100) = out(100L)
    val (_, nll101, ppl101) = out(101L)
    val (_, nll102, ppl102) = out(102L)
    assert(n100 == 6L)
    // the planted-gibberish quality floor: far worse than corpus text
    assert(ppl101 > 5 * ppl100, s"gibberish ppl $ppl101 vs in-domain $ppl100")
    assert(ppl101 > 5 * ppl102)
    // OOV + unseen contexts back off to the uniform floor — finite
    assert(!nll101.isInfinite && !nll101.isNaN && nll101 > nll100 && nll101 > nll102)
    // rerun determinism (the house rule)
    val again = TextAnalysis.kneserNeyPerplexity(score, train, n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again == out.map { case (k, v) => k -> v._3 })
    // bigram order exercises the generic table loop's empty-middle case
    val bi = TextAnalysis.kneserNeyPerplexity(score, train, n = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bi(101L) > bi(100L) && bi.values.forall(p => p > 0 && !p.isInfinite))
    // 5-gram order exercises THREE middle continuation orders (the
    // CCNet order) — same quality ordering, all probabilities sane
    val five = TextAnalysis.kneserNeyPerplexity(score, train, n = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the verbatim doc keeps the 5× margin; the RECOMBINED doc's
    // 5-gram contexts are unseen, so it backs off and its own ppl
    // rises — a 3× margin is the honest high-order bar
    assert(five(101L) > 5 * five(100L) && five(101L) > 3 * five(102L))
    assert(five.values.forall(p => p > 0 && !p.isInfinite && !p.isNaN))
  }

  test("f4 fingerprints: identical docs agree, different docs differ") {
    import spark.implicits._
    // fingerprint the corpus; doc_id distinct texts should mostly get
    // distinct fp hashes, and the fingerprint is deterministic
    val a = TextAnalysis.f4Fingerprint(spark, sf).collect()
    val b = TextAnalysis.f4Fingerprint(spark, sf).collect()
    assert(a.map(_.getLong(2)).sameElements(b.map(_.getLong(2))))
    assert(a.forall(_.getInt(1) > 0))
  }

  test("F9 redactPii: emails, IPv4s and phone numbers fold to tokens (r12)") {
    import spark.implicits._
    val df = Seq(
      ("reach me at jane.doe+spam@sub.example.co.uk today",
       "reach me at <EMAIL> today"),
      ("server 192.168.10.254 and 10.0.0.1 replied",
       "server <IP> and <IP> replied"),
      ("call +1 (415) 555-0132 or +44 20 7946 0958 now",
       "call <PHONE> or <PHONE> now"),
      // version strings are NOT IPv4 (word-boundary, 4 octets only)
      ("upgrade to v2.3 now", "upgrade to v2.3 now"),
      // all three in one string, order-stable
      ("a@b.io at 8.8.8.8 tel +1 555 0100 end",
       "<EMAIL> at <IP> tel <PHONE> end"))
      .toDF("raw", "want")
    val bad = df
      .withColumn("got", TextAnalysis.redactPii(col("raw")))
      .filter(col("got") =!= col("want"))
      .collect()
    assert(bad.isEmpty, bad.map(r => s"${r.getString(0)} -> ${r.getString(2)}")
      .mkString("; "))
    // the driver gate's synthetic construction is non-vacuous: every
    // row redacts all three classes
    val gate = TextAnalysis.f9Redact(spark, sf).collect()
    assert(gate.nonEmpty && gate.forall { r =>
      val t = r.getString(1)
      t.contains("<EMAIL>") && t.contains("<IP>") && t.contains("<PHONE>") &&
        !t.contains("@") && !t.contains("+1 555")
    })
  }

  test("F9+ luhnOk and card/SSN redaction: checksum gates replacement (r14)") {
    import spark.implicits._
    // classic Luhn vectors: 4111111111111111 and 79927398713 are valid,
    // flipping the check digit breaks them
    val nums = Seq("4111111111111111", "4111111111111112", "79927398713",
      "79927398710", "4532015112830366").toDF("num")
      .select(col("num"), TextAnalysis.luhnOk(col("num")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(nums("4111111111111111") && !nums("4111111111111112"))
    assert(nums("79927398713") && !nums("79927398710"))
    assert(nums("4532015112830366")) // a Luhn-valid 4532… 16-digit
    // redaction: a VALID card folds (space- and dash-separated too), an
    // INVALID 16-digit run survives (it's an order number, not a card);
    // SSNs fold; the earlier classes still fold
    val docs = Seq(
      ("pay 4111111111111111 now", true),
      ("pay 4111 1111 1111 1111 now", true),
      ("pay 4111-1111-1111-1111 now", true),
      ("order 4111111111111112 shipped", false),
      ("ssn 123-45-6789 on file", false)).toDF("text", "hasCard")
      .select(col("text"), col("hasCard"),
        TextAnalysis.redactPiiFull(col("text")).as("red"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    docs.foreach { case (t, hasCard, red) =>
      if (hasCard) assert(red.contains("<CARD>") && !red.exists(_.isDigit), red)
      else assert(!red.contains("<CARD>"), red)
    }
    assert(docs.find(_._1.startsWith("ssn")).get._3 == "ssn <SSN> on file")
    assert(docs.find(_._1.startsWith("order")).get._3
      == "order 4111111111111112 shipped")
    // driver gate: both branches exercised across the corpus, every SSN
    // folded, every REMAINING 16-digit run is Luhn-invalid
    val gate = TextAnalysis.f9Luhn(spark, sf).collect().map(_.getString(1))
    assert(gate.nonEmpty && gate.forall(t => t.contains("<SSN>")))
    val (carded, kept) = gate.partition(_.contains("<CARD>"))
    assert(carded.nonEmpty && kept.nonEmpty) // Luhn varies with doc_id
    assert(kept.forall(_.contains(" card 4532")))
  }

  test("F10 BPE: merge application is boundary-exact and left-to-right " +
      "greedy; the trainer learns hand-computable merges (r14)") {
    import spark.implicits._
    def countOf(text: String, merges: Seq[(String, String)]): Long =
      TextAnalysis.bpeTokenCount(Seq((1L, text)).toDF("doc_id", "text"), merges)
        .collect().head.getLong(1)
    // rank order chains: t+h then th+e → 'the' is ONE token, 'then' two
    val m = Seq("t" -> "h", "th" -> "e")
    assert(countOf("the", m) == 1L && countOf("then", m) == 2L)
    assert(countOf("the then", m) == 3L)
    // left-to-right greedy on runs: aaaa + (a,a) → [aa][aa]; aaa → [aa][a]
    assert(countOf("aaaa", Seq("a" -> "a")) == 2L)
    assert(countOf("aaa", Seq("a" -> "a")) == 2L)
    // boundary exactness: merge (a,b) must not fire inside symbol "aa"
    // (aab → [aa][b], NOT [a][ab] or a corrupted [aab]) nor swallow a
    // longer symbol's prefix (after (b,c): a+b must not touch [a][bc])
    assert(countOf("aab", Seq("a" -> "a", "a" -> "b")) == 2L)
    assert(countOf("abc", Seq("b" -> "c", "a" -> "b")) == 2L) // [a][bc]
    // trainer: counts then ties-lexicographic — corpus 'aaab aab':
    // (a,a) wins 3-2, then the 1-1-1 tie resolves to (a,b), then the
    // remaining tie to (aa,ab)
    val docs = Seq((1L, "aaab"), (2L, "aab")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(docs, 3)
      == Seq("a" -> "a", "a" -> "b", "aa" -> "ab"))
    // trainer stops early when no pairs remain; determinism
    assert(TextAnalysis.bpeTrain(Seq((1L, "ab")).toDF("doc_id", "text"), 5)
      == Seq("a" -> "b"))
    assert(TextAnalysis.bpeTrain(docs, 3) == TextAnalysis.bpeTrain(docs, 3))
    // learned merges compress: corpus-trained counts < character counts
    val corpus = Tables.documents(spark, sf)
    val learned = TextAnalysis.bpeTrain(corpus, 4)
    assert(learned.size == 4)
    val nChars = corpus.select(
        sum(length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))))
      .collect().head.getLong(0)
    val nTokens = TextAnalysis.bpeTokenCount(corpus, learned)
      .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    assert(nTokens < nChars, s"$nTokens !< $nChars")
    // the fixed gate table compresses the corpus too (non-vacuous gate)
    val nGate = TextAnalysis.f10Bpe(spark, sf)
      .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    assert(nGate < nChars)
  }
}
