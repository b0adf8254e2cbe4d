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
}
