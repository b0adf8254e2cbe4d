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

  test("f4 fingerprints: identical docs agree, different docs differ") {
    import spark.implicits._
    // fingerprint the corpus; doc_id distinct texts should mostly get
    // distinct fp hashes, and the fingerprint is deterministic
    val a = TextAnalysis.f4Fingerprint(spark, sf).collect()
    val b = TextAnalysis.f4Fingerprint(spark, sf).collect()
    assert(a.map(_.getLong(2)).sameElements(b.map(_.getLong(2))))
    assert(a.forall(_.getInt(1) > 0))
  }
}
