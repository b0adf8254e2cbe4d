package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(3600_000L * 10 + minute * 60_000L)

  test("H1 windowed counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = EventStreams.windowedCounts(df).writeStream
      .format("memory").queryName("h1_counts").outputMode("complete").start()
    try {
      mem.addData((1L, ts(0), "click", 1.0), (1L, ts(5), "click", 2.0),
        (2L, ts(65), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("h1_counts").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSet
      assert(rows == Set(("click", 2L), ("view", 1L)))
    } finally q.stop()
  }

  test("H7 near-dup stream: per-row HOF sketch == batch simhash; dups dropped") {
    import spark.implicits._
    // 1. the stateless per-row sketch is bit-identical to the batch
    //    explode+groupBy simhash on real documents
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val batch = graft.operators.Dedup.simhash(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // dropDuplicatesWithinWatermark requires a stream, so the batch
    // equivalence audit replicates nearDupStream's projection half
    // verbatim on a static frame
    val sketchOnly = docs
      .withColumn("__votes", expr(
        """aggregate(
          |  transform(split(lower(trim(text)), '\\s+'), w -> xxhash64(w)),
          |  array_repeat(CAST(0 AS BIGINT), 64),
          |  (acc, h) -> zip_with(acc,
          |    transform(sequence(0, 63),
          |      i -> CASE WHEN shiftright(h, i) & 1 = 1
          |           THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
          |    (a, b) -> a + b))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          |  (s, i) -> CASE WHEN __votes[i] > 0
          |            THEN s | shiftleft(CAST(1 AS BIGINT), i) ELSE s END)""".stripMargin))
      .select(col("doc_id"), col("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sketchOnly == batch && batch.nonEmpty)

    // 2. streaming: an identical text in a later batch is dropped, a
    //    distinct text passes
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.nearDupStream(df).writeStream
      .format("memory").queryName("h7_neardup").outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "the quick brown fox"), (2L, ts(1), "a different document"))
      q.processAllAvailable()
      // doc 3: case/whitespace variants tokenize identically → same
      // sketch as doc 1 → dropped; doc 4 is an exact dup → dropped
      mem.addData((3L, ts(2), "THE  quick   Brown fox"))
      mem.addData((4L, ts(3), "the quick brown fox"),
        (5L, ts(4), "yet another unique text"))
      q.processAllAvailable()
      val kept = spark.table("h7_neardup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("H8 bloom exact-dedup: batch-equivalent keeper set, membership " +
      "survives across micro-batches without a watermark (r15)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.DocEv]
    val q = EventStreams.bloomDedupStream(mem.toDS()).writeStream
      .format("memory").queryName("h8_bloom").outputMode("append").start()
    try {
      // batch 1: two distinct texts + one duplicate (lower/trim folds
      // case and OUTER whitespace — the D1 normalization exactly);
      // ts order picks the keeper
      val rows1 = Seq(
        EventStreams.DocEv(1L, ts(0), "alpha document text"),
        EventStreams.DocEv(2L, ts(1), "beta document text"),
        EventStreams.DocEv(3L, ts(2), "  ALPHA Document Text  "))
      mem.addData(rows1: _*)
      q.processAllAvailable()
      // batch 2: a duplicate of batch 1 arrives MUCH later — H3's
      // watermark dedup would have forgotten; the bloom remembers —
      // plus one novel text
      val rows2 = Seq(
        EventStreams.DocEv(4L, ts(100000), "Beta Document Text"),
        EventStreams.DocEv(5L, ts(100001), "gamma entirely new"))
      mem.addData(rows2: _*)
      q.processAllAvailable()
      val kept = spark.table("h8_bloom").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      // batch-equivalence: the D1 rule (one keeper per distinct
      // normalized text, first by (ts, doc_id)) over the same rows
      val batchKeepers = (rows1 ++ rows2)
        .groupBy(_.text.trim.toLowerCase)
        .values.map(_.minBy(r => (r.ts.getTime, r.doc_id)).doc_id).toSet
      assert(kept == batchKeepers && kept == Set(1L, 2L, 5L), s"kept=$kept")
    } finally q.stop()
  }

  test("H6 trending bigrams: per-window counts over a document stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = EventStreams.trendingBigrams(df).writeStream
      .format("memory").queryName("h6_bigrams").outputMode("complete").start()
    try {
      mem.addData((ts(0), "spark is fast"), (ts(5), "spark is lazy"),
        (ts(65), "spark is fast"), (ts(7), "one"))
      q.processAllAvailable()
      val rows = spark.table("h6_bigrams").collect()
        .map(r => (r.getAs[Timestamp]("hour_start").getTime / 3600_000L,
          r.getAs[String]("bigram"), r.getAs[Long]("n"))).toSet
      // hour 10: "spark is" twice, "is fast"/"is lazy" once each;
      // hour 11: one doc; the single-word doc contributes nothing
      assert(rows == Set((10L, "spark is", 2L), (10L, "is fast", 1L),
        (10L, "is lazy", 1L),
        (11L, "spark is", 1L), (11L, "is fast", 1L)))
    } finally q.stop()
  }

  test("H2 sessionization closes sessions after the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 10 * 60_000)
      .writeStream.format("memory").queryName("h2_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5min apart (one session), then 30min gap, one more
      mem.addData(Ev(1L, ts(0), "click", 1.0), Ev(1L, ts(5), "click", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(1L, ts(35), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far so the timeout fires
      mem.addData(Ev(9L, ts(300), "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("h2_sessions").as[EventStreams.Session]
        .collect().filter(_.user_id == 1L).sortBy(_.start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
      assert(sessions(1).n_events == 1 && sessions(1).total_value == 5.0)
    } finally q.stop()
  }

  test("H3 streaming dedup drops duplicate ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedupStream(df).writeStream
      .format("memory").queryName("h3_dedup").outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "a"), (1L, ts(1), "a"), (2L, ts(2), "b"))
      q.processAllAvailable()
      mem.addData((2L, ts(3), "b"), (3L, ts(4), "c"))
      q.processAllAvailable()
      assert(spark.table("h3_dedup").count() == 3)
    } finally q.stop()
  }

  test("H5 stream-stream interval join attributes clicks to purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val out = EventStreams.attributionJoin(
      purchases.toDF().toDF("user_id", "ts", "value"),
      clicks.toDF().toDF("user_id", "ts"))
    val q = out.writeStream.format("memory").queryName("h5_attr")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(15)), (1L, ts(5)), (2L, ts(30)))
      // purchase at minute 70: user 1's clicks at 15 (within the hour)
      // and 5 (outside) — only minute-15 attributes; user 2's click is
      // for another user
      purchases.addData((1L, ts(70), 9.99))
      q.processAllAvailable()
      val rows = spark.table("h5_attr").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("c_ts")))
      assert(rows.toSet == Set((1L, ts(15))))
    } finally q.stop()
  }

  test("H4 foreachBatch upsert accumulates counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("h4_state").toString + "/state"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = df.writeStream
      .foreachBatch(EventStreams.upsertCountsBatch(dir) _)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData((1L, ts(0), "click"), (1L, ts(1), "click"), (2L, ts(2), "view"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "click"), (2L, ts(4), "click"))
      q.processAllAvailable()
      val state = spark.read.parquet(dir).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(state((1L, "click")) == 3L)
      assert(state((2L, "view")) == 1L)
      assert(state((2L, "click")) == 1L)
    } finally q.stop()
  }

  test("F9 PII redaction streams statelessly, bit-identical to batch (r12)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "mail a@b.io now"), (2L, "srv 10.0.0.1 up"),
      (3L, "call +1 555 0100 ok"), (4L, "plain words only"))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.redactPii(col("text")).as("red"))
      .writeStream.format("memory").queryName("f9s")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("f9s").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      val batch = rows.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.redactPii(col("text")).as("red"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(streamed == batch)
      assert(streamed(1L) == "mail <EMAIL> now" &&
        streamed(2L) == "srv <IP> up" &&
        streamed(3L) == "call <PHONE> ok" &&
        streamed(4L) == "plain words only")
    } finally q.stop()
  }
}
