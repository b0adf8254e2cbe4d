package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events schema (SURVEY §2 H).
  *
  * Each operator is a pure streaming-DataFrame transform — the caller
  * owns the source (Kafka/files/MemoryStream) and sink, so the same
  * code runs in tests (MemoryStream) and production (readStream).
  */
object EventStreams {

  /** H1 — per-hour, per-type event counts with a watermark: late events
    * beyond 10 minutes are dropped and state is bounded. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, nEvents: Int, total: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                     n_events: Int, total_value: Double)

  /** H2 — stateful sessionization: a session closes after `gapMs` of
    * user inactivity (event-time timeout via watermark). One state
    * object per live user — bounded by the watermark, not the stream. */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.nEvents, s.total))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.nEvents + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.nEvents, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** H6 — trending n-grams over a DOCUMENT stream: per-window word
    * bigram counts with a watermark (the streaming face of F6's corpus
    * n-gram statistics — monitoring what's entering a training-data
    * pipeline as it lands).
    *
    * State is bounded by watermark × distinct bigrams per window; the
    * aggregation is update-mode incremental (map-side partial per
    * micro-batch). Ranking/top-k belongs on the sink side (a windowed
    * rank is not incrementally maintainable — the standard split:
    * stream maintains counts, the consumer ranks a finished window). */
  def trendingBigrams(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "10 minutes")
      // adjacent-word pairing stays STATELESS (no per-doc window —
      // unsupported on streams): zip the word array against its own
      // one-shifted slice. The lambda body only concatenates the two
      // element args, so the HOF re-evaluation trap (SURVEY §5)
      // doesn't bite: slice/size are row-level argument expressions,
      // evaluated once per document.
      .select(col("ts"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("ts"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .groupBy(window(col("ts"), "1 hour"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("bigram"), col("n"))

  /** H3 — streaming dedup: drop events with a duplicate event_id seen
    * within the watermark window (state stays bounded). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** H7 — streaming near-dup filter: drop documents whose 64-bit
    * SimHash equals an already-seen sketch inside the watermark
    * horizon. The sketch is a per-row STATELESS projection (nested
    * higher-order functions — a stream can't run the batch
    * explode+groupBy re-aggregation), bit-identical to the batch
    * [[graft.operators.Dedup.simhash]] (spec cross-checks every doc),
    * then `dropDuplicatesWithinWatermark` bounds the dedup state.
    * Semantics are SKETCH-EXACT near-dup: near-identical documents
    * collapse to the same 64 bits (the Hamming-0 regime); banded
    * Hamming ≤ 3 with exact verification stays a batch concern (D3). */
  def nearDupStream(docs: DataFrame): DataFrame =
    docs
      // votes materialize in their own projection so the 64-bit fold
      // references the array attribute, not 64 copies of the HOF
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
      .drop("__votes")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("simhash")

  case class DocEv(doc_id: Long, ts: Timestamp, text: String)

  /** H8 — streaming EXACT dedup at ingest with BOUNDED membership
    * (r15): the streaming twin of D1 (md5-of-normalized-text keeper
    * semantics) whose memory NEVER grows with the stream — unlike
    * H3's `dropDuplicatesWithinWatermark`, which forgets once the
    * watermark passes, this remembers every text hash it has ever
    * admitted, in a fixed-size BLOOM FILTER per hash bucket
    * (`buckets` × `bitsPerBucket` bits total, e.g. 64 × 2¹⁶ = 512 KiB
    * for the defaults, forever).
    *
    * Mechanics: the text hash (xxhash64 of lower/trim — computed as a
    * COLUMN so the batch twin D1 and the spec share the projection)
    * routes each document to a bucket = hash mod `buckets`;
    * `flatMapGroupsWithState` keeps one bit array per bucket, probes
    * `hashes` double-hashed positions, admits on any-zero and drops
    * on all-ones. Within a micro-batch rows process in (ts, doc_id)
    * order, so the keeper is deterministic (first by event time, the
    * D1 min-id analog).
    *
    * The bloom trade, disclosed: false positives DROP a novel
    * document (rate ≈ (1 − e^(−kn/m))^k — at the defaults, under 1e-4
    * through ~4k docs per bucket); false negatives never happen, so a
    * true duplicate is always dropped. Size `bitsPerBucket` to the
    * expected corpus, or shard `buckets` up — both are the named
    * levers. At 1000 executors each bucket's state lives on one task;
    * more buckets = more parallelism AND more capacity. */
  def bloomDedupStream(docs: Dataset[DocEv], buckets: Int = 64,
                       bitsPerBucket: Int = 1 << 16,
                       hashes: Int = 4): Dataset[DocEv] = {
    require(buckets >= 1 && hashes >= 1, "bloomDedupStream: buckets/hashes >= 1")
    require(bitsPerBucket >= 64 && (bitsPerBucket & (bitsPerBucket - 1)) == 0,
      s"bloomDedupStream: bitsPerBucket must be a power of two >= 64")
    val spark = docs.sparkSession
    import spark.implicits._
    val m = bitsPerBucket
    val hashed = docs.toDF()
      .withColumn("__h", xxhash64(lower(trim(col("text")))))
      .withColumn("__b", pmod(col("__h"), lit(buckets)).cast("int"))
      .as[(Long, Timestamp, String, Long, Int)]
    hashed
      .groupByKey(_._5)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Int, rows: Iterator[(Long, Timestamp, String, Long, Int)],
         state: GroupState[Array[Long]]) => {
          val bits = state.getOption.getOrElse(new Array[Long](m / 64))
          def positions(h: Long): Seq[Int] = {
            val h2 = java.lang.Long.rotateLeft(h, 31) | 1L
            (0 until hashes).map(j =>
              java.lang.Math.floorMod(h + j.toLong * h2, m.toLong).toInt)
          }
          val kept = rows.toSeq.sortBy(r => (r._2.getTime, r._1)).flatMap { r =>
            val pos = positions(r._4)
            val seen = pos.forall(i => (bits(i >> 6) & (1L << (i & 63))) != 0L)
            if (seen) None
            else {
              pos.foreach(i => bits(i >> 6) |= (1L << (i & 63)))
              Some(DocEv(r._1, r._2, r._3))
            }
          }
          state.update(bits)
          kept.iterator
        })
  }

  /** H5 — stream-stream interval join (purchase attribution): each
    * purchase joins the same user's clicks from the preceding hour.
    * Watermarks on BOTH inputs plus the two-sided time-range predicate
    * let Spark bound the buffered state on each side — without them a
    * stream-stream join would buffer forever. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", "70 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, col("p_user") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("c_ts") < col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("value"), col("c_ts"))
  }

  /** H4 — incremental micro-batch upsert: aggregate each micro-batch
    * and merge it into an accumulating per-key state table via
    * foreachBatch (the parquet-backed analog of MERGE INTO).
    * Returns the batch-merge function for a writeStream.foreachBatch. */
  def upsertCountsBatch(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val inc = batch.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val merged = try {
      val prev = spark.read.parquet(stateDir)
      prev.unionByName(inc)
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("n")).as("n"))
    } catch { case _: Throwable => inc }
    // write-then-swap keeps readers of stateDir consistent
    val tmp = stateDir + "_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(stateDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
