package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary groups and counts add up") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1997-09-01")).count()
    assert(total == expected)
  }

  test("q3 star join revenue equals ungrouped total") {
    val grouped = Relational.q3Join(spark, sf)
      .agg(sum(col("n_orders"))).as("t").collect().head.getLong(0)
    assert(grouped == Tables.orders(spark, sf).count())
  }

  test("q4 semi plus anti partition the customer table") {
    // both sides use the SAME >450000 threshold, so EXISTS ∪ NOT EXISTS
    // is a partition of customers (the anti predicate carries a
    // threshold to stay non-vacuous at sf0.01 — every customer has
    // SOME order, so a bare NOT EXISTS matches nothing)
    val big = Tables.orders(spark, sf).filter(col("o_totalprice") > 450000)
    val semiAll = Tables.customer(spark, sf).join(
      big, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.q4Anti(spark, sf).count()
    assert(semiAll + anti == Tables.customer(spark, sf).count())
    assert(anti > 0 && semiAll > 0, "both sides must be non-vacuous")
  }

  test("q7 top-k returns at most k rows per group, correctly ordered") {
    val rows = Relational.q7Topk(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 2))
    byCust.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      val prices = sorted.map(_.getAs[Double]("price"))
      assert(prices.sameElements(prices.sorted.reverse))
    }
  }

  test("q11 as-of join matches a per-row scan on a sample") {
    // type-agnostic timestamp accessor: Spark rows carry
    // java.sql.Timestamp for TimestampType but LocalDateTime for
    // TIMESTAMP_NTZ, and the testdata writer has flipped flavors
    // between regenerations (session tz is UTC, so instants agree)
    def millis(v: Any): Long = v match {
      case t: java.sql.Timestamp      => t.getTime
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case i: java.time.Instant       => i.toEpochMilli
      case other => fail(s"unexpected timestamp class ${other.getClass}")
    }
    val out = Relational.q11Asof(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_order")).map(_.toLong))
      .toMap
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts")).collect()
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0), millis(r.get(1)), r.getLong(2)))
    events.take(50).foreach { e =>
      val (eid, uid, ts) = (e.getLong(0), e.getLong(1), millis(e.get(2)))
      val expected = orders.filter(o => o._1 == uid && o._2 <= ts)
        .sortBy(o => (o._2, o._3)).lastOption.map(_._3)
      assert(out(eid) == expected, s"event $eid")
    }
  }

  test("q12 discrete percentiles are actual data values") {
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
    Relational.q12Pctl(spark, sf).collect().foreach { r =>
      val vals = li(r.getString(0)).map(_.getDouble(1)).sorted
      def pick(p: Int) = vals((vals.length * p + 99) / 100 - 1)
      assert(r.getDouble(1) == pick(50) && r.getDouble(2) == pick(90) &&
        r.getDouble(3) == pick(99))
    }
  }

  test("q19 sketches are within tolerance of the exact twins") {
    val approx = Relational.q19Approx(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val exactD = Relational.q8Distinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactP = Relational.q12Pctl(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(3)))).toMap
    approx.foreach { case (flag, (parts, p50, p99)) =>
      assert(math.abs(parts - exactD(flag)).toDouble / exactD(flag) < 0.05)
      assert(math.abs(p50 - exactP(flag)._1) / exactP(flag)._1 < 0.02)
      assert(math.abs(p99 - exactP(flag)._2) / exactP(flag)._2 < 0.02)
    }
  }

  test("q23 range join: window boundaries and bucket edges are exact") {
    import spark.implicits._
    val W = 86400000L
    val t0 = 2 * W + 1000 // purchase just after a day-bucket boundary
    // (event_id, tMillis, user, type): the window is [t0-W, t0), and the
    // candidates deliberately straddle the two day buckets the exploded
    // purchase row covers
    val rows = Seq(
      (100L, t0, 7L, "purchase"),        // the probe (self must not count)
      (1L, t0 - W, 7L, "click"),         // exactly 24h before → IN (>=)
      (2L, t0 - W - 1, 7L, "click"),     // 24h+1ms before → OUT
      (3L, 2 * W, 7L, "view"),           // same bucket as purchase → IN
      (4L, t0 - 1, 7L, "error"),         // 1ms before → IN
      (5L, t0 + 1, 7L, "click"),         // after → OUT
      (6L, t0 - 10, 8L, "click"),        // other user → OUT
      (200L, 5 * W, 9L, "purchase"))     // no prior events → absent row
    val dir = java.nio.file.Files.createTempDirectory("q23fix").toString
    rows.toDF("event_id", "t", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(t * 1000)").as("ts"),
        col("user_id"), col("event_type"))
      .write.parquet(s"$dir/events.parquet")
    val out = Relational.q23Range(spark, dir).collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(100L -> 3L))
  }

  test("q15 salted join equals plain join") {
    val salted = Relational.q15Skew(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }
}
