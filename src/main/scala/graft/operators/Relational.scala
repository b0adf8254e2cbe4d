package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational query surface (SURVEY §2 C1-C15).
  *
  * Conventions shared with the DuckDB oracles in [[graft.SparkEntry]]:
  * double aggregates are `round(_, 2)`; dates/timestamps are formatted
  * as strings; counts are bigint. Every output column is aliased
  * identically on both sides.
  *
  * Scale notes: dimension tables (region/nation/customer/supplier/part)
  * are always broadcast; the fact tables (lineitem/orders/events) are
  * shuffled at most once per query on their natural key; aggregations
  * rely on map-side partial aggregation.
  */
object Relational {

  /** C1 — TPC-H Q1-style pricing summary. One shuffle on the grouping key. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1997-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** C2 — filter + narrow projection; both reach the parquet scan
    * (`PushedFilters`, 3-column `ReadSchema`). */
  def q2Pushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_returnflag"))
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
      .groupBy(col("l_partkey")).agg(
        round(sum(col("l_quantity")), 2).as("qty"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy(col("l_partkey"))

  /** C3 — star join: fact shuffled once, all dims broadcast. */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = broadcast(Tables.customer(s, dir))
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** C4a — EXISTS via left_semi (no row multiplication, no distinct). */
  def q4Semi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** C4b — NOT EXISTS via left_anti: customers with no order above the
    * threshold. (A bare "no orders at all" predicate is vacuous on the
    * testdata — every customer has an order — so the oracle would
    * compare empty-to-empty; the threshold keeps both the EXISTS and
    * NOT-EXISTS sides populated at sf0.01.) */
  def q4Anti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** C5 — window functions: rank / lag / running sum per customer.
    * Single shuffle on the partition key serves all three. */
  def q5Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2))
      .withColumn("running_spend",
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("prev_price"), col("running_spend"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** C6 — rollup with grouping_id (grouping-sets family). */
  def q6Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
           count(lit(1)).as("n"),
           grouping_id().cast("int").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("status"),
              col("rev"), col("n"), col("gid"))
      .orderBy(col("gid"), col("flag"), col("status"))

  /** C7 — top-k per group via row_number (ties broken by unique key). */
  def q7Topk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** C8 — exact distinct counts (the oracle-checkable twin of the
    * approx_count_distinct / HLL path used at scale). */
  def q8Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** C9 — global sort + limit: planned as TakeOrderedAndProject (per-
    * partition top-N + merge on driver), never a full sort at scale. */
  def q9Sort(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"),
        col("o_orderpriority"))

  /** C10 — union + composition: per-nation customer vs supplier balances. */
  def q10Union(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nationkey"), col("c_acctbal").as("bal"),
        lit("customer").as("side"))
    val su = Tables.supplier(s, dir)
      .select(col("s_nationkey").as("nationkey"), col("s_acctbal").as("bal"),
        lit("supplier").as("side"))
    c.unionByName(su)
      .groupBy(col("nationkey"), col("side"))
      .agg(round(sum(col("bal")), 2).as("total_bal"), count(lit(1)).as("n"))
      .orderBy(col("nationkey"), col("side"))
  }

  /** C11 — as-of join: for each event, the latest order of the matching
    * customer with orderdate <= event time.
    *
    * Implemented by union + window carry-forward (sort-merge friendly,
    * one shuffle on the key, no range cross-join) — the pattern that
    * survives 100 TB, unlike a theta-join. */
  def q11Asof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id").as("k"), col("ts").cast("timestamp").as("t"),
        col("event_id"), lit(null).cast("long").as("o_key"), lit(1).as("is_probe"))
    val od = Tables.orders(s, dir)
      // one order state per (customer, date): ties collapse to max orderkey
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_key"))
      .select(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"),
        lit(null).cast("long").as("event_id"), col("o_key"),
        lit(0).as("is_probe"))
    // order-rows sort before probe-rows at identical timestamps (is_probe asc)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_probe"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, 0)
    od.unionByName(ev)
      .withColumn("asof_order", last(col("o_key"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("asof_order"))
      .orderBy(col("event_id"))
  }

  /** C12 — exact discrete percentiles per group (value at rank
    * ceil(p·n) — an actual data value, no float interpolation, so it
    * compares exactly across engines). `approx_percentile` (q19) is
    * the sketch-based scale path; this is its oracle-checkable exact
    * twin.
    *
    * Computed by DISTRIBUTED RANK, not a per-group sort (a
    * `Window.partitionBy(l_returnflag)` funnels the whole table
    * through ~|groups| tasks — the low-cardinality-group trap):
    * (group, value) counts are range-partitioned by (group, value);
    * per-(partition, group) subtotals (#partitions × #groups rows —
    * tiny) hop to the driver to become exclusive offsets; each
    * partition then knows the global rank interval of every value it
    * holds and emits the values covering the target ranks. One
    * aggregation + one slim shuffle, partitioning-invariant output. */
  def q12Pctl(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .repartitionByRange(col("g"), col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    val partials = counts.groupBy(col("pid"), col("g")).agg(sum(col("c")).as("t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsetRows = partials.groupBy(_._2).toSeq.flatMap { case (g, ps) =>
      val inOrder = ps.sortBy(_._1)
      val excl = inOrder.scanLeft(0L)(_ + _._3).init
      inOrder.zip(excl).map { case ((pid, _, _), off) => (pid, g, off) }
    }
    val totals = partials.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
    val offDf = broadcast(s.createDataFrame(offsetRows).toDF("pid", "g", "offset"))
    val nDf = broadcast(s.createDataFrame(totals).toDF("g", "n"))
    val wLocal = Window.partitionBy(col("pid"), col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def covers(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      col("cum_excl") < i && i <= col("cum_incl")
    val out = counts.join(offDf, Seq("pid", "g"))
      .withColumn("cum_incl", col("offset") + sum(col("c")).over(wLocal))
      .withColumn("cum_excl", col("cum_incl") - col("c"))
      .join(nDf, Seq("g"))
      .withColumn("i50", expr("(n*50+99) DIV 100"))
      .withColumn("i90", expr("(n*90+99) DIV 100"))
      .withColumn("i99", expr("(n*99+99) DIV 100"))
      .filter(covers(col("i50")) || covers(col("i90")) || covers(col("i99")))
      .groupBy(col("g").as("l_returnflag"))
      .agg(
        max(when(covers(col("i50")), col("v"))).as("p50"),
        max(when(covers(col("i90")), col("v"))).as("p90"),
        max(when(covers(col("i99")), col("v"))).as("p99"))
      .orderBy(col("l_returnflag"))
      .persist()
    out.count()
    counts.unpersist()
    out
  }

  /** C13 — pivot with an explicit value list (single pass, no value-
    * discovery job). */
  def q13Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** C14 — event-time bucketing (daily activity rollup). */
  def q14Timeagg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("day"), col("event_type"))

  /** C16 — set operations: customers appearing in both high- and
    * low-value order populations (INTERSECT) and only in high
    * (EXCEPT). */
  def q16Setops(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val high = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    val low = o.filter(col("o_totalprice") < 50000).select(col("o_custkey"))
    val both = high.intersect(low).withColumn("segment", lit("both"))
    val onlyHigh = high.except(low).withColumn("segment", lit("high_only"))
    both.unionByName(onlyHigh)
      .groupBy(col("segment")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("segment"))
  }

  /** C17 — correlated scalar subquery: orders priced above their
    * customer's average order value. */
  def q17Scalar(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgs = o.groupBy(col("o_custkey").as("k")).agg(avg(col("o_totalprice")).as("cavg"))
    o.join(avgs, o("o_custkey") === avgs("k"))
      .filter(col("o_totalprice") > col("cavg"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_above"), round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("o_custkey"))
  }

  /** C18 — JSON column processing: parse events.props, bucket the
    * embedded k value, aggregate. `from_json` with an explicit schema
    * (single codegen'd parse, no schema inference). */
  def q18Json(s: SparkSession, dir: String): DataFrame = {
    val props = from_json(col("props"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType))))
    Tables.events(s, dir)
      .select(col("event_type"), props.getField("k").as("k"), col("value"))
      // integer division on both sides: a double-divide + cast would
      // truncate here but round in DuckDB
      .groupBy(col("event_type"), expr("CAST(k DIV 10 AS INT)").as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"), col("k_bucket"))
  }

  /** C22 — batch sessionization (the batch twin of streaming H2): a
    * session breaks after 30 idle minutes; classic gap-flag + running
    * sum assigns session ids, then per-session aggregates. */
  def q22Sessions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 30 * 60 * 1000L
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // millisecond-exact gap on both engines (unix_millis / epoch_ms);
      // a seconds-granularity cast would truncate differently than the
      // oracle's fractional epoch
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** C24 — ranking window family: ntile deciles, percent_rank,
    * cume_dist, dense_rank over customer balances per nation. */
  def q24Rank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
    // percent_rank/cume_dist are exact rationals k/n; with n a power
    // of two (sf0.1 has a 640-customer nation) k/n can land EXACTLY on
    // a 6th-decimal tie (333/640 = .5203125), where Spark's round()
    // goes HALF_UP and DuckDB's HALF_EVEN. floor(x·1e6 + 0.5)/1e6 is
    // the same HALF_UP on both engines (identical doubles in, floor is
    // unambiguous), so the oracle can't diverge on ties.
    def r6(c: org.apache.spark.sql.Column) = floor(c * lit(1000000.0) + lit(0.5)) / 1000000.0
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("bal"),
        ntile(4).over(w).as("quartile"),
        r6(percent_rank().over(w)).as("pr"),
        r6(cume_dist().over(w)).as("cd"),
        dense_rank().over(w).as("dr"))
      .orderBy(col("c_custkey"))
  }

  /** C23 — range (interval) join: per purchase event, the count of
    * same-user events in the preceding 24 hours.
    *
    * Scale pattern: a naive theta join is a nested-loop; instead both
    * sides are bucketed by day and equi-joined on (user, bucket) with
    * the purchase side exploded into the two buckets its window can
    * touch (each candidate has ONE bucket, so no pair is matched
    * twice), then the exact range filter applies — shuffle-bounded at
    * any scale. */
  def q23Range(s: SparkSession, dir: String): DataFrame = {
    val windowMs = 86400000L
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        unix_millis(col("ts")).as("t0"))
      .withColumn("bucket",
        explode(array(expr(s"t0 div $windowMs"), expr(s"t0 div $windowMs - 1"))))
    val prior = ev
      .select(col("user_id"), unix_millis(col("ts")).as("t"))
      .withColumn("bucket", expr(s"t div $windowMs"))
    purchases.join(prior,
        col("p_user") === prior("user_id") && purchases("bucket") === prior("bucket"))
      .filter(col("t") >= col("t0") - windowMs && col("t") < col("t0"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_prior_24h"))
      .orderBy(col("purchase_id"))
  }

  /** C25 — value-RANGE window frame: per customer, each order's
    * trailing-90-day spend (RANGE BETWEEN, not ROWS — frames are bound
    * by orderdate VALUES, so gaps and same-day orders behave like the
    * SQL standard says, unlike a row-count frame). */
  def q25RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("o_orderdate"), lit("1990-01-01")).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(days)
      .rangeBetween(-89, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        round(sum(col("o_totalprice")).over(w), 2).as("spend_90d"),
        count(lit(1)).over(w).as("n_orders_90d"))
      .orderBy(col("o_custkey"), col("od"), col("o_orderkey"))
  }

  /** C20 — string function suite over part names: substring, position,
    * replace, concat, padding, case — one row per transformation mix. */
  def q20Strings(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("head5"),
        length(col("p_name")).cast("long").as("name_len"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"))
      .orderBy(col("p_partkey"))

  /** C21 — date/time function suite over orders: truncation, parts,
    * arithmetic, formatting. */
  def q21Dates(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
      .orderBy(col("o_orderkey"))

  /** C19 — sketch-based approximate aggregates (the 100 TB path where
    * exact distinct/percentile shuffles are unaffordable): HLL++
    * distinct counts and t-digest-style percentiles. Rows-only checked;
    * RelationalSpec bounds the relative error against the exact twins
    * (q8/q12). */
  def q19Approx(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 2).as("ap50"),
        round(expr("approx_percentile(l_extendedprice, 0.99, 10000)"), 2).as("ap99"))
      .orderBy(col("l_returnflag"))

  /** C15 — skew-safe join: the build side is replicated over SALT
    * deterministic buckets so one hot user_id cannot pin a single task.
    * Result is identical to the plain join (the oracle checks that). */
  def q15Skew(s: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val ev = Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    val cust = Tables.customer(s, dir)
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    ev.join(cust, ev("user_id") === cust("c_custkey") && ev("salt") === cust("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }
}
