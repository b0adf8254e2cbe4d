package graft

import org.apache.spark.sql.functions._

import graft.operators.JaccardJoin

/** Property-style exactness check for the shared prefix-filter +
  * df-cap hybrid: on randomized set systems, for every (threshold,
  * dfCap) — including caps that force EVERYTHING through the high-df
  * candidate path — the output must equal the naive all-pairs
  * inverted-index join, pair for pair and value for value. */
class JaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  private def metricCol(metric: String): org.apache.spark.sql.Column = {
    val i = col("i").cast("double")
    metric match {
      case "jaccard" => i / (col("n1") + col("n2") - col("i"))
      case "overlap" => i / least(col("n1"), col("n2")).cast("double")
      case "cosine"  => i / sqrt(col("n1").cast("double") * col("n2"))
    }
  }

  private def naiveMetric(rows: org.apache.spark.sql.DataFrame,
                          threshold: Double, metric: String) = {
    val r = rows.select(col("id"), col("item")).distinct()
    val sizes = r.groupBy(col("id")).agg(count(lit(1)).as("n"))
    r.alias("x").join(r.alias("y"),
        col("x.item") === col("y.item") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .filter(metricCol(metric) >= threshold)
      .select(col("id1"), col("id2"), metricCol(metric).as("sim"))
  }

  private def naive(rows: org.apache.spark.sql.DataFrame, threshold: Double) =
    naiveMetric(rows, threshold, "jaccard")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 10000))).toSet

  test("exactPairs equals the naive join on random set systems, both cap regimes") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // skewed universe: item k drawn with weight ~ 1/(k+1) → a few
      // very frequent items (the hub/boilerplate case) + a long tail
      val nIds = 40 + rnd.nextInt(30)
      val nItems = 30
      val rows = (1 to nIds).flatMap { id =>
        val sz = 3 + rnd.nextInt(8)
        (1 to sz).map { _ =>
          val u = rnd.nextDouble()
          val item = math.min((math.exp(u * math.log(nItems + 1.0)) - 1).toInt, nItems - 1)
          (id.toLong, s"item$item")
        }
      }.toDF("id", "item")
      rows.persist()
      for (threshold <- Seq(0.2, 0.5); cap <- Seq(1L, 4L, 1000000L)) {
        val got = asSet(JaccardJoin.exactPairs(rows, threshold, cap))
        val want = asSet(naive(rows, threshold))
        assert(got == want,
          s"trial=$trial θ=$threshold cap=$cap: ${got.size} vs ${want.size} pairs; " +
            s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
        assert(want.nonEmpty, s"trial=$trial θ=$threshold produced no pairs (vacuous)")
      }
      rows.unpersist()
    }
  }

  test("exactPairsMetric equals the naive join for overlap and cosine, " +
       "every cap regime (r12 metric variants)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 2) {
      val nIds = 40 + rnd.nextInt(30)
      val nItems = 30
      val rows = (1 to nIds).flatMap { id =>
        val sz = 3 + rnd.nextInt(8)
        (1 to sz).map { _ =>
          val u = rnd.nextDouble()
          val item = math.min((math.exp(u * math.log(nItems + 1.0)) - 1).toInt, nItems - 1)
          (id.toLong, s"item$item")
        }
      }.toDF("id", "item")
      rows.persist()
      for (metric <- Seq("overlap", "cosine");
           threshold <- Seq(0.35, 0.6); cap <- Seq(1L, 4L, 1000000L)) {
        val got = asSet(JaccardJoin.exactPairsMetric(rows, threshold, cap, metric))
        val want = asSet(naiveMetric(rows, threshold, metric))
        assert(got == want,
          s"trial=$trial $metric θ=$threshold cap=$cap: ${got.size} vs " +
            s"${want.size} pairs; missing=${(want -- got).take(3)} " +
            s"extra=${(got -- want).take(3)}")
        assert(want.nonEmpty, s"trial=$trial $metric θ=$threshold vacuous")
      }
      rows.unpersist()
    }
    // unknown metric rejects before any work
    import spark.implicits._
    intercept[IllegalArgumentException](JaccardJoin.exactPairsMetric(
      Seq((1L, "a")).toDF("id", "item"), 0.5, 10L, "dice"))
  }
}
