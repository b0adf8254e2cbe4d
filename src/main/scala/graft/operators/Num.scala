package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-deterministic rounding for EXACT-RATIONAL scores.
  *
  * Ratios of small integers (jaccard |∩|/|∪|, closeness reached/Σdist,
  * clustering 2t/d(d−1), cume_dist k/n) can land EXACTLY on a decimal
  * rounding tie whenever the reduced denominator is 2^a·5^b — e.g.
  * 1/32 = 0.03125 at 4 digits, 1/128 = 0.0078125 at 6, 333/640 =
  * 0.5203125 at 6 (the q24 sf0.1 incident). On exact ties Spark's
  * `round` goes HALF_UP while DuckDB's goes HALF_EVEN, so a
  * hash-compared gate diverges depending on which denominators the
  * scale factor happens to produce.
  *
  * `floor(x·10^d + 0.5) / 10^d` is the same HALF_UP on BOTH engines:
  * the input double is identical (exact rationals divide exactly),
  * the scaled sum is exact for these values, and floor is unambiguous.
  * Oracle SQL uses the same expression verbatim. (For irrational
  * float sums the two engines differ in summation order anyway —
  * that's the separate, accepted noise class; this helper targets the
  * values that are bit-identical on both sides.) */
object Num {
  def roundTies(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The DuckDB twin of [[roundTies]], for composing oracle SQL. */
  def roundTiesSql(expr: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }
}
