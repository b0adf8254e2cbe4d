package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity of two
  * array<double> columns (SURVEY §2 E/F hot path).
  *
  * One fused pass over both arrays computing dot product and both
  * norms, with `doGenCode` so it stays inside WholeStageCodegen — the
  * higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates an intermediate array and interprets a lambda per
  * element, which is the difference between memory-bandwidth-bound
  * and interpreter-bound at 10⁸ vectors.
  *
  * Accumulation order matches the sequential left-fold of the HOF
  * version and DuckDB's list_cosine_similarity, so results are
  * bit-identical across all three.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, false) ||
        left.dataType == ArrayType(DoubleType, true)) {
      if (right.dataType == ArrayType(DoubleType, false) ||
          right.dataType == ArrayType(DoubleType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right must be array<double>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left must be array<double>, got ${left.dataType}")
  }

  // a null ELEMENT nulls the whole result (matching the HOF formulation,
  // where null propagates through the aggregate fold), so the result is
  // nullable even over non-null array columns
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // norms must cover the full arrays even on length mismatch
    var j = n
    while (j < a.numElements()) {
      if (a.isNullAt(j)) return null
      val x = a.getDouble(j); na += x * x; j += 1
    }
    var k = n
    while (k < b.numElements()) {
      if (b.isNullAt(k)) return null
      val y = b.getDouble(k); nb += y * y; k += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val bad = ctx.freshName("bad")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int $i = $n; !$bad && $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; break; }
         |  double $x = $a.getDouble($i); $na += $x * $x;
         |}
         |for (int $i = $n; !$bad && $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) { $bad = true; break; }
         |  double $y = $b.getDouble($i); $nb += $y * $y;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  private val registered = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Register cosine_sim with a session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registered.computeIfAbsent(java.lang.System.identityHashCode(spark).toString, _ => {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
      true
    })

  /** Column API for [[CosineSimilarity]] (registers on first use). */
  def cosine_sim(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }
}
