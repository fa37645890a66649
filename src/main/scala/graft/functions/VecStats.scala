package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the embedding-profile statistics
  * (sum of squares, max |x|, int8-quantization checksum) of an
  * `array<double>` column in ONE fused codegen loop, returned as
  * `array<double>` [sum_sq, max_abs, quant_sum].
  *
  * The composable form ([[graft.ext.Similarity.embeddingProfile]]'s
  * original `aggregate(transform(...))` stack) evaluates four
  * interpreted higher-order functions per row — the same
  * non-codegen-hot-path failure mode [[NearestCentroid]] documents
  * (~50 µs per HOF evaluation; pathological at millions of rows).
  *
  * Semantics are engine-exact: sum-of-squares and quant_sum are
  * LEFT-TO-RIGHT folds (identical IEEE result to the oracle's
  * sequential list_sum), max_abs is a running max, and the
  * quantization step `floor(127·x/max_abs + 0.5)` divides by the
  * SAME max_abs the first pass computed. Two passes over the array
  * inside one generated loop body — no intermediate arrays, no
  * virtual calls.
  */
case class VecStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_stats expects array<double>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sumSq = 0.0
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      sumSq += xi * xi
      val ab = math.abs(xi)
      if (ab > maxAbs) maxAbs = ab
      i += 1
    }
    var quant = 0.0
    // all-zero vector: 127*x/maxAbs would be 0/0 = NaN per element;
    // pin quant_sum to 0 (matches the oracle's explicit zero guard)
    if (maxAbs > 0.0) {
      i = 0
      while (i < n) {
        quant += math.floor(127.0 * x.getDouble(i) / maxAbs + 0.5)
        i += 1
      }
    }
    new GenericArrayData(Array(sumSq, maxAbs, quant))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val ab = ctx.freshName("ab")
      val sumSq = ctx.freshName("sumSq")
      val maxAbs = ctx.freshName("maxAbs")
      val quant = ctx.freshName("quant")
      s"""
         |final int $n = $x.numElements();
         |double $sumSq = 0.0, $maxAbs = 0.0, $quant = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $x.getDouble($i);
         |  $sumSq += $xi * $xi;
         |  final double $ab = java.lang.Math.abs($xi);
         |  if ($ab > $maxAbs) $maxAbs = $ab;
         |}
         |if ($maxAbs > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $quant += java.lang.Math.floor(
         |      127.0 * $x.getDouble($i) / $maxAbs + 0.5);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new double[] {$sumSq, $maxAbs, $quant});
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): VecStats = copy(child = newChild)
}

object VecStats {
  /** Column-API entry point: `[sum_sq, max_abs, quant_sum]` of an
    * `array<double>` column in one fused loop. */
  def apply(v: Column): Column =
    GraftSqlBridge.column(VecStats(GraftSqlBridge.expression(v)))
}
