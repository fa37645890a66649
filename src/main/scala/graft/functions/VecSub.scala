package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: elementwise difference of two
  * `array<double>` columns — the residual computation of residual
  * product quantization ([[graft.ext.ProductQuant]]: r = v − c_cell
  * before sub-quantizer assignment).
  *
  * Why an expression and not `zip_with(a, b, _ - _)`: higher-order
  * functions evaluate interpreted (~50 µs/eval — the
  * [[NearestCentroid]] failure mode), which would put an interpreted
  * seam in the middle of the otherwise fully-codegen'd corpus encode.
  * This is one generated subtraction loop, fused into whole-stage
  * codegen, IEEE-identical to the oracle's per-element `a[i] - b[i]`.
  *
  * Mismatched lengths fail loudly (eval and codegen), same contract
  * as [[NearestCentroid]]'s dimension guard.
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sub expects (array<double>, array<double>), got " +
            s"(${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_sub: length mismatch ($n vs ${y.numElements()})")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = x.getDouble(i) - y.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_sub: length mismatch (" + $n + " vs " +
         |    $y.numElements() + ")");
         |}
         |final double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $x.getDouble($i) - $y.getDouble($i);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)
}

object VecSub {
  /** Column-API entry point: elementwise `a - b` over two
    * `array<double>` columns in one generated loop. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecSub(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
