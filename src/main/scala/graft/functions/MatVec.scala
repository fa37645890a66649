package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: y = M·x for a LITERAL matrix — the
  * vector pre-transform of FAISS's `PreTransform` indexes (random
  * rotation / OPQ / PCA applied before quantization). A composable
  * formulation would be d nested `aggregate(zip_with(...))` folds —
  * d × d interpreted higher-order evaluations per row (the
  * [[NearestCentroid]] failure mode, squared); this is one generated
  * two-level loop fused into whole-stage codegen.
  *
  * Semantics are engine-exact: output component i is the
  * LEFT-TO-RIGHT fold Σⱼ M[i][j]·x[j], identical to the oracle's
  * `list_sum(list_transform(range(1, d+1), j -> row[j] * x[j]))`. */
case class MatVec(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix.forall(_.size == matrix.head.size),
    "mat_vec: empty or ragged matrix")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec expects array<double>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val m: Array[Array[Double]] =
    matrix.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val rows = m.length
    val cols = m(0).length
    if (x.numElements() < cols)
      throw new IllegalArgumentException(
        s"mat_vec: input vector has ${x.numElements()} elements, " +
          s"matrix has $cols columns")
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      val row = m(i)
      var acc = 0.0
      var j = 0
      while (j < cols) {
        acc += row(j) * x.getDouble(j)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mR = ctx.addReferenceObj("matrix", m, "double[][]")
      val rows = ctx.freshName("rows")
      val cols = ctx.freshName("cols")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |final int $rows = $mR.length;
         |final int $cols = $mR[0].length;
         |if ($x.numElements() < $cols) {
         |  throw new IllegalArgumentException(
         |    "mat_vec: input vector has " + $x.numElements() +
         |    " elements, matrix has " + $cols + " columns");
         |}
         |final double[] $out = new double[$rows];
         |for (int $i = 0; $i < $rows; $i++) {
         |  final double[] $row = $mR[$i];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $cols; $j++) {
         |    $acc += $row[$j] * $x.getDouble($j);
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MatVec = copy(child = newChild)
}

object MatVec {
  /** Column-API entry point: M·x in one generated loop. */
  def apply(v: Column, matrix: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      MatVec(GraftSqlBridge.expression(v), matrix))
}
