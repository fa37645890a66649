package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (squared
  * L2) among a LITERAL codebook, for k-means assignment and PQ
  * encoding ([[graft.ext.KMeans.assignOn]]).
  *
  * Why an expression and not composed columns: the composable forms
  * both fail at scale —
  *  - `aggregate(zip_with(...))` per centroid: higher-order functions
  *    evaluate interpretively (no codegen); measured ~3.7 ms/row on
  *    the 20M-row PQ encode in ScaleUp's ann tier.
  *  - fully unrolled `element_at` arithmetic: K·d expression nodes
  *    per assignment (19k for K=10, d=64) — janino OOMs compiling the
  *    generated projection.
  * This expression is O(1) generated-code size: the codebook is a
  * `double[][]` reference object and the argmin is a two-level loop,
  * fused into whole-stage codegen.
  *
  * Semantics are engine-exact and match the DuckDB oracle replay
  * ([[graft.ext.KMeans.distSqlN]]): per centroid the distance is the
  * LEFT-TO-RIGHT fold sum((x_i - c_i)^2), and the argmin keeps the
  * FIRST (lowest-id) centroid on exact ties (strict `<` update).
  * Interpreted eval and codegen use the identical loop.
  *
  * `rank` selects the argmin order statistic: 0 = nearest (the
  * default — identical behavior to the original expression), 1 =
  * second-nearest under the same (distance, cid) lexicographic order
  * (the oracle's `row_number() ... ORDER BY dist, cid` rn = rank+1).
  * The second-nearest is the per-ROW multi-probe enabler
  * ([[graft.ext.ClusterOps.knnGraphP2]]): the driver-side multi-probe
  * path ([[graft.ext.KMeans.ivfTrainedTopKMultiProbe]]) ranks cells
  * for ONE query on the driver, which cannot work when every corpus
  * row needs its own probe list. One pass, best + runner-up carried
  * together.
  *
  * `emitDist` returns the selected centroid's squared distance
  * (DoubleType) instead of its index — the per-row residual the
  * embedding-outlier flags z-score
  * ([[graft.ext.ClusterOps.embeddingOutliers]]). Same loop, same
  * fold order, so the value is bit-identical to the oracle's
  * `distSqlN` fold over the replayed centroids.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]],
    rank: Int = 0, emitDist: Boolean = false)
    extends UnaryExpression {

  require(centroids.nonEmpty, "empty codebook")
  require(centroids.forall(_.size == centroids.head.size),
    "ragged codebook")
  require(rank == 0 || (rank == 1 && centroids.size >= 2),
    s"rank must be 0 or 1 (with k >= 2 centroids), got $rank for " +
      s"k=${centroids.size}")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<double>, got ${other.sql}")
    }

  override def dataType: DataType =
    if (emitDist) DoubleType else IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = matrix.length
    val d = matrix(0).length
    // UnsafeArrayData.getDouble past numElements() reads garbage
    // silently — a short vector must fail loudly, not mis-assign
    if (x.numElements() < d)
      throw new IllegalArgumentException(
        s"nearest_centroid: input vector has ${x.numElements()} elements, " +
          s"codebook dimension is $d")
    var best = 0
    var bestDist = Double.PositiveInfinity
    var sec = 0
    var secDist = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val cv = matrix(c)
      var acc = 0.0
      var i = 0
      while (i < d) {
        val t = x.getDouble(i) - cv(i)
        acc += t * t
        i += 1
      }
      // strict < on both tiers = ties keep the earlier (lower) cid,
      // exactly ORDER BY dist, cid
      if (acc < bestDist) {
        secDist = bestDist; sec = best
        bestDist = acc; best = c
      } else if (acc < secDist) { secDist = acc; sec = c }
      c += 1
    }
    if (emitDist) { if (rank == 0) bestDist else secDist }
    else if (rank == 0) best
    else sec
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val sec = ctx.freshName("sec")
      val secDist = ctx.freshName("secDist")
      s"""
         |final int $k = $m.length;
         |final int $d = $m[0].length;
         |if ($x.numElements() < $d) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: input vector has " + $x.numElements() +
         |    " elements, codebook dimension is " + $d);
         |}
         |int $best = 0;
         |double $bestDist = Double.POSITIVE_INFINITY;
         |int $sec = 0;
         |double $secDist = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  final double[] $cv = $m[$c];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    final double $t = $x.getDouble($i) - $cv[$i];
         |    $acc += $t * $t;
         |  }
         |  if ($acc < $bestDist) {
         |    $secDist = $bestDist; $sec = $best;
         |    $bestDist = $acc; $best = $c;
         |  } else if ($acc < $secDist) { $secDist = $acc; $sec = $c; }
         |}
         |${ev.value} = ${
             if (emitDist) { if (rank == 0) bestDist else secDist }
             else if (rank == 0) best
             else sec};
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroid {
  /** Column-API entry point: argmin-distance centroid index of `v`
    * under `centroids` (ids = positions, ties to the lower id). */
  def apply(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(v), centroids))

  /** Second-nearest centroid index under the same (distance, cid)
    * order — the per-row probe-2 cell. */
  def second(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(v), centroids, rank = 1))

  /** Squared distance of `v` to its NEAREST centroid — the per-row
    * assignment residual (same left-to-right fold as the oracle's
    * distSqlN, so the double is engine-exact). */
  def distSq(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(v), centroids,
        emitDist = true))

  /** Squared distance to the SECOND-nearest centroid — with
    * [[distSq]] this gives the per-row assignment MARGIN, the
    * boundary-proximity signal the eval harness samples hard queries
    * by (a row whose two best cells are near-equidistant sits on a
    * Voronoi boundary, where single-probe recall actually loses
    * neighbors). */
  def secondDistSq(v: Column, centroids: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(v), centroids,
        rank = 1, emitDist = true))
}
