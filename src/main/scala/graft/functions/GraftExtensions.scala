package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration (SURVEY.md §7.3): makes the native
  * expressions SQL-callable, e.g.
  * `SELECT cosine_similarity(a, b) FROM t`.
  *
  * Use with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(e.injectFunction)
}

object GraftExtensions {
  private[functions] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"cosine_similarity takes 2 arguments, got ${children.size}")
      CosineSimilarity(children.head, children(1))
    })

  private[functions] val simhashAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_agg"),
    new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"simhash_agg takes 1 argument, got ${children.size}")
      SimHashAgg(children.head).toAggregateExpression()
    })

  private[functions] val vecStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_stats"),
    new ExpressionInfo(classOf[VecStats].getName, "vec_stats"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"vec_stats takes 1 argument, got ${children.size}")
      VecStats(children.head)
    })

  private[functions] val rollingHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"rolling_hash takes 1 argument, got ${children.size}")
      RollingHash(children.head)
    })

  private[functions] val vecSubDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_sub"),
    new ExpressionInfo(classOf[VecSub].getName, "vec_sub"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"vec_sub takes 2 arguments, got ${children.size}")
      VecSub(children.head, children(1))
    })

  /** Evaluate a FOLDABLE literal-array argument at resolution time —
    * how the parameterized kernels (query codes, rotation matrices)
    * accept their constants from SQL text. */
  private def foldedArray(e: Expression, what: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, s"$what must be a literal array expression")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
  }

  private[functions] val sq8BytesDistDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sq8_bytes_dist"),
    new ExpressionInfo(classOf[Sq8BytesDist].getName, "sq8_bytes_dist"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"sq8_bytes_dist takes (codes, query_codes), got ${children.size}")
      children(1).dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, _) => ()
        case other => throw new IllegalArgumentException(
          s"sq8_bytes_dist query codes must be array<int> (plain " +
            s"integer literals), got ${other.sql}")
      }
      val q = foldedArray(children(1), "sq8_bytes_dist query codes")
      Sq8BytesDist(children.head,
        (0 until q.numElements()).map(q.getInt))
    })

  private[functions] val matVecDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mat_vec"),
    new ExpressionInfo(classOf[MatVec].getName, "mat_vec"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"mat_vec takes (vector, matrix_literal), got ${children.size}")
      // SQL numeric literals with a decimal point parse as DECIMAL —
      // demand doubles explicitly (write 1.0d / CAST(... AS DOUBLE))
      // rather than ClassCastException-ing deep in ArrayData
      children(1).dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, _), _) => ()
        case other => throw new IllegalArgumentException(
          s"mat_vec matrix must be array<array<double>> (suffix SQL " +
            s"literals with 'd'), got ${other.sql}")
      }
      val m = foldedArray(children(1), "mat_vec matrix")
      val rows = (0 until m.numElements()).map { i =>
        val row = m.getArray(i)
        (0 until row.numElements()).map(row.getDouble)
      }
      MatVec(children.head, rows)
    })

  private[functions] val all = Seq(cosineSimilarityDescriptor,
    simhashAggDescriptor, vecStatsDescriptor, rollingHashDescriptor,
    vecSubDescriptor, sq8BytesDistDescriptor, matVecDescriptor)

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach {
      case (id, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "scala_udf")
    }
  }
}
