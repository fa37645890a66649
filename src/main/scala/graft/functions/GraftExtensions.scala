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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
    e.injectFunction(GraftExtensions.simhashAggDescriptor)
    e.injectFunction(GraftExtensions.vecStatsDescriptor)
  }
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

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(cosineSimilarityDescriptor, simhashAggDescriptor,
      vecStatsDescriptor).foreach {
      case (id, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "scala_udf")
    }
  }
}
