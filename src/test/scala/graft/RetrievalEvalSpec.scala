package graft

import graft.ext.{KMeans, RetrievalEval}
import org.apache.spark.sql.functions._

/** Independent-recompute checks for the retrieval eval harness:
  * metrics recomputed in plain Scala from the collected sys/truth
  * rankings, compared exactly (integers end-to-end). */
class RetrievalEvalSpec extends SparkSpec {

  private def ranking(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Seq[Long]] =
    df.select(col("query_id"), col("vec_id"), col("rk").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }

  test("metrics match a plain-Scala recomputation from the rankings") {
    val cents = KMeans.train(spark, sf)
    val qrows = KMeans.batchQueryRows(spark, sf)
    val truth = RetrievalEval.exactBatchTopK(
      KMeans.vecs(spark, sf), qrows, RetrievalEval.EvalK)
    val sys = KMeans.ivfBatchTopKWith(spark, sf, cents)
      .select(col("query_id"), col("vec_id"), col("rk"))
    val tMap = ranking(truth)
    val sMap = ranking(sys)
    val disc = RetrievalEval.DiscountMicro.toMap
    val got = RetrievalEval.metricsOn(sys, truth).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == sMap.keySet && got.nonEmpty)
    for ((q, sysIds) <- sMap) {
      val rel = tMap(q).toSet
      val hits = sysIds.zipWithIndex.collect {
        case (id, i) if rel(id) => i + 1 // 1-based rank
      }
      val frr = hits.headOption.getOrElse(0)
      val dcg = hits.map(disc).sum
      val exp = (sysIds.length.toLong, hits.length.toLong, frr,
        if (frr > 0) 1000000L / frr else 0L, dcg,
        dcg * 1000000L / RetrievalEval.IdcgMicro)
      assert(got(q) == exp, s"query $q: got ${got(q)}, want $exp")
    }
  }

  test("probe-2 metrics dominate probe-1 (candidate superset)") {
    // any candidate outscoring a truth member is itself a truth
    // member, so widening the candidate set can only add hits
    val rows = RetrievalEval.evalForms(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val p1 = rows.filter(_._1 == "ivf").map(t => t._2 -> t._3).toMap
    val p2 = rows.filter(_._1 == "ivf_p2").map(t => t._2 -> t._3).toMap
    assert(p1.nonEmpty && p1.keySet == p2.keySet)
    assert(p1.forall { case (q, h) => p2(q) >= h })
  }

  test("the self form is the all-maxima calibration row") {
    val rows = RetrievalEval.evalForms(spark, sf).collect()
      .filter(_.getString(0) == "self")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == RetrievalEval.EvalK.toLong) // hits_at_k
      assert(r.getInt(4) == 1)                           // first_rel_rank
      assert(r.getLong(5) == 1000000L)                   // mrr_micro
      assert(r.getLong(6) == RetrievalEval.IdcgMicro)    // dcg_micro
      assert(r.getLong(7) == 1000000L)                   // ndcg_micro
    }
  }

  test("discount table is monotone and anchored at rank 1") {
    val ds = RetrievalEval.DiscountMicro
    assert(ds.head == (1 -> 1000000L))
    assert(ds.map(_._2) == ds.map(_._2).sorted.reverse)
    assert(RetrievalEval.IdcgMicro == ds.map(_._2).sum)
  }
}
