package graft.ext

import org.apache.spark.sql.functions._

/** Edge cases where the Spark recipe and the DuckDB oracle replay
  * could silently diverge (ADVICE round 7): a source name with no
  * digits must map to index 0 (full weight) on BOTH engines, not to
  * a null-falls-through default on one and an error on the other. */
class SamplingEdgeSpec extends graft.SparkSpec {

  test("digit-less source name maps to index 0 / full threshold") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "webcrawl"), (2L, "src3")).toDF("doc_id", "source")
    val got = Sampling.withMixColumns(df)
      .select(col("source"), col("mix_threshold"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("webcrawl") == 10000L, "no digits -> idx 0 -> full weight")
    assert(got("src3") == 1000L, "suffix 3 -> 0.1 weight")
  }

  test("oracle threshold SQL agrees with Spark on digit-less names") {
    // The oracle uses COALESCE(TRY_CAST(...), 0); assert the Spark
    // column produces the same value for the no-digit case so the
    // two recipes are pinned together.
    val s = spark; import s.implicits._
    val idx = Seq("nodigits").toDF("source")
      .select(Sampling.sourceIdx(col("source")).as("i"))
      .head.getLong(0)
    assert(idx == 0L)
    assert(Sampling.threshSql.contains("TRY_CAST"),
      "oracle must tolerate digit-less names the same way")
  }
}
