package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.ColumnOps._

/** Property-based invariants (SURVEY.md §5: clip ⇒ within bounds,
  * norm ⇒ [0,1], buckets exhaustive & disjoint) — checked through the
  * actual Catalyst expressions, not Scala reimplementations.
  * Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-plus bridge artifact is not provisioned). */
class PropertiesSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private val doubles = Gen.chooseNum(-1e6, 1e6)

  /** Draw n deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("clip always lands inside [lo, hi] and is idempotent") {
    for (((a, b), i) <- samples(Gen.zip(doubles, doubles), 10).zipWithIndex) {
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val xs = samples(doubles, 25).toList
      val out = xs.toDF("x")
        .select(clip($"x", lo, hi).as("c"),
          clip(clip($"x", lo, hi), lo, hi).as("cc"))
        .collect()
      assert(out.forall(r => r.getDouble(0) >= lo && r.getDouble(0) <= hi), s"iter $i")
      assert(out.forall(r => r.getDouble(0) == r.getDouble(1)), s"iter $i")
    }
  }

  test("minMaxScale of values within [min,max] lands in [0,1]") {
    for (i <- 0 until 10) {
      val xs = samples(doubles, 25).map(_ + i).toList
      val (mn, mx) = (xs.min, xs.max)
      val out = xs.toDF("x").select(minMaxScale($"x", mn, mx)).collect()
      assert(out.forall { r =>
        val v = r.getDouble(0); v >= 0.0 && v <= 1.0
      }, s"iter $i")
    }
  }

  test("every numeric lands in exactly one bucket of each family") {
    val xs = samples(doubles, 200).toList
    val margins = xs.toDF("r").select(marginCategory($"r")).as[String].collect()
    assert(margins.forall(Set("low", "medium", "high")))
    val sizes = xs.toDF("u").select(orderSizeCategory($"u")).as[String].collect()
    assert(sizes.forall(Set("small", "medium", "large")))
  }

  test("safeDiv never throws and nulls exactly the zero divisors") {
    val pairs = samples(
      Gen.zip(doubles, Gen.oneOf(doubles, Gen.const(0.0))), 100).toList
    val out = pairs.toDF("a", "b").select($"b", safeDiv($"a", $"b")).collect()
    assert(out.forall(r => (r.getDouble(0) == 0.0) == r.isNullAt(1)))
  }

  test("native cosine is symmetric and bounded in [-1, 1]") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0))
      .suchThat(_.exists(_ != 0.0))
    val vs = samples(Gen.zip(vecGen, vecGen), 25).toList
    val out = vs.toDF("a", "b").select(
      graft.functions.CosineSimilarity($"a", $"b").as("ab"),
      graft.functions.CosineSimilarity($"b", $"a").as("ba")).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val ab = r.getDouble(0)
      ab >= -1.0000000001 && ab <= 1.0000000001 && ab == r.getDouble(1)
    })
  }
}
