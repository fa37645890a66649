package graft

import graft.ext.{Dedup, Similarity}

class SimilaritySpec extends SparkSpec {

  test("LSH-bucketed pairs are a subset of the exact cosine pairs") {
    val exact = Dedup.embeddingCosinePairs(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshBucketedPairs(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH invented pairs: ${lsh -- exact}")
  }

  test("group centroids match an independent local quantized-mean recomputation") {
    val rows = Tables.embeddings(spark, sf)
      .selectExpr("label", "cast(embedding as array<double>) v").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val expected = rows.groupBy(_._1).flatMap { case (label, vs) =>
      (0 until 64).map { d =>
        val sums = vs.map { case (_, v) =>
          math.floor(v(d) * 1048576.0 + 0.5).toLong }.sum
        (label, d) -> (vs.length.toLong,
          sums.toDouble / vs.length / 1048576.0)
      }
    }
    val got = Similarity.groupCentroids(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected)
  }

  test("IVF top-k scores agree with brute force on shared candidates") {
    val brute = Similarity.bruteForceTopK(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val shared = brute.keySet intersect ivf.keySet
    assert(shared.forall(k => brute(k) == ivf(k)))
  }

  test("multi-probe IVF recall is at least single-probe recall") {
    val brute = Similarity.bruteForceTopK(spark, sf)
      .collect().map(_.getLong(0)).take(5).toSet
    val p1 = graft.ext.KMeans.ivfTrainedTopK(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val p2 = graft.ext.KMeans.ivfTrainedTopKMultiProbe(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert((p2 intersect brute).size >= (p1 intersect brute).size,
      s"probing 2 cells lost recall: p1=${p1 intersect brute} " +
        s"p2=${p2 intersect brute}")
    // the single-probe cell is among the 2 probed cells, so every
    // single-probe candidate stays a candidate; scores are identical,
    // so the p2 top-5 can only swap in better candidates
    assert(p2.size == 5)
  }

  test("brute-force top-k refuses to run past its row guard") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(spark, sf, maxRows = 10)
    }
    assert(ex.getMessage.contains("IVF"),
      "guard message should point at the probe path")
  }

  test("contrastive triplets: cyclic in-batch negatives recompute " +
      "exactly; negatives never collide with their own pair") {
    def recompute(pairs: Seq[(Long, Long, Double)]) = {
      val sorted = pairs.sortBy(p => (p._1, p._2))
      sorted.zipWithIndex.flatMap { case ((a, b, cos), i) =>
        val neg = sorted((i + 1) % sorted.length)._2
        if (neg != a && neg != b) Some((a, b, neg, cos)) else None
      }
    }
    // constructed pair set: deterministic, non-empty, includes an
    // adjacent-pair collision (the (1,2)/(2,3) share) so the filter
    // is exercised
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (5L, 6L, 0.7),
      (7L, 9L, 0.6))
    val s = spark
    import s.implicits._
    val df = pairs.toDF("vec_a", "vec_b", "cosine")
    val got = Similarity.contrastiveOn(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == recompute(pairs))
    assert(got.nonEmpty)
    got.foreach { case (a, b, n, _) =>
      assert(n != a && n != b, s"negative collides in triplet ($a,$b,$n)")
    }
    // registered query == the same recompute over the corpus's own
    // (possibly empty at this sf) LSH pair set
    val corpusPairs = Similarity.lshBucketedPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val gotCorpus = Similarity.contrastivePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(gotCorpus.toSeq ==
      (if (corpusPairs.isEmpty) Seq.empty else recompute(corpusPairs)))
  }
}
