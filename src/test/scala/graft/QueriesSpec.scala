package graft

class QueriesSpec extends SparkSpec {

  test("every oracle key has a matching query (driver contract)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every registered query is oracle-checked, except the documented " +
      "rows-only set") {
    // Sketch outputs (GK quantiles) can't hash-match an independent
    // engine, so those live as library functions under tolerance
    // tests (OpsSpec) while their deterministic projections are
    // registered. The rows-only allowlist below is the driver
    // contract's documented weaker check for ops DuckDB cannot
    // express — each entry must name WHY and carry spec-level
    // substance instead; adding a name here without that is a
    // review flag.
    val rowsOnly = Set(
      // learned-OPQ rotation: the orthogonal-Procrustes SVD inside
      // the alternating minimization is not DuckDB-expressible;
      // ProductQuantSpec asserts monotone descent, R-orthonormality,
      // and end-to-end recon error + 20-query recall >= the seeded
      // (fully oracle-gated) rotation chain
      "sim_opq_learned_topk")
    val unchecked =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(unchecked.isEmpty, s"queries without an oracle: $unchecked")
    // and the allowlist can't silently rot: every entry must exist
    // and must NOT have grown an oracle (else it belongs in the gate)
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert((rowsOnly intersect SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run at sf0.001 and non-summary ones return rows") {
    // queries whose correct answer may legitimately be empty (pair
    // finders above a similarity threshold)
    val mayBeEmpty = Set("dedup_embedding_cosine", "join_anti_customers",
      "sim_lsh_bucketed_pairs",
      // triplets inherit the LSH pair set's possible emptiness, and a
      // single pair yields zero valid triplets (its cyclic negative is
      // itself); the semantics are spec-tested on constructed pairs
      "sim_contrastive_pairs")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("column names are stable between runs (hash-compare contract)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val c1 = fn(spark, sf).columns.toSeq
      val c2 = fn(spark, sf).columns.toSeq
      assert(c1 == c2, s"$name unstable columns")
      assert(c1.distinct == c1, s"$name duplicate column names")
    }
  }
}
