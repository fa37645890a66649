package graft

class QueriesSpec extends SparkSpec {

  test("every oracle key has a matching query (driver contract)") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every registered query is oracle-checked (no rows-only checks)") {
    // Sketch outputs (GK quantiles) can't hash-match an independent
    // engine, so those live as library functions under tolerance
    // tests (OpsSpec) while their deterministic projections are
    // registered — the registry itself stays 100% oracle-green.
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries without an oracle: $unchecked")
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
