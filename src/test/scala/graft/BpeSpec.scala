package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** Independent-recompute checks for the BPE trainer: a plain-Scala
  * Sennrich-style reference (overlap-counting pair stats, greedy
  * leftmost non-overlapping merge application) over collected text,
  * compared exactly — the chain is all integer counts and total-order
  * tie-breaks, so equality is exact. Plus the adversarial fixture the
  * window algebra exists for: equal-symbol runs (`aaaa`), where naive
  * "merge every candidate" would overlap. */
class BpeSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  /** Reference BPE on a word-frequency map. */
  private def refTrain(hist: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var seqs: Map[String, Vector[String]] =
      hist.keys.map(w => w -> (w.map(_.toString).toVector :+ "_")).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    while (r < rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- seqs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + hist(w)
      if (counts.isEmpty) r = rounds
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((a, b, n))
        seqs = seqs.map { case (w, syms) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2 // greedy leftmost non-overlap
            } else { merged += syms(i); i += 1 }
          }
          w -> merged.toVector
        }
        r += 1
      }
    }
    (out.toSeq, seqs)
  }

  private def histOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("trainer matches the reference BPE on the corpus") {
    val hist = Bpe.wordHist(Tables.documents(spark, sf))
    val (rules, finalSeq) = Bpe.trainOn(hist)
    val (refRules, refSeqs) = refTrain(histOf(hist), Bpe.Merges)
    assert(rules.map(m => (m.a, m.b, m.pair_n)) == refRules)
    assert(rules.map(_.merge_rank) == (1 to rules.length))
    assert(rules.forall(m => m.merged == m.a + m.b))
    val got = finalSeq.orderBy(col("word"), col("p")).collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.sortBy(_.getInt(2)).map(_.getString(3)).toVector }
    assert(got == refSeqs)
  }

  private def segOf(finalSeq: org.apache.spark.sql.DataFrame) =
    finalSeq.orderBy(col("word"), col("p")).collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) =>
        w -> rows.sortBy(_.getInt(2)).map(_.getString(3)).toVector }

  test("batched trainer at maxBatch=1 IS the sequential trainer") {
    val hist = Bpe.wordHist(Tables.documents(spark, sf))
    val (seqRules, seqSeg) = Bpe.trainOn(hist)
    val (batRules, batSeg) = Bpe.trainBatched(hist, Bpe.Merges,
      maxBatch = 1)
    assert(batRules == seqRules,
      "maxBatch=1 batched rules must equal the sequential rules exactly")
    assert(segOf(batSeg) == segOf(seqSeg))
  }

  test("batched == sequential on a symbol-disjoint top; conflicting " +
      "pairs defer a round; replaying batched rules one-at-a-time " +
      "reproduces the batched segmentation") {
    // disjoint-top corpus: (a,b)=9 split across 'abu'×5 + 'abv'×4,
    // (c,d)=8 across 'cdw'×4 + 'cdx'×4, (e,f)=7 across 'efy'×4 +
    // 'efz'×3 — tops are symbol-disjoint AND every pair a merge
    // creates ((ab,u)=5, (cd,w)=4, …) ranks below the next top, so
    // sequential greedy picks exactly the batch in the same order
    val hist = Seq(("abu", 5L), ("abv", 4L), ("cdw", 4L),
      ("cdx", 4L), ("efy", 4L), ("efz", 3L)).toDF("word", "n")
    val (seqRules, seqSeg) = Bpe.trainOn(hist)
    val (batRules, batSeg) = Bpe.trainBatched(hist, 3, maxBatch = 3)
    assert(batRules.map(m => (m.a, m.b, m.pair_n)) ==
      seqRules.take(3).map(m => (m.a, m.b, m.pair_n)),
      "on a disjoint top the batch must equal the sequential prefix")
    // replaying the batched rules SEQUENTIALLY (applyMerge per rule)
    // lands on the same segmentation — the commutativity the
    // disjointness argument promises
    assert(segOf(Bpe.replayRules(hist, batRules)) == segOf(batSeg))
    assert(segOf(batSeg).nonEmpty && segOf(seqSeg).nonEmpty)

    // conflict corpus: with the end marker, round-1 counts are
    // (x,y)=9, (y,_)=9, (y,z)=7, (z,_)=7 — the y-pairs conflict with
    // the kept (x,y) and defer, while the disjoint (z,_) is admitted
    // (batched diverges from sequential in RANK here, by design; the
    // merges it records still carry their exact pre-round counts)
    val h2 = Seq(("xy", 9L), ("yz", 7L)).toDF("word", "n")
    val (r2, s2) = Bpe.trainBatched(h2, 2, maxBatch = 2)
    assert(r2.map(m => (m.a, m.b, m.pair_n)) ==
      Seq(("x", "y", 9L), ("z", "_", 7L)),
      s"round 1 must keep (x,y), defer the y-pairs, admit (z,_): $r2")
    // replay consistency: applying the batch one rule at a time lands
    // on the same segmentation (the commutativity argument)
    assert(segOf(Bpe.replayRules(h2, r2)) == segOf(s2))
    // every word's tokens concatenate back to word + end marker
    segOf(s2).foreach { case (w, toks) =>
      assert(toks.mkString == w + "_", s"$w segmented to $toks") }
    // the disjoint-prefix selector itself
    assert(Bpe.disjointPrefix(
      Seq(("a", "b", 9L), ("b", "c", 8L), ("c", "d", 7L), ("e", "e", 6L),
        ("e", "f", 5L), ("g", "h", 4L)), 10)
      == Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "e", 6L), ("g", "h", 4L)))
  }

  test("equal-symbol runs merge greedy-leftmost (aaaa -> aa aa)") {
    val hist = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("word", "n")
    val (rules, finalSeq) = Bpe.trainOn(hist)
    // round 1 best pair is (a, a): overlap-counted 3 + 2 = 5
    assert(rules.head.a == "a" && rules.head.b == "a" && rules.head.pair_n == 5L)
    val (refRules, refSeqs) = refTrain(Map("aaaa" -> 1L, "aaa" -> 1L), Bpe.Merges)
    assert(rules.map(m => (m.a, m.b, m.pair_n)) == refRules)
    val got = finalSeq.orderBy(col("word"), col("p")).collect()
      .groupBy(_.getString(0))
      .map { case (w, rows) => w -> rows.sortBy(_.getInt(2)).map(_.getString(3)).toVector }
    assert(got == refSeqs)
    // the round-1 invariant stated in the scaladoc, explicitly:
    val after1 = Bpe.applyMerge(Bpe.initSeq(hist), "a", "a")
      .filter(col("word") === "aaaa").orderBy(col("p"))
      .select(col("s")).as[String].collect().toSeq
    assert(after1 == Seq("aa", "aa", "_"))
  }

  test("trainer stops when no pairs remain; replay round-trips") {
    val hist = Seq(("ab", 5L)).toDF("word", "n")
    val (rules, finalSeq) = Bpe.trainOn(hist)
    // "a b _" admits only 2 merges before the word is one symbol
    assert(rules.length == 2)
    assert(finalSeq.count() == 1L)
    val replayed = Bpe.replayRules(hist, rules)
    assert(replayed.orderBy(col("p")).collect().toSeq ==
      finalSeq.orderBy(col("p")).collect().toSeq)
  }

  test("encode forms agree and count every tokenizer word") {
    val forms = Bpe.bpeEncodeForms(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (live, served) = forms.partition(_._1 == "live")
    assert(live.length == served.length && live.nonEmpty)
    assert(live.map(t => (t._2, t._3, t._4)).toSeq ==
      served.map(t => (t._2, t._3, t._4)).toSeq)
    // n_subwords >= n_words (every word is at least one token) and
    // n_words matches the word model independently
    assert(live.forall(t => t._4 >= t._3))
    val expWords = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").count(w => w.matches("^[a-z]+$")))
      .toMap
    assert(live.forall(t => t._3 == expWords(t._2).toLong))
  }

  test("BPE-token packing conserves tokens and respects the budget cut") {
    val enc = Bpe.bpeEncodeForms(spark, sf).collect()
      .filter(_.getString(0) == "live")
    val totalTokens = enc.map(_.getLong(3)).sum
    val packedDocs = enc.count(_.getLong(3) > 0)
    val s = Bpe.bpePackSummary(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(s.map(_._1).toSeq == s.map(_._1).sorted.toSeq)
    assert(s.map(_._3).sum == packedDocs.toLong, "every token-bearing doc packs")
    assert(s.map(_._4).sum == totalTokens, "packing conserves tokens")
    assert(s.forall(r => r._5 <= r._2), "full_sequences <= sequences")
    // exact local replay of the greedy running-sum cut
    val exp = enc.filter(_.getLong(3) > 0)
      .map(r => (r.getLong(1), r.getLong(3)))
      .groupBy(_._1 % Bpe.PackShards)
      .map { case (shard, docs) =>
        var cum = 0L
        val seqIds = docs.sortBy(_._1).map { case (_, n) =>
          val id = cum / Bpe.PackBudget; cum += n; (id, n)
        }
        val bySeq = seqIds.groupBy(_._1).values.map(_.map(_._2).sum).toSeq
        shard -> (bySeq.size.toLong, seqIds.length.toLong, cum,
          bySeq.count(_ >= Bpe.PackBudget).toLong)
      }
    s.foreach { case (shard, sequences, docs, tokens, full) =>
      assert(exp(shard) == ((sequences, docs, tokens, full)),
        s"shard $shard: got ${(sequences, docs, tokens, full)}, " +
          s"want ${exp(shard)}") }
  }

  test("tokenizer report conserves the encode totals") {
    val enc = Bpe.bpeEncodeForms(spark, sf).collect()
      .filter(r => r.getString(0) == "live" && r.getLong(3) > 0)
    val rep = Bpe.bpeReport(spark, sf).collect()
    assert(rep.nonEmpty)
    assert(rep.map(_.getLong(1)).sum == enc.length.toLong)   // docs
    assert(rep.map(_.getLong(2)).sum == enc.map(_.getLong(2)).sum) // words
    assert(rep.map(_.getLong(3)).sum == enc.map(_.getLong(3)).sum) // subwords
    // ratio definition: chars*1e6 div subwords, per source
    rep.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) * 1000000L / r.getLong(3)) }
  }

  test("fertility report conserves totals; every word is >= 1 token") {
    val enc = Bpe.bpeEncodeForms(spark, sf).collect()
      .filter(r => r.getString(0) == "live" && r.getLong(3) > 0)
    val f = Bpe.bpeFertility(spark, sf).collect()
    assert(f.nonEmpty)
    assert(f.map(_.getLong(1)).sum == enc.length.toLong)
    assert(f.map(_.getLong(2)).sum == enc.map(_.getLong(2)).sum)
    assert(f.map(_.getLong(3)).sum == enc.map(_.getLong(3)).sum)
    f.foreach { r =>
      assert(r.getLong(4) >= 1000000L, "fertility >= 1 token per word")
      assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(2)) }
  }

  test("merges artifact round-trips its training word pattern; a " +
      "pattern-less artifact falls back to the default") {
    import java.nio.file.Files
    // the driver corpus is purely [a-z]+ words, so the mismatch this
    // closes needs a fixture with words only a WIDENED model admits:
    // underscore compounds, trained under `[a-z_]` — the exact shape
    // of the 100× vocab-axis run
    val widened = "^[a-z_]+$"
    val d = Seq((1L, "foo_bar foo_bar baz baz baz"),
        (2L, "foo_bar qux baz"), (3L, "qux qux foo_bar"))
      .toDF("doc_id", "text")
    val (rules, _) = Bpe.trainBatched(Bpe.wordHist(d, widened), 24)
    val path = Files.createTempDirectory("graft_bpe_art").toString + "/m"
    Bpe.writeMergesArtifact(spark, rules, widened, path)
    val (rulesBack, patBack) = Bpe.readMergesArtifact(spark, path)
    assert(rulesBack == rules && patBack == widened)
    // the consumer story: encode under the ARTIFACT's pattern sees
    // every trained word; a consumer trusting the default pattern
    // silently drops the underscore words BEFORE the vocab join
    val seg = Bpe.replayRules(Bpe.wordHist(d, patBack), rulesBack)
    def words(p: String) = Bpe.encodeOn(d, seg, p)
      .agg(sum(col("n_words"))).head().getLong(0)
    assert(words(patBack) == 11L, "artifact pattern must see all words")
    assert(words(Bpe.WordPattern) == 7L,
      "a default-pattern consumer must demonstrably lose the " +
        "underscore words — the mismatch the recorded pattern closes")
    // legacy artifact (no _meta): reads as the default pattern
    val legacy = Files.createTempDirectory("graft_bpe_leg").toString + "/m"
    spark.createDataFrame(rules).write.parquet(legacy)
    assert(Bpe.readMergesArtifact(spark, legacy)._2 == Bpe.WordPattern)
  }

  test("encode plan broadcasts the vocab dimension and prunes the scan") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val d = Tables.documents(spark, sf)
    val (_, finalSeq) = Bpe.trainOn(Bpe.wordHist(d))
    val plan = Bpe.encodeOn(d, finalSeq).queryExecution.executedPlan
    assert(collectPlan(plan) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "vocab word->length dimension must broadcast")
    val scans = collectPlan(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) =>
        f.requiredSchema.fieldNames.toSet
    }
    assert(scans.nonEmpty && scans.forall(_.subsetOf(Set("doc_id", "text"))),
      s"documents scan must prune to doc_id/text, got $scans")
  }
}
