package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  test("metadata byte length equals document n_chars (ascii corpus)") {
    val joined = Multimodal.metadata(spark, sf)
      .join(Tables.documents(spark, sf), Seq("doc_id"))
      .filter(col("byte_len") =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("stub decoder is deterministic and total over the corpus") {
    val a = Multimodal.features(spark, sf).collect()
    val b = Multimodal.features(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sf).count())
    assert(a.forall { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      w >= 64 && w < 1280 && h >= 64 && h < 720
    })
  }

  test("phash near-dup banding matches the local capped recompute: cool " +
      "buckets pairwise, saturated buckets collapse to the rep's star") {
    // Independent recompute: signatures, band buckets, and the
    // hot-bucket collapse all in plain Scala — if the operator's
    // pigeonhole banding argument OR the cap algebra is wrong, the
    // sets diverge here. (The 25-bit stat signature's 5-bit bands
    // saturate on this corpus — max bucket ~70 vs cap 64 — so the
    // collapse branch is genuinely exercised, not just compiled.)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("l")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    def phash(l: Long): Long =
      (64 + l % 1216) * 16384L + (64 + (l * 7) % 656) * 16L + (l % 16)
    val sigs = lens.map { case (id, l) => (id, phash(l)) }.toMap
    val buckets = (for {
      (id, ph) <- sigs.toSeq; i <- 0 until Multimodal.PHashBands
    } yield ((i, (ph >> (5 * i)) & 31), id))
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val cap = graft.ext.Dedup.HotBucketCap
    val cand = buckets.flatMap { ids =>
      if (ids.size <= cap)
        for { a <- ids; b <- ids if a < b } yield (a, b)
      else ids.tail.map(m => (ids.head, m)) // rep = bucket min id
    }.toSet
    assert(buckets.exists(_.size > cap),
      "fixture regression: no saturated bucket — the collapse branch is untested")
    val expect = cand.toSeq.map { case (a, b) =>
      (a, b, java.lang.Long.bitCount(sigs(a) ^ sigs(b)))
    }.filter(_._3 <= Multimodal.PHashHamT).sortBy(p => (p._1, p._2))
    val got = Multimodal.phashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "corpus should contain near signatures")
    assert(got.exists(_._3 > 0),
      "threshold semantics untested: only exact matches found")
  }

  test("wide (60-bit) phash banding is also complete, including injected " +
      "duplicate payloads") {
    import java.security.MessageDigest
    // corpus + exact copies of the first 20 payloads under shifted ids:
    // copies land at Hamming 0 (stat AND texture bits identical), so
    // the wide variant has real pairs to find on this distinct-text
    // corpus
    val base = Tables.documents(spark, sf).select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val pay = base.unionByName(
      base.filter(col("doc_id") < 20)
        .withColumn("doc_id", col("doc_id") + 100000L)).cache()
    def widePhash(text: String): Long = {
      val l = text.length.toLong
      val stat = (64 + l % 1216) * 16384L + (64 + (l * 7) % 656) * 16L +
        (l % 16)
      val hex = MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(9)
      stat * (1L << 35) + java.lang.Long.parseLong(hex, 16) % (1L << 35)
    }
    val local = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sigs = local.map { case (id, t) => (id, widePhash(t)) } ++
      local.filter(_._1 < 20).map { case (id, t) =>
        (id + 100000L, widePhash(t))
      }
    val expect = (for {
      (a, pa) <- sigs; (b, pb) <- sigs if a < b
      ham = java.lang.Long.bitCount(pa ^ pb)
      if ham <= Multimodal.PHashHamT
    } yield (a, b, ham)).sortBy(p => (p._1, p._2))
    assert(expect.nonEmpty, "injected copies should produce pairs")
    val texture = conv(substring(md5(col("payload")), 1, 9), 16, 10)
      .cast("long") % lit(1L << 35)
    val l = length(col("payload"))
    val stat = (lit(64) + l % 1216) * lit(16384L) +
      (lit(64) + (l * 7) % 656) * lit(16L) + (l % 16)
    val got = Multimodal.phashNearDupOn(pay, stat * lit(1L << 35) + texture,
        bandBits = 12)
      .orderBy(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    pay.unpersist()
    assert(got == expect.toSeq)
  }
}
