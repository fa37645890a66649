package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.ops.{Manifest, ManifestCommit}

/** The BM25 store in MANIFEST-commit mode (round-16 verdict #2):
  * versioned dirs + pointer flip + a committed FILE LIST per version,
  * so no read trusts a directory listing or a FileOutputCommitter
  * task-file rename. The whole suite runs with
  * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` — the
  * object-store tuning that strips Spark's own `_SUCCESS` markers —
  * proving the protocol's completeness stamps are all self-written.
  */
class ManifestSinksSpec extends SparkSpec {

  /** Run `body` with the committer's _SUCCESS stamping disabled —
    * restore the previous value afterwards (shared session). */
  private def withoutSuccessMarkers[A](body: => A): A = {
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val conf = spark.sparkContext.hadoopConfiguration
    val old = Option(conf.get(key))
    conf.set(key, "false")
    try body
    finally old match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  private def stage(df: org.apache.spark.sql.DataFrame, srcDir: String,
      name: String): Unit = {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_man_batch")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val f = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(f.toPath, Paths.get(srcDir, name))
    ()
  }

  test("manifest-mode lexical sink without Spark _SUCCESS markers: " +
      "answers == live batch form through replay, torn append, and " +
      "compaction; every version carries its manifest") {
    withoutSuccessMarkers {
      import java.nio.file.{Files, Paths}
      import graft.ext.Retrieval
      val base = Files.createTempDirectory("graft_bm25_man").toString
      val srcDir = s"$base/src"; Files.createDirectories(Paths.get(srcDir))
      val store = s"$base/ix"
      val d = Tables.documents(spark, sf)
      val ids = d.select(col("doc_id")).orderBy(col("doc_id"))
        .collect().map(_.getLong(0))
      val c0 = ids(ids.length / 3); val c1 = ids(ids.length * 2 / 3)
      def runOnce(): Unit =
        EventStreams.lexicalIndexSink(
          spark.readStream.schema(d.schema).parquet(srcDir),
          store, s"$base/chk", commit = ManifestCommit).stop()

      stage(d.filter(col("doc_id") <= c0), srcDir, "b0.parquet"); runOnce()
      stage(d.filter(col("doc_id") > c0 && col("doc_id") <= c1),
        srcDir, "b1.parquet"); runOnce()
      stage(d.filter(col("doc_id") > c1), srcDir, "b2.parquet"); runOnce()

      // the committed postings version carries a manifest covering
      // exactly its data files (seed + append both sealed)
      val pLive = ManifestCommit.readDir(s"$store/postings")
      val man = Manifest.read(pLive)
      assert(man.isDefined && man.get.nonEmpty)
      assert(man.get.toSet == Manifest.dataFiles(pLive).toSet)

      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val live = rows(Retrieval.bm25Batch(spark, sf))
      assert(live.nonEmpty && rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit)) == live,
        "manifest-committed store must answer like the live batch form")

      // replay no-op (watermark guard, no manifest growth)
      val manBefore = Manifest.read(pLive).get.toSet
      stage(d.filter(col("doc_id") > c1), srcDir, "b2r.parquet"); runOnce()
      assert(Manifest.read(
        ManifestCommit.readDir(s"$store/postings")).get.toSet == manBefore)

      // torn append: a ghost doc's rows land in the live version with
      // NO manifest seal and NO committed-log entry (the crash right
      // after the data objects, before the append's commit point) —
      // manifest reads never see them, so the store answers unchanged
      // even BEFORE recovery runs
      val td = d.select(col("doc_id"),
          graft.ext.TextOps.tokens(col("text")).as("t"))
        .filter(size(col("t")) > 0)
      val ghost = Retrieval.postingsOf(
          td.filter(col("doc_id") === ids.max))
        .withColumn("doc_id", lit(ids.max + 1000)).localCheckpoint()
      ghost.write.mode("append").partitionBy("tbucket").parquet(pLive)
      assert(rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit)) == live,
        "unmanifested objects must be invisible to manifest reads")
      // ...and the sink-level recovery pass agrees there is nothing
      // torn (the committed view is consistent), so the marker path
      // stays green
      graft.ops.StoreFiles.deleteMarker(store, "_committed_synced")
      Retrieval.recoverBm25Store(spark, store, ManifestCommit)
      assert(rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit)) == live)

      // compaction rewrites into a NEW version (junk objects die with
      // the old one) whose manifest covers the compacted files
      assert(Retrieval.maybeCompactPostings(spark, store, threshold = 1,
        commit = ManifestCommit))
      val v1 = ManifestCommit.readDir(s"$store/postings")
      assert(v1 != pLive)
      assert(Manifest.read(v1).get.toSet == Manifest.dataFiles(v1).toSet)
      assert(rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit)) == live)
    }
  }

  test("manifest append crash window: objects landed but the seal " +
      "didn't — the batch stays invisible and the replayed append " +
      "commits it exactly once") {
    withoutSuccessMarkers {
      import java.nio.file.{Files, Paths}
      import graft.ext.Retrieval
      val base = Files.createTempDirectory("graft_bm25_man2").toString
      val store = s"$base/ix"
      val d = Tables.documents(spark, sf)
      val ids = d.select(col("doc_id")).orderBy(col("doc_id"))
        .collect().map(_.getLong(0))
      val c0 = ids(ids.length / 2)
      val td = d.select(col("doc_id"),
          graft.ext.TextOps.tokens(col("text")).as("t"))
        .filter(size(col("t")) > 0)
      Retrieval.writeBm25Index(td.filter(col("doc_id") <= c0), store,
        ManifestCommit)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val before = rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit))
      // the crash: the batch's postings objects land in the live
      // version, but neither the manifest seal nor meta nor the
      // committed log ever ran
      val batch = td.filter(col("doc_id") > c0)
      Retrieval.postingsOf(batch).write.mode("append")
        .partitionBy("tbucket")
        .parquet(ManifestCommit.readDir(s"$store/postings"))
      assert(rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit)) == before,
        "the crashed batch must be invisible")
      // the replay: the SAME batch appended through the protocol —
      // the store now answers like a one-shot build on the union,
      // with no double counting from the stranded objects
      Retrieval.appendBm25Index(spark, batch, store, ManifestCommit)
      val live = rows(Retrieval.bm25Batch(spark, sf))
      assert(rows(Retrieval.bm25BatchFromIndex(
        spark, sf, store, ManifestCommit)) == live,
        "replayed append must commit exactly once (no stranded-object " +
          "double counting)")
    }
  }
}
