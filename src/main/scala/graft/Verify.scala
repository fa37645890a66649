package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // builder-side fast iteration: SPARK_GRAFT_VERIFY_ONLY=a,b,c
    // restricts the dump (and the oracle manifest) to the named
    // queries. The driver never sets it, so its runs stay full.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val errs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val t0All = System.nanoTime()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      // coalesce(1) keeps one file AND preserves the query's ORDER BY
      // in the written rows (a repartition would shuffle them away)
      val t0 = System.nanoTime()
      try {
        // label every job with its query (guide §1.5) so event-log /
        // UI profiles attribute job counts and shuffle bytes per entry
        spark.sparkContext.setJobDescription(s"verify:$name")
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-entry Spark-side cost next to the DuckDB profile
        // (tools/profile_oracle.py) — round 14's artifact was zeroed
        // by unobserved suite growth; both sides stay visible now
        System.err.println(f"[verify] $name took " +
          f"${(System.nanoTime - t0) / 1e9}%.2f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .linesIterator.toSeq.headOption.getOrElse("")
      } finally spark.sparkContext.setJobDescription(null)
    }
    System.err.println(f"[verify] total " +
      f"${(System.nanoTime - t0All) / 1e9}%.1f s for " +
      f"${SparkEntry.queries.count(kv => keep(kv._1))}%d queries")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Failed queries as a MANIFEST, not just a stderr line: round 10's
    // correctness report silently lost 11 entries because per-query
    // failures left no artifact — a missing dump looked identical to a
    // never-registered query. The errors file makes breakage diffable.
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      errs.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    if (errs.nonEmpty)
      System.err.println(s"[verify] ${errs.size} queries failed: " +
        errs.keys.mkString(", "))
    spark.stop()
  }
}
