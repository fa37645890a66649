package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata alongside,
  * and decode/feature-extraction runs batchwise inside partitions.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing —
  * binary schema, partition-batched execution, typed output rows —
  * is real. A production deployment replaces `decodeStub`'s body with
  * the codec call (e.g. JNI/FFI into libjpeg/ffmpeg) and nothing else
  * changes: `mapPartitions` amortizes per-batch codec setup exactly
  * like a pandas-batched UDF does in PySpark.
  */
object Multimodal {

  /** Typed feature row produced by the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
      height: Int, channels: Int, frame_count: Int)

  /** STUB decoder — deterministic fake features derived from payload
    * bytes. Replace the body with a real codec to productionize; the
    * signature (bytes in, features out, called once per row inside a
    * partition iterator) is the contract. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val len = payload.length
    // fake "decode": pretend byte length encodes a resolution
    val width = 64 + (len % 1216)
    val height = 64 + ((len * 7) % 656)
    MediaFeatures(docId, len, width, height, channels = 3,
      frame_count = 1 + (len % 16))
  }

  /** Binary payload + metadata view of `documents` (the multimodal
    * schema pattern: content as binary, typed metadata columns). */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("n_chars"))

  /** Oracle-checked metadata pass: byte length + content hash straight
    * from the binary column (no decode). */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .select(col("doc_id"), length(col("payload")).as("byte_len"),
        md5(col("payload")).as("content_md5"), col("source"))
      .orderBy(col("doc_id"))

  /** Partition-batched feature extraction through the stub decoder.
    * Because the stub's fake features are pure arithmetic on the byte
    * length, the full mapPartitions path is oracle-checkable: DuckDB
    * recomputes the same formulas in SQL, verifying the Spark-side
    * plumbing (binary column, encoder round-trip, partition batching)
    * end to end. A real codec would revert this to a rows-only check. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would open the codec once here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling plumbing: expand each media payload into a
    * bounded set of frame indices (stride = max(1, frame_count/4)) —
    * the row-expansion shape a video pipeline feeds to per-frame
    * feature extraction. The expansion is map-side (Generate) and
    * bounded by a constant: ceil(frame_count/stride) ≤ 7 rows per doc
    * (4 when frame_count ≥ 8); the stub's deterministic frame_count
    * keeps it oracle-checkable. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(col("doc_id"), col("frame_count"),
        explode(sequence(lit(0), col("frame_count") - 1,
          greatest(lit(1), floor(col("frame_count") / 4).cast("int"))))
          .as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val oracle: Map[String, String] = Map(
    "mm_metadata" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len, md5(text) AS content_md5, source FROM documents ORDER BY doc_id""",
    // mirrors decodeStub's deterministic fake-feature arithmetic
    "mm_features" ->
      """SELECT doc_id, l AS byte_len, 64 + l % 1216 AS width, 64 + (l * 7) % 656 AS height, 3 AS channels, 1 + l % 16 AS frame_count FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS l FROM documents) ORDER BY doc_id""",
    "mm_frame_sample" ->
      """SELECT doc_id, frame_count, CAST(unnest(range(0, frame_count, greatest(1, CAST(floor(frame_count / 4) AS INTEGER)))) AS INTEGER) AS frame_idx FROM (SELECT doc_id, 1 + octet_length(CAST(text AS BLOB)) % 16 AS frame_count FROM documents) ORDER BY doc_id, frame_idx"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> metadata _,
    "mm_features" -> features _,
    "mm_frame_sample" -> frameSample _
  )
}
