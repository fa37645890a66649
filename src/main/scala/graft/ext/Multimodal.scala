package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Perceptual-hash near-dup banding parameters: [[PHashBits]]-bit
    * signatures split into [[PHashBands]] bands of [[PHashBandBits]]
    * bits. Pigeonhole guarantee: a pair within Hamming distance
    * [[PHashHamT]] differs in at most [[PHashHamT]] bands, so with
    * Bands = HamT + 1 at least one band matches exactly — the banded
    * equi-join loses NO true pair (same argument as the 4×16-bit
    * SimHash bands in [[Dedup]]). */
  val PHashBits = 25
  val PHashBands = 5
  val PHashBandBits = 5
  val PHashHamT = 4

  /** Perceptual-hash near-duplicate detection over media payloads —
    * the image-dedup stage of a multimodal training-data pipeline
    * (detect visually-near-identical images before they flood the
    * training mix). A real deployment computes pHash from the decoded
    * pixels (downsample → DCT → sign bits); here the hash packs the
    * STUB decoder's deterministic stats (width, height, frame count —
    * themselves functions of byte length) into a [[PHashBits]]-bit
    * signature, which preserves the property that matters for the
    * plumbing: payloads with NEAR stats land at small Hamming
    * distance, not only exact copies (bit-packed small integers are
    * locality-ish in Hamming space), so the threshold semantics are
    * exercised non-trivially and the whole operator stays
    * oracle-checkable.
    *
    * Shape at scale: signature is map-only; candidate generation is a
    * banded self-equi-join (shuffle keyed on (band_idx, band_val) —
    * never an all-pairs product); the Hamming confirm is one
    * codegen'd `bit_count(xor)` per candidate. Band width is the
    * selectivity knob: at larger corpora, extend the signature with
    * more feature bits and widen each band (band-match probability
    * halves per added bit) to keep per-bucket group sizes bounded —
    * and whatever the static tuning misses, the RUNTIME hot-bucket
    * cap ([[graft.ext.Dedup.cappedBandPairs]]) collapses, so a
    * mis-sized band can degrade selectivity but never go quadratic. */
  def phashNearDup(spark: SparkSession, dir: String): DataFrame =
    phashNearDupOn(payloads(spark, dir), statPhash, PHashBandBits)
      .orderBy(col("doc_a"), col("doc_b"))

  /** The 25-bit stat signature: width << 14 | height << 4 |
    * (frame_count − 1), every field from the stub decode. */
  private def statPhash: Column = {
    val l = length(col("payload"))
    (lit(64) + l % 1216) * lit(16384L) +
      (lit(64) + (l * 7) % 656) * lit(16L) + (l % 16)
  }

  /** Banded near-dup core over an arbitrary signature column:
    * signature → [[PHashBands]] bands of `bandBits` → hot-bucket-
    * capped self-equi-join ([[graft.ext.Dedup.cappedBandPairs]] — a
    * saturated band bucket collapses to its representative's star
    * instead of k² pairs) → `bit_count(xor)` confirm at [[PHashHamT]].
    * Band completeness (pigeonhole over [[PHashBands]] = HamT + 1
    * bands) holds for ANY band width below the cap; width sets
    * SELECTIVITY, and past the cap the bucket's members connect
    * through its representative rather than pairwise. */
  private[graft] def phashNearDupOn(pay: DataFrame, sig: Column,
      bandBits: Int, cap: Int = Dedup.HotBucketCap): DataFrame = {
    val sigs = pay.select(col("doc_id"), sig.as("phash"))
    val bands = sigs.select(col("doc_id"),
      explode(array((0 until PHashBands).map(i =>
        struct(lit(i).as("band_idx"),
          shiftright(col("phash"), i * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("band_val"))): _*))
        .as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_val"))
    Dedup.cappedBandPairs(bands, cap)
      .join(sigs.select(col("doc_id").as("doc_a"), col("phash").as("pa")),
        Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("phash").as("pb")),
        Seq("doc_b"))
      .withColumn("hamming",
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hamming") <= PHashHamT)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** The SCALE form of [[phashNearDup]]: a 60-bit signature (the 25
    * stat bits << 35, plus 35 md5-derived "texture" bits standing in
    * for pHash's DCT detail bits) in 5 × 12-bit bands. Why it exists:
    * a 25-bit signature saturates by the birthday bound around 2¹²–2¹³
    * documents — beyond that, unrelated payloads collide into the same
    * 5-bit band values and candidate generation goes quadratic in the
    * per-bucket group size (measured: the ScaleUp row). Production
    * pHashes are 64–256 content bits, exactly this shape; band width
    * scales group sizes down by 2× per added bit with the pigeonhole
    * guarantee intact (bands stay HamT + 1). Not oracle-registered —
    * the texture bits make near-miss pairs vanish on this corpus of
    * fully-distinct texts (avalanche ⇒ far Hamming), so the dump would
    * pin only emptiness; the completeness property is spec-tested
    * against the brute-force scan instead, and the ScaleUp tier
    * measures the candidate-generation cost honestly. */
  def phashNearDupWide(spark: SparkSession, dir: String): DataFrame = {
    val texture = conv(substring(md5(col("payload")), 1, 9), 16, 10)
      .cast("long") % lit(1L << 35)
    phashNearDupOn(payloads(spark, dir),
      statPhash * lit(1L << 35) + texture, bandBits = 12)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val oracle: Map[String, String] = Map(
    "mm_metadata" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len, md5(text) AS content_md5, source FROM documents ORDER BY doc_id""",
    // mirrors decodeStub's deterministic fake-feature arithmetic
    "mm_features" ->
      """SELECT doc_id, l AS byte_len, 64 + l % 1216 AS width, 64 + (l * 7) % 656 AS height, 3 AS channels, 1 + l % 16 AS frame_count FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS l FROM documents) ORDER BY doc_id""",
    "mm_frame_sample" ->
      """SELECT doc_id, frame_count, CAST(unnest(range(0, frame_count, greatest(1, CAST(floor(frame_count / 4) AS INTEGER)))) AS INTEGER) AS frame_idx FROM (SELECT doc_id, 1 + octet_length(CAST(text AS BLOB)) % 16 AS frame_count FROM documents) ORDER BY doc_id, frame_idx""",
    // phash packs the stub stats (width<<14 | height<<4 | frame_count-1);
    // bands are 5×5-bit slices, the confirm is bit_count(xor) <= 4
    "mm_phash_neardup" ->
      s"""WITH ph AS (SELECT doc_id, (64 + l % 1216) * 16384 + (64 + (l * 7) % 656) * 16 + (l % 16) AS phash FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS l FROM documents)), bands AS (SELECT doc_id, t.i AS band_idx, (phash >> CAST(5 * t.i AS INTEGER)) & 31 AS band_val FROM ph CROSS JOIN range(0, $PHashBands) t(i)), ${Dedup.cappedCandCtes("bands")} SELECT doc_a, doc_b, hamming FROM (SELECT doc_a, doc_b, CAST(bit_count(xor(pa.phash, pb.phash)) AS INTEGER) AS hamming FROM cand JOIN ph pa ON cand.doc_a = pa.doc_id JOIN ph pb ON cand.doc_b = pb.doc_id) WHERE hamming <= $PHashHamT ORDER BY doc_a, doc_b"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> metadata _,
    "mm_features" -> features _,
    "mm_frame_sample" -> frameSample _,
    "mm_phash_neardup" -> phashNearDup _
  )
}
