package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.QueryFn

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (SURVEY.md §2.E) — but everything
  * Spark-side is real: the binary column, the typed row shape, the
  * mapPartitions batch path (one decoder instantiation per partition, the
  * same shape a JNI/FFmpeg binding needs), and the partition-local batching.
  *
  * At 100 TB the decode stage is the bottleneck, not the shuffle: media rows
  * are processed embarrassingly parallel, so the design goal is (a) never
  * shuffle raw bytes — extract features first, then drop the payload; and
  * (b) keep per-partition batches bounded via maxPartitionBytes so a
  * partition of 100 MB media fits executor memory.
  */
object Multimodal {

  /** One media row: opaque payload + extracted metadata. */
  case class MediaRow(media_id: Long, bytes: Array[Byte], format: String)

  /** Fake decoded features; a real decoder would fill these from the codec. */
  case class MediaFeatures(
      media_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB decoder — deterministic fake standing in for an image/audio codec
    * (none available in this container). Real implementation would wrap a
    * JNI decoder instantiated once per partition, exactly where this fold
    * sits.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.bytes.length.toLong
    // Deterministic FNV-1a over the payload = the "decode" work.
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < r.bytes.length) { h = (h ^ (r.bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    MediaFeatures(r.media_id, r.format, n,
      width = (n % 640).toInt + 64, height = (n % 480).toInt + 48,
      n_frames = (n % 30).toInt + 1, checksum = h)
  }

  /** Decode a typed media Dataset partition-wise (the real plumbing). */
  def decodeAll(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // Per-partition decoder setup would go here (one codec instance).
      it.map(decodeStub)
    }
  }

  /** documents.text reinterpreted as a fake media payload — builds the
    * binary column + metadata the multimodal path carries.
    */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes"),
        concat(lit("fake/"), col("source")).as("format"))
      .as[MediaRow]
  }

  /** "Frame sampling": byte-range slices of the payload — the Spark-side
    * shape of video frame extraction (payload in, bounded samples out).
    * Each sampled frame is digested via its HEX encoding: offsets are
    * byte-aligned, so slice-of-hex ≡ hex-of-slice carries the same bytes,
    * and hex strings are the form DuckDB can also slice (no BLOB substring
    * in DuckDB 1.0) — which makes this gate hash-verifiable end-to-end.
    */
  def frameSample(s: SparkSession, d: String): DataFrame =
    mediaFromDocuments(s, d).toDF()
      .withColumn("hx", hex(col("bytes")))
      .select(
        col("media_id"), col("hx"),
        posexplode(transform(
          sequence(lit(0), least(floor(length(col("bytes")) / 64), lit(3))),
          i => (i * 128 + 1).cast("int"))))
      .withColumnRenamed("pos", "frame_idx")
      .select(col("media_id"), col("frame_idx"),
        sha2(col("hx").substr(col("col"), lit(32)), 256).as("frame_digest"))

  val frameSampleOracle: String =
    """WITH m AS (
      |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
      |         octet_length(CAST(text AS BLOB)) AS n
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id, hx,
      |         unnest(range(0, least(n // 64, 3) + 1)) AS i
      |  FROM m)
      |SELECT doc_id AS media_id, i AS frame_idx,
      |       sha256(substring(hx, i * 128 + 1, 32)) AS frame_digest
      |FROM ex""".stripMargin

  /** SQL-checkable slice of the multimodal plumbing: binary payload length,
    * content digest, and the deterministic stub dimensions.
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    val bytes = length(col("text").cast("binary"))
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      bytes.as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("digest"),
      // dimensions derive from BYTE length, matching decodeStub exactly
      // (n_chars would drift from the stub on multi-byte text)
      (bytes % 640 + 64).cast("int").as("width"),
      (bytes % 480 + 48).cast("int").as("height"))
  }

  val mediaMetaOracle: String =
    """SELECT doc_id AS media_id,
      |       octet_length(CAST(text AS BLOB)) AS n_bytes,
      |       sha256(text) AS digest,
      |       CAST(octet_length(CAST(text AS BLOB)) % 640 + 64 AS INT) AS width,
      |       CAST(octet_length(CAST(text AS BLOB)) % 480 + 48 AS INT) AS height
      |FROM documents""".stripMargin

  /** Decoded features via the typed mapPartitions path (stub decode). The
    * projected columns are all deterministic arithmetic on the payload
    * length, so the gate hash-verifies the WHOLE typed mapPartitions
    * round-trip (encoder → per-partition decode → encoder) against SQL;
    * only the FNV `checksum` column is unverifiable (DuckDB 1.0 cannot
    * byte-fold a blob) and is excluded here, covered by ExtSpec instead.
    */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    decodeAll(mediaFromDocuments(s, d)).toDF()
      .select("media_id", "format", "n_bytes", "width", "height", "n_frames")

  val mediaFeaturesOracle: String =
    """SELECT doc_id AS media_id, 'fake/' || source AS format,
      |       octet_length(CAST(text AS BLOB)) AS n_bytes,
      |       CAST(octet_length(CAST(text AS BLOB)) % 640 + 64 AS INT) AS width,
      |       CAST(octet_length(CAST(text AS BLOB)) % 480 + 48 AS INT) AS height,
      |       CAST(octet_length(CAST(text AS BLOB)) % 30 + 1 AS INT) AS n_frames
      |FROM documents""".stripMargin

  val defs: Map[String, QueryFn] = Map(
    "x_media_meta" -> (mediaMeta _),
    "x_media_features" -> (mediaFeatures _),
    "x_media_frames" -> (frameSample _))

  val oracles: Map[String, String] = Map(
    "x_media_meta" -> mediaMetaOracle,
    "x_media_features" -> mediaFeaturesOracle,
    "x_media_frames" -> frameSampleOracle)
}
