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

  /** Deterministic image spec derived from a media id — the generation
    * parameters the oracle recomputes pixel math from.
    */
  case class ImageSpec(media_id: Long, width: Int, height: Int)

  /** Codec-decoded image facts: dimensions parsed from the BMP header by
    * the decoder, channel sums folded over the DECODED pixel matrix.
    */
  case class DecodedImage(
      media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** The deterministic pixel function: RGB at (x, y) of image `id`. Pure
    * integer arithmetic, so DuckDB can recompute every channel sum from
    * (media_id, width, height) alone — which is what lets a REAL
    * encode→decode round trip be hash-verified end-to-end.
    */
  def pixel(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 3 + x * 5L + y * 7L) % 256).toInt
    val g = ((id * 11 + x * 13L + y * 17L) % 256).toInt
    val b = ((id + x + y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode one spec as REAL BMP bytes via `javax.imageio` — the
    * in-query deterministic source standing in for media files on disk.
    */
  def encodeBmp(spec: ImageSpec): MediaRow = {
    val img = new java.awt.image.BufferedImage(
      spec.width, spec.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < spec.height) {
      var x = 0
      while (x < spec.width) { img.setRGB(x, y, pixel(spec.media_id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    MediaRow(spec.media_id, bos.toByteArray, "image/bmp")
  }

  /** Decode REAL BMP bytes with the JDK codec and fold channel sums over
    * the decoded pixels — the genuine byte→pixel stage the stub decoder
    * simulates. Runs inside the same typed mapPartitions shape as
    * [[decodeAll]]; width/height come from the PARSED header, so any
    * codec drift (padding, row order, channel order) breaks the hash.
    */
  def decodeBmp(r: MediaRow): DecodedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
    require(img != null, s"undecodable image payload for media ${r.media_id}")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    DecodedImage(r.media_id, img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Gate: full encode→decode round trip through a real codec. Specs
    * derive from doc ids; BMP bytes are written and re-parsed by
    * `javax.imageio` per partition (encode and decode chain inside ONE
    * stage — the payload never crosses an exchange, the design rule for
    * 100 TB media: extract features where the bytes are, shuffle only the
    * features). The oracle recomputes dimensions and channel sums from
    * the generation parameters with pure SQL, so a hash match proves the
    * decoded pixel matrix — not just the plumbing — is faithful.
    */
  def mediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 8).cast("int").as("width"),
        (col("doc_id") % 12 + 8).cast("int").as("height"))
      .as[ImageSpec]
      .mapPartitions(_.map(encodeBmp))
      .mapPartitions(_.map(decodeBmp))
      .toDF()
  }

  val mediaDecodeOracle: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |                  CAST(doc_id % 16 + 8 AS INT) AS width,
      |                  CAST(doc_id % 12 + 8 AS INT) AS height
      |           FROM documents),
      |xs AS (SELECT media_id, width, height,
      |              unnest(range(0, width)) AS x FROM m),
      |px AS (SELECT media_id, width, height, x,
      |              unnest(range(0, height)) AS y FROM xs)
      |SELECT media_id, width, height,
      |       CAST(SUM((media_id * 3 + x * 5 + y * 7) % 256) AS BIGINT) AS sum_r,
      |       CAST(SUM((media_id * 11 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
      |       CAST(SUM((media_id + x + y) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY 1, 2, 3""".stripMargin

  /** 2× box-downsampled image facts: output dims (floor — a trailing odd
    * row/column is dropped) and channel sums over the DOWNSAMPLED pixel
    * matrix, each output pixel the floor-average of its 2×2 source block.
    */
  case class DownsampledImage(
      media_id: Long, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decode with the real codec, then 2×2 box-downsample the decoded
    * pixels — the resize/thumbnail stage of a media pipeline, on genuine
    * byte→pixel data. Integer floor arithmetic throughout so the oracle
    * can replay every block average exactly.
    */
  def downsampleBmp(r: MediaRow): DownsampledImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
    require(img != null, s"undecodable image payload for media ${r.media_id}")
    val (ow, oh) = (img.getWidth / 2, img.getHeight / 2)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var by = 0
    while (by < oh) {
      var bx = 0
      while (bx < ow) {
        var (br, bg, bb) = (0, 0, 0)
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val p = img.getRGB(bx * 2 + dx, by * 2 + dy)
            br += (p >> 16) & 0xff; bg += (p >> 8) & 0xff; bb += p & 0xff
            dx += 1
          }
          dy += 1
        }
        sr += br / 4; sg += bg / 4; sb += bb / 4
        bx += 1
      }
      by += 1
    }
    DownsampledImage(r.media_id, ow, oh, sr, sg, sb)
  }

  /** Gate: encode → decode → downsample through the real codec, one
    * stage, payload never shuffled; the oracle replays the 2×2 floor
    * block averages from the generation parameters in pure SQL.
    */
  def mediaResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 8).cast("int").as("width"),
        (col("doc_id") % 12 + 8).cast("int").as("height"))
      .as[ImageSpec]
      .mapPartitions(_.map(encodeBmp))
      .mapPartitions(_.map(downsampleBmp))
      .toDF()
  }

  val mediaResizeOracle: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |                  CAST(doc_id % 16 + 8 AS INT) AS width,
      |                  CAST(doc_id % 12 + 8 AS INT) AS height
      |           FROM documents),
      |xs AS (SELECT media_id, width, height,
      |              unnest(range(0, width)) AS x FROM m),
      |px AS (SELECT media_id, width, height, x,
      |              unnest(range(0, height)) AS y FROM xs),
      |blocks AS (
      |  SELECT media_id, width, height, x // 2 AS bx, y // 2 AS by,
      |         SUM((media_id * 3 + x * 5 + y * 7) % 256) // 4 AS br,
      |         SUM((media_id * 11 + x * 13 + y * 17) % 256) // 4 AS bg,
      |         SUM((media_id + x + y) % 256) // 4 AS bb
      |  FROM px
      |  WHERE x < (width // 2) * 2 AND y < (height // 2) * 2
      |  GROUP BY 1, 2, 3, 4, 5)
      |SELECT media_id,
      |       CAST(width // 2 AS INT) AS out_w,
      |       CAST(height // 2 AS INT) AS out_h,
      |       CAST(SUM(br) AS BIGINT) AS sum_r,
      |       CAST(SUM(bg) AS BIGINT) AS sum_g,
      |       CAST(SUM(bb) AS BIGINT) AS sum_b
      |FROM blocks GROUP BY 1, 2, 3""".stripMargin

  val defs: Map[String, QueryFn] = Map(
    "x_media_meta" -> (mediaMeta _),
    "x_media_features" -> (mediaFeatures _),
    "x_media_frames" -> (frameSample _),
    "x_media_decode" -> (mediaDecode _),
    "x_media_resize" -> (mediaResize _))

  val oracles: Map[String, String] = Map(
    "x_media_meta" -> mediaMetaOracle,
    "x_media_features" -> mediaFeaturesOracle,
    "x_media_frames" -> frameSampleOracle,
    "x_media_decode" -> mediaDecodeOracle,
    "x_media_resize" -> mediaResizeOracle)
}
