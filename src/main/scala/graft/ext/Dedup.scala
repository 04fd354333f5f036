package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.QueryFn

/** Deduplication operators over the `documents` table — the core of a
  * training-data pipeline at 100 TB.
  *
  * Scale design:
  *  - Exact dedup is a hash-groupBy: one shuffle keyed on the 256-bit
  *    fingerprint; group cardinality ≈ distinct docs, never wider than input.
  *  - MinHash+LSH is the scalable near-dup path: shingle → 32 minhashes →
  *    8 bands of 4 → candidates are pairs sharing a band bucket. Work is
  *    O(docs × shingles) + O(candidate pairs); there is no all-pairs stage.
  *    Band buckets with heavy skew (boilerplate docs) would be salted /
  *    capped in production; the verify stage bounds false positives.
  *  - SimHash gives a 64-bit sketch; the 4×16-bit chunk-band trick finds all
  *    pairs within Hamming distance 3 (pigeonhole) without an all-pairs scan.
  *  - The brute-force n-gram Jaccard operator is intentionally restricted to
  *    a bounded slice (doc_id < 300) — it is the oracle/verification path,
  *    not the scale path.
  */
object Dedup {

  /** Word 3-gram shingle set (distinct) of a text column. Guards the
    * degenerate <3-word case (Spark `sequence(0,-1)` would count down).
    */
  def shingles(text: Column): Column = {
    val words = split(text, " ")
    array_distinct(
      when(size(words) < 3, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(words) - 3),
          i => concat_ws(" ", element_at(words, i + 1),
            element_at(words, i + 2), element_at(words, i + 3)))))
  }

  /** Exact dedup groups: fingerprint → surviving doc_id + duplicate count. */
  def exactGroups(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(sha2(col("text"), 256).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  val exactGroupsOracle: String =
    """SELECT sha256(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact dedup survivors: first doc_id per identical text. */
  def exactSurvivors(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  val exactSurvivorsOracle: String =
    """SELECT doc_id, lang, source FROM documents
      |QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1""".stripMargin

  /** Brute-force n-gram Jaccard near-dup pairs on a bounded slice —
    * all-pairs × array_intersect; the ground-truth/verification operator.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("inter") > 0)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= 0.35)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val ngramJaccardOracle: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |         list_distinct(CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
      |           ELSE [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                 for i in range(1, len(ws) - 1)] END) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |        FROM documents WHERE doc_id < 300))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      |FROM sh a, sh b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.sh, b.sh)) > 0
      |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35""".stripMargin

  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** MinHash signatures: doc_id → 32 min-hash values over the shingle set.
    * One explode + one groupBy; signature width is constant per doc.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
    val mins = (0 until NumHashes)
      .map(i => min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
    exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: band-bucket candidates, then exact
    * Jaccard verification of candidates only.
    */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val sigs = minhashSignatures(docs)
    val bandCols = (0 until Bands).map { b =>
      val rowsInBand = (0 until RowsPerBand).map(r => col(s"mh_${b * RowsPerBand + r}"))
      struct(lit(b).as("band_idx"), xxhash64(rowsInBand: _*).as("band_hash"))
    }
    val bucketed = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
    val candidates = bucketed.as("x")
      .join(bucketed.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= 0.35)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash: 64-bit sketch = sign of per-bit ±1 sums over token hashes. */
  def simhashSketches(docs: DataFrame): DataFrame = {
    val tokens = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val perBit = tokens.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64)
      .map(b => when(col(s"s_$b") >= 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    perBit.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance 3, found via 4×16-bit
    * chunk banding (any pair ≤3 bits apart must agree on ≥1 chunk).
    */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sk = simhashSketches(Tables.documents(s, d))
    val chunks = sk.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("chunk_val"))): _*))
        .as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.chunk_idx"), col("ch.chunk_val"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx")
          && col("x.chunk_val") === col("y.chunk_val")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  val defs: Map[String, QueryFn] = Map(
    "x_dedup_exact_groups" -> (exactGroups _),
    "x_dedup_exact_survivors" -> (exactSurvivors _),
    "x_dedup_ngram_jaccard" -> (ngramJaccard _),
    "x_dedup_minhash_lsh" -> (minhashLsh _),
    "x_dedup_simhash" -> (simhashPairs _))

  val oracles: Map[String, String] = Map(
    "x_dedup_exact_groups" -> exactGroupsOracle,
    "x_dedup_exact_survivors" -> exactSurvivorsOracle,
    "x_dedup_ngram_jaccard" -> ngramJaccardOracle)
}
