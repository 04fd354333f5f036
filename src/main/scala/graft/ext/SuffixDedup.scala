package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q.QueryFn

/** Byte-resolution exact-substring dedup — the dedup ladder's last rung
  * (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better"): find every MAXIMAL duplicated character span of length ≥
  * `MinSpan` anywhere in the corpus, at single-character boundary
  * precision. [[Dedup.substrDedup]] (fixed-k shingles) answers this at
  * shingle resolution and [[Dedup.cdcDedup]] at chunk resolution; both
  * concede the true span boundaries. This module reports them exactly:
  * a one-character insertion moves a reported boundary by exactly one
  * character (pinned in ExtSpec), where shingle sets shift wholesale.
  *
  * HOW, and why there is no prefix-doubling here. The textbook route is
  * a suffix array (suffix order → adjacent-suffix LCPs → positions with
  * LCP ≥ L are duplicated-span starts), and the textbook distributed SA
  * construction is prefix-doubling — O(log n) shuffle+rank rounds. But
  * the operator's OUTPUT only needs, per position, the MAXIMUM common
  * prefix with any other suffix, CAPPED at `MatchCap` chars: a
  * duplicated region longer than the cap is still recovered exactly,
  * because every position inside it is itself a duplicated-span start
  * and the interval union of [p, p+lcp_capped) tiles the whole region
  * (the merge step below). Under a cap, the full suffix ORDER is
  * over-information: sorting suffixes by their first `MatchCap` chars
  * produces exactly the same adjacency (suffixes sharing ≥ L ≤ cap
  * chars are contiguous either way), and that sort is ONE distributed
  * range-exchange Spark already executes natively — strictly less work
  * than log n rounds of shuffle + global re-rank, each of which is
  * itself a distributed sort in disguise. Prefix-doubling would be
  * required only for uncapped LCPs, which span recovery does not need.
  *
  * Adjacency without a global window: a Window over the whole suffix
  * order would funnel n rows through one partition — the classic
  * scale-killer. Instead suffixes are windowed per 2-char prefix BUCKET
  * (`BucketWidth`): within a bucket, in-bucket adjacency equals global
  * adjacency (all suffixes between two bucket members share the bucket
  * prefix, hence the bucket), and any cross-bucket neighbor pair shares
  * < 2 chars — irrelevant against L = `MinSpan` ≥ 2. So the per-bucket
  * lag/lead windows see every pair that can produce a mark, and no
  * boundary exchange is needed at all. ~26² active buckets for plain
  * text; widen the bucket for bigger corpora (cost: none, buckets
  * narrower than L lose no marks).
  *
  * Scale shape (100 TB): rows are (doc_id, p, first-MatchCap-chars) —
  * O(n · MatchCap) total bytes, the same ×cap factor every SA-based
  * dedup pays for distributed text access. One hash exchange on the
  * bucket key (skew-bounded by the bucket alphabet), per-bucket sort,
  * expression-level LCPs (codegen HOFs, no UDF), then per-DOC windows
  * for the interval merge — all shuffle-based, nothing driver-side,
  * no all-pairs anywhere.
  */
object SuffixDedup {

  /** Minimum duplicated-span length to report (chars). */
  val MinSpan = 40

  /** Per-position match cap: LCPs are exact up to this many chars, and
    * spans of ANY length are still recovered exactly (see object doc).
    * Must be ≥ [[MinSpan]].
    */
  val MatchCap = 65

  /** Adjacency-window bucket = first this-many chars of the suffix.
    * Must be ≤ [[MinSpan]] so cross-bucket pairs cannot carry a mark.
    */
  val BucketWidth = 2

  /** Common-prefix length of two strings via the native codegen'd kernel
    * ([[org.apache.spark.sql.graft.TextExpressions.commonPrefixLength]]):
    * identical value to the interpreted `transform(sequence(...))` fold
    * it replaces — the count of leading equal code points, bounded by
    * min(len) — but allocation-free (guide §1.2 step 2 / §4: the HOF
    * form allocated a cap-sized sequence array plus ~2·cap one-char
    * substrings PER NEIGHBOR PER POSITION, and was this operator's
    * measured hot spot). A NULL side (missing window neighbor) is
    * EXPLICITLY 0, exactly as before.
    */
  private def lcpCol(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(0))
      .otherwise(org.apache.spark.sql.graft.TextExpressions.commonPrefixLength(a, b))

  /** Per-document maximal duplicated spans over `docs` (doc_id, text):
    * every character range of length ≥ `minSpan` that also occurs
    * elsewhere in the corpus (another document OR another position of
    * the same document), merged into maximal intervals. Output:
    * (doc_id, island ordinal, span_start, span_end inclusive, span_len),
    * 1-based character positions.
    */
  def suffixSpans(docs: DataFrame, minSpan: Int = MinSpan): DataFrame = {
    require(minSpan >= BucketWidth && minSpan <= MatchCap,
      s"minSpan must be in [$BucketWidth, $MatchCap], got $minSpan")
    // one row per character position, carrying only the capped prefix
    val suf = docs
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("p"),
        col("text"))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        col("text").substr(col("p"), lit(MatchCap)).as("pre"))
    // per-bucket suffix order; in-bucket adjacency = global adjacency
    // for every pair that can reach minSpan (object doc)
    val w = Window.partitionBy(substring(col("pre"), 1, BucketWidth))
      .orderBy(col("pre"), col("doc_id"), col("p"))
    val marks = suf
      .withColumn("lp", lag(col("pre"), 1).over(w))
      .withColumn("np", lead(col("pre"), 1).over(w))
      .withColumn("l", greatest(
        lcpCol(col("pre"), col("lp")),
        lcpCol(col("pre"), col("np"))).cast("long"))
      .filter(col("l") >= minSpan)
      .select(col("doc_id"), col("p"), col("l"))
    // interval merge, per doc: a mark at p covers [p, p + l) exclusive;
    // a new island starts where p jumps PAST the running max end, so
    // overlapping AND exactly-touching intervals merge — the result is
    // maximal intervals of duplicated-character COVERAGE. A single
    // non-duplicated character between two duplicated regions therefore
    // splits islands (the ExtSpec insertion pin relies on exactly this)
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    marks
      .withColumn("prev_end",
        max(col("p") + col("l")).over(wd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_isl",
        when(col("prev_end").isNull || col("p") > col("prev_end"), 1).otherwise(0))
      .withColumn("island", sum(col("new_isl")).over(wd))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p") + col("l")) - lit(1)).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + lit(1))
  }

  /** The shared oracle core: DuckDB recomputes the same marks from a
    * GLOBAL suffix order (single-node, windows are cheap there) — valid
    * because in-bucket and global adjacency agree on every pair that can
    * reach `MinSpan` (object doc). `src` must provide (doc_id, text).
    */
  private def spansSql(src: String): String =
    s"""suf AS MATERIALIZED (
       |  SELECT doc_id, i AS p, substr(text, CAST(i AS INT), $MatchCap) AS pre
       |  FROM (SELECT doc_id, text FROM $src
       |        WHERE text IS NOT NULL AND length(text) >= 1),
       |       LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) t),
       |adj AS MATERIALIZED (
       |  SELECT doc_id, p, pre,
       |         lag(pre)  OVER w AS lp,
       |         lead(pre) OVER w AS np
       |  FROM suf WINDOW w AS (ORDER BY pre, doc_id, p)),
       |lcps AS MATERIALIZED (
       |  -- NULL neighbor => 0 EXPLICITLY: LEAST ignores NULLs (DuckDB and
       |  -- Spark alike), so without the guard a missing neighbor scores a
       |  -- spurious full-length match (see SuffixDedup.lcpCol)
       |  SELECT doc_id, p,
       |         GREATEST(
       |           CASE WHEN lp IS NULL THEN 0 ELSE
       |             COALESCE(list_min(list_transform(
       |               generate_series(1, LEAST(length(pre), length(lp))),
       |               i -> CASE WHEN substr(pre, CAST(i AS INT), 1)
       |                          <> substr(lp, CAST(i AS INT), 1) THEN i END)),
       |               LEAST(length(pre), length(lp)) + 1) - 1 END,
       |           CASE WHEN np IS NULL THEN 0 ELSE
       |             COALESCE(list_min(list_transform(
       |               generate_series(1, LEAST(length(pre), length(np))),
       |               i -> CASE WHEN substr(pre, CAST(i AS INT), 1)
       |                          <> substr(np, CAST(i AS INT), 1) THEN i END)),
       |               LEAST(length(pre), length(np)) + 1) - 1 END) AS l
       |  FROM adj),
       |marks AS MATERIALIZED (SELECT doc_id, p, l FROM lcps WHERE l >= $MinSpan),
       |isl AS MATERIALIZED (
       |  SELECT doc_id, p, l,
       |         CASE WHEN p > COALESCE(MAX(p + l) OVER (PARTITION BY doc_id
       |              ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |              -1) THEN 1 ELSE 0 END AS new_isl
       |  FROM marks),
       |isl2 AS MATERIALIZED (
       |  SELECT doc_id, p, l,
       |         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS island
       |  FROM isl)""".stripMargin

  private val spansSelectSql: String =
    """SELECT doc_id, CAST(island AS BIGINT) AS island,
      |       MIN(p) AS span_start, MAX(p + l) - 1 AS span_end,
      |       MAX(p + l) - MIN(p) AS span_len
      |FROM isl2 GROUP BY 1, 2""".stripMargin

  /** X gate: maximal duplicated spans ≥ 40 chars over the real corpus —
    * the documents table carries planted near-copies, so this reports
    * the exact duplicated region of each (typically the whole shared
    * body), at character precision.
    */
  def suffixDedup(s: SparkSession, d: String): DataFrame =
    suffixSpans(Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text")))

  val suffixDedupOracle: String =
    s"WITH ${spansSql("documents")}\n$spansSelectSql"

  /** Planted-boundary gate, the [[Dedup.cdcPlanted]] corpus shape: every
    * document ≥ 400 chars yields an original (even id) and a mutant with
    * ONE character inserted at position 8 + doc_id % 16 (odd id). The
    * insertion point k < MinSpan splits each pair's duplication into the
    * tail only, so the reported span must start at EXACTLY k+1 in the
    * original and k+2 in the mutant — the span boundary lands one
    * character after the edit, which is the byte-resolution claim:
    * shingle/chunk dedup reports shifted or coarsened boundaries here.
    * (Pairs of near-duplicate SOURCE documents also cross-match and
    * widen some spans; the oracle recomputes identically.)
    */
  def suffixDedupPlanted(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) >= 400)
      .select(col("doc_id"), col("text"),
        (lit(8) + col("doc_id") % 16).cast("int").as("k"))
    val orig = base.select((col("doc_id") * 2).as("doc_id"), col("text"))
    val mut = base.select((col("doc_id") * 2 + 1).as("doc_id"),
      concat(expr("substring(text, 1, k)"), lit("Z"),
        expr("substring(text, k + 1)")).as("text"))
    suffixSpans(orig.unionByName(mut)
      .repartition(s.sparkContext.defaultParallelism))
  }

  val suffixDedupPlantedOracle: String = {
    val planted =
      """(SELECT doc_id * 2 AS doc_id, text FROM pb
        | UNION ALL
        | SELECT doc_id * 2 + 1 AS doc_id,
        |        substr(text, 1, k) || 'Z' || substr(text, k + 1) AS text
        | FROM pb)""".stripMargin
    s"""WITH pb AS MATERIALIZED (
       |  SELECT doc_id, text, CAST(8 + doc_id % 16 AS INT) AS k
       |  FROM documents WHERE text IS NOT NULL AND length(text) >= 400),
       |${spansSql(planted)}
       |$spansSelectSql""".stripMargin
  }

  val defs: Map[String, QueryFn] = Map(
    "x_suffix_dedup" -> (suffixDedup _),
    "x_suffix_dedup_planted" -> (suffixDedupPlanted _))

  val oracles: Map[String, String] = Map(
    "x_suffix_dedup" -> suffixDedupOracle,
    "x_suffix_dedup_planted" -> suffixDedupPlantedOracle)
}
