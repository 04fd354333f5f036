package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.QueryFn

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token counting, quality scoring, n-gram language ID, and document
  * fingerprinting.
  *
  * All are narrow per-row projections — no shuffle, fully codegen'd — so at
  * 100 TB they stream through executors at parquet-scan speed with column
  * pruning down to (doc_id, text).
  */
object TextAnalysis {

  /** Word tokens (lowercase alnum runs). */
  private def wordCount(text: Column): Column = regexp_count(text, lit("[a-z0-9]+"))

  /** BPE-ish sub-token pattern: letter runs, single digits, single
    * punctuation — a crude stand-in for a byte-pair vocab segmentation.
    */
  private def bpeCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]|[^a-z0-9 ]"))

  /** Per-document token statistics. */
  def tokenStats(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, d).select(
      col("doc_id"),
      length(t).as("len_chars"),
      wordCount(t).as("word_cnt"),
      bpeCount(t).as("bpe_cnt"),
      regexp_count(t, lit("\\b(the|a)\\b")).as("stopword_cnt"))
  }

  val tokenStatsOracle: String =
    """SELECT doc_id, length(text) AS len_chars,
      |       len(regexp_extract_all(text, '[a-z0-9]+')) AS word_cnt,
      |       len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS bpe_cnt,
      |       len(regexp_extract_all(text, '\b(the|a)\b')) AS stopword_cnt
      |FROM documents""".stripMargin

  /** Quality scoring: length/punctuation/stopword ratios → composite score.
    * Ratios are IEEE double divisions of exact integer counts, so the score
    * is bit-identical across engines.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        length(t).as("len_chars"),
        wordCount(t).as("word_cnt"),
        regexp_count(t, lit("[^a-z0-9 ]")).as("punct_cnt"),
        regexp_count(t, lit("\\b(the|a)\\b")).as("stopword_cnt"))
      .select(
        col("doc_id"), col("lang"), col("word_cnt"),
        // zero-count guards: Spark's non-ANSI x/0 yields NULL while DuckDB
        // yields inf — make the degenerate case an explicit NULL in BOTH
        when(col("word_cnt") === 0, lit(null).cast("double"))
          .otherwise(col("len_chars").cast("double") / col("word_cnt")).as("avg_token_len"),
        when(col("len_chars") === 0, lit(null).cast("double"))
          .otherwise(col("punct_cnt").cast("double") / col("len_chars")).as("punct_ratio"),
        when(col("word_cnt") === 0, lit(null).cast("double"))
          .otherwise(col("stopword_cnt").cast("double") / col("word_cnt")).as("stopword_ratio"))
      .withColumn("quality_score",
        when(col("word_cnt") < 5, 0.0)
          .otherwise(col("stopword_ratio") * 0.5
            + (lit(1.0) - col("punct_ratio")) * 0.5))
  }

  val qualityScoreOracle: String =
    """SELECT doc_id, lang, word_cnt,
      |       CASE WHEN word_cnt = 0 THEN NULL
      |            ELSE CAST(len_chars AS DOUBLE) / word_cnt END AS avg_token_len,
      |       CASE WHEN len_chars = 0 THEN NULL
      |            ELSE CAST(punct_cnt AS DOUBLE) / len_chars END AS punct_ratio,
      |       CASE WHEN word_cnt = 0 THEN NULL
      |            ELSE CAST(stopword_cnt AS DOUBLE) / word_cnt END AS stopword_ratio,
      |       CASE WHEN word_cnt < 5 THEN 0.0
      |            ELSE (CAST(stopword_cnt AS DOUBLE) / word_cnt) * 0.5
      |                 + (1.0 - CAST(punct_cnt AS DOUBLE) / len_chars) * 0.5 END AS quality_score
      |FROM (SELECT doc_id, lang, length(text) AS len_chars,
      |             len(regexp_extract_all(text, '[a-z0-9]+')) AS word_cnt,
      |             len(regexp_extract_all(text, '[^a-z0-9 ]')) AS punct_cnt,
      |             len(regexp_extract_all(text, '\b(the|a)\b')) AS stopword_cnt
      |      FROM documents)""".stripMargin

  /** N-gram-heuristic language ID: stopword-lexicon hit counts per language,
    * argmax with a fixed priority order for ties.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    def hits(pat: String): Column = regexp_count(t, lit(pat))
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        hits("\\b(the|a|and|of|is)\\b").as("s_en"),
        hits("\\b(le|la|et|les|des)\\b").as("s_fr"),
        hits("\\b(el|los|las|y|de)\\b").as("s_es"),
        hits("\\b(der|die|das|und|ist)\\b").as("s_de"))
      .withColumn("detected_lang",
        when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_es") && col("s_fr") >= col("s_de"), "fr")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
  }

  val langIdOracle: String =
    """SELECT doc_id, lang AS labeled_lang, s_en, s_fr, s_es, s_de,
      |       CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
      |            WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
      |            WHEN s_es >= s_de THEN 'es'
      |            ELSE 'de' END AS detected_lang
      |FROM (SELECT doc_id, lang,
      |             len(regexp_extract_all(text, '\b(the|a|and|of|is)\b')) AS s_en,
      |             len(regexp_extract_all(text, '\b(le|la|et|les|des)\b')) AS s_fr,
      |             len(regexp_extract_all(text, '\b(el|los|las|y|de)\b')) AS s_es,
      |             len(regexp_extract_all(text, '\b(der|die|das|und|ist)\b')) AS s_de
      |      FROM documents)""".stripMargin

  /** Document fingerprint: SHA-256 over canonicalized text (lowercase,
    * punctuation collapsed, trimmed) — the exact-dedup key that is robust to
    * formatting noise.
    */
  def canonical(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      sha2(canonical(col("text")), 256).as("fingerprint"))

  val fingerprintOracle: String =
    """SELECT doc_id,
      |       sha256(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
      |FROM documents""".stripMargin

  /** Karp-Rabin-style rolling hash over the character stream: a strict
    * left-to-right fold h ← (h·31 + code) mod 1e9+7. The modulus keeps the
    * accumulator ≤ ~3.2e10, so ANSI long arithmetic never overflows and
    * both engines compute the identical value.
    */
  def rollingHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        aggregate(
          transform(split(col("text"), ""), c => ascii(c).cast("long")),
          lit(0L),
          (acc, c) => (acc * 31 + c) % 1000000007L).as("roll_hash"))

  val rollingHashOracle: String =
    """SELECT doc_id,
      |       list_reduce(
      |         list_prepend(0, [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
      |         (acc, c) -> (acc * 31 + c) % 1000000007) AS roll_hash
      |FROM documents""".stripMargin

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169),
    * integer-linearized for engine exactness. DSIR scores each raw document
    * by how much its hashed-n-gram distribution over-indexes in a TARGET
    * corpus (here: the `lang = 'en'` slice) versus the raw pool, then keeps
    * the top-weighted docs. The log-likelihood-ratio weight needs libm
    * `ln` — not bit-stable across engines — so the per-bucket contribution
    * `ln(tc/T) − ln(rc/R)` is replaced by its exact-integer linearization
    * `tc·R − rc·T` (same sign, same zero crossing; +1-smoothed counts):
    * a document's evidence is the sum of that quantity over its token
    * occurrences, and selection is `evidence > 0` — over-indexed in the
    * target, exactly computable by both engines.
    *
    * Scale shape: token buckets come from a 256-bucket polynomial hash
    * computed scan-side (no vocabulary join); bucket stats are one
    * partial-agg'd shuffle of ≤256 reduce rows; the per-doc evidence
    * re-joins the tiny bucket table broadcast-style and aggregates by
    * doc_id. Work is O(total tokens) with nothing wider than the corpus.
    */
  def importanceSelect(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val bucketed = toks.withColumn("b",
      pmod(aggregate(transform(split(col("token"), ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L), lit(256)))
    val bstats = bucketed.groupBy(col("b")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
    val tot = bstats.agg(
      (sum(col("rc")) + 256).as("rtot"), (sum(col("tc")) + 256).as("ttot"))
    bucketed.join(broadcast(bstats), "b")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum((col("tc") + 1) * col("rtot") - (col("rc") + 1) * col("ttot")).as("evidence"))
      .withColumn("selected", col("evidence") > 0)
  }

  val importanceSelectOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |buck AS (
      |  SELECT doc_id, lang,
      |         list_reduce(
      |           list_prepend(0, [CAST(ascii(c) AS BIGINT) for c in string_split(token, '')]),
      |           (acc, c) -> (acc * 31 + c) % 1000000007) % 256 AS b
      |  FROM toks WHERE token <> ''),
      |bstats AS (
      |  SELECT b, COUNT(*) AS rc,
      |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tc
      |  FROM buck GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(rc) + 256 AS BIGINT) AS rtot,
      |         CAST(SUM(tc) + 256 AS BIGINT) AS ttot
      |  FROM bstats)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |       CAST(SUM((bs.tc + 1) * tot.rtot - (bs.rc + 1) * tot.ttot) AS BIGINT) AS evidence,
      |       CAST(SUM((bs.tc + 1) * tot.rtot - (bs.rc + 1) * tot.ttot) AS BIGINT) > 0 AS selected
      |FROM buck JOIN bstats bs USING (b) CROSS JOIN tot
      |GROUP BY 1""".stripMargin

  /** Corpus profile: per (lang, source) aggregate — the first thing a data
    * pipeline computes over a new crawl.
    */
  def corpusProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  val corpusProfileOracle: String =
    """SELECT lang, source, COUNT(*) AS docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** TF-IDF top terms per document, with a LINEAR idf (N/df instead of
    * log(N/df)): log is libm-implementation-specific and would break the
    * cross-engine oracle, while the rational form preserves the ranking for
    * fixed N. weight = (tf·N)/df in exact integer→double arithmetic; top-3
    * terms per doc, ties broken lexicographically.
    */
  def tfidfTop(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
    val tokens = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tokens.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    // corpus size as a 1-row aggregate cross-joined into the plan: no
    // separate driver-side count() action, and N stays a plan-time input
    val n1 = docs.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("weight").desc, col("term"))
    // no broadcast hint on the term→df table: the vocabulary of a 100 TB
    // corpus is GBs and must shuffle-join; AQE still broadcasts when small
    tf.join(df_, "term")
      .crossJoin(n1)
      .withColumn("weight", (col("tf") * col("n")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("weight"), col("rk"))
  }

  val tfidfTopOracle: String =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT doc_id, term,
      |       CAST(tf * n AS DOUBLE) / df AS weight,
      |       row_number() OVER (PARTITION BY doc_id
      |                          ORDER BY CAST(tf * n AS DOUBLE) / df DESC, term) AS rk
      |FROM tf JOIN df USING (term) CROSS JOIN n
      |QUALIFY rk <= 3""".stripMargin

  /** PII scrubbing: redact email-, phone-, and long-digit-shaped spans
    * (the anonymization family beyond B3's key hashing). Pure regex
    * projection — streams at scan speed; deterministic, so the oracle
    * applies identical patterns.
    */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    val scrubbed =
      regexp_replace(
        regexp_replace(t, "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
        "[0-9]{6,}", "<NUM>")
    Tables.documents(s, d).select(
      col("doc_id"),
      scrubbed.as("scrubbed"),
      (length(t) - length(scrubbed)).as("removed_chars"),
      regexp_count(t, lit("[0-9]{6,}")).as("long_numbers"))
  }

  val piiScrubOracle: String =
    """SELECT doc_id,
      |       regexp_replace(
      |         regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |         '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
      |       length(text) - length(regexp_replace(
      |         regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |         '[0-9]{6,}', '<NUM>', 'g')) AS removed_chars,
      |       len(regexp_extract_all(text, '[0-9]{6,}')) AS long_numbers
      |FROM documents""".stripMargin

  /** Deterministic pseudo-shuffle key: a Knuth multiplicative hash of the
    * doc id in pure integer arithmetic, so the "random" order is exactly
    * reproducible by any engine (no RNG, no engine-specific hash). The id
    * is folded into 31 bits FIRST so the multiply cannot overflow Long
    * (2³¹·2654435761 < 2⁶³) — an unmasked id ≳ 3.5e9 would wrap negative
    * in Spark and error in ANSI SQL engines.
    */
  private[ext] def shuffleKey(id: Column): Column =
    ((id % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)

  /** Stratified deterministic sampling: k docs per (lang, source) stratum,
    * picked by the pseudo-shuffle order — the corpus-curation op behind
    * "balance the training mix across languages/sources". One shuffle on
    * the stratum key (window rank); at 100 TB the same plan holds, and for
    * heavy strata the rank window can be pre-filtered by a hash-threshold
    * scan (filter before shuffle) — noted here, unnecessary at gate scale.
    */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source"))
      .orderBy(shuffleKey(col("doc_id")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= 5)
      .select(col("lang"), col("source"), col("doc_id"), col("pick"))
  }

  val sampleStratifiedOracle: String =
    """SELECT lang, source, doc_id,
      |       row_number() OVER (PARTITION BY lang, source
      |         ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) AS pick
      |FROM documents
      |QUALIFY pick <= 5""".stripMargin

  /** Weighted source mixing: down-sample each source to a configured rate
    * with the deterministic hash threshold (source A keeps 100%, B 50%,
    * C 10% — the "data mixture" recipe of a training pipeline). Pure
    * filter — streams at scan speed, no shuffle at all.
    */
  def mixSources(s: SparkSession, d: String): DataFrame = {
    val weights = Seq("src0" -> 100L, "src1" -> 50L, "src2" -> 10L)
    val pct = weights.foldLeft(lit(25L)) { case (acc, (src, w)) =>
      when(col("source") === src, lit(w)).otherwise(acc)
    }
    Tables.documents(s, d)
      .filter(shuffleKey(col("doc_id")) % 100 < pct)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept"))
  }

  val mixSourcesOracle: String =
    """SELECT source, COUNT(*) AS kept
      |FROM documents
      |WHERE (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 <
      |      CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
      |                  WHEN 'src2' THEN 10 ELSE 25 END
      |GROUP BY 1""".stripMargin

  /** Proportional sample allocation by the largest-remainder (Hamilton)
    * method — the exact-budget complement of [[mixSources]]' rate-based
    * mixing: a GLOBAL budget of K = 100 sample slots is split across
    * sources proportional to each source's total token mass, quotas are
    * `floor(K·mass/M)` plus one top-up for the largest remainders until
    * exactly K slots are allocated (ties on remainder break by source
    * name), and each source then contributes its quota of documents in
    * deterministic pseudo-shuffle order. Quota arithmetic is pure integer
    * div/mod, so every quota — and therefore every picked doc — is
    * engine-exact.
    *
    * Scale shape: one token-count aggregation (partial-agg'd map-side), a
    * SOURCE-cardinality allocation table (the ordered-remainder window
    * runs over #sources rows — bounded, never data-sized) broadcast back
    * onto the corpus, and one per-source rank window for the picks. At
    * 100 TB the allocation table is still a handful of rows; the rank
    * window can pre-filter by hash threshold exactly as
    * [[sampleStratified]] notes.
    */
  def allocLargestRemainder(s: SparkSession, d: String): DataFrame = {
    val k = 100L
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_toks"))
    val mass = toks.groupBy(col("source")).agg(sum(col("n_toks")).as("mass"))
    val total = mass.agg(sum(col("mass")).as("m"))
    val base = mass.crossJoin(broadcast(total))
      .select(col("source"), col("mass"),
        expr(s"($k * mass) div m").as("q0"),
        expr(s"($k * mass) % m").as("rem"))
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    val quota = base
      .withColumn("rk", row_number().over(wRem))
      .crossJoin(broadcast(base.agg((lit(k) - sum(col("q0"))).as("topups"))))
      .select(col("source"), col("mass"),
        (col("q0") + when(col("rk") <= col("topups"), 1L).otherwise(0L))
          .as("quota"))
    val wPick = Window.partitionBy(col("source"))
      .orderBy(shuffleKey(col("doc_id")), col("doc_id"))
    toks.join(broadcast(quota), "source")
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") <= col("quota"))
      .select(col("source"), col("mass"), col("quota"), col("doc_id"), col("pick"))
  }

  val allocLargestRemainderOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_toks
      |  FROM documents),
      |mass AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS mass
      |         FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS m FROM mass),
      |base AS (SELECT source, mass,
      |                (100 * mass) // m AS q0, (100 * mass) % m AS rem
      |         FROM mass, tot),
      |quota AS (
      |  SELECT source, mass,
      |         CAST(q0 + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
      |                             <= 100 - (SELECT SUM(q0) FROM base)
      |                        THEN 1 ELSE 0 END AS BIGINT) AS quota
      |  FROM base)
      |SELECT source, mass, quota, doc_id, pick
      |FROM (
      |  SELECT t.source, q.mass, q.quota, t.doc_id,
      |         row_number() OVER (PARTITION BY t.source
      |           ORDER BY ((t.doc_id % 2147483648) * 2654435761) % 4294967296,
      |                    t.doc_id) AS pick
      |  FROM toks t JOIN quota q ON q.source = t.source)
      |WHERE pick <= quota""".stripMargin

  /** Token-window document chunking with overlap — the "split long documents
    * into context-sized training examples" op. Tokens are lowercase-alnum
    * runs (the same tokenizer as [[tokenStats]]); windows are 40 tokens with
    * a 10-token overlap (stride 30), so every chunk after the first repeats
    * the previous chunk's last 10 tokens — the standard trick that keeps
    * context across example boundaries. The final partial window is kept
    * (training pipelines pad it), and an empty document still yields one
    * empty chunk so no doc silently disappears.
    *
    * Scale shape: tokenize once per row, then `explode` over an arithmetic
    * `sequence` of window starts — a pure per-row flatMap, no shuffle, fully
    * codegen'd; at 100 TB it streams at parquet-scan speed and the output is
    * ~len/stride times the input rows, written partition-local.
    */
  def chunkDocs(s: SparkSession, d: String): DataFrame = {
    val win = 40
    val stride = 30
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("start",
        explode(sequence(lit(1L), greatest(col("n_tok"), lit(1L)), lit(stride.toLong))))
      .select(
        col("doc_id"), col("n_tok"), col("start"),
        // (start-1)/stride is an exact small-int double division; floor makes
        // the index integral in both engines (plain `/` is double in both)
        floor((col("start") - 1) / lit(stride.toDouble)).cast("long").as("chunk_idx"),
        array_join(slice(col("toks"), col("start"), lit(win)), " ").as("chunk_text"),
        greatest(least(col("start") + (win - 1), col("n_tok")) - col("start") + 1, lit(0L))
          .as("chunk_tok"))
  }

  val chunkDocsOracle: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
      |n AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t),
      |s AS (SELECT doc_id, n_tok, toks,
      |             unnest(generate_series(1, greatest(n_tok, 1), 30)) AS start
      |      FROM n)
      |SELECT doc_id, n_tok, start,
      |       CAST(floor((start - 1) / 30.0) AS BIGINT) AS chunk_idx,
      |       array_to_string(toks[start : least(start + 39, n_tok)], ' ') AS chunk_text,
      |       greatest(least(start + 39, n_tok) - start + 1, 0) AS chunk_tok
      |FROM s""".stripMargin

  /** Concat-and-cut sequence packing — the GPT-style "concatenate the corpus
    * in a shuffled order and cut every B tokens" batching op. Documents are
    * ordered by the deterministic pseudo-shuffle key, token counts are
    * cumulatively summed, and each document is assigned to every
    * B=256-token bin its token span overlaps (a doc straddling a cut
    * contributes its head to one bin and its tail to the next), with the
    * exact per-bin token contribution emitted.
    *
    * Scale shape: packing is SHARDED — the window runs per shard
    * (`shuffle_key % 4`), not over one global total order, so at 100 TB
    * each shard packs independently in parallel (bins are namespaced by
    * shard) and no single-partition global sort exists anywhere. One
    * shuffle on the shard key; the bin fan-out is a per-row arithmetic
    * explode.
    */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val budget = 256L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("tok"),
        shuffleKey(col("doc_id")).as("k"))
      .filter(col("tok") > 0)
      .withColumn("shard", col("k") % 4)
      .withColumn("cum", sum(col("tok")).over(w).cast("long"))
      .withColumn("bin", explode(sequence(
        floor((col("cum") - col("tok")) / lit(budget.toDouble)).cast("long"),
        floor((col("cum") - 1) / lit(budget.toDouble)).cast("long"))))
      .select(
        col("doc_id"), col("shard"), col("tok"), col("bin"),
        (least(col("cum"), (col("bin") + 1) * budget)
          - greatest(col("cum") - col("tok"), col("bin") * budget)).as("tokens_in_bin"))
  }

  val packSequencesOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         len(regexp_extract_all(text, '[a-z0-9]+')) AS tok,
      |         ((doc_id % 2147483648) * 2654435761) % 4294967296 AS k
      |  FROM documents),
      |o AS (
      |  SELECT doc_id, tok, k, k % 4 AS shard,
      |         CAST(SUM(tok) OVER (PARTITION BY k % 4 ORDER BY k, doc_id
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM t WHERE tok > 0),
      |b AS (
      |  SELECT doc_id, shard, tok, cum,
      |         unnest(generate_series(
      |           CAST(floor((cum - tok) / 256.0) AS BIGINT),
      |           CAST(floor((cum - 1) / 256.0) AS BIGINT))) AS bin
      |  FROM o)
      |SELECT doc_id, shard, tok, bin,
      |       least(cum, (bin + 1) * 256) - greatest(cum - tok, bin * 256) AS tokens_in_bin
      |FROM b""".stripMargin

  /** C4-style corpus-level line deduplication: segment every document into
    * 5-token "lines" (the synthetic docs are single-line, so fixed token
    * windows stand in for newline-delimited lines), count how many DISTINCT
    * documents each line occurs in, drop every line appearing in ≥ 3
    * documents (boilerplate by definition), and reassemble each document
    * from its kept lines in order — the dedup that removes repeated
    * headers/footers/navigation WITHIN documents, which document-level
    * near-dup cannot touch.
    *
    * Scale shape: two shuffles, both keyed and narrow — one on the line
    * text (the frequency count; at 100 TB this is a hash of the line, and
    * the count is a partial-aggregated groupBy, never a collect), one on
    * doc_id for reassembly (`sort_array(collect_list)` per doc is bounded
    * by document length, the same per-key bound every per-doc op has).
    */
  def lineDedup(s: SparkSession, d: String): DataFrame = {
    val L = 5
    val lines = Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .withColumn("start", explode(sequence(
        lit(1L), greatest(size(col("toks")).cast("long"), lit(1L)), lit(L.toLong))))
      .select(col("doc_id"),
        floor((col("start") - 1) / lit(L.toDouble)).cast("long").as("line_idx"),
        array_join(slice(col("toks"), col("start"), lit(L)), " ").as("line_text"))
    val freq = lines.groupBy(col("line_text"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    lines.join(freq, "line_text")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("ndocs") < 3, 1).otherwise(0)).cast("long").as("kept_lines"),
        sum(when(col("ndocs") >= 3, 1).otherwise(0)).cast("long").as("dropped_lines"),
        array_join(transform(sort_array(collect_list(
          when(col("ndocs") < 3, struct(col("line_idx"), col("line_text"))))),
          x => x("line_text")), " ").as("cleaned_text"))
  }

  val lineDedupOracle: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
      |s AS (SELECT doc_id, toks,
      |             unnest(generate_series(1, greatest(len(toks), 1), 5)) AS start
      |      FROM t),
      |lines AS (SELECT doc_id, CAST(floor((start - 1) / 5.0) AS BIGINT) AS line_idx,
      |                 array_to_string(toks[start : start + 4], ' ') AS line_text
      |          FROM s),
      |freq AS (SELECT line_text, COUNT(DISTINCT doc_id) AS ndocs FROM lines GROUP BY 1)
      |SELECT l.doc_id,
      |       CAST(SUM(CASE WHEN ndocs < 3 THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
      |       CAST(SUM(CASE WHEN ndocs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_lines,
      |       coalesce(string_agg(CASE WHEN ndocs < 3 THEN line_text END, ' '
      |                           ORDER BY line_idx), '') AS cleaned_text
      |FROM lines l JOIN freq f USING (line_text)
      |GROUP BY 1""".stripMargin

  /** Within-document segment dedup — the INTRA-doc complement of
    * [[lineDedup]]'s cross-corpus pass: repeated 10-token segments inside
    * one document (boilerplate stutter, template repetition) keep only
    * their FIRST occurrence; the doc is reassembled in order. Entirely
    * higher-order array functions over the scan — zero shuffles, zero
    * joins: the dedup predicate is `first occurrence index == own index`
    * via `array_position`, evaluated per row. At 100 TB this runs at scan
    * speed alongside the other per-doc signals.
    */
  def paragraphDedup(s: SparkSession, d: String): DataFrame = {
    val L = 10L
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .withColumn("segs",
        transform(
          sequence(lit(1L), greatest(size(col("toks")).cast("long"), lit(1L)), lit(L)),
          st => array_join(slice(col("toks"), st, lit(L.toInt)), " ")))
      .withColumn("kept",
        filter(col("segs"),
          (seg, i) => array_position(col("segs"), seg) === i.cast("long") + lit(1L)))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        (size(col("segs")) - size(col("kept"))).cast("long").as("n_repeats"),
        array_join(col("kept"), " ").as("cleaned_text"))
  }

  val paragraphDedupOracle: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
      |           FROM documents),
      |seg AS (
      |  SELECT doc_id,
      |         [array_to_string(toks[st : st + 9], ' ')
      |          for st in range(1, greatest(len(toks), 1) + 1, 10)] AS segs
      |  FROM t),
      |k AS (
      |  SELECT doc_id, segs,
      |         [segs[i] for i in range(1, len(segs) + 1)
      |          if list_position(segs, segs[i]) = i] AS kept
      |  FROM seg)
      |SELECT doc_id, CAST(len(segs) AS BIGINT) AS n_segs,
      |       CAST(len(segs) - len(kept) AS BIGINT) AS n_repeats,
      |       array_to_string(kept, ' ') AS cleaned_text
      |FROM k""".stripMargin

  /** Per-source length winsorization — drop each source's `floor(n/20)`
    * shortest and longest documents (truncation-artifact and
    * concatenation-artifact tails) by COUNT, not by percent_rank: a rank
    * threshold like `pr ∈ [0.05, 0.95]` always kills the endpoint rows
    * (pr = 0 and 1 by definition), which annihilates 1- and 2-document
    * sources entirely and removes 20% of a 10-doc source. The count form
    * trims exactly ⌊5%⌋ per tail — ZERO for sources under 20 docs, which
    * therefore pass through whole. Total order key (n_chars, doc_id)
    * keeps ranks engine-deterministic; `n div 20` is integer-exact in
    * both engines. One window over source-sized partitions.
    */
  def lengthTrim(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val wAll = Window.partitionBy(col("source"))
    Tables.documents(s, d)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("cut", expr("n div 20"))
      .filter(col("rk") > col("cut") && col("rk") <= col("n") - col("cut"))
      .select(col("doc_id"), col("source"), col("n_chars"))
  }

  val lengthTrimOracle: String =
    """SELECT doc_id, source, n_chars
      |FROM (SELECT doc_id, source, n_chars,
      |             row_number() OVER (PARTITION BY source
      |                                ORDER BY n_chars, doc_id) AS rk,
      |             COUNT(*) OVER (PARTITION BY source) AS n
      |      FROM documents)
      |WHERE rk > n // 20 AND rk <= n - n // 20""".stripMargin

  /** Token-budget selection — fill each source's token budget with its
    * BEST documents: order by (quality desc, id), accumulate token counts,
    * keep while the running total fits. This is the curation op behind
    * "N billion tokens per source, best first"; per-source windows keep
    * the cumulative sum partition-local (no global sort at any scale —
    * the 100-TB allocation runs one window per source partition).
    * Quality reuses the hash-verified [[qualityScore]] formula, so the
    * ordering doubles are bit-identical across engines.
    */
  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val budget = 600L
    val q = qualityScore(s, d).select(col("doc_id"), col("quality_score"))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_toks"))
      .join(q, Seq("doc_id"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum_toks", sum(col("n_toks")).over(w))
      .filter(col("cum_toks") <= budget)
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("cum_toks"), col("quality_score"))
  }

  val tokenBudgetOracle: String =
    """WITH q AS (
      |  SELECT doc_id,
      |         CASE WHEN word_cnt < 5 THEN 0.0
      |              ELSE (CAST(stopword_cnt AS DOUBLE) / word_cnt) * 0.5
      |                   + (1.0 - CAST(punct_cnt AS DOUBLE) / len_chars) * 0.5 END AS quality_score
      |  FROM (SELECT doc_id, length(text) AS len_chars,
      |               len(regexp_extract_all(text, '[a-z0-9]+')) AS word_cnt,
      |               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS punct_cnt,
      |               len(regexp_extract_all(text, '\b(the|a)\b')) AS stopword_cnt
      |        FROM documents)),
      |t AS (
      |  SELECT d.doc_id, d.source,
      |         CAST(len(regexp_extract_all(d.text, '[a-z0-9]+')) AS BIGINT) AS n_toks,
      |         q.quality_score
      |  FROM documents d JOIN q USING (doc_id))
      |SELECT doc_id, source, n_toks,
      |       CAST(SUM(n_toks) OVER (PARTITION BY source
      |                              ORDER BY quality_score DESC, doc_id
      |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks,
      |       quality_score
      |FROM t
      |QUALIFY cum_toks <= 600""".stripMargin

  /** Deterministic train/val/test split — the reproducibility op every
    * training pipeline needs: membership is a pure function of the doc id
    * (pseudo-shuffle hash mod 100 → 80/10/10), so the split is stable
    * across runs, machines, and engines, and adding documents never moves
    * an existing one between splits. Shuffle-free scan; the gate emits
    * per-split counts and id checksums so the oracle proves both sizes AND
    * membership.
    */
  def dataSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = shuffleKey(col("doc_id")) % 100
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("id_min"),
        max(col("doc_id")).as("id_max"))
  }

  val dataSplitOracle: String =
    """SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |       COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      |       MIN(doc_id) AS id_min, MAX(doc_id) AS id_max
      |FROM (SELECT doc_id,
      |             (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS b
      |      FROM documents)
      |GROUP BY 1""".stripMargin

  /** Model-based quality filter — a fixed-weight LINEAR classifier over the
    * engineered features of [[qualityScore]] (the shape of a fastText/
    * logistic quality model with frozen public weights; training is out of
    * scope, serving is the pipeline op). The raw margin is kept instead of
    * the sigmoid: exp() is libm-dependent and differs across engines, while
    * sigmoid is monotone, so thresholding the margin at 0 IS thresholding
    * the probability at 0.5 — bit-exact and semantically identical. The
    * weighted sum is written as an explicit left-to-right chain so both
    * engines run the identical IEEE op sequence.
    *
    * Scale shape: pure per-row projection, no shuffle, codegen'd — the
    * 100-TB quality pass is a scan.
    */
  def qualityModel(s: SparkSession, d: String): DataFrame = {
    val t = col("text")
    val f = Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        length(t).cast("long").as("len_chars"),
        regexp_count(t, lit("[a-z0-9]+")).cast("long").as("word_cnt"),
        regexp_count(t, lit("[^a-z0-9 ]")).cast("long").as("punct_cnt"),
        regexp_count(t, lit("\\b(the|a)\\b")).cast("long").as("stopword_cnt"),
        regexp_count(t, lit("[0-9]{6,}")).cast("long").as("long_num_cnt"))
    val stopR = col("stopword_cnt").cast("double") / col("word_cnt")
    val punctR = col("punct_cnt").cast("double") / col("len_chars")
    val lenF = least(col("word_cnt"), lit(100L)).cast("double") / lit(100.0)
    val margin =
      lit(-1.0) + stopR * lit(6.0) - punctR * lit(3.0) + lenF * lit(2.0) -
        col("long_num_cnt").cast("double") * lit(0.5)
    f.withColumn("margin",
        when(col("word_cnt") === 0 || col("len_chars") === 0,
          lit(null).cast("double")).otherwise(margin))
      .withColumn("keep", coalesce(col("margin") > 0.0, lit(false)))
      .select(col("doc_id"), col("lang"), col("word_cnt"),
        col("margin"), col("keep"))
  }

  val qualityModelOracle: String =
    """SELECT doc_id, lang, word_cnt,
      |       CASE WHEN word_cnt = 0 OR len_chars = 0 THEN NULL
      |            ELSE -1.0 + (CAST(stopword_cnt AS DOUBLE) / word_cnt) * 6.0
      |                 - (CAST(punct_cnt AS DOUBLE) / len_chars) * 3.0
      |                 + (CAST(least(word_cnt, 100) AS DOUBLE) / 100.0) * 2.0
      |                 - CAST(long_num_cnt AS DOUBLE) * 0.5 END AS margin,
      |       coalesce(
      |         CASE WHEN word_cnt = 0 OR len_chars = 0 THEN NULL
      |              ELSE -1.0 + (CAST(stopword_cnt AS DOUBLE) / word_cnt) * 6.0
      |                   - (CAST(punct_cnt AS DOUBLE) / len_chars) * 3.0
      |                   + (CAST(least(word_cnt, 100) AS DOUBLE) / 100.0) * 2.0
      |                   - CAST(long_num_cnt AS DOUBLE) * 0.5 END > 0.0,
      |         false) AS keep
      |FROM (SELECT doc_id, lang, length(text) AS len_chars,
      |             len(regexp_extract_all(text, '[a-z0-9]+')) AS word_cnt,
      |             len(regexp_extract_all(text, '[^a-z0-9 ]')) AS punct_cnt,
      |             len(regexp_extract_all(text, '\b(the|a)\b')) AS stopword_cnt,
      |             len(regexp_extract_all(text, '[0-9]{6,}')) AS long_num_cnt
      |      FROM documents)""".stripMargin

  /** BM25 top-k retrieval over an inverted index — the search op behind
    * "find the training docs most relevant to these probe queries"
    * (retrieval-based curation / decontamination-by-query). Classic BM25
    * with k1=1.2, b=0.75 and a RATIONAL idf `(N - df + 0.5)/(df + 0.5)`
    * (same move as [[tfidfTop]]'s linear idf: `ln` is libm-dependent and
    * would break bit-exact oracle parity; the ranking is order-isomorphic
    * for df < N/2, which holds for every query term here). Three fixed
    * 3-term queries; per-(query, doc) scores pivot the three terms to
    * columns and add them in a FIXED ORDER (the [[graft.ext.Similarity]]
    * ADC pattern) so the float total is engine-exact.
    *
    * Scale shape: the inverted index (tf per (term, doc)) is one
    * (doc, term) shuffle with map-side collapse; df and the length norm
    * are partial-aggregated; the query join hits only postings of the 9
    * query terms (a broadcast semi-join against a 9-row table — O(matching
    * postings), never a corpus scan per query); top-k is a per-query
    * window over the scored candidates only.
    */
  def bm25Search(s: SparkSession, d: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val queries = Seq(
      (0L, "data", "spark", "query"),
      (1L, "table", "join", "key"),
      (2L, "batch", "window", "agg"))
    import s.implicits._
    val qterms = queries.toDF("query_id", "t0", "t1", "t2")
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("len_sum"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qlong = qterms.select(col("query_id"),
      explode(array(
        struct(lit(0).as("slot"), col("t0").as("qterm")),
        struct(lit(1).as("slot"), col("t1").as("qterm")),
        struct(lit(2).as("slot"), col("t2").as("qterm")))).as("q"))
      .select(col("query_id"), col("q.slot"), col("q.qterm"))
    // per-(query, doc, slot) BM25 term score; avgdl via the broadcast stats
    val scored = tf
      .join(broadcast(qlong), col("term") === col("qterm"))
      .join(broadcast(df_.join(broadcast(qlong.select(col("qterm").as("term")).distinct()), "term")),
        "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
      .withColumn("tscore",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl")
            / (col("len_sum").cast("double") / col("n_docs")))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        max(when(col("slot") === 0, col("tscore"))).as("s0"),
        max(when(col("slot") === 1, col("tscore"))).as("s1"),
        max(when(col("slot") === 2, col("tscore"))).as("s2"))
      .withColumn("score",
        coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0))
          + coalesce(col("s2"), lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("doc_id"), col("score"), col("rk"))
  }

  val bm25SearchOracle: String =
    """WITH q(query_id, slot, qterm) AS (VALUES
      |  (0, 0, 'data'), (0, 1, 'spark'), (0, 2, 'query'),
      |  (1, 0, 'table'), (1, 1, 'join'), (1, 2, 'key'),
      |  (2, 0, 'batch'), (2, 1, 'window'), (2, 2, 'agg')),
      |docs AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
      |  GROUP BY 1, 2),
      |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS len_sum FROM dl),
      |dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
  |  -- e0 literals force DOUBLE: DuckDB parses bare decimals as DECIMAL and
      |  -- tf * DECIMAL stays exact decimal math, 1 ulp off Spark's doubles
      |  SELECT q.query_id, tf.doc_id, q.slot,
      |         ((CAST(n_docs AS DOUBLE) - df + 0.5e0) / (df + 0.5e0))
      |           * (tf * 2.2e0)
      |           / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl.dl
      |                / (CAST(len_sum AS DOUBLE) / n_docs))) AS tscore
      |  FROM tf
      |  JOIN q ON tf.term = q.qterm
      |  JOIN dfs ON dfs.term = tf.term
      |  JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats),
      |agg AS (
      |  SELECT query_id, doc_id,
      |         MAX(CASE WHEN slot = 0 THEN tscore END) AS s0,
      |         MAX(CASE WHEN slot = 1 THEN tscore END) AS s1,
      |         MAX(CASE WHEN slot = 2 THEN tscore END) AS s2
      |  FROM scored GROUP BY 1, 2)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
      |       coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score,
      |       row_number() OVER (PARTITION BY query_id ORDER BY
      |         coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) DESC,
      |         doc_id) AS rk
      |FROM agg QUALIFY rk <= 10""".stripMargin

  /** Vocabulary-coverage quality scoring — the perplexity PROXY that needs
    * no model: build the corpus's top-200 vocabulary by document frequency
    * (deterministic df-then-term tie-break), then score every document by
    * its out-of-vocabulary token rate and its mean in-vocabulary document
    * frequency. Low coverage ≈ boilerplate/garbled/foreign text — the
    * standard cheap pre-filter before any model-based quality pass.
    *
    * Scale shape: the vocabulary is a global top-K → TakeOrderedAndProject
    * (per-partition top-K + driver merge, never a full sort), and the
    * scoring join is left to AQE (a top-200 table always broadcasts; a
    * top-5M production vocabulary may not). All outputs are exact longs or
    * single divisions of exact longs — engine-portable doubles.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val vocab = tokens
      .groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("term")).limit(200)
      .withColumnRenamed("term", "vterm")
    tokens.join(vocab, col("term") === col("vterm"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("vterm").isNull, 1).otherwise(0)).as("oov"),
        sum(coalesce(col("df"), lit(0L))).as("df_sum"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("oov").cast("double") / col("n_tokens")).as("oov_rate"),
        (col("df_sum").cast("double") / col("n_tokens")).as("avg_df"))
  }

  val vocabCoverageOracle: String =
    """WITH tokens AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
      |vocab AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 200)
      |SELECT t.doc_id, COUNT(*) AS n_tokens,
      |       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |         / COUNT(*) AS oov_rate,
      |       CAST(SUM(COALESCE(v.df, 0)) AS DOUBLE) / COUNT(*) AS avg_df
      |FROM tokens t LEFT JOIN vocab v ON t.term = v.term
      |GROUP BY 1""".stripMargin

  /** Gopher-style repetition signals — the cheap filters that catch
    * boilerplate and degenerate (looping) generations before any model
    * pass: distinct-word ratio, most-frequent-word fraction, and
    * most-frequent word-BIGRAM fraction per document. High top-n-gram
    * fractions flag "the same phrase repeated 500 times" documents that
    * length/punctuation heuristics miss.
    *
    * Scale shape: words and bigrams are counted with ONE shuffle each on
    * (doc_id, gram) with full partial aggregation (a repeated phrase
    * collapses map-side), and the per-doc argmax is a `min(struct(-cnt,
    * gram))` AGGREGATE — no window, no per-doc sort. Ties break to the
    * lexicographically smallest gram, matching the oracle's ORDER BY.
    * Bigrams come from one `transform` over the split array — no
    * self-join on position.
    */
  def repetitionSignals(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val words = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        min(struct((-col("cnt")).as("neg"), col("w").as("g"))).as("top"))
      .select(
        col("doc_id"), col("n_words"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_words")).as("distinct_ratio"),
        col("top.g").as("top_word"),
        ((-col("top.neg")).cast("double") / col("n_words")).as("top_word_frac"))
    val bigrams = docs
      .select(col("doc_id"),
        explode(expr(
          "transform(slice(ws, 1, size(ws) - 1), (x, i) -> concat(x, ' ', element_at(ws, i + 2)))"))
          .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        min(struct((-col("cnt")).as("neg"), col("bg").as("g"))).as("top"))
      .select(
        col("doc_id").as("b_doc"), col("n_bigrams"),
        col("top.g").as("top_bigram"),
        ((-col("top.neg")).cast("double") / col("n_bigrams")).as("top_bigram_frac"))
    words.join(bigrams, col("doc_id") === col("b_doc"), "left").drop("b_doc")
  }

  val repetitionSignalsOracle: String =
    """WITH w AS (
      |  SELECT doc_id, w, COUNT(*) AS cnt FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY 1, 2),
      |wtop AS (
      |  SELECT doc_id, w AS top_word, cnt,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, w) AS rn
      |  FROM w),
      |wagg AS (
      |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
      |         COUNT(*) AS n_distinct FROM w GROUP BY 1),
      |b AS (
      |  SELECT doc_id, l[i] || ' ' || l[i + 1] AS bg, COUNT(*) AS cnt FROM (
      |    SELECT doc_id, string_split(text, ' ') AS l,
      |           unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
      |    FROM documents)
      |  GROUP BY 1, 2),
      |btop AS (
      |  SELECT doc_id, bg AS top_bigram, cnt,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg) AS rn
      |  FROM b),
      |bagg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams FROM b GROUP BY 1)
      |SELECT wagg.doc_id, wagg.n_words, wagg.n_distinct,
      |       CAST(wagg.n_distinct AS DOUBLE) / wagg.n_words AS distinct_ratio,
      |       wtop.top_word,
      |       CAST(wtop.cnt AS DOUBLE) / wagg.n_words AS top_word_frac,
      |       bagg.n_bigrams, btop.top_bigram,
      |       CAST(btop.cnt AS DOUBLE) / bagg.n_bigrams AS top_bigram_frac
      |FROM wagg
      |JOIN (SELECT * FROM wtop WHERE rn = 1) wtop USING (doc_id)
      |LEFT JOIN bagg USING (doc_id)
      |LEFT JOIN (SELECT * FROM btop WHERE rn = 1) btop ON bagg.doc_id = btop.doc_id""".stripMargin

  /** Count-based bigram language-model scoring — train on the `train`
    * split's bigram/context counts, score every `val`-split document: per
    * doc, the number of bigrams, how many are out-of-model (unseen context
    * pair), and the summed conditional probability P(w2|w1) = c(w1,w2)/c(w1)
    * of the seen ones. The statistical shape of n-gram-LM perplexity
    * filtering (CCNet-style) with the log/exp kept OUT of the contract:
    * probabilities ship as `round(10⁹·P)` computed entirely in integers —
    * `floor((2·10⁹·c2 + c1) div (2·c1))` — so both engines agree bit-for-bit
    * (libm `ln` is not cross-engine reproducible; the monotone integer score
    * ranks documents identically).
    *
    * Scale shape: model training is one (w1,w2) shuffle and one (w1)
    * shuffle, both partial-agg'd map-side; scoring joins val bigrams
    * against the two model tables on their natural keys (vocabulary-sized
    * sides — bucketable at 100 TB, AQE-chosen here) and folds per-doc with
    * one keyed aggregation. Split membership is the same pure hash as
    * [[dataSplit]] — no shared state between train and serve passes.
    */
  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)).as("toks"),
        (shuffleKey(col("doc_id")) % 100).as("b"))
      .filter(size(col("toks")) >= 2)
    val bigrams = docs
      .select(col("doc_id"), col("b"),
        explode(expr("transform(slice(toks, 1, size(toks) - 1), " +
          "(x, i) -> struct(x AS w1, element_at(toks, i + 2) AS w2))")).as("bg"))
      .select(col("doc_id"), col("b"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val train = bigrams.filter(col("b") < 80)
    val pair = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val ctx = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bigrams.filter(col("b") >= 80 && col("b") < 90)
      .join(pair, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("c2").isNotNull,
          expr("(2000000000 * c2 + c1) div (2 * c1)")).otherwise(0L)).as("score_sum"))
  }

  val bigramLmOracle: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks,
      |                  (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS b
      |           FROM documents),
      |bg AS (SELECT doc_id, b, toks[i] AS w1, toks[i + 1] AS w2
      |       FROM (SELECT doc_id, b, toks,
      |                    unnest(generate_series(1, len(toks) - 1)) AS i
      |             FROM t WHERE len(toks) >= 2)),
      |pair AS (SELECT w1, w2, count(*) AS c2 FROM bg WHERE b < 80 GROUP BY 1, 2),
      |ctx AS (SELECT w1, count(*) AS c1 FROM bg WHERE b < 80 GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(SUM(CASE WHEN pair.c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |       CAST(SUM(CASE WHEN pair.c2 IS NOT NULL
      |                     THEN (2000000000 * pair.c2 + ctx.c1) // (2 * ctx.c1)
      |                     ELSE 0 END) AS BIGINT) AS score_sum
      |FROM bg LEFT JOIN pair USING (w1, w2) LEFT JOIN ctx USING (w1)
      |WHERE b >= 80 AND b < 90
      |GROUP BY 1""".stripMargin

  /** BPE merge learning, iteration 1 — the counting kernel of tokenizer
    * training: aggregate the corpus to a word-frequency table (the standard
    * BPE preprocessing — all later work is per unique word, weighted by its
    * count, never per corpus occurrence), emit every adjacent character
    * pair of every unique word via one arithmetic `transform` (no
    * positional self-join), and rank pairs by weighted frequency with a
    * total order (count DESC, pair ASC) so the top-10 merge candidates are
    * engine-deterministic. Production BPE repeats this loop after applying
    * the winning merge; the gate pins the counting step, which is the part
    * that touches data at scale — each iteration is two keyed partial-agg'd
    * shuffles (word counts, pair counts), both bounded by vocabulary size
    * after the first.
    */
  def bpeMerges(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    words.filter(length(col("w")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(10)
  }

  /** BPE APPLY — tokenize the corpus with an ORDERED merge list (the
    * production inference step; [[bpeMerges]] pins the training counter).
    * The merge list is learned from the corpus's iteration-1 pair counts
    * (top-5 by weighted count DESC, pair ASC — engine-deterministic) and
    * applied IN ORDER, each merge as one LEFT-TO-RIGHT GREEDY fold over
    * the token array (`aggregate`: a freshly-merged token never re-merges
    * with the element that follows it — the textbook single-scan
    * semantics, so `aaaa` + merge `(a,a)` → `aa aa`, never `aaa a`).
    * Everything runs at WORD level: the corpus collapses to its unique
    * words first (distinct-then-broadcast), so apply cost is
    * O(unique words × merges), not O(corpus tokens × merges) — at 100 TB
    * the vocabulary is bounded while the token stream is not, and the
    * per-word tokenization joins back to documents with one broadcast.
    * Emits the full vocab mapping: word, corpus weight, final token
    * SEQUENCE, token count — the tokenizer artifact itself, hash-verified
    * against DuckDB replaying the same learn + 5 sequential folds.
    */
  def bpeApply(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    // the ordered merge list: 5 rows, collected — O(1) driver data
    val merges: Seq[(String, String)] = words.filter(length(col("w")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(5).collect()
      .map { r => val p = r.getString(0); (p.substring(0, 1), p.substring(1, 2)) }
      .toSeq
    val init = words.withColumn("toks", expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    val folded = bpeFoldToks(init, merges)
    folded.select(col("w"), col("wc"),
      concat_ws(" ", col("toks")).as("toks_str"),
      size(col("toks")).cast("long").as("n_toks"))
  }

  /** BPE TRAIN — the full iterative loop: each round recounts adjacent
    * TOKEN pairs over the CURRENT tokenization of the (weighted, unique)
    * vocabulary, picks the argmax (count DESC, pair ASC — total order),
    * and applies that single merge before the next round counts again —
    * so round 2 can select a pair involving round 1's fused token, which
    * the one-shot candidate list ([[bpeMerges]]) structurally cannot.
    * The corpus is touched exactly ONCE, to build the weighted unique-word
    * vocabulary; every later round works over that vocab alone (see
    * [[bpeTrainRounds]] for the two execution strategies), so per-round
    * cost is independent of both corpus size and the round index — the
    * property that makes tokenizer training feasible at 100 TB.
    * Emits the learned ordered merge table (round, left, right, weighted
    * count at selection time), hash-verified against DuckDB replaying
    * the same ten count→select→fold rounds.
    */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    import s.implicits._
    bpeTrainRounds(words, rounds = BpeTrainGateRounds).toDF("rk", "a", "b", "n")
  }

  /** Rounds the `x_bpe_train` gate trains (and its oracle replays). */
  private[graft] val BpeTrainGateRounds = 10

  /** Vocabularies at or under this size train driver-side (the fast path);
    * larger ones use the distributed per-round loop. HuggingFace/SentencePiece
    * trainers hold the weighted word vocab in memory the same way — a 4M-word
    * vocab of short strings is tens of MB, far below driver heap.
    */
  private[graft] val BpeDriverVocabMax: Long =
    sys.env.get("SPARK_GRAFT_BPE_VOCAB_MAX").map(_.toLong).getOrElse(4000000L)

  /** The trainer loop over a `(w, wc)` weighted vocabulary — one
    * count→argmax→fold cycle per round (see [[bpeTrain]]).
    *
    * Lineage safety: the naive formulation (re-derive round R's
    * tokenization as R folds stacked on the raw vocab DataFrame) makes
    * round R recompute all R−1 prior folds AND rescan the corpus — O(R)
    * corpus scans, O(R²) fold work for an R-round train. Here the vocab
    * is materialized ONCE (`persist` + count = the single corpus scan),
    * then:
    *   - vocab ≤ [[BpeDriverVocabMax]] (every realistic corpus — the
    *     vocab is unique WORDS, bounded at any corpus size): collect the
    *     weighted vocab and train in memory with incremental pair-count
    *     maintenance — each round updates only the words that actually
    *     contain the merged pair, so per-round cost is O(affected words
    *     + heap ops), flat in the round index. This is the standard
    *     single-machine BPE trainer (the count table is vocab-bounded),
    *     fed by a distributed corpus aggregation.
    *   - larger vocabs: distributed count→argmax→fold per round, with
    *     `localCheckpoint` after every fold so round R's plan is one
    *     vocab-bounded scan of round R−1's materialized tokenization —
    *     never a replay of rounds 1..R−1, never the corpus.
    * `onRound` receives (round, nanos) per completed round — scale probes
    * use it to pin per-round wall-time flat in the round index.
    */
  private[graft] def bpeTrainRounds(
      words: DataFrame, rounds: Int,
      onRound: (Int, Long) => Unit = (_, _) => ()): Seq[(Int, String, String, Long)] = {
    val w2 = words.select(col("w").cast("string").as("w"), col("wc").cast("long").as("wc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vocabSize = w2.count() // materializes the cache: the one corpus scan
      if (vocabSize <= BpeDriverVocabMax) {
        val vocab = w2.collect().map(r => (r.getString(0), r.getLong(1))) // cache hit
        bpeTrainInMemory(vocab, rounds, onRound)
      } else bpeTrainDistributed(w2, rounds, onRound)
    } finally { w2.unpersist(); () }
  }

  /** In-memory trainer: incremental pair counts + a lazy-deletion max-heap.
    * `pairCounts` holds the current weighted count of every adjacent token
    * pair; `occ` inverts pair → word indices containing it, so applying a
    * merge touches ONLY the affected words (subtract their old pair
    * contributions, greedy-fold, add the new ones). The heap gets a fresh
    * entry on every count change and entries are validated against
    * `pairCounts` on pop (stale ones discarded), giving O(log P) argmax
    * with the exact total order of the distributed path and the oracle:
    * count DESC, then (a, b) ASC — tokens are `[a-z0-9]+`-derived ASCII,
    * where Java string order ≡ UTF-8 binary order.
    */
  private[graft] def bpeTrainInMemory(
      vocab: Array[(String, Long)], rounds: Int,
      onRound: (Int, Long) => Unit): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val wc = vocab.map(_._2)
    val toks: Array[Array[String]] =
      vocab.map(_._1.toCharArray.map(_.toString))
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    val heap = new java.util.PriorityQueue[(String, String, Long)](
      11, new java.util.Comparator[(String, String, Long)] {
        def compare(x: (String, String, Long), y: (String, String, Long)): Int = {
          val c = java.lang.Long.compare(y._3, x._3) // count DESC
          if (c != 0) c
          else { val ca = x._1.compareTo(y._1); if (ca != 0) ca else x._2.compareTo(y._2) }
        }
      })
    def bump(p: (String, String), delta: Long): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + delta
      if (n <= 0L) { pairCounts.remove(p); () }
      else { pairCounts(p) = n; heap.add((p._1, p._2, n)); () }
    }
    def register(i: Int, sign: Long): Unit = {
      val ts = toks(i)
      var k = 0
      while (k < ts.length - 1) {
        val p = (ts(k), ts(k + 1))
        bump(p, sign * wc(i))
        if (sign > 0) { occ.getOrElseUpdate(p, mutable.Set.empty[Int]) += i; () }
        else occ.get(p).foreach { s => s -= i; if (s.isEmpty) { occ.remove(p); () } }
        k += 1
      }
    }
    var i = 0
    while (i < toks.length) { register(i, 1L); i += 1 }
    def foldOnce(ts: Array[String], a: String, b: String): Array[String] = {
      // same greedy left-to-right single-scan semantics as [[bpeFoldToks]]
      val buf = mutable.ArrayBuffer.empty[String]
      var k = 0
      while (k < ts.length) {
        if (buf.nonEmpty && buf.last == a && ts(k) == b) buf(buf.length - 1) = a + b
        else { buf += ts(k); () }
        k += 1
      }
      buf.toArray
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val t0 = System.nanoTime()
      var best: (String, String, Long) = null
      while (best == null && !heap.isEmpty) {
        val cand = heap.poll()
        if (pairCounts.get((cand._1, cand._2)).contains(cand._3)) best = cand
      }
      if (best == null) exhausted = true
      else {
        val (a, b, n) = best
        heap.add(best) // argmax is a peek: the count only changes via the folds below
        out += ((round, a, b, n))
        val affected = occ.get((a, b)).map(_.toArray).getOrElse(Array.empty[Int])
        var j = 0
        while (j < affected.length) {
          val w = affected(j)
          register(w, -1L)
          toks(w) = foldOnce(toks(w), a, b)
          register(w, 1L)
          j += 1
        }
        onRound(round, System.nanoTime() - t0)
        round += 1
      }
    }
    out.toSeq
  }

  /** Distributed per-round trainer for vocabularies too large to collect:
    * each round is one vocab-bounded pair aggregation (partial-agg'd, two
    * narrow columns) + one per-word fold, `localCheckpoint`ed so the next
    * round scans the MATERIALIZED tokenization instead of replaying the
    * fold lineage — per-round cost is flat in the round index and the
    * corpus is never rescanned (callers pass an already-persisted vocab).
    */
  private[graft] def bpeTrainDistributed(
      words: DataFrame, rounds: Int,
      onRound: (Int, Long) => Unit): Seq[(Int, String, String, Long)] = {
    var toks = words.withColumn("toks", expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val t0 = System.nanoTime()
      val best = toks.filter(size(col("toks")) >= 2)
        .select(col("wc"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> " +
            "named_struct('a', element_at(toks, i), 'b', element_at(toks, i + 1)))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        out += ((round, a, b, best.head.getLong(2)))
        val prev = toks
        toks = bpeFoldToks(toks, Seq((a, b))).localCheckpoint()
        prev.unpersist()
        onRound(round, System.nanoTime() - t0)
        round += 1
      }
    }
    toks.unpersist()
    out.toSeq
  }

  /** DuckDB replay of [[bpeTrain]] for an arbitrary round count: round r's
    * argmax CTE (m_r) counts adjacent token pairs over round r−1's
    * tokenization (r_{r-1}), and f_r replays the same greedy left-to-right
    * fold as a recursive CTE. Generated, not hand-unrolled, so the gate's
    * round count ([[BpeTrainGateRounds]]) can grow without transcription
    * errors; the last round needs only its argmax, not its fold.
    *
    * Every chained CTE is `AS MATERIALIZED`: DuckDB inlines (re-executes)
    * plain CTEs per reference, and r_{r-1} is referenced from both m_r and
    * f_r — with f_r's recursion re-evaluating its join input per iteration
    * that compounds ~10× PER ROUND (measured: 3 rounds 3 s, 5 rounds
    * 240 s without MATERIALIZED; 10 rounds 0.1 s with).
    */
  private[graft] def bpeTrainOracleSql(rounds: Int): String = {
    val head =
      """WITH RECURSIVE
        |w AS MATERIALIZED (
        |  SELECT w, count(*) AS wc
        |  FROM (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
        |        FROM documents)
        |  GROUP BY 1),
        |r0 AS MATERIALIZED (SELECT w, wc, regexp_extract_all(w, '.') AS toks FROM w)""".stripMargin
    val blocks = (1 to rounds).map { r =>
      val m =
        s""",
           |m$r AS MATERIALIZED (
           |  SELECT toks[i] AS a, toks[i + 1] AS b, CAST(SUM(wc) AS BIGINT) AS n
           |  FROM (SELECT wc, toks, unnest(generate_series(1, len(toks) - 1)) AS i
           |        FROM r${r - 1} WHERE len(toks) >= 2)
           |  GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1)""".stripMargin
      val f = if (r == rounds) "" else
        s""",
           |f$r AS (
           |  SELECT w, wc, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r${r - 1}
           |  UNION ALL
           |  SELECT f.w, f.wc, f.toks, f.i + 1,
           |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m$r.a AND f.toks[f.i] = m$r.b
           |              THEN f.acc[1:len(f.acc) - 1] || [m$r.a || m$r.b]
           |              ELSE f.acc || [f.toks[f.i]] END
           |  FROM f$r f, m$r WHERE f.i <= len(f.toks)),
           |r$r AS MATERIALIZED (SELECT w, wc, acc AS toks FROM f$r WHERE i = len(toks) + 1)""".stripMargin
      m + f
    }.mkString
    val tail = (1 to rounds).map { r =>
      if (r == 1) s"\nSELECT 1 AS rk, a, b, n FROM m1"
      else s"\nUNION ALL SELECT $r, a, b, n FROM m$r"
    }.mkString
    head + blocks + tail
  }

  val bpeTrainOracle: String = bpeTrainOracleSql(BpeTrainGateRounds)

  /** BPE TOKENIZE, corpus-wide — the second half of the
    * distinct-then-broadcast contract [[bpeApply]] sets up: the vocab
    * mapping (|vocab| rows, bounded at any corpus size) BROADCASTS back
    * onto the document token stream, so tokenizing 100 TB costs one
    * map-side join over the corpus words plus the vocab-sized apply —
    * the merge folds never run per occurrence. Emits per-document word
    * and BPE-token counts (the sequence-length accounting a training
    * pipeline's packing/budget stages consume).
    */
  def bpeTokens(s: SparkSession, d: String): DataFrame = {
    val vocab = bpeApply(s, d).select(col("w"), col("n_toks"))
    val docWords = Tables.documents(s, d).select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("w"))
    docWords.join(broadcast(vocab), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_bpe_tokens"))
  }

  val bpeTokensOracle: String =
    """WITH RECURSIVE
      |w AS (
      |  SELECT w, count(*) AS wc
      |  FROM (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
      |        FROM documents)
      |  GROUP BY 1),
      |p AS (
      |  SELECT substr(w, i, 2) AS pair, SUM(wc) AS n
      |  FROM (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM w WHERE len(w) >= 2)
      |  GROUP BY 1),
      |m AS (
      |  SELECT substr(pair, 1, 1) AS a, substr(pair, 2, 1) AS b,
      |         row_number() OVER (ORDER BY n DESC, pair) AS rk
      |  FROM (SELECT pair, n FROM p ORDER BY n DESC, pair LIMIT 5)),
      |r0 AS (SELECT w, regexp_extract_all(w, '.') AS toks FROM w),
      |f1 AS (
      |  SELECT w, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r0
      |  UNION ALL
      |  SELECT f.w, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f1 f JOIN m ON m.rk = 1 WHERE f.i <= len(f.toks)),
      |r1 AS (SELECT w, acc AS toks FROM f1 WHERE i = len(toks) + 1),
      |f2 AS (
      |  SELECT w, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r1
      |  UNION ALL
      |  SELECT f.w, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f2 f JOIN m ON m.rk = 2 WHERE f.i <= len(f.toks)),
      |r2 AS (SELECT w, acc AS toks FROM f2 WHERE i = len(toks) + 1),
      |f3 AS (
      |  SELECT w, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r2
      |  UNION ALL
      |  SELECT f.w, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f3 f JOIN m ON m.rk = 3 WHERE f.i <= len(f.toks)),
      |r3 AS (SELECT w, acc AS toks FROM f3 WHERE i = len(toks) + 1),
      |f4 AS (
      |  SELECT w, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r3
      |  UNION ALL
      |  SELECT f.w, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f4 f JOIN m ON m.rk = 4 WHERE f.i <= len(f.toks)),
      |r4 AS (SELECT w, acc AS toks FROM f4 WHERE i = len(toks) + 1),
      |f5 AS (
      |  SELECT w, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r4
      |  UNION ALL
      |  SELECT f.w, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f5 f JOIN m ON m.rk = 5 WHERE f.i <= len(f.toks)),
      |v AS (SELECT w, len(acc) AS n_toks FROM f5 WHERE i = len(toks) + 1),
      |dw AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
      |       FROM documents)
      |SELECT doc_id, COUNT(*) AS n_words,
      |       CAST(SUM(v.n_toks) AS BIGINT) AS n_bpe_tokens
      |FROM dw JOIN v USING (w)
      |GROUP BY doc_id""".stripMargin

  /** One greedy LEFT-TO-RIGHT fold per merge, applied in merge order,
    * over a `toks` array<string> column (see [[bpeApply]]): if the
    * accumulator's last token is `a` and the current is `b` they fuse to
    * `ab`, else the token appends — a fused token never re-merges with
    * the element that follows it in the same pass. Pairs come from the
    * `[a-z0-9]+` vocab regex, so literal splicing is quote-safe.
    */
  private[graft] def bpeFoldToks(
      df: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(df) { case (d, (a, b)) =>
      d.withColumn("toks", expr(
        s"""aggregate(toks, cast(array() as array<string>),
           |  (acc, t) -> CASE WHEN size(acc) > 0
           |                    AND try_element_at(acc, -1) = '$a' AND t = '$b'
           |              THEN concat(slice(acc, 1, size(acc) - 1), array('$a$b'))
           |              ELSE concat(acc, array(t)) END)""".stripMargin))
    }

  val bpeApplyOracle: String =
    """WITH RECURSIVE
      |w AS (
      |  SELECT w, count(*) AS wc
      |  FROM (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
      |        FROM documents)
      |  GROUP BY 1),
      |p AS (
      |  SELECT substr(w, i, 2) AS pair, SUM(wc) AS n
      |  FROM (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i
      |        FROM w WHERE len(w) >= 2)
      |  GROUP BY 1),
      |m AS (
      |  SELECT substr(pair, 1, 1) AS a, substr(pair, 2, 1) AS b,
      |         row_number() OVER (ORDER BY n DESC, pair) AS rk
      |  FROM (SELECT pair, n FROM p ORDER BY n DESC, pair LIMIT 5)),
      |r0 AS (SELECT w, wc, regexp_extract_all(w, '.') AS toks FROM w),
      |f1 AS (
      |  SELECT w, wc, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r0
      |  UNION ALL
      |  SELECT f.w, f.wc, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f1 f JOIN m ON m.rk = 1 WHERE f.i <= len(f.toks)),
      |r1 AS (SELECT w, wc, acc AS toks FROM f1 WHERE i = len(toks) + 1),
      |f2 AS (
      |  SELECT w, wc, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r1
      |  UNION ALL
      |  SELECT f.w, f.wc, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f2 f JOIN m ON m.rk = 2 WHERE f.i <= len(f.toks)),
      |r2 AS (SELECT w, wc, acc AS toks FROM f2 WHERE i = len(toks) + 1),
      |f3 AS (
      |  SELECT w, wc, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r2
      |  UNION ALL
      |  SELECT f.w, f.wc, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f3 f JOIN m ON m.rk = 3 WHERE f.i <= len(f.toks)),
      |r3 AS (SELECT w, wc, acc AS toks FROM f3 WHERE i = len(toks) + 1),
      |f4 AS (
      |  SELECT w, wc, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r3
      |  UNION ALL
      |  SELECT f.w, f.wc, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f4 f JOIN m ON m.rk = 4 WHERE f.i <= len(f.toks)),
      |r4 AS (SELECT w, wc, acc AS toks FROM f4 WHERE i = len(toks) + 1),
      |f5 AS (
      |  SELECT w, wc, toks, 1 AS i, CAST([] AS VARCHAR[]) AS acc FROM r4
      |  UNION ALL
      |  SELECT f.w, f.wc, f.toks, f.i + 1,
      |         CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a AND f.toks[f.i] = m.b
      |              THEN f.acc[1:len(f.acc) - 1] || [m.a || m.b]
      |              ELSE f.acc || [f.toks[f.i]] END
      |  FROM f5 f JOIN m ON m.rk = 5 WHERE f.i <= len(f.toks)),
      |r5 AS (SELECT w, wc, acc AS toks FROM f5 WHERE i = len(toks) + 1)
      |SELECT w, wc, array_to_string(toks, ' ') AS toks_str,
      |       len(toks) AS n_toks
      |FROM r5""".stripMargin

  val bpeMergesOracle: String =
    """WITH w AS (SELECT w, count(*) AS wc FROM (
      |             SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w
      |             FROM documents)
      |           GROUP BY 1),
      |p AS (SELECT substr(w, i, 2) AS pair, wc
      |      FROM (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i
      |            FROM w WHERE len(w) >= 2))
      |SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
      |FROM p GROUP BY 1
      |ORDER BY n DESC, pair
      |LIMIT 10""".stripMargin

  val defs: Map[String, QueryFn] = Map(
    "x_bpe_merges" -> (bpeMerges _),
    "x_bpe_apply" -> (bpeApply _),
    "x_bpe_tokens" -> (bpeTokens _),
    "x_bpe_train" -> (bpeTrain _),
    "x_bigram_lm" -> (bigramLm _),
    "x_chunk_docs" -> (chunkDocs _),
    "x_pack_sequences" -> (packSequences _),
    "x_quality_model" -> (qualityModel _),
    "x_line_dedup" -> (lineDedup _),
    "x_paragraph_dedup" -> (paragraphDedup _),
    "x_length_trim" -> (lengthTrim _),
    "x_token_budget" -> (tokenBudget _),
    "x_data_split" -> (dataSplit _),
    "x_bm25_search" -> (bm25Search _),
    "x_text_repetition" -> (repetitionSignals _),
    "x_text_vocab" -> (vocabCoverage _),
    "x_sample_stratified" -> (sampleStratified _),
    "x_mix_sources" -> (mixSources _),
    "x_alloc_largest_remainder" -> (allocLargestRemainder _),
    "x_text_scrub" -> (piiScrub _),
    "x_text_tfidf" -> (tfidfTop _),
    "x_text_tokens" -> (tokenStats _),
    "x_text_quality" -> (qualityScore _),
    "x_text_langid" -> (langId _),
    "x_text_fingerprint" -> (fingerprint _),
    "x_text_rollhash" -> (rollingHash _),
    "x_importance_select" -> (importanceSelect _),
    "x_text_profile" -> (corpusProfile _))

  val oracles: Map[String, String] = Map(
    "x_bpe_merges" -> bpeMergesOracle,
    "x_bpe_apply" -> bpeApplyOracle,
    "x_bpe_tokens" -> bpeTokensOracle,
    "x_bpe_train" -> bpeTrainOracle,
    "x_bigram_lm" -> bigramLmOracle,
    "x_chunk_docs" -> chunkDocsOracle,
    "x_pack_sequences" -> packSequencesOracle,
    "x_quality_model" -> qualityModelOracle,
    "x_line_dedup" -> lineDedupOracle,
    "x_paragraph_dedup" -> paragraphDedupOracle,
    "x_length_trim" -> lengthTrimOracle,
    "x_token_budget" -> tokenBudgetOracle,
    "x_data_split" -> dataSplitOracle,
    "x_bm25_search" -> bm25SearchOracle,
    "x_text_repetition" -> repetitionSignalsOracle,
    "x_text_vocab" -> vocabCoverageOracle,
    "x_sample_stratified" -> sampleStratifiedOracle,
    "x_mix_sources" -> mixSourcesOracle,
    "x_alloc_largest_remainder" -> allocLargestRemainderOracle,
    "x_text_scrub" -> piiScrubOracle,
    "x_text_tfidf" -> tfidfTopOracle,
    "x_text_tokens" -> tokenStatsOracle,
    "x_text_quality" -> qualityScoreOracle,
    "x_text_langid" -> langIdOracle,
    "x_text_fingerprint" -> fingerprintOracle,
    "x_text_rollhash" -> rollingHashOracle,
    "x_importance_select" -> importanceSelectOracle,
    "x_text_profile" -> corpusProfileOracle)
}
