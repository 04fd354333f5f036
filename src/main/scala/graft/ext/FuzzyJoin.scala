package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.QueryFn

/** Edit-distance (fuzzy) join — entity resolution over string keys, the
  * "same customer, one typo apart" operator every ingestion pipeline needs
  * and Spark has no native form of (reference analogue: the dimension
  * lookups of sync_to_mysql.py:146-152 assume exact keys; real feeds
  * don't).
  *
  * Scale design — deletion-neighborhood blocking (the FastSS/SymSpell
  * scheme), composed entirely from codegen-friendly built-ins:
  *
  *  1. Every string emits its deletion neighborhood up to depth `maxDist`
  *     (the string plus every variant with ≤ maxDist characters removed)
  *     — O(len^maxDist) short keys per row, independent of corpus size.
  *  2. Two strings within Levenshtein distance d share at least one
  *     neighborhood element (delete the edited positions from both), so
  *     an equi-join on the neighborhood key produces a candidate superset
  *     — ONE shuffle on short string keys, never an all-pairs comparison.
  *  3. Candidates dedup (a pair can share several keys) and verify with
  *     the exact `levenshtein` built-in; sharing a key is necessary, not
  *     sufficient ("ab"/"ba" share "b" at distance 2), so the verify
  *     stage makes blocking invisible in results — same
  *     candidates-then-verify contract as the MinHash-LSH path, and the
  *     DuckDB oracle proves it by computing the true pair set all-pairs.
  *
  * Skew: a neighborhood key of length L-1 can only be produced by the
  * ≤ L·|alphabet| distinct strings one insertion away (plus itself), and
  * the exact-duplicate pre-collapse in [[edSelfJoin]] makes "distinct"
  * the operative word — bucket sizes are bounded by string length ×
  * alphabet, not by data volume or duplication: no hot key exists by
  * construction, at any corpus size.
  */
object FuzzyJoin {

  /** Deletion neighborhood of `s` up to `maxDist` codepoint removals, the
    * string itself included, duplicates removed — a native codegen'd
    * kernel ([[org.apache.spark.sql.graft.DeletionNeighborhood]]): the
    * equivalent `transform`/`sequence`/`substr`/`array_union` HOF chain is
    * interpreted per row and measured ~5× slower end-to-end on the gate.
    */
  private[ext] def neighborhood(s: Column, maxDist: Int): Column =
    org.apache.spark.sql.graft.TextExpressions.deletionNeighborhood(s, maxDist)

  /** The shared candidate pipeline all three operators build on:
    * DISTINCT strings of each side → deletion-neighborhood keys →
    * ONE equi-join on the keys → banded capped-distance verify →
    * one row per qualifying unordered string pair: (`lCol`, `rCol`,
    * dist). The verify runs before the distinct, so only true pairs
    * reach an exchange.
    */
  private def verifiedStringPairs(
      lStrs: DataFrame, lCol: String, rStrs: DataFrame, rCol: String,
      maxDist: Int, filter: Column = lit(true),
      metric: (Column, Column, Int) => Column =
        org.apache.spark.sql.graft.TextExpressions.editDistanceCapped): DataFrame = {
    val lKeys = lStrs.select(col(lCol)).distinct()
      .withColumn("_k", explode(neighborhood(col(lCol), maxDist)))
    val rKeys = rStrs.select(col(rCol)).distinct()
      .withColumn("_k", explode(neighborhood(col(rCol), maxDist)))
    lKeys.join(rKeys, Seq("_k"))
      .filter(filter)
      .withColumn("dist", metric(col(lCol), col(rCol), maxDist))
      .filter(col("dist") <= maxDist)
      .select(lCol, rCol, "dist").distinct()
  }

  /** Self-join `names` on Levenshtein distance ≤ `maxDist` between
    * `strCol` values: (id_a, id_b, dist) with id_a < id_b. Exactly the
    * all-pairs answer, computed without the all-pairs scan.
    *
    * Exact-duplicate pre-collapse (the same prefix as
    * [[Dedup.minhashLsh]]): blocking, candidate join, and verify all run
    * over DISTINCT strings — duplicated keys (10× replicas, boilerplate
    * names) multiply only the two cheap expansion joins at the end, whose
    * size is the true output's, never the quadratic candidate work.
    * Measured on a 10× corpus of verbatim-replicated names: 9.2× → ~2×
    * runtime for 10× input. The verify filter runs BEFORE the pair
    * dedup (only true string pairs reach an exchange) and uses the
    * banded O(len·maxDist) capped-distance kernel
    * ([[org.apache.spark.sql.graft.EditDistanceCapped]]), exact wherever
    * ≤ maxDist — the full O(len²) `levenshtein` DP on every candidate
    * was the measured hot spot, ~2.5× the rest of the gate combined.
    */
  def edSelfJoin(
      names: DataFrame, idCol: String, strCol: String,
      maxDist: Int,
      metric: (Column, Column, Int) => Column =
        org.apache.spark.sql.graft.TextExpressions.editDistanceCapped): DataFrame = {
    val rows = names.select(col(idCol).as("_id"), col(strCol).as("_s"))
    // distinct-string pairs, ONE orientation per unordered pair by string
    // order (the strings of a candidate pair always differ, so s_a < s_b
    // is a total tie-break and dist ≥ 1 holds)
    val a = rows.select(col("_s").as("s_a"))
    val b = rows.select(col("_s").as("s_b"))
    val strPairs = verifiedStringPairs(a, "s_a", b, "s_b", maxDist,
      filter = col("s_a") < col("s_b"), metric = metric)
    // expand each qualifying string pair to all member id pairs
    val memA = rows.select(col("_id").as("id_x"), col("_s").as("s_a"))
    val memB = rows.select(col("_id").as("id_y"), col("_s").as("s_b"))
    val cross = strPairs.join(memA, Seq("s_a")).join(memB, Seq("s_b"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"), col("dist"))
    // identical-string pairs are distance 0 by definition — no verify
    val l = rows.select(col("_id").as("id_a"), col("_s"))
    val r = rows.select(col("_id").as("id_b"), col("_s"))
    val dup = l.join(r, Seq("_s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("dist"))
    cross.unionByName(dup)
  }

  /** Two-relation fuzzy lookup: every (leftId, rightId, dist) with
    * Levenshtein(leftStr, rightStr) ≤ `maxDist` — the A-to-B entity
    * resolution shape (dirty feed keys against a clean dimension). Same
    * construction as [[edSelfJoin]]: each side's DISTINCT strings emit
    * deletion-neighborhood keys, candidates come from the one equi-join
    * on keys, the banded kernel verifies, and two output-sized joins
    * expand back to members. Equal strings surface as dist 0.
    */
  def edJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int): DataFrame = {
    val lRows = left.select(col(leftId).as("_lid"), col(leftStr).as("_ls"))
    val rRows = right.select(col(rightId).as("_rid"), col(rightStr).as("_rs"))
    val strPairs = verifiedStringPairs(lRows, "_ls", rRows, "_rs", maxDist)
    strPairs.join(lRows, Seq("_ls")).join(rRows, Seq("_rs"))
      .select(col("_lid").as("left_id"), col("_rid").as("right_id"), col("dist"))
  }

  /** Gate: near-identical customer names (one edit apart) — the zero-padded
    * synthetic names make every single-digit substitution a planted match,
    * so the true pair set is dense enough to exercise candidate dedup and
    * the verify stage's false-candidate rejection.
    */
  def fuzzyCustomerPairs(s: SparkSession, d: String): DataFrame =
    edSelfJoin(
      Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
      "c_custkey", "c_name", maxDist = 1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))

  val fuzzyCustomerPairsOracle: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  /** Resolve every left row to its BEST right match within `maxDist`:
    * (left_id, n_matches, best_dist, best_right_id) — n_matches counts
    * all qualifying right MEMBERS, best = smallest distance with ties
    * broken by smallest right id. Unlike [[edJoin]] (whose output is the
    * full pair set and therefore grows with duplication²), everything
    * here aggregates at the DISTINCT-STRING level before any member
    * expansion — member counts and min-ids fold into the string pairs,
    * so intermediates and output stay linear in the inputs no matter how
    * duplicated either side is. (First cut expanded pairs then
    * aggregated: 43× runtime at 10× corpus, purely from the quadratic
    * pair materialization this formulation removes.)
    */
  def edLookupBest(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int): DataFrame = {
    val lRows = left.select(col(leftId).as("_lid"), col(leftStr).as("_ls"))
    val rRows = right.select(col(rightId).as("_rid"), col(rightStr).as("_rs"))
    val strPairs = verifiedStringPairs(lRows, "_ls", rRows, "_rs", maxDist)
    val rStats = rRows.groupBy(col("_rs"))
      .agg(count(lit(1)).as("_rn"), min(col("_rid")).as("_rmin"))
    val strAgg = strPairs.join(rStats, Seq("_rs"))
      .groupBy(col("_ls"))
      .agg(
        sum(col("_rn")).as("n_matches"),
        min(col("dist")).cast("long").as("best_dist"),
        min(struct(col("dist").as("d"), col("_rmin").as("id"))).as("_best"))
    lRows.join(strAgg, Seq("_ls"))
      .select(col("_lid").as("left_id"), col("n_matches"),
        col("best_dist"), col("_best.id").as("best_right_id"))
  }

  /** Gate: dirty-key lookup — part names with their first character
    * dropped (a deterministic in-query corruption) resolved back against
    * the clean part dimension at distance ≤ 1, each query reduced to its
    * best match + candidate count. Part names are HEAVILY duplicated (64
    * distinct among 2000×sf rows), so this exercises the string-level
    * aggregation path hard: all candidate work runs on 64 strings and no
    * member-level pair set is ever materialized.
    */
  def fuzzyPartLookup(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
    val dirty = parts.select(col("p_partkey").as("query_id"),
      expr("substring(p_name, 2)").as("q"))
    edLookupBest(dirty, "query_id", "q", parts, "p_partkey", "p_name", maxDist = 1)
      .select(col("left_id").as("query_id"), col("n_matches"),
        col("best_dist"), col("best_right_id").as("best_part_id"))
  }

  val fuzzyPartLookupOracle: String =
    """WITH q AS (SELECT p_partkey AS query_id, substr(p_name, 2) AS qs FROM part),
      |m AS (SELECT q.query_id, p.p_partkey AS part_id,
      |             levenshtein(q.qs, p.p_name) AS dist
      |      FROM q JOIN part p ON levenshtein(q.qs, p.p_name) <= 1),
      |agg AS (SELECT query_id, COUNT(*) AS n_matches, MIN(dist) AS best_dist
      |        FROM m GROUP BY 1),
      |best AS (SELECT m.query_id, MIN(m.part_id) AS best_part_id
      |         FROM m JOIN agg USING (query_id)
      |         WHERE m.dist = agg.best_dist GROUP BY 1)
      |SELECT agg.query_id, agg.n_matches,
      |       CAST(agg.best_dist AS BIGINT) AS best_dist, best.best_part_id
      |FROM agg JOIN best USING (query_id)""".stripMargin

  /** Gate: Jaro-Winkler rerank of the fuzzy pair set — the two-stage
    * shape real entity resolution uses (cheap bounded-edit-distance
    * blocking, then a finer similarity to rank candidates). Every score
    * comes from the native [[org.apache.spark.sql.graft.JaroWinkler]]
    * kernel, which reproduces DuckDB's `jaro_winkler_similarity` variant
    * bit-for-bit (byte-level Jaro, 0.7 boost threshold, prefix cap 4,
    * same FP evaluation order — fuzz-verified on 5 000 pairs), so the
    * DOUBLE scores and the rank order they induce hash-match the oracle
    * with no rounding contract. Per-id rank ties break on id_b.
    */
  def fuzzyJwRerank(s: SparkSession, d: String): DataFrame = {
    val names = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    val pairs = edSelfJoin(names, "c_custkey", "c_name", maxDist = 1)
    val nA = names.select(col("c_custkey").as("id_a"), col("c_name").as("n_a"))
    val nB = names.select(col("c_custkey").as("id_b"), col("c_name").as("n_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("jw").desc, col("id_b"))
    pairs.join(nA, Seq("id_a")).join(nB, Seq("id_b"))
      .withColumn("jw", org.apache.spark.sql.graft.TextExpressions
        .jaroWinkler(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"),
        col("jw"), row_number().over(w).cast("long").as("rk"))
  }

  val fuzzyJwRerankOracle: String =
    """WITH pairs AS (
      |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |         CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist,
      |         jaro_winkler_similarity(a.c_name, b.c_name) AS jw
      |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |  WHERE levenshtein(a.c_name, b.c_name) <= 1)
      |SELECT id_a, id_b, dist, jw,
      |       row_number() OVER (PARTITION BY id_a ORDER BY jw DESC, id_b) AS rk
      |FROM pairs""".stripMargin

  /** Gate: the same customer pair set under OSA (restricted
    * Damerau-Levenshtein) at distance ≤ 1 — adjacent transpositions count
    * as ONE edit, so digit-swap typos ("…012"/"…021", two edits to plain
    * Levenshtein) now pair. The deletion-neighborhood blocking stays
    * lossless: a transposition pair shares the key obtained by deleting
    * either transposed character from both strings. At cap 1, OSA equals
    * full Damerau-Levenshtein (their divergence needs ≥ 2 ops), which is
    * what makes the gate hash-comparable against DuckDB's
    * `damerau_levenshtein`.
    */
  def fuzzyCustomerPairsOsa(s: SparkSession, d: String): DataFrame =
    edSelfJoin(
      Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
      "c_custkey", "c_name", maxDist = 1,
      metric = org.apache.spark.sql.graft.TextExpressions.osaDistanceCapped)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))

  val fuzzyCustomerPairsOsaOracle: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |       CAST(damerau_levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE damerau_levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  /** Record-level entity resolution: id pairs whose records are within
    * edit distance `maxDist` on ANY of `blockFields` — the union of one
    * [[edSelfJoin]] PER FIELD (so every field's candidate work runs at
    * that field's DISTINCT-VALUE granularity with the measured skew
    * bounds: a record-level posting join would instead pay bucket² in the
    * multiplicity of popular field values — segments, area codes — which
    * is exactly the quadratic blowup the per-field pre-collapse removes),
    * deduped at the id-pair level, with BOTH records' block fields
    * attached (`a_`/`b_` prefixes) for downstream scoring. Union blocking
    * is lossless for the "any field near" predicate: a qualifying pair is
    * produced in full by its qualifying field's channel.
    *
    * Scale: intermediates are linear in the per-field TRUE pair sets; the
    * OUTPUT necessarily contains every same-value record pair per field
    * (that is the predicate), so like [[edJoin]] it grows with value
    * multiplicity² — pipelines that only need resolution, not the pair
    * set, should aggregate at value level first ([[edLookupBest]] shape).
    */
  def recordLinkPairs(
      records: DataFrame, idCol: String, blockFields: Seq[String],
      maxDist: Int): DataFrame = {
    val idPairs = blockFields.map(f =>
      edSelfJoin(records, idCol, f, maxDist).select(col("id_a"), col("id_b")))
      .reduce(_.unionByName(_))
      .distinct()
    val a = records.select(
      (col(idCol).as("id_a") +: blockFields.map(f => col(f).as(s"a_$f"))): _*)
    val b = records.select(
      (col(idCol).as("id_b") +: blockFields.map(f => col(f).as(s"b_$f"))): _*)
    idPairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
  }

  /** Gate: weighted multi-field customer linkage — the record-matching
    * shape real ER uses (the reference's dim lookups assume exact keys;
    * sync_to_mysql.py:146-152): block on name OR a secondary string
    * attribute within one edit, then score each surviving pair with fixed
    * field weights — a 0/1 near-name agreement (weight 4), the CONTINUOUS
    * Jaro-Winkler similarity of the secondary field (weight 2; the native
    * kernel is bit-identical to DuckDB's variant, so the double scores
    * hash-match with no rounding contract), and exact nation agreement
    * (weight 1). The secondary field (`code` = mktsegment + 7-digit
    * account code — wide enough that code values stay ~distinct per
    * customer at ANY corpus size, so the true pair set grows linearly in
    * N; the first cut used a 3-digit code whose 5000-value space
    * saturates, making same-value groups grow with N and the output
    * quadratic — 33x runtime at 10x rows in the sf1 measurement,
    * SCALE.md §round 10) is synthesized IN-QUERY from deterministic arithmetic
    * — the same planted-attribute trick as `x_fuzzy_lookup` — so the
    * oracle rebuilds it and recomputes the identical weighted score
    * ALL-PAIRS, proving the union blocking lost nothing. The fixed
    * left-to-right float evaluation order makes `score` engine-exact.
    */
  def fuzzyRecordLink(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      concat(col("c_mktsegment"), lit("#"),
        lpad((col("c_custkey") % 10000000).cast("string"), 7, "0")).as("code"),
      col("c_nationkey").as("nat"))
    // nation is a SCORING field, not a blocking field (exact agreement on
    // a 25-value attribute blocks nothing) — attach it to both sides of
    // the blocked pairs
    val natA = c.select(col("id").as("id_a"), col("nat").as("a_nat"))
    val natB = c.select(col("id").as("id_b"), col("nat").as("b_nat"))
    recordLinkPairs(c, "id", Seq("name", "code"), maxDist = 1)
      .join(natA, Seq("id_a")).join(natB, Seq("id_b"))
      .withColumn("name_match",
        (org.apache.spark.sql.graft.TextExpressions
          .editDistanceCapped(col("a_name"), col("b_name"), 1) <= 1).cast("int"))
      .withColumn("jw_code", org.apache.spark.sql.graft.TextExpressions
        .jaroWinkler(col("a_code"), col("b_code")))
      .withColumn("same_nation", (col("a_nat") === col("b_nat")).cast("int"))
      .withColumn("score",
        lit(4.0) * col("name_match") + lit(2.0) * col("jw_code")
          + lit(1.0) * col("same_nation"))
      .select(col("id_a"), col("id_b"), col("name_match"), col("jw_code"),
        col("same_nation"), col("score"))
  }

  val fuzzyRecordLinkOracle: String =
    """WITH c AS (SELECT c_custkey, c_name,
      |                  c_mktsegment || '#' ||
      |                    lpad(CAST(c_custkey % 10000000 AS VARCHAR), 7, '0') AS code,
      |                  c_nationkey
      |           FROM customer)
      |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |       CAST(CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
      |                 THEN 1 ELSE 0 END AS INT) AS name_match,
      |       jaro_winkler_similarity(a.code, b.code) AS jw_code,
      |       CAST(CASE WHEN a.c_nationkey = b.c_nationkey
      |                 THEN 1 ELSE 0 END AS INT) AS same_nation,
      |       4.0 * (CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
      |              THEN 1 ELSE 0 END)
      |         + 2.0 * jaro_winkler_similarity(a.code, b.code)
      |         + 1.0 * (CASE WHEN a.c_nationkey = b.c_nationkey
      |                  THEN 1 ELSE 0 END) AS score
      |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |   OR levenshtein(a.code, b.code) <= 1""".stripMargin

  /** Gate: record RESOLUTION — the production consumption of
    * [[fuzzyRecordLink]]'s pair set: every record reduced to its single
    * best-scoring counterpart (ties → lowest id) plus its candidate
    * count. Output is one row per linked record — LINEAR — and the only
    * intermediate is the already-blocked pair set, so this is the shape
    * pipelines should end with when they need resolution rather than the
    * full pair graph (the [[edLookupBest]] lesson applied to records).
    * The argmax is a `max_by` aggregate over a mirrored pair view, not a
    * window over raw records: partial aggregation folds map-side.
    */
  def fuzzyRecordResolve(s: SparkSession, d: String): DataFrame = {
    val p = fuzzyRecordLink(s, d)
    val both = p.select(col("id_a").as("id"), col("id_b").as("other"), col("score"))
      .unionByName(
        p.select(col("id_b").as("id"), col("id_a").as("other"), col("score")))
    both.groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(col("score")).as("best_score"),
        max_by(col("other"), struct(col("score"), -col("other"))).as("best_match"))
  }

  val fuzzyRecordResolveOracle: String =
    """WITH c AS (SELECT c_custkey, c_name,
      |                  c_mktsegment || '#' ||
      |                    lpad(CAST(c_custkey % 10000000 AS VARCHAR), 7, '0') AS code,
      |                  c_nationkey
      |           FROM customer),
      |pairs AS (
      |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |         4.0 * (CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
      |                THEN 1 ELSE 0 END)
      |           + 2.0 * jaro_winkler_similarity(a.code, b.code)
      |           + 1.0 * (CASE WHEN a.c_nationkey = b.c_nationkey
      |                    THEN 1 ELSE 0 END) AS score
      |  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
      |  WHERE levenshtein(a.c_name, b.c_name) <= 1
      |     OR levenshtein(a.code, b.code) <= 1),
      |mirrored AS (
      |  SELECT id_a AS id, id_b AS other, score FROM pairs
      |  UNION ALL
      |  SELECT id_b AS id, id_a AS other, score FROM pairs),
      |best AS (
      |  SELECT id, other FROM mirrored
      |  QUALIFY row_number() OVER (PARTITION BY id
      |                             ORDER BY score DESC, other) = 1),
      |agg AS (SELECT id, COUNT(*) AS n_candidates, MAX(score) AS best_score
      |        FROM mirrored GROUP BY 1)
      |SELECT agg.id, agg.n_candidates, agg.best_score,
      |       best.other AS best_match
      |FROM agg JOIN best USING (id)""".stripMargin

  /** Gate: ENTITY CANONICALIZATION — the full ER pipeline end to end:
    * blocked multi-field linkage ([[fuzzyRecordLink]]) → strong-match
    * edges (score ≥ 5.0: near-name AND same nation at minimum) →
    * connected components via the star algorithm ([[Dedup.ccStar]], the
    * diameter-robust choice precisely because ER link graphs chain) →
    * every record stamped with its component-min canonical entity id;
    * records with no strong match are their own entity. The oracle
    * recomputes the same edges all-pairs and closes them with a recursive
    * CTE — hash-matching proves blocking, scoring, thresholding, and the
    * O(log n) clustering compose losslessly.
    */
  def entityIds(s: SparkSession, d: String): DataFrame = {
    val edges = fuzzyRecordLink(s, d)
      .filter(col("score") >= 5.0)
      .select(col("id_a"), col("id_b"))
    val clustered = Dedup.ccStar(edges, "id_a", "id_b")
      .select(col("id"), col("cluster"))
    Tables.customer(s, d).select(col("c_custkey").as("id"))
      .join(clustered, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("entity_id"))
  }

  val entityIdsOracle: String =
    """WITH RECURSIVE c AS (
      |  SELECT c_custkey, c_name,
      |         c_mktsegment || '#' ||
      |           lpad(CAST(c_custkey % 10000000 AS VARCHAR), 7, '0') AS code,
      |         c_nationkey
      |  FROM customer),
      |pairs AS (
      |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      |  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
      |  WHERE (levenshtein(a.c_name, b.c_name) <= 1
      |         OR levenshtein(a.code, b.code) <= 1)
      |    AND 4.0 * (CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
      |               THEN 1 ELSE 0 END)
      |          + 2.0 * jaro_winkler_similarity(a.code, b.code)
      |          + 1.0 * (CASE WHEN a.c_nationkey = b.c_nationkey
      |                   THEN 1 ELSE 0 END) >= 5.0),
      |edges AS (SELECT id_a, id_b FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |verts AS (SELECT DISTINCT id_a AS id FROM edges),
      |reach AS (
      |  SELECT id, id AS r FROM verts
      |  UNION
      |  SELECT e.id_a AS id, reach.r
      |  FROM reach JOIN edges e ON e.id_b = reach.id),
      |lab AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY 1)
      |SELECT cu.c_custkey AS id,
      |       COALESCE(lab.cluster, cu.c_custkey) AS entity_id
      |FROM customer cu LEFT JOIN lab ON lab.id = cu.c_custkey""".stripMargin

  val defs: Map[String, QueryFn] = Map(
    "x_fuzzy_join" -> (fuzzyCustomerPairs _),
    "x_fuzzy_lookup" -> (fuzzyPartLookup _),
    "x_fuzzy_jw_rerank" -> (fuzzyJwRerank _),
    "x_fuzzy_osa" -> (fuzzyCustomerPairsOsa _),
    "x_fuzzy_record_link" -> (fuzzyRecordLink _),
    "x_fuzzy_record_resolve" -> (fuzzyRecordResolve _),
    "x_entity_ids" -> (entityIds _))

  val oracles: Map[String, String] = Map(
    "x_fuzzy_join" -> fuzzyCustomerPairsOracle,
    "x_fuzzy_lookup" -> fuzzyPartLookupOracle,
    "x_fuzzy_jw_rerank" -> fuzzyJwRerankOracle,
    "x_fuzzy_osa" -> fuzzyCustomerPairsOsaOracle,
    "x_fuzzy_record_link" -> fuzzyRecordLinkOracle,
    "x_fuzzy_record_resolve" -> fuzzyRecordResolveOracle,
    "x_entity_ids" -> entityIdsOracle)
}
