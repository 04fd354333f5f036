package graft.governance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release — the rung above the
  * k-anonymity / l-diversity audits (`c21`/`c22`) on the governance
  * ladder. The reference publishes an anonymized transaction feed as a
  * first-class product (data_lake_config.py:63-70); DP is what makes such
  * a release carry a QUANTIFIED privacy guarantee instead of a heuristic
  * one: each released aggregate perturbs the truth with Laplace noise
  * scaled to `sensitivity / epsilon`, and a per-dataset accountant caps
  * the total epsilon any sequence of releases may spend.
  *
  * Mechanism: Laplace inverse-CDF over a SEEDED uniform — the seed is an
  * md5 of (releaseId, group key), so a given release is a deterministic
  * function of its id. That determinism keeps the mechanism expressible
  * in portable SQL (the DuckDB oracle replays it formula-for-formula),
  * makes re-publication idempotent, and makes results reproducible for
  * audit — but it also means the noise is PUBLIC: anyone who knows the
  * releaseId and group key (both typically published with the release)
  * can recompute the exact noise and subtract it, recovering the true
  * aggregate. THE SHIPPED DEFAULT THEREFORE CARRIES NO DIFFERENTIAL
  * PRIVACY GUARANTEE, and the epsilon accountant below quantifies a
  * budget that is only meaningful once [[seededUniform]] is replaced by
  * a CSPRNG draw (sensitivity bounds, budget accounting, and
  * post-processing are unchanged by that swap). The API makes this
  * explicit: the noise primitive is named [[seededLaplace]] and every
  * release method requires `insecureDeterministicNoise = true` to be
  * passed — a deployment cannot reach the seeded path by accident.
  *
  * Scale shape: noise is a per-GROUP scalar expression appended after the
  * aggregation — cost is O(groups), the corpus-side plan is exactly the
  * underlying groupBy (partial aggregation, one shuffle on the keys), and
  * nothing collects to the driver.
  *
  * Float discipline: the noise value is quantized to a 1e-6 grid with
  * `floor(x * 1e6 + 0.5) / 1e6` — post-processing (DP survives any
  * data-independent transform), and it makes the released double
  * engine-exact: both engines floor the same product, so a last-ulp
  * disagreement in `ln` between the JVM and libm cannot surface in the
  * output. True aggregates ride decimal before the noise add (the
  * repo-wide order-independent-sum rule).
  */
object DifferentialPrivacy {

  private val TwoPow52 = 4503599627370496.0

  /** Deterministic (hence NON-PRIVATE — see object doc) uniform in
    * (−0.5, 0.5) from (releaseId, key): the top 52 bits of
    * md5("releaseId:key") as an integer h, mapped by
    * (h + 0.5) / 2^52 − 0.5. 52 bits fit a double's 53-bit mantissa
    * EXACTLY (h ≤ 2^52 − 1, so h + 0.5 is exactly representable and the
    * power-of-two division is exact), which guarantees |u| < 0.5 after
    * rounding — with more bits, an h within rounding distance of the
    * modulus would collapse to u = ±0.5 and send the inverse CDF's log
    * to −∞ (NULL in Spark, −inf in DuckDB: an engine divergence).
    */
  def seededUniform(releaseId: String, key: Column): Column = {
    val h = conv(substring(md5(concat(lit(releaseId + ":"), key)), 1, 13), 16, 10)
      .cast("double")
    (h + lit(0.5)) / lit(TwoPow52) - lit(0.5)
  }

  /** SEEDED Laplace(b = sensitivity / epsilon) noise via the inverse CDF
    * −b·sgn(u)·ln(1 − 2|u|), quantized to the 1e-6 grid (see object doc).
    * Deterministic in (releaseId, key) and therefore recomputable by any
    * reader — suitable for oracle-verified gates and reproducibility
    * audits, NOT for an actual privacy guarantee. Swap the underlying
    * [[seededUniform]] for a CSPRNG draw to make epsilon meaningful.
    */
  def seededLaplace(
      releaseId: String, key: Column, sensitivity: Double, epsilon: Double): Column = {
    require(sensitivity > 0, s"sensitivity must be positive, got $sensitivity")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val b = sensitivity / epsilon
    val u = seededUniform(releaseId, key)
    val raw = -lit(b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    floor(raw * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
  }

  // ---- epsilon accounting -------------------------------------------------

  private val budgets = new java.util.concurrent.ConcurrentHashMap[String, Double]()
  private val ledger =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Double]]()
  @volatile private var ledgerPath: Option[java.nio.file.Path] = None

  /** Durable accounting: back the in-memory budgets/ledger with a JSON
    * sidecar (same pattern as the lake's schema-contract files), so a
    * process restart does not forget epsilon already spent — without
    * persistence, repeated releases under fresh releaseIds across
    * restarts could exceed the declared lifetime budget. Loading MERGES
    * the file's spend into memory (file wins on conflicts: it is the
    * durable record); every subsequent setBudget/charge writes through.
    */
  def persistTo(path: java.nio.file.Path): Unit = ledger.synchronized {
    ledgerPath = Some(path)
    if (java.nio.file.Files.exists(path)) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(path))
      val b = root.get("budgets")
      if (b != null) b.fields().forEachRemaining { e =>
        budgets.put(e.getKey, e.getValue.asDouble()); ()
      }
      val l = root.get("ledger")
      if (l != null) l.fields().forEachRemaining { e =>
        val m = scala.collection.mutable.Map.empty[String, Double]
        e.getValue.fields().forEachRemaining(r => m(r.getKey) = r.getValue.asDouble())
        ledger.put(e.getKey, ledger.getOrDefault(e.getKey, Map.empty) ++ m.toMap); ()
      }
    }
  }

  /** Detach the durable sidecar (test hook; in-memory state is kept). */
  private[graft] def stopPersisting(): Unit = ledger.synchronized {
    ledgerPath = None
  }

  /** Write the full accounting state through to the sidecar, atomically
    * (temp file + move) so a crash mid-write cannot truncate the record.
    * Call sites hold the ledger lock, so writes are serialized.
    */
  private def flushLedger(): Unit = ledgerPath.foreach { p =>
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val b = root.putObject("budgets")
    budgets.forEach((k, v) => { b.put(k, v.doubleValue()); () })
    val l = root.putObject("ledger")
    ledger.forEach((k, m) => {
      val n = l.putObject(k); m.foreach { case (r, e) => n.put(r, e) }; ()
    })
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(tmp, om.writeValueAsBytes(root))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE); ()
  }

  /** Declare (or re-declare, idempotently) `dataset`'s total epsilon
    * budget. Tightening below what is already spent is refused — a budget
    * is a promise to the data subjects, not a dial.
    */
  def setBudget(dataset: String, epsilonTotal: Double): Unit = {
    require(epsilonTotal > 0, s"budget must be positive, got $epsilonTotal")
    ledger.synchronized {
      require(spent(dataset) <= epsilonTotal + 1e-12,
        s"dataset '$dataset' has already spent ${spent(dataset)} — cannot set " +
          s"budget $epsilonTotal below it")
      budgets.put(dataset, epsilonTotal)
      flushLedger()
    }
  }

  /** Total epsilon `dataset`'s releases have spent so far. */
  def spent(dataset: String): Double =
    ledger.getOrDefault(dataset, Map.empty).values.sum

  /** Charge `epsilon` for `releaseId` against `dataset`'s budget.
    * Re-registering the SAME release at the same epsilon is free — the
    * mechanism is deterministic, so re-publishing reveals nothing new
    * (and gates/benches re-run idempotently). The same id at a DIFFERENT
    * epsilon is a different mechanism and is refused outright.
    */
  private def charge(dataset: String, releaseId: String, epsilon: Double): Unit = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    ledger.synchronized {
      val m = ledger.getOrDefault(dataset, Map.empty)
      m.get(releaseId) match {
        case Some(e) if e == epsilon => () // idempotent re-release
        case Some(e) => throw new IllegalStateException(
          s"release '$releaseId' of '$dataset' already registered at epsilon=$e; " +
            s"re-registering at $epsilon would be a different mechanism under the " +
            "same name — use a new releaseId")
        case None =>
          val total = budgets.getOrDefault(dataset, Double.PositiveInfinity)
          val used = m.values.sum
          if (used + epsilon > total + 1e-12) throw new IllegalStateException(
            s"epsilon budget exhausted for '$dataset': spent $used of $total, " +
              s"release '$releaseId' wants $epsilon more")
          ledger.put(dataset, m + (releaseId -> epsilon))
          flushLedger()
      }
    }
  }

  /** Test hook: forget a dataset's budget and ledger (memory AND, when a
    * sidecar is attached, the durable record).
    */
  private[graft] def reset(dataset: String): Unit = ledger.synchronized {
    budgets.remove(dataset); ledger.remove(dataset)
    flushLedger()
  }

  // ---- release mechanisms -------------------------------------------------

  /** Guard shared by every release method: the only noise source this
    * object ships is the seeded (deterministic, publicly recomputable,
    * hence NON-private) one, and a caller must acknowledge that
    * explicitly — `insecureDeterministicNoise = true` — to proceed.
    */
  private def requireInsecureAck(flag: Boolean): Unit =
    require(flag,
      "this release uses SEEDED (deterministic, publicly recomputable) noise " +
        "and therefore carries NO differential-privacy guarantee — pass " +
        "insecureDeterministicNoise = true to acknowledge, or swap " +
        "seededUniform for a CSPRNG draw to get a real guarantee")

  /** DP grouped COUNT release: sensitivity 1 (one person adds or removes
    * one row per group under the unbounded-neighbor model). The true count
    * never leaves the method. Noise is [[seededLaplace]] — see the object
    * doc for why that voids the privacy guarantee and what the required
    * `insecureDeterministicNoise` flag acknowledges.
    */
  def releaseCount(
      df: DataFrame, keys: Seq[String], dataset: String, releaseId: String,
      epsilon: Double, insecureDeterministicNoise: Boolean): DataFrame = {
    requireInsecureAck(insecureDeterministicNoise)
    charge(dataset, releaseId, epsilon)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("dp_count",
        col("n_true").cast("double") +
          seededLaplace(releaseId, concat_ws("|", keys.map(col): _*),
            sensitivity = 1.0, epsilon = epsilon))
      .drop("n_true")
  }

  /** USER-LEVEL DP grouped user-count release — the neighboring relation
    * that matters for training-data governance: two datasets differ by
    * ALL of one user's rows (a person's data spans many documents), not
    * by one row. Contribution bounding makes the sensitivity a theorem:
    *  (a) each (user, group) pair counts ONCE (distinct), and
    *  (b) each user counts in at most `maxGroupsPerUser` groups — their
    *      first L groups under a deterministic rank (ordered by the group
    *      key), so the bound is data-independent and reproducible.
    * Removing one user then changes at most L of the released counts by
    * at most 1 each — total sensitivity L, the Laplace scale used here.
    * Without the cap a single prolific user inflates sensitivity to the
    * group-domain size and the noise swamps the signal.
    */
  def releaseUserCount(
      df: DataFrame, userCol: String, keys: Seq[String], maxGroupsPerUser: Int,
      dataset: String, releaseId: String, epsilon: Double,
      insecureDeterministicNoise: Boolean): DataFrame = {
    requireInsecureAck(insecureDeterministicNoise)
    require(maxGroupsPerUser > 0,
      s"maxGroupsPerUser must be positive, got $maxGroupsPerUser")
    charge(dataset, releaseId, epsilon)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(keys.map(col): _*)
    df.select((userCol +: keys).map(col): _*).distinct()
      .withColumn("_grk", row_number().over(w))
      .filter(col("_grk") <= maxGroupsPerUser)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("dp_users",
        col("n_true").cast("double") +
          seededLaplace(releaseId, concat_ws("|", keys.map(col): _*),
            sensitivity = maxGroupsPerUser.toDouble, epsilon = epsilon))
      .drop("n_true")
  }

  /** DP grouped SUM release with a BOUNDED per-row contribution: every
    * value is clamped to [lo, hi] before summing, so one row's influence —
    * and hence the mechanism's sensitivity — is max(|lo|, |hi|) no matter
    * what the data holds. An unclamped sum has unbounded sensitivity and
    * admits NO finite noise scale; the clamp is what makes the guarantee a
    * theorem instead of a hope. The clamped sum rides decimal(18,2) so the
    * true value is order-independent before the noise add.
    */
  def releaseBoundedSum(
      df: DataFrame, keys: Seq[String], valueCol: String, lo: Double, hi: Double,
      dataset: String, releaseId: String, epsilon: Double,
      insecureDeterministicNoise: Boolean): DataFrame = {
    requireInsecureAck(insecureDeterministicNoise)
    require(lo <= hi, s"contribution bounds inverted: [$lo, $hi]")
    require(math.max(math.abs(lo), math.abs(hi)) > 0,
      "bounds [0, 0] admit only the constant 0 — nothing to release")
    charge(dataset, releaseId, epsilon)
    val sens = math.max(math.abs(lo), math.abs(hi))
    val clamped = least(greatest(col(valueCol).cast("double"), lit(lo)), lit(hi))
    df.groupBy(keys.map(col): _*)
      .agg(sum(clamped.cast("decimal(18,2)")).as("s_true"))
      .withColumn("dp_sum",
        col("s_true").cast("double") +
          seededLaplace(releaseId, concat_ws("|", keys.map(col): _*),
            sensitivity = sens, epsilon = epsilon))
      .drop("s_true")
  }
}
