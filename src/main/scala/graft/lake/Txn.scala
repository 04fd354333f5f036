package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE atomic commits — the transaction layer the per-table
  * snapshot protocol cannot give by itself. Single-table writes are
  * already atomic (staged dir + claim-rename), but a pipeline that
  * publishes, say, a fact table AND its summary must publish BOTH or
  * NEITHER: with independent per-table commits, a crash (or a reader)
  * between the two observes a torn pair. The reference has this problem
  * in miniature — sync_to_mysql.py publishes four warehouse tables in a
  * Python loop with no transaction around them.
  *
  * Mechanics (manifest-pointer commit, the Iceberg/Delta idea applied to
  * the snapshot-directory layout):
  *
  *  - A transaction stages every member table as a NORMAL versioned
  *    snapshot via the per-table OCC path — published at the table level
  *    but not yet referenced.
  *  - The commit point is ONE write-once manifest (`_txn/t<N>.json`)
  *    mapping table → version for every table the transaction touched,
  *    carrying forward the prior manifest's pins for tables it didn't.
  *    Manifests publish by temp-write + rename-if-absent, so claiming
  *    t<N+1> is a CAS: concurrent transactions serialize, the loser
  *    re-reads the winner's manifest, re-pins, and retries — nothing is
  *    ever overwritten.
  *  - Transactional readers resolve ONE manifest and read every table at
  *    its pinned version: a consistent cross-table cut, immune to torn
  *    pairs (a crash between table publish and manifest publish leaves
  *    orphan versions that no manifest references — invisible to
  *    transactional readers, collectable by vacuum).
  *
  * Scale shape: the manifest is O(tables) JSON resolved in one driver
  * read; commits add one rename regardless of data size; readers pay
  * nothing beyond the snapshot reads they were already doing.
  */
object Txn {

  private def txnDir(root: String) = new Path(s"$root/_txn")

  /** Marker file written inside a staged version dir when directory
    * setTimes is not honored (object stores) — its mtime stands in for the
    * dir's in the vacuum age gate. Underscore-prefixed: invisible to
    * parquet readers and to tokenOk's data-file check.
    */
  private val heartbeatName = "_txn_heartbeat"

  /** Test-only stall point inside [[heartbeatStaged]], between the
    * exists() precheck and the marker create() — the TOCTOU window where
    * a concurrent vacuum can sweep the dir. Lets ConcurrencySpec land the
    * sweep deterministically and pin that no empty shell survives. */
  private[graft] var testStallBeforeHeartbeat: Path => Unit = _ => ()

  /** Write the heartbeat marker into a staged version dir (the fallback
    * age-freshness signal when directory setTimes is a silent no-op —
    * object stores, some HDFS configs). Guards the resurrect-a-swept-dir
    * TOCTOU: a vacuum can sweep `dir` between the exists() precheck and
    * the create(), and create() auto-creates parents, so the marker would
    * resurrect an EMPTY shell whose fresh heartbeat shields it from the
    * age gate while exists()-based pin checks mistake it for a live
    * version. Re-check substance AFTER the write: a staged dir always
    * holds ≥1 data file (writeTableSnapshot wrote it; vacuum only deletes
    * whole dirs), so no data file ⇒ we resurrected a swept dir — remove
    * the shell; tokenOk then reads the sweep and the commit loop
    * re-stages. Extracted from commit() so the race is unit-testable
    * (ConcurrencySpec drives the sweep through the stall hook).
    */
  private[graft] def heartbeatStaged(
      f: org.apache.hadoop.fs.FileSystem, dir: Path, now: Long): Unit =
    scala.util.Try {
      if (f.exists(dir)) {
        testStallBeforeHeartbeat(dir)
        val out = f.create(new Path(dir, heartbeatName), true)
        try out.write(now.toString.getBytes("UTF-8")) finally out.close()
        val hasData = f.listStatus(dir).exists { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        if (!hasData) f.delete(dir, true)
      }
    }

  /** Effective age basis of a version dir for the presumed-crash gate:
    * the newer of the dir's own mtime and its heartbeat marker's (if any).
    */
  private def versionDirMtime(
      f: org.apache.hadoop.fs.FileSystem, dir: Path): Long = {
    val own = f.getFileStatus(dir).getModificationTime
    val hb = scala.util.Try(
      f.getFileStatus(new Path(dir, heartbeatName)).getModificationTime
    ).getOrElse(0L)
    math.max(own, hb)
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stable identity of a manifest FILE (not the id slot): the embedded
    * per-claim UUID when present, else a (mtime, length) composite for
    * manifests written before the UUID field existed. None = unreadable
    * or vanished. [[vacuum]] compares this at entry vs immediately before
    * each delete, so a slot re-claimed by a new committer — a different
    * file even when coarse mtime granularity makes timestamps collide —
    * is never deleted on a stale judgment.
    */
  private def manifestIdent(
      f: org.apache.hadoop.fs.FileSystem, p: Path): Option[String] =
    scala.util.Try {
      val in = f.open(p)
      val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json).get("uuid")
      if (node != null) s"uuid:${node.asText()}"
      else {
        val st = f.getFileStatus(p)
        s"legacy:${st.getModificationTime}:${st.getLen}"
      }
    }.toOption

  private def manifestIds(spark: SparkSession, root: String): Seq[Int] = {
    val dir = txnDir(root)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("t") && n.endsWith(".json") =>
        n.stripPrefix("t").stripSuffix(".json").toInt }
      .sorted
  }

  /** The latest committed manifest: (txn id, table → pinned version).
    * The max manifest can vanish between the listing and the read — its
    * owner's post-rename verification rolled it back (the documented
    * dirty-read window). That is a routine race, not a failure: re-list
    * and resolve the new max instead of surfacing FileNotFoundException
    * into a committer's CAS loop or a reader.
    */
  def currentManifest(spark: SparkSession, root: String): Option[(Int, Map[String, Int])] = {
    var attempts = 0
    while (true) {
      manifestIds(spark, root).lastOption match {
        case None => return None
        case Some(id) =>
          scala.util.Try(currentManifestAt(spark, root, id)) match {
            case scala.util.Success(pins) => return Some(id -> pins)
            // only IO-shaped failures retry — the max VANISHING between
            // list and read (owner's rollback; FNFE locally, possibly
            // another IOException flavor on HDFS/object stores). Real
            // corruption must fail fast, not spin: Jackson's parse errors
            // EXTEND IOException, and on the checksummed local FS
            // out-of-band corruption surfaces as ChecksumException before
            // the parser even runs — both are matched first.
            case scala.util.Failure(e: com.fasterxml.jackson.core.JsonProcessingException) =>
              throw e
            case scala.util.Failure(e: org.apache.hadoop.fs.ChecksumException) =>
              throw e
            case scala.util.Failure(e: java.io.IOException) =>
              attempts += 1
              if (attempts > 20) throw new IllegalStateException(
                s"currentManifest: max manifest unreadable after $attempts re-lists", e)
              Thread.sleep(5L * attempts)
            case scala.util.Failure(e) => throw e
          }
      }
    }
    None // unreachable
  }

  /** The newest manifest whose pins all RESOLVE to existing version dirs
    * — the only safe base for a new commit. Pins for tables in
    * `superseding` are exempt (the new commit replaces them anyway). A
    * manifest with a dangling pin is a doomed cut: its owner stalled past
    * the presumed-crash threshold and a vacuum swept its staged version;
    * the owner's own liveness re-check rolls it forward (or vacuum's
    * diverged sweep collects it), and carrying the dangling pin would
    * chain the unreadable version into every descendant manifest. In the
    * healthy steady state the max always resolves, so this is one read.
    *
    * Also returns the ids SKIPPED for dangling pins (all above the
    * returned base): the commit loop age-gates and rolls those back —
    * without that, a torn max whose owner crashed between rename and its
    * post-rename rollback wedges every commit that does not supersede the
    * torn manifest's surviving tables (the interloper domination check
    * keeps judging it unsafe, to the attempts cap).
    */
  private def resolvableBase(
      spark: SparkSession, root: String,
      superseding: Set[String]): (Int, Map[String, Int], Seq[Int]) = {
    val f = fs(spark, txnDir(root))
    val skipped = scala.collection.mutable.ArrayBuffer.empty[Int]
    manifestIds(spark, root).reverse.foreach { id =>
      // ONLY a vanished manifest (owner's rollback deleted it between
      // list and read) may be skipped. A corrupt or otherwise-unreadable
      // manifest must FAIL the commit loudly: silently superseding it
      // would drop a possibly-successful transaction from the lineage
      // and let a later vacuum collect its versions as diverged garbage.
      scala.util.Try(currentManifestAt(spark, root, id)) match {
        case scala.util.Success(pins) =>
          val ok = pins.forall { case (t, v) =>
            superseding(t) ||
              f.exists(new Path(s"${Lake.tablePath(root, t)}/version=v$v")) }
          if (ok) return (id, pins, skipped.toSeq)
          else skipped += id
        case scala.util.Failure(_: java.io.FileNotFoundException) => // rolled back
        case scala.util.Failure(e) => throw new IllegalStateException(
          s"txn commit: manifest t$id unreadable (corrupt?) — refusing to build past it", e)
      }
    }
    (0, Map.empty, skipped.toSeq)
  }

  /** Outcome of one manifest-claim attempt. */
  private sealed trait ClaimOutcome
  private case object Won extends ClaimOutcome
  /** Someone else holds a YOUNG claim on this id — likely a live
    * committer between claim and rename; wait and retry the same id. */
  private case object Busy extends ClaimOutcome
  /** The id is gone for us: target manifest already exists, or the claim
    * marker is stale (crashed claimant — burned id). Step forward. */
  private case object Lost extends ClaimOutcome

  /** Test-only stall point between winning the id claim and renaming the
    * manifest — lets specs reproduce the slow-committer interleavings the
    * post-rename verification exists for. */
  private[graft] var testStallAfterClaim: Int => Unit = _ => ()

  /** Test-only stall point inside [[vacuum]], after its entry manifest
    * listing/judgments but before any deletion — lets specs
    * deterministically land a commit (or re-claim a rolled-back id) in
    * the window the round-9 late-pin / mtime-identity guards close. */
  private[graft] var testStallBeforeSweep: () => Unit = () => ()

  private def writeManifest(
      spark: SparkSession, root: String, id: Int, pins: Map[String, Int],
      claimStaleMs: Long): ClaimOutcome = {
    val dir = txnDir(root)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    // per-claim UUID: the identity [[vacuum]]'s guarded deletes compare —
    // a re-claimed id is a NEW file, but on filesystems with coarse (1 s)
    // mtime granularity a re-claim landing in the same tick is
    // mtime-identical to the file judged collectable; the embedded UUID
    // makes identity content-based, immune to timestamp resolution.
    // (currentManifestAt reads only the "tables" node, so old manifests
    // without the field parse unchanged.)
    val body = pins.toSeq.sortBy(_._1)
      .map { case (t, v) => s"${graft.GraftSession.jsonEscape(t)}: $v" }
      .mkString(
        s"""{"uuid": ${graft.GraftSession.jsonEscape(
          java.util.UUID.randomUUID().toString)}, "tables": {""",
        ", ", "}}")
    val tmp = new Path(dir, s".tmp_${java.util.UUID.randomUUID().toString.replace("-", "")}")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val target = new Path(dir, s"t$id.json")
    // rename-if-absent alone is exists-then-rename, and POSIX renameTo
    // OVERWRITES an existing file — two racing committers could both
    // "win" and one manifest would be silently lost. Claim the id with an
    // exclusive marker first (atomic on the local FS via NIO O_EXCL, see
    // Lake.claimExclusive). A marker we cannot claim is either a LIVE
    // committer mid-rename (young → Busy: wait, don't step past, so
    // rename order tracks commit order) or a CRASHED claimant (stale →
    // Lost: the id is burned, step past it like a burned version slot).
    val claim = new Path(dir, s".claim_t$id")
    val outcome: ClaimOutcome =
      if (f.exists(target)) Lost
      else if (Lake.claimExclusive(f, claim)) {
        testStallAfterClaim(id)
        val ok = !f.exists(target) && f.rename(tmp, target)
        f.delete(claim, false)
        if (ok) Won else Lost
      } else {
        val age = scala.util.Try(
          System.currentTimeMillis() - f.getFileStatus(claim).getModificationTime)
        age match {
          case scala.util.Success(ms) if ms >= claimStaleMs => Lost
          case _ => Busy // young marker, or it vanished under us — re-check soon
        }
      }
    if (outcome != Won) f.delete(tmp, false)
    outcome
  }

  /** Atomically publish `writes` (table name → content) as one
    * transaction: every member table gets a new snapshot version, and ALL
    * of them become visible to transactional readers at the single
    * manifest rename — or none do. Returns (txn id, table → version).
    */
  def commit(
      spark: SparkSession, root: String,
      writes: Map[String, DataFrame],
      claimStaleMs: Long = 60000L,
      busyWaitMs: Long = 25L): (Int, Map[String, Int]) = {
    // stage each member as a normal per-table snapshot (atomic per table,
    // unreferenced until the manifest lands). Per-table count-based
    // retention is DISABLED here: it is blind to manifest pins, so with a
    // keep-count smaller than the manifest window it could delete a
    // version an older retained manifest still pins, breaking Txn.read's
    // consistency guarantee. Under a transactional root, [[vacuum]] is the
    // only collector — it retires exactly the versions no retained
    // manifest references.
    // Every staged version dir carries this transaction's token
    // (`_txn_token`, underscore-prefixed so readers ignore it). The
    // post-rename liveness re-check compares CONTENT, not existence: a
    // vacuum-swept slot that a racing committer re-claims with ITS OWN
    // snapshot would pass a bare exists() and silently pin someone else's
    // content — the token makes identity, not occupancy, the test.
    val txnToken = java.util.UUID.randomUUID().toString
    def versionDir(t: String, v: Int) =
      new Path(s"${Lake.tablePath(root, t)}/version=v$v")
    // Stamp failures THROW: a silently-missing token would make every CAS
    // win look swept and burn the 50-attempt budget on full re-stages
    // before dying with a misleading "still conflicting" error. The
    // dir-exists precheck keeps create() (which auto-creates parents)
    // from resurrecting a concurrently-swept dir as an empty shell.
    def stampToken(t: String, v: Int): Unit = {
      val f = fs(spark, txnDir(root))
      if (!f.exists(versionDir(t, v))) throw new IllegalStateException(
        s"txn commit: staged $t version=v$v vanished before token stamp")
      val out = f.create(new Path(versionDir(t, v), "_txn_token"), true)
      try out.write(txnToken.getBytes("UTF-8")) finally out.close()
    }
    // Identity AND substance: the token content must match, and the dir
    // must hold at least one data file — a swept dir resurrected by a
    // racing parent-creating write (or holding only metadata) must read
    // as swept, or commit() could return success pinning an empty,
    // unreadable version.
    def tokenOk(t: String, v: Int): Boolean = scala.util.Try {
      val f = fs(spark, txnDir(root))
      val in = f.open(new Path(versionDir(t, v), "_txn_token"))
      val matches =
        try new String(in.readAllBytes(), "UTF-8") == txnToken finally in.close()
      matches && f.listStatus(versionDir(t, v)).exists { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }.getOrElse(false)
    def stage(t: String): Int = {
      val v = Lake.writeTableSnapshot(writes(t), root, t, retentionVersions = Int.MaxValue)
      stampToken(t, v)
      v
    }
    var written: Map[String, Int] = writes.keys.map(t => t -> stage(t)).toMap
    // Refresh the staged version dirs' mtimes so the vacuum age gate sees
    // them as YOUNG. A multi-table transaction can spend arbitrarily long
    // in the writes above (big Spark jobs), so the FIRST table's publish
    // mtime may already be near staleClaimMs by the time we reach the CAS
    // loop — touched here (and per loop iteration below, since Busy waits
    // are bounded only by claimStaleMs), the only way a concurrent vacuum
    // can presume these dirs crashed is a single > staleClaimMs stall
    // inside the tiny touch→rename critical section — the same presumed-
    // crash threshold every other part of the protocol already accepts.
    // setTimes on a DIRECTORY is a silent no-op on object stores and some
    // HDFS configs: the vacuum age gate would then see long-staging live
    // dirs as old and sweep them — safe (the token check catches it) but
    // it burns the attempts budget on full re-stages with no diagnostic.
    // So verify the mtime actually moved; if not, write a `_txn_heartbeat`
    // marker INSIDE the dir (file mtimes are reliable everywhere; vacuum's
    // age gate reads it as the dir's effective age) and warn once so
    // operators can see the gate is running on the fallback. The touch is
    // THROTTLED to staleClaimMs/4: the gate only needs freshness within
    // staleClaimMs, and the Busy spin re-enters every 25 ms — per-spin
    // stat+PUT per table (on exactly the object stores the fallback
    // targets) would be thousands of needless calls.
    var touchWarned = false
    var lastTouch = 0L
    def touchStaged(): Unit = {
      val now = System.currentTimeMillis()
      if (now - lastTouch < math.max(1L, claimStaleMs / 4)) return
      lastTouch = now
      val f = fs(spark, txnDir(root))
      written.foreach { case (t, v) =>
        val dir = versionDir(t, v)
        val honored = scala.util.Try {
          f.setTimes(dir, now, -1)
          f.getFileStatus(dir).getModificationTime >= now - 5000L
        }.getOrElse(false)
        if (!honored) {
          // heartbeat marker fallback — TOCTOU-guarded (swept-dir
          // resurrection removes its own shell; see heartbeatStaged)
          heartbeatStaged(f, dir, now)
          if (!touchWarned) {
            touchWarned = true
            System.err.println(s"[txn] directory setTimes not honored under " +
              s"$root — staged-dir mtimes are stale on this filesystem; " +
              s"falling back to $heartbeatName markers for the vacuum age gate")
          }
        }
      }
    }
    var attempts = 0
    var candidate = 0
    // Base resolution is cached on the observed max id: the Busy spin
    // re-loops every 25 ms for up to claimStaleMs, and re-parsing
    // manifests + O(tables) exists() probes per spin is thousands of
    // needless FS calls on an object store. Manifests are immutable, so
    // the base only changes when the max id moves — or when our own
    // rollback invalidates what we knew (cache cleared there).
    var cachedBase: Option[(Int, (Int, Map[String, Int]))] = None
    // Busy-waits on a live claimant self-bound at claimStaleMs (the marker
    // ages into Lost); cap only the CAS-conflict retries.
    while (true) {
      touchStaged()
      // Base = the newest manifest whose carried pins all RESOLVE (pins
      // for tables this transaction supersedes don't matter). A max
      // manifest with a dangling pin — its owner's staged version swept
      // while it stalled — is a doomed cut: building on it would chain
      // the dangling pin into our own manifest forever.
      val curMax = manifestIds(spark, root).lastOption.getOrElse(0)
      val (lastId, carried) = cachedBase match {
        case Some((m, base)) if m == curMax => base
        case _ =>
          val (id, pins0, torn) = resolvableBase(spark, root, writes.keySet)
          // SELF-HEAL (round 9): a manifest skipped for dangling pins is a
          // torn cut whose owner either (a) is about to fail its own
          // post-rename verification and roll back, or (b) crashed between
          // rename and that rollback. Case (b) would wedge this commit
          // forever: the torn manifest's SURVIVING pins that we neither
          // carry nor supersede keep tripping the interloper domination
          // check below. Finish the crashed owner's rollback here, gated
          // at the same presumed-crash age every other part of the
          // protocol uses (a younger torn manifest is case (a) — its
          // owner is alive in the documented rollback window; leave it,
          // this attempt degrades to a bounded retry). A slow-not-dead
          // owner whose manifest we delete past the threshold fails its
          // selfAlive re-check and retries — a retry, never a lost commit.
          val fh = fs(spark, txnDir(root))
          torn.foreach { i =>
            val p = new Path(txnDir(root), s"t$i.json")
            val stale = scala.util.Try(
              System.currentTimeMillis() - fh.getFileStatus(p).getModificationTime
            ).toOption.exists(_ >= claimStaleMs)
            if (stale && fh.delete(p, false))
              System.err.println(s"[txn] rolled back torn manifest t$i under " +
                s"$root (dangling pins, owner presumed crashed)")
          }
          val base = id -> pins0
          cachedBase = Some(curMax -> base)
          base
      }
      val pins = carried ++ written
      // max(): a racing winner advances lastId (re-read pins absorb its
      // writes); a BURNED id — claimed by a crashed committer, never
      // renamed, now stale — leaves lastId unchanged, so step past it with
      // the same pins instead of retrying the dead slot forever (ids may
      // gap, exactly like burned table-version slots)
      candidate = math.max(candidate + 1, lastId + 1)
      writeManifest(spark, root, candidate, pins, claimStaleMs) match {
        case Won =>
          // Post-rename verification: a committer that stalled between
          // claim and rename can be presumed dead (stale marker) and
          // stepped past; its late rename would otherwise land a manifest
          // BELOW the new max whose writes no later manifest carries —
          // commit() would return success for a transaction invisible to
          // every transactional reader. So after winning, re-examine every
          // manifest that landed concurrently (id above our pin base,
          // other than our own):
          //  - a HIGHER id is safe only if it carries (or supersedes)
          //    every pin we just wrote — i.e. it built on our manifest;
          //  - a LOWER id in the gap is safe only if our pins dominate
          //    its pins — i.e. we carried everything it published.
          // Any unsafe interloper means a racing commit and ours diverged:
          // roll ours back and retry with re-merged pins. The domination
          // test (not bare "am I the max") avoids falsely rolling back a
          // manifest a descendant already built on, which would tear a
          // legitimately-visible point of history out of the chain.
          // (Residual window: our manifest is listable for the few ms
          // before a rollback; it is itself a consistent cut, and our
          // commit() has not returned yet — documented dirty-read window.)
          val interlopers = manifestIds(spark, root)
            .filter(i => i > lastId && i != candidate)
          val unsafe = interlopers.exists { i =>
            // an interloper that VANISHED between list and read rolled
            // ITSELF back (its owner runs this same check) — ignore it.
            // Any other read failure is corruption: fail loudly rather
            // than silently supersede a possibly-successful transaction.
            val read = scala.util.Try(currentManifestAt(spark, root, i))
            read.failed.foreach {
              case _: java.io.FileNotFoundException => ()
              case e => throw new IllegalStateException(
                s"txn commit: interloper manifest t$i unreadable (corrupt?)", e)
            }
            read.toOption.exists { ipins =>
              if (i > candidate) !written.forall { case (t, v) => ipins.get(t).exists(_ >= v) }
              else {
                // A DANGLING pin of the interloper (version dir swept by
                // vacuum while its owner stalled) is unreadable in any
                // case: superseding it cannot lose data, and its owner's
                // own liveness re-check rolls the transaction forward.
                // Only resolvable pins we fail to dominate make us unsafe.
                val f = fs(spark, txnDir(root))
                !ipins.filter { case (t, v) => f.exists(versionDir(t, v)) }
                  .forall { case (t, v) => pins.get(t).exists(_ >= v) }
              }
            }
          }
          // Liveness re-checks before declaring success: if we stalled
          // past staleClaimMs anywhere in the critical section, a
          // concurrent vacuum may have presumed us crashed and swept our
          // freshly-renamed manifest (diverged sweep) or a staged version
          // (orphan sweep). Success requires our manifest to still exist,
          // every written version dir to still carry OUR token (bare
          // existence would accept a re-claimed slot holding another
          // writer's content), and every CARRIED pin to still resolve (a
          // dangling carried pin means we built on a cut that was being
          // torn down under us). Swept writes are re-staged; a dangling
          // carried base re-resolves on the next loop — a beyond-threshold
          // stall degrades to a retry, never to a successful-but-invisible
          // or dangling-pinned commit.
          val fck = fs(spark, txnDir(root))
          val selfAlive = fck.exists(new Path(txnDir(root), s"t$candidate.json"))
          val swept = written.filter { case (t, v) => !tokenOk(t, v) }
          val carriedStale = (pins -- written.keys).exists { case (t, v) =>
            !fck.exists(versionDir(t, v)) }
          if (!unsafe && selfAlive && swept.isEmpty && !carriedStale)
            return candidate -> written
          fs(spark, txnDir(root)).delete(new Path(txnDir(root), s"t$candidate.json"), false)
          if (swept.nonEmpty)
            written = written ++ swept.keys.map(t => t -> stage(t))
          // what we knew about the base may be why we failed (e.g. a
          // carried pin went dangling under an unchanged max) — re-resolve
          cachedBase = None
          attempts += 1
          // Two racing committers whose manifests each miss the other's
          // pins both judge the other unsafe and both roll back — a
          // symmetric livelock if their retries stay in lockstep. There is
          // no SAFE deterministic tie-break (either side may have already
          // returned success before the other renamed, so neither manifest
          // can unilaterally survive); jittered backoff breaks the
          // symmetry probabilistically, and the attempts cap turns a
          // pathological sustained tie into a loud failure, never a silent
          // inconsistency. Seeded per-committer via identity hash — no
          // wall-clock/PRNG dependence.
          Thread.sleep((attempts.toLong * 13 *
            (1 + (System.identityHashCode(writes) & 7))) % 400)
        case Busy =>
          candidate -= 1 // retry the SAME id once the live holder resolves
          Thread.sleep(busyWaitMs)
        case Lost =>
          attempts += 1 // burned or taken id: step forward next iteration
      }
      if (attempts > 50) throw new IllegalStateException(
        s"txn commit: manifest still conflicting after $attempts attempts")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Read `table` at the version pinned by the latest manifest (or a
    * specific manifest id) — the transactionally consistent view. Reading
    * several tables against the SAME resolved manifest id gives a
    * cross-table consistent cut.
    */
  def read(
      spark: SparkSession, root: String, table: String,
      txnId: Option[Int] = None): DataFrame = {
    val (id, pins) = txnId match {
      case Some(want) =>
        val f = fs(spark, txnDir(root))
        require(f.exists(new Path(txnDir(root), s"t$want.json")),
          s"txn t$want does not exist")
        want -> currentManifestAt(spark, root, want)
      case None => currentManifest(spark, root).getOrElse(
        throw new IllegalStateException(s"no transaction committed under $root"))
    }
    val v = pins.getOrElse(table, throw new IllegalStateException(
      s"txn t$id does not pin table $table (pins: ${pins.keys.mkString(",")})"))
    Lake.readTableFeed(spark, root, table, Some(v))
  }

  /** Transaction-aware retention: delete table versions that NO retained
    * manifest pins — crashed transactions' orphans (published snapshots
    * whose manifest never landed) and versions only pinned by manifests
    * older than `keepManifests`. This is the collector for the garbage
    * the manifest protocol makes invisible; per-table `version=vN`
    * retention cannot do it (an orphan can be the table's NEWEST version
    * and would be kept forever). Requires every writer of `root` to
    * commit through [[Txn.commit]] — an OLD non-transactional snapshot
    * looks exactly like an orphan. Safe to run CONCURRENTLY with live
    * committers: orphan versions, diverged manifests, and claim markers
    * are age-gated at `staleClaimMs` (a just-staged version or a young
    * in-window manifest is never swept — only state whose owner is
    * presumed crashed; a young manifest already BELOW the retained
    * window may be swept, but its owner provably fails post-rename
    * verification against the ≥keepManifests newer manifests and
    * retries, so no successful commit is lost), and if a racing
    * rollback makes a kept manifest unreadable the whole vacuum aborts
    * as a no-op rather than delete against unknown pins. Old manifests
    * beyond the retained window are deleted too (time travel window =
    * `keepManifests`). Returns (versions deleted, manifests deleted).
    */
  def vacuum(
      spark: SparkSession, root: String,
      keepManifests: Int = 7, dryRun: Boolean = false,
      staleClaimMs: Long = 60000L): (Seq[(String, Int)], Seq[Int]) = {
    val ids = manifestIds(spark, root)
    val keep0 = ids.takeRight(keepManifests)
    // DIVERGED manifests: a committer that crashed after its rename but
    // before the post-rename verification leaves a below-max manifest
    // whose pins no successor carries — a forked cut its own rollback
    // would have deleted. Healthy lineage is monotone (every later
    // manifest carries every earlier pin, possibly superseded by a higher
    // version), so "max does not dominate it" identifies exactly these;
    // their commit() never returned, so dropping them is the collector
    // finishing the crashed committer's own rollback.
    val fsw = fs(spark, txnDir(root))
    val sweepNow = System.currentTimeMillis()
    // ONE read per in-window manifest (None = it vanished between list and
    // read: its owner's rollback deleted it). The max pins, the diverged
    // set, the pinned set, and the diverged-table sweep all derive from
    // this single snapshot — fewer JSON parses and ONE list-to-read race
    // window instead of three.
    val pinsAt: Map[Int, Option[Map[String, Int]]] = keep0.map(i =>
      i -> scala.util.Try(currentManifestAt(spark, root, i)).toOption).toMap
    // identity of every manifest AT ENTRY: rolled-back ids are re-claimable
    // by later committers (candidate = lastId+1 can re-issue a freed id),
    // so a manifest judged collectable here must only be deleted if the
    // file is still the SAME file. Identity is the embedded per-claim UUID
    // (round 10 — mtime alone is not identity on filesystems with coarse
    // granularity, where a re-claim landing in the same tick collides),
    // with a (mtime, length) composite for pre-UUID manifests.
    val identAt: Map[Int, Option[String]] = ids.map(i =>
      i -> manifestIdent(fsw, new Path(txnDir(root), s"t$i.json"))).toMap
    val diverged: Seq[Int] = ids.lastOption match {
      case Some(m) =>
        pinsAt.getOrElse(m, None) match {
          // max vanished (rolled back): skip the diverged sweep this run
          // rather than judge divergence against a stale max
          case None => Seq.empty
          case Some(mp) =>
            keep0.filter(_ != m).filter { i =>
              // Age gate: a committer alive inside its documented few-ms
              // post-rename rollback window leaves a manifest
              // indistinguishable from a crashed one's. Sweeping it (and,
              // below, its staged versions) while the owner is about to
              // retry with the SAME `written` pins would let that retry
              // commit successfully with dangling version dirs. Only a
              // manifest older than staleClaimMs is presumed crashed —
              // the same threshold the commit path uses to step past a
              // claim; and commit() re-checks its own manifest and staged
              // dirs before returning success, so even a beyond-threshold
              // straggler degrades to a retry, not a loss. (A manifest
              // that vanished rolled ITSELF back — not ours to sweep.)
              scala.util.Try {
                val st = fsw.getFileStatus(new Path(txnDir(root), s"t$i.json"))
                sweepNow - st.getModificationTime >= staleClaimMs &&
                  pinsAt.getOrElse(i, None).exists(ip =>
                    !ip.forall { case (t, v) => mp.get(t).exists(_ >= v) })
              }.getOrElse(false)
            }
        }
      case None => Seq.empty
    }
    // TORN max (round 9): the diverged test above never examines the max
    // itself, but a committer that crashed between its rename and its
    // post-rename rollback can leave the MAX manifest with a dangling pin
    // (its staged version was swept while it stalled past the threshold).
    // That cut is unreadable and wedges every later commit that does not
    // supersede its surviving tables — collect it like a diverged
    // manifest, age-gated at the same presumed-crash threshold (a young
    // torn max belongs to an owner still inside its own rollback window;
    // commit()'s selfAlive re-check makes a late sweep a retry, not a
    // loss). Its surviving versions become unpinned and age out below.
    val tornMax: Seq[Int] = ids.lastOption.toSeq.filter { m =>
      pinsAt.getOrElse(m, None).exists { mp =>
        scala.util.Try {
          val st = fsw.getFileStatus(new Path(txnDir(root), s"t$m.json"))
          sweepNow - st.getModificationTime >= staleClaimMs &&
            mp.exists { case (t, v) =>
              !fsw.exists(new Path(s"${Lake.tablePath(root, t)}/version=v$v")) }
        }.getOrElse(false)
      }
    }
    val keep = keep0.filterNot(i => diverged.contains(i) || tornMax.contains(i))
    val dropManifests = ids.dropRight(keepManifests) ++ diverged ++ tornMax
    // A KEPT manifest that cannot be read was deleted under us by its
    // owner's post-rename rollback (the only process that deletes a young
    // manifest). Its pins are unknown, so no deletion is provably safe —
    // abort this vacuum cleanly (with a stderr note so repeated aborts are
    // visible, not mistaken for "nothing to collect") and let the caller
    // retry; maintenance is periodic, promptness is not a correctness
    // property.
    if (keep.exists(i => pinsAt.getOrElse(i, None).isEmpty)) {
      System.err.println(s"[txn] vacuum aborted under $root: a kept manifest " +
        "vanished mid-sweep (racing rollback) — nothing deleted, retry later")
      return (Seq.empty, Seq.empty)
    }
    val pinned: Set[(String, Int)] =
      keep.flatMap(i => pinsAt(i).get.toSeq).toSet
    // sweep tables named by DIVERGED manifests too: a table that only ever
    // appeared in a forked cut has no pin in any kept manifest, so its
    // snapshot versions would otherwise be invisible to the collector
    val tables = pinned.map(_._1) ++
      (diverged ++ tornMax).flatMap(i =>
        pinsAt.getOrElse(i, None).fold(Iterable.empty[String])(_.keys))
    // Age gate on version dirs, same threshold as claim markers: a LIVE
    // committer between writeTableSnapshot and its manifest rename has a
    // staged version no manifest pins yet — indistinguishable from a
    // crashed commit's orphan except by age. Sweeping it would land the
    // imminent commit with dangling pins. A version younger than
    // staleClaimMs is left for a later vacuum (deferred collection is
    // safe; eager collection is not).
    val dropVersions = tables.toSeq.sorted.distinct.flatMap { t =>
      Lake.versions(spark, root, t)
        .filterNot(v => pinned.contains(t -> v))
        .filter { v =>
          scala.util.Try {
            val dir = new Path(s"${Lake.tablePath(root, t)}/version=v$v")
            sweepNow - versionDirMtime(fsw, dir) >= staleClaimMs
          }.getOrElse(false)
        }
        .map(t -> _)
    }
    if (dryRun) (dropVersions, dropManifests)
    else {
      testStallBeforeSweep()
      val f = fs(spark, txnDir(root))
      // LATE-PIN recheck (round 9): `pinned` derives from the manifest
      // listing taken at entry. A manifest renamed SINCE then — by a
      // committer whose staged (old-mtime) versions we just judged
      // orphans — may pin exactly those versions, and that committer may
      // already have verified and returned: deleting them would tear a
      // successful commit, the one unrecoverable mistake. Re-list, read
      // only the NEW ids, and exclude their pins. Versions whose slot was
      // re-claimed since judgment are caught by the fresh age re-stat (a
      // re-claimed dir is young). Residual window: rename-after-this-
      // re-list — microseconds instead of the whole vacuum runtime, and
      // only overlapping a committer stalled past the presumed-crash
      // threshold mid-verification.
      val latePinned: Set[(String, Int)] =
        manifestIds(spark, root).filterNot(ids.contains).flatMap(i =>
          scala.util.Try(currentManifestAt(spark, root, i)).toOption
            .fold(Iterable.empty[(String, Int)])(_.toSeq)).toSet
      val deletedVersions = dropVersions.filter { case (t, v) =>
        !latePinned.contains(t -> v) && {
          val dir = new Path(s"${Lake.tablePath(root, t)}/version=v$v")
          scala.util.Try(
            sweepNow - versionDirMtime(f, dir) >= staleClaimMs
          ).getOrElse(false) && f.delete(dir, true)
        }
      }
      // guarded manifest deletes: re-read the identity immediately before
      // each delete and require it to equal the entry-time identity — a
      // re-claimed id (owner rolled back, new committer re-used the slot)
      // is a NEW file with a new UUID and must survive this run even when
      // its mtime tick collides with the judged file's
      val deletedManifests = dropManifests.filter { id =>
        val p = new Path(txnDir(root), s"t$id.json")
        val entry = identAt.get(id).flatten
        entry.isDefined && manifestIdent(f, p) == entry && f.delete(p, false)
      }
      // orphaned claim markers from crashed committers. An id <= latest
      // can still belong to a LIVE committer between claim and rename (it
      // lost the race to a newer manifest and will roll itself forward) —
      // deleting its marker would re-open the id to a second claimant,
      // the double-rename the marker exists to prevent. Only collect
      // markers whose mtime is older than staleClaimMs: past that age the
      // committer is the same presumed-crashed claimant the commit path
      // already steps past, and its late rename is caught by commit's
      // post-rename verification.
      val latest = ids.lastOption.getOrElse(0)
      val now = System.currentTimeMillis()
      if (f.exists(txnDir(root)))
        f.listStatus(txnDir(root)).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith(".claim_t") &&
              scala.util.Try(n.stripPrefix(".claim_t").toInt).toOption.exists(_ <= latest) &&
              now - st.getModificationTime >= staleClaimMs)
            f.delete(st.getPath, false)
        }
      (deletedVersions, deletedManifests)
    }
  }

  private[graft] def currentManifestAtForTest(
      spark: SparkSession, root: String, id: Int): Map[String, Int] =
    currentManifestAt(spark, root, id)

  private def currentManifestAt(
      spark: SparkSession, root: String, id: Int): Map[String, Int] = {
    val f = fs(spark, txnDir(root))
    val in = f.open(new Path(txnDir(root), s"t$id.json"))
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(json).get("tables")
    val pins = scala.collection.mutable.Map.empty[String, Int]
    node.fieldNames().forEachRemaining(n => pins(n) = node.get(n).asInt())
    pins.toMap
  }
}
