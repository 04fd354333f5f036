package graft

import java.sql.{Date, Timestamp}

import graft.governance.{FeedCatalog, Permissions}
import graft.model.FeedConfig

class GovernanceSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val asOf = Date.valueOf("2024-06-01")

  test("root grant and trailing-slash grants match sub-paths") {
    var p = Permissions.empty(spark)
    p = Permissions.grant(p, "admin@x", "/", "admin", "root", t0)
    p = Permissions.grant(p, "u@x", "/lake/docs/", "read", "root", t0)
    assert(Permissions.check(p, "admin@x", "/", "read", asOf))
    assert(Permissions.check(p, "admin@x", "/anything/below", "write", asOf))
    assert(Permissions.check(p, "u@x", "/lake/docs", "read", asOf))
    assert(Permissions.check(p, "u@x", "/lake/docs/readme", "read", asOf))
    assert(Permissions.check(p, "u@x", "/lake/docs/", "read", asOf))
    assert(!Permissions.check(p, "u@x", "/lake/docs2", "read", asOf)) // sibling
  }

  test("grant + check: prefix match, exact match, and miss") {
    var p = Permissions.empty(spark)
    p = Permissions.grant(p, "u@x", "/lake/streams", "read", "root", t0)
    assert(Permissions.check(p, "u@x", "/lake/streams", "read", asOf))
    assert(Permissions.check(p, "u@x", "/lake/streams/ev/year=2024", "read", asOf))
    assert(!Permissions.check(p, "u@x", "/lake/streamsX", "read", asOf)) // not a path segment
    assert(!Permissions.check(p, "u@x", "/lake", "read", asOf))
    assert(!Permissions.check(p, "other@x", "/lake/streams", "read", asOf))
  }

  test("admin implies read and write; write does not imply read") {
    var p = Permissions.empty(spark)
    p = Permissions.grant(p, "a@x", "/d", "admin", "root", t0)
    p = Permissions.grant(p, "w@x", "/d", "write", "root", t0)
    assert(Permissions.check(p, "a@x", "/d", "read", asOf))
    assert(Permissions.check(p, "a@x", "/d", "write", asOf))
    assert(!Permissions.check(p, "w@x", "/d", "read", asOf))
  }

  test("expiry honored; grant on same unique key upserts (no duplicate)") {
    var p = Permissions.empty(spark)
    p = Permissions.grant(p, "u@x", "/d", "read", "root", t0,
      expiresAt = Some(Date.valueOf("2024-03-01")))
    assert(!Permissions.check(p, "u@x", "/d", "read", asOf))
    assert(Permissions.check(p, "u@x", "/d", "read", Date.valueOf("2024-02-01")))
    p = Permissions.grant(p, "u@x", "/d", "read", "root",
      Timestamp.valueOf("2024-05-01 00:00:00")) // re-grant, no expiry
    assert(p.count() === 1) // unique key upheld
    assert(Permissions.check(p, "u@x", "/d", "read", asOf))
  }

  test("revoke deactivates; invalid permission type rejected") {
    var p = Permissions.empty(spark)
    p = Permissions.grant(p, "u@x", "/d", "read", "root", t0)
    p = Permissions.revoke(p, "u@x", "/d", "read")
    assert(!Permissions.check(p, "u@x", "/d", "read", asOf))
    intercept[IllegalArgumentException] {
      Permissions.grant(p, "u@x", "/d", "execute", "root", t0)
    }
  }

  private val feed = FeedConfig("f1", "stream", "src", "d", "date", "append",
    30, 0, enabled = true, status = "active")

  test("catalog CRUD: add/update/disable/archive/restore/delete") {
    var c = FeedCatalog.empty.add(feed)
    intercept[IllegalArgumentException](c.add(feed)) // duplicate
    c = c.update("f1", retentionDays = Some(60))
    assert(c.get("f1").retentionDays === 60)
    c = c.disable("f1")
    assert(c.active.isEmpty)
    c = c.enable("f1").archive("f1")
    assert(c.get("f1").status === "archived")
    assert(c.active.isEmpty) // archived feeds never export, enabled or not
    c = c.restore("f1")
    // archive→restore round-trips the enabled flag (reference preserves it)
    assert(c.get("f1").status === "active" && c.get("f1").enabled)
    intercept[IllegalArgumentException](c.delete("f1", confirm = false)) // guarded
    assert(c.delete("f1", confirm = true).all.isEmpty)
  }

  test("catalog validates enums on add") {
    intercept[IllegalArgumentException] {
      FeedCatalog.empty.add(feed.copy(feedType = "nope"))
    }
    intercept[IllegalArgumentException] {
      FeedCatalog.empty.add(feed.copy(storageMode = "nope"))
    }
  }

  test("descriptor files: save/load round-trip, layout by status, re-validation") {
    val root = java.nio.file.Files.createTempDirectory("feeds_spec_").toString
    val tricky = feed.copy(name = "f2",
      description = "has \"quotes\", a \\ backslash\nand a newline")
    val cat = FeedCatalog.empty.add(feed).add(tricky).archive("f2")
    FeedCatalog.save(cat, root)
    // one JSON per feed, directory chosen by status (reference layout)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "feeds", "active", "f1.json")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "feeds", "archived", "f2.json")))
    val loaded = FeedCatalog.load(root)
    assert(loaded.all === cat.all) // full fidelity incl. escaped description
    // re-save after a status flip MOVES the descriptor between dirs
    FeedCatalog.save(loaded.restore("f2"), root)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "feeds", "active", "f2.json")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "feeds", "archived", "f2.json")))
    // a hand-edited descriptor with a bad enum fails at load, not at use
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "feeds", "active", "bad.json"),
      """{"feed_name": "bad", "feed_type": "nope", "source": "s",
        |"description": "d", "partitioning": "date", "storage_mode": "append",
        |"retention_days": 1, "retention_versions": 0, "enabled": true,
        |"status": "active"}""".stripMargin)
    intercept[IllegalArgumentException](FeedCatalog.load(root))
  }

  test("built-in catalog mirrors the reference feed registry") {
    val c = FeedCatalog.builtIn
    assert(c.all.size === 8)
    assert(c.get("transaction_stream_anonymized").retentionDays === 730)
    assert(c.get("payment_method_totals").retentionVersions === 7)
  }

  test("column lineage: renames chain, unions merge branches, explode tracks input") {
    import org.apache.spark.sql.functions._
    import graft.governance.Lineage
    val root = java.nio.file.Files.createTempDirectory("graft_lineage_").toString
    import spark.implicits._
    Seq((1, "a,b", 1.0)).toDF("id", "tags", "v").write.parquet(s"$root/left.parquet")
    Seq((1, 2.0)).toDF("id2", "w").write.parquet(s"$root/right.parquet")
    def edges(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      Lineage.columnLineage(spark, df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val left = spark.read.parquet(s"$root/left.parquet")
    val right = spark.read.parquet(s"$root/right.parquet")
    // rename chain: v -> x -> y still points at left.v; filters are ignored
    val renamed = left.select(col("id"), col("v").as("x"))
      .filter(col("id") > 0).select(col("x").as("y"))
    assert(edges(renamed) === Set(("y", "left", "v")))
    // join + multi-source expression
    val joined = left.join(right, col("id") === col("id2"))
      .select((col("v") + col("w")).as("sum_vw"))
    assert(edges(joined) === Set(("sum_vw", "left", "v"), ("sum_vw", "right", "w")))
    // union: both branches contribute positionally
    val unioned = left.select(col("v").as("u")).union(right.select(col("w").as("u")))
    assert(edges(unioned) === Set(("u", "left", "v"), ("u", "right", "w")))
    // explode: generated column derives from the generator input
    val exploded = left.select(explode(split(col("tags"), ",")).as("tag"))
    assert(edges(exploded) === Set(("tag", "left", "tags")))
    // literal output: NULL edge
    val lits = left.select(col("id"), lit(42).as("answer"))
    assert(edges(lits) === Set(("id", "left", "id"), ("answer", null, null)))
  }

  test("DP release: epsilon accounting — budget cap, idempotent re-release, id reuse refused") {
    import graft.governance.DifferentialPrivacy
    import org.apache.spark.sql.functions.col
    DifferentialPrivacy.reset("dp_spec")
    DifferentialPrivacy.setBudget("dp_spec", 1.0)
    import spark.implicits._
    val df = Seq(("a", 5.0), ("a", 7.0), ("b", 3.0)).toDF("g", "v")
    val r1 = DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_spec", "r1", 0.5,
      insecureDeterministicNoise = true).collect()
    assert(DifferentialPrivacy.spent("dp_spec") === 0.5)
    // idempotent re-release: same id + same epsilon charges nothing new
    // and (seeded mechanism) returns bit-identical values
    val r1again = DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_spec", "r1", 0.5,
      insecureDeterministicNoise = true).collect()
    assert(DifferentialPrivacy.spent("dp_spec") === 0.5)
    assert(r1.map(_.toSeq.toList).toSet === r1again.map(_.toSeq.toList).toSet)
    // same id at a different epsilon is a different mechanism — refused
    val e1 = intercept[IllegalStateException] {
      DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_spec", "r1", 0.25,
        insecureDeterministicNoise = true)
    }
    assert(e1.getMessage.contains("different mechanism"), e1.getMessage)
    // second release fits exactly; a third exceeds the budget
    DifferentialPrivacy.releaseBoundedSum(df, Seq("g"), "v", 0.0, 10.0,
      "dp_spec", "r2", 0.5, insecureDeterministicNoise = true)
    assert(DifferentialPrivacy.spent("dp_spec") === 1.0)
    val e2 = intercept[IllegalStateException] {
      DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_spec", "r3", 0.5,
        insecureDeterministicNoise = true)
    }
    assert(e2.getMessage.contains("budget exhausted"), e2.getMessage)
    // a budget can never tighten below what is already spent
    val e3 = intercept[IllegalArgumentException] {
      DifferentialPrivacy.setBudget("dp_spec", 0.5)
    }
    assert(e3.getMessage.contains("already spent"), e3.getMessage)
    DifferentialPrivacy.reset("dp_spec")
  }

  test("DP release: seeded noise demands the explicit insecure acknowledgement") {
    import graft.governance.DifferentialPrivacy
    DifferentialPrivacy.reset("dp_ack")
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_ack", "r1", 0.5,
        insecureDeterministicNoise = false)
    }
    assert(e.getMessage.contains("NO differential-privacy guarantee"), e.getMessage)
    // refused BEFORE charging: the budget is untouched
    assert(DifferentialPrivacy.spent("dp_ack") === 0.0)
    DifferentialPrivacy.reset("dp_ack")
  }

  test("DP accountant: spend survives a process restart via the JSON sidecar") {
    import graft.governance.DifferentialPrivacy
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dp_ledger")
    val sidecar = dir.resolve("dp_ledger.json")
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    try {
      DifferentialPrivacy.reset("dp_durable")
      DifferentialPrivacy.persistTo(sidecar)
      DifferentialPrivacy.setBudget("dp_durable", 1.0)
      DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_durable", "r1", 0.6,
        insecureDeterministicNoise = true)
      assert(DifferentialPrivacy.spent("dp_durable") === 0.6)
      // simulate a restart: detach the sidecar, wipe memory, re-attach
      DifferentialPrivacy.stopPersisting()
      DifferentialPrivacy.reset("dp_durable")
      assert(DifferentialPrivacy.spent("dp_durable") === 0.0)
      DifferentialPrivacy.persistTo(sidecar)
      assert(DifferentialPrivacy.spent("dp_durable") === 0.6,
        "sidecar must restore spend across restarts")
      // the restored ledger still enforces the restored budget
      val e = intercept[IllegalStateException] {
        DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_durable", "r2", 0.5,
          insecureDeterministicNoise = true)
      }
      assert(e.getMessage.contains("budget exhausted"), e.getMessage)
      // and the idempotent path still charges nothing new
      DifferentialPrivacy.releaseCount(df, Seq("g"), "dp_durable", "r1", 0.6,
        insecureDeterministicNoise = true)
      assert(DifferentialPrivacy.spent("dp_durable") === 0.6)
    } finally {
      DifferentialPrivacy.stopPersisting()
      DifferentialPrivacy.reset("dp_durable")
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile); ()
    }
  }

  test("DP release: sensitivity bound — out-of-range contributions are clamped") {
    import graft.governance.DifferentialPrivacy
    DifferentialPrivacy.reset("dp_sens")
    import spark.implicits._
    // same rows except one outlier blown up 1e6× — after clamping to
    // [0, 10] both datasets release IDENTICAL values, which is exactly the
    // sensitivity claim: no single row can move the mechanism by more than
    // the declared bound, whatever the data holds
    val clean = Seq(("a", 5.0), ("a", 10.0), ("b", 3.0)).toDF("g", "v")
    val wild = Seq(("a", 5.0), ("a", 1.0e7), ("b", 3.0)).toDF("g", "v")
    val rc = DifferentialPrivacy.releaseBoundedSum(clean, Seq("g"), "v", 0.0, 10.0,
      "dp_sens", "s1", 1.0, insecureDeterministicNoise = true).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    DifferentialPrivacy.reset("dp_sens")
    val rw = DifferentialPrivacy.releaseBoundedSum(wild, Seq("g"), "v", 0.0, 10.0,
      "dp_sens", "s1", 1.0, insecureDeterministicNoise = true).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rc === rw, s"clamping must bound the outlier's influence: $rc vs $rw")
    // inverted bounds refused
    intercept[IllegalArgumentException] {
      DifferentialPrivacy.releaseBoundedSum(clean, Seq("g"), "v", 10.0, 0.0,
        "dp_sens", "s2", 1.0, insecureDeterministicNoise = true)
    }
    DifferentialPrivacy.reset("dp_sens")
  }

  test("user-level DP: removing one whole user moves the release by at most L") {
    import graft.governance.DifferentialPrivacy
    DifferentialPrivacy.reset("dp_user")
    import spark.implicits._
    // user 7 is prolific: present in EVERY group; the cap (L=2) bounds
    // their influence no matter how many groups they touch
    val rows = Seq(
      (1L, "g1"), (1L, "g2"),
      (2L, "g2"), (3L, "g3"),
      (7L, "g1"), (7L, "g2"), (7L, "g3"), (7L, "g4"), (7L, "g4"))
      .toDF("user", "g")
    def release(df: org.apache.spark.sql.DataFrame, id: String) = {
      val out = DifferentialPrivacy.releaseUserCount(
        df, "user", Seq("g"), maxGroupsPerUser = 2, "dp_user", id, 1.0,
        insecureDeterministicNoise = true)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      DifferentialPrivacy.reset("dp_user"); out
    }
    val full = release(rows, "u1")
    val without7 = release(rows.filter($"user" =!= 7L), "u1")
    // same releaseId ⇒ identical per-group noise, so released-value
    // deltas ARE true-count deltas: user 7 may move at most L=2 groups
    // by at most 1 each — the user-level sensitivity bound, observed
    val deltas = (full.keySet ++ without7.keySet).toSeq.map { g =>
      math.abs(full.getOrElse(g, 0.0) - without7.getOrElse(g, 0.0))
    }
    assert(deltas.forall(d => d == 0.0 || math.abs(d - 1.0) < 1e-9),
      s"per-group delta must be 0 or 1: $deltas")
    assert(deltas.sum <= 2.0 + 1e-9,
      s"total influence of one user must be ≤ L=2, got ${deltas.sum}")
    // and the cap actually bit: user 7 touches 4 groups but counts in 2
    assert(math.abs(deltas.sum - 2.0) < 1e-9,
      s"the prolific user should hit the cap: $deltas")
  }

  test("audit flush windows are never retention-pruned: the trail survives many flushes") {
    import graft.governance.ReadAudit
    val root = java.nio.file.Files.createTempDirectory("graft_audit_keep_").toString
    spark.range(3).write.mode("overwrite").parquet(s"$root/ds")
    ReadAudit.reset()
    // 9 flush windows (more than the default keep=7 a snapshot table
    // prunes to): each holds UNIQUE entries, so losing any window is
    // silent audit truncation — every one must survive. The shared
    // session carries GraftExtensions, so the INJECTED check rule audits
    // the read at analysis time; entry COUNT per window is therefore an
    // injection detail — the retention subject pins windows and the
    // uniqueness/order of seqs, not entries-per-read
    (1 to 9).foreach { _ =>
      ReadAudit.install("auditor@x")
      try spark.read.parquet(s"$root/ds").queryExecution.analyzed
      finally ReadAudit.clear()
      assert(ReadAudit.flush(spark, s"$root/lake").isDefined)
    }
    val trail = ReadAudit.flushed(spark, s"$root/lake")
    assert(graft.lake.Lake.versions(spark, s"$root/lake", "audit_log").size === 9,
      "all 9 flush windows must survive — no window auto-pruned")
    assert(trail.count() >= 9 &&
      trail.select("seq").distinct().count() === trail.count(),
      "every flushed entry is unique and none is lost")
  }
}
