package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{DotProductD, HyperplaneSignature, ProductMod, TopKPerKeyStrategy}

/** SparkSessionExtensions entry point. Every slice of the extension API is
  * exercised (function/aggregate/generator registration, optimizer rules,
  * planner strategy, check rule, parser):
  *
  *  - '''function registration''': the native vector expressions, the
  *    [[org.apache.spark.sql.graft.ProductMod]] declarative aggregate and
  *    the [[org.apache.spark.sql.graft.NGramsGenerator]] generator (UDTF),
  *    so the pure-SQL front-end can call them
  *    (`SELECT graft_dot(a, b)`, `LATERAL VIEW graft_ngrams(text, 3)`);
  *  - '''optimizer rules''': [[RewriteDotProduct]] (HOF dot-product → the
  *    codegen'd native expression), the
  *    [[graft.warehouse.SummaryRewrite]] materialized-view rewrite
  *    (aggregates over a registered base table re-pointed at its
  *    pre-aggregated summary when answer-preserving), and
  *    [[graft.governance.ColumnMask]] (scan-fused pseudonym/redact
  *    projections over protected paths);
  *  - '''planner strategy''': [[org.apache.spark.sql.graft.TopKPerKeyStrategy]],
  *    which plans the whole-operator top-k-per-key logical node as a
  *    partial/final physical pair (the custom-SparkPlan extension path);
  *  - '''check rule''': [[graft.governance.ReadGuard]], which enforces the
  *    C4 permission catalog against every analyzed plan's file-backed
  *    relations while a principal is installed (analysis-time row-level
  *    security — queries over unauthorized paths fail before execution);
  *  - '''parser''': [[GraftSqlParser]], the delegating parser adding
  *    `SHOW GRAFT VIEWS` while forwarding all other SQL verbatim;
  *  - '''columnar rule''': [[org.apache.spark.sql.graft.GraftColumnarRule]],
  *    a vectorized pre-filter compacting the DSv2 connector's batches
  *    before the columnar→row transition (residual filter preserved).
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * at session build (honored only when the SparkContext is created) or
  * programmatically via `SparkSession.builder().withExtensions(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    // materialized-view rewrite: aggregates over a registered base table
    // are re-pointed at its pre-aggregated summary when answer-preserving
    // (no-op until a view is registered via warehouse.SummaryRewrite.create)
    ext.injectOptimizerRule(session => graft.warehouse.SummaryRewrite.rule(session))
    // column-level masking: reads of protected paths get pseudonym/redact
    // projections (no-op until policies are installed via ColumnMask.install)
    ext.injectOptimizerRule(session => graft.governance.ColumnMask.rule(session))
    // row-level security: reads of protected paths get the policy predicate
    // appended at the scan leaf (no-op until installed via RowFilter.install)
    ext.injectOptimizerRule(session => graft.governance.RowFilter.rule(session))
    // file-granular routing for SQL UPDATE/MERGE on graft catalog tables:
    // supported shapes commit through CopyOnWrite (touched files only);
    // everything else falls through to the group-based replace
    // the early half marks UPDATE/MERGE before resolution starts (hint
    // stage) so the built-in group-based rewrite cannot claim a routable
    // statement first; the late half strips the mark and routes or falls
    // back — see CowRoutePending for the ordering story
    ext.injectHintResolutionRule(session =>
      org.apache.spark.sql.graft.CowRouteMark(session))
    ext.injectResolutionRule(session =>
      org.apache.spark.sql.graft.CowRowLevelRewrite(session))
    // parser extension: SHOW GRAFT VIEWS (everything else delegated verbatim)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // analysis-time permission enforcement (no-op until a principal is
    // installed via governance.ReadGuard.install)
    ext.injectCheckRule(graft.governance.ReadGuard.checkRule)
    // analysis-time read AUDITING (no-op until a principal is installed
    // via governance.ReadAudit.install)
    ext.injectCheckRule(graft.governance.ReadAudit.checkRule)
    // columnar rule: vectorized pre-filter compacts the DSv2 connector's
    // batches BEFORE the columnar→row transition (residual filter kept)
    ext.injectColumnar(session =>
      new org.apache.spark.sql.graft.GraftColumnarRule(session))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_dot expects exactly 2 arguments")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_product_mod"),
      new ExpressionInfo(classOf[ProductMod].getName, "graft_product_mod"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "graft_product_mod expects 1 argument")
        // returning the AggregateFunction itself: the analyzer wraps it in
        // an AggregateExpression exactly as for the built-in aggregates
        ProductMod(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.NGramsGenerator].getName, "graft_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_ngrams expects exactly 2 arguments")
        // a Generator: the analyzer plans it via Generate (LATERAL VIEW /
        // select-position), same as the built-in explode family
        org.apache.spark.sql.graft.NGramsGenerator(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "graft_hyperplane_sig expects 1 argument")
        // SQL surface uses a small fixed matrix from the one shared
        // generator; the typed API takes the caller's matrix
        HyperplaneSignature(children.head, graft.ext.Similarity.planeMatrix(8))
      }))
    // TABLE-VALUED FUNCTION `table_changes(...)` — the pure-SQL CDF
    // surface (the Delta TVF shape): `spark.read` options cannot be
    // expressed in SQL text, so incremental CDF would otherwise be
    // API-only. Foldable-literal arguments; the returned plan is the
    // change feed's own resolved plan, so ReadGuard/ReadAudit see every
    // underlying scan — the TVF cannot launder a denied read.
    //   table_changes('<catalog>.<ns>.<table>', start)                -- start=0: snapshot
    //   table_changes('<cat>.<ns>.<t>', start, 'k1,k2')               -- incremental
    //   table_changes('<cat>.<ns>.<t>', start, end, 'k1,k2')          -- bounded
    //   table_changes('<cat>.<ns>.<t>', start, 'k1,k2', true)          -- preimages
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.GraftExtensions", "table_changes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def lit(i: Int): Any = children(i) match {
          case l: Literal => l.value
          case e => throw new IllegalArgumentException(
            s"table_changes: argument ${i + 1} must be a literal, got $e")
        }
        def str(i: Int): String = lit(i) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"table_changes: argument ${i + 1} must be a string, got $other")
        }
        def int(i: Int): Int = lit(i) match {
          case n: Int => n
          case n: Long => n.toInt
          case other => throw new IllegalArgumentException(
            s"table_changes: argument ${i + 1} must be an integer version, got $other")
        }
        require(children.size >= 2 && children.size <= 5,
          "table_changes('<cat>.<ns>.<table>', start [, end] [, 'k1,k2'] [, preimages])")
        val parts = str(0).split('.')
        require(parts.length >= 2,
          s"table_changes: '${str(0)}' must be '<catalog>.[<ns>.]<table>'")
        val (cat, table) = (parts.head, parts.last)
        val spark = org.apache.spark.sql.SparkSession.active
        val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root")
          .getOrElse(throw new IllegalArgumentException(
            s"table_changes: '$cat' is not a configured graft catalog"))
        val start = int(1)
        // trailing arguments disambiguate by type: integer =
        // endingVersion, string = keyColumns, boolean = preimages
        // (Delta-CDF-shaped update_preimage/update_postimage emission).
        // Each slot may be filled ONCE — a second argument of the same
        // type is a malformed call (e.g. table_changes(t, 1, 2, 3)), not
        // a silent last-wins overwrite
        var end: Option[Int] = None
        var keys: Option[Seq[String]] = None
        var preimages: Option[Boolean] = None
        def once[T](slot: Option[T], what: String, v: T): Option[T] = {
          require(slot.isEmpty,
            s"table_changes: duplicate $what argument (already ${slot.get}, got $v)")
          Some(v)
        }
        children.drop(2).zipWithIndex.foreach { case (_, j) =>
          lit(j + 2) match {
            case n: Int => end = once(end, "endingVersion", n)
            case n: Long => end = once(end, "endingVersion", n.toInt)
            case b: Boolean => preimages = once(preimages, "preimages", b)
            case s: org.apache.spark.unsafe.types.UTF8String =>
              keys = once(keys, "keyColumns",
                s.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            case other => throw new IllegalArgumentException(
              s"table_changes: unexpected argument $other")
          }
        }
        val upper = end.getOrElse(
          graft.lake.Lake.latestVersion(spark, root, table).getOrElse(0))
        org.apache.spark.sql.graft.GraftChangeFeed
          .changesBetween(spark, root, table, keys.getOrElse(Nil), start, upper,
            preimages.getOrElse(false))
          .queryExecution.logical
      }))
    // TABLE-VALUED FUNCTION `table_diff(...)` — the NET two-version diff
    // in pure SQL: `table_changes` replays every commit in a range (one
    // change set per version — a key updated five times appears five
    // times), while `table_diff` collapses the endpoints into one keyed
    // change set (the same manifest-aware [[graft.lake.Lake
    // .versionChanges]] step: only dropped+added files and sidecar-delta
    // rows of carried ones open; bucketed endpoint pairs diff
    // exchange-free). Same plan-transparency property: the builder
    // returns the diff's own resolved plan, so ReadGuard/ReadAudit see
    // every underlying scan.
    // Endpoints take versions OR timestamp strings, resolved through the
    // commit-instant ledger with the CDF options' own rules: the OLD
    // endpoint like `startingTimestamp` (newest commit STRICTLY BEFORE the
    // instant — the diff then covers every change made at-or-after it) and
    // the NEW endpoint like `endingTimestamp` (newest commit AT-OR-BEFORE,
    // the TIMESTAMP-AS-OF rule), with the same predates-first-commit
    // refusals.
    //   table_diff('<cat>.<ns>.<table>', vOld, vNew, 'k1,k2')
    //   table_diff('<cat>.<ns>.<t>', '2026-01-01 00:00:00', '2026-02-01 00:00:00', 'k')
    ext.injectTableFunction((
      FunctionIdentifier("table_diff"),
      new ExpressionInfo("graft.GraftExtensions", "table_diff"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        def lit(i: Int): Any = children(i) match {
          case l: Literal => l.value
          case e => throw new IllegalArgumentException(
            s"table_diff: argument ${i + 1} must be a literal, got $e")
        }
        def str(i: Int): String = lit(i) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"table_diff: argument ${i + 1} must be a string, got $other")
        }
        def int(i: Int): Int = lit(i) match {
          case n: Int => n
          case n: Long => n.toInt
          case other => throw new IllegalArgumentException(
            s"table_diff: argument ${i + 1} must be an integer version, got $other")
        }
        require(children.size == 4,
          "table_diff('<cat>.<ns>.<table>', vOld, vNew, 'k1,k2')")
        val parts = str(0).split('.')
        require(parts.length >= 2,
          s"table_diff: '${str(0)}' must be '<catalog>.[<ns>.]<table>'")
        val (cat, table) = (parts.head, parts.last)
        val spark = org.apache.spark.sql.SparkSession.active
        val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root")
          .getOrElse(throw new IllegalArgumentException(
            s"table_diff: '$cat' is not a configured graft catalog"))
        val keys = str(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        def endpoint(i: Int, old: Boolean): Int = lit(i) match {
          case _: org.apache.spark.unsafe.types.UTF8String =>
            // an all-digit STRING would silently parse as epoch millis
            // ('2' → 1970-01-01T00:00:00.002Z) and fail with a confusing
            // "predates first commit" — the user almost certainly meant a
            // version number, so say exactly that
            if (str(i).forall(_.isDigit)) throw new IllegalArgumentException(
              s"table_diff: endpoint '${str(i)}' is all digits — pass it as an " +
                "integer VERSION (unquoted), or as a real timestamp string " +
                "(e.g. '2024-01-01T00:00:00Z'); quoted digit strings are not " +
                "interpreted to avoid the version/epoch-millis ambiguity")
            else if (old) org.apache.spark.sql.graft.GraftChangeFeed
              .versionStrictlyBefore(spark, root, table, str(i))
            else org.apache.spark.sql.graft.GraftChangeFeed
              .versionAtOrBefore(spark, root, table, str(i))
          case _ => int(i)
        }
        graft.lake.Lake
          .versionChanges(spark, root, table,
            endpoint(1, old = true), endpoint(2, old = false), keys)
          .queryExecution.logical
      }))
  }
}
