package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HASH-BUCKETED snapshot layout — the warehouse trade that makes keyed
  * snapshot-to-snapshot work EXCHANGE-FREE (versionDiff's own note:
  * "with bucketed snapshot writes it would be exchange-free").
  *
  * `bucket_by = '<col>:<N>'` (a table property, set via TBLPROPERTIES like
  * `cluster_by`) makes every policy-respecting write `repartition(N, col)`
  * its batch — Spark's `HashPartitioning`, i.e. `pmod(murmur3(col), N)` —
  * and sort within each bucket file by the key. Two snapshots written this
  * way agree on which file holds any key, so a keyed diff/merge can pair
  * bucket files directly ([[org.apache.spark.sql.graft.BucketedMerge]])
  * instead of shuffling both snapshots: at 100 TB that deletes the two
  * largest exchanges a CDC or branch-merge pipeline pays.
  *
  * The `_buckets.json` sidecar is stamped FROM THE DATA, not from trust:
  * after staging, one key-column-pruned job computes each staged file's
  * min/max bucket id (`pmod(hash(col), N)` — `functions.hash` IS
  * murmur3-seed-42, the same hash `repartition` used, pinned by
  * BucketLayoutSpec); only if every file is single-bucket does the
  * mapping commit. A writer that bypassed the policy (direct
  * `writeTableSnapshot` callers, a COW rewrite that merged buckets)
  * simply produces no mapping and readers fall back to the shuffle path —
  * bucket metadata can never lie about the layout. The job reads one
  * column of the commit's OWN files (O(batch) for appends; for a full
  * republish it is a single-column pass over data the write just
  * shuffled anyway).
  *
  * Like every sidecar here: best-effort CACHE, never truth — absence
  * costs an exchange, never a row.
  */
object BucketLayout {

  val Prop = "bucket_by"

  val sidecarName = "_buckets.json"

  /** Parse `'<col>:<N>'`; None on anything malformed (policy, never an
    * error).
    */
  def spec(props: Map[String, String]): Option[(String, Int)] =
    props.get(Prop).flatMap { v =>
      v.split(":") match {
        case Array(c, n) if c.trim.nonEmpty && n.trim.forall(_.isDigit) &&
          n.trim.nonEmpty && n.trim.toInt > 0 => Some((c.trim, n.trim.toInt))
        case _ => None
      }
    }

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The bucket id expression — MUST stay `pmod(hash(col), N)`:
    * `functions.hash` is Murmur3 with seed 42, exactly
    * `HashPartitioning.partitionIdExpression`, so a `repartition(N, col)`
    * write places each row in the partition this expression names.
    */
  def bucketId(c: String, n: Int): org.apache.spark.sql.Column =
    pmod(hash(col(c)), lit(n))

  /** Stamp `_buckets.json` into a staged commit dir — FROM the staged
    * files' contents (see scaladoc above). Best-effort: callers swallow
    * failures; a mixed-bucket file list writes nothing.
    */
  def stamp(spark: SparkSession, root: String, name: String, stage: Path): Unit =
    spec(Lake.tableProperties(spark, root, name)).foreach { case (c, n) =>
      val f = fs(spark, stage.toString)
      val files = f.listStatus(stage).toSeq.filter { st =>
        val nm = st.getPath.getName
        st.isFile && nm.endsWith(".parquet") && !nm.startsWith("_") && !nm.startsWith(".")
      }.map(_.getPath.toString)
      if (files.isEmpty) return
      val sample = spark.read.parquet(files.head)
      if (!sample.columns.contains(c)) return
      val perFile = spark.read.parquet(files: _*)
        .select(col("_metadata.file_path").as("f"), bucketId(c, n).as("b"))
        .groupBy("f").agg(min("b").as("mn"), max("b").as("mx"))
        .collect()
      if (perFile.exists(r => r.isNullAt(1) || r.getInt(1) != r.getInt(2))) return
      val mapping = perFile.map(r =>
        new Path(r.getString(0)).getName -> r.getInt(1)).toMap
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods
      val ast = ("col" -> c) ~ ("n" -> n) ~
        ("files" -> mapping.map { case (k, v) => k -> v })
      val out = f.create(new Path(stage, sidecarName), true)
      try out.write(JsonMethods.compact(JsonMethods.render(ast))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  /** The version's COMPLETE bucket layout: every snapshot file (manifest
    * references resolved) mapped to its bucket under ONE consistent
    * `(col, N)`, or None (missing sidecar, unmapped file, spec drift —
    * the caller falls back to the shuffle path).
    */
  def layoutOf(
      spark: SparkSession, root: String, name: String,
      version: Int): Option[(String, Int, Map[String, Int])] = try {
    val files = Lake.snapshotFiles(spark, root, name, version)
    if (files.isEmpty) return None
    val byDir = files.groupBy(p => new Path(p).getParent)
    val perDir = byDir.toSeq.map { case (dir, dirFiles) =>
      readSidecar(spark, dir).flatMap { case (c, n, mapping) =>
        val resolved = dirFiles.flatMap { p =>
          mapping.get(new Path(p).getName).map(b => p -> b)
        }
        if (resolved.size == dirFiles.size) Some((c, n, resolved)) else None
      }
    }
    if (perDir.exists(_.isEmpty)) return None
    val all = perDir.flatten
    val specs = all.map { case (c, n, _) => (c, n) }.distinct
    if (specs.size != 1) return None
    val (c, n) = specs.head
    Some((c, n, all.flatMap(_._3).toMap))
  } catch { case scala.util.control.NonFatal(_) => None }

  private def readSidecar(
      spark: SparkSession, dir: Path): Option[(String, Int, Map[String, Int])] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val f = fs(spark, dir.toString)
      val p = new Path(dir, sidecarName)
      if (!f.exists(p)) return None
      val in = f.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val ast = JsonMethods.parse(txt)
      val c = ast \ "col" match { case JString(s) => s; case _ => return None }
      val n = ast \ "n" match { case JInt(i) => i.toInt; case _ => return None }
      val mapping = ast \ "files" match {
        case JObject(fields) => fields.collect {
          case (k, JInt(b)) => k -> b.toInt
        }.toMap
        case _ => return None
      }
      Some((c, n, mapping))
    } catch { case scala.util.control.NonFatal(_) => None }
}
