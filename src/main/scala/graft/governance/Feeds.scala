package graft.governance

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.model.{FeedConfig, FeedType, PartitioningType, StorageMode}

/** Feed catalog CRUD (SURVEY.md §2.C5, manage_feeds.py).
  *
  * The reference stores one JSON descriptor per feed under feeds/active or
  * feeds/archived and moves files to archive; here the catalog is an
  * immutable in-memory collection with the SAME on-disk layout behind
  * [[FeedCatalog.save]]/[[FeedCatalog.load]] (one JSON file per feed,
  * directory by status), while in-memory archive is a status flip. All
  * mutations validate enums via the model ADTs and return a new catalog.
  */
case class FeedCatalog(feeds: Map[String, FeedConfig]) {

  /** add (manage_feeds.py:65-139): validates enums, rejects duplicates. */
  def add(cfg: FeedConfig): FeedCatalog = {
    require(!feeds.contains(cfg.name), s"feed already exists: ${cfg.name}")
    FeedCatalog(feeds + (cfg.name -> cfg.validate()))
  }

  /** update (manage_feeds.py:149-188): partial update of mutable fields. */
  def update(name: String, description: Option[String] = None,
      retentionDays: Option[Int] = None,
      retentionVersions: Option[Int] = None): FeedCatalog = {
    val cur = get(name)
    val next = cur.copy(
      description = description.getOrElse(cur.description),
      retentionDays = retentionDays.getOrElse(cur.retentionDays),
      retentionVersions = retentionVersions.getOrElse(cur.retentionVersions))
    FeedCatalog(feeds + (name -> next.validate()))
  }

  def enable(name: String): FeedCatalog = setEnabled(name, value = true)
  def disable(name: String): FeedCatalog = setEnabled(name, value = false)

  private def setEnabled(name: String, value: Boolean): FeedCatalog =
    FeedCatalog(feeds + (name -> get(name).copy(enabled = value)))

  /** archive/restore (manage_feeds.py:190-240): status flip only — the
    * reference moves the descriptor file and preserves its contents, so the
    * enabled flag must survive an archive→restore round-trip. (`active`
    * already excludes archived feeds regardless of enabled.)
    */
  def archive(name: String): FeedCatalog =
    FeedCatalog(feeds + (name -> get(name).copy(status = "archived")))
  def restore(name: String): FeedCatalog =
    FeedCatalog(feeds + (name -> get(name).copy(status = "active")))

  /** delete (manage_feeds.py:242-263): guarded — config only, never data. */
  def delete(name: String, confirm: Boolean): FeedCatalog = {
    require(confirm, s"refusing to delete feed '$name' without confirm=true")
    get(name) // throws if absent
    FeedCatalog(feeds - name)
  }

  def get(name: String): FeedConfig =
    feeds.getOrElse(name, throw new NoSuchElementException(s"unknown feed: $name"))

  def active: Seq[FeedConfig] =
    feeds.values.filter(f => f.status == "active" && f.enabled).toSeq.sortBy(_.name)

  def all: Seq[FeedConfig] = feeds.values.toSeq.sortBy(_.name)
}

object FeedCatalog {
  def empty: FeedCatalog = FeedCatalog(Map.empty)

  /** Persist the catalog as the reference's on-disk layout: ONE JSON
    * descriptor per feed under `feeds/active/` or `feeds/archived/`
    * (manage_feeds.py:107-122; archive there is a file move,
    * manage_feeds.py:190-240). Both directories are rewritten from the
    * catalog, which lands in the same end state as tracking individual
    * moves. Driver-side metadata like the reference's — no Spark job.
    */
  def save(cat: FeedCatalog, root: String): Unit = {
    val base = Paths.get(root, "feeds")
    Seq("active", "archived").foreach { d =>
      val p = base.resolve(d)
      if (Files.exists(p)) listJson(p).foreach(f => Files.delete(f))
      else Files.createDirectories(p)
    }
    cat.all.foreach { f =>
      val dir = if (f.status == "archived") "archived" else "active"
      val json =
        s"""{
           |  "feed_name": "${esc(f.name)}",
           |  "feed_type": "${esc(f.feedType)}",
           |  "source": "${esc(f.source)}",
           |  "description": "${esc(f.description)}",
           |  "partitioning": "${esc(f.partitioning)}",
           |  "storage_mode": "${esc(f.storageMode)}",
           |  "retention_days": ${f.retentionDays},
           |  "retention_versions": ${f.retentionVersions},
           |  "enabled": ${f.enabled},
           |  "status": "${esc(f.status)}"
           |}""".stripMargin
      Files.writeString(base.resolve(dir).resolve(f.name + ".json"), json)
    }
  }

  /** Load a catalog saved by [[save]] — every descriptor re-validates its
    * enums through the model ADTs, so a hand-edited file with an invalid
    * mode fails here, not at first use.
    */
  def load(root: String): FeedCatalog = {
    val base = Paths.get(root, "feeds")
    val files = Seq("active", "archived").map(base.resolve)
      .filter(Files.exists(_))
      .flatMap(listJson)
    files.foldLeft(empty)((cat, f) => cat.add(parseDescriptor(f)))
  }

  /** `Files.list` holds an open directory stream — close it, eagerly
    * materializing first (the iterator is lazy).
    */
  private def listJson(p: Path): Seq[Path] = {
    val st = Files.list(p)
    try st.iterator().asScala.filter(_.toString.endsWith(".json")).toList
    finally st.close()
  }

  // full JSON escape incl. ALL control chars — the descriptor files exist
  // to be read by strict json parsers (the reference's json.load), which
  // reject a raw tab/CR inside a string
  private def esc(s: String): String =
    graft.GraftSession.jsonEscape(s).stripPrefix("\"").stripSuffix("\"")

  private def unesc(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case 'r' => out += '\r'; i += 2
          case 't' => out += '\t'; i += 2
          case 'u' if i + 5 < s.length =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case c => out += c; i += 2
        }
      } else { out += s(i); i += 1 }
    }
    out.toString
  }

  private def parseDescriptor(file: Path): FeedConfig = {
    val text = Files.readString(file)
    def str(k: String): String = {
      val m = ("\"" + k + "\":\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"$file: missing $k"))
      unesc(m.group(1))
    }
    def int(k: String): Int =
      ("\"" + k + "\":\\s*(-?\\d+)").r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"$file: missing $k"))
        .group(1).toInt
    def bool(k: String): Boolean =
      ("\"" + k + "\":\\s*(true|false)").r.findFirstMatchIn(text)
        .getOrElse(throw new IllegalArgumentException(s"$file: missing $k"))
        .group(1).toBoolean
    FeedConfig(
      name = str("feed_name"), feedType = str("feed_type"),
      source = str("source"), description = str("description"),
      partitioning = str("partitioning"), storageMode = str("storage_mode"),
      retentionDays = int("retention_days"),
      retentionVersions = int("retention_versions"),
      enabled = bool("enabled"), status = str("status")).validate()
  }

  /** sync-from-config (manage_feeds.py:265-305): register the reference's
    * configured feeds (data_lake_config.py:46-115) transposed to testdata.
    */
  def builtIn: FeedCatalog = {
    val streams = Seq(
      ("transaction_stream", "raw transaction events", 365),
      ("transaction_flattened", "stream with flattened schema", 365),
      ("transaction_stream_anonymized", "anonymized stream + EUR conversion", 730),
      ("transaction_stream_blacklisted", "transactions of blacklisted cities", 365))
      .map { case (n, desc, days) =>
        FeedConfig(n, FeedType.Stream.name, "kafka", desc,
          PartitioningType.ByDate.name, StorageMode.Append.name,
          retentionDays = days, retentionVersions = 0, enabled = true, status = "active")
      }
    val tables = Seq(
      ("user_transaction_summary", "aggregates per user and type"),
      ("user_transaction_summary_eur", "aggregates per user and type, EUR"),
      ("payment_method_totals", "totals per payment method"),
      ("product_purchase_counts", "purchases per product"))
      .map { case (n, desc) =>
        FeedConfig(n, FeedType.Table.name, "engine", desc,
          PartitioningType.ByVersion.name, StorageMode.Overwrite.name,
          retentionDays = 0, retentionVersions = 7, enabled = true, status = "active")
      }
    (streams ++ tables).foldLeft(empty)(_ add _)
  }
}
