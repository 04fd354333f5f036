package graft.governance

import graft.model.{FeedConfig, FeedType, PartitioningType, StorageMode}

/** Feed catalog CRUD (SURVEY.md §2.C5, manage_feeds.py).
  *
  * The reference stores one JSON descriptor per feed under feeds/active or
  * feeds/archived and moves files to archive; here the catalog is an
  * immutable in-memory collection (persistable as a lake table) and archive
  * is a status flip (SURVEY.md §2.C5: "archive = status column, not file
  * move"). All mutations validate enums via the model ADTs and return a new
  * catalog — callers persist via Lake.writeTableSnapshot when durable.
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
