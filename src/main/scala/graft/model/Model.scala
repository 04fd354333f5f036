package graft.model

/** Core data model (SURVEY.md §1): the reference's implicit enums/configs
  * (data_lake_config.py:10-26, manage_feeds.py:107-122) made explicit as
  * sealed ADTs + case classes.
  */
sealed trait FeedType { def name: String }
object FeedType {
  case object Stream extends FeedType { val name = "stream" }
  case object Table extends FeedType { val name = "table" }
  val all: Seq[FeedType] = Seq(Stream, Table)
  def parse(s: String): FeedType = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"unknown feed type: $s"))
}

/** Write semantics (data_lake_config.py:10-14) — exactly Spark's SaveMode. */
sealed trait StorageMode { def name: String }
object StorageMode {
  case object Append extends StorageMode { val name = "append" }
  case object Overwrite extends StorageMode { val name = "overwrite" }
  case object Ignore extends StorageMode { val name = "ignore" }
  val all: Seq[StorageMode] = Seq(Append, Overwrite, Ignore)
  def parse(s: String): StorageMode = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"unknown storage mode: $s"))
}

/** Physical partitioning (data_lake_config.py:141-148). */
sealed trait PartitioningType { def name: String }
object PartitioningType {
  case object ByDate extends PartitioningType { val name = "date" }
  case object ByVersion extends PartitioningType { val name = "version" }
  val all: Seq[PartitioningType] = Seq(ByDate, ByVersion)
  def parse(s: String): PartitioningType = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"unknown partitioning: $s"))
}

/** Feed descriptor (manage_feeds.py:107-122): one registered dataset. */
case class FeedConfig(
    name: String,
    feedType: String,          // FeedType.name
    source: String,
    description: String,
    partitioning: String,      // PartitioningType.name
    storageMode: String,       // StorageMode.name
    retentionDays: Int,        // streams (data_lake_config.py:52)
    retentionVersions: Int,    // tables (data_lake_config.py:88)
    enabled: Boolean,
    status: String) {          // active | archived (manage_feeds.py:190-240)
  def validate(): FeedConfig = {
    FeedType.parse(feedType); StorageMode.parse(storageMode)
    PartitioningType.parse(partitioning)
    // the name doubles as the descriptor FILENAME (manage_feeds.py writes
    // feeds/active/<name>.json) — a separator or dot-dot would escape the
    // catalog directory
    require(name.matches("[A-Za-z0-9._-]+") && name != "." && name != "..",
      s"feed name must be filesystem-safe: '$name'")
    require(status == "active" || status == "archived",
      s"unknown feed status: $status")
    this
  }
}

/** Permission record (permissions_manager.py:18-30). */
case class Permission(
    user_email: String,
    folder_path: String,
    permission_type: String,   // read | write | admin
    granted_by: String,
    granted_at: java.sql.Timestamp,
    expires_at: Option[java.sql.Date],
    is_active: Boolean)

object Permission {
  val Types: Seq[String] = Seq("read", "write", "admin")
}
