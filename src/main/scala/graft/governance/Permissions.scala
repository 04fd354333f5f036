package graft.governance

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Permission

/** Permission management (SURVEY.md §2.C4, permissions_manager.py).
  *
  * The reference keeps a MySQL table with a unique key on
  * (user_email, folder_path, permission_type) and upsert-grant semantics;
  * here it is a plain DataFrame (persistable through the lake's versioned
  * table mechanism) with the same unique-key MERGE, and `check` implements
  * the path-prefix read guard the reference documents but never enforces
  * (SURVEY.md §7.4 — kept a checked wrapper, not a Catalyst rule).
  */
object Permissions {

  import Permission.Types

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[Permission].toDF()
  }

  /** Upsert a grant on the unique key (permissions_manager.py:48-59). */
  def grant(
      perms: DataFrame, userEmail: String, folderPath: String,
      permissionType: String, grantedBy: String, grantedAt: Timestamp,
      expiresAt: Option[Date] = None): DataFrame = {
    require(Types.contains(permissionType), s"invalid permission type: $permissionType")
    val spark = perms.sparkSession
    import spark.implicits._
    val update = Seq(Permission(userEmail, folderPath, permissionType,
      grantedBy, grantedAt, expiresAt, is_active = true)).toDF()
    mergeOnUniqueKey(perms, update)
  }

  /** Deactivate (the reference models revocation as is_active=false). */
  def revoke(perms: DataFrame, userEmail: String, folderPath: String,
      permissionType: String): DataFrame =
    perms.withColumn("is_active",
      when(col("user_email") === userEmail
        && col("folder_path") === folderPath
        && col("permission_type") === permissionType, lit(false))
        .otherwise(col("is_active")))

  private def mergeOnUniqueKey(base: DataFrame, update: DataFrame): DataFrame = {
    val tagged = base.withColumn("_src", lit(0)).unionByName(update.withColumn("_src", lit(1)))
    val w = Window
      .partitionBy(col("user_email"), col("folder_path"), col("permission_type"))
      .orderBy(col("_src").desc, col("granted_at").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_src", "_rn")
  }

  /** Normalized folder column: trailing slashes stripped, so a grant on
    * "/data/" (or the root "/") builds the prefix "/data/" (resp. "/")
    * instead of the never-matching "//…". Empty string = root grant.
    */
  private def folderNorm(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "/+$", "")

  private def normPath(p: String) = p.replaceAll("/+$", "")

  /** Prefix-match predicate shared by [[check]] and [[checkBatch]]: the
    * requested path equals the granted folder or sits underneath it.
    */
  private def pathUnder(path: org.apache.spark.sql.Column,
      folder: org.apache.spark.sql.Column) = {
    val nf = folderNorm(folder)
    path === nf || path.startsWith(concat(nf, lit("/")))
  }

  /** Path-prefix access check: active, unexpired (as of `asOf`), and the
    * requested path is under the granted folder. `admin` implies read+write
    * (standard semantics; the reference's ENUM carries no hierarchy, so
    * exact-type match is also honored). Trailing slashes on either side are
    * ignored; a grant on "/" covers every absolute path.
    */
  def check(perms: DataFrame, userEmail: String, path: String,
      permissionType: String, asOf: Date): Boolean = {
    val typeOk = col("permission_type") === permissionType ||
      col("permission_type") === "admin"
    !perms
      .filter(col("user_email") === userEmail && col("is_active") && typeOk)
      .filter(col("expires_at").isNull || col("expires_at") >= lit(asOf))
      .filter(pathUnder(lit(normPath(path)), col("folder_path")))
      .isEmpty
  }

  /** Set-oriented check: evaluate many (user_email, path, ptype) requests in
    * ONE broadcast join against the permissions table — the scalable form of
    * `check` (no per-request driver round-trip). The explicit hint is a
    * growth-class call (SCALE.md §Joins): grants scale with the ORG (users ×
    * feeds — administrative metadata), not with the corpus, so the table
    * stays broadcast-sized at any data volume; the non-equi path-prefix
    * condition would otherwise fall to a nested-loop join.
    */
  def checkBatch(perms: DataFrame, requests: DataFrame, asOf: Date): DataFrame = {
    val p = perms.filter(col("is_active"))
      .filter(col("expires_at").isNull || col("expires_at") >= lit(asOf))
      .select(col("user_email").as("p_email"), col("folder_path"),
        col("permission_type").as("p_type"))
    requests.join(broadcast(p),
        col("user_email") === col("p_email")
          && (col("p_type") === col("ptype") || col("p_type") === "admin")
          && pathUnder(folderNorm(col("path")), col("folder_path")),
        "left_outer")
      .groupBy(col("user_email"), col("path"), col("ptype"))
      .agg((count(col("p_email")) > 0).as("allowed"))
  }

  /** The folder prefixes under which `principal` may READ as of `asOf`
    * (active, unexpired, read- or admin-typed), normalized like
    * [[pathUnder]]'s folder side — the one source of truth the analysis-
    * time [[ReadGuard]] snapshots, so rule enforcement can never drift
    * from `check`/`checkBatch` semantics.
    */
  def readableFolders(perms: DataFrame, principal: String, asOf: Date): Seq[String] =
    perms
      .filter(col("user_email") === principal && col("is_active"))
      .filter(col("permission_type") === "read" || col("permission_type") === "admin")
      .filter(col("expires_at").isNull || col("expires_at") >= lit(asOf))
      .select(folderNorm(col("folder_path"))).collect().map(_.getString(0)).toSeq

  /** Listing ordered by (email, folder) (permissions_manager.py:61-63). */
  def list(perms: DataFrame): DataFrame =
    perms.orderBy(col("user_email"), col("folder_path"), col("permission_type"))
}
