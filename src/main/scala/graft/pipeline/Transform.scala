package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.ops.{Cleanse, Enrich, Flatten}

/** The reference's Transform step re-expressed on DataFrames
  * (`ET-ETL-DWH-PY312/ETL/Transform.py`): raw nested API payloads →
  * the 17 DWH tables of [[graft.schema.Schemas]].
  *
  * Input contract: one DataFrame per entity with the nested shapes of
  * FIXTURES.md §B (arrays-of-structs children). Every transform is a
  * narrow projection/explode — no shuffle except the default-user
  * anti-join (broadcast, Transform.py:117-127). All timestamp columns
  * are parsed and rounded to the second (Transform.py:131-135,246).
  */
object Transform {

  private def tsClean(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (!d.columns.contains(c)) d
      else d.withColumn(c, Cleanse.tsRoundSec(Cleanse.sentinelDate(col(c))))
    }

  private def hasChild(df: DataFrame, child: String): Boolean =
    df.schema.fields.exists(f => f.name == child && (f.dataType match {
      case ArrayType(_: StructType, _) => true
      case _ => false
    }))

  /** KeyError-guard analog (Transform.py:86-87): entity has no labels
    * configured → empty child table with the right schema.
    */
  private def explodeIfPresent(df: DataFrame, child: String,
                               parentKeys: Seq[(String, String)],
                               renames: Map[String, String]): Option[DataFrame] =
    if (hasChild(df, child)) Some(Flatten.explodeChild(df, child, parentKeys, renames = renames))
    else None

  // ---- base dictionaries (Transform.py:55-163) ----

  /** agents → (agents, agent_group_associations). Transform.py:66-73,141-144. */
  def agents(raw: DataFrame): (DataFrame, DataFrame) = {
    val assoc = Flatten.explodeChild(raw, "groups",
        parentKeys = Seq("id" -> "agent_id"),
        renames = Map("id" -> "group_id"))
      .select("group_id", "agent_id", "start_dt")
    val assocClean = tsClean(assoc, "start_dt")
    val dim = tsClean(
      Cleanse.lenientDrop(raw, Seq("groups", "user", "reactions", "phone_number_aliases")),
      "deactivated_at")
    (dim, assocClean)
  }

  /** categories → (categories, category_labels). Transform.py:76-89. */
  def categories(raw: DataFrame): (DataFrame, Option[DataFrame]) = {
    val labels = explodeIfPresent(raw, "labels",
      parentKeys = Seq("id" -> "category_id"),
      renames = Map("id" -> "label_id"))
      .map(_.select("category_id", "label_id"))
    val dim = tsClean(Cleanse.lenientDrop(raw, Seq("labels")), "created_at", "updated_at")
    (dim, labels)
  }

  /** scorecards → (scorecards, scorecard_categories, scorecard_points).
    * Two-level flatten (Transform.py:92-100).
    */
  def scorecards(raw: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val cats = Flatten.explodeChild(raw, "categories", parentKeys = Seq())
    val points = Flatten.explodeChild(cats, "points", parentKeys = Seq())
    val catsOut = Cleanse.lenientDrop(cats, Seq("points"))
    val dim = Cleanse.lenientDrop(raw, Seq("categories", "team_ids"))
    (dim, catsOut, points)
  }

  /** groups (Transform.py:146), labels (Transform.py:148). */
  def groups(raw: DataFrame): DataFrame =
    Cleanse.lenientDrop(raw, Seq("additional_scorecards"))
  def labels(raw: DataFrame): DataFrame =
    Cleanse.lenientDrop(raw, Seq("color"))

  /** tags → (tags, tag_labels). Transform.py:103-115,149. */
  def tags(raw: DataFrame): (DataFrame, Option[DataFrame]) = {
    val tl = explodeIfPresent(raw, "labels",
      parentKeys = Seq("id" -> "tag_id"),
      renames = Map("id" -> "label_id"))
      .map(_.select("tag_id", "label_id"))
    val dim = tsClean(
      Cleanse.lenientDrop(raw, Seq("labels", "words", "phrases", "color")),
      "archived_at")
    (dim, tl)
  }

  /** users + synthetic "Ender Turing" id=0 row (Transform.py:20-27,117-127,150). */
  def users(raw: DataFrame): DataFrame = {
    val dim = tsClean(
      Cleanse.lenientDrop(raw, Seq("role_ids", "permissions")),
      "invite_expires")
    val default = dim.sparkSession.range(1).select(
      lit(0).cast(dim.schema("id").dataType).as("id"),
      lit("Ender Turing").as("full_name"))
    Enrich.withDefaultRows(dim, default, "id")
  }

  // ---- sessions + children (Transform.py:166-297) ----

  final case class SessionTables(
      sessions: DataFrame,
      tags: DataFrame,
      categories: DataFrame,
      reviewers: DataFrame,
      scores: Option[DataFrame],
      comments: DataFrame,
      summaries: DataFrame,
      crmStatuses: DataFrame)

  private val sessionChildren = Seq(
    "tags", "categories", "reviewers", "scores", "comments", "summary", "crm_statuses")

  def sessions(raw: DataFrame): SessionTables = {
    // sessions_tags: two-level tags[].match[] (Transform.py:184-192);
    // match rows already carry tag_id; rename tag_session_id→session_id
    val sessTags = Flatten.explodeChild2(raw, "tags", "match",
        parentKeys = Seq("id" -> "session_id"),
        childCarry = Seq())
      .drop("tag_session_id")

    val sessCats = Flatten.explodeChild(raw, "categories",
        parentKeys = Seq("id" -> "session_id"),
        renames = Map("id" -> "category_id"))

    val sessReviewers = tsClean(
      Flatten.explodeChild(raw, "reviewers",
        parentKeys = Seq("id" -> "session_id"),
        renames = Map("id" -> "reviewer_id")),
      "last_reviewed_at")

    // scores may be absent when the extract skipped the detail fetch
    // (Transform.py:205-207: dump debug + skip)
    val sessScores =
      if (!hasChild(raw, "scores")) None
      else Some {
        val lvl1 = raw.select(explode(col("scores")).as("__s")).select("__s.*")
        Flatten.explodeChild(lvl1, "point_scores",
          parentKeys = Seq("session_id" -> "session_id",
            "scorecard_id" -> "scorecard_id", "reviewer_id" -> "reviewer_id"))
      }

    // comments carry their JSON-array position: the warehouse key is
    // session_id ALONE (_sessions_comments_uc), so the loader needs a
    // deterministic "later row wins" order to mirror the reference's
    // sequential per-row merge — array order IS that order
    val sessComments = raw
      .select(col("id").as("session_id"),
        posexplode(col("comments")).as(Seq("comment_pos", "__c")))
      .select(col("session_id"), col("comment_pos"),
        col("__c.author_id").as("author_id"), col("__c.text").as("text"))

    val sessSummaries = Flatten.explodeChild(raw, "summary",
        parentKeys = Seq("id" -> "session_id"))
      .select("session_id", "text")

    val sessCrm = Flatten.explodeChild(raw, "crm_statuses",
        parentKeys = Seq("id" -> "session_id"))
      .select("session_id", "crm_status")

    // the fact row: drop children + the projection-contract fields
    // (Transform.py:268-282), salvage-parse + round start_dt
    // (Transform.py:245-266)
    val fact0 = Cleanse.lenientDrop(raw,
      sessionChildren ++ graft.schema.Schemas.droppedSessionFields)
    val fact = fact0.withColumn("start_dt",
      Cleanse.tsRoundSec(Cleanse.tsParseSalvaged(col("start_dt").cast("string"))))

    SessionTables(Cleanse.nanToNullAll(fact), sessTags, sessCats, sessReviewers,
      sessScores, sessComments, sessSummaries, sessCrm)
  }
}
