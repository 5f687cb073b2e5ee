package graft.pipeline

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.ops.Upsert
import graft.schema.Schemas
import graft.sync.Incremental

/** End-to-end orchestration of the reference's daily sync
  * (`ET-ETL-DWH-PY312/run-et-etl.py:119-204`): dims first (facts carry
  * FKs into them), then facts, then the watermark — all landing in a
  * parquet warehouse directory via keyed source-wins upsert.
  *
  * The reference's per-row SQL loop (Load.py:102-162) becomes one
  * distributed merge per table; its sequential phase ordering stays an
  * orchestration-layer concern (dims → facts), exactly as SURVEY.md §3
  * prescribes.
  */
final class EtlPipeline(spark: SparkSession, warehouseDir: String) {

  private def tablePath(name: String) = s"$warehouseDir/$name"

  /** Merge one table batch into the warehouse. Key columns come from the
    * schema's unique constraints (utils.py:247-253); incoming columns are
    * reconciled against the declared schema (Load.py:91-99) when one is
    * declared for the table.
    */
  def loadTable(name: String, batch: DataFrame): Unit = {
    val keys = Schemas.upsertKeys.getOrElse(name, Seq("id"))
    val reconciled = Schemas.all.get(name) match {
      case Some(schema) =>
        val target = schema.fieldNames.toSeq
        val named = Upsert.reconcileSchema(batch, target, keys).df
        // cast to the declared catalog types (schema-on-read JSON gives
        // long/double where the DWH declares int/float; ANSI cast keeps
        // overflow loud). JSON-shaped columns need mediation: schema-
        // on-read infers struct where the catalog declares map (dynamic
        // keys like duration_details '0'/'1') or an opaque JSON string
        // (additional_info) — both go through to_json.
        import org.apache.spark.sql.functions.{col, from_json, to_json}
        import org.apache.spark.sql.types.{DataType, MapType, StringType, StructType, ArrayType}
        def convert(c: String, src: DataType, tgt: DataType) = (src, tgt) match {
          case (s, t) if s == t => col(c)
          case (_: StructType | _: MapType | _: ArrayType, StringType) => to_json(col(c))
          case (_: StructType, m: MapType) => from_json(to_json(col(c)), m)
          case _ => col(c).cast(tgt)
        }
        named.select(named.columns.map { c =>
          convert(c, named.schema(c).dataType, schema(c).dataType).as(c)
        }.toIndexedSeq: _*)
      case None => batch
    }
    Schemas.partitionedFacts.get(name) match {
      case Some((srcCol, pCol)) if reconciled.columns.contains(srcCol) =>
        loadPartitioned(name, reconciled, keys, srcCol, pCol)
      case _ =>
        loadFullRewrite(name, reconciled, keys, partitionCol = None)
    }
  }

  /** O(delta) fact load: derive the date partition column and merge only
    * the date partitions the batch touches (§7.4: a daily sessions sync
    * at 100 TB must not rewrite 100 TB). A pre-partitioning warehouse
    * (no partition column on disk) is migrated once through the
    * full-rewrite swap path, written partitioned from then on.
    *
    * CRASH SAFETY: unlike raw dynamic partition overwrite (whose commit
    * deletes a partition's old files before the new ones land — a crash
    * window where that partition's data is simply GONE), the merged
    * delta is staged to `<table>.__delta` with its _SUCCESS marker and
    * then swapped in PER PARTITION with the same rename-old-aside
    * protocol as [[swapWrite]]: every crash window leaves each touched
    * partition either old, or new, or old-renamed-to-`.graft_old_*`
    * (which [[recoverPartitionSwaps]] restores on the next load). Backup
    * dirs carry a leading dot so Spark's file listing never reads them
    * (an underscore prefix is NOT enough: a dir containing `=` is still
    * parsed as a partition column and conflicts). A leftover stage dir is deleted, not replayed — the
    * upsert is idempotent and the next sync regenerates it.
    */
  private def loadPartitioned(name: String, batch: DataFrame, keys: Seq[String],
                              srcCol: String, pCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, to_date}
    val path = tablePath(name)
    recoverInterruptedSwap(path)
    recoverPartitionSwaps(path)
    val withP = batch.withColumn(pCol, to_date(col(srcCol)))
    val needsMigration =
      pathExists(path) && !spark.read.parquet(path).columns.contains(pCol)
    if (needsMigration) {
      // one-time migration of a pre-partitioning warehouse: derive the
      // partition column on the existing table too, full merge, swap
      val existing = spark.read.parquet(path)
        .withColumn(pCol, to_date(col(srcCol)))
      val merged = Upsert.upsert(existing,
        withP.select(existing.columns.map(col).toIndexedSeq: _*), keys)
      swapWrite(path, merged, partitionCol = Some(pCol))
      return
    }
    val fs = hadoopFs
    val stage = s"$path.__delta"
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    if (!pathExists(path)) {
      // first write: plain partitioned table via the swap (atomic)
      swapWrite(path, withP, partitionCol = Some(pCol))
      return
    }
    // merge against ONLY the touched partitions (null partition values
    // included — isin alone would skip them), stage the result
    val touched = withP.select(col(pCol)).distinct().collect().map(_.get(0))
    val (nullTouched, valsTouched) = touched.partition(_ == null)
    val pred = {
      val in =
        if (valsTouched.nonEmpty)
          Some(col(pCol).isin(valsTouched.toIndexedSeq: _*))
        else None
      val nl = if (nullTouched.nonEmpty) Some(col(pCol).isNull) else None
      (in ++ nl).reduceOption(_ || _)
        .getOrElse(org.apache.spark.sql.functions.lit(false))
    }
    val existing = spark.read.parquet(path).filter(pred)
    val merged = Upsert.upsert(existing,
      withP.select(existing.columns.map(col).toIndexedSeq: _*), keys)
    merged.write.mode(SaveMode.Overwrite).partitionBy(pCol).parquet(stage)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$stage/_SUCCESS")),
      s"staged delta for $name is missing its _SUCCESS marker")
    // swap each staged partition into the live table, old renamed aside
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    staged.foreach { st =>
      val pname = st.getPath.getName
      val dst = new org.apache.hadoop.fs.Path(s"$path/$pname")
      val old = new org.apache.hadoop.fs.Path(s"$path/.graft_old_$pname")
      fs.delete(old, true)
      if (fs.exists(dst)) renameOrDie(fs, dst, old)
      renameOrDie(fs, st.getPath, dst)
      fs.delete(old, true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** Heal partition swaps interrupted mid-flight: a `.graft_old_<p>` backup
    * beside a missing live partition is restored; beside a live one it
    * is garbage-collected.
    */
  private def recoverPartitionSwaps(path: String): Unit = {
    if (!pathExists(path)) return
    val fs = hadoopFs
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".graft_old_"))
      .foreach { st =>
        val live = new org.apache.hadoop.fs.Path(
          s"$path/${st.getPath.getName.stripPrefix(".graft_old_")}")
        if (!fs.exists(live)) renameOrDie(fs, st.getPath, live)
        else fs.delete(st.getPath, true)
      }
  }

  private def loadFullRewrite(name: String, reconciled: DataFrame,
                              keys: Seq[String], partitionCol: Option[String]): Unit = {
    val path = tablePath(name)
    recoverInterruptedSwap(path)
    // existence is checked explicitly — a transient READ failure must
    // abort the merge, not silently replace the table with the batch
    val existing =
      if (pathExists(path)) Some(spark.read.parquet(path)) else None
    // GUARDRAIL: a full-table rewrite is O(table), not O(delta) — at
    // warehouse scale a daily sync through this path rewrites the whole
    // table every day. Tables above the size threshold REFUSE the
    // rewrite (register a partition column in Schemas.partitionedFacts,
    // which routes through the O(delta) loadPartitioned) unless the
    // caller explicitly forces it (a deliberate one-off, e.g. a schema
    // backfill). Threshold on the EXISTING table's on-disk bytes —
    // known before any work starts, no extra Spark job.
    existing.foreach { _ =>
      val bytes = hadoopFs.getContentSummary(
        new org.apache.hadoop.fs.Path(path)).getLength
      val maxBytes = spark.conf
        .get("spark.graft.etl.maxFullRewriteBytes", (64L << 30).toString).toLong
      val forced = spark.conf
        .get("spark.graft.etl.forceFullRewrite", "false").toBoolean
      if (bytes > maxBytes && !forced)
        throw new IllegalStateException(
          s"loadTable($name): full-table rewrite of $bytes bytes exceeds " +
            s"spark.graft.etl.maxFullRewriteBytes=$maxBytes. Register " +
            s"'$name' in Schemas.partitionedFacts for the O(delta) " +
            "partitioned merge, or set " +
            "spark.graft.etl.forceFullRewrite=true for a deliberate one-off.")
    }
    val merged = existing match {
      case Some(t) if t.columns.sameElements(reconciled.columns) =>
        Upsert.upsert(t, reconciled, keys)
      case Some(t) =>
        Upsert.upsert(t, reconciled.select(t.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*), keys)
      case None => reconciled
    }
    swapWrite(path, merged, partitionCol)
  }

  /** Rewrite via temp dir: Spark can't overwrite a path it is reading.
    * Swap order matters for crash safety: the old table is RENAMED
    * aside (not deleted) before the new one moves in, so every crash
    * window leaves either the old table, or a recoverable __new with
    * its _SUCCESS marker — never nothing (recoverInterruptedSwap picks
    * these up on the next run).
    */
  private def swapWrite(path: String, merged: DataFrame,
                        partitionCol: Option[String]): Unit = {
    val tmp = s"$path.__new"
    val writer = merged.write.mode(SaveMode.Overwrite)
    partitionCol.fold(writer)(c => writer.partitionBy(c)).parquet(tmp)
    val fs = hadoopFs
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(s"$path.__old")
    fs.delete(old, true)
    if (fs.exists(dst)) renameOrDie(fs, dst, old)
    renameOrDie(fs, new org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(old, true)
  }

  /** Heal a swap interrupted mid-flight: a completed __new (has
    * _SUCCESS) with no live table is promoted; a leftover __old beside
    * a live table is garbage-collected; an orphaned __old with NO live
    * table is restored.
    */
  private def recoverInterruptedSwap(path: String): Unit = {
    val fs = hadoopFs
    val dst = new org.apache.hadoop.fs.Path(path)
    val neu = new org.apache.hadoop.fs.Path(s"$path.__new")
    val old = new org.apache.hadoop.fs.Path(s"$path.__old")
    if (!fs.exists(dst)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$path.__new/_SUCCESS"))) {
        renameOrDie(fs, neu, dst) // crash after old moved aside, before promote
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        renameOrDie(fs, old, dst) // crash before a complete __new existed
      }
    } else {
      fs.delete(old, true)
      fs.delete(neu, true)
    }
  }

  private def hadoopFs =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Hadoop FileSystem.rename reports most failures by RETURNING FALSE
    * (missing src, missing dst parent, quota, cross-FS), not throwing —
    * an unchecked rename inside a swap protocol can cascade into
    * deleting the only surviving copy. Every swap rename goes through
    * here and aborts loudly instead.
    */
  private def renameOrDie(fs: org.apache.hadoop.fs.FileSystem,
                          src: org.apache.hadoop.fs.Path,
                          dst: org.apache.hadoop.fs.Path): Unit =
    require(fs.rename(src, dst), s"rename failed: $src -> $dst")

  def readTable(name: String): DataFrame = spark.read.parquet(tablePath(name))

  /** Post-load integrity audit over every materialized table: key
    * uniqueness + null keys per the declared constraints
    * (schema.py uniques → [[Schemas.upsertKeys]]). Empty violations on
    * a healthy warehouse; the reference's dry-run validator analog
    * (Load.py:33-60) running against the store instead of the payload.
    */
  def auditHealth(): Seq[graft.ops.Validate.TableHealth] =
    Schemas.upsertKeys.keys.toSeq.sorted
      .filter(tableExists)
      .map(n => graft.ops.Validate.health(n, readTable(n), Schemas.upsertKeys(n)))

  def tableExists(name: String): Boolean = pathExists(tablePath(name))

  private def pathExists(path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(path))
  }

  /** Base-dictionaries phase (run-et-etl.py:13-29). */
  def syncBaseDicts(raw: Map[String, DataFrame]): Unit = {
    raw.get("agents").foreach { a =>
      val (dim, assoc) = Transform.agents(a)
      loadTable("agents", dim); loadTable("agent_group_associations", assoc)
    }
    raw.get("scorecards").foreach { sc =>
      val (dim, cats, points) = Transform.scorecards(sc)
      loadTable("scorecards", dim)
      loadTable("scorecard_categories", cats)
      loadTable("scorecard_points", points)
    }
    raw.get("groups").foreach(g => loadTable("groups", Transform.groups(g)))
    raw.get("labels").foreach(l => loadTable("labels", Transform.labels(l)))
    raw.get("categories").foreach { c =>
      val (dim, labels) = Transform.categories(c)
      loadTable("categories", dim)
      labels.foreach(loadTable("category_labels", _))
    }
    raw.get("tags").foreach { tg =>
      val (dim, tl) = Transform.tags(tg)
      loadTable("tags", dim)
      tl.foreach(loadTable("tag_labels", _))
    }
    raw.get("users").foreach(u => loadTable("users", Transform.users(u)))
  }

  /** Sessions phase (run-et-etl.py:32-63). Empty extract short-circuits
    * (run-et-etl.py:54-55 — intent, not the truthy-string bug).
    */
  def syncSessions(rawSessions: DataFrame): Unit = {
    if (rawSessions.isEmpty) return
    val t = Transform.sessions(rawSessions)
    loadTable("sessions", t.sessions)
    loadTable("sessions_tags", t.tags)
    loadTable("sessions_categories", t.categories)
    loadTable("sessions_reviewers", t.reviewers)
    t.scores.foreach(loadTable("sessions_scores", _))
    // key is session_id only: a session with several comments would put
    // duplicate keys in one batch, violating upsert's precondition —
    // keep the LAST comment by array position (the reference's
    // sequential merge lands on the same row)
    loadTable("sessions_comments",
      Upsert.dedupLastWins(t.comments, Seq("session_id"), "comment_pos")
        .drop("comment_pos"))
    loadTable("sessions_summaries", t.summaries)
    loadTable("sessions_crm_statuses", t.crmStatuses)
  }

  /** Full daily run (EP1): dims → facts → watermark. */
  def runDaily(rawDicts: Map[String, DataFrame], rawSessions: DataFrame,
               watermarkPath: String, now: LocalDateTime): Unit = {
    syncBaseDicts(rawDicts)
    syncSessions(rawSessions)
    Incremental.writeWatermark(watermarkPath, now)
  }

  /** EP1 step 5 — the incremental late-data pass (run-et-etl.py:66-116):
    *
    *  1. re-upsert sessions in `rawWindow` that carry manual scores
    *     ("is_scored,manual" filter: late QA reviews appear days after
    *     the conversation, run-et-etl.py:84-93);
    *  2. re-upsert sessions whose categories changed since the last
    *     watermark (`updated_at`-driven invalidation,
    *     run-et-etl.py:95-106) — here: sessions referencing a changed
    *     category id.
    *
    * `rawWindow` IS the trailing re-extract: the caller bounds it (the
    * reference bounds at the source with a 30-day date filter; build the
    * predicate with [[Incremental.resyncWindow]] — with partition
    * pruning that re-read is O(window)). Both passes are plain upserts,
    * so re-running is idempotent.
    */
  def runIncremental(
      rawWindow: DataFrame,
      watermarkPath: String,
      now: LocalDateTime,
      since: Option[LocalDateTime] = None): Unit = {
    import org.apache.spark.sql.functions.{col, size => asize}
    // `since` lets a caller that already advanced the watermark (e.g.
    // runDaily earlier in the same run) pass the PREVIOUS sync point —
    // reading the file after runDaily wrote `now` would make the
    // changed-category pass a permanent no-op
    val wm = since.getOrElse(Incremental.readWatermark(watermarkPath))

    // pass 1: manually-scored sessions in the window
    val manual = rawWindow.filter(asize(col("reviewers")) > 0)
    syncSessions(manual)

    // pass 2: sessions of categories updated since the watermark
    // (skipped when no categories dimension was ever loaded)
    if (!tableExists("categories")) {
      Incremental.writeWatermark(watermarkPath, now)
      return
    }
    val changedCats = Incremental.newerThan(
      readTable("categories"), "updated_at", wm).select(col("id"))
    val catRows = rawWindow
      .select(col("id").as("__sid"),
        org.apache.spark.sql.functions.explode(col("categories")).as("__c"))
      .select(col("__sid"), col("__c.id").as("__cid"))
    val invalidated = catRows
      .join(org.apache.spark.sql.functions.broadcast(changedCats),
        catRows("__cid") === changedCats("id"), "left_semi")
      .select(col("__sid")).distinct()
    val toResync = rawWindow.join(invalidated,
      rawWindow("id") === invalidated("__sid"), "left_semi")
    syncSessions(toResync)

    Incremental.writeWatermark(watermarkPath, now)
  }
}
