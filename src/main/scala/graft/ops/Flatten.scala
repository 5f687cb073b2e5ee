package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-document flattening (SURVEY.md §2.3, Q17–Q27).
  *
  * The reference's `pd.json_normalize(record_path, meta, meta_prefix)`
  * call sites (`ET-ETL-DWH-PY312/ETL/Transform.py:69-115,184-233`) all
  * reduce to: explode an array-of-structs child column, carry selected
  * parent keys, optionally prefix/rename child columns. `explode` (not
  * `explode_outer`) matches the child-table semantics — a parent with an
  * empty/null child array contributes no child rows.
  */
object Flatten {

  /** Explode `child` (array<struct>) out of `df`, carrying `parentKeys`
    * (each as `(sourceCol, targetName)`), prefixing child field names with
    * `childPrefix`, then applying `renames`.
    *
    * Mirrors `json_normalize(record_path=[child], meta=[...],
    * meta_prefix=...)` with `max_level=0`: struct fields nested below the
    * exploded level are left intact (as struct columns).
    */
  def explodeChild(
      df: DataFrame,
      child: String,
      parentKeys: Seq[(String, String)],
      childPrefix: String = "",
      renames: Map[String, String] = Map.empty
  ): DataFrame = {
    val parents = parentKeys.map { case (src, tgt) => col(src).as(tgt) }
    val exploded = df.select(parents :+ explode(col(child)).as("__c"): _*)
    val childFields = exploded.schema("__c").dataType match {
      case s: StructType => s.fieldNames.toSeq
      case other => throw new IllegalArgumentException(
        s"explodeChild: $child must be array<struct>, element is $other")
    }
    val childCols = childFields.map { f =>
      val name = renames.getOrElse(f, childPrefix + f)
      col(s"__c.`$f`").as(name)
    }
    exploded.select(parentKeys.map(k => col(k._2)) ++ childCols: _*)
  }

  /** Outer variant: parents with empty/null child arrays KEEP one row
    * with null child columns (LEFT-join semantics; `explodeChild`'s
    * inner semantics match the reference's child tables).
    */
  def explodeChildOuter(
      df: DataFrame,
      child: String,
      parentKeys: Seq[(String, String)],
      childPrefix: String = "",
      renames: Map[String, String] = Map.empty
  ): DataFrame = {
    val parents = parentKeys.map { case (src, tgt) => col(src).as(tgt) }
    val exploded = df.select(parents :+ explode_outer(col(child)).as("__c"): _*)
    val childFields = df.schema(child).dataType match {
      case ArrayType(s: StructType, _) => s.fieldNames.toSeq
      case other => throw new IllegalArgumentException(
        s"explodeChildOuter: $child must be array<struct>, got $other")
    }
    val childCols = childFields.map { f =>
      val name = renames.getOrElse(f, childPrefix + f)
      col(s"__c.`$f`").as(name)
    }
    exploded.select(parentKeys.map(k => col(k._2)) ++ childCols: _*)
  }

  /** Two-level flatten: explode `child`, then explode `grandchild` within
    * it, carrying parent keys through both levels. Mirrors the chained
    * json_normalize of sessions.tags[].match[] (Transform.py:184-192) and
    * sessions.scores[].point_scores[] (Transform.py:205-218).
    * `childCarry` lists fields of the first-level child to carry down.
    */
  def explodeChild2(
      df: DataFrame,
      child: String,
      grandchild: String,
      parentKeys: Seq[(String, String)],
      childCarry: Seq[(String, String)],
      renames: Map[String, String] = Map.empty
  ): DataFrame = {
    val lvl1 = df.select(
      parentKeys.map { case (s, t) => col(s).as(t) } :+ explode(col(child)).as("__c"): _*)
    val lvl2 = lvl1.select(
      parentKeys.map(k => col(k._2)) ++
        childCarry.map { case (s, t) => col(s"__c.`$s`").as(t) } :+
        explode(col(s"__c.`$grandchild`")).as("__g"): _*)
    val gFields = lvl2.schema("__g").dataType.asInstanceOf[StructType].fieldNames.toSeq
    val gCols = gFields.map(f => col(s"__g.`$f`").as(renames.getOrElse(f, f)))
    lvl2.select(parentKeys.map(k => col(k._2)) ++ childCarry.map(k => col(k._2)) ++ gCols: _*)
  }

  /** Inverse helper used in tests and the nest-roundtrip differential
    * queries: nest `childDf` rows under `parentDf` as an array<struct>
    * column keyed by `key`. groupBy+collect_list — one shuffle, map-side
    * partial aggregation applies.
    *
    * `maxChildren` (None = unbounded, the test-harness default) caps
    * the per-parent array: collect_list materializes each parent's
    * children in ONE executor's aggregation buffer, so a hot parent key
    * (one session with millions of events) is an OOM at scale, not a
    * slow query. The cap ranks children per key BEFORE the collect
    * (row_number over the struct's field order — deterministic, never
    * partition-order-dependent; WindowExec buffers through a SPILLING
    * sorter, so the hot key costs disk, not the agg buffer) and marks
    * truncated parents in a `<as>_truncated` boolean so the loss is
    * visible downstream, never silent.
    *
    * ORDERING CONTRACT: the uncapped path preserves collect_list
    * ARRIVAL order (partition-dependent — callers needing determinism
    * must sort downstream); the capped path returns children in
    * child-struct sort order (a cap without a defined rank order would
    * keep an arbitrary subset). Non-orderable child fields (map types)
    * are EXCLUDED from the sortable rank-key prefix, so a map-typed
    * child caps fine; rows tied on every orderable field (including
    * the degenerate all-non-orderable case) then rank by a hash of the
    * child struct's JSON rendering — never partition-arrival order, so
    * the capped subset is reproducible across reruns, task retries,
    * and repartitioning for rows whose RENDERING is stable. Two
    * caveats inherit from to_json: map fields hash in their stored
    * entry order (logically-equal maps built with a different upstream
    * entry order hash differently), and timestamp fields render — and
    * therefore hash — under the session timezone.
    */
  def nestChild(
      parentDf: DataFrame,
      childDf: DataFrame,
      parentKey: String,
      childKey: String,
      as: String,
      maxChildren: Option[Int] = None
  ): DataFrame = {
    maxChildren.foreach(m => require(m > 0, s"nestChild: bad cap $m"))
    val childStruct = struct(childDf.columns.filter(_ != childKey).map(col).toIndexedSeq: _*)
    val nested = maxChildren match {
      case None =>
        childDf.groupBy(col(childKey).as("__k"))
          .agg(collect_list(childStruct).as(as))
      case Some(m) =>
        val byKey = org.apache.spark.sql.expressions.Window
          .partitionBy(col(childKey))
        // rank key: orderable child fields only — row_number's sort (and
        // sort_array) fail analysis on map-typed fields; ranking by the
        // orderable subset keeps the cap usable on any child schema
        val orderable = childDf.schema.fields
          .filter(f => f.name != childKey &&
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType))
          .map(f => col(f.name))
          .toIndexedSeq
        // LAST key: a hash of the WHOLE child struct's JSON rendering
        // (xxhash64 rejects map types directly) — so rows tied on every
        // orderable field (and the all-non-orderable fallback, which
        // has no orderable key at all) still rank by row content, never
        // by partition arrival order. Caveats in the scaladoc: map
        // entry order and the session timezone shape the rendering.
        val tiebreak = xxhash64(to_json(col("__s")))
        val rankKey =
          if (orderable.nonEmpty) struct((orderable :+ tiebreak): _*)
          else tiebreak
        childDf
          .withColumn("__s", childStruct)
          .withColumn("__rn", row_number().over(byKey.orderBy(rankKey)))
          .withColumn("__n", count(lit(1)).over(byKey))
          .filter(col("__rn") <= m)
          .groupBy(col(childKey).as("__k"))
          // order the array by RANK via a comparator (array_sort over
          // the raw struct would re-trip the orderability requirement):
          // identical output order to the old sort_array on fully-
          // orderable children, and well-defined on map-typed ones
          .agg(
            transform(
              array_sort(
                collect_list(struct(col("__rn").as("__rn"), col("__s").as("__s"))),
                (l, r) => when(l.getField("__rn") < r.getField("__rn"), -1)
                  .when(l.getField("__rn") > r.getField("__rn"), 1)
                  .otherwise(0)),
              e => e.getField("__s")).as(as),
            (max(col("__n")) > m).as(s"${as}_truncated"))
    }
    parentDf.join(nested, parentDf(parentKey) === nested("__k"), "left").drop("__k")
  }
}
