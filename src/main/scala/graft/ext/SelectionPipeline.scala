package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end data-SELECTION pipeline — the "which documents enter
  * the corpus" front half that feeds [[CurationPipeline]]'s dedup back
  * half (RefinedWeb §3 runs exactly this order): URL blocklist →
  * quality gate → per-source cap → DSIR importance top-k. Cheapest,
  * most selective filters first: the blocklist is a zero-shuffle
  * broadcast probe, the quality gate a narrow codegen'd filter, the
  * cap one rank window on source, and only the survivors pay DSIR's
  * token explode.
  *
  * Every stage is an already-oracle-proven operator
  * (`x_blocklist` / `x_quality` / `x_source_cap` /
  * `x_importance_select`); the composition — filter order, column
  * threading, which pool the DSIR raw model is fit on — is itself
  * differential-tested end-to-end (`x_selection_e2e`), so the STAGE
  * WIRING is verified, not just the parts.
  */
object SelectionPipeline {

  /** Per-stage survivor counts, for the selection report.
    * `afterUrlDedup` == `afterBlocklist` when the URL-dedup stage is
    * off (no `urlDedupPrefer`).
    */
  final case class StageCounts(input: Long, afterBlocklist: Long,
                               afterUrlDedup: Long, afterQuality: Long,
                               afterCap: Long, selected: Long)

  /** The intermediate frames of the stage chain -- ONE definition of
    * the wiring, shared by [[select]] (hot path) and
    * [[selectWithReport]] (report path), so the two can never drift.
    */
  private final case class Stages(unblocked: DataFrame, urlDeduped: DataFrame,
                                  quality: DataFrame, capped: DataFrame)

  /** Run the chain; returns [[Selection.selectByImportance]]'s output
    * (id, is_target, n_tokens, weight) for the `k` highest-importance
    * survivors. NOTE the DSIR raw model is fit on the CAPPED pool —
    * fitting it upstream of the cap would let a megadomain's token
    * distribution define "raw" and bias every weight toward it.
    * `urlDedupPrefer` switches on the RefinedWeb stage between
    * blocklist and quality: collapse same-canonical-URL fetches to the
    * highest-`prefer` row ([[Selection.dedupByCanonicalUrl]]).
    */
  def select(docs: DataFrame, urlCol: Column, blocklist: DataFrame,
             textCol: String, idCol: String, sourceCol: String,
             capOrder: Column, isTarget: Column,
             minQuality: Double = 0.5, maxPerSource: Int = 1000,
             k: Int = 1000, nBuckets: Int = 256,
             urlDedupPrefer: Option[Column] = None): DataFrame =
    Selection.selectByImportance(
      cappedPool(docs, urlCol, blocklist, textCol, idCol, sourceCol,
        capOrder, minQuality, maxPerSource, urlDedupPrefer),
      textCol, idCol, isTarget, k, nBuckets)

  /** The chain with per-stage counts (each stage evaluated once more --
    * report use, not the hot path). Runs the SAME staged chain as
    * [[select]] -- including the optional URL-dedup stage -- built from
    * one shared definition, so report and hot path cannot drift.
    */
  def selectWithReport(docs: DataFrame, urlCol: Column, blocklist: DataFrame,
                       textCol: String, idCol: String, sourceCol: String,
                       capOrder: Column, isTarget: Column,
                       minQuality: Double = 0.5, maxPerSource: Int = 1000,
                       k: Int = 1000, nBuckets: Int = 256,
                       urlDedupPrefer: Option[Column] = None): (DataFrame, StageCounts) = {
    val st = stages(docs, urlCol, blocklist, textCol, idCol, sourceCol,
      capOrder, minQuality, maxPerSource, urlDedupPrefer)
    val sel = Selection.selectByImportance(st.capped, textCol, idCol,
      isTarget, k, nBuckets)
    (sel, StageCounts(docs.count(), st.unblocked.count(),
      st.urlDeduped.count(), st.quality.count(), st.capped.count(),
      sel.count()))
  }

  private def stages(docs: DataFrame, urlCol: Column, blocklist: DataFrame,
                     textCol: String, idCol: String, sourceCol: String,
                     capOrder: Column, minQuality: Double, maxPerSource: Int,
                     urlDedupPrefer: Option[Column]): Stages = {
    val unblocked = Selection.filterByBlocklist(docs, urlCol, blocklist)
    val urlDeduped = urlDedupPrefer match {
      case Some(prefer) =>
        Selection.dedupByCanonicalUrl(unblocked, urlCol, idCol, prefer)
      case None => unblocked
    }
    val quality = urlDeduped.filter(
      TextOps.qualityScore(col(textCol)) >= minQuality)
    Stages(unblocked, urlDeduped, quality,
      Selection.capPerSource(quality, sourceCol, idCol, capOrder, maxPerSource))
  }

  private def cappedPool(docs: DataFrame, urlCol: Column,
                         blocklist: DataFrame, textCol: String,
                         idCol: String, sourceCol: String,
                         capOrder: Column, minQuality: Double,
                         maxPerSource: Int,
                         urlDedupPrefer: Option[Column] = None): DataFrame =
    stages(docs, urlCol, blocklist, textCol, idCol, sourceCol, capOrder,
      minQuality, maxPerSource, urlDedupPrefer).capped
}
