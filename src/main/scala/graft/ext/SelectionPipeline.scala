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

  /** Per-stage survivor counts, for the selection report. */
  final case class StageCounts(input: Long, afterBlocklist: Long,
                               afterQuality: Long, afterCap: Long,
                               selected: Long)

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

  /** The chain with per-stage counts (each stage evaluated once more —
    * report use, not the hot path).
    */
  def selectWithReport(docs: DataFrame, urlCol: Column, blocklist: DataFrame,
                       textCol: String, idCol: String, sourceCol: String,
                       capOrder: Column, isTarget: Column,
                       minQuality: Double = 0.5, maxPerSource: Int = 1000,
                       k: Int = 1000,
                       nBuckets: Int = 256): (DataFrame, StageCounts) = {
    val unblocked = Selection.filterByBlocklist(docs, urlCol, blocklist)
    val quality = unblocked.filter(
      TextOps.qualityScore(col(textCol)) >= minQuality)
    val capped = Selection.capPerSource(quality, sourceCol, idCol,
      capOrder, maxPerSource)
    val sel = Selection.selectByImportance(capped, textCol, idCol,
      isTarget, k, nBuckets)
    (sel, StageCounts(docs.count(), unblocked.count(), quality.count(),
      capped.count(), sel.count()))
  }

  private def cappedPool(docs: DataFrame, urlCol: Column,
                         blocklist: DataFrame, textCol: String,
                         idCol: String, sourceCol: String,
                         capOrder: Column, minQuality: Double,
                         maxPerSource: Int,
                         urlDedupPrefer: Option[Column] = None): DataFrame = {
    val unblocked = Selection.filterByBlocklist(docs, urlCol, blocklist)
    val urlDeduped = urlDedupPrefer match {
      case Some(prefer) =>
        Selection.dedupByCanonicalUrl(unblocked, urlCol, idCol, prefer)
      case None => unblocked
    }
    Selection.capPerSource(
      urlDeduped.filter(TextOps.qualityScore(col(textCol)) >= minQuality),
      sourceCol, idCol, capOrder, maxPerSource)
  }
}
