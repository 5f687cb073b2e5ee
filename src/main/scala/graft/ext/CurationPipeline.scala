package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus curation pipeline: the extension
  * layer's analog of [[graft.pipeline.EtlPipeline]] — quality gate →
  * benchmark decontamination → exact dedup → near-dup cluster dedup,
  * composed in the order a production corpus build runs them (cheap
  * narrow filters first, the pair-generating near-dedup last, over the
  * already-shrunk survivor set).
  *
  * Every stage is an already-oracle-proven operator; this composition
  * is itself differential-tested end-to-end (`x_curation_e2e`), so the
  * STAGE WIRING — filter order, column threading, representative
  * selection — is verified, not just the parts.
  */
object CurationPipeline {

  /** Per-stage survivor counts, for the curation report. */
  final case class StageCounts(input: Long, afterQuality: Long,
                               afterDecontamination: Long, afterExactDedup: Long,
                               afterNearDedup: Long)

  /** Run the full chain; returns the surviving corpus. Stages:
    *  1. quality: `TextOps.qualityScore >= minQuality` (narrow filter);
    *  2. decontamination: drop docs sharing any `ngram`-gram with
    *     `benchmark` (broadcast inverted index);
    *  3. exact dedup: keep min-id per normalized fingerprint;
    *  4. near-dedup: n-gram jaccard pairs at `jaccardThreshold` →
    *     connected components → keep cluster minimum.
    */
  def curate(docs: DataFrame, benchmark: DataFrame, textCol: String,
             idCol: String, minQuality: Double = 0.5, ngram: Int = 5,
             shingleSize: Int = 3, jaccardThreshold: Double = 0.5,
             checkpointDir: Option[String] = None,
             // optional paraphrase gate: (corpus embeddings, benchmark
             // embeddings, cosine threshold) with (idCol, vecCol)
             // schemas — drops docs whose embedding is too close to
             // any benchmark embedding (catches what n-grams miss)
             semantic: Option[(DataFrame, DataFrame, String, Double)] = None,
             // hot-shingle df cap for the near-dup pair stage. The
             // uncapped inverted-index pair join is O(Σ df²) over
             // shingles — fine when duplication is sparse, but a
             // replica-heavy corpus (every doc near-duplicated m times
             // pushes every shingle's df to m) makes the intermediate
             // quadratic in m: measured at the 100× soak, 500k docs
             // with m=100 spilled >80 GB and died. Production corpus
             // builds MUST set this (or use minhashNearDups, whose
             // banded buckets bound candidates per band instead).
             maxShingleDf: Option[Int] = None): DataFrame = {
    val quality = docs.filter(TextOps.qualityScore(col(textCol)) >= minQuality)
    val ngramClean = Corpus.decontaminate(quality, benchmark, textCol, idCol, ngram)
    val clean = semantic match {
      case Some((corpusEmb, benchEmb, vecCol, threshold)) =>
        val flagged = Corpus.decontaminateSemantic(
          corpusEmb, benchEmb, vecCol, idCol, threshold).select(col(idCol))
        ngramClean.join(broadcast(flagged), Seq(idCol), "left_anti")
      case None => ngramClean
    }
    // pin the exact-dedup survivors: downstream they are read three
    // times (shingle pair generation, component-label init, the final
    // representative semi-join) and their lineage carries the
    // decontamination n-gram explode — pinned, that runs once.
    // checkpointDir switches the pin (and the per-round component pins)
    // to reliable checkpoints for cluster runs; the local default is
    // right for local mode (see [[Dedup.connectedComponents]]).
    val exactLazy = Dedup.exact(clean, textCol, idCol)
    val exact = checkpointDir match {
      case Some(dir) =>
        docs.sparkSession.sparkContext.setCheckpointDir(dir)
        exactLazy.checkpoint(true)
      case None => exactLazy.localCheckpoint(true)
    }
    val pairs = Dedup.jaccardPairs(exact, textCol, idCol, shingleSize,
      jaccardThreshold, maxShingleDf)
    Dedup.keepClusterRepresentatives(exact, pairs, idCol, checkpointDir)
  }

  /** The chain with per-stage counts (each stage evaluated once more —
    * report use, not the hot path).
    */
  def curateWithReport(docs: DataFrame, benchmark: DataFrame, textCol: String,
                       idCol: String, minQuality: Double = 0.5, ngram: Int = 5,
                       shingleSize: Int = 3,
                       jaccardThreshold: Double = 0.5,
                       maxShingleDf: Option[Int] = None): (DataFrame, StageCounts) = {
    val quality = docs.filter(TextOps.qualityScore(col(textCol)) >= minQuality)
    val clean = Corpus.decontaminate(quality, benchmark, textCol, idCol, ngram)
    val exact = Dedup.exact(clean, textCol, idCol)
    val pairs = Dedup.jaccardPairs(exact, textCol, idCol, shingleSize,
      jaccardThreshold, maxShingleDf)
    val fin = Dedup.keepClusterRepresentatives(exact, pairs, idCol)
    (fin, StageCounts(docs.count(), quality.count(), clean.count(),
      exact.count(), fin.count()))
  }
}
