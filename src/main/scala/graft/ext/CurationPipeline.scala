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

  /** Default hot-shingle df cap for the near-dup pair stage. The
    * uncapped inverted-index pair join is O(Σ df²) over shingles; a
    * replica-heavy corpus (the common web-crawl shape — measured at the
    * 100× soak: 500k docs, every doc duplicated ~100×) drives that to
    * tens of billions of intermediate rows and kills the job on shuffle
    * spill. 64 is a stop-phrase threshold: shingles shared by more than
    * 64 surviving docs carry no discriminating signal and are dropped
    * before the join, bounding it at Σ min(df,64)² — linear in corpus
    * size. Pass `maxShingleDf = None` to explicitly opt out (exact
    * jaccard; only safe when duplication is known-sparse).
    */
  val DefaultMaxShingleDf = 64

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
             // hot-shingle df cap for the near-dup pair stage — scale-
             // safe by DEFAULT (see [[DefaultMaxShingleDf]]): the
             // uncapped join is O(Σ df²) over shingles and provably
             // dies on a replica-heavy corpus (100× soak: >80 GB spill,
             // job dead). `None` is the explicit opt-out for corpora
             // with known-sparse duplication; for corpora whose true
             // near-dup clusters exceed the cap, use minhashNearDups,
             // whose banded buckets bound candidates per band instead.
             maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): DataFrame = {
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
                       maxShingleDf: Option[Int] = Some(DefaultMaxShingleDf)): (DataFrame, StageCounts) = {
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
