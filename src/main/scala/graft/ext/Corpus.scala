package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation operators for training-data pipelines: benchmark
  * decontamination and reproducible stratified sampling.
  *
  * Scale notes: decontamination is an inverted-index anti-join —
  * benchmark shingles are usually small enough to broadcast, so the
  * corpus never shuffles; sampling is a narrow filter on a
  * deterministic per-row hash (reproducible across runs/partitions,
  * unlike `rand()`-based sampling).
  */
object Corpus {

  /** Docs whose text shares NO word n-gram with the benchmark set — the
    * standard n-gram decontamination filter (13-grams in GPT-3's
    * methodology; n is a parameter). Returns the clean corpus.
    */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol).as("__cid"),
        explode(TextOps.wordShingles(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left_semi")
      .select(col("__cid")).distinct()
    corpus.join(contaminated, corpus(idCol) === contaminated("__cid"), "left_anti")
  }

  /** The complement: docs flagged as contaminated, with the overlap
    * count (for audit reports).
    */
  def contaminationReport(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
    corpus
      .select(col(idCol).as("id"),
        explode(TextOps.wordShingles(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlapping_ngrams"))
  }

  /** Deterministic Bernoulli sample: keep a row iff
    * hash(key, seed) mod 10^6 < fraction·10^6. Reproducible across
    * runs, partitionings, and engines (unlike rand()); the per-stratum
    * variant takes a fraction per stratum value.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Long = 42L): DataFrame =
    df.filter(sampleHash(col(keyCol), seed) < (fraction * 1000000).toLong)

  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(sampleHash(col(keyCol), seed) < (frac * 1000000.0).cast("long"))
  }

  /** Portable per-row sample bucket in [0, 10⁶): FNV-1a over
    * "key:seed" — reproducible not just across runs and partitionings
    * but across ENGINES (the DuckDB oracle replays it exactly; same
    * rationale as [[graft.functions.Fnv1a64]] for the dedup hashes).
    */
  private def sampleHash(key: Column, seed: Long): Column =
    pmod(graft.functions.VectorExpressions.fnv1a64(
      concat(key.cast("string"), lit(":"), lit(seed.toString))), lit(1000000L))
}
