package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance search over a document corpus: BM25 ranking for
  * a bag-of-terms query — the retrieval primitive a training-data
  * pipeline uses for targeted corpus slicing ("pull the docs about X")
  * and the reference's tag/topic matching generalizes to
  * (`ET-ETL-DWH-PY312/ETL/schema.py:446-466` sessions_tags stores
  * matched_query_text per session; this operator is the engine-side
  * scorer for such matching).
  *
  * Scale shape: the corpus tokenization is a narrow explode; only rows
  * whose token is IN the query term set survive the filter (query terms
  * are a handful — the explode-filter prunes before any shuffle), so
  * the shuffled tf frame is O(matching docs × |terms|), never the
  * corpus token count. Document frequencies and corpus stats are tiny
  * aggregates broadcast back. No UDFs — every step is codegen'd.
  */
object Search {

  /** BM25 scores for `terms` over the corpus; emits
    * (id, score, rank) for the top `topK` docs (rank ties broken by id
    * for determinism). Standard Robertson/Okapi parameters: k1 term-
    * frequency saturation, b length normalization; idf is the
    * always-positive `ln(1 + (N - df + ½)/(df + ½))` form.
    *
    * Per-term partial scores are assembled into a FIXED-ORDER sum (one
    * conditional aggregate per query term, added left-to-right in the
    * `terms` order) rather than a floating-point `sum()` whose
    * accumulation order would depend on partial-aggregation scheduling —
    * byte-stable results at any parallelism, replayable by the oracle.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one query term")
    // corpus tokens are lowercased — match query terms in the same
    // space, or an uppercase query term would silently score zero;
    // distinct, or a repeated term would double-count its contribution
    // in the fixed-order score sum
    val qTerms = terms.map(_.toLowerCase).distinct
    val lens = docs.select(col(idCol).as("id"),
      TextOps.tokenCountWs(col(textCol)).cast("long").as("len"))
    // exact integer corpus stats (no double accumulation): N and Σlen
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
    val tf = docs
      .select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    // document frequency as a window over the tf frame — NOT a separate
    // groupBy(term) aggregate: that aggregate's plan re-derives tf, so
    // the corpus token explode (the dominant cost here) would run twice.
    // The window reshuffles only the tiny post-filter tf frame
    // (matching docs × |terms| rows), never the token stream.
    val scored = tf
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
      .crossJoin(broadcast(stats))
      .join(lens, Seq("id"))
      .withColumn("avgdl",
        col("sum_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len").cast("double") / col("avgdl")))))
    // fixed-order assembly: score = s(term₁) + s(term₂) + … — immune to
    // agg-order float drift, mirrored verbatim in the oracle SQL
    val perTerm = qTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("s"))).as(s"s_$i")
    }
    val total = qTerms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val agg = scored.groupBy(col("id")).agg(perTerm.head, perTerm.tail: _*)
      .select(col("id"), total.as("score"))
    // top-k first (TakeOrdered — distributed partial sort, no global
    // shuffle), then ranks over the tiny surviving set; round only at
    // the very end so rank order follows the unrounded scores
    agg
      .orderBy(col("score").desc, col("id").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id").asc)))
      .select(col("id"), round(col("score"), 6).as("score"), col("rank"))
  }

  /** Per-document top-K distinctive terms by TF-IDF (smoothed idf
    * `ln((N+1)/(df+1))`) — the document-labeling / topic-slicing
    * complement of [[bm25]]'s query-side ranking. Ties rank by term for
    * determinism; terms present in every document score 0 and sink.
    *
    * Scale shape: one explode→groupBy pass builds the (doc, term, tf)
    * frame (map-side combined, sized by the token stream); document
    * frequency is a window over that frame keyed by term and the top-K
    * cut a window keyed by doc — both reshuffle only the distinct
    * (doc, term) pairs, never raw tokens. The corpus size rides in as
    * a broadcast scalar. No UDFs.
    */
  def keyTerms(docs: DataFrame, textCol: String, idCol: String,
               topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val wDoc = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(stats))
      .withColumn("score", col("tf").cast("double") *
        log((col("n_docs").cast("double") + lit(1.0))
          / (col("df").cast("double") + lit(1.0))))
      .withColumn("rank", row_number().over(wDoc))
      .filter(col("rank") <= topK)
      .select(col("id"), col("term"), round(col("score"), 6).as("score"),
        col("rank"))
  }
}
