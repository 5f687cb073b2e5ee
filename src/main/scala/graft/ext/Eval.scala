package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics at corpus scale — the readout step of the
  * quality-classifier loop a curation pipeline trains (score docs →
  * evaluate against labels → pick thresholds). Everything reduces to
  * integer arithmetic with ONE final IEEE division, so results are
  * byte-stable and oracle-replayable.
  */
object Eval {

  /** Exact-to-6-dp ROC AUC via the Mann–Whitney statistic, computed
    * WITHOUT a global row sort: scores first reduce to one row per
    * DISTINCT score (the only shuffle that touches data volume), then
    * a window over the score groups accumulates negatives-below;
    * AUC = Σ_s nPos_s·(negBelow_s + nNeg_s/2) / (nPos·nNeg), ties
    * counting half. All terms stay integral (doubled to absorb the
    * half-tie) until the single final division.
    *
    * ENFORCED CONTRACT — probability-shaped scores in [0,1]: scores
    * are rounded to 6 dp BEFORE grouping, so the Mann–Whitney window
    * sees at most 1e6·range(score)+1 group rows — for scores in [0,1]
    * (the LLM-pipeline use) that is <= 1e6+1, independent of row
    * count, even when the input is raw continuous model probabilities
    * where distinct would otherwise ≈ |rows|. A raw-logit caller
    * (range ±50) would get ~1e8 groups and a silent single-partition
    * window blowup, so the domain is CHECKED in the same scan (a
    * codegen'd comparison per row, no extra pass): any score outside
    * [0,1] raises at execution with a pointer to squash first or use
    * [[aucBinned]], whose bins clamp. Null scores pass through and
    * group as before.
    * Merging scores within 1e-6 converts strict wins to half-tie
    * credit for pairs closer than 1e-6 apart, perturbing AUC by less
    * than 1e-6 per such pair fraction — far inside the 6-dp readout.
    * For a sketch-shaped companion with O(nBins) mergeable state, see
    * [[aucBinned]].
    *
    * Returns one row: (n_pos, n_neg, auc). Degenerate inputs (no
    * positives or no negatives) yield a null auc.
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    mannWhitney(df
      .select(round(probabilityScore(scoreCol), 6).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np_s"), (count(lit(1)) - sum(col("y"))).as("nn_s")),
      "auc")

  /** The [[auc]]/[[averagePrecision]] domain guard, enforced inside
    * the scan projection (one codegen'd comparison per row — never an
    * extra pass over the data): scores outside [0,1] raise at
    * execution instead of silently exploding the distinct-score group
    * domain the Mann–Whitney window is bounded by. Nulls pass through
    * unchanged (they group under s = null exactly as before).
    */
  private def probabilityScore(scoreCol: String): Column = {
    val s = col(scoreCol).cast("double")
    when(s.isNull || (s >= 0.0 && s <= 1.0), s)
      .otherwise(raise_error(concat(
        lit("Eval.auc/averagePrecision: score "), s.cast("string"),
        lit(" is outside [0,1] — the exact Mann–Whitney window is bounded " +
          "by the 6-dp distinct-score domain, which only probability-shaped " +
          "scores guarantee (a raw-logit range of +-50 means ~1e8 window " +
          "groups in one partition). Squash scores to probabilities first, " +
          "or use Eval.aucBinned, whose bins clamp."))))
  }

  /** Binned approximate ROC AUC — the sketch companion to [[auc]] for
    * probability-shaped scores: scores clamp into [0,1] and bin into
    * `nBins` equal-width buckets, and the exact Mann–Whitney runs over
    * the BINS (within-bin pairs count as half-ties). State is O(nBins)
    * per-bin (pos, neg) counts — mergeable across any partitioning, a
    * streaming-friendly shape — and |auc_binned − auc_exact| is
    * bounded by the probability mass of cross-label pairs falling in
    * the same bin (≲ 1/nBins for smooth score distributions; EvalSpec
    * checks the bound empirically). Returns (n_pos, n_neg, auc_binned).
    */
  def aucBinned(df: DataFrame, labelCol: String, scoreCol: String,
                nBins: Int = 1024): DataFrame = {
    require(nBins >= 2, s"aucBinned: nBins must be >= 2, got $nBins")
    val s = col(scoreCol).cast("double")
    mannWhitney(df
      .select(greatest(lit(0),
          least(floor(s * nBins).cast("int"), lit(nBins - 1))).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np_s"), (count(lit(1)) - sum(col("y"))).as("nn_s")),
      "auc_binned")
  }

  /** The shared Mann–Whitney reduce over per-score-group (s, np_s,
    * nn_s) rows: the window sees GROUP rows only — callers guarantee
    * the group domain is bounded (6-dp rounding / nBins binning).
    * `private[graft]` so the streaming registry can close a streamed
    * bin-count aggregate (q_stream_auc_binned) with the identical
    * reduce the batch path uses.
    */
  private[graft] def mannWhitney(byScore: DataFrame, outCol: String): DataFrame = {
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val acc = byScore
      // 2·negBelow + nNeg_s  (the doubled half-tie credit, exact);
      // the product accumulates in decimal so corpus-scale counts
      // (≈1e13 rows → 1e26 credit) can't overflow a long
      .withColumn("credit2",
        col("np_s").cast("decimal(38,0)") *
          (lit(2) * coalesce(sum(col("nn_s")).over(w), lit(0L)) + col("nn_s")).cast("decimal(38,0)"))
      .agg(sum(col("np_s")).as("n_pos"), sum(col("nn_s")).as("n_neg"),
        sum(col("credit2")).as("c2"))
    acc.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("c2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as(outCol))
  }

  /** Average precision (area under the precision-recall curve, step
    * interpolation — the sklearn `average_precision_score` definition):
    * AP = Σ_t (R_t − R_{t−1})·P_t with one operating point per
    * distinct threshold, descending. Same ENFORCED [0,1] domain
    * contract as [[auc]]: scores round to 6 dp before grouping, the cumulative
    * window runs over distinct-score GROUPS; per-group terms round to
    * 9 dp and accumulate in DECIMAL, one final division at 6 dp.
    * Returns (n_pos, n_neg, ap); null ap when there are no positives.
    */
  def averagePrecision(df: DataFrame, labelCol: String,
                       scoreCol: String): DataFrame = {
    val byScore = df
      .select(round(probabilityScore(scoreCol), 6).as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np_s"), (count(lit(1)) - sum(col("y"))).as("nn_s"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_tp", sum(col("np_s")).over(w))
      .withColumn("cum_all", sum(col("np_s") + col("nn_s")).over(w))
      // ΔR_t·P_t · nPos = np_s · cumTP/cumAll — the /nPos factors out
      // of the sum, so it applies ONCE at the end (exact)
      .withColumn("term", round(
        col("np_s").cast("double") * col("cum_tp") / col("cum_all"), 9))
      .agg(sum(col("np_s")).as("n_pos"), sum(col("nn_s")).as("n_neg"),
        sum(col("term").cast("decimal(38,9)")).as("tsum"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          round(col("tsum").cast("double") / col("n_pos"), 6)).as("ap"))
  }

  /** Expected Calibration Error over `nBins` equal-width score bins
    * (Naeini et al. 2015; Guo et al. 2017): a probability-calibrated
    * scorer's mean score within a bin should equal the bin's positive
    * rate. ECE = Σ_b (n_b/N)·|conf_b − acc_b|; MCE = max_b of the
    * same gap. Scores are expected in [0,1]; values outside clamp
    * into the edge bins (floor + least/greatest), so a stray 1.0 or
    * an un-squashed logit can't open an unreachable bin.
    *
    * Determinism: per-bin score mass accumulates in DECIMAL at 6 dp
    * (order-independent; 6-dp score precision is far inside any
    * probability scorer's meaningful resolution, and it keeps the
    * decimal→double conversion of a 100 TB bin's mass under double's
    * 15.95 exact digits — the q_tpch1 lesson), each bin's gap rounds
    * to 9 dp before the weighted DECIMAL re-aggregation, and the
    * single final division rounds to 6 dp — fully oracle-replayable,
    * like [[auc]].
    *
    * Scale shape: one hash aggregation to ≤ `nBins` rows, then a
    * scalar reduce. Nothing keyed finer than the bin id.
    */
  def ece(df: DataFrame, labelCol: String, scoreCol: String,
          nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"ece: nBins must be >= 1, got $nBins")
    val s = col(scoreCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    // the VALUE clamps too, not just the bin id: an un-squashed logit
    // (say 7.3) lands in the edge bin, and its raw value must not drag
    // the bin's mean confidence outside [0,1] and fake a huge gap
    val sClamped = least(greatest(s, lit(0.0)), lit(1.0))
    val perBin = df
      .select(greatest(lit(0),
          least(floor(s * nBins).cast("int"), lit(nBins - 1))).as("bin"),
        sClamped.cast("decimal(18,6)").as("sd"), y.as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("sd")).as("ssum"),
        sum(col("y")).as("ypos"))
    perBin
      .withColumn("gap",
        round(abs(col("ssum").cast("double") / col("n") -
          col("ypos").cast("double") / col("n")), 9))
      .agg(sum(col("n")).as("n"),
        count(lit(1)).cast("long").as("n_bins_used"),
        round(sum((col("gap").cast("decimal(18,9)") * col("n"))
            .cast("decimal(38,9)")).cast("double") /
          sum(col("n")), 6).as("ece"),
        round(max(col("gap")), 6).as("mce"))
  }

  /** Confusion counts and P/R/F1 at each decision threshold, in ONE
    * aggregation pass: the threshold list is known at plan time, so
    * every tp/fp/fn/tn is a conditional sum in a single scalar
    * aggregate (no per-threshold scan, no join), unpacked to one row
    * per threshold afterwards. Predicted positive ⇔ score ≥ t.
    * Ratios are one integer division each, rounded to 6 dp; null when
    * the denominator is 0 (no predicted / no actual positives).
    */
  def confusionAtThresholds(df: DataFrame, labelCol: String,
                            scoreCol: String,
                            thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "confusionAtThresholds: empty threshold list")
    val s = col(scoreCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val base = df.select(s.as("s"), y.as("y"))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(col("s") >= t, col("y")).otherwise(0L)).as(s"tp$i"),
        sum(when(col("s") >= t, lit(1L) - col("y")).otherwise(0L)).as(s"fp$i"),
        sum(when(col("s") < t, col("y")).otherwise(0L)).as(s"fn$i"),
        sum(when(col("s") < t, lit(1L) - col("y")).otherwise(0L)).as(s"tn$i"))
    }
    val one = base.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"),
        coalesce(col(s"tp$i"), lit(0L)).as("tp"),
        coalesce(col(s"fp$i"), lit(0L)).as("fp"),
        coalesce(col(s"fn$i"), lit(0L)).as("fn"),
        coalesce(col(s"tn$i"), lit(0L)).as("tn"))
    }
    one.select(explode(array(rows.toIndexedSeq: _*)).as("r")).select(col("r.*"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)))
      .withColumn("recall", when(col("tp") + col("fn") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)))
      .withColumn("f1", when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        round(lit(2.0) * col("tp") /
          (lit(2L) * col("tp") + col("fp") + col("fn")), 6)))
  }

  /** Mean binary cross-entropy (log loss) with probability clamp
    * `eps`: −mean[y·ln p + (1−y)·ln(1−p)], p clamped into
    * [eps, 1−eps] so a confident-and-wrong 0/1 stays finite.
    *
    * Scale + determinism via the [[auc]] trick: rows first reduce to
    * one row per DISTINCT (p, y) — with bounded-precision scores that
    * is thousands of groups, not corpus rows — so `ln` evaluates
    * O(distinct) times (cross-engine libm parity risk shrinks with
    * it), each group's 9-dp-rounded term scales by its exact count in
    * DECIMAL, and ONE final division closes. Returns (n, log_loss).
    */
  /** nDCG@k — graded ranking quality of `results` (query_id, doc_id,
    * rank) against `relevance` (query_id, doc_id, rel): DCG =
    * Σ_{rank≤k} rel/log₂(rank+1), normalized by the ideal DCG of the
    * k best relevance grades (ties on doc_id — deterministic).
    * Unjudged result docs score rel 0 (the standard IR convention).
    * Per-rank terms round to 9 dp and accumulate in DECIMAL, so the
    * per-query sums are order-independent; ndcg divides the two 6-dp
    * readouts (null when a query has no relevant docs at all).
    *
    * Scale shape: one bounded join of the k·|queries| result rows
    * against relevance, plus one rank window over relevance keyed by
    * query — nothing pairs corpus×corpus.
    */
  def ndcgAtK(results: DataFrame, relevance: DataFrame, k: Int): DataFrame = {
    val log2 = (c: Column) => log(c) / log(lit(2.0))
    val dcg = results.filter(col("rank") <= k)
      .join(relevance, Seq("query_id", "doc_id"), "left")
      .withColumn("term", round(
        coalesce(col("rel").cast("double"), lit(0.0)) /
          log2(col("rank") + lit(1.0)), 9))
      .groupBy(col("query_id"))
      .agg(round(sum(col("term").cast("decimal(18,9)")).cast("double"), 6)
        .as("dcg"))
    val iw = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val idcg = relevance.withColumn("irank", row_number().over(iw))
      .filter(col("irank") <= k)
      .withColumn("term", round(col("rel").cast("double") /
        log2(col("irank") + lit(1.0)), 9))
      .groupBy(col("query_id"))
      .agg(round(sum(col("term").cast("decimal(18,9)")).cast("double"), 6)
        .as("idcg"))
    // full outer: a query present in relevance but with ZERO result
    // rows must surface as dcg 0 (it scores 0), not vanish from the
    // readout and silently inflate any averaged nDCG
    dcg.join(idcg, Seq("query_id"), "full_outer")
      .withColumn("dcg", coalesce(col("dcg"), lit(0.0)))
      .withColumn("idcg", coalesce(col("idcg"), lit(0.0)))
      .select(col("query_id"), col("dcg"), col("idcg"),
        when(col("idcg") > 0, round(col("dcg") / col("idcg"), 6)).as("ndcg"))
  }

  /** Mean-reciprocal-rank readout: per query, the rank of the FIRST
    * relevant (`rel` > 0) result within the top `k`, and its
    * reciprocal (0.0 when no relevant doc was retrieved — including
    * queries judged in `relevance` that returned no results at all:
    * the readout is driven from the union of query ids, the
    * [[ndcgAtK]] convention). One bounded semi-shaped join of the
    * k·|queries| result rows against relevance, one min per query —
    * nothing pairs corpus×corpus. Callers average `rr` for MRR@k.
    */
  def mrrAtK(results: DataFrame, relevance: DataFrame, k: Int): DataFrame = {
    val hits = results.filter(col("rank") <= k)
      .join(relevance.filter(col("rel") > 0), Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(min(col("rank")).cast("long").as("first_rel_rank"))
    val qids = results.select(col("query_id"))
      .union(relevance.select(col("query_id"))).distinct()
    qids.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rel_rank"),
        coalesce(round(lit(1.0) / col("first_rel_rank"), 6), lit(0.0)).as("rr"))
  }

  /** Brier score — mean squared error of the probability forecast,
    * −∂-free companion to [[logLoss]] (bounded [0,1], no clamp
    * needed). Same distinct-(p,y) reduction and rounding discipline:
    * per-group 9-dp term × exact count in decimal, one division.
    * Returns (n, brier).
    */
  def brier(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val p = col(scoreCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    df.select(p.as("p"), y.as("y"))
      .groupBy(col("p"), col("y"))
      .agg(count(lit(1)).as("c"))
      .withColumn("term", round(
        (col("p") - col("y")) * (col("p") - col("y")), 9))
      .agg(sum(col("c")).as("n"),
        round(sum(col("c").cast("decimal(10,0)") *
            col("term").cast("decimal(18,9)")).cast("double") /
          sum(col("c")), 6).as("brier"))
  }

  /** Per-bin reliability curve -- the calibration DIAGRAM behind
    * [[ece]]'s aggregate readout: one row per occupied score bin with
    * its count, mean (clamped) confidence, positive rate, and 9-dp
    * gap. Same clamp/bin/rounding discipline as [[ece]] (the two must
    * agree bin-for-bin), same ≤nBins scale shape.
    */
  def reliabilityBins(df: DataFrame, labelCol: String, scoreCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"reliabilityBins: nBins must be >= 1, got $nBins")
    val s = col(scoreCol).cast("double")
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val sClamped = least(greatest(s, lit(0.0)), lit(1.0))
    df.select(greatest(lit(0),
        least(floor(s * nBins).cast("int"), lit(nBins - 1))).as("bin"),
      sClamped.cast("decimal(18,6)").as("sd"), y.as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("sd")).as("__ssum"),
        sum(col("y")).as("__ypos"))
      .select(col("bin"), col("n"),
        round(col("__ssum").cast("double") / col("n"), 9).as("conf"),
        round(col("__ypos").cast("double") / col("n"), 9).as("acc"),
        round(abs(col("__ssum").cast("double") / col("n") -
          col("__ypos").cast("double") / col("n")), 9).as("gap"))
  }

  /** Spearman rank correlation -- the monotonic-association readout
    * (does the model score ORDER documents like the labels do?),
    * tie-aware via average ranks, with NO row-level rank window:
    *
    *  - both columns round to 6 dp (the [[auc]] bounded-domain
    *    contract), so each column's rank table is a cumulative window
    *    over DISTINCT values only;
    *  - each row then joins its value's DOUBLED average rank
    *    r2 = 2*cumCount - count + 1 (an exact integer; doubling both
    *    rank columns leaves the correlation invariant, and integer
    *    ranks make every moment exact);
    *  - Pearson assembles from decimal(38,0) moments with ONE double
    *    conversion at the end.
    *
    * Exactness bound: the n*Sxy cross term stays inside decimal(38,0)
    * up to ~1e9 rows; past that, pre-aggregate (the 6-dp rounding
    * already bins scores -- feed the per-value counts through a
    * weighted variant) rather than feeding raw corpus rows. Returns
    * (n, spearman); null when either column is constant.
    */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(round(col(xCol).cast("double"), 6).as("x"),
      round(col(yCol).cast("double"), 6).as("y"))
    def rankTable(c: String) = {
      val w = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, 0)
      base.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .withColumn("__cm", sum(col("__c")).over(w))
        .select(col(c),
          (lit(2) * col("__cm") - col("__c") + 1).as(s"r_$c"))
    }
    val ranked = base.join(rankTable("x"), Seq("x"))
      .join(rankTable("y"), Seq("y"))
    val rx = col("r_x").cast("decimal(19,0)")
    val ry = col("r_y").cast("decimal(19,0)")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(rx).cast("decimal(38,0)").as("sx"),
      sum(ry).cast("decimal(38,0)").as("sy"),
      sum((rx * ry).cast("decimal(38,0)")).as("sxy"),
      sum((rx * rx).cast("decimal(38,0)")).as("sxx"),
      sum((ry * ry).cast("decimal(38,0)")).as("syy"))
    val nD = col("n").cast("decimal(19,0)")
    m.select(col("n"),
      when((nD * col("sxx") - col("sx") * col("sx")) > 0 &&
           (nD * col("syy") - col("sy") * col("sy")) > 0,
        round((nD * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((nD * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((nD * col("syy") - col("sy") * col("sy")).cast("double"))), 6))
        .as("spearman"))
  }

  /** ROUGE-N with clipped counts (Lin 2004, "ROUGE: A Package for
    * Automatic Evaluation of Summaries") -- the n-gram overlap readout
    * for generation/summarization eval at corpus scale: per (ref, hyp)
    * pair, matched = sum over shared n-grams of min(refCount,
    * hypCount) (the clip -- a hypothesis repeating one reference gram
    * can't farm credit), precision = matched/|hyp grams|, recall =
    * matched/|ref grams|, f1 = 2*matched/(|ref|+|hyp|) (all exact
    * integer ratios, one 6-dp rounding each).
    *
    * Scale shape: n-grams are built per row with a codegen'd
    * transform-over-sequence (no UDF), then ONE explode per side into
    * (pair, gram) counts and an equi-join keyed by (pair, gram) --
    * nothing ever pairs grams across different pairs. Pairs with fewer
    * than n tokens on a side have zero grams there (precision/recall
    * null when the denominator is 0).
    */
  def rougeN(pairs: DataFrame, idCol: String, refCol: String,
             hypCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"rougeN: n must be >= 1, got $n")
    def grams(c: Column): Column = {
      val toks = filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    val g = pairs.select(col(idCol).as("id"),
      grams(col(refCol)).as("rg"), grams(col(hypCol)).as("hg"))
    val refCnt = g.select(col("id"), explode(col("rg")).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("rc"))
    val hypCnt = g.select(col("id"), explode(col("hg")).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("hc"))
    val matched = refCnt.join(hypCnt, Seq("id", "gram"))
      .groupBy(col("id")).agg(sum(least(col("rc"), col("hc"))).as("m"))
    g.select(col("id"), size(col("rg")).cast("long").as("n_ref"),
        size(col("hg")).cast("long").as("n_hyp"))
      .join(matched, Seq("id"), "left")
      .select(col("id"), coalesce(col("m"), lit(0L)).as("n_match"),
        col("n_ref"), col("n_hyp"),
        when(col("n_hyp") > 0, round(
          coalesce(col("m"), lit(0L)).cast("double") / col("n_hyp"), 6))
          .as("precision"),
        when(col("n_ref") > 0, round(
          coalesce(col("m"), lit(0L)).cast("double") / col("n_ref"), 6))
          .as("recall"),
        when(col("n_ref") + col("n_hyp") > 0, round(
          lit(2.0) * coalesce(col("m"), lit(0L)) /
            (col("n_ref") + col("n_hyp")), 6)).as("f1"))
  }

  /** ROUGE-L (Lin 2004 §3): longest-common-subsequence recall /
    * precision / F per (ref, hyp) pair -- order-sensitive overlap
    * without [[rougeN]]'s contiguity requirement (a hypothesis that
    * keeps the reference's word ORDER scores high even with gaps;
    * a word-scrambled one does not). The LCS length itself is a
    * custom codegen'd Catalyst expression
    * ([[graft.functions.LcsLength]]) because the DP recurrence is
    * sequential per row and cannot be built from Spark's parallel
    * higher-order functions.
    *
    * Scale shape: pure narrow per-row map -- no explode, no join, no
    * shuffle at all before whatever the caller aggregates. Per-row
    * cost is |ref|·|hyp|; the metric's domain is sentence/summary
    * pairs, so truncate document-scale inputs upstream.
    *
    * Returns (id, lcs, n_ref, n_hyp, precision, recall, f1) -- same
    * ratio conventions as [[rougeN]] (null when a denominator is 0).
    */
  def rougeL(pairs: DataFrame, idCol: String, refCol: String,
             hypCol: String): DataFrame = {
    def toks(c: Column): Column =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    pairs.select(col(idCol).as("id"),
        toks(col(refCol)).as("rt"), toks(col(hypCol)).as("ht"))
      .select(col("id"),
        graft.functions.TextAlign.lcsLength(col("rt"), col("ht"))
          .cast("long").as("lcs"),
        size(col("rt")).cast("long").as("n_ref"),
        size(col("ht")).cast("long").as("n_hyp"))
      .select(col("id"), col("lcs"), col("n_ref"), col("n_hyp"),
        when(col("n_hyp") > 0,
          round(col("lcs").cast("double") / col("n_hyp"), 6)).as("precision"),
        when(col("n_ref") > 0,
          round(col("lcs").cast("double") / col("n_ref"), 6)).as("recall"),
        when(col("n_ref") + col("n_hyp") > 0,
          round(lit(2.0) * col("lcs") / (col("n_ref") + col("n_hyp")), 6))
          .as("f1"))
  }

  /** Smith–Waterman local-alignment contamination score per (ref,
    * hyp) pair -- the edit-TOLERANT companion to exact n-gram
    * decontamination: a benchmark answer pasted into a document with a
    * few token substitutions keeps a near-maximal local alignment,
    * where exact 13-gram containment sees nothing. Uses the
    * [[graft.functions.SwScore]] codegen'd kernel (+2 match, -1
    * mismatch, -1 gap); `sw_norm` divides by the best possible score
    * (2·min(|ref|,|hyp|)), so 1.0 == a verbatim copy of the shorter
    * side and a flagging threshold transfers across lengths.
    *
    * Scale shape: pure narrow per-row map, O(|ref|·|hyp|) per row --
    * truncate to windows upstream, as with [[rougeL]].
    */
  def localAlign(pairs: DataFrame, idCol: String, refCol: String,
                 hypCol: String): DataFrame = {
    def toks(c: Column): Column =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    pairs.select(col(idCol).as("id"),
        toks(col(refCol)).as("rt"), toks(col(hypCol)).as("ht"))
      .select(col("id"),
        graft.functions.TextAlign.swScore(col("rt"), col("ht"))
          .cast("long").as("sw"),
        size(col("rt")).cast("long").as("n_ref"),
        size(col("ht")).cast("long").as("n_hyp"))
      .select(col("id"), col("sw"), col("n_ref"), col("n_hyp"),
        when(least(col("n_ref"), col("n_hyp")) > 0,
          round(col("sw").cast("double") /
            (lit(2.0) * least(col("n_ref"), col("n_hyp"))), 6))
          .as("sw_norm"))
  }

  /** Corpus-level BLEU (Papineni et al. 2002): geometric mean of
    * clipped modified n-gram precisions for n = 1..maxN, times the
    * brevity penalty BP = min(1, e^(1 - refLen/hypLen)) over CORPUS
    * totals -- the standard machine-translation / generation readout,
    * complementing [[rougeN]]'s recall orientation. Clipping is
    * per-pair (a hypothesis gram matches at most its count in that
    * pair's reference); precisions pool matched and total gram counts
    * across the whole corpus before dividing (corpus BLEU, not a mean
    * of sentence BLEUs). Zero matches at any order make the geometric
    * mean -- and BLEU -- exactly 0.
    *
    * Scale shape: per-row gram construction for all maxN orders in one
    * codegen'd pass (an (n, gram) struct array), ONE explode per side
    * into (pair, n, gram) counts, an equi-join keyed by (pair, n,
    * gram), then a conditional aggregation to ONE row of 2·maxN+2
    * integral counters -- mergeable across any partitioning; the only
    * floating math is the final ln/exp on that one row.
    *
    * Returns one row: (ref_len, hyp_len, p1..pmaxN at 6 dp, bp, bleu).
    */
  def bleu(pairs: DataFrame, idCol: String, refCol: String,
           hypCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"bleu: maxN must be in [1,8], got $maxN")
    def toks(c: Column): Column =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    // (n, gram) pairs for every order in one array, so each side pays
    // ONE explode regardless of maxN
    def grams(tk: Column): Column =
      concat((1 to maxN).map { n =>
        when(size(tk) >= n,
          transform(sequence(lit(0), size(tk) - n),
            i => struct(lit(n).as("n"),
              array_join(slice(tk, i + 1, lit(n)), " ").as("gram"))))
          .otherwise(array().cast("array<struct<n:int,gram:string>>"))
      }: _*)
    val g = pairs.select(col(idCol).as("id"),
        toks(col(refCol)).as("rt"), toks(col(hypCol)).as("ht"))
      .select(col("id"),
        size(col("rt")).cast("long").as("ref_len"),
        size(col("ht")).cast("long").as("hyp_len"),
        grams(col("rt")).as("rg"), grams(col("ht")).as("hg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refCnt = g.select(col("id"), explode(col("rg")).as("gr"))
      .groupBy(col("id"), col("gr.n").as("n"), col("gr.gram").as("gram"))
      .agg(count(lit(1)).as("rc"))
    val hypCnt = g.select(col("id"), explode(col("hg")).as("gr"))
      .groupBy(col("id"), col("gr.n").as("n"), col("gr.gram").as("gram"))
      .agg(count(lit(1)).as("hc"))
    // corpus-pooled clipped matches per order, as maxN counter columns
    val mCols = (1 to maxN).map(n =>
      coalesce(sum(when(col("n") === n, least(col("rc"), col("hc")))),
        lit(0L)).as(s"m$n"))
    val matched = refCnt.join(hypCnt, Seq("id", "n", "gram"))
      .agg(mCols.head, mCols.tail: _*)
    val tCols = sum(col("ref_len")).as("ref_len") +:
      sum(col("hyp_len")).as("hyp_len") +:
      (1 to maxN).map(n =>
        sum(greatest(col("hyp_len") - lit(n - 1), lit(0L))).as(s"t$n"))
    val totals = g.agg(tCols.head, tCols.tail: _*)
    val one = totals.crossJoin(matched)
    val lnPs = (1 to maxN).map(n =>
      log(col(s"m$n").cast("double") / col(s"t$n").cast("double")))
    val allPositive = (1 to maxN).map(n => col(s"m$n") > 0).reduce(_ && _)
    val bp = when(col("hyp_len") >= col("ref_len") || col("hyp_len") === 0, lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("ref_len").cast("double") / col("hyp_len").cast("double")))
    one.select(
      col("ref_len") +: col("hyp_len") +:
        ((1 to maxN).map(n =>
          when(col(s"t$n") > 0,
            round(col(s"m$n").cast("double") / col(s"t$n"), 6)).as(s"p$n")) ++
          Seq(round(bp, 6).as("bp"),
            when(allPositive,
              round(bp * exp(lnPs.reduce(_ + _) / maxN), 6))
              .otherwise(lit(0.0)).as("bleu"))): _*)
  }

  /** Corpus-level chrF (Popović 2015, "chrF: character n-gram F-score
    * for automatic MT evaluation"): whitespace is stripped, character
    * n-grams for n = 1..maxN are pooled across the corpus with
    * per-pair clipping (like [[bleu]]), precision / recall average the
    * per-order ratios, and chrF_β = (1+β²)·P·R / (β²·P + R) weights
    * recall β² times precision (β = 2 is the paper's
    * best-correlating setting). Orders with zero grams on a side
    * contribute 0 to that side's average -- a documented contract
    * that only matters for near-empty corpora (a real corpus always
    * has 6-gram mass).
    *
    * Scale shape: identical to [[bleu]] -- per-row gram construction
    * for all orders in one codegen'd pass, ONE explode per side,
    * (pair, n, gram) equi-join, conditional aggregation to one row of
    * 3·maxN integral counters; floating math only on that final row.
    *
    * Returns one row: (ref_chars, hyp_chars, prec, recall, chrf).
    */
  def chrF(pairs: DataFrame, idCol: String, refCol: String,
           hypCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"chrF: maxN must be in [1,10], got $maxN")
    require(beta > 0, s"chrF: beta must be > 0, got $beta")
    def chars(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", "")
    def grams(ch: Column): Column =
      concat((1 to maxN).map { n =>
        when(length(ch) >= n,
          transform(sequence(lit(0), length(ch) - n),
            i => struct(lit(n).as("n"), ch.substr(i + 1, lit(n)).as("gram"))))
          .otherwise(array().cast("array<struct<n:int,gram:string>>"))
      }: _*)
    val g = pairs.select(col(idCol).as("id"),
        chars(col(refCol)).as("rch"), chars(col(hypCol)).as("hch"))
      .select(col("id"),
        length(col("rch")).cast("long").as("ref_chars"),
        length(col("hch")).cast("long").as("hyp_chars"),
        grams(col("rch")).as("rg"), grams(col("hch")).as("hg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refCnt = g.select(col("id"), explode(col("rg")).as("gr"))
      .groupBy(col("id"), col("gr.n").as("n"), col("gr.gram").as("gram"))
      .agg(count(lit(1)).as("rc"))
    val hypCnt = g.select(col("id"), explode(col("hg")).as("gr"))
      .groupBy(col("id"), col("gr.n").as("n"), col("gr.gram").as("gram"))
      .agg(count(lit(1)).as("hc"))
    val mCols = (1 to maxN).map(n =>
      coalesce(sum(when(col("n") === n, least(col("rc"), col("hc")))),
        lit(0L)).as(s"m$n"))
    val matched = refCnt.join(hypCnt, Seq("id", "n", "gram"))
      .agg(mCols.head, mCols.tail: _*)
    val tCols = sum(col("ref_chars")).as("ref_chars") +:
      sum(col("hyp_chars")).as("hyp_chars") +:
      ((1 to maxN).map(n =>
        sum(greatest(col("ref_chars") - lit(n - 1), lit(0L))).as(s"tr$n")) ++
        (1 to maxN).map(n =>
          sum(greatest(col("hyp_chars") - lit(n - 1), lit(0L))).as(s"th$n")))
    val totals = g.agg(tCols.head, tCols.tail: _*)
    val one = totals.crossJoin(matched)
    val pAvg = (1 to maxN).map(n =>
      when(col(s"th$n") > 0,
        col(s"m$n").cast("double") / col(s"th$n")).otherwise(lit(0.0)))
      .reduce(_ + _) / maxN
    val rAvg = (1 to maxN).map(n =>
      when(col(s"tr$n") > 0,
        col(s"m$n").cast("double") / col(s"tr$n")).otherwise(lit(0.0)))
      .reduce(_ + _) / maxN
    val b2 = beta * beta
    one.select(col("ref_chars"), col("hyp_chars"),
      round(pAvg, 6).as("prec"), round(rAvg, 6).as("recall"),
      when(pAvg + rAvg > 0,
        round(lit(1 + b2) * pAvg * rAvg / (lit(b2) * pAvg + rAvg), 6))
        .otherwise(lit(0.0)).as("chrf"))
  }

  /** Krippendorff's alpha, nominal metric (Krippendorff 2011,
    * "Computing Krippendorff's Alpha-Reliability") -- the
    * inter-rater-agreement readout that [[cohenKappa]] cannot give an
    * annotation pipeline in production: ANY number of raters per unit,
    * MISSING ratings allowed (null labels drop; units with fewer than
    * two ratings drop entirely, contributing no pairable values).
    * Input is LONG form: one row per (unit, label) rating.
    *
    *   alpha = 1 - (n-1) * [Σ_u Σ_c o_uc(m_u - o_uc)/(m_u - 1)]
    *               / [Σ_c n_c(n - n_c)]
    *
    * with o_uc the count of label c in unit u, m_u = Σ_c o_uc, n the
    * total pairable values, n_c the label margin. Everything is
    * integral except the per-unit /(m_u - 1) rational terms, which
    * round to 12 dp and accumulate in DECIMAL (order-independent);
    * margin products accumulate in DECIMAL(38,0) (corpus-scale n² can
    * pass long range); one final 6-dp division.
    *
    * Scale shape: hash agg to (unit, label) cells, a unit-keyed margin
    * join, two bounded re-aggregations. Nothing keyed finer than a
    * rating cell. Returns (n_units, n_values, n_labels, alpha); alpha
    * is null when every pairable rating is one label (no expected
    * disagreement to correct against).
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
                        labelCol: String): DataFrame = {
    val o = df.filter(col(labelCol).isNotNull)
      .groupBy(col(unitCol).as("u"), col(labelCol).cast("string").as("c"))
      .agg(count(lit(1)).as("ouc"))
    val m = o.groupBy(col("u")).agg(sum(col("ouc")).as("mu"))
      .filter(col("mu") >= 2)
    val kept = o.join(m, Seq("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = kept.agg(
      countDistinct(col("u")).as("n_units"),
      sum(col("ouc")).as("n"),
      sum(round(col("ouc") * (col("mu") - col("ouc")).cast("double") /
          (col("mu") - 1), 12).cast("decimal(28,12)")).as("do_num"))
    kept.groupBy(col("c")).agg(sum(col("ouc")).as("nc"))
      .crossJoin(broadcast(totals))
      .agg(max(col("n_units")).as("n_units"), max(col("n")).as("n_values"),
        count(lit(1)).as("n_labels"), max(col("do_num")).as("do_num"),
        sum(col("nc").cast("decimal(38,0)") *
          (col("n") - col("nc")).cast("decimal(38,0)")).as("de_num"))
      .select(col("n_units"), col("n_values"), col("n_labels"),
        when(col("de_num") > 0,
          round(lit(1.0) - (col("n_values") - 1).cast("double") *
            col("do_num").cast("double") / col("de_num").cast("double"), 6))
          .as("alpha"))
  }

  /** Cohen's kappa -- chance-corrected inter-rater agreement between
    * two categorical label columns (the label-quality readout of an
    * annotation/RLHF pipeline: how much do two raters, or a model and
    * a gold set, agree beyond chance). Fully INTEGRAL until one final
    * division: with observed agreement po = agree/n and chance
    * agreement pe = sum_k rowTot_k*colTot_k / n^2,
    *
    *   kappa = (po - pe) / (1 - pe) = (agree*n - peNum) / (n^2 - peNum)
    *
    * where peNum = sum_k rowTot_k*colTot_k -- every term a decimal
    * integer (corpus-scale products can reach ~1e26, past long range),
    * so the result is byte-stable at any parallelism.
    *
    * Scale shape: one hash agg to the contingency cells (bounded by
    * |labels|^2), margin re-aggregations over the CELLS, a label-space
    * join for peNum. Nothing keyed finer than a label pair. Returns
    * (n, po, pe, kappa); kappa null when pe = 1 (both raters constant
    * -- agreement beyond chance is undefined).
    */
  def cohenKappa(df: DataFrame, raterACol: String,
                 raterBCol: String): DataFrame = {
    val ct = df.select(col(raterACol).cast("string").as("a"),
        col(raterBCol).cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val rowT = ct.groupBy(col("a").as("lab")).agg(sum(col("c")).as("ra"))
    val colT = ct.groupBy(col("b").as("lab")).agg(sum(col("c")).as("cb"))
    val peNum = rowT.join(colT, Seq("lab"))
      .agg(coalesce(sum(col("ra").cast("decimal(19,0)") *
        col("cb").cast("decimal(19,0)")), lit(0).cast("decimal(38,0)"))
        .as("pe_num"))
    val tot = ct.agg(sum(col("c")).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c"))), lit(0L))
        .as("agree"))
    tot.crossJoin(broadcast(peNum))
      .select(col("n"),
        round(col("agree").cast("double") / col("n"), 6).as("po"),
        round(col("pe_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6).as("pe"),
        when(col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)")
            =!= col("pe_num"),
          round((col("agree").cast("decimal(19,0)") * col("n").cast("decimal(19,0)")
              - col("pe_num")).cast("double") /
            (col("n").cast("decimal(19,0)") * col("n").cast("decimal(19,0)")
              - col("pe_num")).cast("double"), 6)).as("kappa"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns -- the drift/association readout (is the event mix
    * independent of the cohort?). Statistic over the FULL margin cross
    * product (observed-zero cells with positive margins contribute
    * their expected mass): chi2 = sum_cells (o - e)^2 / e with
    * e = rowTot*colTot/n. Per-cell terms round to 9 dp and accumulate
    * in DECIMAL; dof = (|rows|-1)*(|cols|-1). The cross join is
    * label-space x label-space -- broadcast territory by construction.
    * Returns (n, dof, chi2).
    */
  def chi2Independence(df: DataFrame, xCol: String,
                       yCol: String): DataFrame = {
    val ct = df.select(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val rowT = ct.groupBy(col("x")).agg(sum(col("c")).as("rx"))
    val colT = ct.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val n = ct.agg(sum(col("c")).as("n"))
    val cells = rowT.crossJoin(broadcast(colT))
      .join(ct, Seq("x", "y"), "left")
      .crossJoin(broadcast(n))
      .withColumn("e",
        col("rx").cast("double") * col("cy").cast("double") /
          col("n").cast("double"))
      .withColumn("o", coalesce(col("c"), lit(0L)).cast("double"))
      .withColumn("term",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 9))
    cells.agg(first(col("n")).as("n"),
      ((countDistinct(col("x")) - 1) * (countDistinct(col("y")) - 1))
        .as("dof"),
      round(sum(col("term").cast("decimal(38,9)")).cast("double"), 6)
        .as("chi2"))
  }

  /** Poisson-bootstrap confidence interval for a mean (Chamandy et
    * al. 2012, "Estimating Uncertainty for Massive Data Streams" --
    * the bootstrap that works at corpus scale): instead of B
    * resampling PASSES, each row draws an independent Poisson(1)
    * weight per replicate (the large-n limit of multinomial resample
    * counts), so all B replicate means come out of ONE weighted
    * aggregation. The CI is the percentile interval over the B means.
    *
    * Deterministic & portable BY CONSTRUCTION: the Poisson draw
    * inverts the CDF on u = FNV-1a("id#b:seed") millionths -- the
    * engine's portable sample-bucket construction -- against shared
    * literal CDF constants, values round to 6 dp and accumulate in
    * DECIMAL, each replicate mean is one rounded division, and both
    * engines interpolate the same percentile definition (p·(n-1)
    * linear). No RNG state anywhere.
    *
    * Scale shape: the explode multiplies volume by `reps` -- the
    * Poisson trick removes the resampling passes, not the ×B
    * arithmetic. At full corpus scale run it over the metric's
    * already-aggregated inputs or a sampled frame; B itself needs no
    * growth with data size.
    *
    * Returns one row: (n_rows, n_replicates, mean, ci_lo, ci_hi).
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
                      reps: Int = 200, seed: Long = 101L,
                      level: Double = 0.95): DataFrame = {
    require(reps >= 10 && reps <= 10000,
      s"bootstrapMeanCI: reps must be in [10,10000], got $reps")
    require(level > 0 && level < 1,
      s"bootstrapMeanCI: level must be in (0,1), got $level")
    // quantize the tail probabilities so the percentile arguments are
    // clean literals on both engines
    val loQ = math.round((1.0 - level) / 2.0 * 1e6) / 1e6
    val hiQ = 1.0 - loQ
    val base = df.select(
      coalesce(col(idCol).cast("string"), lit("\u0000null")).as("id"),
      round(col(valueCol).cast("double"), 6).cast("decimal(28,6)").as("x"))
    val rep = base.select(col("id"), col("x"),
      explode(sequence(lit(1), lit(reps))).as("b"))
    val u = pmod(graft.functions.VectorExpressions.fnv1a64(
        concat(col("id"), lit("#"), col("b").cast("string"),
          lit(":"), lit(seed.toString))),
      lit(1000000L)).cast("double") / lit(1000000.0)
    // Poisson(1) CDF: e^-1 * sum 1/k!; identical literals in the oracle
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.999916758850712, 0.9999897508033254)
    val w = cdf.zipWithIndex.reverse.foldLeft(lit(8L)) {
      case (acc, (c, k)) => when(u < c, lit(k.toLong)).otherwise(acc)
    }
    val perRep = rep.withColumn("w", w)
      .groupBy(col("b"))
      .agg(sum(col("w")).as("nw"), sum(col("x") * col("w")).as("sx"))
      .filter(col("nw") > 0)
      .select(round(col("sx").cast("double") / col("nw"), 6).as("m"))
    val ci = perRep.agg(count(lit(1)).as("n_replicates"),
      expr(s"percentile(m, array($loQ, $hiQ))").as("q"))
    base.agg(count(lit(1)).as("n_rows"),
        round(sum(col("x")).cast("double") / count(lit(1)), 6).as("mean"))
      .crossJoin(ci)
      .select(col("n_rows"), col("n_replicates"), col("mean"),
        round(element_at(col("q"), 1), 6).as("ci_lo"),
        round(element_at(col("q"), 2), 6).as("ci_hi"))
  }

  /** One-pass evaluation report: AUC, positive rate, Brier, log-loss,
    * and the threshold confusion metrics (accuracy / precision /
    * recall / F1) all from a SINGLE distinct-(p, y) cell reduction --
    * the efficiency shape a production eval loop wants, where running
    * [[auc]], [[brier]], [[logLoss]] and a confusion sweep separately
    * means four scans of the scored corpus. One shuffle touches row
    * volume (the cell hash-agg); everything downstream operates on
    * cells.
    *
    * Contract: scores round to 6 dp before the cell grouping (the
    * [[auc]] bounded-domain contract, here applied to every metric --
    * Brier/log-loss on a probability scorer move by < 1e-5 absolute
    * under 6-dp score rounding). Returns one row: (n, n_pos, pos_rate,
    * auc, brier, log_loss, accuracy, precision, recall, f1).
    */
  def scoreReport(df: DataFrame, labelCol: String, scoreCol: String,
                  threshold: Double = 0.5, eps: Double = 1e-15): DataFrame = {
    val cells = df.select(round(col(scoreCol).cast("double"), 6).as("p"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("p"), col("y")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aucRow = mannWhitney(cells.groupBy(col("p").as("s"))
      .agg(sum(when(col("y") === 1L, col("c")).otherwise(0L)).as("np_s"),
        sum(when(col("y") === 0L, col("c")).otherwise(0L)).as("nn_s")),
      "auc")
    val pc = least(greatest(col("p"), lit(eps)), lit(1.0 - eps))
    val scalars = cells.agg(
      sum(col("c")).as("n"),
      sum(when(col("y") === 1L, col("c")).otherwise(0L)).as("n_pos"),
      sum((round((col("p") - col("y")) * (col("p") - col("y")), 9)
          .cast("decimal(18,9)") * col("c")).cast("decimal(38,9)")).as("bsum"),
      sum((round(when(col("y") === 1L, -log(pc))
            .otherwise(-log(lit(1.0) - pc)), 9)
          .cast("decimal(18,9)") * col("c")).cast("decimal(38,9)")).as("lsum"),
      sum(when(col("y") === 1L && col("p") >= threshold, col("c"))
        .otherwise(0L)).as("tp"),
      sum(when(col("y") === 0L && col("p") >= threshold, col("c"))
        .otherwise(0L)).as("fp"),
      sum(when(col("y") === 1L && col("p") < threshold, col("c"))
        .otherwise(0L)).as("fnn"),
      sum(when(col("y") === 0L && col("p") < threshold, col("c"))
        .otherwise(0L)).as("tn"))
    scalars.crossJoin(aucRow.select(col("auc")))
      .select(col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        col("auc"),
        round(col("bsum").cast("double") / col("n"), 6).as("brier"),
        round(col("lsum").cast("double") / col("n"), 6).as("log_loss"),
        round((col("tp") + col("tn")).cast("double") / col("n"), 6)
          .as("accuracy"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fnn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fnn")), 6))
          .as("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fnn") > 0,
          round(lit(2.0) * col("tp") /
            (lit(2) * col("tp") + col("fp") + col("fnn")), 6)).as("f1"))
  }

  /** Per-group log-loss with a worst-group flag -- the
    * group-robustness readout (Sagawa et al. 2020, "Distributionally
    * Robust Neural Networks for Group Shift"): average loss can hide a
    * subpopulation the scorer fails on; the flagged row is the group a
    * DRO-style reweighting would up-weight. Same distinct-(p, y)-cell
    * reduction and rounding discipline as [[logLoss]], keyed by group.
    * Returns (group, n, log_loss, is_worst), worst first.
    */
  def logLossByGroup(df: DataFrame, groupCol: String, labelCol: String,
                     scoreCol: String, eps: Double = 1e-15): DataFrame = {
    val p0 = col(scoreCol).cast("double")
    val p = least(greatest(p0, lit(eps)), lit(1.0 - eps))
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    val per = df.select(col(groupCol).as("group"), p.as("p"), y.as("y"))
      .groupBy(col("group"), col("p"), col("y"))
      .agg(count(lit(1)).as("c"))
      .withColumn("term", round(
        when(col("y") === 1L, -log(col("p")))
          .otherwise(-log(lit(1.0) - col("p"))), 9))
      .groupBy(col("group"))
      .agg(sum(col("c")).as("n"),
        round(sum((col("term").cast("decimal(18,9)") * col("c"))
            .cast("decimal(38,9)")).cast("double") /
          sum(col("c")), 6).as("log_loss"))
    val worst = per.agg(max(col("log_loss")).as("__worst"))
    per.crossJoin(broadcast(worst))
      .select(col("group"), col("n"), col("log_loss"),
        (col("log_loss") === col("__worst")).as("is_worst"))
      .orderBy(col("log_loss").desc, col("group").asc)
  }

  def logLoss(df: DataFrame, labelCol: String, scoreCol: String,
              eps: Double = 1e-15): DataFrame = {
    val p0 = col(scoreCol).cast("double")
    val p = least(greatest(p0, lit(eps)), lit(1.0 - eps))
    val y = when(col(labelCol).cast("boolean"), 1L).otherwise(0L)
    df.select(p.as("p"), y.as("y"))
      .groupBy(col("p"), col("y"))
      .agg(count(lit(1)).as("c"))
      .withColumn("term", round(
        when(col("y") === 1L, -log(col("p"))).otherwise(-log(lit(1.0) - col("p"))),
        9))
      .agg(sum(col("c")).as("n"),
        round(sum((col("term").cast("decimal(18,9)") * col("c"))
            .cast("decimal(38,9)")).cast("double") /
          sum(col("c")), 6).as("log_loss"))
  }

  /** Pinball (quantile) loss per requested quantile — THE proper
    * scoring rule for quantile forecasts (Koenker & Bassett 1978's
    * check function): loss_q(y, ŷ) = q·(y−ŷ) when y ≥ ŷ else
    * (q−1)·(y−ŷ). A forecast that claims "90% of demand lands below
    * this" is graded exactly on that claim — the capacity-planning /
    * SLA-forecast eval the symmetric MAE cannot express.
    *
    * One pass: each row fans out ×|qs| (small), per-q conditional
    * terms accumulate in DECIMAL (inputs cast to DECIMAL(18,6), q at
    * DECIMAL(7,6) — products and sums exact, order-independent under
    * any partial-agg schedule), one double division per output row.
    * Returns (q, n, total_loss, mean_loss) sorted by q.
    */
  def pinballLoss(df: DataFrame, yCol: String, yhatCol: String,
                  qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      "pinballLoss: quantiles must lie strictly inside (0, 1)")
    df.select(col(yCol).cast("decimal(18,6)").as("y"),
        col(yhatCol).cast("decimal(18,6)").as("yh"),
        explode(array(qs.map(q => lit(q).cast("decimal(7,6)")): _*)).as("q"))
      .withColumn("d", col("y") - col("yh"))
      .withColumn("loss", when(col("d") >= 0, col("q") * col("d"))
        .otherwise((col("q") - lit(1)) * col("d")))
      .groupBy(col("q").cast("double").as("q"))
      .agg(count(lit(1)).as("n"),
        sum(col("loss")).cast("double").as("total_loss"))
      .withColumn("mean_loss", col("total_loss") / col("n").cast("double"))
      .orderBy("q")
  }

  /** Mutual information between two categorical columns, in nats, plus
    * the entropies and the sqrt-normalized NMI (Strehl & Ghosh 2002) —
    * the effect-SIZE companion to [[chi2Independence]]'s significance
    * statistic (chi2 grows with n even for trivial dependence; MI does
    * not). MI = Σ_xy p_xy·ln(p_xy/(p_x·p_y)) over OBSERVED cells (an
    * empty cell's term is 0, unlike chi2 where zero cells carry
    * expected mass).
    *
    * Determinism: every ln argument is a ratio of exact integer counts
    * in one fixed double shape; the ln (the only cross-engine-unstable
    * step — Java vs libm drift a last ulp, the x_collocations lesson)
    * rounds to 9 dp, each p-weighted term rounds to 12 dp and
    * accumulates in DECIMAL, final metrics round to 6 dp. NMI divides
    * the already-rounded metrics (fixed shape, bit-stable).
    *
    * Scale shape: one contingency hash aggregation (map-side combined),
    * margins re-aggregate its |X|·|Y|-bounded output, scalar totals
    * broadcast — nothing keyed finer than a cell. Chi2's discipline.
    */
  def mutualInformation(df: DataFrame, xCol: String,
                        yCol: String): DataFrame = {
    val ct = df.select(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val rowT = ct.groupBy(col("x")).agg(sum(col("c")).as("rx"))
    val colT = ct.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val n = ct.agg(sum(col("c")).as("n"))
    def nd(c: Column) = c.cast("double")
    // Σ p·ln(arg) with per-term 12-dp decimal accumulation; `arg` built
    // at each call site so engine and oracle share the exact shape
    def plnSum(cnt: Column, arg: Column): Column =
      round(sum(
        round((nd(cnt) / nd(col("n"))) * round(log(arg), 9), 12)
          .cast("decimal(38,12)")).cast("double"), 6)
    val mi = ct.join(rowT, Seq("x")).join(broadcast(colT), Seq("y"))
      .crossJoin(broadcast(n))
      .agg(first(col("n")).as("n"), count(lit(1)).as("n_cells"),
        plnSum(col("c"),
          (nd(col("c")) * nd(col("n"))) / (nd(col("rx")) * nd(col("cy"))))
          .as("mi"))
    val hx = rowT.crossJoin(broadcast(n))
      .agg(plnSum(col("rx"), nd(col("n")) / nd(col("rx"))).as("hx"))
    val hy = colT.crossJoin(broadcast(n))
      .agg(plnSum(col("cy"), nd(col("n")) / nd(col("cy"))).as("hy"))
    mi.crossJoin(hx).crossJoin(hy)
      .select(col("n"), col("n_cells"), col("hx"), col("hy"), col("mi"),
        when(col("hx") > 0 && col("hy") > 0,
          round(col("mi") / sqrt(col("hx") * col("hy")), 6)).as("nmi"))
  }

  /** Shared Kolmogorov–Smirnov finish over per-bin (bin, ca, cb)
    * counts: D = max_bin |CDF_a − CDF_b| evaluated WITHOUT any
    * per-bin division — the gap cross-multiplies to
    * |cum_ca·nb − cum_cb·na| (exact integers in DECIMAL, the q_tpch17
    * threshold trick), so the statistic is integer-exact until ONE
    * final division. ks_stat scales D by sqrt(na·nb/(na+nb)) (the
    * two-sample asymptotic normalization); sqrt is IEEE-exact on the
    * bit-stable ratio, so no transcendental rounding is needed
    * anywhere. `private[graft]` so a streaming registry row can close
    * a streamed bin-count sink with the identical reduce.
    */
  private[graft] def ksFromBinCounts(bins: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // the totals ride in the SAME sorted window pass (full frame), so
    // the bin aggregation upstream is evaluated exactly once
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .select(col("bin"), col("ca"), col("cb"),
        sum(col("ca")).over(w).as("cum_a"),
        sum(col("cb")).over(w).as("cum_b"),
        sum(col("ca")).over(wAll).as("ta"),
        sum(col("cb")).over(wAll).as("tb"))
      .agg(max(col("ta")).as("na"), max(col("tb")).as("nb"),
        count(lit(1)).as("n_bins_used"),
        max(abs(col("cum_a").cast("decimal(38,0)") * col("tb") -
          col("cum_b").cast("decimal(38,0)") * col("ta"))).as("d_num"))
      .select(col("na"), col("nb"), col("n_bins_used"),
        when(col("na") > 0 && col("nb") > 0,
          round(col("d_num").cast("double") /
            (col("na").cast("double") * col("nb").cast("double")), 6)).as("d"),
        when(col("na") > 0 && col("nb") > 0,
          round(sqrt((col("na").cast("double") * col("nb").cast("double")) /
              (col("na") + col("nb")).cast("double")) *
            (col("d_num").cast("double") /
              (col("na").cast("double") * col("nb").cast("double"))), 6))
          .as("ks_stat"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test over equal-width bins —
    * the distribution-shift readout for NUMERIC features (PSI's
    * fixed-bin cousin with a proper statistic; q_psi_drift / chi2 cover
    * the categorical side). Values bin into `nBins` equal-width buckets
    * over the caller-declared [lo, hi) domain (out-of-range clamps to
    * the edge bins, the aucBinned contract); the binned D understates
    * the exact D by at most the largest single-bin probability mass
    * (≲ 1/nBins for smooth distributions).
    *
    * DOCUMENTED CONTRACT — the bin domain is what makes this
    * corpus-scale safe: the cumulative window in [[ksFromBinCounts]]
    * sees ≤ nBins rows, never data rows (exact per-value KS would put
    * a partition-less window over every distinct double).
    */
  def ksTestBinned(df: DataFrame, valueCol: String, groupCol: String,
                   groupA: String, groupB: String, lo: Double, hi: Double,
                   nBins: Int = 1024): DataFrame = {
    require(nBins >= 2, s"ksTestBinned: nBins must be >= 2, got $nBins")
    require(lo < hi, s"ksTestBinned: need lo < hi, got [$lo, $hi)")
    val v = col(valueCol).cast("double")
    val g = col(groupCol).cast("string")
    ksFromBinCounts(df
      .filter(g === groupA || g === groupB)
      .select(greatest(lit(0), least(
          floor((v - lo) / lit(hi - lo) * nBins).cast("int"),
          lit(nBins - 1))).as("bin"),
        g.as("g"))
      .groupBy(col("bin"))
      .agg(count(when(col("g") === groupA, 1)).as("ca"),
        count(when(col("g") === groupB, 1)).as("cb")))
  }

  /** Clustering-quality evaluation — pairwise precision/recall/F1 and
    * the Adjusted Rand Index (Hubert & Arabie 1985) of a predicted
    * clustering against ground-truth labels, the grading step of every
    * dedup / entity-resolution pipeline (did the clusters find the
    * true duplicate pairs?).
    *
    * THE SCALE TRICK: all four metrics are functions of pair-count
    * sufficient statistics that need NO pair enumeration — Σ c·(c−1)
    * over contingency cells (pairs both agree on), over predicted
    * cluster sizes, and over truth class sizes. A corpus with 1e11
    * rows has ~1e22 pairs; the sufficient statistics are three
    * hash aggregations over the contingency table. Doubled pair
    * counts (c·(c−1), not C(c,2)) stay integral in DECIMAL(38,0);
    * every metric is a fixed double shape over exact integers (no
    * transcendental anywhere), one 6-dp rounding each.
    * F1 folds exactly: 2PR/(P+R) = 2·s_cells / (s_pred + s_truth).
    * ARI's expected-index term E = s_pred·s_truth/n_pairs evaluates
    * in doubles (its operands are exact integers; the ratio is one
    * fixed shape); ARI = (s_cells − E) / ((s_pred+s_truth)/2 − E),
    * null when the denominator is 0 (both clusterings trivial).
    */
  def clusteringEval(df: DataFrame, idCol: String, predCol: String,
                     truthCol: String): DataFrame = {
    def pairs2(c: Column) =
      sum(c.cast("decimal(38,0)") * (c - 1).cast("decimal(38,0)"))
    val cells = df.select(col(predCol).cast("string").as("p"),
        col(truthCol).cast("string").as("t"))
      .groupBy(col("p"), col("t")).agg(count(lit(1)).as("c"))
    val stats = cells.agg(
        sum(col("c")).as("n"), pairs2(col("c")).as("s_cells"))
      .crossJoin(broadcast(cells.groupBy(col("p"))
        .agg(sum(col("c")).as("a"))
        .agg(count(lit(1)).as("n_pred"), pairs2(col("a")).as("s_pred"))))
      .crossJoin(broadcast(cells.groupBy(col("t"))
        .agg(sum(col("c")).as("b"))
        .agg(count(lit(1)).as("n_truth"), pairs2(col("b")).as("s_truth"))))
    def nd(c: Column) = c.cast("double")
    stats
      .withColumn("e", (nd(col("s_pred")) * nd(col("s_truth"))) /
        (nd(col("n")) * (nd(col("n")) - 1.0)))
      .select(col("n"), col("n_pred"), col("n_truth"),
        when(col("s_pred") > 0,
          round(nd(col("s_cells")) / nd(col("s_pred")), 6)).as("precision"),
        when(col("s_truth") > 0,
          round(nd(col("s_cells")) / nd(col("s_truth")), 6)).as("recall"),
        when(col("s_pred") + col("s_truth") > 0,
          round(lit(2.0) * nd(col("s_cells")) /
            (nd(col("s_pred")) + nd(col("s_truth"))), 6)).as("f1"),
        when(abs((nd(col("s_pred")) + nd(col("s_truth"))) / 2.0 - col("e"))
            > 0,
          round((nd(col("s_cells")) - col("e")) /
            ((nd(col("s_pred")) + nd(col("s_truth"))) / 2.0 - col("e")), 6))
          .as("ari"))
  }

  /** Split-conformal calibration (Vovk et al. 2005 "Algorithmic
    * Learning in a Random World"; Papadopoulos et al. 2002;
    * Angelopoulos & Bates 2021, arXiv:2107.07511 sec. 2): with n
    * calibration nonconformity scores, the level-alpha threshold qhat
    * is the ceil((n+1)*(1-alpha))-th smallest calibration score, and
    * prediction sets {y : s(x,y) <= qhat} cover the truth with
    * probability >= 1-alpha — finite-sample, distribution-free. One
    * row per alpha: (alpha, n_calib, rk, qhat, n_eval, coverage)
    * where coverage is the EVAL-side fraction of scores <= qhat (the
    * guarantee's empirical check, expected >= 1-alpha up to binomial
    * noise). An alpha whose rank exceeds n_calib yields a null qhat
    * and null coverage — the honest "not enough calibration data"
    * signal (n rows can only certify alpha >= 1/(n+1)).
    *
    * Determinism / scale contract: scores round to 6 dp and reduce to
    * one row per DISTINCT value per side (the [[auc]] bounded-domain
    * contract — the only shuffles touching row volume are two hash
    * aggregates); the rank thresholds resolve with the prev_cum < rk
    * <= cum predicate over calibration's distinct-value cumulative
    * frame (no row-level sort or rank anywhere); eval coverage is one
    * conditional sum over eval's distinct-value frame against the
    * |alphas|-row broadcast threshold frame. One final IEEE division
    * per alpha. Empty calibration input still returns one row per
    * alpha (n_calib 0, null qhat).
    */
  def conformal(df: DataFrame, scoreCol: String, calibCol: String,
                alphas: Seq[Double]): DataFrame = {
    val base = df.select(
      round(col(scoreCol).cast("double"), 6).cast("decimal(18,6)").as("s"),
      col(calibCol).cast("boolean").as("__cal"))
    conformalFromCounts(
      base.filter(col("__cal")).groupBy(col("s")).agg(count(lit(1)).as("c")),
      base.filter(!col("__cal")).groupBy(col("s")).agg(count(lit(1)).as("c")),
      alphas)
  }

  /** Counts-based core of [[conformal]]: both sides arrive as
    * (s, c) distinct-score count frames — EXACTLY the mergeable
    * O(distinct-scores) state a streaming complete-mode aggregate
    * emits, so a stream can accumulate calibration scores and this
    * closure prices the thresholds once on the sink
    * (q_stream_conformal; the benfordFromCounts / mannWhitney
    * closure pattern). Scores are expected already rounded/cast to
    * their presentation type by the caller.
    */
  def conformalFromCounts(calCounts: DataFrame, evalCounts: DataFrame,
                          alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty, "conformal: need at least one alpha")
    require(alphas.forall(a => a > 0 && a < 1),
      s"conformal: alphas must be in (0,1), got $alphas")
    require(alphas.distinct.size == alphas.size,
      s"conformal: duplicate alphas in $alphas")
    val calDist = calCounts.select(col("s"), col("c").cast("long").as("__c"))
    // always exactly one row, even for an empty calibration side —
    // the frame every alpha's rank computation hangs off
    val nFrame = calDist.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))
    val alphaArr = array(alphas.map(lit): _*)
    def rkOf(n: Column, a: Column) =
      ceil((n + lit(1)).cast("double") * (lit(1.0) - a)).cast("long")
    val wl = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = calDist.withColumn("__cum", sum(col("__c")).over(wl))
      .crossJoin(broadcast(nFrame))
    // prev_cum < rk <= cum picks exactly the rk-th smallest score
    // (datasheet/quantileBins discipline: never rank individual rows)
    val picked = cum
      .select(col("s"), col("__c"), col("__cum"), col("__n"),
        explode(alphaArr).as("alpha"))
      .withColumn("__rk", rkOf(col("__n"), col("alpha")))
      .filter(col("__cum") >= col("__rk") &&
        col("__cum") - col("__c") < col("__rk"))
      .select(col("alpha"), col("s").as("qhat"))
    val allAlphas = nFrame
      .select(explode(alphaArr).as("alpha"), col("__n"))
      .select(col("alpha"), col("__n").as("n_calib"),
        rkOf(col("__n"), col("alpha")).as("rk"))
    val thresholds = allAlphas.join(picked, Seq("alpha"), "left")
    val evalDist = evalCounts.select(col("s"), col("c").cast("long").as("__ce"))
    val covAgg = evalDist
      .crossJoin(broadcast(thresholds.select(col("alpha"), col("qhat"))))
      .groupBy(col("alpha"))
      .agg(sum(col("__ce")).as("n_eval"),
        sum(when(col("s") <= col("qhat"), col("__ce")).otherwise(0L))
          .as("__cov"))
    thresholds.join(covAgg, Seq("alpha"), "left")
      .select(col("alpha"), col("n_calib"), col("rk"),
        col("qhat").cast("double").as("qhat"), col("n_eval"),
        when(col("qhat").isNotNull && col("n_eval").isNotNull,
          round(col("__cov").cast("double") / col("n_eval"), 6))
          .as("coverage"))
      .orderBy(col("alpha"))
  }

  /** Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995,
    * JRSS-B 57(1)): given m hypotheses with p-values, reject the
    * smallest k where k = max{i : p_(i) <= i*q/m} — the standard
    * multiple-testing correction for experiment platforms scoring
    * many metrics at once (plain per-metric alpha inflates false
    * positives linearly in m). `q` is passed as the RATIONAL
    * qNum/qDen so the acceptance test cross-multiplies to
    * p * m * qDen <= i * qNum in exact decimal/integer arithmetic —
    * no float threshold, bit-stable on any engine (the q_tpch17/22
    * discipline). Returns one row per hypothesis: (id, p, rank,
    * qualifies, significant) — `qualifies` is the raw per-rank test,
    * `significant` the BH closure (everything at or below the LAST
    * qualifying rank, including interior non-qualifiers).
    *
    * Scale shape: the rank window is global but over the HYPOTHESIS
    * frame — m is the number of metrics under test (dozens to
    * thousands), never event volume; ties order by (p, id) so ranks
    * are deterministic. One window + one 1-row broadcast max.
    */
  def bhFdr(df: DataFrame, idCol: String, pCol: String,
            qNum: Long, qDen: Long): DataFrame = {
    require(qNum > 0 && qDen > 0 && qNum < qDen,
      s"bhFdr: q must be a rational in (0,1), got $qNum/$qDen")
    val base = df.select(col(idCol).cast("string").as("id"),
      round(col(pCol).cast("double"), 6).cast("decimal(18,6)").as("p"))
    val w = Window.orderBy(col("p").asc, col("id").asc)
    val ranked = base
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__m"))))
      .withColumn("rank", row_number().over(w))
      .withColumn("qualifies",
        col("p") * col("__m") * lit(qDen) <= col("rank") * lit(qNum))
    val kmax = ranked.agg(
      coalesce(max(when(col("qualifies"), col("rank"))), lit(0))
        .as("__kmax"))
    ranked.crossJoin(broadcast(kmax))
      .select(col("id"), col("p").cast("double").as("p"), col("rank"),
        col("qualifies"),
        (col("rank") <= col("__kmax")).as("significant"))
      .orderBy(col("rank"))
  }

  /** Chi-square goodness-of-fit against expected RATIONAL shares —
    * the sample-ratio-mismatch (SRM) guardrail (Fabijan et al. 2019,
    * KDD "Diagnosing Sample Ratio Mismatch"): an A/B split that was
    * supposed to be 1:1 but isn't invalidates every downstream
    * readout before any metric is looked at. Expected shares are
    * (name -> (num, den)) rationals so E_i = N*num/den is one exact
    * integer ratio evaluated in a fixed double shape. Returns one row
    * per expected group: (group, n_obs, n_exp, term) plus the global
    * stat / dof / srm_flag (stat > critValue) repeated per row.
    * Groups observed in the data but absent from `expected` raise at
    * plan-composition time via the unmatched-count guard column.
    *
    * Scale shape: one hash aggregate to |groups| rows, all else on
    * that frame — event volume is touched exactly once.
    */
  def chi2GoF(df: DataFrame, groupCol: String,
              expected: Seq[(String, (Long, Long))],
              critValue: Double): DataFrame =
    chi2GoFFromCounts(
      df.groupBy(col(groupCol).cast("string").as("group"))
        .agg(count(lit(1)).as("n_obs")),
      expected, critValue)

  /** Counts-based core of [[chi2GoF]]: observations arrive as a
    * (group, n_obs) count frame — the mergeable state a streaming
    * complete-mode aggregate emits, so a stream can accumulate arm
    * counts and this closure prices the SRM verdict once per batch
    * (q_stream_srm; the conformalFromCounts pattern).
    */
  def chi2GoFFromCounts(obs: DataFrame,
                        expected: Seq[(String, (Long, Long))],
                        critValue: Double): DataFrame = {
    require(expected.size >= 2, "chi2GoF: need at least 2 expected groups")
    require(expected.forall { case (_, (n, d)) => n > 0 && d > 0 },
      "chi2GoF: expected shares must be positive rationals")
    val exp = expected.map { case (g, (n, d)) =>
      struct(lit(g).as("group"), lit(n).as("num"), lit(d).as("den"))
    }
    val expDf = obs.sparkSession.range(1)
      .select(explode(array(exp: _*)).as("e")).select(col("e.*"))
    // unmatched observed groups would silently vanish from the stat:
    // surface them loudly instead (lazy raise, the abTest discipline)
    val joined = obs.join(expDf, Seq("group"), "full_outer")
      .withColumn("n_obs",
        when(col("num").isNull, raise_error(concat(
          lit("chi2GoF: observed group '"), col("group"),
          lit("' has no expected share"))).cast("long"))
        .otherwise(coalesce(col("n_obs"), lit(0L))))
    val total = joined.agg(sum(col("n_obs")).as("__N"))
    val terms = joined.crossJoin(broadcast(total))
      .withColumn("n_exp",
        col("__N").cast("double") * col("num").cast("double") /
          col("den").cast("double"))
      .withColumn("__term",
        // each term is a fixed double shape; present at 9 dp and sum
        // in DECIMAL so the stat is order-independent across any
        // partitioning of the groups frame
        round((col("n_obs").cast("double") - col("n_exp")) *
          (col("n_obs").cast("double") - col("n_exp")) / col("n_exp"), 9))
    val stat = terms.agg(
      round(sum(col("__term").cast("decimal(28,9)")).cast("double"), 6)
        .as("stat"),
      (count(lit(1)) - 1L).as("dof"))
    terms.crossJoin(broadcast(stat))
      .select(col("group"), col("n_obs"),
        round(col("n_exp"), 6).as("n_exp"),
        round(col("__term"), 6).as("term"),
        col("stat"), col("dof"),
        (col("stat") > critValue).as("srm_flag"))
      .orderBy(col("group"))
  }

  /** Confident-learning label-noise estimate (Northcutt, Jiang &
    * Chuang 2021, JAIR 70 "Confident Learning", arXiv:1911.00068
    * sec. 3): with per-class predicted probabilities p_j and given
    * labels, the class threshold t_j is the mean SELF-confidence
    * avg{p_j(x) : given(x) = j}; each row joins the confident joint
    * at cell (given, suggested) for suggested = argmax over the
    * qualifying classes {j : p_j(x) >= t_j} (ties break to the
    * earliest class in declaration order); rows confident for no
    * class abstain. Off-diagonal confident mass estimates the
    * label-noise rate — the "which labels should a human re-check"
    * readout for labeled training corpora. Returns one row per
    * OBSERVED (given, suggested) cell: (given, suggested, n, frac)
    * plus the global n_rows / n_confident / noise_frac repeated per
    * row. A class with zero given-label rows has no threshold and
    * never qualifies (null comparison), matching CL's exclusion.
    *
    * Determinism: probabilities are taken at 6 dp DECIMAL(18,6); the
    * threshold test p_j >= S_j / n_j cross-multiplies to
    * p_j * n_j >= S_j in exact decimal (integer-exact-threshold
    * discipline, the q_tpch17/22 pattern) so membership is bit-stable
    * on any engine and partitioning; only the final readout fractions
    * divide. Scale shape: one aggregate pass builds the
    * 1-row/2|classes|-column threshold frame (broadcast back), one
    * narrow membership map, one (given, suggested) hash aggregate —
    * nothing keyed finer than a class pair.
    */
  def labelNoise(df: DataFrame, givenCol: String,
                 classes: Seq[(String, Column)]): DataFrame = {
    require(classes.size >= 2,
      s"labelNoise: need at least 2 classes, got ${classes.size}")
    require(classes.map(_._1).distinct.size == classes.size,
      s"labelNoise: duplicate class names in ${classes.map(_._1)}")
    val p6 = classes.zipWithIndex.map { case ((_, c), i) =>
      round(c.cast("double"), 6).cast("decimal(18,6)").as(s"__p$i")
    }
    val base = df.select(col(givenCol).cast("string").as("__g") +: p6: _*)
    val thrCols = classes.zipWithIndex.flatMap { case ((name, _), i) =>
      Seq(sum(when(col("__g") === name, col(s"__p$i"))).as(s"__S$i"),
        sum(when(col("__g") === name, 1L).otherwise(0L)).as(s"__n$i"))
    }
    val thr = base.agg(thrCols.head, thrCols.tail: _*)
    val withThr = base.crossJoin(broadcast(thr))
    // qualify in exact decimal: p_j * n_j >= S_j  <=>  p_j >= t_j
    def qual(j: Int) =
      col(s"__p$j") * col(s"__n$j") >= col(s"__S$j")
    // argmax with earliest-class tie-break: scan classes in order,
    // a later class replaces the running best only when STRICTLY
    // greater (null best = nothing qualified yet)
    val (_, bestName) = classes.zipWithIndex
      .foldLeft((lit(null).cast("decimal(18,6)"),
        lit(null).cast("string"))) {
        case ((bv, bn), ((name, _), j)) =>
          val better = qual(j) && (bv.isNull || col(s"__p$j") > bv)
          (when(better, col(s"__p$j")).otherwise(bv),
            when(better, lit(name)).otherwise(bn))
      }
    val tagged = withThr.withColumn("__sug", bestName)
    val cells = tagged.filter(col("__sug").isNotNull)
      .groupBy(col("__g").as("given"), col("__sug").as("suggested"))
      .agg(count(lit(1)).as("n"))
    val totals = tagged.agg(count(lit(1)).as("n_rows"),
      sum(when(col("__sug").isNotNull, 1L).otherwise(0L))
        .as("n_confident"),
      sum(when(col("__sug").isNotNull && col("__sug") =!= col("__g"), 1L)
        .otherwise(0L)).as("__off"))
    cells.crossJoin(broadcast(totals))
      .select(col("given"), col("suggested"), col("n"),
        round(col("n").cast("double") / col("n_confident"), 6).as("frac"),
        col("n_rows"), col("n_confident"),
        round(col("__off").cast("double") / col("n_confident"), 6)
          .as("noise_frac"))
      .orderBy(col("given"), col("suggested"))
  }
}
