package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — evaluation metrics, experiment statistics, time series.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesEval {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_rouge" -> ((s, d) => {
      // ROUGE-2 with clipped counts over three planted hypothesis
      // regimes: tail-appended copy (recall 1, precision < 1), front
      // half (precision 1, recall < 1), word-reversed (near-zero
      // bigram overlap) — the generation-eval readout, one explode per
      // side, equi-joined per (pair, gram)
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val pairs = docs.select(col("doc_id"), col("text").as("ref"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" zz tail marker")))
          .when(col("doc_id") % 3 === 1,
            col("text").substr(lit(1), floor(length(col("text")) / 2).cast("int")))
          .otherwise(array_join(reverse(toks), " ")).as("hyp"))
      graft.ext.Eval.rougeN(pairs, "doc_id", "ref", "hyp", n = 2)
        .orderBy("id")
    }),

    "x_score_report" -> ((s, d) =>
      // the one-pass eval report over a planted probability scorer
      // (hash-spread scores, en-vs-rest labels): AUC + calibration +
      // threshold metrics from a single distinct-(p,y) cell reduction
      // — four registry rows' worth of readout, one scan
      graft.ext.Eval.scoreReport(
        t(s, d, "documents").select(
          (col("lang") === "en").as("y"),
          (pmod(col("doc_id"), lit(997)).cast("double") / lit(997.0) * lit(0.5)
            + when(col("lang") === "en", lit(0.4)).otherwise(lit(0.1)))
            .as("p")),
        "y", "p")),

    "x_seasonal" -> ((s, d) =>
      // additive trend/weekly-seasonal/residual decomposition of the
      // daily event-count series — load cycles out, anomalies left in
      // the residual. One event pass; every window runs over the
      // post-agg calendar-bounded daily frame with integer sums
      graft.ops.TimeSeries.seasonalDecomposeDaily(events(s, d), "ts_us")),

    "x_rolling_corr" -> ((s, d) =>
      // funnel co-movement monitor: trailing-7-day Pearson correlation
      // of daily click vs purchase counts — integer moments, two IEEE
      // sqrts and one division per row, 6-dp presentation
      graft.ops.TimeSeries.rollingCorrCounts(
        events(s, d).groupBy(date_trunc("day", col("ts_us")).as("day"))
          .agg(count(when(col("event_type") === "click", 1)).as("clicks"),
            count(when(col("event_type") === "purchase", 1)).as("purchases")),
        "day", "clicks", "purchases")),

    "x_changepoint" -> ((s, d) =>
      // retrospective CUSUM change-point scan over the daily event
      // volume: exact-integer numerator n·L_t − t·T per split, one
      // sqrt+division per row, argmax flagged without tolerance
      graft.ops.TimeSeries.changePoint(
        events(s, d).groupBy(date_trunc("day", col("ts_us")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "day", "cnt")),

    "x_burstiness" -> ((s, d) =>
      // Fano factor (variance/mean of daily counts) per event type —
      // Poisson arrivals score 1, incident storms ≫ 1; integer
      // moments, fixed-shape divisions
      graft.ext.Behavior.fanoFactor(events(s, d), "event_type", "ts_us")),

    "x_trend_test" -> ((s, d) =>
      // Mann-Kendall nonparametric trend test on daily event volume:
      // exact-integer pair statistic + tie-corrected variance, one
      // division by 18 and one by a sqrt — "is this metric drifting"
      // without normality assumptions
      graft.ops.TimeSeries.mannKendall(
        events(s, d).groupBy(date_trunc("day", col("ts_us")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "day", "cnt")),

    "x_theil_sen" -> ((s, d) =>
      // robust trend magnitude: median of pairwise slopes over the
      // daily volume — each slope one exact-integer division, median
      // via the exact-percentile parity
      graft.ops.TimeSeries.theilSen(
        events(s, d).groupBy(date_trunc("day", col("ts_us")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "day", "cnt")),

    "x_acf" -> ((s, d) =>
      // autocorrelation at lags 1..7 of daily event volume — the
      // seasonality detector (weekly cycle = lag-7 spike); n-scaled
      // integer deviations keep every sum exact, one division per lag
      graft.ops.TimeSeries.acf(
        events(s, d).groupBy(date_trunc("day", col("ts_us")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "day", "cnt", maxLag = 7)),

    "x_acf_grouped" -> ((s, d) =>
      // per-series ACF: one lag profile PER EVENT TYPE — the keyed
      // telemetry shape; every window partitions by the key (the
      // global form funnels one series through one partition), lag
      // pairs from a key equi-join, same exact-integer deviations
      graft.ops.TimeSeries.acfByKey(
        events(s, d).groupBy(col("event_type").as("etype"),
            date_trunc("day", col("ts_us")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "etype", "day", "cnt", maxLag = 7)),

    "x_pinball" -> ((s, d) =>
      // quantile-forecast eval: pinball loss of a deterministic
      // integer "capacity forecast" (half the length plus a hashed
      // offset) against actual document lengths at q=0.1/0.5/0.9 —
      // DECIMAL-exact accumulation, one division per quantile
      graft.ext.Eval.pinballLoss(
        t(s, d, "documents").select(col("n_chars").as("y"),
          (floor(col("n_chars") / 2) + pmod(col("doc_id"), lit(100)))
            .as("yhat")),
        "y", "yhat", Seq(0.1, 0.5, 0.9))),

    "x_bootstrap_ci" -> ((s, d) =>
      // Poisson-bootstrap 95% CI for mean document length: 200
      // deterministic replicates from ONE weighted aggregation — the
      // massive-data bootstrap (no resampling passes), FNV-seeded so
      // the oracle replays every Poisson draw exactly
      graft.ext.Eval.bootstrapMeanCI(t(s, d, "documents"),
        "doc_id", "n_chars", reps = 200, seed = 101L)),

    "x_worst_group" -> ((s, d) => {
      // group-robustness readout: a scorer that is near-perfect on
      // four languages and uninformative (p=0.5) on zh — the mean
      // log-loss hides it, the per-group sweep flags zh as the worst
      // group (the DRO up-weighting target)
      val docs = t(s, d, "documents")
      val label = col("doc_id") % 3 === 0
      val score = when(col("lang") === "zh", lit(0.5))
        .otherwise(when(label, lit(0.9)).otherwise(lit(0.1)))
      graft.ext.Eval.logLossByGroup(
        docs.select(col("lang"), label.as("y"), score.as("p")),
        "lang", "y", "p")
    }),

    "x_krippendorff" -> ((s, d) => {
      // 3 planted raters over the language label: rater 1 gold,
      // rater 2 noisy every 7th doc, rater 3 MISSING every 5th doc —
      // exercises >2 raters and missing ratings, the two shapes
      // q_kappa structurally cannot take
      val ratings = t(s, d, "documents").select(col("doc_id"),
        explode(array(
          col("lang"),
          when(col("doc_id") % 7 === 0, lit("xx")).otherwise(col("lang")),
          when(col("doc_id") % 5 === 0, lit(null).cast("string"))
            .otherwise(col("lang")))).as("label"))
      graft.ext.Eval.krippendorffAlpha(ratings, "doc_id", "label")
    }),

    "x_local_align" -> ((s, d) => {
      // Smith–Waterman edit-tolerant contamination over 12-token
      // prefixes: regime 0 plants a copy with ONE substituted token
      // (exact n-gram misses it; SW stays near-max), regime 1 a
      // verbatim half (sw_norm exactly 1), regime 2 word-reversed
      // noise (near-zero)
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val toks12 = slice(
        filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0),
        1, 12)
      val edited = transform(toks12,
        (tk, i) => when(i === 5, lit("qq")).otherwise(tk))
      val pairs = docs.select(col("doc_id"),
        array_join(toks12, " ").as("ref"),
        when(col("doc_id") % 3 === 0, array_join(edited, " "))
          .when(col("doc_id") % 3 === 1, array_join(slice(toks12, 1, 6), " "))
          .otherwise(array_join(reverse(toks12), " ")).as("hyp"))
      graft.ext.Eval.localAlign(pairs, "doc_id", "ref", "hyp").orderBy("id")
    }),

    "x_rouge_l" -> ((s, d) => {
      // ROUGE-L over 12-token prefixes (sentence-level is the metric's
      // real domain, and it bounds the oracle's cell-stepping
      // recursive CTE): identical-with-tail ≈ 1, front-half keeps
      // order (precision 1), word-reversed collapses to the longest
      // palindromic subsequence — which the contiguity-free LCS still
      // credits, unlike x_rouge's bigrams
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val toks12 = slice(
        filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0),
        1, 12)
      val refStr = array_join(toks12, " ")
      val pairs = docs.select(col("doc_id"), refStr.as("ref"),
        when(col("doc_id") % 3 === 0, concat(refStr, lit(" zz tail")))
          .when(col("doc_id") % 3 === 1, array_join(slice(toks12, 1, 6), " "))
          .otherwise(array_join(reverse(toks12), " ")).as("hyp"))
      graft.ext.Eval.rougeL(pairs, "doc_id", "ref", "hyp").orderBy("id")
    }),

    "x_bleu" -> ((s, d) => {
      // corpus-level BLEU-4 over the same three planted hypothesis
      // regimes as x_rouge: the identical-with-tail third supplies
      // 4-gram mass (so the geometric mean is positive), the front-half
      // third drags BP below 1, the word-reversed third dilutes the
      // precisions — one explode per side for all four orders, ONE
      // output row of pooled counters
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val pairs = docs.select(col("doc_id"), col("text").as("ref"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" zz tail marker")))
          .when(col("doc_id") % 3 === 1,
            col("text").substr(lit(1), floor(length(col("text")) / 2).cast("int")))
          .otherwise(array_join(reverse(toks), " ")).as("hyp"))
      graft.ext.Eval.bleu(pairs, "doc_id", "ref", "hyp", maxN = 4)
    }),

    "x_chrf" -> ((s, d) => {
      // corpus chrF (char 1..6-grams, beta=2) over the same planted
      // regimes as x_rouge/x_bleu — character grams are robust to the
      // word-reversal regime (every word's chars survive), so chrF
      // lands well above BLEU on this fixture, the metric's selling
      // point
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val pairs = docs.select(col("doc_id"), col("text").as("ref"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" zz tail marker")))
          .when(col("doc_id") % 3 === 1,
            col("text").substr(lit(1), floor(length(col("text")) / 2).cast("int")))
          .otherwise(array_join(reverse(toks), " ")).as("hyp"))
      graft.ext.Eval.chrF(pairs, "doc_id", "ref", "hyp", maxN = 6, beta = 2.0)
    }),

    "x_divergence_by_source" -> ((s, d) =>
      // which source drifts most from the rest of the corpus: the
      // one-pass JS sweep over all 20 sources — (source, term) counts,
      // a vocabulary re-agg, a broadcast source-totals grid
      graft.ext.Corpus.termDivergenceBySource(
        t(s, d, "documents"), "text", "source")),

    "x_term_divergence" -> ((s, d) => {
      // Jensen-Shannon drift between the English slice and the rest of
      // the corpus — the text-side companion to q_psi_drift: two
      // vocabulary-sized hash aggs, one vocabulary full-outer join,
      // one scalar reduce
      val docs = t(s, d, "documents")
      graft.ext.Corpus.termDivergence(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"), "text")
    }),

    "x_ndcg" -> ((s, d) => {
      // ranking-quality readout for the similarity tier: nDCG@10 of
      // exact cosine neighbors against label-match relevance (doc
      // relevant ⇔ it shares the query's label) — the eval that says
      // whether embedding geometry aligns with the labels, graded by
      // position. Ranks from the oracle-proven brute force; ideal
      // ranking over the full judged pool, ties on doc_id.
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      val res = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("corpus_id").as("doc_id"), col("rank"))
      val ql = q.select(col("vec_id").as("query_id"), col("label").as("qlab"))
      val rel = e.select(col("vec_id").as("doc_id"), col("label"))
        .crossJoin(broadcast(ql))
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"),
          when(col("label") === col("qlab"), lit(1.0)).otherwise(lit(0.0))
            .as("rel"))
      graft.ext.Eval.ndcgAtK(res, rel, k = 10).orderBy("query_id")
    }),

    "x_mrr" -> ((s, d) => {
      // MRR@10 over the same brute-force-ranked similarity fixture as
      // x_ndcg: rank of the first label-matching neighbor per query,
      // reciprocal readout, 0.0 for a query with no relevant hit
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      val res = Similarity.bruteForceTopK(e, q, "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("corpus_id").as("doc_id"), col("rank"))
      val ql = q.select(col("vec_id").as("query_id"), col("label").as("qlab"))
      val rel = e.select(col("vec_id").as("doc_id"), col("label"))
        .crossJoin(broadcast(ql))
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"),
          when(col("label") === col("qlab"), lit(1.0)).otherwise(lit(0.0))
            .as("rel"))
      graft.ext.Eval.mrrAtK(res, rel, k = 10).orderBy("query_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // ROUGE-2 replay: same tokenization, same bigram construction
    // (list_slice is 1-based inclusive), same clipped-count join, same
    // exact integer ratios
    "x_rouge" ->
      """WITH base AS (
        |  SELECT doc_id, text AS ref,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' zz tail marker'
        |         WHEN doc_id % 3 = 1 THEN substr(text, 1, CAST(floor(length(text) / 2.0) AS INTEGER))
        |         ELSE array_to_string(list_reverse(string_split_regex(lower(trim(text)), '\s+')), ' ')
        |    END AS hyp
        |  FROM documents WHERE doc_id < 200),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(list_filter(string_split_regex(lower(trim(ref)), '\s+'), x -> x <> '')) >= 2
        |      THEN list_transform(range(1, len(list_filter(string_split_regex(lower(trim(ref)), '\s+'), x -> x <> ''))),
        |        i -> array_to_string(list_slice(list_filter(string_split_regex(lower(trim(ref)), '\s+'), x -> x <> ''), i, i + 1), ' '))
        |      ELSE [] END AS rg,
        |    CASE WHEN len(list_filter(string_split_regex(lower(trim(hyp)), '\s+'), x -> x <> '')) >= 2
        |      THEN list_transform(range(1, len(list_filter(string_split_regex(lower(trim(hyp)), '\s+'), x -> x <> ''))),
        |        i -> array_to_string(list_slice(list_filter(string_split_regex(lower(trim(hyp)), '\s+'), x -> x <> ''), i, i + 1), ' '))
        |      ELSE [] END AS hg
        |  FROM base),
        |rc AS (SELECT doc_id, unnest(rg) AS gram FROM g),
        |rcc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS rcn FROM rc GROUP BY doc_id, gram),
        |hc AS (SELECT doc_id, unnest(hg) AS gram FROM g),
        |hcc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS hcn FROM hc GROUP BY doc_id, gram),
        |m AS (
        |  SELECT rcc.doc_id, CAST(sum(least(rcn, hcn)) AS BIGINT) AS mm
        |  FROM rcc JOIN hcc ON rcc.doc_id = hcc.doc_id AND rcc.gram = hcc.gram
        |  GROUP BY rcc.doc_id),
        |tots AS (SELECT doc_id, CAST(len(rg) AS BIGINT) AS n_ref, CAST(len(hg) AS BIGINT) AS n_hyp FROM g)
        |SELECT t.doc_id AS id, coalesce(m.mm, 0) AS n_match, t.n_ref, t.n_hyp,
        |  CASE WHEN t.n_hyp > 0 THEN round(CAST(coalesce(m.mm, 0) AS DOUBLE) / t.n_hyp, 6) END AS "precision",
        |  CASE WHEN t.n_ref > 0 THEN round(CAST(coalesce(m.mm, 0) AS DOUBLE) / t.n_ref, 6) END AS recall,
        |  CASE WHEN t.n_ref + t.n_hyp > 0
        |       THEN round(2.0 * coalesce(m.mm, 0) / (t.n_ref + t.n_hyp), 6) END AS f1
        |FROM tots t LEFT JOIN m USING (doc_id) ORDER BY id""".stripMargin,

    // score-report replay: the same cell reduction feeds the q_auc
    // Mann-Whitney CTE and the scalar metrics; 6-dp rounding parity
    // via the VARCHAR->DECIMAL(38,30) trick (the q_auc pattern)
    "x_score_report" ->
      """WITH cl AS (
        |  SELECT CAST(round(CAST(CAST(
        |      (CAST(doc_id % 997 AS DOUBLE) / 997.0 * 0.5 +
        |       CASE WHEN lang = 'en' THEN 0.4 ELSE 0.1 END)
        |      AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS p,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |cells AS (SELECT p, y, CAST(count(*) AS BIGINT) AS c FROM cl GROUP BY p, y),
        |g AS (
        |  SELECT p AS s,
        |    CAST(sum(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) AS np_s,
        |    CAST(sum(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT) AS nn_s
        |  FROM cells GROUP BY p),
        |a AS (
        |  SELECT s, np_s, nn_s,
        |    coalesce(sum(nn_s) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        |  FROM g),
        |auc_t AS (
        |  SELECT CAST(sum(np_s) AS BIGINT) AS np, CAST(sum(nn_s) AS BIGINT) AS nn,
        |    sum(CAST(np_s AS HUGEINT) * (2 * nb + nn_s)) AS c2
        |  FROM a),
        |sc AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) AS n_pos,
        |    sum(CAST(round((p - y) * (p - y), 9) AS DECIMAL(18,9)) * c) AS bsum,
        |    sum(CAST(round(CASE WHEN y = 1
        |          THEN -ln(least(greatest(p, 1e-15), 1.0 - 1e-15))
        |          ELSE -ln(1.0 - least(greatest(p, 1e-15), 1.0 - 1e-15)) END, 9)
        |      AS DECIMAL(18,9)) * c) AS lsum,
        |    CAST(sum(CASE WHEN y = 1 AND p >= 0.5 THEN c ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN y = 0 AND p >= 0.5 THEN c ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN y = 1 AND p < 0.5 THEN c ELSE 0 END) AS BIGINT) AS fnn,
        |    CAST(sum(CASE WHEN y = 0 AND p < 0.5 THEN c ELSE 0 END) AS BIGINT) AS tn
        |  FROM cells)
        |SELECT n, n_pos, round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
        |  CASE WHEN np > 0 AND nn > 0
        |       THEN round(CAST(c2 AS DOUBLE) / (CAST(2 AS DOUBLE) * np * nn), 6) END AS auc,
        |  round(CAST(bsum AS DOUBLE) / n, 6) AS brier,
        |  round(CAST(lsum AS DOUBLE) / n, 6) AS log_loss,
        |  round(CAST(tp + tn AS DOUBLE) / n, 6) AS accuracy,
        |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS "precision",
        |  CASE WHEN tp + fnn > 0 THEN round(CAST(tp AS DOUBLE) / (tp + fnn), 6) END AS recall,
        |  CASE WHEN 2 * tp + fp + fnn > 0
        |       THEN round(2.0 * tp / (2 * tp + fp + fnn), 6) END AS f1
        |FROM sc CROSS JOIN auc_t""".stripMargin,

    // seasonal replay: same ROWS-framed integer window sums over the
    // daily frame, dayofweek shifted to Spark's 1=Sunday convention,
    // same double shapes
    "x_seasonal" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |d2 AS (
        |  SELECT day, cnt, CAST(dayofweek(day) + 1 AS INTEGER) AS dow,
        |    CAST(sum(cnt) OVER w AS BIGINT) AS t_sum,
        |    CAST(count(*) OVER w AS BIGINT) AS t_n,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS total,
        |    CAST(count(*) OVER () AS BIGINT) AS n_days
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |da AS (
        |  SELECT dow, CAST(sum(cnt) AS BIGINT) AS dow_sum,
        |    count(*) AS dow_days
        |  FROM d2 GROUP BY dow)
        |SELECT day, cnt, dow,
        |  CAST(t_sum AS DOUBLE) / CAST(t_n AS DOUBLE) AS trend,
        |  CAST(dow_sum AS DOUBLE) / CAST(dow_days AS DOUBLE) -
        |    CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE) AS seasonal,
        |  CAST(cnt AS DOUBLE) -
        |    (CAST(t_sum AS DOUBLE) / CAST(t_n AS DOUBLE)) -
        |    (CAST(dow_sum AS DOUBLE) / CAST(dow_days AS DOUBLE) -
        |     CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE)) AS residual
        |FROM d2 JOIN da USING (dow) ORDER BY day""".stripMargin,

    // rolling-corr replay: same trailing ROWS frame, integer moments,
    // sqrt is correctly rounded IEEE on both engines; the 6-dp round
    // replays Spark's HALF_UP via VARCHAR->DECIMAL
    "x_rolling_corr" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT day, clicks, purchases,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(clicks) OVER w AS BIGINT) AS sx,
        |    CAST(sum(purchases) OVER w AS BIGINT) AS sy,
        |    CAST(sum(clicks * purchases) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(clicks * clicks) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(purchases * purchases) OVER w AS BIGINT) AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, clicks, purchases, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    CAST(round(CAST(CAST(
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |        (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |         sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |      AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) END AS corr
        |FROM m ORDER BY day""".stripMargin,

    // CUSUM replay: same integer prefix sums, same single sqrt shape;
    // the peak flag compares bit-identical doubles, no tolerance
    "x_changepoint" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT day, cnt,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(sum(cnt) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS total
        |  FROM daily),
        |sc AS (
        |  SELECT day, cnt, cum,
        |    CAST(abs(n * cum - t * total) AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * sqrt(CAST(t * (n - t) AS DOUBLE))) AS stat
        |  FROM p WHERE t < n)
        |SELECT day, cnt, cum, stat,
        |  stat = (SELECT max(stat) FROM sc) AS is_peak
        |FROM sc ORDER BY day""".stripMargin,

    // Fano replay: identical (key, day) count grid and integer moments
    "x_burstiness" ->
      """WITH daily AS (
        |  SELECT event_type AS key, date_trunc('day', ts) AS day,
        |    count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT key, count(*) AS n_days, CAST(sum(x) AS BIGINT) AS total,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY key)
        |SELECT key, n_days, total,
        |  CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
        |  CASE WHEN n_days > 1 THEN
        |    CAST(n_days * sxx - total * total AS DOUBLE) /
        |      CAST(n_days * (n_days - 1) AS DOUBLE) END AS variance,
        |  (CASE WHEN n_days > 1 THEN
        |    CAST(n_days * sxx - total * total AS DOUBLE) /
        |      CAST(n_days * (n_days - 1) AS DOUBLE) END) /
        |    (CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE)) AS fano
        |FROM m ORDER BY key""".stripMargin,

    // Theil-Sen replay: same row-indexed pair slopes (exact integer
    // divisions), quantile_cont == Spark percentile
    "x_theil_sen" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |ix AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t, cnt
        |  FROM daily),
        |sl AS (
        |  SELECT CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.t - a.t AS DOUBLE)
        |    AS slope
        |  FROM ix a JOIN ix b ON a.t < b.t),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
        |SELECT n, CAST(count(*) AS BIGINT) AS n_pairs,
        |  quantile_cont(slope, 0.5) AS slope
        |FROM sl, nn GROUP BY n""".stripMargin,

    // Mann-Kendall replay: identical pair sign sum, tie groups, and
    // the two-division finish
    "x_trend_test" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |sg AS (
        |  SELECT coalesce(CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
        |    WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT), 0) AS s
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |tt AS (
        |  SELECT coalesce(CAST(sum(tp * (tp - 1) * (2 * tp + 5)) AS BIGINT), 0)
        |    AS tie_term
        |  FROM (SELECT count(*) AS tp FROM daily GROUP BY cnt)),
        |v AS (
        |  SELECT n, s,
        |    CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0 AS var_s
        |  FROM sg, nn, tt)
        |SELECT n, s, var_s,
        |  CASE WHEN var_s > 0 AND s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
        |       WHEN var_s > 0 AND s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
        |       ELSE CAST(0 AS DOUBLE) END AS z
        |FROM v""".stripMargin,

    // ACF replay: same n-scaled integer deviations and bounded
    // self-join pair sums, one division per lag
    "x_acf" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |ix AS (
        |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS total, cnt
        |  FROM daily),
        |dv AS (SELECT t, n * cnt - total AS dev FROM ix),
        |dn AS (SELECT CAST(sum(dev * dev) AS BIGINT) AS den FROM dv),
        |pr AS (
        |  SELECT b.t - a.t AS lag, count(*) AS n_pairs,
        |    CAST(sum(a.dev * b.dev) AS BIGINT) AS num
        |  FROM dv a JOIN dv b ON b.t - a.t BETWEEN 1 AND 7
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf
        |FROM pr, dn ORDER BY lag""".stripMargin,

    // per-key ACF replay: the x_acf shape with every window and the
    // pair join partitioned/keyed by event type
    "x_acf_grouped" ->
      """WITH daily AS (
        |  SELECT event_type AS etype, date_trunc('day', ts) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |ix AS (
        |  SELECT etype,
        |    CAST(row_number() OVER (PARTITION BY etype ORDER BY day) AS BIGINT) AS t,
        |    CAST(count(*) OVER (PARTITION BY etype) AS BIGINT) AS n,
        |    CAST(sum(cnt) OVER (PARTITION BY etype) AS BIGINT) AS total, cnt
        |  FROM daily),
        |dv AS (SELECT etype, t, n * cnt - total AS dev FROM ix),
        |dn AS (SELECT etype, CAST(sum(dev * dev) AS BIGINT) AS den
        |       FROM dv GROUP BY 1),
        |pr AS (
        |  SELECT a.etype, b.t - a.t AS lag, count(*) AS n_pairs,
        |    CAST(sum(a.dev * b.dev) AS BIGINT) AS num
        |  FROM dv a JOIN dv b ON a.etype = b.etype AND b.t - a.t BETWEEN 1 AND 7
        |  GROUP BY 1, 2)
        |SELECT pr.etype, lag, n_pairs,
        |  CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf
        |FROM pr JOIN dn ON pr.etype = dn.etype
        |ORDER BY 1, 2""".stripMargin,

    // pinball replay: identical integer forecast, DECIMAL check
    // function, one division per quantile
    "x_pinball" ->
      """WITH base AS (
        |  SELECT CAST(n_chars AS DECIMAL(18,6)) AS y,
        |    CAST(n_chars // 2 + doc_id % 100 AS DECIMAL(18,6)) AS yh
        |  FROM documents),
        |f AS (
        |  SELECT y, yh, CAST(qr AS DECIMAL(7,6)) AS qd
        |  FROM base, (SELECT unnest([0.1, 0.5, 0.9]) AS qr)),
        |l AS (
        |  SELECT qd,
        |    CASE WHEN y - yh >= 0 THEN qd * (y - yh)
        |         ELSE (qd - 1) * (y - yh) END AS loss
        |  FROM f)
        |SELECT CAST(qd AS DOUBLE) AS q, count(*) AS n,
        |  CAST(sum(loss) AS DOUBLE) AS total_loss,
        |  CAST(sum(loss) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_loss
        |FROM l GROUP BY qd ORDER BY q""".stripMargin,

    // bootstrap replay: the identical FNV millionth-buckets invert the
    // same Poisson(1) CDF literals, DECIMAL-weighted sums per
    // replicate, quantile_cont == Spark percentile (both p·(n-1)
    // linear interpolation)
    "x_bootstrap_ci" ->
      s"""WITH d AS (
         |  SELECT CAST(doc_id AS VARCHAR) AS id,
         |    CAST(round(CAST(n_chars AS DOUBLE), 6) AS DECIMAL(28,6)) AS x
         |  FROM documents),
         |r AS (SELECT CAST(unnest(range(1, 201)) AS INTEGER) AS b),
         |g AS (
         |  SELECT x, b,
         |    CAST(((${signedSql(fnvSql("(id || '#' || CAST(b AS VARCHAR) || ':101')"))} % 1000000) + 1000000) % 1000000 AS DOUBLE) / 1000000.0 AS u
         |  FROM d CROSS JOIN r),
         |ws AS (
         |  SELECT b, x,
         |    CASE WHEN u < 0.36787944117144233 THEN 0
         |         WHEN u < 0.7357588823428847 THEN 1
         |         WHEN u < 0.9196986029286058 THEN 2
         |         WHEN u < 0.9810118431238462 THEN 3
         |         WHEN u < 0.9963401531726563 THEN 4
         |         WHEN u < 0.9994058151824183 THEN 5
         |         WHEN u < 0.999916758850712 THEN 6
         |         WHEN u < 0.9999897508033254 THEN 7
         |         ELSE 8 END AS w
         |  FROM g),
         |per AS (SELECT b, sum(w) AS nw, sum(x * w) AS sx FROM ws GROUP BY b),
         |m AS (SELECT round(CAST(sx AS DOUBLE) / nw, 6) AS m FROM per WHERE nw > 0),
         |q AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_replicates,
         |    quantile_cont(m, 0.025) AS qlo, quantile_cont(m, 0.975) AS qhi
         |  FROM m),
         |o AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS mean
         |  FROM d)
         |SELECT n_rows, n_replicates, mean,
         |  round(qlo, 6) AS ci_lo, round(qhi, 6) AS ci_hi
         |FROM o CROSS JOIN q""".stripMargin,

    // worst-group replay: same distinct-(p,y) cells per group, same
    // 9-dp terms, max-join for the flag
    "x_worst_group" ->
      """WITH e AS (
        |  SELECT lang AS grp, (doc_id % 3 = 0) AS y,
        |    CASE WHEN lang = 'zh' THEN 0.5
        |         WHEN doc_id % 3 = 0 THEN 0.9 ELSE 0.1 END AS p
        |  FROM documents),
        |cl AS (
        |  SELECT grp, least(greatest(p, 1e-15), 1.0 - 1e-15) AS p,
        |    CASE WHEN y THEN 1 ELSE 0 END AS y, CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY ALL),
        |t AS (
        |  SELECT grp, c,
        |    round(CASE WHEN y = 1 THEN -ln(p) ELSE -ln(1.0 - p) END, 9) AS term
        |  FROM cl),
        |per AS (
        |  SELECT grp AS "group", CAST(sum(c) AS BIGINT) AS n,
        |    round(CAST(sum(CAST(term AS DECIMAL(18,9)) * c) AS DOUBLE) / sum(c), 6) AS log_loss
        |  FROM t GROUP BY grp),
        |w AS (SELECT max(log_loss) AS worst FROM per)
        |SELECT "group", n, log_loss, (log_loss = worst) AS is_worst
        |FROM per CROSS JOIN w
        |ORDER BY log_loss DESC, "group" ASC""".stripMargin,

    // Krippendorff replay: same (unit, label) cells, units under two
    // ratings dropped, 12-dp per-unit rational terms in DECIMAL,
    // DECIMAL(38,0) margin products, one 6-dp division
    "x_krippendorff" ->
      """WITH r AS (
        |  SELECT doc_id AS u, lang AS label FROM documents
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END FROM documents
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END FROM documents),
        |o AS (
        |  SELECT u, label AS c, CAST(count(*) AS BIGINT) AS ouc
        |  FROM r WHERE label IS NOT NULL GROUP BY u, label),
        |m AS (SELECT u, sum(ouc) AS mu FROM o GROUP BY u HAVING sum(ouc) >= 2),
        |kept AS (SELECT o.u, o.c, o.ouc, m.mu FROM o JOIN m USING (u)),
        |tot AS (
        |  SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_units,
        |    CAST(sum(ouc) AS BIGINT) AS n,
        |    sum(CAST(round(ouc * CAST(mu - ouc AS DOUBLE) / (mu - 1), 12) AS DECIMAL(28,12))) AS do_num
        |  FROM kept),
        |nc AS (SELECT c, CAST(sum(ouc) AS BIGINT) AS ncnt FROM kept GROUP BY c)
        |SELECT max(n_units) AS n_units, max(n) AS n_values,
        |  CAST(count(*) AS BIGINT) AS n_labels,
        |  CASE WHEN sum(CAST(ncnt AS DECIMAL(38,0)) * CAST(n - ncnt AS DECIMAL(38,0))) > 0 THEN
        |    round(1.0 - CAST(max(n) - 1 AS DOUBLE) * CAST(max(do_num) AS DOUBLE)
        |      / CAST(sum(CAST(ncnt AS DECIMAL(38,0)) * CAST(n - ncnt AS DECIMAL(38,0))) AS DOUBLE), 6)
        |  END AS alpha
        |FROM nc CROSS JOIN tot""".stripMargin,

    // Smith–Waterman replay: the same cell-stepping recursive CTE as
    // x_rouge_l but carrying the running best cell; H = greatest(0,
    // diag ± 2/1, up − 1, left − 1)
    "x_local_align" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id,
        |    list_slice(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''), 1, 12) AS rt0
        |  FROM documents WHERE doc_id < 200),
        |pairs AS (
        |  SELECT doc_id, rt0 AS rt,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |           list_transform(range(1, len(rt0) + 1),
        |             i -> CASE WHEN i = 6 THEN 'qq' ELSE rt0[i] END)
        |         WHEN doc_id % 3 = 1 THEN list_slice(rt0, 1, 6)
        |         ELSE list_reverse(rt0) END AS ht
        |  FROM base),
        |dp AS (
        |  SELECT doc_id, rt, ht, 1 AS i, 1 AS j,
        |    list_transform(range(0, len(ht) + 1), x -> 0) AS prev,
        |    [0] AS cur, 0 AS best
        |  FROM pairs
        |  UNION ALL
        |  SELECT doc_id, rt, ht,
        |    CASE WHEN j <= len(ht) THEN i ELSE i + 1 END,
        |    CASE WHEN j <= len(ht) THEN j + 1 ELSE 1 END,
        |    CASE WHEN j <= len(ht) THEN prev ELSE cur END,
        |    CASE WHEN j <= len(ht)
        |      THEN list_append(cur, greatest(0,
        |             prev[j] + CASE WHEN rt[i] = ht[j] THEN 2 ELSE -1 END,
        |             prev[j + 1] - 1, cur[j] - 1))
        |      ELSE [0] END,
        |    CASE WHEN j <= len(ht)
        |      THEN greatest(best, greatest(0,
        |             prev[j] + CASE WHEN rt[i] = ht[j] THEN 2 ELSE -1 END,
        |             prev[j + 1] - 1, cur[j] - 1))
        |      ELSE best END
        |  FROM dp WHERE i <= len(rt)),
        |sel AS (
        |  SELECT doc_id, len(rt) AS n_ref, len(ht) AS n_hyp, best
        |  FROM dp WHERE i = len(rt) + 1 AND j = 1)
        |SELECT doc_id AS id, CAST(best AS BIGINT) AS sw,
        |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_hyp AS BIGINT) AS n_hyp,
        |  CASE WHEN least(n_ref, n_hyp) > 0
        |       THEN round(CAST(best AS DOUBLE) / (2.0 * least(n_ref, n_hyp)), 6)
        |  END AS sw_norm
        |FROM sel ORDER BY id""".stripMargin,

    // ROUGE-L replay: the LCS DP re-run as a cell-stepping RECURSIVE
    // CTE — each iteration fills ONE dp cell (the recurrence is
    // sequential, so no set-based shortcut exists), state = (i, j,
    // prev row, growing cur row); a row completes when j passes
    // |hyp|, the answer is prev[|hyp|+1] once i passes |ref|.
    // Bounded by the 12-token prefix: ≤ ~180 iterations
    "x_rouge_l" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id,
        |    list_slice(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''), 1, 12) AS rt0
        |  FROM documents WHERE doc_id < 200),
        |pairs AS (
        |  SELECT doc_id, rt0 AS rt,
        |    CASE WHEN doc_id % 3 = 0 THEN list_concat(rt0, ['zz', 'tail'])
        |         WHEN doc_id % 3 = 1 THEN list_slice(rt0, 1, 6)
        |         ELSE list_reverse(rt0) END AS ht
        |  FROM base),
        |dp AS (
        |  SELECT doc_id, rt, ht, 1 AS i, 1 AS j,
        |    list_transform(range(0, len(ht) + 1), x -> 0) AS prev,
        |    [0] AS cur
        |  FROM pairs
        |  UNION ALL
        |  SELECT doc_id, rt, ht,
        |    CASE WHEN j <= len(ht) THEN i ELSE i + 1 END,
        |    CASE WHEN j <= len(ht) THEN j + 1 ELSE 1 END,
        |    CASE WHEN j <= len(ht) THEN prev ELSE cur END,
        |    CASE WHEN j <= len(ht)
        |      THEN list_append(cur, CASE WHEN rt[i] = ht[j] THEN prev[j] + 1
        |                                 ELSE greatest(cur[j], prev[j + 1]) END)
        |      ELSE [0] END
        |  FROM dp WHERE i <= len(rt)),
        |sel AS (
        |  SELECT doc_id, len(rt) AS n_ref, len(ht) AS n_hyp,
        |    prev[len(ht) + 1] AS lcs
        |  FROM dp WHERE i = len(rt) + 1 AND j = 1)
        |SELECT doc_id AS id, CAST(lcs AS BIGINT) AS lcs,
        |  CAST(n_ref AS BIGINT) AS n_ref, CAST(n_hyp AS BIGINT) AS n_hyp,
        |  CASE WHEN n_hyp > 0 THEN round(CAST(lcs AS DOUBLE) / n_hyp, 6) END AS "precision",
        |  CASE WHEN n_ref > 0 THEN round(CAST(lcs AS DOUBLE) / n_ref, 6) END AS recall,
        |  CASE WHEN n_ref + n_hyp > 0 THEN round(2.0 * lcs / (n_ref + n_hyp), 6) END AS f1
        |FROM sel ORDER BY id""".stripMargin,

    // corpus BLEU-4 replay: tokenize once, build every order's grams
    // via a CROSS JOIN over n in 1..4 (list_slice is 1-based
    // inclusive), pool clipped matches and gram totals across the
    // corpus, finish with the same ln/exp on one row (ln parity proven
    // by the bm25 oracle)
    "x_bleu" ->
      """WITH base AS (
        |  SELECT doc_id, text AS ref,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' zz tail marker'
        |         WHEN doc_id % 3 = 1 THEN substr(text, 1, CAST(floor(length(text) / 2.0) AS INTEGER))
        |         ELSE array_to_string(list_reverse(string_split_regex(lower(trim(text)), '\s+')), ' ')
        |    END AS hyp
        |  FROM documents WHERE doc_id < 200),
        |tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(ref)), '\s+'), x -> x <> '') AS rt,
        |    list_filter(string_split_regex(lower(trim(hyp)), '\s+'), x -> x <> '') AS ht
        |  FROM base),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |g AS (
        |  SELECT doc_id, n,
        |    CASE WHEN len(rt) >= n THEN list_transform(range(1, len(rt) - n + 2),
        |      i -> array_to_string(list_slice(rt, i, i + n - 1), ' ')) ELSE [] END AS rg,
        |    CASE WHEN len(ht) >= n THEN list_transform(range(1, len(ht) - n + 2),
        |      i -> array_to_string(list_slice(ht, i, i + n - 1), ' ')) ELSE [] END AS hg
        |  FROM tok CROSS JOIN ns),
        |rcc AS (SELECT doc_id, n, unnest(rg) AS gram FROM g),
        |rcn AS (SELECT doc_id, n, gram, count(*) AS rc FROM rcc GROUP BY ALL),
        |hcc AS (SELECT doc_id, n, unnest(hg) AS gram FROM g),
        |hcn AS (SELECT doc_id, n, gram, count(*) AS hc FROM hcc GROUP BY ALL),
        |m AS (
        |  SELECT n, sum(least(rc, hc)) AS mm
        |  FROM rcn JOIN hcn USING (doc_id, n, gram) GROUP BY n),
        |tots AS (SELECT n, sum(len(hg)) AS tt FROM g GROUP BY n),
        |lens AS (
        |  SELECT CAST(sum(len(rt)) AS BIGINT) AS ref_len,
        |    CAST(sum(len(ht)) AS BIGINT) AS hyp_len FROM tok),
        |wide AS (
        |  SELECT lens.ref_len, lens.hyp_len,
        |    CAST(coalesce(max(CASE WHEN t.n = 1 THEN m.mm END), 0) AS BIGINT) AS m1,
        |    CAST(coalesce(max(CASE WHEN t.n = 2 THEN m.mm END), 0) AS BIGINT) AS m2,
        |    CAST(coalesce(max(CASE WHEN t.n = 3 THEN m.mm END), 0) AS BIGINT) AS m3,
        |    CAST(coalesce(max(CASE WHEN t.n = 4 THEN m.mm END), 0) AS BIGINT) AS m4,
        |    CAST(coalesce(max(CASE WHEN t.n = 1 THEN t.tt END), 0) AS BIGINT) AS t1,
        |    CAST(coalesce(max(CASE WHEN t.n = 2 THEN t.tt END), 0) AS BIGINT) AS t2,
        |    CAST(coalesce(max(CASE WHEN t.n = 3 THEN t.tt END), 0) AS BIGINT) AS t3,
        |    CAST(coalesce(max(CASE WHEN t.n = 4 THEN t.tt END), 0) AS BIGINT) AS t4
        |  FROM lens CROSS JOIN tots t LEFT JOIN m USING (n)
        |  GROUP BY lens.ref_len, lens.hyp_len),
        |bpx AS (
        |  SELECT *, CASE WHEN hyp_len >= ref_len OR hyp_len = 0 THEN 1.0
        |    ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / hyp_len) END AS bpraw
        |  FROM wide)
        |SELECT ref_len, hyp_len,
        |  CASE WHEN t1 > 0 THEN round(CAST(m1 AS DOUBLE) / t1, 6) END AS p1,
        |  CASE WHEN t2 > 0 THEN round(CAST(m2 AS DOUBLE) / t2, 6) END AS p2,
        |  CASE WHEN t3 > 0 THEN round(CAST(m3 AS DOUBLE) / t3, 6) END AS p3,
        |  CASE WHEN t4 > 0 THEN round(CAST(m4 AS DOUBLE) / t4, 6) END AS p4,
        |  round(bpraw, 6) AS bp,
        |  CASE WHEN m1 > 0 AND m2 > 0 AND m3 > 0 AND m4 > 0 THEN
        |    round(bpraw * exp((ln(CAST(m1 AS DOUBLE) / t1) + ln(CAST(m2 AS DOUBLE) / t2)
        |      + ln(CAST(m3 AS DOUBLE) / t3) + ln(CAST(m4 AS DOUBLE) / t4)) / 4), 6)
        |    ELSE 0.0 END AS bleu
        |FROM bpx""".stripMargin,

    // chrF replay: whitespace-stripped char 1..6-grams (regexp_replace
    // needs the 'g' flag — DuckDB replaces only the first match
    // without it), pooled clipped matches kept in LONG form per order,
    // per-order P/R ratios averaged, one F finish
    "x_chrf" ->
      """WITH base AS (
        |  SELECT doc_id, text AS ref,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' zz tail marker'
        |         WHEN doc_id % 3 = 1 THEN substr(text, 1, CAST(floor(length(text) / 2.0) AS INTEGER))
        |         ELSE array_to_string(list_reverse(string_split_regex(lower(trim(text)), '\s+')), ' ')
        |    END AS hyp
        |  FROM documents WHERE doc_id < 200),
        |ch AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(ref)), '\s+', '', 'g') AS rch,
        |    regexp_replace(lower(trim(hyp)), '\s+', '', 'g') AS hch
        |  FROM base),
        |ns AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
        |g AS (
        |  SELECT doc_id, n,
        |    CASE WHEN length(rch) >= n THEN list_transform(range(1, length(rch) - n + 2),
        |      i -> substr(rch, CAST(i AS INTEGER), n)) ELSE [] END AS rg,
        |    CASE WHEN length(hch) >= n THEN list_transform(range(1, length(hch) - n + 2),
        |      i -> substr(hch, CAST(i AS INTEGER), n)) ELSE [] END AS hg
        |  FROM ch CROSS JOIN ns),
        |rcn AS (SELECT doc_id, n, unnest(rg) AS gram FROM g),
        |rcc AS (SELECT doc_id, n, gram, count(*) AS rc FROM rcn GROUP BY ALL),
        |hcn AS (SELECT doc_id, n, unnest(hg) AS gram FROM g),
        |hcc AS (SELECT doc_id, n, gram, count(*) AS hc FROM hcn GROUP BY ALL),
        |m AS (
        |  SELECT n, sum(least(rc, hc)) AS mm
        |  FROM rcc JOIN hcc USING (doc_id, n, gram) GROUP BY n),
        |tots AS (SELECT n, sum(len(rg)) AS tr, sum(len(hg)) AS th FROM g GROUP BY n),
        |lens AS (
        |  SELECT CAST(sum(length(rch)) AS BIGINT) AS ref_chars,
        |    CAST(sum(length(hch)) AS BIGINT) AS hyp_chars FROM ch),
        |fin AS (
        |  SELECT
        |    sum(CASE WHEN t.th > 0 THEN CAST(coalesce(m.mm, 0) AS DOUBLE) / t.th ELSE 0.0 END) / 6.0 AS pavg,
        |    sum(CASE WHEN t.tr > 0 THEN CAST(coalesce(m.mm, 0) AS DOUBLE) / t.tr ELSE 0.0 END) / 6.0 AS ravg
        |  FROM tots t LEFT JOIN m USING (n))
        |SELECT lens.ref_chars, lens.hyp_chars,
        |  round(pavg, 6) AS prec, round(ravg, 6) AS recall,
        |  CASE WHEN pavg + ravg > 0
        |    THEN round(5.0 * pavg * ravg / (4.0 * pavg + ravg), 6)
        |    ELSE 0.0 END AS chrf
        |FROM lens CROSS JOIN fin""".stripMargin,

    // per-source JS sweep replay: the same (source, term) counts,
    // explicit source x vocab grid, 12-dp contributions in DECIMAL
    "x_divergence_by_source" ->
      """WITH tok AS (
        |  SELECT d.source, t.term FROM documents d,
        |    unnest(string_split_regex(lower(trim(d.text)), '\s+')) AS t(term)
        |  WHERE t.term <> ''),
        |bs AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cs FROM tok GROUP BY ALL),
        |g AS (SELECT term, sum(cs) AS cg FROM bs GROUP BY term),
        |st AS (SELECT source, sum(cs) AS ts FROM bs GROUP BY source),
        |tot AS (SELECT sum(ts) AS tt FROM st),
        |grid AS (SELECT st.source, st.ts, g.term, g.cg FROM g CROSS JOIN st),
        |j AS (
        |  SELECT grid.source, grid.ts, grid.cg, coalesce(bs.cs, 0) AS cs, tt
        |  FROM grid LEFT JOIN bs ON grid.source = bs.source AND grid.term = bs.term
        |  CROSS JOIN tot),
        |c AS (
        |  SELECT source, ts, tt, cs, cg,
        |    CAST(cs AS DOUBLE) / ts AS p,
        |    CASE WHEN tt > ts THEN CAST(cg - cs AS DOUBLE) / (tt - ts) ELSE 0.0 END AS q
        |  FROM j)
        |SELECT source,
        |  CAST(sum(CASE WHEN cs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_source,
        |  CAST(max(ts) AS BIGINT) AS tokens_source,
        |  CASE WHEN max(tt) > max(ts) THEN
        |    round(CAST(sum(CAST(round(
        |      (CASE WHEN cs > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END) +
        |      (CASE WHEN cg - cs > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) / 2.0, 6) END AS js
        |FROM c GROUP BY source ORDER BY js DESC, source ASC""".stripMargin,

    // JS-divergence replay: identical per-side unigram counts, the
    // same 12-dp-rounded per-term contributions summed in DECIMAL,
    // one final 6-dp rounding
    "x_term_divergence" ->
      """WITH ta AS (
        |  SELECT t.term FROM documents d,
        |    unnest(string_split_regex(lower(trim(d.text)), '\s+')) AS t(term)
        |  WHERE d.lang = 'en' AND t.term <> ''),
        |tb AS (
        |  SELECT t.term FROM documents d,
        |    unnest(string_split_regex(lower(trim(d.text)), '\s+')) AS t(term)
        |  WHERE d.lang <> 'en' AND t.term <> ''),
        |ca AS (SELECT term, CAST(count(*) AS BIGINT) AS ca FROM ta GROUP BY term),
        |cb AS (SELECT term, CAST(count(*) AS BIGINT) AS cb FROM tb GROUP BY term),
        |tot AS (
        |  SELECT (SELECT coalesce(sum(ca), 0) FROM ca) AS t_a,
        |    (SELECT coalesce(sum(cb), 0) FROM cb) AS t_b),
        |j AS (
        |  SELECT coalesce(ca.term, cb.term) AS term,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb, t_a, t_b
        |  FROM ca FULL OUTER JOIN cb USING (term) CROSS JOIN tot),
        |c AS (
        |  SELECT ca, cb, t_a, t_b,
        |    CASE WHEN t_a > 0 THEN CAST(ca AS DOUBLE) / t_a ELSE 0.0 END AS p,
        |    CASE WHEN t_b > 0 THEN CAST(cb AS DOUBLE) / t_b ELSE 0.0 END AS q
        |  FROM j)
        |SELECT CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
        |  CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
        |  CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_shared,
        |  CAST(max(t_a) AS BIGINT) AS tokens_a, CAST(max(t_b) AS BIGINT) AS tokens_b,
        |  CASE WHEN max(t_a) + max(t_b) > 0 THEN
        |    round(CAST(sum(CAST(round(
        |      (CASE WHEN ca > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END) +
        |      (CASE WHEN cb > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) / 2.0, 6) END AS js
        |FROM c""".stripMargin,

    // nDCG replay: the brute-force cosine ranking CTEs (as in
    // x_ann_bruteforce), label-match relevance, same 9-dp terms /
    // decimal sums / 6-dp readouts, same ln-ratio log₂
    "x_ndcg" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.corpus_id,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
        |  FROM c, q WHERE c.corpus_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, corpus_id AS doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored),
        |res AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10),
        |ql AS (SELECT vec_id AS query_id, label AS qlab FROM embeddings WHERE vec_id < 5),
        |rel AS (
        |  SELECT ql.query_id, e.vec_id AS doc_id,
        |    CASE WHEN e.label = ql.qlab THEN 1.0 ELSE 0.0 END AS rel
        |  FROM embeddings e, ql WHERE e.vec_id <> ql.query_id),
        |dt AS (
        |  SELECT r.query_id,
        |    round(coalesce(rel.rel, 0) / (ln(r.rank + 1.0) / ln(2.0)), 9) AS term
        |  FROM res r LEFT JOIN rel
        |    ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id),
        |dcg AS (
        |  SELECT query_id,
        |    round(CAST(sum(CAST(term AS DECIMAL(18,9))) AS DOUBLE), 6) AS dcg
        |  FROM dt GROUP BY query_id),
        |ideal AS (
        |  SELECT query_id, rel,
        |    row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS irank
        |  FROM rel),
        |it AS (
        |  SELECT query_id, round(rel / (ln(irank + 1.0) / ln(2.0)), 9) AS term
        |  FROM ideal WHERE irank <= 10),
        |idcg AS (
        |  SELECT query_id,
        |    round(CAST(sum(CAST(term AS DECIMAL(18,9))) AS DOUBLE), 6) AS idcg
        |  FROM it GROUP BY query_id)
        |SELECT query_id, coalesce(d.dcg, 0.0) AS dcg, coalesce(i.idcg, 0.0) AS idcg,
        |  CASE WHEN coalesce(i.idcg, 0) > 0
        |       THEN round(coalesce(d.dcg, 0.0) / i.idcg, 6) END AS ndcg
        |FROM dcg d FULL OUTER JOIN idcg i USING (query_id) ORDER BY query_id""".stripMargin,

    // MRR replay: the same brute-force ranking + label-match relevance
    // CTEs as x_ndcg, then min relevant rank per query over the union
    // of query ids (zero-result queries score 0.0, not absent)
    "x_mrr" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.corpus_id,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))) AS cos
        |  FROM c, q WHERE c.corpus_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, corpus_id AS doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored),
        |res AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 10),
        |ql AS (SELECT vec_id AS query_id, label AS qlab FROM embeddings WHERE vec_id < 5),
        |rel AS (
        |  SELECT ql.query_id, e.vec_id AS doc_id,
        |    CASE WHEN e.label = ql.qlab THEN 1.0 ELSE 0.0 END AS rel
        |  FROM embeddings e, ql WHERE e.vec_id <> ql.query_id),
        |hits AS (
        |  SELECT r.query_id, CAST(min(r.rank) AS BIGINT) AS first_rel_rank
        |  FROM res r JOIN rel ON r.query_id = rel.query_id
        |    AND r.doc_id = rel.doc_id AND rel.rel > 0
        |  GROUP BY r.query_id),
        |qq AS (SELECT DISTINCT query_id FROM res
        |       UNION SELECT DISTINCT query_id FROM rel)
        |SELECT qq.query_id, h.first_rel_rank,
        |  coalesce(round(CAST(1.0 AS DOUBLE) / h.first_rel_rank, 6), 0.0) AS rr
        |FROM qq LEFT JOIN hits h USING (query_id) ORDER BY qq.query_id""".stripMargin,
  )
}
