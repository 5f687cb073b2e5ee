package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed grid, then repair the gaps (forward-fill / linear
  * interpolation). The reference stops at calendar bucketing
  * (`ET-ETL-DWH-PY312/ETL/Transform.py`'s date splits); a metrics
  * pipeline needs the regular-grid form — rolling windows, rate
  * computations, and model features all assume equally-spaced points.
  *
  * Scale shape: the spine is generated PER KEY from that key's own
  * [min, max] slot range (`sequence` + `explode`) — never a cross join
  * against a global calendar, so a key active for one day doesn't pay
  * for the corpus's full history. One shuffle for the slot aggregate,
  * one for the spine join, both keyed by (key, slot). Gap repair is
  * pure window work over the same key partitioning — no extra shuffle
  * after the resample's.
  *
  * Determinism: slot values aggregate by DECIMAL sum (order-independent
  * under any partial-agg schedule); the avg's single IEEE division and
  * the interpolation's per-row arithmetic are replayed by the oracle in
  * the same operation order, so results are byte-stable at any
  * parallelism.
  */
object TimeSeries {

  /** Floor `epochSec` onto a `stepSeconds` grid — integer arithmetic
    * (pmod handles negatives as a true floor, matching SQL `//`), no
    * double round-trip.
    */
  def slotOf(epochSec: Column, stepSeconds: Long): Column =
    epochSec.cast("long") - pmod(epochSec.cast("long"), lit(stepSeconds))

  /** Regularize: one row per (key, grid slot) between each key's first
    * and last observation. Observed slots carry the decimal-exact mean
    * of `valueCol` (rounded to 6) and the observation count; gap slots
    * carry a null mean and n = 0.
    *
    * `maxSlotsPerKey` guards the explode: a key whose span/step exceeds
    * it fails fast instead of materializing a runaway spine (the
    * mis-parsed-1970-timestamp failure mode).
    */
  def resample(df: DataFrame, keyCol: String, epochSecCol: String,
               valueCol: String, stepSeconds: Long,
               maxSlotsPerKey: Long = 10000000L): DataFrame = {
    require(stepSeconds > 0, "resample: stepSeconds must be positive")
    val observed = df
      .select(col(keyCol), slotOf(col(epochSecCol), stepSeconds).as("slot"),
        col(valueCol).cast("double").as("v"))
      .groupBy(col(keyCol), col("slot"))
      .agg(sum(col("v").cast("decimal(18,2)")).as("vsum_d"), count(lit(1)).as("n"))
    val spine = observed.groupBy(col(keyCol))
      .agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"))
      .withColumn("span", (col("hi") - col("lo")) / stepSeconds + 1)
      .withColumn("guard",
        when(col("span") <= maxSlotsPerKey, lit(true))
          .otherwise(raise_error(concat(lit(s"resample: key "), col(keyCol).cast("string"),
            lit(s" spans more than $maxSlotsPerKey slots")))))
      .where(col("guard"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), lit(stepSeconds))).as("slot"))
    // the 6-dp mean is rounded IN INTEGER SPACE (micro-units,
    // half-away-from-zero), doubles only after: the exact rational
    // sum/n of 2-dp inputs can terminate with a 5 exactly at the 7th
    // decimal (e.g. n=16 → /1600), where double round() legitimately
    // differs across engines (shortest-decimal-repr half-up vs binary
    // scaling) — the oracle replays this integer formula verbatim
    spine.join(observed, Seq(keyCol, "slot"), "left")
      .withColumn("__cents", (col("vsum_d") * 100).cast("long"))
      .select(col(keyCol), col("slot"),
        (expr("(CASE WHEN __cents < 0 THEN -1L ELSE 1L END) * " +
            "((abs(__cents) * 20000 + n) div (2 * n))").cast("double") / 1e6)
          .as("value_avg"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Forward-fill: each null in `cols` takes the latest preceding
    * non-null value within its key, in `ordCol` order. Pure window —
    * no shuffle beyond the key partitioning.
    */
  def forwardFill(df: DataFrame, keyCol: String, ordCol: String,
                  cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Rolling anomaly detection: each point scores against the mean/std
    * of the PREVIOUS `window` rows of its key (exclusive — a spike must
    * not inflate the baseline that judges it). Adds `z` (null while the
    * trailing window lacks ≥ 2 observations or has zero variance) and
    * `is_anomaly` (|z| > k). Window-only over the key shuffle; moments
    * accumulate in decimal, so flags are byte-stable at any
    * parallelism.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, ordCol: String,
                       valueCol: String, window: Int = 24,
                       k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(ordCol).rowsBetween(-window, -1)
    val x = col(valueCol).cast("decimal(18,4)")
    df.withColumn("__n", count(col(valueCol)).over(w))
      .withColumn("__sx", sum(x).over(w).cast("double"))
      .withColumn("__sxx", sum((x * x).cast("decimal(30,8)")).over(w).cast("double"))
      .withColumn("z", round(
        when(col(valueCol).isNotNull && col("__n") > 1 &&
            (col("__n") * col("__sxx") - col("__sx") * col("__sx")) > 0,
          (col(valueCol) - col("__sx") / col("__n")) /
            sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) /
              (col("__n") * (col("__n") - 1)))), 6))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > k, lit(false)))
      .drop("__n", "__sx", "__sxx")
  }

  /** Linear interpolation: nulls in `valueCol` take the straight line
    * between the nearest preceding and following non-null observations
    * (in `ordCol`, which must be numeric — e.g. the resample slot).
    * Leading/trailing nulls (no neighbor on one side) stay null;
    * `forwardFill` handles the trailing edge when that's wanted.
    */
  def interpolateLinear(df: DataFrame, keyCol: String, ordCol: String,
                        valueCol: String): DataFrame = {
    val prevW = Window.partitionBy(keyCol).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val nextW = Window.partitionBy(keyCol).orderBy(ordCol)
      .rowsBetween(1, Window.unboundedFollowing)
    val v = col(valueCol)
    val tNonNull = when(v.isNotNull, col(ordCol).cast("double"))
    val prevV = last(v, ignoreNulls = true).over(prevW)
    val prevT = last(tNonNull, ignoreNulls = true).over(prevW)
    val nextV = first(v, ignoreNulls = true).over(nextW)
    val nextT = first(tNonNull, ignoreNulls = true).over(nextW)
    df.withColumn(valueCol,
      when(v.isNotNull, v)
        .when(prevV.isNotNull && nextV.isNotNull && nextT =!= prevT,
          round(prevV + (nextV - prevV) * (col(ordCol).cast("double") - prevT)
            / (nextT - prevT), 6)))
  }

  /** Additive seasonal decomposition of the DAILY event-count series:
    * cnt = trend + seasonal + residual, with trend the centered 7-row
    * moving average and seasonal the day-of-week mean deviation from
    * the grand mean (the classical "seasonal naive" decomposition —
    * the STL-shaped readout without iteration; Cleveland et al. 1990
    * motivates the trend/seasonal split, this is its one-pass additive
    * form). The weekly profile surfaces load cycles; the residual is
    * the anomaly signal after calendar effects are removed.
    *
    * Determinism/scale contract: ONE full-data pass (the daily count
    * aggregate); every window after it runs over the post-aggregate
    * daily frame — calendar-bounded (365 rows/year), the
    * [[graft.ext.Corpus.concentration]] discipline — with
    * integer-exact sums. The only doubles are the final divisions/
    * subtractions in a fixed shape, bit-identical in any replay.
    * Assumes a gapless series (each row's 7-row frame = 7 calendar
    * days); [[resample]] fills gaps upstream when the stream has dark
    * days. Day-of-week numbering follows Spark's `dayofweek`
    * (1 = Sunday … 7 = Saturday).
    */
  /** Trailing rolling Pearson correlation between two INTEGER count
    * series (co-movement monitoring: do purchases still track clicks
    * this week, or did the funnel break). Each row gets the
    * correlation over the trailing `window` rows from the five
    * classical moments — all of them integer window sums, so every
    * input to the final formula is exact; the only floats are one
    * division and two correctly-rounded IEEE sqrts in a fixed shape,
    * then a 6-dp presentation round. Degenerate windows (either series
    * constant) yield null, not NaN.
    *
    * Same frame contract as [[seasonalDecomposeDaily]]: the window
    * runs over the POST-AGGREGATE series frame (calendar-bounded),
    * never the raw events.
    */
  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) over an integer
    * count series: S = Σ_{i<j} sgn(xⱼ − xᵢ) with the tie-corrected
    * variance Var(S) = [n(n−1)(2n+5) − Σ tₚ(tₚ−1)(2tₚ+5)]/18 and the
    * continuity-corrected Z — the standard nonparametric "is this
    * metric drifting" answer (no normality assumption, robust to the
    * spikes that wreck a least-squares slope).
    *
    * The pair sum runs on the POST-AGGREGATE series frame — O(n²)
    * pairs but calendar-bounded n, and the small side broadcasts, so
    * the non-equi join is a broadcast nested-loop over a handful of
    * rows, never a shuffle. S, n, and the tie counters are exact
    * integers; Var(S) is one division by 18 and Z one division by a
    * sqrt, identical in any replay. Returns one row: (n, s, var_s, z).
    * A fully-tied series (var_s = 0 after tie correction, which forces
    * s = 0) reports z = 0 — the same "no trend" convention as the
    * s = 0 branch — rather than a null.
    */
  def mannKendall(df: DataFrame, ordCol: String, cntCol: String): DataFrame = {
    val a = df.select(col(ordCol).as("ta"), col(cntCol).as("xa"))
    val b = df.select(col(ordCol).as("tb"), col(cntCol).as("xb"))
    val s = a.join(b, col("ta") < col("tb"))
      .agg(coalesce(sum(signum(col("xb") - col("xa")).cast("long")), lit(0L))
        .as("s"))
      .withColumn("k", lit(1))
    val nn = df.agg(count(lit(1)).as("n")).withColumn("k", lit(1))
    val ties = df.groupBy(col(cntCol)).agg(count(lit(1)).as("tp"))
      .agg(coalesce(sum(col("tp") * (col("tp") - 1) * (lit(2) * col("tp") + 5)),
        lit(0L)).as("tie_term"))
      .withColumn("k", lit(1))
    s.join(broadcast(nn), Seq("k")).join(broadcast(ties), Seq("k")).drop("k")
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tie_term"))
          .cast("double") / lit(18.0))
      .withColumn("z",
        when(col("var_s") > 0 && col("s") > 0,
          (col("s") - 1).cast("double") / sqrt(col("var_s")))
        .when(col("var_s") > 0 && col("s") < 0,
          (col("s") + 1).cast("double") / sqrt(col("var_s")))
        .otherwise(lit(0.0)))
      .select("n", "s", "var_s", "z")
  }

  /** Theil–Sen slope (Theil 1950; Sen 1968): the MEDIAN of all
    * pairwise slopes (xⱼ−xᵢ)/(j−i) over the row-indexed series — the
    * robust trend MAGNITUDE companion to [[mannKendall]]'s direction
    * test (one spike day moves a least-squares slope arbitrarily;
    * it moves at most half the pairwise medians). Returns one row
    * (n, n_pairs, slope).
    *
    * Same bounded-frame contract as [[acf]]: O(n²) pairs on the
    * calendar-bounded post-aggregate frame via a broadcast non-equi
    * self-join. Each slope is ONE double division of exact integers
    * (identical in any replay); the median is Spark's exact
    * `percentile` = DuckDB's `quantile_cont` (both p·(n−1) linear
    * interpolation — the bootstrap-CI parity).
    */
  def theilSen(df: DataFrame, ordCol: String, cntCol: String): DataFrame = {
    val indexed = df
      .withColumn("t", row_number().over(Window.orderBy(col(ordCol))).cast("long"))
    val a = indexed.select(col("t").as("ta"), col(cntCol).as("xa"))
    val b = indexed.select(col("t").as("tb"), col(cntCol).as("xb"))
    val slopes = a.join(b, col("ta") < col("tb"))
      .select(((col("xb") - col("xa")).cast("double") /
        (col("tb") - col("ta")).cast("double")).as("slope"))
    val nn = indexed.agg(count(lit(1)).as("n")).withColumn("k", lit(1))
    slopes.agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("slope"))
      .withColumn("k", lit(1)).join(broadcast(nn), Seq("k")).drop("k")
      .select("n", "n_pairs", "slope")
  }

  /** Per-series [[theilSen]]: one (n, n_pairs, slope) row per value of
    * `keyCol` — the shape real telemetry has (a slope per device /
    * tenant / metric), where the global form's unpartitioned
    * row_number window would funnel every series through one
    * partition. Pairs come from an equi-join ON THE KEY (a proper
    * shuffle join: each series' O(n²) pair expansion stays inside its
    * key's partition and is bounded by the calendar-bounded per-series
    * length, never the key count); the slope median is a per-key
    * exact-percentile aggregate. Single-observation series keep their
    * row with n_pairs = 0 and a null slope — the same degenerate
    * answer the global form gives a 1-row frame.
    */
  def theilSenByKey(df: DataFrame, keyCol: String, ordCol: String,
                    cntCol: String): DataFrame = {
    val indexed = df.withColumn("t", row_number()
      .over(Window.partitionBy(col(keyCol)).orderBy(col(ordCol))).cast("long"))
    val a = indexed.select(col(keyCol), col("t").as("ta"), col(cntCol).as("xa"))
    val b = indexed.select(col(keyCol), col("t").as("tb"), col(cntCol).as("xb"))
    val slopes = a.join(b, Seq(keyCol)).filter(col("ta") < col("tb"))
      .select(col(keyCol), ((col("xb") - col("xa")).cast("double") /
        (col("tb") - col("ta")).cast("double")).as("slope"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("slope"))
    indexed.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .join(slopes, Seq(keyCol), "left")
      .select(col(keyCol), col("n"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope"))
      .orderBy(keyCol)
  }

  /** Autocorrelation function of an integer count series at lags
    * 1..`maxLag` — the seasonality detector feeding
    * [[seasonalDecomposeDaily]]'s period choice (a weekly cycle shows
    * as a spike at lag 7). Deviations are kept EXACT by n-scaling:
    * dev_t = n·x_t − T is an integer, so r_k = Σ dev_t·dev_{t+k} /
    * Σ dev_t² is a ratio of exact integer sums — one double division
    * per lag, bit-identical in any replay (the n² factors cancel).
    * The squared-deviation sums are widened to decimal(38,0) before
    * summing (dev ~ n·x_t, so dev² overflows long well before the
    * inputs do — the cuped/spearman moment discipline).
    *
    * Pairs come from a bounded non-equi self-join of the
    * post-aggregate frame (calendar-bounded, broadcast); the only
    * window is the row_number indexing over that same frame.
    */
  def acf(df: DataFrame, ordCol: String, cntCol: String,
          maxLag: Int = 7): DataFrame = {
    val all = Window.partitionBy()
    val indexed = df
      .withColumn("t", row_number().over(Window.orderBy(col(ordCol))).cast("long"))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("total", sum(col(cntCol)).over(all))
      .withColumn("dev",
        col("n").cast("decimal(38,0)") * col(cntCol) - col("total"))
    val den = indexed.agg(sum(col("dev") * col("dev")).as("den"))
      .withColumn("k", lit(1))
    val aSide = indexed.select(col("t").as("ta"), col("dev").as("da"))
    val bSide = indexed.select(col("t").as("tb"), col("dev").as("db"))
    aSide.join(bSide,
        col("tb") - col("ta") >= 1 && col("tb") - col("ta") <= maxLag)
      .groupBy((col("tb") - col("ta")).as("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("da") * col("db")).as("num"))
      .withColumn("k", lit(1)).join(broadcast(den), Seq("k")).drop("k")
      .withColumn("acf", when(col("den") > 0,
        col("num").cast("double") / col("den").cast("double")))
      .select("lag", "n_pairs", "acf")
      .orderBy("lag")
  }

  /** Per-series [[acf]]: one (key, lag, n_pairs, acf) row per value of
    * `keyCol` and lag 1..`maxLag` — same n-scaled exact-integer
    * deviations, with every window PARTITIONED BY THE KEY (the
    * unpartitioned global form funnels one series through one
    * partition; here each series' moments and its lag pairs stay
    * inside its key's partition). The lag pairs come from an equi-join
    * on the key with the lag-window residual filter — per-key O(n·maxLag)
    * surviving pairs over a calendar-bounded per-series length.
    * Keys whose deviations are all zero (constant series) report a
    * null acf, as in the global form.
    */
  def acfByKey(df: DataFrame, keyCol: String, ordCol: String,
               cntCol: String, maxLag: Int = 7): DataFrame = {
    val wKey = Window.partitionBy(col(keyCol))
    val indexed = df
      .withColumn("t", row_number()
        .over(Window.partitionBy(col(keyCol)).orderBy(col(ordCol))).cast("long"))
      .withColumn("n", count(lit(1)).over(wKey))
      .withColumn("total", sum(col(cntCol)).over(wKey))
      .withColumn("dev",
        col("n").cast("decimal(38,0)") * col(cntCol) - col("total"))
    val den = indexed.groupBy(col(keyCol))
      .agg(sum(col("dev") * col("dev")).as("den"))
    val aSide = indexed.select(col(keyCol), col("t").as("ta"), col("dev").as("da"))
    val bSide = indexed.select(col(keyCol), col("t").as("tb"), col("dev").as("db"))
    aSide.join(bSide, Seq(keyCol))
      .filter(col("tb") - col("ta") >= 1 && col("tb") - col("ta") <= maxLag)
      .groupBy(col(keyCol), (col("tb") - col("ta")).as("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("da") * col("db")).as("num"))
      .join(den, Seq(keyCol))
      .withColumn("acf", when(col("den") > 0,
        col("num").cast("double") / col("den").cast("double")))
      .select(col(keyCol), col("lag"), col("n_pairs"), col("acf"))
      .orderBy(keyCol, "lag")
  }

  /** Single change-point detection over an integer count series via
    * the standardized CUSUM statistic (Page 1954's control-chart idea
    * in its retrospective scan form): for each candidate split t,
    * stat_t = |n·L_t − t·T| / (n·√(t·(n−t))) where L_t is the prefix
    * sum and T the total — the normalized gap between the left-mean
    * and the grand mean. The maximizing t is the estimated break;
    * `is_peak` flags it (every tie, deterministically, since the
    * statistic is exact-integer-derived).
    *
    * The numerator n·L_t − t·T is EXACT integer arithmetic; the only
    * floats are one sqrt and one division per row, so stat doubles are
    * bit-identical in any replay and the argmax flag needs no
    * tolerance. Windows run over the post-aggregate series frame
    * (calendar-bounded), the [[seasonalDecomposeDaily]] discipline.
    * The final row (t = n) has no right segment and is excluded.
    */
  def changePoint(df: DataFrame, ordCol: String, cntCol: String): DataFrame = {
    val byOrd = Window.orderBy(col(ordCol))
    val all = Window.partitionBy()
    val scored = df
      .withColumn("t", row_number().over(byOrd).cast("long"))
      .withColumn("cum",
        sum(col(cntCol)).over(byOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("total", sum(col(cntCol)).over(all))
      .filter(col("t") < col("n"))
      .withColumn("stat",
        abs(col("n") * col("cum") - col("t") * col("total")).cast("double") /
          (col("n").cast("double") *
            sqrt((col("t") * (col("n") - col("t"))).cast("double"))))
    scored
      .withColumn("max_stat", max(col("stat")).over(all))
      .select(col(ordCol), col(cntCol), col("cum"), col("stat"),
        (col("stat") === col("max_stat")).as("is_peak"))
      .orderBy(ordCol)
  }

  /** Per-series [[changePoint]]: the CUSUM scan with every window
    * PARTITIONED BY THE KEY, so each series' prefix sums, totals, and
    * argmax stay inside its key's partition — the multi-tenant /
    * per-metric telemetry shape. `is_peak` flags each key's own
    * maximizing split (ties all flagged, deterministically, exactly as
    * the global form).
    */
  def changePointByKey(df: DataFrame, keyCol: String, ordCol: String,
                       cntCol: String): DataFrame = {
    val byOrd = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val wKey = Window.partitionBy(col(keyCol))
    val scored = df
      .withColumn("t", row_number().over(byOrd).cast("long"))
      .withColumn("cum",
        sum(col(cntCol)).over(byOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(wKey))
      .withColumn("total", sum(col(cntCol)).over(wKey))
      .filter(col("t") < col("n"))
      .withColumn("stat",
        abs(col("n") * col("cum") - col("t") * col("total")).cast("double") /
          (col("n").cast("double") *
            sqrt((col("t") * (col("n") - col("t"))).cast("double"))))
    scored
      .withColumn("max_stat", max(col("stat")).over(wKey))
      .select(col(keyCol), col(ordCol), col(cntCol), col("cum"), col("stat"),
        (col("stat") === col("max_stat")).as("is_peak"))
      .orderBy(keyCol, ordCol)
  }

  def rollingCorrCounts(df: DataFrame, ordCol: String, xCol: String,
                        yCol: String, window: Int = 7): DataFrame = {
    val w = Window.orderBy(col(ordCol)).rowsBetween(-(window - 1), 0)
    val x = col(xCol)
    val y = col(yCol)
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    df
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(x).over(w))
      .withColumn("sy", sum(y).over(w))
      .withColumn("sxy", sum(x * y).over(w))
      .withColumn("sxx", sum(x * x).over(w))
      .withColumn("syy", sum(y * y).over(w))
      .withColumn("corr", round(
        when(vx > 0 && vy > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))), 6))
      .select(col(ordCol), x, y, col("n"), col("corr"))
      .orderBy(ordCol)
  }

  def seasonalDecomposeDaily(df: DataFrame, tsCol: String): DataFrame = {
    val byDay = Window.orderBy(col("day"))
    val all = Window.partitionBy()
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("day")))
    val dowAgg = daily.groupBy("dow")
      .agg(sum("cnt").as("dow_sum"), count(lit(1)).as("dow_days"))
    daily
      .withColumn("t_sum", sum(col("cnt")).over(byDay.rowsBetween(-3, 3)))
      .withColumn("t_n", count(lit(1)).over(byDay.rowsBetween(-3, 3)))
      .withColumn("total", sum(col("cnt")).over(all))
      .withColumn("n_days", count(lit(1)).over(all))
      .join(broadcast(dowAgg), Seq("dow"))
      .withColumn("trend",
        col("t_sum").cast("double") / col("t_n").cast("double"))
      .withColumn("seasonal",
        col("dow_sum").cast("double") / col("dow_days").cast("double") -
          col("total").cast("double") / col("n_days").cast("double"))
      .withColumn("residual",
        col("cnt").cast("double") - col("trend") - col("seasonal"))
      .select("day", "cnt", "dow", "trend", "seasonal", "residual")
      .orderBy("day")
  }

  /** OHLC bars (the candlestick summary): per (key, bucket) the
    * first/last/max/min observed value (epoch unit-agnostic: pass
    * seconds or micros with a matching bucketSize) — open and close picked by
    * min_by/max_by AGGREGATES on the (epoch, value) pair, not a
    * window, so the plan is one hash aggregate with map-side partial
    * combine and no per-row ranking. Ties at the same timestamp break
    * by value (the struct's second field), so bars are deterministic
    * under any partitioning even with duplicate-epoch readings.
    * Values pass through untouched (no sums — open/high/low/close are
    * SELECTED readings), n counts the bar's observations.
    */
  def ohlc(df: DataFrame, keyCol: String, epochCol: String,
           valueCol: String, bucketSize: Long): DataFrame =
    ohlcAgg(df, keyCol, epochCol, valueCol, bucketSize)
      .orderBy(col("key"), col("bucket"))

  /** The unsorted aggregate core of [[ohlc]] — every output column is
    * a MERGEABLE declarative aggregate (count / min / max /
    * min_by / max_by), so the same frame runs as a streaming
    * complete-mode aggregate maintaining live bars (q_stream_ohlc).
    */
  def ohlcAgg(df: DataFrame, keyCol: String, epochCol: String,
              valueCol: String, bucketSize: Long): DataFrame = {
    require(bucketSize > 0, "ohlc: bucketSize must be positive")
    val base = df.select(col(keyCol).as("key"),
      slotOf(col(epochCol), bucketSize).as("bucket"),
      col(epochCol).cast("long").as("es"),
      col(valueCol).cast("double").as("v"))
    base.groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min_by(col("v"), struct(col("es"), col("v"))).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), struct(col("es"), col("v"))).as("close"))
      .select(col("key"), col("bucket"), col("n"), col("open"),
        col("high"), col("low"), col("close"))
  }
}
