package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse integrity checks — the constraints the reference declares
  * in SQLAlchemy (PKs, uniques, FKs; `ET-ETL-DWH-PY312/ETL/schema.py`)
  * but that a parquet store cannot enforce. Each check returns a
  * violations DataFrame (empty = healthy) so callers choose
  * fail-fast (`require(df.isEmpty)`) or audit-report semantics.
  *
  * All checks are single aggregations / anti-joins — scale-safe.
  */
object Validate {

  /** Join-key skew diagnostic: the top-K heaviest keys with their row
    * counts, share of the table, and skew factor (count over the mean
    * per-key count) — what you inspect before deciding a join needs
    * salting ([[Enrich.saltedJoin]]) or an AQE skew threshold. One
    * groupBy (map-side combined) + a TakeOrdered top-K + a broadcast
    * scalar; ties rank by key for determinism.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__nkeys"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"), col("rank"),
        round(col("cnt").cast("double") / col("__total").cast("double"), 6)
          .as("share"),
        round(col("cnt").cast("double")
          / (col("__total").cast("double") / col("__nkeys").cast("double")), 6)
          .as("skew"))
  }

  /** Per-group z-score outliers: rows whose value deviates more than
    * `threshold` sample standard deviations from their group's mean —
    * the anomaly screen run over metric streams before they feed
    * training labels or dashboards. Moments accumulate as exact
    * decimals (order-independent, so AQE / any parallelism gives the
    * same answer); the z computation is then a fixed sequence of IEEE
    * double ops, making the flagged set bit-deterministic — the DuckDB
    * oracle replays it exactly. One shuffle (the moment groupBy; group
    * cardinality is small by assumption) + a broadcast join back to the
    * unshuffled rows.
    */
  def zScoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double = 2.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val moments = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(v.cast("decimal(28,10)")).as("__s1"),
        sum((v * v).cast("decimal(28,10)")).as("__s2"))
    val nd = col("__n").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val variance = (s2 - s1 * s1 / nd) / (nd - lit(1.0))
    val z = (v - s1 / nd) / sqrt(variance)
    df.join(broadcast(moments), Seq(groupCol))
      .filter(col("__n") > 1 && variance > 0 && abs(z) > threshold)
      .drop("__n", "__s1", "__s2")
  }

  /** Key tuples appearing more than once (must be empty post-upsert). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Child rows whose FK has no parent (referential orphans). */
  def fkOrphans(child: DataFrame, parent: DataFrame,
                childFk: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)),
      child(childFk) === parent(parentKey), "left_anti")

  /** Rows with nulls in declared non-nullable columns. */
  def nullViolations(df: DataFrame, notNullCols: Seq[String]): DataFrame =
    notNullCols.filter(df.columns.contains) match {
      case Nil => df.limit(0)
      case cols => df.filter(cols.map(col(_).isNull).reduce(_ || _))
    }

  /** Column-level profile of a table — the data-quality summary every
    * ingest review starts from. Long format, one row per column: n,
    * nulls, distinct (exact), min/max (as strings, so mixed column
    * types share a schema), mean for numeric columns (decimal-
    * accumulated, order-independent, null for non-numerics).
    *
    * Scale shape (r18): `exactDistinct = true` runs one GROUP-REDUCE
    * pipeline per column — groupBy(value).count with map-side combine,
    * then a 1-row reduce deriving every metric from the (value, cnt)
    * pairs. The old single Aggregate planned the multi-distinct via
    * EXPAND, replicating every input row (cols+1)× ahead of the
    * shuffle and sorting the expansion (string min/max force
    * SortAggregate): measured at the bench, 2.2 s of q_profile's 2.4 s
    * sat in that one expand+sort task. The per-column form shuffles
    * only distinct values (combine collapses duplicates at the map
    * side), columnar pruning means each pass reads just its own
    * column, and the N pipelines run as independent shuffle stages.
    * All metrics are value-identical: n = Σcnt over non-null values,
    * distinct = count of non-null values, mean = exact decimal
    * Σ(value·cnt) ÷ n with the same single double division.
    *
    * `exactDistinct = false` keeps the one-pass HLL Aggregate (no
    * expand — a single scan is optimal there).
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty,
              exactDistinct: Boolean = true): DataFrame = {
    val targets = if (cols.isEmpty) df.columns.toSeq else cols
    val numeric = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    if (exactDistinct) {
      val perCol = targets.map { c =>
        val grouped = df.select(col(c).as("__v"))
          .groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
        val nonNullCnt = when(col("__v").isNotNull, col("__cnt")).otherwise(lit(0L))
        grouped.agg(
          sum(nonNullCnt).as("n"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L)).as("nulls"),
          count(col("__v")).as("n_distinct"),
          min(col("__v")).cast("string").as("min_s"),
          max(col("__v")).cast("string").as("max_s"),
          (if (numeric.contains(c))
            // Σ(value·cnt) in exact decimal == the row-level decimal sum
            // (cnt is an exact integer multiplier); ONE double division
            round(sum(col("__v").cast("decimal(30,6)") * col("__cnt"))
              .cast("double") / sum(nonNullCnt), 6)
          else lit(null).cast("double")).as("mean"))
          .select(lit(c).as("column"), col("n"), col("nulls"),
            col("n_distinct"), col("min_s"), col("max_s"), col("mean"))
      }
      // n/nulls come out of sum() as nullable longs; cast the union back
      // to the legacy schema (count() was non-null bigint)
      perCol.reduce(_ unionByName _)
        .select(col("column"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("nulls"), col("n_distinct"), col("min_s"), col("max_s"),
          col("mean"))
        .orderBy("column")
    } else {
      val aggs = targets.flatMap { c =>
        Seq(
          count(col(c)).as(s"__n_$c"),
          count(when(col(c).isNull, 1)).as(s"__null_$c"),
          approx_count_distinct(col(c)).as(s"__dist_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"),
          (if (numeric.contains(c))
            // exact decimal sum ÷ count as ONE double division — the
            // decimal-avg form rounds differently across engines
            round(sum(col(c).cast("decimal(30,6)")).cast("double") / count(col(c)), 6)
          else lit(null).cast("double")).as(s"__mean_$c"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stacked = targets.map(c =>
        s"'$c', __n_$c, __null_$c, __dist_$c, __min_$c, __max_$c, __mean_$c").mkString(", ")
      one.selectExpr(s"stack(${targets.size}, $stacked) as " +
          "(column, n, nulls, n_distinct, min_s, max_s, mean)")
        .orderBy("column")
    }
  }

  /** Robust (median/MAD) outlier screen over a numeric column: rows
    * with |x - median| / (MAD · 1.4826) above `k` — resistant to the
    * very outliers a mean/stddev z-score lets distort its own
    * baseline. Exact percentiles (one pass each for median and MAD),
    * broadcast as a 1-row frame; the score is a single IEEE division,
    * replayable by any engine with quantile_cont.
    */
  def madOutliers(df: DataFrame, valueCol: String, k: Double = 3.5): DataFrame = {
    val med = df.agg(
      expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = df.crossJoin(broadcast(med))
    val mad = withMed
      .agg(expr(s"percentile(abs($valueCol - __med), 0.5)").as("__mad"),
        first(col("__med")).as("__med"))
    withMed.drop("__med").crossJoin(broadcast(mad))
      .withColumn("robust_z",
        round(abs(col(valueCol) - col("__med")) / (col("__mad") * 1.4826), 6))
      .filter(col("__mad") > 0 && col("robust_z") > k)
      .drop("__med", "__mad")
  }

  /** Equal-frequency (quantile) binning — the feature-engineering
    * discretizer. Returns `df` + `bin` (1..nBins) + the bin's lower
    * edge.
    *
    * Deliberately NOT `ntile()`: a global ntile is a window with no
    * partitionBy — the whole table sorts into ONE partition, the
    * classic scale-killer. Here the nBins-1 interior edges come from
    * one exact-percentile aggregate (a few hundred bytes), broadcast;
    * assignment is a codegen'd sum of comparisons per row — no global
    * sort, no shuffle of the data at all. Rows equal to an edge go to
    * the lower bin (`value <= edge`), so ties land deterministically
    * regardless of partitioning (ntile splits ties by arbitrary sort
    * position instead).
    */
  def quantileBins(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "quantileBins: nBins in [2, 1000]")
    // DISCRETE (type-1) quantile edges: edge_i = the ceil(i*n/nBins)-th
    // smallest value — an ACTUAL data value selected by pure integer
    // rank logic, which any engine replays byte-for-byte. Interpolated
    // edges (percentile / quantile_cont) are engine-ambiguous at
    // tied-run boundaries — (1-f)a+f·b vs a+f·(b-a) differ by 1 ulp,
    // and a row whose value equals the edge flips bins (measured at the
    // 10x differential). Cumulative counts run over DISTINCT values:
    // one aggregate plus a window over the distinct-value frame — the
    // same distinct-bounded memory class as the exact-percentile
    // aggregate this replaces (which buffered every value per group).
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", max(col("__cum")).over(
        Window.orderBy("__v").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val edges = cum.agg(
      array((1 until nBins).map(i =>
        min(when(col("__cum") >=
          expr(s"(${i}L * __n + ${nBins - 1}L) div ${nBins}L"), col("__v")))): _*)
        .as("__edges"))
    df.crossJoin(broadcast(edges))
      .withColumn("bin",
        (lit(1) + (0 until nBins - 1)
          .map(i => when(col(valueCol) > col("__edges").getItem(i), 1).otherwise(0))
          .reduce(_ + _)).cast("int"))
      .withColumn("bin_lower",
        when(col("bin") === 1, lit(null).cast("double"))
          .otherwise(element_at(col("__edges"), col("bin") - 1)))
      .drop("__edges")
  }

  /** Weighted discrete percentiles: the smallest value whose
    * CUMULATIVE WEIGHT reaches ceil(p * W_total) — the token-weighted
    * cousin of [[quantileBins]]'s type-1 edges ("the median document
    * BY TOKEN MASS", where a plain row median over a corpus of mixed
    * 10-token tweets and 100k-token books answers the wrong question).
    * Weights must be positive integers (rows with null/non-positive
    * weight are excluded); the returned value is an ACTUAL data value
    * selected by pure integer weight-rank logic — engine-replayable
    * byte-for-byte, no interpolation ambiguity. One row per requested
    * p: (p, value).
    *
    * Scale shape: one hash aggregate to the DISTINCT-value frame
    * (weights summed in exact long), a cumulative window over that
    * frame (the quantileBins memory class), |ps| target picks via the
    * prev_cum < rk <= cum predicate — never a row-level sort or rank.
    *
    * Rank exactness: each p is read back through its SHORTEST decimal
    * representation (the number the caller typed — 0.95 means 95/100,
    * not the nearest binary double) and the ⌈p·W⌉ rank test is
    * CROSS-MULTIPLIED (cum·den >= num·W over decimal(38,0)) so no
    * division or float ever enters the pick — a double ceil(p*W) can
    * land one ulp above the exact rational and shift the selected
    * rank by a whole weight class.
    */
  def weightedPercentiles(df: DataFrame, valueCol: String,
                          weightCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "weightedPercentiles: need at least one p")
    require(ps.forall(p => p > 0 && p <= 1),
      s"weightedPercentiles: ps must be in (0, 1], got $ps")
    require(ps.distinct.size == ps.size,
      s"weightedPercentiles: duplicate ps in $ps")
    val counts = df
      .where(col(valueCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(sum(col(weightCol).cast("long")).as("__wc"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("__cum", sum(col("__wc")).over(w))
      .crossJoin(broadcast(counts.agg(sum(col("__wc")).as("__W"))))
    val targets = ps.map { p =>
      // shortest-decimal num/den: BigDecimal.valueOf goes through
      // Double.toString, so 0.95 -> 95/100 exactly, never the binary
      // approximation the double carries
      val bd = java.math.BigDecimal.valueOf(p).stripTrailingZeros
      val scl = math.max(bd.scale, 0)
      // den = 10^scl must fit a long: cap the contract at 18 decimal
      // digits with a clear error instead of an ArithmeticException
      // from longValueExact deep in plan build
      require(scl <= 18,
        s"weightedPercentiles: p=$p has $scl decimal digits — the " +
          "exact-rank contract supports at most 18 (a finer p selects " +
          "nothing a discrete weighted rank can distinguish)")
      val den = java.math.BigDecimal.TEN.pow(scl).longValueExact
      val num = bd.movePointRight(scl).longValueExact
      struct(lit(p).as("p"), lit(num).as("num"), lit(den).as("den"))
    }
    // cum >= ceil(num*W/den) <=> cum*den >= num*W for integer cum, and
    // prev_cum < ceil(num*W/den) <=> prev_cum*den < num*W — so the pick
    // needs no division at all; decimal(38,0) products cannot overflow
    def d38(c: Column) = c.cast("decimal(38,0)")
    cum.select(col("v"), col("__wc"), col("__cum"), col("__W"),
        explode(array(targets: _*)).as("__t"))
      .filter(d38(col("__cum")) * col("__t.den") >=
          d38(col("__t.num")) * col("__W") &&
        d38(col("__cum") - col("__wc")) * col("__t.den") <
          d38(col("__t.num")) * col("__W"))
      .select(col("__t.p").as("p"), col("v").as("value"))
      .orderBy(col("p"))
  }

  /** Declarative data-contract suite (the Deequ/Great-Expectations
    * shape): a list of named expectations evaluated over a frame,
    * one row per rule with its violation count and pass flag. Row-wise
    * rules (notNull / inRange / inSet / matches / satisfies) all fold
    * into ONE aggregate pass — conditional counts over a single scan;
    * `unique` adds the one groupBy its semantics require. The result
    * is tiny (|rules| rows) and ORDER BY name — the frame a CI gate
    * diffs against yesterday's.
    */
  sealed trait Expectation { def name: String }
  final case class ExpectNotNull(name: String, column: String) extends Expectation
  final case class ExpectInRange(name: String, column: String,
                                 lo: Double, hi: Double) extends Expectation
  final case class ExpectInSet(name: String, column: String,
                               values: Seq[String]) extends Expectation
  final case class ExpectMatches(name: String, column: String,
                                 regex: String) extends Expectation
  /** arbitrary boolean SQL over the row, e.g. "o_totalprice >= 0" */
  final case class ExpectSatisfies(name: String, predicate: String) extends Expectation
  final case class ExpectUnique(name: String, columns: Seq[String]) extends Expectation

  def expect(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expect: need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "expect: rule names must be unique")
    val spark = df.sparkSession
    import spark.implicits._
    val rowRules = rules.collect {
      case ExpectNotNull(n, c) => n -> col(c).isNull
      case ExpectInRange(n, c, lo, hi) =>
        n -> !(col(c) >= lo && col(c) <= hi) // null → violation
      case ExpectInSet(n, c, vs) => n -> !coalesce(col(c).isin(vs: _*), lit(false))
      case ExpectMatches(n, c, re) =>
        n -> !coalesce(col(c).rlike(re), lit(false))
      case ExpectSatisfies(n, p) => n -> !coalesce(expr(p), lit(false))
    }
    val rowPart: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else Some {
        val aggs = rowRules.map { case (n, bad) =>
          sum(when(bad, 1L).otherwise(0L)).as(n)
        }
        df.agg(aggs.head, aggs.tail: _*)
          .select(rowRules.map { case (n, _) =>
            struct(lit(n).as("rule"), col(n).as("violations")).as(n)
          }: _*)
          .select(explode(array(rowRules.map(r => col(r._1)): _*)).as("r"))
          .select(col("r.rule"), col("r.violations"))
      }
    val uniqueParts = rules.collect {
      case ExpectUnique(n, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .where(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
    }
    (rowPart.toSeq ++ uniqueParts)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("rule")
  }

  /** Per-group z-score standardization — the feature-scaling step
    * before model training, as exact arithmetic: group moments (Σx,
    * Σx²) accumulate in DECIMAL over a window on the group key (no
    * join-back, one shuffle), sample std comes out of one sqrt, and
    * z = (v − mean)/std is a fixed scalar sequence — bit-stable under
    * any partitioning, unlike avg/stddev(double) whose streaming
    * merge order varies. Groups with n ≤ 1 or zero variance yield a
    * null z.
    */
  def standardize(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("decimal(18,4)")
    val w = Window.partitionBy(col(keyCol))
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w).cast("double"))
      .withColumn("__sxx", sum((x * x).cast("decimal(30,8)")).over(w).cast("double"))
      .withColumn(s"${valueCol}_z", round(
        when(col("__n") > 1 &&
            (col("__n") * col("__sxx") - col("__sx") * col("__sx")) > 0,
          (col(valueCol) - col("__sx") / col("__n")) /
            sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) /
              (col("__n") * (col("__n") - 1)))), 6))
      .drop("__n", "__sx", "__sxx")
  }

  /** Key-skew profile — the decision input for [[Enrich.saltedJoin]]:
    * the top-k heaviest keys with their share, plus the global shape
    * (max/avg skew factor, Shannon entropy of the key distribution).
    * A skew factor near 1 and entropy near ln(n_keys) mean a plain
    * shuffle is fine; a few keys holding double-digit shares mean the
    * join on this key needs salting or AQE skew handling.
    *
    * One count shuffle on the key; everything downstream reduces to
    * 1-row broadcast frames and a top-k (TakeOrdered) — profiling a
    * 100 TB fact costs one aggregate pass. Deterministic: fractions
    * are single divisions of exact counts; entropy terms round to 9
    * before the decimal sum.
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val g = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    val p = col("cnt").cast("double") / col("n_rows")
    val ent = counts.crossJoin(broadcast(g))
      .agg(round(-sum(round(p * log(p), 9).cast("decimal(18,9)")).cast("double"), 6)
        .as("entropy"))
    val ord = Seq(col("cnt").desc, col("key").asc)
    val top = counts.orderBy(ord: _*).limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
    top.crossJoin(broadcast(g)).crossJoin(broadcast(ent))
      .select(col("rank"), col("key"), col("cnt"),
        round(p, 6).as("frac"),
        col("n_rows"), col("n_keys"),
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 6)
          .as("skew"),
        col("entropy"))
      .orderBy(col("rank"))
  }

  /** Distribution-drift report: Population Stability Index of
    * `current` against `base`, over `nBins` quantile bins OF THE BASE
    * (the convention that makes PSI comparable across checks — the
    * reference distribution defines the bins, the current one is
    * scored into them). One row per bin with counts, fractions, and
    * the bin's PSI contribution `(p_cur - p_base)·ln(p_cur/p_base)`;
    * `psi_total` rides on every row. Rules of thumb: < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Empty bins substitute p = 1e-6 (the standard clamp — PSI is
    * undefined at zero). Scale shape: one exact-percentile aggregate
    * over the base broadcast as a 1-row frame; each side then
    * aggregates to nBins rows with map-side combine — the data itself
    * never shuffles. Deterministic: fractions are single IEEE
    * divisions of exact counts; contributions round to 6 before the
    * decimal total.
    */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
               nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "psiDrift: nBins in [2, 1000]")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val edges = base.agg(
      expr(s"percentile($valueCol, array(${qs.mkString(",")}))").as("__edges"))
    def binCounts(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(edges))
        .withColumn("bin",
          (lit(1) + (0 until nBins - 1)
            .map(i => when(col(valueCol) > col("__edges").getItem(i), 1).otherwise(0))
            .reduce(_ + _)).cast("int"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    val nb = binCounts(base).withColumnRenamed("n", "n_base")
    val nc = binCounts(current).withColumnRenamed("n", "n_cur")
    val spine = edges.select(explode(sequence(lit(1), lit(nBins))).as("bin"))
    val w = Window.partitionBy()
    val joined = spine
      .join(nb, Seq("bin"), "left").join(nc, Seq("bin"), "left")
      .withColumn("n_base", coalesce(col("n_base"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("__tb", sum(col("n_base")).over(w))
      .withColumn("__tc", sum(col("n_cur")).over(w))
    val pb = when(col("n_base") === 0, lit(1e-6))
      .otherwise(col("n_base").cast("double") / col("__tb").cast("double"))
    val pc = when(col("n_cur") === 0, lit(1e-6))
      .otherwise(col("n_cur").cast("double") / col("__tc").cast("double"))
    joined
      .withColumn("p_base", round(pb, 6))
      .withColumn("p_cur", round(pc, 6))
      .withColumn("psi_contrib", round((pc - pb) * log(pc / pb), 6))
      .withColumn("psi_total",
        round(sum(col("psi_contrib").cast("decimal(18,6)")).over(w)
          .cast("double"), 6))
      .select("bin", "n_base", "n_cur", "p_base", "p_cur",
        "psi_contrib", "psi_total")
  }

  /** Winsorization: clip a numeric column to its [lo, hi] exact
    * percentiles — the standard outlier-tamer before averaging or
    * model features. Adds `<col>_w` (clipped) alongside the original;
    * edges come from one percentile aggregate broadcast as a 1-row
    * frame, clipping is a codegen'd `greatest(least(...))` — no sort,
    * no shuffle of the data.
    */
  def winsorize(df: DataFrame, valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "winsorize: 0 <= lo < hi <= 1")
    val edges = df.agg(
      expr(s"percentile($valueCol, $lo)").as("__lo"),
      expr(s"percentile($valueCol, $hi)").as("__hi"))
    df.crossJoin(broadcast(edges))
      .withColumn(s"${valueCol}_w",
        greatest(least(col(valueCol), col("__hi")), col("__lo")))
      .drop("__lo", "__hi")
  }

  /** One-line health report per table: row count + violation counts for
    * the declared key/not-null constraints.
    */
  final case class TableHealth(table: String, rows: Long,
                               duplicateKeyGroups: Long, nullKeyRows: Long)

  /** ONE aggregation per table (a single shuffle on the key) instead of
    * three separate jobs: group per key tuple once, then roll up row
    * count, duplicate-key groups, and null-key rows from the grouped
    * frame — over a full-warehouse audit that is 3× fewer scans.
    */
  def health(name: String, df: DataFrame, keys: Seq[String]): TableHealth = {
    // audit the declared keys that EXIST (schema drift should degrade
    // the audit gracefully, same contract as [[nullViolations]] — a
    // missing key column is drift to report, not an AnalysisException)
    val present = keys.filter(df.columns.contains)
    if (present.isEmpty)
      return TableHealth(name, df.count(), 0L, 0L)
    val nullKey = present.map(col(_).isNull).reduce(_ || _)
    val r = df.groupBy(present.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("rows"),
        count(when(col("__n") > 1, 1)).as("dup_groups"),
        coalesce(sum(when(nullKey, col("__n"))), lit(0L)).as("null_rows"))
      .collect()(0)
    TableHealth(name, r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Benford's-law expected first-significant-digit shares, ×10⁶ as
    * exact integer constants (ln(1+1/d)/ln 10 rounded to 6 dp — they
    * sum to exactly 1.000000). Shared-literal constants so an oracle
    * replays the chi-square terms without its own transcendental calls.
    */
  val benfordE6: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law first-significant-digit drift check over a positive
    * amount column — the classic fraud / data-fabrication tripwire for
    * financial measures (Benford 1938; Nigrini 1996). Returns one row
    * per observed digit: count, observed share, expected share, and
    * the chi-square contribution (n−N·e)²/(N·e).
    *
    * Determinism contract: the digit is extracted via
    * ⌊value·100⌋ → integer → first character of its decimal rendering
    * (first significant digit of any amount ≥ 0.01) — pure integer
    * formatting, identical across engines, no log10 edge cases at
    * powers of ten. Shares and chi-square terms are double arithmetic
    * over integer counts and the ×10⁶ integer expectation constants in
    * a fixed left-associated shape, so the doubles are bit-identical
    * wherever the counts are. One hash aggregate over ≤9 groups — the
    * scan dominates at any scale, zero risk past the partial agg.
    *
    * Rows with value < 0.01 (no cent digit) are excluded; digits with
    * zero observations are absent (both conventions mirror exactly in
    * a replay).
    */
  def benford(df: DataFrame, valueCol: String): DataFrame =
    benfordFromCounts(df
      .filter(col(valueCol) >= 0.01)
      .select(benfordDigit(col(valueCol)).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n")))

  /** First-significant-digit of a positive amount ≥ 0.01 — the
    * [[benford]] extraction, exposed for streaming accumulation.
    */
  def benfordDigit(c: Column): Column =
    substring(floor(c * lit(100.0)).cast("string"), 1, 1).cast("int")

  /** [[benford]]'s finish over an already-accumulated (digit, n) count
    * frame. The state IS mergeable counters (9 of them), so a
    * complete-mode stream can maintain it across any micro-batch
    * schedule and close with this identical reduce — stream == batch
    * by construction.
    */
  def benfordFromCounts(counts: DataFrame): DataFrame = {
    val e6 = benfordE6.foldLeft(lit(null).cast("long")) { case (acc, (d, e)) =>
      when(col("digit") === d, lit(e)).otherwise(acc)
    }
    val nd = col("n").cast("double")
    val tot = sum(col("n")).over(org.apache.spark.sql.expressions.Window
      .partitionBy())
    counts
      .withColumn("n_total", tot)
      .withColumn("e", e6.cast("double") / lit(1000000.0))
      .select(col("digit"), col("n"),
        (nd / col("n_total").cast("double")).as("obs_share"),
        col("e").as("exp_share"),
        (((nd - col("n_total").cast("double") * col("e")) *
          (nd - col("n_total").cast("double") * col("e"))) /
          (col("n_total").cast("double") * col("e"))).as("chi2_term"))
      .orderBy("digit")
  }
}
