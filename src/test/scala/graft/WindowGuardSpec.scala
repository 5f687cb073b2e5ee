package graft

/** Plan-shape regression guard #2: no registered query may plan a
  * partition-less WindowExec over an UNBOUNDED frame — the window
  * shape that moves the whole dataset onto one partition and cannot
  * survive a 100x scale-up (`WindowExec: No Partition Defined`).
  *
  * A partition-less window IS legitimate when the frame it sorts is
  * structurally bounded — distinct values of a rounded/binned domain,
  * a post-aggregate handful of groups, or a post-limit top-K — so the
  * guard pins an explicit allowlist, each entry with the reason its
  * frame is bounded. Adding a new global window means either bounding
  * it or consciously extending the list: an unbounded one can no
  * longer slip in silently (the cartesian-guard discipline, applied
  * to windows).
  *
  * Detection parses the physical-plan string: a `Window [...]` line
  * has 3 top-level bracket groups (exprs, partitionSpec, orderSpec)
  * when partitioned; 2 groups whose second carries ASC/DESC (exprs,
  * orderSpec — ordered, unpartitioned) or a single group (global
  * unordered frame) mean no partitioning. A 2-group line WITHOUT
  * ASC/DESC is (exprs, partitionSpec) — partitioned, unordered — and
  * is fine.
  */
class WindowGuardSpec extends SparkSpec {

  /** Queries whose partition-less window frames are PROVABLY bounded. */
  private val allowlist: Map[String, String] = Map(
    "q_auc" -> "Mann-Whitney over 6-dp-rounded DISTINCT-score groups (Eval.auc contract)",
    "q_auc_binned" -> "Mann-Whitney over <= nBins bin rows (Eval.aucBinned)",
    "q_avg_precision" -> "cumulative PR window over 6-dp distinct-score groups",
    "q_funnel" -> "first-over-step window over |steps| rows (3 here; post-agg)",
    "q_funnel_windowed" -> "same |steps|-row frame as q_funnel",
    "q_ab_test" -> "global count over the post-agg per-arm frame (|variants| rows)",
    "q_psi_drift" -> "global sums over the post-agg drift-bin frame (|bins| rows)",
    "q_quantile_bins" -> "cumulative counts over DISTINCT values (Validate.quantileBins, exact-percentile class)",
    "q_share_of_total" -> "global sum over the post-agg per-segment frame",
    "q_skew_profile" -> "rank over the distinct-key count frame (key cardinality, never rows)",
    "x_skew_report" -> "same distinct-key frame as q_skew_profile",
    "x_vocab_topk" -> "rank+coverage over the distinct-word count frame (vocabulary-bounded)",
    "x_bm25_search" -> "rank AFTER .limit(topK): frame is <= topK rows",
    "x_datasheet" -> "percentile cumsum over DISTINCT length values (Corpus.datasheet)",
    "x_ppl_buckets" -> "tercile cumsum over DISTINCT 6-dp mean-lnp values (Corpus.pplBuckets)",
    "q_spearman" -> "average-rank cumsums over DISTINCT 6-dp values, one per column (Eval.spearmanCorr)",
    "q_stream_auc_binned" -> "Mann-Whitney closure over the streamed <=256-row bin sink",
    "x_bpe_merges" -> "rank AFTER .limit(topK): frame is <= topK rows (bm25 pattern)",
    "x_score_report" -> "Mann-Whitney over 6-dp-rounded DISTINCT-score groups (Eval.scoreReport routes through the same mannWhitney reduce as q_auc, same bounded-domain contract)",
    "x_benford" -> "global sum over the post-agg first-digit frame (<= 9 rows; Validate.benford)",
    "x_gini" -> "ordered cumsum over the post-agg per-source frame (|sources| rows; Corpus.concentration)",
    "x_seasonal" -> "7-row moving frame over the post-agg daily series (calendar-bounded; TimeSeries.seasonalDecomposeDaily)",
    "x_rolling_corr" -> "trailing 7-row frame over the post-agg daily series (calendar-bounded; TimeSeries.rollingCorrCounts)",
    "q_stream_benford" -> "global sum over the streamed <= 9-digit count sink (benfordFromCounts, same frame as x_benford)",
    "x_changepoint" -> "ordered cumsum + global max over the post-agg daily series (calendar-bounded; TimeSeries.changePoint)",
    "q_stream_changepoint" -> "changePoint finish over the streamed calendar-bounded daily-count sink (same frame as x_changepoint)",
    "x_acf" -> "row_number + global sums over the post-agg daily series (calendar-bounded; TimeSeries.acf)",
    "x_theil_sen" -> "row_number over the post-agg daily series (calendar-bounded; TimeSeries.theilSen)",
    "x_hybrid_search" -> "RRF rank over the union of two post-limit top-50 frames (<= 100 rows)",
    "q_stream_rolling_corr" -> "rollingCorrCounts finish over the streamed calendar-bounded daily sink (same frame as x_rolling_corr)",
    "x_ks_test" -> "CDF cumsums over <= nBins bin rows (Eval.ksTestBinned, aucBinned contract)",
    "x_conformal" -> "rank-threshold cumsum over 6-dp DISTINCT-score groups (Eval.conformal, auc bounded-domain contract)",
    "q_stream_conformal" -> "conformalFromCounts closure over the streamed <= 998-distinct-score count sink (same frame as x_conformal)",
    "x_kaplan_meier" -> "at-risk cumsum over DISTINCT day-grained durations (calendar-bounded; Behavior.kaplanMeier)",
    "x_fdr" -> "BH rank over the HYPOTHESIS frame (|metrics under test| rows, never event volume; Eval.bhFdr)",
    "x_hazard" -> "at-risk + hazard cumsums over DISTINCT day-grained durations (calendar-bounded; Behavior.nelsonAalen)",
    "x_weighted_pct" -> "cumulative weights over DISTINCT values (Validate.weightedPercentiles, quantileBins memory class)",
    "x_power" -> "abTest's 2-arm lazy guard count over the post-agg per-arm frame (|variants| rows; q_ab_test's frame)"
  )

  private val excluded = Set(
    "q_stream_windowed_counts", // executes a stream in the builder
    "q_stream_running_stats",
    "q_stream_dedup",
    "q_stream_interval_join",
    "q_stream_paged"
  )

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  /** Window plan lines with no partition spec (see class doc). */
  private def unpartitionedWindowLines(plan: String): Seq[String] =
    plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter))
      .filter(_.startsWith("Window ["))
      .filter { l =>
        var depth = 0; var groups = 0
        l.foreach { c =>
          if (c == '[') { if (depth == 0) groups += 1; depth += 1 }
          else if (c == ']') depth -= 1
        }
        groups <= 1 || (groups == 2 && {
          val tail = l.substring(l.indexOf("], ["))
          tail.contains(" ASC") || tail.contains(" DESC")
        })
      }
      .toSeq

  test("partition-less WindowExec only in allowlisted (bounded-frame) queries") {
    assume(new java.io.File(sfDir).isDirectory, s"testdata absent: $sfDir")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => excluded.contains(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (unpartitionedWindowLines(plan).nonEmpty) Some(name) else None
      }
    val unexpected = offenders.filterNot(allowlist.contains)
    assert(unexpected.isEmpty,
      "UNBOUNDED-RISK global window in: " + unexpected.mkString(", ") +
        " — bound the frame (distinct-value / binned / post-limit) or " +
        "allowlist it with a boundedness proof")
    // stale allowlist entries hide future regressions: the pin is exact
    val stale = allowlist.keySet -- offenders.toSet
    assert(stale.isEmpty,
      s"allowlisted but no longer planning a global window: ${stale.mkString(", ")}" +
        " — remove from the allowlist")
  }
}
