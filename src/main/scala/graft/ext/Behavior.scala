package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream: ordered funnels
  * and cohort retention — the dashboard staples of any event warehouse
  * (the reference's `events`-style tables feed exactly these).
  *
  * Scale shape: both are groupBy-on-user pipelines. The funnel's k
  * steps chain k aggregations ON THE SAME KEY — after the first
  * shuffle the frame stays hash-partitioned by user, so Catalyst
  * reuses the exchange instead of re-shuffling per step; retention is
  * one user-keyed aggregation plus one (cohort, offset) aggregation.
  * Everything is min/count aggregation on timestamps — exact,
  * order-independent, replayable by the oracle.
  */
object Behavior {

  /** Strictly-ordered funnel: per user, `t0` = earliest `steps(0)`
    * event, `t_i` = earliest `steps(i)` event strictly after
    * `t_{i-1}`. Returns one row per user who entered the funnel with
    * nullable per-step completion timestamps `t0..t{k-1}` — feed to
    * [[funnelCounts]] for the dashboard view. Strict ordering means a
    * purchase before the first click does NOT count as funnel
    * progress (the distinguishing semantics vs a per-type min).
    */
  def funnelUsers(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t0"))
    for (i <- 1 until steps.length) {
      val e = events.filter(col(typeCol) === steps(i))
        .select(col(userCol), col(tsCol).as("__ts"))
      val carried = (0 until i).map(j => col(s"t$j"))
      cur = cur.join(e, Seq(userCol), "left")
        .groupBy((col(userCol) +: carried).toIndexedSeq: _*)
        .agg(min(when(col("__ts") > col(s"t${i - 1}"), col("__ts"))).as(s"t$i"))
    }
    cur
  }

  /** Funnel dashboard: per step, users reaching it and conversion from
    * the funnel's entry step.
    */
  def funnelCounts(users: DataFrame, steps: Seq[String]): DataFrame = {
    val agg = users.agg(
      count(col("t0")).as("c0"),
      (1 until steps.length).map(i => count(col(s"t$i")).as(s"c$i")).toIndexedSeq: _*)
    val stackExpr = steps.indices
      .map(i => s"'${steps(i)}', $i, c$i").mkString(", ")
    agg.selectExpr(s"stack(${steps.length}, $stackExpr) as (step, step_idx, users)")
      .withColumn("conversion",
        round(col("users").cast("double") /
          first(col("users")).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("step_idx"))), 6))
      .orderBy("step_idx")
  }

  /** Cohort retention: users cohort by their FIRST-ever active day;
    * cell (cohort_day, day_offset) counts the cohort's users active
    * `day_offset` days later. The curve every growth dashboard plots.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                maxOffsetDays: Int = 30): DataFrame = {
    val days = events.select(col(userCol).as("u"),
      to_date(col(tsCol)).as("day")).distinct()
    val cohorts = days.groupBy(col("u")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("u"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy("cohort_day", "day_offset")
  }
}
