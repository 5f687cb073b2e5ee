package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ext.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel enforces strict ordering: pre-step events do not count") {
    val events = Seq(
      // u1 completes the full ordered funnel
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2 purchases BEFORE clicking — purchase must not count
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:30:00")),
      (2L, "click", ts("2024-01-01 11:00:00")),
      // u3 only views
      (3L, "view", ts("2024-01-01 10:00:00")),
      // u4 clicks without viewing — never enters the funnel
      (4L, "click", ts("2024-01-01 10:00:00")),
      // noise
      (1L, "error", ts("2024-01-01 10:30:00"))
    ).toDF("user_id", "event_type", "ts")
    val steps = Seq("view", "click", "purchase")
    val users = Behavior.funnelUsers(events, "user_id", "ts", "event_type", steps)
    val got = users.orderBy("user_id")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(got(0)._4.contains(ts("2024-01-01 12:00:00")))
    assert(got(1)._3.contains(ts("2024-01-01 11:00:00")) && got(1)._4.isEmpty)
    assert(got(2)._3.isEmpty && got(2)._4.isEmpty)

    val counts = Behavior.funnelCounts(users, steps)
      .select("step", "users", "conversion").as[(String, Long, Double)].collect()
    assert(counts.toSeq === Seq(
      ("view", 3L, 1.0), ("click", 2L, 0.666667), ("purchase", 1L, 0.333333)))
  }

  test("funnel counts a same-user repeat correctly: earliest qualifying event wins") {
    val events = Seq(
      (1L, "view", ts("2024-01-02 10:00:00")),
      (1L, "view", ts("2024-01-01 10:00:00")), // earlier view → t0
      (1L, "click", ts("2024-01-01 12:00:00")),
      (1L, "click", ts("2024-01-03 12:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val u = Behavior.funnelUsers(events, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .as[(Long, Timestamp, Option[Timestamp])].collect()
    assert(u.toSeq === Seq((1L, ts("2024-01-01 10:00:00"),
      Some(ts("2024-01-01 12:00:00")))))
  }

  test("retention cohorts by first day and counts active cells") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 17:00:00")), // same day: 1 cell
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-02 09:00:00")),
      (3L, ts("2024-01-02 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Behavior.retention(events, "user_id", "ts", maxOffsetDays = 30)
      .as[(java.sql.Date, Int, Long)].collect().toSeq
    val d = (s: String) => java.sql.Date.valueOf(s)
    assert(got === Seq(
      (d("2024-01-01"), 0, 2L), // u1, u2 on their cohort day
      (d("2024-01-01"), 1, 1L), // u2 back next day
      (d("2024-01-01"), 2, 1L), // u1 back on day 2
      (d("2024-01-02"), 0, 1L))) // u3's cohort
  }

  test("retention horizon drops cells beyond maxOffsetDays") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-03-01 09:00:00")) // offset 60 — beyond the horizon
    ).toDF("user_id", "ts")
    val got = Behavior.retention(events, "user_id", "ts", maxOffsetDays = 30)
    assert(got.count() === 1)
  }
}
