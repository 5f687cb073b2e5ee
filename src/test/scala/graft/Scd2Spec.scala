package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("merge: new key, unchanged no-op, changed close+reopen, closed history passthrough") {
    val current = Seq(
      // k=1 open, will change
      (1L, "bronze", ts("2020-01-01 00:00:00"), Option.empty[Timestamp]),
      // k=1 old closed version — must pass through untouched
      (1L, "trial", ts("2019-01-01 00:00:00"), Some(ts("2020-01-01 00:00:00"))),
      // k=2 open, update arrives with identical value
      (2L, "gold", ts("2020-01-01 00:00:00"), Option.empty[Timestamp]),
      // k=3 open, no update at all
      (3L, "silver", ts("2020-01-01 00:00:00"), Option.empty[Timestamp])
    ).toDF("id", "tier", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "platinum", ts("2021-06-01 00:00:00")),
      (2L, "gold", ts("2021-06-01 00:00:00")),
      (4L, "bronze", ts("2021-06-01 00:00:00")) // unknown key
    ).toDF("id", "tier", "eff")

    val out = Scd2.merge(current, updates, Seq("id"), Seq("tier"), "eff")
    val got = out.orderBy("id", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(got === Seq(
      (1L, "trial", ts("2019-01-01 00:00:00"), Some(ts("2020-01-01 00:00:00"))),
      (1L, "bronze", ts("2020-01-01 00:00:00"), Some(ts("2021-06-01 00:00:00"))),
      (1L, "platinum", ts("2021-06-01 00:00:00"), None),
      (2L, "gold", ts("2020-01-01 00:00:00"), None),
      (3L, "silver", ts("2020-01-01 00:00:00"), None),
      (4L, "bronze", ts("2021-06-01 00:00:00"), None)))

    // exactly one open version per key afterwards
    val opens = out.filter(col("valid_to").isNull).groupBy("id").count()
    assert(opens.filter(col("count") =!= 1).isEmpty)
    // idempotence: replaying the same batch changes nothing
    val replay = Scd2.merge(out, updates, Seq("id"), Seq("tier"), "eff")
    assert(replay.count() === out.count())
    assert(replay.exceptAll(out).isEmpty)
  }

  test("merge: null tracked values compare null-safely") {
    val current = Seq((1L, Option.empty[String], ts("2020-01-01 00:00:00"), Option.empty[Timestamp]))
      .toDF("id", "tier", "valid_from", "valid_to")
    val sameNull = Seq((1L, Option.empty[String], ts("2021-01-01 00:00:00"))).toDF("id", "tier", "eff")
    assert(Scd2.merge(current, sameNull, Seq("id"), Seq("tier"), "eff").count() === 1)
    val nowSet = Seq((1L, Option("gold"), ts("2021-01-01 00:00:00"))).toDF("id", "tier", "eff")
    val out = Scd2.merge(current, nowSet, Seq("id"), Seq("tier"), "eff")
    assert(out.count() === 2) // closed null-version + open gold
  }

  test("fromChangelog collapses unchanged runs and chains intervals") {
    val log = Seq(
      (1L, 10L, "a", 1L), (2L, 10L, "a", 2L), // duplicate state — collapses
      (3L, 10L, "b", 3L), (4L, 10L, "a", 4L), // a→b→a: THREE intervals (not dedup)
      (5L, 20L, "x", 5L)
    ).map { case (eid, uid, st, t) => (eid, uid, st, ts(s"2020-01-0$t 00:00:00")) }
      .toDF("event_id", "user_id", "state", "ts")
    val got = Scd2.fromChangelog(log, Seq("user_id"), Seq("state"), "ts", "event_id")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(got === Seq(
      (10L, "a", ts("2020-01-01 00:00:00"), Some(ts("2020-01-03 00:00:00"))),
      (10L, "b", ts("2020-01-03 00:00:00"), Some(ts("2020-01-04 00:00:00"))),
      (10L, "a", ts("2020-01-04 00:00:00"), None),
      (20L, "x", ts("2020-01-05 00:00:00"), None)))
  }

  test("fromChangelog intervals partition time: merge of history equals latest state") {
    // reconstructed open versions must match a plain last-state query
    val log = (1 to 60).map { i =>
      (i.toLong, (i % 5).toLong, s"s${i % 3}", ts(f"2020-01-${i % 28 + 1}%02d 00:00:00"))
    }.toDF("event_id", "user_id", "state", "ts")
    val hist = Scd2.fromChangelog(log, Seq("user_id"), Seq("state"), "ts", "event_id")
    val open = hist.filter(col("valid_to").isNull)
      .select("user_id", "state")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val latest = log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "state")
    assert(open.exceptAll(latest).isEmpty && latest.exceptAll(open).isEmpty)
    // intervals must not overlap: each valid_to equals the next valid_from
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val bad = hist.withColumn("next_from", lead("valid_from", 1).over(w2))
      .filter(col("next_from").isNotNull && !(col("valid_to") === col("next_from")))
    assert(bad.isEmpty)
  }
}
