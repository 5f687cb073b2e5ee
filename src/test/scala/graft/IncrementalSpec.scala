package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.sync.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1, 10, Timestamp.valueOf("2024-06-01 08:00:00")),
    (2, 10, Timestamp.valueOf("2024-06-01 14:30:00")),
    (3, 20, Timestamp.valueOf("2024-06-02 09:15:00")),
    (4, 30, Timestamp.valueOf("2024-06-02 23:59:59"))
  ).toDF("id", "dim_id", "ts")

  test("newerThan filters strictly after the watermark") {
    val out = Incremental.newerThan(facts, "ts", LocalDateTime.of(2024, 6, 1, 14, 30, 0))
    assert(out.select("id").as[Int].collect().sorted === Array(3, 4))
  }

  test("halfDayFilter selects exactly one half-day window") {
    val am = facts.filter(Incremental.halfDayFilter(col("ts"), "2024-06-01", firstHalf = true))
    val pm = facts.filter(Incremental.halfDayFilter(col("ts"), "2024-06-01", firstHalf = false))
    assert(am.select("id").as[Int].collect() === Array(1))
    assert(pm.select("id").as[Int].collect() === Array(2))
  }

  test("factsOfChangedDims re-selects only facts of dims updated after watermark") {
    val dims = Seq(
      (10, Timestamp.valueOf("2024-05-01 00:00:00")),
      (20, Timestamp.valueOf("2024-06-05 00:00:00")),
      (30, Timestamp.valueOf("2024-06-06 00:00:00"))
    ).toDF("id", "updated_at")
    val out = Incremental.factsOfChangedDims(facts, dims, "dim_id", "id",
      "updated_at", LocalDateTime.of(2024, 6, 1, 0, 0, 0))
    assert(out.select("id").as[Int].collect().sorted === Array(3, 4))
  }
}
