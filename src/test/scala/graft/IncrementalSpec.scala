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

  test("maintainRollup: merge of split aggregates equals the full recompute, any split") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val raw = Seq.tabulate(500)(i =>
      (i.toLong, s"k${rnd.nextInt(7)}", rnd.nextInt(100).toLong)).toDF("id", "k", "v")
    def agg1(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("v_sum"))
    val full = agg1(raw).orderBy("k").collect()
    for (mod <- Seq(2, 3, 10)) {
      val store = agg1(raw.filter(col("id") % mod === 0))
      val batch = agg1(raw.filter(col("id") % mod =!= 0))
      val merged = Incremental.maintainRollup(store, batch, Seq("k"), Seq("n", "v_sum"))
      assert(merged.orderBy("k").collect() === full, s"split mod=$mod")
      // closed under its own maintenance: data types unchanged (sum()
      // marks results nullable where count() didn't — benign, and
      // erased anyway by the parquet round-trip a real store does)
      assert(merged.schema.map(f => (f.name, f.dataType)) ===
        store.schema.map(f => (f.name, f.dataType)), "rollup schema drifted after merge")
    }
    // keys present only in one side still appear
    val store = agg1(raw.filter(col("k") === "k1"))
    val batch = agg1(raw.filter(col("k") =!= "k1"))
    assert(Incremental.maintainRollup(store, batch, Seq("k"), Seq("n", "v_sum"))
      .orderBy("k").collect() === full)
  }
}
