package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.registry.Fixtures

/** Pin `Fixtures.events`'s timestamp normalization across every storage
  * flavor the testdata has shipped with. The driver regenerates the
  * parquet between rounds and has already switched physical types once
  * — TIMESTAMP(NANOS) (reads as long under the nanosAsLong conf)
  * through round 7, TIMESTAMP(MICROS) without the UTC flag (reads as
  * TIMESTAMP_NTZ) from round 8 — and the NTZ switch silently broke all
  * six `unix_micros(ts_us)`-based time-series queries. Whatever the
  * file carries, `ts_us` must come out as a session-local TIMESTAMP on
  * the same instant.
  */
class EventsTsSpec extends SparkSpec {

  private val micros = Seq(0L, 1717171717171717L, 4102444800000000L)

  private def writeAndLoad(dir: String, writeSql: String): Seq[Long] = {
    import spark.implicits._
    micros.toDF("us").selectExpr(s"$writeSql as ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Fixtures.events(spark, dir)
    assert(out.schema("ts_us").dataType == TimestampType,
      s"ts_us must normalize to TIMESTAMP, got ${out.schema("ts_us").dataType}")
    out.select(unix_micros(col("ts_us"))).as[Long].collect().toSeq.sorted
  }

  test("events() normalizes ns-as-long, NTZ-micros, and LTZ-micros to the same instants") {
    val base = Fixtures.scratchDir("graft-events-ts")

    // TIMESTAMP_NTZ storage (current driver testdata shape)
    val ntz = writeAndLoad(s"$base/ntz",
      "cast(timestamp_micros(us) as timestamp_ntz)")
    // TIMESTAMP (UTC-adjusted) storage (ScaleUp-written copies)
    val ltz = writeAndLoad(s"$base/ltz", "timestamp_micros(us)")

    assert(ntz == micros.sorted, s"NTZ path returned $ntz")
    assert(ltz == micros.sorted, s"LTZ path returned $ltz")

    // ns-as-long storage (round ≤7 driver shape): parquet INT64 raw —
    // Fixtures.events divides by 1000, so pre-scale to nanos
    import spark.implicits._
    micros.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$base/ns/events.parquet")
    val ns = Fixtures.events(spark, s"$base/ns")
    assert(ns.schema("ts_us").dataType == TimestampType)
    val nsOut = ns.select(unix_micros(col("ts_us"))).as[Long].collect().toSeq.sorted
    assert(nsOut == micros.sorted, s"ns-long path returned $nsOut")
  }

  test("real testdata events still feed unix_micros (the r8 breakage shape)") {
    // driver-box pin only: skip on machines without the harness testdata
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists())
    val df = Fixtures.events(spark, "/root/testdata/sf0.001")
    // the exact expression the six time-series queries start from
    val n = df.select(expr("unix_micros(ts_us) div 1000000").as("es"))
      .filter(col("es") > 0).count()
    assert(n > 0)
  }
}
