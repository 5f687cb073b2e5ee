package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.registry.ExpectedSchemas

/** Pins the schema-manifest gate: the r8 testdata regeneration rotated
  * events.ts's physical type and silently broke six queries; Verify now
  * compares what it reads against ExpectedSchemas and reports drift.
  * These tests exercise the comparison itself — including the exact
  * r8 rotation shape — without needing a Spark session.
  */
class ExpectedSchemasSpec extends AnyFunSuite {

  private val currentDriverShapes = Map(
    "customer" -> "struct<c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string>",
    "documents" -> "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>",
    "events" -> "struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,event_type:string,value:double,props:string>",
    "lineitem" -> "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>",
    "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "orders" -> "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>",
    "part" -> "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double>",
    "region" -> "struct<r_regionkey:int,r_name:string>",
    "supplier" -> "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
  )

  test("the current driver-generation manifest is drift-free") {
    assert(ExpectedSchemas.drift(currentDriverShapes) === Seq.empty)
  }

  test("known legitimate flavors are accepted: LTZ copies and r7 nanos-as-long events") {
    val scaleUpCopy = currentDriverShapes.map { case (k, v) =>
      k -> v.replace("timestamp_ntz", "timestamp")
    }
    assert(ExpectedSchemas.drift(scaleUpCopy) === Seq.empty)
    val r7Events = currentDriverShapes.updated("events",
      "struct<event_id:bigint,ts:bigint,user_id:bigint,event_type:string,value:double,props:string>")
    assert(ExpectedSchemas.drift(r7Events) === Seq.empty)
  }

  test("a NEW type rotation is reported as drift (the r8 failure class)") {
    // e.g. the driver switching events.ts to DATE, or value to decimal
    val rotated = currentDriverShapes.updated("events",
      "struct<event_id:bigint,ts:date,user_id:bigint,event_type:string,value:double,props:string>")
    val d = ExpectedSchemas.drift(rotated)
    assert(d.map(_._1) === Seq("events"))
    assert(d.head._2.contains("ts:date"))
    assert(d.head._3.nonEmpty, "accepted variants listed for triage")
  }

  test("a missing pinned table and an unknown new table both surface") {
    val noEvents = currentDriverShapes - "events"
    assert(ExpectedSchemas.drift(noEvents) ===
      Seq(("events", "MISSING", ExpectedSchemas.tables("events"))))
    val extra = currentDriverShapes + ("transcripts" -> "struct<id:bigint>")
    assert(ExpectedSchemas.drift(extra) ===
      Seq(("transcripts", "struct<id:bigint>", Set.empty[String])))
  }
}
