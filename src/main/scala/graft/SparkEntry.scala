package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}

/** Driver contract (SURVEY.md §2 operator inventory → runnable queries).
  *
  * Every query is deterministic: float aggregates accumulate exactly
  * (decimal) before a final cast to double, outputs carry a stable
  * ORDER BY, and column names match the DuckDB oracle exactly (the
  * driver sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship (smoke-checked rows>0 on sf0.001): the "agent quality
    * dashboard" shape from SURVEY.md §7.2 — date-range scan, 5-table
    * star join (fact side never broadcast), monthly conditional rollup,
    * order+limit.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q30_star_agg")(spark, "/root/testdata/sf0.001")

  /** Union of the per-family registries under registry/. Key
    * disjointness is asserted once at first access — a duplicate name
    * would silently shadow a query in a plain map concat.
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val families = Seq(
      graft.registry.CoreQueries.queries, graft.registry.AnalyticsQueries.queries,
      graft.registry.StreamingQueries.queries, graft.registry.ExtQueries.queries)
    val total = families.map(_.size).sum
    val merged = families.reduce(_ ++ _)
    require(merged.size == total, "duplicate query names across registries")
    merged
  }

  lazy val oracleSql: Map[String, String] = {
    val families = Seq(
      graft.registry.CoreQueries.oracles, graft.registry.AnalyticsQueries.oracles,
      graft.registry.StreamingQueries.oracles, graft.registry.ExtQueries.oracles)
    val total = families.map(_.size).sum
    val merged = families.reduce(_ ++ _)
    require(merged.size == total, "duplicate oracle names across registries")
    merged
  }
}
