package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment joins + default-row injection (SURVEY.md §2.4, Q28–Q30, Q15).
  *
  * The reference does dimension enrichment with in-memory `{id: name}`
  * dict lookups (`ET-ETL-DWH-PY312/ETL/Transform.py:30-37`) — the Spark
  * shape is a broadcast hash join: dimensions are small ("Base
  * Dictionaries - stable, rarely changed", DOCS/README.MD:10), facts are
  * the 100-TB side, so the dim side must never shuffle the fact table.
  */
object Enrich {

  /** Broadcast-join a small dimension onto a fact table.
    * `how="inner"` mirrors the reference's KeyError-on-miss dict lookup;
    * pass "left" to keep unmatched facts (per-row detail merge, Q29).
    */
  def dimJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      how: String = "inner",
      select: Seq[(String, String)] = Seq.empty
  ): DataFrame = {
    val dimPruned =
      if (select.isEmpty) dim
      else dim.select((dimKey +: select.map(_._1)).distinct.map(col).toIndexedSeq: _*)
    val renamed = select.foldLeft(dimPruned) { case (d, (src, tgt)) =>
      d.withColumnRenamed(src, tgt)
    }
    fact.join(broadcast(renamed), fact(factKey) === renamed(dimKey), how)
      .drop(renamed(dimKey))
  }

  /** Rows of `fact` whose key has a match in `dim` — the reference's
    * detail-fetch guard (`Extract.py:87-94`): a left-semi join, so no
    * columns from `dim` are carried and the fact side never duplicates.
    */
  def semiGuard(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left_semi")

  /** Bloom-filter pre-filter for a selective join: build a Bloom filter
    * over `dim`'s keys (one tiny aggregate), broadcast it as a scalar,
    * and drop fact rows whose key can't possibly match BEFORE the fact
    * side shuffles. False positives pass through (the exact join after
    * removes them); false negatives are impossible — semantics are
    * unchanged, only the shuffled volume shrinks.
    *
    * This is Spark's own runtime-filter machinery
    * (`BloomFilterAggregate` / `BloomFilterMightContain`, the
    * spark.sql.optimizer.runtime.bloomFilter expressions) made an
    * explicit, composable operator: the optimizer only injects it
    * under shuffle-join patterns it recognizes; here any upstream
    * (pre-aggregation inputs, custom operators, multi-use facts) can
    * prune eagerly.
    */
  def bloomPrune(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val bloomAgg = GraftBridge.column(
      new BloomFilterAggregate(
        XxHash64(Seq(GraftBridge.expression(dim(dimKey))), 42L), expectedItems)
        .toAggregateExpression())
    // might_contain requires the filter as a scalar subquery (or
    // constant): the one-row aggregate plan rides along and executes
    // once, its result broadcast into the codegen'd filter
    val bfSub = ScalarSubquery(GraftBridge.analyzed(dim.agg(bloomAgg.as("__bf"))))
    fact.filter(GraftBridge.column(BloomFilterMightContain(
      bfSub,
      XxHash64(Seq(GraftBridge.expression(fact(factKey))), 42L))))
  }

  /** Rows of `fact` with NO match in `dim` (anti-join) — the existence
    * check half of upsert (Load.py:139-147).
    */
  def antiGuard(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left_anti")

  /** Skew-safe large-to-medium join: salt the skewed (left) side's key
    * with `saltBuckets` random-ish suffixes derived from a row hash, and
    * explode the right side across all buckets, so one hot key spreads
    * over `saltBuckets` reducers instead of one straggler task. Use when
    * the right side is too big to broadcast but the left key is skewed;
    * AQE's skew-join handles the sort-merge case, this handles hash
    * joins and pre-AQE plans deterministically.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltBuckets: Int, how: String = "inner"): DataFrame = {
    // the right side is replicated saltBuckets times, so join types
    // that emit unmatched RIGHT rows would emit them once per bucket
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross").contains(how.toLowerCase),
      s"saltedJoin: '$how' would duplicate unmatched right rows across salt buckets")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets)))
    val expanded = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(expanded,
        salted(leftKey) === expanded(rightKey) && salted("__salt") === expanded("__salt"),
        how)
      .drop("__salt")
  }

  /** Skew join that salts ONLY the hot keys: the fact splits on
    * membership in `hotKeys` (from [[Validate.skewProfile]]); the hot
    * slice runs through [[saltedJoin]] — replicating only the hot
    * keys' dim rows, `saltBuckets` copies of a HANDFUL of rows instead
    * of the whole dim — and the cold slice joins plain. Soak-measured:
    * full-dim salting loses to a plain SMJ on one box (the 32×
    * replication of a 2M-row dim costs more than the skew), while the
    * hot-only form pays ~nothing for the cold 99.99% of keys and still
    * splits the hot partition 32 ways. Same join-type restriction as
    * saltedJoin (no right/full joins — unmatched right rows would
    * duplicate per bucket).
    */
  def skewJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               hotKeys: Seq[Any], saltBuckets: Int,
               how: String = "inner"): DataFrame = {
    require(hotKeys.nonEmpty, "skewJoin: pass the hot keys (from skewProfile)")
    val hotL = coalesce(col(leftKey).isin(hotKeys: _*), lit(false))
    val hotR = coalesce(col(rightKey).isin(hotKeys: _*), lit(false))
    val hot = saltedJoin(left.where(hotL), right.where(hotR),
      leftKey, rightKey, saltBuckets, how)
    val cold = left.where(!hotL).join(right.where(!hotR),
      left(leftKey) === right(rightKey), how)
    hot.unionByName(cold)
  }

  /** Default-row injection: append `defaults` rows whose key is absent
    * from `df` — the synthetic "Ender Turing" user id=0
    * (Transform.py:20-27,117-127). Scale shape: semi-join the TABLE
    * against broadcast(defaults) — a handful of rows — to learn which
    * default keys already exist, then anti-join defaults against that
    * tiny set. The naive `defaults ANTI df` can't broadcast its tiny
    * side (anti builds on the right), so it would shuffle the full
    * table.
    */
  def withDefaultRows(df: DataFrame, defaults: DataFrame, key: String): DataFrame = {
    val present = df.select(key)
      .join(broadcast(defaults.select(key)), Seq(key), "left_semi").distinct()
    val missing = defaults.join(broadcast(present), Seq(key), "left_anti")
    df.unionByName(missing, allowMissingColumns = true)
  }
}
