package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for pre-training corpus curation: hashed
  * n-gram importance weighting (DSIR), per-source document caps, and
  * URL canonicalization -- the "which documents do we keep" layer that
  * sits between raw-crawl ingest and the dedup/quality stages.
  *
  * Public references:
  *  - Xie et al. 2023, "Data Selection for Language Models via
  *    Importance Resampling" (DSIR), arXiv:2302.03169 -- hashed n-gram
  *    bag features; bucket unigram models fit on a target subset vs
  *    the raw pool; per-document importance weight
  *    log p_target(doc) - log p_raw(doc).
  *  - Penedo et al. 2023, "The RefinedWeb Dataset" sec. 3 -- per-domain
  *    caps and URL canonicalization as first-class crawl-curation
  *    steps.
  */
object Selection {

  /** DSIR importance weights over hashed word-unigram features.
    *
    * Every token hashes (portable FNV-1a, the engine-wide dedup hash)
    * into one of `nBuckets` buckets; two Laplace-smoothed bucket
    * unigram models are fit -- `target` on the rows where `isTarget`
    * holds, `raw` on the whole pool -- and each document scores
    *
    *   weight = sum_tokens [ ln p_target(bucket) - ln p_raw(bucket) ]
    *
    * Positive weight => the document "looks like" the target subset.
    * Deterministic at any parallelism: per-bucket log-ratios round to
    * 9 dp before the per-doc sum, which accumulates in DECIMAL
    * (order-independent) and rounds to 6 dp -- the same discipline as
    * the unigram/bigram LM rows.
    *
    * Scale shape (100 TB): one explode->(id,bucket) map-side-combined
    * aggregation sized by the token stream; both bucket models are
    * <= `nBuckets` rows and ride into the scorer as a broadcast join;
    * the per-doc sum is one more hash aggregation on id. No windows,
    * no pair joins, nothing keyed finer than the document id.
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, nBuckets: Int = 256): DataFrame = {
    val model = fitImportanceModel(docs, textCol, idCol, isTarget, nBuckets)
    docs.select(col(idCol).as("id"), isTarget.as("is_target"))
      .join(scoreImportance(docs, textCol, idCol, model, nBuckets), Seq("id"))
      .select(col("id"), col("is_target"), col("n_tokens"), col("weight"))
  }

  /** The tokenize->hash-bucket step shared by fit and score. */
  private def tokenBuckets(docs: DataFrame, textCol: String, idCol: String,
                           nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("bucket",
        pmod(graft.functions.VectorExpressions.fnv1a64(col("term")),
          lit(nBuckets.toLong)))
      .select(col("id"), col("bucket"))

  /** Fit the DSIR bucket log-ratio model ALONE: `nBuckets` rows of
    * (bucket, lr) -- the persist-once / score-every-batch deployment
    * shape. At 100 TB the target-vs-raw fit runs ONCE on a reference
    * pool; each new crawl batch is then scored against the tiny
    * persisted model ([[scoreImportance]]) with no refit and no pool
    * rescan. The model enumerates ALL buckets (not just those the fit
    * pool observed): a batch token hashing into a fit-unseen bucket
    * scores the Laplace-default ratio instead of silently dropping.
    */
  def fitImportanceModel(docs: DataFrame, textCol: String, idCol: String,
                         isTarget: Column, nBuckets: Int = 256): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("bucket",
        pmod(graft.functions.VectorExpressions.fnv1a64(col("term")),
          lit(nBuckets.toLong)))
    val rawB = toks.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtB = toks.filter(col("tgt")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct"))
    val totals = rawB.join(tgtB, Seq("bucket"), "left")
      .agg(sum(col("cr")).as("rTot"), sum(coalesce(col("ct"), lit(0L))).as("tTot"))
    // Laplace(+1 over nBuckets) keeps target-absent buckets finite
    val allBuckets = docs.sparkSession.range(nBuckets.toLong)
      .select(col("id").as("bucket"))
    allBuckets
      .join(rawB, Seq("bucket"), "left")
      .join(tgtB, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
              (col("tTot").cast("double") + lit(nBuckets.toDouble))) -
          log((coalesce(col("cr"), lit(0L)).cast("double") + lit(1.0)) /
              (col("rTot").cast("double") + lit(nBuckets.toDouble))), 9)
          .as("lr"))
  }

  /** Score a batch against a fitted (possibly parquet-persisted)
    * model: one explode pass over the batch, a broadcast join on the
    * `nBuckets`-row model, one per-doc aggregation -- O(batch), never
    * O(pool). Every batch doc keeps a row (0 tokens / null weight for
    * empty text), like [[importanceWeights]]. `nBuckets` must match
    * the fit.
    */
  def scoreImportance(docs: DataFrame, textCol: String, idCol: String,
                      model: DataFrame, nBuckets: Int = 256): DataFrame = {
    // integerxdecimal product -- EXACT (no double intermediate), which
    // makes the sum per-token associative: sum_bucket c*lr == sum_token lr
    // in decimal, so [[scoreImportanceNarrow]] is bit-equal to this
    val perDoc = tokenBuckets(docs, textCol, idCol, nBuckets)
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_tokens"),
        round(sum(col("c").cast("decimal(10,0)") *
          col("lr").cast("decimal(18,12)")).cast("double"), 6).as("weight"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("weight"))
  }

  /** Per-ROW (narrow, stateless) scorer: the `nBuckets`-row model
    * collects to a map literal -- bounded by construction, the same
    * budget as the IVF centroid pins -- and the weight computes as ONE
    * expression over the token array: no explode, no shuffle, no
    * state. This is the Structured-Streaming deployment shape (score
    * each arriving document against the persisted model inside a
    * stateless micro-batch) and is BIT-EQUAL to [[scoreImportance]]:
    * the batch form's per-bucket c*lr products are exact decimals, so
    * summing per token in decimal reaches the identical value.
    */
  def scoreImportanceNarrow(docs: DataFrame, textCol: String, idCol: String,
                            model: DataFrame,
                            nBuckets: Int = 256): DataFrame = {
    val entries = model.collect() // <= nBuckets rows by construction
    val kv = entries.flatMap(r => Seq(lit(r.getLong(0)), lit(r.getDouble(1))))
    val m = map(kv.toIndexedSeq: _*)
    val toks = when(col(textCol).isNull, array())
      .otherwise(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0))
    // accumulator stays DECIMAL(32,12): each add yields (33,12) which
    // re-casts exactly back (|sum| << 1e20) -- keeping every step at
    // 12-dp exact, so the fold reaches the batch scorer's value
    val lrSum = aggregate(toks, lit(0).cast("decimal(32,12)"),
      (acc, t) => (acc +
        element_at(m, pmod(graft.functions.VectorExpressions.fnv1a64(t),
          lit(nBuckets.toLong))).cast("decimal(18,12)"))
        .cast("decimal(32,12)"))
    docs.select(col(idCol).as("id"),
      size(toks).cast("long").as("n_tokens"),
      when(size(toks) > 0, round(lrSum.cast("double"), 6)).as("weight"))
  }

  /** The selection step on top of [[importanceWeights]]: keep the `k`
    * documents with the highest importance weight (ties break on id).
    * This is the temperature->0 limit of DSIR's Gumbel-top-k resampling
    * -- for the stochastic variant feed `exp(weight)` to
    * [[Corpus.prioritySample]], which runs the same deterministic
    * exponential race the samplers use. Plans as
    * TakeOrderedAndProject: per-partition top-k, no global sort.
    */
  def selectByImportance(docs: DataFrame, textCol: String, idCol: String,
                         isTarget: Column, k: Int,
                         nBuckets: Int = 256): DataFrame =
    importanceWeights(docs, textCol, idCol, isTarget, nBuckets)
      .filter(col("weight").isNotNull)
      .orderBy(col("weight").desc, col("id").asc)
      .limit(k)

  /** Per-source document cap: keep at most `k` documents per `sourceCol`
    * value, preferring the highest `orderCol` (ties break on id) -- the
    * RefinedWeb-style guard against any one domain dominating the
    * corpus mix.
    *
    * Scale shape: one shuffle keyed on source for the rank window.
    * Per-source partitions at crawl scale are bounded by the crawler's
    * own per-host politeness budget; for a pathological megadomain,
    * pre-thin with [[Corpus.deterministicSample]] at fraction
    * ~= k / count(source) before ranking -- the cap's semantics compose
    * (sample-then-cap keeps exactly k with the same preference order
    * among survivors).
    */
  def capPerSource(docs: DataFrame, sourceCol: String, idCol: String,
                   orderCol: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(orderCol.desc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** URL canonicalization for crawl dedup: two URLs that render the
    * same page should compare equal. Lowercases scheme and host (path
    * case is significant and preserved), strips a leading `www.`, the
    * scheme-default port (`:80` http / `:443` https), the fragment,
    * and tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`);
    * sorts the surviving query params; drops a trailing slash on a
    * non-root path and an empty `?`. Pure codegen'd column arithmetic
    * (regex + array ops) -- runs inside whole-stage codegen, no UDF.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    // split at the first ?: authority+path vs query
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "^[^?]*\\?(.*)$", 1)
    // lowercase scheme://host[:port] only; keep the path's case
    val prefixRaw = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    val path = base.substr(length(prefixRaw) + 1, lit(1 << 24))
    val prefix = regexp_replace(
      regexp_replace(lower(prefixRaw), "^(https?://)www\\.", "$1"),
      "^(http://[^/:]+):80$|^(https://[^/:]+):443$", "$1$2")
    val cleanPath = when(path === "", path)
      .otherwise(regexp_replace(path, "(.)/$", "$1"))
    val keptParams = array_sort(filter(split(query, "&"), p =>
      !(p === "" || p.rlike("^(utm_[^=]*|fbclid|gclid|ref)(=|$)"))))
    val queryOut = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    concat(prefix, cleanPath, queryOut)
  }

  /** Lowercased host of a URL: the authority with userinfo (`user@`),
    * port, and the FQDN root dot (`example.com.`) stripped. Empty
    * string (not null) for a URL with no `scheme://` authority, so
    * downstream joins/filters see a value.
    */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_extract(lower(trim(url)),
          "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
        "^.*@|:[0-9]*$", ""),
      "\\.$", "")

  /** Tag each document with the blocklist domain it falls under, or
    * null -- the CCNet/RefinedWeb URL-blocklist curation stage (Penedo
    * et al. 2023 sec. 3.1 filter blocklists; Wenzek et al. 2019).
    * Matching is registrable-domain style: a blocked `example.com`
    * blocks the host itself AND every subdomain (`a.b.example.com`),
    * but NOT lookalikes (`notexample.com`). When a domain and its
    * parent are both listed, the LONGEST (most specific) rule names
    * the tag.
    *
    * Scale shape (100 TB): ZERO corpus shuffle. Blocklist matching is
    * row-local in spirit, so it must not repartition 100 TB of text:
    * instead of exploding suffixes and re-grouping (which would
    * shuffle the full rows), the host probes the broadcast blocklist
    * once per suffix DEPTH -- `maxDepth` chained broadcast hash joins
    * (the broadcast exchange is identical across them, so it plans as
    * one build + ReusedExchange) -- and `coalesce(deepest..shallowest)`
    * picks the longest match. A blocklist is dimension-sized (even
    * the public megalists are a few million rows -- broadcast
    * territory). Hosts with more than `maxDepth` labels still match
    * any rule of <= `maxDepth` labels (real blocklist entries are
    * registrable domains, 2-4 labels).
    */
  def markBlocklisted(docs: DataFrame, urlCol: Column,
                      blocklist: DataFrame,
                      domainCol: String = "domain",
                      maxDepth: Int = 6): DataFrame = {
    // the output columns must not shadow (or be dropped together with)
    // pre-existing input columns of the same name -- fail loudly at
    // plan time rather than silently corrupting the caller's schema
    val collisions = docs.columns.toSet.intersect(Set("host", "blocked_by"))
    require(collisions.isEmpty,
      s"markBlocklisted: input already has column(s) ${collisions.mkString(", ")} " +
        "-- rename them (or drop them) before tagging")
    markInternal(docs, urlCol, blocklist, domainCol, maxDepth)
      .withColumnRenamed("__host", "host")
      .withColumnRenamed("__blocked_by", "blocked_by")
  }

  /** Shared core: tags with reserved `__host` / `__blocked_by` names so
    * [[filterByBlocklist]] never collides with caller columns.
    */
  private def markInternal(docs: DataFrame, urlCol: Column,
                           blocklist: DataFrame, domainCol: String,
                           maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"markBlocklisted: maxDepth must be >= 1, got $maxDepth")
    // a blank / whitespace-only blocklist entry would normalize to ""
    // (one empty label, depth 1) and match every authority-less
    // document whose host is "" -- drop such entries outright
    val block = blocklist
      .select(lower(trim(col(domainCol))).as("__blocked"))
      .filter(length(col("__blocked")) > 0)
      .distinct()
    val tagged = docs.withColumn("__host", urlHost(urlCol))
      .withColumn("__labels", split(col("__host"), "\\."))
    // deepest (longest) suffix first, so the first coalesce hit is the
    // most specific listed rule. Each depth's build side holds ONLY
    // the rules with exactly d labels (a d-label rule can only equal
    // the depth-d suffix), so total broadcast volume across the chain
    // is ONE copy of the blocklist, not maxDepth copies. An empty host
    // (authority-less URL) never joins: its key is null at every depth.
    val joined = (maxDepth to 1 by -1).foldLeft(tagged) { (acc, d) =>
      val key = when(size(col("__labels")) >= d && length(col("__host")) > 0,
        array_join(slice(col("__labels"),
          size(col("__labels")) - d + 1, lit(d)), "."))
      val b = broadcast(
        block.filter(size(split(col("__blocked"), "\\.")) === d)
          .withColumnRenamed("__blocked", s"__b$d"))
      acc.join(b, key === b(s"__b$d"), "left")
    }
    joined
      .withColumn("__blocked_by",
        coalesce((maxDepth to 1 by -1).map(d => col(s"__b$d")): _*))
      .drop((1 to maxDepth).map(d => s"__b$d"): _*)
      .drop("__labels")
  }

  /** The filter form of [[markBlocklisted]]: documents whose host does
    * NOT fall under any blocklist domain. Output schema == input schema
    * (the tag columns are internal, so a caller's own `host` column
    * survives untouched). Same zero-shuffle plan (the left joins become
    * the anti side of a filter).
    */
  def filterByBlocklist(docs: DataFrame, urlCol: Column,
                        blocklist: DataFrame,
                        domainCol: String = "domain",
                        maxDepth: Int = 6): DataFrame =
    markInternal(docs, urlCol, blocklist, domainCol, maxDepth)
      .filter(col("__blocked_by").isNull)
      .drop("__host", "__blocked_by")

  /** URL-level dedup -- the CCNet/RefinedWeb step that runs BEFORE any
    * content dedup: two fetches of the same page (tracking params,
    * http/https, trailing slash) collapse to one document, keyed on
    * [[canonicalizeUrl]]. Keeps the highest-`prefer` row per canonical
    * URL (ties break on id) -- e.g. the longest fetch, or the newest.
    * One rank window keyed on the canonical URL: same shuffle shape as
    * [[capPerSource]], with near-unique keys (skew impossible unless
    * one URL dominates the crawl, which the crawler's own politeness
    * prevents).
    */
  def dedupByCanonicalUrl(docs: DataFrame, urlCol: Column, idCol: String,
                          prefer: Column): DataFrame = {
    // a null URL canonicalizes to null -- those rows must each survive
    // (no URL != same URL), so null-canon docs key on their own id
    // instead of collapsing into one all-null group
    val key = coalesce(canonicalizeUrl(urlCol),
      concat(lit("\u0000noUrl:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key)
      .orderBy(prefer.desc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
