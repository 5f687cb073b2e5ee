package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation operators for training-data pipelines: benchmark
  * decontamination and reproducible stratified sampling.
  *
  * Scale notes: decontamination is an inverted-index anti-join —
  * benchmark shingles are usually small enough to broadcast, so the
  * corpus never shuffles; sampling is a narrow filter on a
  * deterministic per-row hash (reproducible across runs/partitions,
  * unlike `rand()`-based sampling).
  */
object Corpus {

  /** Docs whose text shares NO word n-gram with the benchmark set — the
    * standard n-gram decontamination filter (13-grams in GPT-3's
    * methodology; n is a parameter). Returns the clean corpus.
    */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    // n-grams live as 64-bit FNV hashes (single-pass ShingleFnv
    // kernel): the broadcast side is 8 bytes per distinct benchmark
    // n-gram instead of the n-gram text, and the corpus side never
    // materializes a shingle string at all
    val benchShingles = benchmark
      .select(explode(TextOps.shingleHashes(col(textCol), n)).as("sh"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol).as("__cid"),
        explode(TextOps.shingleHashes(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left_semi")
      .select(col("__cid")).distinct()
    corpus.join(contaminated, corpus(idCol) === contaminated("__cid"), "left_anti")
  }

  /** SEMANTIC decontamination: corpus rows whose embedding is too
    * close (cosine ≥ threshold) to ANY benchmark embedding — catches
    * paraphrased contamination the n-gram check can't see. Returns the
    * flagged rows with their max benchmark similarity (round 6 for
    * replayable output).
    *
    * Scale shape: benchmark embeddings broadcast (benchmarks are small
    * by construction), corpus sweeps once through the codegen'd
    * dot-product kernel, map-side partial max reduces to one row per
    * corpus id before the single shuffle. For benchmark sets too big
    * to broadcast, pre-bucket both sides with `Similarity.assignCells`
    * and sweep per cell (the x_embed_neardup_bucketed treatment).
    */
  def decontaminateSemantic(
      corpus: DataFrame, benchmark: DataFrame,
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorExpressions.cosineF
    val b = benchmark.select(col(vecCol).as("__bv"))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(b))
      .groupBy(col(idCol))
      .agg(max(cosineF(col(vecCol), col("__bv"))).as("__mc"))
      .filter(col("__mc") >= threshold)
      .select(col(idCol), round(col("__mc"), 6).as("max_benchmark_cos"))
      .orderBy(col(idCol))
  }

  /** The complement: docs flagged as contaminated, with the overlap
    * count (for audit reports).
    */
  def contaminationReport(
      corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.shingleHashes(col(textCol), n)).as("sh"))
      .distinct()
    corpus
      .select(col(idCol).as("id"),
        explode(TextOps.shingleHashes(col(textCol), n)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlapping_ngrams"))
  }

  /** Deterministic Bernoulli sample: keep a row iff
    * hash(key, seed) mod 10^6 < fraction·10^6. Reproducible across
    * runs, partitionings, and engines (unlike rand()); the per-stratum
    * variant takes a fraction per stratum value.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Long = 42L): DataFrame =
    df.filter(sampleHash(col(keyCol), seed) < (fraction * 1000000).toLong)

  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(sampleHash(col(keyCol), seed) < (frac * 1000000.0).cast("long"))
  }

  /** Deterministic train/val/test split assignment: each row's portable
    * FNV bucket (millionths of the unit interval) lands in the
    * cumulative-fraction band of its split. Membership is a pure
    * function of (id, seed) — reproducible across runs, partitionings,
    * and engines (the oracle replays it), and STABLE UNDER CORPUS
    * GROWTH: adding documents never moves an existing document's split,
    * the property that keeps eval sets honest as the corpus is
    * re-crawled. Fractions must sum to 1 (±1e-9); bands are half-open
    * on millionth boundaries, so realized fractions are exact to 1e-6.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)] = Seq(
                    "train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                  seed: Long = 13L, splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplit: need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"assignSplit: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val b = sampleHash(col(idCol), seed)
    val thresholds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 1000000L)
    }.tail
    val bands = splits.map(_._1).zip(thresholds)
    val label = bands.init.foldRight(lit(bands.last._1): org.apache.spark.sql.Column) {
      case ((name, t), acc) => when(b < t, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** Split-leakage audit (the GroupShuffleSplit contract — sklearn
    * model_selection; Kapoor & Narayanan 2023, "Leakage and the
    * reproducibility crisis in ML", Patterns 4(9), leak type L3):
    * rows of one GROUP (site, user, session) must all land in the
    * SAME split, or near-duplicates inside the group straddle
    * train/test and inflate eval. Audits ANY split assignment,
    * however produced: one row per split with (split, n_rows,
    * n_groups) plus the GLOBAL leaked_groups — the count of groups
    * observed in more than one split — repeated per row; 0 means the
    * assignment is group-clean. [[assignSplit]] keyed on the group
    * column is group-clean BY CONSTRUCTION (membership is a pure
    * function of the group value — a narrow per-row map, no group
    * list collected, no join, unlike sklearn's materialized group
    * index); this audit is the independent check, and catches the
    * assignments that aren't (doc-keyed splits over grouped data).
    *
    * Scale shape: two group-keyed hash aggregates (map-side partial)
    * + a 1-row broadcast — no windows, no pair joins.
    */
  def splitAudit(df: DataFrame, groupCol: String,
                 splitCol: String): DataFrame = {
    val leaked = df.groupBy(col(groupCol).as("__grp"))
      .agg(countDistinct(col(splitCol)).as("__nsplit"))
      .agg(coalesce(sum(when(col("__nsplit") > 1, 1L).otherwise(0L)),
        lit(0L)).as("leaked_groups"))
    df.groupBy(col(splitCol).as("split"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(groupCol)).as("n_groups"))
      .crossJoin(broadcast(leaked))
      .orderBy(col("split"))
  }

  /** Weighted priority sample (Duffield–Lund–Thorup "priority
    * sampling", IEEE Trans. IT 2007): each row draws a uniform
    * u ∈ (0,1] from the portable FNV bucket ((bucket+1)/10⁶) and gets
    * priority w/u; the k largest priorities are kept. Inclusion
    * probability ≈ min(1, w/τ) — proportional to weight — with unbiased
    * Horvitz–Thompson totals, unlike a plain top-k-by-weight.
    *
    * Deterministic & portable BY CONSTRUCTION: u is integer-derived and
    * w/u is a single IEEE division (correctly rounded), so the priority
    * is bit-identical on any run, partitioning, or engine — no ln/pow
    * whose libm rounding could differ between JVM and C (the reason
    * this is priority sampling and not A-Res, whose key u^(1/w) needs
    * pow). Plans as TakeOrderedAndProject — per-partition top-k, no
    * global sort shuffle.
    */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, k: Int,
                     seed: Long = 42L): DataFrame = {
    val u = (sampleHash(col(idCol), seed) + lit(1L)).cast("double") / lit(1000000.0)
    df.withColumn("__pri", weight.cast("double") / u)
      .orderBy(col("__pri").desc, col(idCol).asc)
      .limit(k)
      .drop("__pri")
  }

  /** Token-budget mixture sampling: per stratum (language/domain/
    * source), keep documents — in deterministic hash order — until the
    * stratum's TOKEN budget is exhausted (a doc is kept iff the
    * cumulative token count through it stays ≤ budget). This is the
    * mixture-weighting step of training-corpus assembly ("30k tokens of
    * en, 10k of de"), exact where [[stratifiedSample]]'s fractions are
    * only proportional. Strata absent from `budgets` are dropped.
    *
    * Deterministic & portable: the order is (FNV(id:seed), id) — same
    * sample on any run/partitioning/engine. Scale note: the cumulative
    * sum runs one window per stratum, i.e. one reducer per stratum —
    * fine for the handful of mixture strata this exists for; for
    * budget-per-KEY at high cardinality use [[deterministicSample]]
    * with fraction ≈ budget/total instead.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, strataCol: String,
                        tokenCol: Column, budgets: Map[String, Long],
                        seed: Long = 42L): DataFrame = {
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, b)) =>
      when(col(strataCol) === k, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(orderHash(col(idCol), seed).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // budget > 0 guard: without it a ZERO-token doc in an unlisted
    // stratum slips through (cum = 0 <= budget = 0) — unlisted strata
    // must drop entirely, as documented
    df.withColumn("__cum", sum(tokenCol.cast("long")).over(w))
      .filter(budget > 0 && col("__cum") <= budget)
      .drop("__cum")
  }

  /** Sequence-packing offsets: the deterministic concatenation layout
    * pretraining needs before chunking a corpus into fixed-length
    * training sequences. Docs are hashed into `nBuckets` independent
    * streams (the scale unit — each bucket packs in parallel; bins are
    * globally unique as (bucket, bin)); within a bucket, docs
    * concatenate in (FNV(id:seed), id) order, and each doc gets its
    * token start offset and the `binTokens`-sized bin its start falls
    * in. Docs may straddle bin boundaries — GPT-style packing splits at
    * the boundary; the layout (order + offset) is what must be
    * deterministic and reproducible, and is (same hash order on any
    * run, partitioning, or engine).
    *
    * One window per bucket: parallelism = nBuckets — size it like
    * shuffle partitions (hundreds at corpus scale), not like strata.
    */
  def packingOffsets(df: DataFrame, idCol: String, tokenCol: Column,
                     binTokens: Long, nBuckets: Int = 64,
                     seed: Long = 42L): DataFrame = {
    val h = orderHash(col(idCol), seed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pb")).orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__h", h)
      .withColumn("__pb", pmod(col("__h"), lit(nBuckets.toLong)))
      .withColumn("__cum", sum(tokenCol.cast("long")).over(w))
      .withColumn("pack_offset", col("__cum") - tokenCol.cast("long"))
      .withColumn("pack_bucket", col("__pb"))
      .withColumn("bin_id", floor(col("pack_offset") / lit(binTokens)))
      .drop("__h", "__pb", "__cum")
  }

  /** Corpus vocabulary table: lowercase whitespace-token frequencies
    * with rank and cumulative coverage fraction — the tokenizer-
    * training prep view ("how many distinct words cover X% of the
    * corpus"). Deterministic: ties rank by the word itself.
    *
    * Scale shape: one explode→groupBy pass (map-side combined), sized
    * by the token stream; the rank/cumsum window runs on the top-K rows
    * only (orderBy+limit plans as TakeOrdered — no global sort), never
    * on the full vocabulary. The corpus total rides in as a broadcast
    * scalar. Cumulative coverage of the global top-K in top-K order
    * equals the global cumulative for those ranks.
    */
  def vocabulary(docs: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("__total"))
    val w = Window.orderBy(col("cnt").desc, col("word").asc)
    counts.orderBy(col("cnt").desc, col("word").asc).limit(topK)
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(totals))
      .select(col("word"), col("cnt"), col("rank"),
        round(col("__cum").cast("double") / col("__total").cast("double"), 6)
          .as("cum_frac"))
  }

  /** Per-document mean unigram log-probability under the corpus' own
    * token distribution — the cheap language-model quality signal
    * (CCNet-style): gibberish and rare-token soup score far below
    * common prose, with no external model needed. Deterministic at any
    * parallelism: the per-doc mean accumulates the (bit-identical on
    * both engines) ln values in DECIMAL before the final double cast.
    *
    * Scale shape: one explode→groupBy vocabulary pass, then the token
    * stream joins its term count (shuffle keyed by term — inverted-
    * index shape) and re-aggregates per doc; corpus total rides in as
    * a broadcast scalar.
    */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val perDoc = toks.join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("lnp",
        log(col("cnt").cast("double") / col("__total").cast("double")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lnp").cast("decimal(28,12)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_lnp"))
    docs.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("mean_lnp"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2019 §4.4,
    * arXiv:1911.00359): split the corpus into head / middle / tail
    * thirds by language-model quality — CCNet keeps "head" (lowest
    * perplexity) for pretraining and drops or downweights "tail".
    * The LM here is the corpus' own unigram distribution
    * ([[unigramLogProb]]; higher mean ln p == lower perplexity ==
    * head), so the operator is model-free and fully oracle-replayable.
    *
    * Tercile thresholds use the discrete-percentile definition
    * (smallest value whose ascending cumulative count reaches
    * ⌈p·N⌉) computed over DISTINCT 6-dp score values — the bounded
    * global-window class (q_auc / datasheet), never a row sort.
    * Token-less docs keep their row with a null bucket.
    * Returns (id, n_tokens, mean_lnp, bucket).
    */
  def pplBuckets(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // the per-doc score frame feeds BOTH the threshold computation and
    // the final bucket assignment; unpersisted, Spark would re-execute
    // the corpus token explode (the dominant cost) once per consumer —
    // persist the O(docs)-row readout, not the token stream (the
    // Fixtures.sessionsRaw budget class; ContextCleaner reaps it)
    val lp = unigramLogProb(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = lp.filter(col("mean_lnp").isNotNull)
    val wl = org.apache.spark.sql.expressions.Window.orderBy(col("v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = scored.select(col("mean_lnp").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wl))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("__n"))))
    val thresholds = cum.agg(
      min(when(col("__cum") >= ceil(col("__n") / 3.0), col("v"))).as("t33"),
      min(when(col("__cum") >= ceil(col("__n") * 2.0 / 3.0), col("v"))).as("t67"))
    lp.crossJoin(broadcast(thresholds))
      .select(col("id"), col("n_tokens"), col("mean_lnp"),
        when(col("mean_lnp").isNull, lit(null).cast("string"))
          .when(col("mean_lnp") <= col("t33"), lit("tail"))
          .when(col("mean_lnp") <= col("t67"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  /** Per-GROUP [[pplBuckets]] — the form CCNet actually ships (§4.4
    * computes the head/middle/tail cut per LANGUAGE, because "low
    * perplexity" is only meaningful within one language's LM):
    * tercile thresholds per `byCol` group. Better scale shape than the
    * global form — the cumulative window is PARTITIONED by group and
    * ordered over that group's distinct 6-dp scores, and thresholds
    * ride back as a |groups|-row broadcast join. Docs whose group has
    * no scored rows (or no tokens) keep a null bucket.
    * Returns (id, by, n_tokens, mean_lnp, bucket).
    */
  def pplBucketsBy(docs: DataFrame, textCol: String, idCol: String,
                   byCol: String): DataFrame = {
    val lp = unigramLogProb(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("id"), col(byCol).as("by")), Seq("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = lp.filter(col("mean_lnp").isNotNull)
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("by")).orderBy(col("v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val byV = scored.select(col("by"), col("mean_lnp").as("v"))
      .groupBy(col("by"), col("v")).agg(count(lit(1)).as("__c"))
    val tot = byV.groupBy(col("by")).agg(sum(col("__c")).as("__n"))
    val thresholds = byV
      .withColumn("__cum", sum(col("__c")).over(wl))
      .join(tot, Seq("by"))
      .groupBy(col("by"))
      .agg(min(when(col("__cum") >= ceil(col("__n") / 3.0), col("v"))).as("t33"),
        min(when(col("__cum") >= ceil(col("__n") * 2.0 / 3.0), col("v"))).as("t67"))
    lp.join(broadcast(thresholds), Seq("by"), "left")
      .select(col("id"), col("by"), col("n_tokens"), col("mean_lnp"),
        when(col("mean_lnp").isNull, lit(null).cast("string"))
          .when(col("mean_lnp") <= col("t33"), lit("tail"))
          .when(col("mean_lnp") <= col("t67"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))
  }

  /** Jensen-Shannon divergence between two corpora's unigram term
    * distributions -- the distribution-drift readout for text data
    * (does this month's crawl / this source's slice look like the
    * reference corpus?), complementing q_psi_drift's numeric-feature
    * PSI. JS = 0.5*KL(P||M) + 0.5*KL(Q||M) with M = (P+Q)/2, in nats
    * (bounded by ln 2); terms absent from one side contribute only the
    * present side's mass, so no smoothing hack is needed (unlike raw
    * KL, which is infinite off shared support).
    *
    * Determinism: each term's contribution rounds to 12 dp and
    * accumulates in DECIMAL (order-independent across any
    * partitioning), one final 6-dp rounding -- the mean_lnp pattern.
    *
    * Scale shape: two token hash-aggregations (vocabulary-sized, with
    * map-side partial aggregation absorbing the token volume), one
    * vocabulary-keyed full outer join, one scalar reduce. Nothing is
    * keyed finer than a term; no windows, no pair joins.
    *
    * Returns one row: (vocab_a, vocab_b, vocab_shared, tokens_a,
    * tokens_b, js). Both corpora empty => js null.
    */
  def termDivergence(a: DataFrame, b: DataFrame,
                     textCol: String): DataFrame = {
    val ca0 = a.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("ca"))
    val cb0 = b.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("cb"))
    termDivergenceFromCounts(ca0.join(cb0, Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb")))
  }

  /** The JS finish over a pre-built per-term count table (term, ca,
    * cb) -- `ca`/`cb` the term's count in corpus A / B. Split out (the
    * mannWhitney pattern) so a STREAMED count table -- the whole
    * divergence state is mergeable per-term counters -- can close with
    * the identical reduce the batch path uses (q_stream_divergence).
    * Same output contract as [[termDivergence]].
    */
  def termDivergenceFromCounts(counts: DataFrame): DataFrame = {
    // totals ride along via a 1-row broadcast, not a window
    val t = counts.agg(sum(col("ca")).as("__ta"), sum(col("cb")).as("__tb"))
    val joined = counts.crossJoin(broadcast(t))
    val p = when(col("__ta") > 0, col("ca").cast("double") / col("__ta")).otherwise(lit(0.0))
    val q = when(col("__tb") > 0, col("cb").cast("double") / col("__tb")).otherwise(lit(0.0))
    val contrib =
      when(col("ca") > 0, p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0)) +
        when(col("cb") > 0, q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0))
    joined
      .agg(coalesce(sum(when(col("ca") > 0, 1L).otherwise(0L)), lit(0L)).as("vocab_a"),
        coalesce(sum(when(col("cb") > 0, 1L).otherwise(0L)), lit(0L)).as("vocab_b"),
        coalesce(sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)),
          lit(0L)).as("vocab_shared"),
        coalesce(max(col("__ta")), lit(0L)).as("tokens_a"),
        coalesce(max(col("__tb")), lit(0L)).as("tokens_b"),
        sum(round(contrib, 12).cast("decimal(28,12)")).as("__js2"))
      .select(col("vocab_a"), col("vocab_b"), col("vocab_shared"),
        col("tokens_a"), col("tokens_b"),
        when(col("tokens_a") + col("tokens_b") > 0,
          round(col("__js2").cast("double") / 2.0, 6)).as("js"))
  }

  /** Per-source drift ranking: for every source s, the Jensen-Shannon
    * divergence JS(P_s || P_rest) between that source's unigram
    * distribution and the rest of the corpus -- the "which source is
    * the outlier" readout a mixture curator runs before reweighting
    * ([[termDivergence]] is the two-corpus primitive; this sweeps it
    * across all sources in ONE pass over the tokens).
    *
    * Scale shape: one token explode into (source, term) counts (with
    * map-side partial agg), a vocabulary re-aggregation, then an
    * explicit |sources| x |vocab| grid (global counts cross-joined
    * with the BROADCAST source-totals frame) left-joined with the
    * per-source counts -- the expansion is bounded by the documented
    * contract that the source column is low-cardinality (tens to
    * thousands of sources, the mixture-curation shape), never by
    * token volume. Determinism matches [[termDivergence]]: 12-dp
    * rounded per-term contributions, DECIMAL accumulation, one final
    * 6-dp rounding.
    *
    * Returns (source, vocab_source, tokens_source, js), most-drifted
    * first; js is null when the corpus has a single source (no rest
    * to compare against).
    */
  def termDivergenceBySource(docs: DataFrame, textCol: String,
                             srcCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val bySrc = tok.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val global = bySrc.groupBy(col("term")).agg(sum(col("cs")).as("cg"))
    val srcTotals = bySrc.groupBy(col("source")).agg(sum(col("cs")).as("ts"))
    val total = srcTotals.agg(sum(col("ts")).as("__tot"))
    val grid = global.crossJoin(broadcast(srcTotals))
    val joined = grid.join(bySrc, Seq("source", "term"), "left")
      .crossJoin(broadcast(total))
      .select(col("source"), col("ts"), col("__tot"),
        coalesce(col("cs"), lit(0L)).as("cs"), col("cg"))
    val p = col("cs").cast("double") / col("ts")
    val qn = col("cg") - col("cs")
    val q = when(col("__tot") > col("ts"),
      qn.cast("double") / (col("__tot") - col("ts"))).otherwise(lit(0.0))
    val contrib =
      when(col("cs") > 0, p * log(lit(2.0) * p / (p + q))).otherwise(lit(0.0)) +
        when(qn > 0, q * log(lit(2.0) * q / (p + q))).otherwise(lit(0.0))
    joined.groupBy(col("source"))
      .agg(sum(when(col("cs") > 0, 1L).otherwise(0L)).as("vocab_source"),
        max(col("ts")).as("tokens_source"),
        when(max(col("__tot")) > max(col("ts")),
          round(sum(round(contrib, 12).cast("decimal(28,12)"))
            .cast("double") / 2.0, 6)).as("js"))
      .orderBy(col("js").desc, col("source").asc)
  }

  /** Per-group label diversity: Shannon entropy (nats) of the label
    * distribution inside each group plus its exponential -- the
    * "effective number of labels" (a source with 5 languages at 99/
    * 0.25/0.25/0.25/0.25 percent has ~1.07 effective languages, not
    * 5) -- the composition-diversity readout of a corpus datasheet.
    *
    * Determinism: per-label -p·ln p terms round to 12 dp and
    * accumulate in DECIMAL; entropy and its exp round once at 6 dp.
    * Scale shape: one (group, label) hash agg, a broadcast
    * group-totals join, one group re-agg -- nothing keyed finer than
    * a (group, label) cell.
    *
    * Returns (group, n_rows, n_labels, entropy, effective_labels).
    */
  def labelDiversity(docs: DataFrame, groupCol: String,
                     labelCol: String): DataFrame = {
    val cells = docs.groupBy(col(groupCol).as("group"),
        col(labelCol).as("label"))
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy(col("group")).agg(sum(col("c")).as("tot"))
    val p = col("c").cast("double") / col("tot")
    cells.join(broadcast(tot), Seq("group"))
      .withColumn("pterm", round(-p * log(p), 12))
      .groupBy(col("group"))
      .agg(max(col("tot")).as("n_rows"), count(lit(1)).as("n_labels"),
        sum(col("pterm").cast("decimal(28,12)")).cast("double").as("__h"))
      .select(col("group"), col("n_rows"), col("n_labels"),
        round(col("__h"), 6).as("entropy"),
        round(exp(col("__h")), 6).as("effective_labels"))
      .orderBy(col("group"))
  }

  /** Portable per-row sample bucket in [0, 10⁶): FNV-1a over
    * "key:seed" — reproducible not just across runs and partitionings
    * but across ENGINES (the DuckDB oracle replays it exactly; same
    * rationale as [[graft.functions.Fnv1a64]] for the dedup hashes).
    */
  private def sampleHash(key: Column, seed: Long): Column =
    pmod(orderHash(key, seed), lit(1000000L))

  /** The shared deterministic-order hash under every sampler/packer:
    * FNV-1a over "key:seed". Null keys bucket via a NUL-prefixed
    * sentinel — deterministic (a raw concat would be null → filter
    * null → null-keyed rows silently vanish from every sample) and
    * uncollidable with any real printable id. ONE definition on
    * purpose: a second copy once drifted to a space-prefixed sentinel
    * that a literal " null" id would collide with.
    */
  private[ext] def orderHash(key: Column, seed: Long): Column =
    graft.functions.VectorExpressions.fnv1a64(
      concat(coalesce(key.cast("string"), lit("\u0000null")),
        lit(":"), lit(seed.toString)))

  /** Corpus datasheet (Gebru et al. 2021, "Datasheets for Datasets"):
    * the standard release-notes numbers in one uniform
    * (section, key, n, v) frame — totals, per-language and per-source
    * composition with fractions, and discrete length percentiles
    * (lowest value whose ascending rank ≥ ⌈p·N⌉, ties on id — the
    * engine-agnostic definition, like quantileBins). A report call,
    * not a hot-path operator: a handful of aggregations over the
    * corpus, each map-side-combined; ALL percentile targets resolve in
    * ONE cumulative pass whose window sees distinct length VALUES
    * (never document rows), so even the report path is corpus-scale
    * safe.
    */
  def datasheet(docs: DataFrame, textCol: String, idCol: String,
                langCol: String, sourceCol: String): DataFrame = {
    val t = col(textCol)
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(length(t).cast("long")).as("n_chars"),
      sum(TextOps.tokenCountWs(t).cast("long")).as("n_tokens"))
    val corpus = totals.select(explode(array(
        struct(lit("corpus").as("section"), lit("n_docs").as("key"),
          col("n_docs").as("n"), lit(null).cast("double").as("v")),
        struct(lit("corpus").as("section"), lit("n_chars").as("key"),
          col("n_chars").as("n"), lit(null).cast("double").as("v")),
        struct(lit("corpus").as("section"), lit("n_tokens_ws").as("key"),
          col("n_tokens").as("n"), lit(null).cast("double").as("v"))))
        .as("r"))
      .select(col("r.*"))
    def composition(section: String, c: Column) = docs
      .groupBy(c.as("key")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(totals.select(col("n_docs").as("__tot"))))
      .select(lit(section).as("section"), col("key").cast("string").as("key"),
        col("n"), round(col("n").cast("double") / col("__tot"), 6).as("v"))
    // ONE pass for all four percentiles, and the window runs over
    // DISTINCT length values (the q_auc trick), not corpus rows: the
    // value at ascending (len, id)-rank r is the smallest len whose
    // cumulative count reaches r, so prev_cum < ceil(p*N) <= cum picks
    // each target without ever ranking individual documents
    val pcts = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")
    val wl = org.apache.spark.sql.expressions.Window.orderBy(col("len").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = docs.select(length(t).cast("long").as("len"))
      .groupBy(col("len")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wl))
      .crossJoin(broadcast(totals.select(col("n_docs").as("__tot"))))
    val targets = pcts.map { case (p, name) =>
      struct(ceil(lit(p) * col("__tot")).cast("long").as("rk"),
        lit(name).as("key"))
    }
    val lengthRows = cum
      .select(col("len"), col("__c"), col("__cum"),
        explode(array(targets: _*)).as("__t"))
      .filter(col("__cum") >= col("__t.rk") &&
        col("__cum") - col("__c") < col("__t.rk"))
      .select(lit("length_chars").as("section"), col("__t.key").as("key"),
        col("len").as("n"), lit(null).cast("double").as("v"))
    corpus
      .unionByName(composition("lang", col(langCol)))
      .unionByName(composition("source", col(sourceCol)))
      .unionByName(lengthRows)
  }

  /** Lorenz curve + Gini coefficient of corpus mass concentration over
    * a grouping key (how much of the training corpus the top sources
    * own — the "is this corpus one megasite in a trenchcoat" readout;
    * RefinedWeb's per-domain caps exist exactly because web corpora
    * concentrate). One row per key, ascending by mass: rank,
    * cumulative mass/share (the Lorenz curve points), and the
    * population Gini G = Σ(2i−n−1)·mᵢ / (n·Σm) repeated as a constant
    * column.
    *
    * Determinism/scale contract: one hash aggregate over the corpus
    * (the only full-data pass), then partition-less windows over the
    * POST-AGGREGATE per-key frame — bounded by the low-cardinality
    * grouping-key contract (sources, langs), the
    * [[termDivergenceBySource]] discipline. Every window sum is
    * integer-exact (masses are counts); the only doubles are the two
    * final divisions, identical in any replay. Ties order by key, so
    * ranks are deterministic under any partitioning.
    */
  /** PMI collocations (Church & Hanks 1990): adjacent word bigrams
    * scoring high pointwise mutual information
    * ln(P(ab) / (P(a)·P(b))) — the "New York"-detector feeding
    * tokenizer vocabularies and phrase-aware dedup. `minCount` guards
    * the classic PMI pathology (hapax pairs score highest), topK rows
    * return, ties ordered by the pair.
    *
    * Scale shape: bigrams are built NARROWLY with zip_with over each
    * doc's own token array (no posexplode self-join); one hash
    * aggregate each for unigram and bigram counts, two word-keyed
    * joins to attach marginals (vocabulary-sized, Heaps-bounded), the
    * two scalar totals ride in on a constant-key broadcast. PMI's
    * argument is a ratio of exact integer counts evaluated in one
    * fixed double shape with a single ln per surviving pair; the ln
    * itself is presented at 6 dp (Java's and libm's ln differ in the
    * last ulp for some arguments — measured on this corpus — so the
    * raw double is NOT cross-engine-stable the way the argument is).
    */
  def collocations(df: DataFrame, textCol: String,
                   topK: Int = 50, minCount: Long = 5): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val base = df.select(toks.as("w"))
    val uni = base.select(explode(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c_w"))
    val bi = base
      .filter(size(col("w")) >= 2)
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val totals = uni.agg(sum(col("c_w")).as("n_uni")).withColumn("k", lit(1))
      .join(bi.agg(sum(col("c_ab")).as("n_bi")).withColumn("k", lit(1)), Seq("k"))
    bi.filter(col("c_ab") >= minCount)
      .join(uni.withColumnRenamed("word", "w1").withColumnRenamed("c_w", "c_a"),
        Seq("w1"))
      .join(uni.withColumnRenamed("word", "w2").withColumnRenamed("c_w", "c_b"),
        Seq("w2"))
      .withColumn("k", lit(1)).join(broadcast(totals), Seq("k")).drop("k")
      .withColumn("pmi", round(log(
        (col("c_ab").cast("double") * col("n_uni").cast("double") *
          col("n_uni").cast("double")) /
        (col("n_bi").cast("double") * col("c_a").cast("double") *
          col("c_b").cast("double"))), 6))
      .select("w1", "w2", "c_ab", "c_a", "c_b", "pmi")
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Length-grouped batch assignment (the `group_by_length` training
    * loader prep): within each shard key, rank documents by (length,
    * id) and cut into fixed-size batches — batches then hold
    * similar-length documents, so padding waste per batch collapses
    * (the HF Trainer `group_by_length` rationale, done once in the
    * engine instead of per-epoch in the loader). Returns one row per
    * batch: shard, batch index, size, min/max/total length and the
    * padding-waste fraction 1 − Σlen/(n·maxlen) the batch would incur.
    *
    * Scale shape: the ONLY window is partitioned by the shard key —
    * batching is per-shard by design (a global sort is exactly what a
    * 1000-executor job must not do; shards are the parallel unit and
    * each trainer rank consumes its own). Integer sums throughout; the
    * waste fraction is one fixed-shape double division per batch row.
    * Deterministic under any partitioning via the (length, id) tie
    * order.
    */
  def lengthBatches(df: DataFrame, shardCol: String, idCol: String,
                    lenCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 1, "lengthBatches: batchSize must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("len").asc, col("id").asc)
    df.select(col(shardCol).as("shard"), col(idCol).as("id"),
        col(lenCol).cast("long").as("len"))
      .withColumn("batch",
        floor((row_number().over(w) - lit(1)) / lit(batchSize)))
      .groupBy(col("shard"), col("batch"))
      .agg(count(lit(1)).as("n"), min(col("len")).as("min_len"),
        max(col("len")).as("max_len"), sum(col("len")).as("sum_len"))
      .withColumn("pad_waste",
        lit(1.0) - col("sum_len").cast("double") /
          (col("n") * col("max_len")).cast("double"))
      .orderBy("shard", "batch")
  }

  def concentration(df: DataFrame, keyCol: String, massCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byMass = Window.orderBy(col("mass").asc, col("key").asc)
    val all = Window.partitionBy()
    df.groupBy(col(keyCol).as("key"))
      .agg(sum(col(massCol)).as("mass"))
      .withColumn("rank", row_number().over(byMass))
      .withColumn("cum_mass",
        sum(col("mass")).over(byMass.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_keys", count(lit(1)).over(all))
      .withColumn("total", sum(col("mass")).over(all))
      .withColumn("gnum",
        sum((lit(2) * col("rank") - col("n_keys") - lit(1)) * col("mass")).over(all))
      .select(col("key"), col("mass"), col("rank"), col("cum_mass"),
        (col("cum_mass").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        (col("gnum").cast("double") /
          (col("n_keys").cast("double") * col("total").cast("double")))
          .as("gini"))
      .orderBy("rank")
  }
}
