package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — data selection, mixtures, and curation pipelines.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesSelection {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_curation_e2e" -> ((s, d) => {
      // the COMPOSED curation pipeline AT ITS DEFAULTS: quality gate →
      // benchmark decontamination → exact dedup → near-dup cluster
      // dedup with the scale-safe default hot-shingle cap
      // (DefaultMaxShingleDf=64 — the uncapped join provably dies on a
      // replica-heavy 100× corpus). Every stage is individually
      // oracle-proven; this row verifies the stage WIRING end-to-end
      // against one composed DuckDB replay that includes the default
      // cap's thinning (HAVING count(*) > 64), so the oracle replays
      // default semantics exactly whatever the data's df distribution.
      val docs = t(s, d, "documents")
      graft.ext.CurationPipeline.curate(docs, docs.filter(col("doc_id") < 20),
          "text", "doc_id", minQuality = 0.5, ngram = 5,
          shingleSize = 3, jaccardThreshold = 0.5)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "x_curation_e2e_capped" -> ((s, d) => {
      // the SCALE configuration of the same pipeline: hot-shingle df
      // cap wired into the near-dup pair stage, bounding the inverted-
      // index join at Σ min(df,cap)² — the shape that survives a
      // replica-heavy corpus where uncapped exact jaccard is quadratic
      // in the duplication factor (100× soak: uncapped spilled >80 GB
      // and died; capped completes). cap=4 genuinely triggers at gate
      // scale (shingle df reaches 7), so the capped jaccard semantics
      // — lower-bound similarity over the thinned shingle space — are
      // what the oracle replays, not a no-op.
      val docs = t(s, d, "documents")
      graft.ext.CurationPipeline.curate(docs, docs.filter(col("doc_id") < 20),
          "text", "doc_id", minQuality = 0.5, ngram = 5,
          shingleSize = 3, jaccardThreshold = 0.5,
          maxShingleDf = Some(4))
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "x_sample_stratified" -> ((s, d) =>
      // portable FNV sample buckets — the oracle replays the exact
      // per-row membership decision
      graft.ext.Corpus.stratifiedSample(t(s, d, "documents"),
          "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), seed = 7L)
        .select("doc_id", "lang").orderBy("doc_id")),

    "x_mixture_budget" -> ((s, d) =>
      // token-budget mixture assembly: en capped at 5000 tokens, de at
      // 2000, other strata dropped — deterministic hash order, so the
      // oracle replays the exact cutoff
      graft.ext.Corpus.tokenBudgetSample(t(s, d, "documents"), "doc_id", "lang",
          TextOps.tokenCountWs(col("text")), Map("en" -> 5000L, "de" -> 2000L),
          seed = 7L)
        .select("doc_id", "lang").orderBy("doc_id")),

    "x_pack_offsets" -> ((s, d) =>
      // sequence-packing layout: deterministic concatenation order +
      // token offsets + 2048-token bin per doc, in 8 parallel buckets
      graft.ext.Corpus.packingOffsets(t(s, d, "documents"), "doc_id",
          TextOps.tokenCountWs(col("text")), binTokens = 2048, nBuckets = 8,
          seed = 7L)
        .select(col("doc_id"), col("pack_bucket"), col("pack_offset"), col("bin_id"))
        .orderBy("doc_id")),

    "x_sample_weighted" -> ((s, d) =>
      // weighted priority sample (Duffield et al.): P(keep) ∝ n_chars;
      // portable-FNV uniforms + a single IEEE division per row — the
      // oracle replays the exact priority order
      graft.ext.Corpus.prioritySample(t(s, d, "documents"), "doc_id",
          col("n_chars"), k = 100, seed = 7L)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "x_importance_weights" -> ((s, d) =>
      // DSIR (Xie et al. 2023): hashed word-unigram bucket models fit
      // on the target subset (lang='en') vs the raw pool; per-doc
      // importance weight = Σ ln(p_target/p_raw) over token buckets.
      // Bucket models are ≤256 rows (broadcast); one explode pass
      graft.ext.Selection.importanceWeights(t(s, d, "documents"),
          "text", "doc_id", col("lang") === "en", nBuckets = 256)
        .orderBy("id")),

    "x_importance_select" -> ((s, d) =>
      // the selection step: top-60 docs by DSIR weight (deterministic
      // temperature→0 resample; ties break on id), lang joined back to
      // show the shift toward the target distribution
      graft.ext.Selection.selectByImportance(t(s, d, "documents"),
          "text", "doc_id", col("lang") === "en", k = 60, nBuckets = 256)
        .join(t(s, d, "documents").select(col("doc_id").as("id"), col("lang")),
          Seq("id"))
        .select(col("id"), col("lang"), col("n_tokens"), col("weight"))
        .orderBy("id")),

    "x_source_cap" -> ((s, d) =>
      // RefinedWeb-style per-domain cap: keep at most 5 docs per
      // source, preferring the longest (ties on id) — one rank window
      // keyed on source
      graft.ext.Selection.capPerSource(t(s, d, "documents"),
          "source", "doc_id", col("n_chars"), k = 5)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")),

    "x_url_canon" -> ((s, d) => {
      // URL canonicalization for crawl dedup: scheme/host lowercased
      // (path case preserved), www. + default port + fragment +
      // tracking params stripped, surviving params sorted, trailing
      // slash dropped. URLs are synthesized deterministically from
      // (doc_id, source) — identically in the oracle — to cover the
      // http:80 / https:443 / query / bare-path variants
      val pre = when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP://WWW."))
        .otherwise(lit("HTTPS://"))
      val hostPort = when(pmod(col("doc_id"), lit(2)) === 0,
        lit(".Example.COM:80/Docs/")).otherwise(lit(".Example.COM:443/Docs/"))
      val tail = when(pmod(col("doc_id"), lit(3)) === 0,
          lit("/?b=2&utm_source=x&a=1#frag"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("/"))
        .otherwise(lit("?z=9&utm_campaign=c&a=1"))
      val url = concat(pre, col("source"), hostPort,
        col("doc_id").cast("string"), tail)
      t(s, d, "documents")
        .select(col("doc_id"), url.as("url_raw"),
          graft.ext.Selection.canonicalizeUrl(url).as("url_canon"))
        .orderBy("doc_id")
    }),

    "x_blocklist" -> ((s, d) => {
      // URL domain-blocklist curation stage (RefinedWeb §3.1 / CCNet):
      // subdomain-aware suffix match against a broadcast blocklist,
      // zero corpus shuffle. Hosts synthesized deterministically from
      // (doc_id, source) — identically in the oracle — to cover the
      // subdomain / case+port / dot-boundary-lookalike / exact cases;
      // the blocklist holds a domain AND its more specific subdomain
      // (longest rule must win) plus an untrimmed uppercase entry.
      import s.implicits._
      val url = concat(lit("https://"),
        when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("ads."), col("source"), lit(".example.com")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("WWW."), col("source"), lit(".Example.COM:8080")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("shop"), col("source"), lit(".example.com")))
          .otherwise(lit("cdn.tracker.net")),
        lit("/p/"), col("doc_id").cast("string"))
      val block = Seq("src1.example.com", "src3.example.com",
        "ads.src1.example.com", "tracker.net", " SRC5.EXAMPLE.COM ")
        .toDF("domain")
      graft.ext.Selection.markBlocklisted(
          t(s, d, "documents").withColumn("url", url), col("url"), block)
        .select(col("doc_id"), col("host"), col("blocked_by"))
        .orderBy("doc_id")
    }),

    "x_importance_incr" -> ((s, d) => {
      // production DSIR shape: fit ONCE on a reference pool
      // (doc_id < 400), persist the 256-row model, score each new
      // crawl batch (doc_id >= 400) against it — O(batch) per batch,
      // no refit, no pool rescan. Fit-unseen buckets score the
      // Laplace-default ratio (the model enumerates ALL buckets)
      val docs = t(s, d, "documents")
      val model = graft.ext.Selection.fitImportanceModel(
        docs.filter(col("doc_id") < 400), "text", "doc_id",
        col("lang") === "en", nBuckets = 256)
      graft.ext.Selection.scoreImportance(
          docs.filter(col("doc_id") >= 400), "text", "doc_id", model,
          nBuckets = 256)
        .orderBy("id")
    }),

    "x_url_dedup" -> ((s, d) => {
      // URL-level dedup (the CCNet step BEFORE content dedup): three
      // synthesized fetch-variants of the same page — www+default-port
      // +tracking+fragment+trailing-slash, bare, case+port+tracking —
      // collapse onto one canonical URL per doc_id%50 group; keep the
      // longest fetch (ties on id). The oracle asserts the EXPECTED
      // canonical literal, so the engine's canonicalization of every
      // messy variant is what's under test
      val grp = pmod(col("doc_id"), lit(50)).cast("string")
      val url = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("HTTPS://WWW.Site.COM:443/P/"), grp,
            lit("/?utm_source=x#f")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit("https://site.com/P/"), grp))
        .otherwise(concat(lit("https://Site.com:443/P/"), grp,
          lit("?gclid=1&ref=nav")))
      graft.ext.Selection.dedupByCanonicalUrl(
          t(s, d, "documents").withColumn("url", url), col("url"),
          "doc_id", col("n_chars"))
        .select(col("doc_id"),
          graft.ext.Selection.canonicalizeUrl(col("url")).as("url_canon"),
          col("n_chars"))
        .orderBy("doc_id")
    }),

    "x_selection_e2e" -> ((s, d) => {
      // end-to-end SELECTION pipeline (RefinedWeb §3 order): blocklist
      // → quality ≥ 0.5 → cap 15/source (binds: ~25 docs/source at
      // sf0.01) → DSIR top-50 toward lang='en'. Same synthesized URLs
      // and blocklist as x_blocklist; the oracle replays the WHOLE
      // chain, pinning the stage wiring — including that the DSIR raw
      // model is fit on the CAPPED pool, not upstream
      import s.implicits._
      val url = concat(lit("https://"),
        when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit("ads."), col("source"), lit(".example.com")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("WWW."), col("source"), lit(".Example.COM:8080")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit("shop"), col("source"), lit(".example.com")))
          .otherwise(lit("cdn.tracker.net")),
        lit("/p/"), col("doc_id").cast("string"))
      val block = Seq("src1.example.com", "src3.example.com",
        "ads.src1.example.com", "tracker.net", " SRC5.EXAMPLE.COM ")
        .toDF("domain")
      graft.ext.SelectionPipeline.select(
          t(s, d, "documents").withColumn("url", url), col("url"), block,
          "text", "doc_id", "source", capOrder = col("n_chars"),
          isTarget = col("lang") === "en", minQuality = 0.5,
          maxPerSource = 15, k = 50, nBuckets = 256)
        .join(t(s, d, "documents").select(col("doc_id").as("id"), col("lang")),
          Seq("id"))
        .select(col("id"), col("lang"), col("n_tokens"), col("weight"))
        .orderBy("id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // replay of the deterministic packing layout (seed 7, 8 buckets)
    "x_pack_offsets" ->
      s"""WITH hx AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, toks, ${signedSql("hu")} AS h,
         |    ((${signedSql("hu")} % 8) + 8) % 8 AS pack_bucket
         |  FROM hx),
         |c AS (
         |  SELECT doc_id, pack_bucket,
         |    CAST(sum(toks) OVER (PARTITION BY pack_bucket ORDER BY h ASC, doc_id ASC
         |                         ROWS UNBOUNDED PRECEDING) - toks AS BIGINT) AS pack_offset
         |  FROM m)
         |SELECT doc_id, pack_bucket, pack_offset, pack_offset // 2048 AS bin_id
         |FROM c ORDER BY doc_id""".stripMargin,

    // replay of the deterministic-order cumulative token cutoff (seed 7)
    "x_mixture_budget" ->
      s"""WITH hx AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang,
         |    sum(toks) OVER (PARTITION BY lang ORDER BY ${signedSql("hu")} ASC, doc_id ASC
         |                    ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM hx)
         |SELECT doc_id, lang FROM c
         |WHERE (CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'de' THEN 2000 ELSE 0 END) > 0
         |  AND cum <= CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'de' THEN 2000 ELSE 0 END
         |ORDER BY doc_id""".stripMargin,

    // composed replay of the full curation chain AT ITS DEFAULTS:
    // quality (x_quality's scoring) → 5-gram decontamination vs
    // doc_id<20 → exact dedup (normalized-text min-id) → jaccard pairs
    // over the default-capped shingle space (DefaultMaxShingleDf=64 →
    // HAVING count(*) > 64) → recursive-CTE cluster resolution →
    // cluster minima
    "x_curation_e2e" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, length(text) AS len,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha,
        |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'))) AS DOUBLE)
        |      / greatest(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE), 1.0) AS stop
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    CASE WHEN len BETWEEN 50 AND 100000 THEN 1.0 WHEN len BETWEEN 10 AND 49 THEN 0.5 ELSE 0.0 END AS len_ok,
        |    CASE WHEN alpha >= 0.6 THEN 1.0 WHEN alpha >= 0.3 THEN 0.5 ELSE 0.0 END AS alpha_ok,
        |    CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
        |    CASE WHEN stop >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok
        |  FROM base),
        |qd AS (
        |  SELECT d.doc_id, d.text, d.lang FROM documents d JOIN parts p ON d.doc_id = p.doc_id
        |  WHERE round(p.len_ok * 0.3 + p.alpha_ok * 0.3 + p.punct_ok * 0.2 + p.stop_ok * 0.2, 2) >= 0.5),
        |g1 AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM qd),
        |grams AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                         FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM g1),
        |bw AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents WHERE doc_id < 20),
        |bgrams AS (
        |  SELECT DISTINCT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                          FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM bw),
        |contaminated AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bgrams b ON g.s = b.s),
        |clean AS (
        |  SELECT doc_id, text, lang FROM qd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |ex AS (
        |  SELECT doc_id, text, lang FROM clean WHERE doc_id IN (
        |    SELECT min(doc_id) FROM clean
        |    GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        |shw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM ex),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM shw)),
        |sh AS (
        |  SELECT doc_id, s FROM sh0
        |  WHERE s NOT IN (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 64)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |jp AS (
        |  SELECT p.id_a, p.id_b FROM prs p
        |  JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS s, id_b AS t FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM ex
        |  UNION
        |  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
        |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        |SELECT ex.doc_id, ex.lang FROM ex JOIN cc ON ex.doc_id = cc.doc_id
        |WHERE cc.doc_id = cc.cluster_id
        |ORDER BY ex.doc_id""".stripMargin,

    // same chain with the hot-shingle df cap (maxShingleDf=4) replayed:
    // shingles held by more than 4 surviving docs are dropped BEFORE
    // sizes/pairs, so jaccard is computed over the thinned space on
    // both engines
    "x_curation_e2e_capped" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, length(text) AS len,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha,
        |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'))) AS DOUBLE)
        |      / greatest(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE), 1.0) AS stop
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    CASE WHEN len BETWEEN 50 AND 100000 THEN 1.0 WHEN len BETWEEN 10 AND 49 THEN 0.5 ELSE 0.0 END AS len_ok,
        |    CASE WHEN alpha >= 0.6 THEN 1.0 WHEN alpha >= 0.3 THEN 0.5 ELSE 0.0 END AS alpha_ok,
        |    CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
        |    CASE WHEN stop >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok
        |  FROM base),
        |qd AS (
        |  SELECT d.doc_id, d.text, d.lang FROM documents d JOIN parts p ON d.doc_id = p.doc_id
        |  WHERE round(p.len_ok * 0.3 + p.alpha_ok * 0.3 + p.punct_ok * 0.2 + p.stop_ok * 0.2, 2) >= 0.5),
        |g1 AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM qd),
        |grams AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                         FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM g1),
        |bw AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents WHERE doc_id < 20),
        |bgrams AS (
        |  SELECT DISTINCT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                          FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM bw),
        |contaminated AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bgrams b ON g.s = b.s),
        |clean AS (
        |  SELECT doc_id, text, lang FROM qd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |ex AS (
        |  SELECT doc_id, text, lang FROM clean WHERE doc_id IN (
        |    SELECT min(doc_id) FROM clean
        |    GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g')))),
        |shw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM ex),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM shw)),
        |sh AS (
        |  SELECT doc_id, s FROM sh0
        |  WHERE s NOT IN (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 4)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |jp AS (
        |  SELECT p.id_a, p.id_b FROM prs p
        |  JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS s, id_b AS t FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM ex
        |  UNION
        |  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
        |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        |SELECT ex.doc_id, ex.lang FROM ex JOIN cc ON ex.doc_id = cc.doc_id
        |WHERE cc.doc_id = cc.cluster_id
        |ORDER BY ex.doc_id""".stripMargin,

    // replay of the FNV sample-bucket membership decision (seed 7)
    "x_sample_stratified" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang,
         |    ((${signedSql("hu")} % 1000000) + 1000000) % 1000000 AS b
         |  FROM h)
         |SELECT doc_id, lang FROM m
         |WHERE b < CAST((CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.0 END) * 1000000.0 AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

    // replay of the priority order: pri = w / ((fnvBucket+1)/10⁶)
    "x_sample_weighted" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, n_chars,
         |    ${fnvSql("(coalesce(CAST(doc_id AS VARCHAR), chr(0) || 'null') || ':7')")} AS hu
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(n_chars AS DOUBLE)
         |      / (CAST((((${signedSql("hu")} % 1000000) + 1000000) % 1000000) + 1 AS DOUBLE) / 1000000.0) AS pri
         |  FROM h)
         |SELECT doc_id, lang, n_chars FROM
         |  (SELECT * FROM p ORDER BY pri DESC, doc_id LIMIT 100)
         |ORDER BY doc_id""".stripMargin,

    // DSIR replay: same tokenizer, same FNV bucket (signed pmod
    // emulation), same Laplace smoothing; per-bucket log-ratio rounds
    // to 9 dp, per-doc sum accumulates in DECIMAL, rounds to 6 dp
    "x_importance_weights" ->
      s"""WITH tok AS (
         |  SELECT doc_id, (lang = 'en') AS tgt,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents),
         |tk AS (SELECT doc_id, tgt, term FROM tok WHERE term <> ''),
         |hb AS (
         |  SELECT doc_id, tgt,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM tk),
         |pdb AS (SELECT doc_id, tgt, bucket, count(*) AS c FROM hb GROUP BY 1, 2, 3),
         |rawb AS (SELECT bucket, sum(c) AS cr FROM pdb GROUP BY 1),
         |tgtb AS (SELECT bucket, sum(c) AS ct FROM pdb WHERE tgt GROUP BY 1),
         |tot AS (
         |  SELECT sum(cr) AS rtot,
         |    (SELECT coalesce(sum(ct), 0) FROM tgtb) AS ttot
         |  FROM rawb),
         |lrs AS (
         |  SELECT rawb.bucket,
         |    round(ln((coalesce(ct, 0) + 1.0) / (ttot + 256.0))
         |        - ln((cr + 1.0) / (rtot + 256.0)), 9) AS lr
         |  FROM rawb LEFT JOIN tgtb USING (bucket), tot),
         |per AS (
         |  SELECT doc_id, sum(c) AS n_tokens,
         |    round(CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(lr AS DECIMAL(18,12))) AS DOUBLE), 6) AS weight
         |  FROM (SELECT doc_id, bucket, sum(c) AS c FROM pdb GROUP BY 1, 2) pb
         |  JOIN lrs USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id AS id, (d.lang = 'en') AS is_target,
         |  CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens, per.weight
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
         |ORDER BY id""".stripMargin,

    "x_importance_select" ->
      s"""WITH tok AS (
         |  SELECT doc_id, (lang = 'en') AS tgt,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents),
         |tk AS (SELECT doc_id, tgt, term FROM tok WHERE term <> ''),
         |hb AS (
         |  SELECT doc_id, tgt,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM tk),
         |pdb AS (SELECT doc_id, tgt, bucket, count(*) AS c FROM hb GROUP BY 1, 2, 3),
         |rawb AS (SELECT bucket, sum(c) AS cr FROM pdb GROUP BY 1),
         |tgtb AS (SELECT bucket, sum(c) AS ct FROM pdb WHERE tgt GROUP BY 1),
         |tot AS (
         |  SELECT sum(cr) AS rtot,
         |    (SELECT coalesce(sum(ct), 0) FROM tgtb) AS ttot
         |  FROM rawb),
         |lrs AS (
         |  SELECT rawb.bucket,
         |    round(ln((coalesce(ct, 0) + 1.0) / (ttot + 256.0))
         |        - ln((cr + 1.0) / (rtot + 256.0)), 9) AS lr
         |  FROM rawb LEFT JOIN tgtb USING (bucket), tot),
         |per AS (
         |  SELECT doc_id, sum(c) AS n_tokens,
         |    round(CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(lr AS DECIMAL(18,12))) AS DOUBLE), 6) AS weight
         |  FROM (SELECT doc_id, bucket, sum(c) AS c FROM pdb GROUP BY 1, 2) pb
         |  JOIN lrs USING (bucket) GROUP BY doc_id),
         |sel AS (
         |  SELECT doc_id, n_tokens, weight FROM per
         |  WHERE weight IS NOT NULL
         |  ORDER BY weight DESC, doc_id ASC LIMIT 60)
         |SELECT sel.doc_id AS id, d.lang,
         |  CAST(sel.n_tokens AS BIGINT) AS n_tokens, sel.weight
         |FROM sel JOIN documents d ON sel.doc_id = d.doc_id
         |ORDER BY id""".stripMargin,

    "x_source_cap" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents) WHERE rn <= 5
        |ORDER BY doc_id""".stripMargin,

    // same synthesized URLs, same canonicalization steps (RE2-safe
    // patterns — no backrefs in the MATCH side; \\1\\2 only in the
    // replacement, which DuckDB spells \\1 where Spark spells $1)
    "x_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'HTTPS://' END)
        |    || source
        |    || (CASE WHEN doc_id % 2 = 0 THEN '.Example.COM:80/Docs/'
        |             ELSE '.Example.COM:443/Docs/' END)
        |    || CAST(doc_id AS VARCHAR)
        |    || (CASE WHEN doc_id % 3 = 0 THEN '/?b=2&utm_source=x&a=1#frag'
        |             WHEN doc_id % 3 = 1 THEN '/'
        |             ELSE '?z=9&utm_campaign=c&a=1' END) AS url_raw
        |  FROM documents),
        |s1 AS (SELECT doc_id, url_raw,
        |    regexp_replace(trim(url_raw), '#.*$', '') AS nofrag FROM u),
        |s2 AS (SELECT doc_id, url_raw,
        |    regexp_extract(nofrag, '^([^?]*)', 1) AS base,
        |    regexp_extract(nofrag, '^[^?]*\?(.*)$', 1) AS query FROM s1),
        |s3 AS (SELECT doc_id, url_raw, base, query,
        |    regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1) AS pr
        |  FROM s2),
        |s4 AS (SELECT doc_id, url_raw, query,
        |    regexp_replace(
        |      regexp_replace(lower(pr), '^(https?://)www\.', '\1'),
        |      '^(http://[^/:]+):80$|^(https://[^/:]+):443$', '\1\2') AS prefix,
        |    substr(base, length(pr) + 1) AS pth
        |  FROM s3),
        |s5 AS (SELECT doc_id, url_raw, prefix,
        |    CASE WHEN pth = '' THEN pth
        |         ELSE regexp_replace(pth, '(.)/$', '\1') END AS cpath,
        |    list_sort(list_filter(string_split(query, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))) AS kept
        |  FROM s4)
        |SELECT doc_id, url_raw,
        |  prefix || cpath ||
        |    (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
        |          ELSE '' END) AS url_canon
        |FROM s5 ORDER BY doc_id""".stripMargin,

    // same synthesized hosts; suffix match replayed via the host's
    // dot-suffix list, longest listed rule wins (a deeper matching
    // suffix of the same host is always strictly longer, so length
    // orders specificity); 'g' flag on the strip because Spark's
    // regexp_replace is global
    "x_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || (CASE doc_id % 4
        |      WHEN 0 THEN 'ads.' || source || '.example.com'
        |      WHEN 1 THEN 'WWW.' || source || '.Example.COM:8080'
        |      WHEN 2 THEN 'shop' || source || '.example.com'
        |      ELSE 'cdn.tracker.net' END)
        |    || '/p/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_extract(lower(trim(url)),
        |                       '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1),
        |        '^.*@|:[0-9]*$', '', 'g'),
        |      '\.$', '') AS host
        |  FROM u),
        |b AS (SELECT lower(trim(dom)) AS dom FROM (VALUES
        |  ('src1.example.com'), ('src3.example.com'),
        |  ('ads.src1.example.com'), ('tracker.net'),
        |  (' SRC5.EXAMPLE.COM ')) AS t(dom)),
        |s AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h),
        |m AS (
        |  SELECT s.doc_id, s.host, b.dom
        |  FROM s LEFT JOIN b
        |    ON list_contains(
        |      [array_to_string(ls[i:], '.') FOR i IN range(1, len(ls) + 1)],
        |      b.dom))
        |SELECT doc_id, host, max_by(dom, length(dom)) AS blocked_by
        |FROM m GROUP BY doc_id, host ORDER BY doc_id""".stripMargin,

    // incremental-DSIR replay: model fit restricted to the reference
    // pool (ALL 256 buckets, Laplace default for fit-unseen), batch
    // scored against it — same FNV buckets, same 9-dp log-ratios,
    // same decimal count-weighted sums
    "x_importance_incr" ->
      s"""WITH ftok AS (
         |  SELECT (lang = 'en') AS tgt,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents WHERE doc_id < 400),
         |fhb AS (
         |  SELECT tgt,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM ftok WHERE term <> ''),
         |rawb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM fhb GROUP BY 1),
         |tgtb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM fhb WHERE tgt GROUP BY 1),
         |tot AS (
         |  SELECT (SELECT coalesce(sum(cr), 0) FROM rawb) AS rtot,
         |    (SELECT coalesce(sum(ct), 0) FROM tgtb) AS ttot),
         |allb AS (SELECT unnest(range(0, 256)) AS bucket),
         |lrs AS (
         |  SELECT allb.bucket,
         |    round(ln((coalesce(ct, 0) + 1.0) / (ttot + 256.0))
         |        - ln((coalesce(cr, 0) + 1.0) / (rtot + 256.0)), 9) AS lr
         |  FROM allb LEFT JOIN rawb USING (bucket)
         |    LEFT JOIN tgtb USING (bucket), tot),
         |btok AS (
         |  SELECT doc_id,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM documents WHERE doc_id >= 400),
         |bhb AS (
         |  SELECT doc_id,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM btok WHERE term <> ''),
         |pb AS (SELECT doc_id, bucket, count(*) AS c FROM bhb GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, sum(c) AS n_tokens,
         |    round(CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(lr AS DECIMAL(18,12))) AS DOUBLE), 6) AS weight
         |  FROM pb JOIN lrs USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id AS id,
         |  CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens, per.weight
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
         |WHERE d.doc_id >= 400
         |ORDER BY id""".stripMargin,

    // the oracle asserts the EXPECTED canonical form as a literal — if
    // the engine's canonicalization of any messy variant deviates, the
    // group membership or the emitted canon string mismatches
    "x_url_dedup" ->
      """WITH c AS (
        |  SELECT doc_id, n_chars,
        |    'https://site.com/P/' || CAST(doc_id % 50 AS VARCHAR) AS url_canon
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, url_canon, n_chars,
        |    row_number() OVER (PARTITION BY url_canon
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM c)
        |SELECT doc_id, url_canon, n_chars FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    // whole-chain replay: blocklist anti-filter → quality score →
    // source-cap window → DSIR (models fit on the CAPPED pool) → top-50
    "x_selection_e2e" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://' || (CASE doc_id % 4
         |      WHEN 0 THEN 'ads.' || source || '.example.com'
         |      WHEN 1 THEN 'WWW.' || source || '.Example.COM:8080'
         |      WHEN 2 THEN 'shop' || source || '.example.com'
         |      ELSE 'cdn.tracker.net' END)
         |    || '/p/' || CAST(doc_id AS VARCHAR) AS url
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_extract(lower(trim(url)),
         |                       '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1),
         |        '^.*@|:[0-9]*$$', '', 'g'),
         |      '\\.$$', '') AS host
         |  FROM u),
         |bl AS (SELECT lower(trim(dom)) AS dom FROM (VALUES
         |  ('src1.example.com'), ('src3.example.com'),
         |  ('ads.src1.example.com'), ('tracker.net'),
         |  (' SRC5.EXAMPLE.COM ')) AS t(dom)),
         |blocked AS (
         |  SELECT DISTINCT hs.doc_id
         |  FROM (SELECT doc_id, string_split(host, '.') AS ls FROM h) hs
         |  JOIN bl ON list_contains(
         |    [array_to_string(ls[i:], '.') FOR i IN range(1, len(ls) + 1)],
         |    bl.dom)),
         |surv0 AS (
         |  SELECT * FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM blocked)),
         |base AS (
         |  SELECT doc_id, length(text) AS len,
         |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha,
         |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
         |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |      x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'))) AS DOUBLE)
         |      / greatest(CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE), 1.0) AS stop
         |  FROM surv0),
         |parts AS (
         |  SELECT doc_id,
         |    CASE WHEN len BETWEEN 50 AND 100000 THEN 1.0 WHEN len BETWEEN 10 AND 49 THEN 0.5 ELSE 0.0 END AS len_ok,
         |    CASE WHEN alpha >= 0.6 THEN 1.0 WHEN alpha >= 0.3 THEN 0.5 ELSE 0.0 END AS alpha_ok,
         |    CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
         |    CASE WHEN stop >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok
         |  FROM base),
         |qd AS (
         |  SELECT s0.doc_id, s0.text, s0.lang, s0.source, s0.n_chars
         |  FROM surv0 s0 JOIN parts p ON s0.doc_id = p.doc_id
         |  WHERE round(p.len_ok * 0.3 + p.alpha_ok * 0.3 + p.punct_ok * 0.2 + p.stop_ok * 0.2, 2) >= 0.5),
         |pool AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT qd.*, row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id ASC) AS rn FROM qd)
         |  WHERE rn <= 15),
         |tok AS (
         |  SELECT doc_id, (lang = 'en') AS tgt,
         |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |  FROM pool),
         |tk AS (SELECT doc_id, tgt, term FROM tok WHERE term <> ''),
         |hb AS (
         |  SELECT doc_id, tgt,
         |    ((${signedSql(fnvSql("term"))} % 256) + 256) % 256 AS bucket
         |  FROM tk),
         |pdb AS (SELECT doc_id, tgt, bucket, count(*) AS c FROM hb GROUP BY 1, 2, 3),
         |rawb AS (SELECT bucket, sum(c) AS cr FROM pdb GROUP BY 1),
         |tgtb AS (SELECT bucket, sum(c) AS ct FROM pdb WHERE tgt GROUP BY 1),
         |tot AS (
         |  SELECT sum(cr) AS rtot,
         |    (SELECT coalesce(sum(ct), 0) FROM tgtb) AS ttot
         |  FROM rawb),
         |lrs AS (
         |  SELECT rawb.bucket,
         |    round(ln((coalesce(ct, 0) + 1.0) / (ttot + 256.0))
         |        - ln((cr + 1.0) / (rtot + 256.0)), 9) AS lr
         |  FROM rawb LEFT JOIN tgtb USING (bucket), tot),
         |per AS (
         |  SELECT doc_id, sum(c) AS n_tokens,
         |    round(CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(lr AS DECIMAL(18,12))) AS DOUBLE), 6) AS weight
         |  FROM (SELECT doc_id, bucket, sum(c) AS c FROM pdb GROUP BY 1, 2) pb
         |  JOIN lrs USING (bucket) GROUP BY doc_id),
         |sel AS (
         |  SELECT doc_id, n_tokens, weight FROM per
         |  WHERE weight IS NOT NULL
         |  ORDER BY weight DESC, doc_id ASC LIMIT 50)
         |SELECT sel.doc_id AS id, d.lang,
         |  CAST(sel.n_tokens AS BIGINT) AS n_tokens, sel.weight
         |FROM sel JOIN documents d ON sel.doc_id = d.doc_id
         |ORDER BY id""".stripMargin,
  )
}
