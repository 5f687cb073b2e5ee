package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — text quality, tokenization, and language-model corpus ops.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesText {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bigram_lp" -> ((s, d) =>
      // corpus-self-trained bigram predictability score (exact KenLM-
      // style quality cut) — boilerplate scores high, noise low
      graft.ext.TextOps.bigramLogProb(t(s, d, "documents"), "text", "doc_id")
        .orderBy("id")),

    "x_chunks" -> ((s, d) =>
      // context-window chunking (40 tokens, 10 overlap — sized so the
      // synthetic 10-99-token docs split into 1-3 chunks): shuffle-free
      // explode+slice; chunks ship as portable FNV hashes so the
      // oracle can audit exact boundaries without dumping text
      graft.ext.TextOps.chunkTokens(t(s, d, "documents"), "text", "doc_id",
          chunkTokens = 40, overlap = 10)
        .select(col("doc_id"), col("chunk_id"), col("n_tok"),
          graft.functions.VectorExpressions.fnv1a64(col("chunk_text")).as("chunk_fnv"))
        .orderBy("doc_id", "chunk_id")),

    // ---- ext: text analysis ----
    "x_text_stats" -> ((s, d) =>
      t(s, d, "documents").select(
          col("doc_id"),
          TextOps.tokenCountWs(col("text")).as("n_tokens"),
          TextOps.charCount(col("text")).as("n_chars_m"),
          round(TextOps.alphaRatio(col("text")), 6).as("alpha_ratio"))
        .orderBy("doc_id")),

    "x_langid" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), col("lang"),
          TextOps.langIdGuess(col("text")).as("lang_guess"))
        .orderBy("doc_id")),

    "x_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "x_line_dedup" -> ((s, d) => {
      // CCNet-style LINE-level boilerplate removal, oracle-replayed end
      // to end. The synthetic corpus is single-line, so multi-line PAGES
      // are synthesized engine-side — 5 consecutive docs joined by
      // newlines between an injected nav header and copyright footer
      // (both engines replay the construction, the synthesized-PII
      // recipe) — then dedupLines(maxDf=1) must strip the header/footer
      // from EVERY page plus any content line whose doc text repeats
      // across pages (the corpus's planted exact dups). Kept text ships
      // as a portable FNV so the oracle audits exact reassembly
      // (order, blank handling) without dumping page text.
      val pages = t(s, d, "documents")
        .groupBy((col("doc_id") / lit(5)).cast("long").as("page_id"))
        .agg(concat_ws("\n",
          lit("SITE NAV HEADER"),
          concat_ws("\n",
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text"))),
          lit("COPYRIGHT FOOTER")).as("text"))
      TextOps.dedupLines(pages, "text", "page_id", maxDf = 1)
        .select(col("id").as("page_id"), col("n_lines"), col("n_kept"),
          graft.functions.VectorExpressions
            .fnv1a64(coalesce(col("text_kept"), lit(""))).as("kept_fnv"))
        .orderBy("page_id")
    }),

    "x_domain_quality" -> ((s, d) =>
      // per-source curation rollup: the keep/review decision table a
      // corpus curator reads per domain — doc counts, exact decimal-
      // accumulated mean quality, char volume. The per-doc score is the
      // same expression x_quality replays; scores are multiples of
      // 0.05, so the decimal sum is exact and the mean is one IEEE
      // division on both engines.
      t(s, d, "documents")
        .select(col("source"), col("n_chars"),
          TextOps.qualityScore(col("text")).as("q"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("q").cast("decimal(18,2)")).cast("double") / count(lit(1)), 6)
            .as("avg_quality"),
          sum(col("n_chars")).as("total_chars"))
        .withColumn("verdict",
          when(col("avg_quality") >= 0.5, lit("keep")).otherwise(lit("review")))
        .orderBy("source")),

    "x_repetition" -> ((s, d) =>
      // Gopher-style repetition filters: top-token / top-bigram /
      // duplicate-bigram fractions per doc
      TextOps.repetitionStats(t(s, d, "documents"), "text", "doc_id", n = 2)
        .select(col("id").as("doc_id"), col("top_token_frac"),
          col("top_ngram_frac"), col("dup_ngram_frac"))
        .orderBy("doc_id")),

    "x_pii_redact" -> ((s, d) =>
      // PII scrub over text with synthesized (deterministic) email /
      // phone / IPv4 — both sides inject the same PII, so the redaction
      // semantics are fully oracle-checked (same recipe as q41's
      // synthesized escapes)
      t(s, d, "documents")
        .withColumn("dirty", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1 555 01"),
          col("doc_id"), lit(" at 10.0."), pmod(col("doc_id"), lit(256)), lit(".7")))
        .select(col("doc_id"), TextOps.redactPii(col("dirty")).as("clean"))
        .orderBy("doc_id")),

    "x_bpe_tokens" -> ((s, d) =>
      // the lookaround boundary-split equals maximal-run extraction on
      // ASCII text, which the oracle can express without lookarounds
      t(s, d, "documents").select(col("doc_id"),
          TextOps.tokenCountBpeIsh(col("text")).as("n_bpe_ish"))
        .orderBy("doc_id")),

    "x_fertility" -> ((s, d) =>
      // tokenizer fertility per language (subword tokens per word +
      // chars per token — the multilingual tokenizer-parity readout;
      // high-fertility languages pay more context budget per word):
      // one narrow map with the BPE-ish and whitespace kernels, one
      // lang-keyed hash agg, exact integer ratios rounded once
      t(s, d, "documents")
        .select(col("lang"),
          TextOps.tokenCountBpeIsh(col("text")).cast("long").as("nb"),
          TextOps.tokenCountWs(col("text")).cast("long").as("nw"),
          length(col("text")).cast("long").as("nc"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nb")).as("bpe_tokens"), sum(col("nw")).as("words"),
          when(sum(col("nw")) > 0,
            round(sum(col("nb")).cast("double") / sum(col("nw")), 6))
            .as("fertility"),
          when(sum(col("nb")) > 0,
            round(sum(col("nc")).cast("double") / sum(col("nb")), 6))
            .as("chars_per_token"))
        .orderBy("lang")),

    "x_bpe_merges" -> ((s, d) =>
      // BPE TRAINING's counting step: corpus-wide adjacent char pairs
      // inside words, top-50 merge candidates — alphabet²-bounded
      // aggregation, rank window over the already-limited 50 rows
      TextOps.bpePairCounts(t(s, d, "documents"), "text", topK = 50)
        .orderBy("rank")),

    "x_keyterms" -> ((s, d) =>
      // per-doc top-3 distinctive terms by smoothed TF-IDF — the
      // document-labeling complement of x_bm25_search; df computed as a
      // window over the tf frame (explode runs once — see Search.bm25)
      graft.ext.Search.keyTerms(t(s, d, "documents"), "text", "doc_id", topK = 3)
        .select(col("id").as("doc_id"), col("term"), col("score"), col("rank"))
        .orderBy("doc_id", "rank")),

    "x_unigram_logprob" -> ((s, d) =>
      // model-free LM quality signal: per-doc mean unigram log-prob
      // under the corpus' own distribution (decimal-accumulated ln —
      // deterministic at any parallelism)
      graft.ext.Corpus.unigramLogProb(t(s, d, "documents"), "text", "doc_id")
        .orderBy("id")),

    "x_ppl_buckets" -> ((s, d) =>
      // CCNet head/middle/tail perplexity split: tercile thresholds by
      // the discrete-percentile rule over DISTINCT 6-dp scores (the
      // bounded global-window class), bucket assignment broadcast
      graft.ext.Corpus.pplBuckets(t(s, d, "documents"), "text", "doc_id")
        .orderBy("id")),

    "x_ppl_buckets_lang" -> ((s, d) =>
      // the per-LANGUAGE form CCNet ships (§4.4): terciles per lang —
      // the cumulative window is PARTITIONED by group, thresholds ride
      // back as a |langs|-row broadcast
      graft.ext.Corpus.pplBucketsBy(t(s, d, "documents"), "text", "doc_id",
          "lang")
        .orderBy("id")),

    "x_collocations" -> ((s, d) =>
      // PMI collocations over the corpus: narrow zip_with bigrams, one
      // hash agg per n-gram order, marginals join on the Heaps-bounded
      // vocabulary, ONE ln per surviving pair from exact integer
      // counts — the "new york" phrase detector
      graft.ext.Corpus.collocations(
        t(s, d, "documents"), "text", topK = 50, minCount = 5)),

    "x_gopher_filter" -> ((s, d) =>
      // composite Gopher quality verdict (Rae et al. 2021 Table A1):
      // per-rule metrics + all-rules pass flag, all codegen'd column
      // arithmetic — the inline quality cut of a pre-training ingest
      TextOps.gopherFilter(t(s, d, "documents"), "text", "doc_id")
        .orderBy("doc_id")),

    "x_vocab_topk" -> ((s, d) =>
      // corpus vocabulary: top-100 words with rank + cumulative
      // coverage — tokenizer-training prep; ties rank by word
      graft.ext.Corpus.vocabulary(t(s, d, "documents"), "text", topK = 100)
        .orderBy("rank")),
  )

  val oracles: Map[String, String] = Map(
    "x_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents),
        |tokc AS (SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY doc_id, t),
        |toks AS (
        |  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_token_frac
        |  FROM tokc GROUP BY doc_id),
        |d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
        |ngr AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS s
        |  FROM d),
        |ngrc AS (SELECT doc_id, s, count(*) AS c FROM ngr GROUP BY doc_id, s),
        |ngrs AS (
        |  SELECT doc_id,
        |    round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_ngram_frac,
        |    round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS dup_ngram_frac
        |  FROM ngrc GROUP BY doc_id)
        |SELECT doc.doc_id, toks.top_token_frac, ngrs.top_ngram_frac, ngrs.dup_ngram_frac
        |FROM documents doc
        |LEFT JOIN toks ON doc.doc_id = toks.doc_id
        |LEFT JOIN ngrs ON doc.doc_id = ngrs.doc_id
        |ORDER BY doc.doc_id""".stripMargin,

    // same deterministic PII injection, same RE2-safe patterns with 'g'
    "x_pii_redact" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1 555 01' || doc_id
        |      || ' at 10.0.' || (doc_id % 256) || '.7' AS d
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(d, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS clean
        |FROM dirty ORDER BY doc_id""".stripMargin,

    // the boundary-split tokens ARE the maximal alnum / non-alnum-non-
    // space runs (exact on ASCII; lookarounds not needed to count runs)
    // fertility replay: the same ASCII maximal-run equivalence the
    // x_bpe_tokens oracle uses, whitespace words, exact sum ratios
    "x_fertility" ->
      """WITH per AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9[:space:]]+')) AS BIGINT) AS nb,
        |    CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS nw,
        |    CAST(length(text) AS BIGINT) AS nc
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nb) AS BIGINT) AS bpe_tokens, CAST(sum(nw) AS BIGINT) AS words,
        |  CASE WHEN sum(nw) > 0 THEN round(CAST(sum(nb) AS DOUBLE) / sum(nw), 6) END AS fertility,
        |  CASE WHEN sum(nb) > 0 THEN round(CAST(sum(nc) AS DOUBLE) / sum(nb), 6) END AS chars_per_token
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

    "x_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9[:space:]]+')) AS INTEGER) AS n_bpe_ish
        |FROM documents ORDER BY doc_id""".stripMargin,

    // BPE pair-count replay: same word split, same per-word length-2
    // substrings (substr is codepoint-based on both engines; the
    // corpus is ASCII), same (cnt DESC, pair ASC) tie-break
    "x_bpe_merges" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |w2 AS (SELECT w FROM w WHERE length(w) >= 2),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
        |  FROM w2),
        |c AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY pair),
        |r AS (
        |  SELECT pair, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rank
        |  FROM c)
        |SELECT pair, cnt, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,

    "x_langid" ->
      """WITH p AS (
        |  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    (length(t) - length(replace(t, ' the ', ''))) / 5 + (length(t) - length(replace(t, ' and ', ''))) / 5
        |      + (length(t) - length(replace(t, ' of ', ''))) / 4 + (length(t) - length(replace(t, ' is ', ''))) / 4
        |      + (length(t) - length(replace(t, ' to ', ''))) / 4 AS s_en,
        |    (length(t) - length(replace(t, ' der ', ''))) / 5 + (length(t) - length(replace(t, ' die ', ''))) / 5
        |      + (length(t) - length(replace(t, ' und ', ''))) / 5 + (length(t) - length(replace(t, ' ist ', ''))) / 5
        |      + (length(t) - length(replace(t, ' das ', ''))) / 5 AS s_de,
        |    (length(t) - length(replace(t, ' le ', ''))) / 4 + (length(t) - length(replace(t, ' la ', ''))) / 4
        |      + (length(t) - length(replace(t, ' et ', ''))) / 4 + (length(t) - length(replace(t, ' est ', ''))) / 5
        |      + (length(t) - length(replace(t, ' les ', ''))) / 5 AS s_fr,
        |    (length(t) - length(replace(t, ' el ', ''))) / 4 + (length(t) - length(replace(t, ' la ', ''))) / 4
        |      + (length(t) - length(replace(t, ' y ', ''))) / 3 + (length(t) - length(replace(t, ' es ', ''))) / 4
        |      + (length(t) - length(replace(t, ' los ', ''))) / 5 AS s_es,
        |    (length(t) - length(replace(t, '的', ''))) / 1 + (length(t) - length(replace(t, '是', ''))) / 1
        |      + (length(t) - length(replace(t, '了', ''))) / 1 + (length(t) - length(replace(t, '在', ''))) / 1
        |      + (length(t) - length(replace(t, '我', ''))) / 1 AS s_zh
        |  FROM p)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) <= 0 THEN 'und'
        |       WHEN s_zh = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'zh'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
        |       WHEN s_es = greatest(s_de, s_en, s_es) THEN 'es'
        |       WHEN s_en = greatest(s_de, s_en) THEN 'en'
        |       ELSE 'de' END AS lang_guess
        |FROM scored ORDER BY doc_id""".stripMargin,

    "x_quality" ->
      """WITH base AS (
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
        |  FROM base)
        |SELECT doc_id, round(len_ok * 0.3 + alpha_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.2, 2) AS quality
        |FROM parts ORDER BY doc_id""".stripMargin,

    "x_line_dedup" ->
      s"""WITH pages AS (
        |  SELECT doc_id // 5 AS page_id,
        |    'SITE NAV HEADER' || chr(10) ||
        |    string_agg(text, chr(10) ORDER BY doc_id) || chr(10) ||
        |    'COPYRIGHT FOOTER' AS text
        |  FROM documents GROUP BY 1),
        |ln AS (
        |  SELECT page_id, ls, unnest(range(1, len(ls) + 1)) AS pos
        |  FROM (SELECT page_id, string_split(text, chr(10)) AS ls FROM pages)),
        |l AS (SELECT page_id, pos, trim(ls[pos]) AS k, ls[pos] AS line FROM ln),
        |df AS (
        |  SELECT k, count(DISTINCT page_id) AS line_df
        |  FROM l WHERE length(k) > 0 GROUP BY k),
        |kept AS (
        |  SELECT l.page_id, l.pos, l.line FROM l LEFT JOIN df ON l.k = df.k
        |  WHERE length(l.k) = 0 OR df.line_df <= 1),
        |reb AS (
        |  SELECT page_id, count(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY pos) AS text_kept
        |  FROM kept GROUP BY page_id),
        |tot AS (SELECT page_id, count(*) AS n_lines FROM l GROUP BY page_id),
        |fin AS (
        |  SELECT t.page_id, t.n_lines, coalesce(r.n_kept, 0) AS n_kept,
        |    ${fnvSql("(coalesce(r.text_kept, ''))")} AS hu
        |  FROM tot t LEFT JOIN reb r USING (page_id))
        |SELECT page_id, n_lines, n_kept, ${signedSql("hu")} AS kept_fnv
        |FROM fin ORDER BY page_id""".stripMargin,

    "x_domain_quality" ->
      """WITH base AS (
        |  SELECT doc_id, source, n_chars, length(text) AS len,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS alpha,
        |    CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'))) AS DOUBLE)
        |      / greatest(CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE), 1.0) AS stop
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, source, n_chars,
        |    CASE WHEN len BETWEEN 50 AND 100000 THEN 1.0 WHEN len BETWEEN 10 AND 49 THEN 0.5 ELSE 0.0 END AS len_ok,
        |    CASE WHEN alpha >= 0.6 THEN 1.0 WHEN alpha >= 0.3 THEN 0.5 ELSE 0.0 END AS alpha_ok,
        |    CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END AS punct_ok,
        |    CASE WHEN stop >= 0.05 THEN 1.0 ELSE 0.0 END AS stop_ok
        |  FROM base),
        |q AS (
        |  SELECT source, n_chars,
        |    round(len_ok * 0.3 + alpha_ok * 0.3 + punct_ok * 0.2 + stop_ok * 0.2, 2) AS quality
        |  FROM parts),
        |agg AS (
        |  SELECT source, count(*) AS n_docs,
        |    round(CAST(sum(CAST(quality AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_quality,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM q GROUP BY source)
        |SELECT source, n_docs, avg_quality, total_chars,
        |  CASE WHEN avg_quality >= 0.5 THEN 'keep' ELSE 'review' END AS verdict
        |FROM agg ORDER BY source""".stripMargin,

    "x_text_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) END AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_m,
        |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |        / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS alpha_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ln matches Java bit-for-bit; the mean accumulates ln values in
    // DECIMAL on both sides (partial-agg order independence)
    "x_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |j AS (
        |  SELECT tk.doc_id, ln(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lnp
        |  FROM tk JOIN c USING (term), t),
        |per AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    round(CAST(sum(CAST(lnp AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean_lnp
        |  FROM j GROUP BY doc_id)
        |SELECT d.doc_id AS id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  per.mean_lnp
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |ORDER BY id""".stripMargin,

    // CCNet tercile replay: the unigram CTEs verbatim, then the same
    // discrete-percentile thresholds over DISTINCT score values and
    // the same boundary rule (<= t33 tail, <= t67 middle, else head)
    "x_ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |j AS (
        |  SELECT tk.doc_id, ln(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lnp
        |  FROM tk JOIN c USING (term), t),
        |per AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    round(CAST(sum(CAST(lnp AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean_lnp
        |  FROM j GROUP BY doc_id),
        |g AS (SELECT mean_lnp AS v, CAST(count(*) AS BIGINT) AS cc FROM per GROUP BY mean_lnp),
        |cum AS (
        |  SELECT v, sum(cc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
        |    (SELECT sum(cc) FROM g) AS n
        |  FROM g),
        |th AS (
        |  SELECT min(CASE WHEN cm >= ceil(n / 3.0) THEN v END) AS t33,
        |    min(CASE WHEN cm >= ceil(n * 2.0 / 3.0) THEN v END) AS t67
        |  FROM cum)
        |SELECT d.doc_id AS id, CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  per.mean_lnp,
        |  CASE WHEN per.mean_lnp IS NULL THEN NULL
        |       WHEN per.mean_lnp <= th.t33 THEN 'tail'
        |       WHEN per.mean_lnp <= th.t67 THEN 'middle'
        |       ELSE 'head' END AS bucket
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id CROSS JOIN th
        |ORDER BY id""".stripMargin,

    // per-language tercile replay: the same unigram CTEs, cumulative
    // counts PARTITIONED by lang, per-lang thresholds joined back
    "x_ppl_buckets_lang" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |c AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |j AS (
        |  SELECT tk.doc_id, ln(CAST(c.cnt AS DOUBLE) / CAST(t.total AS DOUBLE)) AS lnp
        |  FROM tk JOIN c USING (term), t),
        |per AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    round(CAST(sum(CAST(lnp AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean_lnp
        |  FROM j GROUP BY doc_id),
        |pl AS (
        |  SELECT d.lang AS by, per.mean_lnp AS v
        |  FROM per JOIN documents d USING (doc_id)
        |  WHERE per.mean_lnp IS NOT NULL),
        |g AS (SELECT by, v, CAST(count(*) AS BIGINT) AS cc FROM pl GROUP BY by, v),
        |cum AS (
        |  SELECT by, v,
        |    sum(cc) OVER (PARTITION BY by ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM g),
        |tot AS (SELECT by, sum(cc) AS n FROM g GROUP BY by),
        |th AS (
        |  SELECT cum.by,
        |    min(CASE WHEN cm >= ceil(n / 3.0) THEN v END) AS t33,
        |    min(CASE WHEN cm >= ceil(n * 2.0 / 3.0) THEN v END) AS t67
        |  FROM cum JOIN tot USING (by) GROUP BY cum.by)
        |SELECT d.doc_id AS id, d.lang AS by,
        |  CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens, per.mean_lnp,
        |  CASE WHEN per.mean_lnp IS NULL THEN NULL
        |       WHEN per.mean_lnp <= th.t33 THEN 'tail'
        |       WHEN per.mean_lnp <= th.t67 THEN 'middle'
        |       ELSE 'head' END AS bucket
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |LEFT JOIN th ON th.by = d.lang
        |ORDER BY id""".stripMargin,

    // PMI replay: same tokenization, bigrams via range()+list_transform
    // (the DuckDB-1.0-safe lateral); ln differs from Java's in the
    // last ulp, so the 6-dp presentation replays Spark's HALF_UP round
    // via the VARCHAR->DECIMAL(38,30) trick
    "x_collocations" ->
      """WITH d AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS w
        |  FROM documents),
        |uc AS (
        |  SELECT word, count(*) AS c_w
        |  FROM (SELECT unnest(w) AS word FROM d) GROUP BY word),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i + 1])) AS b
        |  FROM d WHERE len(w) >= 2),
        |bc AS (
        |  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
        |    count(*) AS c_ab
        |  FROM bg GROUP BY 1, 2),
        |t AS (SELECT (SELECT CAST(sum(c_w) AS BIGINT) FROM uc) AS n_uni,
        |             (SELECT CAST(sum(c_ab) AS BIGINT) FROM bc) AS n_bi)
        |SELECT w1, w2, c_ab, a.c_w AS c_a, b2.c_w AS c_b,
        |  CAST(round(CAST(CAST(
        |    ln((CAST(c_ab AS DOUBLE) * CAST(n_uni AS DOUBLE) * CAST(n_uni AS DOUBLE)) /
        |       (CAST(n_bi AS DOUBLE) * CAST(a.c_w AS DOUBLE) * CAST(b2.c_w AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(38,30)), 6) AS DOUBLE) AS pmi
        |FROM bc JOIN uc a ON bc.w1 = a.word JOIN uc b2 ON bc.w2 = b2.word
        |CROSS JOIN t
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 50""".stripMargin,

    // smoothed TF-IDF replay — ln() matches Java's bit-for-bit (proven
    // by the bm25 oracle); ties rank by term on both sides
    "x_keyterms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term),
        |d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)) AS score
        |  FROM tf JOIN d USING (term), n),
        |r AS (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rank
        |  FROM s)
        |SELECT doc_id, term, round(score, 6) AS score, rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // full Gopher-rule replay: same tokenizer, same regex counters
    // (RE2-safe patterns — identical counts under Java regex and RE2)
    "x_gopher_filter" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS n_words,
        |    length(regexp_replace(text, '\s', '', 'g')) AS nsc,
        |    length(text) - length(replace(text, '#', '')) AS hashes,
        |    CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3
        |      + (length(text) - length(replace(text, '…', ''))) AS ells,
        |    len(string_split(text, chr(10))) AS n_lines,
        |    len(regexp_extract_all(text, '(^|\n)[ \t]*[-•*]')) AS bullet_lines,
        |    len(regexp_extract_all(text, '(\.\.\.|…)[ \t]*(\n|$)')) AS ell_lines,
        |    len(regexp_extract_all(text, '(^|\s)\S*\p{L}\S*')) AS alpha_words,
        |    CAST(len(list_intersect(
        |      list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> ''),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words > 0 THEN CAST(nsc AS DOUBLE) / n_words END AS mean_word_len,
        |    CASE WHEN n_words > 0 THEN (hashes + ells) / n_words END AS symbol_ratio,
        |    CAST(bullet_lines AS DOUBLE) / n_lines AS bullet_frac,
        |    CAST(ell_lines AS DOUBLE) / n_lines AS ellipsis_frac,
        |    CASE WHEN n_words > 0 THEN CAST(alpha_words AS DOUBLE) / n_words END AS alpha_word_frac,
        |    stop_hits
        |  FROM m)
        |SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
        |  round(symbol_ratio, 6) AS symbol_ratio,
        |  round(bullet_frac, 6) AS bullet_frac,
        |  round(ellipsis_frac, 6) AS ellipsis_frac,
        |  round(alpha_word_frac, 6) AS alpha_word_frac, stop_hits,
        |  coalesce(n_words BETWEEN 50 AND 100000
        |    AND mean_word_len BETWEEN 3 AND 10 AND symbol_ratio < 0.1
        |    AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
        |    AND alpha_word_frac > 0.8 AND stop_hits >= 2, false) AS passes
        |FROM r ORDER BY doc_id""".stripMargin,

    "x_vocab_topk" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
        |t AS (SELECT sum(cnt) AS total FROM c),
        |r AS (
        |  SELECT word, cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rank,
        |    sum(cnt) OVER (ORDER BY cnt DESC, word ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c)
        |SELECT word, cnt, rank,
        |  round(CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS cum_frac
        |FROM r, t WHERE rank <= 100 ORDER BY rank""".stripMargin,

    // the oracle replays the kernel's exact left-to-right double
    // accumulation (list_transform + list_sum), so the threshold
    // decision is bit-identical — same pattern as x_embed_neardup
    // bigram-LM replay: same lowercased shingles, c(w1 w2)/c(w1·) MLE,
    // ln rounded to 9 before the decimal mean
    "x_bigram_lp" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS b
        |  FROM d),
        |cb AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
        |cu AS (SELECT string_split(b, ' ')[1] AS w1, count(*) AS cu FROM bg GROUP BY 1),
        |t AS (
        |  SELECT bg.doc_id, round(ln(CAST(cb.cb AS DOUBLE) / cu.cu), 9) AS term
        |  FROM bg JOIN cb ON bg.b = cb.b
        |  JOIN cu ON string_split(bg.b, ' ')[1] = cu.w1)
        |SELECT doc_id AS id, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(term AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6) AS mean_lp
        |FROM t GROUP BY doc_id ORDER BY id""".stripMargin,

    // chunk-boundary replay: same whitespace split, same integer chunk
    // count, same 1-based 40-token slices at stride 30
    "x_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents WHERE length(trim(text)) > 0),
         |n AS (SELECT doc_id, w, len(w) AS n FROM d),
         |k AS (
         |  SELECT doc_id, w, n,
         |    CASE WHEN n <= 40 THEN 1 ELSE 1 + (n - 40 + 29) // 30 END AS nk
         |  FROM n),
         |ch AS (SELECT doc_id, w, unnest(range(0, nk)) AS chunk_id FROM k),
         |sl AS (
         |  SELECT doc_id, chunk_id,
         |    w[chunk_id * 30 + 1 : chunk_id * 30 + 40] AS cw
         |  FROM ch),
         |o AS (
         |  SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_tok,
         |    ${fnvSql("(array_to_string(cw, ' '))")} AS hu
         |  FROM sl)
         |SELECT doc_id, chunk_id, n_tok, ${signedSql("hu")} AS chunk_fnv
         |FROM o ORDER BY doc_id, chunk_id""".stripMargin,
  )
}
