package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — text/embedding near-duplicate detection and decontamination.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesDedup {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ext: dedup ----
    "x_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "text", "doc_id")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")),

    "x_dedup_exact_best" -> ((s, d) =>
      // quality-first representative: keep the LONGEST duplicate (by
      // n_chars), ties to min doc_id
      Dedup.exactKeepBest(t(s, d, "documents"), "text", "doc_id", "n_chars")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")),

    "x_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    "x_dedup_clusters" -> ((s, d) => {
      // near-dup CLUSTER resolution: pairs (n-gram jaccard) → connected
      // components (min-label propagation) → per-doc cluster id + size.
      // The step that turns pairwise similarity into deduplicatable
      // groups (transitive: A~B, B~C clusters A,B,C together even when
      // A≁C). The oracle replays it with a recursive CTE.
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.jaccardPairs(docs, "text", "doc_id",
        shingleSize = 3, threshold = 0.5)
      val cc = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select("doc_id"))
      import org.apache.spark.sql.expressions.Window
      cc.select(col("id").as("doc_id"), col("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    }),

    "x_dedup_minhash" -> ((s, d) =>
      // portable FNV-1a signatures — the oracle replays the FULL LSH
      // pipeline (signatures, banding, bucket join, est_jaccard)
      Dedup.minhashNearDups(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    "x_dedup_incremental" -> ((s, d) => {
      // cross-run near-dedup: an incoming batch (doc_id 200–299)
      // LSH-joined against the existing corpus store (doc_id < 200) —
      // the daily-ingest shape; no store self-join
      val docs = t(s, d, "documents")
      Dedup.minhashNearDupsAgainst(
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 300),
          docs.filter(col("doc_id") < 200),
          "text", "doc_id", shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
        .orderBy("id_new", "id_store")
    }),

    "x_dedup_simhash" -> ((s, d) =>
      // rotations=8 × prefixBits=8 = 8 disjoint blocks → EXACT for
      // hamming ≤ 7 (pigeonhole), so the oracle is brute-force all-pairs
      Dedup.simhashNearDups(
          t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, maxHamming = 7, prefixBits = 8,
          rotations = 8)
        .orderBy("id_a", "id_b")),

    "x_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    "x_embed_neardup" -> ((s, d) =>
      Dedup.embeddingNearDups(
          t(s, d, "embeddings").filter(col("vec_id") < 300),
          "embedding", "vec_id", threshold = 0.4)
        .orderBy("id_a", "id_b")),

    "x_embed_neardup_incr" -> ((s, d) => {
      // ORACLE-GATED quality verdict for the incremental path: an
      // incoming embedding batch (vec_id ≥ 400) probed against the
      // corpus store (vec_id < 400). The exact batch×store pair set is
      // recomputed engine-side on a bounded slice (store capped by
      // construction, batch capped at 300 ids) and the IVF-probed pairs
      // must reach 90% recall with zero false positives on that slice
      val e = t(s, d, "embeddings")
      val batch = e.filter(col("vec_id") >= 400 && col("vec_id") < 700)
      val store = e.filter(col("vec_id") < 400)
      val got = Dedup.embeddingNearDupsAgainst(
          batch, store, "embedding", "vec_id",
          threshold = 0.4, nCells = 16, nProbe = 10)
        .select(col("id_new"), col("id_store"))
      // exact pairs: broadcast the bounded store side, verify with the
      // same codegen cosine — a BNL join over ≤400 stored vectors
      val exact = batch.select(col("vec_id").as("id_new"), col("embedding").as("vn"))
        .crossJoin(broadcast(
          store.select(col("vec_id").as("id_store"), col("embedding").as("vs"))))
        .filter(graft.functions.VectorExpressions.cosineF(col("vn"), col("vs")) >= 0.4)
        .select(col("id_new"), col("id_store"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nGot = got.agg(count(lit(1)).as("n_got"))
      val nInter = got.join(exact, Seq("id_new", "id_store")).agg(count(lit(1)).as("n_inter"))
      nInter.crossJoin(broadcast(nExact)).crossJoin(broadcast(nGot))
        .select(explode(array(
          struct(lit("incr_recall_ge_090").as("check_name"),
            (col("n_inter").cast("double") / col("n_exact") >= 0.9).as("ok")),
          struct(lit("incr_no_false_positives").as("check_name"),
            (col("n_inter") === col("n_got")).as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")
    }),

    "x_embed_neardup_bucketed" -> ((s, d) => {
      // ORACLE-GATED quality verdict for the bucketed near-dup path:
      // runs the FULL embeddings table (no cap) through IVF cell
      // bucketing, then grades the found pairs on a bounded slice
      // (both ids < 300) against the exact all-pairs operator — 90%
      // recall, zero false positives (the exact-verify stage makes
      // precision 1.0 by construction; the verdict proves it)
      val e = t(s, d, "embeddings")
      val got = Dedup.embeddingNearDupsBucketed(
          e, "embedding", "vec_id", threshold = 0.4, nCells = 16, nProbe = 4)
        .filter(col("id_a") < 300 && col("id_b") < 300)
        .select(col("id_a"), col("id_b"))
      val exact = Dedup.embeddingNearDups(
          e.filter(col("vec_id") < 300), "embedding", "vec_id", threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      val nExact = exact.agg(count(lit(1)).as("n_exact"))
      val nGot = got.agg(count(lit(1)).as("n_got"))
      val nInter = got.join(exact, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_inter"))
      nInter.crossJoin(broadcast(nExact)).crossJoin(broadcast(nGot))
        .select(explode(array(
          struct(lit("bucketed_recall_ge_090").as("check_name"),
            (col("n_inter").cast("double") / col("n_exact") >= 0.9).as("ok")),
          struct(lit("bucketed_no_false_positives").as("check_name"),
            (col("n_inter") === col("n_got")).as("ok")))).as("c"))
        .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
        .orderBy("check_name")
    }),

    "x_decontaminate" -> ((s, d) => {
      // n-gram benchmark decontamination: docs sharing any 5-gram with
      // the "benchmark" slice (doc_id < 20) are removed
      val docs = t(s, d, "documents")
      graft.ext.Corpus.decontaminate(docs, docs.filter(col("doc_id") < 20),
          "text", "doc_id", n = 5)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "x_winnow" -> ((s, d) =>
      // MOSS winnowing fingerprints (SIGMOD'03): window-min over shingle
      // hashes with rightmost tie-break — the local-fingerprint
      // guarantee (any shared ≥ w+k−1-word run shares a fingerprint)
      // that whole-doc hashing can't give. The oracle replays the FNV
      // shingle hashes and the windowed argmin exactly
      Dedup.winnowingFingerprints(t(s, d, "documents").filter(col("doc_id") < 300),
          "text", "doc_id", shingleSize = 3, window = 4)
        .select(col("id").as("doc_id"), col("fp_pos"), col("fp"))
        .orderBy("doc_id", "fp_pos", "fp")),

    "x_winnow_pairs" -> ((s, d) => {
      // the winnowing APPLICATION: partial-copy detection by shared
      // local fingerprints. Every 9th doc gets a planted partial copy
      // (its text with a few words appended) — the copies share the
      // original's fingerprints and must pair with it through the
      // inverted-index join; the oracle replays construction, winnow,
      // and join
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
      val partials = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" zz tail marker")).as("text"))
      Dedup.winnowingOverlapPairs(docs.select("doc_id", "text").unionByName(partials),
          "text", "doc_id", shingleSize = 3, window = 4, minShared = 2)
        .orderBy("id_a", "id_b")
    }),

    "x_dup_passages" -> ((s, d) =>
      // cross-doc duplicate-passage profile: per doc, how many of its
      // 5-token windows appear in other docs (inverted-index shape —
      // no pair join); the oracle replays it over shingle strings
      Dedup.duplicatePassages(t(s, d, "documents"), "text", "doc_id", n = 5)
        .orderBy("id")),

    "x_dup_passages_removed" -> ((s, d) =>
      // the passage-dedup TREATMENT: docs rewritten with every token
      // inside a cross-doc 5-token window removed — whole-doc dedup
      // can't do this (the boilerplate hides inside unique pages)
      Dedup.removeDuplicatePassages(t(s, d, "documents"), "text", "doc_id", n = 5)
        .orderBy("id")),

    "x_dup_passages_incr" -> ((s, d) => {
      // cross-run passage profiling: an incoming batch (doc_id 200–299)
      // scored against the corpus window store (doc_id < 200) — the
      // daily-ingest shape; the corpus text is never re-scanned
      val docs = t(s, d, "documents")
      val store = Dedup.windowStore(
        docs.filter(col("doc_id") < 200), "text", "doc_id", n = 5)
      Dedup.duplicatePassagesAgainst(
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 300),
          store, "text", "doc_id", n = 5)
        .orderBy("id")
    }),

    "x_decontaminate_semantic" -> ((s, d) => {
      // paraphrase-level decontamination: corpus embeddings vs a
      // broadcast benchmark set, codegen'd cosine kernel, flag ≥ 0.30
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val bench = e.filter(col("vec_id") % 100 === 0)
      val corpus = e.filter(col("vec_id") % 100 =!= 0)
      graft.ext.Corpus.decontaminateSemantic(corpus, bench,
        "embedding", "vec_id", threshold = 0.30)
    }),
  )

  val oracles: Map[String, String] = Map(
    "x_embed_neardup_incr" ->
      """SELECT * FROM (VALUES ('incr_no_false_positives', TRUE),
        |  ('incr_recall_ge_090', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "x_embed_neardup_bucketed" ->
      """SELECT * FROM (VALUES ('bucketed_no_false_positives', TRUE),
        |  ('bucketed_recall_ge_090', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    // winnowing replay: signed FNV shingle hashes, (hash, pos) packed
    // into one HUGEINT key so the window min carries the rightmost-tie
    // argmin, then decoded back to (pos, fp)
    "x_winnow" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
         |    i -> {'pos': i - 1, 's': w[i] || ' ' || w[i+1] || ' ' || w[i+2]})) AS e
         |  FROM d),
         |sh AS (SELECT doc_id, e.pos AS pos, ${signedSql(fnvSql("e.s"))} AS h FROM shg),
         |enc AS (SELECT doc_id, pos,
         |  (CAST(h AS HUGEINT) + 9223372036854775808) * 4294967296
         |    + (4294967295 - pos) AS key FROM sh),
         |win AS (SELECT doc_id, pos,
         |  min(key) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
         |  count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt,
         |  count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM enc)
         |SELECT DISTINCT doc_id,
         |  CAST(4294967295 - (mk % 4294967296) AS INTEGER) AS fp_pos,
         |  CAST(mk // 4294967296 - 9223372036854775808 AS BIGINT) AS fp
         |FROM win WHERE cnt = 4 OR (n < 4 AND pos = 0)
         |ORDER BY doc_id, fp_pos, fp""".stripMargin,

    // winnowing overlap replay: same construction + winnow + self-join
    "x_winnow_pairs" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 300),
         |aug AS (
         |  SELECT doc_id, text FROM base
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text || ' zz tail marker' AS text
         |  FROM base WHERE doc_id % 9 = 0),
         |d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM aug),
         |shg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
         |    i -> {'pos': i - 1, 's': w[i] || ' ' || w[i+1] || ' ' || w[i+2]})) AS e
         |  FROM d),
         |sh AS (SELECT doc_id, e.pos AS pos, ${signedSql(fnvSql("e.s"))} AS h FROM shg),
         |enc AS (SELECT doc_id, pos,
         |  (CAST(h AS HUGEINT) + 9223372036854775808) * 4294967296
         |    + (4294967295 - pos) AS key FROM sh),
         |win AS (SELECT doc_id, pos,
         |  min(key) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
         |  count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt,
         |  count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM enc),
         |fps AS (SELECT DISTINCT doc_id,
         |  CAST(mk // 4294967296 - 9223372036854775808 AS BIGINT) AS fp
         |FROM win WHERE cnt = 4 OR (n < 4 AND pos = 0))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
         |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin,

    "x_dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents
        |  GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |ORDER BY doc_id""".stripMargin,

    "x_dedup_exact_best" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (
        |      PARTITION BY lower(regexp_replace(trim(text), '\s+', ' ', 'g'))
        |      ORDER BY n_chars DESC NULLS LAST, doc_id ASC) AS rn
        |  FROM documents) WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "x_dedup_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM d)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT p.id_a, p.id_b,
        |  round(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 6) AS jaccard
        |FROM pairs p JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // jaccard pairs (same CTE chain as x_dedup_jaccard) → undirected
    // edges → recursive min-label reachability → min reachable id per
    // node = cluster id (singletons label themselves)
    "x_dedup_clusters" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
        |    FROM d)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |jp AS (
        |  SELECT p.id_a, p.id_b FROM pairs p
        |  JOIN sizes sa ON p.id_a = sa.doc_id JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.5),
        |edges AS (
        |  SELECT id_a AS s, id_b AS t FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp),
        |reach(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
        |cc AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc ORDER BY doc_id""".stripMargin,

    // full LSH replay: FNV-1a shingle hashes → 64 permuted mins → 16
    // band buckets → bucket self-join → positional signature agreement
    "x_dedup_minhash" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
         |  FROM d),
         |h AS (SELECT doc_id, ${fnvSql("s")} AS hu FROM shg),
         |seeds(seed, a, b) AS (VALUES $seedRowsSql),
         |perm AS (
         |  SELECT doc_id, seed, min(${signedSql("((a * hu + b) % 18446744073709551616)")}) AS m
         |  FROM h CROSS JOIN seeds GROUP BY doc_id, seed),
         |sig AS (SELECT doc_id, array_agg(m ORDER BY seed) AS sa FROM perm GROUP BY doc_id),
         |bs AS (
         |  SELECT doc_id, band,
         |    CAST(band AS VARCHAR) || ',' || array_to_string(list_slice(sa, band * 4 + 1, band * 4 + 4), ',') AS bstr
         |  FROM sig CROSS JOIN range(16) t(band)),
         |bk AS (SELECT doc_id, band, ${fnvSql("bstr")} AS bucket FROM bs),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    CAST(list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.sa[i] = s2.sa[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64.0 AS est_jaccard
         |  FROM cand JOIN sig s1 ON cand.id_a = s1.doc_id JOIN sig s2 ON cand.id_b = s2.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // same LSH replay, asymmetric: store (doc_id < 200) × incoming
    // (200–299) instead of a self-join
    "x_dedup_incremental" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
         |  FROM d),
         |h AS (SELECT doc_id, ${fnvSql("s")} AS hu FROM shg),
         |seeds(seed, a, b) AS (VALUES $seedRowsSql),
         |perm AS (
         |  SELECT doc_id, seed, min(${signedSql("((a * hu + b) % 18446744073709551616)")}) AS m
         |  FROM h CROSS JOIN seeds GROUP BY doc_id, seed),
         |sig AS (SELECT doc_id, array_agg(m ORDER BY seed) AS sa FROM perm GROUP BY doc_id),
         |bs AS (
         |  SELECT doc_id, band,
         |    CAST(band AS VARCHAR) || ',' || array_to_string(list_slice(sa, band * 4 + 1, band * 4 + 4), ',') AS bstr
         |  FROM sig CROSS JOIN range(16) t(band)),
         |bk AS (SELECT doc_id, band, ${fnvSql("bstr")} AS bucket FROM bs),
         |cand AS (
         |  SELECT DISTINCT b.doc_id AS id_new, a.doc_id AS id_store
         |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
         |  WHERE a.doc_id < 200 AND b.doc_id >= 200),
         |est AS (
         |  SELECT id_new, id_store,
         |    CAST(list_sum(list_transform(range(1, 65), i -> CASE WHEN s1.sa[i] = s2.sa[i] THEN 1 ELSE 0 END)) AS DOUBLE) / 64.0 AS est_jaccard
         |  FROM cand JOIN sig s1 ON cand.id_new = s1.doc_id JOIN sig s2 ON cand.id_store = s2.doc_id)
         |SELECT id_new, id_store, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5 ORDER BY id_new, id_store""".stripMargin,

    // rotations=8/prefixBits=8 is exact for hamming ≤ 7 (8 disjoint
    // blocks, pigeonhole) → oracle is brute-force all-pairs hamming
    "x_dedup_simhash" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents WHERE doc_id < 300),
         |shg AS (
         |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS s
         |  FROM d),
         |h AS (SELECT doc_id, ${fnvSql("s")} AS hu FROM shg),
         |bits(bit, p) AS (VALUES $bitRowsSql),
         |votes AS (
         |  SELECT doc_id, bit, p, sum(CASE WHEN (hu // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN bits GROUP BY doc_id, bit, p),
         |shu AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS u FROM votes GROUP BY doc_id),
         |sh2 AS (SELECT doc_id, ${signedSql("u")} AS sh FROM shu)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
         |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 7
         |ORDER BY id_a, id_b""".stripMargin,

    "x_fingerprint" ->
      s"""WITH n AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
         |  FROM documents),
         |hh AS (SELECT doc_id, ${fnvSql("nt")} AS hu FROM n)
         |SELECT doc_id, ${signedSql("hu")} AS fp FROM hh ORDER BY doc_id""".stripMargin,

    "x_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 300),
        |scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, len(a.v) + 1), i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.v) + 1), i -> CAST(a.v[i] AS DOUBLE) * CAST(a.v[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.v) + 1), i -> CAST(b.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))))) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 6) AS cos FROM scored WHERE cos >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "x_decontaminate" ->
      """WITH c AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                         FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM c),
        |bench AS (SELECT DISTINCT s FROM grams WHERE doc_id < 20),
        |contaminated AS (
        |  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b ON g.s = b.s)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin,

    // window strings stand in for the engine's window hashes
    // (count-equivalent, as in x_repetition)
    "x_dup_passages" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |            FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM d),
        |df AS (SELECT s, count(DISTINCT doc_id) AS ndocs FROM sh GROUP BY s),
        |per AS (
        |  SELECT sh.doc_id, count(*) AS n_windows,
        |    sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS n_dup_windows
        |  FROM sh JOIN df ON sh.s = df.s GROUP BY sh.doc_id)
        |SELECT doc.doc_id AS id,
        |  CAST(coalesce(per.n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
        |  round(CAST(per.n_dup_windows AS DOUBLE) / per.n_windows, 6) AS dup_frac
        |FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
        |ORDER BY id""".stripMargin,

    // full surgical replay: windows and tokens with positions (struct
    // comprehensions), covered positions fan out 0..4, survivors
    // re-aggregate in position order
    "x_dup_passages_removed" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS ot,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, u.p AS wpos, u.s FROM (
        |    SELECT doc_id, unnest([{'p': i - 1, 's': w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]}
        |                           FOR i IN range(1, len(w) - 3)]) AS u
        |    FROM d)),
        |duph AS (
        |  SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS df FROM wins GROUP BY s) WHERE df >= 2),
        |covered AS (
        |  SELECT DISTINCT wins.doc_id, wins.wpos + o.o AS pos
        |  FROM wins JOIN duph USING (s), unnest([0,1,2,3,4]) AS o(o)),
        |toks AS (
        |  SELECT doc_id, u.p AS pos, u.t FROM (
        |    SELECT doc_id, unnest([{'p': i - 1, 't': ot[i]} FOR i IN range(1, len(ot) + 1)]) AS u
        |    FROM d)),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.t FROM toks t
        |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
        |  WHERE c.pos IS NULL),
        |reb AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT d.doc_id AS id, coalesce(reb.clean_text, '') AS clean_text,
        |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept_tokens
        |FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id
        |ORDER BY id""".stripMargin,

    // store windows replayed as strings (count-equivalent, as in
    // x_dup_passages); a batch window is dup if it's in the store or
    // in another batch doc
    "x_dup_passages_incr" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents),
        |sw AS (
        |  SELECT DISTINCT s FROM (
        |    SELECT unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                   FOR i IN range(1, len(w) - 3)]) AS s
        |    FROM d WHERE doc_id < 200)),
        |bw AS (
        |  SELECT doc_id,
        |    unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |            FOR i IN range(1, len(w) - 3)]) AS s
        |  FROM d WHERE doc_id >= 200 AND doc_id < 300),
        |bdf AS (SELECT s, count(DISTINCT doc_id) AS bdocs FROM bw GROUP BY s),
        |per AS (
        |  SELECT bw.doc_id, count(*) AS n_windows,
        |    sum(CASE WHEN sw.s IS NOT NULL OR bdf.bdocs > 1 THEN 1 ELSE 0 END) AS n_dup
        |  FROM bw JOIN bdf ON bw.s = bdf.s LEFT JOIN sw ON bw.s = sw.s
        |  GROUP BY bw.doc_id)
        |SELECT doc.doc_id AS id,
        |  CAST(coalesce(per.n_windows, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_windows,
        |  round(CAST(per.n_dup AS DOUBLE) / per.n_windows, 6) AS dup_frac
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 200 AND doc_id < 300) doc
        |LEFT JOIN per ON doc.doc_id = per.doc_id
        |ORDER BY id""".stripMargin,

    "x_decontaminate_semantic" ->
      """WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
        |b AS (SELECT v FROM e WHERE vec_id % 100 = 0),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 100 != 0),
        |scored AS (
        |  SELECT c.vec_id,
        |    max(list_sum(list_transform(range(1, len(c.v) + 1), i -> CAST(c.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(c.v) + 1), i -> CAST(c.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.v) + 1), i -> CAST(b.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))))) AS mc
        |  FROM c, b GROUP BY c.vec_id)
        |SELECT vec_id, round(mc, 6) AS max_benchmark_cos
        |FROM scored WHERE mc >= 0.30 ORDER BY vec_id""".stripMargin,
  )
}
