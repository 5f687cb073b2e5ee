package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — retrieval and fuzzy linkage / entity resolution.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesSearch {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bm25_search" -> ((s, d) =>
      // BM25 relevance ranking for a bag-of-terms query — corpus
      // slicing by keyword relevance; fixed-order score assembly keeps
      // the float sum deterministic (see Search.bm25)
      graft.ext.Search.bm25(t(s, d, "documents"), "text", "doc_id",
          Seq("spark", "vector", "merge"), topK = 20)
        .select(col("id").as("doc_id"), col("score"), col("rank"))
        .orderBy("rank")),

    "x_multipattern" -> ((s, d) => {
      // Aho–Corasick dictionary scan: one O(|text|) automaton walk per
      // document regardless of dictionary size (a large blocklist as a
      // regex alternation backtracks per-phrase; a contains-loop is
      // O(|text|·|phrases|)) — overlapping phrases ("can" inside
      // "scan") and multi-word phrases included deliberately
      val dict = Seq("scan", "can", "fast key scan", "table part",
        "agg row", "zz never zz")
      t(s, d, "documents").select(col("doc_id").as("id"),
          graft.functions.MultiPattern.acMatches(col("text"), dict).as("ac"))
        .select(col("id"), size(col("ac")).cast("long").as("n_matched"),
          array_join(col("ac"), "|").as("matched"))
        .orderBy("id")
    }),

    "x_jaro_winkler" -> ((s, d) => {
      // record-linkage scoring kernels over deterministically
      // corrupted supplier names (synthesized identically in the
      // oracle): one transposition / deletion / append / substitution
      // per variant class, plus every name scored against a fixed
      // reference for a similarity spread. jw/dl are the codegen'd
      // byte-based kernels (functions.StringSimilarity); DuckDB
      // replays them with its STOCK jaro_winkler_similarity /
      // damerau_levenshtein — bit-exact by construction (same byte
      // semantics, same left-associated float order), so the doubles
      // compare raw, unrounded
      import graft.functions.StringSimilarity.{damerauLevenshtein, jaroWinkler}
      val n = col("s_name")
      val v = pmod(col("s_suppkey"), lit(4))
      val corrupted = when(v === 0,
          concat(substring(n, 1, 16), substring(n, 18, 1), substring(n, 17, 1)))
        .when(v === 1, concat(substring(n, 1, 11), substring(n, 13, 100)))
        .when(v === 2, concat(n, lit("x")))
        .otherwise(concat(lit("Z"), substring(n, 2, 100)))
      t(s, d, "supplier")
        .select(col("s_suppkey"), v.as("variant"), corrupted.as("corrupted"),
          jaroWinkler(n, corrupted).as("jw_self"),
          damerauLevenshtein(n, corrupted).cast("long").as("dl_self"),
          jaroWinkler(n, lit("Supplier#000000000")).as("jw_ref"))
        .orderBy("s_suppkey")
    }),

    "x_er_resolve" -> ((s, d) => {
      // entity resolution end-to-end: candidates via PassJoin segment
      // blocking (ed<=1, the x_fuzzy_join fixture verbatim), then the
      // RANKING layer — codegen'd Jaro–Winkler orders each dirty
      // record's candidates (edit distance prunes, JW ranks: its
      // prefix boost prefers the match agreeing on the name's head)
      // and rank 1 wins with a deterministic key tie-break. `correct`
      // flags whether rank-1 recovered the true origin
      val part = t(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit("-"), col("p_partkey")).as("ename"))
      val pos = (col("p_partkey") % 5 + 1).cast("int")
      val dirty = part.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("dirty_key"),
          concat(col("ename").substr(lit(1), pos),
            col("ename").substr(pos + lit(2), length(col("ename")))).as("dname"))
      val clean = part.select(col("p_partkey").as("clean_key"), col("ename"))
      graft.ext.Linkage.resolveBest(dirty, clean, "dname", "ename",
          "dirty_key", "clean_key", k = 1)
        .select(col("dirty_key"), col("dname"),
          col("clean_key").as("matched_key"), col("ename"), col("dist"),
          col("jw"), (col("dirty_key") === col("clean_key")).as("correct"))
        .orderBy("dirty_key")
    }),

    "x_er_cluster" -> ((s, d) => {
      // fuzzy ENTITY clustering end-to-end: master names ∪ corrupted
      // variants on one frame, dl<=1 pairing via the SymSpell deletion
      // neighborhood, min-label connected components, per-entity
      // cluster id + size — candidates → verify → cluster, the
      // resolution chain that turns pairwise typo matches into
      // deduplicatable entity groups. Disjoint node ids: clean 2k,
      // corrupted 2k+1
      val part = t(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit("-"), col("p_partkey")).as("ename"))
      val pos = (col("p_partkey") % 5 + 1).cast("int")
      val corrupted = part.filter(col("p_partkey") % 3 === 1)
        .select((col("p_partkey") * 2 + 1).as("id"),
          concat(col("ename").substr(lit(1), pos - 1),
            col("ename").substr(pos + 1, lit(1)),
            col("ename").substr(pos, lit(1)),
            col("ename").substr(pos + 2, length(col("ename")))).as("name"))
      val base = part
        .select((col("p_partkey") * 2).as("id"), col("ename").as("name"))
        .unionByName(corrupted)
      val a = base.select(col("id").as("ida"), col("name").as("na"))
      val b = base.select(col("id").as("idb"), col("name").as("nb"))
      val pairs = graft.ext.Linkage.dlJoin(a, b, "na", "nb", k = 1)
        .filter(col("ida") < col("idb"))
        .select(col("ida").as("id_a"), col("idb").as("id_b"))
      // maxIterations = 40: the 100x soak measured convergence at 14
      // rounds (corruption density grows component diameter with the
      // replica count), so the default 20 leaves thin headroom at the
      // next scale step; the loop exits on convergence, so the higher
      // cap costs nothing when the graph is shallow
      val cc = Dedup.connectedComponents(pairs, base.select(col("id")),
        maxIterations = 40)
      import org.apache.spark.sql.expressions.Window
      cc.select(col("id"), col("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("id")
    }),

    "x_hybrid_search" -> ((s, d) => {
      // Reciprocal Rank Fusion (Cormack et al. SIGIR'09): fuse the
      // BM25 lexical top-50 with the cosine vector top-50 by
      // Σ 1/(60+rank) — THE standard hybrid-search combiner (rank-only
      // fusion needs no score calibration between modalities). Each
      // doc's RRF is a fixed two-term sum over INTEGER ranks, so the
      // doubles are bit-identical; final window runs over ≤100
      // post-limit rows
      import org.apache.spark.sql.expressions.Window
      val lex = graft.ext.Search.bm25(t(s, d, "documents"), "text",
          "doc_id", Seq("spark", "vector", "merge"), topK = 50)
        .select(col("id").as("doc_id"), col("rank").as("rank_lex"))
      val e = t(s, d, "embeddings")
      val vec = Similarity.bruteForceTopK(e, e.filter(col("vec_id") === 0),
          "embedding", "vec_id", k = 50)
        .select(col("corpus_id").as("doc_id"), col("rank").as("rank_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_vec")), lit(0.0)))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf").desc, col("doc_id").asc)))
        .filter(col("rank") <= 20)
        .select("rank", "doc_id", "rank_lex", "rank_vec", "rrf")
        .orderBy("rank")
    }),

    "x_typo_join" -> ((s, d) => {
      // transposition-tolerant linkage: entity names corrupted by ONE
      // adjacent-character swap (DL 1, but Levenshtein 2 — the ed<=1
      // join misses every one of these). Candidates from 2k segment
      // blocking, verified by the codegen'd unrestricted DL kernel
      val part = t(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit("-"), col("p_partkey")).as("ename"))
      val pos = (col("p_partkey") % 5 + 1).cast("int")
      val dirty = part.filter(col("p_partkey") % 3 === 1)
        .select(col("p_partkey").as("dirty_key"),
          concat(col("ename").substr(lit(1), pos - 1),
            col("ename").substr(pos + 1, lit(1)),
            col("ename").substr(pos, lit(1)),
            col("ename").substr(pos + 2, length(col("ename")))).as("dname"))
      val clean = part.select(col("p_partkey").as("clean_key"), col("ename"))
      graft.ext.Linkage.dlJoin(dirty, clean, "dname", "ename", k = 1)
        .select(col("dirty_key"), col("clean_key"), col("dname"),
          col("ename"), col("dl_dist"))
        .orderBy("dirty_key", "clean_key")
    }),

    "x_fuzzy_join" -> ((s, d) => {
      // record linkage: entity names = part name + key suffix (unique,
      // like real master-list entities; the bare p_name vocabulary is
      // ~56 strings, which would make every blocking segment hot AND
      // the true answer itself quadratic-sized). Corrupt a third of
      // them by one key-derived char deletion, re-link at edit
      // distance <= 1 via PassJoin segment blocking — candidate space
      // is the blocking join, never |L|x|R|; the oracle replays the
      // same corruption + levenshtein exactly
      val part = t(s, d, "part")
        .select(col("p_partkey"),
          concat(col("p_name"), lit("-"), col("p_partkey")).as("ename"))
      val pos = (col("p_partkey") % 5 + 1).cast("int")
      val dirty = part.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("dirty_key"),
          concat(col("ename").substr(lit(1), pos),
            col("ename").substr(pos + lit(2), length(col("ename")))).as("dname"))
      val clean = part.select(col("p_partkey").as("clean_key"), col("ename"))
      graft.ext.Linkage.editDistanceJoin(dirty, clean, "dname", "ename", k = 1)
        .select("dirty_key", "clean_key", "dname", "ename", "dist")
        .orderBy("dirty_key", "clean_key")
    }),
  )

  val oracles: Map[String, String] = Map(
    // BM25 replay: same tokenizer, same idf form, same fixed-order
    // per-term score assembly (max-of-CASE per term, summed left to
    // right) so the double math is bit-identical
    "x_bm25_search" ->
      """WITH lens AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
        |                      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS len
        |  FROM documents),
        |stats AS (SELECT count(*) AS n_docs, sum(len) AS sum_len FROM lens),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents)
        |  WHERE term IN ('spark', 'vector', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * (CAST(tf.tf AS DOUBLE) * 2.2)
        |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(lens.len AS DOUBLE) / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS s
        |  FROM tf JOIN df USING (term) CROSS JOIN stats JOIN lens ON tf.doc_id = lens.doc_id),
        |agg AS (
        |  SELECT doc_id,
        |    max(CASE WHEN term = 'spark' THEN s END) AS s0,
        |    max(CASE WHEN term = 'vector' THEN s END) AS s1,
        |    max(CASE WHEN term = 'merge' THEN s END) AS s2
        |  FROM sc GROUP BY doc_id),
        |scored AS (
        |  SELECT doc_id, coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score FROM agg),
        |top AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20)
        |SELECT doc_id, round(score, 6) AS score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
        |FROM top ORDER BY rank""".stripMargin,

    // multipattern replay: per-phrase contains == substring semantics
    // of the automaton; list_sort's binary collation == Java's String
    // ordering on these ASCII phrases
    "x_multipattern" ->
      """SELECT doc_id AS id,
        |  CAST(len(l) AS BIGINT) AS n_matched,
        |  coalesce(array_to_string(l, '|'), '') AS matched
        |FROM (
        |  SELECT doc_id, list_sort(list_filter(
        |    ['scan', 'can', 'fast key scan', 'table part', 'agg row', 'zz never zz'],
        |    p -> contains(text, p))) AS l
        |  FROM documents)
        |ORDER BY id""".stripMargin,

    // linkage-kernel replay: DuckDB's stock jaro_winkler_similarity /
    // damerau_levenshtein ARE the reference semantics the codegen'd
    // kernels mirror (byte-based, 0.7 boost gate, unrestricted DL) —
    // raw-double compare, no rounding
    "x_jaro_winkler" ->
      """WITH c AS (
        |  SELECT s_suppkey, s_name, s_suppkey % 4 AS v,
        |    CASE WHEN s_suppkey % 4 = 0
        |           THEN substr(s_name,1,16) || substr(s_name,18,1) || substr(s_name,17,1)
        |         WHEN s_suppkey % 4 = 1
        |           THEN substr(s_name,1,11) || substr(s_name,13,100)
        |         WHEN s_suppkey % 4 = 2 THEN s_name || 'x'
        |         ELSE 'Z' || substr(s_name,2,100) END AS corrupted
        |  FROM supplier)
        |SELECT s_suppkey, CAST(v AS BIGINT) AS variant, corrupted,
        |  jaro_winkler_similarity(s_name, corrupted) AS jw_self,
        |  CAST(damerau_levenshtein(s_name, corrupted) AS BIGINT) AS dl_self,
        |  jaro_winkler_similarity(s_name, 'Supplier#000000000') AS jw_ref
        |FROM c ORDER BY s_suppkey""".stripMargin,

    // ER replay: deletion-signature blocked candidates (same complete
    // SymSpell neighborhood as x_fuzzy_join's replay — no quadratic
    // cross join), stock jaro_winkler_similarity scores (bit-exact vs
    // the kernel), QUALIFY rank-1 per dirty key
    "x_er_resolve" ->
      """WITH p AS (
        |  SELECT p_partkey, concat(p_name, '-', p_partkey) AS ename FROM part),
        |dirty AS (
        |  SELECT p_partkey AS dirty_key,
        |    concat(substr(ename, 1, CAST(p_partkey % 5 + 1 AS INTEGER)),
        |           substr(ename, CAST(p_partkey % 5 + 3 AS INTEGER))) AS dname
        |  FROM p WHERE p_partkey % 3 = 0),
        |clean AS (SELECT p_partkey AS clean_key, ename FROM p),
        |dsig AS (
        |  SELECT dirty_key, dname,
        |    unnest(list_append(
        |      [dname[1:i-1] || dname[i+1:len(dname)] FOR i IN range(1, len(dname) + 1)],
        |      dname)) AS sig
        |  FROM dirty),
        |csig AS (
        |  SELECT clean_key, ename,
        |    unnest(list_append(
        |      [ename[1:i-1] || ename[i+1:len(ename)] FOR i IN range(1, len(ename) + 1)],
        |      ename)) AS sig
        |  FROM clean),
        |blocked AS (
        |  SELECT DISTINCT dirty_key, dname, clean_key, ename
        |  FROM dsig JOIN csig USING (sig)),
        |cand AS (
        |  SELECT dirty_key, dname, clean_key, ename,
        |    CAST(levenshtein(dname, ename) AS INTEGER) AS dist,
        |    jaro_winkler_similarity(dname, ename) AS jw
        |  FROM blocked
        |  WHERE levenshtein(dname, ename) <= 1)
        |SELECT dirty_key, dname, clean_key AS matched_key, ename, dist, jw,
        |  dirty_key = clean_key AS correct
        |FROM cand
        |QUALIFY row_number() OVER (
        |  PARTITION BY dirty_key ORDER BY jw DESC, clean_key ASC) = 1
        |ORDER BY dirty_key""".stripMargin,

    // ER-cluster replay: the SAME SymSpell deletion-signature equi-join
    // (completeness is an algorithm property, so the oracle scales like
    // the engine — no quadratic cross join), stock damerau verify,
    // recursive-CTE min-label components
    "x_er_cluster" ->
      """WITH RECURSIVE p AS (
        |  SELECT p_partkey, concat(p_name, '-', p_partkey) AS ename FROM part),
        |base AS (
        |  SELECT p_partkey * 2 AS id, ename AS name FROM p
        |  UNION ALL
        |  SELECT p_partkey * 2 + 1 AS id,
        |    concat(substr(ename, 1, CAST(p_partkey % 5 AS INTEGER)),
        |           substr(ename, CAST(p_partkey % 5 + 2 AS INTEGER), 1),
        |           substr(ename, CAST(p_partkey % 5 + 1 AS INTEGER), 1),
        |           substr(ename, CAST(p_partkey % 5 + 3 AS INTEGER))) AS name
        |  FROM p WHERE p_partkey % 3 = 1),
        |sigs AS (
        |  SELECT id, name,
        |    unnest(list_append(
        |      [name[1:i-1] || name[i+1:len(name)] FOR i IN range(1, len(name) + 1)],
        |      name)) AS sig
        |  FROM base),
        |cand AS (
        |  SELECT DISTINCT a.id AS ia, b.id AS ib, a.name AS na, b.name AS nb
        |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.id < b.id),
        |jp AS (SELECT ia, ib FROM cand WHERE damerau_levenshtein(na, nb) <= 1),
        |edges AS (
        |  SELECT ia AS s, ib AS t FROM jp
        |  UNION ALL SELECT ib, ia FROM jp),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM base
        |  UNION
        |  SELECT e.t, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
        |cc AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
        |SELECT id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc ORDER BY id""".stripMargin,

    // RRF replay: the two established ranking replays (bm25 machinery,
    // cosine fold) at top-50, fused by the same fixed two-term
    // 1/(60+rank) sum over integer ranks
    "x_hybrid_search" ->
      """WITH lens AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
        |                      ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS len
        |  FROM documents),
        |stats AS (SELECT count(*) AS n_docs, sum(len) AS sum_len FROM lens),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents)
        |  WHERE term IN ('spark', 'vector', 'merge') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * (CAST(tf.tf AS DOUBLE) * 2.2)
        |      / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(lens.len AS DOUBLE) / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))) AS s
        |  FROM tf JOIN df USING (term) CROSS JOIN stats JOIN lens ON tf.doc_id = lens.doc_id),
        |agg AS (
        |  SELECT doc_id,
        |    max(CASE WHEN term = 'spark' THEN s END) AS s0,
        |    max(CASE WHEN term = 'vector' THEN s END) AS s1,
        |    max(CASE WHEN term = 'merge' THEN s END) AS s2
        |  FROM sc GROUP BY doc_id),
        |lscored AS (
        |  SELECT doc_id, coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0) AS score FROM agg),
        |ltop AS (SELECT doc_id, score FROM lscored ORDER BY score DESC, doc_id ASC LIMIT 50),
        |lex AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank_lex
        |  FROM ltop),
        |qv AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id = 0),
        |cv AS (SELECT vec_id AS corpus_id, embedding AS c FROM embeddings),
        |vscored AS (
        |  SELECT corpus_id,
        |    list_sum(list_transform(range(1, len(q) + 1), i -> CAST(q[i] AS DOUBLE) * CAST(c[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(q) + 1), i -> CAST(q[i] AS DOUBLE) * CAST(q[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(c) + 1), i -> CAST(c[i] AS DOUBLE) * CAST(c[i] AS DOUBLE))))) AS cos
        |  FROM cv, qv WHERE corpus_id <> query_id),
        |vec AS (
        |  SELECT corpus_id AS doc_id,
        |    CAST(row_number() OVER (ORDER BY cos DESC, corpus_id ASC) AS INTEGER) AS rank_vec
        |  FROM vscored
        |  QUALIFY row_number() OVER (ORDER BY cos DESC, corpus_id ASC) <= 50),
        |f AS (
        |  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id, rank_lex, rank_vec,
        |    coalesce(1.0 / (60 + rank_lex), 0.0) +
        |    coalesce(1.0 / (60 + rank_vec), 0.0) AS rrf
        |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS rank,
        |  doc_id, rank_lex, rank_vec, rrf
        |FROM f
        |QUALIFY row_number() OVER (ORDER BY rrf DESC, doc_id ASC) <= 20
        |ORDER BY rank""".stripMargin,

    // typo-join replay with the SAME SymSpell deletion-signature
    // blocking the engine uses (completeness for dl<=1 is an algorithm
    // property, not an engine trick — see Linkage.scala's proof), so
    // the oracle scales like the engine instead of |L|x|R|; stock
    // damerau_levenshtein verifies each candidate
    "x_typo_join" ->
      """WITH p AS (
        |  SELECT p_partkey, concat(p_name, '-', p_partkey) AS ename FROM part),
        |dirty AS (
        |  SELECT p_partkey AS dirty_key,
        |    concat(substr(ename, 1, CAST(p_partkey % 5 AS INTEGER)),
        |           substr(ename, CAST(p_partkey % 5 + 2 AS INTEGER), 1),
        |           substr(ename, CAST(p_partkey % 5 + 1 AS INTEGER), 1),
        |           substr(ename, CAST(p_partkey % 5 + 3 AS INTEGER))) AS dname
        |  FROM p WHERE p_partkey % 3 = 1),
        |clean AS (SELECT p_partkey AS clean_key, ename FROM p),
        |dsig AS (
        |  SELECT dirty_key, dname,
        |    unnest(list_append(
        |      [dname[1:i-1] || dname[i+1:len(dname)] FOR i IN range(1, len(dname) + 1)],
        |      dname)) AS sig
        |  FROM dirty),
        |csig AS (
        |  SELECT clean_key, ename,
        |    unnest(list_append(
        |      [ename[1:i-1] || ename[i+1:len(ename)] FOR i IN range(1, len(ename) + 1)],
        |      ename)) AS sig
        |  FROM clean),
        |cand AS (
        |  SELECT DISTINCT dirty_key, clean_key, dname, ename
        |  FROM dsig JOIN csig USING (sig))
        |SELECT dirty_key, clean_key, dname, ename,
        |  CAST(damerau_levenshtein(dname, ename) AS INTEGER) AS dl_dist
        |FROM cand
        |WHERE damerau_levenshtein(dname, ename) <= 1
        |ORDER BY dirty_key, clean_key""".stripMargin,

    // fuzzy-join replay via deletion-signature blocking: lev<=1 pairs
    // are a subset of dl<=1 pairs, for which the SymSpell neighborhood
    // is provably complete — so the blocked candidate set loses
    // nothing, and the oracle stops being quadratic at scale
    "x_fuzzy_join" ->
      """WITH p AS (
        |  SELECT p_partkey, concat(p_name, '-', p_partkey) AS ename FROM part),
        |dirty AS (
        |  SELECT p_partkey AS dirty_key,
        |    concat(substr(ename, 1, CAST(p_partkey % 5 + 1 AS INTEGER)),
        |           substr(ename, CAST(p_partkey % 5 + 3 AS INTEGER))) AS dname
        |  FROM p WHERE p_partkey % 3 = 0),
        |clean AS (SELECT p_partkey AS clean_key, ename FROM p),
        |dsig AS (
        |  SELECT dirty_key, dname,
        |    unnest(list_append(
        |      [dname[1:i-1] || dname[i+1:len(dname)] FOR i IN range(1, len(dname) + 1)],
        |      dname)) AS sig
        |  FROM dirty),
        |csig AS (
        |  SELECT clean_key, ename,
        |    unnest(list_append(
        |      [ename[1:i-1] || ename[i+1:len(ename)] FOR i IN range(1, len(ename) + 1)],
        |      ename)) AS sig
        |  FROM clean),
        |cand AS (
        |  SELECT DISTINCT dirty_key, clean_key, dname, ename
        |  FROM dsig JOIN csig USING (sig))
        |SELECT dirty_key, clean_key, dname, ename,
        |  CAST(levenshtein(dname, ename) AS INTEGER) AS dist
        |FROM cand
        |WHERE levenshtein(dname, ename) <= 1
        |ORDER BY dirty_key, clean_key""".stripMargin,
  )
}
