package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All pure column expressions (codegen'd, no UDFs) so they survive a
  * 100-TB scan: each is a narrow map over the text column, no shuffle.
  * Mirrors/extends the reference's stored text stats
  * (`ET-ETL-DWH-PY312/ETL/schema.py:336-338` words_count_agent/client/
  * both) into a general text-quality toolkit.
  */
object TextOps {

  /** Whitespace token count (the schema.py:336-338 semantics). */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword proxy: split on word/non-word boundaries, ~the
    * pre-tokenization regex of GPT-style BPE (letters runs, digit runs,
    * punctuation runs each count once).
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(filter(split(text, "(?<=[\\p{L}\\p{N}])(?![\\p{L}\\p{N}])|(?<![\\p{L}\\p{N}])(?=[\\p{L}\\p{N}])|\\s+"),
      t => length(trim(t)) > 0)) // boundary splits can strand pure-whitespace tokens

  def charCount(text: Column): Column = length(text)

  /** The counting step of BPE tokenizer TRAINING (Sennrich et al.
    * 2016, arXiv:1508.07909 — each merge iteration picks the most
    * frequent adjacent symbol pair): corpus-wide adjacent character
    * pairs inside whitespace words, ranked by frequency. This is the
    * first-iteration merge table (and the dominant cost of training —
    * later iterations run over the same counts structure with merged
    * symbols).
    *
    * Scale shape: one explode over words, one per-word transform to
    * its length-2 substrings (no char-array materialization), one
    * map-side-combined count keyed by pair (alphabet²-bounded
    * cardinality), then top-K via TakeOrdered with the rank window
    * over the ALREADY-LIMITED k rows (the bm25 pattern).
    */
  def bpePairCounts(docs: DataFrame, textCol: String,
                    topK: Int = 50): DataFrame = {
    val words = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
    words
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair").asc)))
  }

  /** Punctuation / alpha / whitespace / digit ratios — standard quality
    * signals (C4/Gopher-style filters).
    */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{L}]", "")).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  /** Mean words per sentence-ish segment. */
  def meanWordsPerLine(text: Column): Column =
    tokenCountWs(text).cast(DoubleType) /
      greatest(size(split(text, "[.!?\\n]+")).cast(DoubleType), lit(1.0))

  /** Stopword-hit ratio against a given stopword list (lowercased match).
    * Gopher-style: docs with very low stopword density are likely
    * non-natural text.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isin(stopwords: _*)))
    hits.cast(DoubleType) / greatest(size(toks).cast(DoubleType), lit(1.0))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Composite 0–1 quality score: length in-range, some alpha content,
    * not punctuation-soup, has stopwords. Weights are heuristic;
    * thresholds follow common web-corpus filtering practice.
    */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val lenOk = when(len.between(50, 100000), lit(1.0))
      .when(len.between(10, 49), lit(0.5)).otherwise(lit(0.0))
    val alphaOk = when(alphaRatio(text) >= 0.6, lit(1.0))
      .when(alphaRatio(text) >= 0.3, lit(0.5)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text, EnglishStopwords) >= 0.05, lit(1.0)).otherwise(lit(0.0))
    round((lenOk * 0.3 + alphaOk * 0.3 + punctOk * 0.2 + stopOk * 0.2), 2)
  }

  /** Character n-gram language-ID heuristic: score each candidate
    * language by density of its most-frequent function words / n-grams,
    * pick the argmax. A real pipeline plugs a model; the shape (map →
    * argmax over a small per-language score array, no shuffle) is what
    * matters at scale.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " das "),
    "fr" -> Seq(" le ", " la ", " et ", " est ", " les "),
    "es" -> Seq(" el ", " la ", " y ", " es ", " los "),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers(lang).map { m =>
      (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), "")))
        ./(lit(m.length)).cast(DoubleType)
    }.reduce(_ + _)
  }

  /** Best-guess language among [[langMarkers]]; "und" (undetermined) when
    * no marker fires.
    */
  def langIdGuess(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scored = array(langs.map(l => struct(langScore(text, l).as("s"), lit(l).as("l"))): _*)
    val best = array_max(scored)
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** 64-bit document fingerprint: portable FNV-1a over the
    * whitespace-normalized, lowercased text — cheap exact-dup key that is
    * robust to whitespace/case jitter, reproducible outside the engine
    * (see [[graft.functions.Fnv1a64]]).
    */
  /** Corpus-self-trained bigram log-probability score — the
    * "predictability" quality signal (the exact-arithmetic cousin of
    * KenLM perplexity filtering à la CCNet): train bigram MLE counts on
    * the corpus itself, score each doc by the mean log-probability of
    * its bigrams, `p(w2|w1) = c(w1 w2) / c(w1 ·)`. Templated/boilerplate
    * text scores high (its transitions repeat corpus-wide), rare noisy
    * text scores low. Self-scoring needs no smoothing: every doc bigram
    * has corpus count ≥ 1 by construction.
    *
    * Returns (id, n_bigrams, mean_lp) for docs with ≥ 2 tokens.
    * Shuffles: bigram count, first-token count, the score join keyed by
    * bigram, the per-doc mean — all keyed by token-stream-sized frames,
    * never a pair space. Deterministic: each term is one division and
    * one ln (correctly-rounded libm on every engine we replay against),
    * rounded to 9 before the decimal mean.
    */
  def bigramLogProb(docs: org.apache.spark.sql.DataFrame, textCol: String,
                    idCol: String): org.apache.spark.sql.DataFrame = {
    // bigrams live as single-pass FNV hashes ([[shingleHashes]] — the
    // codegen'd kernel; the interpreted wordShingles HOF form measured
    // ~20× slower here). Counts per hash == counts per string (the
    // x_repetition count-equivalence trick), so the string-replaying
    // oracle still matches. The bigram's first token rides along as
    // the aligned unigram hash: w1 of bigram i is unigram i.
    val bg = docs
      .select(col(idCol).as("id"),
        shingleHashes(col(textCol), 2).as("__b2"),
        shingleHashes(col(textCol), 1).as("__u1"))
      .select(col("id"), posexplode(col("__b2")).as(Seq("__i", "b")),
        col("__u1"))
      .select(col("id"), col("b"),
        element_at(col("__u1"), col("__i") + 1).as("w1"))
    val cb = bg.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    bg.join(cb, "b")
      .join(cu, "w1")
      .withColumn("term", round(log(col("cb").cast("double") / col("cu")), 9))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("term").cast("decimal(20,9)")).cast("double") / count(lit(1)), 6)
          .as("mean_lp"))
  }

  /** Fixed-size token chunking with overlap — the context-window prep
    * every RAG index and pretraining tokenizer pipeline runs before
    * embedding/packing. Chunk k covers whitespace tokens
    * [k·stride, k·stride + chunkTokens) where stride = chunkTokens −
    * overlap; the last chunk clamps at the document end, and a doc
    * shorter than one chunk still yields its single (short) chunk.
    * Returns (id, chunk_id, n_tok, chunk_text).
    *
    * Scale shape: one narrow map — tokenize, compute the chunk count
    * arithmetically, explode exactly that many rows, slice. No shuffle
    * at all; output order within a doc is the chunk index. Every step
    * (regex split, integer chunk count, 1-based slice) replays exactly
    * in SQL engines, so chunk boundaries are auditable outside the
    * engine.
    */
  def chunkTokens(docs: org.apache.spark.sql.DataFrame, textCol: String,
                  idCol: String, chunkTokens: Int,
                  overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, "chunkTokens: chunk size must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "chunkTokens: overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    docs
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      // K = 1 for n ≤ chunk; else 1 + ceil((n - chunk)/stride), as
      // exact integer arithmetic (floor of (n - chunk + stride - 1)/stride)
      .withColumn("__k",
        when(col("__n") <= chunkTokens, lit(1L))
          .otherwise(lit(1L) +
            floor((col("__n") - lit(chunkTokens.toLong) + lit(stride - 1L)) / lit(stride.toLong))
              .cast("long")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__k") - 1)))
      .withColumn("__c",
        slice(col("__w"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)))
      .select(col(idCol), col("chunk_id"),
        size(col("__c")).cast("long").as("n_tok"),
        concat_ws(" ", col("__c")).as("chunk_text"))
  }

  def fingerprint(text: Column): Column =
    graft.functions.VectorExpressions.fnv1a64(
      lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Word shingles (n consecutive tokens joined by a space) — the shared
    * substrate of MinHash / Jaccard dedup in [[Dedup]].
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val count = size(toks) - lit(n - 1)
    // sequence(a, b) counts DOWN when a > b — guard the empty case.
    when(count < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Gopher-style repetition metrics per document (Rae et al. 2021 §A1
    * repetition filters): the fraction of tokens taken by the single
    * most frequent token, the fraction of word n-grams taken by the
    * most frequent n-gram, and the fraction of n-gram occurrences that
    * are repeats. High values flag boilerplate/templated/looping text —
    * the standard pre-training quality cut alongside [[qualityScore]].
    *
    * Shape: two explode→groupBy passes keyed by (doc, token|ngram-hash)
    * with map-side combine — shuffles are keyed by doc id and sized by
    * the token stream, never the pair space. Docs with no tokens (or
    * fewer than n) come out with null fractions.
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, textCol: String,
                      idCol: String, n: Int = 2): org.apache.spark.sql.DataFrame = {
    val ids = docs.select(col(idCol).as("id"))
    val tokCounts = docs
      .select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("c"))
    val tokStats = tokCounts.groupBy(col("id"))
      .agg(round(max(col("c")).cast(DoubleType) / sum(col("c")).cast(DoubleType), 6)
        .as("top_token_frac"))
    val ngrCounts = docs
      .select(col(idCol).as("id"), explode(shingleHashes(col(textCol), n)).as("h"))
      .groupBy(col("id"), col("h")).agg(count(lit(1)).as("c"))
    val ngrStats = ngrCounts.groupBy(col("id"))
      .agg(
        round(max(col("c")).cast(DoubleType) / sum(col("c")).cast(DoubleType), 6)
          .as("top_ngram_frac"),
        round(sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).cast(DoubleType)
          / sum(col("c")).cast(DoubleType), 6).as("dup_ngram_frac"))
    ids.join(tokStats, Seq("id"), "left").join(ngrStats, Seq("id"), "left")
  }

  /** Compression-ratio quality signal (the zlib filter of web-corpus
    * pipelines): deflate each document's UTF-8 bytes and report
    * compressed/raw — boilerplate and template spam compress far
    * below prose, random noise barely compresses at all. Gate LOW
    * ratios (near-duplicated structure) and very HIGH ones (entropy
    * soup) per corpus policy.
    *
    * Shape: `mapPartitions` with ONE `Deflater` reused per partition
    * (the JNI-backed codec is exactly the init-per-partition pattern
    * `Multimodal` stubs — zlib ships in the JDK, so this one is real).
    * Narrow map, no shuffle. Output is deterministic for a fixed zlib
    * level on a given JVM, but NOT replayable in SQL — rows-only by
    * design.
    */
  def compressionRatio(docs: org.apache.spark.sql.DataFrame, textCol: String,
                       idCol: String, level: Int = 6): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(Seq(
      StructField("id", docs.schema(idCol).dataType),
      StructField("raw_bytes", IntegerType, nullable = false),
      StructField("compressed_bytes", IntegerType, nullable = false),
      StructField("compression_ratio", DoubleType)))
    val in = docs.select(col(idCol), col(textCol))
    val rdd = in.rdd.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(level)
      val buf = new Array[Byte](64 * 1024)
      rows.map { r =>
        val id = r.get(0)
        val text = r.getString(1)
        if (text == null) Row(id, 0, 0, null)
        else {
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var compressed = 0
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio =
            if (bytes.length == 0) null
            else java.lang.Double.valueOf(
              math.round(compressed.toDouble / bytes.length * 1e6) / 1e6)
          Row(id, bytes.length, compressed, ratio)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** PII redaction: emails, IPv4 addresses, and international-format
    * phone numbers replaced with typed placeholders — the standard
    * privacy scrub before corpus release. Patterns are deliberately
    * RE2-safe (no lookaround/backrefs) so they run identically under
    * Java regex and RE2-family engines; applied email → ip → phone so
    * earlier placeholders can't be re-matched by later patterns.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val noIp = regexp_replace(noEmail,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
    regexp_replace(noIp, "\\+[0-9][0-9 -]{6,}[0-9]", "<PHONE>")
  }

  /** The Gopher rule-set's required stopwords (Rae et al. 2021 §A1.1):
    * a natural-language document should contain at least 2 of these.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Composite Gopher-style document filter (Rae et al. 2021, Table A1):
    * per-document rule metrics plus the all-rules verdict. Rules:
    * word count in [50, 100k], mean word length in [3, 10], symbol-to-
    * word ratio (# and ellipses) < 0.1, < 90% of lines bullet-started,
    * < 30% of lines ellipsis-ended, > 80% of words contain a letter,
    * ≥ 2 distinct required stopwords present.
    *
    * Everything is codegen'd column arithmetic — line/word counting via
    * `regexp_count` instead of interpreted higher-order filters (the
    * HOF forms measured ~an order of magnitude slower on this build) —
    * so the filter is a narrow map over the text column: no shuffle,
    * safe to run inline in a 100-TB ingest scan. Docs with no words
    * (or null text) fail the verdict with null metrics.
    */
  def gopherFilter(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val toks = filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    val nWords = size(toks).cast(LongType)
    val nwD = nWords.cast(DoubleType)
    val meanWordLen = when(nWords > 0,
      length(regexp_replace(text, "\\s", "")).cast(DoubleType) / nwD)
    // '...' is counted by length delta of non-overlapping replacement
    // (exact: each removal is 3 chars); '…' and '#' by translate delta
    val hashes = (length(text) - length(translate(text, "#", ""))).cast(DoubleType)
    val ells =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))).cast(DoubleType) / 3.0 +
        (length(text) - length(translate(text, "…", ""))).cast(DoubleType)
    val symbolRatio = when(nWords > 0, (hashes + ells) / nwD)
    val nLines = size(split(text, "\n")).cast(DoubleType)
    val bulletFrac =
      regexp_count(text, lit("(^|\n)[ \t]*[-•*]")).cast(DoubleType) / nLines
    val ellipsisFrac =
      regexp_count(text, lit("(\\.\\.\\.|…)[ \t]*(\n|$)")).cast(DoubleType) / nLines
    val alphaWordFrac = when(nWords > 0,
      regexp_count(text, lit("(^|\\s)\\S*\\p{L}\\S*")).cast(DoubleType) / nwD)
    val stopHits = GopherStopwords
      .map(sw => when(array_contains(toks, sw), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val passes = coalesce(
      nWords.between(50L, 100000L) && meanWordLen.between(3.0, 10.0) &&
        symbolRatio < 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3 &&
        alphaWordFrac > 0.8 && stopHits >= 2L,
      lit(false))
    docs.select(col(idCol), nWords.as("n_words"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaWordFrac, 6).as("alpha_word_frac"),
      stopHits.as("stop_hits"), passes.as("passes"))
  }

  /** FNV-1a hashes of the word shingles, computed in a single byte
    * scan with no string materialization — bit-identical to
    * `transform(wordShingles(text, n), fnv1a64)` (the equivalence is
    * property-tested), ~an order of magnitude cheaper. This is the
    * form every dedup/decontamination scan should use; [[wordShingles]]
    * remains for callers that need the shingle TEXT (reports, debug).
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.VectorExpressions.shingleFnv(lower(trim(text)), n)

  /** Character n-gram shingles over whitespace-normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val s = lower(regexp_replace(trim(text), "\\s+", " "))
    val count = length(s) - lit(n - 1)
    when(count < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), count), i => s.substr(i, lit(n))))
  }

  /** CCNet-style line-level dedup: a line (split on `\n`) is BOILERPLATE
    * when its trimmed form occurs in more than `maxDf` distinct
    * documents — nav bars, cookie banners, "subscribe" footers dominate
    * web corpora at the LINE level, below what document-level dedup can
    * see. Boilerplate lines are dropped and each document is rebuilt
    * from its surviving lines in original order; whitespace-only lines
    * are structure, not content — they are always kept and never
    * counted.
    *
    * Output: `id`, `n_lines`, `n_kept`, `text_kept` (null when every
    * content line was boilerplate and no blank line remained).
    *
    * Scale shape: explode is narrow; the line-frequency aggregate and
    * the line⋈frequency join shuffle on the trimmed line text (popular
    * short lines are exactly the hot keys AQE's skew join splits); the
    * rebuild groups by doc id — per-group state is one document's
    * lines, the same bound the original text already met. Nothing is
    * all-pairs and no frame is driver-materialized. For corpora where
    * long lines dominate the shuffle, hash the key (`fnv1a64`) before
    * the join — kept as raw text here so the DuckDB oracle replays the
    * join byte-for-byte.
    */
  def dedupLines(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 idCol: String, maxDf: Int = 1): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("k", trim(col("line")))
    val lineDf = lines.filter(length(col("k")) > 0)
      .select("id", "k").distinct()
      .groupBy("k").agg(count(lit(1)).as("line_df"))
    val kept = lines.join(lineDf, Seq("k"), "left")
      .filter(length(col("k")) === 0 || col("line_df") <= maxDf)
    val rebuilt = kept.groupBy("id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("text_kept"))
    val totals = lines.groupBy("id").agg(count(lit(1)).as("n_lines"))
    docs.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(rebuilt, Seq("id"), "left")
      // a null-text doc explodes to no rows at all: both counts are 0
      // (not one NULL and one 0 — the columns must agree for ratios)
      .select(col("id"), coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("text_kept"))
  }
}
