package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extensions: dedup families, ANN, text quality,
  * corpus ops, multimodal, search. Since r14 the per-family maps live
  * in ExtQueries{Corpus,Dedup,Ann,Text,Eval,Search,Multimodal,
  * Selection,Layout}.scala (pure relocation — no query or oracle text
  * changed); this object merges them (disjointness enforced here, and
  * per-file duplicate shadowing is caught by RegistryLintSpec) and
  * keeps the shared helpers (scratch lifecycle, text round-trip,
  * content-hash pins) the families import.
  */
private[graft] object ExtQueries {

  private def merged[T](what: String, maps: Seq[Map[String, T]]): Map[String, T] = {
    val all = maps.flatMap(_.keys)
    require(all.size == all.distinct.size,
      s"duplicate $what keys across ExtQueries family files: " +
        all.diff(all.distinct).distinct.mkString(", "))
    maps.reduce(_ ++ _)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = merged("query", Seq(
    ExtQueriesCorpus.queries, ExtQueriesDedup.queries, ExtQueriesAnn.queries,
    ExtQueriesText.queries, ExtQueriesEval.queries, ExtQueriesSearch.queries,
    ExtQueriesMultimodal.queries, ExtQueriesSelection.queries,
    ExtQueriesLayout.queries))

  val oracles: Map[String, String] = merged("oracle", Seq(
    ExtQueriesCorpus.oracles, ExtQueriesDedup.oracles, ExtQueriesAnn.oracles,
    ExtQueriesText.oracles, ExtQueriesEval.oracles, ExtQueriesSearch.oracles,
    ExtQueriesMultimodal.oracles, ExtQueriesSelection.oracles,
    ExtQueriesLayout.oracles))


  /** x_csv_roundtrip / x_tsv_roundtrip body: decorate documents.text
    * with the six text-sink danger classes (comma, quote, newline,
    * backslash, tab, unchanged — doc_id-keyed so the oracle replays it
    * exactly), write through [[graft.sink.Sinks.write]]'s RFC-4180
    * csv/tsv path to a deterministic (input-dir, process)-keyed
    * scratch dir (distinct per SF, race-free across concurrent JVMs,
    * reaped by a JVM-exit hook, inspectable by an external reader for
    * cross-engine parse evidence while the JVM lives), then PARSE THE
    * FILE BACK
    * and return the rows — what the gate hashes is the post-trip
    * content, not the pre-write frame.
    */
  /** Per-process scratch dirs under java.io.tmpdir, deleted by ONE
    * JVM-exit shutdown hook: the per-pid naming that makes concurrent
    * JVMs race-free would otherwise leak a full artifact copy per run
    * (GB-scale for the text round trips at 10x/100x) until /tmp fills
    * and trips the bench's own disk-contamination warnings. Crashed
    * JVMs can still leak; bounded by crashes, not by runs.
    */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val scratchHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach { dir =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(dir))
      }))
    ()
  }
  private[registry] def scratchWithCleanup(path: String): String = {
    scratchHook
    scratchDirs.add(path)
    new java.io.File(path).mkdirs()
    path
  }

  private[registry] def textRoundtrip(s: SparkSession, d: String,
                            format: String): DataFrame = {
    val deco = t(s, d, "documents").select(col("doc_id"), col("lang"),
      concat(col("text"), element_at(array(
          lit(",x"), lit("\"q\""), lit("\nL2"), lit("\\b"), lit("\tt"),
          lit("")),
        (col("doc_id") % 6 + 1).cast("int"))).as("text"))
    // per-SF output dir keyed by the INPUT DIR string (sanitized name +
    // hash), not a row count — counting just to name the directory was
    // an extra full decoration pass per run. A per-PROCESS pid segment
    // keeps two concurrent JVMs on the same SF (a bench overlapping a
    // verify) from racing overwrite-vs-read on one directory and
    // reading a partially rewritten file. No '=' in any segment: Spark
    // parses `k=v` path segments as hive partition columns even on a
    // direct read (the CONFLICTING_PARTITION_COLUMN_NAMES lesson).
    val dirTag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_") +
      "-" + (d.hashCode.toLong & 0xffffffffL).toHexString +
      "-p" + java.lang.ProcessHandle.current().pid()
    val path = scratchWithCleanup(
      s"${System.getProperty("java.io.tmpdir")}/graft_${format}_rt/$dirTag")
    graft.sink.Sinks.write(deco, path, format)
    s.read.option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .option("sep", if (format == "tsv") "\t" else ",")
      .schema(deco.schema)
      .csv(path)
      .orderBy("doc_id")
  }

  /** Order-insensitive 64-bit content hash of a frame: bit_xor of
    * per-row xxhash64 over all columns (fixed seed), mixed with the
    * row count driver-side (xor alone would let even-multiplicity
    * duplicate rows cancel; a wrapping sum would trip ANSI overflow).
    * Partitioning- and row-order-independent; any per-row value or
    * row-set change moves it. Used by the `*_hash` determinism pins
    * and tools/HashPinProbe.
    */
  private[graft] def contentHash64(df: DataFrame): Long = {
    val r = df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)").as("x"), count(lit(1)).as("n")).head()
    val x = if (r.isNullAt(0)) 0L else r.getLong(0)
    x * 1000003L + r.getLong(1)
  }

  /** Measured content hashes of the deterministic rows-only outputs,
    * keyed by (query, sf-dir basename). Re-measure with
    * `runMain graft.tools.HashPinProbe` after any INTENDED change to
    * these paths and update here — an unintended change fails the
    * driver gate, which is the point.
    */
  private[graft] val contentHashPins: Map[(String, String), Long] = Map(
    ("x_ann_ivf", "sf0.001") -> -3636469399737803661L,
    ("x_ann_ivf", "sf0.01") -> -2489321464831200571L,
    ("x_ann_ivf", "sf0.1") -> -8873158710060108331L,
    ("x_ann_pq", "sf0.001") -> -7502188247379019912L,
    ("x_ann_pq", "sf0.01") -> -7402432719977774432L,
    ("x_ann_pq", "sf0.1") -> 3546076473341213L,
    ("x_ann_ivfpq", "sf0.001") -> -7668675837994594115L,
    ("x_ann_ivfpq", "sf0.01") -> -6216140357795256343L,
    ("x_ann_ivfpq", "sf0.1") -> 1836885082496899909L,
    ("x_compression_ratio", "sf0.001") -> -3413277655601523733L,
    ("x_compression_ratio", "sf0.01") -> -8380364903344526422L,
    ("x_compression_ratio", "sf0.1") -> -7567299456518738542L
  )

  // Computed-hash memo, keyed by (query, canonical data dir): the raw
  // ANN rows are the registry's most expensive builds, and without the
  // memo every *_hash pin re-ran its full index build per evaluation —
  // r10's two heaviest bench rows were exactly that waste. Sound
  // within a JVM because every pinned query is deterministic by
  // construction (that is what the pin asserts) and the testdata dirs
  // are immutable for a process lifetime.
  private val pinHashMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  /** x_xlsx_hash body: write a bounded mixed-type BI artifact (first
    * 100 documents by doc_id: long, string, multiline text, bool,
    * rounded double, nullable string) through [[graft.sink.Sinks
    * .writeXlsx]] twice into a per-process scratch dir. Returns
    * (package-bytes FNV of write 1, of write 2, LOGICAL FNV of
    * write 1). The two package hashes gate byte-determinism within a
    * JVM; the PIN compares the logical hash — entry names + their
    * UNCOMPRESSED contents in package order — so it covers everything
    * the writer controls (entry order, names, XML shape, cell typing)
    * without also pinning the JDK's bundled zlib: a vendor Deflater
    * change would flip a raw package hash with zero repo change.
    */
  private[graft] def xlsxArtifactHash(s: SparkSession, d: String): (Long, Long, Long) = {
    val docs = t(s, d, "documents").orderBy("doc_id").limit(100)
      .select(col("doc_id"), col("lang"), col("text"),
        (col("doc_id") % 7 === 0).as("lucky"),
        round(col("doc_id").cast("double") / 7.0, 6).as("ratio"),
        when(col("doc_id") % 5 === 0, col("lang")).as("maybe_lang"))
    val dirTag = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_") +
      "-p" + java.lang.ProcessHandle.current().pid()
    val base = scratchWithCleanup(
      s"${System.getProperty("java.io.tmpdir")}/graft_xlsx_pin/$dirTag")
    def write(name: String): String = {
      val f = s"$base/$name.xlsx"
      graft.sink.Sinks.writeXlsx(docs, f)
      f
    }
    def packageHash(f: String): Long =
      graft.functions.VectorExpressions.fnv1a64Bytes(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
    def logicalHash(f: String): Long = {
      val zin = new java.util.zip.ZipInputStream(new java.io.FileInputStream(f))
      val buf = new java.io.ByteArrayOutputStream()
      try {
        var e = zin.getNextEntry
        while (e != null) {
          buf.write(e.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          buf.write(0)
          zin.transferTo(buf)
          buf.write(0)
          e = zin.getNextEntry
        }
      } finally zin.close()
      graft.functions.VectorExpressions.fnv1a64Bytes(buf.toByteArray)
    }
    val f1 = write("a")
    val f2 = write("b")
    (packageHash(f1), packageHash(f2), logicalHash(f1))
  }

  /** Measured per-SF LOGICAL hashes of the x_xlsx_hash artifact — the
    * same pin contract as [[contentHashPins]], but over the package's
    * entry names + uncompressed contents in order, so any writer
    * change — entry order, names, XML shape, cell typing — moves it,
    * while a JDK zlib (Deflater) change does not. Re-measure with
    * tools/HashPinProbe after any INTENDED writer change.
    */
  private[registry] val xlsxBytePins: Map[String, Long] = Map(
    "sf0.001" -> -281397838303103071L,
    "sf0.01" -> -7855534126656838975L,
    "sf0.1" -> 5661463465944771590L
  )

  private[registry] def hashPinVerdict(s: SparkSession, d: String,
                             q: String): DataFrame = {
    import s.implicits._
    val ok = contentHashPins.get((q, new java.io.File(d).getName)) match {
      case Some(pin) =>
        val key = (q, new java.io.File(d).getCanonicalPath)
        pinHashMemo.computeIfAbsent(key,
          _ => contentHash64(queries(q)(s, d))).longValue() == pin
      case None      => true // unpinned dir: trivially green, by design
    }
    Seq((s"${q}_content_hash_pinned", ok)).toDF("check_name", "ok")
  }
}
