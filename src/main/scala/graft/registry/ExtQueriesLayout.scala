package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cleanse, Enrich, Flatten, Upsert}
import graft.ext.{Dedup, Similarity, TextOps}
import graft.registry.Fixtures._

/** LLM-pipeline extension registry — storage layout and sink round-trips.
  * Split from the former monolithic ExtQueries (r14):
  * pure relocation, no query or oracle text changed.
  */
private[graft] object ExtQueriesLayout {
  import ExtQueries.{hashPinVerdict, textRoundtrip, xlsxArtifactHash, xlsxBytePins}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_zorder_layout" -> ((s, d) =>
      // Morton z-value over (custkey, days-since-epoch) — the write-
      // time clustering key for two-dimensional data skipping; pure
      // bit arithmetic, replayed bit-for-bit by the oracle
      t(s, d, "orders").select(col("o_orderkey"),
          graft.ops.Layout.zValue(col("o_custkey"),
            datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
            .as("zval"))
        .orderBy("o_orderkey")),

    "x_zorder3" -> ((s, d) => {
      // three-dimensional Morton code (custkey, day index, priority
      // class) — the clustering key for a fact queried by key AND date
      // AND category; bit i of column k lands at position 3i+k
      val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val pri = substring(col("o_orderpriority"), 1, 1).cast("long")
      t(s, d, "orders").select(col("o_orderkey"),
          graft.ops.Layout.zValueN(
            Seq(col("o_custkey"), day, pri), bits = 16).as("zval"))
        .orderBy("o_orderkey")
    }),

    "x_zrange_scan" -> ((s, d) => {
      // read-side z-probe: a (custkey, day) box answered through the
      // quadtree z-range cover + residual predicate — must equal the
      // plain box filter (the oracle IS the plain box filter); on a
      // z-sorted table each range is one contiguous scan
      val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val o = t(s, d, "orders").withColumn("zval",
        graft.ops.Layout.zValue(col("o_custkey"), day, bits = 12))
      graft.ops.Layout.scanZBox(o, col("o_custkey"), day, col("zval"),
          100L, 299L, 1200L, 2399L, bits = 12, maxRanges = 64)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    "x_xlsx_hash" -> ((s, d) => {
      // Byte-determinism pin for the OOXML (xlsx) sink — the last §2
      // operator that carried only spec evidence. The writer is
      // byte-deterministic by construction (fixed zip entry order,
      // fixed DOS-epoch timestamps, single-threaded driver-side
      // serialization), so the whole package's FNV-1a at a given SF is
      // a constant: the row writes the bounded BI artifact TWICE
      // (mixed types: long/string/multiline text/bool/double/nullable)
      // and gates (a) the two writes byte-agree, (b) the bytes match
      // the per-SF pin measured by tools/HashPinProbe. Unpinned dirs
      // (10x/100x replicas) gate (a) only, like the other pins.
      import s.implicits._
      val (p1, p2, logical) = xlsxArtifactHash(s, d)
      val pinOk =
        xlsxBytePins.get(new java.io.File(d).getName).forall(_ == logical)
      Seq(("xlsx_bytes_deterministic", p1 == p2),
          ("xlsx_bytes_pinned", pinOk)).toDF("check_name", "ok")
        .orderBy("check_name")
    }),

    "x_orc_roundtrip" -> ((s, d) => {
      // columnar-format breadth: write documents as ORC (Spark's other
      // built-in columnar format), read it back, checksum. DuckDB
      // cannot read ORC, so — like x_compact — the oracle computes the
      // same aggregate over the parquet ORIGINAL; a full match proves
      // the ORC round trip preserved every row byte-for-byte.
      val tmp = java.nio.file.Files.createTempDirectory("graft_orc")
        .resolve("documents").toString
      graft.sink.Sinks.write(t(s, d, "documents"), tmp, "orc")
      val fnvB = graft.functions.VectorExpressions.fnv1a64(col("text"))
      s.read.orc(tmp).agg(
        count(lit(1)).as("n"),
        sum(col("doc_id")).as("id_sum"),
        sum(pmod(fnvB, lit(1000000L))).as("text_fnv_sum"),
        sum(col("n_chars")).as("chars_sum"))
        .withColumn("format", lit("orc"))
    }),

    "x_csv_roundtrip" -> ((s, d) =>
      // text-sink quoting gauntlet (§2.7 Q48 read-back oracle): text
      // decorated with every csv danger class — embedded comma, quote,
      // newline, backslash, tab, and unchanged — keyed by doc_id, then
      // written through the RFC-4180 csv sink and the FILE parsed back.
      // The oracle replays the decoration over the parquet original, so
      // a full row+schema+hash match proves Spark's quoting/escaping
      // survived the write+parse trip for all five classes. (DuckDB
      // read_csv parses the same engine-written file byte-identically —
      // cross-engine evidence recorded in SCALE.md; the gate row stays
      // self-contained so it never depends on a shared /tmp.)
      textRoundtrip(s, d, "csv")),

    "x_tsv_roundtrip" -> ((s, d) =>
      // the same gauntlet through the tab-separated sink — the tab
      // decoration class is the one that MUST force quoting here
      textRoundtrip(s, d, "tsv")),

    "x_compact" -> ((s, d) => {
      // compaction round-trip: fragment documents into 32 small files,
      // bin-pack them back, then CHECKSUM THE COMPACTED COPY — the
      // oracle computes the same aggregate over the original table, so
      // a full hash match proves compaction preserved every row byte-
      // for-byte while the emitted file count collapsed
      val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
        .resolve("documents").toString
      t(s, d, "documents").repartition(32).write
        .mode("overwrite").parquet(tmp)
      val rep = graft.ops.Layout.compact(s, tmp, targetBytes = 256L * 1024 * 1024)
      val fnvB = graft.functions.VectorExpressions.fnv1a64(col("text"))
      s.read.parquet(tmp).agg(
        count(lit(1)).as("n"),
        sum(col("doc_id")).as("id_sum"),
        sum(pmod(fnvB, lit(1000000L))).as("text_fnv_sum"),
        sum(col("n_chars")).as("chars_sum"))
        .withColumn("compacted", lit(rep.filesAfter < rep.filesBefore))
    }),

    "x_bucketed_join" -> ((s, d) => {
      // bucketed-layout round trip on REAL fact tables: orders and
      // lineitem land as 8-bucket catalog tables hashed+sorted on the
      // join key (the pay-the-shuffle-once layout — at 100 TB every
      // subsequent orderkey join/agg on these tables is Exchange-free,
      // the SinksSpec-pinned plan shape), then the revenue-by-priority
      // rollup runs over the BUCKETED READ-BACK. The oracle computes
      // the same rollup over the original parquet, so a full match
      // proves the bucketed write+read preserved every row. Unique
      // table names per call: Verify/Bench reuse one catalog.
      val scratch = scratchDir("graft-bucketed")
      val tag = new java.io.File(scratch).getName
        .replaceAll("[^A-Za-z0-9]", "_")
      val oT = s"graft_bkt_orders_$tag"
      val lT = s"graft_bkt_lineitem_$tag"
      graft.sink.Sinks.writeBucketed(t(s, d, "orders"), oT,
        Seq("o_orderkey"), 8, sortCols = Seq("o_orderkey"),
        path = Some(s"$scratch/orders"))
      graft.sink.Sinks.writeBucketed(t(s, d, "lineitem"), lT,
        Seq("l_orderkey"), 8, sortCols = Seq("l_orderkey"),
        path = Some(s"$scratch/lineitem"))
      s.table(lT)
        .join(s.table(oT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"),
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),
  )

  val oracles: Map[String, String] = Map(
    "x_xlsx_hash" ->
      """SELECT * FROM (VALUES ('xlsx_bytes_deterministic', TRUE),
        |  ('xlsx_bytes_pinned', TRUE))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    // the z-probe must be SEMANTICALLY the box filter — the oracle is
    // the box filter itself, no z replay needed
    "x_zrange_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_custkey BETWEEN 100 AND 299
        |  AND datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) BETWEEN 1200 AND 2399
        |ORDER BY o_orderkey""".stripMargin,

    // three-way interleave replay: bit i of column k at position 3i+k
    "x_zorder3" ->
      """SELECT o_orderkey,
        |  CAST(list_sum(list_transform(range(0, 16), i ->
        |    (((CAST(o_custkey AS BIGINT) >> i) & 1) << (3*i))
        |    + (((CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) >> i) & 1) << (3*i+1))
        |    + (((CAST(substring(o_orderpriority, 1, 1) AS BIGINT) >> i) & 1) << (3*i+2))
        |  )) AS BIGINT) AS zval
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // bit-for-bit Morton replay: even bits custkey, odd bits day index
    "x_zorder_layout" ->
      """SELECT o_orderkey,
        |  CAST(list_sum(list_transform(range(0, 31), i ->
        |    (((CAST(o_custkey AS BIGINT) >> i) & 1) << (2*i))
        |    + (((CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) >> i) & 1) << (2*i+1))
        |  )) AS BIGINT) AS zval
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the same doc_id-keyed danger-class decoration over the parquet
    // ORIGINAL — a full row+schema+hash match proves the engine's
    // csv write+parse trip preserved commas/quotes/newlines/
    // backslashes/tabs byte-for-byte ('\b' in a DuckDB standard
    // string is literally backslash+b; chr(10)/chr(9) are the real
    // control chars, never escape sequences)
    "x_csv_roundtrip" ->
      """SELECT doc_id, lang,
        |  text || CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN ',x'
        |    WHEN 1 THEN '"q"'
        |    WHEN 2 THEN chr(10) || 'L2'
        |    WHEN 3 THEN '\b'
        |    WHEN 4 THEN chr(9) || 't'
        |    ELSE '' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x_tsv_roundtrip" ->
      """SELECT doc_id, lang,
        |  text || CASE CAST(doc_id % 6 AS INTEGER)
        |    WHEN 0 THEN ',x'
        |    WHEN 1 THEN '"q"'
        |    WHEN 2 THEN chr(10) || 'L2'
        |    WHEN 3 THEN '\b'
        |    WHEN 4 THEN chr(9) || 't'
        |    ELSE '' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // content checksum over the ORIGINAL parquet — must equal the
    // engine's checksum of the ORC read-back
    "x_orc_roundtrip" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum((((${signedSql("hu")} % 1000000) + 1000000) % 1000000)) AS BIGINT) AS text_fnv_sum,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
         |  'orc' AS format
         |FROM (SELECT doc_id, n_chars, ${fnvSql("text")} AS hu FROM documents)""".stripMargin,

    // content checksum over the ORIGINAL table — must equal the
    // engine's checksum of the compacted rewrite
    "x_compact" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum((((${signedSql("hu")} % 1000000) + 1000000) % 1000000)) AS BIGINT) AS text_fnv_sum,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
         |  TRUE AS compacted
         |FROM (SELECT doc_id, n_chars, ${fnvSql("text")} AS hu FROM documents)""".stripMargin,

    // the same rollup over the ORIGINAL parquet — a full match proves
    // the bucketed write+read-back preserved every row
    "x_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
