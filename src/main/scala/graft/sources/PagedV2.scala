package graft.sources

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the paged-extract connector
  * (`ET-ETL-DWH-PY312/ETL/Extract.py:23-117`'s page loop as a Spark
  * TABLE): `spark.read.format("graft-paged").option("dir", …)
  * .option("prefix", …)` over a directory of `<prefix>-<n>.json` page
  * files, each holding one JSON array of records (the dump format the
  * reference's extract writes).
  *
  * Why a connector and not [[PagedExtract.read]]'s driver loop: the
  * driver loop fetches pages SEQUENTIALLY (as the reference does,
  * Extract.py:56-66) and ships the strings through a `createDataset`.
  * Here every page is an [[InputPartition]] — pages are read and parsed
  * ON EXECUTORS, in parallel, and never pass through the driver at all;
  * at 100 TB of page dumps the scan scales with the cluster instead of
  * the driver's socket.
  *
  * The connector is honest DSv2, not a wrapper:
  *   - partition planning: one partition per page file, so a 10k-page
  *     extract becomes a 10k-task parallel scan;
  *   - filter pushdown ([[SupportsPushDownFilters]]): comparisons and
  *     IN-lists on the `page` column prune page FILES at planning time
  *     — `WHERE page < 3` plans 3 partitions, not all of them (the
  *     driver-facing `.explain` shows them under `PushedFilters`);
  *   - column pruning ([[SupportsPushDownRequiredColumns]]): a
  *     `payload`-only projection never materializes the page number,
  *     and a `page`-only scan (e.g. `count(*) GROUP BY page`) never
  *     allocates the payload strings;
  *   - statistics ([[SupportsReportStatistics]]): planned-file byte
  *     sizes feed the optimizer's broadcast decision, post-pruning.
  *
  * Rows are `(page INT, payload STRING)` — one row per top-level array
  * element, the element's raw JSON text. Typing stays downstream via
  * `from_json`, exactly like Spark's own text-based sources; the schema
  * of the payload is the reader's contract, not the connector's.
  */
final class PagedSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-paged"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedV2.schema

  // writes present their own (payload-only) schema; reads infer ours
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = properties.get("dir")
    val prefix = Option(properties.get("prefix")).getOrElse("page")
    require(dir != null, "graft-paged: option 'dir' is required")
    // the only externally-provided schema we accept is the write
    // path's payload-only frame; a custom READ schema would desync
    // from what the scan produces — reject it instead of mis-binding
    require(schema == PagedV2.schema ||
      (schema.fieldNames.toSeq == Seq("payload") &&
        schema.fields.head.dataType == StringType),
      s"graft-paged: reads use the fixed (page INT, payload STRING) schema; " +
        s"got ${schema.simpleString}")
    new PagedTable(dir, prefix, schema)
  }
}

object PagedV2 {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** Per-(dir, prefix) monitors serializing same-JVM committers — see
    * [[PagedBatchWrite.commit]]. Canonical path so two spellings of the
    * same dir share a monitor.
    */
  private val commitMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[sources] def commitMonitor(dir: String, prefix: String): Object =
    commitMonitors.computeIfAbsent(
      new java.io.File(dir).getCanonicalPath + "#" + prefix, _ => new Object)

  /** Page files under `dir` named `<prefix>-<n>.json`, as (n, path),
    * page order. Listing is driver-side planning work, like any file
    * source's; the FILE CONTENTS never touch the driver.
    */
  def listPages(dir: String, prefix: String): Seq[(Int, String)] = {
    val d = new java.io.File(dir)
    val re = (java.util.regex.Pattern.quote(prefix) + "-(\\d+)\\.json").r
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap { f =>
        f.getName match {
          case re(n) => Some((n.toInt, f.getAbsolutePath))
          case _     => None
        }
      }
      .sortBy(_._1)
  }

  /** Top-level JSON array → raw element strings (Jackson streaming, the
    * parser Spark's own JSON source uses). Runs on executors, one page
    * at a time — memory is bounded by a page, not the extract.
    */
  def splitTopLevelArray(json: String): Seq[String] = {
    val factory = new com.fasterxml.jackson.core.JsonFactory()
    val p = factory.createParser(json)
    try {
      val out = ArrayBuffer.empty[String]
      val first = p.nextToken()
      if (first == null) return Seq.empty
      require(first == com.fasterxml.jackson.core.JsonToken.START_ARRAY,
        "graft-paged: page payload must be a top-level JSON array")
      val w = new java.io.StringWriter()
      val gen = factory.createGenerator(w)
      // the generator treats each copied element as a root value and
      // would prepend its root-value separator (a space) from the
      // second element on — that leading space would make payload
      // bytes position-dependent and break exact-match/hash dedup
      gen.setRootValueSeparator(null)
      while (p.nextToken() != com.fasterxml.jackson.core.JsonToken.END_ARRAY) {
        w.getBuffer.setLength(0)
        gen.copyCurrentStructure(p)
        gen.flush()
        out += w.toString
      }
      gen.close()
      out.toSeq
    } finally p.close()
  }

  /** Same-JVM observability for specs (local mode): pages actually
    * OPENED by readers — partition pruning shows up as fewer opens.
    */
  val pagesOpened = new AtomicLong(0)

  private[sources] def manifestPath(dir: String, prefix: String) =
    java.nio.file.Paths.get(dir, s".$prefix.manifest.json")

  /** (data pages, rows) from the commit-written manifest; rows = -1
    * when the dump was appended onto pre-manifest pages whose count is
    * unknowable. Unreadable/unparseable content degrades to None (same
    * as absent) rather than throwing — commit publishes the manifest
    * atomically (temp + rename), but a reader racing a non-atomic
    * filesystem, or a torn file from a crashed pre-fix writer, should
    * report "no manifest", not a Jackson stack trace.
    */
  def readManifest(dir: String, prefix: String): Option[(Long, Long)] = {
    val p = manifestPath(dir, prefix)
    if (!java.nio.file.Files.exists(p)) None
    else
      try {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(p))
        val (pg, rw) = (m.get("pages"), m.get("rows"))
        if (pg == null || rw == null) None
        else Some((pg.asLong, rw.asLong))
      } catch { case _: Exception => None }
  }

  /** Extract-completeness verdicts for a committed dump — the check the
    * reference planned against its count endpoint but never implemented
    * (`Extract.py:158` TODO). The connector's write side IS the count
    * authority here: commit records how many rows its tasks serialized,
    * and this re-derives the count from the published pages and
    * compares. Returns driver-gateable (check_name, ok) rows; the row
    * count is computed lazily by the returned frame (one parallel scan),
    * only the page listing and the tiny manifest read happen at build
    * time — the same planning-time file metadata any file source reads.
    */
  def verifyDump(s: org.apache.spark.sql.SparkSession, dir: String,
                 prefix: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val pages = listPages(dir, prefix)
    val contiguous = pages.map(_._1) == pages.indices.toList
    val termOk = pages.nonEmpty && {
      val last = java.nio.file.Paths.get(pages.last._2)
      java.nio.file.Files.size(last) <= 8 &&
        java.nio.file.Files.readString(last).trim == "[]"
    }
    val manifest = readManifest(dir, prefix)
    val nData = (pages.size - 1).toLong
    s.read.format("graft-paged")
      .option("dir", dir).option("prefix", prefix).load()
      .agg(count(lit(1)).as("n"))
      .select(explode(array(
        struct(lit("pages_contiguous").as("check_name"),
          lit(contiguous).as("ok")),
        struct(lit("terminator_present").as("check_name"),
          lit(termOk).as("ok")),
        struct(lit("manifest_pages_match").as("check_name"),
          lit(manifest.exists(_._1 == nData)).as("ok")),
        struct(lit("manifest_rows_match").as("check_name"),
          (manifest match {
            case Some((_, rows)) if rows >= 0 => col("n") === rows
            case _ => lit(false)
          }).as("ok")))).as("c"))
      .select(col("c.check_name").as("check_name"), col("c.ok").as("ok"))
  }
}

final class PagedTable(dir: String, prefix: String,
                       providedSchema: StructType = PagedV2.schema)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-paged:$dir/$prefix"
  // reads always expose the connector schema; a write presents the
  // incoming frame's schema (validated payload-only in the builder)
  override def schema(): StructType = providedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(dir, prefix)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder =
    new PagedWriteBuilder(dir, prefix, info.schema())
}

final class PagedScanBuilder(dir: String, prefix: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = PagedV2.schema

  // A filter is pushable when it constrains ONLY the page number with a
  // shape we can turn into file pruning. Everything else stays above
  // the scan (Spark re-applies what we don't accept).
  private def pushable(f: sources.Filter): Boolean = f match {
    case sources.EqualTo("page", _)            => true
    case sources.GreaterThan("page", _)        => true
    case sources.GreaterThanOrEqual("page", _) => true
    case sources.LessThan("page", _)           => true
    case sources.LessThanOrEqual("page", _)    => true
    case sources.In("page", _)                 => true
    case _                                     => false
  }

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(pushable)
    filters.filterNot(pushable)
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve OUR field order; Spark's required set decides membership
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(PagedV2.schema.fields.filter(f => keep.contains(f.name)))
  }

  override def build(): Scan = new PagedScan(dir, prefix, pushed, required)
}

final class PagedScan(
    dir: String,
    prefix: String,
    pushed: Array[sources.Filter],
    required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  private def asInt(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => other.toString.toInt
  }

  private def keepPage(n: Int): Boolean = pushed.forall {
    case sources.EqualTo("page", v)            => n == asInt(v)
    case sources.GreaterThan("page", v)        => n > asInt(v)
    case sources.GreaterThanOrEqual("page", v) => n >= asInt(v)
    case sources.LessThan("page", v)           => n < asInt(v)
    case sources.LessThanOrEqual("page", v)    => n <= asInt(v)
    case sources.In("page", vs)                => vs.exists(v => asInt(v) == n)
    case _                                     => true
  }

  // planned = listed ∩ pushed-predicate — pruning happens HERE, before
  // any task launches
  private lazy val planned: Seq[(Int, String)] =
    PagedV2.listPages(dir, prefix).filter { case (n, _) => keepPage(n) }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedMicroBatchStream(dir, prefix, required.fieldNames, keepPage)
  override def description(): String =
    s"graft-paged dir=$dir prefix=$prefix pages=${planned.size} " +
      s"pushed=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    planned.map { case (n, path) => PagedInputPartition(n, path) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required.fieldNames)

  override def estimateStatistics(): Statistics = new Statistics {
    // post-pruning file bytes: what the optimizer should size joins by
    private val bytes = planned.map { case (_, p) => new java.io.File(p).length() }.sum
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
}

final case class PagedInputPartition(page: Int, path: String) extends InputPartition

/** Write path: publish a DataFrame AS a page dump — the inverse of the
  * scan, closing the connector loop (extract dumps in, page dumps
  * out, both ends Spark jobs). Input must carry a `payload` string
  * column (one JSON element per row; any other columns are rejected so
  * nothing silently drops). Each task serializes its partition to ONE
  * page file under a hidden temp name; the driver commit renames tasks'
  * temps to contiguous page numbers in partition order and appends the
  * terminating empty page — so readers (the batch scan, the stream
  * tailer, the reference's own stop-on-empty loop) never observe a
  * half-written dump. Task retries are safe: temps are uniquely named
  * and only the committed attempt's files are renamed; abort deletes
  * temps.
  *
  * Overwrite (`.mode("overwrite")` → TRUNCATE capability) removes the
  * prefix's existing pages inside the same commit, after the new temps
  * are in place.
  */
final class PagedWriteBuilder(dir: String, prefix: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
        require(schema.fieldNames.toSeq == Seq("payload") &&
          schema.fields.head.dataType == StringType,
          s"graft-paged write expects a single `payload` string column, got ${schema.simpleString}")
        new PagedBatchWrite(dir, prefix, doTruncate)
      }
    }
}

final case class PagedWriteMessage(partitionId: Int, tmpPath: String,
                                   rows: Long = 0L)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class PagedBatchWrite(dir: String, prefix: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.DataWriterFactory =
    new PagedDataWriterFactory(dir, prefix)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    // serialize the whole list → rename → terminator sequence against
    // OTHER committers of the same prefix: two concurrent appends would
    // otherwise read the same high-water mark and clobber each other's
    // pages. An exclusive lock on a sidecar file is the correct
    // primitive here because commit() runs once, on the driver of each
    // writing job — writer concurrency is job concurrency, not task
    // concurrency (task retries are already safe via unique temps). On
    // a shared POSIX/NFS mount the OS lock arbitrates across JVMs; an
    // object-store deployment would swap this for a conditional-put
    // commit marker.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // intra-JVM monitor first: concurrent local-mode jobs share one JVM,
    // where a second FileChannel.lock() on the same file throws
    // OverlappingFileLockException rather than blocking
    PagedV2.commitMonitor(dir, prefix).synchronized {
      val lockPath = java.nio.file.Paths.get(dir, s".$prefix.commitlock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
      val lock = ch.lock() // blocks until the competing commit finishes
      try commitLocked(messages)
      finally { lock.release(); ch.close() }
    }
  }

  private def commitLocked(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[PagedWriteMessage]).sortBy(_.partitionId)
    val existing = PagedV2.listPages(dir, prefix)
    val start =
      if (truncate) {
        existing.foreach { case (_, p) => new java.io.File(p).delete() }
        0
      } else {
        // true append: continue numbering from the contiguous high-water
        // mark (the same protocol the stream tailer uses), replacing the
        // old empty-terminator page so the dump stays one unbroken
        // stop-on-empty sequence
        val present = existing.toMap
        var hi = 0
        while (present.contains(hi)) hi += 1
        val base = {
          // size gate before reading: the terminator is 2 bytes ("[]");
          // without it a crashed previous write's last DATA page — one
          // partition's whole JSON array — would be pulled into a
          // driver String just to fail a 2-char comparison
          val last = java.nio.file.Paths.get(present.getOrElse(hi - 1, ""))
          if (hi > 0 && java.nio.file.Files.size(last) <= 8 &&
              java.nio.file.Files.readString(last).trim == "[]") hi - 1
          else hi
        }
        // anything at or past the insertion point — the old terminator and
        // any stale pages beyond it — would interleave with the new pages
        // in a later scan; remove them before publishing
        existing.filter(_._1 >= base).foreach { case (_, p) => new java.io.File(p).delete() }
        base
      }
    msgs.zipWithIndex.foreach { case (m, i) =>
      val dst = java.nio.file.Paths.get(dir, s"$prefix-${start + i}.json")
      java.nio.file.Files.move(java.nio.file.Paths.get(m.tmpPath), dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // the terminating empty page — the reference's stop condition
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"$prefix-${start + msgs.length}.json"), "[]")
    // count manifest (the completeness check Extract.py:158 planned):
    // cumulative data pages + rows across connector commits. Appending
    // onto a pre-manifest dump makes the historical row count
    // unknowable — record rows=-1 so verification reports, not lies.
    val priorRows: Long =
      if (start == 0) 0L
      else PagedV2.readManifest(dir, prefix).map(_._2).getOrElse(-1L)
    val totalRows =
      if (priorRows < 0) -1L else priorRows + msgs.map(_.rows).sum
    // publish via dot-temp + move — the same rename protocol the pages
    // use. An in-place truncate-then-write would let a concurrent
    // readManifest (verifyDump, or another committer's prior-rows read)
    // observe a partial/empty file.
    val mdst = PagedV2.manifestPath(dir, prefix)
    val mtmp = mdst.resolveSibling(
      s"${mdst.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    java.nio.file.Files.writeString(mtmp,
      s"""{"pages":${start + msgs.length},"rows":$totalRows}""")
    try
      java.nio.file.Files.move(mtmp, mdst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(mtmp, mdst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    messages.foreach {
      case PagedWriteMessage(_, tmp, _) => new java.io.File(tmp).delete()
      case _ => ()
    }
}

final class PagedDataWriterFactory(dir: String, prefix: String)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long):
      org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      // hidden temp (leading dot): invisible to listPages until renamed
      private val tmp = java.nio.file.Paths.get(dir,
        s".$prefix-part$partitionId-task$taskId-${java.util.UUID.randomUUID()}.tmp")
      private val w = {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.newBufferedWriter(tmp)
      }
      private var first = true
      private var nRows = 0L
      w.write("[")
      override def write(record: InternalRow): Unit = {
        if (!first) w.write(",")
        first = false
        nRows += 1
        w.write(record.getUTF8String(0).toString)
      }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        w.write("]"); w.close()
        PagedWriteMessage(partitionId, tmp.toString, nRows)
      }
      override def abort(): Unit = { w.close(); java.nio.file.Files.deleteIfExists(tmp) }
      override def close(): Unit = ()
    }
}

/** Streaming form of the paged scan: the page number IS the offset.
  * Each trigger picks up page files in [start, end) where `end` is the
  * highest page present + 1 — so an extract that keeps appending
  * `<prefix>-<n>.json` dumps becomes a structured stream with
  * exactly-once batches (offsets checkpoint like any source's; a
  * restart replans the same page range). This is the reference's
  * incremental re-extract loop (`run-et-etl.py`'s cron cadence)
  * expressed as a Spark stream instead of an external scheduler.
  *
  * Pages must be appended in order (gaps stall the watermark at the
  * first missing number — the same contract the batch stop-on-empty
  * protocol has). The pushed page predicate still applies per batch.
  */
final class PagedMicroBatchStream(
    dir: String, prefix: String, fields: Array[String], keep: Int => Boolean)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class PageOffset(page: Int) extends Offset {
    override def json(): String = s"""{"page":$page}"""
  }

  override def initialOffset(): Offset = PageOffset(0)

  override def latestOffset(): Offset = {
    // contiguous high-water mark: first gap stops the offset so a
    // late-materializing page is never skipped
    val present = PagedV2.listPages(dir, prefix).map(_._1).toSet
    var hi = 0
    while (present.contains(hi)) hi += 1
    PageOffset(hi)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"page":(\d+)\}""".r
    json.trim match {
      case m(n) => PageOffset(n.toInt)
      case other => throw new IllegalArgumentException(s"bad paged offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[PageOffset].page
    val hi = end.asInstanceOf[PageOffset].page
    PagedV2.listPages(dir, prefix)
      .filter { case (n, _) => n >= lo && n < hi && keep(n) }
      .map { case (n, path) => PagedInputPartition(n, path) }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class PagedReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedInputPartition]
    new PartitionReader[InternalRow] {
      private var elems: Iterator[String] = _
      private var current: String = _
      override def next(): Boolean = {
        if (elems == null) {
          PagedV2.pagesOpened.incrementAndGet()
          val body = java.nio.file.Files.readString(java.nio.file.Paths.get(p.path))
          elems = PagedV2.splitTopLevelArray(body).iterator
        }
        if (elems.hasNext) { current = elems.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "page"    => p.page
          case "payload" => UTF8String.fromString(current)
        })
      override def close(): Unit = ()
    }
  }
}
