package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Multi-format file sinks (SURVEY.md §2.7 Q48).
  *
  * The reference dispatches on file extension — json, csv, tsv, parquet,
  * xlsx (here a dependency-free minimal OOXML writer; pickle stays out
  * of scope as a Python-runtime serialization) — with per-entity naming:
  * facts `{name}-{start}-{stop}.{ext}`, dims `dict-{name}.{ext}`
  * (`ET-ETL-DWH-PY312/ETL/Load.py:186-224`).
  * The reference's extension-dispatch bugs (csv→to_excel etc.,
  * Load.py:214-220) are intent-corrected here, per SURVEY.md §7.4.
  *
  * All writers are directory-atomic (Spark commit protocol: _SUCCESS
  * marker), replacing the reference's per-connection transaction
  * commit/rollback (utils.py:222-239).
  */
object Sinks {

  def factFileName(name: String, start: String, stop: String): String =
    s"$name-$start-$stop"
  def dimFileName(name: String): String = s"dict-$name"

  /** Text sinks can't hold nested values — JSON-encode struct/array/map
    * columns (the reference's pandas `to_csv` stringified nested dicts
    * the same way, just less parseably).
    */
  def flattenForText(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        // binary → hex, not Array[Byte].toString identity garbage
        case org.apache.spark.sql.types.BinaryType =>
          org.apache.spark.sql.functions.hex(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Bucketed catalog table: co-locates rows by join key so repeated
    * large-to-large joins/aggregations on `bucketCols` run shuffle-free
    * (both sides pre-hashed into the same bucket count). This is the
    * persistent-layout answer to the reference's repeated
    * sessions⨝children joins — at 100 TB, bucketing the fact tables by
    * session id removes the dominant exchange from every child join.
    * Sorted within buckets so sort-merge joins skip the sort too.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Seq.empty,
                    path: Option[String] = None): Unit = {
    // r18: cluster rows by the bucket key BEFORE the bucketed write.
    // repartition(n, cols) is the same HashPartitioning(murmur3) the
    // bucket spec uses, so each write task holds exactly one bucket and
    // emits ONE file per bucket instead of (input tasks × nBuckets)
    // fragments — guide §6 output sizing: the whole point of paying the
    // bucket shuffle once is a clean per-bucket file layout, and the
    // per-task sortBy then sorts whole buckets, not slices. Row content
    // is untouched (the read-back differential proves it).
    val clustered = df.repartition(nBuckets, bucketCols.map(col): _*)
    val w = clustered.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    // an explicit path makes the table EXTERNAL: data lands where the
    // caller says (scratch, a lake prefix) instead of the session
    // warehouse dir, while the catalog still carries the bucket spec
    path.fold(sorted)(p => sorted.option("path", p)).saveAsTable(table)
  }

  def write(df: DataFrame, path: String, format: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = format match {
    case "parquet" => df.write.mode(mode).parquet(path)
    case "orc" => df.write.mode(mode).orc(path)
    case "json" => df.write.mode(mode).json(path)
    // escape = quote char => RFC-4180 "" doubling for embedded quotes
    // (Spark's default backslash escaping is a dialect most other csv
    // readers — DuckDB, pandas, BigQuery load — do not speak; the
    // reference's pandas to_csv emits RFC-4180 too)
    case "csv" =>
      flattenForText(df).write.mode(mode).option("header", "true")
        .option("escape", "\"").csv(path)
    case "tsv" =>
      flattenForText(df).write.mode(mode).option("header", "true")
        .option("escape", "\"").option("sep", "\t").csv(path)
    case "xlsx" =>
      writeXlsx(df, if (path.endsWith(".xlsx")) path else s"$path.xlsx", mode = mode)
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported sink format: $other (reference's pickle/looker are out " +
          "of scope; avro needs the spark-avro module, absent from this build)")
  }

  /** xlsx export (Load.py:210-213's `to_excel`): a BI handoff file, so —
    * like the reference's pandas path — inherently a bounded,
    * driver-side artifact, enforced by `maxRows`. Written as minimal
    * ECMA-376 SpreadsheetML over `java.util.zip`: no dependency needed.
    * A header row carries the column names (pandas to_excel default).
    *
    * CELL-TYPE CONTRACT (gated by SinksSpec + the x_xlsx_hash pins):
    *  - numeric columns → TYPED number cells (`<c><v>…` — no `t`
    *    attribute, i.e. SpreadsheetML's Number type), so a BI tool
    *    reads real numbers, not digit strings;
    *  - booleans → typed `t="b"` cells;
    *  - dates/timestamps → ISO-style TEXT by design (`yyyy-MM-dd` /
    *    `yyyy-MM-dd HH:mm:ss.f` — the JDBC toString forms):
    *    SpreadsheetML date cells are 1900-epoch numeric serials that
    *    need a styles.xml number-format to read back as dates at all
    *    (plus the leap-year-1900 compatibility bug); unambiguous ISO
    *    text is the portable choice for a handoff artifact, and every
    *    spreadsheet tool parses it on import;
    *  - complex/binary → JSON / hex text ([[flattenForText]]);
    *    everything else → inline strings.
    */
  def writeXlsx(df: DataFrame, file: String, maxRows: Int = 1048575,
                mode: SaveMode = SaveMode.Overwrite): Unit = {
    val exists = new java.io.File(file).exists()
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"writeXlsx: $file already exists")
      case SaveMode.Ignore if exists => return
      case SaveMode.Append =>
        throw new IllegalArgumentException(
          "writeXlsx: append is not supported for a single-file BI artifact")
      case _ => ()
    }
    val flat = flattenForText(df)
    val rows = flat.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"writeXlsx: more than $maxRows rows — an xlsx export is a bounded BI artifact; " +
        "use a distributed sink for data this size")
    val numeric = flat.schema.fields.map(_.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    })

    def esc(s: String): String = {
      // control chars below 0x20 (except TAB/LF/CR) are illegal in XML
      // 1.0 even as entities — substitute, or the whole file is corrupt
      val clean = s.map(c =>
        if (c < ' ' && c != '\t' && c != '\n' && c != '\r') '�' else c)
      clean
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;")
    }

    def finite(n: Any): Boolean = n match {
      case d: Double => !d.isNaN && !d.isInfinite
      case f: Float => !f.isNaN && !f.isInfinite
      case _ => true
    }
    def cellXml(v: Any, isNum: Boolean): String = v match {
      // null → an EMPTY cell element, never a skipped one: cells carry
      // no r= attribute, so a skipped cell would shift every later
      // value one column left
      case null => "<c/>"
      case b: Boolean => s"""<c t="b"><v>${if (b) 1 else 0}</v></c>"""
      // NaN/Infinity are not valid SpreadsheetML numbers (Excel flags
      // the file as corrupt) — land them as empty cells like null
      case n if isNum && !finite(n) => "<c/>"
      case n if isNum => s"""<c><v>$n</v></c>"""
      // xml:space="preserve": Excel otherwise strips leading/trailing
      // whitespace from inline strings on load
      case other =>
        s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
    }

    val header = flat.columns
      .map(c => s"""<c t="inlineStr"><is><t xml:space="preserve">${esc(c)}</t></is></c>""").mkString
    val body = new StringBuilder
    body.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      .append(s"<row>$header</row>")
    rows.foreach { r =>
      body.append("<row>")
      var i = 0
      while (i < r.length) {
        body.append(cellXml(if (r.isNullAt(i)) null else r.get(i), numeric(i)))
        i += 1
      }
      body.append("</row>")
    }
    body.append("</sheetData></worksheet>")

    val entries = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" -> body.toString)

    val f = new java.io.File(file)
    Option(f.getParentFile).foreach(_.mkdirs())
    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    try entries.foreach { case (name, content) =>
      val e = new java.util.zip.ZipEntry(name)
      // BYTE-DETERMINISTIC package: fixed entry order (the Seq above)
      // plus a fixed DOS-epoch timestamp — a fresh ZipEntry otherwise
      // stamps wall-clock mtime, making every write byte-unique and
      // unpinnable. setTimeLocal avoids the TZ-dependent DOS
      // conversion setTime(millis) would apply.
      e.setTimeLocal(java.time.LocalDateTime.of(1980, 1, 1, 0, 0, 0))
      zip.putNextEntry(e)
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    } finally zip.close()
  }
}
