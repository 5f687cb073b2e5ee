package graft

import java.nio.file.Files

import graft.sink.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "name", "v")

  test("naming convention: facts carry range, dims carry dict- prefix") {
    assert(Sinks.factFileName("sessions", "2024-06-01", "2024-06-02") ===
      "sessions-2024-06-01-2024-06-02")
    assert(Sinks.dimFileName("agents") === "dict-agents")
  }

  test("parquet/orc/json/csv/tsv sinks round-trip with atomic _SUCCESS marker") {
    val base = Files.createTempDirectory("graft-sinks").toString
    for (fmt <- Seq("parquet", "orc", "json", "csv", "tsv")) {
      val path = s"$base/$fmt"
      Sinks.write(df, path, fmt)
      assert(new java.io.File(s"$path/_SUCCESS").exists(), s"$fmt missing commit marker")
      val back = fmt match {
        case "parquet" => spark.read.parquet(path)
        case "orc" => spark.read.orc(path)
        case "json" => spark.read.json(path)
        case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
        case "tsv" => spark.read.option("header", "true").option("sep", "\t")
          .option("inferSchema", "true").csv(path)
      }
      assert(back.count() === 2, s"$fmt row count")
      assert(back.columns.toSet === Set("id", "name", "v"), s"$fmt columns")
    }
  }

  test("csv sink writes RFC-4180: embedded quotes double, not backslash-escape") {
    val base = Files.createTempDirectory("graft-rfc4180").toString
    val tricky = Seq((1L, "he said \"hi\", twice"), (2L, "tab\there"),
      (3L, "line1\nline2")).toDF("id", "txt")
    Sinks.write(tricky, s"$base/csv", "csv")
    val raw = new java.io.File(s"$base/csv").listFiles()
      .filter(_.getName.endsWith(".csv"))
      .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
    // RFC-4180: " inside a quoted field doubles; backslash dialect would
    // emit \" which DuckDB/pandas/BQ readers misparse
    assert(raw.contains("\"he said \"\"hi\"\", twice\""), s"raw csv was:\n$raw")
    assert(!raw.contains("\\\""), "backslash-escaped quote leaked into csv")
    val back = spark.read.option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .schema(tricky.schema).csv(s"$base/csv")
      .orderBy("id").collect().map(_.getString(1))
    assert(back.toSeq === Seq("he said \"hi\", twice", "tab\there", "line1\nline2"))
  }

  test("flattenForText JSON-encodes nested columns, passes scalars through") {
    import org.apache.spark.sql.functions._
    val nested = df.withColumn("s", struct(lit(1).as("a"), lit("x").as("b")))
      .withColumn("arr", array(lit(1), lit(2)))
    val flat = Sinks.flattenForText(nested)
    import org.apache.spark.sql.types.StringType
    assert(flat.schema("s").dataType === StringType)
    assert(flat.schema("arr").dataType === StringType)
    assert(flat.schema("id").dataType !== StringType)
    val r = flat.orderBy("id").collect()(0)
    assert(r.getAs[String]("s") === """{"a":1,"b":"x"}""")
    assert(r.getAs[String]("arr") === "[1,2]")
  }

  test("bucketed tables join without a shuffle exchange") {
    import org.apache.spark.sql.functions._
    val left = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v1")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "v2")
    Sinks.writeBucketed(left, "graft_bkt_l", Seq("k"), 4, sortCols = Seq("k"))
    Sinks.writeBucketed(right, "graft_bkt_r", Seq("k"), 4, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan was:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }

  test("x_bucketed_join registry row plans shuffle-free on the real tables") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.SparkEntry.queries("x_bucketed_join")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      // the post-join rollup legitimately shuffles on its OWN key
      // (5 priorities, after partial agg); the join subtree must not —
      // both bucketed scans feed the SortMergeJoin with no Exchange
      val joinSubtree = plan.split("SortMergeJoin", 2)(1)
      assert(plan.contains("SortMergeJoin") && !joinSubtree.contains("Exchange"),
        s"bucketed fact join should not re-shuffle its inputs, plan was:\n$plan")
      assert(plan.contains("Bucketed: true"))
      assert(df.count() === 5) // one row per order priority
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("unsupported formats fail loudly (pickle/looker out of scope)") {
    val e = intercept[IllegalArgumentException](
      Sinks.write(df, "/tmp/nope", "pickle"))
    assert(e.getMessage.contains("pickle"))
    val a = intercept[IllegalArgumentException](
      Sinks.write(df, "/tmp/nope", "avro"))
    assert(a.getMessage.contains("spark-avro"))
  }

  test("xlsx sink: valid minimal OOXML package with typed cells") {
    import java.util.zip.ZipFile
    val x = Seq(
      (1L, "a & <b>", Option(1.5), true),
      (2L, "plain", Option.empty[Double], false)
    ).toDF("id", "name", "score", "ok")
    val file = java.nio.file.Files.createTempDirectory("graft-xlsx").toString + "/out.xlsx"
    Sinks.write(x, file, "xlsx")
    val zip = new ZipFile(file)
    try {
      val names = {
        val e = zip.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result().toSet
      }
      assert(names === Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
      val sheet = new String(
        zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      // well-formed XML (parse, don't grep)
      val parsed = scala.xml.XML.loadString(sheet)
      val rows = parsed \\ "row"
      assert(rows.length === 3) // header + 2 data rows
      assert((rows.head \\ "t").map(_.text) === Seq("id", "name", "score", "ok"))
      val r1 = rows(1)
      assert((r1 \\ "t").map(_.text).contains("a & <b>")) // escaped + round-tripped
      assert((r1 \\ "v").map(_.text) === Seq("1", "1.5", "1")) // id, score, bool
      // null score in row 2 → EMPTY cell element, not a skipped one:
      // every row must carry exactly 4 <c> elements or later values
      // shift into the wrong columns
      rows.foreach(r => assert((r \\ "c").length === 4))
      assert((rows(2) \\ "v").map(_.text) === Seq("2", "0"))
      // CELL-TYPE CONTRACT: numeric cells must be TYPED (no t attribute
      // = SpreadsheetML Number), booleans t="b" — never inline strings
      // a BI tool would read as text
      val r1cells = (r1 \\ "c")
      assert((r1cells(0) \ "@t").isEmpty && (r1cells(2) \ "@t").isEmpty,
        "numeric cells must carry no t attribute (typed Number cells)")
      assert((r1cells(3) \ "@t").text === "b")
      assert((r1cells(1) \ "@t").text === "inlineStr")
    } finally zip.close()
  }

  test("xlsx sink: date/timestamp cells are ISO-style text by contract") {
    // SpreadsheetML date cells are 1900-epoch serials needing a
    // styles.xml number format (plus the 1900 leap-year bug); the
    // documented contract ships unambiguous ISO text instead — pin it
    val x = Seq((1L,
      java.sql.Date.valueOf("2024-01-05"),
      java.sql.Timestamp.valueOf("2024-01-05 10:30:00")))
      .toDF("id", "d", "ts")
    val file = java.nio.file.Files.createTempDirectory("graft-xlsx5").toString + "/d.xlsx"
    Sinks.write(x, file, "xlsx")
    val zip = new java.util.zip.ZipFile(file)
    try {
      val sheet = new String(
        zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val row1 = (scala.xml.XML.loadString(sheet) \\ "row")(1)
      val cells = row1 \\ "c"
      assert((cells(1) \ "@t").text === "inlineStr")
      assert((cells(1) \\ "t").text === "2024-01-05")
      assert((cells(2) \ "@t").text === "inlineStr")
      assert((cells(2) \\ "t").text === "2024-01-05 10:30:00.0")
    } finally zip.close()
  }

  test("xlsx sink: control chars substituted, whitespace preserved, binary hex-encoded") {
    val x = Seq((1L, "bad\u0001ctl", "  padded  ", Array[Byte](0x0A, 0x0B)))
      .toDF("id", "dirty", "pad", "bin")
    val file = java.nio.file.Files.createTempDirectory("graft-xlsx4").toString + "/c.xlsx"
    Sinks.write(x, file, "xlsx")
    val zip = new java.util.zip.ZipFile(file)
    val sheet = try new String(
      zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally zip.close()
    val parsed = scala.xml.XML.loadString(sheet) // must stay well-formed XML
    assert(!sheet.contains("\u0001")) // illegal XML char substituted
    assert(sheet.contains("bad\uFFFDctl"))
    val texts = ((parsed \\ "row")(1) \\ "t").map(_.text)
    assert(texts.contains("  padded  ")) // xml:space keeps the padding
    assert(texts.contains("0A0B")) // binary as hex, not [B@... identity
  }

  test("xlsx sink: NaN lands as an empty cell; ErrorIfExists honored") {
    val x = Seq((1L, Double.NaN), (2L, 2.5)).toDF("id", "v")
    val file = java.nio.file.Files.createTempDirectory("graft-xlsx3").toString + "/nan.xlsx"
    Sinks.writeXlsx(x, file)
    val zip = new java.util.zip.ZipFile(file)
    val sheet = try new String(
      zip.getInputStream(zip.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally zip.close()
    assert(!sheet.contains("NaN")) // invalid SpreadsheetML number never emitted
    val parsed = scala.xml.XML.loadString(sheet)
    assert(((parsed \\ "row")(1) \\ "c").length === 2) // cell present, empty
    val e = intercept[IllegalStateException](
      Sinks.writeXlsx(x, file, mode = org.apache.spark.sql.SaveMode.ErrorIfExists))
    assert(e.getMessage.contains("exists"))
  }

  test("xlsx sink: maxRows cap fails loudly, not by truncating") {
    val big = spark.range(100).toDF("id")
    val file = java.nio.file.Files.createTempDirectory("graft-xlsx2").toString + "/big.xlsx"
    val e = intercept[IllegalArgumentException](
      Sinks.writeXlsx(big, file, maxRows = 50))
    assert(e.getMessage.contains("bounded"))
  }
}
