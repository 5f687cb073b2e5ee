package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{PagedExtract, PagedV2}

class PagedV2Spec extends SparkSpec {

  /** pages: 0 → [a,b], 1 → [c], 2 → [], 3 → [d] */
  private def writePages(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-v2").toString
    val pages = Seq(
      """[{"id":1,"v":"a"},{"id":2,"v":"b"}]""",
      """[{"id":3,"v":"c"}]""",
      """[]""",
      """[{"id":4,"v":"d"}]""")
    pages.zipWithIndex.foreach { case (body, i) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"t-$i.json"), body)
    }
    // a non-matching file the lister must ignore
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "other-0.json"), """[{"id":99}]""")
    dir
  }

  private def readV2(dir: String) =
    spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "t").load()

  test("short name resolves via DataSourceRegister and reads all pages") {
    val dir = writePages()
    val rows = readV2(dir).orderBy("page", "payload").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 0, 1, 3))
    assert(rows.map(_.getString(1)).count(_.contains("\"id\":1")) == 1)
  }

  test("payload elements round-trip through from_json") {
    val dir = writePages()
    val parsed = readV2(dir)
      .select(from_json(col("payload"),
        StructType(Seq(StructField("id", LongType), StructField("v", StringType)))).as("r"))
      .select("r.id", "r.v").orderBy("id").collect()
    assert(parsed.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("page filters prune FILES at planning time, not just rows") {
    val dir = writePages()
    PagedV2.pagesOpened.set(0)
    val n = readV2(dir).filter(col("page") <= 1).count()
    assert(n == 3)
    // pages 2 and 3 must never be opened — planning-time pruning
    assert(PagedV2.pagesOpened.get() == 2,
      s"expected 2 page opens, saw ${PagedV2.pagesOpened.get()}")
    // and the pushdown is visible in the plan
    val plan = readV2(dir).filter(col("page") <= 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pages=2"), plan)
  }

  test("IN-list and equality pushdown") {
    val dir = writePages()
    PagedV2.pagesOpened.set(0)
    assert(readV2(dir).filter(col("page").isin(0, 3)).count() == 3)
    assert(PagedV2.pagesOpened.get() == 2)
    PagedV2.pagesOpened.set(0)
    assert(readV2(dir).filter(col("page") === 1).count() == 1)
    assert(PagedV2.pagesOpened.get() == 1)
  }

  test("payload predicates stay above the scan and still apply") {
    val dir = writePages()
    val n = readV2(dir).filter(col("payload").contains("\"v\":\"c\"")).count()
    assert(n == 1)
  }

  test("column pruning narrows the read schema") {
    val dir = writePages()
    val df = readV2(dir).select("page")
    assert(df.schema.fieldNames.toSeq == Seq("page"))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 0, 1, 3))
    // payload-only projection likewise
    val p = readV2(dir).select("payload")
    assert(p.schema.fieldNames.toSeq == Seq("payload"))
    assert(p.count() == 4)
  }

  test("statistics reflect post-pruning file bytes") {
    val dir = writePages()
    val all = readV2(dir).queryExecution.optimizedPlan.stats.sizeInBytes
    val some = readV2(dir).filter(col("page") === 1)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(some < all, s"pruned stats $some should be < full $all")
  }

  test("parity with the driver-loop connector on the documents dump shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-par").toString
    val docs = spark.range(10).selectExpr("id", "concat('d', id) AS v")
    val rows = docs.toJSON.collect()
    val pages = rows.grouped(4).toSeq :+ Array.empty[String]
    pages.zipWithIndex.foreach { case (page, i) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"d-$i.json"), page.mkString("[", ",", "]"))
    }
    val sch = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val viaLoop = PagedExtract.read(spark, new PagedExtract.LocalDirFetcher(dir, "d"))
      .orderBy("id").collect()
    val viaV2 = spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "d").load()
      .select(from_json(col("payload"), sch).as("r")).select("r.id", "r.v")
      .orderBy("id").collect()
    assert(viaV2.map(_.toSeq).toSeq == viaLoop.map(_.toSeq).toSeq)
  }

  test("streaming: pages appended between triggers arrive exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-paged-ckpt").toString
    def page(i: Int, body: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, s"s-$i.json"), body)
    val out = java.nio.file.Files.createTempDirectory("graft-paged-out").toString
    page(0, """[{"id":1},{"id":2}]""")
    page(1, """[{"id":3}]""")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-paged")
        .option("dir", dir).option("prefix", "s").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // new pages appear; a restart from the checkpoint reads ONLY them
    page(2, """[{"id":4},{"id":5}]""")
    runOnce()
    val rows = spark.read.parquet(out).orderBy("page", "payload").collect()
    assert(rows.length == 5, s"expected exactly-once append, got ${rows.length}")
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 0, 1, 2, 2))
  }

  test("streaming offset stalls at a page gap, resumes when it fills") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-gap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-paged-gapc").toString
    def page(i: Int, body: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, s"g-$i.json"), body)
    val out = java.nio.file.Files.createTempDirectory("graft-paged-gapo").toString
    page(0, """[{"id":1}]""")
    page(2, """[{"id":9}]""") // gap at 1 — must NOT be read yet
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-paged")
        .option("dir", dir).option("prefix", "g").load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 1) // only page 0
    page(1, """[{"id":5}]""")
    runOnce()
    assert(spark.read.parquet(out).count() == 3) // 1 and 2 arrive in order
  }

  test("write path: publish a page dump, read it back, terminator present") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-w").toString
    val docs = spark.range(10).selectExpr("to_json(struct(id, concat('d', id) AS v)) AS payload")
    docs.repartition(3).write.format("graft-paged")
      .option("dir", dir).option("prefix", "out").mode("append").save()
    // contiguous pages 0..2 plus the terminating empty page at 3
    val all = new java.io.File(dir).listFiles().map(_.getName).sorted
    val files = all.filterNot(_.startsWith("."))
    assert(files.toSeq == Seq("out-0.json", "out-1.json", "out-2.json", "out-3.json"), files.toSeq)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "out-3.json")) == "[]")
    // the only hidden files are the commit lock and the count manifest
    // — no temps survive commit
    assert(all.filter(_.startsWith(".")).toSeq.sorted ==
      Seq(".out.commitlock", ".out.manifest.json"),
      all.filter(_.startsWith(".")).toSeq)
    // the batch scan reads exactly the written elements
    val back = spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "out").load()
      .select(get_json_object(col("payload"), "$.id").cast("long").as("id"))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(back == (0L until 10L))
    // AND the reference-protocol driver loop stops at the empty page
    val viaLoop = graft.sources.PagedExtract.read(spark,
      new graft.sources.PagedExtract.LocalDirFetcher(dir, "out"))
    assert(viaLoop.count() == 10)
  }

  test("write path: overwrite truncates stale higher pages") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-ow").toString
    spark.range(20).selectExpr("to_json(struct(id)) AS payload")
      .repartition(5).write.format("graft-paged")
      .option("dir", dir).option("prefix", "t").mode("append").save()
    assert(new java.io.File(dir).listFiles()
      .count(!_.getName.startsWith(".")) == 6) // 5 + terminator
    spark.range(3).selectExpr("to_json(struct(id)) AS payload")
      .repartition(1).write.format("graft-paged")
      .option("dir", dir).option("prefix", "t").mode("overwrite").save()
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files == Seq("t-0.json", "t-1.json"), files)
    assert(spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "t").load().count() == 3)
  }

  test("write path: a failed job leaves no pages and no temps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-abort").toString
    intercept[Exception] {
      spark.range(10).selectExpr(
          "CASE WHEN id = 7 THEN raise_error('boom') ELSE to_json(struct(id)) END AS payload")
        .repartition(2).write.format("graft-paged")
        .option("dir", dir).option("prefix", "a").mode("append").save()
    }
    val left = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    assert(left.isEmpty,
      s"aborted write must clean up, found: ${left.map(_.getName).mkString(", ")}")
  }

  test("write path rejects schemas that would silently drop columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-bad").toString
    val e = intercept[Exception] {
      spark.range(3).selectExpr("id", "to_json(struct(id)) AS payload")
        .write.format("graft-paged")
        .option("dir", dir).option("prefix", "x").mode("append").save()
    }
    assert(e.getMessage != null)
  }

  test("write path: append continues from the high-water mark, replacing the terminator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-app").toString
    spark.range(10).selectExpr("to_json(struct(id)) AS payload")
      .repartition(3).write.format("graft-paged")
      .option("dir", dir).option("prefix", "t").mode("append").save()
    // second batch must NOT clobber pages 0..2 — it continues at 3
    spark.range(10, 15).selectExpr("to_json(struct(id)) AS payload")
      .repartition(2).write.format("graft-paged")
      .option("dir", dir).option("prefix", "t").mode("append").save()
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files == (0 to 5).map(i => s"t-$i.json"), files)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "t-5.json")) == "[]")
    val back = spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "t").load()
      .select(get_json_object(col("payload"), "$.id").cast("long").as("id"))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(back == (0L until 15L))
    // the stop-on-empty driver loop also sees one unbroken dump
    assert(graft.sources.PagedExtract.read(spark,
      new graft.sources.PagedExtract.LocalDirFetcher(dir, "t")).count() == 15)
  }

  test("concurrent appends to one prefix interleave without page clobber") {
    // two writers race the SAME prefix: without the commit lock both
    // would read the same high-water mark, rename onto the same page
    // numbers, and one writer's pages would vanish. The lock serializes
    // the list → rename → terminator sequence, so whatever order wins,
    // the dump stays one unbroken stop-on-empty sequence holding every
    // row from every committed write exactly once.
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-conc").toString
    spark.range(6).selectExpr("to_json(struct(id)) AS payload")
      .repartition(2).write.format("graft-paged")
      .option("dir", dir).option("prefix", "c").mode("append").save()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val threads = Seq((100L, 3), (200L, 2)).map { case (base, parts) =>
      new Thread(() => {
        try {
          gate.await()
          spark.range(base, base + 4).selectExpr("to_json(struct(id)) AS payload")
            .repartition(parts).write.format("graft-paged")
            .option("dir", dir).option("prefix", "c").mode("append").save()
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    val n = files.size // seed 2 + 3 + 2 data pages + 1 terminator = 8
    assert(files == (0 until n).map(i => s"c-$i.json"), files)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, s"c-${n - 1}.json")) == "[]")
    assert((0 until n - 1).forall(i => java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, s"c-$i.json")).trim != "[]"),
      "no interior terminator may survive interleaved appends")
    // every row from the seed and BOTH appends, exactly once
    val back = spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "c").load()
      .select(get_json_object(col("payload"), "$.id").cast("long").as("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(back == ((0L until 6L) ++ (100L until 104L) ++ (200L until 204L)), back)
    // and the reference's own stop-on-empty loop agrees
    assert(graft.sources.PagedExtract.read(spark,
      new graft.sources.PagedExtract.LocalDirFetcher(dir, "c")).count() == 14)
    // the lock serializes manifest accumulation too: whichever commit
    // ran second read the first's manifest — totals, not last-wins
    assert(PagedV2.readManifest(dir, "c").contains((7L, 14L)),
      PagedV2.readManifest(dir, "c"))
  }

  test("interleaved commits keep the terminator (stream watermark) monotonic") {
    // unit-level interleave with the commit entry points called
    // directly: both committers' temps exist BEFORE either commit runs
    // (the worst ordering a scheduler can produce), then the commits
    // race. The stream tailer's offset is the page number, so the
    // terminator index must only ever move FORWARD — a backward move
    // would re-deliver pages to a checkpointed reader.
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-mono").toString
    def tempPage(name: String, body: String): String = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.writeString(p, body)
      p.toString
    }
    def terminatorIdx(): Int = {
      val pages = graft.sources.PagedV2.listPages(dir, "m")
      pages.collectFirst { case (i, p)
        if java.nio.file.Files.readString(java.nio.file.Paths.get(p)).trim == "[]" => i
      }.getOrElse(-1)
    }
    def commit(msgs: (Int, String)*): Unit = {
      val bw = new graft.sources.PagedBatchWrite(dir, "m", truncate = false)
      bw.commit(msgs.map { case (pid, tmp) =>
        graft.sources.PagedWriteMessage(pid, tmp)
          .asInstanceOf[org.apache.spark.sql.connector.write.WriterCommitMessage]
      }.toArray)
    }
    commit(0 -> tempPage(".m-seed0.tmp", """[{"id":1}]"""),
           1 -> tempPage(".m-seed1.tmp", """[{"id":2}]"""))
    val t0 = terminatorIdx()
    assert(t0 == 2, s"seed terminator at $t0")
    // both racers' temps staged up front, then concurrent commits
    val a = Seq(0 -> tempPage(".m-a0.tmp", """[{"id":10}]"""),
                1 -> tempPage(".m-a1.tmp", """[{"id":11}]"""))
    val b = Seq(0 -> tempPage(".m-b0.tmp", """[{"id":20}]"""))
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(a, b).map(m => new Thread(() => {
      try { gate.await(); commit(m: _*) }
      catch { case t: Throwable => errs.add(t) }
    }))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    val t1 = terminatorIdx()
    assert(t1 == 5, s"terminator must land past ALL committed pages, got $t1")
    assert(t1 > t0, "watermark moved backward")
    val ids = spark.read.format("graft-paged")
      .option("dir", dir).option("prefix", "m").load()
      .select(get_json_object(col("payload"), "$.id").cast("long").as("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 10L, 11L, 20L), ids)
  }

  test("count manifest accumulates across appends and verifyDump passes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-man").toString
    spark.range(10).selectExpr("to_json(struct(id)) AS payload")
      .repartition(3).write.format("graft-paged")
      .option("dir", dir).option("prefix", "m").mode("append").save()
    assert(PagedV2.readManifest(dir, "m").contains((3L, 10L)))
    spark.range(10, 17).selectExpr("to_json(struct(id)) AS payload")
      .repartition(2).write.format("graft-paged")
      .option("dir", dir).option("prefix", "m").mode("append").save()
    assert(PagedV2.readManifest(dir, "m").contains((5L, 17L)))
    val verdicts = PagedV2.verifyDump(spark, dir, "m")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verdicts == Map("pages_contiguous" -> true, "terminator_present" -> true,
      "manifest_pages_match" -> true, "manifest_rows_match" -> true), verdicts)
    // truncate resets the manifest
    spark.range(4).selectExpr("to_json(struct(id)) AS payload")
      .repartition(1).write.format("graft-paged")
      .option("dir", dir).option("prefix", "m").mode("overwrite").save()
    assert(PagedV2.readManifest(dir, "m").contains((1L, 4L)))
    // a corrupted dump is CAUGHT: drop a data page behind the manifest's back
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "m-0.json"))
    val broken = PagedV2.verifyDump(spark, dir, "m")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!broken("pages_contiguous") && !broken("manifest_pages_match") &&
      !broken("manifest_rows_match"), broken)
  }

  test("append onto a pre-manifest dump reports unknown rows, not a lie") {
    val dir = java.nio.file.Files.createTempDirectory("graft-paged-prem").toString
    // hand-made legacy dump with no manifest
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "p-0.json"), """[{"id":1},{"id":2}]""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "p-1.json"), "[]")
    spark.range(3).selectExpr("to_json(struct(id)) AS payload")
      .repartition(1).write.format("graft-paged")
      .option("dir", dir).option("prefix", "p").mode("append").save()
    // pages are known (2 data pages), rows are not (-1 sentinel)
    assert(PagedV2.readManifest(dir, "p").contains((2L, -1L)))
    val verdicts = PagedV2.verifyDump(spark, dir, "p")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verdicts("pages_contiguous") && verdicts("manifest_pages_match"))
    assert(!verdicts("manifest_rows_match"), "unknown rows must not verify")
  }

  test("element splitting is byte-exact — no root-value separator leaks in") {
    val parts = PagedV2.splitTopLevelArray("""[{"a":1},{"b":2},{"c":3}]""")
    assert(parts == Seq("""{"a":1}""", """{"b":2}""", """{"c":3}"""), parts)
    // scalars and strings too (raw element text, position-independent)
    assert(PagedV2.splitTopLevelArray("""[1,"x",null,true]""") ==
      Seq("1", "\"x\"", "null", "true"))
  }

  test("nested objects and arrays survive element splitting") {
    val parts = PagedV2.splitTopLevelArray(
      """[{"a":{"b":[1,2,{"c":"}]"}]},"s":"x,y"},{"a":null}]""")
    assert(parts.size == 2)
    assert(parts.head.contains("\"c\":\"}]\""))
    assert(PagedV2.splitTopLevelArray("[]").isEmpty)
    assert(PagedV2.splitTopLevelArray("").isEmpty)
  }
}
