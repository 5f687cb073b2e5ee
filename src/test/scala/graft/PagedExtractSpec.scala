package graft

import java.nio.file.Files

import graft.sources.PagedExtract
import graft.sources.PagedExtract.{LocalDirFetcher, PageFetcher, RetryingFetcher}

class PagedExtractSpec extends SparkSpec {
  import spark.implicits._

  private def writePages(pages: Seq[String], prefix: String): String = {
    val dir = Files.createTempDirectory("graft-pages").toString
    pages.zipWithIndex.foreach { case (body, i) =>
      Files.writeString(java.nio.file.Paths.get(dir, s"$prefix-$i.json"), body)
    }
    dir
  }

  test("paginates until the empty page, unions all rows") {
    val dir = writePages(Seq(
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""",
      """[{"id": 3, "name": "c"}]""",
      """[]""",
      """[{"id": 99, "name": "past-the-end (must not be read)"}]"""),
      "sessions")
    val out = PagedExtract.read(spark, new LocalDirFetcher(dir, "sessions"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out === Array((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("stops when the fetcher reports exhaustion (no empty page present)") {
    val dir = writePages(Seq("""[{"id": 1}]""", """[{"id": 2}]"""), "p")
    val out = PagedExtract.read(spark, new LocalDirFetcher(dir, "p"))
    assert(out.count() === 2)
  }

  test("empty first page yields an empty frame") {
    val dir = writePages(Seq("""[]"""), "p")
    assert(PagedExtract.read(spark, new LocalDirFetcher(dir, "p")).isEmpty)
  }

  test("a blank page body ends pagination like an empty array") {
    val dir = writePages(Seq("""[{"id": 1}]""", "", """[{"id": 99}]"""), "p")
    val out = PagedExtract.read(spark, new LocalDirFetcher(dir, "p"))
    assert(out.count() === 1) // page 2 past the blank terminator is never read
  }

  test("maxPages guards against a non-terminating source") {
    val endless = new PageFetcher {
      override def fetch(page: Int): Option[String] = Some(s"""[{"id": $page}]""")
    }
    assert(PagedExtract.read(spark, endless, maxPages = 5).count() === 5)
  }

  test("retry decorator: transient failures retry with backoff, then succeed") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new PageFetcher {
      override def fetch(page: Int): Option[String] = {
        calls += 1
        if (calls <= 2) throw new RuntimeException("503")
        if (page == 0) Some("""[{"id": 7}]""") else None
      }
    }
    val out = PagedExtract.read(spark,
      new RetryingFetcher(flaky, maxRetries = 3, backoffMs = 10, sleeper = ms => sleeps += ms))
    assert(out.count() === 1)
    assert(sleeps.toSeq === Seq(10L, 20L)) // exponential backoff
  }

  test("retry decorator: persistent failure rethrows after maxRetries") {
    val dead = new PageFetcher {
      override def fetch(page: Int): Option[String] = throw new RuntimeException("down")
    }
    val e = intercept[RuntimeException] {
      new RetryingFetcher(dead, maxRetries = 2, backoffMs = 1, sleeper = _ => ()).fetch(0)
    }
    assert(e.getMessage === "down")
  }

  test("buildQuery urlencodes params like the reference's extract") {
    assert(PagedExtract.buildQuery(Seq("start dt" -> "2024-06-01 00:00:00", "q" -> "a&b")) ===
      "start+dt=2024-06-01+00%3A00%3A00&q=a%26b")
  }
}
