package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Paginated-extract connector: the reference's HTTP Extract loop
  * (`ET-ETL-DWH-PY312/ETL/Extract.py:23-117`, retry helper
  * `utils.py:108-158`) re-expressed with the wire protocol abstracted
  * away. A [[PageFetcher]] stands for "GET page N" (the reference's
  * authorized `requests.get` with urlencoded params); pagination,
  * retry-with-backoff, and the stop-on-empty-page condition live HERE,
  * engine-side. Swapping in a real HTTP client is a PageFetcher
  * implementation, not an engine change — this zero-egress build ships
  * a local-directory fetcher (the shape the reference's `--input` JSON
  * dumps have anyway).
  *
  * Scale note: page FETCHING is inherently sequential driver work (the
  * reference is a single HTTP stream too, Extract.py:56-66); everything
  * after — JSON parse, flatten, load — is distributed. Page payloads
  * stream into a Dataset as they arrive; nothing is held beyond the raw
  * page strings of one extract window.
  */
object PagedExtract {

  /** "GET page n" (0-based). None = past the last page (HTTP 404/empty
    * body in the reference).
    */
  trait PageFetcher {
    def fetch(page: Int): Option[String]
  }

  /** Local-directory stand-in: pages live as `<prefix>-<n>.json` files
    * (the dump format the reference's extract writes).
    */
  final class LocalDirFetcher(dir: String, prefix: String) extends PageFetcher {
    override def fetch(page: Int): Option[String] = {
      val f = new java.io.File(dir, s"$prefix-$page.json")
      if (f.exists()) Some(java.nio.file.Files.readString(f.toPath)) else None
    }
  }

  /** Retry decorator: transient fetch failures retry with exponential
    * backoff (utils.py:108-158's `@retry` analog). `sleeper` is
    * injectable so specs run instantly.
    */
  final class RetryingFetcher(
      inner: PageFetcher,
      maxRetries: Int = 3,
      backoffMs: Long = 1000,
      sleeper: Long => Unit = Thread.sleep
  ) extends PageFetcher {
    override def fetch(page: Int): Option[String] = {
      var attempt = 0
      while (true) {
        try return inner.fetch(page)
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
            sleeper(backoffMs * (1L << (attempt - 1)))
        }
      }
      None // unreachable
    }
  }

  /** application/x-www-form-urlencoded query string from params — the
    * reference urlencodes request params (Extract.py:37,46).
    */
  def buildQuery(params: Seq[(String, String)]): String =
    params.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")

  /** Pull pages 0,1,2,… until the fetcher reports exhaustion or a page
    * is an empty JSON array (the reference's stop condition,
    * Extract.py:58-63), then parse the collected page payloads as one
    * DataFrame. `maxPages` is the runaway guard.
    */
  def read(spark: SparkSession, fetcher: PageFetcher, maxPages: Int = 10000): DataFrame = {
    val pages = Iterator.from(0)
      .take(maxPages)
      .map(fetcher.fetch)
      .takeWhile {
        // a BLANK body is end-of-data too (the fetcher contract names
        // "empty body" as past-the-end; a 0-byte terminator file must
        // not keep the loop running to maxPages)
        case Some(body) =>
          val t = body.replaceAll("\\s", "")
          t.nonEmpty && t != "[]"
        case None => false
      }
      .map(_.get)
      .toSeq
    val ds: Dataset[String] = spark.createDataset(pages)(Encoders.STRING)
    if (pages.isEmpty)
      spark.emptyDataFrame
    else
      // multiLine-style array payloads: each page string is one JSON
      // array; spark.read.json over a Dataset[String] handles arrays
      // per element
      spark.read.json(ds)
  }
}
