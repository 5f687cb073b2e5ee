package graft

import org.apache.spark.sql.functions._
import graft.ext.Selection

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // enough token mass that the Laplace prior (+1 per bucket over
  // nBuckets) doesn't drown the distribution signal
  private def docs = Seq(
    // target-ish vocabulary: "alpha beta"
    (0L, ("alpha beta " * 30).trim, "en", "s0", true),
    (1L, ("alpha beta " * 20).trim, "en", "s0", true),
    // off-target vocabulary: "gamma delta"
    (2L, ("gamma delta " * 30).trim, "de", "s1", false),
    (3L, ("gamma delta " * 20).trim, "de", "s1", false),
    // mixed doc, not in target set
    (4L, ("alpha beta gamma delta " * 10).trim, "fr", "s1", false),
    // empty doc
    (5L, "", "en", "s0", true)
  ).toDF("doc_id", "text", "lang", "source", "tgt")

  test("importanceWeights scores target-vocabulary docs above off-target") {
    val w = Selection.importanceWeights(docs, "text", "doc_id",
        col("lang") === "en", nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    // docs 0/1 share the target subset's vocabulary -> positive weight;
    // docs 2/3 are pure off-target vocabulary -> negative weight
    assert(w(0L).getDouble(3) > 0.0 && w(1L).getDouble(3) > 0.0)
    assert(w(2L).getDouble(3) < 0.0 && w(3L).getDouble(3) < 0.0)
    // the mixed doc sits strictly between the pure cases
    assert(w(4L).getDouble(3) < w(0L).getDouble(3))
    assert(w(4L).getDouble(3) > w(2L).getDouble(3))
    // token counts are exact; the empty doc keeps a row with 0 tokens
    assert(w(0L).getLong(2) == 60L && w(4L).getLong(2) == 40L)
    assert(w(5L).getLong(2) == 0L && w(5L).isNullAt(3))
    assert(w.size == 6)
  }

  test("importanceWeights is partitioning-invariant") {
    def run(parts: Int) =
      Selection.importanceWeights(docs.repartition(parts), "text", "doc_id",
          col("lang") === "en", nBuckets = 64)
        .orderBy("id").collect().toSeq
    assert(run(1) == run(7))
  }

  test("fit + score on the same pool equals importanceWeights exactly") {
    val model = Selection.fitImportanceModel(docs, "text", "doc_id",
      col("lang") === "en", nBuckets = 64)
    assert(model.count() == 64) // ALL buckets enumerated
    val scored = Selection.scoreImportance(docs, "text", "doc_id", model,
        nBuckets = 64).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val direct = Selection.importanceWeights(docs, "text", "doc_id",
        col("lang") === "en", nBuckets = 64).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(scored == direct)
  }

  test("scoreImportanceNarrow is bit-equal to the batch scorer") {
    val model = Selection.fitImportanceModel(docs, "text", "doc_id",
      col("lang") === "en", nBuckets = 64)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val narrow = rows(Selection.scoreImportanceNarrow(docs, "text", "doc_id",
      model, nBuckets = 64))
    val batch = rows(Selection.scoreImportance(docs, "text", "doc_id",
      model, nBuckets = 64))
    assert(narrow == batch)
    // null text scores like empty text
    val n = Selection.scoreImportanceNarrow(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "text", "doc_id", model, nBuckets = 64).collect()(0)
    assert(n.getLong(1) == 0L && n.isNullAt(2))
  }

  test("scoreImportance: fit-unseen tokens score the Laplace default, not dropped") {
    // fit only on the alpha/beta docs; the batch is pure unseen vocab
    val model = Selection.fitImportanceModel(docs.filter(col("doc_id") < 2),
      "text", "doc_id", col("lang") === "en", nBuckets = 64)
    val batch = Seq((9L, "zzz qqq vvv")).toDF("doc_id", "text")
    val r = Selection.scoreImportance(batch, "text", "doc_id", model,
      nBuckets = 64).collect()(0)
    assert(r.getLong(1) == 3L, "unseen tokens must still count")
    assert(!r.isNullAt(2), "unseen buckets carry the Laplace-default ratio")
  }

  test("selectByImportance keeps the k most target-like docs") {
    val sel = Selection.selectByImportance(docs, "text", "doc_id",
        col("lang") === "en", k = 2, nBuckets = 64)
      .select("id").as[Long].collect().toSet
    assert(sel == Set(0L, 1L))
  }

  test("capPerSource keeps at most k per source, preferring the order col") {
    val d = Seq(
      (0L, "a", 10L), (1L, "a", 30L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L)
    ).toDF("doc_id", "source", "n_chars")
    val kept = Selection.capPerSource(d, "source", "doc_id", col("n_chars"), k = 2)
      .select("doc_id").as[Long].collect().toSet
    // source a: n_chars 30 (ids 1,3 — tie broken by id, both fit), id 0/2 dropped
    assert(kept == Set(1L, 3L, 4L))
    val kept1 = Selection.capPerSource(d, "source", "doc_id", col("n_chars"), k = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1L, 4L))
  }

  test("canonicalizeUrl normalizes scheme/host/port/params/fragment") {
    val cases = Seq(
      // scheme+host lowercase, www strip, default port strip, param sort,
      // tracking strip, fragment strip, trailing slash strip
      ("HTTP://WWW.Ex.COM:80/Docs/1/?b=2&utm_source=x&a=1#frag",
       "http://ex.com/Docs/1?a=1&b=2"),
      ("HTTPS://Ex.COM:443/p/", "https://ex.com/p"),
      // non-default port survives; path case survives
      ("http://ex.com:8080/A/B", "http://ex.com:8080/A/B"),
      // root slash survives; bare host unchanged
      ("http://Ex.com/", "http://ex.com/"),
      ("http://ex.com", "http://ex.com"),
      // only tracking params -> no '?'
      ("http://ex.com/x?utm_a=1&gclid=z&fbclid=1&ref=nav", "http://ex.com/x"),
      // non-http(s) scheme: no www/port special-casing beyond lowercase
      ("FTP://Host/File", "ftp://host/File")
    )
    val got = cases.map(_._1).toDF("u")
      .select(Selection.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("urlHost strips case, userinfo and port; empty for authority-less") {
    val cases = Seq(
      ("HTTPS://User:Pw@WWW.Ex.COM:8443/a/b?q=1#f", "www.ex.com"),
      ("http://ex.com", "ex.com"),
      ("http://ex.com:80/", "ex.com"),
      ("http://ex.com./x", "ex.com"), // FQDN root dot
      ("not a url", ""),
      ("/relative/path", ""))
    val got = cases.map(_._1).toDF("u")
      .select(Selection.urlHost(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  private def blockedDocs = Seq(
    (0L, "https://ads.bad.com/x"),        // subdomain of a blocked domain
    (1L, "https://bad.com/y"),            // exact blocked domain
    (2L, "https://notbad.com/z"),         // lookalike: no dot boundary
    (3L, "https://deep.ads.bad.com/w"),   // sub-sub: longest listed rule wins
    (4L, "http://GOOD.org:8080/ok"),      // clean
    (5L, null.asInstanceOf[String])       // null url -> empty host, kept
  ).toDF("doc_id", "url")

  private def blocklist = Seq("bad.com", "ads.bad.com", " TRACKER.net ")
    .toDF("domain")

  test("markBlocklisted: subdomain-aware suffix match, longest rule wins") {
    val got = Selection.markBlocklisted(blockedDocs, col("url"), blocklist)
      .select("doc_id", "blocked_by").as[(Long, String)].collect().toMap
    assert(got(0L) == "ads.bad.com")   // more specific than bad.com
    assert(got(1L) == "bad.com")
    assert(got(2L) == null)            // notbad.com is NOT *.bad.com
    assert(got(3L) == "ads.bad.com")   // deep subdomain, longest rule
    assert(got(4L) == null)
    assert(got(5L) == null)
  }

  test("filterByBlocklist keeps schema and drops only blocked hosts") {
    val kept = Selection.filterByBlocklist(blockedDocs, col("url"), blocklist)
    assert(kept.columns.toSeq == Seq("doc_id", "url"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 5L))
  }

  test("markBlocklisted: blank blocklist entries never match, and " +
    "authority-less hosts match nothing") {
    // a whitespace-only entry used to normalize to "" (one empty
    // label) and block every URL-less document
    val dirty = Seq("bad.com", "   ", "").toDF("domain")
    val got = Selection.markBlocklisted(blockedDocs, col("url"), dirty)
      .select("doc_id", "blocked_by").as[(Long, String)].collect().toMap
    assert(got(5L) == null) // null url -> "" host: must stay unblocked
    assert(got(2L) == null && got(4L) == null)
    assert(got(1L) == "bad.com") // real entries still match
  }

  test("markBlocklisted refuses input columns named host/blocked_by; " +
    "filterByBlocklist tolerates them") {
    val withHost = blockedDocs.withColumn("host", lit("pre-existing"))
    val e = intercept[IllegalArgumentException] {
      Selection.markBlocklisted(withHost, col("url"), blocklist)
    }
    assert(e.getMessage.contains("host"))
    // the filter form uses internal names: the caller's host column
    // passes through untouched
    val kept = Selection.filterByBlocklist(withHost, col("url"), blocklist)
    assert(kept.columns.toSeq == Seq("doc_id", "url", "host"))
    assert(kept.select("host").as[String].collect().toSet == Set("pre-existing"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L, 4L, 5L))
  }

  test("dedupByCanonicalUrl collapses tracking/slash/case/port variants") {
    val d = Seq(
      (0L, "HTTP://WWW.Ex.COM:80/a/?utm_source=1#f", 10L), // same page as 1
      (1L, "http://ex.com/a", 30L),                        // longest -> kept
      (2L, "http://ex.com/b", 5L),                         // distinct page
      (3L, "http://ex.com/a?gclid=2", 30L)                 // ties 1 -> id wins
    ).toDF("doc_id", "url", "n_chars")
    val kept = Selection.dedupByCanonicalUrl(d, col("url"), "doc_id", col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("dedupByCanonicalUrl: null-URL docs each survive (no URL != same URL)") {
    val d = Seq(
      (0L, null.asInstanceOf[String], 10L),
      (1L, null.asInstanceOf[String], 20L),
      (2L, "http://ex.com/a", 5L)
    ).toDF("doc_id", "url", "n_chars")
    val kept = Selection.dedupByCanonicalUrl(d, col("url"), "doc_id", col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L))
  }

  test("randomized: blocklist matching agrees with a reference implementation") {
    val rnd = new scala.util.Random(23)
    val labels = Seq("a", "b", "c", "co", "com", "net")
    def randHost() =
      (0 to rnd.nextInt(4)).map(_ => labels(rnd.nextInt(labels.size))).mkString(".")
    val hosts = (0 until 300).map(i => (i.toLong, s"https://${randHost()}/p"))
    val domains = (0 until 12).map(_ => randHost()).distinct
    def refMatch(host: String): Option[String] = {
      val ls = host.split("\\.")
      val sufs = ls.indices.map(i => ls.drop(i).mkString("."))
      val hits = sufs.filter(domains.contains)
      if (hits.isEmpty) None else Some(hits.maxBy(h => (h.length, h)))
    }
    val got = Selection.markBlocklisted(hosts.toDF("doc_id", "url"),
        col("url"), domains.toDF("domain"))
      .select("doc_id", "host", "blocked_by")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    for ((id, host, blocked) <- got)
      assert(blocked == refMatch(host),
        s"host $host: engine=$blocked ref=${refMatch(host)} (domains=$domains)")
    assert(got.size == hosts.size)
  }

  test("markBlocklisted plans with zero corpus shuffle") {
    // blocklist matching is row-local: the corpus side must reach the
    // broadcast probes without an Exchange that repartitions the docs
    val plan = Selection.markBlocklisted(blockedDocs, col("url"), blocklist)
      .queryExecution.executedPlan.toString
    // the only shuffles allowed are the blocklist's own distinct
    // (keyed on __blocked, dimension-sized); the corpus side must
    // reach the broadcast probes with no Exchange of the doc rows
    val shuffles = "hashpartitioning\\(([^,]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(shuffles.forall(_.startsWith("__blocked")),
      s"unexpected corpus shuffle on ${shuffles.mkString(", ")} in:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"unexpected sort shuffle in:\n$plan")
  }
}
