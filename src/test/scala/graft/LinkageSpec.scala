package graft

import org.apache.spark.sql.functions._

import graft.ext.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("editDistanceJoin finds substitution, deletion, and insertion matches at k=1") {
    val dirty = Seq((1L, "red widget"), (2L, "blue bot"), (3L, "ssmall gear"), (4L, "nomatch"))
      .toDF("did", "dname")
    val master = Seq((10L, "red gadget"), (11L, "red widget"), (12L, "blue bolt"),
      (13L, "small gear")).toDF("mid", "mname")
    val got = Linkage.editDistanceJoin(dirty, master, "dname", "mname", k = 1)
      .select("did", "mid", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set(
      (1L, 11L, 0), // exact
      (2L, 12L, 1), // deletion in dirty ("bot" vs "bolt")
      (3L, 13L, 1)  // insertion in dirty ("ssmall" vs "small")
      // "red widget" vs "red gadget" is distance 2 — excluded
      // "nomatch" matches nothing
    ))
  }

  test("editDistanceJoin parity with brute-force cross join (randomized, k=1 and k=2)") {
    val rnd = new scala.util.Random(77)
    def word() = Seq.fill(3 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString
    // small alphabet + short strings => dense near-matches, incl. dups
    val l = Seq.tabulate(60)(i => (i.toLong, word())).toDF("lid", "ls")
    val r = Seq.tabulate(60)(i => (i.toLong, word())).toDF("rid", "rs")
    for (k <- Seq(1, 2)) {
      val fast = Linkage.editDistanceJoin(l, r, "ls", "rs", k)
        .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
      val brute = l.crossJoin(r)
        .withColumn("dist", levenshtein(col("ls"), col("rs")))
        .filter(col("dist") <= k)
        .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
      assert(fast === brute, s"k=$k: blocking lost or invented pairs")
    }
  }

  test("editDistanceJoin handles multibyte (unicode) strings consistently") {
    // substr/length/levenshtein all operate on CHARACTERS in Spark, so
    // segment geometry stays aligned for non-ASCII text
    val l = Seq((1L, "café münchen"), (2L, "caff münchen")).toDF("lid", "ls")
    val r = Seq((10L, "café münchen"), (11L, "cafe münchen")).toDF("rid", "rs")
    val got = Linkage.editDistanceJoin(l, r, "ls", "rs", k = 1)
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
    val brute = l.crossJoin(r)
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .filter(col("dist") <= 1)
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === brute)
    assert(got.contains((1L, 10L, 0)) && got.contains((1L, 11L, 1)))
  }

  test("editDistanceJoin handles empty and near-empty strings") {
    val l = Seq((1L, ""), (2L, "a")).toDF("lid", "ls")
    val r = Seq((10L, "a"), (11L, "ab")).toDF("rid", "rs")
    val got = Linkage.editDistanceJoin(l, r, "ls", "rs", k = 1)
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 1), (2L, 10L, 0), (2L, 11L, 1)))
  }

  test("goldenRecord survivorship: latest-wins, longest-string, min/max, null demotion") {
    import graft.ext.Linkage._
    val dupes = Seq(
      // cluster 10: three variants of one customer
      (10L, 1L, Option("Jon"),      Option("555-0100"), Option(100L)),
      (10L, 2L, Option("Jonathan"), Option.empty[String], Option(250L)),
      (10L, 3L, Option.empty[String], Option("555-0199"), Option(50L)),
      // cluster 20: single record passes through
      (20L, 4L, Option("Ada"), Option.empty[String], Option(7L))
    ).toDF("cluster", "seq", "name", "phone", "balance")
    val golden = Linkage.goldenRecordWithCount(dupes, "cluster", Map(
      "name" -> LongestString,
      "phone" -> MostRecentBy("seq"), // latest non-null phone: seq 3
      "balance" -> MaxValue,
      "seq" -> MinValue))
      .orderBy("cluster")
      // columns come back rule-sorted: balance, name, phone, seq (+count)
      .as[(Long, Option[Long], Option[String], Option[String], Long, Long)]
      .collect().toSeq
    assert(golden === Seq(
      (10L, Some(250L), Some("Jonathan"), Some("555-0199"), 1L, 3L),
      (20L, Some(7L), Some("Ada"), None, 4L, 1L)))
  }

  test("goldenRecord null demotion: a null never beats a value, all-null stays null") {
    import graft.ext.Linkage._
    val dupes = Seq(
      (1L, 5L, Option.empty[String]), // latest row has NULL name
      (1L, 3L, Option("Keep")),
      (2L, 9L, Option.empty[String])  // all-null cluster
    ).toDF("cluster", "seq", "name")
    val golden = Linkage.goldenRecord(dupes, "cluster",
        Map("name" -> MostRecentBy("seq")))
      .orderBy("cluster").as[(Long, Option[String])].collect().toSeq
    assert(golden === Seq((1L, Some("Keep")), (2L, None)))
  }

  test("maxSegmentDf drops hot-segment blocks but keeps clean matches") {
    // 50 rows share the segment-heavy name; 1 clean near-pair survives
    val boiler = Seq.tabulate(50)(i => (100L + i, "aaaaaaaaaa"))
    val l = ((1L, "unique pair") +: boiler).toDF("lid", "ls")
    val r = Seq((10L, "unique pairs"), (11L, "aaaaaaaaaa")).toDF("rid", "rs")
    val capped = Linkage.editDistanceJoin(l, r, "ls", "rs", k = 1, maxSegmentDf = Some(5))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // the boilerplate block exceeds no RIGHT-side df cap here (df counts
    // right rows) — cap on the right keeps "aaaaaaaaaa" (df=1); verify
    // the clean pair is present and the boilerplate pairs still match
    assert(capped.contains((1L, 10L)))
    // now cap against a hot RIGHT side
    val rHot = Seq.tabulate(50)(i => (200L + i, "aaaaaaaaaa")).toDF("rid", "rs")
      .union(Seq((10L, "unique pairs")).toDF("rid", "rs"))
    val capped2 = Linkage.editDistanceJoin(l, rHot, "ls", "rs", k = 1,
        maxSegmentDf = Some(5))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(capped2.contains((1L, 10L)), "clean pair must survive the cap")
    assert(!capped2.exists(_._2 >= 200L), "hot-block pairs are excluded by the cap")
  }

  test("dlJoin finds adjacent-swap typos that the ed<=1 join misses") {
    val dirty = Seq((10L, "abdc")).toDF("dk", "dn") // cd swapped: dl=1, lev=2
    val master = Seq((1L, "abcd"), (2L, "badc")).toDF("mk", "mn")
    val lev1 = Linkage.editDistanceJoin(dirty, master, "dn", "mn", k = 1)
      .select("dk", "mk").as[(Long, Long)].collect()
    assert(lev1.isEmpty, "plain ed<=1 charges a transposition 2: no match")
    val dl1 = Linkage.dlJoin(dirty, master, "dn", "mn", k = 1)
      .select("dk", "mk", "dl_dist").as[(Long, Long, Int)].collect().toSeq
    // abdc->abcd is one transposition; abdc->badc is ALSO one (swap ab)
    assert(dl1.sortBy(_._2) === Seq((10L, 1L, 1), (10L, 2L, 1)))
  }

  test("dlJoin k=1 deletion-neighborhood == brute force on a messy set") {
    import graft.functions.StringSimilarity.damerauLevenshtein
    val ls = Seq("abcd", "acbd", "abd", "abcde", "zzzz", "", "a")
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val rs = Seq("abcd", "badc", "xbcd", "ab", "b")
      .zipWithIndex.map { case (v, i) => (100L + i, v) }
    val dirty = ls.toDF("dk", "dn")
    val master = rs.toDF("mk", "mn")
    val fast = Linkage.dlJoin(dirty, master, "dn", "mn", k = 1)
      .select("dk", "mk").as[(Long, Long)].collect().toSet
    val brute = dirty.crossJoin(master)
      .filter(damerauLevenshtein(col("dn"), col("mn")) <= 1)
      .select("dk", "mk").as[(Long, Long)].collect().toSet
    assert(fast === brute)
  }

  test("dlJoin k=2 uses segment blocking and finds 2-edit pairs") {
    val dirty = Seq((10L, "abdcf")).toDF("dk", "dn") // swap cd + sub e->f
    val master = Seq((1L, "abcde")).toDF("mk", "mn")
    val out = Linkage.dlJoin(dirty, master, "dn", "mn", k = 2)
      .select("dk", "mk", "dl_dist").as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((10L, 1L, 2)))
  }

  test("resolveBest ranks equal-edit-distance candidates by Jaro-Winkler") {
    // "marthx" and "xartha" are BOTH ed=1 from "martha"; JW's prefix
    // boost must prefer the head-agreeing "marthx" (0.933 vs 0.889)
    val dirty = Seq((10L, "martha"), (11L, "zzzzzz")).toDF("dk", "dn")
    val master = Seq((1L, "marthx"), (2L, "xartha")).toDF("mk", "mn")
    val best = Linkage.resolveBest(dirty, master, "dn", "mn", "dk", "mk", k = 1)
      .select("dk", "mk").as[(Long, Long)].collect().toSeq
    assert(best === Seq((10L, 1L))) // 11 has no candidate: absent, not null
  }

  test("resolveBest breaks exact JW ties on the master key") {
    val dirty = Seq((10L, "aaab")).toDF("dk", "dn")
    val master = Seq((2L, "aaaa"), (1L, "aaaa")).toDF("mk", "mn")
    val best = Linkage.resolveBest(dirty, master, "dn", "mn", "dk", "mk", k = 1)
      .select("dk", "mk").as[(Long, Long)].collect().toSeq
    assert(best === Seq((10L, 1L)))
  }
}
