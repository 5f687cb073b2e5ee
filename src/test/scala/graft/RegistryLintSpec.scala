package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene lint. A Scala `Map("k" -> a, ..., "k" -> b)` literal
  * compiles and silently keeps the LAST entry — so a copy-paste
  * duplicate inside one family's 100-entry map would shadow a query
  * with no runtime signal at all: SparkEntry's cross-family
  * disjointness `require` only sees the already-deduplicated maps.
  * This spec parses the registry SOURCE files and asserts no key is
  * defined twice within the same map literal.
  */
class RegistryLintSpec extends AnyFunSuite {

  private val regDir = new java.io.File("src/main/scala/graft/registry")
  // map entries are written one per line, indented exactly 4 spaces
  // (deeper matches would be `->` pairs inside a builder body)
  private val entryRe = """^    "([A-Za-z0-9_]+)" ->.*""".r

  /** (file, mapName, keysInOrder) for each queries/oracles map literal. */
  private def familyMaps: Seq[(String, String, Seq[String])] = {
    val files = Option(regDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".scala")).sortBy(_.getName)
    assert(files.nonEmpty, s"registry dir missing at ${regDir.getAbsolutePath}")
    files.toSeq.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val lines = try src.getLines().toVector finally src.close()
      val qStart = lines.indexWhere(_.matches("""\s*val queries\b.*"""))
      val oStart = lines.indexWhere(_.matches("""\s*val oracles\b.*"""))
      def keys(from: Int, until: Int): Seq[String] =
        if (from < 0) Seq.empty
        else lines.slice(from, if (until < 0) lines.size else until).collect {
          case entryRe(k) => k
        }
      val sections = Seq(
        ("queries", keys(qStart, if (oStart > qStart) oStart else -1)),
        ("oracles", keys(oStart, -1)))
      sections.collect { case (name, ks) if ks.nonEmpty => (f.getName, name, ks) }
    }
  }

  test("no duplicate keys within any family queries/oracles map literal") {
    val offenders = familyMaps.flatMap { case (file, map, ks) =>
      ks.groupBy(identity).collect { case (k, hits) if hits.size > 1 =>
        s"$file/$map: \"$k\" defined ${hits.size}x (last silently wins)"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no query or oracle key is defined in two registry files") {
    for (section <- Seq("queries", "oracles")) {
      val byKey = familyMaps.filter(_._2 == section)
        .flatMap { case (file, _, ks) => ks.map(_ -> file) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
      assert(byKey.isEmpty,
        byKey.map { case (k, hits) =>
          s"$section \"$k\" in ${hits.map(_._2).distinct.mkString(", ")}"
        }.mkString("\n"))
    }
  }

  test("source-parsed keys match the merged runtime maps exactly") {
    val srcQueries = familyMaps.filter(_._2 == "queries").flatMap(_._3).toSet
    val srcOracles = familyMaps.filter(_._2 == "oracles").flatMap(_._3).toSet
    // if the line-pattern parse ever drifts from how entries are written,
    // this equality fails loudly rather than the lint silently going blind
    assert(srcQueries == SparkEntry.queries.keySet,
      s"parse drift: src-only=${srcQueries -- SparkEntry.queries.keySet} " +
        s"runtime-only=${SparkEntry.queries.keySet -- srcQueries}")
    assert(srcOracles == SparkEntry.oracleSql.keySet,
      s"parse drift: src-only=${srcOracles -- SparkEntry.oracleSql.keySet} " +
        s"runtime-only=${SparkEntry.oracleSql.keySet -- srcOracles}")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query without an oracle is on the explicit rows-only allowlist") {
    // the driver records a weaker rows-only check for these — each one
    // must be a deliberate decision with a paired quality/hash verdict
    // row, never an oversight. The four current members are the raw
    // approximate outputs (3 ANN top-k + the zlib ratio), each gated by
    // oracle-green recall/ordering verdicts and a determinism hash pin.
    // Adding a query here without its compensating verdict rows would
    // silently weaken the correctness gate; this lint makes that an
    // explicit, reviewed edit instead.
    val rowsOnlyAllowed = Set(
      "x_ann_ivf", "x_ann_pq", "x_ann_ivfpq", "x_compression_ratio")
    val unOracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unOracled == rowsOnlyAllowed,
      s"unexpected rows-only queries: ${unOracled -- rowsOnlyAllowed}; " +
        s"allowlisted but now oracled (prune the list): ${rowsOnlyAllowed -- unOracled}")
  }
}
