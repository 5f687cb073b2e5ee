package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotF matches the composable aggregate/zip_with dot bit-for-bit") {
    val rng = new scala.util.Random(42)
    val vecs = (1 to 50).map(i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        VectorExpressions.dotF(col("a.v"), col("b.v")).as("fast"),
        Similarity.dot(col("a.v"), col("b.v")).as("slow"),
        VectorExpressions.cosineF(col("a.v"), col("b.v")).as("fastc"),
        Similarity.cosine(col("a.v"), col("b.v")).as("slowc"))
    val rows = pairs.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "cosine mismatch")
    }
  }

  test("fnv1a64 known answers, empty string, and null") {
    // reference values from the canonical FNV-1a 64 definition
    // (offset basis 0xcbf29ce484222325, prime 0x100000001b3)
    val df = Seq(Some("hello world"), Some("a"), Some(""), None).toDF("s")
      .select(VectorExpressions.fnv1a64(col("s")).as("h"))
    val out = df.collect()
    assert(out(0).getLong(0) === 8618312879776256743L)
    assert(out(1).getLong(0) === -5808556873153909620L)
    assert(out(2).getLong(0) === 0xcbf29ce484222325L) // empty → offset basis
    assert(out(3).isNullAt(0))
  }

  test("dotF fails fast on mismatched dimensions instead of truncating") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b").select(VectorExpressions.dotF(col("a"), col("b")).as("d"))
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("mismatched dimensions")))
  }

  test("dotF null semantics and empty arrays") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
      .select(VectorExpressions.dotF(col("a"), col("b")).as("d"))
    val out = df.collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) === 0.0)
  }

  test("dotF rejects non-float-array inputs at analysis time") {
    val df = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dotF(col("a"), col("b"))).collect()
    }
  }

  test("kernel broadcast cache: same payload instance shares one block, identity-strict") {
    import org.apache.spark.sql.GraftBridge
    val units = Array.fill(8)(0.5f)
    val cells = Array(0L, 1L)
    def bcOf(c: org.apache.spark.sql.Column) = GraftBridge.expression(c) match {
      case graft.functions.NearestCell(_, b, _) => b
      case graft.functions.NearestCellsTopK(_, b, _, _) => b
      case other => fail(s"unexpected expression $other")
    }
    // assignment + probe kernels over the SAME units array instance:
    // one broadcast block for the plan, not one per Column construction
    val b1 = bcOf(VectorExpressions.nearestCell(col("v"), units, cells, 4))
    val b2 = bcOf(VectorExpressions.nearestCellsTopK(col("v"), units, cells, 4, 2))
    assert(b1 eq b2, "same payload instance must share one broadcast")
    // identity, not content: a clone is a distinct payload (each Lloyd
    // iteration's new matrix must rebroadcast)
    val b3 = bcOf(VectorExpressions.nearestCell(col("v"), units.clone(), cells, 4))
    assert(!(b1 eq b3), "distinct array instances must not share")
    // the sameAs guard: the same units paired with DIFFERENT cells must
    // not return the stale payload
    val cells2 = Array(5L, 6L)
    val b4 = bcOf(VectorExpressions.nearestCell(col("v"), units, cells2, 4))
    assert(!(b1 eq b4) && (b4.value.cells eq cells2),
      "rebuilt payload around the same key must broadcast fresh")
  }

  test("acMatches: one dictionary object shares one broadcast block across calls") {
    import org.apache.spark.sql.GraftBridge
    // the broadcast cache keys on the CALLER'S Seq reference, so two
    // Columns over one dictionary object hold the SAME Broadcast — the
    // identity subexpression/exchange reuse keys on once children are
    // resolved. (Whole-expression equality is untestable on unresolved
    // columns: Spark 4 embeds per-call-site Origin metadata in them.)
    val dict = Seq("alpha", "beta")
    def bcOf(c: org.apache.spark.sql.Column) = GraftBridge.expression(c) match {
      case graft.functions.AhoCorasickMatches(_, b) => b
      case other => fail(s"unexpected expression $other")
    }
    val b1 = bcOf(graft.functions.MultiPattern.acMatches(col("t"), dict))
    val b2 = bcOf(graft.functions.MultiPattern.acMatches(col("t"), dict))
    assert(b1 eq b2, "same dictionary object must share one broadcast")
    // a different-but-equal dictionary instance: content-keyed sharing
    // is NOT promised (WeakHashMap equals-based keys may share for
    // Seqs, but the CONTRACT is instance-level) — only assert the
    // payload round-trips
    assert(b1.value.toSeq === dict)
  }
}
