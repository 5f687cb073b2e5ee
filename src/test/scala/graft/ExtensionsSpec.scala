package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions bind at session-build time, so this spec builds its
  * own session (sharing the JVM's SparkContext) after clearing the
  * default — getOrCreate would otherwise return the shared suite
  * session and silently skip the extensions config.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("dot_product_float is callable from SQL via GraftExtensions") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // spark.sql.extensions is a STATIC conf — read from the SparkContext
    // at first creation, so a second session in the same JVM must inject
    // via withExtensions (same GraftExtensions entry point).
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val out = spark.sql(
        """SELECT dot_product_float(
          |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
        .collect()(0).getDouble(0)
      assert(out === 11.0)
      val err = intercept[Exception](
        spark.sql("SELECT dot_product_float(array(CAST(1.0 AS FLOAT)))").collect())
      assert(err.getMessage.contains("2 arguments"))
      // hash_permute: wraparound semantics visible from SQL
      val hp = spark.sql("SELECT hash_permute(CAST(2 AS BIGINT), 9223372036854775807, 0) AS h")
        .collect()(0).getLong(0)
      assert(hp === Long.MaxValue * 2L) // wraps, does not throw
      val err2 = intercept[Exception](
        spark.sql("SELECT hash_permute(CAST(1 AS BIGINT), id, 0) FROM range(1)").collect())
      assert(err2.getMessage.contains("literal"))
      // fnv1a64: portable hash callable from SQL, known answer
      val fv = spark.sql("SELECT fnv1a64('hello world') AS h").collect()(0).getLong(0)
      assert(fv === 8618312879776256743L)
      // shingle_fnv: one-pass shingle hashes == fnv of each shingle
      val sv = spark.sql(
        "SELECT shingle_fnv('a b c', 2) AS sh, array(fnv1a64('a b'), fnv1a64('b c')) AS ref")
        .collect()(0)
      assert(sv.getSeq[Long](0) === sv.getSeq[Long](1))
      // unicode normalization from SQL: NFD composes, NFKC folds the ligature
      val un = spark.sql(
        "SELECT unicode_nfc('café') AS c, unicode_nfkc('ﬁle') AS kc")
        .collect()(0)
      assert(un.getString(0) === "café")
      assert(un.getString(1) === "file")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
