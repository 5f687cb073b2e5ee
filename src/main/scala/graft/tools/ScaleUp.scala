package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write an N×-replicated copy of a testdata SF dir (default 10× of
  * sf0.1 ≈ sf1) for plan soaks: each copy offsets every key column by a
  * copy-sized stride so FK joins stay consistent (each order keeps
  * exactly its lineitems, each lineitem still finds its part/supplier),
  * while dims that TPC-H holds constant (nation, region) stay single.
  * Text and embeddings are perturbed per copy — byte-identical copies
  * would manufacture dedup/ANN pair explosions that say nothing about
  * plan behavior at scale.
  *
  * usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies=10]
  */
object ScaleUp {
  // strides comfortably above the max key at sf0.1 (orderkey ~600k,
  // custkey/partkey/suppkey ~10-20k, doc/vec/event ids < 1M)
  private val OK = 10000000L // orderkey
  private val CK = 1000000L  // custkey
  private val PK = 1000000L  // partkey
  private val SK = 1000000L  // suppkey
  private val ID = 10000000L // doc/vec/event/user ids

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/dev/shm/graft-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("graft-scaleup").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS): surface as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, offsets: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (df, _) => df): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until copies).map { i =>
        val shifted = offsets.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(stride * i))
        }
        extra(shifted, i)
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      // count the WRITTEN files (metadata-only), not `out` — re-running
      // the N-copy union just to print a count would double the most
      // expensive table's scale-up time
      val written = spark.read.parquet(s"$dst/$table.parquet").count()
      println(s"[scaleup] $table: ${base.count()} -> $written rows")
    }

    // dims TPC-H keeps constant with SF
    for (t <- Seq("nation", "region")) {
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: copied 1x")
    }
    replicate("customer", Map("c_custkey" -> CK))
    replicate("supplier", Map("s_suppkey" -> SK))
    replicate("part", Map("p_partkey" -> PK))
    // o_totalprice gets a deterministic WHOLE-CENT jitter per copy
    // (copy 0 untouched): byte-identical value multisets made the
    // quantile edges of the psi/decile oracles land ON tied values,
    // where Spark's and DuckDB's interpolation legitimately differ —
    // de-tied values make both engines agree without any tolerance.
    // The jitter must preserve the column's 2-dp granularity: the
    // source columns are 2-dp doubles, and every downstream
    // DECIMAL(18,2) cast is exact for those on both engines — a
    // finer-grained jitter creates .xx5-boundary doubles where Spark
    // (shortest-decimal-repr HALF_UP) and DuckDB (binary scaling)
    // legitimately round differently (measured: q31/q34/q50 broke).
    // jitter in INTEGER cent space and divide back: `x + k*0.01` in
    // double yields non-canonical doubles (11.09+0.58 =
    // 11.670000000000002) whose ULP distance from the native cent
    // value makes quantile-edge interpolation engine-ambiguous;
    // `(round(x*100)+k)/100.0` lands on the identical canonical double
    // the source data uses for that cent.
    replicate("orders", Map("o_orderkey" -> OK, "o_custkey" -> CK), (df, i) =>
      if (i == 0) df
      else df.withColumn("o_totalprice",
        (round(col("o_totalprice") * 100, 0).cast("long") +
          pmod(xxhash64(col("o_orderkey"), lit(i)), lit(97))).cast("double") / 100.0))
    replicate("lineitem", Map("l_orderkey" -> OK, "l_partkey" -> PK, "l_suppkey" -> SK))
    // ts arrives as nanos-as-long (the reader conf above); write it
    // back as a real timestamp — oracles bind epoch_ns/date_trunc
    // against a timestamp column, and the engine's events() reader
    // adapts to either representation. µs truncation is lossless here:
    // every engine query already normalizes through timestamp_micros.
    // value gets the same per-copy whole-cent jitter (it is a 2-dp
    // double too): averaging 10 IDENTICAL copies produced exact
    // round-half ties in the resample/interpolate/anomaly means
    // (.5-ulp divergence between engines); distinct same-granularity
    // addends leave nothing sitting on a rounding boundary.
    replicate("events", Map("event_id" -> ID, "user_id" -> ID), (df, i) => {
      // adapt to the source's ts storage flavor (ns-as-long through r7
      // testdata, TIMESTAMP_NTZ micros from r8) — write a session-local
      // TIMESTAMP either way, which events() passes through unchanged
      val ts = df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
      if (i == 0) ts
      else ts.withColumn("value",
        (round(col("value") * 100, 0).cast("long") +
          pmod(xxhash64(col("event_id"), lit(i)), lit(97))).cast("double") / 100.0)
    })
    // distinct text per copy: suffix a copy token (keeps n_chars honest)
    replicate("documents", Map("doc_id" -> ID), (df, i) =>
      if (i == 0) df
      else df.withColumn("text", concat(col("text"), lit(s" copytoken$i")))
        .withColumn("n_chars", col("n_chars") + lit(11 + (if (i >= 10) 1 else 0))))
    // distinct vectors per copy: deterministic small per-dim jitter
    replicate("embeddings", Map("vec_id" -> ID), (df, i) =>
      if (i == 0) df
      else df.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000)).cast("double")
            / 10000.0 - 0.05)).cast("float"))))
    spark.stop()
  }
}
