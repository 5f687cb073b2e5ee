package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew soak for the fused probe top-k operator's PARTITIONED mode —
  * the r16 verdict's #1 residual ceiling: both sides hash-cluster on
  * `cell`, so a hot cell lands on ONE task and serializes the stage,
  * and AQE skew-split cannot see a custom exec. Trained seeding keeps
  * cells balanced in every shipped shape; this probe measures the
  * degenerate case (a collapsed centroid) directly by constructing the
  * cell assignment instead of deriving it from centroids:
  * `hotPct` percent of the corpus is forced into cell 0, the rest
  * spread uniformly over `nCells`.
  *
  * Sections: the always-partitioned self-join pair scan (`pairs`) and
  * the forced-partitioned exact-cosine top-k (`topk`), each balanced
  * vs skewed, with `spark.graft.ann.skewSaltFactor` off vs on so the
  * salted sub-split's effect is a paired measurement. Pair/row counts
  * print beside the times — equal counts across variants is the
  * output-invariance smoke (byte-equivalence is spec-pinned).
  *
  * usage: runMain graft.tools.SkewProbe <sfDir> [corpusCap] [nCells] [hotPct] [tau] [pairs|topk|both] [saltFactor]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 100000
    val nCells = if (args.length > 2) args(2).toInt else 256
    val hotPct = if (args.length > 3) args(3).toInt else 30
    val tau = if (args.length > 4) args(4).toDouble else 0.97
    val which = if (args.length > 5) args(5) else "both"
    val saltF = if (args.length > 6) args(6) else "8" // int or "auto"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("skew-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val saltKey = graft.plans.SdcTopKPlan.skewSaltFactorKey
    try {
      // hash-sampled down to ~cap rows (ScaleUp replica ids are
      // replica·10^7 + base, so an id-range cap would keep only whole
      // replica generations; the hash subset spreads across families)
      val all = spark.read.parquet(s"$dir/embeddings.parquet")
      val total = all.count()
      val keepPerMille = math.min(1000L, math.max(1L, cap * 1000L / total))
      val e = all
        .filter(pmod(hash(col("vec_id"), lit(3)), lit(1000)) < keepPerMille)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<float>").as("v"))
      val n = e.count()
      // constructed assignment: pmod(hash) spreads uniformly; the skewed
      // variant collapses `hotPct`% of rows into cell 0 (a dead centroid)
      def assigned(skewed: Boolean) = {
        val uniform = pmod(hash(col("id")), lit(nCells)).cast("long")
        val cell =
          if (!skewed) uniform
          else when(pmod(hash(col("id"), lit(7)), lit(100)) < hotPct, lit(0L))
            .otherwise(uniform)
        e.withColumn("cell", cell)
      }
      def timed(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[skewprobe] $label corpus=$n nCells=$nCells " +
          f"hotPct=$hotPct tau=$tau saltFactor=$saltF rows=$rows sec=$sec%.2f")
      }
      def withSalt[A](on: Boolean)(body: => A): A = {
        val prior = spark.conf.getOption(saltKey)
        if (on) spark.conf.set(saltKey, saltF.toString)
        else spark.conf.unset(saltKey)
        try body finally prior match {
          case Some(p) => spark.conf.set(saltKey, p)
          case None => spark.conf.unset(saltKey)
        }
      }
      for (skewed <- Seq(false, true); salt <- Seq(false, true)) {
        val tag = (if (skewed) "skewed" else "balanced") +
          (if (salt) "+salt" else "")
        val a = assigned(skewed)
        val corpusSide = a.select(col("id").as("corpus_id"), col("cell"),
          col("v").as("cv"))
        val probeSide = a.select(col("id").as("query_id"), col("v").as("qv"),
          col("cell"))
        if (which == "pairs" || which == "both")
          timed(s"pairs-$tag") {
            withSalt(salt) {
              graft.plans.SdcTopKPlan.pairsCosine(corpusSide, probeSide, tau)
                .count()
            }
          }
        if (which == "topk" || which == "both")
          timed(s"topk-$tag") {
            withSalt(salt) {
              val key = graft.plans.SdcTopKPlan.probeBroadcastThresholdKey
              val prior = spark.conf.getOption(key)
              spark.conf.set(key, "-1") // force the partitioned mode
              // count FINAL ranked rows, not raw partials: the salted
              // mode emits a LARGER per-partition superset (a hot-cell
              // query's candidates span S sub-partitions, each keeping
              // k) that the caller's window rank collapses — equality
              // holds at the ranked output, which is what callers see
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col("query_id"))
                .orderBy(col("ascore").desc, col("corpus_id").asc)
              try graft.plans.SdcTopKPlan
                .partialTopKCosine(corpusSide, probeSide, 10)
                .withColumn("rank", row_number().over(w))
                .filter(col("rank") <= 10)
                .count()
              finally prior match {
                case Some(p) => spark.conf.set(key, p)
                case None => spark.conf.unset(key)
              }
            }
          }
      }
    } finally spark.stop()
  }
}
