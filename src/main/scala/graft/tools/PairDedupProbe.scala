package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the embedding near-dup PAIR family
  * ([[graft.ext.Dedup.embeddingNearDupsBucketed]] and its PQ-prefilter
  * variant) — the r15 verdict's named next-ceiling candidate: pairs
  * still materialize through the within-cell self-join (an UnsafeRow
  * carrying TWO full vectors per candidate pair), where the top-k
  * probe shapes got a fused operator. This probe measures whether that
  * join materialization dominates at the 100× corpus before deciding
  * to extend the fused operator with a pair-threshold mode.
  *
  * Run against a ScaleUp replica dir (embeddings.parquet, dim 64): the
  * replication jitter makes each base vector's replicas mutual
  * near-dups, so the pair output is real and large.
  *
  * r17: also measures the INCREMENTAL batch-vs-store shape
  * ([[graft.ext.Dedup.embeddingNearDupsAgainst]]) — compositional join
  * vs the fused unordered pair scan (broadcast and forced-partitioned
  * modes), batch = every 10th vector, store = the rest.
  *
  * usage: runMain graft.tools.PairDedupProbe <sfDir> [nCells] [nProbe] [threshold] [exact|pq|fused|against|all]
  */
object PairDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = if (args.length > 1) args(1).toInt else 256
    val nProbe = if (args.length > 2) args(2).toInt else 2
    val threshold = if (args.length > 3) args(3).toDouble else 0.9999
    val which = if (args.length > 4) args(4) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("pair-dedup-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count() // warm cache + size
      def timed(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[pairdedup] $label dir=$dir corpus=$n nCells=$nCells " +
          f"nProbe=$nProbe threshold=$threshold pairs=$rows sec=$sec%.2f")
      }
      if (which == "exact" || which == "all")
        timed("exact-bucketed-join") {
          graft.ext.Dedup.embeddingNearDupsBucketed(e, "embedding", "vec_id",
            threshold, nCells = nCells, nProbe = nProbe,
            useFused = Some(false)).count()
        }
      if (which == "pq" || which == "all")
        timed("pq-prefiltered-join") {
          graft.ext.Dedup.embeddingNearDupsBucketedPq(e, "embedding", "vec_id",
            threshold, nCells = nCells, nProbe = nProbe,
            margin = 0.3, m = 16, ksub = 16).count()
        }
      if (which == "fused" || which == "all")
        timed("fused-pair-scan") {
          graft.ext.Dedup.embeddingNearDupsBucketed(e, "embedding", "vec_id",
            threshold, nCells = nCells, nProbe = nProbe,
            useFused = Some(true)).count()
        }
      if (which == "against" || which == "all") {
        // the incremental shape: ~10% of rows are the incoming batch,
        // the rest the persisted store. A HASH split (not a vec_id
        // modulus): ScaleUp assigns replica ids replica·10⁷ + base, so
        // an id-arithmetic split can put whole replica families on one
        // side and empty the cross-split pair set; the hash split
        // scatters each family across both sides
        val batch = e.filter(pmod(hash(col("vec_id"), lit(11)), lit(10)) === 0)
        val store = e.filter(pmod(hash(col("vec_id"), lit(11)), lit(10)) =!= 0)
        timed("against-compositional-join") {
          graft.ext.Dedup.embeddingNearDupsAgainst(batch, store,
            "embedding", "vec_id", threshold, nCells = nCells,
            nProbe = nProbe, useFused = Some(false)).count()
        }
        timed("against-fused-broadcast") {
          graft.ext.Dedup.embeddingNearDupsAgainst(batch, store,
            "embedding", "vec_id", threshold, nCells = nCells,
            nProbe = nProbe, useFused = Some(true)).count()
        }
        timed("against-fused-partitioned") {
          val key = graft.plans.SdcTopKPlan.probeBroadcastThresholdKey
          val prior = spark.conf.getOption(key)
          spark.conf.set(key, "-1")
          try graft.ext.Dedup.embeddingNearDupsAgainst(batch, store,
            "embedding", "vec_id", threshold, nCells = nCells,
            nProbe = nProbe, useFused = Some(true)).count()
          finally prior match {
            case Some(p) => spark.conf.set(key, p)
            case None => spark.conf.unset(key)
          }
        }
      }
    } finally spark.stop()
  }
}
