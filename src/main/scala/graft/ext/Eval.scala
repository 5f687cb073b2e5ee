package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics at corpus scale — the readout step of the
  * quality-classifier loop a curation pipeline trains (score docs →
  * evaluate against labels → pick thresholds). Everything reduces to
  * integer arithmetic with ONE final IEEE division, so results are
  * byte-stable and oracle-replayable.
  */
object Eval {

  /** Exact ROC AUC via the Mann–Whitney statistic, computed WITHOUT a
    * global row sort: scores first reduce to one row per DISTINCT
    * score (the only shuffle that touches data volume), then a window
    * over the score groups accumulates negatives-below; AUC =
    * Σ_s nPos_s·(negBelow_s + nNeg_s/2) / (nPos·nNeg), ties counting
    * half. The window runs over |distinct scores| rows, not |rows| —
    * at 100 TB with bounded-precision scores that's the difference
    * between sorting the fact table and sorting a few thousand group
    * rows. All terms stay integral (doubled to absorb the half-tie)
    * until the single final division.
    *
    * Returns one row: (n_pos, n_neg, auc). Degenerate inputs (no
    * positives or no negatives) yield a null auc.
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val byScore = df
      .select(col(scoreCol).cast("double").as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("np_s"), (count(lit(1)) - sum(col("y"))).as("nn_s"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val acc = byScore
      // 2·negBelow + nNeg_s  (the doubled half-tie credit, exact);
      // the product accumulates in decimal so corpus-scale counts
      // (≈1e13 rows → 1e26 credit) can't overflow a long
      .withColumn("credit2",
        col("np_s").cast("decimal(38,0)") *
          (lit(2) * coalesce(sum(col("nn_s")).over(w), lit(0L)) + col("nn_s")).cast("decimal(38,0)"))
      .agg(sum(col("np_s")).as("n_pos"), sum(col("nn_s")).as("n_neg"),
        sum(col("credit2")).as("c2"))
    acc.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(col("c2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }
}
