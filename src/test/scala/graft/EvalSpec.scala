package graft

import graft.ext.Eval

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def aucOf(rows: Seq[(Boolean, Double)]): (Long, Long, Option[Double]) = {
    val r = Eval.auc(rows.toDF("y", "s"), "y", "s").collect()(0)
    (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("perfect separation scores 1, inverted scores 0") {
    assert(aucOf(Seq((true, 10.0), (true, 9.0), (false, 1.0), (false, 2.0)))
      == ((2L, 2L, Some(1.0))))
    assert(aucOf(Seq((true, 1.0), (false, 10.0))) == ((1L, 1L, Some(0.0))))
  }

  test("hand-computed mixed case with ties") {
    // pos scores {3, 1}, neg scores {2, 1}:
    // pairs: (3,2)win (3,1)win (1,2)loss (1,1)tie=0.5 → 2.5/4 = 0.625
    assert(aucOf(Seq((true, 3.0), (true, 1.0), (false, 2.0), (false, 1.0)))
      == ((2L, 2L, Some(0.625))))
  }

  test("all scores tied gives 0.5; degenerate labels give null") {
    assert(aucOf(Seq((true, 5.0), (false, 5.0), (true, 5.0)))._3 == Some(0.5))
    assert(aucOf(Seq((true, 1.0), (true, 2.0)))._3.isEmpty)
    assert(aucOf(Seq((false, 1.0)))._3.isEmpty)
  }

  test("byte-identical under repartitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ => (rnd.nextBoolean(), (rnd.nextInt(50) / 10.0)))
    val a = Eval.auc(rows.toDF("y", "s"), "y", "s").collect()(0)
    val b = Eval.auc(rows.toDF("y", "s").repartition(7), "y", "s").collect()(0)
    assert(a.toSeq == b.toSeq)
  }
}
