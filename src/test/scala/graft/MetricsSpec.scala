package graft

import graft.eval.Evaluation

/** Ranking metrics against the reference's inline test cases
  * (Base/Evaluation/metrics.py:835-914): pos_items = [2,4] with
  * ranked_list_1 = [1,2,3,4,5] (hits at ranks 2 and 4),
  * ranked_list_3 = [1,3,6,7,8] (no hits).
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def metricsFor(ranked: Seq[Int], relevant: Seq[Int],
                         cutoff: Int = 5) = {
    val recs = ranked.zipWithIndex
      .map { case (it, idx) => (1, it, idx + 1) }
      .toDF("u", "item", "rank")
    val rel = relevant.map((1, _)).toDF("u", "i")
    Evaluation.accuracyMetrics(Evaluation.hitTable(recs, rel), cutoff)
      .head()
  }

  test("ranked_list_1 = [1,2,3,4,5] vs pos [2,4]") {
    val m = metricsFor(Seq(1, 2, 3, 4, 5), Seq(2, 4))
    assert(math.abs(m.getAs[Double]("precision") - 0.4) < 1e-9)
    assert(math.abs(m.getAs[Double]("recall") - 1.0) < 1e-9)
    // AP = (prec@2 + prec@4)/2 = (1/2 + 2/4)/2 = 0.5
    assert(math.abs(m.getAs[Double]("map") - 0.5) < 1e-9)
    assert(math.abs(m.getAs[Double]("mrr") - 0.5) < 1e-9)
    assert(math.abs(m.getAs[Double]("hit_rate") - 1.0) < 1e-9)
    // DCG = 1/log2(3) + 1/log2(5); IDCG = 1/log2(2) + 1/log2(3)
    val ndcg = (1 / (math.log(3) / math.log(2)) +
                1 / (math.log(5) / math.log(2))) /
               (1.0 + 1 / (math.log(3) / math.log(2)))
    assert(math.abs(m.getAs[Double]("ndcg") - ndcg) < 1e-6)
  }

  test("ranked_list_2 = [10,5,2,4,3] vs pos [2,4]") {
    val m = metricsFor(Seq(10, 5, 2, 4, 3), Seq(2, 4))
    // hits at ranks 3,4 → AP = (1/3 + 2/4)/2; outputs are rounded to 6dp
    assert(math.abs(m.getAs[Double]("map") - (1.0 / 3 + 0.5) / 2) < 1e-6)
    assert(math.abs(m.getAs[Double]("mrr") - 1.0 / 3) < 1e-6)
  }

  test("no hits yields zero accuracy") {
    val m = metricsFor(Seq(1, 3, 6, 7, 8), Seq(2, 4))
    assert(m.getAs[Double]("precision") == 0.0)
    assert(m.getAs[Double]("recall") == 0.0)
    assert(m.getAs[Double]("map") == 0.0)
    assert(m.getAs[Double]("mrr") == 0.0)
    assert(m.getAs[Double]("hit_rate") == 0.0)
  }

  test("beyond-accuracy: entropy and herfindahl of uniform recs") {
    val recs = (1 to 4).flatMap(u => Seq((u, 100 + u % 2, 1)))
      .toDF("u", "item", "rank")
    // two items, each recommended twice: p = 0.5/0.5
    val ent = Evaluation.shannonEntropy(recs).head().getDouble(0)
    assert(math.abs(ent - 1.0) < 1e-9)
    val herf = Evaluation.herfindahl(recs).head().getDouble(0)
    assert(math.abs(herf - 0.5) < 1e-9)
    val cov = Evaluation.itemCoverage(recs, 4).head().getDouble(0)
    assert(math.abs(cov - 0.5) < 1e-9)
  }
}
