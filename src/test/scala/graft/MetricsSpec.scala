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

  test("hitTable min_ratings_per_user prunes sparse-relevance users") {
    val recs = Seq((1, 10, 1), (1, 11, 2), (2, 10, 1), (2, 11, 2))
      .toDF("u", "item", "rank")
    // user 1 has two relevant items, user 2 only one
    val rel = Seq((1, 10), (1, 11), (2, 10)).toDF("u", "i")
    val all = Evaluation.hitTable(recs, rel)
    assert(all.select("u").distinct().count() == 2)
    val pruned = Evaluation.hitTable(recs, rel, minRatingsPerUser = 2)
    val kept = pruned.select("u").distinct().collect().map(_.getInt(0))
    assert(kept.sameElements(Array(1)),
           "only the user with >= 2 relevant items survives")
  }

  test("no hits yields zero accuracy") {
    val m = metricsFor(Seq(1, 3, 6, 7, 8), Seq(2, 4))
    assert(m.getAs[Double]("precision") == 0.0)
    assert(m.getAs[Double]("recall") == 0.0)
    assert(m.getAs[Double]("map") == 0.0)
    assert(m.getAs[Double]("mrr") == 0.0)
    assert(m.getAs[Double]("hit_rate") == 0.0)
  }

  test("arhr / roc_auc / f1 on ranked_list_1") {
    val m = metricsFor(Seq(1, 2, 3, 4, 5), Seq(2, 4))
    assert(math.abs(m.getAs[Double]("arhr") - 0.75) < 1e-9)
    // hits at ranks 2,4: correctly-ordered pairs = 2 + 1 of 2·3 → 0.5
    assert(math.abs(m.getAs[Double]("roc_auc") - 0.5) < 1e-9)
    assert(math.abs(m.getAs[Double]("f1") - 2 * 0.4 * 1.0 / 1.4) < 1e-6)
    assert(math.abs(m.getAs[Double]("precision_recall_min_den") - 1.0)
           < 1e-9)
  }

  test("average popularity, inter/intra-list diversity") {
    val recs = Seq((1, 10, 1), (1, 11, 2), (2, 10, 1), (2, 12, 2))
      .toDF("u", "item", "rank")
    val pop = Seq((10, 8L), (11, 4L), (12, 4L)).toDF("i", "pop")
    val ap = Evaluation.averagePopularity(recs, pop).head().getDouble(0)
    // mean pop = (8+4+8+4)/4 = 6; / max 8 = 0.75
    assert(math.abs(ap - 0.75) < 1e-9)
    // counts: item10→2, others 1 → Σc(c−1)=2; users=2, cutoff=2 →
    // 1 − 2/(2·1·2) = 0.5
    val mil = Evaluation.meanInterListDiversity(recs, 2)
      .head().getDouble(0)
    assert(math.abs(mil - 0.5) < 1e-9)
    val sim = Seq((10, 11, 0.5), (10, 12, 0.0)).toDF("i", "j", "w")
    val ild = Evaluation.intraListDiversity(recs, sim).head().getDouble(0)
    // user1 pair (10,11): 1−0.5 = 0.5 ; user2 pair (10,12): 1−0 = 1
    assert(math.abs(ild - 0.75) < 1e-9)
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
