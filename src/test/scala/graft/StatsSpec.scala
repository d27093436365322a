package graft

import org.apache.spark.sql.functions._
import graft.stats.Stats

/** Distribution analytics against hand-computed values
  * (gini per Utils/gini.py:8-28 semantics; reference metric tests
  * Base/Evaluation/metrics_Test.py:16-155 cover the same formulas). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("gini: perfectly equal counts → 0") {
    val df = (1 to 4).flatMap(k => Seq.fill(5)(k)).toDF("k")
    val g = Stats.giniOfCounts(df, col("k")).head().getDouble(0)
    assert(math.abs(g) < 1e-12)
  }

  test("gini: known skewed distribution") {
    // counts [1, 3] sorted asc: ((2·1-2-1)·1 + (2·2-2-1)·3) / (2·4) = 0.25
    val df = (Seq.fill(1)(1) ++ Seq.fill(3)(2)).toDF("k")
    val g = Stats.giniOfCounts(df, col("k")).head().getDouble(0)
    assert(math.abs(g - 0.25) < 1e-12)
  }

  test("cumulative coverage: half the mass needs the top entity only") {
    // counts: a=6, b=2, c=2 → 50% of 10 is covered by 'a'
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val cov = Stats.cumulativeCoverage(df, col("k"), Seq(0.5))
      .head().getAs[Long]("n_entities")
    assert(cov == 1)
  }

  test("histogram bins floor correctly") {
    val df = Seq(0.1, 4.9, 5.0, 9.9, 10.0).toDF("v")
    val bins = Stats.histogram(df, col("v"), 5.0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins(0L) == 2 && bins(1L) == 2 && bins(2L) == 1)
  }

  test("sessionize splits on gap and counts sessions") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 2L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 3L))
      .toDF("user_id", "ts", "event_id")
    val s = Stats.sessionize(ev, col("user_id"), col("ts"),
                             col("event_id"), 30 * 60 * 1000L)
    val sess = s.groupBy("user_id").agg(max("session_id").as("n"))
      .head().getAs[Long]("n")
    assert(sess == 2)
  }
}
