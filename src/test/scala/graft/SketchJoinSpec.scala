package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.operators.JoinPrune
import graft.stats.Sketches

/** Round-6 scale operators: Bloom-pruned semi-join, sketch-guided exact
  * heavy hitters, KLL quantiles — differential against naive
  * implementations on seeded skewed inputs.
  */
class SketchJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin is exactly the plain semi-join (long keys)") {
    val rnd = new Random(11)
    val probe = (0 until 5000).map(_ => rnd.nextInt(2000).toLong)
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "pk")
    // small build side: ~5% of the key space
    val build = (0 until 120).map(_ => rnd.nextInt(2000).toLong)
      .toDF("bk")
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 1000)
      .select("row_id").as[Long].collect().sorted
    val want = JoinPrune.plainSemiJoin(probe, build, "pk", "bk")
      .select("row_id").as[Long].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloomSemiJoin is exactly the plain semi-join (string keys)") {
    val rnd = new Random(12)
    val probe = (0 until 3000)
      .map(i => (i.toLong, s"key_${rnd.nextInt(800)}"))
      .toDF("row_id", "pk")
    val build = (0 until 60).map(_ => s"key_${rnd.nextInt(800)}")
      .toDF("bk")
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 1000)
      .select("row_id").as[Long].collect().sorted
    val want = JoinPrune.plainSemiJoin(probe, build, "pk", "bk")
      .select("row_id").as[Long].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("heavyHitters equals the naive groupBy+HAVING on a Zipf stream") {
    val rnd = new Random(13)
    // Zipf-ish: key k drawn with probability ~ 1/(k+1)
    val keys = (0 until 40000).map { _ =>
      val u = rnd.nextDouble()
      s"k${math.floor(math.pow(5000.0, u)).toLong}"
    }
    val df = keys.toDF("k")
    val share = 0.002
    // deliberately small sketch: forces candidate false positives,
    // which the exact confirm pass must then remove
    val got = Sketches.heavyHitters(df, col("k"), share, maxMapSize = 1024)
      .as[(String, Long)].collect().toMap
    val threshold = math.ceil(share * keys.size).toLong
    val want = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
    assert(got.nonEmpty && got == want)
  }

  test("heavyHitters rejects a sketch too small for the share") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq("a").toDF("k"), col("k"),
                            minShare = 0.0001, maxMapSize = 1024)
    }
  }

  test("kllQuantiles tracks exact quantiles within rank-error bounds") {
    val rnd = new Random(14)
    // lognormal-ish skew across 3 groups of very different sizes
    val rows = (0 until 30000).map { i =>
      val g = if (i % 100 == 0) "small" else if (i % 3 == 0) "mid" else "big"
      (g, math.exp(rnd.nextGaussian() * 1.5))
    }
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.75)
    val got = Sketches.kllQuantiles(df, col("g"), col("v"), qs)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("__total__"),
                 (r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // exact yardstick: value at the quantile rank, per group and global
    def exact(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      s(math.min(s.size - 1, (q * s.size).toInt))
    }
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap +
      ("__total__" -> rows.map(_._2))
    // KLL k=200 rank error ~1.65%; allow 3% rank drift converted to
    // value space by comparing against the exact values at q +- 0.03
    for ((g, vs) <- groups; (q, i) <- qs.zipWithIndex) {
      val est = i match {
        case 0 => got(g)._1
        case 1 => got(g)._2
        case 2 => got(g)._3
      }
      val lo = exact(vs, math.max(0.0, q - 0.03))
      val hi = exact(vs, math.min(1.0, q + 0.03))
      assert(est >= lo && est <= hi,
        s"group $g q$q: est $est outside [$lo, $hi]")
    }
    // the global row must come from the merge, flagged is_total
    assert(got.contains("__total__"))
  }
}
