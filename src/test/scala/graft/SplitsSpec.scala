package graft

import org.apache.spark.sql.functions._
import graft.etl.Urm

/** Split operators: proportions, disjointness, per-user invariants —
  * the reference's own assertions (assert_disjoint_matrices,
  * Utils/assertions_on_data_for_experiments.py:28-54) as tests. RNG
  * membership differs from NumPy by design (SURVEY §7.4); properties,
  * not membership, are asserted.
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val urm = (for {
    u <- 0 until 50; i <- 0 until 40 if (u * 7 + i * 3) % 5 != 0
  } yield (u, i)).toDF("u", "i").cache()

  test("randomSplit: proportions and disjointness") {
    val Array(tr, va, te) =
      Urm.randomSplit(urm, Array(0.7, 0.1, 0.2), seed = 42)
    val n = urm.count().toDouble
    assert(math.abs(tr.count() / n - 0.7) < 0.05)
    assert(tr.count() + va.count() + te.count() == n.toLong)
    assert(tr.intersect(te).isEmpty && tr.intersect(va).isEmpty &&
           va.intersect(te).isEmpty)
  }

  test("hash split is deterministic and total") {
    val s1 = Urm.hashSplit(urm, 8, 10)
    val s2 = Urm.hashSplit(urm, 8, 10)
    assert(s1.exceptAll(s2).isEmpty)
    assert(s1.count() == urm.count())
  }

  test("user-wise holdout keeps ~frac per user in train") {
    val s = Urm.userWiseHoldout(urm, 0.75, seed = 42)
    val perUser = s.groupBy("u")
      .agg(sum(when(col("split") === "train", 1).otherwise(0)).as("tr"),
           count(lit(1)).as("n"))
      .withColumn("frac", col("tr").cast("double") / col("n"))
      .collect()
    perUser.foreach { r =>
      assert(math.abs(r.getAs[Double]("frac") - 0.75) < 0.15,
             s"user ${r.get(0)}")
    }
  }

  test("leave-one-out holds out exactly one per user") {
    val s = Urm.leaveOneOut(urm, seed = 7)
    val te = s.filter(col("split") === "test").groupBy("u").count()
    assert(te.collect().forall(_.getLong(1) == 1))
  }

  test("timestamp split: latest → test, second → validation") {
    val inter = Seq(
      (1, 10, 100L), (1, 11, 200L), (1, 12, 300L),
      (2, 10, 500L), (2, 13, 400L))
      .toDF("u", "i", "ts")
    val s = Urm.timestampSplit(inter, col("u"), col("ts"))
    val m = s.collect().map(r => ((r.getInt(0), r.getInt(1)),
                                  r.getAs[String]("split"))).toMap
    assert(m((1, 12)) == "test" && m((1, 11)) == "validation" &&
           m((1, 10)) == "train")
    assert(m((2, 10)) == "test" && m((2, 13)) == "validation")
  }

  test("global random holdout: ~frac in train, total, disjoint labels") {
    val s = Urm.globalRandomHoldout(urm, 0.8, seed = 42)
    val n = urm.count().toDouble
    val tr = s.filter(col("split") === "train").count()
    assert(math.abs(tr / n - 0.8) < 0.05)
    assert(s.count() == n.toLong)
  }

  test("cold-user split: full-train users keep whole profile, cold " +
       "users keep exactly coldItems in train") {
    val s = Urm.coldUserSplit(urm, fullTrainFrac = 0.5, coldItems = 3,
                              seed = 42).cache()
    assert(s.count() == urm.count(), "split is total")
    val perUser = s.groupBy("u")
      .agg(sum(when(col("split") === "train", 1).otherwise(0)).as("tr"),
           count(lit(1)).as("n"))
      .collect()
    // every user is either fully in train or a cold user with exactly
    // coldItems train rows (profiles here all exceed coldItems)
    perUser.foreach { r =>
      val (tr, n) = (r.getLong(1), r.getLong(2))
      assert(tr == n || tr == 3, s"user ${r.get(0)}: $tr of $n in train")
    }
    val nCold = perUser.count(r => r.getLong(1) != r.getLong(2))
    assert(nCold > 5 && nCold < 45, s"~half the users cold, got $nCold")
    // small-profile users never go cold
    val tiny = Seq((100, 0), (100, 1), (101, 5)).toDF("u", "i")
    val st = Urm.coldUserSplit(tiny, fullTrainFrac = 0.0, coldItems = 2,
                               seed = 1)
    assert(st.filter(col("split") =!= "train").count() == 0)
  }

  test("cold-user hash twin is deterministic and matches semantics") {
    val s1 = Urm.coldUserSplitHash(urm, 0.4, coldItems = 2)
    val s2 = Urm.coldUserSplitHash(urm, 0.4, coldItems = 2)
    assert(s1.exceptAll(s2).isEmpty)
    val perUser = s1.groupBy("u")
      .agg(sum(when(col("split") === "train", 1).otherwise(0)).as("tr"),
           count(lit(1)).as("n")).collect()
    perUser.foreach { r =>
      val (tr, n) = (r.getLong(1), r.getLong(2))
      assert(tr == n || tr == 2)
    }
  }

  test("denseIndex maps distinct ids to contiguous sorted [0, n)") {
    val ids = Seq(50L, 7L, 7L, 999L, 0L, 50L).toDF("raw")
    val m = Urm.denseIndex(ids, col("raw")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(0L -> 0L, 7L -> 1L, 50L -> 2L, 999L -> 3L))
  }

  test("overlapCells flags constructed overlap and passes disjoint") {
    val disjoint = Seq((1, 1, "train"), (1, 2, "test"))
      .toDF("u", "i", "split")
    assert(Urm.overlapCells(disjoint).head().getLong(0) == 0)
    val overlapping = Seq((1, 1, "train"), (1, 1, "test"))
      .toDF("u", "i", "split")
    assert(Urm.overlapCells(overlapping).head().getLong(0) == 1)
  }
}
