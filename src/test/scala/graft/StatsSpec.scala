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

  test("stratified sample: deterministic, rate-proportional per stratum") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val s1 = Stats.stratifiedSample(df, col("id"), col("lang"),
      Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.25)
    val s2 = Stats.stratifiedSample(df, col("id"), col("lang"),
      Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.25)
    val r1 = s1.collect().map(_.getLong(0)).toSet
    // identical rows on a re-run — the reproducibility contract
    assert(r1 == s2.collect().map(_.getLong(0)).toSet)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 per stratum: en ≈ 500, zh ≈ 100 (md5 is uniform; ±5σ bands)
    assert(byLang("en") > 400 && byLang("en") < 600)
    assert(byLang("zh") > 50 && byLang("zh") < 160)
  }

  test("quantile trim keeps the in-band rows only") {
    val df = ((1 to 100).map(v => ("g1", v)) ++ Seq(("g2", 1000)))
      .toDF("g0", "v")
    val trimmed = Stats.quantileTrim(df, col("g0"), col("v"), 0.1, 0.9)
      .collect()
    val g1 = trimmed.filter(_.getString(0) == "g1").map(_.getInt(1))
    // p10 = 10.9, p90 = 90.1 on 1..100 → keeps 11..90
    assert(g1.min == 11 && g1.max == 90 && g1.length == 80)
    // a single-row group survives its own (degenerate) band
    assert(trimmed.count(_.getString(0) == "g2") == 1)
  }

  test("HLL sketches estimate within 5% and union-merge across groups") {
    val df = (0 until 5000).map(i => (s"g${i % 3}", (i % 1700).toLong))
      .toDF("grp", "uid")
    // exact yardsticks computed HERE — the operator itself never pays
    // the exact-distinct shuffle
    val exact = df.groupBy("grp").agg(countDistinct("uid").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Stats.distinctSketch(df, col("grp"), col("uid"))
      .collect()
      .map(r => (if (r.getAs[Boolean]("is_total")) None
                 else Some(r.getString(0))) -> r.getAs[Long]("est"))
      .toMap
    exact.foreach { case (g, x) =>
      val est = rows(Some(g))
      assert(math.abs(est - x).toDouble / x < 0.05,
        s"$g: estimate $est drifted >5% from exact $x")
    }
    // the global row is a sketch UNION, not a rescan — it must cover
    // at least the largest part and at most the sum of parts
    val totalEst = rows(None)
    assert(math.abs(totalEst - 1700L).toDouble / 1700 < 0.05)
    val parts = (rows - None).values
    assert(totalEst >= parts.max && totalEst <= (parts.sum * 1.05).toLong)
  }

  test("weighted sample favors heavy rows and is reproducible") {
    // 1000 weight-1 rows vs 10 weight-1000 rows: A-Res should pick
    // mostly heavy rows into a k=10 sample (md5 draws → deterministic)
    val df = ((0L until 1000L).map(i => (i, "s", 1L)) ++
              (2000L until 2010L).map(i => (i, "s", 1000L)))
      .toDF("id", "g", "w")
    val pick = Stats.weightedSample(df, col("id"), col("g"), col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(pick.size == 10)
    val heavy = pick.count(_ >= 2000L)
    assert(heavy >= 7, s"expected mostly heavy rows, got $heavy/10")
    val again = Stats.weightedSample(df, col("id"), col("g"), col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == pick) // seedless reproducibility
  }

  test("equi-depth bins split 1..100 into four quarters") {
    val df = (1 to 100).map(v => Tuple1(v)).toDF("v")
    val bins = Stats.equidepthHistogram(df, col("v"), 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // edges 25.75 / 50.5 / 75.25 → 25 values per bin
    assert(bins == Map(0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L))
  }

  test("range join matches every containing interval, boundaries inclusive") {
    val pts = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0), (4L, 99.0))
      .toDF("pid", "v")
    val ivs = Seq((10L, 0.0, 10.0), (11L, 10.0, 20.0), (12L, 24.0, 26.0))
      .toDF("iid", "lo", "hi")
    val out = graft.operators.Relational.rangeJoin(
        pts, ivs, v = "v", lo = "lo", hi = "hi", bucketWidth = 7.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10.0 sits on both band boundaries → two matches; 99 matches none
    assert(out == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("as-of join picks the latest right row at-or-before each left row") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val l = Seq((100L, 1L, t(10), "p1"), (101L, 1L, t(30), "p2"),
                (102L, 2L, t(5), "p3"))
      .toDF("event_id", "user_id", "ts", "what")
    val r = Seq((1L, 1L, t(5), 5.0), (2L, 1L, t(10), 10.0),
                (3L, 1L, t(20), 20.0), (4L, 3L, t(1), 1.0))
      .toDF("event_id", "user_id", "ts", "v")
        .withColumn("r_id", col("event_id"))
    val out = graft.operators.Relational.asofJoin(
        l, r, key = "user_id", ts = "ts", tie = "event_id",
        payload = Seq("r_id", "v"))
      .select(col("event_id"), col("asof.r_id").as("rid"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out(100L) == 2L) // equal ts matches (inclusive as-of)
    assert(out(101L) == 3L) // latest earlier, not first
    assert(out(102L) == -1L) // user 2 has no clicks → null match
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

  test("ksDrift: zero for identical, one for disjoint, hand value, " +
       "empty-side convention") {
    import graft.stats.Stats
    def df(xs: Double*) = xs.toDF("v")
    def ks(a: org.apache.spark.sql.DataFrame,
           b: org.apache.spark.sql.DataFrame): Double =
      Stats.ksDrift(a, b, col("v")).head().getDouble(0)
    assert(ks(df(1, 2, 3), df(1, 2, 3)) == 0.0)
    assert(ks(df(1, 2), df(10, 20)) == 1.0)
    // a=[1,1,2,3], b=[2,3,3,4]: Fa=(.5,.75,1,1) Fb=(0,.25,.75,1) → .5
    assert(ks(df(1, 1, 2, 3), df(2, 3, 3, 4)) == 0.5)
    // an empty side has no distribution: empty result, not a throw
    assert(Stats.ksDrift(df(1, 2), df(), col("v")).isEmpty)
  }

  test("psiDrift: zero for identical, hand value, clamping, empty side") {
    import graft.stats.Stats
    def df(xs: Double*) = xs.toDF("v")
    def psi(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame): Double =
      Stats.psiDrift(a, b, col("v"), bins = 4, lo = 0.0, hi = 4.0)
        .head().getDouble(0)
    // identical distributions: every (p - q) is exactly 0
    assert(psi(df(0.5, 1.5, 2.5), df(0.5, 1.5, 2.5)) == 0.0)
    // hand value: a all in bin 0, b all in bin 1, ε = 1e-6 →
    // term0 = (1+ε − ε)·ln((1+ε)/ε), term1 = (ε − (1+ε))·ln(ε/(1+ε))
    // = 2·ln((1+1e-6)/1e-6) ≈ 27.631636
    val expected = BigDecimal(2.0 * math.log((1.0 + 1e-6) / 1e-6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(psi(df(0.1, 0.2), df(1.1, 1.2)) == expected)
    // out-of-range values clamp into the edge bins: -5 → bin 0,
    // 99 → bin 3; identical after clamping → 0
    assert(psi(df(-5.0, 99.0), df(0.5, 3.5)) == 0.0)
    // PSI is order-sensitive in sign terms but symmetric in value
    assert(psi(df(0.5, 0.5, 1.5), df(1.5, 1.5, 0.5)) ==
           psi(df(1.5, 1.5, 0.5), df(0.5, 0.5, 1.5)))
    // empty side: empty result, not a throw
    assert(Stats.psiDrift(df(1.0), df(), col("v"), 4, 0.0, 4.0).isEmpty)
  }

  test("tokenBudgetPlan: water-filling hand example, all three regimes") {
    // Three domains, one doc each: A=100, B=100, C=800 tokens.
    // τ=2 → sw = (10, 10, 28.284271), W = 48.284271,
    // wt = (0.2071.., 0.2071.., 0.5857..); maxEpochs=1 → caps = avail.
    val docs = Seq(("A", 100), ("B", 100), ("C", 800)).toDF("d", "ntok")
    def plan(budget: Double) =
      Stats.tokenBudgetPlan(docs, col("d"), col("ntok"),
          budget, invTemperature = 0.5, maxEpochs = 1.0)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // B=500: A and B saturate at 1 epoch, C water-fills to exactly the
    // residual 300 (λ* = 300·W/sw_C, alloc_C = wt_C·λ* = 300)
    val p = plan(500.0)
    assert(p("A")._1 == 100.0 && p("A")._2 == 1.0)
    assert(p("B")._1 == 100.0 && p("B")._2 == 1.0)
    assert(math.abs(p("C")._1 - 300.0) < 1e-4)
    assert(math.abs(p("C")._2 - 0.375) < 1e-6)
    assert(math.abs(p("A")._3 - 0.2) < 1e-6) // realized share
    assert(math.abs(p("C")._3 - 0.6) < 1e-6)
    // B=200: below every saturation level → pure proportional split
    val q = plan(200.0)
    assert(math.abs(q("A")._1 - 200.0 * 10.0 / 48.284271) < 1e-4)
    assert(math.abs(q("C")._1 - 200.0 * 28.284271 / 48.284271) < 1e-4)
    // B=2000 ≥ Σcap: every domain capped, budget under-used
    val o = plan(2000.0)
    assert(o("A")._1 == 100.0 && o("C")._1 == 800.0)
    assert(o.values.map(_._2).forall(_ == 1.0))
    // degenerate parameterizations are rejected at entry, not emitted
    // as NULL/NaN rows (budget 0 would divide realized_wt by totA = 0;
    // negative budget flips the λ(0) fallback to negative allocations)
    intercept[IllegalArgumentException] { plan(0.0) }
    intercept[IllegalArgumentException] { plan(-1.0) }
    intercept[IllegalArgumentException] {
      Stats.tokenBudgetPlan(docs, col("d"), col("ntok"),
          500.0, invTemperature = -0.1, maxEpochs = 1.0)
    }
    intercept[IllegalArgumentException] {
      Stats.tokenBudgetPlan(docs, col("d"), col("ntok"),
          500.0, invTemperature = 0.5, maxEpochs = 0.0)
    }
  }

  test("materializeMixturePlan: integer epochs conserve tokens " +
       "exactly, fractional epochs draw deterministically, reps " +
       "enumerate 1..n_rep") {
    import spark.implicits._
    val docs = ((1L to 50L).map(i => (i, "full", 10)) ++
                (101L to 200L).map(i => (i, "half", 10)))
      .toDF("doc_id", "d", "ntok")
    val plan = Seq(("full", 2.0), ("half", 0.5))
      .toDF("domain", "epochs")
    val out = Stats.materializeMixturePlan(
        docs, col("doc_id"), col("d"), col("ntok"), plan, seed = 7L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    // integer epochs: every doc exactly twice, tokens conserved to
    // the plan's alloc (2.0 * 500) with zero binomial noise
    val full = out.filter(_._2 == "full")
    assert(full.length == 100)
    assert((1L to 50L).forall(i =>
      full.filter(_._1 == i).map(_._5).sorted.toSeq == Seq(1L, 2L)))
    assert(full.map(_._3).sum == 1000L)
    // fractional epochs: kept docs appear once, and the draw is the
    // md5 convention — a re-run selects the SAME subset
    val half = out.filter(_._2 == "half")
    assert(half.forall(r => r._4 == 1L && r._5 == 1L))
    assert(half.length > 20 && half.length < 80)
    val again = Stats.materializeMixturePlan(
        docs, col("doc_id"), col("d"), col("ntok"), plan, seed = 7L)
      .filter(col("domain") === "half")
      .collect().map(_.getLong(0)).toSet
    assert(again == half.map(_._1).toSet)
    // a different seed keeps a different subset (fixed md5 draws)
    val seeded = Stats.materializeMixturePlan(
        docs, col("doc_id"), col("d"), col("ntok"), plan, seed = 8L)
      .filter(col("domain") === "half")
      .collect().map(_.getLong(0)).toSet
    assert(seeded != again)
  }

  test("epochBlockShuffle: bijection onto 1..N, blocks contiguous, " +
       "source-order blocking, seeded and deterministic") {
    val docs = (0L until 103L).map(i => Tuple1(i)).toDF("doc_id")
    def run(seed: Long) = Stats.epochBlockShuffle(
        docs, col("doc_id"), blockSize = 10, seed = seed)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = run(7L)
    // bijection: positions are exactly 1..103
    assert(out.map(_._4).sorted.toSeq == (1L to 103L))
    // source-order blocking: doc 0..9 -> block 0, ..., doc 100..102 ->
    // block 10 (the partial tail block)
    assert(out.forall { case (d, b, _, _) => b == d / 10 })
    // each block's positions are one contiguous run of its size
    out.groupBy(_._2).foreach { case (b, rows) =>
      val pos = rows.map(_._4)
      assert(pos.max - pos.min + 1 == rows.length,
             s"block $b positions not contiguous")
    }
    // block_ord is consistent: same block -> same ord, ords are 1..11
    assert(out.groupBy(_._2).values
      .forall(rows => rows.map(_._3).distinct.length == 1))
    assert(out.map(_._3).distinct.sorted.toSeq == (1L to 11L))
    // deterministic per seed; a different seed permutes differently
    assert(run(7L).toSeq == out.toSeq)
    val bySeed7 = out.map(t => t._1 -> t._4).toMap
    val bySeed8 = run(8L).map(t => t._1 -> t._4).toMap
    assert(bySeed7 != bySeed8)
    intercept[IllegalArgumentException] {
      Stats.epochBlockShuffle(docs, col("doc_id"), 0, 7L)
    }
  }

  test("aucRoc: perfect 1, reversed 0, all-tied 0.5, hand value with " +
       "and without ties, single class yields null") {
    def auc(rows: Seq[(Double, Int)]): Option[Double] = {
      val r = Stats.aucRoc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    assert(auc(Seq((3.0, 1), (2.0, 1), (1.0, 0), (0.0, 0)))
             .contains(1.0))
    assert(auc(Seq((3.0, 0), (2.0, 0), (1.0, 1), (0.0, 1)))
             .contains(0.0))
    assert(auc(Seq((5.0, 1), (5.0, 0), (5.0, 1), (5.0, 0)))
             .contains(0.5))
    // pos ranks {4, 2}: U = 6 - 3 = 3, auc = 3/4
    assert(auc(Seq((3.0, 1), (2.0, 0), (1.0, 1), (0.0, 0)))
             .contains(0.75))
    // midrank tie: pos {2, 1}, neg {1, 0} -> R_pos = 4 + 2.5 = 6.5,
    // auc = 3.5/4 (exact in binary)
    assert(auc(Seq((2.0, 1), (1.0, 1), (1.0, 0), (0.0, 0)))
             .contains(0.875))
    assert(auc(Seq((1.0, 1), (0.0, 1))).isEmpty)
    // counts surface
    val r = Stats.aucRoc(Seq((2.0, 1), (1.0, 0), (0.0, 0)).toDF("s", "y"),
                         col("s"), col("y")).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
  }

  test("kAnonymity flags small groups; suppressBelowK drops exactly " +
       "their rows; k validated") {
    val rows = Seq(
      ("a", "x", 1L), ("a", "x", 2L),      // size 2
      ("b", "x", 3L),                      // size 1 -> violates k=2
      ("b", "y", 4L), ("b", "y", 5L), ("b", "y", 6L)) // size 3
      .toDF("qi1", "qi2", "id")
    val audit = Stats.kAnonymity(rows, Seq("qi1", "qi2"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(audit(("a", "x")) == ((2L, 0)))
    assert(audit(("b", "x")) == ((1L, 1)))
    assert(audit(("b", "y")) == ((3L, 0)))
    val kept = Stats.suppressBelowK(rows, Seq("qi1", "qi2"), k = 2)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept == Set(1L, 2L, 4L, 5L, 6L))
    intercept[IllegalArgumentException] {
      Stats.kAnonymity(rows, Seq("qi1"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Stats.kAnonymity(rows, Nil, k = 2)
    }
  }
}
