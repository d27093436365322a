package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Similarity engine against the reference's own micro-fixture
  * (Base/Similarity/Compute_similarity_test.py:37: the 3×4 binary
  * matrix [[1,1,0,1],[0,1,1,1],[1,0,1,0]]): un-normalized similarity
  * equals AᵀA with zeroed diagonal; variant formulas hand-computed.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // (user, item) triples of the fixture matrix
  private lazy val urm = Seq(
    (0, 0), (0, 1), (0, 3),
    (1, 1), (1, 2), (1, 3),
    (2, 0), (2, 2))
    .toDF("u", "i")

  // AᵀA for the fixture (items × items), diagonal zeroed:
  //   A cols: i0=[1,0,1] i1=[1,1,0] i2=[0,1,1] i3=[1,1,0]
  private val expectedDots = Map(
    (0, 1) -> 1L, (0, 2) -> 1L, (0, 3) -> 1L,
    (1, 2) -> 1L, (1, 3) -> 2L, (2, 3) -> 1L)

  test("pairDots equals AᵀA with zeroed diagonal") {
    val dots = Similarity.pairDots(urm)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    expectedDots.foreach { case ((i, j), d) =>
      assert(dots((i, j)) == d, s"dot($i,$j)")
      assert(dots((j, i)) == d, s"dot($j,$i) symmetric")
    }
    assert(!dots.keys.exists(p => p._1 == p._2), "no diagonal")
  }

  test("cosine similarity matches hand-computed values") {
    val w = Similarity.itemSimilarity(urm, Similarity.Cosine)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // cos(1,3) = 2 / (sqrt(2)*sqrt(2)) = 1.0
    assert(math.abs(w((1, 3)) - 1.0) < 1e-12)
    // cos(0,1) = 1 / (sqrt(2)*sqrt(2)) = 0.5
    assert(math.abs(w((0, 1)) - 0.5) < 1e-12)
  }

  test("jaccard similarity matches hand-computed values") {
    val w = Similarity.itemSimilarity(urm, Similarity.Jaccard)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // jac(1,3) = 2 / (2 + 2 - 2) = 1.0 ; jac(0,1) = 1 / (2+2-1) = 1/3
    assert(math.abs(w((1, 3)) - 1.0) < 1e-12)
    assert(math.abs(w((0, 1)) - 1.0 / 3) < 1e-12)
  }

  test("dice and tversky reduce correctly") {
    val dice = Similarity.itemSimilarity(urm, Similarity.Dice)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(math.abs(dice((0, 1)) - 2.0 / 4) < 1e-12)
    // tversky(1,1) == jaccard
    val tv = Similarity.itemSimilarity(urm, Similarity.Tversky(1.0, 1.0))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(math.abs(tv((0, 1)) - 1.0 / 3) < 1e-12)
  }

  test("euclidean normalize / normalize_avg_row match hand-computed " +
       "values (Compute_Similarity_Euclidean.py:188-205 order)") {
    def w(m: Similarity.Euclidean): Double =
      Similarity.itemSimilarity(urm, m)
        .filter(col("i") === 0 && col("j") === 1).head().getDouble(2)
    // pair (0,1): n0=2, n1=2, dot=1, n_rows(users)=3
    // raw: sq = 2+2-2 = 2, lin → 1/(√2 + 1e-9)
    assert(math.abs(w(Similarity.Euclidean("lin"))
      - 1.0 / (math.sqrt(2) + 1e-9)) < 1e-12)
    // normalize divides the SQUARED distance by √n0·√n1 = 2 → sq = 1,
    // dist = 1; lin → 1/(1+1e-9), log → 1/(ln 2 + 1e-9),
    // exp → 1/(e + 1e-9)
    assert(math.abs(w(Similarity.Euclidean("lin", normalize = true))
      - 1.0 / (1.0 + 1e-9)) < 1e-12)
    assert(math.abs(w(Similarity.Euclidean("log", normalize = true))
      - 1.0 / (math.log(2.0) + 1e-9)) < 1e-12)
    assert(math.abs(w(Similarity.Euclidean("exp", normalize = true))
      - 1.0 / (math.exp(1.0) + 1e-9)) < 1e-12)
    // avg-row further divides by n_rows BEFORE the sqrt:
    // sq = 1/3 → dist = √(1/3)
    assert(math.abs(
      w(Similarity.Euclidean("lin", normalize = true,
                             normalizeAvgRow = true))
      - 1.0 / (math.sqrt(1.0 / 3.0) + 1e-9)) < 1e-12)
    // avg-row alone: sq = 2/3
    assert(math.abs(
      w(Similarity.Euclidean("lin", normalizeAvgRow = true))
      - 1.0 / (math.sqrt(2.0 / 3.0) + 1e-9)) < 1e-12)
  }

  test("shrink dampens the weight") {
    val plain = Similarity.itemSimilarity(urm, Similarity.Cosine)
      .filter(col("i") === 1 && col("j") === 3).head().getDouble(2)
    val shrunk = Similarity.itemSimilarity(urm, Similarity.Cosine, 10.0)
      .filter(col("i") === 1 && col("j") === 3).head().getDouble(2)
    assert(shrunk < plain)
  }

  test("topK keeps at most K per column j and is a subset of full") {
    val full = Similarity.itemSimilarity(urm, Similarity.Cosine)
    val k1 = Similarity.topK(full, 1)
    val perJ = k1.groupBy("j").count().collect()
    assert(perJ.forall(_.getLong(1) <= 1))
    assert(k1.count() <= full.count())
  }

  test("asymmetric measures attach alpha to the column item j") {
    // item 0 has norm² 4, item 1 has norm² 1, dot(0,1) = 1 — with
    // alpha=1 the asymmetric-cosine denominator is nj alone, so the
    // matrix is NOT symmetric and the orientation is observable
    // (reference: Compute_Similarity_Python.py:316-321).
    val skewed = Seq((0, 0), (1, 0), (2, 0), (3, 0), (0, 1))
      .toDF("u", "i")
    val w = Similarity
      .itemSimilarity(skewed, Similarity.AsymmetricCosine(1.0))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(math.abs(w((0, 1)) - 1.0) < 1e-12, "w(i=0, j=1) = dot/n1 = 1")
    assert(math.abs(w((1, 0)) - 0.25) < 1e-12, "w(i=1, j=0) = dot/n0 = 1/4")
    // Tversky: alpha weighs (nj - dot), beta weighs (ni - dot)
    // (reference: Compute_Similarity_Python.py:330-335): with
    // alpha=1, beta=0 → w(i,j) = dot / nj
    val tv = Similarity
      .itemSimilarity(skewed, Similarity.Tversky(1.0, 0.0))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(math.abs(tv((0, 1)) - 1.0) < 1e-12)
    assert(math.abs(tv((1, 0)) - 0.25) < 1e-12)
  }

  test("heap topK is bit-identical to the ranking-window topK") {
    val rnd = new scala.util.Random(33)
    // duplicate weights force tie-breaks; sparse j groups force ranks
    // past k for some columns and under k for others
    val sim = (0 until 4000).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong,
       (rnd.nextInt(8) + 1) / 8.0)
    }.toDF("i", "j", "w")
    def key(r: org.apache.spark.sql.Row): (Long, Long, Double, Int) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val heap = Similarity.topKHeap(sim, 5)
      .select("i", "j", "w", "rank").collect().map(key).sortBy(identity)
    val win = Similarity.topK(sim, 5)
      .select("i", "j", "w", "rank").collect().map(key).sortBy(identity)
    assert(heap.nonEmpty && heap.sameElements(win))
  }

  test("capUserDegree: exact cap, light profiles untouched, " +
       "partition-invariant, and the capped engine routes through it") {
    // one heavy user (degree 40), several light ones (degree <= 3)
    val heavy = (0 until 40).map(i => (100L, i.toLong))
    val light = Seq((1L, 0L), (1L, 1L), (2L, 5L), (2L, 6L), (2L, 7L),
                    (3L, 9L))
    val urm = (heavy ++ light).toDF("u", "i")
    val capped = Similarity.capUserDegree(urm, 8)
    val deg = capped.groupBy("u").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg(100L) == 8L, s"heavy profile capped to 8: $deg")
    assert(deg(1L) == 2L && deg(2L) == 3L && deg(3L) == 1L,
           s"light profiles untouched: $deg")
    // light rows pass through IDENTICALLY (not some other subset)
    val keptLight = capped.filter(col("u") =!= 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptLight == light.toSet)
    // pure key function: repartitioning must not change the kept set
    val kept1 = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept2 = Similarity.capUserDegree(urm.repartition(7, col("i")), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept1 == kept2, "md5 pick must be partition-invariant")
    // the engine's maxUserDegree routes through the same cap: equal to
    // running the uncapped engine on the pre-capped frame
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val viaParam = Similarity.itemSimilarity(
        urm, Similarity.Cosine, maxUserDegree = 8)
      .collect().map(key).sortBy(identity)
    val viaPre = Similarity.itemSimilarity(
        Similarity.capUserDegree(urm, 8), Similarity.Cosine)
      .collect().map(key).sortBy(identity)
    assert(viaParam.nonEmpty && viaParam.sameElements(viaPre))
    intercept[IllegalArgumentException] {
      Similarity.capUserDegree(urm, 0)
    }
    // the sweep form (rank once, filter per cap — q214's shape) is
    // bit-identical to independent capUserDegree calls at every cap
    val ranked = Similarity.userDegreeRanked(urm)
    for (cap <- Seq(2, 8, 40)) {
      val viaSweep = ranked.filter(col(Similarity.capRankCol) <= cap)
        .drop(Similarity.capRankCol)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaCap = Similarity.capUserDegree(urm, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaSweep == viaCap, s"sweep form differs at cap $cap")
    }
  }

  test("pairDotsMultiCap/itemNormsMultiCap: every cap level bit-" +
       "identical to the independent capped engine, binary + weighted") {
    val rnd = new scala.util.Random(77)
    // one heavy user (degree 30), light tail, varied weights so the
    // cap changes dots AND norms when it bites
    val heavy = (0 until 30).map(i => (100L, i.toLong,
      (rnd.nextInt(900) + 100) / 1000.0))
    val light = Seq((1L, 0L, 0.5), (1L, 1L, 0.25), (2L, 5L, 0.75),
                    (2L, 6L, 0.3), (3L, 1L, 0.9), (3L, 5L, 0.6),
                    (4L, 0L, 0.2), (4L, 5L, 0.8), (4L, 6L, 0.4))
    val urmW = (heavy ++ light).toDF("u", "i", "w")
    val urm = urmW.select("u", "i")
    val caps = Seq(2, 8, 40)
    // ---- binary: dots and norms per level == independent chain ----
    val ranked = Similarity.userDegreeRanked(urm)
    val pd = Similarity.pairDotsMultiCap(ranked, caps)
    val norms = Similarity.itemNormsMultiCap(ranked, caps)
    def dotKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    for (cap <- caps) {
      val viaMulti = pd.filter(col(s"dot_$cap") > 0)
        .select(col("i"), col("j"), col(s"dot_$cap"))
        .collect().map(dotKey).sortBy(identity)
      val viaCap = Similarity
        .pairDots(Similarity.capUserDegree(urm, cap))
        .select(col("i"), col("j"), col("dot"))
        .collect().map(dotKey).sortBy(identity)
      assert(viaMulti.nonEmpty && viaMulti.sameElements(viaCap),
             s"binary multi-cap dots differ at cap $cap")
      val nMulti = norms.filter(col(s"n_$cap") > 0)
        .select(col("i"), col(s"n_$cap"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(identity)
      val nCap = Similarity
        .itemNorms(Similarity.capUserDegree(urm, cap))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(identity)
      assert(nMulti.sameElements(nCap),
             s"binary multi-cap norms differ at cap $cap")
    }
    // uncapped columns reproduce the plain engine
    val dotsFull = pd.select(col("i"), col("j"), col("dot"))
      .collect().map(dotKey).sortBy(identity)
    val dotsPlain = Similarity.pairDots(urm)
      .select(col("i"), col("j"), col("dot"))
      .collect().map(dotKey).sortBy(identity)
    assert(dotsFull.sameElements(dotsPlain))
    // ---- weighted: conditional decimal sums == independent chain ----
    val q = Similarity.quantizeWeights(urmW)
    val rankedW = Similarity.userDegreeRanked(q)
    val pdW = Similarity.pairDotsMultiCap(rankedW, caps, weighted = true)
    val normsW = Similarity.itemNormsMultiCap(rankedW, caps,
                                              weighted = true)
    def wKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDecimal(2))
    for (cap <- caps) {
      val viaMulti = pdW.filter(col(s"dot_$cap").isNotNull)
        .select(col("i"), col("j"), col(s"dot_$cap"))
        .collect().map(wKey).sortBy(r => (r._1, r._2))
      val viaCap = Similarity.pairDotsWeightedFrom(
          Similarity.quantizeWeights(Similarity.capUserDegree(urmW, cap)))
        .select(col("i"), col("j"), col("dot"))
        .collect().map(wKey).sortBy(r => (r._1, r._2))
      assert(viaMulti.nonEmpty &&
             viaMulti.map(_._1).sameElements(viaCap.map(_._1)) &&
             viaMulti.map(_._2).sameElements(viaCap.map(_._2)) &&
             viaMulti.zip(viaCap).forall { case (a, b) =>
               a._3.compareTo(b._3) == 0 },
             s"weighted multi-cap dots differ at cap $cap")
      val nMulti = normsW.filter(col(s"n_$cap").isNotNull)
        .select(col("i"), col(s"n_$cap"))
        .collect().map(r => (r.getLong(0), r.getDecimal(1)))
        .sortBy(_._1)
      val nCap = Similarity.quantizeWeights(
          Similarity.capUserDegree(urmW, cap))
        .groupBy(col("i")).agg(sum(col("w") * col("w")).as("n"))
        .collect().map(r => (r.getLong(0), r.getDecimal(1)))
        .sortBy(_._1)
      assert(nMulti.map(_._1).sameElements(nCap.map(_._1)) &&
             nMulti.zip(nCap).forall { case (a, b) =>
               a._2.compareTo(b._2) == 0 },
             s"weighted multi-cap norms differ at cap $cap")
    }
  }

  test("weighted engine: maxUserDegree routes through capUserDegree, " +
       "salted dots bit-identical, light profiles pass through") {
    val rnd = new scala.util.Random(51)
    // one heavy user (degree 30) over a 40-item universe + light tail;
    // weights vary per (u, i) so the capped subset actually changes
    // dots AND norms when it bites
    val heavy = (0 until 30).map(i => (100L, i.toLong,
      (rnd.nextInt(900) + 100) / 1000.0))
    val light = Seq((1L, 0L, 0.5), (1L, 1L, 0.25), (2L, 5L, 0.75),
                    (2L, 6L, 0.3), (3L, 1L, 0.9), (3L, 5L, 0.6))
    val urm = (heavy ++ light).toDF("u", "i", "w")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    // engine knob == uncapped engine on the pre-capped frame,
    // bit-identical (numerator and denominators see the same frame)
    val viaParam = Similarity.itemSimilarityWeighted(
        urm, Similarity.Cosine, maxUserDegree = 8)
      .collect().map(key).sortBy(identity)
    val viaPre = Similarity.itemSimilarityWeighted(
        Similarity.capUserDegree(urm, 8), Similarity.Cosine)
      .collect().map(key).sortBy(identity)
    assert(viaParam.nonEmpty && viaParam.sameElements(viaPre))
    // the cap must actually bite here (heavy user over-cap)
    val uncapped = Similarity.itemSimilarityWeighted(
        urm, Similarity.Cosine)
      .collect().map(key).sortBy(identity)
    assert(!uncapped.sameElements(viaParam),
      "fixture must exercise the cap (heavy profile over-cap)")
    // an all-light frame passes through bit-identically under the cap
    val lightUrm = light.toDF("u", "i", "w")
    val cappedLight = Similarity.itemSimilarityWeighted(
        lightUrm, Similarity.Cosine, maxUserDegree = 8)
      .collect().map(key).sortBy(identity)
    val plainLight = Similarity.itemSimilarityWeighted(
        lightUrm, Similarity.Cosine)
      .collect().map(key).sortBy(identity)
    assert(cappedLight.sameElements(plainLight))
    // salted weighted dots are EXACT decimals — two-phase sum
    // bit-identical to the one-phase form, capped or not
    val salted = Similarity.itemSimilarityWeighted(
        urm, Similarity.Cosine, saltWhenHeavy = 10L, maxUserDegree = 8)
      .collect().map(key).sortBy(identity)
    assert(salted.sameElements(viaParam))
    val saltedUncapped = Similarity.itemSimilarityWeighted(
        urm, Similarity.Cosine, saltWhenHeavy = 10L)
      .collect().map(key).sortBy(identity)
    assert(saltedUncapped.sameElements(uncapped))
  }

  test("zipfRekeyUsers: power-law degrees, keys in range, " +
       "partition-invariant") {
    import graft.operators.Skew
    // 6000 interactions over 600 items, rekeyed Zipf over 1000 users
    val base = (0 until 6000).map(k => (k.toLong, (k % 600).toLong))
      .toDF("u", "i")
    val z = Skew.zipfRekeyUsers(base, nUsers = 1000, seed = 3)
    val deg = z.groupBy("u").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg.keys.forall(u => u >= 1L && u <= 1000L))
    // s = 1 Zipf: expected degree of rank r is (T/ln N)/r; rank 1
    // holds ~T/ln(N) ≈ 870 before item-collision dedup — assert the
    // heavy head exists (well over 100x the median user)
    val d1 = deg.getOrElse(1L, 0L)
    val median = deg.values.toSeq.sorted.apply(deg.size / 2)
    assert(d1 > 300, s"rank-1 degree $d1 must be a heavy hitter")
    assert(d1 > 50 * median,
           s"power law: rank-1 $d1 vs median $median")
    // low ranks dominate: top-10 users hold ~H(10)/H(1000) ≈ 39% of
    // all interactions before item-collision dedup — assert > 1/4
    // (1% of users holding a quarter of the log is the skew regime)
    val top10 = deg.toSeq.sortBy(-_._2).take(10).map(_._2).sum
    assert(top10 * 4 > z.count(),
           s"top-10 share must exceed a quarter: $top10")
    // pure key function: partitioning must not change the output
    val a = z.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Skew.zipfRekeyUsers(base.repartition(13, col("i")),
        nUsers = 1000, seed = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
