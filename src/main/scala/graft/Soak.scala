package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve soak harness (VERDICT r8 next-round #1): times the
  * heaviest OPERATORS — unbounded, unlike their registered demo
  * queries, several of which carry constant bounds (q110's
  * doc_id < 400, q128's i < 500, q135's i < 1500) that exist to keep
  * the DuckDB oracle's cost constant across scale factors and would
  * make a scale measurement read as flat by construction. Where a
  * query needs a user slice, the slice is PROPORTIONAL
  * (pmod(u, 31) = 0) so it grows with the data.
  *
  * Run once per scale directory; the observed exponent per operator is
  * log(t_sfB/t_sfA)/log(B/A). Reps with cache/state clearing between
  * runs, median reported — the Bench methodology.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32 Soak
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_SOAK_ONLY").map(_.split(",").toSet)
    // SPARK_GRAFT_SOAK_NOBC=1: the auto-broadcast-off re-measure — the
    // r12 instrument that separates broadcast→shuffle PLAN FLIPS from
    // real super-scaling without reading a plan: under a uniform
    // all-shuffle plan a flip artifact's exponent collapses to ~1
    // while genuine quadratic growth survives
    val noBC = sys.env.get("SPARK_GRAFT_SOAK_NOBC").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (noBC)
      builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = core.Tables(spark, sfDir)
    import graft.similarity.Similarity
    import graft.recommend.Recommenders
    import graft.etl.Urm
    import graft.dedup.Dedup

    def urm: DataFrame = Urm.fromOrders(t)
    def simTop10: DataFrame = Similarity.topK(
      Similarity.itemSimilarity(urm, Similarity.Cosine), 10)
      .select(col("i"), col("j"), col("w"))
    // Zipf-degree URM for the skew tier: a deterministic 1/31
    // interaction slice rekeyed to power-law users over the full user
    // universe (see the zipf ops' comment below for the geometry)
    def zipfUrm: DataFrame = {
      val base = urm.select("u", "i")
      val nU = base.select(countDistinct(col("u"))).head.getLong(0)
      graft.operators.Skew.zipfRekeyUsers(
        base.filter(pmod(xxhash64(col("u"), col("i")), lit(31)) === 0),
        nU)
    }

    // Persisted standing-corpus LSH bucket frame for the incremental
    // near-dup op: in production this sketch state is computed when a
    // corpus version is ingested and STORED (the q163/q164 incremental-
    // sketch convention) — every refresh then does delta-sized probe
    // work. Building it here, once per scale dir and untimed, is that
    // ingest step; the timed op reads the parquet.
    // Cache key carries a CONTENT fingerprint (row count + max doc_id)
    // so regenerated data under the same scale dir gets a fresh sketch
    // (ADVICE r13: an existence-only check silently reused stale
    // state); floorMod, not abs — abs(Int.MinValue) is negative.
    // SPARK_GRAFT_SOAK_STANDING_FORCE=1 force-rebuilds regardless.
    val docStats = t.documents.agg(count(lit(1)).as("n"),
                                   max("doc_id").as("mx")).head
    val standingBucketsPath =
      s"/tmp/graft_soak_standing_${math.floorMod(sfDir.hashCode, 1 << 30)}" +
        s"_${docStats.getLong(0)}_${docStats.getLong(1)}"
    val standingForce =
      sys.env.get("SPARK_GRAFT_SOAK_STANDING_FORCE").contains("1")
    if (standingForce || !java.nio.file.Files.exists(
          java.nio.file.Paths.get(standingBucketsPath))) {
      val standToks = Dedup.docTokens(
        t.documents.select(col("doc_id"), col("text")),
        col("doc_id"), col("text"))
      Dedup.lshBuckets(Dedup.minhashSignatures(standToks, 6), 6, 2)
        .write.mode("overwrite").parquet(standingBucketsPath)
    }

    val ops: Seq[(String, () => Long)] = Seq(
      "cosine_topk" -> (() => simTop10.count()),
      "jaccard_topk" -> (() => Similarity.topK(
        Similarity.itemSimilarity(urm, Similarity.Jaccard), 10).count()),
      "euclidean_topk" -> (() => Similarity.topK(
        Similarity.itemSimilarity(
          urm, Similarity.Euclidean("lin", normalize = true,
                                    normalizeAvgRow = false)), 10)
        .count()),
      "p3alpha_topk" -> (() => Similarity.topK(
        Recommenders.p3alpha(urm, 1.0), 10).count()),
      "rp3beta_topk" -> (() => Similarity.topK(
        Recommenders.rp3beta(urm, 1.0, 1.0), 10).count()),
      // proportional user slice: scoring work grows with the data
      "itemknn_scores" -> (() => {
        val u = graft.core.CacheScope.persist(urm)
        val sim = Similarity.topK(
          Similarity.itemSimilarity(u, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w"))
        Recommenders.scoreBySimilarity(
          u.filter(pmod(col("u"), lit(31)) === 0), sim).count()
      }),
      "candidate_restriction" -> (() => {
        val u = graft.core.CacheScope.persist(urm)
        val sim = graft.core.CacheScope.persist(Similarity.topK(
          Similarity.itemSimilarity(u, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w")))
        val users = u.filter(pmod(col("u"), lit(31)) === 0)
          .select("u").distinct()
        val targets = sim.select(col("j").as("item")).distinct()
        val candidates = users.crossJoin(broadcast(targets))
          .filter((col("u") + col("item")) % 3 === 0)
        Recommenders.scoreBySimilarityRestricted(
          u.filter(pmod(col("u"), lit(31)) === 0), sim, candidates)
          .count()
      }),
      // the same restricted-scoring operator with a LINEAR candidate
      // input: ~100 hash-picked global targets × the proportional user
      // slice (the negative-item-ranking shape) — isolates the
      // operator's own exponent from the q78 demo's predicate set,
      // whose user×catalog grid grows quadratically with sf
      "candidate_restriction_lin" -> (() => {
        val u = graft.core.CacheScope.persist(urm)
        val sim = graft.core.CacheScope.persist(Similarity.topK(
          Similarity.itemSimilarity(u, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w")))
        val users = u.filter(pmod(col("u"), lit(31)) === 0)
          .select("u").distinct()
        val targetsAll = sim.select(col("j").as("item")).distinct()
        val nTargets = math.max(1L, targetsAll.count() / 100L)
        val targets = targetsAll.filter(
          pmod(xxhash64(col("item")), lit(nTargets)) === 0)
        val candidates = users.crossJoin(broadcast(targets))
        Recommenders.scoreBySimilarityRestricted(
          u.filter(pmod(col("u"), lit(31)) === 0), sim, candidates)
          .count()
      }),
      // ZIPF-DEGREE TIER (VERDICT r12 next #1): every exponent above
      // was measured at ScaleSynth's CONSTANT per-user degree, but the
      // pair engine's per-user fan-out is quadratic in degree and real
      // interaction logs are power-law. zipfUrm rekeys a deterministic
      // 1/31 interaction slice to Zipf(s=1) users over the FULL user
      // universe — total interactions grow with sf AND the max degree
      // grows with sf (T/H(N): ~500 at sf0.1 → ~12k at sf3), the shape
      // AQE's skew split cannot fix (it rebalances pair rows, it
      // cannot shrink the pair COUNT). The uncapped op documents the
      // super-linear wall (expected records exponent ≈ 2: Σdᵣ² =
      // (T/H)²·π²/6); the capped ops run the production posture
      // (capUserDegree 64) whose fan-out is bounded by 64·|URM| —
      // linear. The 1/31 thinning keeps the uncapped op finishable at
      // sf3 (≈2.5·10⁸ pair rows) without changing either exponent.
      "cosine_topk_zipf_uncapped" -> (() => {
        val z = graft.core.CacheScope.persist(zipfUrm)
        Similarity.topK(
          Similarity.itemSimilarity(z, Similarity.Cosine), 10).count()
      }),
      "cosine_topk_zipf_capped" -> (() => {
        val z = graft.core.CacheScope.persist(zipfUrm)
        Similarity.topK(
          Similarity.itemSimilarity(z, Similarity.Cosine,
                                    maxUserDegree = 64), 10).count()
      }),
      "jaccard_topk_zipf_capped" -> (() => {
        val z = graft.core.CacheScope.persist(zipfUrm)
        Similarity.topK(
          Similarity.itemSimilarity(z, Similarity.Jaccard,
                                    maxUserDegree = 64), 10).count()
      }),
      // itemknn scoring on the Zipf URM at the capped posture: the
      // score join fans out per-user (profile × neighbors), so heavy
      // profiles hit it too — the cap bounds both stages
      "itemknn_scores_zipf_capped" -> (() => {
        val z = graft.core.CacheScope.persist(zipfUrm)
        val capped = graft.core.CacheScope.persist(
          Similarity.capUserDegree(z, 64))
        val sim = Similarity.topK(
          Similarity.itemSimilarity(capped, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w"))
        Recommenders.scoreBySimilarity(
          capped.filter(pmod(col("u"), lit(7)) === 0), sim).count()
      }),
      // dedup-chain skew analog: duplicate-CLUSTER size growing with
      // the corpus (1/11 of all docs collapse to ONE boilerplate text
      // — the exact-dup mega-cluster a crawl's error pages form). The
      // bounded chain must stay linear: exact dups route through the
      // hash aggregate + star edges (O(members)), never the LSH pair
      // fan-out; the mega-bucket is over-cap and dropped by the
      // bounded LSH stage by design
      "dedup_megacluster" -> (() => {
        val planted = t.documents.select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
               lit("standard error page please try again later"))
            .otherwise(col("text")).as("text"))
        Dedup.fuzzyDedupBounded(planted, col("doc_id"), col("text"),
            jaccardThreshold = 0.97, maxBucketSize = 1000)
          .agg(count(lit(1)).as("n"), sum(col("keep")).as("k"))
          .select((col("n") + col("k")).cast("long")).head.getLong(0)
      }),
      // full item co-occurrence graph, 5 fixed-point iterations
      "pagerank_full" -> (() => {
        val edges = Similarity.pairDots(urm)
          .select(col("i").as("src"), col("j").as("dst"))
        graft.graph.PageRank.fixedPoint(edges, iters = 5).count()
      }),
      // full-corpus fuzzy dedup chain (no doc_id bound, no planted dups)
      "dedup_e2e_full" -> (() => {
        val corpus = graft.core.CacheScope.persist(
          t.documents.select(col("doc_id"), col("source"), col("text")))
        val dt = graft.core.CacheScope.persist(
          Dedup.docTokens(corpus, col("doc_id"), col("text")))
        val sigs = Dedup.minhashSignatures(dt, 6)
        // maxBucketSize = 0: the EXPLICIT unbounded opt-in (the default
        // flipped to capped in r12) — this op deliberately measures the
        // uncapped chain's broadcast-dependent super-linearity
        val cand = Dedup.lshCandidatePairs(sigs, 6, 2, maxBucketSize = 0)
        val dup = Dedup.jaccardForPairs(cand, dt)
          .filter(col("jaccard") >= 0.97)
        val cc = Dedup.connectedComponents(dup.select("a", "b"))
          .withColumnRenamed("node", "doc_id")
        corpus.join(cc, Seq("doc_id"), "left")
          .withColumn("keep",
            (col("cluster").isNull ||
             col("cluster") === col("doc_id")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
          .count()
      }),
      // the production AT-SCALE posture of the same chain (the
      // lshCandidatePairs scaladoc's own doctrine, promoted to a
      // measured op by the r11 sf3 finding): the uncapped op above is
      // linear only while the bucket self-join broadcasts — its join
      // output stays clustered by doc_id, so the pair distinct needs
      // NO exchange — and flips to shuffling the FULL pair fan-out
      // once the build side outgrows broadcast range (sf3: 486M pair
      // rows, local record exponent ~3). At 100 TB the bucket frame
      // is never broadcastable, so the true at-scale shape must BOUND
      // the per-bucket fan-out: cap giant buckets (boilerplate
      // collisions — here the synthetic corpus's tiny vocabulary) and
      // route their members through the linear exact-dup grouping,
      // accepting the documented near-dup recall trade on degenerate
      // groups. Candidate pairs per bucket are then ≤ cap², linear in
      // bucket count hence in corpus.
      "dedup_e2e_capped" -> (() =>
        // since r12 this is the PRODUCTION operator itself
        // (Dedup.fuzzyDedupBounded, gated by q186) — the soak measures
        // the exact composition users call, not a hand-assembled twin
        Dedup.fuzzyDedupBounded(
            t.documents.select(col("doc_id"), col("source"), col("text")),
            col("doc_id"), col("text"),
            jaccardThreshold = 0.97, maxBucketSize = 1000)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
          .count()),
      // Incremental NEAR-dup refresh at the production posture: a
      // FIXED 70-doc delta (50 changed + 20 paraphrase adds — copy-0
      // ids exist at every sf) against a standing corpus that GROWS
      // with sf, probing the PERSISTED standing bucket frame (written
      // once per corpus, untimed, by the warmup below — the
      // sketch-persistence convention). The timed work should be the
      // snapshot-diff scan + delta-sized signature/probe/verify: the
      // curve's slope is the corpus-scan floor, NOT the full dedup
      // chain's (compare dedup_e2e_capped at the same sf)
      "incremental_neardup_refresh" -> (() => {
        val old = t.documents.select(col("doc_id"), col("text"))
        val toksC = split(col("text"), "\\s+")
        val changed = old.filter(col("doc_id") < 50)
          .withColumn("text", concat(col("text"), lit(" refreshed")))
        val adds = old.filter(col("doc_id") >= 50 && col("doc_id") < 70)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            array_join(slice(toksC, lit(1),
              greatest(size(toksC) - 3, lit(1))), " ").as("text"))
        val newer = old.filter(col("doc_id") >= 50)
          .unionByName(changed).unionByName(adds)
        val standFrame = spark.read.parquet(standingBucketsPath)
        Dedup.incrementalDedupNear(old, newer, col("doc_id"),
            col("text"), jaccardThreshold = 0.8,
            standingBuckets = Some(standFrame))
          .agg(sum(col("keep")).as("k"), count(lit(1)).as("n"))
          .select((col("k") + col("n")).cast("long")).head.getLong(0)
      }),
      // The CLOSED refresh loop (r14): the same fixed-delta refresh
      // PLUS advanceStandingBuckets producing the next standing frame
      // (counted to force it). The advance's increment over the probe
      // op is two map-side joins against broadcastable delta-sized
      // key sets and a re-cap window over delta-TOUCHED bucket rows
      // only — the curve must track incremental_neardup_refresh's
      // corpus-scan floor, nowhere near a rebuild's (dedup_e2e_capped)
      "standing_advance_refresh" -> (() => {
        val old = t.documents.select(col("doc_id"), col("text"))
        val toksC = split(col("text"), "\\s+")
        val changed = old.filter(col("doc_id") < 50)
          .withColumn("text", concat(col("text"), lit(" refreshed")))
        val adds = old.filter(col("doc_id") >= 50 && col("doc_id") < 70)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            array_join(slice(toksC, lit(1),
              greatest(size(toksC) - 3, lit(1))), " ").as("text"))
        val newer = old.filter(col("doc_id") >= 50)
          .unionByName(changed).unionByName(adds)
        val standFrame = spark.read.parquet(standingBucketsPath)
        val st = Dedup.incrementalDedupNearState(old, newer,
          col("doc_id"), col("text"), jaccardThreshold = 0.8,
          standingBuckets = Some(standFrame))
        val rep = graft.core.CacheScope.persistCut(st.report)
        val removed = Dedup.snapshotDiff(old, newer, col("doc_id"),
            col("text")).filter(col("status") === "removed")
          .select("doc_id")
        Dedup.advanceStandingBuckets(standFrame, rep, st.deltaBuckets,
            Some(removed)).count() + rep.count()
      }),
      // BM25 retrieval with a FIXED 20-query batch — the serving
      // shape (like ADC's bounded-batch contract): per-query cost is
      // the posting lists its terms touch, which grow linearly with
      // the corpus under this synthetic fixed vocabulary. A
      // proportional query slice would multiply that by the query
      // axis and read quadratic BY CONSTRUCTION of the tiny vocab
      // (every doc shares terms with every query), which is a corpus
      // artifact, not the operator's shape
      "bm25_search" -> (() => {
        val corpus = t.documents.select(col("doc_id"), col("text"))
        val queries = graft.text.TextOps.prefixQueries(
          corpus.filter(col("doc_id") < 20),
          col("doc_id"), col("text"), nTokens = 5)
        graft.text.TextOps.searchBm25(corpus, col("doc_id"),
            col("text"), queries, col("qid"), col("qtext"), k = 5)
          .count()
      }),
      // exact-substring span removal over the full corpus: window
      // fingerprints are corpus-token rows through one hash groupBy;
      // cross-copy windows are DISJOINT under ScaleSynth's per-copy
      // token prefixes, so the measured duplicate rate stays the
      // source corpus's own rate and the curve measures scale, not a
      // synthetic dup regime (same argument as the dedup chain above)
      // NOT .count(): a count-only plan prunes the final left join's
      // aggregate right side and the text rebuild (measured: 0 shuffle
      // records, flat wall at every sf) — aggregate over BOTH output
      // columns so the window fingerprints, the covered-position
      // union, and the clean-text rebuild all execute
      "span_removal" -> (() =>
        Dedup.removeRepeatedSpans(
            t.documents.select(col("doc_id"), col("text")),
            col("doc_id"), col("text"), spanTokens = 10)
          .agg(sum(col("n_removed")).as("r"),
               sum(length(col("clean_text"))).as("l"))
          .select((col("r") + col("l")).cast("long"))
          .head.getLong(0)),
      // exact set-similarity join over 3-shingle sets at tau = 0.8:
      // prefix filtering needs the spread df distribution shingles
      // give; ScaleSynth's per-copy token prefixes keep cross-copy
      // shingle sets disjoint, so candidates stay within copies and
      // the curve measures scale at the source corpus's own dup rate
      "set_sim_join" -> (() => {
        val sh = Dedup.shingles(
          t.documents.select(col("doc_id"), col("text")),
          col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        Dedup.setSimJoin(sh, 0.8, distinctInput = true).count()
      }),
      // paragraph dedup over the full corpus with q198's planting
      // (two 10-token slices + a global boilerplate paragraph): the
      // paragraph-TYPE frame grows with the corpus, so this measures
      // the three key-partitioned shuffles (explode → first-occurrence
      // aggregate → join-back → doc regroup) — NOT .count(): a
      // count-only plan would prune the reassembly; aggregate over the
      // rebuilt text length so the full pipeline executes
      "paragraph_dedup" -> (() => {
        val toks = split(lower(col("text")), "\\s+")
        val planted = t.documents.select(col("doc_id"),
          concat_ws("\n\n",
            array_join(slice(toks, 1, 10), " "),
            lit("subscribe to our newsletter today"),
            array_join(slice(toks, 11, 10), " ")).as("text"))
        Dedup.paragraphDedup(planted, col("doc_id"), col("text"))
          .agg(sum(length(col("text"))).as("l"),
               sum(col("n_paras_kept")).as("k"))
          .select((col("l") + col("k")).cast("long")).head.getLong(0)
      }),
      // cross-corpus KN perplexity: LM towers on the even-id half,
      // every doc scored — both axes (bigram types, target bigrams)
      // grow with the corpus, so the curve measures the count-tower
      // shuffle plus the three key-partitioned left joins
      "kn_perplexity" -> (() =>
        graft.text.TextOps.knPerplexityFilter(
            t.documents.filter(col("doc_id") % 2 === 0),
            col("doc_id"), col("text"),
            t.documents, col("doc_id"), col("text"))
          // fingerprint sums EXACT decimals of the (deterministic)
          // per-doc sum_logp — a cross-doc double sum is partition-
          // order-dependent and could flap the checksum between reps
          .agg(sum(round(col("sum_logp"), 6).cast("decimal(28,6)"))
                 .cast("long").as("s"))
          .head.getLong(0)),
      // water-filling budget plan: one corpus-scan aggregate + a
      // #domains-row window (domain grid is copy-invariant — lang and
      // source carry verbatim across ScaleSynth copies), so the data
      // term is the scan and the plan frame stays constant-size
      "token_budget_plan" -> (() =>
        graft.stats.Stats.tokenBudgetPlan(
          t.documents.select(
            concat(col("lang"), lit("/"), col("source")).as("d"),
            size(split(col("text"), "\\s+")).as("ntok")),
          col("d"), col("ntok"),
          budgetTokens = 4.0e6, invTemperature = 0.5,
          maxEpochs = 2.0).count()),
      // ANN baseline vs scale path at the same recall task (queries =
      // proportional 5% slice): brute force is the quadratic-input
      // baseline (pairs grow ×(sf)²); IVF-PQ is what actually ships at
      // 100 TB — cells prune the candidate set, 8-byte codes price the
      // distances
      "ann_brute_topk" -> (() => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val queries = emb.filter(col("id") % 20 === 0)
        graft.ann.Ann.bruteForceCosineTopK(queries, emb, 5).count()
      }),
      // the residual (IVFADC) formulation with one Lloyd iteration —
      // same candidate-join shape as ann_ivf_pq plus the bounded
      // codebook-training pass and the per-(query, probed-cell) LUT
      "ann_ivf_pq_residual" -> (() => {
        val emb = graft.core.CacheScope.persist(
          t.embeddings.select(col("vec_id").as("id"), col("embedding")))
        val queries = emb.filter(col("id") % 20 === 0)
        val nCells = graft.ann.Ann.ivfAutoCells(emb)
        val cents = graft.ann.Ann.ivfCentroids(emb, nCells)
        // broadcastLut = false: queries here are a PROPORTIONAL 5%
        // corpus slice, so the LUT (|queries|·nProbe·m·nCodes ≈ 12.8
        // rows per corpus row) grows linearly with sf — broadcasting it
        // would contradict the operator's bounded-batch broadcast
        // contract and turn the soak curve into a broadcast-cost
        // measurement (ADVICE r11). The broadcast default is exercised
        // by the fixed-batch op below, the serving shape it exists for.
        graft.ann.Ann.ivfPqResidualTopK(queries, emb, cents,
            nProbe = 2, m = 8, subDim = 8, nCodes = 16, k = 3,
            lloydIters = 1, broadcastLut = false)
          .count()
      }),
      // the SAME residual operator at the SERVING shape: a FIXED
      // 20-query batch (the q185 bm25_search convention), so the
      // record/byte exponent measures the operator's corpus-side cost
      // — per-query candidates ∝ nProbe·N/√N = √N plus the linear cell
      // assignment scan — not the |q|·2√N ∝ N^1.5 geometry the
      // proportional-slice op above documents around (VERDICT r11
      // next #4). Fixed batch ⇒ the LUT is bounded and the default
      // broadcast is the correct production posture here.
      "ann_ivf_pq_residual_batch" -> (() => {
        val emb = graft.core.CacheScope.persist(
          t.embeddings.select(col("vec_id").as("id"), col("embedding")))
        // ids < 20 live in ScaleSynth copy 0 at every sf — the batch is
        // literally the same 20 vectors at every scale point
        val queries = emb.filter(col("id") < 20)
        val nCells = graft.ann.Ann.ivfAutoCells(emb)
        val cents = graft.ann.Ann.ivfCentroids(emb, nCells)
        graft.ann.Ann.ivfPqResidualTopK(queries, emb, cents,
            nProbe = 2, m = 8, subDim = 8, nCodes = 16, k = 3,
            lloydIters = 1)
          .count()
      }),
      "ann_ivf_pq" -> (() => {
        val emb = graft.core.CacheScope.persist(
          t.embeddings.select(col("vec_id").as("id"), col("embedding")))
        val queries = emb.filter(col("id") % 20 === 0)
        // cells scale with √N via the PRODUCTION default
        // (Ann.ivfAutoCells — the standard IVF sizing rule) so the
        // per-query candidate set stays ~√N — holding nCells constant
        // while the corpus grows would grow candidates linearly per
        // query and the measurement would read quadratic by sizing,
        // not by plan
        val nCells = graft.ann.Ann.ivfAutoCells(emb)
        val cents = graft.ann.Ann.ivfCentroids(emb, nCells)
        val books = graft.ann.Ann.pqCodebooks(emb, m = 8, subDim = 8,
                                              nCodes = 16)
        val codes = graft.ann.Ann.pqEncode(emb, books, m = 8, subDim = 8)
        // broadcastLut = false for the same proportional-slice reason
        // as ann_ivf_pq_residual above (ADVICE r11)
        graft.ann.Ann.ivfPqTopK(queries, emb, cents, codes, books,
                                nProbe = 2, m = 8, subDim = 8, k = 3,
                                broadcastLut = false)
          .count()
      }),
      // scan-speed text filters over the full corpus
      "text_quality_scan" -> (() =>
        graft.text.TextOps.qualityFeatures(t.documents, col("text"))
          .count()),
      // one searched-shape KNN trial on a proportional slice
      "knn_trial" -> (() => {
        val slice = urm.filter(pmod(col("u"), lit(31)) === 0)
        val split = Urm.userWiseHoldout(slice, 0.8, seed = 11)
        val train = graft.core.CacheScope.persist(
          split.filter(col("split") === "train").select("u", "i"))
        val valid = split.filter(col("split") === "test").select("u", "i")
        val space = graft.tuning.Spaces.itemKnn("cosine")
        val p = space.decode(space.keys.map(_ -> 0.5).toMap)
        val m = graft.tuning.Spaces
          .evaluator("item_knn_cosine", spark, train, valid, 10)(p)
        if (m >= 0.0) 1L else 0L
      }),
      // lifecycle tier (the q168 shape, proportional): per-epoch
      // validation monitors × full evaluations, search → capture →
      // retrain on train∪validation → 3-cutoff test — on a 1/3 user
      // stratum so the whole mechanism's cost scales with the data
      // (q168's own slice, unbounded items)
      "lifecycle_earlystop" -> (() => {
        import graft.tuning.{Lifecycle, Spaces}
        val urmS = graft.core.CacheScope.persist(
          urm.select("u", "i").filter(pmod(col("u"), lit(3)) === 0))
        val mark1 = pmod(col("u") * 31 + col("i"), lit(10)) < 8
        val mark2 = pmod(col("u") * 17 + col("i"), lit(10)) < 7
        val train = graft.core.CacheScope.persist(
          urmS.filter(mark1 && mark2))
        val valid = graft.core.CacheScope.persist(
          urmS.filter(mark1 && !mark2))
        val test = urmS.filter(!mark1)
        def popRecs(tr: DataFrame, e: Int, cutoff: Int): DataFrame =
          Recommenders.recommendGlobal(
            Recommenders.topPop(
                tr.filter(pmod(col("u") * 7 + col("i"), lit(3)) < e))
              .select(col("i").as("item"),
                      col("pop").cast("double").as("score")),
            tr, cutoff)
        val res = Lifecycle.searchThenFinalTestAdjusted(
          "top_pop_incremental", Spaces.topPop, train, valid, test,
          trial = (tr, p, c) => {
            val byEpoch = (1 to 3).map(e =>
              e -> Spaces.mapAt(popRecs(tr, e, c), valid, c))
            val (bestE, bestM) = byEpoch.maxBy { case (e, m) => (m, -e) }
            (bestM, p + ("epochs" -> Spaces.PNum(bestE)))
          },
          finalFit = (tr, p, c) => {
            val e = p("epochs") match {
              case Spaces.PNum(v) => v.toInt; case _ => 1 }
            popRecs(tr, e, c)
          })
        res.testMetrics.count()
      }),
      // sequence packing over the full corpus: the global token cumsum
      // routes through the two-pass range-partitioned prefix sum
      // (parallel windows + broadcast offsets) — the "windowless
      // two-pass cumsum" scale claim, measured
      "sequence_packing" -> (() =>
        graft.text.TextOps.packSequences(
          t.documents, col("doc_id"), col("text"), budget = 2048L)
          .count()),
      // bloom-pruned semi-join: full lineitem probe against a ~2%
      // orders build — the scan-side codegen'd might_contain prune
      // whose payoff is exactly the shuffle bytes it avoids
      "bloom_semijoin" -> (() => {
        val probe = t.lineitem.select(col("l_orderkey"))
        val build = t.orders
          .filter(pmod(col("o_orderkey"), lit(50)) === 0)
          .select("o_orderkey")
        graft.operators.JoinPrune.bloomSemiJoin(
          probe, build, "l_orderkey", "o_orderkey",
          expectedItems = 0L).count()
      }),
      // streaming tier: the file-source events stream driven through
      // the NATIVE session-window aggregation (the production
      // continuous-sessionization path) to a memory sink — state is
      // watermark-bounded; work scales with the events axis.
      // NOTE (relative-scaling caveat): Append mode emits a session
      // only once the watermark passes it, so sessions newer than the
      // 2h watermark at end-of-input are never finalized and the
      // counted output excludes the tail of the event timeline at
      // every scale point alike — fine for the exponent this tier
      // measures; feed a terminal late event if absolute counts ever
      // gate anything
      "streaming_sessions" -> (() => {
        val ev = graft.streaming.EventStreams.readEventStream(spark, sfDir)
        val agg = graft.streaming.EventStreams.sessionWindowAgg(
          ev, "user_id", "ts", "value", gap = "30 minutes",
          watermark = Some("2 hours"))
        val name = "soak_sessions_" + math.abs(sfDir.hashCode).toString
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .start()
        q.processAllAvailable(); q.stop()
        val n = spark.table(name).count()
        spark.catalog.dropTempView(name)
        n
      }),
      // model tier: one distributed MF-BPR epoch with the reference's
      // samples-per-epoch = |URM| rule, so the sampled work grows with
      // the data — the partition-invariant md5 draws + gradient
      // group-aggregate are the scalable SGD path the searches ship
      "mfbpr_epoch" -> (() => {
        val u = graft.core.CacheScope.persist(urm.select("u", "i"))
        // clamp: a URM beyond Int.MaxValue interactions must not wrap
        // the sample count negative (a "fast" epoch sampling nothing
        // would fake a scale point)
        val n = math.min(u.count(), Int.MaxValue.toLong).toInt
        val (userF, _) = graft.recommend.Models.mfBprDistributed(
          spark, u, rank = 8, epochs = 1,
          samplesPerEpoch = n, lr = 0.05, reg = 1e-4, seed = 7)
        userF.count()
      }),
      // production IALS path: ml.ALS implicit fit (3 alternations,
      // rank 8) over the full URM — the block-partitioned solve whose
      // data movement should scale with the interaction axis
      "ials_fit" -> (() => {
        // SPARK_GRAFT_IALS_BLOCKS drives the §6.z′ numBlocks
        // sensitivity sweep without a bespoke main (default = ALS's 10)
        val (userF, _) = graft.recommend.Models.ials(
          urm, rank = 8, reg = 0.1, alpha = 5.0, iters = 3, seed = 7,
          numBlocks =
            sys.env.getOrElse("SPARK_GRAFT_IALS_BLOCKS", "10").toInt)
        userF.count()
      }),
      // ZIPF MODEL/EVAL TIER (VERDICT r13 next #3): the similarity/
      // dedup tier got its power-law axis in r13; the fits and the
      // evaluator were still soaked at constant degree only. ALS block
      // replication, BPR's per-sample user lookups, and the
      // evaluator's per-user remove-seen fan-out are all
      // degree-sensitive — and the CW10M log the reference trains on
      // is power-law. Same zipfUrm geometry as the similarity tier.
      "weighted_cosine_topk_zipf_capped" -> (() => {
        // the r14 cap plumbing for the WEIGHTED engine (the one
        // measured-quadratic path left after r13): TF-IDF weights on
        // the full Zipf frame, capped pair engine underneath
        val z = graft.core.CacheScope.persist(zipfUrm)
        Similarity.topK(
          Similarity.itemSimilarityWeighted(
            graft.similarity.Weighting.tfidf(z.withColumn("v", lit(1.0))),
            Similarity.Cosine, maxUserDegree = 64), 10).count()
      }),
      "mfbpr_epoch_zipf" -> (() => {
        val u = graft.core.CacheScope.persist(zipfUrm)
        val n = math.min(u.count(), Int.MaxValue.toLong).toInt
        val (userF, _) = graft.recommend.Models.mfBprDistributed(
          spark, u, rank = 8, epochs = 1,
          samplesPerEpoch = n, lr = 0.05, reg = 1e-4, seed = 7)
        userF.count()
      }),
      "ials_mlfit_zipf" -> (() => {
        val (userF, _) = graft.recommend.Models.ials(
          zipfUrm.withColumn("v", lit(1.0)), rank = 8, reg = 0.1,
          alpha = 5.0, iters = 3, seed = 7,
          numBlocks =
            sys.env.getOrElse("SPARK_GRAFT_IALS_BLOCKS", "10").toInt)
        userF.count()
      }),
      // the same fit with item ids hash-folded into int range UP
      // FRONT: at sf3 ScaleSynth's copy-offset ids exceed int and
      // ials pays the in-fit densify tax (denseRemapUi + one
      // discarded early stage) — this variant isolates it away so the
      // sf1→sf3 local exponent reads the FIT's own scaling. Collision
      // odds ~|I|²/2³¹ merge a handful of items — a measurement
      // instrument, not production semantics (production keeps the
      // exact densify path)
      "ials_mlfit_zipf_dense" -> (() => {
        val z = zipfUrm.select(col("u"),
            pmod(xxhash64(col("i")), lit(2147483647L)).as("i"))
          .withColumn("v", lit(1.0))
        val (userF, _) = graft.recommend.Models.ials(
          z, rank = 8, reg = 0.1, alpha = 5.0, iters = 3, seed = 7,
          numBlocks =
            sys.env.getOrElse("SPARK_GRAFT_IALS_BLOCKS", "10").toInt)
        userF.count()
      }),
      // evaluator fan-out on power-law degree: global recommender
      // (position-space remove-seen — each user's blocked set grows
      // with their degree) + hit table + per-user metric windows
      "eval_accuracy_zipf" -> (() => {
        val z = graft.core.CacheScope.persist(zipfUrm)
        val split = Urm.hashSplit(z, 8, 10)
        val train = graft.core.CacheScope.persist(
          split.filter(col("split") === "train").select("u", "i"))
        val test = split.filter(col("split") === "test").select("u", "i")
        val recs = Recommenders.recommendGlobal(
          Recommenders.topPop(train)
            .select(col("i").as("item"),
                    col("pop").cast("double").as("score")),
          train, 10)
        graft.eval.Evaluation.accuracyMetrics(
          graft.eval.Evaluation.hitTable(recs, test), 10).count()
      })
    )

    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      var tries = 0
      while (spark.sparkContext.getRDDStorageInfo.nonEmpty && tries < 20) {
        Thread.sleep(100); tries += 1
      }
      System.gc()
    }
    def loadavg(): Double = core.BenchUtil.loadavg()

    // warm the join/codegen paths once, untimed (Bench convention)
    try {
      Similarity.pairDots(urm).filter(col("dot") >= 3).count()
    } catch { case _: Throwable => () }

    // Shuffle-byte accounting: wall-clock on this box drifts ±2×, but
    // bytes moved are deterministic — the data-movement exponent is
    // the harder evidence that a plan scales. Stage metrics accumulate
    // via listener; drained with a short settle before each snapshot
    // (the listener bus is async).
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            // RECORDS are the compression-independent movement signal:
            // byte exponents inflate ~10-20% at larger synthesized sf
            // because copy-offset ids (n·10^8) have more entropy and
            // compress worse, while the record count is exactly the
            // rows a plan moves
            shufRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      })

    // Per-rep idle gate (VERDICT r10 what's-missing #3): wall medians
    // only count as evidence when the box was actually quiet during
    // the rep. 1-min loadavg is useless for that mid-soak — it decays
    // from the soak's OWN finished reps (sf1 reps used to start at
    // load 17-29 with nothing running) — so the gate reads
    // /proc/stat jiffies minus this JVM's own (BenchUtil.extBusyFrac)
    // and waits (bounded) until external CPU falls under the
    // threshold. Both instruments are recorded PER REP in the
    // artifact so every wall number is mechanically attributable.
    val extBusyGate = sys.env.getOrElse("SPARK_GRAFT_SOAK_EXT_BUSY",
                                        "0.05").toDouble
    // hypervisor-steal gate (r12: the host withheld 27-51% of a core
    // for hours while BOTH in-VM instruments read idle — the one
    // contamination channel they cannot see); threshold is a fraction
    // of one core
    val stealGate = sys.env.getOrElse("SPARK_GRAFT_SOAK_STEAL",
                                      "0.10").toDouble
    val gateDeadlineSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_GATE_SEC",
                                            "60").toInt
    def gateRep(): (Double, Double, Double) = {
      var eb = core.BenchUtil.extBusyFrac(1000)
      var st = core.BenchUtil.stealCoreFrac(1000)
      val deadline = System.nanoTime() + gateDeadlineSec * 1000L * 1000 * 1000
      while (((eb >= 0 && eb > extBusyGate) ||
              (st >= 0 && st > stealGate)) &&
             System.nanoTime() < deadline) {
        Thread.sleep(2000)
        eb = core.BenchUtil.extBusyFrac(1000)
        st = core.BenchUtil.stealCoreFrac(1000)
      }
      (loadavg(), eb, st)
    }
    val runs = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val load = scala.collection.mutable.LinkedHashMap[String, Double]()
    val loadPerRep =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val extBusyPerRep =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // steal_probe: the 1s gate sample before the rep started; steal
    // _during: jiffy delta across the rep itself ÷ elapsed — the rep's
    // own host-contamination attribution at zero wall cost
    val stealProbePerRep =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val stealDuringPerRep =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val shuffleKrec = scala.collection.mutable.LinkedHashMap[String, Double]()
    ops.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, body) =>
        load(name) = loadavg()
        Thread.sleep(500) // settle the async listener bus
        shufRead.set(0L); shufWrite.set(0L); shufRecs.set(0L)
        val repLoads = scala.collection.mutable.ArrayBuffer[Double]()
        val repBusy = scala.collection.mutable.ArrayBuffer[Double]()
        val repStealProbe = scala.collection.mutable.ArrayBuffer[Double]()
        val repStealDuring = scala.collection.mutable.ArrayBuffer[Double]()
        val ts = (0 until reps).map { _ =>
          clearState()
          val (la, eb, st) = gateRep()
          repLoads += la; repBusy += eb; repStealProbe += st
          val sj0 = core.BenchUtil.stealJiffies()
          val t0 = System.nanoTime()
          // a FAILED rep records −1, not its elapsed time: the JSON is
          // transcribed into SURVEY scale tables, and a throwing op
          // timed to its crash would masquerade as a fast success
          val ok =
            try { graft.core.CacheScope.scoped { body() }; true }
            catch { case e: Throwable =>
              System.err.println(s"$name failed: $e"); false }
          val el = (System.nanoTime() - t0) / 1e9
          repStealDuring += core.BenchUtil.stealCoreFracOver(
            sj0, core.BenchUtil.stealJiffies(), el)
          if (ok) el else -1.0
        }
        runs(name) = ts
        loadPerRep(name) = repLoads.toSeq
        extBusyPerRep(name) = repBusy.toSeq
        stealProbePerRep(name) = repStealProbe.toSeq
        stealDuringPerRep(name) = repStealDuring.toSeq
        medians(name) =
          if (ts.contains(-1.0)) -1.0 else core.BenchUtil.median(ts)
        Thread.sleep(500) // settle before the snapshot
        // write bytes ≈ read bytes for completed exchanges; report the
        // PER-REP average of read+write so rep count drops out. The
        // failure convention matches the median's: any failed rep
        // poisons the figure to −1 (a partial-crash byte count divided
        // by the full rep count would understate the real movement and
        // read as a normal success next to the −1 median).
        shuffleMb(name) =
          if (ts.contains(-1.0)) -1.0
          else math.round(
            (shufRead.get + shufWrite.get) / (1024.0 * 1024.0) /
              math.max(1, reps) * 10.0) / 10.0
        shuffleKrec(name) =
          if (ts.contains(-1.0)) -1.0
          else math.round(
            shufRecs.get / 1000.0 / math.max(1, reps) * 10.0) / 10.0
        System.err.println(
          s"$name: median ${medians(name)}s runs ${ts.mkString(",")} " +
            s"shuffleMB/rep ${shuffleMb(name)} " +
            s"shuffleKrec/rep ${shuffleKrec(name)}")
      }
    def jmap(m: scala.collection.Map[String, Double]): String =
      core.BenchUtil.jmapRounded(m)
    def jarr(m: scala.collection.Map[String, Seq[Double]]): String =
      m.map { case (k, v) =>
        "\"" + k + "\":[" +
          v.map(x => math.round(x * 1000) / 1000.0).mkString(",") + "]" }
        .mkString("{", ",", "}")
    val runsJson = jarr(runs)
    val line =
      s"""{"sf":"$sfDir","medians":${jmap(medians)},"runs":$runsJson,"shuffle_mb_per_rep":${jmap(shuffleMb)},"shuffle_krec_per_rep":${jmap(shuffleKrec)},"load_at_start":${jmap(load)},"load_per_rep":${jarr(loadPerRep)},"ext_busy_per_rep":${jarr(extBusyPerRep)},"steal_probe_per_rep":${jarr(stealProbePerRep)},"steal_during_per_rep":${jarr(stealDuringPerRep)}}"""
    println(line)
    // committed artifact (the BENCH_r{N}.json convention, VERDICT r9
    // #2): append one JSON line per soaked scale factor so a round's
    // multi-point curve accumulates into ONE parseable file instead of
    // println transcription into SURVEY prose
    sys.env.get("SPARK_GRAFT_SOAK_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    spark.stop()
  }
}
