package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines: exact hashing,
  * MinHash + LSH banding, SimHash, and n-gram Jaccard.
  *
  * All hashing routes through md5 so signatures are engine-independent
  * (verifiable against an external SQL oracle) and stable across runs —
  * a requirement when dedup decisions must be reproducible over a
  * 100 TB corpus processed incrementally.
  *
  * Scale shape: every operator is explode → hash → groupBy — partitioned
  * by document or by band bucket, never all-pairs. Candidate generation
  * (LSH bands, SimHash buckets) bounds the quadratic verification join
  * to within-bucket pairs.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text md5: groups with >1 member,
    * keeping the smallest doc id as canonical. */
  def exactDupGroups(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    docs.select(id.as("doc_id"), md5(norm).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n"), min("doc_id").as("canonical"))
      .filter(col("n") > 1)
  }

  /** Distinct (doc_id, token) pairs — the set representation used by
    * MinHash and Jaccard. */
  def docTokens(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
                explode(split(lower(text), "\\s+")).as("tok"))
      .distinct()

  /** MinHash signatures: k permutations simulated by seed-prefixed md5;
    * the signature component is the lexicographic minimum digest.
    * Returns doc_id plus columns mh_0 … mh_{k−1}. */
  def minhashSignatures(docToks: DataFrame, k: Int): DataFrame =
    docToks.groupBy("doc_id")
      .agg(min(md5(concat(lit("0:"), col("tok")))).as("mh_0"),
           (1 until k).map(s =>
             min(md5(concat(lit(s"$s:"), col("tok")))).as(s"mh_$s")): _*)

  /** LSH banding over a MinHash signature: rows-per-band consecutive
    * signature components hash to a band bucket; documents sharing any
    * bucket become candidate pairs (a < b).
    *
    * `maxBucketSize` (0 = unlimited) drops buckets larger than the cap
    * before the pair join: a bucket of B docs costs O(B²) pairs, and at
    * corpus scale the giant buckets are boilerplate collisions (empty
    * shingles, templates) whose pairs are near-duplicates of each other
    * anyway — capping bounds the worst-case join fan-out at B²·nBands
    * per bucket instead of the corpus quadratic. Capped runs trade a
    * bounded amount of recall on those degenerate groups; route them
    * through [[exactDupGroups]] instead. */
  def lshCandidatePairs(sigs: DataFrame, k: Int, rowsPerBand: Int,
                        maxBucketSize: Long = 0L): DataFrame = {
    val nBands = k / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      md5(concat(parts: _*)).as(s"band_$b")
    }
    val banded = sigs.select(col("doc_id") +: bandCols: _*)
    val buckets0 = (0 until nBands).map { b =>
      banded.select(col("doc_id"), col(s"band_$b").as("bucket"),
                    lit(b).as("band"))
    }.reduce(_ unionByName _)
    val buckets =
      if (maxBucketSize <= 0) buckets0
      else {
        val w = Window.partitionBy("band", "bucket")
        buckets0.withColumn("_bsz", count(lit(1)).over(w))
          .filter(col("_bsz") <= maxBucketSize).drop("_bsz")
      }
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact token-set Jaccard for a set of candidate pairs. */
  def jaccardForPairs(pairs: DataFrame, docToks: DataFrame): DataFrame = {
    val sizes = docToks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ta = docToks.select(col("doc_id").as("a"), col("tok"))
    val tb = docToks.select(col("doc_id").as("b"), col("tok"))
    val inter = pairs.join(ta, "a").join(tb, Seq("b", "tok"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
              (col("inter").cast("double") /
               (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** Word n-gram shingles with positions, via a per-document lead window
    * (identical shape in SQL engines — no array lambdas needed). */
  def shingles(docs: DataFrame, id: Column, text: Column, n: Int,
               distinctShingles: Boolean = true): DataFrame = {
    require(n == 3, "shingle width fixed at 3 for the lead-window form")
    val toks = docs.select(id.as("doc_id"),
      posexplode(split(lower(text), "\\s+")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val all = toks
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
              concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
    // set semantics for similarity/dedup; keep duplicates for
    // within-document repetition measures
    if (distinctShingles) all.distinct() else all
  }

  /** SimHash signatures (60-bit): md5-derived token hashes voted bitwise.
    * The global token vocabulary is expanded to a (token, bit, ±1) table
    * — tiny relative to the corpus — so the per-document aggregation
    * stays a broadcast join + groupBy, never quadratic. */
  def simhash(docToks: DataFrame, bits: Int = 60): DataFrame = {
    val vocab = docToks.select("tok").distinct()
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10)
        .cast("long"))
    val bitIdx = (0 until bits).map(b => lit(b)).toArray
    val vocabBits = vocab
      .select(col("tok"), col("h"),
              explode(array(bitIdx: _*)).as("b"))
      .withColumn("c",
        (expr("(h >> b) & 1") * 2 - 1).cast("long"))
      .select("tok", "b", "c")
    docToks.join(broadcast(vocabBits), "tok")
      .groupBy("doc_id", "b")
      .agg(sum("c").as("s"))
      .withColumn("bit", (col("s") > 0).cast("long"))
      .groupBy("doc_id")
      .agg(sum(expr("shiftleft(bit, b)")).as("sig"))
  }

  /** Hamming distance between SimHash signatures — near-dup candidates
    * share high bits (a cheap bucket), verified by bit_count(xor).
    *
    * Recall tradeoff: a single high-bit-prefix bucket misses pairs
    * whose differing bits fall inside the prefix — full recall at
    * Hamming ≤ h needs (h+1) rotated bucketings (the standard
    * multi-probe scheme); one prefix is the cheap single-probe variant
    * and is what this operator implements. */
  def simhashPairs(sigs: DataFrame, bucketShift: Int, maxHamming: Int)
      : DataFrame = {
    val a = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
      .withColumn("bucket", expr(s"sig_a >> $bucketShift"))
    val b = sigs.select(col("doc_id").as("b"), col("sig").as("sig_b"))
      .withColumn("bucket", expr(s"sig_b >> $bucketShift"))
    a.join(b, "bucket")
      .filter(col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }

  /** Resolve candidate duplicate PAIRS into duplicate CLUSTERS —
    * distributed connected components over the pair graph, the step a
    * real fuzzy-dedup pipeline needs between LSH candidate generation
    * and "keep one document per duplicate group" (near-duplication is
    * not transitive, so pairs alone under-merge: a~b and b~c must
    * collapse into one group even when a~c was never emitted).
    *
    * Algorithm: min-label propagation with POINTER JUMPING. Each round
    *   1. label(v) ← min(label(v), min over neighbors' labels) — one
    *      join + groupBy on the node key;
    *   2. label(v) ← label(label(v)) — one self-join, halving the
    *      remaining pointer depth.
    * Plain propagation needs O(diameter) rounds (a 10⁶-doc template
    * chain would take 10⁶ shuffles); the jump makes it O(log d) — the
    * DataFrame form of the doubling scheme in Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" (SoCC '14).
    *
    * Scale shape: labels and edges stay partitioned by node id end to
    * end; per round the driver sees ONE scalar (the label sum —
    * labels only ever decrease, so an unchanged sum proves a fixed
    * point, no change-count join needed). Each round's label frame is
    * `localCheckpoint`ed: persist alone is NOT enough for an iterative
    * DataFrame — the jump self-join references the previous round's
    * plan twice, so the logical plan doubles per round and Catalyst
    * analysis goes exponential (measured: 280 s for a 200-node graph
    * at round 30 vs milliseconds with truncation). localCheckpoint
    * trades executor-loss recoverability for a constant-size plan; a
    * long-lived production job would point `checkpoint` at reliable
    * storage instead, same shape.
    *
    * Returns (node, cluster) with cluster = the component's minimum
    * node id — which IS the canonical document under the reference's
    * keep-smallest-id convention (exactDupGroups above). Nodes absent
    * from `pairs` are singletons and are not returned.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // the symmetrization union references the pair input TWICE, and
    // exchange reuse does not fire across union branches — persist the
    // input once so an expensive upstream (an LSH+verify chain) is not
    // computed per branch
    val p = graft.core.CacheScope.persist(
      pairs.select(col("a").cast("long").as("a"),
                   col("b").cast("long").as("b")))
    val edges = graft.core.CacheScope.persist(
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
        .distinct())
    // exact decimal sum: overflow-safe for arbitrary long ids
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("label").cast("decimal(38,0)"))).head()
      if (s.isNullAt(0)) java.math.BigDecimal.ZERO else s.getDecimal(0)
    }
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("nl"))
      val prop = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
                least(col("label"),
                      coalesce(col("nl"), col("label"))).as("label"))
      // label(v) is always a node id of the same component, so the
      // jump target row exists; coalesce only guards the self-row
      val jumped = prop
        .join(prop.select(col("node").as("label"), col("label").as("ll")),
              Seq("label"), "left")
        .select(col("node"), coalesce(col("ll"), col("label")).as("label"))
      val next = jumped.localCheckpoint() // eager: truncates the plan
      val s = labelSum(next)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    val out = labels.select(col("node"), col("label").as("cluster"))
    edges.unpersist(false)
    out
  }

  /** Multi-probe SimHash pairs — FULL recall at Hamming ≤ maxHamming
    * (the standard (h+1)-bucketing scheme): the `bits`-wide signature
    * splits into (maxHamming+1) disjoint bit segments; by pigeonhole,
    * any two signatures within Hamming distance h agree EXACTLY on at
    * least one segment, so bucketing once per segment and verifying
    * bit_count(xor) on within-bucket pairs misses nothing. Costs
    * (h+1)× the bucket volume of [[simhashPairs]] (the single-probe
    * variant, which trades that for recall); per-bucket pair fan-out
    * stays bounded the same way. */
  def simhashPairsMultiProbe(sigs: DataFrame, bits: Int, maxHamming: Int)
      : DataFrame = {
    val nSeg = maxHamming + 1
    require(bits >= nSeg, s"need at least one bit per segment")
    val segWidth = bits / nSeg
    val buckets = (0 until nSeg).map { s =>
      val lo = s * segWidth
      // leftover bits fold into the last segment
      val width = if (s == nSeg - 1) bits - lo else segWidth
      val mask = (1L << width) - 1
      sigs.select(col("doc_id"), col("sig"), lit(s).as("seg"),
                  expr(s"(sig >> $lo) & $mask").as("bucket"))
    }.reduce(_ unionByName _)
    val a = buckets.select(col("seg"), col("bucket"),
                           col("doc_id").as("a"), col("sig").as("sig_a"))
    val b = buckets.select(col("seg"), col("bucket"),
                           col("doc_id").as("b"), col("sig").as("sig_b"))
    a.join(b, Seq("seg", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
              expr("bit_count(sig_a ^ sig_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may collide in several segments
  }
}
