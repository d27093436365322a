package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in FIXED-POINT integer arithmetic — the
  * link-graph quality prior of corpus curation (Common-Crawl-style
  * pipelines rank hosts/pages by centrality before sampling; here the
  * same operator runs over any edge list, e.g. the item co-occurrence
  * graph).
  *
  * Floating-point PageRank is not oracle-checkable: the per-node sum
  * of neighbor contributions is order-dependent. This variant keeps
  * every rank as an integer number of 1e-12 units:
  *
  *   p₀        = 10¹² div N
  *   contrib(j)= p(j) div outdeg(j)            (integer floor)
  *   p'(i)     = (15·10¹¹ div N) + (85 · Σ contrib) div 100
  *
  * Long addition is exact and associative (map-side combine safe) and
  * integer division is identical on every engine, so after any number
  * of iterations the ranks are bit-identical to the unrolled SQL twin.
  * The floors leak ≤1e-12·(N + in-edges) of mass per iteration —
  * irrelevant to ordering, which is what the quality prior consumes.
  *
  * Scale shape: per iteration ONE join of the edge list to the rank
  * table (both keyed by node — a co-partitioned shuffle) and one
  * map-side-combined aggregation; the rank table is localCheckpointed
  * per round so round k's plan does not embed rounds 1..k-1 (the
  * connectedComponents convention). Nodes without in-edges keep the
  * teleport mass; dangling nodes (no out-edges) simply contribute
  * nothing — the deterministic convention, documented here.
  */
object PageRank {

  val Unit12 = 1000000000000L // 1.0 in 1e-12 fixed point

  /** `edges`: directed (src, dst) pairs, deduplicated by the caller if
    * multiplicity is not intended. Returns (node, rank12) for every
    * node appearing as src or dst. */
  def fixedPoint(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = graft.core.CacheScope.persist(
      edges0.select(col("src").cast("long").as("src"),
                    col("dst").cast("long").as("dst")))
    val nodes = graft.core.CacheScope.persist(
      edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty edge list")
    // size the loop's shuffles by the graph, not the session default:
    // a 500-node subgraph on 32 shuffle partitions pays ~15 near-empty
    // task waves across the iterations (the bprPartitioner convention
    // — at 1e9 nodes the node-count term takes over)
    val spark = edges.sparkSession
    val nParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 50000L)).toInt
    val partedEdges = graft.core.CacheScope.persist(
      edges.repartition(nParts, col("src")))
    val outdeg = partedEdges.groupBy("src").agg(count(lit(1)).as("d"))
    val init = Unit12 / n          // integer division, exact both engines
    val teleport = (Unit12 * 15L / 100L) / n
    var p = nodes.repartition(nParts, col("node"))
      .withColumn("p", lit(init))
    for (k <- 0 until iters) {
      val contribs = partedEdges
        .join(p.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
                expr("p div d").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      p = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
                (lit(teleport) +
                 expr(s"(85 * coalesce(inflow, 0L)) div 100"))
                  .as("p"))
      // each round references the previous p exactly ONCE, so the plan
      // grows linearly — checkpoint only every 4th round to bound
      // analysis time at high iteration counts without paying an eager
      // materialization per round (5 extra jobs measured as ~40% of
      // the query's wall-clock on a 500-node graph)
      if ((k + 1) % 4 == 0 && k + 1 < iters)
        p = p.localCheckpoint(true)
    }
    p.withColumnRenamed("p", "rank12")
  }

  /** [[fixedPoint]] with DANGLING-MASS REDISTRIBUTION — the textbook
    * operator (Page et al. 1999; the stochasticity fix of Langville &
    * Meyer, "Deeper Inside PageRank" §5): the rank held by nodes with
    * no out-edges is spread uniformly over all nodes each iteration
    * instead of being dropped, so total mass is conserved (up to the
    * documented ≤1e-12·(N + in-edges) floor leak):
    *
    *   D      = Σ_{outdeg(j)=0} p(j)          (exact long sum)
    *   p'(i)  = (15·10¹¹ div N) + (85 · (Σ contrib + D div N)) div 100
    *
    * One extra aggregation per iteration (an anti-join of the rank
    * table against the out-degree table, reduced to a single long on
    * the driver — a scalar per round, the connectedComponents loop
    * convention; never a node-sized structure). Integer div and long
    * sums keep every iteration bit-identical to the unrolled SQL twin.
    * On a graph with NO dangling nodes the result equals
    * [[fixedPoint]] exactly (D = 0 every round). */
  def fixedPointRedistribute(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = graft.core.CacheScope.persist(
      edges0.select(col("src").cast("long").as("src"),
                    col("dst").cast("long").as("dst")))
    val nodes = graft.core.CacheScope.persist(
      edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty edge list")
    val spark = edges.sparkSession
    val nParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 50000L)).toInt
    val partedEdges = graft.core.CacheScope.persist(
      edges.repartition(nParts, col("src")))
    val outdeg = graft.core.CacheScope.persist(
      partedEdges.groupBy("src").agg(count(lit(1)).as("d")))
    val danglingNodes = graft.core.CacheScope.persist(
      nodes.join(outdeg.withColumnRenamed("src", "node"),
                 Seq("node"), "left_anti"))
    val init = Unit12 / n
    val teleport = (Unit12 * 15L / 100L) / n
    var p = nodes.repartition(nParts, col("node"))
      .withColumn("p", lit(init))
    for (_ <- 0 until iters) {
      // the dangling scalar forces p THIS round, and contribs consumes
      // p again — eager-checkpoint once per round so the forced
      // materialization is also the one the join reads (the lazy
      // every-4th-round schedule of [[fixedPoint]] would recompute the
      // whole round-k lineage twice here)
      p = p.localCheckpoint(true)
      val dMass = danglingNodes.join(p, "node")
        .agg(coalesce(sum("p"), lit(0L))).head().getLong(0)
      val dShare = dMass / n     // integer floor, identical both engines
      val contribs = partedEdges
        .join(p.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
                expr("p div d").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      p = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
                (lit(teleport) +
                 expr(s"(85 * (coalesce(inflow, 0L) + $dShare)) div 100"))
                  .as("p"))
    }
    p.withColumnRenamed("p", "rank12")
  }
}
