package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.Urm
import graft.tuning.{Lifecycle, Search, Spaces}

/** Diagnostic main (guide §1.1 "empirical"): times each of q135's 13
  * per-algorithm surrogate chains IN ISOLATION, sequentially, so the
  * concurrent query's critical path is attributable to a specific
  * algorithm chain. Same data, same seeds, same trial structure as
  * q135_hp_smoke_search — this is a measurement harness, not a query;
  * it registers nothing and the bench never runs it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.ProfileHp"
  */
object ProfileHp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = core.Tables(spark, sfDir)

    // q135's exact setup
    val urm = Urm.fromOrders(t)
      .filter(pmod(col("u"), lit(31)) === 0 && col("i") < 1500)
    val split = Urm.userWiseHoldout(urm, 0.8, seed = 11)
    val train = split.filter(col("split") === "train").select("u", "i")
    val valid = split.filter(col("split") === "test").select("u", "i")
    graft.core.CacheScope.persist(train)
    val shown = train.select("u").distinct()
      .crossJoin(train.select("i").distinct())
      .filter(pmod(xxhash64(col("u"), col("i"), lit(99)), lit(17)) < 2)
      .join(train, Seq("u", "i"), "left_anti")
    graft.core.CacheScope.persist(shown)
    train.count(); shown.count() // warm the shared caches untimed

    val results = Spaces.catalog.zipWithIndex.map {
      case ((alg, space), idx) =>
        val t0 = System.nanoTime()
        val (nTrials, best) = graft.core.CacheScope.scoped {
          val eval = Spaces.evaluator(alg, spark, train, valid,
                                      cutoff = 10, maxEpochs = 1,
                                      impressions = Some(shown))
          val result =
            if (space.dims.isEmpty) {
              val m = eval(Map.empty)
              Search.SearchResult(Search.Trial(Map.empty, m),
                                  Seq(Search.Trial(Map.empty, m)))
            } else Search.surrogate(
              Spaces.unitRanges(space), nInit = 1, nTotal = 2,
              candidatePool = 16, kappa = 1.0, seed = 31 + idx) { u =>
                try eval(space.decode(u))
                catch { case scala.util.control.NonFatal(_) =>
                  Lifecycle.InvalidConfigValue }
              }
          (result.history.size, result.best.metric)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE_HP $alg%-22s $sec%8.2f s  trials=$nTrials best=$best%.6f")
        (alg, sec)
    }
    println("PROFILE_HP_TOTAL " +
      f"${results.map(_._2).sum}%.2f s sequential; max chain = " +
      f"${results.maxBy(_._2)._1} ${results.map(_._2).max}%.2f s")
    spark.stop()
  }
}
