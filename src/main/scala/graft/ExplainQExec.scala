package graft
import org.apache.spark.sql.SparkSession

/** POST-EXECUTION plan dump: runs one registered query to completion
  * and then prints its final AQE plan (`isFinalPlan=true`), where
  * runtime artifacts static explain cannot show — `ReusedExchange`,
  * `AQEShuffleRead` coalescing, runtime join rewrites — are visible.
  * Companion to [[ExplainQ]] (static plan); same env contract. */
object ExplainQExec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = core.Tables(spark, sfDir)
    val q = SparkEntry.allQueries.find(_.name == args(0)).get
    val df = q.run(t)
    // execute THROUGH the frame's own QueryExecution so the
    // AdaptiveSparkPlanExec finalizes, then print the final plan
    df.queryExecution.toRdd.count()
    df.explain("formatted")
    spark.stop()
  }
}
