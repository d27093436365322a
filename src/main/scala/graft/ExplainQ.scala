package graft
import org.apache.spark.sql.SparkSession

/** Plan-dump tool: prints `explain("formatted")` for one registered
  * query. Honors the bench env contract (SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS) so captured plans reflect the same scale factor
  * and session layout the bench times — a plan taken at sf0.01 can
  * differ from the sf0.1 plan (e.g. the scan-spread's byte-sized
  * partition target, broadcast thresholds). */
object ExplainQ {
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
    q.run(t).explain("formatted")
    spark.stop()
  }
}
