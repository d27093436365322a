package graft.tuning

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Results gathering and export (reference:
  * Utils/ResultFolderLoader.py:537-860, run_results_gathering.py):
  * collect per-algorithm metric rows into one comparison table and
  * render it as CSV or a LaTeX tabular — the reference's
  * generate_latex_results / CSV outputs.
  *
  * Result tables are algorithms × metrics (dozens of cells), so the
  * string rendering collects; everything upstream stays distributed.
  */
object Results {

  /** Stack single-row metric frames (one per algorithm) into one tall
    * (algorithm, metric, value) DataFrame. */
  def gather(spark: SparkSession,
             results: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    results.map { case (alg, df) =>
      val row = df.head()
      df.columns.zipWithIndex.map { case (c, idx) =>
        val v = row.get(idx) match {
          case null => Double.NaN
          case n: Number => n.doubleValue()
          case other => other.toString.toDouble
        }
        (alg, c, v)
      }.toSeq
    }.reduce(_ ++ _).toDF("algorithm", "metric", "value")
  }

  /** Pivot the tall table to algorithms × metrics. Column order follows
    * `metricOrder` (the reference fixes a canonical metric ordering in
    * its tables). */
  def comparisonTable(tall: DataFrame, metricOrder: Seq[String])
      : DataFrame = {
    val pivoted = tall.groupBy("algorithm")
      .pivot("metric", metricOrder)
      .agg(first("value"))
    pivoted.orderBy("algorithm")
  }

  /** CSV export of a small comparison table (header + data lines). */
  def toCsv(table: DataFrame): String = {
    val header = table.columns.mkString(",")
    val lines = table.collect().map(_.toSeq.map {
      case null => ""
      case d: Double => f"$d%.6f"
      case v => v.toString
    }.mkString(","))
    (header +: lines).mkString("\n")
  }

  /** LaTeX tabular export (reference: ResultFolderLoader.py
    * generate_latex_results shape: algorithms as rows, metrics as
    * columns). */
  def toLatex(table: DataFrame, caption: String): String = {
    val cols = table.columns
    val colSpec = "l" + ("r" * (cols.length - 1))
    val header = cols.mkString(" & ")
    val rows = table.collect().map(_.toSeq.map {
      case null => "--"
      case d: Double => f"$d%.4f"
      case v => v.toString.replace("_", "\\_")
    }.mkString(" & ") + " \\\\")
    (Seq(
      s"\\begin{table}[h]",
      s"\\caption{$caption}",
      s"\\begin{tabular}{$colSpec}",
      "\\toprule",
      header + " \\\\",
      "\\midrule") ++ rows ++ Seq(
      "\\bottomrule",
      "\\end{tabular}",
      "\\end{table}")).mkString("\n")
  }
}
