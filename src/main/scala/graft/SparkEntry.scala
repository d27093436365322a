package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[Q]] in one of
  * the module objects below; this object only aggregates them.
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    operators.Relational.queries ++
    operators.SetOps.queries ++
    operators.Scalars.queries ++
    operators.ExtraQueries.queries ++
    operators.ScaleQueries.queries ++
    stats.StatsQueries.queries ++
    recommend.RecsysQueries.queries ++
    recommend.ModelQueries.queries ++
    text.TextQueries.queries ++
    dedup.DedupQueries.queries ++
    ann.AnnQueries.queries ++
    multimodal.MultimodalQueries.queries ++
    tuning.TuningQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.run(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { q =>
      q.name -> ((s: SparkSession, dir: String) => q.run(Tables(s, dir)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
