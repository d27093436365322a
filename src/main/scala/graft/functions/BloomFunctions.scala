package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** The single home of the engine's bloom expression builders. Spark
  * keeps `bloom_filter_agg`/`might_contain` out of the public
  * FunctionRegistry (its runtime-filter rule constructs them
  * directly); both graft surfaces — the
  * [[graft.operators.JoinPrune.bloomSemiJoin]] operator and the
  * [[graft.plans.GraftExtensions]] SQL injection — register THESE
  * builders, so the two paths can never diverge. */
object BloomFunctions {

  val aggBuilder: Seq[Expression] => Expression =
    exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))

  val probeBuilder: Seq[Expression] => Expression =
    exprs => BloomFilterMightContain(exprs.head, exprs(1))

  /** Idempotent per-session registration (the VectorFunctions
    * pattern) for callers without the config-based extension. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_bloom_filter_agg", aggBuilder, "built-in")
    registry.createOrReplaceTempFunction(
      "graft_might_contain", probeBuilder, "built-in")
  }
}
