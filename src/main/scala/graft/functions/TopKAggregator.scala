package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap per-group top-k (SURVEY.md §4: the candidate
  * replacement for ranking-window sorts).
  *
  * A window `row_number` top-k sorts every group; this typed
  * `Aggregator` keeps only k candidates per group in its buffer, so
  * partial aggregation (map-side combine) bounds both memory and
  * shuffle volume by k·groups — on a 100 TB scoring table that is the
  * difference between shuffling all scores and shuffling k per user.
  *
  * Ordering matches the engine's ranking convention: score descending,
  * id ascending on ties.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)],
                       Seq[(Long, Double)]] {

  private def ord: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)] {
      case (id, score) => (-score, id)
    }

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], row: (Long, Double))
      : Seq[(Long, Double)] =
    ((buf :+ row).sorted(ord)).take(k)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)])
      : Seq[(Long, Double)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder()
}

object TopKAggregator {
  /** Untyped-column form, for use inside `groupBy(...).agg(...)`:
    * `udafFor(k)(idCol, scoreCol)` yields `array<struct<_1,_2>>` of the
    * k strongest (id, score) pairs, score desc / id asc. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k))
}
