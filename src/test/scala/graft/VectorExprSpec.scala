package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann

/** Native DotProduct expression vs the higher-order-function reference:
  * bit-identical results (same summation order) on float arrays. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product equals the zip_with fold bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.7f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
    val out = df.select(Ann.dot(col("a"), col("b")).as("native"),
                        Ann.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot_product matches the HOF on degenerate inputs (null parity)") {
    // Ragged lengths, a null element, and a null array: the HOF form
    // returns NULL for all three (zip_with null-padding / null product
    // poisons the fold) — the native expression must agree so
    // RewriteHofDotProduct is semantics-preserving on arbitrary data.
    val df = Seq(
      (Array[java.lang.Float](1.0f, 2.0f),
       Array[java.lang.Float](3.0f)),                   // ragged
      (Array[java.lang.Float](1.0f, null),
       Array[java.lang.Float](3.0f, 4.0f)),             // null element
      (null,
       Array[java.lang.Float](1.0f)),                   // null array
      (Array[java.lang.Float](1.0f, 2.0f),
       Array[java.lang.Float](3.0f, 4.0f)))             // well-formed
      .toDF("a", "b")
    val rows = df.select(Ann.dot(col("a"), col("b")).as("native"),
                         Ann.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
             s"null parity broken: native=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
               java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows.count(_.isNullAt(0)) == 3)
  }

  test("dot_product participates in codegen'd plans") {
    // non-foldable input so the projection survives into the physical plan
    val df = spark.range(3).select(
      array(col("id").cast("float"), lit(2.0f)).as("a"),
      array(lit(3.0f), col("id").cast("float")).as("b"))
    val q = df.select(Ann.dot(col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotproduct"),
           s"expected dotproduct inside a codegen stage:\n$plan")
    // id=1: [1,2]·[3,1] = 5
    val v = q.collect().map(_.getDouble(0)).sorted
    assert(math.abs(v(1) - 5.0) < 1e-12)
  }
}
