package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native Catalyst expression for the ANN hot path (SURVEY §2.12: a
  * custom `Expression` beats a UDF beats anything else).
  *
  * `dot_product(a, b)`: sequential-order double-accumulated dot product
  * of two numeric arrays — semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`,
  * but with whole-stage-codegen'd tight loops instead of per-element
  * higher-order-function lambda dispatch. The summation order (index
  * ascending) is preserved, so results are bit-identical to the HOF
  * form.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var k = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (k < n) {
          sum += x.getFloat(k).toDouble * y.getFloat(k).toDouble; k += 1
        }
      case (DoubleType, DoubleType) =>
        while (k < n) { sum += x.getDouble(k) * y.getDouble(k); k += 1 }
      case (FloatType, DoubleType) =>
        while (k < n) {
          sum += x.getFloat(k).toDouble * y.getDouble(k); k += 1
        }
      case (DoubleType, FloatType) =>
        while (k < n) {
          sum += x.getDouble(k) * y.getFloat(k).toDouble; k += 1
        }
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, idx: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($idx)"
      case DoubleType => s"$arr.getDouble($idx)"
    }
    val lt = elemType(left)
    val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $k = 0; $k < $n; $k++) {
         |  $sum += ${getter(lt, a, k)} * ${getter(rt, b, k)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register `dot_product` with a session's function registry so plain
    * `expr("dot_product(a, b)")` resolves to the codegen'd expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)),
      "built-in")

  /** Column form of [[DotProduct]] (requires [[register]] first). */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
}
