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
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * for EVERY input, including the degenerate ones: a length mismatch
  * returns NULL (zip_with null-pads the shorter array and the null
  * product poisons the fold) and a null element anywhere returns NULL
  * for the same reason. On the well-formed path (equal lengths, no
  * null elements) it is the whole-stage-codegen'd tight loop instead
  * of per-element higher-order-function lambda dispatch, with the same
  * index-ascending summation order, so results are bit-identical to
  * the HOF form — which is what lets [[graft.plans.RewriteHofDotProduct]]
  * substitute it unconditionally.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on ragged lengths / null elements is data-dependent, so the
  // result is nullable even over non-nullable inputs.
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

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
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var sum = 0.0
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      val xv = if (lt == FloatType) x.getFloat(k).toDouble
               else x.getDouble(k)
      val yv = if (rt == FloatType) y.getFloat(k).toDouble
               else y.getDouble(k)
      sum += xv * yv
      k += 1
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
      // Element null checks compile away when the array type proves
      // containsNull=false — the embedding hot path keeps its
      // branch-free inner loop.
      val nullChecks = Seq(
        if (elemNullable(left)) Some(s"$a.isNullAt($k)") else None,
        if (elemNullable(right)) Some(s"$b.isNullAt($k)") else None
      ).flatten
      val elemGuard =
        if (nullChecks.isEmpty) ""
        else s"""if (${nullChecks.mkString(" || ")}) {
                |      ${ev.isNull} = true; break;
                |    }""".stripMargin
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $elemGuard
         |    $sum += ${getter(lt, a, k)} * ${getter(rt, b, k)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $sum;
         |  }
         |}
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
