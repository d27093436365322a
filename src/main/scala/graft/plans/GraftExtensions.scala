package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** The engine's Catalyst extension surface (SURVEY.md §7.3: custom
  * `Expression` / `Rule` registered via `SparkSessionExtensions`).
  *
  * Enable with `spark.sql.extensions=graft.plans.GraftExtensions` at
  * session build, or [[GraftExtensions.install]] on a live session
  * (the path `core.Tables` takes, so every engine session gets both
  * pieces without config):
  *
  *  - `dot_product` as a catalog function backed by the codegen'd
  *    [[graft.functions.DotProduct]];
  *  - [[RewriteHofDotProduct]], an optimizer rule that rewrites the
  *    declarative higher-order-function dot product —
  *    `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d,
  *    (acc,z) -> acc+z)` — into the same native expression. A user
  *    (or generated SQL) can write the idiomatic HOF form and still
  *    execute the tight codegen loop; summation order is identical
  *    and [[DotProduct]] reproduces the HOF's degenerate semantics
  *    too (NULL on ragged lengths or null elements), so the rewrite
  *    is bit-exact for every input, not just well-formed vectors.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    // Spark's bloom expression pair is internal-only (the runtime
    // filter rule builds it directly); exposing it lets SQL users run
    // the build-once-probe-everywhere pattern of
    // [[graft.operators.JoinPrune]] from plain SQL. The builders are
    // SHARED with JoinPrune's runtime registration
    // (graft.functions.BloomFunctions) so the two paths cannot diverge.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "graft_bloom_filter_agg"),
      graft.functions.BloomFunctions.aggBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "graft_might_contain"),
      graft.functions.BloomFunctions.probeBuilder))
    // Codegen'd Unicode normalization (shared builder with the runtime
    // registration in graft.functions.StringFunctions).
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.UnicodeNormalize].getName,
        "unicode_normalize"),
      graft.functions.StringFunctions.builder))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftExtensions {
  /** Runtime installation on an existing session: function registry +
    * `experimental.extraOptimizations` (idempotent). */
  def install(spark: SparkSession): Unit = {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.StringFunctions.register(spark)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        extra :+ RewriteHofDotProduct
  }
}

/** `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0,
  * (acc,z) -> acc+z)` → `DotProduct(a, b)`.
  *
  * Conservative by construction: the zip lambda must be exactly a
  * multiply of the two lambda variables (each optionally cast to
  * double), the zero exactly literal 0.0, the merge exactly
  * `acc + z`, the finish the identity, and both inputs float/double
  * arrays. The substitution needs no null/shape side-conditions:
  * DotProduct returns NULL exactly where the HOF form does — ragged
  * lengths (zip_with's null padding poisons the fold) and null
  * elements — so data-dependent degenerate inputs cannot diverge.
  * Any other aggregate/zip_with is left untouched. */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  /** The lambda variable itself, or its cast to double. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(w: NamedLambdaVariable, DoubleType, _, _) =>
        w.exprId == v.exprId
      case w: NamedLambdaVariable => w.exprId == v.exprId
      case _ => false
    }

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable,
                                                      y: NamedLambdaVariable), _)),
            DoubleLiteral(0.0),
            LambdaFunction(Add(ma, mz, _), Seq(acc: NamedLambdaVariable,
                                               z: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isNumericArray(a) && isNumericArray(b) &&
             isVar(mx, x) && isVar(my, y) &&
             isVar(ma, acc) && isVar(mz, z) &&
             fin.exprId == fv.exprId =>
        DotProduct(a, b)
    }
}
