package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC / NFD /
  * NFKC / NFKD) — the canonicalization pre-pass of a text-corpus
  * pipeline: exact/fuzzy dedup and shingle fingerprints treat
  * "é" (U+00E9) and "e"+U+0301 as different documents unless the
  * corpus is normalized first, and NFKC folds compatibility forms
  * (ﬁ → fi, ² → 2, full-width → ASCII) that would otherwise fragment
  * token statistics.
  *
  * Shape: a scalar `UnaryExpression` with `doGenCode`, so it runs
  * inside whole-stage codegen at scan speed (no UDF serialization).
  * The hot path is engineered for corpus reality: pure-ASCII strings
  * (the overwhelming majority at 100 TB) return the INPUT UTF8String
  * after a byte scan — no decode, no allocation; already-normalized
  * non-ASCII strings return the input after a `Normalizer.isNormalized`
  * check (also allocation-free on the result side). Only strings that
  * genuinely change pay for the transform.
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string, got ${child.dataType.sql}")
    else if (!UnicodeNormalizeUtil.formOrdinal(formName).isDefined)
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$formName' " +
          "(expected NFC, NFD, NFKC or NFKD)")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val ordinal: Int =
    UnicodeNormalizeUtil.formOrdinal(formName).get

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalizeUtil.normalize(s.asInstanceOf[UTF8String], ordinal)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalizeUtil.normalize($c, $ordinal)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalizeUtil {
  private val forms = Normalizer.Form.values()

  def formOrdinal(name: String): Option[Int] =
    forms.indexWhere(_.name == name) match {
      case -1 => None
      case i  => Some(i)
    }

  /** Static row kernel called from generated code. Pure-ASCII inputs
    * (every byte < 0x80 — signed byte ≥ 0) are fixed points of all
    * four forms and return the input reference untouched. */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    val j = s.toString
    val f = forms(form)
    if (Normalizer.isNormalized(j, f)) s
    else UTF8String.fromString(Normalizer.normalize(j, f))
  }
}

object StringFunctions {
  private def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"unicode_normalize(str, form) expects exactly 2 arguments, " +
          s"got ${exprs.length}")
    val form = exprs(1) match {
      case e if e.foldable && e.dataType.isInstanceOf[StringType] =>
        e.eval() match {
          case s: UTF8String => s.toString
          case _ => throw new IllegalArgumentException(
            "unicode_normalize: form must be a non-null string literal")
        }
      case _ => throw new IllegalArgumentException(
        "unicode_normalize: form must be a string literal " +
          "(NFC, NFD, NFKC or NFKD)")
    }
    UnicodeNormalize(exprs.head, form)
  }

  /** Shared with [[graft.plans.GraftExtensions]] so the config-injected
    * and runtime-registered paths cannot diverge. */
  val builder: Seq[Expression] => Expression = build

  /** Register `unicode_normalize(str, 'NFC')` with a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", build, "built-in")

  /** Column form (requires [[register]] — `core.Tables` does it). */
  def unicode_normalize(s: Column, form: String): Column =
    org.apache.spark.sql.functions.call_function(
      "unicode_normalize", s, org.apache.spark.sql.functions.lit(form))
}
