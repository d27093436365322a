package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{StringFunctions, UnicodeNormalizeUtil}

/** The codegen'd Unicode normalization expression: composition,
  * compatibility folding, the allocation-free fast paths, null
  * semantics, and the SQL surface. The decomposed-vs-precomposed
  * literals in this file are byte-distinct (e+U+0301 vs U+00E9 —
  * verified via `cat -A`); the length/equality assertions would fail
  * if an editor silently normalized the source.
  */
class StringExprSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String = {
    StringFunctions.register(spark)
    Seq(s).toDF("x")
      .select(StringFunctions.unicode_normalize(col("x"), form))
      .collect()(0).getString(0)
  }

  test("NFC composes combining sequences") {
    assert(norm("é", "NFC") == "é")
    assert(norm("é", "NFC").length == 1)
  }

  test("NFD decomposes precomposed characters") {
    assert(norm("é", "NFD") == "é")
  }

  test("NFKC folds compatibility forms") {
    assert(norm("ﬁle", "NFKC") == "file")
    assert(norm("x²", "NFKC") == "x2")
    assert(norm("Ａ", "NFKC") == "A")
    // NFC must NOT touch compatibility forms
    assert(norm("ﬁle", "NFC") == "ﬁle")
  }

  test("pure-ASCII fast path returns the input reference, no allocation") {
    val in = UTF8String.fromString("plain ascii only")
    assert(UnicodeNormalizeUtil.normalize(in, 0) eq in)
    // already-normalized non-ASCII also returns the input reference
    val nfcForm = UnicodeNormalizeUtil.formOrdinal("NFC").get
    val composed = UTF8String.fromString("café")
    assert(UnicodeNormalizeUtil.normalize(composed, nfcForm) eq composed)
  }

  test("null in, null out") {
    StringFunctions.register(spark)
    val r = Seq(Option.empty[String]).toDF("x")
      .select(StringFunctions.unicode_normalize(col("x"), "NFC"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("SQL surface via session extensions") {
    graft.plans.GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT unicode_normalize('é', 'NFC') AS s").collect()(0)
    assert(r.getString(0) == "é")
  }

  test("invalid form is an analysis-time error") {
    StringFunctions.register(spark)
    val e = intercept[Exception] {
      Seq("x").toDF("x")
        .select(StringFunctions.unicode_normalize(col("x"), "NFX"))
        .collect()
    }
    assert(e.getMessage.contains("NFX") ||
           e.getMessage.contains("normalization"))
  }

  test("wrong arity is a build-time error naming the signature") {
    StringFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('a')").collect()
    }
    assert(e.getMessage.contains("2 arguments") ||
           e.getMessage.contains("unicode_normalize"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('a', 'NFC', 'junk')").collect()
    }
    assert(e3.getMessage.contains("2 arguments") ||
           e3.getMessage.contains("unicode_normalize"))
  }

  test("interpreted eval matches codegen") {
    // nullSafeEval path (interpreted) vs the DataFrame (codegen) path
    val expr = graft.functions.UnicodeNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("éxﬁ"),
        org.apache.spark.sql.types.StringType), "NFKC")
    val interpreted = expr.eval(null).asInstanceOf[UTF8String].toString
    assert(interpreted == norm("éxﬁ", "NFKC"))
    assert(interpreted == "éxfi")
  }
}
