package graft.tuning

import org.scalatest.funsuite.AnyFunSuite

/** The shared trial-state codec ([[TrialState]]): escaping, tolerant
  * reads, and numeric round-trips — the invariants both
  * [[Search.resumable]] and the Lifecycle trial state rely on.
  */
class TrialStateSpec extends AnyFunSuite {

  test("jstr escapes control characters; records stay one line") {
    // exception texts routinely carry newlines (a Spark
    // AnalysisException embeds the plan); a raw newline would split
    // the record across physical lines and break the resume
    val hostile = "boom\nline2\t\"quoted\"\\back\r\u0001"
    val escaped = TrialState.jstr(hostile)
    assert(!escaped.exists(c => c == '\n' || c == '\r' || c == '\t'))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(s"""{"x": $escaped}""")
             .get("x").asText() == hostile)
  }

  test("jsonNumber round-trips doubles, NaN and infinities") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.configure(com.fasterxml.jackson.core.JsonParser.Feature
                       .ALLOW_NON_NUMERIC_NUMBERS, true)
    for (v <- Seq(0.1, -65504.0, 1.0e-4, Double.MaxValue,
                  Double.NegativeInfinity)) {
      val parsed = mapper.readTree(
        s"""{"m": ${TrialState.jsonNumber(v)}}""").get("m").asDouble()
      assert(parsed == v, s"$v round-trip gave $parsed")
    }
    assert(mapper.readTree(
      s"""{"m": ${TrialState.jsonNumber(Double.NaN)}}""")
        .get("m").asDouble().isNaN)
  }

  test("readRecords skips blanks, non-JSON, and missing-field records") {
    val f = java.nio.file.Files.createTempFile("state", ".jsonl")
    java.nio.file.Files.write(f,
      ("\n" +
       "alpha=0.5\t0.42\n" + // legacy TSV
       """{"params": {"a": 1.0}, "metric": 0.5}""" + "\n" + // missing field
       """{"params": {"a": 1.0}, "metric": null, "extra": 1}""" + "\n" +
       // ^ explicit JSON null: NullNode must not pass (asDouble on it
       //   would fabricate metric 0.0)
       """{"params": {"a": 1.0}, "metric": 0.5, "extra": 1}""" + "\n" +
       """{"params": {"q": 0.2}, "metr""" + "\n" // truncated
      ).getBytes("UTF-8"))
    val recs = TrialState.readRecords(f, Seq("params", "metric", "extra"))
    assert(recs.size == 1)
    assert(recs.head.get("metric").asDouble() == 0.5)
  }

  test("key canonicalizes parameter order") {
    assert(TrialState.key(Map("b" -> 2.0, "a" -> 1.0)) ==
           TrialState.key(Map("a" -> 1.0, "b" -> 2.0)))
  }

  test("search strategies never select a NaN trial as best") {
    // Scala 2.13's total ordering ranks NaN above every real value
    val r = Search.grid(Seq(Map("a" -> 1.0), Map("a" -> 2.0),
                            Map("a" -> 3.0))) { p =>
      if (p("a") == 2.0) Double.NaN else p("a") / 10.0
    }
    assert(r.best.metric == 0.3)
    assert(r.history.size == 3)
    // all-NaN history still yields a result (first trial), not a crash
    val allNaN = Search.grid(Seq(Map("a" -> 1.0)))(_ => Double.NaN)
    assert(allNaN.best.metric.isNaN)
  }
}
