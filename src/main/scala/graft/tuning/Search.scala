package graft.tuning

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.recommend.Recommenders
import graft.eval.Evaluation

/** Hyperparameter search (SURVEY.md §3.2 / §7.1 module 8): the driver-
  * side loop around distributed fit + evaluate, mirroring the
  * reference's tuning lifecycle (run_hyperparameter_tuning.py →
  * SearchBayesianSkopt) with deterministic grid/random strategies —
  * each trial is a Spark job pipeline; the search state lives on the
  * driver like the reference's skopt loop.
  */
object Search {

  final case class Trial(params: Map[String, Double], metric: Double)
  final case class SearchResult(best: Trial, history: Seq[Trial])

  /** Best trial with NaN metrics excluded — Scala 2.13's total
    * ordering ranks NaN above every real value, so a single diverged
    * trial would otherwise win maxBy; an all-NaN history falls back
    * to the first trial. */
  private def bestTrial(history: Seq[Trial]): Trial = {
    val finite = history.filterNot(_.metric.isNaN)
    if (finite.isEmpty) history.head else finite.maxBy(_.metric)
  }

  /** Evaluate one ItemKNN-cosine configuration: similarity(shrink) →
    * topK prune → score → recommend@cutoff → MAP (the reference's
    * optimization target, run_hyperparameter_tuning.py:110-113). */
  def evaluateItemKnn(train: DataFrame, validation: DataFrame,
                      topK: Int, shrink: Double, cutoff: Int): Double = {
    val sim = Similarity.topK(
      Similarity.itemSimilarity(train, Similarity.Cosine, shrink), topK)
      .select(col("i"), col("j"), col("w"))
    val scores = Recommenders.scoreBySimilarity(train, sim)
    val recs = Recommenders.recommend(scores, train, cutoff)
      .select("u", "item", "rank")
    val m = Evaluation.accuracyMetrics(
      Evaluation.hitTable(recs, validation), cutoff)
    val row = m.select("map").collect()
    if (row.isEmpty) 0.0 else row.head.getDouble(0)
  }

  /** Deterministic grid search: evaluates every combination, returns
    * the best by metric (ties → first in grid order). */
  def grid(paramGrid: Seq[Map[String, Double]])
          (evaluate: Map[String, Double] => Double): SearchResult = {
    val history = paramGrid.map(p => Trial(p, evaluate(p)))
    SearchResult(bestTrial(history), history)
  }

  /** Seeded random search over ranges: `n` draws from uniform ranges
    * (the reference's 15 random starts, run_parameter_search.py). */
  def random(ranges: Map[String, (Double, Double)], n: Int, seed: Long)
            (evaluate: Map[String, Double] => Double): SearchResult = {
    val rng = new scala.util.Random(seed)
    val history = (0 until n).map { _ =>
      val p = ranges.map { case (k, (lo, hi)) =>
        k -> (lo + rng.nextDouble() * (hi - lo))
      }
      Trial(p, evaluate(p))
    }
    SearchResult(bestTrial(history), history)
  }

  /** Surrogate-guided search — the engine's stand-in for the
    * reference's Bayesian loop (ParameterTuning/SearchBayesianSkopt.py:
    * 21-135, which wraps skopt gp_minimize): `nInit` seeded random
    * trials, then each step
    *  1. fits a ridge-regularized QUADRATIC surrogate (all pairwise
    *     terms) to the full normalized trial history,
    *  2. scores a seeded candidate pool with surrogate-mean plus a
    *     `kappa`-weighted distance-to-nearest-evaluated exploration
    *     bonus (the deterministic analog of the GP posterior variance
    *     that EI trades off),
    *  3. evaluates the acquisition argmax.
    * Fully deterministic given the seed; every evaluation is still one
    * distributed fit+evaluate pipeline — only the tiny surrogate solve
    * (#features² with #features = 1+d+d(d+1)/2) runs on the driver,
    * exactly like the reference's skopt loop. */
  def surrogate(ranges: Map[String, (Double, Double)], nInit: Int,
                nTotal: Int, candidatePool: Int, kappa: Double, seed: Long)
               (evaluate: Map[String, Double] => Double): SearchResult = {
    import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}
    require(nInit >= 1 && nTotal >= nInit && candidatePool >= 1)
    val keys = ranges.keys.toSeq.sorted
    val rng = new scala.util.Random(seed)
    def draw(): Map[String, Double] = keys.map { k =>
      val (lo, hi) = ranges(k); k -> (lo + rng.nextDouble() * (hi - lo))
    }.toMap
    def norm(p: Map[String, Double]): Array[Double] = keys.map { k =>
      val (lo, hi) = ranges(k)
      if (hi > lo) (p(k) - lo) / (hi - lo) else 0.0
    }.toArray
    def feats(x: Array[Double]): Array[Double] = {
      val b = scala.collection.mutable.ArrayBuffer(1.0)
      b ++= x
      for (a <- x.indices; c <- a until x.length) b += x(a) * x(c)
      b.toArray
    }
    val history = scala.collection.mutable.ArrayBuffer[Trial]()
    (0 until nInit).foreach { _ =>
      val p = draw(); history += Trial(p, evaluate(p))
    }
    while (history.size < nTotal) {
      val xs = history.map(t => feats(norm(t.params)))
      // STANDARDIZE the targets before the ridge solve (skopt's
      // normalize_y): the fit must compare configurations on the
      // spread of OBSERVED metrics, not their absolute scale — one
      // failed-trial sentinel at -65504 among [0,1] metrics would
      // otherwise dominate the least-squares objective and the
      // acquisition would chase fit artifacts instead of data. It
      // also puts the surrogate mean on a unit scale, so kappa's
      // exploration weight means the same thing for a MAP-valued
      // search and an RMSE-valued one.
      val ysRaw = history.map(_.metric)
      val yMean = ysRaw.sum / ysRaw.size
      val yStd = math.sqrt(
        ysRaw.map(y => (y - yMean) * (y - yMean)).sum / ysRaw.size)
      val ys =
        if (yStd > 0) ysRaw.map(y => (y - yMean) / yStd)
        else ysRaw.map(_ => 0.0)
      val d = xs.head.length
      val xtx = BDM.eye[Double](d) * 1e-6 // ridge
      val xty = BDV.zeros[Double](d)
      xs.zip(ys).foreach { case (row, y) =>
        var a = 0
        while (a < d) {
          xty(a) += row(a) * y
          var c = 0
          while (c < d) { xtx(a, c) += row(a) * row(c); c += 1 }
          a += 1
        }
      }
      val w = xtx \ xty
      val evaluated = history.map(t => norm(t.params)).toArray
      val scored = Seq.fill(candidatePool)(draw()).map { p =>
        val x = norm(p)
        val f = feats(x)
        var mu = 0.0
        var a = 0
        while (a < d) { mu += f(a) * w(a); a += 1 }
        val nearest = evaluated.map { e =>
          math.sqrt(x.zip(e).map { case (u, v) => (u - v) * (u - v) }.sum)
        }.min
        (p, mu + kappa * nearest)
      }
      val next = scored.maxBy(_._2)._1
      history += Trial(next, evaluate(next))
    }
    SearchResult(bestTrial(history.toSeq), history.toSeq)
  }

  /** Resume-from-saved-state wrapper (reference:
    * ParameterTuning/SearchBayesianSkopt.py:72-135 _resume_from_saved,
    * which reloads the metadata dict's `hyperparameters_list` /
    * `result_on_validation_list` / best-so-far and replays them into
    * the skopt loop as x0/y0): completed trials append to a
    * JSON-lines state file as they finish — one record per trial,
    * `{"params": {...}, "metric": m, "best_so_far": b}`, the same
    * three facts the reference persists per model_counter. Parameter
    * sets already recorded short-circuit to the saved metric, so an
    * interrupted search — or a re-run of the same grid after a
    * crash — re-evaluates nothing; and because [[surrogate]] refits
    * its model from the FULL replayed history deterministically, the
    * resumed run reconstructs the surrogate state too, trial for
    * trial (the SpacesSpec kill-and-resume fixture pins this), not
    * just the skip-list. Wrap any strategy's `evaluate` with this.
    *
    * Doubles are emitted via `Double.toString` (round-trips exactly)
    * and parsed with Jackson (on Spark's classpath), so replayed
    * metrics are bit-identical to evaluated ones. */
  def resumable(stateFile: java.nio.file.Path)
               (evaluate: Map[String, Double] => Double)
      : Map[String, Double] => Double = {
    import scala.jdk.CollectionConverters._
    import TrialState.{jsonNumber, jstr, key}
    val seen = scala.collection.mutable.Map[String, Double]()
    var best = Double.NegativeInfinity
    TrialState.readRecords(stateFile,
        Seq("params", "metric", "best_so_far")).foreach { node =>
      val pn = node.get("params")
      val p = pn.fieldNames.asScala
        .map(k => k -> pn.get(k).asDouble()).toMap
      seen(key(p)) = node.get("metric").asDouble()
      val b = node.get("best_so_far").asDouble()
      if (!b.isNaN) best = math.max(best, b)
    }
    (p: Map[String, Double]) => {
      val k = key(p)
      seen.getOrElse(k, {
        val m = evaluate(p)
        // a diverged trial may record NaN; it must not poison the
        // running best (math.max(NaN, x) is NaN forever after)
        if (!m.isNaN) best = math.max(best, m)
        val paramsJson = p.toSeq.sortBy(_._1)
          .map { case (name, v) => s"${jstr(name)}: ${jsonNumber(v)}" }
          .mkString("{", ", ", "}")
        val record = s"""{"params": $paramsJson, """ +
          s""""metric": ${jsonNumber(m)}, """ +
          s""""best_so_far": ${jsonNumber(best)}}"""
        TrialState.appendLine(stateFile, record)
        seen(k) = m
        m
      })
    }
  }
}

/** Shared primitives for the on-disk trial-state files both
  * [[Search.resumable]] and [[Lifecycle.searchThenFinalTestAdjusted]]
  * write — one definition of the record encoding, the params key
  * canonicalization, and the tolerant reader, so the two surfaces
  * cannot drift apart. */
private[tuning] object TrialState {

  /** Canonical memo key for a parameter point. */
  def key(p: Map[String, Double]): String =
    p.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")

  /** JSON string escape covering backslash, quote, and ALL control
    * characters — exception texts routinely carry newlines (a Spark
    * AnalysisException embeds the plan), and a raw newline would split
    * the record across physical lines, breaking the resume it was
    * recorded to enable. */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Doubles via Double.toString (round-trips exactly); NaN/Infinity
    * emit as bare words, which the tolerant reader accepts. */
  def jsonNumber(v: Double): String = v.toString

  private def newMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // a diverged trial can legitimately record NaN/-Infinity
    m.configure(com.fasterxml.jackson.core.JsonParser.Feature
                  .ALLOW_NON_NUMERIC_NUMBERS, true)
    m
  }

  /** Parse the state file's records, skipping blank lines, lines that
    * are not JSON objects (e.g. a pre-JSONL tab-separated state from
    * an older build), and records missing any of `requiredFields`
    * (e.g. a file written by the OTHER state surface, or a truncated
    * final line after a crash) — a skipped trial simply re-evaluates
    * rather than crashing the resume it was recorded to enable. */
  def readRecords(stateFile: java.nio.file.Path,
                  requiredFields: Seq[String])
      : Seq[com.fasterxml.jackson.databind.JsonNode] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(stateFile)) return Seq.empty
    val mapper = newMapper
    java.nio.file.Files.readAllLines(stateFile).asScala.toSeq
      .filter(l => l.nonEmpty && l.startsWith("{"))
      .flatMap(l => scala.util.Try(mapper.readTree(l)).toOption)
      // hasNonNull: an explicit JSON null must not pass (get returns
      // NullNode, never null — asDouble on it fabricates 0.0)
      .filter(n => requiredFields.forall(n.hasNonNull))
  }

  /** Append one record line (CREATE + APPEND). */
  def appendLine(stateFile: java.nio.file.Path, line: String): Unit =
    java.nio.file.Files.write(stateFile, (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
}
