package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding vocabulary learning (Sennrich,
  * Haddow & Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016 — the algorithm behind GPT/Llama-style
  * tokenizers). [[TextOps.bpeishTokens]] counts the PRE-tokenization
  * runs; this learns the merge table itself.
  *
  * The classic implementation is a driver-side loop over an in-memory
  * vocab dict — fine for a 30k-word corpus sample, impossible for a
  * corpus-scale vocabulary. The distributed form keeps the word table
  * as a DataFrame of (symbol-array, freq) and makes each merge round
  *   1. one aggregation: adjacent symbol pairs exploded and summed by
  *      (left, right) weighted by word freq — map-side combined, one
  *      shuffle of |distinct pairs| rows;
  *   2. one ARGMAX row to the driver (freq desc, then lexicographic —
  *      fully deterministic, no hash-order dependence);
  *   3. one narrow map applying the merge: a left-to-right greedy fold
  *      over each word's symbols (`aggregate` HOF — codegen'd, no UDF).
  * Nothing proportional to the vocabulary ever sits on the driver; the
  * driver sees exactly `nMerges` rows total. Lineage is truncated with
  * a localCheckpoint per round (the [[graft.dedup.Dedup.connectedComponents]]
  * convention) so round N's plan does not embed rounds 1..N-1.
  *
  * Word frequencies, not raw text, drive the learning (the reference
  * algorithm's own optimization): the corpus collapses to its
  * word-frequency table once, then every round costs |vocab|, not
  * |corpus|.
  */
object Bpe {

  /** End-of-word marker, a separate terminal symbol per the paper. */
  val EndOfWord = "</w>"

  /** Split a word into its initial symbol sequence:
    * characters + the terminal [[EndOfWord]]. */
  private def initSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** One greedy left-to-right merge application: every non-overlapping
    * adjacent (l, r) becomes the single symbol l+r. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 &&
               element_at(acc, -1) === lit(l) && x === lit(r),
             concat(slice(acc, lit(1), size(acc) - 1),
                    array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merges from `words` (word: String, freq numeric).
    * Returns the merge table (round, left, right, merged, pair_freq) —
    * `nMerges` rows, in learning order. Stops early if no pair is left
    * to merge. */
  def learnMerges(words: DataFrame, word: Column, freq: Column,
                  nMerges: Int): DataFrame = {
    val spark = words.sparkSession
    var vocab = words
      .select(initSymbols(word).as("syms"), freq.cast("long").as("f"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[
      (Int, String, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // adjacent pairs of each word, weighted by the word's frequency
      val top = vocab
        .select(explode(filter(
            zip_with(col("syms"),
                     slice(col("syms"), lit(2),
                           greatest(size(col("syms")) - 1, lit(0))),
                     (a, b) => struct(a.as("l"), b.as("r")))
              .cast(ArrayType(StructType(Seq(
                StructField("l", StringType),
                StructField("r", StringType))))),
            p => p.getField("r").isNotNull)).as("p"),
          col("f"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("f").as("pf"))
        .orderBy(desc("pf"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Row(l: String, r: String, pf: Long) = top(0)
        merges += ((round, l, r, l + r, pf))
        val next = vocab
          .select(applyMerge(col("syms"), l, r).as("syms"), col("f"))
          .localCheckpoint(true)
        vocab.unpersist(false)
        vocab = next
        round += 1
      }
    }
    vocab.unpersist(false)
    import spark.implicits._
    merges.toSeq.toDF("round", "left", "right", "merged", "pair_freq")
  }

  /** Encode words with a learned merge table: replay the merges in
    * learning order (the tokenizer's runtime path). */
  def encode(words: DataFrame, word: Column,
             merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.select(word.as("word"), initSymbols(word).as("syms"))) {
      case (acc, (l, r)) =>
        acc.withColumn("syms", applyMerge(col("syms"), l, r))
    }
}
