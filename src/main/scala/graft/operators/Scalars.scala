package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Qh}

/** Array / date / string / math scalar-function surface (SURVEY.md §2.7).
  *
  * Reference shapes: list explode Utils/dataset.py:404-410; array
  * position/size test_dataset_consistency.py:319-419; epoch→datetime +
  * calendar parts Utils/dataset.py:1483-1568; math in metrics/weighting
  * Base/Evaluation/metrics.py:209-211, Base/IR_feature_weighting.py:36;
  * tokenization Data_manager/TagPreprocessing.py:20-62; clipping
  * Base/Evaluation/metrics.py:244-246.
  *
  * Transcendental results are rounded to 6 decimals: JVM and libm may
  * differ in the final ulp.
  */
object Scalars {

  def queries: Seq[Q] = Seq(

    // F3/F4 + element access over the embedding ArrayType column.
    Q("q17_array_ops",
      t => t.embeddings.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_v"),
        round(element_at(col("embedding"), -1).cast("double"), 6).as("last_v"),
        col("label")),
      Some("""SELECT vec_id, len(embedding) AS dim,
             |round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
             |round(CAST(embedding[-1] AS DOUBLE), 6) AS last_v,
             |label FROM embeddings""".stripMargin)),

    // F1 — positional explode of an array column (bounded subset).
    Q("q18_array_explode",
      t => t.embeddings.filter(col("vec_id") < 20)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos"),
                round(col("v").cast("double"), 6).as("val")),
      Some("""SELECT vec_id, CAST(i - 1 AS INT) AS pos,
             |round(CAST(embedding[CAST(i AS INT)] AS DOUBLE), 6) AS val
             |FROM embeddings,
             |UNNEST(generate_series(1, len(embedding))) AS t(i)
             |WHERE vec_id < 20""".stripMargin)),

    // F5/F6 — calendar decomposition of the event timestamp. Spark
    // dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday.
    Q("q19_date_parts",
      t => t.events.groupBy(
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
          dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
             |CAST(dayofmonth(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
             |CAST(dayofweek(ts) + 1 AS INT) AS dow, COUNT(*) AS n
             |FROM events GROUP BY 1,2,3,4,5""".stripMargin)),

    // F7 — timestamp pretty-printing (month buckets as strings).
    Q("q20_date_format",
      t => t.events.groupBy(date_format(col("ts"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users")),
      Some("""SELECT strftime(ts, '%Y-%m') AS ym, COUNT(*) AS n,
             |COUNT(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1""".stripMargin)),

    // F8 — log/ln/log2/sqrt/pow/exp scalar math (Spark log == DuckDB ln).
    Q("q21_math_scalars",
      t => t.lineitem.filter(col("l_linenumber") === 1).select(
        col("l_orderkey"),
        round(log(col("l_quantity") + 1), 6).as("ln_qty"),
        round(log2(col("l_quantity") + 1), 6).as("log2_qty"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        round(pow(lit(1.0) + col("l_discount"), 2), 6).as("pow_disc"),
        round(exp(col("l_tax")), 6).as("exp_tax")),
      Some("""SELECT l_orderkey,
             |round(ln(l_quantity + 1), 6) AS ln_qty,
             |round(log2(l_quantity + 1), 6) AS log2_qty,
             |round(sqrt(l_extendedprice), 6) AS sqrt_price,
             |round(pow(1.0 + l_discount, 2), 6) AS pow_disc,
             |round(exp(l_tax), 6) AS exp_tax
             |FROM lineitem WHERE l_linenumber = 1""".stripMargin)),

    // F9 — tokenization + string predicates over free text.
    Q("q22_string_ops",
      t => t.documents.select(
        col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        size(split(col("text"), "\\s+")).as("n_tokens"),
        upper(substring(col("lang"), 1, 2)).as("lang_uc"),
        col("text").contains("spark").cast("int").as("has_spark"),
        size(split(col("text"), " table ")).minus(1).as("n_table_mentions")),
      Some("""SELECT doc_id, length(text) AS n_chars_actual,
             |len(string_split_regex(text, '\s+')) AS n_tokens,
             |upper(substr(lang, 1, 2)) AS lang_uc,
             |CAST(contains(text, 'spark') AS INT) AS has_spark,
             |CAST(len(string_split(text, ' table ')) - 1 AS INT)
             |  AS n_table_mentions
             |FROM documents""".stripMargin)),

    // F10 — clip to range via least/greatest.
    Q("q23_clip",
      t => t.events.select(
        col("event_id"),
        greatest(least(col("value"), lit(15.0)), lit(5.0)).as("value_clipped")),
      Some("""SELECT event_id,
             |greatest(least(value, 15.0), 5.0) AS value_clipped
             |FROM events""".stripMargin))
  )
}
