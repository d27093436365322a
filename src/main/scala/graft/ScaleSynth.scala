package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve soak data synthesizer: writes an N×-scaled copy of a
  * testdata directory by unioning N key-offset copies of each table —
  * the TPC-H scaling shape (both the user axis and the catalog axis
  * grow with sf; per-user interaction degree stays constant, so the
  * scaled URM is block-diagonal across copies — co-occurrence work
  * grows linearly with sf exactly as it does between real TPC-H scale
  * factors).
  *
  * Usage: ScaleSynth <srcDir> <outDir> <copies>
  *
  * Every int64 KEY column is offset by copy·10⁸ so keys stay globally
  * unique and intra-copy joins still match; non-key attributes (dates,
  * prices, text, embeddings) are carried verbatim. `nation`/`region`
  * are fixed dimension tables at every TPC-H sf and are copied once.
  * EVERY document-text token gets a per-copy PREFIX marker (not a
  * per-document suffix — a single appended token leaves token-set
  * Jaccard at n/(n+1) ≈ 1, so MinHash/LSH still buckets the twins and
  * the scaled corpus measures a synthetic ~(copies−1)/copies-duplicate
  * regime instead of scale; see the inline note at the `documents`
  * call). Prefixing makes cross-copy token sets disjoint, keeping the
  * duplicate RATE of the corpus at the source's own rate.
  */
object ScaleSynth {

  private val DefaultOff = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleSynth <srcDir> <outDir> <copies> [keyOffset]")
    val src = args(0); val out = args(1)
    val copies = args(2).toInt
    // Optional key-offset stride. The default 10^8 at >= 22 copies
    // pushes ids past 2^31 — which is itself a useful corpus shape
    // (the r12 sf3 soak caught the model tier's int-cast overflow with
    // it) — but a compact stride (e.g. 10^7) keeps every id in int
    // range so the SAME scale point can also measure an operator's
    // own curve without engaging the id-densify path.
    val Off = if (args.length == 4) args(3).toLong else DefaultOff
    require(copies >= 1)
    require(Off >= 1000000L, s"keyOffset $Off implausibly small")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events has shipped in two timestamp layouts across testdata
    // generations (see core.Tables.events) — route the read through the
    // dispatching loader so both layouts synthesize; other tables read
    // raw
    val tablesLoader = core.Tables(spark, src)
    def scaled(table: String, keyCols: Seq[String],
               extra: (DataFrame, Int) => DataFrame = (df, _) => df)
        : Unit = {
      val base =
        if (table == "events") tablesLoader.events
        else spark.read.parquet(s"$src/$table.parquet")
      // Key-offsetting is collision-free only while every source key is
      // < Off (lineitem orderkeys cross 10⁸ around source sf≈16; a
      // silent collision would cross-match intra-copy joins and corrupt
      // the measured curve rather than fail loudly).
      if (copies > 1 && keyCols.nonEmpty) {
        val maxAgg = keyCols.map(k => max(col(k).cast("long")))
        val row = base.select(
          if (maxAgg.size == 1) maxAgg.head else greatest(maxAgg: _*))
          .first()
        // max over zero rows is null — an empty source table has
        // nothing to collide, but say WHICH table instead of NPEing
        require(!row.isNullAt(0),
          s"$table: source is empty — cannot scale a table with no rows")
        val maxKey = row.getLong(0)
        require(maxKey < Off,
          s"$table: max key $maxKey >= offset stride $Off — raise Off")
      }
      val parts = (0 until copies).map { c =>
        val offset = keyCols.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(c * Off))
        }
        extra(offset, c)
      }
      parts.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"scaled $table x$copies")
    }
    def copyAsIs(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"copied $table")
    }

    copyAsIs("region")
    copyAsIs("nation")
    scaled("customer", Seq("c_custkey"))
    scaled("supplier", Seq("s_suppkey"))
    scaled("part", Seq("p_partkey"))
    scaled("orders", Seq("o_orderkey", "o_custkey"))
    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    scaled("events", Seq("event_id", "user_id"))
    scaled("documents", Seq("doc_id"),
      // keep the corpus' duplicate RATE: cross-copy texts must not be
      // near-duplicates of each other. A suffix token is NOT enough —
      // token-set Jaccard between a doc and its copy stays n/(n+1) ≈ 1
      // and MinHash/LSH still buckets the twins, turning the scaled
      // corpus into ~(copies−1)/copies duplicates (measured: the first
      // sf1 soak's dedup verify join grew ×100 on candidate pairs).
      // Prefixing EVERY token with a copy marker makes cross-copy
      // token sets disjoint, so each copy reproduces the source's own
      // duplicate structure and nothing else.
      (df, c) =>
        if (c == 0) df
        else df.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"c${c}x$$1")))
    scaled("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
