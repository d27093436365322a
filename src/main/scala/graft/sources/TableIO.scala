package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY.md §2.1 S1–S8) beyond the plain parquet scan.
  */
object TableIO {

  /** S5 — CSV → interaction triples with explicit schema, optional
    * dedup-keep-last by timestamp (reference:
    * Data_manager/DataReader_utils.py:96-170 load_CSV_into_SparseBuilder:
    * custom separator, header skip, duplicate (u,i) resolved to the
    * latest timestamp). */
  def csvInteractions(spark: SparkSession, path: String, schema: StructType,
                      sep: String, header: Boolean,
                      dedupKeepLast: Boolean): DataFrame = {
    val raw = spark.read
      .option("sep", sep).option("header", header.toString)
      .schema(schema).csv(path)
    if (!dedupKeepLast) raw
    else {
      val w = Window.partitionBy("u", "i")
        .orderBy(desc("ts"), desc("r"))
      raw.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
  }

  /** S2 — parquet sink with overwrite (reference: Utils/dataset.py:
    * 241-247); split-partitioned when a split column exists (the NPZ-
    * per-split layout of S4 becomes partition directories). */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** S3 — JSON metadata write/read (reference: Utils/dataset.py:219-226,
    * 249-254): plain single-object JSON on the driver. */
  def writeMetadata(path: String, meta: Map[String, Long]): Unit = {
    val json = meta.map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), json)
  }

  def readMetadata(spark: SparkSession, path: String): Map[String, Long] = {
    val row = spark.read.option("multiLine", "true").json(path).head()
    row.schema.fieldNames.map(f => f -> row.getAs[Long](f)).toMap
  }

  /** S7 — model persistence: a directory of parquet frames plus a JSON
    * manifest (the reference zips npz/json/csv, Base/DataIO.py:32-232;
    * a parquet directory is the cluster-readable equivalent). */
  def saveModel(path: String, frames: Map[String, DataFrame],
                params: Map[String, String]): Unit = {
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name")
    }
    val manifest = (params + ("frames" -> frames.keys.mkString(",")))
      .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(s"$path/manifest.json"), manifest)
  }

  def loadModel(spark: SparkSession, path: String)
      : (Map[String, DataFrame], Map[String, String]) = {
    val row = spark.read.option("multiLine", "true")
      .json(s"$path/manifest.json").head()
    val params = row.schema.fieldNames
      .map(f => f -> row.getAs[String](f)).toMap
    val frames = params("frames").split(",").filter(_.nonEmpty)
      .map(n => n -> spark.read.parquet(s"$path/$n")).toMap
    (frames, params)
  }

  /** S6 — cached load-or-rebuild (reference: DataReader.load_data,
    * Data_manager/DataReader.py:107-167): read the parquet cache if
    * present, else build, persist, and return. */
  def loadOrRebuild(spark: SparkSession, cachePath: String)
                   (build: => DataFrame): DataFrame =
    if (Files.exists(Paths.get(cachePath)))
      spark.read.parquet(cachePath)
    else {
      val df = build
      df.write.mode("overwrite").parquet(cachePath)
      spark.read.parquet(cachePath)
    }

  /** S8 — statistics JSON accumulation (reference: Utils/dataset.py:
    * 46-57): merge a named bundle of scalar results into a JSON document
    * on disk, preserving other bundles. */
  def accumulateStatistics(path: String, bundle: String,
                           stats: Map[String, Double]): Unit = {
    val p = Paths.get(path)
    val existing =
      if (Files.exists(p)) {
        val s = Files.readString(p).trim
        if (s.length > 2) s.substring(1, s.length - 1) + ", " else ""
      } else ""
    val entry = stats.map { case (k, v) => s""""$k": $v""" }
      .mkString(s""""$bundle": {""", ", ", "}")
    Files.createDirectories(p.getParent)
    Files.writeString(p, "{" + existing + entry + "}")
  }
}
