package graft.multimodal

import org.apache.spark.sql.functions._
import graft.Q

/** Oracle-checked query for the multimodal plumbing: documents wrapped
  * as binary payloads, run through the batched (stub) decoder. The md5
  * digest and first embedding component are reproducible in SQL, so the
  * full binary → mapPartitions → features path is hash-checked.
  */
object MultimodalQueries {

  def queries: Seq[Q] = Seq(
    Q("q70_multimodal_features", { t =>
        val spark = t.spark
        import spark.implicits._
        val media = Multimodal.asBinaryPayload(
          t.documents, col("doc_id"), col("text"), "text")
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media).toDF()
          .select(col("mediaId"), col("kind"), col("nBytes"), col("digest"),
                  round(element_at(col("embedding"), 1).cast("double"), 4)
                    .as("emb0"))
      },
      Some("""SELECT doc_id AS mediaId, 'text' AS kind,
        |  CAST(length(text) AS INT) AS nBytes,
        |  md5(text) AS digest,
        |  round(CAST(('0x' || substr(md5(text), 1, 2))::INT AS DOUBLE)
        |        / 255.0, 4) AS emb0
        |FROM documents""".stripMargin))
  )
}
