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
        |FROM documents""".stripMargin)),

    // Frame sampling: every 2nd 32-byte window of the payload, up to 4
    // frames per media row, with per-frame length + md5. The payloads
    // are ASCII text stand-ins, so the byte slices are reproducible as
    // SQL substrings.
    Q("q91_frame_sample", { t =>
        val media = Multimodal.asBinaryPayload(
          t.documents, col("doc_id"), col("text"), "video")
        Multimodal.frameSample(media, frameBytes = 32, everyNth = 2,
                               maxFrames = 4)
          .select(col("media_id"), col("frame_idx"), col("frame_bytes"),
                  col("frame_md5"))
      },
      Some("""SELECT doc_id AS media_id, CAST(x AS INT) AS frame_idx,
        |  CAST(len(substr(text, CAST(x * 64 + 1 AS INT), 32)) AS INT)
        |    AS frame_bytes,
        |  md5(substr(text, CAST(x * 64 + 1 AS INT), 32)) AS frame_md5
        |FROM documents, UNNEST(generate_series(0, 3)) t(x)
        |WHERE x * 64 < len(text)""".stripMargin))
  )
}
