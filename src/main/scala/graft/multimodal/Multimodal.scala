package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by batched per-partition
  * feature extraction (the Scala analog of a Pandas-UDF/`mapInPandas`
  * stage: one decoder instantiation per partition, rows streamed
  * through it).
  *
  * The decode step is a STUB — media codecs are not available in this
  * environment — implemented as a deterministic fake (md5-derived
  * pseudo-features). The Spark-side plumbing is real: binary schema,
  * partition-batched execution, fixed-width feature vectors, and
  * metadata structs survive a swap-in of a real decoder unchanged.
  */
object Multimodal {

  final case class MediaRow(mediaId: Long, kind: String,
                            payload: Array[Byte])
  final case class MediaFeatures(mediaId: Long, kind: String,
                                 nBytes: Int, digest: String,
                                 embedding: Array[Float])

  /** Wrap a text column as a fake binary payload — stands in for real
    * media bytes so the downstream plumbing is exercised end-to-end. */
  def asBinaryPayload(df: DataFrame, id: org.apache.spark.sql.Column,
                      payload: org.apache.spark.sql.Column,
                      kind: String): DataFrame =
    df.select(id.cast("long").as("mediaId"), lit(kind).as("kind"),
              payload.cast("binary").as("payload"))

  /** STUB decoder: a real implementation would decode the payload
    * (image decode / resample / frame-sample) — deterministic fake:
    * an 8-dim embedding from the md5 digest bytes, scaled to [0,1). */
  private def decodeStub(payload: Array[Byte]): (String, Array[Float]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(payload)
    val hex = d.map("%02x".format(_)).mkString
    val emb = d.take(8).map(b => ((b & 0xff) / 255.0f))
    (hex, emb)
  }

  /** Frame sampling over an opaque binary payload: every `everyNth`
    * fixed-width byte window ("frame") up to `maxFrames` per media row
    * — the Spark side of a video frame-sampler. Wholly declarative
    * (sequence + explode + substring on binary, all codegen'd): the
    * payload never leaves Tungsten rows, each frame carries its byte
    * length and md5 so a downstream decoder (stubbed here, see
    * [[extractFeatures]]) can dedup/verify frames before decode.
    * Returns (media_id, frame_idx, frame_bytes, frame_md5, frame). */
  def frameSample(media: DataFrame, frameBytes: Int, everyNth: Int,
                  maxFrames: Int): DataFrame = {
    val stride = frameBytes * everyNth
    media
      // sequence(0, -1) descends instead of producing an empty array, so
      // zero-byte payloads must be excluded before the explode
      .where(length(col("payload")) > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          least(lit(maxFrames - 1),
                floor((length(col("payload")) - 1) / stride).cast("int")))))
      .select(
        col("mediaId").as("media_id"),
        col("frame_idx"),
        expr(s"substring(payload, frame_idx * $stride + 1, $frameBytes)")
          .as("frame"))
      .withColumn("frame_bytes", length(col("frame")))
      .withColumn("frame_md5", md5(col("frame")))
  }

  /** Batched feature extraction: mapPartitions gives one decoder
    * lifetime per partition (≈ one Python worker batch in mapInPandas);
    * rows stream through without per-row setup cost. Output schema is a
    * fixed-width feature vector + digest, ready for the ANN operators. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts, models)
      rows.map { r =>
        val (digest, emb) = decodeStub(r.payload)
        MediaFeatures(r.mediaId, r.kind, r.payload.length, digest, emb)
      }
    }
  }
}
