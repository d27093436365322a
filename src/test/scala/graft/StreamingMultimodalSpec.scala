package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, UserSessions}
import graft.multimodal.Multimodal

/** Structured Streaming + multimodal plumbing smoke tests. */
class StreamingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("hourly windowed agg over a memory stream matches batch counts") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(ts(5), 1, "click", 1.0), Event(ts(10), 2, "view", 2.0),
      Event(ts(55), 1, "click", 3.0),
      Event(Timestamp.valueOf("2024-01-01 11:05:00"), 1, "click", 4.0))
    val out2 = EventStreams.runToMemory(
      spark, EventStreams.hourlyWindowedAgg(stream.toDF()),
      "win_test2", OutputMode.Complete())
    val rows = out2.collect()
      .map(r => (r.getAs[Timestamp]("wstart").toString,
                 r.getAs[String]("eventType")) -> r.getAs[Long]("n")).toMap
    assert(rows(("2024-01-01 10:00:00.0", "click")) == 2)
    assert(rows(("2024-01-01 10:00:00.0", "view")) == 1)
    assert(rows(("2024-01-01 11:00:00.0", "click")) == 1)
  }

  test("stateful session counting splits on the gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // user 1: events at 10:00, 10:05 (same session), 11:30 (new session)
    stream.addData(
      Event(ts(0), 1, "click", 1.0), Event(ts(5), 1, "click", 1.0),
      Event(Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 1.0),
      Event(ts(1), 2, "view", 1.0))
    val sessions = EventStreams.sessionCounts(
      stream.toDS(), gapMs = 30 * 60 * 1000L)
    val out = EventStreams.runToMemory(
      spark, sessions.toDF(), "sess_test", OutputMode.Update())
    val m = out.as[UserSessions].collect()
      .map(s => s.userId -> s).toMap
    assert(m(1L).nSessions == 2 && m(1L).nEvents == 3)
    assert(m(2L).nSessions == 1 && m(2L).nEvents == 1)
  }

  test("multimodal stub pipeline: binary payload → batched features") {
    val docs = Seq((7L, "hello world"), (8L, "spark engine"))
      .toDF("doc_id", "text")
    val media = Multimodal.asBinaryPayload(
      docs, col("doc_id"), col("text"), "text")
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.mediaId -> f).toMap
    assert(feats(7L).nBytes == "hello world".length)
    assert(feats(7L).digest ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes)
        .map("%02x".format(_)).mkString)
    assert(feats(7L).embedding.length == 8)
    assert(feats(7L).embedding.forall(v => v >= 0f && v < 1f))
  }
}
