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

  test("native session_window merges late events and splits on the gap") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val gap = "30 minutes"
    // batch 1: user 1 opens a session 10:00 + 10:20
    stream.addData(
      Event(ts(0), 1, "click", 1.0), Event(ts(20), 1, "click", 2.0))
    val agg = EventStreams.sessionWindowAgg(
      stream.toDF(), "userId", "ts", "value", gap,
      watermark = Some("2 hours"))
    val q = agg.writeStream.format("memory")
      .queryName("native_session_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // batch 2: a LATE in-watermark event at 10:10 (merges into the open
    // window) and a separate session at 11:30
    stream.addData(
      Event(ts(10), 1, "click", 4.0),
      Event(Timestamp.valueOf("2024-01-01 11:30:00"), 1, "view", 8.0))
    q.processAllAvailable()
    // batch 3: advance the watermark far past everything → both close
    stream.addData(
      Event(Timestamp.valueOf("2024-01-01 16:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("native_session_test")
      .filter(col("userId") === 1L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.length == 2)
    // session 1: 10:00–10:20 events incl. the late 10:10 one; end =
    // last event + gap
    assert(rows(0) == ((ts(0).getTime, ts(20).getTime + 30 * 60 * 1000L,
                        3L, 7.0)))
    // session 2: the lone 11:30 event
    val t1130 = Timestamp.valueOf("2024-01-01 11:30:00").getTime
    assert(rows(1) == ((t1130, t1130 + 30 * 60 * 1000L, 1L, 8.0)))
  }

  test("session_window boundary: adjacent windows MERGE (exact-gap " +
       "successor continues; the q138 oracle's strict-> convention)") {
    val df = Seq(
      (1L, ts(0), 1.0),
      (1L, ts(30), 2.0),   // exactly 30min later: adjacent -> merges
      (2L, ts(0), 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:31:00"), 2.0)) // past gap
      .toDF("userId", "ts", "value")
    val rows = EventStreams.sessionWindowAgg(
        df, "userId", "ts", "value", "30 minutes")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(rows(1L) == 1, "exact-gap successor must merge (adjacent)")
    assert(rows(2L) == 2, "past-gap successor must start a new session")
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

  test("session records emit on gap close and on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // user 1: 10:00 + 10:05 (one session), then 11:30 — the first
    // session closes by GAP when 11:30 arrives
    stream.addData(
      Event(ts(0), 1, "click", 1.0), Event(ts(5), 1, "click", 2.0),
      Event(Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 4.0))
    val gap = 30 * 60 * 1000L
    val sessions = EventStreams.sessionRecords(stream.toDS(), gapMs = gap)
    val q = sessions.toDF().writeStream
      .format("memory").queryName("sessrec_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // advance event time far past 11:30 + gap: watermark moves, the
    // EventTimeTimeout fires, and the OPEN session flushes as "timeout"
    stream.addData(
      Event(Timestamp.valueOf("2024-01-01 15:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val recs = spark.table("sessrec_test")
      .as[graft.streaming.EventStreams.SessionRecord].collect()
    val byClose = recs.filter(_.userId == 1L).sortBy(_.startTs)
    assert(byClose.length == 2)
    assert(byClose(0).closedBy == "gap" && byClose(0).nEvents == 2 &&
           byClose(0).sumValue == 3.0 &&
           byClose(0).startTs == ts(0).getTime &&
           byClose(0).endTs == ts(5).getTime)
    assert(byClose(1).closedBy == "timeout" && byClose(1).nEvents == 1 &&
           byClose(1).sumValue == 4.0)
  }

  test("late events inside the watermark never regress the open session") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val gap = 30 * 60 * 1000L
    // batch 1: open session 10:00–10:20 (end = 10:20)
    stream.addData(
      Event(ts(0), 1, "click", 1.0), Event(ts(20), 1, "click", 2.0))
    val sessions = EventStreams.sessionRecords(stream.toDS(), gapMs = gap)
    val q = sessions.toDF().writeStream
      .format("memory").queryName("sessrec_late_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // batch 2, both above the watermark (08:20): a late event at 10:10
    // INSIDE the open session span (must merge via min/max — end may
    // not regress to 10:10) and a straggler at 09:00, more than a gap
    // BEFORE the session start (its own gap-closed singleton — merging
    // it would bridge a real gap)
    stream.addData(
      Event(Timestamp.valueOf("2024-01-01 10:10:00"), 1, "click", 4.0),
      Event(Timestamp.valueOf("2024-01-01 09:00:00"), 1, "click", 9.0))
    q.processAllAvailable()
    // batch 3: advance the watermark past end + gap → timeout flush
    stream.addData(
      Event(Timestamp.valueOf("2024-01-01 15:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val recs = spark.table("sessrec_late_test")
      .as[graft.streaming.EventStreams.SessionRecord].collect()
      .filter(_.userId == 1L).sortBy(_.startTs)
    recs.foreach(r => assert(r.endTs >= r.startTs,
      s"session regressed: $r"))
    assert(recs.length == 2)
    val straggler = recs(0)
    assert(straggler.closedBy == "gap" && straggler.nEvents == 1 &&
           straggler.sumValue == 9.0 &&
           straggler.startTs == straggler.endTs)
    val merged = recs(1)
    assert(merged.closedBy == "timeout" && merged.nEvents == 3 &&
           merged.sumValue == 7.0 &&
           merged.startTs == ts(0).getTime &&
           merged.endTs == ts(20).getTime)
  }

  test("multiple late stragglers sessionize among themselves") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val gap = 30 * 60 * 1000L
    // batch 1: open session at 10:00
    stream.addData(Event(ts(0), 1, "click", 1.0))
    val sessions = EventStreams.sessionRecords(stream.toDS(), gapMs = gap)
    val q = sessions.toDF().writeStream
      .format("memory").queryName("sessrec_multi_straggler")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    // batch 2: two in-watermark stragglers 20min apart, both more than
    // a gap before the open session — ONE merged straggler session,
    // not two singletons
    stream.addData(
      Event(Timestamp.valueOf("2024-01-01 08:50:00"), 1, "click", 2.0),
      Event(Timestamp.valueOf("2024-01-01 09:10:00"), 1, "click", 3.0))
    q.processAllAvailable()
    // batch 3: advance the watermark → timeout-flush the open session
    stream.addData(
      Event(Timestamp.valueOf("2024-01-01 15:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val recs = spark.table("sessrec_multi_straggler")
      .as[graft.streaming.EventStreams.SessionRecord].collect()
      .filter(_.userId == 1L).sortBy(_.startTs)
    assert(recs.length == 2)
    val straggler = recs(0)
    assert(straggler.closedBy == "gap" && straggler.nEvents == 2 &&
           straggler.sumValue == 5.0 &&
           straggler.startTs ==
             Timestamp.valueOf("2024-01-01 08:50:00").getTime &&
           straggler.endTs ==
             Timestamp.valueOf("2024-01-01 09:10:00").getTime)
    val main = recs(1)
    assert(main.closedBy == "timeout" && main.nEvents == 1 &&
           main.startTs == ts(0).getTime)
  }

  test("stream-static enrichment joins the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(ts(5), 1, "click", 1.0), Event(ts(10), 2, "view", 2.0),
      Event(ts(20), 3, "click", 4.0)) // user 3 absent from the dimension
    val dim = Seq((1L, "paid"), (2L, "free")).toDF("userId", "segment")
    val out = EventStreams.runToMemory(
      spark, EventStreams.enrichedWindowedAgg(
        stream.toDF(), dim, "userId", "segment"),
      "enrich_test", OutputMode.Complete())
    val rows = out.collect()
      .map(r => Option(r.getAs[String]("segment")) ->
             (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    assert(rows(Some("paid")) == ((1L, 1.0)))
    assert(rows(Some("free")) == ((1L, 2.0)))
    assert(rows(None) == ((1L, 4.0))) // left join keeps unmatched events
  }

  test("stream-stream interval join attributes clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    purchases.addData(
      Event(ts(30), 1, "purchase", 10.0), Event(ts(40), 2, "purchase", 5.0))
    clicks.addData(
      Event(ts(25), 1, "click", 0.0),  // 5 min before → attributed
      Event(ts(29), 1, "click", 0.0),  // 1 min before → attributed
      Event(ts(45), 1, "click", 0.0),  // after the purchase → no
      Event(ts(0), 2, "click", 0.0))   // 40 min before → outside window
    val out = EventStreams.runToMemory(
      spark, EventStreams.intervalJoin(
        purchases.toDF().select(col("ts"), col("userId"), col("value")),
        clicks.toDF().select(col("ts").as("clickTs"),
                             col("userId").as("clickUserId")),
        windowMs = 10 * 60 * 1000L, watermark = "1 hour"),
      "ssjoin_test", OutputMode.Append())
    val byUser = out.collect().groupBy(_.getAs[Long]("userId"))
      .view.mapValues(_.length).toMap
    assert(byUser.getOrElse(1L, 0) == 2) // two in-window clicks
    assert(byUser.getOrElse(2L, 0) == 0) // only a stale click
  }

  test("file-source stream over sf0.001 events matches the batch counts") {
    val streamed = EventStreams.runToMemory(
      spark,
      EventStreams.hourlyWindowedAgg(
        EventStreams.readEventStream(spark, "/root/testdata/sf0.001")),
      "file_win", OutputMode.Complete())
    val streamTotal = streamed.agg(sum("n")).head().getLong(0)
    val batchTotal = graft.core.Tables(spark, "/root/testdata/sf0.001")
      .events.count()
    assert(streamTotal == batchTotal,
           s"stream=$streamTotal batch=$batchTotal")
    assert(streamed.select("eventType").distinct().count() >= 3)
  }

  test("file-source stream reads the part-file DIRECTORY layout " +
       "(Spark-written events.parquet, the scale synthesizer's shape)") {
    // pathGlobFilter matches leaf file names only, so the single-file
    // read path silently streams ZERO rows when events.parquet is a
    // directory — regression for the layout dispatch in readEventStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_evdir").toString
    graft.core.Tables(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val streamed = EventStreams.runToMemory(
      spark,
      EventStreams.hourlyWindowedAgg(EventStreams.readEventStream(spark, dir)),
      "file_win_dir", OutputMode.Complete())
    val streamTotal = streamed.agg(sum("n")).head().getLong(0)
    val batchTotal = graft.core.Tables(spark, "/root/testdata/sf0.001")
      .events.count()
    assert(streamTotal == batchTotal,
           s"stream=$streamTotal batch=$batchTotal")
  }

  test("streaming exact dedup drops repeated fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(
      Event(ts(5), 1, "click", 1.0),
      Event(ts(5), 1, "click", 1.0),  // exact duplicate
      Event(ts(6), 1, "click", 1.0),  // same content, new event time
      Event(ts(7), 2, "view", 2.0))
    val out = EventStreams.runToMemory(
      spark,
      EventStreams.dedupStream(stream.toDF(), "ts", "1 hour",
                               Seq("ts", "userId", "eventType", "value")),
      "dedup_test", OutputMode.Append())
    assert(out.count() == 3, "one of the two identical events must drop")
    assert(out.filter(col("userId") === 2).count() == 1)
  }

  test("bounded-heap TopK aggregator matches the ranking window") {
    import org.apache.spark.sql.expressions.Window
    val scores = (for { u <- 0 until 20; i <- 0 until 30 }
      yield (u, i.toLong, ((u * 31 + i * 17) % 97).toDouble))
      .toDF("u", "item", "score")
    val w = Window.partitionBy("u")
      .orderBy(desc("score"), asc("item"))
    val windowed = scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("u", "item").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val agg = new graft.functions.TopKAggregator(5).toColumn
    val heaped = scores.as[(Int, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .flatMap { case (u, top) => top.map(t => (u, t._1)) }
      .collect().toSet
    assert(heaped == windowed)
  }

  test("frameSample windows the payload with stride and caps frames") {
    // 100-byte payload, 32-byte frames, every 2nd frame (stride 64):
    // frames start at bytes 0 and 64; both are full-width (36 ≥ 32
    // bytes remain at offset 64)
    val payload = ("ab" * 50)
    val docs = Seq((1L, payload), (2L, "short")).toDF("doc_id", "text")
    val media = Multimodal.asBinaryPayload(
      docs, col("doc_id"), col("text"), "video")
    val frames = Multimodal.frameSample(media, frameBytes = 32,
                                        everyNth = 2, maxFrames = 4)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")) ->
        (new String(r.getAs[Array[Byte]]("frame")),
         r.getAs[Int]("frame_bytes"))).toMap
    assert(frames.keySet == Set((1L, 0), (1L, 1), (2L, 0)))
    assert(frames((1L, 0)) == (payload.substring(0, 32), 32))
    assert(frames((1L, 1)) == (payload.substring(64, 96), 32))
    assert(frames((2L, 0)) == ("short", 5))
    // empty payloads emit no frames (sequence(0,-1) guard)
    val empty = Multimodal.frameSample(
      Multimodal.asBinaryPayload(Seq((3L, "")).toDF("doc_id", "text"),
                                 col("doc_id"), col("text"), "video"),
      32, 2, 4)
    assert(empty.count() == 0)
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

  test("streaming micro-batches accumulate KLL sketch increments") {
    // the streaming face of the q163 increment story: each micro-batch
    // reduces to a persistable sketch frame via foreachBatch, and the
    // merged quantiles over ALL batch frames equal the order
    // statistics of everything the stream ever saw - no batch is ever
    // rescanned (exact regime: 40 values/group total, k = 200)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Double)]
    val frames = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.sql.Row]
    val q = stream.toDF().toDF("g", "v").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        frames ++= graft.stats.Sketches
          .kllSketchFrame(batch, col("g"), col("v")).collect()
        ()
      }
      .start()
    stream.addData((1 to 20).map(i => ("a", i.toDouble)): _*)
    q.processAllAvailable()
    stream.addData((21 to 40).map(i => ("a", i.toDouble)): _*)
    stream.addData((1 to 40).map(i => ("b", i * 10.0)): _*)
    q.processAllAvailable()
    q.stop()
    // schema comes from the collected rows themselves, so a renamed
    // kllSketchFrame column fails here at the source, not confusingly
    val union = spark.createDataFrame(
      spark.sparkContext.parallelize(frames.toSeq), frames.head.schema)
    val merged = graft.stats.Sketches
      .kllMergeQuantiles(union, Seq(0.5))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(2))).toMap
    assert(merged(Some("a")) == 20.0) // inclusive median of 1..40
    assert(merged(Some("b")) == 200.0)
  }

  test("media decoder edges: header comments, top-down BMP, malformed " +
       "payloads degrade to the stub instead of failing the partition") {
    import graft.multimodal.Multimodal
    // P6 with a comment between tokens and multi-digit dims
    val p6 = "P6 # wide\n#full-line comment\n 2 1\n255\n"
      .getBytes("US-ASCII") ++
      Array(1, 2, 3, 4, 5, 6).map(_.toByte)
    val d = Multimodal.decode(p6).get
    assert(d.width == 2 && d.height == 1)
    assert(d.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // top-down BMP (negative height): rows must NOT flip
    val bb = java.nio.ByteBuffer.allocate(54 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 8)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(1).putInt(-2).putShort(1).putShort(24)
      .putInt(0).putInt(8).putInt(0).putInt(0).putInt(0).putInt(0)
    // 1px/row → 3 bytes + 1 pad; stored row 0 IS the top row here
    bb.put(30.toByte).put(20.toByte).put(10.toByte).put(0.toByte)
    bb.put(60.toByte).put(50.toByte).put(40.toByte).put(0.toByte)
    val td = Multimodal.decode(bb.array()).get
    assert(td.width == 1 && td.height == 2)
    assert(td.rgb.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60))
    // malformed rasters → None (extractFeatures then falls back):
    // truncated P6, 8bpp BMP, and an arbitrary binary blob
    assert(Multimodal.decode("P6\n9 9\n255\n".getBytes("US-ASCII"))
      .isEmpty)
    val bad = bb.array().clone(); bad(28) = 8 // bpp 8
    assert(Multimodal.decode(bad).isEmpty)
    assert(Multimodal.decode(Array[Byte](1, 2, 3)).isEmpty)
    // fallback path keeps the schema: width/height 0, md5 embedding
    val rows = Seq(Multimodal.MediaRow(9L, "blob", Array[Byte](1, 2, 3)))
    val f = Multimodal.extractFeatures(rows.toDS()).collect().head
    assert(f.width == 0 && f.height == 0 && f.embedding.length == 8)
    // resize identity: same dims reproduce the pixels
    val same = Multimodal.resizeNearest(td, 1, 2)
    assert(same.rgb.toSeq == td.rgb.toSeq)
  }

  test("ImageIO decode: PNG and GIF roundtrip bit-exactly, JPEG " +
       "within lossy tolerance, truncated payloads fall back") {
    // a 5x4 ramp with all-distinct channel values (catches any channel
    // swap or row-order slip in the getRGB read-out)
    val px = (0 until 5 * 4 * 3).map(k => ((k * 7 + 3) % 256).toByte)
      .toArray
    val src = Multimodal.Decoded(5, 4, px)
    for (fmt <- Seq("png", "gif")) {
      val enc = Multimodal.encodeImageIO(src, fmt)
      val dec = Multimodal.decode(enc)
      assert(dec.isDefined, s"$fmt must decode")
      assert(dec.get.width == 5 && dec.get.height == 4)
      assert(dec.get.rgb.toSeq == px.toSeq,
             s"$fmt is lossless: pixels must roundtrip bit-exactly")
    }
    // JPEG: lossy — dimensions exact, per-channel error bounded. The
    // fixture must be SMOOTH (a 32x32 gradient): JPEG's 8x8 DCT blocks
    // shred a high-frequency ramp (measured: 122-unit drift on the 5x4
    // fixture above), which is codec physics, not a decode bug
    val jpx = new Array[Byte](32 * 32 * 3)
    for (y <- 0 until 32; x <- 0 until 32) {
      val p = (y * 32 + x) * 3
      jpx(p) = (x * 8).toByte; jpx(p + 1) = (y * 8).toByte
      jpx(p + 2) = 128.toByte
    }
    val jsrc = Multimodal.Decoded(32, 32, jpx)
    val jenc = Multimodal.encodeImageIO(jsrc, "jpg")
    val jdec = Multimodal.decode(jenc)
    assert(jdec.isDefined && jdec.get.width == 32 &&
           jdec.get.height == 32)
    val maxErr = jdec.get.rgb.zip(jpx)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 32, s"jpeg decode drifted $maxErr > 32 units")
    // the features chain runs the ImageIO path through the SAME
    // batched operator as the raster formats
    val feats = Multimodal.extractFeatures(
        Seq(Multimodal.MediaRow(0L, "png",
                                Multimodal.encodeImageIO(src, "png")))
          .toDS()).collect().head
    assert(feats.width == 5 && feats.height == 4)
    assert(feats.embedding.sameElements(Multimodal.pixelFeatures(src)))
    // malformed: a PNG magic with garbage body must fall back, not throw
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
                           1, 2, 3)
    assert(Multimodal.decode(junk).isEmpty)
    val truncated = Multimodal.encodeImageIO(src, "png").take(20)
    assert(Multimodal.decode(truncated).isEmpty)
  }
}
