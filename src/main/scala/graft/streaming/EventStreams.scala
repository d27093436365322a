package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Structured-Streaming surface: the streaming twins of the batch
  * analytics (q29 tumbling window, q28 sessionization).
  *
  * The reference is batch-only (SURVEY.md §1.1 — "no streaming surface
  * to reproduce"), so this module is engine capability beyond parity:
  * the same event-log aggregations running incrementally with
  * watermarked state, which is what a 100 TB/day ingest pipeline
  * actually needs.
  */
object EventStreams {

  final case class Event(ts: java.sql.Timestamp, userId: Long,
                         eventType: String, value: Double)
  final case class UserSessions(userId: Long, nSessions: Long,
                                nEvents: Long)

  /** File-source streaming scan of the events table: the driver-
    * generated parquet carries TIMESTAMP(NANOS), so ts is read as raw
    * int64 nanos (explicit schema + legacy conf) and converted to a
    * µs timestamp — same convention as the batch reader
    * (core.Tables.events). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-source schema must match the parquet's physical layout,
    // which has shipped both as TIMESTAMP(NANOS) (→ raw int64 under
    // the legacy conf) and native TIMESTAMP(MICROS): probe the footer
    // with a one-off batch read and declare ts accordingly (same
    // dual-layout dispatch as the batch reader, core.Tables.events).
    // When the file has not landed yet — the standard reason a
    // file-source stream takes a user-declared schema — the probe
    // cannot run; default to the current generation's native layout
    // rather than failing stream construction. Only the path-missing
    // case falls back: a probe failure on an EXISTING file (corrupt
    // footer, mid-write) still fails fast here, not as a schema
    // mismatch on every later micro-batch. Existence goes through the
    // Hadoop filesystem of the path, so hdfs:///s3a:// dirs probe
    // correctly (java.io.File would report false for any scheme-
    // qualified path and silently skip the probe).
    val probePath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val probeFs = scala.util.Try(
      probePath.getFileSystem(spark.sessionState.newHadoopConf()))
    val probeStatus = probeFs.flatMap(fs =>
      scala.util.Try(fs.getFileStatus(probePath))).toOption
    val tsType =
      if (probeStatus.isDefined)
        spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      else TimestampNTZType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // events.parquet ships in two layouts: a single FILE (the driver's
    // testdata) and a part-file DIRECTORY (any Spark writer, e.g. the
    // scale synthesizer). pathGlobFilter matches LEAF file names only,
    // so filtering the parent dir for "events.parquet" reads zero rows
    // in the directory layout — stream the table path itself when it is
    // a directory, and keep the leaf filter (which excludes the other
    // tables' files) only for the single-file layout.
    val raw =
      if (probeStatus.exists(_.isDirectory))
        spark.readStream.schema(schema).parquet(s"$dir/events.parquet")
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
    (if (tsType == LongType)
       raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
     else raw.withColumn("ts", col("ts").cast(TimestampType)))
      .withColumnRenamed("event_type", "eventType")
  }

  /** Tumbling 1-hour windowed counts + sums with a 2-hour watermark —
    * the streaming twin of q29_time_window. */
  def hourlyWindowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("eventType"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("wstart"), col("eventType"),
              col("n"), col("sum_value"))

  /** Stateful gap-based session counting per user via
    * mapGroupsWithState — the streaming twin of Stats.sessionize.
    * State = (last event ms, session count, event count). */
  def sessionCounts(events: Dataset[Event], gapMs: Long)
      : Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[(Long, Long, Long), UserSessions](
        GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[(Long, Long, Long)]) =>
          val (lastMs0, sessions0, n0) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          var lastMs = lastMs0
          var sessions = sessions0
          var n = n0
          evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val ms = e.ts.getTime
            if (lastMs == Long.MinValue || ms - lastMs > gapMs)
              sessions += 1
            lastMs = ms
            n += 1
          }
          state.update((lastMs, sessions, n))
          UserSessions(uid, sessions, n)
      }
  }

  final case class SessionRecord(userId: Long, startTs: Long, endTs: Long,
                                 nEvents: Long, sumValue: Double,
                                 closedBy: String)

  /** Stateful session EMISSION via flatMapGroupsWithState — where
    * [[sessionCounts]] maintains per-user aggregates, this emits one
    * RECORD per closed session (start/end/size/value), the shape a
    * downstream training pipeline actually consumes. A session closes
    * when a later event arrives past the gap ("gap") or when the
    * event-time timeout fires with no successor ("timeout") — the
    * timeout is what guarantees the LAST session of an idle user is
    * eventually emitted, which a pure gap rule never does on an
    * unbounded stream. State per user is one open session (constant),
    * expired by watermark + timeout: bounded at any corpus rate. */
  def sessionRecords(events: Dataset[Event], gapMs: Long)
      : Dataset[SessionRecord] = {
    import events.sparkSession.implicits._
    // open-session state: (start, end, n, sum)
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[(Long, Long, Long, Double), SessionRecord](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[(Long, Long, Long, Double)]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // idle past the gap horizon: close and emit the open session
            val (s, e, n, v) = state.get
            state.remove()
            Iterator.single(SessionRecord(uid, s, e, n, v, "timeout"))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer
              .empty[SessionRecord]
            // General INTERVAL MERGE over the batch's events plus the
            // open-session interval, all sorted by start time: the
            // per-case state machine this replaces mishandled MULTIPLE
            // in-watermark stragglers before the open session (each
            // was closed as its own singleton even when they fell
            // within a gap of each other). Merging sorted intervals
            // whenever the next start is within `gapMs` of the current
            // end handles every arrival order uniformly — stragglers
            // sessionize among themselves, bridge into the open
            // session exactly when a real gap does not separate them,
            // and endTs can never regress (end = max). The open
            // session is just one more interval in the sweep.
            // no pre-sort of evs: the interval sweep below sorts the
            // combined list, and the merge aggregates are
            // order-insensitive (min/max/sum), so one sort suffices
            val items: Seq[(Long, Long, Long, Double)] =
              state.getOption.toSeq ++
              evs.map(e => (e.ts.getTime, e.ts.getTime, 1L, e.value)).toSeq
            var open: Option[(Long, Long, Long, Double)] = None
            items.sortBy(it => (it._1, it._2)).foreach {
              case it @ (s2, e2, n2, v2) =>
                open match {
                  case Some((s, e, n, v)) if s2 <= e + gapMs =>
                    open = Some((s, math.max(e, e2), n + n2, v + v2))
                  case Some((s, e, n, v)) =>
                    closed += SessionRecord(uid, s, e, n, v, "gap")
                    open = Some(it)
                  case None =>
                    open = Some(it)
                }
            }
            open.foreach { o =>
              state.update(o)
              // close via timeout once event time passes end + gap
              state.setTimeoutTimestamp(o._2 + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Per-session aggregates via Spark's NATIVE `session_window`
    * (3.2+) — the built-in twin of [[sessionRecords]]: when per-session
    * aggregates are all that is needed, the declarative form needs no
    * custom state function, merges overlapping sessions (late
    * in-watermark events included) by construction, and executes the
    * specialized UpdatingSessions/MergingSessions operators. Prefer
    * this; [[sessionRecords]] stays for semantics the built-in cannot
    * express (gap-vs-timeout close attribution, custom emission).
    *
    * Boundary semantics, fixture-pinned: a session window is
    * [ts, ts+gap] for merging purposes — ADJACENT windows merge, so a
    * successor exactly `gap` later CONTINUES the session (same
    * convention as [[graft.stats.Stats.sessionize]]'s strict-> gap
    * test; the q138 oracle uses the matching strict > break). Event
    * times are truncated to milliseconds first so the gap decision is
    * made on the same values in both engines.
    *
    * Same code runs on batch and streaming frames (the Spark idiom);
    * for streaming Append mode pass `watermark` — it must attach to
    * the SAME column the session groups on, which is why it is a
    * parameter here rather than an upstream concern. Returns
    * (userId, startMs, endMs, nEvents, sumValue) with
    * end = last event + gap (the native convention). */
  def sessionWindowAgg(events: DataFrame, userCol: String,
                       tsCol: String, valueCol: String,
                       gap: String,
                       watermark: Option[String] = None): DataFrame = {
    val truncated =
      events.withColumn("_ts", date_trunc("millisecond", col(tsCol)))
    watermark.fold(truncated)(w => truncated.withWatermark("_ts", w))
      .groupBy(col(userCol), session_window(col("_ts"), gap))
      .agg(count(lit(1)).as("n_events"),
           graft.Qh.dsum(col(valueCol)).as("sum_value"))
      .select(col(userCol),
              unix_millis(col("session_window.start")).as("start_ms"),
              unix_millis(col("session_window.end")).as("end_ms"),
              col("n_events"), col("sum_value"))
  }

  /** Streaming exact dedup: drop events whose content fingerprint was
    * already seen, with watermarked state so the seen-set is bounded to
    * the watermark horizon — the streaming twin of Dedup.exactDupGroups
    * for a continuous-ingest corpus pipeline. `fingerprintCols` must
    * include the event-time column used by the watermark. */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
                  fingerprintCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(fingerprintCols)

  /** Stream-static enrichment + windowed rollup: each micro-batch joins
    * the bounded static dimension on the broadcast side — the stream
    * never shuffles for the join, the dimension is re-resolvable per
    * batch (Spark re-plans stream-static joins every micro-batch, so a
    * refreshed dimension table is picked up) — then aggregates per
    * (window, segment) under the watermark. The continuous-ingest twin
    * of the batch join-aggregate: at 100 TB/day the only stateful
    * stage is the windowed aggregate, bounded by the watermark. */
  def enrichedWindowedAgg(events: DataFrame, dim: DataFrame,
                          key: String, segment: String,
                          tsCol: String = "ts",
                          valueCol: String = "value",
                          windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(segment))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_value"))
      .select(col("window.start").as("wstart"), col(segment),
              col("n"), col("sum_value"))

  /** Stream-stream interval join — the continuous form of the as-of
    * lookup (operators.Relational.asofJoin): purchases join the same
    * user's clicks from the preceding `windowMs` milliseconds. Both
    * sides carry watermarks, so Spark bounds the buffered state to the
    * interval horizon — the property that lets the join run forever on
    * an unbounded stream. Inputs need distinct column names
    * (`ts`/`userId` on the left, `clickTs`/`clickUserId` on the
    * right); output is one row per (purchase, matching click). */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame,
                   windowMs: Long, watermark: String): DataFrame = {
    val l = purchases.withWatermark("ts", watermark)
    val r = clicks.withWatermark("clickTs", watermark)
    l.join(r,
      col("userId") === col("clickUserId") &&
      col("clickTs") <= col("ts") &&
      col("clickTs") >= col("ts") - expr(s"INTERVAL $windowMs MILLISECONDS"))
  }

  /** Drive a streaming DataFrame to completion against a memory sink and
    * return the materialized result — the local-smoke harness
    * (batch parquet in, streaming semantics, synchronous). */
  def runToMemory(spark: SparkSession, streaming: DataFrame,
                  queryName: String, outputMode: OutputMode): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(queryName).outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
