package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized differential tests: the engine's custom operators against
  * straightforward O(n²)/union-find reference implementations on seeded
  * random inputs. Fixed fixtures pin known cases; these pin the
  * operators' semantics across hundreds of adversarially-shaped random
  * cases (duplicate timestamps, singleton components, empty matches,
  * boundary-sitting points).
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches the brute-force point-in-time lookup") {
    val rnd = new Random(42)
    // small key/time domains force collisions: same-key duplicate ts
    // across sides, keys with no right rows, left rows before any right
    val left = (0 until 150).map(i =>
      (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong))
    val right = (0 until 150).map(i =>
      (2000L + i, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong))
    val l = left.toDF("event_id", "k", "t")
      .withColumn("ts", timestamp_millis(col("t") * 1000))
    val r = right.toDF("event_id", "k", "t")
      .withColumn("ts", timestamp_millis(col("t") * 1000))
      .withColumn("r_id", col("event_id"))
    val got = graft.operators.Relational.asofJoin(
        l, r, key = "k", ts = "ts", tie = "event_id",
        payload = Seq("r_id"))
      .select(col("event_id"),
              when(col("asof").isNull, -1L).otherwise(col("asof.r_id")))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // reference: for each left row, the right row with max (t, id)
    // among those with t <= left.t and the same key
    left.foreach { case (lid, lk, lt) =>
      val want = right.filter { case (_, rk, rt) => rk == lk && rt <= lt }
        .sortBy { case (rid, _, rt) => (rt, rid) }
        .lastOption.map(_._1).getOrElse(-1L)
      assert(got(lid) == want, s"left $lid: got ${got(lid)}, want $want")
    }
  }

  test("rangeJoin matches the brute-force containment join") {
    val rnd = new Random(7)
    val pts = (0 until 200).map(i => (i.toLong, rnd.nextDouble() * 100))
    val ivs = (0 until 60).map { i =>
      val lo = rnd.nextDouble() * 100
      (1000L + i, lo, lo + rnd.nextDouble() * 20)
    }
    val got = graft.operators.Relational.rangeJoin(
        pts.toDF("pid", "v"), ivs.toDF("iid", "lo", "hi"),
        v = "v", lo = "lo", hi = "hi", bucketWidth = 6.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, v) <- pts
      (iid, lo, hi) <- ivs
      if v >= lo && v <= hi
    } yield (pid, iid)).toSet
    assert(got == want,
      s"missing ${want -- got}; spurious ${got -- want}")
  }

  test("connectedComponents matches union-find on random graphs") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val n = 300
      // sparse graph → many components of varying diameter
      val pairs = (0 until 200).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val got = graft.dedup.Dedup.connectedComponents(
          pairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: path-compressing union-find, min id as root label
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      inGraph.foreach { v =>
        assert(got(v) == find(v.toInt).toLong,
          s"seed $seed node $v: got ${got(v)}, want ${find(v.toInt)}")
      }
      assert(got.keySet == inGraph, "exactly the non-singleton nodes")
    }
  }

  test("native session_window matches the batch sessionize on random " +
       "event logs") {
    // both operators use the same boundary convention (exactly-gap
    // successor continues the session), so on any input their session
    // partitions must be identical — compared here as per-user session
    // count plus the multiset of per-session event counts
    val rnd = new Random(47)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val gapMs = 15 * 60 * 1000L
    val events = (0 until 3000).map { i =>
      (rnd.nextInt(25).toLong,
       new java.sql.Timestamp(base + rnd.nextInt(8 * 3600) * 1000L +
                              rnd.nextInt(997)),
       1.0, i.toLong)
    }.toDF("userId", "ts", "value", "eid")
    val native = graft.streaming.EventStreams.sessionWindowAgg(
        events, "userId", "ts", "value", "15 minutes")
      .select(col("userId"), col("n_events"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    val batch = graft.stats.Stats.sessionize(
        events, col("userId"), col("ts"), col("eid"), gapMs)
      .groupBy(col("userId"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("userId"), col("n_events"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    assert(native == batch)
  }
}
