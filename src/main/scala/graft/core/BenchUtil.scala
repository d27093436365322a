package graft.core

/** Helpers shared by the measurement mains (graft.Bench, graft.Soak) so
  * the load-sampling, median, and JSON-emission conventions cannot
  * silently fork between the two harnesses — their numbers end up in
  * the same SURVEY tables. */
object BenchUtil {

  /** 1-minute loadavg — the mechanical machine-vs-code discriminator
    * sampled around heavy measurements; −1 when unreadable. */
  def loadavg(): Double =
    try scala.util.Using.resource(
      scala.io.Source.fromFile("/proc/loadavg")) { src =>
        src.getLines().next().split(" ")(0).toDouble
      }
    catch { case _: Throwable => -1.0 }

  /** (busy, total) jiffies across all CPUs from /proc/stat line 1;
    * busy = total − idle − iowait. (-1,-1) when unreadable. */
  private def cpuTotals(): (Long, Long) =
    try scala.util.Using.resource(
      scala.io.Source.fromFile("/proc/stat")) { src =>
        val p = src.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        val total = p.sum
        val idle = p(3) + (if (p.length > 4) p(4) else 0L)
        (total - idle, total)
      }
    catch { case _: Throwable => (-1L, -1L) }

  /** utime+stime jiffies of THIS process (/proc/self/stat fields
    * 14+15, parsed after the last ')' so comm can contain spaces). */
  private def selfTicks(): Long =
    try scala.util.Using.resource(
      scala.io.Source.fromFile("/proc/self/stat")) { src =>
        val line = src.mkString
        val rest = line.substring(line.lastIndexOf(')') + 2).split(" ")
        rest(11).toLong + rest(12).toLong
      }
    catch { case _: Throwable => -1L }

  /** Fraction of box CPU consumed by processes OTHER than this JVM
    * over a short sample window — the honest per-rep idle instrument:
    * 1-minute loadavg is a lagging decay of a measurement run's OWN
    * finished work (a 32-core rep leaves loadavg ~30 for minutes with
    * nothing actually running), while this reads actual jiffies and
    * subtracts our own. −1 when /proc is unreadable. */
  def extBusyFrac(windowMs: Int): Double = {
    val (b1, t1) = cpuTotals(); val s1 = selfTicks()
    if (t1 < 0 || s1 < 0) return -1.0
    Thread.sleep(windowMs.toLong)
    val (b2, t2) = cpuTotals(); val s2 = selfTicks()
    if (t2 < 0 || s2 < 0) return -1.0
    val dt = math.max(1L, t2 - t1)
    math.max(0.0, (b2 - b1 - (s2 - s1)).toDouble / dt)
  }

  /** Median; even N takes the mean of the two middle elements (the
    * upper-middle alone would bias toward the slower run). */
  def median(ts: Seq[Double]): Double = {
    require(ts.nonEmpty)
    val sorted = ts.sorted
    val n = sorted.size
    if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }

  /** {"k":v,…} with insertion order preserved. */
  def jmap(m: scala.collection.Map[String, Double]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  /** jmap with values rounded to 3 decimals (compact emission). */
  def jmapRounded(m: scala.collection.Map[String, Double]): String =
    m.map { case (k, v) =>
      "\"" + k + "\":" + math.round(v * 1000) / 1000.0
    }.mkString("{", ",", "}")
}
