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

  /** Cumulative hypervisor-steal jiffies (/proc/stat aggregate cpu
    * line, field 9 = steal): CPU time the HOST withheld from this VM.
    * The one contamination channel the in-VM instruments cannot see —
    * extBusyFrac reads 0.000x while the host steals 30-50% of a core
    * (the r9-r12 contaminated-BENCH class, SURVEY §6.w‴). −1 when
    * unreadable (bare metal / non-Linux). */
  def stealJiffies(): Long =
    try scala.util.Using.resource(
      scala.io.Source.fromFile("/proc/stat")) { src =>
        val p = src.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        if (p.length > 7) p(7) else -1L
      }
    catch { case _: Throwable => -1L }

  /** Steal over a sample window, expressed as a FRACTION OF ONE CORE
    * (jiffies/sec ÷ USER_HZ 100 — the kernel's fixed /proc/stat tick):
    * 0.3 means the host is withholding ~30% of a core, the magnitude
    * band measured to inflate this box's wall clocks 1.3-3×. −1 when
    * unreadable. */
  def stealCoreFrac(windowMs: Int): Double = {
    val s1 = stealJiffies()
    if (s1 < 0) return -1.0
    Thread.sleep(windowMs.toLong)
    val s2 = stealJiffies()
    if (s2 < 0) return -1.0
    (s2 - s1) * 1000.0 / (windowMs * 100.0)
  }

  /** Steal-of-one-core fraction across an already-timed span: jiffy
    * delta ÷ elapsed ÷ USER_HZ — zero extra wall cost, so every timed
    * measurement can carry its own steal attribution. −1 when either
    * sample was unreadable or the span is degenerate. */
  def stealCoreFracOver(s1: Long, s2: Long, elapsedSec: Double): Double =
    if (s1 < 0 || s2 < 0 || elapsedSec <= 0) -1.0
    else (s2 - s1) / (elapsedSec * 100.0)

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
