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
