package graft.core

/** Concurrent driver-side actions over independent work items
  * (optimization guide §2.6 "overlap independent jobs"): Spark's
  * scheduler happily runs several jobs at once inside one application
  * — actions are only sequential because driver code calls them
  * sequentially. On small per-job task counts (the lifecycle tier's
  * fit+evaluate pipelines) a sequential chain leaves most of the
  * machine idle; submitting the independent chains from a small thread
  * pool lets the next job's tasks back-fill the current job's tail.
  *
  * Result order and every seed are fixed, so outputs are unaffected —
  * only wall-clock changes. The q135 smoke-search pattern, factored
  * out so the lifecycle queries can reuse it:
  *
  *  - one DAEMON thread per item (a wedged thread never keeps the JVM
  *    alive);
  *  - every Spark action a body submits is tagged with `group`
  *    (thread-local), so the bounded-wait timeout path can actually
  *    CANCEL in-flight work instead of leaving it to burn under
  *    whatever runs next;
  *  - [[CacheScope]]'s DynamicVariable is an InheritableThreadLocal,
  *    so pool threads created here inherit the caller's scope — bodies
  *    that want earlier release wrap themselves in
  *    `CacheScope.scoped`.
  */
object Par {
  def run[A, B](sc: org.apache.spark.SparkContext, group: String,
                timeoutMinutes: Int, items: Seq[A])(f: A => B): Seq[B] = {
    if (items.sizeIs <= 1) return items.map(f)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.{Duration, MINUTES}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      items.size,
      (r: Runnable) => {
        val th = new Thread(r, group)
        th.setDaemon(true)
        th
      })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = items.map { it =>
      Future {
        sc.setJobGroup(group, s"$group: $it", true)
        f(it)
      }
    }
    try Await.result(Future.sequence(futures),
                     Duration(timeoutMinutes, MINUTES))
    catch {
      // ANY failure cancels the group (ADVICE r14): when one item's
      // body throws, Await.result rethrows immediately while sibling
      // in-flight Spark jobs keep running on daemon threads — without
      // the cancel they burn executors under whatever runs next and
      // pollute subsequent bench timings
      case e: Throwable =>
        sc.cancelJobGroup(group)
        pool.shutdownNow()
        throw e
    }
    finally pool.shutdown()
  }
}
