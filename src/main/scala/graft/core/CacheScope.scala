package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Deterministic lifetime management for the DataFrames graft operators
  * persist internally (shared URM subtrees, similarity matrices, hit
  * tables — anything consumed by more than one aggregation branch).
  *
  * Spark's `persist` is session-global and graft operators are pure
  * functions, so without scoping every operator call leaks its cached
  * subtrees into executor storage for the life of the SparkSession — a
  * real problem for a long-lived service calling many operators (the
  * benchmark harness works around it with `catalog.clearCache()`, which
  * a library must not do: it would drop the CALLER'S caches too).
  *
  * Operators route persists through [[CacheScope.persist]], which
  * registers the frame with the current scope:
  *
  *  - Default: the [[CacheScope.global]] scope — persists accumulate
  *    exactly as before, releasable in bulk via `global.release()`.
  *  - Scoped: `CacheScope.scoped { p3alpha(urm).collect() }` gives the
  *    body a fresh scope and unpersists everything it cached on exit.
  *
  * Unpersist is always safe (Spark recomputes), so closing a scope can
  * never corrupt a result — a frame that escapes its scope lazily just
  * loses the caching benefit. Consume (run an action on) scoped results
  * inside the block.
  */
final class CacheScope {
  private val tracked =
    new scala.collection.mutable.ArrayBuffer[() => Unit]

  /** Persist `ds` at `level` and track it for release. */
  def persist[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : Dataset[T] = synchronized {
    tracked += (() => ds.unpersist(false))
    ds.persist(level)
  }

  /** Persist an RDD (model-tier iterative kernels) and track it. */
  def persistRdd[T](rdd: org.apache.spark.rdd.RDD[T],
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : org.apache.spark.rdd.RDD[T] = synchronized {
    tracked += (() => { rdd.unpersist(false); () })
    rdd.persist(level)
  }

  /** Track a broadcast for executor-side release (`unpersist`, NOT
    * `destroy` — the driver copy survives, so a frame that lazily
    * escapes its scope re-ships the value instead of failing; the
    * exact analog of the Dataset unpersist-is-always-safe contract).
    * Without this, operator-internal broadcasts (e.g. ialsUserStep's
    * item-factor map) accumulate executor blocks across epochs until
    * ContextCleaner GC happens to reclaim them. */
  def trackBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = synchronized {
    tracked += (() => bc.unpersist(false))
    bc
  }

  /** Unpersist every tracked frame (non-blocking) and forget them.
    * Unpersisting an already-released frame is a Spark no-op, so
    * overlap with operator-internal unpersists is harmless. */
  def release(): Unit = synchronized {
    tracked.foreach(_.apply())
    tracked.clear()
  }

  /** Number of currently tracked frames (visible for tests/metrics). */
  def size: Int = synchronized(tracked.size)
}

object CacheScope {
  /** The default scope: session-lifetime caching, bulk-releasable. */
  val global: CacheScope = new CacheScope

  private val dyn = new scala.util.DynamicVariable[CacheScope](global)

  /** The scope operator-internal persists register with. */
  def current: CacheScope = dyn.value

  /** Route a persist through the current scope (operator-internal). */
  def persist[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : Dataset[T] = current.persist(ds, level)

  /** RDD variant of [[persist]] (operator-internal). */
  def persistRdd[T](rdd: org.apache.spark.rdd.RDD[T],
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : org.apache.spark.rdd.RDD[T] = current.persistRdd(rdd, level)

  /** Persist AND cut lineage: the frame comes back as a LogicalRDD
    * leaf over its persisted row RDD (the connectedComponents / MMR /
    * GD-epoch discipline, generalized). Plain [[persist]] keeps the
    * full logical subtree in every downstream reference — analysis,
    * explain, and AQE's PER-STAGE re-optimization all re-walk it, and
    * a frame referenced k times by operators that themselves nest
    * multiplies the tree (measured: the incremental near-dup chain
    * planned 858 nested InMemoryRelations / 2241 exchanges before the
    * cut — tens of seconds of driver planning for seconds of
    * execution). Use for frames consumed by several DEEP branches;
    * plain persist remains right for leaf-ish shared subtrees (it
    * keeps the columnar cache format and the optimizer's view). */
  def persistCut(df: org.apache.spark.sql.DataFrame,
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : org.apache.spark.sql.DataFrame = {
    val rdd = current.persistRdd(df.rdd, level)
    df.sparkSession.createDataFrame(rdd, df.schema)
  }

  /** Broadcast variant (operator-internal): release with the scope.
    * Only tracked inside a [[scoped]] block — the global scope holds
    * strong references until an explicit `release()`, so tracking
    * there would PIN every epoch's broadcast against ContextCleaner
    * GC (the opposite of the accumulation this helper exists to
    * bound); unscoped callers keep Spark's reachability-based
    * cleanup instead. */
  def trackBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] =
    if (current eq global) bc else current.trackBroadcast(bc)

  /** Run `body` with a fresh scope; everything it persists is
    * unpersisted on exit (normal or exceptional). */
  def scoped[A](body: => A): A = {
    val s = new CacheScope
    try dyn.withValue(s)(body)
    finally s.release()
  }
}
