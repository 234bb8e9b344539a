package graft

import org.apache.spark.sql.Dataset

/** Tracks persisted INTERMEDIATES (subplans that feed self-joins or
  * iteration, e.g. the dedup signature/shingle sets) so harnesses can
  * release them once the query's result is materialized.
  *
  * Why: `Dataset.persist` pins blocks in the executor storage pool
  * until explicitly unpersisted. A query function cannot unpersist its
  * own intermediates — they must stay alive until the CALLER consumes
  * the result — so without a handoff every persisted subplan leaks for
  * the life of the session. Across a 95-query bench run those leaked
  * blocks accumulate into storage-pool pressure (evictions, GC) that
  * taxes every later query; on a long-lived production session the
  * same leak is an OOM. The contract: builders `track` what they
  * persist, harnesses (Bench, Verify, long-lived apps) call
  * `release()` after consuming each result.
  */
object PersistRegistry {
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Register a persisted intermediate; returns it unchanged. */
  def track[T <: Dataset[_]](ds: T): T = { tracked.add(ds); ds }

  /** Persist-and-track, idempotent BY PLAN: `Dataset.storageLevel`
    * consults the session CacheManager with the same normalized-plan
    * lookup `persist` itself uses, so a frame whose plan is already
    * cached (a shared builder invoked twice inside one query) is
    * returned as-is instead of re-persisting — which would log
    * CacheManager's "already cached" warning and register a
    * double-release. This is the one entry point query builders
    * should use; bare `track(x.persist(...))` remains for callers
    * that manage the persist themselves.
    *
    * A FRESH persist is materialized EAGERLY (one count()): the
    * frames handed here exist to feed self-joins and multi-branch
    * plans, and when those branches' stages run concurrently each
    * recomputes the unmaterialized cached partitions before the
    * first cache write lands — wasted compute plus the BlockManager
    * "already exists; not re-adding" WARN (round 11: this
    * double-compute was ~2.4 s of m06's stamped cost). Callers whose
    * very next statement is already an action on the frame (d08's
    * fixpoint loop) pass eager = false. */
  def cached[T <: Dataset[_]](ds: T,
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      eager: Boolean = true): T = {
    if (ds.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
      ds.persist(level)
      tracked.add(ds)
      if (eager) ds.count()
    }
    ds
  }

  /** Unpersist every tracked intermediate (non-blocking). Safe to call
    * when nothing is tracked, and safe on already-unpersisted sets. */
  def release(): Unit = {
    var ds = tracked.poll()
    while (ds != null) { ds.unpersist(false); ds = tracked.poll() }
  }
}
