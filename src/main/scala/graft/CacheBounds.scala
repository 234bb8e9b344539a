package graft

/** LRU bound enforcement shared by the engine's long-lived corpus
  * caches — the serving cache (LifecycleIndex.corpusCache) and the
  * maintenance-side stream cache (SimilarityQueries
  * .streamCorpusCache). One copy of the policy (round-20 review: the
  * two sites had drifted into near-verbatim ~40-line twins that had
  * to be fixed in lockstep):
  *
  *   - ENTRY cap: evict least-recently-used first until at most
  *     `maxEntries` remain — never the caller's own entry, so a
  *     single active consumer always keeps its corpus;
  *   - BYTE budget: over the same LRU order, evict MATERIALIZED
  *     entries (resident bytes > 0) until the summed resident set
  *     fits `maxMb`. A 0-byte unfilled entry frees nothing and
  *     skipping it guarantees termination; the own entry counts
  *     toward the total but is never a victim — one over-budget
  *     corpus stays cached, the knob bounds the FLEET. `maxMb <= 0`
  *     disables the byte tier; a single live entry skips it entirely
  *     (no per-entry residency lookups on the one-consumer hot path).
  *
  * The `evict` callback owns removal + unpersist (two-arg remove so a
  * concurrent replace of the same key keeps its fresh entry; the
  * serving site adds its shared-plan guard, the stream site's plans
  * are distinct by construction) and returns whether the entry was
  * actually removed; per-tier counters live at the call sites.
  */
private[graft] object CacheBounds {

  /** Entry-cap tier. `lruNanos` is the entry's last-touch stamp. */
  def enforceEntryCap[K, V](
      entries: java.util.concurrent.ConcurrentHashMap[K, V],
      ownKey: K, lruNanos: V => Long, maxEntries: Int,
      evict: (K, V) => Boolean): Unit = {
    import scala.jdk.CollectionConverters._
    var evicting = entries.size > maxEntries
    while (evicting) {
      entries.entrySet().asScala
        .filter(_.getKey != ownKey)
        .minByOption(e => lruNanos(e.getValue)) match {
        case Some(e) =>
          evict(e.getKey, e.getValue)
          evicting = entries.size > maxEntries
        case None => evicting = false // nothing evictable but ours
      }
    }
  }

  /** Byte-budget tier. `residentMb` reads materialized bytes WITHOUT
    * forcing a fill (0 = unfilled, never a victim). */
  def enforceByteBudget[K, V](
      entries: java.util.concurrent.ConcurrentHashMap[K, V],
      ownKey: K, lruNanos: V => Long, residentMb: V => Double,
      maxMb: Double, evict: (K, V) => Boolean): Unit = {
    if (maxMb <= 0 || entries.size <= 1) return
    import scala.jdk.CollectionConverters._
    val sized = entries.entrySet().asScala.toSeq
      .map(e => (e, residentMb(e.getValue)))
    var total = sized.map(_._2).sum
    var victims = sized
      .filter { case (e, mb) => e.getKey != ownKey && mb > 0 }
      .sortBy { case (e, _) => lruNanos(e.getValue) }
    while (total > maxMb && victims.nonEmpty) {
      val (e, mb) = victims.head
      victims = victims.tail
      if (evict(e.getKey, e.getValue)) total -= mb
    }
  }

  /** Conf knob parsed defensively (round-18 advice rule: degrade to
    * the default, never crash a warm path on a malformed value). */
  def confInt(s: org.apache.spark.sql.SparkSession, key: String,
      default: Int): Int =
    try s.conf.get(key, default.toString).toInt
    catch { case _: NumberFormatException => default }

  /** See [[confInt]]. */
  def confDouble(s: org.apache.spark.sql.SparkSession, key: String,
      default: Double): Double =
    try s.conf.get(key, default.toString).toDouble
    catch { case _: NumberFormatException => default }
}
