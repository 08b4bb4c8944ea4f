package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Owner-of-last-resort for DataFrames persisted INSIDE query-
  * construction helpers (r10 verdict task 4 / ADVICE low 3).
  *
  * Several TextOps helpers persist a shared intermediate whose
  * consumers are downstream of the RETURNED plan (q33's pair list is
  * re-read by q42/q58/q62/q63/q72/q82; q51/q52's per-doc verdicts by
  * q58; the beyond-cap verify survivors by its own three-consumer
  * choreography) — so the helper itself can never unpersist: the
  * caller may not have executed yet, and Spark's CacheManager is what
  * rewrites the later queries' identical subtrees onto the cached
  * relation. That sharing is the point; the cost is a cache entry with
  * no owner, which in a long-lived session accumulates across repeated
  * family runs.
  *
  * This registry is the owner. Helpers route their persists through
  * [[track]]; a harness (Bench, Verify, a user's session loop) calls
  * [[releaseAll]] at its unit-of-work boundary — AFTER the family has
  * run, not per-query, so the cross-query CacheManager reuse that the
  * bench rate depends on is untouched (unpersisting q33's pairs
  * between q33 and q42 would force ~8 rebuilds of the pair pipeline).
  *
  * Deliberately NOT weak-reference/automatic: ContextCleaner-style GC
  * cleanup is nondeterministic, and the verdict's bar is an
  * ASSERTABLE zero-lingering-blocks state after a full pass.
  * Thread-safe; double-release and release-after-session-stop are
  * no-ops (unpersist on a stopped context throws — swallowed, the
  * blocks died with the executors anyway).
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at `level` and register it for the next
    * [[releaseAll]]. Returns `df` (post-persist) for call-site
    * chaining. */
  def trackPersist(df: DataFrame,
                   level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : DataFrame = synchronized {
    df.persist(level)
    frames += df
    df
  }

  /** Number of frames currently registered (still unreleased). */
  def trackedCount: Int = synchronized(frames.size)

  /** Of the registered frames, how many still hold a storage level
    * (i.e. would linger without a release). Drives the bench-line
    * telemetry and the spec's zero-lingering assertion. */
  def lingeringCount: Int = synchronized {
    frames.count(df =>
      try df.storageLevel != StorageLevel.NONE
      catch { case scala.util.control.NonFatal(_) => false })
  }

  /** Unpersist every registered frame and clear the registry. Returns
    * the number of frames that actually held storage when released.
    * `blocking = true` waits for the blocks to drop — the spec uses it
    * so the post-release assertion cannot race the executor-side
    * removal. */
  def releaseAll(blocking: Boolean = false): Int = synchronized {
    val live = frames.count { df =>
      try {
        val held = df.storageLevel != StorageLevel.NONE
        df.unpersist(blocking)
        held
      } catch { case scala.util.control.NonFatal(_) => false }
    }
    frames.clear()
    live
  }
}
