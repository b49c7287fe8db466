package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of per-process DataFrame memos (materialized, localCheckpointed
  * frames keyed by (session, input dir, params)). Operators register their
  * cache here so the bench can drop ALL memo state between timed passes
  * with one call — otherwise pass 2 of a memoized query reads pass 1's
  * checkpointed blocks and reports the memo-hit price instead of the
  * operator's ([[Dedup.clearMemo]] semantics, now shared).
  *
  * Durability note: `localCheckpoint` blocks are executor memory/disk
  * resident, NOT reliably stored — on a real cluster a lost executor
  * drops its blocks and the consuming job recomputes the memoized stage
  * from source (correct, just slower). A pipeline that must survive
  * executor churn cheaply swaps these for reliable `checkpoint` to a
  * cluster store; semantics are unchanged.
  */
object Memo {
  private val caches =
    scala.collection.mutable.Buffer
      .empty[scala.collection.concurrent.TrieMap[_, DataFrame]]

  private val clearHooks =
    scala.collection.mutable.Buffer.empty[() => Unit]

  /** Register a hook run by [[clearAll]] — for memo state that is not a
    * DataFrame (e.g. the streaming drains' materialized segment
    * directories, which are keyed paths on disk): the bench clears ALL
    * per-process memo state between timed passes, and non-frame caches
    * must drop with the frames or pass 2 reports memo-hit prices.
    */
  def onClear(f: () => Unit): Unit = caches.synchronized {
    clearHooks += f
  }

  /** A fresh TrieMap cache enrolled for [[clearAll]]. Call once per
    * operator at object-init time.
    */
  def registry[K]: scala.collection.concurrent.TrieMap[K, DataFrame] =
    caches.synchronized {
      val m = scala.collection.concurrent.TrieMap.empty[K, DataFrame]
      caches += m
      m
    }

  /** Unpersist every memoized frame and empty every registered cache.
    *
    * `Dataset.unpersist` alone does NOT release a localCheckpoint's
    * blocks — the checkpoint data belongs to the underlying RDD, not
    * the Dataset's cache entry (measured: blocks survived clearAll and
    * accumulated one generation per bench pass). The checkpointed RDD
    * is reachable as the frame's LogicalRDD leaf; unpersisting it frees
    * the blocks (and makes the dropped frame unrecoverable, which is
    * the point — the registry reference is gone too).
    */
  /** Release a memoized frame's blocks — `unpersist` on the Dataset
    * AND on the localCheckpoint's underlying RDD (reachable as the
    * LogicalRDD leaf); the Dataset call alone leaks the checkpoint
    * blocks (see [[clearAll]]'s scaladoc). Shared with targeted
    * invalidations (the compaction specs' drain-memo drop) so they
    * cannot re-open the leak clearAll closed.
    */
  def unpersistFrame(df: DataFrame): Unit =
    try {
      df.unpersist(blocking = false)
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case _: Throwable => () }

  private val scratchFrames = registry[Long]
  private val scratchIds = new java.util.concurrent.atomic.AtomicLong

  /** Eagerly checkpoint an INTERMEDIATE frame and enroll the result for
    * [[clearAll]]. A memoized output frame that is itself
    * `localCheckpoint`ed hides any checkpointed frames inside its build
    * plan (the new LogicalRDD leaf replaces the whole subtree), so the
    * intermediates' blocks would outlive every registry reference —
    * exactly the leak [[unpersistFrame]]'s plan walk cannot see.
    * Intermediates checkpointed through here are reclaimed with the
    * registry frames (Round13Spec pins the invariant for the IVF-PQ
    * model).
    */
  def scratchCheckpoint(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    scratchFrames.put(scratchIds.incrementAndGet(), c)
    c
  }

  def clearAll(): Unit = caches.synchronized {
    caches.foreach { m =>
      m.values.foreach(unpersistFrame)
      m.clear()
    }
    clearHooks.foreach { f =>
      try f() catch { case _: Throwable => () }
    }
  }
}
