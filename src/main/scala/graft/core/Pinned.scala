package graft.core

import java.lang.ref.WeakReference

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Per-session registry of the engine's lazily-localCheckpointed frames.
  *
  * Every operator that pins an intermediate (`Scan.pinPartitions`, the dedup
  * family's shingle sets / candidate tables / rep maps, the CC edge rounds)
  * routes through [[checkpoint]], which records a weak handle to the
  * checkpointed RDD. Without an explicit release, checkpoint blocks are only
  * freed when the DRIVER garbage-collects the RDD object and the
  * ContextCleaner's weak references fire — on a large driver heap that can be
  * minutes of accumulated executor storage, and the eviction stall lands on
  * whichever query materializes next (observed: a 3.6 s CC query reading
  * 19.8 s under the debt of prior queries). Long-running pipelines should
  * call [[release]] between logical jobs, or tune
  * `spark.cleaner.periodicGC.interval` (default 30min) down so the cleaner
  * runs before storage debt builds.
  *
  * Handles are WEAK: an un-released frame still degrades to today's GC-driven
  * cleanup, never a leak. [[release]] invalidates the released frames —
  * a localCheckpoint truncates lineage on materialization, so a released
  * frame cannot be recomputed; release only at pipeline boundaries.
  */
object Pinned {

  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[WeakReference[RDD[_]]]

  /** The checkpointed RDDs embedded in a frame's analyzed plan. A LAZY
    * localCheckpoint still creates the RDD object up front (only
    * materialization is deferred), so the handle is available immediately.
    */
  private def rddsOf(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }

  /** `df.localCheckpoint(eager = false)` + register the handle. */
  def checkpoint(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = false)
    val rdds = rddsOf(out)
    synchronized { rdds.foreach(r => tracked += new WeakReference(r)) }
    out
  }

  /** Unpersist the checkpoint blocks behind `df` (a frame returned by
    * [[checkpoint]]) right now — for operators that KNOW an intermediate is
    * dead (e.g. the previous CC round's edge list once the next round is
    * materialized), so multi-round jobs run at constant storage.
    */
  def unpersist(df: DataFrame): Unit =
    rddsOf(df).foreach(_.unpersist(blocking = false))

  /** Unpersist every tracked checkpoint that is still alive and clear the
    * registry. Frames checkpointed before the call must not be reused after
    * it (their lineage is truncated).
    */
  def release(): Unit = synchronized {
    tracked.foreach { ref =>
      val r = ref.get()
      if (r != null) r.unpersist(blocking = false)
    }
    tracked.clear()
  }

  /** Number of live tracked handles (test/diagnostic hook). */
  def liveCount: Int = synchronized { tracked.count(_.get() != null) }
}
