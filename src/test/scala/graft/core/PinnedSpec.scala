package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The checkpoint registry's release contract: a pipeline-boundary
  * [[Pinned.release]] frees exactly the caller's MATERIALIZED checkpoint
  * blocks — never a lazy pin that hasn't computed yet (its persist marker is
  * load-bearing for `__pid` stability) and never another thread's in-flight
  * frames. Block liveness is observed through
  * `sparkContext.getPersistentRDDs` deltas (the test JVM's session is shared
  * across suites, so absolute emptiness is not assertable).
  */
class PinnedSpec extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def freshFrame: DataFrame =
    spark.range(50000).select(col("id").cast("double").as("idx"),
      (col("id") % 7).cast("double").as("v"))

  test("release() frees a materialized pin's blocks and drops its entry") {
    val before = persistedIds
    val live0 = Pinned.liveCount
    val pinned = Scan.pinned(freshFrame, Seq("idx"))
    pinned.count() // materialize the lazy localCheckpoint
    val ours = persistedIds -- before
    assert(ours.nonEmpty, "materialized pin left no persisted RDD")
    assert(Pinned.liveCount > live0, "checkpoint() did not register a handle")
    Pinned.release()
    assert((persistedIds intersect ours).isEmpty,
      "release() left the pin's blocks persisted")
    assert(Pinned.liveCount <= live0, "release() left the entry tracked")
  }

  test("release() skips a never-materialized pin; it still computes correctly") {
    val before = persistedIds
    val pinned = Scan.pinned(freshFrame, Seq("idx"))
    Pinned.release() // nothing ran on `pinned` yet — must NOT unpersist it
    val n = pinned.count()
    assert(n == 50000L, "lazy pin corrupted by a release before materialization")
    val ours = persistedIds -- before
    assert(ours.nonEmpty, "pin skipped by release() lost its persist marker")
    Pinned.release() // now materialized — a later boundary frees it
    assert((persistedIds intersect ours).isEmpty)
  }

  test("release() does not sweep another thread's materialized pins") {
    val before = persistedIds
    var theirIds = Set.empty[Int]
    val t = new Thread(() => {
      val p = Scan.pinned(freshFrame, Seq("idx"))
      p.count()
      theirIds = persistedIds -- before
    })
    t.start(); t.join()
    assert(theirIds.nonEmpty)
    Pinned.release() // main thread — must leave the worker's pin alone
    assert((persistedIds intersect theirIds) == theirIds,
      "release() unpersisted a frame pinned by another thread")
    Pinned.releaseAll() // session teardown sweeps every owner
    assert((persistedIds intersect theirIds).isEmpty)
  }

  test("scan results stay bit-identical across release boundaries") {
    // the Bench/Verify wiring: query → release → same query again; the
    // second build must re-pin from scratch and agree exactly
    def run(): Seq[(Long, Long)] =
      Scan.runningSum(freshFrame.withColumn("f", lit(1L)), "idx", "f", "cum")
        .select(col("idx").cast("long"), col("cum")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = run()
    Pinned.release()
    val b = run()
    Pinned.release()
    assert(a == b)
  }
}
