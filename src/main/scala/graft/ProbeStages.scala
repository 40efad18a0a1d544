package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: per-stage parallelism profile for one query — answers "where
  * does the plan stop using the cores" (e.g. the q72 strong-scaling probe:
  * 1.58x for 4x cores; which stage is the serial term?).
  *
  * For every completed stage prints tasks, wall (submission→completion),
  * summed executor run/CPU time, and the effective parallelism
  * runTime/wall — a 32-core box shows ~32 on a healthy wide stage and ~1
  * on a serialization point.
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val threads = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, nm: String, tasks: Int, wallMs: Long,
                  runMs: Long, cpuMs: Long, inRec: Long, shRead: Long, shWrite: Long)
    // ConcurrentLinkedQueue, not an ArrayBuffer: events arrive on the async
    // listener-bus thread while the main thread reads/clears (same race
    // ScaleSmoke documents); reads below wait for the queue to go quiet
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        if (m == null) return // stage with no metrics: nothing to profile
        stages.add(St(i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks,
          wall, m.executorRunTime, m.executorCpuTime / 1000000,
          m.inputMetrics.recordsRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten))
      }
    })
    // the bus delivers asynchronously — the last (often heaviest) stage's
    // event can trail .count(); poll until the queue is stable so it is
    // neither dropped from this pass nor leaked into the next
    def drainBus(): Seq[St] = {
      var last = -1
      var tries = 0
      while (stages.size != last && tries < 40) {
        last = stages.size; tries += 1; Thread.sleep(250)
      }
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq
    }

    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q00_tpch_q1")(spark, dir).queryExecution.toRdd.count()
    graft.core.Pinned.release(blocking = true)

    // two passes: pass 1 includes first-run JIT/codegen of this plan's
    // generated classes (a straggler tail on the first heavy stage can be
    // C2 compilation, not skew); pass 2 is the steady-state structure
    val passes = if (args.length > 3) args(3).toInt else 2
    (1 to passes).foreach { p =>
      drainBus(); stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      val total = (System.nanoTime() - t0) / 1e9
      val snap = drainBus()
      println(f"PROBESTAGES $name pass$p total $total%.2f s, ${snap.size} stages, threads=$threads")
      val top = snap.sortBy(-_.wallMs).take(20)
      println(f"${"stage"}%6s ${"tasks"}%6s ${"wall_s"}%8s ${"run_s"}%8s ${"cpu_s"}%8s ${"par"}%6s ${"inRec"}%12s ${"shR_MB"}%8s ${"shW_MB"}%8s  name")
      top.foreach { s =>
        val par = if (s.wallMs > 0) s.runMs.toDouble / s.wallMs else 0.0
        println(f"${s.id}%6d ${s.tasks}%6d ${s.wallMs / 1e3}%8.2f ${s.runMs / 1e3}%8.1f ${s.cpuMs / 1e3}%8.1f $par%6.1f ${s.inRec}%12d ${s.shRead >> 20}%8d ${s.shWrite >> 20}%8d  ${s.nm}")
      }
      val wallSum = snap.map(_.wallMs).sum / 1e3
      val runSum = snap.map(_.runMs).sum / 1e3
      println(f"PROBESTAGES sum: stage-wall $wallSum%.1f s (overlap makes this > total), run $runSum%.1f s, mean par ${runSum / total}%.1f of $threads")
      graft.core.Pinned.release(blocking = true)
    }
    spark.stop()
  }
}
