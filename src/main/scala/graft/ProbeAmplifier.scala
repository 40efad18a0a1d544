package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run the PlanShapeSpec-pinned plans against a
  * materialized scaled corpus (ScaleData output) with the NARROW-AMPLIFIER
  * rule live at its at-scale thresholds — the 100× counterpart of
  * NarrowAmplifierSpec's sf0.1 gate. Flags BOTH rule variants: the
  * absolute one (few tasks writing >256 MB, the ScaleSmoke rule) and the
  * record-amplification one the spec uses (few tasks, shuffle/generator
  * input, >16× records written vs read, >4 MB).
  *
  * Usage: runMain graft.ProbeAmplifier <dataDir> [threads=32]
  */
object ProbeAmplifier {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threads = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism
    val flags = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        if (m == null) return
        val inRec = m.inputMetrics.recordsRead
        val shRec = m.shuffleReadMetrics.recordsRead
        val write = m.shuffleWriteMetrics.bytesWritten
        val wRec = m.shuffleWriteMetrics.recordsWritten
        val few = i.numTasks <= math.max(1, cores / 4)
        val absolute = few && write > (256L << 20)
        val amplify = few && write > (4L << 20) &&
          wRec > 16L * math.max(inRec + shRec, 1L) && (shRec > 0 || inRec == 0)
        if (absolute || amplify)
          flags.add(s"tasks=${i.numTasks} write=$write wRec=$wRec " +
            s"read=${inRec + shRec} rule=${if (absolute) "ABS" else "AMP"} " +
            s"stage=${i.stageId}")
      }
    })
    val pinned = Seq(
      "q12_group_by_consecutive", "q21_dedup_jaccard", "q32_dedup_embed",
      "q54_dup_clusters", "q65_dedup_keep_one", "q72_keyed_multiwin",
      "q73_corpus_prep_fuzzy", "q76_simhash_near", "q79_wav_decode",
      "q82_asof_join", "q85_pack_per_split", "q89_multi_quantiles",
      "q99d_mse", "q110_entropy_kde")
    for (name <- pinned) {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        println(s"AMPPROBE $name FAILED ${e.getClass.getSimpleName}") }
      Thread.sleep(1500) // let the async bus drain before attributing flags
      val secs = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val f = flags.asScala.toSeq; flags.clear()
      println(f"AMPPROBE $name%-26s ${secs}%7.1f s  flags=${f.size}")
      f.foreach(x => println(s"  FLAG $x"))
      graft.core.Pinned.release(blocking = true)
      System.gc()
    }
    spark.stop()
  }
}
