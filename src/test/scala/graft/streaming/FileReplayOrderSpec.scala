package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the FileStreamSource admission contract the q112/q113 replay feed
  * (SparkEntry.replayDir) depends on: with `maxFilesPerTrigger=1` and
  * latestFirst unset, files are admitted to micro-batches in
  * MODIFICATION-TIME order — not path order, not listing order. The feed
  * sets part-file mtimes strictly increasing in ts-range order to get a
  * globally ts-sorted replay across batches; if a Spark upgrade changed
  * the ordering key, q113's cross-batch run folds would silently see
  * late data and this spec (files whose mtime order CONTRADICTS their
  * name order) fails before the oracle gate does.
  */
class FileReplayOrderSpec extends SparkSpec {

  test("maxFilesPerTrigger=1 admits files in mtime order, not name order") {
    import spark.implicits._
    val feed = java.nio.file.Files.createTempDirectory("graft_replay_order")
    try {
      // three one-row parquet files whose NAME order (a, b, c) is the
      // reverse of the intended mtime order
      val payload = Seq(("a", 30L), ("b", 20L), ("c", 10L))
      for ((name, v) <- payload) {
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_ro_$name")
        Seq(v).toDF("v").coalesce(1).write.mode("overwrite")
          .parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .find(_.getName.startsWith("part-")).get
        java.nio.file.Files.copy(part.toPath,
          feed.resolve(s"$name.parquet"))
        graft.core.Scratch.rmTree(tmp.toFile)
      }
      val base = System.currentTimeMillis()
      // mtimes: c oldest, then b, then a — the reverse of name order
      Seq("c", "b", "a").zipWithIndex.foreach { case (n, i) =>
        assert(feed.resolve(s"$n.parquet").toFile
          .setLastModified(base + i * 2000L))
      }
      val sdf = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("v BIGINT"))
        .option("maxFilesPerTrigger", 1)
        .parquet(feed.toString)
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
      val q = sdf.writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized {
            seen += ((id, df.collect().map(_.getLong(0)).toSeq))
          }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      val ordered = seen.sortBy(_._1).map(_._2)
      assert(ordered.map(_.toSet) == Seq(Set(10L), Set(20L), Set(30L)),
        s"batches did not follow mtime order: $ordered")
    } finally graft.core.Scratch.rmTree(feed.toFile)
  }
}
