package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus write layout: hive partitioning, bounded file counts, in-file
  * ordering, lossless roundtrip.
  */
class SinkSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 300L).map(i =>
      (i, if (i % 10 < 8) "train" else "val", i % 3, s"doc $i"))
      .toDF("doc_id", "split", "shard", "text")
  }

  test("writeShards: hive layout, bounded files, sorted rows, roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    try {
      Sink.writeShards(corpus, dir, Seq("split", "shard"), Seq("doc_id"),
        filesPerPartition = 2)
      // hive-partitioned directories exist for every (split, shard)
      val leaf = new java.io.File(s"$dir/split=train/shard=0")
      assert(leaf.isDirectory, "expected split=train/shard=0 directory")
      // bounded file count per leaf
      for (s <- Seq("train", "val"); k <- 0 until 3) {
        val files = new java.io.File(s"$dir/split=$s/shard=$k")
          .listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.nonEmpty && files.length <= 2,
          s"split=$s/shard=$k: ${files.length} files")
      }
      // roundtrip is lossless (partition cols come back typed by hive
      // discovery; compare on the id → (split, shard, text) mapping)
      val back = spark.read.parquet(dir)
        .select(col("doc_id"), col("split"),
          col("shard").cast("long"), col("text"))
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getString(3))).toMap
      val src = corpus.collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
      assert(back == src)
      // rows inside each physical file are sorted by doc_id
      for (s <- Seq("train", "val"); k <- 0 until 3;
           f <- new java.io.File(s"$dir/split=$s/shard=$k")
             .listFiles().filter(_.getName.endsWith(".parquet"))) {
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids == ids.sorted, s"unsorted file ${f.getName}")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("writeShards: re-run produces an identical file set (deterministic)") {
    val d1 = java.nio.file.Files.createTempDirectory("sinkA").toString
    val d2 = java.nio.file.Files.createTempDirectory("sinkB").toString
    // file NAMES carry task ids/UUIDs, so compare per-DIRECTORY multisets
    // of whole-file checksums: same rows in the same order → same pages
    def checksums(root: String): Map[String, Seq[Long]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root))
        .filter(_.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getAbsolutePath.stripPrefix(root))
        .map { case (dir, files) =>
          dir -> files.map { f =>
            val crc = new java.util.zip.CRC32()
            crc.update(java.nio.file.Files.readAllBytes(f.toPath))
            crc.getValue
          }.sorted.toSeq
        }
    }
    try {
      Sink.writeShards(corpus, d1, Seq("split"), Seq("doc_id"))
      Sink.writeShards(corpus.repartition(7), d2, Seq("split"), Seq("doc_id"))
      val (c1, c2) = (checksums(d1), checksums(d2))
      assert(c1.nonEmpty && c1 == c2)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(d1)); rm(new java.io.File(d2))
    }
  }

  test("writeShards: deterministic even when sort keys are NOT unique") {
    // sortCols = shard only → many rows tie on the sort key; without the
    // all-column tiebreaker, tie order would follow shuffle arrival order
    // and the two writes below could produce different bytes
    val d1 = java.nio.file.Files.createTempDirectory("sinkC").toString
    val d2 = java.nio.file.Files.createTempDirectory("sinkD").toString
    def checksums(root: String): Map[String, Seq[Long]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(root))
        .filter(_.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getAbsolutePath.stripPrefix(root))
        .map { case (dir, files) =>
          dir -> files.map { f =>
            val crc = new java.util.zip.CRC32()
            crc.update(java.nio.file.Files.readAllBytes(f.toPath))
            crc.getValue
          }.sorted.toSeq
        }
    }
    try {
      Sink.writeShards(corpus, d1, Seq("split"), Seq("shard"))
      Sink.writeShards(corpus.repartition(13), d2, Seq("split"), Seq("shard"))
      val (c1, c2) = (checksums(d1), checksums(d2))
      assert(c1.nonEmpty && c1 == c2)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(d1)); rm(new java.io.File(d2))
    }
  }

  test("writeShards: map columns join the tiebreak via canonicalized entries") {
    import spark.implicits._
    // rows IDENTICAL except for a map column, all tied on the sort key:
    // the canonicalized map_entries projection must order them the same
    // way on every run/partitioning (the r9 determinism gap)
    val dup = (0 until 40).map(i => (1L, "train", Map(s"k$i" -> i, s"j$i" -> -i)))
    val mdf = dup.toDF("doc_id", "split", "meta")
    val d1 = java.nio.file.Files.createTempDirectory("sinkM1").toString
    val d2 = java.nio.file.Files.createTempDirectory("sinkM2").toString
    try {
      Sink.writeShards(mdf, d1, Seq("split"), Seq("doc_id"))
      Sink.writeShards(mdf.repartition(17), d2, Seq("split"), Seq("doc_id"))
      def crcs(root: String): Seq[Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(root)).filter(_.getName.endsWith(".parquet"))
          .map { f =>
            val crc = new java.util.zip.CRC32()
            crc.update(java.nio.file.Files.readAllBytes(f.toPath))
            crc.getValue
          }.sorted
      }
      assert(crcs(d1).nonEmpty && crcs(d1) == crcs(d2))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(d1)); rm(new java.io.File(d2))
    }
  }

  test("writeShards accepts map-typed columns (hashable after canonicalize)") {
    import spark.implicits._
    // regression: hashing a MapType directly throws (map key order is
    // undefined); the canonicalized array_sort(map_entries(c)) projection
    // keeps such columns inside the tiebreak instead of dropping them
    val df = Seq(
      (1L, "train", Map("a" -> 1)),
      (2L, "train", Map("b" -> 2)),
      (3L, "val", Map.empty[String, Int])).toDF("doc_id", "split", "meta")
    val dir = java.nio.file.Files.createTempDirectory("sinkMap").toString
    try {
      Sink.writeShards(df, dir, Seq("split"), Seq("doc_id"))
      assert(spark.read.parquet(dir).count() == 3)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("sweepDead removes dead-pid layouts, keeps live-pid and foreign dirs") {
    val root = java.nio.file.Files.createTempDirectory("sweep").toString
    var child: Process = null
    // EVERYTHING inside the try: a failed mkdir/setLastModified must still
    // reap the sleep child and the temp tree, or the leak makes the
    // failure self-sustaining on re-runs
    try {
      val self = ProcessHandle.current().pid()
      val now = System.currentTimeMillis()
      val old = now - 10L * 60 * 1000 // well past minAge and recycle slack
      val dead = new java.io.File(s"$root/scratch_p999999999_habc")
      val deadYoung = new java.io.File(s"$root/scratch_p999999998_habc")
      val live = new java.io.File(s"$root/scratch_p${self}_habc")
      // pid 1 (init): alive; usually started before any layout here — a
      // live owner-shaped pid whose layout must survive any age. On a
      // freshly booted container pid 1's start can postdate a backdated
      // mtime (it would read as recycled) — skip the case then rather
      // than flake.
      val p1Start = ProcessHandle.of(1L)
        .flatMap(h => h.info().startInstant())
        .map[Long](_.toEpochMilli).orElse(Long.MaxValue)
      val p1IsOlder = p1Start < old - 2L * 60 * 1000
      val liveOld = new java.io.File(s"$root/scratch_p1_habc")
      val other = new java.io.File(s"$root/unrelated_dir")
      // a genuinely RECYCLED pid: a child process started NOW wearing the
      // pid of a layout whose mtime predates it by > the slack window
      child = new ProcessBuilder("sleep", "30").start()
      val recycled = new java.io.File(s"$root/scratch_p${child.pid()}_habc")
      val dirs = Seq(dead, deadYoung, live, other, recycled) ++
        (if (p1IsOlder) Seq(liveOld) else Nil)
      dirs.foreach { d =>
        assert(d.mkdir())
        assert(new java.io.File(d, "x.parquet").createNewFile())
      }
      // age everything except deadYoung past the min-age guard
      (dirs.toSet - deadYoung).foreach(d => assert(d.setLastModified(old)))
      Sink.sweepDead(root, "scratch_")
      assert(!dead.exists(), "aged dead-pid layout should be removed")
      assert(deadYoung.exists(),
        "a dead-pid layout younger than the min age must survive (pid race)")
      assert(live.exists(), "own-pid layout must survive")
      if (p1IsOlder)
        assert(liveOld.exists(),
          "a live pid older than its layout is the OWNER — never reaped " +
            "(short of the 48h orphan backstop)")
      assert(other.exists(), "non-matching names must survive")
      assert(!recycled.exists(),
        "a live pid that STARTED after the layout existed is a recycle " +
          "of the dead owner's pid — the layout is orphaned")
    } finally {
      if (child != null) child.destroyForcibly()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }
}
