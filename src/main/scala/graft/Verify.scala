package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.Verify <sfDir> <outDir> [queryName...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    // optional: names after the first two args restrict the dump (iterating
    // on one query shouldn't pay for the other 70+)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 116 queries compile ~3.2k generated classes; the default 100-entry
      // codegen cache recompiles shared helper classes all run long (see
      // the Bench builder note for the measured effect)
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Deterministic, lexicographic dump order (NOT Map hash order): if the
    // driver wall-cuts the run partway, the dumped set truncates at a
    // documented frontier (q00, q01, … first — the tsflex core surface)
    // instead of dropping an arbitrary-looking hash-ordered subset.
    // r10 lost 44/99 queries this way, invisibly.
    val planned = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    val dumped = scala.collection.mutable.ArrayBuffer.empty[String]
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jarr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    // rewritten after every query so a wall-cut leaves a truthful manifest
    // of declared-vs-dumped; the driver (and the judge) can see exactly
    // which queries a partial run covered.
    def writeManifest(): Unit = {
      val m = s"""{"declared":${planned.size},"dumped":${dumped.size},""" +
        s""""declared_names":${jarr(planned.map(_._1))},""" +
        s""""dumped_names":${jarr(dumped.toSeq)}}"""
      // temp + ATOMIC_MOVE: a wall-cut SIGKILL landing mid-write would
      // otherwise leave the very file that documents the cut unreadable
      val tmp = Paths.get(s"$outDir/manifest.json.tmp")
      Files.writeString(tmp, m)
      Files.move(tmp, Paths.get(s"$outDir/manifest.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeManifest()
    // oracle_sql.json depends only on the static SparkEntry.oracleSql map —
    // write it BEFORE the (slow, cut-prone) dump loop so a wall-cut partial
    // run still carries the full oracle set.
    val oracleJson = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    planned.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        dumped += name
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      writeManifest()
      // each query's result is fully written — its checkpoint blocks are
      // dead; freeing them keeps the 99-query dump at constant storage
      graft.core.Pinned.release(blocking = true)
    }
    spark.stop()
  }
}
