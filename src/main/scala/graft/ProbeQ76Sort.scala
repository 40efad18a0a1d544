package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.scale.Dedup

/** Attribute q76's 100× cost (VERDICT r14 item 4): is the remaining wall
  * candidate generation (the band/slice tradeoff) or the contracted
  * output itself (≈385M pair rows under the query's ORDER BY)?
  *
  * Three variants, same corpus, N passes each (min over passes 2..N is
  * the published number):
  *   - `sorted`   — q76 exactly as declared (32-bit, 4 bands, orderBy);
  *   - `nosort`   — the same pairs without the final orderBy: subtracting
  *     isolates the global range-exchange + sort of the output;
  *   - `sorted64` — the 64-bit / 16-bit-slice configuration (q86): if the
  *     band/slice tradeoff mattered at this clique structure, this cell
  *     would diverge from `sorted` by more than the signature width's
  *     constant factor.
  *
  * If sorted − nosort dominates and sorted64 ≈ sorted, the cost is the
  * output contract (pair list, globally ordered), not the banding — the
  * "irreducible shuffle/sort I/O" conclusion, committed to SCALE.md.
  */
object ProbeQ76Sort {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/scale100"
    val passes = if (args.length > 1) args(1).toInt else 3
    val localDir = s"/tmp/probeq76s-localp${ProcessHandle.current.pid}_x"
    graft.scale.Sink.sweepDead("/tmp", "probeq76s-local")
    graft.scale.Sink.deleteOnExit(localDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def run(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val n = mk().queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        graft.core.Pinned.release(blocking = true)
        System.gc(); Thread.sleep(150)
        (s, n)
      }
      val warmMin = secs.drop(1).map(_._1).min
      println(f"PROBE76 $label%-10s rows=${secs.head._2}%,d " +
        f"passes=${secs.map(p => f"${p._1}%.1f").mkString(",")} " +
        f"minwarm=$warmMin%.1f s")
    }

    run("sorted", () =>
      Dedup.simhashPairs(docs, "doc_id", "text", 3, 4)
        .orderBy("id_a", "id_b"))
    run("nosort", () =>
      Dedup.simhashPairs(docs, "doc_id", "text", 3, 4))
    run("sorted64", () =>
      Dedup.simhashPairs64(docs, "doc_id", "text", 3, 4)
        .orderBy("id_a", "id_b"))
    // reference point for the pure-output claim: count(*) over the pair
    // frame with everything else identical — no row materialization at all
    run("countonly", () =>
      Dedup.simhashPairs(docs, "doc_id", "text", 3, 4)
        .groupBy().count())
    spark.stop()
    graft.core.Scratch.rmTree(new java.io.File(localDir))
  }
}
