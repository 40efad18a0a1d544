package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.scale.Dedup

/** Scratch timing probe for performance work (not part of the driver
  * contract). `runMain graft.Probe` prints stage timings for the dedup
  * family on sf0.1 — the family's cost is dominated by the shingling
  * expression and by whether self-joins reuse one shuffle exchange, so
  * those are what it isolates.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("warmup count")(docs.count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles explode")(sh.count())
    time("q20 exact")(Dedup.exactNormalized(docs, "doc_id", "text").count())
    time("q21 jaccard")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count())
    time("q22 minhash_lsh")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 8, 0.6).count())
    time("q23 simhash")(Dedup.simhash32(docs, "doc_id", "text")
      .queryExecution.toRdd.count())
    spark.stop()
  }
}
