package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: A/B the jaccard exact-dup pre-collapse within one JVM. */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBEAB $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
      // pipeline boundary: free the query's checkpoint blocks (the A/B this
      // probe exists for — run-to-run stability without cross-query debt)
      graft.core.Pinned.release()
    }
    (1 to 4).foreach { round =>
      t(s"r$round jaccard collapse=off")(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6, collapseExact = false).count())
      t(s"r$round jaccard collapse=on ")(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count())
      t(s"r$round clusters collapse=off")(graft.scale.Components.dupClusters(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6, collapseExact = false)).count())
      t(s"r$round clusters collapse=on ")(graft.scale.Components.dupClusters(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)).count())
    }
    spark.stop()
  }
}
