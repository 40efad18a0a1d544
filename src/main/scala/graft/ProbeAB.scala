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
    args.headOption.getOrElse("jaccard") match {
      case "minhash" =>
        // q22 suite-context diagnostic: recreate suite-like ambient heap
        // state (the two heaviest dedup neighbors), then four measured
        // minhash runs with release between — spread > 1.5x would mean
        // retained state, spread ~1x with elevated absolute cost means
        // ambient GC pressure
        t("ambient jaccard")(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count())
        t("ambient clusters")(graft.scale.Components.dupClusters(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)).count())
        (1 to 4).foreach { round =>
          t(s"r$round minhash_lsh")(graft.scale.Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 8, 0.6).count())
        }
      case "minhash-suite" =>
        // stronger suite-context recreation: run a broad slice of the query
        // suite first so the JVM's bounded codegen class cache (100 entries)
        // holds OTHER queries' classes, then measure minhash — isolates
        // "codegen recompile + ambient heap" from "retained state"
        val names = SparkEntry.queries.keys.toSeq.sorted
          .filterNot(_ == "q22_minhash_lsh")
        names.take(40).foreach { n =>
          try SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
          catch { case e: Throwable => println(s"PROBEAB warm $n failed: ${e.getMessage}") }
          graft.core.Pinned.release()
        }
        println("PROBEAB suite warm done (40 queries)")
        (1 to 4).foreach { round =>
          t(s"r$round minhash_lsh (suite)")(graft.scale.Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 8, 0.6).count())
        }
      case _ =>
        (1 to 4).foreach { round =>
          t(s"r$round jaccard collapse=off")(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6, collapseExact = false).count())
          t(s"r$round jaccard collapse=on ")(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count())
          t(s"r$round clusters collapse=off")(graft.scale.Components.dupClusters(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6, collapseExact = false)).count())
          t(s"r$round clusters collapse=on ")(graft.scale.Components.dupClusters(graft.scale.Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6)).count())
        }
    }
    spark.stop()
  }
}
