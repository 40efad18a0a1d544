package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.core._
import graft.scale.{Ann, Dedup}

/** Scale-up smoke: replicates sf0.1 inputs 10x (time-shifted events →
  * ~1M rows spanning ~10 months; id-shifted documents → 50k docs) and runs
  * the heavy operator families. The point is EVIDENCE for the 100 TB
  * design claims: every stage stays partition-parallel, nothing collapses
  * into a single task, runtimes grow roughly linearly with data.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev0 = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val span = ev0.agg(max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
      .head().getLong(0) + 1000000L
    val events = (0 until copies).map(k =>
      ev0.select(timestamp_micros(unix_micros(col("ts")) + lit(k * span)).as("ts"),
        col("value"), col("event_type"),
        (col("user_id") + lit(k * 1000)).as("user_id")))
      .reduce(_.unionAll(_))

    val d0 = spark.read.parquet(s"$dir/documents.parquet")
    val docs = (0 until copies).map(k =>
      d0.select((col("doc_id") + lit(k * 1000000)).as("doc_id"), col("text")))
      .reduce(_.unionAll(_))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALESMOKE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time(s"events x$copies count")(events.count())
    time("rolling 1D/6h fused x7") {
      import FeatureFuncs._
      val fns = Seq(min, max, sum, len, std, variance, mean)
      val fc = FeatureCollection.of(fns.map(f => FeatureDescriptor(f, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("6h"))))))
      fc.calculate(Seq(Series("value", events, "ts", "value")))
        .queryExecution.toRdd.count()
    }
    time("keyed rolling per user") {
      import FeatureFuncs._
      KeyedFeatures.calculate(events, "user_id", "ts", "value",
        Win.time("1D"), Seq(Win.time("1D")), Seq(len, mean), "value")
        .queryExecution.toRdd.count()
    }
    time("group_by_consecutive") {
      import FeatureFuncs._
      val fc = FeatureCollection(FeatureDescriptor(mean, "value", None, None))
      fc.calculateGroupByConsecutive(
        Seq(Series("value", events, "ts", "value")),
        Series("uid", events, "ts", "user_id"))
        .queryExecution.toRdd.count()
    }
    time(s"docs x$copies minhash LSH") {
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 8, 0.6).count()
    }
    time(s"docs x$copies exact dedup") {
      Dedup.exactNormalized(docs, "doc_id", "text").count()
    }
    val e0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val embs = (0 until copies).map(k =>
      e0.select((col("vec_id") + lit(k * 1000000)).as("vec_id"),
        col("embedding"), col("label"))).reduce(_.unionAll(_))
    time(s"embeddings x$copies LSH buckets") {
      Ann.lshBuckets(embs, "vec_id", "embedding", 8, 64).count()
    }
    time(s"docs x$copies jaccard PPJoin") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.6).count()
    }
    // Exact duplicates make ANY similarity join quadratic within each dup
    // group (every copy pairs with every other — that's real output, not a
    // plan flaw). The production pipeline runs exact dedup first and
    // near-dups the representatives; this measures that composition.
    time(s"docs x$copies jaccard after exact-dedup") {
      val reps = docs.groupBy(md5(col("text")).as("__k"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      Dedup.jaccardPairs(reps, "doc_id", "text", 3, 0.6).count()
    }
    time(s"docs x$copies repetition") {
      graft.scale.TextStats.repetition(docs, "doc_id", "text").count()
    }
    time(s"docs x$copies contamination") {
      // fixed eval-set size vs growing corpus — the production shape
      val bench = d0.select(col("doc_id"), col("text")).limit(500)
      Dedup.contamination(docs, "doc_id", "text",
        bench, "doc_id", "text", n = 5).count()
    }
    time(s"docs x$copies simhash") {
      Dedup.simhash32(docs, "doc_id", "text").queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
