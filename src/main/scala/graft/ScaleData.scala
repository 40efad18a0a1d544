package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Writes an N×-replicated copy of a testdata scale factor as parquet — the
  * input for full-SUITE scale probes (ScaleSmoke replicates in-memory per
  * family; this materializes the same axes once so `Bench`/`Verify` can run
  * ALL queries against the bigger inputs unchanged).
  *
  * Replication axes (same as ScaleSmoke): events are TIME-shifted per copy
  * (window count multiplies, per-window sample count stays constant) with
  * user_id shifted (key count multiplies); documents/embeddings are
  * id-shifted (corpus size multiplies; the exact-dup collapse then sees
  * 10-cliques of identical texts — the template-heavy corpus shape);
  * lineitem/orders replicate as-is (aggregation row count multiplies); the
  * TPC-H dimension tables copy through unchanged.
  *
  * Usage: runMain graft.ScaleData <srcSfDir> <outDir> [copies=10]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(df: org.apache.spark.sql.DataFrame)(
        f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame) =
      (0 until copies).map(k => f(df, k)).reduce(_.unionAll(_))

    // FULL-SCHEMA fidelity: the r13 100x probe found 11 queries failing
    // against the replicated copy because this writer used to project the
    // tables down to the "interesting" columns — events lost event_id and
    // props (q62/q91/...), documents lost lang/source/n_chars
    // (q27/q57/q60/q77/...). A scale probe over a schema SUBSET silently
    // tests a different workload; every column now carries through, with
    // id columns shifted by data-derived strides to stay unique per copy.
    val ev0 = graft.core.TsCompat.readEvents(spark, s"$srcDir/events.parquet")
    // key shift derived from the DATA: a fixed constant silently merges
    // copies once the source has that many distinct ids (sf0.1 already has
    // 1500 users — a k*1000 shift collided users 1000+ across copies,
    // so a third of the keys spanned two copies' time ranges (2x the
    // windows per merged key) instead of multiplying the key count).
    // One agg = one scan for all three bounds.
    val evBounds = ev0.agg(
      (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span"),
      max(col("user_id")).as("mu"), max(col("event_id")).as("me")).head()
    val span = evBounds.getLong(0) + 1000000L
    val uShift = evBounds.getLong(1) + 1L
    val eShift = evBounds.getLong(2) + 1L
    rep(ev0)((d, k) => d.select(
      (col("event_id") + lit(k * eShift)).as("event_id"),
      timestamp_micros(unix_micros(col("ts")) + lit(k * span)).as("ts"),
      (col("user_id") + lit(k * uShift)).as("user_id"),
      col("event_type"), col("value"), col("props")))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val doc0 = spark.read.parquet(s"$srcDir/documents.parquet")
    val dShift = doc0.agg(max(col("doc_id"))).head().getLong(0) + 1L
    rep(doc0)((d, k) => d.withColumn("doc_id", col("doc_id") + lit(k * dShift)))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb0 = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val vShift = emb0.agg(max(col("vec_id"))).head().getLong(0) + 1L
    rep(emb0)((d, k) => d.withColumn("vec_id", col("vec_id") + lit(k * vShift)))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    for (t <- Seq("lineitem", "orders")) {
      val d = spark.read.parquet(s"$srcDir/$t.parquet")
      rep(d)((x, _) => x).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    println(s"SCALEDATA wrote ${copies}x $srcDir -> $outDir")
    spark.stop()
  }
}
