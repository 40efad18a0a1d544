package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** Scratch: q12 assignment distinct-seg count under different configs. */
object ProbeG3 {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.getOrElse("true")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val grp = Series("uid", ev, "ts", "user_id")
    val vSeries = Series("value", ev, "ts", "value")
    val runsBase = Scan.lagFlagScan(
      grp.internal.where(col("__v").isNotNull), "__idx", "__v",
      (prev, cur) => prev.isNull || prev =!= cur, "__run")
    val runs = runsBase.groupBy("__run").agg(
      min(col("__idx")).as("__start"), max(col("__idx")).as("__end"),
      first(col("__v")).as("__grp")).localCheckpoint(false)
    val rows = vSeries.internal
    val vType = rows.schema("__v").dataType
    val starts = runs.select(col("__start").as("__idx"), lit(0).as("__tag"),
      col("__run").as("__runid"), lit(null).cast(vType).as("__v"))
    val rowsT = rows.select(col("__idx"), lit(1).as("__tag"),
      lit(null).cast("long").as("__runid"), col("__v"))
    val u = starts.unionByName(rowsT)
    val assigned = Scan.fillForward(u, Seq("__idx", "__tag"), "__runid", "__seg_id")
    (1 to 3).foreach { i =>
      val d = assigned.where(col("__tag") === 1 && col("__seg_id").isNotNull)
        .select("__seg_id").distinct().count()
      println(s"aqe=$aqe eval$i distinct seg ids: $d (want 99927)")
    }
    spark.stop()
  }
}
