package graft.proc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Series

/** T1: one processing step — consumes named input series, emits series that
  * are upserted (replace-if-same-name, else add) into the working set
  * (reference: tsflex/processing/series_processor.py:57-237; output
  * dispatch :277-370).
  *
  * In Spark the natural unit is a Column expression over a single series
  * (`mapSeries`) or an arbitrary `DataFrame => DataFrame` over the wide
  * merged frame (`dataframeFunc`, reference: series_processor.py:19-54).
  */
final case class SeriesProcessor(
    name: String,
    requiredSeries: Seq[String],
    apply: Map[String, Series] => Seq[Series])

object SeriesProcessor {
  /** Transform each of `names` independently, value-wise, index preserved. */
  def mapSeries(procName: String, names: Seq[String])(f: Column => Column): SeriesProcessor =
    SeriesProcessor(procName, names, dict => names.map { n =>
      val s = dict(n)
      s.copy(df = s.df.withColumn(s.valueCol, f(col(s.valueCol))))
    })

  /** Transform each of `names` into a NEW series `rename(n)` (add). */
  def mapSeriesAs(procName: String, names: Seq[String], rename: String => String)(
      f: Column => Column): SeriesProcessor =
    SeriesProcessor(procName, names, dict => names.map { n =>
      val s = dict(n)
      val out = rename(n)
      Series(out, s.df.withColumn(out, f(col(s.valueCol))), s.idxCol, out)
    })

  /** Multi-output dispatch — one processor call on each input series emits
    * SEVERAL series, all upserted into the working set (the reference's
    * list-of-Series return path,
    * tsflex/processing/series_processor.py:363-367; the DataFrame return
    * path, :320-331, is `dataframeFunc`). `f` receives the full input Series
    * so it can run its own aggregation passes (fit-broadcast-transform);
    * output names must be unique across the whole step — the reference's
    * duplicate-output-key assert (:215-218) is enforced by
    * `SeriesPipeline.process`.
    */
  def flatMapSeries(procName: String, names: Seq[String])(
      f: Series => Seq[Series]): SeriesProcessor =
    SeriesProcessor(procName, names, dict => names.flatMap(n => f(dict(n))))

  /** Convenience multi-output over value-wise Column functions: each input
    * series `n` emits one NEW series per `(rename, f)` pair, named
    * `rename(n)` — e.g. low-pass + high-pass of every channel in one step.
    */
  def mapSeriesMulti(procName: String, names: Seq[String],
      outs: Seq[(String => String, Column => Column)]): SeriesProcessor =
    SeriesProcessor(procName, names, dict => names.flatMap { n =>
      val s = dict(n)
      outs.map { case (rename, f) =>
        val out = rename(n)
        Series(out, s.df.withColumn(out, f(col(s.valueCol))), s.idxCol, out)
      }
    })

  /** Standardize each series to zero mean / unit variance (population):
    * the per-series stats are one partial-aggregated pass, broadcast into a
    * map-only transform — the classic "fit then transform" processing step
    * with no driver round-trip. Constant series map to 0.
    */
  def standardize(procName: String, names: Seq[String]): SeriesProcessor =
    SeriesProcessor(procName, names, dict => names.map { n =>
      val s = dict(n)
      val stats = s.df.agg(
        avg(col(s.valueCol)).as("__m"),
        stddev_pop(col(s.valueCol)).as("__sd"))
      val out = s.df.crossJoin(broadcast(stats))
        .withColumn(s.valueCol,
          when(col("__sd") =!= 0.0,
            (col(s.valueCol) - col("__m")) / col("__sd"))
            .otherwise(lit(0.0)))
        .drop("__m", "__sd")
      s.copy(df = out)
    })

  /** T2 `dataframe_func`: outer-merge the required series into a wide frame,
    * apply `f`, explode the result back into series.
    */
  def dataframeFunc(procName: String, names: Seq[String])(
      f: DataFrame => DataFrame): SeriesProcessor =
    SeriesProcessor(procName, names, dict => {
      val series = names.map(dict)
      val wide = Series.toWide(series)
      val out = f(wide)
      val idxCol = series.head.idxCol
      Series.fromWide(out, idxCol)
    })
}

/** T3: ordered sequential pipeline with upsert semantics (reference:
  * tsflex/processing/series_pipeline.py:22-271). Spark keeps every step
  * lazy — the whole pipeline collapses into one Catalyst plan per output
  * series; Catalyst prunes the steps any given output doesn't need.
  */
final class SeriesPipeline(val steps: Seq[SeriesProcessor]) {

  def append(p: SeriesProcessor): SeriesPipeline = new SeriesPipeline(steps :+ p)
  def insert(i: Int, p: SeriesProcessor): SeriesPipeline =
    new SeriesPipeline(steps.take(i) ++ (p +: steps.drop(i)))

  /** P1: series required by any step. */
  def requiredSeries: Seq[String] = steps.flatMap(_.requiredSeries).distinct

  /** Sequential fold; each step sees the accumulated dict (upserts applied).
    *
    * @param returnAll when false, only series produced/required by steps are
    *                  returned (reference: series_pipeline.py:228-245)
    * @param dropKeys  names removed from the output
    */
  def process(data: Seq[Series], returnAll: Boolean = true,
              dropKeys: Seq[String] = Nil): Seq[Series] = {
    var dict = scala.collection.immutable.ListMap(data.map(s => s.name -> s): _*)
    val produced = scala.collection.mutable.LinkedHashSet[String]()
    steps.foreach { st =>
      val missing = st.requiredSeries.filterNot(dict.contains)
      require(missing.isEmpty,
        s"processor ${st.name}: missing input series ${missing.mkString(", ")}")
      val outs = st.apply(dict)
      // the reference asserts one step never emits the same output key twice
      // (series_processor.py:215-218) — silent last-wins would drop data
      val dups = outs.groupBy(_.name).collect { case (n, vs) if vs.size > 1 => n }
      require(dups.isEmpty,
        s"processor ${st.name}: duplicate output series ${dups.mkString(", ")}")
      outs.foreach { out =>
        dict = dict.updated(out.name, out)
        produced += out.name
      }
    }
    val kept =
      if (returnAll) dict.values.toSeq
      else dict.values.filter(s => produced(s.name) || requiredSeries.contains(s.name)).toSeq
    kept.filterNot(s => dropKeys.contains(s.name))
  }

  /** `return_df=True` analog: process then outer-merge to a wide frame (S3). */
  def processToDf(data: Seq[Series], returnAll: Boolean = true,
                  dropKeys: Seq[String] = Nil): DataFrame =
    Series.toWide(process(data, returnAll, dropKeys))
}
