package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A named, index-ordered series — the engine's unit of data (reference:
  * tsflex/features/feature_collection.py:868-876; SURVEY §1.1).
  *
  * Spark representation: a two-column lineage `(idx, value)` per series.
  * Multivariate data = multiple independently-indexed Series (possibly
  * different sampling rates); alignment happens only at segmentation time,
  * never by row join (SURVEY §1.1).
  *
  * @param name     unique series name; must not contain `|` or `__`
  *                 (reserved for output names, reference:
  *                 feature_collection.py:56-71)
  * @param df       source frame holding `idxCol` and `valueCol`
  * @param idxCol   the sortable index column (TimestampType → TIME domain,
  *                 numeric → SEQUENCE domain)
  * @param valueCol the value column (any dtype — datatype retention)
  */
final case class Series(name: String, df: DataFrame, idxCol: String, valueCol: String) {
  require(!name.contains("|") && !name.contains("__"),
    s"series name '$name' may not contain '|' or '__'")

  val idxType: DataType = df.schema(idxCol).dataType

  val domain: Domain = idxType match {
    case TimestampType | DateType | TimestampNTZType => Domain.Time
    case _: NumericType                              => Domain.Sequence
    case t => throw new IllegalArgumentException(s"unsupported index dtype $t for series $name")
  }

  /** Internal normalized frame: `__idx DOUBLE` (epoch micros for TIME — exact
    * below 2^53 — raw value for SEQUENCE), `__v` (original dtype retained).
    * NULL index rows are dropped (they are unorderable).
    */
  def internal: DataFrame = {
    val idxExpr = domain match {
      case Domain.Time     => unix_micros(col(idxCol).cast(TimestampType)).cast(DoubleType)
      case Domain.Sequence => col(idxCol).cast(DoubleType)
    }
    df.select(idxExpr.as("__idx"), col(valueCol).as("__v"))
      .where(col("__idx").isNotNull)
  }

  /** Restore an internal Double index/anchor column to the original dtype
    * (datatype & index-dtype retention guarantee, SURVEY §1.3).
    */
  def restoreIdx(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = idxType match {
    case TimestampType | TimestampNTZType | DateType =>
      timestamp_micros(c.cast(LongType)).cast(idxType)
    case t: NumericType => c.cast(t)
    case t => c.cast(t)
  }
}

object Series {
  /** Explode a wide frame into one Series per non-index column, dropping
    * each column's null rows so every series keeps an independent index
    * (the reference warns against NaN-injecting wide joins,
    * docs/pdoc_include/root_documentation.md:57-68).
    */
  def fromWide(df: DataFrame, idxCol: String, cols: Seq[String] = Nil): Seq[Series] = {
    val names = if (cols.nonEmpty) cols else df.columns.filterNot(_ == idxCol).toSeq
    names.map(c => Series(c, df.where(col(c).isNotNull), idxCol, c))
  }

  /** Long/tidy format → series list: one Series per distinct value of
    * `keyCol` (the reference ships this as a documented recipe,
    * docs/pdoc_include/root_documentation.md:51-88). The key set is
    * collected to the driver (it is the SERIES list — inherently small);
    * each series is a pushdown-friendly filter over the same source.
    */
  def fromLong(df: DataFrame, idxCol: String, keyCol: String,
               valueCol: String): Seq[Series] = {
    val keys = df.select(keyCol).distinct()
      .collect().map(_.get(0).toString).sorted
    keys.toSeq.map(k => Series(k,
      df.where(col(keyCol) === k).select(col(idxCol), col(valueCol).as(k)),
      idxCol, k))
  }

  /** S3: series-dict → wide frame sink — full outer equi-join of all series
    * on the index (reference: tsflex/utils/data.py:16-71
    * `series_dict_to_df`).
    */
  def toWide(series: Seq[Series]): DataFrame = {
    require(series.nonEmpty)
    val frames = series.map(s => s.df.select(col(s.idxCol).as("__join_idx"),
      col(s.valueCol).as(s.name)))
    frames.reduce((a, b) => a.join(b, Seq("__join_idx"), "full_outer"))
      .withColumnRenamed("__join_idx", series.head.idxCol)
  }
}
