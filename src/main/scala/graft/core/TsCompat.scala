package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-encoding tolerance for the driver-generated `events` table —
  * the ONE place the ts convention lives (it was previously copied into
  * SparkEntry, ScaleSmoke and ScaleData, which could silently diverge).
  * TIMESTAMP(NANOS) parquet only reads under `nanosAsLong` (Spark 4), then
  * floors to micros (matching DuckDB's epoch_us); TIMESTAMP_NTZ casts to
  * the instant type under the session's UTC zone.
  */
object TsCompat {
  def normalizeTs(raw: DataFrame, tsCol: String = "ts"): DataFrame =
    raw.schema(tsCol).dataType match {
      case LongType =>
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        raw.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => raw
    }

  def readEvents(s: SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(path))
  }
}
