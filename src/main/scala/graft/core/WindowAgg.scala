package graft.core

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{struct, udaf}
import scala.collection.mutable.ArrayBuffer

/** The one custom Catalyst-level piece SURVEY §7.3 calls for: a typed
  * `Aggregator` (registered via `udaf`) that buffers the window's
  * (index, value) pairs and applies an arbitrary Scala function to the
  * INDEX-SORTED values — the escape hatch for reference-style feature
  * functions that need the whole window, with index access, in order
  * (A1/A3/A4). Unlike the `collect_list` + scalar-UDF formulation this
  * merges partial buffers on the map side and sorts once in `finish`.
  *
  * Everything else in the engine stays on built-in algebraic aggregates —
  * a custom Expression/SparkStrategy is deliberately NOT needed (§7.3).
  */
object WindowAgg {

  // public: kryo encoding rejects non-public buffer classes
  final case class Buf(var items: ArrayBuffer[(Double, Double)])

  private class SortedWindowAgg(fn: Seq[Double] => Double)
      extends Aggregator[(Double, Option[Double]), Buf, Double] {
    def zero: Buf = Buf(ArrayBuffer.empty)
    // None = a null value row — SKIPPED like every built-in aggregate.
    // (The previous primitive-Double input encoder decoded null as 0.0,
    // silently feeding phantom zero samples into the user function and
    // breaking robust() composition, whose NaN mask produces nulls
    // precisely so they get dropped here.)
    def reduce(b: Buf, a: (Double, Option[Double])): Buf = {
      a._2.foreach(v => b.items += ((a._1, v))); b
    }
    def merge(b1: Buf, b2: Buf): Buf = { b1.items ++= b2.items; b1 }
    def finish(b: Buf): Double =
      fn(b.items.sortBy(_._1).map(_._2).toSeq)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** A FeatureFunc applying `fn` to the index-sorted window values via the
    * typed Aggregator (null values are skipped like every aggregate).
    */
  def sortedWindowFunc(name: String, fn: Seq[Double] => Double): FeatureFunc = {
    val agg = udaf(new SortedWindowAgg(fn),
      Encoders.product[(Double, Option[Double])])
    FeatureFunc(name, (idx, v) => agg(idx.cast("double"), v.cast("double")))
  }
}
