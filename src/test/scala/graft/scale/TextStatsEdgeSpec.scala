package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge-case coverage for the text statistics that previously threw under
  * ANSI mode (Spark 4 default).
  */
class TextStatsEdgeSpec extends SparkSpec {

  test("repetition: empty and whitespace-only docs yield 0.0, not DIVIDE_BY_ZERO") {
    import spark.implicits._
    val df = Seq(
      (1L, ""),
      (2L, "   "),
      (3L, "a a a a a a b b")).toDF("doc_id", "text")
    val out = TextStats.repetition(df, "doc_id", "text", topN = 1, dupN = 2)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    // empty/whitespace docs: zero length => zero char fraction, no crash
    assert(out(0).getAs[Double]("top_char_frac") == 0.0)
    assert(out(1).getAs[Double]("top_char_frac") == 0.0)
    // the real doc still gets a meaningful fraction
    val frac = out(2).getAs[Double]("top_char_frac")
    assert(frac > 0.0 && frac <= 1.0, s"got $frac")
  }
}
