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

  test("unigramPerplexity: add-one smoothing, OOV handling, train != target") {
    import spark.implicits._
    // LM corpus "a a b": counts a=2, b=1; N=3, V=2
    // p(a) = 3/5, p(b) = 2/5, p(unseen) = 1/5
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val target = Seq((10L, "a c"), (11L, "b b")).toDF("doc_id", "text")
    val out = TextStats.unigramPerplexity(train, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 10: exp(-(ln(3/5) + ln(1/5))/2) = sqrt(25/3)
    assert(math.abs(out(10L) - math.sqrt(25.0 / 3.0)) < 1e-9)
    // doc 11: exp(-ln(2/5)) = 5/2
    assert(math.abs(out(11L) - 2.5) < 1e-9)
    // a doc drawn from the LM scores lower (more likely) than an OOV doc
    assert(out(11L) < out(10L))
  }

  test("redactPii: emails, IPv4s, long digit runs — and what must survive") {
    import spark.implicits._
    val cases = Seq(
      ("mail a.b+tag@sub.example.com now", "mail [EMAIL] now"),
      ("at 10.0.0.1, see 192.168.001.255.", "at [IP], see [IP]."),
      ("card 4111111111111111 leaked", "card [NUM] leaked"),
      ("order 123456789012 is fine", "order 123456789012 is fine"), // 12 digits: keep
      ("v1.2.3.4a is a version", "v1.2.3.4a is a version"),        // \b guard: keep
      ("no pii here at all", "no pii here at all"),
      ("e@a.example 1.2.3.4 1234567890123", "[EMAIL] [IP] [NUM]"))      // all three
    val out = cases.map(_._1).toDF("text")
      .select(TextStats.redactPii(col("text"))).collect().map(_.getString(0))
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got '$got', want '$want'")
    }
  }
}
