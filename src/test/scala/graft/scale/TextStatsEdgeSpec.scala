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

  test("chunkText: coverage, overlap, ragged tail, degenerate docs") {
    import spark.implicits._
    val words = (1 to 100).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")),
      (2L, "a b c"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextStats.chunkText(df, "doc_id", "text", size = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 1, 31, 61 — the third window reaches token 100, so no
    // ragged 4th chunk is emitted
    assert(d1.map(_._4).toSeq == Seq(40L, 40L, 40L))
    assert(d1.last._3.split(" ").last == "w100")
    // chunk k repeats the last `overlap` tokens of chunk k-1
    val c0 = d1(0)._3.split(" "); val c1 = d1(1)._3.split(" ")
    assert(c0.takeRight(10).toSeq == c1.take(10).toSeq)
    // every token covered, in order, exactly once modulo overlap
    assert(d1.flatMap(_._3.split(" ")).distinct.length == 100)
    // short doc: one chunk, the doc itself
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c", 3L)))
    // ragged tail: 105 tokens -> starts 1, 31, 61, 91; last chunk 15 long
    val ragged = TextStats.chunkText(
      Seq((9L, (1 to 105).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", size = 40, overlap = 10)
      .collect().map(r => (r.getInt(1), r.getLong(3))).sortBy(_._1)
    assert(ragged.toSeq == Seq((0, 40L), (1, 40L), (2, 40L), (3, 15L)))
    // empty doc: one empty chunk (token array [""] -> "" rejoined)
    val d3 = out.filter(_._1 == 3L)
    assert(d3.length == 1 && d3.head._3 == "" && d3.head._4 == 1L)
    // overlap 0 partitions exactly
    val part = TextStats.chunkText(df.where(col("doc_id") === 1L),
        "doc_id", "text", size = 30, overlap = 0)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(part.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(part.sortBy(_._1).flatMap(_._2.split(" ")).toSeq == words)
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
