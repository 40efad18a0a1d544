package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exact-substring (duplicated n-gram span) dedup — the Lee et al. ACL'22
  * signal as a distributed plan. Positions are 1-based, span_end exclusive.
  */
class SpanDedupSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("duplicatedSpans: shared 3-gram across two docs marks both") {
    val df = docs(Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e z")))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    // "c d e" starts at word 3 in both docs -> span [3, 6) in each
    assert(spans.toSeq == Seq((1L, 3, 6, 3), (2L, 3, 6, 3)))
  }

  test("duplicatedSpans: overlapping duplicated grams merge to one maximal span") {
    // "a b c d" repeated verbatim: 2-grams (a b)(b c)(c d) all duplicated,
    // overlapping positions 1..3 -> ONE span [1, 5) per doc, not three
    val df = docs(Seq((1L, "a b c d p q"), (2L, "a b c d r s")))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 2, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.sortBy(_._1).toSeq == Seq((1L, 1, 5), (2L, 1, 5)))
  }

  test("duplicatedSpans: gap-separated repeats stay separate spans") {
    val df = docs(Seq(
      (1L, "a b g1 g2 c d"),
      (2L, "a b h1 h2 c d")))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 2, minCount = 2)
      .where(col("doc_id") === 1L)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    // "a b" -> [1,3), "c d" -> [5,7); the unshared middle keeps them apart
    assert(spans.toSeq == Seq((1, 3), (5, 7)))
  }

  test("duplicatedSpans: ADJACENT (gap-free) spans merge") {
    val df = docs(Seq(
      (1L, "a b q q q q q c d"),
      (2L, "a b z z z z z c d")))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 2, minCount = 2)
      .where(col("doc_id") === 1L)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    // doc1 hits: "a b"@1, within-doc "q q"@3..6, "c d"@8 -> [1,3) touches
    // [3,8) touches [8,10): one maximal span [1,10)
    assert(spans.toSeq == Seq((1, 10)))
  }

  test("duplicatedSpans: within-doc repetition counts toward minCount") {
    val df = docs(Seq((1L, "u v w x u v w y")))
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = 3, minCount = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    // "u v w" occurs at 1 and 5 in the SAME doc -> spans [1,4) and [5,8)
    assert(spans.toSeq == Seq((1, 4), (5, 8)))
  }

  test("duplicatedSpans: docs shorter than n produce nothing") {
    val df = docs(Seq((1L, "a b"), (2L, "a b")))
    assert(Dedup.duplicatedSpans(df, "doc_id", "text", n = 3).count() == 0L)
  }

  test("stripDuplicatedSpans: removes all occurrences, keeps the rest") {
    val df = docs(Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e z")))
    val out = Dedup.stripDuplicatedSpans(df, "doc_id", "text", n = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a b f", 3L), (2L, "x y z", 3L)))
  }

  test("stripDuplicatedSpans: untouched docs pass through whitespace-normalized") {
    val df = docs(Seq((1L, "  lone   doc  here  ")))
    val out = Dedup.stripDuplicatedSpans(df, "doc_id", "text", n = 2)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("lone doc here", 0L)))
  }

  test("stripDuplicatedSpans: fully-duplicated doc empties") {
    val df = docs(Seq((1L, "p q r"), (2L, "p q r")))
    val out = Dedup.stripDuplicatedSpans(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "", 3L), (2L, "", 3L)))
  }

  test("fuzz: spans match a brute-force driver reference on random corpora") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d")
    for (seed <- Seq(1, 7, 42)) {
      val rng = new scala.util.Random(seed)
      val n = 3
      val corpus = (0L until 40L).map(id =>
        (id, (0 until (n + rng.nextInt(20))).map(_ =>
          vocab(rng.nextInt(vocab.size))).mkString(" ")))
      // brute force: count every n-gram across the corpus, mark hit
      // positions, merge overlapping/adjacent spans per doc
      val grams = corpus.flatMap { case (id, text) =>
        text.split(" ").sliding(n).zipWithIndex.map { case (g, i) =>
          (id, i + 1, g.mkString(" ")) } }
      val freq = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val expect = corpus.flatMap { case (id, _) =>
        val hits = grams.filter(g => g._1 == id && freq(g._3) >= 2)
          .map(_._2).sorted
        val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
        hits.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s0, e0) = spans.remove(spans.length - 1)
            spans += ((s0, math.max(e0, p + n)))
          } else spans += ((p, p + n))
        }
        spans.map { case (s0, e0) => (id, s0, e0) }
      }.toSet
      val got = Dedup.duplicatedSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = n, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == expect, s"seed $seed: ${got.size} vs ${expect.size} spans")
    }
  }

  test("fuzz: keepFirst = all hits minus the (id,pos)-minimal per gram class") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d")
    for (seed <- Seq(3, 11, 29)) {
      val rng = new scala.util.Random(seed)
      val n = 3
      val corpus = (0L until 40L).map(id =>
        (id, (0 until (n + rng.nextInt(20))).map(_ =>
          vocab(rng.nextInt(vocab.size))).mkString(" ")))
      val grams = corpus.flatMap { case (id, text) =>
        text.split(" ").sliding(n).zipWithIndex.map { case (g, i) =>
          (id, i + 1, g.mkString(" ")) } }
      val byGram = grams.groupBy(_._3)
      // the exempt occurrence per duplicated gram: minimal (id, pos)
      val first = byGram.view.mapValues(_.map(g => (g._1, g._2)).min).toMap
      val expect = corpus.flatMap { case (id, _) =>
        val hits = grams.filter(g => g._1 == id && byGram(g._3).size >= 2 &&
            first(g._3) != ((id, g._2)))
          .map(_._2).sorted
        val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
        hits.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s0, e0) = spans.remove(spans.length - 1)
            spans += ((s0, math.max(e0, p + n)))
          } else spans += ((p, p + n))
        }
        spans.map { case (s0, e0) => (id, s0, e0) }
      }.toSet
      val got = Dedup.duplicatedSpansKeepFirst(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = n, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == expect, s"seed $seed: ${got.size} vs ${expect.size} spans")
    }
  }

  test("contaminatedSpans: marks exactly the eval-set collisions") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "intro words the secret eval answer trailing text"),
      (2L, "totally clean document here no leak at all")).toDF("doc_id", "text")
    val bench = Seq("prefix the secret eval answer suffix").toDF("text")
    val spans = Dedup.contaminatedSpans(corpus, "doc_id", "text",
        bench, "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc1: 3-grams "the secret eval"@3, "secret eval answer"@4 both occur
    // in the benchmark -> one merged span [3, 7); doc2 untouched
    assert(spans.toSeq == Seq((1L, 3, 7)))
  }

  test("contaminatedSpans: within-corpus duplicates alone do not trigger") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq("x y z w").toDF("text")
    assert(Dedup.contaminatedSpans(corpus, "doc_id", "text",
      bench, "text", n = 3).count() == 0L)
  }

  test("keepFirst: the first (id, pos) occurrence survives, later ones strip") {
    val df = docs(Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e z")))
    // "c d e" duplicated; first occurrence is doc 1 pos 3 -> doc 1 keeps it
    val spans = Dedup.duplicatedSpansKeepFirst(df, "doc_id", "text", 3, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(spans.toSeq == Seq((2L, 3, 6)))
    val out = Dedup.stripDuplicatedSpansKeepFirst(df, "doc_id", "text", 3, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a b c d e f", 0L), (2L, "x y z", 3L)))
  }

  test("keepFirst: within-doc repeats keep only the earliest position") {
    val df = docs(Seq((1L, "u v w x u v w y")))
    val spans = Dedup.duplicatedSpansKeepFirst(df, "doc_id", "text", 3, 2)
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    // "u v w" at pos 1 and 5; pos 1 is first -> only [5, 8) strips
    assert(spans.toSeq == Seq((5, 8)))
  }

  test("keepFirst differential: clone family conserves exactly one copy") {
    // three identical docs of T tokens: strip-all removes 3T tokens,
    // keep-first removes 2T — kept = stripped + one occurrence
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val df = docs(Seq((1L, text), (2L, text), (3L, text)))
    def removed(d: org.apache.spark.sql.DataFrame) =
      d.agg(sum("removed_tokens")).collect()(0).getLong(0)
    val all = removed(Dedup.stripDuplicatedSpans(df, "doc_id", "text", 8, 2))
    val k1 = removed(Dedup.stripDuplicatedSpansKeepFirst(df, "doc_id", "text", 8, 2))
    assert(all == 36L && k1 == 24L, s"all=$all keepFirst=$k1")
    // the survivor is the (id, pos)-minimal doc, intact
    val kept = Dedup.stripDuplicatedSpansKeepFirst(df, "doc_id", "text", 8, 2)
      .where(col("doc_id") === 1L).collect()(0).getString(1)
    assert(kept == text)
  }

  test("keepFirst contract is per-GRAM: interleaved firsts can split spans") {
    // overlapping duplicated grams whose FIRST occurrences land in
    // different docs: firsts are "a b c"->(1,1), "b c d"->(1,2),
    // "c d e"->(2,2). Doc 2's exempted "c d e" copy is still partially
    // stripped by its neighboring non-exempt "b c d" hit — keep-first
    // guarantees one exempted occurrence per duplicated n-gram, NOT an
    // intact surviving copy of every maximal duplicated span (see the
    // duplicatedSpansKeepFirst scaladoc)
    val df = docs(Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "a b c d e")))
    val out = Dedup.stripDuplicatedSpansKeepFirst(df, "doc_id", "text", 3, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a b c d", 2L -> "e", 3L -> ""))
  }

  test("stripDuplicatedSpans: extra columns ride through") {
    val df = docs(Seq((1L, "a b c d e f"), (2L, "x y c d e z")))
      .withColumn("lang", lit("en"))
    val out = Dedup.stripDuplicatedSpans(df, "doc_id", "text", n = 3)
    assert(out.columns.toSeq == Seq("doc_id", "text", "lang", "removed_tokens"))
    assert(out.where(col("lang") === "en").count() == 2L)
  }
}
