package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.scale.Dedup

/** WordShingles must produce exactly the same shingle arrays as the
  * zip_with-fold Column formulation on real and adversarial text.
  */
class WordShinglesSpec extends SparkSpec {

  // the Column formulation WordShingles replaces (kept here as the test
  // reference): k-1 zip_withs of the word array against its shifted self
  private def hofShingles(text: org.apache.spark.sql.Column, k: Int) = {
    val ws = split(trim(text), "\\s+")
    val joined = (2 to k).foldLeft(ws) { (acc, j) =>
      zip_with(acc, slice(ws, lit(j), greatest(size(ws) - (j - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(
      when(size(ws) >= k, slice(joined, lit(1), size(ws) - (k - 1)))
        .otherwise(array(concat_ws(" ", ws))))
  }

  test("bit-identical to the zip_with formulation on adversarial strings") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a", // duplicates collapse identically
      "one two", // shorter than k
      "single",
      "", // empty -> [""]
      "   leading and trailing   ",
      "tabs\tand\nnewlines inside the text here", // trim is 0x20-only
      "exactly five words right here now").zipWithIndex
      .map(_.swap).toDF("i", "t")
    for (k <- Seq(2, 3, 5)) {
      val rows = docs.select(col("i"),
        WordShingles(col("t"), k).as("nat"), hofShingles(col("t"), k).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k row ${r.getInt(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("bit-identical on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val diff = docs.select(WordShingles(col("text"), 5).as("nat"),
        hofShingles(col("text"), 5).as("hof"))
      .where(not(col("nat") === col("hof")))
      .count()
    assert(diff == 0)
  }

  test("null text stays null; codegen-only mode runs") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val d = Seq((1, "a b c"), (2, null)).toDF("i", "t")
      val rows = d.select(col("i"), WordShingles(col("t"), 2).as("s"))
        .orderBy("i").collect()
      assert(rows(0).getSeq[String](1) == Seq("a b", "b c"))
      assert(rows(1).isNullAt(1))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("shingle inverted index is unchanged through Dedup.shinglesWithSize") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.shinglesWithSize(docs, "doc_id", "text", 5)
      .groupBy("doc_id").count().orderBy("doc_id").collect()
    assert(got.nonEmpty && got.forall(_.getLong(1) > 0))
  }

  test("WordNgrams keeps multiplicity; short docs have no n-grams") {
    import spark.implicits._
    val d = Seq((1, "a b a b a"), (2, "one"), (3, ""), (4, null))
      .toDF("i", "t")
    val rows = d.select(col("i"), WordNgrams(col("t"), 2).as("g"))
      .orderBy("i").collect()
    // duplicates preserved in occurrence order (dedup'd by WordShingles)
    assert(rows(0).getSeq[String](1) == Seq("a b", "b a", "a b", "b a"))
    assert(rows(1).getSeq[String](1).isEmpty) // < k words -> NO grams
    assert(rows(2).getSeq[String](1).isEmpty)
    assert(rows(3).isNullAt(1))
  }
}
