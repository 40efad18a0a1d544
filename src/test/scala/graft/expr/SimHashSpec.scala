package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.scale.Dedup

/** The native SimHash32 kernel must produce exactly the fingerprints of the
  * Column formulation (explode → md5 parity sums → sign bits) it replaced.
  */
class SimHashSpec extends SparkSpec {

  test("bit-identical to the Column formulation on adversarial strings") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",
      "single",
      "", // empty -> one empty token, like the exploded formulation
      "   leading and trailing   ",
      "tabs\tand\nnewlines inside the text here",
      "unicode tökens éé 漢字 emoji 😀 mixed").zipWithIndex
      .map(_.swap).toDF("i", "t")
    val native = Dedup.simhash32(docs, "i", "t")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cols = Dedup.simhash32Columns(docs, "i", "t")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(native == cols)
  }

  test("bit-identical on the real documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = Dedup.simhash32(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cols = Dedup.simhash32Columns(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == cols)
  }
}
