package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native MinHashSlices kernel must produce exactly the signature
  * slices of the md5-transform + substring + array_min HOF formulation.
  */
class MinHashSlicesSpec extends SparkSpec {

  private def hofSlices(arr: org.apache.spark.sql.Column, numHashes: Int) =
    (0 until numHashes).map { i =>
      array_min(transform(arr,
        x => substring(md5(concat(x, lit(s"#${i / 4}"))), (i % 4) * 8 + 1, 8)))
    }

  test("bit-identical to the HOF formulation, incl. unicode and 1-element") {
    import spark.implicits._
    val docs = Seq(
      Seq("a b", "b c", "c d"),
      Seq("single"),
      Seq(""),
      Seq("tökens éé", "漢字 emoji", "😀 mixed"),
      (1 to 200).map(i => s"sh $i")).zipWithIndex
      .map(_.swap).toDF("i", "arr")
    for (nh <- Seq(4, 16, 6)) { // 6: non-multiple-of-4 tail group
      val native = docs.select(col("i"),
          MinHashSlices(col("arr"), nh).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      val hof = docs.select(col("i"), array(hofSlices(col("arr"), nh): _*).as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      assert(native == hof, s"numHashes=$nh")
    }
  }

  test("bit-identical on real shingle arrays") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), WordShingles(col("text"), 3).as("arr"))
    val native = docs.select(col("doc_id"),
        MinHashSlices(col("arr"), 16).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = docs.select(col("doc_id"),
        array(hofSlices(col("arr"), 16): _*).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == hof)
  }
}
