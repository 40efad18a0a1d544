package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SimHash-64: kernel vs a driver-side reference, and the banded pair
  * retrieval at 16-bit slices.
  */
class SimHash64Spec extends SparkSpec {

  // independent reference: md5 per token, bit b of the fingerprint from
  // bit (b mod 4) of hex digit (b div 4), sign of the +-1 sum
  private def reference(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    for (w <- text.trim.split("\\s+", -1)) {
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      for (b <- 0 until 64) {
        val nibble = Integer.parseInt(hex((b >> 2)).toString, 16)
        counts(b) += (if (((nibble >> (b & 3)) & 1) == 1) 1 else -1)
      }
    }
    (0 until 64).foldLeft(0L)((fp, b) =>
      if (counts(b) >= 0) fp | (1L << b) else fp)
  }

  test("native kernel matches the hex-string reference") {
    import spark.implicits._
    val texts = Seq("key agg row scan", "slow fast table value part",
      "a", "", "  spaced   out  tokens ")
    val got = texts.toDF("t")
      .select(SimHash64(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(reference))
  }

  test("banded 64-bit Hamming<=3 pairs equal brute force") {
    import spark.implicits._
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort")
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until 30).map(j => vocab((i * 31 + j * 7) % vocab.size))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val banded = graft.scale.Dedup
      .simhashPairs64(docs, "doc_id", "text", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val s = graft.scale.Dedup.simhash64(docs, "doc_id", "text")
    val brute = s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .where(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
  }

  test("the top (sign-bit) band slices correctly") {
    import spark.implicits._
    // force signatures with the high bit set and verify exact clones pair
    // through the banded path (slice of the sign-extended top 16 bits)
    val docs = (0 until 40).flatMap(i => Seq(
      (i.toLong * 2, s"clone body number $i"),
      (i.toLong * 2 + 1, s"clone body number $i"))).toDF("doc_id", "text")
    val pairs = graft.scale.Dedup
      .simhashPairs64(docs, "doc_id", "text", maxHamming = 1, bands = 4)
      .where(col("hamming") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 40).forall(i =>
      pairs.contains((i.toLong * 2, i.toLong * 2 + 1))))
  }
}
