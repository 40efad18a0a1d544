package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Banded simhash pair generation must be EXACT: pigeonhole (t < bands)
  * guarantees every pair within Hamming t shares a full band, so the banded
  * plan and the brute-force all-pairs scan agree pair-for-pair.
  */
class SimhashPairsSpec extends SparkSpec {

  // word soup with many shared tokens -> plenty of small Hamming distances
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "line", "sort")
    (0 until n).map { i =>
      val words = (0 until 30).map(j => vocab((i * 31 + j * 7) % vocab.size))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def brute(df: DataFrame, t: Int): Set[(Long, Long, Int)] = {
    val s = Dedup.simhash32(df, "doc_id", "text")
    s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .where(col("h") <= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("banded Hamming<=3 (4 bands) equals brute force") {
    val df = corpus(120)
    val banded = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = brute(df, 3)
    assert(exact.nonEmpty, "fixture must produce near pairs")
    assert(banded == exact)
  }

  test("banded Hamming<=7 (8 bands) equals brute force") {
    val df = corpus(80)
    val banded = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute(df, 7))
  }

  test("maxHamming=0 short-circuit matches the full-signature equi-join") {
    val df = corpus(60).union(corpus(60)
      .withColumn("doc_id", col("doc_id") + 1000L)) // exact text clones
    val z = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(z == brute(df, 0))
  }

  test("clone cliques: replicated corpus equals brute force, no duplicate rows") {
    // 5 id-shifted copies -> every text is a clique of exact clones; the
    // signature collapse must still emit each qualifying pair EXACTLY once
    // (within-clique Hamming-0 explode + cross-signature fan-out)
    val base = corpus(40)
    val df = (0 until 5).map(k =>
      base.withColumn("doc_id", col("doc_id") + lit(k * 1000L))).reduce(_ union _)
    val rows = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = brute(df, 3)
    assert(rows.length == rows.toSet.size, "pair emitted more than once")
    assert(rows.toSet == exact)
    assert(rows.forall { case (a, b, _) => a < b })
  }

  test("plan hygiene: both banded join children reuse one shuffle exchange") {
    // at spec scale AQE broadcasts the right side (also shuffle-free); force
    // the at-scale sort-merge path to assert the exchange is built ONCE
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = corpus(100)
      val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, bands = 4)
      pairs.collect() // AQE finalizes reuse only after execution
      assert(pairs.queryExecution.executedPlan.toString.contains("ReusedExchange"),
        "banded self-join should shuffle the (band, bits) index ONCE")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("duplicated ids never emit self-pairs or per-occurrence duplicates") {
    import spark.implicits._
    // id 7 appears twice with IDENTICAL text (must collapse to one doc) and
    // id 9 twice with DIFFERING text (participates per-signature but must
    // never meet itself across its own two signatures)
    val base = corpus(30)
    val dup7 = base.where(col("doc_id") === 7L)
    val alt9 = Seq((9L, "spark sort merge batch line table key agg row scan"))
      .toDF("doc_id", "text")
    val df = base.union(dup7).union(alt9)
    val rows = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall { case (a, b, _) => a < b }, "self-pair emitted")
    // the identical-text duplicate adds NOTHING: same pair set as without it
    val without = Dedup.simhashPairs(base.union(alt9), "doc_id", "text",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows.toSet == without)
  }

  test("pigeonhole precondition rejected: maxHamming >= bands") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(corpus(5), "doc_id", "text", maxHamming = 4, bands = 4)
    }
  }
}
