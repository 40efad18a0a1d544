package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The exact-dup pre-collapse inside `Dedup.jaccardPairs` must be
  * output-invariant: collapsing docs with identical shingle sets to one
  * representative and fanning the results back out yields EXACTLY the pair
  * set (and Jaccard values) of the uncollapsed pipeline. Checked on a
  * template-heavy corpus (dup cliques, near-dups, singletons, short docs)
  * and on degenerate shapes.
  */
class JaccardCollapseSpec extends SparkSpec {

  private def pairsOf(df: DataFrame, collapse: Boolean): Set[(Long, Long, Double)] =
    Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.6, collapseExact = collapse)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

  private def corpus(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("collapsed output equals uncollapsed on a template-heavy corpus") {
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and once"
    val rows: Seq[(Long, String)] =
      // a 5-clique of identical docs
      (1L to 5L).map(i => (i, template)) ++
      // permuted word order (same words, DIFFERENT shingles — must NOT merge)
      Seq((6L, "again and again the quick brown fox jumps over the lazy dog")) ++
      // a 3-clique of near-dups of the template
      (7L to 9L).map(i => (i, near)) ++
      // singletons
      Seq((10L, "completely unrelated text about spark catalyst expressions"),
          (11L, "short doc"), // < k words → one whole-text shingle
          (12L, "short doc"), // identical short doc (same single shingle)
          (13L, "")) // empty → empty shingle-set edge case
    val c = corpus(rows)
    val collapsed = pairsOf(c, collapse = true)
    val plain = pairsOf(c, collapse = false)
    assert(collapsed == plain)
    // sanity: the clique really is there (5 identical docs → 10 pairs at 1.0)
    val cliquePairs = collapsed.filter { case (a, b, j) => a <= 5 && b <= 5 && j == 1.0 }
    assert(cliquePairs.size == 10)
    // the near-dups pair with every clique member (and each other)
    assert(collapsed.exists { case (a, b, _) => a <= 5 && b >= 7 && b <= 9 })
  }

  test("collapsed output equals uncollapsed on the sf0.001 documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(pairsOf(docs, collapse = true) == pairsOf(docs, collapse = false))
  }

  private def lshPairsOf(df: DataFrame, collapse: Boolean): Set[(Long, Long, Double)] =
    Dedup.minhashLsh(df, "doc_id", "text", 3, 16, 8, 0.6, collapseExact = collapse)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

  test("minhashLsh collapse is output-invariant (identical sets ⇒ identical signatures)") {
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and once"
    val rows: Seq[(Long, String)] =
      (1L to 5L).map(i => (i, template)) ++
      (7L to 9L).map(i => (i, near)) ++
      Seq((10L, "completely unrelated text about spark catalyst expressions"),
          (11L, "short doc"), (12L, "short doc"), (13L, ""))
    val c = corpus(rows)
    assert(lshPairsOf(c, collapse = true) == lshPairsOf(c, collapse = false))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(lshPairsOf(docs, collapse = true) == lshPairsOf(docs, collapse = false))
  }

  test("all-identical corpus: n docs → n(n-1)/2 pairs at exactly 1.0") {
    val c = corpus((1L to 7L).map(i => (i, "same doc every single time here")))
    val got = pairsOf(c, collapse = true)
    assert(got.size == 21 && got.forall(_._3 == 1.0))
    assert(got == pairsOf(c, collapse = false))
  }

  test("fuzz: collapse differential on random small-vocab corpora") {
    // tiny vocabulary + short docs → exact dups and near-dups arise
    // naturally; every seed compares collapsed vs uncollapsed output
    val vocab = Vector("a", "b", "c", "d", "e")
    for (seed <- 1 to 8) {
      val rng = new scala.util.Random(seed)
      val rows: Seq[(Long, String)] = (1L to 24L).map { i =>
        val n = rng.nextInt(8) // 0..7 words (incl. empty + sub-k docs)
        (i, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val c = corpus(rows)
      assert(pairsOf(c, collapse = true) == pairsOf(c, collapse = false),
        s"jaccard mismatch at seed $seed")
      assert(lshPairsOf(c, collapse = true) == lshPairsOf(c, collapse = false),
        s"minhash mismatch at seed $seed")
    }
  }

  private def pairsWithCut(df: DataFrame, collapse: Boolean,
                           maxDf: Option[Long]): Set[(Long, Long, Double)] =
    Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.6,
        maxDocFreq = maxDf, collapseExact = collapse)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSet

  test("maxDocFreq sees MEMBER-level document frequency under collapse (weighted df)") {
    // A 3-clique amplifies its template's shingles: shingles shared with the
    // B-docs have member-level df = 3 + 4 = 7. An UNWEIGHTED collapse would
    // count the rep once (df = 1 + 4 = 5), so a limit of 5 or 6 keeps the
    // amplified shingles under collapse while the uncollapsed path cuts
    // them — candidate generation diverges and cross/B-B pairs appear only
    // on the collapsed side. The weighted df makes the cut identical.
    // (Limits below the clique's own df of 3 are out of contract: collapse
    // finds exact dups via the collapse key, not the index, so it keeps
    // intra-clique pairs the uncollapsed path loses to the cut.)
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val rows: Seq[(Long, String)] =
      (1L to 3L).map(i => (i, template)) ++
        Seq("once", "maybe", "twice", "thrice").zipWithIndex.map { case (w, i) =>
          (10L + i, template.split(' ').dropRight(1).mkString(" ") + " " + w)
        }
    val c = corpus(rows)
    for (lim <- Seq(3L, 5L, 6L, 7L)) {
      assert(pairsWithCut(c, collapse = true, Some(lim)) ==
        pairsWithCut(c, collapse = false, Some(lim)), s"maxDocFreq=$lim")
    }
    // the cut must BIND at 6 (else this differential is vacuous): without it
    // the corpus yields clique + cross + B-B pairs, with it only the clique
    val cut = pairsWithCut(c, collapse = false, Some(6L))
    val full = pairsWithCut(c, collapse = false, None)
    assert(cut != full && full.size == 3 + 12 + 6 && cut.size == 3)
  }

  test("keepRepresentatives drops exactly the non-rep cluster members") {
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val c = corpus(
      (1L to 5L).map(i => (i, template)) ++           // one 5-clique, rep = 1
      Seq((10L, "completely unrelated text about spark catalyst expressions"),
          (11L, "another singleton that matches nothing at all whatsoever")))
    val pairs = Dedup.jaccardPairs(c, "doc_id", "text", 3, 0.6)
    val kept = Dedup.keepRepresentatives(c, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 11L))
  }

  test("keepExactNormalized keeps min-id per bag, uniques pass through") {
    // word-order permutation = SAME normalized bag (unlike the shingle key)
    val c = corpus(Seq(
      (5L, "b a c"), (2L, "a b c"), (9L, "c b a"),
      (10L, "totally different words here")))
    val kept = Dedup.keepExactNormalized(c, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L))
  }

  test("no duplicates at all: collapse is a pass-through") {
    val c = corpus(Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six seven")))
    assert(pairsOf(c, collapse = true) == pairsOf(c, collapse = false))
  }
}
