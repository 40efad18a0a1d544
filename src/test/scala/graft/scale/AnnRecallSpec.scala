package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential recall of the LSH paths against brute force on the sf0.1
  * embeddings (2000 × 64): auto-derived plane count, single- vs multi-probe.
  */
class AnnRecallSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.1"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private val dims = 64

  test("autoPlanes follows the log2(n/targetBucket) rule") {
    assert(Ann.autoPlanes(2000, 64) == 5)
    assert(Ann.autoPlanes(64, 64) == 1) // never fewer than one plane
    assert(Ann.autoPlanes(1L << 30, 64) == 24)
    assert(Ann.autoPlanes(1L << 30, 256) == 22)
  }

  test("lshTopK: multi-probe recall dominates single-probe recall") {
    val planes = Ann.autoPlanes(emb.count()) // 5 planes -> 32 buckets
    val query = emb.where(col("vec_id") === 0).select("embedding")
    val base = emb.where(col("vec_id") =!= 0)
    val k = 20
    val exact = Ann.cosineTopK(base, "vec_id", "embedding", query, k)
      .collect().map(_.getLong(0)).toSet
    def recall(h: Int): Double = {
      val got = Ann.lshTopK(base, "vec_id", "embedding", query, k, planes, dims, h)
        .collect().map(_.getLong(0)).toSet
      got.intersect(exact).size.toDouble / k
    }
    val r0 = recall(0)
    val r1 = recall(1)
    info(f"lshTopK recall@$k: single-probe $r0%.2f multi-probe $r1%.2f")
    assert(r1 >= r0)
    assert(r1 >= 0.5)
  }

  test("embedNearDups: multi-probe superset; recall matches LSH theory") {
    val base = emb.where(col("vec_id") < 1000)
    val planes = Ann.autoPlanes(base.count()) // 1000/64 -> 4 planes
    val threshold = 0.35 // the corpus' near-dup band (cf. q32)
    def pairSet(h: Int): Set[(Long, Long)] =
      Dedup.embedNearDups(base, "vec_id", "embedding", planes, dims, threshold, h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p0 = pairSet(0)
    val p1 = pairSet(1)
    // exact all-pairs ground truth WITH cosines (5e5 candidate pairs)
    val e = base.select(col("vec_id"),
      transform(col("embedding"), c => c.cast("double")).as("__e"))
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        Ann.cosine(col("a.__e"), col("b.__e")).as("c"))
      .where(round(col("c"), 6) >= threshold)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // sign-LSH collision probability per plane: p = 1 - acos(cos)/pi;
    // radius 0 collides on all planes, radius 1 tolerates one disagreement
    val probs = exact.values.map { c =>
      val p = 1.0 - math.acos(math.max(-1, math.min(1, c))) / math.Pi
      val p0e = math.pow(p, planes)
      (p0e, p0e + planes * math.pow(p, planes - 1) * (1 - p))
    }
    val (exp0, exp1) = (probs.map(_._1).sum / probs.size,
      probs.map(_._2).sum / probs.size)
    val r0 = p0.size.toDouble / exact.size
    val r1 = p1.size.toDouble / exact.size
    info(f"recall r0=$r0%.3f (theory $exp0%.3f) r1=$r1%.3f (theory $exp1%.3f) " +
      f"of ${exact.size} pairs")
    assert(p0.subsetOf(p1), "multi-probe must not lose radius-0 pairs")
    assert(p1.subsetOf(exact.keySet), "every emitted pair must pass the exact check")
    assert(r1 >= r0)
    // the implementation should track the analytic expectation; wide margin
    // covers the fixed (md5) hyperplanes vs the isotropic assumption
    assert(math.abs(r0 - exp0) <= 0.15, s"radius-0 recall $r0 vs theory $exp0")
    assert(math.abs(r1 - exp1) <= 0.15, s"radius-1 recall $r1 vs theory $exp1")
  }

  test("embedNearDups exact-dup collapse is output-identical on a clone-heavy corpus") {
    // 300 base vectors replicated 3x under shifted ids — every vector is a
    // 3-clique of byte-identical clones, the corpus shape the collapse
    // targets (q32's 10x-replication super-linearity)
    val base = emb.where(col("vec_id") < 300)
    val clones = (0 until 3).map(k =>
      base.select((col("vec_id") + lit(k * 100000L)).as("vec_id"),
        col("embedding"))).reduce(_.unionAll(_))
    val planes = Ann.autoPlanes(300)
    def pairs(collapse: Boolean): Set[(Long, Long, Double)] =
      Dedup.embedNearDups(clones, "vec_id", "embedding", planes, dims, 0.35,
          probeHamming = 1, collapseExact = collapse)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val withCollapse = pairs(true)
    val raw = pairs(false)
    assert(withCollapse == raw,
      s"collapse changed output: only-collapsed=${(withCollapse -- raw).take(3)} " +
        s"only-raw=${(raw -- withCollapse).take(3)}")
    // each of the 300 3-cliques must contribute its 3 intra pairs at 1.0
    assert(withCollapse.count(p => p._3 == 1.0 &&
      (p._2 - p._1) % 100000L == 0 && p._1 % 100000L == p._2 % 100000L) >= 900)
  }
}
