package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Distributed Lloyd's k-means as the IVF codebook (fit-broadcast-transform
  * shape): recovery of well-separated clusters, determinism, and IVF recall
  * with the fitted codebook.
  */
class KmeansSpec extends SparkSpec {

  // 3 well-separated clusters on coordinate axes, 30 points each
  private def clustered = {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val pts = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      val base = Array.fill(6)(0.05 * rnd.nextDouble())
      base(c * 2) = 1.0 + 0.1 * rnd.nextDouble()
      (c * 100L + i, base.toSeq, c)
    }
    pts.toDF("id", "emb", "truth")
  }

  test("k-means recovers well-separated clusters") {
    val d = clustered
    val cells = Ann.kmeansCells(d, "id", "emb", k = 3, iters = 5)
    assert(cells.count() == 3)
    // assign every point to its nearest fitted centroid; each truth cluster
    // must map to exactly one cell (purity 1.0 on separated data)
    val assigned = d.crossJoin(broadcast(cells))
      .select(col("id"), col("truth"), col("__cell"),
        Ann.cosine(transform(col("emb"), x => x.cast("double")),
          col("__cell_vec")).as("__sim"))
      .groupBy("id", "truth")
      .agg(max_by(col("__cell"), struct(col("__sim"), -col("__cell"))).as("cell"))
    val purity = assigned.groupBy("truth")
      .agg(count_distinct(col("cell")).as("ncells"))
      .collect()
    assert(purity.forall(_.getLong(1) == 1L))
    // and the 3 cells are distinct across truth clusters
    val cellsPerTruth = assigned.select("truth", "cell").distinct().count()
    assert(cellsPerTruth == 3)
  }

  test("k-means is deterministic across runs") {
    val d = clustered
    val a = Ann.kmeansCells(d, "id", "emb", 3, 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val b = Ann.kmeansCells(d, "id", "emb", 3, 3).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("ivfTopK with a k-means codebook matches brute force on probed data") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val base = emb.where(col("vec_id") =!= 0)
    val query = emb.where(col("vec_id") === 0)
    val codebook = Ann.kmeansCells(base, "vec_id", "embedding", k = 8, iters = 3)
    val got = Ann.ivfTopK(base, "vec_id", "embedding", "label", query, 10, 3,
      codebook = Some(codebook)).collect().map(_.getLong(0)).toSet
    val exact = Ann.cosineTopK(base, "vec_id", "embedding",
      query.select("embedding"), 10).collect().map(_.getLong(0)).toSet
    // probing 3/8 cells: recall well above random (10/n); separated enough
    // at this scale that at least half the true top-10 is recovered
    assert(got.intersect(exact).size >= 5,
      s"IVF recall too low: ${got.intersect(exact).size}/10")
  }
}
