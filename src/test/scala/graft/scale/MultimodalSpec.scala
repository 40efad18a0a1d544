package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multimodal plumbing: schema, partition-streamed stubs, and the
  * multimodal → ANN pipeline shape.
  */
class MultimodalSpec extends SparkSpec {

  private def assets = {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "spark multimodal payload"),
      (3L, "")).toDF("doc_id", "text")
    Multimodal.fromText(docs, "doc_id", "text")
  }

  test("decode stub emits deterministic metadata per asset") {
    val out = Multimodal.decodeStub(assets).collect().sortBy(_.asset_id)
    assert(out.map(_.asset_id).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).n_bytes == 11L && out(0).duration_ms == 77L)
    assert(out(2).n_bytes == 0L) // empty payload survives
  }

  test("resize stub keeps the asset id and hits the target byte budget") {
    val out = Multimodal.resizeStub(assets, 64, 64).collect().sortBy(_.asset_id)
    assert(out.forall(r => r.width == 64 && r.height == 64))
    assert(out.forall(_.payload.length == 64 * 64 / 64))
  }

  test("extracted fake embeddings are L2-normalized and feed Ann.cosineTopK") {
    val emb = Multimodal.extractFeaturesStub(assets, 8).toDF()
    val norms = emb.select(col("asset_id"),
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0), (s, x) => s + x * x)).as("n")).collect()
    assert(norms.filter(_.getLong(0) != 3L).forall(r =>
      math.abs(r.getDouble(1) - 1.0) < 1e-6))
    val top = Ann.cosineTopK(emb.where(col("asset_id") =!= 1L), "asset_id",
      "embedding", emb.where(col("asset_id") === 1L), 1)
    assert(top.count() == 1) // pipeline composes end-to-end
  }
}
