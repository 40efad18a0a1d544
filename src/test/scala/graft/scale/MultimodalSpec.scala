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

  test("frameStats rolls pre-extracted frames up to per-asset video stats") {
    import spark.implicits._
    // asset 1: lum 10 → 60 → 200 → 190: two jumps over threshold 100?
    // |60-10|=50, |200-60|=140 (cut), |190-200|=10 → one cut
    // asset 2: single frame → std 0, no cuts
    val frames = Seq(
      (1L, 0, 5, 4, 10.0), (1L, 1, 5, 4, 60.0),
      (1L, 2, 5, 4, 200.0), (1L, 3, 5, 4, 190.0),
      (2L, 0, 7, 2, 30.0))
      .toDF("asset_id", "frame_index", "width", "height", "mean_lum")
      .repartition(3) // the per-asset window must re-order shuffled frames
    val out = Multimodal.frameStats(frames, 100.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    val (n1, w1, h1, mu1, sd1, cuts1) = out(1L)
    assert((n1, w1, h1, mu1, cuts1) == ((4L, 5, 4, 115.0, 1L)))
    // σ_pop = sqrt((105² + 55² + 85² + 75²) / 4) = sqrt(6725)
    assert(math.abs(sd1 - math.sqrt(6725.0)) < 1e-9)
    assert(out(2L) == ((1L, 7, 2, 30.0, 0.0, 0L)))
  }

  test("frameStats composes with real GIF decode end-to-end") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticGif(5, 4, Seq(10, 60, 210))),
      (2L, "not a gif".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val frames = Multimodal.decodeFrames(df, 1).toDF().where(col("ok"))
    val out = Multimodal.frameStats(frames, 100.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(6))).toMap
    // |60-10|=50, |210-60|=150 → one cut; the corrupt asset has no ok rows
    assert(out == Map(1L -> ((3L, 1L))))
  }

  test("decodeImage recovers exact dimensions and channel constants from a PNG roundtrip") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticPng(17, 9, 200, 30, 77)),
      (2L, Multimodal.syntheticPng(3, 3, 0, 255, 128)),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, Array.emptyByteArray)).toDF("asset_id", "payload")
    val out = Multimodal.decodeImage(df).collect().sortBy(_.asset_id)
    assert(out(0).ok && out(0).width == 17L && out(0).height == 9L &&
      out(0).channels == 3 && out(0).mean_r == 200.0 &&
      out(0).mean_g == 30.0 && out(0).mean_b == 77.0)
    assert(out(1).ok && out(1).width == 3L && out(1).mean_g == 255.0)
    // corrupt / empty payloads degrade to ok=false, never fail the stage
    assert(!out(2).ok && !out(3).ok)
  }

  test("resizeImage hits target dims and a constant fill survives the resample") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.syntheticPng(40, 20, 10, 20, 30)))
      .toDF("asset_id", "payload")
    val rz = Multimodal.resizeImage(df, 8, 6).collect().head
    assert(rz.width == 8 && rz.height == 6 && rz.payload.nonEmpty)
    val back = Multimodal.decodeImage(
      Seq((1L, rz.payload)).toDF("asset_id", "payload")).collect().head
    assert(back.ok && back.width == 8L && back.height == 6L &&
      back.mean_r == 10.0 && back.mean_g == 20.0 && back.mean_b == 30.0)
  }

  test("imageHistogram embeds real pixels: constant image → one-hot bin, unit norm") {
    import spark.implicits._
    // gray of (60,60,60) = 60 → bin 60*8/256 = 1
    val df = Seq(
      (1L, Multimodal.syntheticPng(5, 4, 60, 60, 60)),
      (2L, Multimodal.syntheticPng(9, 2, 60, 60, 60)),
      (3L, Multimodal.syntheticPng(5, 4, 250, 250, 250))).toDF("asset_id", "payload")
    val out = Multimodal.imageHistogram(df, 8).collect().sortBy(_.asset_id)
    assert(out(0).embedding.toSeq == out(1).embedding.toSeq) // size-invariant
    assert(out(0).embedding(1) == 1.0f && out(0).embedding.map(v => v * v).sum == 1.0f)
    assert(out(2).embedding(7) == 1.0f)
  }

  test("decodeFrames: animated GIF stride sampling recovers exact frame grays") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticGif(5, 4, Seq(10, 60, 110, 160, 210))),
      (2L, Multimodal.syntheticGif(7, 2, Seq(0, 255))),
      (3L, "definitely not a gif".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val out = Multimodal.decodeFrames(df, 2).collect()
      .sortBy(r => (r.asset_id, r.frame_index))
    val a1 = out.filter(_.asset_id == 1L)
    // stride 2 over 5 frames -> indices 0, 2, 4
    assert(a1.map(_.frame_index).toSeq == Seq(0, 2, 4))
    assert(a1.forall(f => f.ok && f.width == 5 && f.height == 4))
    assert(a1.map(_.mean_lum).toSeq == Seq(10.0, 110.0, 210.0))
    val a2 = out.filter(_.asset_id == 2L)
    assert(a2.map(f => (f.frame_index, f.mean_lum)).toSeq == Seq((0, 0.0)))
    // corrupt payload degrades to one ok=false row, never fails the stage
    val a3 = out.filter(_.asset_id == 3L)
    assert(a3.map(f => (f.frame_index, f.ok)).toSeq == Seq((-1, false)))
  }

  test("decodeWav recovers rate/channels/duration from a WAVE roundtrip") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticWav(16000, 8000)),
      (2L, Multimodal.syntheticWav(44100, 44100)),
      (3L, "definitely not audio".getBytes("UTF-8"))).toDF("asset_id", "payload")
    val out = Multimodal.decodeWav(df).collect().sortBy(_.asset_id)
    assert(out(0).ok && out(0).sample_rate == 16000 && out(0).channels == 1 &&
      out(0).frames == 8000L && out(0).duration_ms == 500L)
    assert(out(1).ok && out(1).duration_ms == 1000L)
    assert(!out(2).ok)
  }

  test("native WAV header parse agrees with the JRE codec across formats") {
    import spark.implicits._
    // varied rate/channel/frame combos through the fast header path,
    // cross-checked against AudioSystem on the SAME bytes — the two
    // derivations must agree field-for-field (the fast path replaced the
    // codec in decodeWav because AudioSystem serializes threads on the
    // provider-registry lock; this pins output identity)
    val fixtures = for {
      rate <- Seq(8000, 16000, 24000, 44100)
      ch <- Seq(1, 2)
      frames <- Seq(1, 100, 4411)
    } yield (rate, ch, frames)
    val df = fixtures.zipWithIndex.map { case ((r, c, f), i) =>
      (i.toLong, Multimodal.syntheticWav(r, c, f))
    }.toDF("asset_id", "payload")
    val got = Multimodal.decodeWav(df).collect().sortBy(_.asset_id)
    fixtures.zipWithIndex.foreach { case ((r, c, f), i) =>
      val o = got(i)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(
          Multimodal.syntheticWav(r, c, f)))
      try {
        assert(o.ok, s"fixture $i")
        assert(o.sample_rate == ais.getFormat.getSampleRate.toInt)
        assert(o.channels == ais.getFormat.getChannels)
        assert(o.frames == ais.getFrameLength, s"fixture $i frames")
      } finally ais.close()
    }
    // malformed payloads (truncated header, empty) must come back
    // ok=false — same verdict AudioSystem reaches. A LYING data-chunk
    // size is rejected by the fast parser but accepted by the stream-based
    // JRE fallback (it never validates declared size against actual
    // bytes) — parity with the pre-r13 codec-only behavior is ok=true
    // with the declared frame count.
    val bad = Seq(
      (100L, Multimodal.syntheticWav(8000, 1, 100).take(20)),
      (102L, Array[Byte]())).toDF("asset_id", "payload")
    assert(Multimodal.decodeWav(bad).collect().forall(!_.ok))
    val lying = { val b = Multimodal.syntheticWav(8000, 1, 100)
      b(40) = 0x10.toByte; b(41) = 0x27.toByte; b(42) = 0; b(43) = 0; b }
    val lyRow = Multimodal.decodeWav(
      Seq((101L, lying)).toDF("asset_id", "payload")).collect().head
    assert(lyRow.ok && lyRow.frames == 10000 / 2,
      "JRE-fallback parity on declared-size payloads")
  }

  test("malformed fmt chunks take the JRE path and keep its normalized fields") {
    import spark.implicits._
    // fmt chunk declaring size 12 (< the 16 PCM bytes): the fast parser
    // must decline (reading rate/blockAlign at fixed offsets would consume
    // the next chunk's bytes) — AudioSystem accepts the file and reports
    // the true geometry (probed: rate 8000, ba 2, frames 100), so the
    // operator's contract is ok=true with the JRE's values, not garbage
    val shortFmt = Multimodal.syntheticWav(8000, 1, 100)
    shortFmt(16) = 12; shortFmt(17) = 0; shortFmt(18) = 0; shortFmt(19) = 0
    // blockAlign 7, inconsistent with channels*bits/8 = 2: the old parser
    // would publish frames = dataBytes/7 = 28; the JRE normalizes to 2
    val badBa = Multimodal.syntheticWav(8000, 1, 100)
    badBa(32) = 7; badBa(33) = 0
    val rows = Multimodal.decodeWav(
      Seq((1L, shortFmt), (2L, badBa)).toDF("asset_id", "payload"))
      .collect().sortBy(_.asset_id)
    assert(rows.forall(r => r.ok && r.sample_rate == 8000 &&
      r.channels == 1 && r.frames == 100),
      s"expected JRE-normalized geometry, got ${rows.mkString(";")}")
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
