package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{AudioCodec, ByteFallbackCodec, ImageCodec, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column layer: real in-JDK PNG codec for images,
  * byte fallback for codec-less kinds, batched decode plumbing,
  * resize/frame-sample contracts.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("png codec: encode -> decode roundtrips pixels bit-exactly") {
    val (w, h) = (37, 23)
    val pix = ImageCodec.renderPattern(99L, w, h)
    val png = ImageCodec.encodePng(w, h, pix)
    // a real PNG: magic bytes present, compressed (not raw pixels)
    assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    val (dw, dh, dec) = ImageCodec.decodeGray(png)
    assert(dw == w && dh == h)
    assert(dec.sameElements(pix), "PNG is lossless: decoded == source")
  }

  test("nearest-neighbor resize selects exact source pixels, up and down") {
    // downsample 8x8 -> 4x4: src index = x*8/4 = 2x
    val pix = Array.tabulate(64)(identity)
    val down = ImageCodec.resizeNearest(pix, 8, 8, 4, 4)
    assert(down.toSeq == (for (y <- 0 until 4; x <- 0 until 4)
      yield (y * 2) * 8 + x * 2).toSeq)
    // upsample 2x2 -> 4x4: src index = x*2/4 = x/2
    val up = ImageCodec.resizeNearest(Array(10, 20, 30, 40), 2, 2, 4, 4)
    assert(up.toSeq == Seq(10, 10, 20, 20, 10, 10, 20, 20,
      30, 30, 40, 40, 30, 30, 40, 40))
  }

  test("wav codec: encode -> decode roundtrips PCM16 samples bit-exactly") {
    val samples = AudioCodec.renderSamples(42L, 127)
    assert(samples.exists(_ < 0) && samples.exists(_ > 0),
      "pattern exercises both signs")
    val wav = AudioCodec.encodeWav(16000, samples)
    // a real RIFF/WAVE container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, dec) = AudioCodec.decodePcm16(wav)
    assert(rate == 16000)
    assert(dec.sameElements(samples), "WAV PCM is lossless")
  }

  test("audio decimation keeps exactly every factor-th sample") {
    val s = Array.tabulate(11)(i => i * 100 - 500)
    assert(AudioCodec.decimate(s, 2).toSeq == Seq(-500, -300, -100, 100, 300))
    assert(AudioCodec.decimate(s, 3).toSeq == Seq(-500, -200, 100))
  }

  test("media table schema: binary payload + typed metadata; images are real PNGs") {
    val df = Multimodal.mediaTable(spark, sf)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") == "binary")
    assert(types("kind") == "string" && types("width") == "integer")
    val v = df.filter(df("kind") === "video").limit(1).collect()(0)
    assert(v.getAs[Array[Byte]]("payload").length == 16 * v.getAs[Int]("n_frames"),
      "fallback payload length consistent with frame metadata")
    val i = df.filter(df("kind") === "image").limit(1).collect()(0)
    val (dw, dh, _) = ImageCodec.decodeGray(i.getAs[Array[Byte]]("payload"))
    assert(dw == i.getAs[Int]("width") && dh == i.getAs[Int]("height"),
      "image payload is a real decodable PNG matching its metadata")
    val a = df.filter(df("kind") === "audio").limit(1).collect()(0)
    val (rate, samples) = AudioCodec.decodePcm16(a.getAs[Array[Byte]]("payload"))
    assert(rate == a.getAs[Int]("sample_rate"),
      "audio payload is a real decodable WAV carrying its declared rate")
    assert(samples.length == AudioCodec.nSamples(a.getAs[Long]("media_id")))
  }

  test("batched decode emits unit-norm embeddings of the declared dim") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Multimodal.mediaTable(spark, sf).as[MediaRecord]).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.embedding.length == ImageCodec.embedDim))
    assert(feats.forall(f =>
      math.abs(f.embedding.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
    // image rows report decoded pixel count, audio rows decoded PCM
    // byte count, video (fallback) rows stored byte length
    val img = feats.filter(_.kind == "image")
    assert(img.nonEmpty && img.forall(f =>
      f.n_bytes == (f.media_id % 64 + 1) * (f.media_id % 48 + 1)))
    val aud = feats.filter(_.kind == "audio")
    assert(aud.nonEmpty && aud.forall(f =>
      f.n_bytes == 2 * AudioCodec.nSamples(f.media_id)))
    assert(feats.filter(_.kind == "video").forall(_.n_bytes % 32 == 0))
  }

  test("resize: images resampled through the real codec, fallback truncates") {
    import spark.implicits._
    val resized = Multimodal.resizeAll(
      Multimodal.mediaTable(spark, sf).as[MediaRecord], 8, 5).collect()
    assert(resized.forall(r => r.width == 8 && r.height == 5))
    val (img, rest) = resized.partition(_.kind == "image")
    assert(img.nonEmpty && rest.nonEmpty)
    assert(rest.forall(_.payload.length == 40), "fallback: exactly w*h bytes")
    img.foreach { r =>
      val (dw, dh, pix) = ImageCodec.decodeGray(r.payload)
      assert(dw == 8 && dh == 5)
      // re-encoded PNG decodes to the nearest-neighbor selection of
      // the original pattern
      val src = ImageCodec.renderPattern(r.media_id,
        (r.media_id % 64 + 1).toInt, (r.media_id % 48 + 1).toInt)
      val expect = ImageCodec.resizeNearest(src,
        (r.media_id % 64 + 1).toInt, (r.media_id % 48 + 1).toInt, 8, 5)
      assert(pix.sameElements(expect))
    }
  }

  test("frame sample keeps every 2nd 16-byte frame of video payloads") {
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[String]("frame").length == 16))
    assert(frames.forall(_.getAs[Int]("frame_idx") % 2 == 0))
    // per-media frame count = ceil(n_frames / 2) with n_frames in {2,4,6,8}
    val byMedia = frames.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(byMedia.values.forall(n => n >= 1 && n <= 4))
  }

  test("metadata projection prunes payloads: no PNG encode, no typed node") {
    val qe = Multimodal.mediaMeta(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("DeserializeToObject"),
      "metadata-only read must not pass through the payload-building typed node")
    assert(!plan.contains("Exchange") || plan.contains("Sort"),
      "meta projection is scan+project+sort, no join/agg shuffles")
  }

  test("byte fallback codec: unit norm and exact truncation contract") {
    val e = ByteFallbackCodec.embed("abcdef".getBytes("UTF-8"))
    assert(math.abs(e.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    assert(ByteFallbackCodec.resize(Array[Byte](1, 2, 3), 2, 2).toSeq ==
      Seq[Byte](1, 2, 3, 0))
  }

  test("phash dedup: resolution-invariant for nearest-upscaled content, " +
    "one keeper per group and it is the minimum id") {
    // the same 8x8 content nearest-upscaled to 16x16 must hash equal:
    // downsampling the upscale recovers the original pixels exactly
    def hashOf(payload: Array[Byte]): (Long, Long) = {
      val (w, h, pix) = ImageCodec.decodeGray(payload)
      val small = ImageCodec.resizeNearest(pix, w, h, 8, 8)
      val mean = small.map(_.toLong).sum / 64
      var lo = 0L; var hi = 0L
      for (i <- small.indices if small(i) > mean)
        if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
      (lo, hi)
    }
    val base = ImageCodec.renderPattern(5L, 8, 8)
    val up = ImageCodec.resizeNearest(base, 8, 8, 16, 16)
    assert(hashOf(ImageCodec.encodePng(8, 8, base)) ==
      hashOf(ImageCodec.encodePng(16, 16, up)))
    // driver shape: per (lo, hi) group exactly one keeper, the min id
    val rows = Multimodal.mediaPhashDedup(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)),
        r.getBoolean(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.count(_._3) == 1, "exactly one keeper per hash group")
      assert(g.filter(_._3).head._1 == g.map(_._1).min)
      assert(g.forall(_._4 == g.length))
    }
  }

  test("binaryFile ingest: every image lands as a file, decode matches the formula") {
    val rows = Multimodal.binaryFileIngest(spark, sf).collect()
    assert(rows.nonEmpty)
    val imageIds = Multimodal.mediaMeta(spark, sf).collect()
      .filter(_.getString(1) == "image").map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === imageIds,
      "one output row per written image file")
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(w === (id % 64 + 1).toInt && h === (id % 48 + 1).toInt)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.ImageCodec.pixel(id, x, y).toLong).sum
      assert(r.getLong(3) === want)
    }
  }

  test("audio features: windowed zc/peak/ssq recompute from the sample formula") {
    val rows = Multimodal.audioFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    val W = Multimodal.AudioWindow
    val byClip = rows.groupBy(_.getLong(0))
    byClip.foreach { case (mediaId, frames) =>
      val n = Multimodal.AudioCodec.nSamples(mediaId)
      assert(frames.length === n / W, s"clip $mediaId frame count")
      frames.foreach { r =>
        val w = r.getLong(1).toInt
        val s = (w * W until (w + 1) * W)
          .map(Multimodal.AudioCodec.sample(mediaId, _))
        val zc = s.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
        val ssq = s.map(x => x.toLong * x).sum
        assert(r.getLong(2) === zc.toLong)
        assert(r.getLong(3) === s.map(x => math.abs(x.toLong)).max)
        assert(r.getLong(4) === ssq)
        assert(r.getLong(5) === ssq / W)
      }
    }
  }

  test("scene cuts fire exactly at scene boundaries, nowhere else") {
    import org.apache.spark.sql.functions.col
    val M = graft.multimodal.Multimodal
    val cuts = M.videoSceneCuts(spark, TestSpark.sf).collect()
    assert(cuts.nonEmpty)
    // a boundary is the first frame of scenes 1..n-1: idx % SceneLen == 0
    cuts.foreach { r =>
      val f = r.getInt(1)
      assert(f % M.SceneLen == 0 && f > 0,
        s"cut at non-boundary frame $f (media ${r.getLong(0)})")
      // boundary L1: 16 bytes each shifted by 17 mod 256 — every |diff|
      // is 17 or 239, so the delta is bounded by those extremes
      val d = r.getLong(2)
      assert(d >= 16L * 17 && d <= 16L * 239)
    }
    // and EVERY boundary of every video doc is present (no missed cuts)
    val nVideos = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 3 === 2).count()
    val boundariesPerVideo = (M.SceneFrames - 1) / M.SceneLen
    assert(cuts.length.toLong == nVideos * boundariesPerVideo)
  }

  test("quarantine gate: one bad blob costs one row, for any corruption shape") {
    // the driver query's sentinel is a truncated PNG; the gate itself
    // must be total over arbitrary garbage — decode failure modes
    // differ (IIOException vs null reader vs EOF) but all must route
    // to quarantine, never up the stage
    val good = ImageCodec.encodePng(5, 4, ImageCodec.renderPattern(3L, 5, 4))
    val shapes = Seq[Array[Byte]](
      good.take(10),                      // truncated after signature
      Array.empty[Byte],                  // zero bytes
      Array.fill[Byte](64)(0x41),         // not an image at all
      good.updated(15, 0x7f.toByte))      // flipped header byte
    shapes.foreach { bad =>
      val r = scala.util.Try(ImageCodec.decodeGray(bad))
      assert(r.isFailure, "every corruption shape must fail decode, not return junk")
    }
    // and the driver query quarantines exactly the sentinel subset
    import org.apache.spark.sql.functions.col
    val q = Multimodal.mediaQuarantine(spark, TestSpark.sf)
    val bad = q.filter(col("status") === "quarantined")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val imgIds = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 3 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(bad == imgIds.filter(_ % 7 == 0))
    assert(q.filter(col("status") === "ok").count() ==
      (imgIds.size - bad.size).toLong)
  }
}
