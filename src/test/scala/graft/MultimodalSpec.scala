package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeCodec, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column layer: schema, batched decode plumbing,
  * resize/frame-sample contracts. Codec internals are stubs; the
  * Spark-side shapes under test are the real pipeline.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table schema: opaque binary payload + typed metadata") {
    val df = Multimodal.mediaTable(spark, sf)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") == "binary")
    assert(types("kind") == "string" && types("width") == "integer")
    val r = df.filter(df("kind") === "video").limit(1).collect()(0)
    val payload = r.getAs[Array[Byte]]("payload")
    assert(payload.length == 16 * r.getAs[Int]("n_frames"),
      "payload length consistent with frame metadata")
  }

  test("batched decode emits unit-norm embeddings of the declared dim") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(
      Multimodal.mediaTable(spark, sf).as[MediaRecord]).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.embedding.length == FakeCodec.embedDim))
    assert(feats.forall(f =>
      math.abs(f.embedding.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
    assert(feats.forall(_.n_bytes % 32 == 0), "payloads are md5 repeats")
  }

  test("resize contract: output payload is exactly w*h bytes, meta updated") {
    import spark.implicits._
    val resized = Multimodal.resizeAll(
      Multimodal.mediaTable(spark, sf).as[MediaRecord], 8, 5).collect()
    assert(resized.forall(r => r.payload.length == 40 && r.width == 8 && r.height == 5))
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

  test("metadata projection prunes the text column work to one scan pass") {
    val plan = Multimodal.mediaMeta(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.contains("Sort"),
      "meta projection is scan+project+sort, no join/agg shuffles")
  }
}
