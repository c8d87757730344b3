package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column layer: image/audio/video as opaque `BINARY`
  * payloads with a typed metadata struct, plus the batched
  * decode / feature-extract / resize / frame-sample operators a
  * training-data pipeline runs over them.
  *
  * The container has no media codecs, so the *decode step itself* is a
  * clearly-marked deterministic fake ([[FakeCodec]]); everything
  * Spark-side — schema, binary columns, partition-parallel batched
  * execution, frame explosion, embedding shape — is real and is what
  * would carry a 100 TB media corpus. Payload bytes never reach the
  * driver: every operator is a projection or mapPartitions over the
  * executors.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. The payload stays
    * byte-opaque to the engine (codec concerns live behind the decode
    * stubs), the metadata is columnar and prunable.
    */
  case class MediaRecord(media_id: Long, kind: String, mime: String,
      payload: Array[Byte], width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  /** A decoded feature row (the output contract of the decode UDF). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      embedding: Array[Float])

  /** Deterministic stand-in for real codecs.
    *
    * STUB: a production build binds an actual decoder here (JPEG/PNG
    * via ImageIO, audio/video via ffmpeg). Those libraries are not in
    * this container, so decode is a pure function of the raw bytes —
    * which keeps every downstream pipeline shape (schemas, batching,
    * shuffles) identical to the real thing and fully testable.
    */
  object FakeCodec {
    val embedDim = 16

    /** "Decode" a payload to a unit-norm byte-histogram embedding. */
    def embed(payload: Array[Byte]): Array[Float] = {
      val h = new Array[Float](embedDim)
      var i = 0
      while (i < payload.length) { h((payload(i) & 0xff) % embedDim) += 1f; i += 1 }
      val n = math.sqrt(h.map(x => x.toDouble * x).sum)
      if (n > 0) h.map(x => (x / n).toFloat) else h
    }

    /** "Resize": contract = output is exactly w*h bytes (truncate or
      * zero-pad). A real impl would resample pixels.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, w * h)
  }

  /** Synthesize the media table from the documents corpus: payload =
    * UTF-8 bytes of md5(text) repeated 1 + doc_id % 4 times (ASCII, so
    * byte arithmetic is mirrorable in the SQL oracle), kind/meta
    * derived from doc_id. This models binary ingest; a real pipeline
    * would read payloads from object storage with
    * `spark.read.format("binaryFile")`.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kind = element_at(typedLit(Seq("image", "audio", "video")),
      (($"doc_id" % 3) + 1).cast("int"))
    val mime = element_at(typedLit(Seq("image/png", "audio/wav", "video/mp4")),
      (($"doc_id" % 3) + 1).cast("int"))
    Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      kind.as("kind"),
      mime.as("mime"),
      encode(repeat(md5($"text"), (lit(1) + $"doc_id" % 4).cast("int")), "UTF-8")
        .as("payload"),
      (($"doc_id" % 64) + 1).cast("int").as("width"),
      (($"doc_id" % 48) + 1).cast("int").as("height"),
      (lit(8000) * (($"doc_id" % 3) + 1)).cast("int").as("sample_rate"),
      // payload bytes = 32 * (1 + doc_id % 4); frames are 16 bytes
      (lit(2) * (lit(1) + $"doc_id" % 4)).cast("int").as("n_frames"))
  }

  /** Metadata projection — payload column pruned away entirely, so the
    * scan never materializes the bytes (check ReadSchema in .explain).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select($"media_id", $"kind", $"mime",
        octet_length($"payload").as("n_bytes"), $"width", $"height")
      .orderBy($"media_id")
  }

  /** Frame sampling: split a video payload into 16-byte frames, keep
    * every `stride`-th. The explode happens executor-side; each output
    * row carries only its frame slice, not the whole payload.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import spark.implicits._
    val frames = transform(
      sequence(lit(0), $"n_frames" - 1),
      i => struct(i.as("frame_idx"),
        substring_bytes($"payload", i * 16 + 1, 16).as("frame")))
    mediaTable(spark, dir)
      .filter($"kind" === "video")
      .select($"media_id", explode(frames).as("f"))
      // emit the frame bytes UTF-8-decoded: the payloads are ASCII by
      // construction and the driver's oracle compare can't hash raw
      // binary cells; the byte-slicing above still runs on BinaryType
      .select($"media_id", $"f.frame_idx".as("frame_idx"),
        $"f.frame".cast("string").as("frame"))
      .filter($"frame_idx" % stride === 0)
      .orderBy($"media_id", $"frame_idx")
  }

  // substring on BinaryType: Spark's substring Column helper only
  // accepts Int positions; expr keeps the byte semantics + codegen
  private def substring_bytes(payload: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column, len: Int) =
    call_function("substring", payload, pos, lit(len))

  /** Batched decode: the mapInPandas/mapPartitions shape. Each
    * partition's rows stream through the (stub) codec once, so a real
    * decoder would amortize model/codec init per partition — the
    * standard batched-UDF deployment pattern for media decode.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, ONNX session…)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          FakeCodec.embed(r.payload))
      }
    }
  }

  /** Resize over the typed path (same batched shape as decode). */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      r.copy(payload = FakeCodec.resize(r.payload, w, h), width = w, height = h)))
  }

  /** Driver query for the resize path: every payload resized to w×h
    * bytes through the typed batched [[resizeAll]] operator. w*h is
    * chosen below the minimum payload size, so the contract exercised
    * here is pure truncation — ASCII in, ASCII out — which keeps the
    * emitted prefix hashable and the oracle a plain substring. (The
    * zero-pad branch of [[FakeCodec.resize]] emits NUL bytes the
    * harness compare cannot hash; MultimodalSpec covers it.)
    */
  def mediaResize(spark: SparkSession, dir: String, w: Int = 5,
      h: Int = 5): DataFrame = {
    import spark.implicits._
    resizeAll(mediaTable(spark, dir).as[MediaRecord], w, h)
      .toDF()
      .select($"media_id", octet_length($"payload").as("n_bytes"),
        $"payload".cast("string").as("payload_prefix"),
        $"width", $"height")
      .orderBy($"media_id")
  }

  /** Driver query: media embeddings via the batched decode path. The
    * typed [[decodeFeatures]] API keeps `ARRAY<FLOAT>`; the driver
    * projection renders the vector as ONE ';'-joined 6-decimal string
    * column because the harness compare cannot hash array cells (same
    * trick as [[frameSample]]'s byte decode). The stub embedding is a
    * pure function of md5(text) — the payload repeat factor cancels
    * under L2 normalization — so the DuckDB oracle mirrors it exactly,
    * float32-quantizing on both sides before formatting.
    */
  def mediaEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaTable(spark, dir).as[MediaRecord])
      .toDF()
      .select($"media_id", $"kind", $"n_bytes",
        concat_ws(";", transform($"embedding",
          x => format_string("%.6f", x))).as("embedding"))
      .orderBy($"media_id")
  }
}
