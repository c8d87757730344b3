package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column layer: image/audio/video as opaque `BINARY`
  * payloads with a typed metadata struct, plus the batched
  * decode / feature-extract / resize / frame-sample operators a
  * training-data pipeline runs over them.
  *
  * Image payloads are REAL PNGs, decoded with the in-JDK
  * `javax.imageio` ([[ImageCodec]]) — encode → decode roundtrips
  * through actual codec machinery on the executors, and the driver
  * queries are checked against an oracle that recomputes the same
  * features from the deterministic pixel pattern, so a lossy or
  * misbehaving decode would hash-mismatch. Audio/video kinds have no
  * in-JDK codec (no ffmpeg in this container), so they fall back to
  * the byte-level [[ByteFallbackCodec]] — clearly marked, and confined
  * to those kinds. Payload bytes never reach the driver: every
  * operator is a projection or mapPartitions over the executors.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. The payload stays
    * byte-opaque to the engine (codec concerns live behind the codec
    * objects), the metadata is columnar and prunable.
    */
  case class MediaRecord(media_id: Long, kind: String, mime: String,
      payload: Array[Byte], width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  /** A decoded feature row (the output contract of the decode UDF). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      embedding: Array[Float])

  /** REAL image codec on the JDK's own `javax.imageio` (java.desktop
    * ships with the JDK — zero new dependencies). Grayscale 8-bit
    * PNG: lossless, so encode → decode reproduces the source pixels
    * bit-exactly, which the driver oracle verifies end-to-end.
    */
  object ImageCodec {
    System.setProperty("java.awt.headless", "true")
    val embedDim = 16

    /** The deterministic test pattern both engines compute: pixel
      * (x, y) of image `mediaId` — pure integer arithmetic, mirrored
      * literally in the DuckDB oracle.
      */
    def pixel(mediaId: Long, x: Int, y: Int): Int =
      ((mediaId * 31 + x * 7 + y * 13) % 256).toInt

    /** Row-major w×h render of [[pixel]]. */
    def renderPattern(mediaId: Long, w: Int, h: Int): Array[Int] =
      Array.tabulate(w * h)(i => pixel(mediaId, i % w, i / w))

    /** Encode row-major 8-bit grayscale pixels as a real PNG. */
    def encodePng(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, pix(y * w + x)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(img, "png", bos))
        sys.error("no PNG writer available in this JDK")
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload to (w, h, row-major gray
      * samples). Reads raster samples directly (band 0) — no
      * ColorModel conversion that could perturb grayscale values.
      */
    def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) sys.error("undecodable image payload")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, out)
    }

    /** Nearest-neighbor resample: out(x, y) = in(x·W div w2, y·H div
      * h2) — integer floor selection, so both engines agree exactly
      * (works for up- and down-sampling).
      */
    def resizeNearest(pix: Array[Int], w: Int, h: Int,
        w2: Int, h2: Int): Array[Int] =
      Array.tabulate(w2 * h2) { i =>
        val (x, y) = (i % w2, i / w2)
        pix((y * h / h2) * w + (x * w / w2))
      }

    /** 16-bin pixel-intensity histogram (bin = value div 16),
      * L2-normalized — float op order identical to the byte fallback
      * so the oracle mirrors one formula for both.
      */
    def histEmbed(pix: Array[Int]): Array[Float] = {
      val hgm = new Array[Float](embedDim)
      var i = 0
      while (i < pix.length) { hgm(pix(i) / 16) += 1f; i += 1 }
      val n = math.sqrt(hgm.map(x => x.toDouble * x).sum)
      if (n > 0) hgm.map(x => (x / n).toFloat) else hgm
    }
  }

  /** REAL audio codec on the JDK's own `javax.sound.sampled` (also
    * java.desktop — zero new dependencies). PCM16 mono WAV: lossless,
    * so encode → decode reproduces the source samples bit-exactly,
    * verified end-to-end by the driver oracle like the image path.
    */
  object AudioCodec {
    val embedDim = 16

    /** The deterministic sample pattern both engines compute: sample i
      * of clip `mediaId` in [-32768, 32767] — pure integer arithmetic,
      * mirrored literally in the DuckDB oracle.
      */
    def sample(mediaId: Long, i: Int): Int =
      (((mediaId * 7919 + i.toLong * 104729) % 65536) - 32768).toInt

    /** Clip length: 64 + (mediaId % 64) samples. */
    def nSamples(mediaId: Long): Int = (64 + mediaId % 64).toInt

    def renderSamples(mediaId: Long, n: Int): Array[Int] =
      Array.tabulate(n)(sample(mediaId, _))

    /** Encode PCM16 mono samples as a real RIFF/WAVE payload. */
    def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV payload to (sample_rate, PCM16 samples). */
    def decodePcm16(payload: Array[Byte]): (Int, Array[Int]) = {
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected PCM16 mono, got $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val (lo, hi) =
          if (fmt.isBigEndian) (raw(2 * i + 1) & 0xff, raw(2 * i).toInt)
          else (raw(2 * i) & 0xff, raw(2 * i + 1).toInt)
        out(i) = (hi << 8) | lo
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    }

    /** Integer decimation resample: keep every `factor`-th sample, new
      * rate = rate div factor — exact selection, both engines agree.
      */
    def decimate(samples: Array[Int], factor: Int): Array[Int] =
      Array.tabulate(samples.length / factor)(i => samples(i * factor))

    /** 16-bin amplitude histogram (bin = (s + 32768) div 4096),
      * L2-normalized — same float op order as the image/byte embeds.
      */
    def histEmbed(samples: Array[Int]): Array[Float] = {
      val hgm = new Array[Float](embedDim)
      var i = 0
      while (i < samples.length) { hgm((samples(i) + 32768) / 4096) += 1f; i += 1 }
      val n = math.sqrt(hgm.map(x => x.toDouble * x).sum)
      if (n > 0) hgm.map(x => (x / n).toFloat) else hgm
    }
  }

  /** Byte-level FALLBACK for kinds with no in-JDK codec (now video
    * only — ffmpeg-class libraries are not in this container). A
    * production build binds real decoders here; the fallback is a pure
    * function of the raw bytes, which keeps every downstream pipeline
    * shape (schemas, batching, shuffles) identical to the real thing
    * and fully testable. Image and audio kinds never take this path.
    */
  object ByteFallbackCodec {
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
      * zero-pad). A real impl would resample samples/frames.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, w * h)
  }

  /** Metadata + synthetic fallback payload as PURE column expressions
    * (so metadata consumers stay fully prunable): payload = UTF-8
    * bytes of md5(text) repeated 1 + doc_id % 4 times, kind/meta
    * derived from doc_id. [[mediaTable]] swaps in real PNG payloads
    * for image rows; this base is what payload-agnostic readers scan.
    */
  private def mediaBase(spark: SparkSession, dir: String): DataFrame = {
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
      // fallback payload bytes = 32 * (1 + doc_id % 4); frames are 16 bytes
      (lit(2) * (lit(1) + $"doc_id" % 4)).cast("int").as("n_frames"))
  }

  /** The media table: image rows carry REAL PNG payloads (the
    * [[ImageCodec.pixel]] pattern), audio rows REAL PCM16 WAV payloads
    * (the [[AudioCodec.sample]] pattern), both encoded executor-side;
    * video rows keep the synthetic fallback bytes. This models binary
    * ingest; a real pipeline would read payloads from object storage
    * with `spark.read.format("binaryFile")`.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaBase(spark, dir).as[MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        if (r.kind == "image")
          r.copy(payload = ImageCodec.encodePng(r.width, r.height,
            ImageCodec.renderPattern(r.media_id, r.width, r.height)))
        else if (r.kind == "audio")
          r.copy(payload = AudioCodec.encodeWav(r.sample_rate,
            AudioCodec.renderSamples(r.media_id,
              AudioCodec.nSamples(r.media_id))))
        else r
      }
    }.toDF()
  }

  /** Metadata projection — reads the column-expression base, so the
    * payload is pruned away entirely and no PNG is ever encoded
    * (models a metadata-only columnar read at scale; check ReadSchema
    * in .explain). n_bytes is the DECODED content size: w·h gray bytes
    * for images, stored byte length for the fallback kinds (computed
    * from the length formula, not by materializing bytes).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaBase(spark, dir)
      .select($"media_id", $"kind", $"mime",
        when($"kind" === "image", $"width" * $"height")
          .when($"kind" === "audio", lit(2) * (lit(64) + $"media_id" % 64))
          .otherwise(lit(32) * (lit(1) + $"media_id" % 4))
          .cast("int").as("n_bytes"),
        $"width", $"height")
      .orderBy($"media_id")
  }

  /** Corrupt-payload quarantine — the binary analog of
    * json_corrupt_recovery: a deterministic subset of the PNG payloads
    * (media_id % 7 == 0) is truncated to a 10-byte stub — valid PNG
    * signature, no image data — before decode, the REAL ImageIO path
    * runs per row, and any payload whose decode throws or yields no
    * image routes to status='quarantined' instead of failing the job.
    * That is the robustness gate every at-scale media ingest needs: a
    * 100-TB crawl always contains truncated blobs, and one bad row
    * must cost one row, not the stage. Healthy rows emit their decoded
    * dimensions and exact pixel sum, so the oracle's formula replay
    * also proves the gate never eats good rows.
    */
  def mediaQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .filter(_.kind == "image")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload =
            if (r.media_id % 7 == 0) r.payload.take(10) else r.payload
          try {
            val (w, h, pix) = ImageCodec.decodeGray(payload)
            (r.media_id, "ok", Option(w), Option(h),
              Option(pix.foldLeft(0L)(_ + _)))
          } catch {
            case scala.util.control.NonFatal(_) =>
              (r.media_id, "quarantined", Option.empty[Int],
                Option.empty[Int], Option.empty[Long])
          }
        }
      }
      .toDF("media_id", "status", "width", "height", "pixel_sum")
      // materialize the decoded rows once (eager) before the
      // presentation sort: a global orderBy range-partitions via a
      // SAMPLING pass over its child, which re-ran the full codec
      // decode a second time (measured ~2x on the media/audio ops)
      .localCheckpoint(true)
      .orderBy($"media_id")
  }

  /** Frame sampling: split a video payload into 16-byte frames, keep
    * every `stride`-th. The explode happens executor-side; each output
    * row carries only its frame slice, not the whole payload. Reads
    * the base relation — video payloads are identical there and the
    * image rows' PNG encode is skipped entirely.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import spark.implicits._
    val frames = transform(
      sequence(lit(0), $"n_frames" - 1),
      i => struct(i.as("frame_idx"),
        substring_bytes($"payload", i * 16 + 1, 16).as("frame")))
    mediaBase(spark, dir)
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
  private def substring_bytes(payload: Column, pos: Column, len: Int) =
    call_function("substring", payload, pos, lit(len))

  /** Batched decode: the mapInPandas/mapPartitions shape. Each
    * partition's rows stream through the codec once, so decoder init
    * amortizes per partition — the standard batched-UDF deployment
    * pattern for media decode. Image rows run the REAL ImageIO decode
    * and embed the decoded PIXELS; other kinds take the byte fallback.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, ONNX session…)
      rows.map { r =>
        if (r.kind == "image") {
          val (w, h, pix) = ImageCodec.decodeGray(r.payload)
          MediaFeatures(r.media_id, r.kind, w * h, ImageCodec.histEmbed(pix))
        } else if (r.kind == "audio") {
          val (_, samples) = AudioCodec.decodePcm16(r.payload)
          MediaFeatures(r.media_id, r.kind, samples.length * 2,
            AudioCodec.histEmbed(samples))
        } else
          MediaFeatures(r.media_id, r.kind, r.payload.length,
            ByteFallbackCodec.embed(r.payload))
      }
    }
  }

  /** Resize over the typed path (same batched shape as decode): image
    * rows decode → nearest-neighbor resample → RE-ENCODE as PNG; other
    * kinds take the byte-truncation fallback.
    */
  def resizeAll(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind == "image") {
        val (sw, sh, pix) = ImageCodec.decodeGray(r.payload)
        r.copy(payload = ImageCodec.encodePng(w, h,
          ImageCodec.resizeNearest(pix, sw, sh, w, h)), width = w, height = h)
      } else
        r.copy(payload = ByteFallbackCodec.resize(r.payload, w, h),
          width = w, height = h)
    })
  }

  /** Driver query for the resize path, REAL end to end: PNG-encoded
    * pattern → ImageIO decode → integer nearest-neighbor resample →
    * PNG re-encode → ImageIO decode again → emitted pixels. Two full
    * codec roundtrips; the oracle computes the same 4×4 from the
    * pattern formula alone, so any codec loss or index error
    * hash-mismatches.
    */
  def mediaResize(spark: SparkSession, dir: String, w: Int = 4,
      h: Int = 4): DataFrame = {
    import spark.implicits._
    resizeAll(mediaTable(spark, dir).filter($"kind" === "image")
        .as[MediaRecord], w, h)
      .mapPartitions(_.map { r =>
        val (dw, dh, pix) = ImageCodec.decodeGray(r.payload)
        (r.media_id, dw, dh, pix.mkString(";"))
      })
      .toDF("media_id", "width", "height", "pixels")
      // materialize the decoded rows once (eager) before the
      // presentation sort: a global orderBy range-partitions via a
      // SAMPLING pass over its child, which re-ran the full codec
      // decode a second time (measured ~2x on the media/audio ops)
      .localCheckpoint(true)
      .orderBy($"media_id")
  }

  /** Perceptual-hash (average-hash) image dedup over the REAL codec
    * path — the multimodal member of the dedup family: decode the PNG
    * (ImageIO), downsample to `side`×`side` (the same integer
    * nearest-neighbor as [[mediaResize]]), threshold each pixel
    * against the integer-floor mean, pack the 64 bits into one long.
    * Images whose content matches land on the same hash regardless of
    * their original resolution — the synthetic pattern genuinely
    * collides across ids (same pattern mod 256 and same dims), so
    * duplicate groups exist and the keeper rule is exercised. Scale
    * shape: hashing is per-row executor work on the binary column (no
    * shuffle), the dedup is exactly [[graft.operators.Dedup]]'s
    * hash-groupBy. The oracle reproduces the hash from the pixel
    * formula alone, so any decode or resample defect flips bits and
    * hash-mismatches.
    */
  def mediaPhashDedup(spark: SparkSession, dir: String,
      side: Int = 8): DataFrame = {
    import spark.implicits._
    // hash carried as two 32-bit halves: a packed 64-bit long's sign
    // bit would need 1<<63, which DuckDB's checked shift rejects —
    // two non-negative halves group identically with no overflow on
    // either engine
    val hashed = mediaTable(spark, dir).filter($"kind" === "image")
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, h, pix) = ImageCodec.decodeGray(r.payload)
        val small = ImageCodec.resizeNearest(pix, w, h, side, side)
        val mean = small.map(_.toLong).sum / (side * side)
        var lo = 0L
        var hi = 0L
        var i = 0
        while (i < small.length) {
          if (small(i) > mean) {
            if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
          }
          i += 1
        }
        (r.media_id, lo, hi)
      }).toDF("media_id", "phash_lo", "phash_hi")
        // eager checkpoint: consumed by the groups aggregate AND the
        // re-join below (independent jobs — the lazy-cache race class),
        // and the decode would otherwise also re-run in the final
        // sort's range-sampling pass
        .localCheckpoint(true)
    val groups = hashed.groupBy($"phash_lo", $"phash_hi")
      .agg(min($"media_id").as("keeper"), count(lit(1)).as("n_copies"))
    hashed.join(groups, Seq("phash_lo", "phash_hi"))
      .select($"media_id", $"phash_lo", $"phash_hi",
        ($"media_id" === $"keeper").as("is_keeper"), $"n_copies")
      .orderBy($"media_id")
  }

  /** Driver query for the audio path, REAL end to end: WAV-encoded
    * sample pattern → javax.sound decode → integer decimation (every
    * 2nd sample, rate halved) → WAV re-encode at the new rate → decode
    * again → emitted samples. Two full codec roundtrips, mirroring
    * [[mediaResize]]; the oracle computes the decimated sequence from
    * the sample formula alone.
    */
  def audioResample(spark: SparkSession, dir: String,
      factor: Int = 2): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).filter($"kind" === "audio").as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (rate, samples) = AudioCodec.decodePcm16(r.payload)
        val out = AudioCodec.decimate(samples, factor)
        val reenc = AudioCodec.encodeWav(rate / factor, out)
        val (rate2, dec2) = AudioCodec.decodePcm16(reenc)
        (r.media_id, rate2, dec2.length, dec2.mkString(";"))
      })
      .toDF("media_id", "sample_rate", "n_samples", "samples")
      // materialize the decoded rows once (eager) before the
      // presentation sort: a global orderBy range-partitions via a
      // SAMPLING pass over its child, which re-ran the full codec
      // decode a second time (measured ~2x on the media/audio ops)
      .localCheckpoint(true)
      .orderBy($"media_id")
  }

  /** Analysis window (samples) for [[audioFeatures]]; partial tail
    * windows are dropped (the standard frame-based DSP convention).
    */
  val AudioWindow = 32

  /** Windowed audio features over the REAL WAV decode — the
    * signal-level profiling a speech/audio curation pipeline runs
    * before any model sees the clip: per non-overlapping
    * [[AudioWindow]]-sample frame, the zero-crossing count (voicing /
    * noisiness proxy), peak amplitude (clipping detector), energy as
    * the exact sum of squares, and its floor mean. Every emitted
    * number is an integer — ssq ≤ 32·32768² ≪ 2⁶³ — so the driver
    * hash-check is exact; the oracle reproduces the features from the
    * deterministic sample formula alone, which proves the decode
    * really recovered the encoded samples.
    *
    * Scale shape: one mapPartitions pass per clip (the codec leaf is
    * imperative JVM work, the justified mapPartitions case); output is
    * frames-per-clip rows, never the sample stream.
    */
  def audioFeatures(spark: SparkSession, dir: String,
      window: Int = AudioWindow): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).filter($"kind" === "audio").as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val (_, samples) = AudioCodec.decodePcm16(r.payload)
        val nw = samples.length / window
        (0 until nw).map { w =>
          val frame = samples.slice(w * window, (w + 1) * window)
          var zc = 0L; var peak = 0L; var ssq = 0L
          var i = 0
          while (i < frame.length) {
            val s = frame(i)
            if (i > 0 && ((s >= 0) != (frame(i - 1) >= 0))) zc += 1
            val a = math.abs(s.toLong)
            if (a > peak) peak = a
            ssq += s.toLong * s
            i += 1
          }
          (r.media_id, w.toLong, zc, peak, ssq, ssq / window)
        }
      })
      .toDF("media_id", "w", "zero_crossings", "peak", "ssq", "mean_sq")
      // materialize the decoded rows once (eager) before the
      // presentation sort: a global orderBy range-partitions via a
      // SAMPLING pass over its child, which re-ran the full codec
      // decode a second time (measured ~2x on the media/audio ops)
      .localCheckpoint(true)
      .orderBy($"media_id", $"w")
  }

  /** Binary-file object-store ingest — Spark's built-in `binaryFile`
    * source driven end to end: the PNG payloads are materialized as
    * REAL standalone files (executor-side writes — the landing-zone
    * shape of an image-scrape delivery), read back through
    * `spark.read.format("binaryFile")` with a glob filter, identified
    * from their paths, and ImageIO-decoded to verifiable pixel
    * statistics. The oracle recomputes width/height/pixel-sum from
    * the deterministic pattern formula alone — a match proves the
    * whole file → source → decode chain byte-faithful. (The PNG byte
    * LENGTH is deliberately not emitted: compressed size is a codec
    * artifact no cross-engine oracle can reproduce.)
    *
    * Scale shape: the write and the read are both per-file
    * executor-parallel; `binaryFile` is the production path for "a
    * bucket of millions of images" (each row carries one file's
    * bytes; partition count tracks file count).
    */
  def binaryFileIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = graft.sources.Sources.scratchDir(spark, "binary_ingest")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    mediaTable(spark, dir).filter($"kind" === "image").as[MediaRecord]
      .foreachPartition { (it: Iterator[MediaRecord]) =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, f"media_${r.media_id}%08d.png"),
            r.payload): Unit
        }
      }
    spark.read.format("binaryFile").option("pathGlobFilter", "*.png")
      .load(out)
      .select(regexp_extract($"path", "media_(\\d+)\\.png$", 1)
        .cast("long").as("media_id"), $"content")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, pix) = ImageCodec.decodeGray(bytes)
        (id, w, h, pix.foldLeft(0L)(_ + _))
      })
      .toDF("media_id", "width", "height", "pixel_sum")
      // NO checkpoint here (unlike the other codec queries): the
      // decode reads PNGs this query just wrote — page-cache-hot, so
      // the sort's sampling re-read costs less than materializing the
      // decoded frame (measured: the checkpoint variant was ~0.5 s
      // SLOWER at sf0.1)
      .orderBy($"media_id")
  }

  /** Driver query: media embeddings via the batched decode path over
    * ALL kinds — image rows from REAL decoded pixels, fallback kinds
    * from payload bytes. The typed [[decodeFeatures]] API keeps
    * `ARRAY<FLOAT>`; the driver projection renders the vector as ONE
    * ';'-joined 6-decimal string column because the harness compare
    * cannot hash array cells (same trick as [[frameSample]]'s byte
    * decode). Both engines quantize to float32 before formatting.
    */
  def mediaEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaTable(spark, dir).as[MediaRecord])
      .toDF()
      // eager checkpoint: the sort's range-sampling pass otherwise
      // re-runs the whole decode+embed projection a second time
      .localCheckpoint(true)
      .select($"media_id", $"kind", $"n_bytes",
        concat_ws(";", transform($"embedding",
          x => format_string("%.6f", x))).as("embedding"))
      .orderBy($"media_id")
  }

  /** Scene-cut fixture geometry: [[SceneFrames]] frames per video,
    * scene id = frame div [[SceneLen]], [[FrameBytes]] gray "pixels"
    * per frame from the deterministic formula
    * `(media·31 + scene·17 + j·7) mod 256` — constant within a scene,
    * shifted by 17 (mod 256) across a boundary, so the true cut set is
    * knowable from the formula alone (the binary_file_ingest oracle
    * idiom). A cut fires when the inter-frame L1 distance exceeds
    * [[CutThreshold]] (boundary distance ≥ 16·17 ≫ 64 ≫ 0).
    */
  val SceneFrames = 12
  val SceneLen = 4
  val FrameBytes = 16
  val CutThreshold = 64L

  /** Video scene-cut detection: per-media inter-frame L1 distance via
    * a lag window, thresholded. The DATAFLOW is the production shape —
    * frames arrive as (media_id, frame_idx, feature-vector) rows, the
    * comparison is one window shuffle partitioned by media_id with the
    * per-pair distance a codegen'd `zip_with`/`aggregate` HOF (no UDF),
    * output is cut-sized, not frame-sized. At 100 TB of video the same
    * plan holds: decode ([[ImageCodec]]/[[frameSample]]) emits frame
    * features executor-side, and no media's frames ever gather beyond
    * its own window partition. Frame features here are the synthetic
    * formula above — the container has no video codecs ([[MultimodalPipeline]]
    * note), and the formula makes the oracle independent: DuckDB
    * reconstructs distances per-BYTE (unnest + self-join) rather than
    * via the window+HOF plan, so a hash match checks the algorithm,
    * not a mirrored implementation.
    */
  def videoSceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val vids = graft.Tables.widened(spark, graft.Tables.documents(spark, dir))
      .filter($"doc_id" % 3 === 2)
      .select($"doc_id".as("media_id"))
    val bytesOf = transform(sequence(lit(0), lit(FrameBytes - 1)),
      j => ($"media_id" * 31 + $"scene" * 17 + j * 7) % 256)
    val frames = vids
      .select($"media_id",
        explode(sequence(lit(0), lit(SceneFrames - 1))).as("frame_idx"))
      .withColumn("scene", expr(s"frame_idx div $SceneLen"))
      .select($"media_id", $"frame_idx", bytesOf.as("px"))
    val w = Window.partitionBy($"media_id").orderBy($"frame_idx")
    frames
      .withColumn("prev", lag($"px", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"media_id", $"frame_idx",
        aggregate(zip_with($"px", $"prev", (a, b) => abs(a - b)),
          lit(0L), (acc, x) => acc + x).as("l1_delta"))
      .filter($"l1_delta" > CutThreshold)
      .orderBy($"media_id", $"frame_idx")
  }

  /** [[videoSceneCuts]] oracle: per-byte reconstruction — no lists, no
    * window; distances from the formula via unnest + adjacent-frame
    * self-join.
    */
  def videoSceneCutsSql(): String =
    s"""WITH v AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 2),
       |px AS (
       |  SELECT media_id, f.f AS frame_idx, j.j AS j,
       |    (media_id * 31 + (f.f // $SceneLen) * 17 + j.j * 7) % 256 AS b
       |  FROM v,
       |    unnest(generate_series(0, ${SceneFrames - 1})) AS f(f),
       |    unnest(generate_series(0, ${FrameBytes - 1})) AS j(j)),
       |d AS (
       |  SELECT a.media_id, a.frame_idx,
       |    CAST(SUM(ABS(a.b - p.b)) AS BIGINT) AS l1_delta
       |  FROM px a JOIN px p
       |    ON a.media_id = p.media_id AND a.j = p.j
       |    AND p.frame_idx = a.frame_idx - 1
       |  GROUP BY a.media_id, a.frame_idx)
       |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, l1_delta
       |FROM d WHERE l1_delta > $CutThreshold
       |ORDER BY media_id, frame_idx""".stripMargin
}
