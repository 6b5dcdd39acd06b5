package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode/feature-extract runs
  * per-partition over batches.
  *
  * The decode is REAL for every format the JDK actually ships a codec
  * for — PNG, GIF, and BMP through `javax.imageio` (width, height,
  * channels, full-raster pixel sum read from the decoded raster) and
  * WAV through `javax.sound.sampled` — and falls back to `fakeDecode`,
  * a deterministic stub, only for formats with no offline codec (JPEG
  * would decode too, but lossy codecs can't be pixel-sum-oracled, so
  * nothing plants them). Detection is by payload magic bytes, not the
  * format label — a real pipeline can't trust upstream labels either. Everything around the decode —
  * the schema contract, the mapPartitions batch shape, partition
  * sizing — is the real 100 TB plumbing: media blobs make rows wide, so
  * `spark.sql.files.maxPartitionBytes` (not row count) governs partition
  * memory, and the decoder is applied per-partition so codec init
  * amortizes across a batch exactly like a Pandas UDF batch.
  */
object Multimodal {

  /** Typed media-row contract: opaque payload + extracted metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("format", StringType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    // sum of all RGB component values across the raster — only a REAL
    // decode can produce it, so it is null on the stub path
    StructField("px_sum", LongType)))

  /** STUB decoder: deterministic fake dimensions from the payload bytes.
    * A real implementation would replace the body with an actual codec
    * call; the signature and batch shape stay identical.
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    payload.foreach(b => h = h * 31 + (b & 0xff))
    val w = 64 + ((h % 512).toInt + 512) % 512
    val ht = 64 + (((h >> 9) % 512).toInt + 512) % 512
    (w, ht, 3)
  }

  // Every magic check is NULL-SAFE: the media schema's payload column is
  // nullable, and a single NULL blob reaching payload.length would NPE
  // the task deterministically on every retry — the job-killing failure
  // the drop/stub paths exist to prevent. NULL simply isn't the format.

  /** PNG magic (the 8-byte signature's first four bytes suffice here). */
  def isPng(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 && payload(0) == 0x89.toByte &&
      payload(1) == 'P'.toByte && payload(2) == 'N'.toByte &&
      payload(3) == 'G'.toByte

  /** GIF87a/GIF89a magic. */
  def isGif(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 6 && payload(0) == 'G'.toByte &&
      payload(1) == 'I'.toByte && payload(2) == 'F'.toByte &&
      payload(3) == '8'.toByte

  /** BMP magic ("BM" + the 4-byte file size matching reality — the
    * two-byte prefix alone would false-positive on text).
    */
  def isBmp(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 6 && payload(0) == 'B'.toByte &&
      payload(1) == 'M'.toByte && {
        val sz = (payload(2) & 0xff) | ((payload(3) & 0xff) << 8) |
          ((payload(4) & 0xff) << 16) | ((payload(5) & 0xff) << 24)
        sz == payload.length
      }

  /** Every format the JDK's ImageIO genuinely decodes here. */
  def isDecodableImage(payload: Array[Byte]): Boolean =
    isPng(payload) || isGif(payload) || isBmp(payload)

  /** [[syntheticPng]]'s shape for any ImageIO-writable format name
    * ("png", "gif", "bmp"): constant-value RGB raster, exact component
    * sum `w * h * 3 * v` after a real encode→decode round trip
    * (constant color survives GIF's palette quantization exactly —
    * a one-color image IS its own palette).
    */
  def syntheticImage(fmt: String, w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Synthesize a tiny constant-value RGB PNG through the JDK encoder —
    * the planted real-codec artifact: every pixel is (v, v, v), so the
    * decoded raster's component sum is exactly `w * h * 3 * v` and an
    * arithmetic oracle can check a REAL ImageIO round-trip.
    */
  def syntheticPng(w: Int, h: Int, v: Int): Array[Byte] =
    syntheticImage("png", w, h, v)

  /** WAV/RIFF magic. */
  def isWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 && payload(0) == 'R'.toByte &&
      payload(1) == 'I'.toByte && payload(2) == 'F'.toByte &&
      payload(3) == 'F'.toByte && payload(8) == 'W'.toByte &&
      payload(9) == 'A'.toByte && payload(10) == 'V'.toByte &&
      payload(11) == 'E'.toByte

  /** Synthesize a 16-bit PCM WAV whose every sample is the constant
    * `amp` — the audio twin of [[syntheticPng]]: the decoded stream's
    * sample sum is exactly `nFrames * channels * amp` (sign included),
    * so an arithmetic oracle can check a REAL `javax.sound` parse +
    * PCM decode.
    */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int, amp: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(channels.toShort) // PCM
    bb.putInt(sampleRate).putInt(sampleRate * blockAlign)
    bb.putShort(blockAlign.toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames * channels) { bb.putShort(amp.toShort); i += 1 }
    bb.array()
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("sample_sum", LongType)))

  /** REAL audio decode: `javax.sound.sampled` parses the RIFF header
    * (sample rate, channels, frame count) and the PCM payload streams
    * through a signed-16-bit little-endian sample sum — the same
    * per-partition seam as [[decodeFeatures]]. Non-WAV payloads are
    * dropped (a real pipeline routes them to the dead-letter side).
    */
  def audioFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioSchema)
    media.select("media_id", "payload", "format").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        if (!isWav(payload)) None
        else try {
          // WAV-magic payloads with a corrupt fmt/data chunk make the
          // parser throw (UnsupportedAudioFileException/IOException) —
          // they take the same drop path as non-WAV payloads instead of
          // deterministically failing the task on every retry
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val f = ais.getFormat
          // the sample loop below assumes signed 16-bit LITTLE-ENDIAN
          // PCM — other legal WAVs (8-bit, 32-bit float, big-endian)
          // parse fine through AudioSystem and would stream GARBAGE
          // through the hardcoded 2-byte fuse, emitting a silently
          // wrong sample_sum; they take the drop path instead (a real
          // pipeline transcodes or dead-letters them)
          val decodable =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16 && !f.isBigEndian
          if (!decodable) { ais.close(); None }
          else {
            val nFrames = ais.getFrameLength
            val bytes = ais.readAllBytes()
            var s = 0L
            var i = 0
            while (i + 1 < bytes.length) {
              // signed 16-bit little-endian PCM
              s += ((bytes(i + 1).toInt << 8) | (bytes(i) & 0xff)).toShort
              i += 2
            }
            ais.close()
            Some(Row(r.getLong(0), r.getString(2),
              f.getSampleRate.toInt, f.getChannels, nFrames, s))
          }
        } catch { case _: Exception => None }
      }
    }(enc)
  }

  /** Per-partition decode: the mapPartitions form a real codec needs
    * (per-batch init amortization, no per-row closure dispatch). PNG
    * payloads go through the REAL JDK decoder; everything else takes the
    * deterministic stub with a null pixel sum.
    */
  /** Decode-or-None: ImageIO.read returns NULL (no exception) when no
    * registered reader can decode a stream whose magic bytes passed, and
    * THROWS on mid-stream corruption — either way one bad blob in a
    * 100 TB corpus must degrade to the stub/drop path, not fail the task
    * (and, deterministically, the whole job).
    */
  private def tryDecodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload", "format").mapPartitions { rows =>
      // per-partition codec init: no temp-file cache for in-memory blobs
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val fmt = r.getString(2)
        // NULL payloads drop like every other codec seam here — the
        // stub path needs bytes too (fakeDecode hashes them)
        if (payload == null) None
        else Some {
        val decoded =
          if (isDecodableImage(payload)) tryDecodeImage(payload) else None
        if (decoded.isDefined) {
          val img = decoded.get
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Row(id, fmt, payload.length.toLong, w, h,
            img.getColorModel.getNumComponents, s)
        } else {
          val (w, h, c) = fakeDecode(payload)
          Row(id, fmt, payload.length.toLong, w, h, c, null)
        }
        }
      }
    }(enc)
  }

  /** Expression-only metadata (codegen path, used by the oracle-checked
    * query): byte length + content hash — the part of media handling that
    * needs no codec.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("format"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_hash"))

  /** [[syntheticPng]]'s gradient sibling: pixel (x, y) is the grey
    * value `(seed + 7x + 13y) % 256` — position-DEPENDENT, so a resize
    * that samples the wrong source pixel produces the wrong sum (a
    * constant image would hide the bug). PNG is lossless, so the raster
    * round-trips exactly.
    */
  def syntheticGradientPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((seed + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val thumbSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("src_w", LongType),
    StructField("src_h", LongType),
    StructField("thumb_w", LongType),
    StructField("thumb_h", LongType),
    StructField("thumb_px_sum", LongType)))

  /** REAL thumbnailing for PNG payloads: decode through the JDK codec,
    * nearest-neighbor downsample on the raster (integer source mapping
    * `x_src = x' * W DIV tw` — no float resampling, so the result is
    * bit-deterministic and oracle-computable), RE-ENCODE the thumbnail
    * as PNG, then RE-DECODE the produced artifact and sum its
    * components. The emitted sum comes from the re-decoded bytes, so a
    * corrupt encoder output cannot pass the oracle. Non-PNG payloads
    * drop (a real pipeline dead-letters them). Same per-partition codec
    * seam as [[decodeFeatures]].
    */
  def thumbnailFeatures(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(thumbSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        // corrupt PNG-magic payloads drop (tryDecodeImage), same as
        // non-PNG — never a task-killing NPE/IIOException
        if (!isPng(payload)) None
        else tryDecodeImage(payload).map { src =>
          val (w, h) = (src.getWidth, src.getHeight)
          val thumb = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              thumb.setRGB(x, y, src.getRGB(x * w / tw, y * h / th))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(thumb, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          var s = 0L
          var yy = 0
          while (yy < back.getHeight) {
            var xx = 0
            while (xx < back.getWidth) {
              val rgb = back.getRGB(xx, yy)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              xx += 1
            }
            yy += 1
          }
          Row(r.getLong(0), w.toLong, h.toLong,
            back.getWidth.toLong, back.getHeight.toLong, s)
        }
      }
    }(enc)
  }

  /** STUB resize: emits target-dimension metadata plus a deterministic
    * proportional byte sample of the payload (a real image library slots
    * into the same mapPartitions shape — per-partition codec init, one
    * output row per input). Downstream schema is the real contract:
    * (media_id, format, width, height, payload).
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload", "format").mapPartitions { rows =>
      // real resize would init the codec here, once per partition
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) None else Some {
        val (w, h, _) = fakeDecode(payload)
        // proportional sample: every ceil(w*h / (targetW*targetH))-th byte
        val ratio = math.max(1, (w.toLong * h / (targetW.toLong * targetH)).toInt)
        val resized = payload.indices.collect {
          case i if i % ratio == 0 => payload(i)
        }.toArray
        Row(r.getLong(0), r.getString(2), targetW, targetH, resized)
        }
      }
    }(enc)
  }

  /** Frame sampling over an opaque video-ish payload: fixed-size byte
    * windows every `stride` bytes stand in for decoded frames (a real
    * container parser slots into the same shape: one output row per
    * sampled frame, keyed (media_id, frame_no), payload slice as the
    * frame). Pure expressions — the explode fans out AFTER the scan, so
    * frame extraction is distributed and never materializes whole videos
    * per task beyond the source row.
    */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    // guarded: sequence(0, n-1) DESCENDS for n = 0, and short payloads
    // yield no frames at all (null -> posexplode_outer -> filtered)
    val nFrames = when(length(col("payload")) >= frameSize,
      (length(col("payload")) - frameSize) / stride + 1).otherwise(0)
    val idx = when(nFrames >= 1, sequence(lit(0), (nFrames - 1).cast("int")))
    media
      .select(col("media_id"), col("payload"), posexplode_outer(idx))
      .select(col("media_id"),
        col("pos").cast("long").as("frame_no"),
        col("payload").substr(col("col") * stride + 1, lit(frameSize)).as("frame"))
      .filter(col("frame").isNotNull)
  }
}
