package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction run batch-wise over partitions
  * (bounded batches = the vectorized-decoder shape; input partitioning
  * preserved — no shuffle).
  *
  * IMAGE decode is REAL: [[decodeImage]] uses `javax.imageio.ImageIO`
  * (in-JDK — PNG/JPEG/BMP/GIF readers, no external dependency) and
  * produces exact integer pixel statistics — width/height/band-count,
  * the total gray mass Σ(r+g+b), and a `gridW`×`gridH` block-sum feature
  * grid — all in long arithmetic, so features are bit-reproducible and
  * oracle-checkable on deterministic synthetic images ([[syntheticPng]]:
  * every channel value is modular arithmetic on (id, x, y), which a SQL
  * oracle recomputes without any image library; PNG is lossless, so
  * encode→decode round-trips pixels exactly). Corrupt or non-image bytes
  * take the ROW-ERROR path: a `status` column ("ok" / "error:…"), never
  * a task failure — the same per-row tolerance contract as the log
  * source's unmatched-line routing.
  *
  * AUDIO decode is REAL for PCM containers: [[decodeAudio]] uses
  * `javax.sound.sampled.AudioSystem` (in-JDK — WAV/AIFF/AU readers, no
  * external dependency) and produces exact integer sample statistics —
  * sample rate / channel count / frame count, peak magnitude, Σ|s|,
  * Σs² (the RMS numerator), and a fixed-bucket energy histogram — all
  * in long arithmetic over the raw PCM samples, so features are
  * bit-reproducible and oracle-checkable on deterministic synthetic
  * WAVs ([[syntheticWav]]: every 16-bit sample is modular arithmetic on
  * (id, frame, channel), which a SQL oracle recomputes with no audio
  * library; PCM is lossless, so encode→decode round-trips samples
  * exactly). Corrupt, torn, or COMPRESSED payloads (MP3/AAC/Opus — the
  * JDK ships no compressed-audio codec) take the same ROW-ERROR path as
  * images.
  *
  * VIDEO-shaped frame sampling is REAL for the multi-frame containers
  * the JDK can decode: [[decodeMediaFrames]] counts and samples true
  * frames from animated GIF / multi-page TIFF via `javax.imageio`'s
  * multi-image readers, with exact per-frame integer statistics
  * oracle-checkable on deterministic synthetic GIFs ([[syntheticGif]]:
  * grayscale palette → lossless). True video CODECS (MP4/H.264/VP9)
  * have no in-JDK decoder — for those, [[sampleFrames]]' byte-range
  * "keyframes" remain the clearly-marked STUB, as does the
  * compressed-audio embed stand-in ([[stubAudioDecode]]): deterministic
  * fake features over real, tested Spark-side plumbing. Swapping in a
  * real codec touches only the per-payload decode function — exactly
  * the swap [[decodeImage]] (r14→r15), [[decodeAudio]] (r15→r16), and
  * [[decodeMediaFrames]] (r16) already made for images, PCM audio, and
  * frame containers.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct to each row
    * (here the payload is the UTF-8 text itself — in production it's the
    * image/audio bytes read from object storage).
    */
  def attachBinary(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        length(col("content")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        sha2(col("content"), 256).as("sha256")))

  final case class MediaRow(id: Long, content: Array[Byte])

  /** `ImageIO.read(InputStream)` with the default `useCache=true` wraps
    * the stream in a `FileCacheImageInputStream` — a temp-file create +
    * delete per decoded row inside the `mapPartitions` hot path, pure
    * disk churn (and a failure point if `java.io.tmpdir` is unwritable
    * on executors) for payloads already fully in memory. Decode through
    * an explicit `MemoryCacheImageInputStream` instead; `ImageIO.read`
    * closes the stream either way.
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))

  /** The ONE gray-mass kernel for a packed ARGB pixel: r+g+b, each
    * channel 0..255 — shared by every decode loop so a future change
    * (alpha handling, weighting) cannot silently diverge the paths. */
  @inline private def rgbMass(v: Int): Int =
    ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)

  // ----------------------------------------------------------------
  // REAL image path (javax.imageio)
  // ----------------------------------------------------------------

  /** Exact integer decode result: `graySum` = Σ over pixels of (r+g+b)
    * (each channel 0..255 from the ARGB view, so graySum <= 765·w·h —
    * overflow-free in a long for any real image), `blockSums` = the same
    * mass split over a `gridW`×`gridH` grid with integer block
    * boundaries `x0 = gx·w / gridW` (row-major; Σ blockSums == graySum
    * by construction — the identity the oracled query asserts).
    * The EFFECTIVE grid is clamped to the source dims — an image
    * narrower/shorter than the requested grid yields fewer blocks — so
    * the shape rides along explicitly in `gridW`/`gridH`
    * (`blockSums.length == gridW * gridH` always; consumers must read
    * these fields, not assume the requested grid).
    */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int,
      graySum: Long, gridW: Int, gridH: Int, blockSums: Array[Long])

  /** Decode image bytes with `javax.imageio.ImageIO`. Left(reason) for
    * unrecognized formats (ImageIO returns null — no reader claims the
    * bytes) or corrupt payloads (reader throws mid-decode); never throws.
    */
  def decodeImage(bytes: Array[Byte], gridW: Int = 2, gridH: Int = 2)
      : Either[String, DecodedImage] = {
    require(gridW >= 1 && gridH >= 1, s"grid must be >= 1x1, got ${gridW}x$gridH")
    try {
      val img = readImage(bytes)
      if (img == null) Left("error:unrecognized")
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getRaster.getNumBands
        val gw = math.min(gridW, w)
        val gh = math.min(gridH, h)
        val sums = new Array[Long](gw * gh)
        var graySum = 0L
        var y = 0
        while (y < h) {
          val gy = math.min(y * gh / h, gh - 1)
          var x = 0
          while (x < w) {
            // ARGB, exact for 8-bit sources (PNG lossless)
            val g = rgbMass(img.getRGB(x, y))
            graySum += g
            sums(gy * gw + math.min(x * gw / w, gw - 1)) += g
            x += 1
          }
          y += 1
        }
        Right(DecodedImage(w, h, channels, graySum, gw, gh, sums))
      }
    } catch { case scala.util.control.NonFatal(_) => Left("error:decode") }
  }

  final case class ImageFeatureRow(
      id: Long, status: String, width: Int, height: Int, channels: Int,
      gray_sum: Long, n_pixels: Long,
      grid_w: Int, grid_h: Int, // effective (source-clamped) block grid
      block_sums: Array[Long])  // row-major grid_w x grid_h

  /** Batch image feature extraction over partitions: REAL decode via
    * [[decodeImage]], row-error routing in the `status` column (corrupt
    * bytes yield `status = "error:…"` with zeroed stats, not a task
    * failure). Bounded batches; input partitioning preserved.
    */
  def decodeImageFeatures(
      spark: SparkSession,
      media: DataFrame, // needs (id: long, content: binary)
      gridW: Int = 2,
      gridH: Int = 2,
      batchSize: Int = 64): Dataset[ImageFeatureRow] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // batch boundary = decoder vectorization unit
          batch.map { m =>
            decodeImage(m.content, gridW, gridH) match {
              case Right(d) => ImageFeatureRow(m.id, "ok", d.width, d.height,
                d.channels, d.graySum, d.width.toLong * d.height,
                d.gridW, d.gridH, d.blockSums)
              case Left(err) => ImageFeatureRow(m.id, err, 0, 0, 0, 0L, 0L,
                0, 0, Array.empty[Long])
            }
          }
        }
      }
  }

  /** A resized grayscale thumbnail with its EFFECTIVE dims: the target
    * is clamped to the source (never upsampled — no pixels are invented),
    * so `pixels.length == width * height` always and consumers must read
    * the dims from here, not from the requested target.
    */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Byte])

  /** Real grayscale area-average resize: target pixel (gx,gy) = the
    * integer mean `blockGraySum / (3 · blockPixels)` over the source
    * block with boundaries `x0 = gx·W / w` (exact integer arithmetic —
    * deterministic, no resampling kernel). Left(reason) mirrors
    * [[decodeImage]]'s row-error contract.
    */
  def resizeGray(bytes: Array[Byte], w: Int, h: Int): Either[String, GrayImage] = {
    require(w >= 1 && h >= 1, s"target must be >= 1x1, got ${w}x$h")
    try {
      val img = readImage(bytes)
      if (img == null) Left("error:unrecognized")
      else {
        val sw = img.getWidth
        val sh = img.getHeight
        val tw = math.min(w, sw)
        val th = math.min(h, sh)
        val out = new Array[Byte](tw * th)
        var gy = 0
        while (gy < th) {
          val y0 = gy * sh / th; val y1 = (gy + 1) * sh / th
          var gx = 0
          while (gx < tw) {
            val x0 = gx * sw / tw; val x1 = (gx + 1) * sw / tw
            var s = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                s += rgbMass(img.getRGB(x, y))
                x += 1
              }
              y += 1
            }
            out(gy * tw + gx) = (s / (3L * (x1 - x0) * (y1 - y0))).toByte
            gx += 1
          }
          gy += 1
        }
        Right(GrayImage(tw, th, out))
      }
    } catch { case scala.util.control.NonFatal(_) => Left("error:decode") }
  }

  /** `width`/`height` are the EFFECTIVE thumbnail dims ([[GrayImage]]'s
    * source-clamp contract): `pixels.length == width * height` on ok
    * rows, 0/0/empty on error rows. */
  final case class ResizedMedia(
      id: Long, status: String, width: Int, height: Int, pixels: Array[Byte])

  /** Batch resize over partitions — REAL decode + [[resizeGray]], same
    * row-error routing as [[decodeImageFeatures]].
    */
  def resizeAll(
      spark: SparkSession,
      media: DataFrame,
      w: Int,
      h: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { m =>
          resizeGray(m.content, w, h) match {
            case Right(g)  => ResizedMedia(m.id, "ok", g.width, g.height, g.pixels)
            case Left(err) => ResizedMedia(m.id, err, 0, 0, Array.empty[Byte])
          }
        })
      }
  }

  /** Deterministic synthetic test image: a `w`×`h` RGB PNG whose channel
    * `c` value at (x,y) is `(id·31 + x·7 + y·13 + c·101) mod 256` — pure
    * modular arithmetic a SQL oracle reproduces with no image library.
    * PNG is lossless, so [[decodeImage]] recovers these values exactly.
    */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Int = (((id * 31 + x * 7 + y * 13 + c * 101) % 256) + 256).toInt % 256
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ----------------------------------------------------------------
  // REAL audio path (javax.sound.sampled — PCM containers: WAV/AIFF/AU)
  // ----------------------------------------------------------------

  /** Exact integer decode result for a PCM payload. All statistics are
    * computed in long arithmetic over the raw integer samples (16-bit
    * domain; 8-bit sources are scaled ×256 into it so magnitudes are
    * comparable across depths):
    *  - `peakAbs` = max |s| (≤ 32768 — |Short.MinValue|),
    *  - `sumAbs`  = Σ|s| (the mean-level numerator),
    *  - `sumSq`   = Σs² (the RMS numerator — callers divide ONCE;
    *    overflow-free for any real payload: 2³⁰ per sample leaves room
    *    for 2³³ samples ≈ 74 h of 16-bit stereo at 16 kHz per row),
    *  - `hist(b)` = #samples with `min(|s|·B / 32768, B−1) == b` — a
    *    fixed-bucket energy histogram (Σ hist == nFrames·channels, the
    *    identity the oracled query asserts).
    */
  final case class DecodedAudio(
      sampleRate: Int, channels: Int, nFrames: Long,
      peakAbs: Long, sumAbs: Long, sumSq: Long, hist: Array[Long])

  /** PCM-container-ordered audio providers, resolved ONCE per JVM.
    * `AudioSystem.getAudioInputStream` re-fetches the provider list and
    * probes EVERY reader per call — including the JDK's
    * SoftMidiAudioFileReader, whose MIDI probe is heavyweight and
    * globally serializing: measured 5.7k opens/s with NO scaling across
    * 16 threads, vs 1.36M/s single-thread and 9.4M/s at 16 threads with
    * this cached WAV-first list (~190x — it made the decode
    * mapPartitions hot path effectively serial). Order: the Wave
    * readers first (the dominant container), then AIFF/AU; the MIDI
    * reader is EXCLUDED deliberately — a MIDI payload is a score, not
    * audio, and rendering it through the soft synthesizer would report
    * synthesis statistics as if they were decoded samples; it routes to
    * "error:unrecognized" instead (spec-pinned). Readers are stateless
    * parsers (no instance fields), safe to share across threads.
    */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toList
    val (wave, rest) = all.partition(_.getClass.getSimpleName.startsWith("Wave"))
    wave ++ rest.filterNot(_.getClass.getSimpleName.contains("Midi"))
  }

  /** Open `bytes` through the cached PCM-ordered providers; throws
    * `UnsupportedAudioFileException` when none claims them (the
    * AudioSystem contract, minus the MIDI renderer — scaladoc above).
    * Falls back to `AudioSystem` on an exotic JVM with no SPI readers.
    */
  private def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    if (audioReaders.isEmpty)
      return javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no PCM provider claims the payload")
  }

  /** Decode PCM audio bytes via the JDK's `javax.sound.sampled`
    * providers (cached, PCM-first — [[audioReaders]]). Left(reason) for
    * unrecognized containers (no provider claims the bytes — including
    * every compressed codec, which the JDK does not ship, and MIDI,
    * which is deliberately not rendered), non-PCM encodings inside a
    * recognized container, and torn payloads (header claims more frames
    * than the body holds, or a trailing partial frame); never throws.
    * Supports PCM_SIGNED / PCM_UNSIGNED at 8 or 16 bits, any channel
    * count, either endianness — everything `AudioSystem.write` can
    * produce for the PCM types.
    */
  def decodeAudio(bytes: Array[Byte], histBuckets: Int = 8)
      : Either[String, DecodedAudio] = {
    require(histBuckets >= 1, s"histBuckets must be >= 1, got $histBuckets")
    import javax.sound.sampled.AudioFormat
    try {
      val ais = openAudio(bytes)
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if (!signed && !unsigned) Left(s"error:unsupported-encoding:$enc")
        else if (bits != 8 && bits != 16) Left(s"error:unsupported-depth:$bits")
        else if (fmt.getChannels < 1 || fmt.getChannels > 4096)
          // a corrupt/crafted header's channel field sizes the frame —
          // unguarded, a claimed 32k channels would allocate a 64 MB
          // chunk buffer per row BEFORE any body check, and an OOM is
          // not NonFatal: it would escape the catch and fail the task
          // instead of routing to a row error (review finding, spec'd)
          Left(s"error:unsupported-channels:${fmt.getChannels}")
        else {
          val channels = fmt.getChannels
          val bytesPerSample = bits / 8
          val frameSize = channels * bytesPerSample
          val big = fmt.isBigEndian
          // stream the body in bounded chunks (never one giant copy —
          // ~64 KiB rounded to whole frames; frameSize <= 8 KiB by the
          // channel guard, so the chunk never exceeds 64 KiB);
          // a trailing partial frame = torn payload = row error
          val buf = new Array[Byte](math.max(65536 / frameSize, 1) * frameSize)
          var carry = 0 // bytes of an incomplete frame held at buf start
          var nFrames = 0L
          var peak = 0L; var sumAbs = 0L; var sumSq = 0L
          val hist = new Array[Long](histBuckets)
          var n = ais.read(buf, carry, buf.length - carry)
          while (n >= 0) {
            val avail = carry + n
            val complete = avail / frameSize * frameSize
            var i = 0
            while (i < complete) {
              // one frame: `channels` samples, each decoded to the
              // signed 16-bit domain
              var c = 0
              while (c < channels) {
                val off = i + c * bytesPerSample
                val s: Int =
                  if (bits == 16) {
                    val lo = if (big) buf(off + 1) else buf(off)
                    val hi = if (big) buf(off) else buf(off + 1)
                    val v = ((hi & 0xff) << 8) | (lo & 0xff)
                    val sv = v.toShort.toInt
                    if (signed) sv else (v - 32768) // unsigned 16: offset binary
                  } else {
                    val raw = if (signed) buf(off).toInt else (buf(off) & 0xff) - 128
                    raw * 256 // scale 8-bit into the 16-bit domain
                  }
                val a = math.abs(s.toLong)
                if (a > peak) peak = a
                sumAbs += a
                sumSq += s.toLong * s
                hist(math.min((a * histBuckets / 32768L).toInt, histBuckets - 1)) += 1L
                c += 1
              }
              nFrames += 1
              i += frameSize
            }
            // slide the partial tail frame to the front
            val rest = avail - complete
            System.arraycopy(buf, complete, buf, 0, rest)
            carry = rest
            n = ais.read(buf, carry, buf.length - carry)
          }
          // torn-payload detection: AudioInputStream only ever returns
          // WHOLE frames (the spec rounds short reads down to frame
          // boundaries), so a body truncated mid-frame does NOT surface
          // as a trailing partial here — it surfaces as FEWER frames
          // than the container header declared. Compare against the
          // declared frame length when the header carries one
          // (NOT_SPECIFIED = streaming container: length unknowable,
          // accept what decoded). carry != 0 stays as defense against a
          // provider that violates the whole-frame contract.
          val declared = ais.getFrameLength
          if (carry != 0) Left("error:decode") // torn mid-frame
          else if (declared != javax.sound.sampled.AudioSystem.NOT_SPECIFIED &&
              declared >= 0 && nFrames != declared)
            Left("error:decode") // header claims more frames than the body holds
          else Right(DecodedAudio(fmt.getSampleRate.round, channels, nFrames,
            peak, sumAbs, sumSq, hist))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException =>
        Left("error:unrecognized") // no provider claims the container
      case scala.util.control.NonFatal(_) => Left("error:decode")
    }
  }

  /** `energy_hist.sum == n_samples` on ok rows (the [[DecodedAudio]]
    * partition identity); 0/0/empty stats on error rows. */
  final case class AudioFeatureRow(
      id: Long, status: String, sample_rate: Int, channels: Int,
      n_frames: Long, n_samples: Long, peak_abs: Long, sum_abs: Long,
      sum_sq: Long, energy_hist: Array[Long])

  /** Batch PCM audio feature extraction over partitions: REAL decode via
    * [[decodeAudio]], row-error routing in the `status` column (torn /
    * compressed / non-audio bytes yield `status = "error:…"` with zeroed
    * stats, not a task failure). Bounded batches; input partitioning
    * preserved — no shuffle, the same plan shape as
    * [[decodeImageFeatures]].
    */
  def decodeAudioFeatures(
      spark: SparkSession,
      media: DataFrame, // needs (id: long, content: binary)
      histBuckets: Int = 8,
      batchSize: Int = 64): Dataset[AudioFeatureRow] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // batch boundary = decoder vectorization unit
          batch.map { m =>
            decodeAudio(m.content, histBuckets) match {
              case Right(d) => AudioFeatureRow(m.id, "ok", d.sampleRate,
                d.channels, d.nFrames, d.nFrames * d.channels,
                d.peakAbs, d.sumAbs, d.sumSq, d.hist)
              case Left(err) => AudioFeatureRow(m.id, err, 0, 0, 0L, 0L,
                0L, 0L, 0L, Array.empty[Long])
            }
          }
        }
      }
  }

  /** Deterministic synthetic test audio: an `nFrames`-frame 16-bit
    * PCM_SIGNED WAV at `sampleRate` Hz with `channels` channels whose
    * sample at (frame t, channel c) is
    * `(id·31 + t·7919 + c·13) mod 65536 − 32768` — pure modular arithmetic
    * a SQL oracle reproduces with no audio library, spanning the full
    * 16-bit range so every energy-histogram bucket is exercised. PCM is
    * lossless, so [[decodeAudio]] recovers these samples exactly.
    */
  def syntheticWav(
      id: Long, nFrames: Int, sampleRate: Int = 8000, channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val data = new Array[Byte](nFrames * channels * 2)
    var t = 0; var i = 0
    while (t < nFrames) {
      var c = 0
      while (c < channels) {
        val s = ((id * 31 + t * 7919 + c * 13) % 65536 - 32768).toInt
        data(i) = (s & 0xff).toByte          // WAVE PCM is little-endian
        data(i + 1) = ((s >> 8) & 0xff).toByte
        i += 2; c += 1
      }
      t += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ----------------------------------------------------------------
  // Shared oracle-fixture shapes: the ONE definition of the payload
  // corpora that q_multimodal_features / q_audio_features /
  // q_video_frames oracle AND the ScaleCurve media families measure —
  // dims/torn-rule drift between the query and the bench would
  // silently measure a different payload than the oracle checks, while
  // the docs still claimed identity. (The oracle SQL mirrors these
  // constants textually — that mirror is what CORRECTNESS gates.)
  // ----------------------------------------------------------------

  /** q_multimodal_features payload: (8+id%8)x(6+id%6) RGB PNG, every
    * 10th torn mid-header. */
  private[graft] def pngFixture(id: Long): MediaRow = {
    val png = syntheticPng(id, (8 + id % 8).toInt, (6 + id % 6).toInt)
    MediaRow(id, if (id % 10 == 0) png.take(20) else png)
  }

  /** q_audio_features payload: (50+id%50)-frame 16-bit 8 kHz WAV with
    * 1+id%2 channels, every 10th torn mid-header. */
  private[graft] def wavFixture(id: Long): MediaRow = {
    val wav = syntheticWav(id, (50 + id % 50).toInt, 8000, (1 + id % 2).toInt)
    MediaRow(id, if (id % 10 == 0) wav.take(20) else wav)
  }

  /** q_video_frames payload: (5+id%5)x(4+id%4) animated GIF with
    * 3+id%6 frames, every 10th torn. */
  private[graft] def gifFixture(id: Long): MediaRow = {
    val gif = syntheticGif(id, (5 + id % 5).toInt, (4 + id % 4).toInt, (3 + id % 6).toInt)
    MediaRow(id, if (id % 10 == 0) gif.take(20) else gif)
  }

  // ----------------------------------------------------------------
  // Compressed audio / video: documented STUBS (no compressed-media
  // codec in the JDK — PCM has the REAL path above)
  // ----------------------------------------------------------------

  final case class MediaFeatures(id: Long, n_bytes: Int, loudness: Double, feature: Array[Float])

  /** STUB COMPRESSED-audio decode: deterministic fake "feature
    * extraction" from raw bytes — stands in for compressed-codec decode
    * + embed ONLY (the JDK has no MP3/AAC/Opus codec; `javax.sound`
    * covers the PCM containers, which have the REAL path —
    * [[decodeAudio]]). Same signature and batch shape a real decoder
    * would have.
    */
  def stubAudioDecode(bytes: Array[Byte], dim: Int): (Double, Array[Float]) = {
    var h = 1125899906842597L // deterministic LCG from content
    var i = 0
    var sum = 0L
    while (i < bytes.length) { h = 31 * h + bytes(i); sum += bytes(i) & 0xff; i += 1 }
    val loudness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length / 255.0
    val feat = new Array[Float](dim)
    i = 0
    var s = h
    while (i < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      feat(i) = ((s >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
      i += 1
    }
    (loudness, feat)
  }

  // ----------------------------------------------------------------
  // REAL multi-frame media path (javax.imageio multi-image readers —
  // animated GIF, multi-page TIFF: true frame containers, in-JDK)
  // ----------------------------------------------------------------

  /** One sampled frame: its index in the container and its exact gray
    * mass Σ(r+g+b) over the STORED raster. */
  final case class FrameStat(frameIdx: Int, graySum: Long)

  /** `sampled.length == min(nSample, nFrames)`; frames are sampled
    * evenly at `idx = f·nFrames / k` (the same integer arithmetic as
    * the byte-range stub, now over REAL frames). `width`/`height` are
    * frame 0's raster dims. */
  final case class DecodedFrames(
      width: Int, height: Int, nFrames: Int, sampled: Array[FrameStat])

  /** REAL frame sampling from a multi-frame media container via
    * `javax.imageio`'s multi-image readers (in-JDK: animated GIF,
    * multi-page TIFF) — the video-shaped decode: count the container's
    * frames (`getNumImages(forceRead)` walks the whole stream; GIF
    * torn TAILS are detected via the mandatory 0x3B trailer byte,
    * because the reader otherwise silently drops a torn trailing
    * frame — this structural check is GIF-SPECIFIC: multi-page TIFF
    * has no trailer convention, and a mid-body tear can pass SILENTLY
    * SHORT — the reader stops the IFD walk at the tear and reports
    * only the readable prefix's pages as the whole container (probed
    * on JDK 17 and spec-pinned: a 3-page TIFF cut in half decodes as
    * a valid 1-page container), so byte-integrity-critical pipelines
    * pair this with a payload checksum column), pick `nSample` evenly
    * spaced indexes, decode each picked frame and reduce it to exact
    * integer statistics. Statistics are over each frame's STORED
    * raster (GIF disposal/compositing is deliberately not applied —
    * deterministic, and the synthetic fixtures store full frames).
    * True video CODECS (MP4/H.264/VP9) have no in-JDK decoder — those
    * payloads take `error:unrecognized`, and [[sampleFrames]]' byte-
    * range plumbing remains the documented stub for them.
    * Left(reason) mirrors [[decodeImage]]'s row-error contract.
    */
  def decodeMediaFrames(bytes: Array[Byte], nSample: Int = 4)
      : Either[String, DecodedFrames] = {
    require(nSample >= 1, s"nSample must be >= 1, got $nSample")
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Left("error:unrecognized")
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // GIF is a stream with NO declared frame count: the reader
          // silently DROPS a torn trailing frame (getNumImages just
          // reports fewer), so truncation is detected structurally — a
          // conforming GIF's final byte is the 0x3B trailer; its
          // absence IS the torn-tail signal (strict: trailing garbage
          // after the trailer also rejects — loud beats silently short)
          if (reader.getFormatName.equalsIgnoreCase("gif") &&
              bytes(bytes.length - 1) != 0x3b) // nonempty: a reader claimed it
            return Left("error:decode")
          val n = reader.getNumImages(true) // full walk: torn frame 0/header throws here
          if (n <= 0) Left("error:decode")
          else {
            val k = math.min(nSample, n)
            val sampled = new Array[FrameStat](k)
            var w = 0; var h = 0
            var f = 0
            while (f < k) {
              val idx = f * n / k
              val img = reader.read(idx)
              if (f == 0) { w = img.getWidth; h = img.getHeight }
              var s = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  s += rgbMass(img.getRGB(x, y))
                  x += 1
                }
                y += 1
              }
              sampled(f) = FrameStat(idx, s)
              f += 1
            }
            Right(DecodedFrames(w, h, n, sampled))
          }
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => Left("error:decode") }
  }

  /** `frame_idx.length == frame_gray.length == n_sampled ==
    * min(requested, n_frames)` on ok rows; 0/0/empty on error rows. */
  final case class MediaFrameRow(
      id: Long, status: String, width: Int, height: Int,
      n_frames: Int, n_sampled: Int,
      frame_idx: Array[Int], frame_gray: Array[Long])

  /** Batch frame-sample feature extraction over partitions: REAL
    * container decode via [[decodeMediaFrames]], the same row-error
    * routing / bounded-batch / no-shuffle shape as
    * [[decodeImageFeatures]] and [[decodeAudioFeatures]].
    */
  def decodeMediaFrameFeatures(
      spark: SparkSession,
      media: DataFrame, // needs (id: long, content: binary)
      nSample: Int = 4,
      batchSize: Int = 64): Dataset[MediaFrameRow] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { m =>
            decodeMediaFrames(m.content, nSample) match {
              case Right(d) => MediaFrameRow(m.id, "ok", d.width, d.height,
                d.nFrames, d.sampled.length,
                d.sampled.map(_.frameIdx), d.sampled.map(_.graySum))
              case Left(err) => MediaFrameRow(m.id, err, 0, 0, 0, 0,
                Array.empty[Int], Array.empty[Long])
            }
          }
        }
      }
  }

  /** Deterministic synthetic animated GIF: `nFrames` full `w`×`h`
    * grayscale frames whose pixel value at (frame f, x, y) is
    * `(id·31 + f·17 + x·7 + y·13) mod 256`, replicated across r=g=b —
    * ≤256 distinct colors per frame, so the GIF palette encodes them
    * LOSSLESSLY (probed: read-back is bit-exact) and a SQL oracle
    * reproduces every frame's gray mass as `3·v` sums with no image
    * library.
    */
  def syntheticGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      // interlacing OFF: the JDK GIF writer's default progressive mode
      // permutes rows on very short images (probed at h=4: read-back
      // rows came back in interlace storage order) — non-interlaced
      // storage round-trips bit-exactly at every size
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (((id * 31 + f * 17 + x * 7 + y * 13) % 256) + 256).toInt % 256
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  final case class Frame(id: Long, frameIdx: Int, offset: Long, length: Int, sha8: String)

  /** Frame sampling plumbing (compressed-video STUB domain — GIF/TIFF
    * containers have the REAL path, [[decodeMediaFrames]]): pick
    * `nFrames` evenly spaced byte-range "frames" from an opaque
    * payload. The ranges and digests are real; a production codec
    * replaces the range arithmetic with keyframe offsets.
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame, // (id: long, content: binary)
      nFrames: Int,
      batchSize: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { m =>
            val n = math.max(1, math.min(nFrames, m.content.length))
            val step = math.max(1, m.content.length / n)
            (0 until n).map { f =>
              val off = (f * step).toLong
              val len = math.min(step, m.content.length - off).toInt
              val md = java.security.MessageDigest.getInstance("SHA-256")
              md.update(m.content, off.toInt, math.max(len, 0))
              val sha8 = md.digest().take(4).map("%02x".format(_)).mkString
              Frame(m.id, f, off, len, sha8)
            }
          }
        }
      }
  }

  /** Batch audio feature extraction over partitions (STUB decode, real
    * plumbing — bounded batches, typed output, no shuffle).
    */
  def extractAudioFeatures(
      spark: SparkSession,
      media: DataFrame, // needs (id: long, content: binary)
      dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("content")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // batch boundary = where a real decoder vectorizes
          batch.map { m =>
            val (loudness, feat) = stubAudioDecode(m.content, dim)
            MediaFeatures(m.id, m.content.length, loudness, feat)
          }
        }
      }
  }
}
