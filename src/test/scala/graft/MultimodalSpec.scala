package graft

import graft.ops.Multimodal

/** Exactness + row-error contract of the REAL image path
  * ([[Multimodal.decodeImage]] / [[Multimodal.resizeGray]] — javax.imageio):
  * features computed from decoded pixels must equal an independent
  * in-test evaluation of the synthetic-image pixel formula, bit-exactly
  * (PNG is lossless), and corrupt payloads must route to status rows,
  * never task failures.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Independent pixel-formula evaluation (the same modular arithmetic
    * the DuckDB oracle uses — not the production decode path). */
  private def ch(id: Long, x: Int, y: Int, c: Int): Int =
    (((id * 31 + x * 7 + y * 13 + c * 101) % 256) + 256).toInt % 256
  private def gray(id: Long, x: Int, y: Int): Long =
    (0 until 3).map(c => ch(id, x, y, c).toLong).sum

  test("decodeImage recovers synthetic PNG pixels exactly (dims, bands, gray mass, block grid)") {
    for (id <- Seq(0L, 7L, 123L, 9999L); (w, h) <- Seq((5, 4), (8, 6), (15, 11), (1, 1))) {
      val d = Multimodal.decodeImage(Multimodal.syntheticPng(id, w, h), 2, 2)
        .fold(e => fail(s"decode failed: $e"), identity)
      assert(d.width == w && d.height == h && d.channels == 3)
      val expectedGray =
        (for (y <- 0 until h; x <- 0 until w) yield gray(id, x, y)).sum
      assert(d.graySum == expectedGray, s"id=$id ${w}x$h")
      // block sums: brute-force the same integer grid boundaries
      val gw = math.min(2, w); val gh = math.min(2, h)
      val expBlocks = Array.fill(gw * gh)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val gy = math.min(y * gh / h, gh - 1)
        val gx = math.min(x * gw / w, gw - 1)
        expBlocks(gy * gw + gx) += gray(id, x, y)
      }
      assert(d.blockSums.toSeq == expBlocks.toSeq, s"id=$id ${w}x$h")
      assert(d.blockSums.sum == d.graySum) // the oracled partition identity
    }
  }

  test("resizeGray is the exact integer area-average of decoded pixels") {
    val id = 42L; val sw = 10; val sh = 7
    val g = Multimodal.resizeGray(Multimodal.syntheticPng(id, sw, sh), 4, 3)
      .fold(e => fail(s"resize failed: $e"), identity)
    assert(g.width == 4 && g.height == 3 && g.pixels.length == 12)
    for (gy <- 0 until 3; gx <- 0 until 4) {
      val x0 = gx * sw / 4; val x1 = (gx + 1) * sw / 4
      val y0 = gy * sh / 3; val y1 = (gy + 1) * sh / 3
      val s = (for (y <- y0 until y1; x <- x0 until x1) yield gray(id, x, y)).sum
      val expected = (s / (3L * (x1 - x0) * (y1 - y0))).toByte
      assert(g.pixels(gy * 4 + gx) == expected, s"block ($gx,$gy)")
    }
    // upscale request clamps to source dims (never interpolates pixels
    // that don't exist) — and REPORTS the effective dims
    val clamped = Multimodal.resizeGray(Multimodal.syntheticPng(id, 3, 2), 8, 8)
      .fold(e => fail(e), identity)
    assert(clamped.width == 3 && clamped.height == 2 && clamped.pixels.length == 6)
    // resizeAll carries the clamped dims through to the row (never lies
    // about the buffer shape)
    val small = spark.range(3).select($"id").as[Long]
      .map(i => Multimodal.MediaRow(i, Multimodal.syntheticPng(i, 3, 2))).toDF()
    val rows = Multimodal.resizeAll(spark, small, 8, 8).collect()
    assert(rows.forall(r => r.width == 3 && r.height == 2 &&
      r.pixels.length == r.width * r.height))
  }

  test("corrupt payloads take the row-error path, never a task failure") {
    // torn PNG: magic intact, body truncated -> reader claims it, then throws
    val torn = Multimodal.syntheticPng(1L, 8, 8).take(20)
    assert(Multimodal.decodeImage(torn) == Left("error:decode"))
    // non-image bytes: no reader claims them
    assert(Multimodal.decodeImage("plain prose, not an image".getBytes("UTF-8"))
      == Left("error:unrecognized"))
    assert(Multimodal.decodeImage(Array.empty[Byte]) == Left("error:unrecognized"))
    assert(Multimodal.resizeGray(torn, 4, 4) == Left("error:decode"))
  }

  test("decodeImageFeatures: mixed ok/corrupt batch routes per-row, no shuffle, deterministic") {
    val media = spark.range(40).select($"id").as[Long]
      .map { id =>
        val png = Multimodal.syntheticPng(id, (4 + id % 5).toInt, (3 + id % 4).toInt)
        if (id % 10 == 0) Multimodal.MediaRow(id, png.take(20))
        else Multimodal.MediaRow(id, png)
      }.toDF()
    val feats = Multimodal.decodeImageFeatures(spark, media, 2, 2, batchSize = 7)
    val rows = feats.collect()
    assert(rows.length == 40)
    val (ok, err) = rows.partition(_.status == "ok")
    assert(ok.length == 36 && err.length == 4)
    assert(err.forall(r => r.status == "error:decode" && r.gray_sum == 0L &&
      r.block_sums.isEmpty && r.width == 0 && r.grid_w == 0))
    ok.foreach { r =>
      assert(r.width == (4 + r.id % 5) && r.height == (3 + r.id % 4) && r.channels == 3)
      assert(r.block_sums.sum == r.gray_sum && r.n_pixels == r.width.toLong * r.height)
      assert(r.grid_w == 2 && r.grid_h == 2 &&
        r.block_sums.length == r.grid_w * r.grid_h)
    }
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val again = Multimodal.decodeImageFeatures(spark, media, 2, 2, batchSize = 7).collect()
    assert(rows.map(r => (r.id, r.status, r.gray_sum, r.block_sums.toSeq)).toSet ==
      again.map(r => (r.id, r.status, r.gray_sum, r.block_sums.toSeq)).toSet)
  }

  /** Independent sample-formula evaluation (the same modular arithmetic
    * the DuckDB oracle uses — not the production decode path). */
  private def sample(id: Long, t: Int, c: Int): Long =
    (id * 31 + t * 7919 + c * 13) % 65536 - 32768

  test("decodeAudio recovers synthetic WAV samples exactly (rate, channels, frames, stats, histogram)") {
    for (id <- Seq(0L, 7L, 123L, 9999L); (nf, ch) <- Seq((1, 1), (50, 1), (75, 2), (99, 2))) {
      val d = Multimodal.decodeAudio(Multimodal.syntheticWav(id, nf, 8000, ch))
        .fold(e => fail(s"decode failed: $e"), identity)
      assert(d.sampleRate == 8000 && d.channels == ch && d.nFrames == nf, s"id=$id")
      val samples = for (t <- 0 until nf; c <- 0 until ch) yield sample(id, t, c)
      assert(d.peakAbs == samples.map(math.abs).max, s"id=$id nf=$nf ch=$ch")
      assert(d.sumAbs == samples.map(math.abs).sum)
      assert(d.sumSq == samples.map(s => s * s).sum)
      val expHist = Array.fill(8)(0L)
      samples.foreach { s =>
        expHist(math.min((math.abs(s) * 8 / 32768L).toInt, 7)) += 1L
      }
      assert(d.hist.toSeq == expHist.toSeq)
      assert(d.hist.sum == nf.toLong * ch) // the oracled partition identity
    }
  }

  test("decodeAudio handles 8-bit and big-endian PCM (scaled into the 16-bit domain)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(fmt: AudioFormat, data: Array[Byte], frames: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 8-bit unsigned mono (WAVE's 8-bit convention): bytes 0..255 -> (b-128)*256
    val fmt8 = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val d8 = Multimodal.decodeAudio(wav(fmt8, Array[Byte](0, 127.toByte, 128.toByte, 255.toByte), 4))
      .fold(e => fail(e), identity)
    assert(d8.nFrames == 4 && d8.peakAbs == 128L * 256)
    assert(d8.sumAbs == (128L + 1 + 0 + 127) * 256)
    // 16-bit big-endian via AIFF (AIFF is the JDK's big-endian PCM container)
    val fmtBe = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, true)
    val beData = Array[Byte](0x01, 0x00, 0xff.toByte, 0x00) // 256, -256
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(beData), fmtBe, 2),
      AudioFileFormat.Type.AIFF, bos)
    val dBe = Multimodal.decodeAudio(bos.toByteArray).fold(e => fail(e), identity)
    assert(dBe.nFrames == 2 && dBe.peakAbs == 256 && dBe.sumAbs == 512 &&
      dBe.sumSq == 2L * 256 * 256)
  }

  test("corrupt/compressed audio payloads take the row-error path") {
    val torn = Multimodal.syntheticWav(1L, 50).take(20) // RIFF magic, torn header
    assert(Multimodal.decodeAudio(torn).isLeft)
    // body truncated AFTER a valid header: AudioInputStream returns only
    // whole frames, so this surfaces as fewer frames than the header
    // declares — must be a row error, never a silently short Right
    val whole = Multimodal.syntheticWav(1L, 50)
    assert(Multimodal.decodeAudio(whole.dropRight(1)) == Left("error:decode"),
      "mid-frame truncation accepted")
    assert(Multimodal.decodeAudio(whole.dropRight(10)) == Left("error:decode"),
      "whole-frame truncation accepted")
    assert(Multimodal.decodeAudio("plain prose, not audio".getBytes("UTF-8"))
      == Left("error:unrecognized"))
    assert(Multimodal.decodeAudio(Array.empty[Byte]) == Left("error:unrecognized"))
    // ULAW inside a recognized container: provider claims it, encoding
    // unsupported by the exact-integer path -> routed, never thrown
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val ulaw = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3, 4)), ulaw, 4),
      AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeAudio(bos.toByteArray)
      .swap.exists(_.startsWith("error:unsupported-encoding")))
    // MIDI: a real MThd container the JDK's soft-synth reader WOULD
    // render to PCM — deliberately NOT audio here (a score is not a
    // recording; synthesizing it would report synthesis stats as
    // decoded samples). Must route unrecognized, not decode.
    val seq = new javax.sound.midi.Sequence(javax.sound.midi.Sequence.PPQ, 4)
    seq.createTrack()
    val midiBos = new java.io.ByteArrayOutputStream()
    javax.sound.midi.MidiSystem.write(seq, 0, midiBos)
    assert(Multimodal.decodeAudio(midiBos.toByteArray) == Left("error:unrecognized"))
    // a crafted header claiming an absurd channel count must be a row
    // error BEFORE any body-sized allocation (the JDK Wave reader
    // accepts channels=32000; unguarded, the chunk buffer would be
    // frameSize*1024 = 64 MB per row and an OOM escapes NonFatal)
    val hostile = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hostile.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(32000.toShort) // PCM, channels=32000
      .putInt(8000).putInt(8000 * 32000 * 2)
      .putShort((32000 * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(0)
    assert(Multimodal.decodeAudio(hostile.array())
      == Left("error:unsupported-channels:32000"))
  }

  test("decodeAudioFeatures: mixed ok/corrupt batch routes per-row, no shuffle, deterministic") {
    val media = spark.range(40).select($"id").as[Long]
      .map { id =>
        val wav = Multimodal.syntheticWav(id, (10 + id % 20).toInt, 8000, (1 + id % 2).toInt)
        if (id % 10 == 0) Multimodal.MediaRow(id, wav.take(20))
        else Multimodal.MediaRow(id, wav)
      }.toDF()
    val feats = Multimodal.decodeAudioFeatures(spark, media, batchSize = 7)
    val rows = feats.collect()
    assert(rows.length == 40)
    val (ok, err) = rows.partition(_.status == "ok")
    assert(ok.length == 36 && err.length == 4)
    assert(err.forall(r => r.status.startsWith("error:") && r.sum_sq == 0L &&
      r.energy_hist.isEmpty && r.sample_rate == 0))
    ok.foreach { r =>
      assert(r.sample_rate == 8000 && r.channels == (1 + r.id % 2) &&
        r.n_frames == 10 + r.id % 20)
      assert(r.n_samples == r.n_frames * r.channels &&
        r.energy_hist.sum == r.n_samples)
      val samples = for (t <- 0 until r.n_frames.toInt; c <- 0 until r.channels)
        yield sample(r.id, t, c)
      assert(r.sum_abs == samples.map(math.abs).sum && r.peak_abs == samples.map(math.abs).max)
    }
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val again = Multimodal.decodeAudioFeatures(spark, media, batchSize = 7).collect()
    assert(rows.map(r => (r.id, r.status, r.sum_sq, r.energy_hist.toSeq)).toSet ==
      again.map(r => (r.id, r.status, r.sum_sq, r.energy_hist.toSeq)).toSet)
  }

  /** Independent frame-pixel-formula evaluation (the same modular
    * arithmetic the DuckDB oracle uses). */
  private def framePix(id: Long, f: Int, x: Int, y: Int): Long =
    (((id * 31 + f * 17 + x * 7 + y * 13) % 256) + 256) % 256

  test("decodeMediaFrames recovers synthetic GIF frames exactly (count, sampling arithmetic, gray mass)") {
    for (id <- Seq(0L, 7L, 123L); (w, h, nf) <- Seq((6, 5, 1), (5, 4, 3), (9, 7, 8), (4, 4, 13))) {
      val d = Multimodal.decodeMediaFrames(Multimodal.syntheticGif(id, w, h, nf), nSample = 4)
        .fold(e => fail(s"decode failed: $e"), identity)
      assert(d.width == w && d.height == h && d.nFrames == nf, s"id=$id nf=$nf")
      val k = math.min(4, nf)
      assert(d.sampled.length == k)
      for (f <- 0 until k) {
        val idx = f * nf / k
        assert(d.sampled(f).frameIdx == idx, s"sample $f")
        val expected = (for (y <- 0 until h; x <- 0 until w)
          yield 3L * framePix(id, idx, x, y)).sum
        assert(d.sampled(f).graySum == expected, s"id=$id frame $idx")
      }
    }
  }

  test("decodeMediaFrames reads multi-page TIFF (the other in-JDK container) exactly") {
    // Same pixel formula as syntheticGif, written as a multi-page TIFF
    // via the JDK's ImageIO TIFF writer (Java 9+) — pins the scaladoc
    // claim that the frame walk is container-generic, not GIF-only.
    def syntheticTiff(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        for (f <- 0 until nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until h; x <- 0 until w) {
            val v = framePix(id, f, x, y).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
        ios.flush()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    for (id <- Seq(0L, 9L); (w, h, nf) <- Seq((6, 5, 1), (5, 4, 3), (4, 4, 7))) {
      val d = Multimodal.decodeMediaFrames(syntheticTiff(id, w, h, nf), nSample = 4)
        .fold(e => fail(s"tiff decode failed: $e"), identity)
      assert(d.width == w && d.height == h && d.nFrames == nf, s"id=$id nf=$nf")
      val k = math.min(4, nf)
      assert(d.sampled.length == k)
      for (f <- 0 until k) {
        val idx = f * nf / k
        assert(d.sampled(f).frameIdx == idx)
        val expected = (for (y <- 0 until h; x <- 0 until w)
          yield 3L * framePix(id, idx, x, y)).sum
        assert(d.sampled(f).graySum == expected, s"id=$id tiff frame $idx")
      }
    }
    // Torn TIFF: a 3-byte head loses the 4-byte II*\0 magic
    // (unrecognized); a tear past the magic is still CLAIMED by the
    // TIFF reader SPI (probed on JDK 17: even a 6-byte head is claimed)
    // and fails the IFD walk loudly (decode). But a MID-BODY tear can
    // pass SILENTLY SHORT: the reader stops the IFD walk at the tear
    // and reports only the readable prefix's pages (probed: a 3-page
    // TIFF cut in half decodes as a valid 1-page container). This is
    // the documented TIFF caveat — no trailer convention exists to
    // detect it (GIF's 0x3B check has no TIFF equivalent), so
    // byte-integrity-critical pipelines pair a payload checksum column.
    val tiff = syntheticTiff(1L, 5, 4, 3)
    assert(Multimodal.decodeMediaFrames(tiff.take(3)) == Left("error:unrecognized"))
    assert(Multimodal.decodeMediaFrames(tiff.take(6)) == Left("error:decode"))
    Multimodal.decodeMediaFrames(tiff.take(tiff.length / 2)).fold(
      e => assert(e == "error:decode"),
      d => assert(d.nFrames < 3, "a mid-body tear must not report all pages"))
  }

  test("torn/foreign multi-frame payloads take the row-error path") {
    val gif = Multimodal.syntheticGif(3L, 6, 5, 5)
    assert(Multimodal.decodeMediaFrames(gif.take(20)) == Left("error:decode"))
    assert(Multimodal.decodeMediaFrames(gif.dropRight(30)) == Left("error:decode"),
      "torn tail must surface through the full-stream frame walk")
    assert(Multimodal.decodeMediaFrames("not a container".getBytes("UTF-8"))
      == Left("error:unrecognized"))
    assert(Multimodal.decodeMediaFrames(Array.empty[Byte]) == Left("error:unrecognized"))
    // a single-frame PNG is a valid 1-frame container, not an error
    val png = Multimodal.decodeMediaFrames(Multimodal.syntheticPng(1L, 4, 3))
      .fold(e => fail(e), identity)
    assert(png.nFrames == 1 && png.sampled.length == 1)
  }

  test("decodeMediaFrameFeatures: mixed ok/torn batch routes per-row, no shuffle") {
    val media = spark.range(30).select($"id").as[Long]
      .map { id =>
        val gif = Multimodal.syntheticGif(id, (4 + id % 4).toInt, (3 + id % 3).toInt, (2 + id % 5).toInt)
        if (id % 10 == 0) Multimodal.MediaRow(id, gif.take(20))
        else Multimodal.MediaRow(id, gif)
      }.toDF()
    val feats = Multimodal.decodeMediaFrameFeatures(spark, media, nSample = 4, batchSize = 7)
    val rows = feats.collect()
    val (ok, err) = rows.partition(_.status == "ok")
    assert(ok.length == 27 && err.length == 3)
    assert(err.forall(r => r.status == "error:decode" && r.frame_gray.isEmpty))
    ok.foreach { r =>
      assert(r.n_frames == 2 + r.id % 5 &&
        r.n_sampled == math.min(4, r.n_frames) &&
        r.frame_idx.length == r.n_sampled && r.frame_gray.length == r.n_sampled)
    }
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("decodeImage handles non-RGB sources (grayscale PNG reports its band count)") {
    val img = new java.awt.image.BufferedImage(
      6, 5, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 5; x <- 0 until 6)
      img.getRaster.setSample(x, y, 0, (x * 40 + y * 9) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.decodeImage(bos.toByteArray).fold(e => fail(e), identity)
    assert(d.width == 6 && d.height == 5 && d.channels == 1)
    // getRGB replicates gray across r,g,b — mass is 3x the gray values
    // AFTER the gray->sRGB tone mapping, so assert structure, not values:
    assert(d.graySum > 0 && d.blockSums.sum == d.graySum)
  }
}
