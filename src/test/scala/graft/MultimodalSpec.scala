package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{AviCodec, PngCodec, StubCodec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("codec round-trips and rejects corrupt payloads") {
    val body = Array.tabulate(64)(_.toByte)
    val enc = StubCodec.encode(8, 8, 1, body)
    assert(StubCodec.decode(enc).exists { case (w, h, f, b) =>
      w == 8 && h == 8 && f == 1 && b.sameElements(body)
    })
    assert(StubCodec.decode("not a media file".getBytes).isEmpty)
    assert(StubCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("decodeFeatures keeps schema and survives corrupt rows") {
    import spark.implicits._
    val good = Multimodal.syntheticMedia(spark, 21, partitions = 4)
    val corrupt = Seq(Multimodal.MediaRow(999L, "image", "garbage".getBytes,
      Multimodal.MediaMeta(0, 0, 0, 0))).toDS()
    val out = Multimodal.decodeFeatures(good.union(corrupt))
    assert(out.columns.toSeq ==
      Seq("media_id", "kind", "width", "height", "channels", "n_frames", "n_bytes",
        "sample_rate", "n_samples", "mean_byte", "channel_means", "channel_rms"))
    val rows = out.collect()
    assert(rows.length == 21) // corrupt row dropped, not crashed
    assert(rows.forall(_.mean_byte >= 0))
    // every kind fills its own fields: spatial dims for image/video,
    // rate+samples for audio
    assert(rows.filter(_.kind == "image").forall(r => r.width > 0 && r.sample_rate == 0))
    assert(rows.filter(_.kind == "audio").forall(r =>
      r.sample_rate >= 8000 && r.n_samples == r.n_frames.toLong * r.channels && r.width == 0))
    // video rows are real AVI decodes now: 3 JPEG bands, fps in
    // sample_rate, raster samples counted
    assert(rows.filter(_.kind == "video").forall(r =>
      r.width > 0 && r.n_frames == 8 && r.channels == 3 &&
        r.sample_rate >= 10 && r.sample_rate <= 14 &&
        r.n_samples == 8L * r.width * r.height * 3))
  }

  test("mapPartitions operators preserve partitioning (no shuffle)") {
    val media = Multimodal.syntheticMedia(spark, 100, partitions = 7)
    val decoded = Multimodal.decodeFeatures(media)
    assert(decoded.rdd.getNumPartitions == 7)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"),
      "decode must be a narrow map, not a shuffle")
  }

  test("resize and frameSample rewrite payload + metadata consistently") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, 30, partitions = 3)
    val resized = Multimodal.resize(media, 4, 4).collect()
    resized.foreach { m =>
      assert(m.meta.width == 4 && m.meta.height == 4)
      m.kind match {
        case "image" =>
          assert(PngCodec.decode(m.payload).exists { case (w, h, _, _, _) => w == 4 && h == 4 })
        case "audio" => // audio resize = real resample to w*h frames
          assert(WavCodec.decode(m.payload).exists { case (_, _, f, _) => f == 16 })
          assert(m.meta.nFrames == 16)
        case _ => // video resize rebuilds the AVI with resized JPEG frames
          assert(AviCodec.decode(m.payload).exists { case (w, h, _, frames) =>
            w == 4 && h == 4 && frames.forall(AviCodec.jpegDims(_).contains((4, 4)))
          })
      }
    }
    val sampled = Multimodal.frameSample(media, 2).collect()
    sampled.filter(_.kind == "video").foreach { m =>
      assert(m.meta.nFrames == 4) // 8 frames sampled every 2nd
      assert(AviCodec.decode(m.payload).exists(_._4.length == 4))
    }
    // frame-sampling must not touch non-video rows
    sampled.filter(_.kind == "image").foreach(m => assert(m.meta.nFrames == 1))
    sampled.filter(_.kind == "audio").foreach(m => assert(m.meta.nFrames >= 300))
  }

  test("PNG decode is real: exact dimensions, channels, per-channel means from the raster") {
    val id = 42L
    val (w, h) = (20, 15)
    val img = PngCodec.syntheticImage(id, w, h)
    val png = PngCodec.encode(img)
    assert(PngCodec.isPng(png) && !PngCodec.isPng("GRAFTMM1????".getBytes))
    val Some((dw, dh, bands, means, rms)) = PngCodec.decode(png)
    assert(dw == w && dh == h && bands == 3)
    // PNG is lossless, so the decoded per-channel means/RMS must
    // equal the stats computed straight off the source pixel
    // function — bit-exact, not approximate
    val samples = (0 until 3).map { c =>
      for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13 + c * 41) % 256
    }
    val expMeans = samples.map(s => s.sum.toDouble / (w * h))
    val expRms = samples.map(s => math.sqrt(s.map(v => v.toDouble * v).sum / (w * h)))
    assert(means.toSeq == expMeans, s"decoded means ${means.toSeq} != raster means $expMeans")
    assert(rms.toSeq == expRms, s"decoded rms ${rms.toSeq} != raster rms $expRms")
    // decode rejects non-image bytes instead of crashing
    assert(PngCodec.decode(Array.fill[Byte](64)(0x11)).isEmpty)
  }

  test("PNG decode drops adversarial payloads: truncation and dimension bombs") {
    val png = PngCodec.encode(PngCodec.syntheticImage(3L, 12, 9))
    // truncated mid-IDAT but with a valid signature + IHDR — must be
    // dropped (None), not thrown
    assert(PngCodec.decodeImage(png.take(40)).isEmpty)
    assert(PngCodec.decodeImage(png.take(8)).isEmpty)
    // dimension bomb: same bytes with the IHDR width field rewritten
    // to 2^31-1 — the declared-dims bound must reject it BEFORE any
    // decoder allocation
    val bomb = png.clone()
    bomb(16) = 0x7f.toByte; bomb(17) = 0xff.toByte; bomb(18) = 0xff.toByte; bomb(19) = 0xff.toByte
    assert(PngCodec.declaredDims(bomb).exists(_._1 == 0x7fffffffL))
    assert(PngCodec.decodeImage(bomb).isEmpty)
    // zero-dimension header is equally invalid
    val zero = png.clone()
    zero(16) = 0; zero(17) = 0; zero(18) = 0; zero(19) = 0
    assert(PngCodec.decodeImage(zero).isEmpty)
    // overflow bomb: width = height = 2^32-1 would wrap w*h negative
    // in a product-form bound — the division-form check must reject
    val wrap = png.clone()
    for (i <- 16 until 24) wrap(i) = 0xff.toByte
    assert(PngCodec.declaredDims(wrap).exists { case (w, h) => w == 0xffffffffL && h == 0xffffffffL })
    assert(PngCodec.decodeImage(wrap).isEmpty)
  }

  test("degenerate WAVs: empty data chunk passes through resize/resample; zero-rate header is dropped") {
    import spark.implicits._
    // structurally valid WAV, zero frames: decodes (it IS valid) but
    // resample operators must pass the row through, not index into
    // an empty sample array
    val empty = WavCodec.encode(16000, 1, Array.empty[Short])
    assert(WavCodec.decode(empty).exists { case (r, c, f, s) => r == 16000 && c == 1 && f == 0 && s.isEmpty })
    val row = Seq(Multimodal.MediaRow(1L, "audio", empty, Multimodal.MediaMeta(0, 0, 0, 16000))).toDS()
    val resized = Multimodal.resize(row, 4, 4).collect().head
    assert(resized.payload.sameElements(empty), "empty-data WAV must pass through resize unchanged")
    val resampled = Multimodal.resampleAudio(row, 8000).collect().head
    assert(resampled.payload.sameElements(empty), "empty-data WAV must pass through resample unchanged")
    // zero sample rate in the fmt chunk (offset 24, LE): garbage
    // header the JDK reader accepts — decode must reject it before
    // anything divides by it
    val wav = WavCodec.encode(16000, 1, WavCodec.syntheticSamples(3L, 50, 1))
    val zeroRate = wav.clone()
    for (i <- 24 until 28) zeroRate(i) = 0
    assert(WavCodec.decode(zeroRate).isEmpty, "rate-0 WAV must be dropped")
  }

  test("image resize is exact nearest-neighbor: dst(x,y,c) == src(floor(x*sw/dw), floor(y*sh/dh), c)") {
    val src = PngCodec.syntheticImage(7L, 17, 11)
    val (dw, dh) = (5, 4)
    val dst = PngCodec.resizeNearest(src, dw, dh)
    assert(dst.getWidth == dw && dst.getHeight == dh)
    for (y <- 0 until dh; x <- 0 until dw; c <- 0 until 3) {
      val (sx, sy) = (x * 17 / dw, y * 11 / dh)
      assert(dst.getRaster.getSample(x, y, c) == src.getRaster.getSample(sx, sy, c),
        s"pixel ($x,$y,$c) not the nearest-neighbor sample")
    }
    // and the full operator round-trips through PNG losslessly: the
    // re-decoded payload reproduces the kernel's raster bit-for-bit
    val reenc = PngCodec.decodeImage(PngCodec.encode(dst)).get
    for (y <- 0 until dh; x <- 0 until dw; c <- 0 until 3)
      assert(reenc.getRaster.getSample(x, y, c) == dst.getRaster.getSample(x, y, c))
  }

  test("WAV decode is real: AudioSystem parses rate/channels/frames and PCM round-trips bit-exactly") {
    val (id, frames, channels, rate) = (11L, 347, 2, 12000)
    val samples = WavCodec.syntheticSamples(id, frames, channels)
    val wav = WavCodec.encode(rate, channels, samples)
    assert(WavCodec.isWav(wav) && !WavCodec.isWav("GRAFTMM1????".getBytes))
    val Some((dr, dc, df, ds)) = WavCodec.decode(wav)
    assert(dr == rate && dc == channels && df == frames)
    // PCM is lossless: every decoded 16-bit sample equals the source
    // waveform function, bit-for-bit
    assert(ds.sameElements(samples))
    for (t <- 0 until 5; c <- 0 until channels)
      assert(ds(t * channels + c) == (((id * 31 + t * 7 + c * 41) % 65536) - 32768).toShort)
    // per-channel stats match the waveform computed directly
    val (means, rms) = WavCodec.channelStats(ds, channels)
    for (c <- 0 until channels) {
      val ch = (0 until frames).map(t => (((id * 31 + t * 7 + c * 41) % 65536) - 32768).toDouble)
      assert(means(c) == ch.sum / frames)
      assert(rms(c) == math.sqrt(ch.map(v => v * v).sum / frames))
    }
  }

  test("WAV decode drops corrupt/adversarial payloads") {
    val wav = WavCodec.encode(16000, 1, WavCodec.syntheticSamples(5L, 100, 1))
    // truncated inside the fmt chunk, valid RIFF/WAVE magic
    assert(WavCodec.decode(wav.take(20)).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    // decodeFeatures drops a corrupt WAV row, never crashes
    import spark.implicits._
    val corrupt = Seq(Multimodal.MediaRow(7L, "audio", wav.take(20),
      Multimodal.MediaMeta(0, 0, 0, 0))).toDS()
    assert(Multimodal.decodeFeatures(corrupt).collect().isEmpty)
  }

  test("audio resample is exact nearest-neighbor in the frame domain") {
    val (frames, channels) = (100, 2)
    val samples = WavCodec.syntheticSamples(9L, frames, channels)
    val res = WavCodec.resampleNearest(samples, channels, frames, 37)
    for (i <- 0 until 37; c <- 0 until channels) {
      val si = i * frames / 37
      assert(res(i * channels + c) == samples(si * channels + c),
        s"frame $i ch $c not the nearest-neighbor source frame")
    }
    // the full operator: rate conversion scales the frame count and
    // stamps the new rate into payload AND metadata
    import spark.implicits._
    val row = Seq(Multimodal.MediaRow(1L, "audio",
      WavCodec.encode(16000, 1, WavCodec.syntheticSamples(1L, 320, 1)),
      Multimodal.MediaMeta(0, 0, 320, 16000))).toDS()
    val out = Multimodal.resampleAudio(row, 8000).collect().head
    assert(out.meta.sampleRate == 8000 && out.meta.nFrames == 160)
    assert(WavCodec.decode(out.payload).exists { case (r, _, f, _) => r == 8000 && f == 160 })
  }

  test("AVI mux/demux is lossless on frame bytes: bit-exact container round-trip") {
    val (id, w, h, nFrames, fps) = (13L, 20, 17, 6, 12)
    val jpegs = (0 until nFrames).map(f =>
      AviCodec.encodeJpeg(PngCodec.syntheticImage(id * 131 + f * 17, w, h)))
    val avi = AviCodec.encode(w, h, fps, jpegs)
    assert(AviCodec.isAvi(avi) && !AviCodec.isAvi("RIFFxxxxWAVE".getBytes))
    val Some((dw, dh, dfps, frames)) = AviCodec.decode(avi)
    assert(dw == w && dh == h && dfps == fps.toDouble && frames.length == nFrames)
    // the container parse is LOSSLESS: every demuxed frame is the
    // exact JPEG byte array that was muxed in — bit for bit
    for (f <- 0 until nFrames)
      assert(frames(f).sameElements(jpegs(f)), s"frame $f bytes differ after mux/demux")
    // odd-length frames exercise the RIFF even-padding path
    val odd = Seq(Array.tabulate(33)(i => (0xff - i).toByte)) // not a JPEG, mux doesn't care
    val oddAvi = AviCodec.encode(4, 4, 1, Seq(AviCodec.encodeJpeg(PngCodec.syntheticImage(1, 4, 4))))
    assert(AviCodec.decode(oddAvi).isDefined)
    val mixed = AviCodec.encode(4, 4, 5, odd)
    assert(AviCodec.decode(mixed).exists(_._4.head.sameElements(odd.head)))
  }

  test("MJPEG frame decode is real: javax.imageio parses each frame, stats deterministic and near the source raster") {
    val (id, w, h) = (7L, 24, 18)
    val src = PngCodec.syntheticImage(id, w, h)
    val jpeg = AviCodec.encodeJpeg(src)
    assert(AviCodec.jpegDims(jpeg).contains((w, h)))
    val img = AviCodec.decodeJpeg(jpeg).get
    assert(img.getWidth == w && img.getHeight == h && img.getRaster.getNumBands == 3)
    // JPEG is lossy but its decode of FIXED bytes is deterministic:
    // two decodes must agree sample-for-sample
    val img2 = AviCodec.decodeJpeg(jpeg).get
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      assert(img.getRaster.getSample(x, y, c) == img2.getRaster.getSample(x, y, c))
    // and the decoded mean must sit near the source raster's mean
    // (coding error is small on smooth synthetic content)
    def mean(i: java.awt.image.BufferedImage): Double = {
      var s = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        s += i.getRaster.getSample(x, y, c)
      s.toDouble / (w * h * 3)
    }
    assert(math.abs(mean(img) - mean(src)) < 8.0,
      s"JPEG mean ${mean(img)} too far from source mean ${mean(src)}")
  }

  test("AVI decode drops corrupt/adversarial payloads") {
    val avi = AviCodec.syntheticClip(5L, 16, 16, 4, 10)
    // truncations at every structural boundary: magic-only, inside
    // hdrl, inside movi — None, never a crash
    assert(AviCodec.decode(avi.take(11)).isEmpty)
    assert(AviCodec.decode(avi.take(40)).isEmpty)
    AviCodec.decode(avi.take(avi.length / 2)) // mid-movi truncation: must not throw
    assert(AviCodec.decode("RIFFxxxxAVI garbage".getBytes).isEmpty)
    assert(AviCodec.decode(Array.emptyByteArray).isEmpty)
    // dimension bomb: avih declaring 2^32-1 x 2^32-1 must be
    // rejected by the division-form bound before any frame decode
    val bomb = avi.clone()
    // avih data starts at 12 (RIFF hdr) + 12 (LIST size hdrl) + 8 (avih hdr) = 32;
    // dwWidth/dwHeight at +32/+36
    for (i <- 64 until 72) bomb(i) = 0xff.toByte
    assert(AviCodec.decode(bomb).isEmpty, "dimension-bomb avih must be dropped")
    // JPEG dimension bomb: a frame whose SOF declares 65535x65535
    // (4.3e9 px) must be rejected by jpegDims before ImageIO runs
    val jpeg = AviCodec.encodeJpeg(PngCodec.syntheticImage(1, 8, 8))
    val sofBomb = jpeg.clone()
    var off = 2
    var planted = false
    while (!planted && off + 9 < sofBomb.length) {
      if ((sofBomb(off) & 0xff) == 0xff) {
        val m = sofBomb(off + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          sofBomb(off + 5) = 0xff.toByte; sofBomb(off + 6) = 0xff.toByte
          sofBomb(off + 7) = 0xff.toByte; sofBomb(off + 8) = 0xff.toByte
          planted = true
        }
      }
      off += 1
    }
    assert(planted, "test setup: SOF marker not found")
    assert(AviCodec.jpegDims(sofBomb).contains((65535, 65535)))
    assert(AviCodec.decodeJpeg(sofBomb).isEmpty, "SOF dimension bomb must be dropped")
    // chunk-size lie: a chunk declaring a size past the payload end
    // must stop the walk gracefully, not throw
    AviCodec.decode(avi.dropRight(7))
    // decodeFeatures drops a corrupt AVI row, never crashes
    import spark.implicits._
    val corrupt = Seq(Multimodal.MediaRow(8L, "video", avi.take(40),
      Multimodal.MediaMeta(0, 0, 0, 0))).toDS()
    assert(Multimodal.decodeFeatures(corrupt).collect().isEmpty)
  }

  test("AVI frame-sample is a lossless container rewrite: kept JPEGs bit-exact, no re-encode") {
    import spark.implicits._
    val (id, w, h) = (11L, 16, 16)
    val jpegs = (0 until 8).map(f =>
      AviCodec.encodeJpeg(PngCodec.syntheticImage(id * 131 + f * 17, w, h)))
    val avi = AviCodec.encode(w, h, 10, jpegs)
    val row = Seq(Multimodal.MediaRow(id, "video", avi,
      Multimodal.MediaMeta(w, h, 8, 10))).toDS()
    val out = Multimodal.frameSample(row, 3).collect().head
    assert(out.meta.nFrames == 3) // frames 0, 3, 6
    val Some((_, _, fps, kept)) = AviCodec.decode(out.payload)
    assert(fps == 10.0)
    assert(kept.length == 3)
    assert(kept(0).sameElements(jpegs(0)) && kept(1).sameElements(jpegs(3)) &&
      kept(2).sameElements(jpegs(6)),
      "frame-sampling must carry the kept frames' JPEG bytes over bit-exactly")
  }

  test("video features come from real frame decodes: n_frames, fps, per-band stats over sampled frames") {
    import spark.implicits._
    val (id, w, h, nFrames, fps) = (2L, 18, 16, 8, 13)
    val avi = AviCodec.syntheticClip(id, w, h, nFrames, fps)
    val row = Seq(Multimodal.MediaRow(id, "video", avi,
      Multimodal.MediaMeta(w, h, nFrames, fps))).toDS()
    val f = Multimodal.decodeFeatures(row).collect().head
    assert(f.width == w && f.height == h && f.channels == 3 &&
      f.n_frames == nFrames && f.sample_rate == fps &&
      f.n_samples == nFrames.toLong * w * h * 3)
    // the stats must equal what decoding the frames directly yields —
    // same decoder, same accumulation, deterministic
    val Some((_, _, _, frames)) = AviCodec.decode(avi)
    val sums = new Array[Long](3); val sqSums = new Array[Long](3)
    frames.foreach { jb =>
      val img = AviCodec.decodeJpeg(jb).get
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val s = img.getRaster.getSample(x, y, c)
        sums(c) += s; sqSums(c) += s.toLong * s
      }
    }
    val n = nFrames.toLong * w * h
    val expMeans = sums.map(_.toDouble / n).toSeq
    val expRms = sqSums.map(q => math.sqrt(q.toDouble / n)).toSeq
    assert(f.channel_means == expMeans && f.channel_rms == expRms)
    assert(f.mean_byte == expMeans.sum / 3)
  }

  test("synthetic generation is deterministic") {
    val a = Multimodal.syntheticMedia(spark, 50).collect().map(m => (m.media_id, m.payload.toSeq))
    val b = Multimodal.syntheticMedia(spark, 50, partitions = 3).collect().map(m => (m.media_id, m.payload.toSeq))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }
}
