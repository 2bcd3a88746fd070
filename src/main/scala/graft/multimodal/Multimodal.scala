package graft.multimodal

import graft.GraftQuery
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2C13): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / resample / frame-sample operators.
  *
  * The IMAGE path is real: payloads are genuine PNG files, decoded
  * with `javax.imageio` (pure JVM, no native libs) into width /
  * height / channel count / per-channel mean+RMS, and resized with
  * an exact nearest-neighbor kernel then re-encoded as PNG. The
  * AUDIO path is real too (round 8): payloads are genuine RIFF/WAVE
  * files with 16-bit signed PCM, decoded with
  * `javax.sound.sampled.AudioSystem` (also pure JVM) into sample
  * rate / channel count / frame count / per-channel mean+RMS, and
  * resampled with an exact nearest-neighbor kernel then re-encoded
  * as WAV. Only VIDEO remains a clearly-marked STUB ("GRAFTMM1"
  * header + dimensions + raw bytes) — the JVM genuinely ships no
  * public video codec — exercising the plumbing (schema, partition-
  * parallel batch iteration, corrupt-row handling) on a
  * deterministic synthetic format. Dispatch is by payload magic
  * bytes, not by the `kind` column, so a mislabeled or corrupt row
  * degrades the same way a real pipeline's would.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nFrames: Int, sampleRate: Int)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  /** One decoded-feature row per media. Spatial kinds fill
    * width/height; audio fills sample_rate/n_samples (n_frames is
    * the audio frame count — one frame = one sample per channel).
    * channel_means / channel_rms are the per-channel mean and RMS of
    * the decoded samples (0-255 raster samples for images, signed
    * 16-bit PCM samples for audio, unsigned body bytes for the video
    * stub). */
  final case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                                 channels: Int, n_frames: Int, n_bytes: Long,
                                 sample_rate: Int, n_samples: Long,
                                 mean_byte: Double, channel_means: Seq[Double],
                                 channel_rms: Seq[Double])

  /** REAL image codec over `javax.imageio` — PNG in, PNG out.
    * Deterministic end to end: the synthetic raster is a fixed
    * function of (id, x, y, channel), PNG is lossless, and the
    * resize kernel is exact nearest-neighbor (floor(dst*src/size)),
    * so every decoded sample is reproducible bit-for-bit across
    * JVMs and partitionings. */
  object PngCodec {
    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'

    /** Dimension bound enforced BEFORE handing bytes to ImageIO: a
      * crafted IHDR declaring a 2^31-pixel image would otherwise make
      * the decoder attempt the allocation (or throw a non-IO error)
      * and kill the task — at crawl scale corrupt-but-PNG-magic
      * payloads are ordinary input, and the contract is "dropped,
      * never crashed on" (VERDICT r7 item 2). 2^26 px = a 8192x8192
      * RGBA at ~256 MB decoded, far above any thumbnail pipeline. */
    val MaxPixels: Long = 1L << 26

    /** Width/height a PNG payload DECLARES in its IHDR (bytes 16-23,
      * big-endian, immediately after the 8-byte signature + 4-byte
      * length + "IHDR" type). None if the payload is too short to
      * carry a header. */
    private[graft] def declaredDims(payload: Array[Byte]): Option[(Long, Long)] =
      if (payload.length < 24) None
      else {
        def be32(off: Int): Long =
          ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
            ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
        Some((be32(16), be32(20)))
      }

    /** Deterministic synthetic RGB image, seeded by id. */
    def syntheticImage(id: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            raster.setSample(x, y, c, ((id * 31 + x * 7 + y * 13 + c * 41) % 256).toInt)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      img
    }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real decode: (width, height, bands, per-band mean, per-band
      * RMS of the 0-255 samples), or None for bytes ImageIO cannot
      * parse. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Double], Array[Double])] =
      decodeImage(payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bands = raster.getNumBands
        val sums = new Array[Long](bands)
        val sqSums = new Array[Long](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < bands) {
              val s = raster.getSample(x, y, c)
              sums(c) += s; sqSums(c) += s.toLong * s; c += 1
            }
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        (w, h, bands, sums.map(_.toDouble / n), sqSums.map(q => math.sqrt(q.toDouble / n)))
      }

    /** NonFatal, not just IOException: ImageIO.read can throw
      * IllegalArgumentException / ArrayIndexOutOfBoundsException on
      * adversarial or truncated payloads — any of those must mean
      * "drop the row", not "kill the task". Declared dimensions are
      * bounded BEFORE the decoder runs (see [[MaxPixels]]). */
    def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      declaredDims(payload) match {
        // overflow-proof bound: w <= MaxPixels / h instead of
        // w * h <= MaxPixels — dims near 2^32 would wrap w*h
        // negative and sail under a product-form cap
        case Some((w, h)) if w > 0 && h > 0 && w <= MaxPixels / h =>
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        case _ => None
      }

    /** Exact nearest-neighbor resize: dst(x,y,c) =
      * src(floor(x*sw/dw), floor(y*sh/dh), c). A hand-rolled kernel
      * instead of Graphics2D so the sample mapping is a pinned
      * deterministic contract, not an AWT rendering-hint choice. */
    def resizeNearest(src: java.awt.image.BufferedImage, dw: Int, dh: Int): java.awt.image.BufferedImage = {
      val (sw, sh) = (src.getWidth, src.getHeight)
      val bands = src.getRaster.getNumBands
      val dst = new java.awt.image.BufferedImage(dw, dh,
        if (bands >= 3) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val sr = src.getRaster
      val dr = dst.getRaster
      val db = dst.getRaster.getNumBands
      var y = 0
      while (y < dh) {
        val sy = (y.toLong * sh / dh).toInt
        var x = 0
        while (x < dw) {
          val sx = (x.toLong * sw / dw).toInt
          var c = 0
          while (c < db) { dr.setSample(x, y, c, sr.getSample(sx, sy, c min (bands - 1))); c += 1 }
          x += 1
        }
        y += 1
      }
      dst
    }
  }

  /** REAL audio codec over `javax.sound.sampled` — RIFF/WAVE 16-bit
    * signed little-endian PCM in, same format out. Pure JVM
    * (AudioSystem's WAVE reader/writer ships with the JDK), so the
    * decode is genuine container+format parsing, not a stub; and
    * PCM is lossless, so synthetic waveforms round-trip bit-exactly
    * (same determinism contract as [[PngCodec]]). Non-PCM or
    * non-16-bit WAV (e.g. a-law) is treated as undecodable here —
    * a None, i.e. a dropped row, never a crash. */
  object WavCodec {
    def isWav(payload: Array[Byte]): Boolean =
      payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'

    /** Frame bound, same rationale as PngCodec.MaxPixels: a crafted
      * header declaring hours of audio must not drive a giant
      * allocation. 2^26 frames = ~70 min at 16 kHz. */
    val MaxFrames: Long = 1L << 26

    /** Deterministic synthetic waveform, seeded by id: sample(t, c) =
      * ((id*31 + t*7 + c*41) mod 65536) - 32768 — full 16-bit range,
      * a fixed function of (id, frame, channel) like the image
      * raster. Layout is frame-interleaved ([t0c0, t0c1, t1c0, ...]),
      * the PCM wire order. */
    def syntheticSamples(id: Long, frames: Int, channels: Int): Array[Short] = {
      val out = new Array[Short](frames * channels)
      var t = 0
      while (t < frames) {
        var c = 0
        while (c < channels) {
          out(t * channels + c) = (((id * 31 + t * 7 + c * 41) % 65536) - 32768).toShort
          c += 1
        }
        t += 1
      }
      out
    }

    /** Interleaved 16-bit samples → RIFF/WAVE bytes via
      * AudioSystem.write (the JDK's own WAVE muxer). */
    def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) { // little-endian per the format below
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, channels, true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real decode: (sampleRate, channels, frames, interleaved
      * samples), or None for anything AudioSystem cannot parse as
      * 16-bit signed PCM within [[MaxFrames]]. NonFatal catch for
      * the same reason as PngCodec.decodeImage — adversarial bytes
      * with a valid RIFF magic are dropped, not thrown on. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Short])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          // sampleRate > 0: the JDK's WAVE reader does not reject a
          // fmt chunk declaring rate 0, and a zero rate would divide
          // downstream (resampleAudio) — garbage header, drop the row
          val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels > 0 && fmt.getSampleRate > 0 &&
            frames >= 0 && frames <= MaxFrames
          if (!ok) None
          else {
            val channels = fmt.getChannels
            val pcm = in.readAllBytes()
            val n = pcm.length / 2
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) {
              samples(i) = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
              i += 1
            }
            Some((math.round(fmt.getSampleRate), channels, n / channels, samples))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Exact nearest-neighbor resample in the FRAME domain:
      * dst frame i = src frame floor(i*srcFrames/dstFrames), all
      * channels — the 1-D twin of PngCodec.resizeNearest, and the
      * same pinned deterministic contract. */
    def resampleNearest(samples: Array[Short], channels: Int,
                        srcFrames: Int, dstFrames: Int): Array[Short] = {
      val out = new Array[Short](dstFrames * channels)
      var i = 0
      while (i < dstFrames) {
        val si = (i.toLong * srcFrames / dstFrames).toInt
        var c = 0
        while (c < channels) { out(i * channels + c) = samples(si * channels + c); c += 1 }
        i += 1
      }
      out
    }

    /** Per-channel (mean, rms) over interleaved samples. */
    def channelStats(samples: Array[Short], channels: Int): (Array[Double], Array[Double]) = {
      val sums = new Array[Double](channels)
      val sqSums = new Array[Double](channels)
      var i = 0
      while (i < samples.length) {
        val c = i % channels
        val s = samples(i).toDouble
        sums(c) += s; sqSums(c) += s * s
        i += 1
      }
      val perCh = if (channels == 0) 0 else samples.length / channels
      val n = math.max(1, perCh).toDouble
      (sums.map(_ / n), sqSums.map(q => math.sqrt(q / n)))
    }
  }

  /** STUB CODEC — deterministic fake standing in for mp4 decoding
    * (VIDEO only since round 8; images are real PNG via [[PngCodec]]
    * and audio real WAV via [[WavCodec]]). The JVM has no public
    * video codec; the format is: 8-byte magic "GRAFTMM1", then
    * width/height/nFrames as big-endian int32, then the raw payload
    * bytes. */
  object StubCodec {
    val Magic: Array[Byte] = "GRAFTMM1".getBytes("US-ASCII")
    val HeaderLen: Int = Magic.length + 12

    def encode(width: Int, height: Int, nFrames: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(HeaderLen + body.length)
      bb.put(Magic).putInt(width).putInt(height).putInt(nFrames).put(body)
      bb.array()
    }

    /** (width, height, nFrames, body) or None for corrupt payloads. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (payload.length < HeaderLen) return None
      if (!payload.take(Magic.length).sameElements(Magic)) return None
      val bb = java.nio.ByteBuffer.wrap(payload, Magic.length, 12)
      val (w, h, f) = (bb.getInt, bb.getInt, bb.getInt)
      Some((w, h, f, payload.drop(HeaderLen)))
    }

    /** Deterministic synthetic media row (seeded by id). Images get
      * a REAL PNG payload, audio a REAL WAV payload; video keeps the
      * stub format. */
    def synthetic(id: Long): MediaRow = {
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (id % 8).toInt; val h = 16 + (id % 5).toInt
      kind match {
        case "image" =>
          MediaRow(id, kind, PngCodec.encode(PngCodec.syntheticImage(id, w, h)),
            MediaMeta(w, h, 1, 0))
        case "audio" =>
          val frames = 300 + (id % 100).toInt
          val channels = 1 + (id % 2).toInt
          val rate = 8000 + (id % 3).toInt * 4000 // 8/12/16 kHz
          MediaRow(id, kind,
            WavCodec.encode(rate, channels, WavCodec.syntheticSamples(id, frames, channels)),
            MediaMeta(0, 0, frames, rate))
        case _ =>
          val frames = 8
          val body = Array.tabulate((w * h * frames).min(4096))(i => ((id * 31 + i * 7) % 256).toByte)
          MediaRow(id, kind, encode(w, h, frames, body), MediaMeta(w, h, frames, 0))
      }
    }
  }

  /** Deterministic synthetic media table (the driver testdata has no
    * media column; payload generation is part of the operator's
    * contract). */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(r => StubCodec.synthetic(r))
  }

  /** Decode + feature-extract, one codec pass per PARTITION — the
    * shape a real decoder needs (codec init once per batch, then
    * streamed rows; the Scala twin of a pandas-batch UDF). PNG
    * payloads take the real `javax.imageio` path, WAV payloads the
    * real `javax.sound.sampled` path; stub-format payloads parse the
    * GRAFTMM1 header; anything else (corrupt) is dropped, never
    * crashed on. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        if (PngCodec.isPng(m.payload))
          PngCodec.decode(m.payload).map { case (w, h, bands, means, rms) =>
            MediaFeatures(m.media_id, m.kind, w, h, bands, 1, m.payload.length.toLong,
              0, 0L, means.sum / bands, means.toSeq, rms.toSeq)
          }
        else if (WavCodec.isWav(m.payload))
          WavCodec.decode(m.payload).map { case (rate, channels, frames, samples) =>
            val (means, rms) = WavCodec.channelStats(samples, channels)
            // mean_byte for audio: the overall mean sample mapped into
            // byte range ((s+32768)/256) — keeps the column comparable
            // across kinds without faking a raster
            val overallMean = if (samples.isEmpty) 0.0 else means.sum / channels
            MediaFeatures(m.media_id, m.kind, 0, 0, channels, frames, m.payload.length.toLong,
              rate, samples.length.toLong, (overallMean + 32768.0) / 256.0,
              means.toSeq, rms.toSeq)
          }
        else StubCodec.decode(m.payload).map { case (w, h, f, body) =>
          var sum = 0L; var sq = 0.0
          body.foreach { b => val u = b & 0xff; sum += u; sq += u.toDouble * u }
          val n = math.max(1, body.length).toDouble
          val mean = sum / n
          MediaFeatures(m.media_id, m.kind, w, h, 1, f, m.payload.length.toLong,
            0, 0L, mean, Seq(mean), Seq(math.sqrt(sq / n)))
        }
      }
    }
  }

  /** Resize. Images: REAL nearest-neighbor resample via [[PngCodec]]
    * (decode → exact kernel → PNG re-encode). Audio: REAL
    * nearest-neighbor FRAME resample via [[WavCodec]] to a target of
    * newW*newH frames — the 1-D meaning of "resize to (w,h)" —
    * re-encoded as WAV at the same sample rate. Video (stub):
    * deterministic body subsample (a real impl would interpolate).
    * Corrupt payloads pass through unchanged. */
  def resize(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (PngCodec.isPng(m.payload))
        PngCodec.decodeImage(m.payload) match {
          case Some(img) =>
            m.copy(payload = PngCodec.encode(PngCodec.resizeNearest(img, newW, newH)),
              meta = m.meta.copy(width = newW, height = newH))
          case None => m
        }
      else if (WavCodec.isWav(m.payload))
        WavCodec.decode(m.payload) match {
          // frames > 0: a structurally valid WAV with an EMPTY data
          // chunk has nothing to resample from — pass it through
          // (resampleNearest would index samples(0))
          case Some((rate, channels, frames, samples)) if frames > 0 =>
            val dstFrames = math.max(1, newW * newH)
            m.copy(
              payload = WavCodec.encode(rate, channels,
                WavCodec.resampleNearest(samples, channels, frames, dstFrames)),
              meta = m.meta.copy(width = newW, height = newH, nFrames = dstFrames))
          case _ => m
        }
      else StubCodec.decode(m.payload) match {
        case Some((_, _, f, body)) =>
          val target = (newW * newH * f).min(body.length).max(0)
          val step = if (target == 0) 1 else (body.length.max(1) / target.max(1)).max(1)
          val resampled = body.indices.collect { case i if i % step == 0 => body(i) }.take(target).toArray
          m.copy(payload = StubCodec.encode(newW, newH, f, resampled),
            meta = m.meta.copy(width = newW, height = newH))
        case None => m
      }
    })
  }

  /** REAL audio resample to a new sample rate: dstFrames =
    * floor(srcFrames*newRate/srcRate), nearest-neighbor frame
    * mapping, re-encoded as WAV at `newRate`. Non-WAV payloads pass
    * through unchanged. */
  def resampleAudio(media: Dataset[MediaRow], newRate: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      if (!WavCodec.isWav(m.payload)) m
      else WavCodec.decode(m.payload) match {
        // frames > 0 for the same empty-data-chunk reason as resize;
        // rate > 0 is already guaranteed by decode's format check
        case Some((rate, channels, frames, samples)) if frames > 0 =>
          val dstFrames = math.max(1, (frames.toLong * newRate / rate).toInt)
          m.copy(
            payload = WavCodec.encode(newRate, channels,
              WavCodec.resampleNearest(samples, channels, frames, dstFrames)),
            meta = m.meta.copy(nFrames = dstFrames, sampleRate = newRate))
        case _ => m
      }
    })
  }

  /** STUB frame-sample: keep every k-th frame of a video payload. */
  def frameSample(media: Dataset[MediaRow], everyK: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      StubCodec.decode(m.payload) match {
        case Some((w, h, f, body)) if m.kind == "video" && f > 1 =>
          val frameLen = if (f == 0) 0 else body.length / f
          val kept = (0 until f by everyK)
          val newBody = kept.flatMap(i => body.slice(i * frameLen, (i + 1) * frameLen)).toArray
          m.copy(payload = StubCodec.encode(w, h, kept.length, newBody),
            meta = m.meta.copy(nFrames = kept.length))
        case _ => m
      }
    })
  }

  /** Where per-media decoded features are staged for the DuckDB
    * oracle — same lifecycle contract as SdfQueries.StagePath
    * (process-unique; must outlive this JVM for the driver's
    * post-exit oracle run; that file's creation-time GC already
    * bounds accumulation for both stage roots). */
  val FeatureStagePath: String =
    graft.sources.SdfQueries.StagePath.stripSuffix("records.parquet") + "media_features.parquet"

  private val MediaCount = 500

  // stage once per process: the features are a pure function of the
  // deterministic synthetic corpus (fixed MediaCount), so repeat
  // timed runs must not re-pay the decode+write (VERDICT r7 item 1)
  private val stagedFeatures = new graft.StagedVersion[Int]

  private def stageFeatures(spark: SparkSession): Unit =
    stagedFeatures(MediaCount) {
      decodeFeatures(syntheticMedia(spark, MediaCount))
        .write.mode("overwrite").parquet(FeatureStagePath)
    }

  /** Driver entry: synthesize → decode → aggregate per kind. The
    * per-media features (the decode itself — PNG via javax.imageio,
    * WAV via javax.sound.sampled — which DuckDB cannot replicate)
    * are staged to parquet ONCE per process, and the oracle
    * re-aggregates them with DuckDB's own count/sum/avg — a
    * cross-engine check of the aggregation semantics on top of the
    * spec-pinned bit-exact decodes. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    stageFeatures(spark)
    // avg() over doubles sums in partition order — a last-ulp flake
    // channel vs DuckDB's serial sum that round(_, 6) only
    // probabilistically absorbs. Both engines instead compute
    // round(exact-decimal-sum / non-null-count, 6): the decimal sum
    // is order-independent, the double division and final round are
    // single deterministic steps — same avg semantics (count excludes
    // nulls), bit-identical cross-engine.
    def exactAvg(c: Column): Column =
      round(graft.Exact.dsum(c) / count(c), 6)
    decodeFeatures(syntheticMedia(spark, MediaCount))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_samples")).as("total_samples"),
        exactAvg(col("mean_byte")).as("avg_mean_byte"),
        exactAvg(element_at(col("channel_rms"), 1)).as("avg_rms_c0"))
      .orderBy(col("kind"))
  }

  private lazy val mediaFeaturesSql: String = {
    import graft.Exact.sql.sdsum
    s"""SELECT kind, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  CAST(sum(n_samples) AS BIGINT) AS total_samples,
       |  round(${sdsum("mean_byte")} / count(mean_byte), 6) AS avg_mean_byte,
       |  round(${sdsum("channel_rms[1]")} / count(channel_rms[1]), 6) AS avg_rms_c0
       |FROM read_parquet('$FeatureStagePath/*.parquet')
       |GROUP BY kind ORDER BY kind""".stripMargin
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("multimodal_features", Some(mediaFeaturesSql), mediaFeatures))
}
