package graft.multimodal

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2C13): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The IMAGE path is real: payloads are genuine PNG files, decoded
  * with `javax.imageio` (pure JVM, no native libs) into width /
  * height / channel count / per-channel means, and resized with an
  * exact nearest-neighbor kernel then re-encoded as PNG. Audio and
  * video payloads remain a clearly-marked STUB ("GRAFTMM1" header +
  * dimensions + raw bytes) — the JVM ships no public audio/video
  * codec, so those kinds exercise the plumbing (schema, partition-
  * parallel batch iteration, corrupt-row handling) on a
  * deterministic synthetic format. Dispatch is by payload magic
  * bytes, not by the `kind` column, so a mislabeled or corrupt row
  * degrades the same way a real pipeline's would.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nFrames: Int, sampleRate: Int)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                                 channels: Int, n_frames: Int, n_bytes: Long,
                                 mean_byte: Double, channel_means: Seq[Double])

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

    /** Real decode: (width, height, bands, per-band mean of the
      * 0-255 samples), or None for bytes ImageIO cannot parse. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
      decodeImage(payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val bands = raster.getNumBands
        val sums = new Array[Long](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < bands) { sums(c) += raster.getSample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        (w, h, bands, sums.map(_.toDouble / (w.toLong * h)))
      }

    def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

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

  /** STUB CODEC — deterministic fake standing in for wav/mp4
    * decoding (audio and video only; images are real PNG via
    * [[PngCodec]]). The JVM has no public audio/video codec; the
    * format is: 8-byte magic "GRAFTMM1", then width/height/nFrames
    * as big-endian int32, then the raw payload bytes. */
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
      * a REAL PNG payload; audio/video keep the stub format. */
    def synthetic(id: Long): MediaRow = {
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (id % 8).toInt; val h = 16 + (id % 5).toInt
      if (kind == "image")
        MediaRow(id, kind, PngCodec.encode(PngCodec.syntheticImage(id, w, h)),
          MediaMeta(w, h, 1, 0))
      else {
        val frames = if (kind == "video") 8 else 1
        val body = Array.tabulate((w * h * frames).min(4096))(i => ((id * 31 + i * 7) % 256).toByte)
        MediaRow(id, kind, encode(w, h, frames, body),
          MediaMeta(w, h, frames, if (kind == "audio") 16000 else 0))
      }
    }
  }

  /** Deterministic synthetic media table (the driver testdata has no
    * media column; payload generation is part of the stub). */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(r => StubCodec.synthetic(r))
  }

  /** Decode + feature-extract, one codec pass per PARTITION — the
    * shape a real decoder needs (codec init once per batch, then
    * streamed rows; the Scala twin of a pandas-batch UDF). PNG
    * payloads take the real `javax.imageio` path; stub-format
    * payloads parse the GRAFTMM1 header; anything else (corrupt) is
    * dropped, never crashed on. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        if (PngCodec.isPng(m.payload))
          PngCodec.decode(m.payload).map { case (w, h, bands, means) =>
            MediaFeatures(m.media_id, m.kind, w, h, bands, 1, m.payload.length.toLong,
              means.sum / bands, means.toSeq)
          }
        else StubCodec.decode(m.payload).map { case (w, h, f, body) =>
          val mean = if (body.isEmpty) 0.0
            else body.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / body.length
          MediaFeatures(m.media_id, m.kind, w, h, 1, f, m.payload.length.toLong,
            mean, Seq(mean))
        }
      }
    }
  }

  /** Resize. Images: REAL nearest-neighbor resample via [[PngCodec]]
    * (decode → exact kernel → PNG re-encode). Stub-format payloads:
    * deterministic body subsample (a real audio/video impl would
    * interpolate). Corrupt payloads pass through unchanged. */
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

  /** Driver entry: synthesize → decode → aggregate per kind. The
    * per-media features (the decode itself — PNG via javax.imageio
    * for images, which DuckDB cannot replicate) are staged to
    * parquet, and the oracle re-aggregates them with DuckDB's own
    * count/sum/avg — a cross-engine check of the aggregation
    * semantics on top of the spec-pinned bit-exact decode. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(syntheticMedia(spark, 500))
    feats.write.mode("overwrite").parquet(FeatureStagePath)
    feats
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 6).as("avg_mean_byte"))
      .orderBy(col("kind"))
  }

  private lazy val mediaFeaturesSql: String =
    s"""SELECT kind, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  round(avg(mean_byte), 6) AS avg_mean_byte
       |FROM read_parquet('$FeatureStagePath/*.parquet')
       |GROUP BY kind ORDER BY kind""".stripMargin

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("multimodal_features", Some(mediaFeaturesSql), mediaFeatures))
}
