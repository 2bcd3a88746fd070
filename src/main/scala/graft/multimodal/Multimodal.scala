package graft.multimodal

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2C13): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is REAL and tested: schema (binary +
  * struct metadata), partition-parallel `mapPartitions` batch
  * iteration (one codec context per partition, no per-row setup),
  * deterministic repartitioning for balanced decode. The byte-level
  * codec is a clearly-marked STUB — this environment has no image/
  * audio libraries, so payloads use a deterministic synthetic format
  * ("GRAFTMM1" header + dimensions + raw bytes) and "decoding" is
  * parsing that header. Swapping in a real codec changes only
  * [[StubCodec]]; every operator signature, schema and partition
  * property stays.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nFrames: Int, sampleRate: Int)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                                 n_frames: Int, n_bytes: Long, mean_byte: Double)

  /** STUB CODEC — deterministic fake standing in for jpeg/wav/mp4
    * decoding. Real libraries are absent in this environment; the
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

    /** Deterministic synthetic media row (seeded by id). */
    def synthetic(id: Long): MediaRow = {
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (id % 8).toInt; val h = 16 + (id % 5).toInt
      val frames = if (kind == "video") 8 else 1
      val body = Array.tabulate((w * h * frames).min(4096))(i => ((id * 31 + i * 7) % 256).toByte)
      MediaRow(id, kind, encode(w, h, frames, body),
        MediaMeta(w, h, frames, if (kind == "audio") 16000 else 0))
    }
  }

  /** Deterministic synthetic media table (the driver testdata has no
    * media column; payload generation is part of the stub). */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(r => StubCodec.synthetic(r))
  }

  /** Decode + feature-extract, one codec pass per PARTITION — the
    * shape a real decoder needs (model/codec init once per batch,
    * then streamed rows; the Scala twin of a pandas-batch UDF). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec context (stub: a counter proving batch init)
      it.flatMap { m =>
        StubCodec.decode(m.payload).map { case (w, h, f, body) =>
          val mean = if (body.isEmpty) 0.0
            else body.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / body.length
          MediaFeatures(m.media_id, m.kind, w, h, f, m.payload.length.toLong, mean)
        }
      }
    }
  }

  /** STUB resize: re-encodes with new dimensions, subsampling the
    * body deterministically (a real impl would interpolate pixels). */
  def resize(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      StubCodec.decode(m.payload) match {
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

  /** Driver entry: synthesize → decode → aggregate per kind. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    decodeFeatures(syntheticMedia(spark, 500))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 6).as("avg_mean_byte"))
      .orderBy(col("kind"))
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery("multimodal_features", None, mediaFeatures))
}
