package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.StubCodec
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
    val good = Multimodal.syntheticMedia(spark, 20, partitions = 4)
    val corrupt = Seq(Multimodal.MediaRow(999L, "image", "garbage".getBytes,
      Multimodal.MediaMeta(0, 0, 0, 0))).toDS()
    val out = Multimodal.decodeFeatures(good.union(corrupt))
    assert(out.columns.toSeq ==
      Seq("media_id", "kind", "width", "height", "channels", "n_frames", "n_bytes", "mean_byte", "channel_means"))
    val rows = out.collect()
    assert(rows.length == 20) // corrupt row dropped, not crashed
    assert(rows.forall(_.mean_byte >= 0))
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
      if (m.kind == "image")
        assert(Multimodal.PngCodec.decode(m.payload).exists { case (w, h, _, _) => w == 4 && h == 4 })
      else
        assert(StubCodec.decode(m.payload).exists { case (w, h, _, _) => w == 4 && h == 4 })
    }
    val sampled = Multimodal.frameSample(media, 2).collect()
    sampled.filter(_.kind == "video").foreach { m =>
      assert(m.meta.nFrames == 4) // 8 frames sampled every 2nd
      assert(StubCodec.decode(m.payload).exists(_._3 == 4))
    }
    sampled.filter(_.kind != "video").foreach(m => assert(m.meta.nFrames == 1))
  }

  test("PNG decode is real: exact dimensions, channels, per-channel means from the raster") {
    import Multimodal.PngCodec
    val id = 42L
    val (w, h) = (20, 15)
    val img = PngCodec.syntheticImage(id, w, h)
    val png = PngCodec.encode(img)
    assert(PngCodec.isPng(png) && !PngCodec.isPng("GRAFTMM1????".getBytes))
    val Some((dw, dh, bands, means)) = PngCodec.decode(png)
    assert(dw == w && dh == h && bands == 3)
    // PNG is lossless, so the decoded per-channel means must equal
    // the means computed straight off the source pixel function —
    // bit-exact, not approximate
    val expected = (0 until 3).map { c =>
      val s = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13 + c * 41) % 256).sum
      s.toDouble / (w * h)
    }
    assert(means.toSeq == expected, s"decoded means $means != raster means $expected")
    // decode rejects non-image bytes instead of crashing
    assert(PngCodec.decode(Array.fill[Byte](64)(0x11)).isEmpty)
  }

  test("image resize is exact nearest-neighbor: dst(x,y,c) == src(floor(x*sw/dw), floor(y*sh/dh), c)") {
    import Multimodal.PngCodec
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

  test("synthetic generation is deterministic") {
    val a = Multimodal.syntheticMedia(spark, 50).collect().map(m => (m.media_id, m.payload.toSeq))
    val b = Multimodal.syntheticMedia(spark, 50, partitions = 3).collect().map(m => (m.media_id, m.payload.toSeq))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }
}
