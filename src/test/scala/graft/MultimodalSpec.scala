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
      Seq("media_id", "kind", "width", "height", "n_frames", "n_bytes", "mean_byte"))
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
      val dec = StubCodec.decode(m.payload)
      assert(dec.exists { case (w, h, _, _) => w == 4 && h == 4 })
    }
    val sampled = Multimodal.frameSample(media, 2).collect()
    sampled.filter(_.kind == "video").foreach { m =>
      assert(m.meta.nFrames == 4) // 8 frames sampled every 2nd
      assert(StubCodec.decode(m.payload).exists(_._3 == 4))
    }
    sampled.filter(_.kind != "video").foreach(m => assert(m.meta.nFrames == 1))
  }

  test("synthetic generation is deterministic") {
    val a = Multimodal.syntheticMedia(spark, 50).collect().map(m => (m.media_id, m.payload.toSeq))
    val b = Multimodal.syntheticMedia(spark, 50, partitions = 3).collect().map(m => (m.media_id, m.payload.toSeq))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }
}
