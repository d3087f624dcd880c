package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DecodeStub, MediaMeta, MediaRow}

/** Multimodal binary-column plumbing: schema contract, deterministic
  * stub decode, frame sampling, mapPartitions batch shape, feature
  * output feeding similarity search. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def mkMedia(id: Long, kind: String, bytes: Array[Byte], durMs: Long) =
    MediaRow(id, MediaMeta(kind, 640, 480, 16000, durMs), bytes)

  test("media schema contract matches the declared StructType") {
    val ds = Seq(mkMedia(1, "image", Array[Byte](1, 2, 3), 0)).toDS()
    assert(ds.toDF().schema == Multimodal.mediaSchema)
  }

  test("DecodeStub is deterministic and payload-sensitive") {
    val a1 = DecodeStub.decodeFrame(Array[Byte](1, 2, 3), 0)
    val a2 = DecodeStub.decodeFrame(Array[Byte](1, 2, 3), 0)
    val b = DecodeStub.decodeFrame(Array[Byte](9, 9, 9), 0)
    val f1 = DecodeStub.decodeFrame(Array[Byte](1, 2, 3), 1)
    assert(a1.map(_.toSeq).toSeq == a2.map(_.toSeq).toSeq)
    assert(a1.map(_.toSeq).toSeq != b.map(_.toSeq).toSeq)
    assert(a1.map(_.toSeq).toSeq != f1.map(_.toSeq).toSeq) // frame idx matters
    assert(a1.length == 8 && a1.forall(r => r.length == 8 && r.forall(v => v >= 0 && v <= 255)))
  }

  test("frame sampling: stride + cap") {
    assert(Multimodal.sampleFrameIndices(10, 2, 8) == Seq(0, 2, 4, 6, 8))
    assert(Multimodal.sampleFrameIndices(100, 2, 4) == Seq(0, 2, 4, 6))
    assert(Multimodal.sampleFrameIndices(1, 2, 8) == Seq(0))
  }

  test("frameCount: videos get duration-derived frames, stills get 1") {
    assert(DecodeStub.frameCount(MediaMeta("video", 0, 0, 0, 5000)) == 5)
    assert(DecodeStub.frameCount(MediaMeta("video", 0, 0, 0, 100)) == 1)
    assert(DecodeStub.frameCount(MediaMeta("image", 0, 0, 0, 5000)) == 1)
    assert(DecodeStub.frameCount(MediaMeta("audio", 0, 0, 0, 5000)) == 1)
  }

  test("decodeAndEmbed: one row per sampled frame, 16-dim embeddings in [0,1]") {
    val media = Seq(
      mkMedia(1, "video", "payload-one".getBytes, 10000), // 10 frames → stride 2, cap 4 → 4
      mkMedia(2, "image", "payload-two".getBytes, 10000), // 1 frame
      mkMedia(3, "audio", "payload-three".getBytes, 500)) // 1 frame
      .toDS().repartition(3)
    val feats = Multimodal.decodeAndEmbed(media, stride = 2, maxFrames = 4).collect()
    assert(feats.count(_.media_id == 1) == 4)
    assert(feats.count(_.media_id == 2) == 1)
    assert(feats.count(_.media_id == 3) == 1)
    feats.foreach { f =>
      assert(f.embedding.length == 16)
      assert(f.embedding.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("decodeAndEmbed is partitioning-invariant (deterministic at scale)") {
    val rows = (1L to 20L).map(i => mkMedia(i, "video", s"payload-$i".getBytes, 6000))
    val one = Multimodal.decodeAndEmbed(rows.toDS().repartition(1))
      .collect().map(f => (f.media_id, f.frame_idx, f.embedding.toSeq)).toSet
    val many = Multimodal.decodeAndEmbed(rows.toDS().repartition(7))
      .collect().map(f => (f.media_id, f.frame_idx, f.embedding.toSeq)).toSet
    assert(one == many)
  }

  test("payloadStats uses only built-ins (no UDF) and is exact") {
    val media = Seq(mkMedia(1, "image", Array[Byte](1, 2, 3, 4), 0)).toDS()
    val row = Multimodal.payloadStats(media.toDF()).collect()(0)
    assert(row.getAs[Int]("n_bytes") == 4)
    assert(row.getAs[String]("content_md5").length == 32)
  }

  test("mediaFromDocuments round-trips through the battery q34 shape") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    assert(media.count() == docs.count())
    val kinds = media.toDF().select(countDistinct(col("meta.kind"))).collect()(0).getLong(0)
    assert(kinds == 3)
  }
}
