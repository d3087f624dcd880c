package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Codec, Multimodal}
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** Multimodal binary-column plumbing: schema contract, REAL video
  * decode (MCV8 motion-compensated streams), frame sampling,
  * mapPartitions batch shape, feature output feeding similarity
  * search, and the loud-reject contract on undecodable payloads. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def mkMedia(id: Long, kind: String, bytes: Array[Byte], durMs: Long) =
    MediaRow(id, MediaMeta(kind, 640, 480, 16000, durMs), bytes)

  /** A real MCV8 AVI: `n` 16x16 frames of a scene translating 1 px/frame. */
  private def mkVideo(id: Long, n: Int): MediaRow = {
    val frames = (0 until n).map(f => Array.tabulate(16, 16)((r, c) =>
      ((id * 5 + r * 31 + (c + f) * 17) % 256).toInt))
    MediaRow(id, MediaMeta("video", 16, 16, 0, n * 1000L),
      Codec.encodeAviMcv(frames, fps = 2, keyframeInterval = 4))
  }

  test("media schema contract matches the declared StructType") {
    val ds = Seq(mkMedia(1, "image", Array[Byte](1, 2, 3), 0)).toDS()
    assert(ds.toDF().schema == Multimodal.mediaSchema)
  }

  test("frame sampling: stride + cap") {
    assert(Multimodal.sampleFrameIndices(10, 2, 8) == Seq(0, 2, 4, 6, 8))
    assert(Multimodal.sampleFrameIndices(100, 2, 4) == Seq(0, 2, 4, 6))
    assert(Multimodal.sampleFrameIndices(1, 2, 8) == Seq(0))
  }

  test("decodeVideoAndEmbed: one row per sampled frame, 16-dim embeddings in [0,1]") {
    val media = Seq(mkVideo(1, 10), mkVideo(2, 1), mkVideo(3, 3))
      .toDS().repartition(3)
    val feats = Multimodal.decodeVideoAndEmbed(media, stride = 2, maxFrames = 4).collect()
    assert(feats.count(_.media_id == 1) == 4) // 10 frames → 0,2,4,6
    assert(feats.count(_.media_id == 2) == 1)
    assert(feats.count(_.media_id == 3) == 2) // 0,2
    feats.foreach { f =>
      assert(f.embedding.length == 16)
      assert(f.embedding.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("decodeVideoAndEmbed is partitioning-invariant (deterministic at scale)") {
    val rows = (1L to 20L).map(i => mkVideo(i, 1 + (i % 6).toInt))
    val one = Multimodal.decodeVideoAndEmbed(rows.toDS().repartition(1))
      .collect().map(f => (f.media_id, f.frame_idx, f.embedding.toSeq)).toSet
    val many = Multimodal.decodeVideoAndEmbed(rows.toDS().repartition(7))
      .collect().map(f => (f.media_id, f.frame_idx, f.embedding.toSeq)).toSet
    assert(one == many)
  }

  test("decodeVideoAndEmbed routes MIXED codecs in one corpus: DIB, MJPEG, RLE8, MCV8") {
    // one dataset, four container codecs — biCompression routing means
    // a mixed-codec corpus needs no per-format partitioning
    def frames(id: Long, n: Int) = (0 until n).map(f =>
      Array.tabulate(16, 16)((r, c) => ((id * 3 + f * 11 + r * 5 + c) % 256).toInt))
    val media = Seq(
      MediaRow(1L, MediaMeta("video", 16, 16, 0, 4000),
        Codec.encodeAvi(frames(1, 4), fps = 2)),                       // DIB
      MediaRow(2L, MediaMeta("video", 16, 16, 0, 4000),
        Codec.encodeAvi(frames(2, 4), fps = 2, mjpeg = true)),         // MJPEG
      MediaRow(3L, MediaMeta("video", 16, 16, 0, 4000),
        Codec.encodeAviRle8(frames(3, 4), fps = 2, keyframeInterval = 2)), // RLE8
      MediaRow(4L, MediaMeta("video", 16, 16, 0, 4000),
        Codec.encodeAviMcv(frames(4, 4), fps = 2, keyframeInterval = 2))   // MCV8
    ).toDS().repartition(2)
    val feats = Multimodal.decodeVideoAndEmbed(media, stride = 2, maxFrames = 4).collect()
    assert(feats.map(_.media_id).groupBy(identity).view.mapValues(_.length).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2)) // frames 0, 2 each
    // the three LOSSLESS codecs of the same content agree feature-exactly
    // (1 vs 3 vs 4 differ only by id in the formula — compare per-id
    // against a direct encode-free embed instead)
    for (m <- Seq(1L, 3L, 4L); (fi, want) <- Seq(0, 2).map(f =>
        f -> Multimodal.embedFrame(Multimodal.resizeFrame(frames(m, 4)(f), 8, 8)))) {
      val got = feats.find(x => x.media_id == m && x.frame_idx == fi).get.embedding
      assert(got.toSeq == want.toSeq, s"media $m frame $fi diverged")
    }
  }

  test("undecodable payloads fail LOUDLY — no fake decode path remains") {
    // the q34 stand-in corpus (text bytes) is NOT decodable media: the
    // decode operators must throw, not fabricate features
    val fake = Seq(mkMedia(1, "video", "not an avi at all".getBytes, 1000)).toDS()
    val err = intercept[org.apache.spark.SparkException](
      Multimodal.decodeVideoAndEmbed(fake).collect())
    assert(err.getMessage != null)
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
