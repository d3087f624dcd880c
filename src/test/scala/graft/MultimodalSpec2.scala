package graft

import graft.multimodal.Multimodal

/** Resize + audio-window kernels (round-2 additions). */
class MultimodalSpec2 extends SparkTestBase {

  test("resizeFrame: nearest-neighbor downscale and upscale index mapping") {
    val grid = Array.tabulate(8, 8)((r, c) => r * 8 + c)
    val down = Multimodal.resizeFrame(grid, 4, 4)
    // 4x4 from 8x8: output (r,c) samples input (r*2, c*2)
    assert(down(0)(0) == 0 && down(0)(1) == 2 && down(1)(0) == 16 && down(3)(3) == 54)
    val up = Multimodal.resizeFrame(grid, 16, 16)
    assert(up.length == 16 && up(0).length == 16)
    assert(up(15)(15) == grid(7)(7) && up(1)(1) == grid(0)(0))
  }

  test("q35's round(x*1020) inverts the float embedding back to exact integer pool sums") {
    // embedding value = pool_sum/4f/255f with pool_sum an integer in
    // [0, 1020]; the battery oracle depends on round(x*1020) recovering
    // pool_sum EXACTLY for every representable float on that path
    (0 to 1020).foreach { s =>
      val x: Float = s / 4.0f / 255.0f
      assert(math.round(x.toDouble * 1020d) == s, s"pool sum $s not recovered")
    }
  }

  test("q35 battery output matches a driver-side closed-form replay (sf0.001)") {
    // the battery path runs encode(MCV8) → GOP seek decode → resize →
    // pool → float → integer recovery; this replay computes the same
    // sums straight from the translation formula, touching NO codec —
    // so it catches a codec/seek/resize/pool bug from the other side
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = graft.analytics.Battery.q35.run(spark, dir)
      .select("media_id", "n_frames", "sum_sq_pool")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val want = ids.map { id =>
      val dx0 = (1 + id % 3).toInt; val dy0 = (id % 2).toInt
      val total = (1 + id % 7).toInt
      def px(f: Int, r: Int, c: Int) =
        ((id * 11 + (r + f * dy0).toLong * 31 + (c + f * dx0).toLong * 17) % 256).toInt
      val frames = Multimodal.sampleFrameIndices(total, 2, 4)
      val ssq = frames.map { fi =>
        (0 until 4).flatMap(pr => (0 until 4).map { pc =>
          val s = px(fi, 4 * pr, 4 * pc) + px(fi, 4 * pr, 4 * pc + 2) +
            px(fi, 4 * pr + 2, 4 * pc) + px(fi, 4 * pr + 2, 4 * pc + 2)
          s.toLong * s
        }).sum
      }.sum
      id -> ((frames.size.toLong, ssq))
    }.toMap
    assert(got == want)
  }

  test("audioWindowIndices: full windows only, hop spacing, empty when too short") {
    // 1 second at 16 kHz: 16000 samples; 25ms window = 400, 10ms hop = 160
    val w = Multimodal.audioWindowIndices(1000L, 16000, 25, 10)
    assert(w.head == (0L, 400L))
    assert(w(1) == (160L, 560L))
    assert(w.last._2 <= 16000L)
    assert(w.length == (16000 - 400) / 160 + 1)
    assert(Multimodal.audioWindowIndices(10L, 16000, 25, 10).isEmpty)
  }

  test("decodeImageAndEmbed: real PNG/JPEG payloads through decode → resize → embed") {
    import graft.multimodal.{Codec, Multimodal}
    import Multimodal.{MediaMeta, MediaRow}
    import spark.implicits._
    val g1 = Array.tabulate(16, 16)((r, c) => (r * 13 + c * 7) % 256)
    val g2 = Array.tabulate(9, 30)((r, c) => math.min(255, 4 * r + 3 * c)) // smooth: JPEG-friendly
    val rows = Seq(
      MediaRow(1L, MediaMeta("image", 16, 16, 0, 0L), Codec.encodePng(g1)),
      MediaRow(2L, MediaMeta("image", 30, 9, 0, 0L), Codec.encodeJpeg(g2, 0.95f)))
    val out = Multimodal.decodeImageAndEmbed(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width == 16 && out(1L).height == 16)
    assert(out(2L).width == 30 && out(2L).height == 9)
    // PNG is lossless — the distributed pipeline must EXACTLY equal the
    // local decode → resize → embed composition
    val want1 = Multimodal.embedFrame(Multimodal.resizeFrame(g1, 8, 8))
    assert(out(1L).embedding.sameElements(want1))
    // JPEG is lossy — close on smooth content, never exact-by-accident
    val want2 = Multimodal.embedFrame(Multimodal.resizeFrame(g2, 8, 8))
    val maxErr = out(2L).embedding.zip(want2).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 0.05, s"jpeg-path embedding drifted too far: $maxErr")
    // undecodable payloads fail loudly (silently skipped media = lost coverage)
    intercept[Exception] {
      Multimodal.decodeImageAndEmbed(spark.createDataset(Seq(
        MediaRow(3L, MediaMeta("image", 0, 0, 0, 0L), Array[Byte](1, 2, 3))))).collect()
    }
  }

  test("decodeVideoAndEmbed: real AVI payloads (DIB and MJPEG) through demux → sample → embed") {
    import graft.multimodal.{Codec, Multimodal}
    import Multimodal.{MediaMeta, MediaRow}
    import spark.implicits._
    // 5 frames, stride 2, maxFrames 2 → sampled indices 0 and 2 only
    def frame(f: Int): Array[Array[Int]] =
      Array.tabulate(12, 10)((r, c) => (f * 37 + r * 11 + c * 3) % 256)
    def smooth(f: Int): Array[Array[Int]] =
      Array.tabulate(24, 32)((r, c) => math.min(255, 4 * r + 3 * c + f * 4))
    val dib = Codec.encodeAvi(Seq.tabulate(5)(frame), fps = 4)
    val mjpg = Codec.encodeAvi(Seq.tabulate(3)(smooth), fps = 8, mjpeg = true)
    // inter-frame codec in the same corpus: GOP of 2 → sampled frame 2
    // is a keyframe, but its GOP semantics still route through the seek path
    val rle = Codec.encodeAviRle8(Seq.tabulate(4)(frame), fps = 2, keyframeInterval = 2)
    val rows = Seq(
      MediaRow(1L, MediaMeta("video", 10, 12, 0, 1250L), dib),
      MediaRow(2L, MediaMeta("video", 32, 24, 0, 375L), mjpg),
      MediaRow(3L, MediaMeta("video", 10, 12, 0, 2000L), rle))
    val out = Multimodal.decodeVideoAndEmbed(
        spark.createDataset(rows), stride = 2, maxFrames = 2)
      .collect().groupBy(_.media_id)
    // sampled frame indices come from the REAL stream length, per payload
    assert(out(1L).map(_.frame_idx).sorted.sameElements(Array(0, 2)))
    assert(out(2L).map(_.frame_idx).sorted.sameElements(Array(0, 2)))
    assert(out(1L).forall(f => f.width == 10 && f.height == 12))
    // DIB is lossless — the distributed pipeline must EXACTLY equal the
    // local decode → resize → embed composition, per sampled frame
    out(1L).foreach { f =>
      val want = Multimodal.embedFrame(
        Multimodal.resizeFrame(frame(f.frame_idx), 8, 8))
      assert(f.embedding.sameElements(want), s"frame ${f.frame_idx} drifted")
    }
    // MJPEG is lossy — close on smooth content
    out(2L).foreach { f =>
      val want = Multimodal.embedFrame(
        Multimodal.resizeFrame(smooth(f.frame_idx), 8, 8))
      val maxErr = f.embedding.zip(want).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr < 0.05, s"mjpeg frame ${f.frame_idx} drifted too far: $maxErr")
    }
    // RLE8 is lossless — exact through the GOP seek path
    assert(out(3L).map(_.frame_idx).sorted.sameElements(Array(0, 2)))
    out(3L).foreach { f =>
      val want = Multimodal.embedFrame(
        Multimodal.resizeFrame(frame(f.frame_idx), 8, 8))
      assert(f.embedding.sameElements(want), s"rle8 frame ${f.frame_idx} drifted")
    }
    // non-AVI payloads fail loudly
    intercept[Exception] {
      Multimodal.decodeVideoAndEmbed(spark.createDataset(Seq(
        MediaRow(3L, MediaMeta("video", 0, 0, 0, 0L), Array[Byte](9, 9, 9))))).collect()
    }
  }

  test("decodeAudioAndFeature: mixed-codec WAV corpus through route → decode → window") {
    import graft.multimodal.{Codec, Multimodal}
    import Multimodal.{MediaMeta, MediaRow}
    import spark.implicits._
    // one signal, three carried codecs — the router must dispatch each
    val samples = Array.tabulate(100)(i => (((i * 997) % 20001) - 10000).toShort)
    val rows = Seq(
      MediaRow(1L, MediaMeta("audio", 0, 0, 8000, 0L),
        Codec.encodeWavPcm16(samples, 8000)),
      MediaRow(2L, MediaMeta("audio", 0, 0, 8000, 0L),
        Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36)),
      MediaRow(3L, MediaMeta("audio", 0, 0, 8000, 0L),
        Codec.encodeWavG711(samples, 8000, aLaw = false)))
    // window 5 ms @ 8 kHz = 40 samples, hop 4 ms = 32 → starts 0, 32, 64(+40>100? 64+40=104 drop) → windows at 0 and 32
    val out = Multimodal.decodeAudioAndFeature(
        spark.createDataset(rows), windowMs = 5, hopMs = 4)
      .collect().groupBy(_.media_id)
    assert(out.keySet == Set(1L, 2L, 3L))
    for ((id, feats) <- out) {
      assert(feats.map(_.start_sample).sorted.sameElements(Array(0L, 32L)),
        s"media $id window schedule wrong: ${feats.map(_.start_sample).toSeq}")
      assert(feats.forall(_.n_samples == 40))
      // energies must EXACTLY equal the local decode → sum-of-squares
      val (_, dec) = Codec.decodeWavAuto(rows.find(_.media_id == id).get.payload)
      feats.foreach { f =>
        val want = (f.start_sample until f.start_sample + 40)
          .map(i => dec(i.toInt).toLong).map(v => v * v).sum
        assert(f.energy == want, s"media $id window ${f.window_idx} energy drifted")
      }
    }
    // PCM16 is lossless: its energies are the raw signal's, exactly
    val raw = (0 until 40).map(i => samples(i).toLong).map(v => v * v).sum
    assert(out(1L).find(_.window_idx == 0).get.energy == raw)
    // non-WAV payloads fail loudly
    intercept[Exception] {
      Multimodal.decodeAudioAndFeature(spark.createDataset(Seq(
        MediaRow(4L, MediaMeta("audio", 0, 0, 0, 0L), Array[Byte](7, 7)))),
        5, 4).collect()
    }
  }

  test("blockhashGrid: hand-computed bits, tie determinism, brightness invariance") {
    // 16x16 blocks of 2x2 over a 32x32 grid where the top half is
    // brighter: block sums are 4*200 above vs 4*10 below; lower median
    // (rank 128 of 256) is the bottom value -> exactly the top 128
    // bits set (longs 0 and 1 all-ones, 2 and 3 zero)
    val split = Array.tabulate(32, 32)((r, _) => if (r < 16) 200 else 10)
    assert(Multimodal.blockhashGrid(split).toSeq == Seq(-1L, -1L, 0L, 0L))
    // uniform image: all sums equal, strict-above median -> all zero
    val flat = Array.tabulate(32, 32)((_, _) => 42)
    assert(Multimodal.blockhashGrid(flat).toSeq == Seq(0L, 0L, 0L, 0L))
    // global brightness shift (no wrap) leaves the hash unchanged —
    // the invariance block-mean hashing is built for
    val base = Array.tabulate(32, 32)((r, c) => (r * 5 + c * 3) % 200)
    val brighter = base.map(_.map(_ + 50))
    assert(Multimodal.blockhashGrid(base).toSeq ==
      Multimodal.blockhashGrid(brighter).toSeq)
  }

  test("blockhashGrid: non-native sizes go through the nearest-neighbor resize") {
    val base = Array.tabulate(32, 32)((r, c) => (r * 7 + c * 13) % 256)
    // exact 2x nearest-neighbor upscale resizes back to the identical
    // 32x32 grid, so the hash must be bit-identical
    val up = Array.tabulate(64, 64)((r, c) => base(r / 2)(c / 2))
    assert(Multimodal.blockhashGrid(up).toSeq == Multimodal.blockhashGrid(base).toSeq)
  }

  test("blockhashNearDupPairs: a one-pixel edit is found; pigeonhole holds at distance <= 3") {
    import spark.implicits._
    import graft.multimodal.Codec
    import Multimodal.{MediaMeta, MediaRow}
    def img(seed: Long, edit: Boolean) = Array.tabulate(32, 32) { (r, c) =>
      val v = ((seed * 11 + (seed % 7 + 1) * r * c + r * 17 + c * 23) % 256).toInt
      if (edit && r == 0 && c == 0) (v + 128) % 256 else v
    }
    val media = spark.createDataset(Seq(
      MediaRow(1L, MediaMeta("image", 32, 32, 0, 0L), Codec.encodeBmp24(img(1, edit = false))),
      MediaRow(2L, MediaMeta("image", 32, 32, 0, 0L), Codec.encodeBmp24(img(1, edit = true))),
      MediaRow(3L, MediaMeta("image", 32, 32, 0, 0L), Codec.encodeBmp24(img(900, edit = false)))))
    val hashes = Multimodal.imageBlockhash(media)
    val pairs = Multimodal.blockhashNearDupPairs(hashes, maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"one-pixel edit not recalled: $pairs")
    // the edited pair's distance is small; verify the pigeonhole
    // premise directly on the hashes (<= 3 differing bits -> at least
    // one of the 4 bands identical)
    val h = hashes.as[(Long, Seq[Long])].collect().toMap
    val d = h(1L).zip(h(2L)).map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
    if (d <= 3)
      assert(h(1L).zip(h(2L)).exists { case (a, b) => a == b })
  }
}
