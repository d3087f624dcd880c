package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (north-star extension): image/audio/video as
  * opaque `binary` payloads with typed metadata, processed by
  * per-partition batch operators.
  *
  * Decode is REAL for EVERY format this engine claims — no fake
  * remains anywhere. [[Codec]] parses genuine PCM WAV, IMA-ADPCM WAV
  * (format 0x11 — real compressed audio, battery q102), G.711
  * μ-law/A-law, and 24 bpp BMP bytes itself (battery q85/q86
  * hash-verify the decoded features cross-engine), routes
  * PNG/JPEG/GIF/TIFF through the JDK's own pure-Java ImageIO codecs
  * (battery q100 hash-verifies the lossless PNG path; CodecSpec
  * bounds the lossy JPEG path), and decodes VIDEO through the AVI
  * RIFF container reader — intra-frame (uncompressed-DIB, MJPEG;
  * battery q105), inter-frame delta (RLE8; battery q106), and
  * MOTION-COMPENSATED inter-frame ([[Codec.encodeAviMcv]]'s
  * block-matching P-frame codec; battery q146/q35 verify the decode
  * through the motion-vector chain). [[decodeVideoAndEmbed]] /
  * [[decodeImageAndEmbed]] / [[decodeAudioWindows]] are the pipeline
  * operators over those codecs: mapPartitions batch shape (decoder
  * state amortizable per partition, exactly how a JNI/FFmpeg handle
  * would be reused), real frame sampling/seek economics, and feature
  * output feeding [[graft.similarity.Similarity]] as-is. Payloads in
  * formats NOT carried fail loudly at decode — silently misreading
  * media is the one failure mode this module refuses.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(
      kind: String, // "image" | "audio" | "video"
      declaredWidth: Int,
      declaredHeight: Int,
      sampleRateHz: Int,
      durationMs: Long)

  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  /** Decoded-frame features (one row per sampled frame). */
  case class FrameFeature(
      media_id: Long, frame_idx: Int, width: Int, height: Int,
      embedding: Array[Float])

  /** Dataset[MediaRow] schema (nullability as the case-class Encoder
    * emits it: AnyRef-typed fields are nullable). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = true),
      StructField("declaredWidth", IntegerType, nullable = false),
      StructField("declaredHeight", IntegerType, nullable = false),
      StructField("sampleRateHz", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false))), nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Uniform frame sampling: every `stride`-th frame, at most
    * `maxFrames`. Pure index arithmetic — the real scheduling logic. */
  def sampleFrameIndices(total: Int, stride: Int, maxFrames: Int): Seq[Int] =
    (0 until total by stride).take(maxFrames)

  /** Nearest-neighbor resize — real index mapping over any matrix (the
    * operation a codec-backed pipeline runs between decode and encode);
    * deterministic, no interpolation-rounding ambiguity. */
  def resizeFrame(grid: Array[Array[Int]], outH: Int, outW: Int): Array[Array[Int]] = {
    val inH = grid.length
    val inW = grid(0).length
    Array.tabulate(outH, outW)((r, c) => grid(r * inH / outH)(c * inW / outW))
  }

  /** Audio windowing: (start, end) sample-index ranges for a
    * window/hop spec — the scheduling arithmetic of any STFT-style
    * feature extractor, pure integer math. Windows that would run past
    * the end are dropped (no partial windows). */
  def audioWindowIndices(
      durationMs: Long, sampleRateHz: Int, windowMs: Int, hopMs: Int): Seq[(Long, Long)] =
    audioWindowIndicesSamples(
      durationMs * sampleRateHz / 1000, sampleRateHz, windowMs, hopMs)

  /** [[audioWindowIndices]] over an exact DECODED sample count — the
    * form the real decode path uses (reconstructing a duration in ms
    * would round partial-window samples away). */
  def audioWindowIndicesSamples(
      totalSamples: Long, sampleRateHz: Int, windowMs: Int, hopMs: Int): Seq[(Long, Long)] = {
    val win = windowMs.toLong * sampleRateHz / 1000
    val hop = hopMs.toLong * sampleRateHz / 1000
    if (totalSamples < win || win <= 0 || hop <= 0) Seq.empty
    else (0L to totalSamples - win by hop).map(s => (s, s + win))
  }

  /** 8×8 "pixels" → 16-dim mean-pooled embedding (2×2 pooling over the
    * grid, quantized to float). Deterministic; the real version would
    * run a vision encoder over the decoded frame batch. */
  def embedFrame(grid: Array[Array[Int]]): Array[Float] = {
    val out = new Array[Float](16)
    var pr = 0
    while (pr < 4) {
      var pc = 0
      while (pc < 4) {
        var s = 0
        var r = pr * 2
        while (r < pr * 2 + 2) {
          var c = pc * 2
          while (c < pc * 2 + 2) { s += grid(r)(c); c += 1 }
          r += 1
        }
        out(pr * 4 + pc) = s / 4.0f / 255.0f
        pc += 1
      }
      pr += 1
    }
    out
  }

  /** Block-mean perceptual hash (the public "blockhash" / block-mean-
    * value construction, Yang et al. 2006): the grid is resized to
    * `blocks·cell` pixels, each of the blocks² cells sums its grays
    * (exact integer), the LOWER MEDIAN of the cell sums is the
    * threshold (sorted rank blocks²/2, 0-based — deterministic under
    * ties), and bit b = 1 iff cell b's sum is STRICTLY above it. Bits
    * pack row-major into blocks²/64 longs, bit index b at position
    * b mod 64 of long b/64. Everything is integer and
    * rank-deterministic, so any BIGINT engine replays the hash
    * bit-for-bit (battery q121) — unlike DCT-based pHash, whose float
    * cosines do not cross engines exactly.
    *
    * Why it earns a place next to the embedding route (q101): the
    * hash is 32 bytes per image with a HAMMING near-dup metric, so
    * image dedup runs on the simhash-style banded bucket join — no
    * training, no vector index — and survives the transforms
    * block means survive (re-encode, resize, small pixel edits). */
  def blockhashGrid(grid: Array[Array[Int]], blocks: Int = 16, cell: Int = 2): Array[Long] = {
    require(blocks >= 2 && blocks % 8 == 0, s"blocks must be a positive multiple of 8 ($blocks)")
    val g = if (grid.length == blocks * cell && grid(0).length == blocks * cell) grid
            else resizeFrame(grid, blocks * cell, blocks * cell)
    val n = blocks * blocks
    val sums = new Array[Long](n)
    var b = 0
    while (b < n) {
      val r0 = (b / blocks) * cell
      val c0 = (b % blocks) * cell
      var s = 0L
      var r = r0
      while (r < r0 + cell) {
        var c = c0
        while (c < c0 + cell) { s += g(r)(c); c += 1 }
        r += 1
      }
      sums(b) = s
      b += 1
    }
    val sorted = sums.clone()
    java.util.Arrays.sort(sorted)
    val median = sorted(n / 2 - 1) // lower median (n is even: blocks² )
    val out = new Array[Long]((n + 63) / 64)
    b = 0
    while (b < n) {
      if (sums(b) > median) out(b / 64) |= (1L << (b % 64))
      b += 1
    }
    out
  }

  /** Decode → resize → [[blockhashGrid]] as one mapPartitions pass:
    * (media_id, bh) with the hash as blocks²/64 longs. Real CPU work —
    * wrap split-starved inputs in
    * [[graft.operators.Rebalance.forCpuStage]] like the embed path. */
  def imageBlockhash(
      media: Dataset[MediaRow], blocks: Int = 16, cell: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(m => (m.media_id, blockhashGrid(Codec.decodePng(m.payload), blocks, cell)))
    }.toDF("media_id", "bh")
  }

  /** Hamming near-dup pairs over blockhash values: each of the hash's
    * longs is a band; pairs sharing ANY identical band bucket-join
    * (equi-join on (band, value) — never all-pairs) and verify the
    * full exact hamming distance ≤ `maxHamming`. With nBands = 256/64
    * = 4 bands, recall is EXACT up to distance 3 by pigeonhole — same
    * calculus as the 64-bit simhash family (q93). Emits
    * (id_a < id_b, hamming). */
  def blockhashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val banded = hashes.select(col("media_id"), col("bh"),
      posexplode(col("bh")).as(Seq("band", "bv")))
    val a = banded.as("a").hint("merge")
    val b = banded.as("b")
    val ham = zip_with(col("a.bh"), col("b.bh"),
      (x, y) => bit_count(x.bitwiseXOR(y)).cast(org.apache.spark.sql.types.LongType))
    a.join(b, col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
        && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        aggregate(ham, lit(0L), (acc, v) => acc + v).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** REAL still-image decode → resize → embed, one mapPartitions
    * pass — the ImageIO-backed member of the decode-operator family
    * for binary columns holding genuine PNG/JPEG/GIF/TIFF/BMP bytes (decode
    * dispatches on magic bytes, so mixed-format corpora just work).
    * Each image yields ONE [[FrameFeature]] (frame_idx 0): decode
    * ([[Codec.decodePng]]'s reader) → nearest-neighbor resize to 8×8
    * ([[resizeFrame]]) → 16-dim pooled embedding ([[embedFrame]]),
    * ready for [[graft.similarity.Similarity]] as-is — the full
    * image-dedup path (decode → embed → SemDeDup/screen) with no fake
    * anywhere. ImageIO decode is REAL CPU work:
    * wrap split-starved inputs in
    * [[graft.operators.Rebalance.forCpuStage]] so the decode spreads
    * across cores. Undecodable payloads fail loudly — silently skipping
    * corrupt media is how a corpus quietly loses coverage; pre-filter
    * with a try in a `flatMap` variant if best-effort is wanted. */
  /** Decoded-audio window features (one row per scheduled window).
    * `energy` is the EXACT integer sum of squared samples — mean-square
    * scaling is one division the caller applies; keeping the integer
    * sum keeps the feature oracle-checkable. */
  case class AudioWindowFeature(
      media_id: Long, window_idx: Int, start_sample: Long, n_samples: Int,
      energy: Long)

  /** REAL audio decode → window → energy, one mapPartitions pass — the
    * WAV-backed twin of [[decodeImageAndEmbed]] for binary columns
    * holding genuine RIFF/WAVE bytes of ANY carried codec
    * ([[Codec.decodeWavAuto]] routes on the format tag: PCM16,
    * IMA-ADPCM, G.711 μ-law/A-law — mixed-codec corpora just work).
    * Window scheduling runs on the exact decoded sample count
    * ([[audioWindowIndicesSamples]]); undecodable payloads fail
    * loudly, like the image twin. Wrap split-starved inputs in
    * [[graft.operators.Rebalance.forCpuStage]] — ADPCM/G.711 expansion
    * is real CPU work. */
  def decodeAudioAndFeature(
      media: Dataset[MediaRow], windowMs: Int, hopMs: Int): Dataset[AudioWindowFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val (sr, samples) = Codec.decodeWavAuto(m.payload)
        audioWindowIndicesSamples(samples.length.toLong, sr, windowMs, hopMs)
          .zipWithIndex.map { case ((s, e), wi) =>
            var acc = 0L
            var i = s.toInt
            while (i < e) { val v = samples(i).toLong; acc += v * v; i += 1 }
            AudioWindowFeature(m.media_id, wi, s, (e - s).toInt, acc)
          }
      }
    }
  }

  def decodeImageAndEmbed(media: Dataset[MediaRow]): Dataset[FrameFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition: ImageIO reader instances are cached JVM-wide;
      // nothing to amortize beyond classloading
      rows.map { m =>
        val grid = Codec.decodePng(m.payload) // magic-byte dispatch: any JDK format
        FrameFeature(m.media_id, 0, grid(0).length, grid.length,
          embedFrame(resizeFrame(grid, 8, 8)))
      }
    }
  }

  /** REAL video decode → frame-sample → embed, one mapPartitions
    * pass — the AVI-backed member of the decode-operator family for
    * binary columns holding genuine AVI bytes of ANY carried stream
    * (uncompressed-DIB, MJPEG, RLE8, motion-compensated MCV8 —
    * [[Codec.decodeAviFrames]] routes on biCompression, and
    * inter-frame streams decode through their GOP, so a sampled
    * frame's pixels arrive through the motion/delta chain back to its
    * keyframe). The container is parsed ONCE per
    * row and the sampled frames ([[sampleFrameIndices]] over the real
    * stream length) go through resize → [[embedFrame]], yielding one
    * [[FrameFeature]] per sampled frame with its true frame index —
    * ready for [[graft.similarity.Similarity]] as-is. Like
    * [[decodeImageAndEmbed]] this is real CPU work: wrap split-starved
    * inputs in [[graft.operators.Rebalance.forCpuStage]] so decode
    * spreads across cores. Undecodable payloads fail loudly.
    *
    * Decode cost is O(SAMPLED frames), not O(stream): DIB/MJPEG frames
    * are intra-coded, so [[Codec.decodeAviFrames]] seeks straight to
    * the sampled chunks (via the idx1 index when the muxer wrote one)
    * and never decodes the rest — at production stride/duration ratios
    * (sample 8 frames of a 30 fps hour = 10⁵ frames) that asymmetry,
    * not the embed, is the economics of video featurization. */
  def decodeVideoAndEmbed(
      media: Dataset[MediaRow], stride: Int = 2, maxFrames: Int = 8): Dataset[FrameFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val total = Codec.aviFrameCount(m.payload)
        val (_, picked) = Codec.decodeAviFrames(
          m.payload, sampleFrameIndices(total, stride, maxFrames))
        picked.map { case (fi, grid) =>
          FrameFeature(m.media_id, fi, grid(0).length, grid.length,
            embedFrame(resizeFrame(grid, 8, 8)))
        }
      }
    }
  }

  /** Payload-level metadata extraction — pure Spark built-ins (no UDF):
    * byte length, content hash, kind split. Works on any binary column
    * at any scale; filters/projection push into the scan. */
  def payloadStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.select(
      col("media_id"),
      col("meta.kind").as("kind"),
      octet_length(col(payloadCol)).as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"))

  /** Build a MediaRow dataset from the documents table (text bytes as
    * payload) — a deterministic stand-in corpus for PAYLOAD-LEVEL
    * operators only (byte length, content hash, kind split — battery
    * q34): the payloads are opaque bytes, not decodable media, and the
    * decode operators ([[decodeVideoAndEmbed]] etc.) correctly REJECT
    * them. Queries that exercise decode mint real codec bytes instead
    * (q35/q100–q106/q146). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        when(col("doc_id") % 3 === 0, "video")
          .when(col("doc_id") % 3 === 1, "image").otherwise("audio").as("kind"),
        lit(640).as("declaredWidth"),
        lit(480).as("declaredHeight"),
        lit(16000).as("sampleRateHz"),
        (col("n_chars").cast("long") * 100L).as("durationMs")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
