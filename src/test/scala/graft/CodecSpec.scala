package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Codec

/** The real (codec-free) media decoders: golden-byte fixtures pin the
  * exact on-disk format (a round trip alone would hide symmetric
  * encode/decode bugs like double-flipped endianness), properties pin
  * the round trip, and malformed inputs fail loudly. */
class CodecSpec extends AnyFunSuite {

  // ------------------------------- WAV ------------------------------- //

  test("WAV golden bytes: hand-assembled RIFF decodes to the exact samples") {
    // 2 samples @ 8000 Hz: 0x0102 = 258, 0xFFFE = -2 (LE on the wire)
    val golden = Array[Int](
      'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // PCM
      1, 0, // mono
      0x40, 0x1F, 0, 0, // 8000
      0x80, 0x3E, 0, 0, // byte rate 16000
      2, 0, 16, 0, // block align, bits
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      0x02, 0x01, // 258 LE
      0xFE, 0xFF  // -2 LE
    ).map(_.toByte)
    val (sr, samples) = Codec.decodeWavPcm16(golden)
    assert(sr == 8000)
    assert(samples.toSeq == Seq(258.toShort, (-2).toShort))
    // and our encoder produces exactly these bytes
    assert(Codec.encodeWavPcm16(Array(258.toShort, (-2).toShort), 8000).toSeq == golden.toSeq)
  }

  test("WAV reader walks unknown chunks (LIST before data) and honors odd-size padding") {
    val base = Codec.encodeWavPcm16(Array[Short](7, -7), 8000)
    // splice an odd-sized junk chunk between fmt and data: id + size=3 + 3 bytes + 1 pad
    val junk = Array[Int]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0).map(_.toByte)
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    val (sr, samples) = Codec.decodeWavPcm16(spliced)
    assert(sr == 8000 && samples.toSeq == Seq(7.toShort, (-7).toShort))
  }

  test("WAV round trip is identity (property)") {
    val sGen = Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    ScalaCheckSupport.checkProp(Prop.forAll(sGen, Gen.oneOf(8000, 16000, 44100)) {
      (xs, sr) =>
        val arr = xs.map(_.toShort).toArray
        val (gotSr, got) = Codec.decodeWavPcm16(Codec.encodeWavPcm16(arr, sr))
        gotSr == sr && got.toSeq == arr.toSeq
    })
  }

  test("WAV rejects junk, stereo, and truncation loudly") {
    intercept[IllegalArgumentException](Codec.decodeWavPcm16("not a wav".getBytes))
    val stereo = Codec.encodeWavPcm16(Array[Short](1, 2), 8000)
    stereo(22) = 2 // channels = 2
    intercept[IllegalArgumentException](Codec.decodeWavPcm16(stereo))
    val truncated = Codec.encodeWavPcm16(Array[Short](1, 2, 3), 8000).dropRight(3)
    intercept[IllegalArgumentException](Codec.decodeWavPcm16(truncated))
  }

  // ---------------------------- IMA ADPCM ---------------------------- //

  test("IMA-ADPCM golden quantizer: [0, 100] encodes to nibble 7, reconstructs to 11") {
    // hand-derived from the spec tables: pred=0, index=0 (step 7);
    // delta=100 ⇒ sign=0, ≥7 (bit4), ≥3 (bit2), ≥1 (bit1) ⇒ nibble 7;
    // reconstruction diff = 7>>3 + 7 + 3 + 1 = 11 ⇒ decoded [0, 11]
    val wav = Codec.encodeWavImaAdpcm(Array[Short](0, 100), 8000, blockAlign = 8)
    val (sr, got) = Codec.decodeWavImaAdpcm(wav)
    assert(sr == 8000)
    assert(got.toSeq == Seq(0.toShort, 11.toShort))
    // the data region: header (pred 0, idx 0, reserved) then the packed
    // nibble byte with 7 in the LOW nibble — pin the wire format
    val dataOff = wav.length - 4 // blockAlign 8 = 4 header + 4 data bytes
    assert(wav(dataOff - 4) == 0 && wav(dataOff - 3) == 0, "header predictor not 0")
    assert(wav(dataOff - 2) == 0, "header step index not 0")
    assert((wav(dataOff) & 0xff) == 0x07, "first nibble not low-packed 7")
  }

  test("IMA-ADPCM tracks a slow ramp closely (real predictive codec, not noise)") {
    val samples = Array.tabulate(200)(i => (i * 3 - 300).toShort)
    val (_, got) = Codec.decodeWavImaAdpcm(
      Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36))
    assert(got.length == samples.length)
    val errs = got.zip(samples).map { case (a, b) => math.abs(a - b) }
    // slope 3/sample is inside the base step's coding range; after the
    // few-sample attack the tracker stays within a couple of LSBs
    assert(errs.max <= 16, s"max abs error ${errs.max} — not tracking")
    // a broken quantizer or table would diverge by hundreds here
    assert(errs.sum.toDouble / errs.length < 6.0, "mean error too high")
  }

  test("IMA-ADPCM multi-block: partial tail block, exact length, block-boundary reset") {
    // blockAlign 36 ⇒ 65 samples/block; 150 samples ⇒ 2 full-size blocks
    // + fact-bounded tail. Jumpy content so reconstruction error is real.
    val samples = Array.tabulate(150)(i => (((i * 911) % 2003) - 1001).toShort)
    val wav = Codec.encodeWavImaAdpcm(samples, 16000, blockAlign = 36)
    val (sr, got) = Codec.decodeWavImaAdpcm(wav)
    assert(sr == 16000)
    assert(got.length == 150, s"fact chunk not honored: ${got.length}")
    // block-start samples are stored EXACTLY in the block headers
    assert(got(0) == samples(0))
    assert(got(65) == samples(65), "second block header should reset predictor to the raw sample")
    assert(got(130) == samples(130), "third block header should reset predictor to the raw sample")
  }

  test("IMA-ADPCM round-trip is deterministic and bounded (property)") {
    val sGen = Gen.chooseNum(1, 300)
    ScalaCheckSupport.checkProp(Prop.forAll(sGen, Gen.chooseNum(0L, Long.MaxValue)) {
      (n, seed) =>
        val samples = Array.tabulate(n)(i =>
          ((((seed % 1000) * 31 + i * 17) % 2003) - 1001).toShort)
        val wav = Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36)
        val (_, a) = Codec.decodeWavImaAdpcm(wav)
        val (_, b) = Codec.decodeWavImaAdpcm(wav)
        a.length == n && a.toSeq == b.toSeq &&
          a(0) == samples(0) && // header carries the first sample exactly
          a.zip(samples).forall { case (x, y) => math.abs(x - y) <= 32767 }
    }, minSuccessful = 20)
  }

  test("IMA-ADPCM rejects PCM content and truncation loudly") {
    val pcm = Codec.encodeWavPcm16(Array[Short](1, 2), 8000)
    intercept[IllegalArgumentException](Codec.decodeWavImaAdpcm(pcm))
    val adpcm = Codec.encodeWavImaAdpcm(Array[Short](1, 2, 3), 8000, blockAlign = 8)
    intercept[IllegalArgumentException](Codec.decodeWavImaAdpcm(adpcm.dropRight(3)))
  }

  // ------------------------------ G.711 ------------------------------ //

  test("G.711 golden expansions: segment endpoints of both laws") {
    // μ-law: code 0xFF is +0, 0x7F is −0, 0x80 is the positive rail
    assert(Codec.muLawDecodeSample(0xFF) == 0)
    assert(Codec.muLawDecodeSample(0x7F) == 0)
    assert(Codec.muLawDecodeSample(0x80) == 32124)
    assert(Codec.muLawDecodeSample(0x00) == -32124)
    // A-law: sign bit SET is positive (inverse of μ-law); XOR 0x55
    // even-bit inversion means code 0xD5 is +8 (the smallest positive)
    assert(Codec.aLawDecodeSample(0xD5) == 8)
    assert(Codec.aLawDecodeSample(0x55) == -8)
    assert(Codec.aLawDecodeSample(0xAA) == 32256)
    assert(Codec.aLawDecodeSample(0x2A) == -32256)
  }

  test("G.711 expansion is odd-symmetric and strictly monotone per law") {
    // μ-law: flipping the sign bit of the COMPLEMENTED code negates
    for (c <- 0 until 128) {
      assert(Codec.muLawDecodeSample(c) == -Codec.muLawDecodeSample(c | 0x80))
      assert(Codec.aLawDecodeSample(c) == -Codec.aLawDecodeSample(c | 0x80))
    }
    // positive μ-law codes 0x80..0xFF decode DECREASING (complement
    // encoding); positive A-law magnitudes increase with a = c ^ 0x55
    val mu = (0x80 to 0xFF).map(Codec.muLawDecodeSample)
    assert(mu.zip(mu.tail).forall { case (a, b) => a > b })
    val al = (0 until 128).map(a => Codec.aLawDecodeSample((a | 0x80) ^ 0x55))
    assert(al.zip(al.tail).forall { case (a, b) => a < b })
  }

  test("G.711 WAV round-trip: bounded error, exact metadata, both laws (property)") {
    val sGen = Gen.chooseNum(1, 300)
    ScalaCheckSupport.checkProp(Prop.forAll(
      sGen, Gen.chooseNum(0L, Long.MaxValue), Gen.oneOf(false, true)) {
      (n, seed, aLaw) =>
        val samples = Array.tabulate(n)(i =>
          ((((seed % 9973) * 257 + i * 997) % 60001) - 30000).toShort)
        val wav = Codec.encodeWavG711(samples, 16000, aLaw)
        val (sr, rec) = Codec.decodeWavG711(wav)
        // nearest-code quantization error is bounded by half the widest
        // level gap: top-segment steps are 1024 in both laws (+ the μ-law
        // rail clip at 32124 ⇒ 643 worst-case at full scale)
        val bound = if (aLaw) 512 else 643
        sr == 16000 && rec.length == n &&
          rec.zip(samples).forall { case (x, y) => math.abs(x - y) <= bound }
    }, minSuccessful = 20)
  }

  test("G.711 rejects PCM/ADPCM content and truncation loudly") {
    val pcm = Codec.encodeWavPcm16(Array[Short](1, 2), 8000)
    intercept[IllegalArgumentException](Codec.decodeWavG711(pcm))
    val adpcm = Codec.encodeWavImaAdpcm(Array[Short](1, 2, 3), 8000, blockAlign = 8)
    intercept[IllegalArgumentException](Codec.decodeWavG711(adpcm))
    val g711 = Codec.encodeWavG711(Array[Short](100, -100, 5000), 8000, aLaw = false)
    intercept[IllegalArgumentException](Codec.decodeWavG711(g711.take(10)))
  }

  test("decodeWavAuto routes on the format tag; unknown tags reject loudly") {
    val s = Array.tabulate(50)(i => (i * 100 - 2500).toShort)
    val pcm = Codec.encodeWavPcm16(s, 8000)
    val adpcm = Codec.encodeWavImaAdpcm(s, 8000, blockAlign = 36)
    val alaw = Codec.encodeWavG711(s, 8000, aLaw = true)
    val ulaw = Codec.encodeWavG711(s, 8000, aLaw = false)
    assert(Codec.wavFormatTag(pcm) == 1)
    assert(Codec.wavFormatTag(adpcm) == 0x11)
    assert(Codec.wavFormatTag(alaw) == 6)
    assert(Codec.wavFormatTag(ulaw) == 7)
    for (wav <- Seq(pcm, adpcm, alaw, ulaw)) {
      val (sr, auto) = Codec.decodeWavAuto(wav)
      assert(sr == 8000)
      val want = Codec.wavFormatTag(wav) match {
        case 1 => Codec.decodeWavPcm16(wav)._2
        case 0x11 => Codec.decodeWavImaAdpcm(wav)._2
        case _ => Codec.decodeWavG711(wav)._2
      }
      assert(auto.toSeq == want.toSeq)
    }
    // hand-patch the fmt tag (byte 20 of the canonical PCM header)
    val bad = pcm.clone(); bad(20) = 0x55
    intercept[IllegalArgumentException](Codec.decodeWavAuto(bad))
  }

  // ------------------------------- BMP ------------------------------- //

  test("BMP golden bytes: 2x2 image with known padding decodes exactly") {
    // width 2 -> row = 6 bytes + 2 pad; bottom-up: file rows are (1,0)
    val img = Array(Array(10, 20), Array(30, 40))
    val bytes = Codec.encodeBmp24(img)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    assert(bytes.length == 54 + 2 * 8)
    // bottom row first: 30,30,30, 40,40,40, pad,pad
    assert(bytes.slice(54, 62).toSeq ==
      Seq[Byte](30, 30, 30, 40, 40, 40, 0, 0))
    assert(bytes.slice(62, 70).toSeq ==
      Seq[Byte](10, 10, 10, 20, 20, 20, 0, 0))
    assert(Codec.decodeBmp24(bytes).map(_.toSeq).toSeq == img.map(_.toSeq).toSeq)
  }

  test("BMP top-down (negative height) decodes with rows unflipped") {
    val img = Array(Array(1, 2, 3), Array(4, 5, 6))
    val bytes = Codec.encodeBmp24(img)
    // flip to top-down: height := -2, and swap the stored row order
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val rowBytes = (3 * 3 + 3) & ~3 // 12
    val r0 = bytes.slice(54, 54 + rowBytes).clone
    val r1 = bytes.slice(54 + rowBytes, 54 + 2 * rowBytes).clone
    System.arraycopy(r1, 0, bytes, 54, rowBytes)
    System.arraycopy(r0, 0, bytes, 54 + rowBytes, rowBytes)
    assert(Codec.decodeBmp24(bytes).map(_.toSeq).toSeq == img.map(_.toSeq).toSeq)
  }

  test("BMP round trip is identity for any dimensions incl. pad-forcing widths (property)") {
    val dimGen = for {
      h <- Gen.choose(1, 9); w <- Gen.choose(1, 9)
      px <- Gen.listOfN(h * w, Gen.choose(0, 255))
    } yield (h, w, px)
    ScalaCheckSupport.checkProp(Prop.forAll(dimGen) { case (h, w, px) =>
      val img = Array.tabulate(h, w)((r, c) => px(r * w + c))
      Codec.decodeBmp24(Codec.encodeBmp24(img)).map(_.toSeq).toSeq == img.map(_.toSeq).toSeq
    })
  }

  test("BMP rejects non-BMP, unsupported bpp, and compressed content loudly") {
    intercept[IllegalArgumentException](Codec.decodeBmp24(new Array[Byte](54)))
    val ok = Codec.encodeBmp24(Array(Array(1)))
    val bb = java.nio.ByteBuffer.wrap(ok).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(28, 8) // bpp = 8
    intercept[IllegalArgumentException](Codec.decodeBmp24(ok))
  }

  // --------------------------- PNG / JPEG ---------------------------- //

  test("PNG round trip is lossless for any grid incl. 1-pixel and wide shapes (property)") {
    val dims = for { h <- Gen.chooseNum(1, 12); w <- Gen.chooseNum(1, 20) } yield (h, w)
    ScalaCheckSupport.checkProp(Prop.forAll(dims, Gen.chooseNum(0L, Long.MaxValue)) {
      case ((h, w), seed) =>
        val gray = Array.tabulate(h, w)((r, c) =>
          (((seed % 1000) * 7 + r * 13 + c * 29) % 256).toInt)
        val back = Codec.decodePng(Codec.encodePng(gray))
        back.length == h && back(0).length == w &&
          back.zip(gray).forall { case (a, b) => a.sameElements(b) }
    }, minSuccessful = 20)
  }

  test("PNG bytes are genuinely PNG (magic + DEFLATE-compressed IDAT), not a rename") {
    val gray = Array.tabulate(16, 16)((r, c) => (r * 16 + c) % 256)
    val png = Codec.encodePng(gray)
    val magic = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    assert(png.take(8).map(_ & 0xff).sameElements(magic), "missing PNG signature")
    // a readable chunk layout: IHDR first, IDAT present
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    assert(new String(png, "ISO-8859-1").contains("IDAT"))
  }

  test("JPEG decode is a real lossy DCT codec: exact dimensions, bounded error on smooth content") {
    // smooth gradient — baseline JPEG at q=0.9 reconstructs this closely;
    // a stub (hash-derived pixels) would be off by ~85 on average
    val gray = Array.tabulate(24, 32)((r, c) => math.min(255, 4 * r + 3 * c))
    val jpg = Codec.encodeJpeg(gray, quality = 0.9f)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "missing JPEG SOI marker")
    val back = Codec.decodeJpeg(jpg)
    assert(back.length == 24 && back(0).length == 32)
    val errs = for (r <- 0 until 24; c <- 0 until 32)
      yield math.abs(back(r)(c) - gray(r)(c))
    val mean = errs.sum.toDouble / errs.size
    // Bounds pin "a real lossy DCT", not ONE JDK's encoder: a stub
    // (hash pixels) errs ~85 mean / ~255 max on this gradient, while
    // any baseline-JPEG implementation at q=0.9 stays far below these
    // generous bounds — a different JDK vendor's quantization/chroma
    // choices must not flake the suite (ADVICE r10).
    assert(mean < 20.0, s"mean abs error $mean too high for q=0.9 smooth content")
    assert(errs.max <= 100, s"max abs error ${errs.max} — not a plausible DCT reconstruction")
  }

  test("GIF round trip is lossless over the indexed gray palette (property)") {
    // the lossless claim is NOT free: a TYPE_INT_RGB input would make
    // the GIF writer re-quantize through its own palette — the indexed
    // encoder exists precisely so this property holds
    val dims = for { h <- Gen.chooseNum(1, 12); w <- Gen.chooseNum(1, 20) } yield (h, w)
    ScalaCheckSupport.checkProp(Prop.forAll(dims, Gen.chooseNum(0L, Long.MaxValue)) {
      case ((h, w), seed) =>
        val gray = Array.tabulate(h, w)((r, c) =>
          (((seed % 1000) * 7 + r * 13 + c * 29) % 256).toInt)
        val bytes = Codec.encodeGif(gray)
        // genuine GIF: magic header precedes the LZW-coded stream
        val magicOk = new String(bytes.take(6), "US-ASCII").startsWith("GIF8")
        val back = Codec.decodePng(bytes) // magic-byte dispatch reader
        magicOk && back.length == h && back(0).length == w &&
          back.zip(gray).forall { case (a, b) => a.sameElements(b) }
    }, minSuccessful = 20)
  }

  test("TIFF round trip is lossless over the indexed gray palette (property)") {
    val dims = for { h <- Gen.chooseNum(1, 12); w <- Gen.chooseNum(1, 20) } yield (h, w)
    ScalaCheckSupport.checkProp(Prop.forAll(dims, Gen.chooseNum(0L, Long.MaxValue)) {
      case ((h, w), seed) =>
        val gray = Array.tabulate(h, w)((r, c) =>
          (((seed % 1000) * 3 + r * 17 + c * 31) % 256).toInt)
        val bytes = Codec.encodeTiff(gray)
        // genuine TIFF: II*\0 (little-endian) or MM\0* (big-endian) header
        val magicOk = (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
          (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42)
        val back = Codec.decodePng(bytes) // magic-byte dispatch reader
        magicOk && back.length == h && back(0).length == w &&
          back.zip(gray).forall { case (a, b) => a.sameElements(b) }
    }, minSuccessful = 20)
  }

  test("image decoders reject undecodable bytes loudly") {
    intercept[IllegalArgumentException](Codec.decodePng("not an image".getBytes))
    intercept[IllegalArgumentException](Codec.decodeJpeg(new Array[Byte](16)))
  }

  // ------------------------------- AVI ------------------------------- //

  test("AVI/DIB round trip is lossless, frame-ordered, fps-exact (property)") {
    val dims = for {
      h <- Gen.chooseNum(1, 10); w <- Gen.chooseNum(1, 13) // odd widths force row pad
      n <- Gen.chooseNum(1, 4); fps <- Gen.chooseNum(1, 30)
    } yield (h, w, n, fps)
    ScalaCheckSupport.checkProp(Prop.forAll(dims, Gen.chooseNum(0L, Long.MaxValue)) {
      case ((h, w, n, fps), seed) =>
        val frames = Seq.tabulate(n)(f => Array.tabulate(h, w)((r, c) =>
          (((seed % 1000) * 5 + f * 97 + r * 13 + c * 29) % 256).toInt))
        val (gotFps, back) = Codec.decodeAvi(Codec.encodeAvi(frames, fps))
        gotFps == fps && back.length == n &&
          back.zip(frames).forall { case (a, b) =>
            a.length == h && a(0).length == w &&
              a.zip(b).forall { case (x, y) => x.sameElements(y) }
          }
    }, minSuccessful = 20)
  }

  test("AVI bytes are a genuine RIFF container: AVI magic, hdrl/movi lists, idx1 index") {
    val frames = Seq.tabulate(3)(f => Array.tabulate(6, 7)((r, c) => (f * 40 + r * 7 + c) % 256))
    val avi = Codec.encodeAvi(frames, fps = 10)
    val ascii = new String(avi, "ISO-8859-1")
    assert(ascii.startsWith("RIFF"), "missing RIFF magic")
    assert(ascii.substring(8, 12) == "AVI ", "missing AVI form type")
    assert(ascii.contains("hdrl") && ascii.contains("strh") && ascii.contains("strf"))
    assert(ascii.contains("movi") && ascii.contains("idx1"))
    // the declared RIFF size covers the file exactly (even-pad accounting)
    val riffSize = (avi(4) & 0xff) | ((avi(5) & 0xff) << 8) |
      ((avi(6) & 0xff) << 16) | ((avi(7) & 0xff) << 24)
    assert(8 + riffSize == avi.length, s"RIFF size $riffSize vs file ${avi.length}")
    // one idx1 entry per frame, keyframe-flagged
    val idxPos = ascii.indexOf("idx1")
    val idxSize = (avi(idxPos + 4) & 0xff) | ((avi(idxPos + 5) & 0xff) << 8) |
      ((avi(idxPos + 6) & 0xff) << 16) | ((avi(idxPos + 7) & 0xff) << 24)
    assert(idxSize == 16 * frames.length)
  }

  test("AVI/MJPEG frames are real standalone JPEGs; decode is bounded-error real DCT") {
    // smooth gradient per frame — same bound rationale as the still-JPEG test
    val frames = Seq.tabulate(2)(f => Array.tabulate(24, 32)((r, c) =>
      math.min(255, 4 * r + 3 * c + f * 8)))
    val avi = Codec.encodeAvi(frames, fps = 5, mjpeg = true)
    // every 00dc chunk body starts with the JPEG SOI marker (scan stops
    // at idx1, whose entries repeat the fourcc without a chunk header)
    val ascii = new String(avi, "ISO-8859-1")
    val idxStart = ascii.indexOf("idx1")
    var pos = ascii.indexOf("00dc")
    var found = 0
    while (pos >= 0 && pos < idxStart) {
      assert((avi(pos + 8) & 0xff) == 0xff && (avi(pos + 9) & 0xff) == 0xd8,
        s"00dc chunk at $pos does not hold a JPEG (no SOI)")
      found += 1
      pos = ascii.indexOf("00dc", pos + 4)
    }
    assert(found >= 2, "expected per-frame 00dc chunks")
    val (fps, back) = Codec.decodeAvi(avi)
    assert(fps == 5 && back.length == 2)
    val errs = for (f <- 0 until 2; r <- 0 until 24; c <- 0 until 32)
      yield math.abs(back(f)(r)(c) - frames(f)(r)(c))
    assert(errs.sum.toDouble / errs.size < 20.0, "MJPEG mean error too high")
    assert(errs.max <= 100, "MJPEG max error implausible for a real DCT")
  }

  test("AVI decoder skips unknown chunks (JUNK) per the RIFF walk rules") {
    val frames = Seq(Array.tabulate(4, 4)((r, c) => r * 4 + c))
    val avi = Codec.encodeAvi(frames, fps = 2)
    // splice a JUNK chunk right after the 'AVI ' form type and patch the
    // RIFF size — a spec-conforming reader must step over it
    val junk = Array[Byte]('J', 'U', 'N', 'K', 4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = avi.take(12) ++ junk ++ avi.drop(12)
    val newSize = (avi.length - 8) + junk.length
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte
    spliced(7) = ((newSize >> 24) & 0xff).toByte
    val (fps, back) = Codec.decodeAvi(spliced)
    assert(fps == 2 && back.length == 1 && back(0).zip(frames(0)).forall {
      case (a, b) => a.sameElements(b)
    })
  }

  test("decodeAviFrames seek path equals full decode on the sampled indices") {
    val frames = Seq.tabulate(6)(f => Array.tabulate(5, 9)((r, c) => (f * 50 + r * 9 + c) % 256))
    val avi = Codec.encodeAvi(frames, fps = 12)
    assert(Codec.aviFrameCount(avi) == 6)
    val (fpsA, full) = Codec.decodeAvi(avi)
    val (fpsB, picked) = Codec.decodeAviFrames(avi, Seq(0, 3, 5))
    assert(fpsA == 12 && fpsB == 12)
    picked.foreach { case (i, g) =>
      assert(g.zip(full(i)).forall { case (a, b) => a.sameElements(b) }, s"frame $i differs")
    }
    intercept[IllegalArgumentException](Codec.decodeAviFrames(avi, Seq(6)))
    intercept[IllegalArgumentException](Codec.decodeAviFrames(avi, Seq(-1)))
  }

  test("seek path really skips: a corrupted UNSAMPLED MJPEG frame never hits the codec") {
    val frames = Seq.tabulate(4)(f => Array.tabulate(16, 16)((r, c) =>
      math.min(255, 8 * r + 4 * c + f)))
    val avi = Codec.encodeAvi(frames, fps = 6, mjpeg = true)
    // zero out the middle of frame 1's JPEG body (found via its SOI) so
    // a full decode dies in the codec, then seek-decode frames 0 and 2
    val ascii = new String(avi, "ISO-8859-1")
    val chunk0 = ascii.indexOf("00dc")
    val chunk1 = ascii.indexOf("00dc", chunk0 + 4)
    val size1 = (avi(chunk1 + 4) & 0xff) | ((avi(chunk1 + 5) & 0xff) << 8) |
      ((avi(chunk1 + 6) & 0xff) << 16) | ((avi(chunk1 + 7) & 0xff) << 24)
    val corrupted = avi.clone()
    java.util.Arrays.fill(corrupted, chunk1 + 10, chunk1 + 8 + size1, 0.toByte)
    intercept[Exception](Codec.decodeAvi(corrupted)) // full decode hits the damage
    val (_, picked) = Codec.decodeAviFrames(corrupted, Seq(0, 2))
    assert(picked.map(_._1) == Seq(0, 2), "seek path decoded the wrong frames")
    picked.foreach { case (i, g) =>
      assert(g.length == 16 && g(0).length == 16, s"frame $i geometry lost")
    }
  }

  test("idx1 with ABSOLUTE offsets (old-muxer quirk) still resolves frames") {
    val frames = Seq.tabulate(3)(f => Array.tabulate(4, 6)((r, c) => (f * 80 + r * 6 + c) % 256))
    val avi = Codec.encodeAvi(frames, fps = 3)
    val ascii = new String(avi, "ISO-8859-1")
    val moviType = ascii.indexOf("movi")
    val idxPos = ascii.indexOf("idx1")
    val rewritten = avi.clone()
    for (i <- 0 until 3) {
      val e = idxPos + 8 + 16 * i
      val rel = (avi(e + 8) & 0xff) | ((avi(e + 9) & 0xff) << 8) |
        ((avi(e + 10) & 0xff) << 16) | ((avi(e + 11) & 0xff) << 24)
      val abs = moviType + rel // relative-to-movi → absolute file offset
      rewritten(e + 8) = (abs & 0xff).toByte
      rewritten(e + 9) = ((abs >> 8) & 0xff).toByte
      rewritten(e + 10) = ((abs >> 16) & 0xff).toByte
      rewritten(e + 11) = ((abs >> 24) & 0xff).toByte
    }
    val (fps, back) = Codec.decodeAvi(rewritten)
    assert(fps == 3 && back.length == 3)
    back.zip(frames).foreach { case (a, b) =>
      assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
    }
  }

  // ------------------------------ RLE8 ------------------------------- //

  test("AVI/RLE8 inter-frame round trip is lossless under random sparse mutations (property)") {
    val cfg = for {
      h <- Gen.chooseNum(1, 10); w <- Gen.chooseNum(1, 14)
      n <- Gen.chooseNum(1, 6); kfi <- Gen.chooseNum(1, 4)
    } yield (h, w, n, kfi)
    ScalaCheckSupport.checkProp(Prop.forAll(cfg, Gen.chooseNum(0L, Long.MaxValue)) {
      case ((h, w, n, kfi), seed) =>
        // frame 0 from a formula; each later frame mutates a few pixels
        var s = seed
        def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
        val frames = scala.collection.mutable.ArrayBuffer(
          Array.tabulate(h, w)((r, c) => (((seed % 997) + r * 31 + c * 17) % 256).toInt))
        (1 until n).foreach { _ =>
          val f = frames.last.map(_.clone())
          val muts = (math.abs(next()) % (h.toLong * w + 1)).toInt
          (0 until muts).foreach { _ =>
            val r = (math.abs(next()) % h).toInt
            val c = (math.abs(next()) % w).toInt
            f(r)(c) = (math.abs(next()) % 256).toInt
          }
          frames += f
        }
        val avi = Codec.encodeAviRle8(frames.toSeq, fps = 10, keyframeInterval = kfi)
        val (fps, back) = Codec.decodeAvi(avi)
        fps == 10 && back.length == frames.length &&
          back.zip(frames).forall { case (a, b) =>
            a.length == h && a(0).length == w &&
              a.zip(b).forall { case (x, y) => x.sameElements(y) }
          }
    }, minSuccessful = 20)
  }

  test("RLE8 delta frames are small for sparse change (the codec compresses for real)") {
    // 40 frames 32x32; each frame changes ONE pixel. All-keyframe vs
    // GOP-8 encodings of the same content: delta frames should make the
    // stream several times smaller.
    val frames = scala.collection.mutable.ArrayBuffer(
      Array.tabulate(32, 32)((r, c) => (r * 8 + c) % 256))
    (1 until 40).foreach { i =>
      val f = frames.last.map(_.clone())
      f(i % 32)((i * 7) % 32) = (i * 13) % 256
      frames += f
    }
    val allKey = Codec.encodeAviRle8(frames.toSeq, fps = 10, keyframeInterval = 1)
    val gop8 = Codec.encodeAviRle8(frames.toSeq, fps = 10, keyframeInterval = 8)
    assert(gop8.length * 3 < allKey.length,
      s"delta coding saved too little: ${gop8.length} vs ${allKey.length}")
    // and both decode to the identical content
    val a = Codec.decodeAvi(allKey)._2
    val b = Codec.decodeAvi(gop8)._2
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (p, q) => p.sameElements(q) } })
  }

  test("RLE8 GOP seek: in-GOP predecessors are decoded, other GOPs are not") {
    // 7 frames, keyframes at 0 and 3 and 6 (interval 3)
    val frames = scala.collection.mutable.ArrayBuffer(
      Array.tabulate(6, 8)((r, c) => (r * 8 + c) % 256))
    (1 until 7).foreach { i =>
      val f = frames.last.map(_.clone())
      f(i % 6)(i % 8) = (i * 29) % 256
      frames += f
    }
    val avi = Codec.encodeAviRle8(frames.toSeq, fps = 5, keyframeInterval = 3)
    val full = Codec.decodeAvi(avi)._2
    // seek equals full decode
    val (_, picked) = Codec.decodeAviFrames(avi, Seq(5, 2))
    picked.foreach { case (i, g) =>
      assert(g.zip(full(i)).forall { case (x, y) => x.sameElements(y) }, s"frame $i differs")
    }
    // find the i-th video chunk and zero its body (00 00 pairs = EOLs,
    // no EOB → rle8Apply fails loudly IF the chunk is ever decoded)
    def corrupt(src: Array[Byte], frame: Int): Array[Byte] = {
      val ascii = new String(src, "ISO-8859-1")
      val idxStart = ascii.indexOf("idx1")
      var pos = ascii.indexOf("00dc")
      var k = 0
      while (k < frame) { pos = ascii.indexOf("00dc", pos + 4); k += 1 }
      require(pos >= 0 && pos < idxStart)
      val size = (src(pos + 4) & 0xff) | ((src(pos + 5) & 0xff) << 8) |
        ((src(pos + 6) & 0xff) << 16) | ((src(pos + 7) & 0xff) << 24)
      val out = src.clone()
      java.util.Arrays.fill(out, pos + 8, pos + 8 + size, 0.toByte)
      out
    }
    // frame 5's GOP is {3,4,5}: corrupting frame 1 (earlier GOP) must not
    // disturb it; corrupting frame 4 (in-GOP predecessor) must fail loudly
    val (_, ok) = Codec.decodeAviFrames(corrupt(avi, 1), Seq(5))
    assert(ok.head._2.zip(full(5)).forall { case (x, y) => x.sameElements(y) })
    intercept[Exception](Codec.decodeAviFrames(corrupt(avi, 4), Seq(5)))
    // and frame 2 (GOP {0,1,2}) DOES depend on frame 1
    intercept[Exception](Codec.decodeAviFrames(corrupt(avi, 1), Seq(2)))
  }

  test("RLE8 idx1 flags mark exactly the keyframes") {
    val frames = Seq.tabulate(5)(f => Array.tabulate(4, 4)((r, c) => (f + r * 4 + c) % 256))
    val avi = Codec.encodeAviRle8(frames, fps = 4, keyframeInterval = 2)
    val ascii = new String(avi, "ISO-8859-1")
    val idxPos = ascii.indexOf("idx1")
    val flags = (0 until 5).map { i =>
      val e = idxPos + 8 + 16 * i
      (avi(e + 4) & 0xff) | ((avi(e + 5) & 0xff) << 8)
    }
    assert(flags.map(f => (f & 0x10) != 0) == Seq(true, false, true, false, true))
    // a stream whose idx1 says frame 0 is NOT a keyframe has no defined
    // content — decoding against a blank canvas must fail loudly
    val broken = avi.clone()
    broken(idxPos + 8 + 4) = 0 // clear frame 0's AVIIF_KEYFRAME
    intercept[IllegalArgumentException](Codec.decodeAvi(broken))
    intercept[IllegalArgumentException](Codec.decodeAviFrames(broken, Seq(1)))
  }

  test("AVI parser survives hostile bytes: mutations terminate (throw or decode), never hang") {
    // corpus-scale media scans see corrupt and adversarial payloads; the
    // walker must be total — negative sizes must not walk backward and
    // crafted LIST nesting must not blow the stack. Deterministic PRNG.
    val seeds = Seq(
      Codec.encodeAvi(Seq.tabulate(3)(f =>
        Array.tabulate(6, 7)((r, c) => (f * 40 + r * 7 + c) % 256)), fps = 10),
      Codec.encodeAvi(Seq.tabulate(2)(f =>
        Array.tabulate(16, 16)((r, c) => math.min(255, 8 * r + 4 * c + f))),
        fps = 5, mjpeg = true),
      Codec.encodeAviRle8(Seq.tabulate(4)(f =>
        Array.tabulate(5, 6)((r, c) => (f * 31 + r * 6 + c) % 256)), fps = 4, 2))
    var s = 0x12345678L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; math.abs(s) }
    (0 until 300).foreach { i =>
      val base = seeds((next() % seeds.length).toInt)
      val buf = base.clone()
      val nMut = 1 + (next() % 8).toInt
      (0 until nMut).foreach { _ =>
        buf((next() % buf.length).toInt) = (next() & 0xff).toByte
      }
      try { Codec.decodeAvi(buf); () }
      catch { case _: Exception => () } // loud failure is fine; hanging is not
    }
    // pure garbage and a pathological nested-LIST bomb terminate too
    val garbage = Array.tabulate(4096)(i => ((i * 31 + 7) & 0xff).toByte)
    intercept[Exception](Codec.decodeAvi(garbage))
    val bomb = {
      val depth = 200
      val bb = java.nio.ByteBuffer.allocate(12 + depth * 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fcc(x: String) = x.getBytes("US-ASCII")
      bb.put(fcc("RIFF")).putInt(4 + depth * 12).put(fcc("AVI "))
      (0 until depth).foreach { d =>
        bb.put(fcc("LIST")).putInt(4 + (depth - 1 - d) * 12).put(fcc("rec "))
      }
      bb.array()
    }
    intercept[IllegalArgumentException](Codec.decodeAvi(bomb))
  }

  test("AVI decoder rejects malformed and unsupported content loudly") {
    intercept[IllegalArgumentException](Codec.decodeAvi("RIFFxxxx".getBytes))
    intercept[IllegalArgumentException](Codec.decodeAvi(new Array[Byte](4)))
    // a WAV is RIFF but not an AVI
    intercept[IllegalArgumentException](
      Codec.decodeAvi(Codec.encodeWavPcm16(Array[Short](1, 2, 3), 8000)))
    intercept[IllegalArgumentException](Codec.encodeAvi(Seq.empty, fps = 10))
    intercept[IllegalArgumentException](
      Codec.encodeAvi(Seq(Array(Array(1))), fps = 0))
    // mismatched frame geometries must be rejected (single strf)
    intercept[IllegalArgumentException](Codec.encodeAvi(
      Seq(Array(Array(1, 2)), Array(Array(1))), fps = 1))
  }

  // ------------------------------- MCV8 ------------------------------ //

  /** Frame f of a scene translating (dx0, dy0) px/frame: pixel (r, c)
    * samples a closed-form pattern over the infinite plane, so
    * cur(r, c) == prev(r + dy0, c + dx0) wherever the reference stays
    * in frame — exactly the construction motion compensation exists
    * for. */
  private def translating(h: Int, w: Int, n: Int, dx0: Int, dy0: Int) =
    (0 until n).map(f => Array.tabulate(h, w)((r, c) =>
      (((r + f * dy0) * 31 + (c + f * dx0) * 17) % 256 + 256) % 256))

  test("AVI/MCV8 round trip is lossless under mutations AND translations (property)") {
    val cfg = for {
      h <- Gen.chooseNum(1, 40); w <- Gen.chooseNum(1, 40)
      n <- Gen.chooseNum(1, 5); kfi <- Gen.chooseNum(1, 4)
      dx0 <- Gen.chooseNum(-3, 3); dy0 <- Gen.chooseNum(-3, 3)
    } yield (h, w, n, kfi, dx0, dy0)
    ScalaCheckSupport.checkProp(Prop.forAll(cfg, Gen.chooseNum(0L, Long.MaxValue)) {
      case ((h, w, n, kfi, dx0, dy0), seed) =>
        var s = seed | 1L
        def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
        // translation + sparse random scribbles on top (residual path)
        val frames = translating(h, w, n, dx0, dy0).map(_.map(_.clone())).toArray
        (1 until n).foreach { f =>
          val muts = (math.abs(next()) % 5L).toInt
          (0 until muts).foreach { _ =>
            val r = (math.abs(next()) % h).toInt
            val c = (math.abs(next()) % w).toInt
            frames(f)(r)(c) = (math.abs(next()) % 256).toInt
          }
        }
        val avi = Codec.encodeAviMcv(frames.toSeq, fps = 12, keyframeInterval = kfi)
        val (fps, back) = Codec.decodeAvi(avi)
        fps == 12 && back.length == n &&
          back.zip(frames).forall { case (a, b) =>
            a.zip(b).forall { case (x, y) => x.sameElements(y) }
          }
    }, minSuccessful = 20)
  }

  test("MCV8 motion compensation is real: translation compresses to SKIP blocks") {
    // 128x128 scene translating 1 px/frame: every pixel changes every
    // frame, so RLE8's changed-run deltas degenerate to ~full frames,
    // while MCV8's motion search finds the shift and emits 3-byte SKIP
    // blocks everywhere except the border blocks whose shifted
    // reference leaves the frame — the defining capability gap between
    // unchanged-pixel carry-over and true motion compensation.
    val frames = translating(128, 128, 12, dx0 = 1, dy0 = 0)
    val mcv = Codec.encodeAviMcv(frames, fps = 12, keyframeInterval = 12)
    val rle = Codec.encodeAviRle8(frames, fps = 12, keyframeInterval = 12)
    val allKey = Codec.encodeAviMcv(frames, fps = 12, keyframeInterval = 1)
    assert(mcv.length * 2 < rle.length,
      s"MCV8 ${mcv.length}B should compress translation far below RLE8 ${rle.length}B")
    assert(mcv.length * 4 < allKey.length,
      s"MCV8 ${mcv.length}B should be far below all-keyframe ${allKey.length}B")
    // and the decode is still exact
    val back = Codec.decodeAvi(mcv)._2
    assert(back.zip(frames).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    // RLE8 decodes the same content too (both lossless, different cost)
    val backR = Codec.decodeAvi(rle)._2
    assert(backR.zip(frames).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("MCV8 GOP seek equals full decode on sampled indices; idx1 marks keyframes") {
    val frames = translating(24, 40, 9, dx0 = -1, dy0 = 2)
    val avi = Codec.encodeAviMcv(frames, fps = 6, keyframeInterval = 3)
    assert(Codec.aviFrameCount(avi) == 9)
    val full = Codec.decodeAvi(avi)._2
    val (fps, picked) = Codec.decodeAviFrames(avi, Seq(8, 1, 4))
    assert(fps == 6)
    picked.foreach { case (i, g) =>
      assert(g.zip(full(i)).forall { case (a, b) => a.sameElements(b) },
        s"seek frame $i diverged from full decode")
    }
  }

  test("MCV8 rejects hostile bytes loudly: truncation, bad mode, bad vector") {
    val frames = translating(20, 20, 4, 1, 1)
    val avi = Codec.encodeAviMcv(frames, fps = 5, keyframeInterval = 4)
    // truncating the RIFF payload must throw, never hang or scribble
    intercept[IllegalArgumentException](
      Codec.decodeAvi(java.util.Arrays.copyOf(avi, avi.length - 10)))
    // flip every payload byte position once; each mutant either decodes
    // or throws IllegalArgumentException — nothing else (q602-style)
    var threw = 0
    (avi.length - 60 until avi.length - 20).foreach { i =>
      val m = avi.clone(); m(i) = (m(i) ^ 0x7f).toByte
      try Codec.decodeAvi(m)
      catch { case _: IllegalArgumentException => threw += 1 }
    }
    assert(threw > 0, "no mutation was rejected — bounds checks missing?")
  }
}
