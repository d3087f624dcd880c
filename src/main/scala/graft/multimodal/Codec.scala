package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL media codecs for the container formats that need no external
  * codec library — pure byte-format parsing in the JVM:
  *
  *  - **WAV** (RIFF, PCM 16-bit little-endian, mono): canonical 44-byte
  *    header writer + a spec-correct chunk-walking reader (skips
  *    unknown chunks, honors the fmt block, even-byte chunk padding).
  *  - **BMP** (BITMAPINFOHEADER, 24 bpp, uncompressed): writer and
  *    reader with the format's actual quirks — BGR byte order, rows
  *    padded to 4-byte boundaries, bottom-up row order for positive
  *    heights (and top-down for negative, which the reader honors).
  *
  * Compressed STILL images decode for real too — PNG/JPEG/GIF/TIFF
  * through the JDK's pure-Java ImageIO plugins (see the PNG/JPEG
  * section below) — compressed AUDIO decodes for real via the
  * IMA-ADPCM kernel below (pure-integer predictor/step-table
  * recurrence, WAV format tag 0x11), and VIDEO decodes for real via
  * the AVI RIFF container reader at the bottom (uncompressed-DIB and
  * MJPEG streams), including INTER-frame codecs: RLE8 delta frames
  * and the MCV8 motion-compensated P-frame codec (block-matching
  * motion vectors + lossless residuals, the H.261/MPEG construction)
  * — NO decode fake remains anywhere in the engine. Battery
  * q85/q86/q100/q102/q105 verify these kernels cross-engine: Spark
  * round-trips real bytes (encode → decode → feature), while the
  * DuckDB oracle recomputes the same features arithmetically from the
  * synthesis formula (replaying the ADPCM integer recurrence for
  * q102; the per-frame pixel formula through the AVI container for
  * q105) — any header, padding, endianness, or row-order bug
  * hash-mismatches.
  */
object Codec {

  // ------------------------------------------------------------------ //
  // WAV — RIFF / PCM16 mono                                            //
  // ------------------------------------------------------------------ //

  /** Canonical 44-byte-header WAV: RIFF("WAVE") + fmt(16, PCM, mono,
    * 16-bit) + data. */
  def encodeWavPcm16(samples: Array[Short], sampleRateHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRateHz)
    bb.putInt(sampleRateHz * 2) // byte rate
    bb.putShort(2)              // block align
    bb.putShort(16)             // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Chunk-walking reader. Returns (sampleRateHz, samples). Rejects
    * non-PCM / non-mono / non-16-bit content loudly — silently
    * misreading media is the failure mode this whole module exists to
    * avoid. Tolerates extra chunks (LIST, fact, ...) in any order
    * before/after `data`, and the RIFF even-byte chunk padding rule. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a RIFF file")
    bb.getInt // declared riff size (ignored; real files lie)
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "RIFF but not WAVE")

    var sampleRate = -1
    var data: Array[Short] = null
    while (bb.remaining() >= 8 && (sampleRate < 0 || data == null)) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"corrupt chunk '${new String(id, "US-ASCII")}': size $size exceeds payload")
      new String(id, "US-ASCII") match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          val channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          bb.getShort // block align
          val bits = bb.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          require(channels == 1, s"not mono ($channels channels)")
          require(bits == 16, s"not 16-bit ($bits)")
          bb.position(fmtStart + size + (size & 1)) // skip fmt extension + pad
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          data = out
          bb.position(bb.position() + (size & 1)) // even-byte pad
        case _ =>
          bb.position(bb.position() + size + (size & 1)) // skip unknown chunk
      }
    }
    require(sampleRate > 0, "no fmt chunk")
    require(data != null, "no data chunk")
    (sampleRate, data)
  }

  // ------------------------------------------------------------------ //
  // IMA ADPCM — compressed audio (WAV format tag 0x11), pure-integer   //
  // predictor + step-table arithmetic from the public IMA spec (IMA    //
  // Digital Audio Focus/Technical Working Groups, 1992). 4 bits per    //
  // sample, 4:1 compression vs PCM16 — and, unlike DCT audio codecs,   //
  // the whole decode is an integer recurrence (predictor ± a step-     //
  // table fraction, both clamped), so it is ORACLE-CHECKABLE: a SQL    //
  // engine can replay the identical recurrence and hash-compare        //
  // decoded samples (battery q102). This closed the compressed-AUDIO   //
  // half of the decode-fake's former scope (the video half fell to     //
  // the AVI codecs below, MCV8 last).                                  //
  // ------------------------------------------------------------------ //

  /** The 89-entry quantizer step-size table of the IMA ADPCM spec
    * (graft-visible so the battery oracle can inline it as VALUES). */
  private[graft] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
    2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
    9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767)

  /** Step-index adjustment per nibble magnitude (low 3 bits). */
  private[multimodal] val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA decode step: (predictor, stepIndex, nibble) → updated
    * (predictor, stepIndex). The reconstruction diff is
    * step/8 + bit2·step + bit1·step/2 + bit0·step/4 (integer shifts),
    * subtracted when the sign bit (8) is set; predictor clamps to
    * int16, index to [0, 88]. Pure integer — deterministic in any
    * engine, which is what makes the battery oracle possible. */
  @inline private def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p = if ((nibble & 8) != 0) pred - diff else pred + diff
    val pc = math.max(-32768, math.min(32767, p))
    val ic = math.max(0, math.min(88, index + ImaIndexTable(nibble & 7)))
    (pc, ic)
  }

  /** One IMA encode step: quantize (sample − predictor) to a nibble
    * with the spec's successive-approximation rule (sign bit, then
    * step, step/2, step/4 thresholds), then run [[imaStep]] so the
    * encoder tracks the DECODER's reconstruction (standard predictive-
    * coding discipline — predicting from the reconstruction, not the
    * raw signal, stops error accumulating). */
  @inline private def imaEncodeStep(sample: Int, pred: Int, index: Int): (Int, Int, Int) = {
    val step = ImaStepTable(index)
    val delta = sample - pred
    val sign = if (delta < 0) 8 else 0
    var ad = math.abs(delta)
    var nib = sign
    if (ad >= step) { nib |= 4; ad -= step }
    if (ad >= (step >> 1)) { nib |= 2; ad -= step >> 1 }
    if (ad >= (step >> 2)) nib |= 1
    val (p, i) = imaStep(pred, index, nib)
    (nib, p, i)
  }

  /** Mono IMA-ADPCM WAV (format tag 0x11): fixed-size blocks of
    * `blockAlign` bytes, each opening with a 4-byte state header
    * (int16 predictor = the block's first sample, uint8 step index,
    * reserved 0) followed by (blockAlign − 4)·2 nibble-coded samples —
    * LOW nibble first — so a block carries (blockAlign − 4)·2 + 1
    * samples. The fmt chunk is the 20-byte extended form (cbSize = 2,
    * samplesPerBlock), and a `fact` chunk records the true sample
    * count so a trailing partial block decodes to exactly the input
    * length (its unused nibbles are zero-padding). Encoder state:
    * the predictor RESETS to the raw first sample of each block (the
    * header stores it exactly); the step index runs on across blocks. */
  def encodeWavImaAdpcm(
      samples: Array[Short], sampleRateHz: Int, blockAlign: Int = 256): Array[Byte] = {
    require(samples.nonEmpty, "empty sample stream")
    require(blockAlign >= 8, s"blockAlign $blockAlign too small for header + data")
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val dataLen = nBlocks * blockAlign
    val byteRate = sampleRateHz * blockAlign / samplesPerBlock // spec: avg bytes/sec
    val bb = ByteBuffer.allocate(12 + 28 + 12 + 8 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 28 + 12 + 8 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
    bb.putShort(0x11) // WAVE_FORMAT_IMA_ADPCM
    bb.putShort(1)    // mono
    bb.putInt(sampleRateHz)
    bb.putInt(byteRate)
    bb.putShort(blockAlign.toShort)
    bb.putShort(4)    // bits per (coded) sample
    bb.putShort(2)    // cbSize
    bb.putShort(samplesPerBlock.toShort)
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var index = 0
    var s = 0
    while (s < samples.length) {
      val first = samples(s).toInt
      bb.putShort(first.toShort)
      bb.put(index.toByte).put(0.toByte)
      var pred = first
      var k = 1
      var bi = 0
      while (bi < blockAlign - 4) {
        var byteVal = 0
        var half = 0
        while (half < 2) {
          val nib = if (s + k < samples.length && k < samplesPerBlock) {
            val (n, p, i) = imaEncodeStep(samples(s + k).toInt, pred, index)
            pred = p; index = i; k += 1
            n
          } else 0 // zero-pad a trailing partial block (fact bounds decode)
          byteVal |= nib << (4 * half) // LOW nibble first
          half += 1
        }
        bb.put(byteVal.toByte)
        bi += 1
      }
      s += samplesPerBlock
    }
    bb.array()
  }

  /** Chunk-walking IMA-ADPCM WAV reader — the compressed twin of
    * [[decodeWavPcm16]]: honors the fmt extension's samplesPerBlock,
    * the `fact` chunk's true sample count (else full blocks), per-block
    * state headers, and low-nibble-first packing. Returns
    * (sampleRateHz, decoded PCM16 samples). Rejects non-IMA / non-mono
    * content loudly, like every decoder in this module. */
  def decodeWavImaAdpcm(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a RIFF file")
    bb.getInt
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "RIFF but not WAVE")
    var sampleRate = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factSamples = -1
    var data: Array[Byte] = null
    while (bb.remaining() >= 8) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"corrupt chunk '${new String(id, "US-ASCII")}': size $size exceeds payload")
      new String(id, "US-ASCII") match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          val channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          blockAlign = bb.getShort & 0xffff
          val bits = bb.getShort
          require(audioFormat == 0x11, s"not IMA ADPCM (format $audioFormat)")
          require(channels == 1, s"not mono ($channels channels)")
          require(bits == 4, s"not 4-bit ADPCM ($bits)")
          samplesPerBlock =
            if (size >= 20) { bb.getShort; bb.getShort & 0xffff } // cbSize, samplesPerBlock
            else (blockAlign - 4) * 2 + 1
          bb.position(fmtStart + size + (size & 1))
        case "fact" =>
          factSamples = bb.getInt
          bb.position(bb.position() + (size - 4) + (size & 1))
        case "data" =>
          data = new Array[Byte](size)
          bb.get(data)
          bb.position(bb.position() + (size & 1))
        case _ =>
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(sampleRate > 0, "no fmt chunk")
    require(data != null, "no data chunk")
    require(blockAlign >= 8 && data.length % blockAlign == 0,
      s"data length ${data.length} not a multiple of blockAlign $blockAlign")
    val nBlocks = data.length / blockAlign
    val total = if (factSamples >= 0) factSamples else nBlocks * samplesPerBlock
    require(total <= nBlocks * samplesPerBlock,
      s"fact count $total exceeds block capacity ${nBlocks * samplesPerBlock}")
    val out = new Array[Short](total)
    var s = 0
    var b = 0
    while (b < nBlocks && s < total) {
      val base = b * blockAlign
      var pred = ((data(base) & 0xff) | (data(base + 1) << 8)).toShort.toInt
      var index = data(base + 2) & 0xff
      require(index <= 88, s"corrupt block header: step index $index > 88")
      out(s) = pred.toShort
      s += 1
      var k = 1
      var bi = 4
      while (bi < blockAlign && s < total && k < samplesPerBlock) {
        val byteVal = data(base + bi) & 0xff
        var half = 0
        while (half < 2 && s < total && k < samplesPerBlock) {
          val nib = (byteVal >> (4 * half)) & 0xf // LOW nibble first
          val (p, i) = imaStep(pred, index, nib)
          pred = p; index = i
          out(s) = pred.toShort
          s += 1; k += 1
          half += 1
        }
        bi += 1
      }
      b += 1
    }
    require(s == total, s"decoded $s of $total samples — truncated data region")
    (sampleRate, out)
  }

  // ------------------------------------------------------------------ //
  // G.711 μ-law / A-law — compressed audio (WAV format tags 7 / 6),    //
  // the telephony companding codecs of ITU-T Recommendation G.711      //
  // (1972; public). 8 bits per sample, 2:1 vs PCM16, logarithmic       //
  // segments. Decode is a closed-form integer expression per code —    //
  // ORACLE-CHECKABLE like the ADPCM kernel (battery q113 replays both  //
  // expansions in SQL); encode here is nearest-reconstruction argmin   //
  // over the 256 codes (ties to the smaller code) — deterministic,     //
  // exactly replayable, and immune to the published reference          //
  // encoders' 13/14-bit convention mismatches.                         //
  // ------------------------------------------------------------------ //

  /** μ-law expansion: 8-bit code → 16-bit linear sample. Closed form
    * of the G.711 μ-law segment structure: complement, then
    * mantissa·8 + bias shifted by the 3-bit segment, bias removed,
    * sign applied. Range ±32124. */
  private[graft] def muLawDecodeSample(code: Int): Int = {
    val u = (~code) & 0xff
    val t = (((u & 0xf) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law expansion: 8-bit code → 16-bit linear sample. Even-bit
    * inversion (XOR 0x55), then the segment fold: segment 0 is linear
    * (step 16, offset 8), segments ≥ 1 prepend the implicit leading
    * one (offset 0x108) and shift. Sign bit SET means positive in
    * A-law (the inverse of μ-law). Range ±32256. */
  private[graft] def aLawDecodeSample(code: Int): Int = {
    val a = code ^ 0x55
    val t0 = (a & 0xf) << 4
    val seg = (a & 0x70) >> 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case _ => (t0 + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  private def g711Table(aLaw: Boolean): Array[Int] =
    Array.tabulate(256)(c => if (aLaw) aLawDecodeSample(c) else muLawDecodeSample(c))

  /** Nearest-reconstruction G.711 encode: the code whose expansion is
    * closest to the sample, ties to the SMALLER code. O(256) per
    * sample — a bounded table scan, not a hot path (encode exists
    * here to fabricate test media; decode is the pipeline side). */
  private def g711Encode(samples: Array[Short], aLaw: Boolean): Array[Byte] = {
    val table = g711Table(aLaw)
    samples.map { s =>
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < 256) {
        val d = math.abs(table(c).toLong - s)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best.toByte
    }
  }

  /** Mono G.711 WAV (format tag 7 = μ-law, 6 = A-law): 18-byte fmt
    * (cbSize = 0 — non-PCM formats carry the extension-size field),
    * a `fact` chunk with the true sample count (required for
    * compressed WAVE formats), 8 bits per coded sample, blockAlign 1. */
  def encodeWavG711(samples: Array[Short], sampleRateHz: Int, aLaw: Boolean): Array[Byte] = {
    require(samples.nonEmpty, "empty sample stream")
    val coded = g711Encode(samples, aLaw)
    val dataLen = coded.length
    val bb = ByteBuffer.allocate(12 + 26 + 12 + 8 + dataLen + (dataLen & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 26 + 12 + 8 + dataLen + (dataLen & 1))
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(18)
    bb.putShort(if (aLaw) 6 else 7) // WAVE_FORMAT_ALAW / _MULAW
    bb.putShort(1)                  // mono
    bb.putInt(sampleRateHz)
    bb.putInt(sampleRateHz)         // byte rate = 1 byte/sample
    bb.putShort(1)                  // block align
    bb.putShort(8)                  // bits per coded sample
    bb.putShort(0)                  // cbSize
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.put(coded)
    bb.array()
  }

  /** Chunk-walking G.711 WAV reader — accepts format tags 6 (A-law)
    * and 7 (μ-law), mono, 8-bit; expands each code through the exact
    * integer tables above. Returns (sampleRateHz, expanded PCM16).
    * Rejects anything else loudly, like every decoder in this module. */
  def decodeWavG711(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a RIFF file")
    bb.getInt
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "RIFF but not WAVE")
    var sampleRate = -1
    var aLaw = false
    var haveFmt = false
    var factSamples = -1
    var data: Array[Byte] = null
    while (bb.remaining() >= 8) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"corrupt chunk '${new String(id, "US-ASCII")}': size $size exceeds payload")
      new String(id, "US-ASCII") match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          val channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt   // byte rate
          bb.getShort // block align
          val bits = bb.getShort
          require(audioFormat == 6 || audioFormat == 7,
            s"not G.711 (format $audioFormat)")
          require(channels == 1, s"not mono ($channels channels)")
          require(bits == 8, s"not 8-bit G.711 ($bits)")
          aLaw = audioFormat == 6
          haveFmt = true
          bb.position(fmtStart + size + (size & 1))
        case "fact" =>
          factSamples = bb.getInt
          bb.position(bb.position() + (size - 4) + (size & 1))
        case "data" =>
          data = new Array[Byte](size)
          bb.get(data)
          bb.position(bb.position() + (size & 1))
        case _ =>
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(haveFmt, "no fmt chunk")
    require(data != null, "no data chunk")
    val n = if (factSamples >= 0) math.min(factSamples, data.length) else data.length
    val table = g711Table(aLaw)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = table(data(i) & 0xff).toShort; i += 1 }
    (sampleRate, out)
  }

  /** Peek a WAV's fmt-chunk audioFormat tag without decoding — the
    * dispatch key of [[decodeWavAuto]]. */
  def wavFormatTag(bytes: Array[Byte]): Int = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val riff = new Array[Byte](4); bb.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a RIFF file")
    bb.getInt
    val wave = new Array[Byte](4); bb.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "RIFF but not WAVE")
    while (bb.remaining() >= 8) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"corrupt chunk '${new String(id, "US-ASCII")}': size $size exceeds payload")
      if (new String(id, "US-ASCII") == "fmt ") {
        require(size >= 2, "fmt chunk too small for a format tag")
        return bb.getShort & 0xffff
      }
      bb.position(bb.position() + size + (size & 1))
    }
    throw new IllegalArgumentException("no fmt chunk")
  }

  /** WAV codec router: dispatch on the format tag to the matching REAL
    * decoder — the entry point for pipeline audio decode where the
    * container is known (RIFF/WAVE) but the codec inside is not.
    * Mixed-codec corpora just work; an unknown tag fails loudly with
    * the tag value (silently misreading media is this module's
    * anti-goal). */
  def decodeWavAuto(bytes: Array[Byte]): (Int, Array[Short]) =
    wavFormatTag(bytes) match {
      case 1    => decodeWavPcm16(bytes)
      case 0x11 => decodeWavImaAdpcm(bytes)
      case 6 | 7 => decodeWavG711(bytes)
      case t => throw new IllegalArgumentException(
        f"unsupported WAV format tag 0x$t%x — real decoders cover PCM16 (0x1), " +
          "IMA-ADPCM (0x11), and G.711 A-law/mu-law (0x6/0x7)")
    }

  // ------------------------------------------------------------------ //
  // BMP — BITMAPINFOHEADER, 24 bpp, uncompressed                       //
  // ------------------------------------------------------------------ //

  /** Grayscale grid (row-major, values 0-255) → 24 bpp BMP with
    * r = g = b, positive height (bottom-up rows), 4-byte row padding. */
  def encodeBmp24(gray: Array[Array[Int]]): Array[Byte] = {
    val h = gray.length
    val w = gray(0).length
    val rowBytes = (w * 3 + 3) & ~3
    val imageSize = rowBytes * h
    val bb = ByteBuffer.allocate(54 + imageSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + imageSize).putInt(0).putInt(54) // file size, reserved, pixel offset
    bb.putInt(40).putInt(w).putInt(h)              // info header, width, height (bottom-up)
    bb.putShort(1).putShort(24)                    // planes, bpp
    bb.putInt(0).putInt(imageSize)                 // BI_RGB, image size
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var r = h - 1 // bottom-up
    while (r >= 0) {
      var c = 0
      while (c < w) {
        val v = (gray(r)(c) & 0xff).toByte
        bb.put(v).put(v).put(v) // B G R
        c += 1
      }
      var pad = w * 3
      while ((pad & 3) != 0) { bb.put(0.toByte); pad += 1 }
      r -= 1
    }
    bb.array()
  }

  /** 24 bpp uncompressed BMP → grayscale grid ((r+g+b)/3, exact for the
    * equal-channel images [[encodeBmp24]] writes). Honors the pixel
    * data offset field, per-row padding, and BOTH row orders (positive
    * height = bottom-up, negative = top-down). */
  def decodeBmp24(bytes: Array[Byte]): Array[Array[Int]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54, "truncated BMP")
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt; bb.getInt
    val pixelOffset = bb.getInt
    val headerSize = bb.getInt
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val w = bb.getInt
    val rawH = bb.getInt
    val topDown = rawH < 0
    val h = math.abs(rawH)
    bb.getShort // planes
    val bpp = bb.getShort
    require(bpp == 24, s"not 24 bpp ($bpp)")
    val compression = bb.getInt
    require(compression == 0, s"compressed BMP (method $compression) needs a codec")
    val rowBytes = (w * 3 + 3) & ~3
    require(pixelOffset + rowBytes.toLong * h <= bytes.length, "truncated pixel data")
    val out = Array.ofDim[Int](h, w)
    var row = 0
    while (row < h) {
      val destR = if (topDown) row else h - 1 - row
      var pos = pixelOffset + row * rowBytes
      var c = 0
      while (c < w) {
        val b = bytes(pos) & 0xff
        val g = bytes(pos + 1) & 0xff
        val r = bytes(pos + 2) & 0xff
        out(destR)(c) = (r + g + b) / 3
        pos += 3
        c += 1
      }
      row += 1
    }
    out
  }

  // ------------------------------------------------------------------ //
  // PNG / JPEG — COMPRESSED formats via the JDK's own pure-Java        //
  // ImageIO plugins (no native codec binding: the javax.imageio        //
  // readers/writers for PNG, JPEG, BMP, GIF and TIFF ship inside       //
  // every Java SE runtime and run headless). This retired the          //
  // "compressed formats need native codecs" decode-fake claim for      //
  // still images (audio fell to IMA-ADPCM/G.711, video to the AVI      //
  // codecs below, MCV8 last).                                          //
  //                                                                    //
  // PNG is DEFLATE-compressed and LOSSLESS: decode(encode(g)) == g     //
  // byte-for-byte, so PNG decode is oracle-checkable the same way as   //
  // the BMP/WAV kernels (battery q100 — the DuckDB oracle recomputes   //
  // features from the pixel formula; any filter/zlib/row bug           //
  // hash-mismatches). JPEG is lossy: decode is REAL but approximate    //
  // by design, so it is spec-checked with an error bound instead of    //
  // an exact cross-engine oracle.                                      //
  // ------------------------------------------------------------------ //

  locally {
    System.setProperty("java.awt.headless", "true")
    // ImageIO's default stream cache is a TEMP FILE per encode/decode
    // call (FileCacheImageInput/OutputStream) — for the small in-memory
    // images this module round-trips, that is pure disk churn: at
    // corpus scale (one decode per document, battery q100/q103/q104)
    // it dominated the measured per-query time 3-8x and tied throughput
    // to /tmp's state. Memory caching is strictly better here.
    javax.imageio.ImageIO.setUseCache(false)
  }

  private def toImage(gray: Array[Array[Int]]): java.awt.image.BufferedImage = {
    val h = gray.length
    val w = gray(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = gray(r)(c) & 0xff
        img.setRGB(c, r, (v << 16) | (v << 8) | v)
        c += 1
      }
      r += 1
    }
    img
  }

  private def toGray(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val out = Array.ofDim[Int](img.getHeight, img.getWidth)
    var r = 0
    while (r < img.getHeight) {
      var c = 0
      while (c < img.getWidth) {
        val px = img.getRGB(c, r)
        out(r)(c) = (((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)) / 3
        c += 1
      }
      r += 1
    }
    out
  }

  private def write(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Grayscale grid → PNG bytes (RGB with r = g = b; lossless). */
  def encodePng(gray: Array[Array[Int]]): Array[Byte] =
    write(toImage(gray), "png")

  /** Grayscale grid → 8-bit INDEXED image over an explicit 256-entry
    * gray palette. Two traps this representation dodges, both verified
    * by CodecSpec round trips:
    *  - TYPE_BYTE_GRAY routes getRGB through a CS_GRAY→sRGB color-space
    *    transform (NOT identity — values shift);
    *  - feeding TYPE_INT_RGB to the GIF writer makes it quantize
    *    through its own palette (lossy for arbitrary grays).
    * An IndexColorModel whose entry v is exactly (v, v, v) survives
    * both the GIF and TIFF writers bit-for-bit, and getRGB on the
    * decoded palette image returns the entries verbatim. */
  private def toIndexedGrayImage(gray: Array[Array[Int]]): java.awt.image.BufferedImage = {
    val h = gray.length
    val w = gray(0).length
    val palette = Array.tabulate(256)(v => (0xff << 24) | (v << 16) | (v << 8) | v)
    val icm = new java.awt.image.IndexColorModel(
      8, 256, palette, 0, false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) { raster.setSample(c, r, 0, gray(r)(c) & 0xff); c += 1 }
      r += 1
    }
    img
  }

  /** Grayscale grid → GIF bytes (LZW-compressed, indexed — LOSSLESS
    * over the explicit gray palette, so oracle-checkable like PNG).
    * Interlace is explicitly DISABLED: the JDK's GIF writer interlaces
    * by default (progressive MODE_DEFAULT) and scrambles row order for
    * images of height 2–4 — the four-pass interlace schedule degenerates
    * there and writer and reader disagree. Non-interlaced output is
    * deterministic, still genuine LZW, and round-trips at every
    * geometry (CodecSpec property, h down to 1). */
  def encodeGif(gray: Array[Array[Int]]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(toIndexedGrayImage(gray), null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Grayscale grid → TIFF bytes through the JDK's TIFF plugin
    * (indexed, lossless — oracle-checkable like PNG). */
  def encodeTiff(gray: Array[Array[Int]]): Array[Byte] =
    write(toIndexedGrayImage(gray), "tif")

  /** ImageIO dispatches on magic bytes, not a format name — one reader
    * entry point serves every still-image format the JDK carries. */
  private def readAny(bytes: Array[Byte]): Array[Array[Int]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    toGray(img)
  }

  /** PNG bytes → grayscale grid. Exact inverse of [[encodePng]]
    * (PNG is lossless), and a REAL DEFLATE/zlib decode path. */
  def decodePng(bytes: Array[Byte]): Array[Array[Int]] = readAny(bytes)

  /** Grayscale grid → baseline JPEG bytes at the given quality. */
  def encodeJpeg(gray: Array[Array[Int]], quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(toImage(gray), null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** JPEG bytes → grayscale grid — a REAL Huffman+DCT decode through
    * the JDK codec. Lossy by design: values approximate the encoder's
    * input (close on smooth content, ringing at hard edges); exact
    * dimensions, deterministic within a JVM. */
  def decodeJpeg(bytes: Array[Byte]): Array[Array[Int]] = readAny(bytes)

  // ------------------------------------------------------------------ //
  // AVI — RIFF video container ('vids' stream), three REAL codecs:     //
  //  - uncompressed bottom-up 24 bpp DIB frames ('00db' chunks,        //
  //    biCompression 0): intra-frame, LOSSLESS, so decode is           //
  //    oracle-checkable the same way as BMP/PNG (battery q105 — the    //
  //    DuckDB oracle replays the per-frame pixel formula; any          //
  //    header-offset, chunk-padding, row-order or index bug            //
  //    hash-mismatches);                                               //
  //  - MJPEG ('00dc' chunks, biCompression 'MJPG'): intra-frame, every //
  //    frame a complete baseline JPEG through the JDK codec — real     //
  //    lossy video, spec-bounded like still JPEG;                      //
  //  - BI_RLE8 ('00dc' chunks, biCompression 1): a real INTER-frame    //
  //    codec — delta frames carry only changed runs and reference the  //
  //    previous frame for everything else, giving the stream genuine   //
  //    GOP structure (see the RLE8 section below; battery q106         //
  //    oracle-checks the cross-frame carry-over).                      //
  // A fourth codec, MCV8 (further below), adds MOTION COMPENSATION —  //
  // block-matching motion vectors + lossless residuals — closing the   //
  // last decode-fake scope entirely. Container layout follows the      //
  // public AVI RIFF spec: LIST(hdrl){avih, LIST(strl){strh,strf}},     //
  // LIST(movi){frame chunks}, idx1 — including the RIFF even-byte      //
  // chunk padding rule (odd-sized MJPEG frames exercise it).           //
  // ------------------------------------------------------------------ //

  private def fourcc(s: String): Int =
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)

  /** One DIB frame payload: the BMP pixel array ONLY (no file header) —
    * bottom-up BGR rows padded to 4 bytes, exactly what an AVI '00db'
    * chunk carries for biCompression 0. */
  private def dibFramePayload(gray: Array[Array[Int]]): Array[Byte] = {
    val h = gray.length
    val w = gray(0).length
    val rowBytes = (w * 3 + 3) & ~3
    val out = new Array[Byte](rowBytes * h)
    var r = h - 1
    var pos = 0
    while (r >= 0) {
      var c = 0
      while (c < w) {
        val v = (gray(r)(c) & 0xff).toByte
        out(pos) = v; out(pos + 1) = v; out(pos + 2) = v
        pos += 3; c += 1
      }
      pos += rowBytes - w * 3 // row pad
      r -= 1
    }
    out
  }

  /** Inverse of [[dibFramePayload]] given the strf dimensions. */
  private def dibFrameDecode(data: Array[Byte], w: Int, h: Int): Array[Array[Int]] = {
    val rowBytes = (w * 3 + 3) & ~3
    require(data.length >= rowBytes * h, "truncated DIB frame")
    val out = Array.ofDim[Int](h, w)
    var row = 0
    while (row < h) {
      var pos = row * rowBytes
      var c = 0
      while (c < w) {
        val b = data(pos) & 0xff
        val g = data(pos + 1) & 0xff
        val r = data(pos + 2) & 0xff
        out(h - 1 - row)(c) = (r + g + b) / 3 // bottom-up
        pos += 3; c += 1
      }
      row += 1
    }
    out
  }

  /** Shared container writer: avih/strh/strf headers, movi list, idx1
    * with per-frame keyframe flags and offsets relative to the movi
    * list's type field (the spec's common reading). 8 bpp streams
    * (BI_RLE8) carry the explicit 256-entry gray palette in strf. */
  private def writeAviContainer(
      payloads: Seq[Array[Byte]], keyframe: Seq[Boolean], fps: Int,
      w: Int, h: Int, handler: Int, compression: Int,
      bitCount: Int): Array[Byte] = {
    val chunkId = if (compression == 0 && bitCount == 24) "00db" else "00dc"
    val maxChunk = payloads.map(_.length).max
    val moviContent = payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val idxBytes = 16 * payloads.length
    val paletteBytes = if (bitCount == 8) 1024 else 0 // 256 RGBQUADs
    // hdrl: avih(8+56) + LIST strl(12 + strh(8+56) + strf(8+40+pal))
    val strlContent = 64 + (48 + paletteBytes)
    val hdrlContent = 64 + (12 + strlContent)
    val riffContent = 4 + (12 + hdrlContent) + (12 + moviContent) + (8 + idxBytes)
    val bb = ByteBuffer.allocate(8 + riffContent).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(fourcc("RIFF")).putInt(riffContent).putInt(fourcc("AVI "))
    // ---- LIST hdrl ----
    bb.putInt(fourcc("LIST")).putInt(4 + hdrlContent).putInt(fourcc("hdrl"))
    bb.putInt(fourcc("avih")).putInt(56)
    bb.putInt(1000000 / fps) // dwMicroSecPerFrame
    bb.putInt(0)             // dwMaxBytesPerSec
    bb.putInt(0)             // dwPaddingGranularity
    bb.putInt(0x10)          // dwFlags = AVIF_HASINDEX
    bb.putInt(payloads.length) // dwTotalFrames
    bb.putInt(0)             // dwInitialFrames
    bb.putInt(1)             // dwStreams
    bb.putInt(maxChunk)      // dwSuggestedBufferSize
    bb.putInt(w).putInt(h)
    bb.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    //   ---- LIST strl ----
    bb.putInt(fourcc("LIST")).putInt(4 + strlContent).putInt(fourcc("strl"))
    bb.putInt(fourcc("strh")).putInt(56)
    bb.putInt(fourcc("vids"))
    bb.putInt(handler)       // fccHandler
    bb.putInt(0)             // dwFlags
    bb.putShort(0).putShort(0) // wPriority, wLanguage
    bb.putInt(0)             // dwInitialFrames
    bb.putInt(1)             // dwScale
    bb.putInt(fps)           // dwRate (fps = rate/scale)
    bb.putInt(0)             // dwStart
    bb.putInt(payloads.length) // dwLength (frames)
    bb.putInt(maxChunk)      // dwSuggestedBufferSize
    bb.putInt(-1)            // dwQuality (default)
    bb.putInt(0)             // dwSampleSize (0 = one sample per chunk)
    bb.putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    bb.putInt(fourcc("strf")).putInt(40 + paletteBytes) // BITMAPINFOHEADER
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(bitCount.toShort) // planes, bpp
    bb.putInt(compression)
    bb.putInt(if (bitCount == 24) ((w * 3 + 3) & ~3) * h else maxChunk) // biSizeImage
    bb.putInt(0).putInt(0)   // dpi
    bb.putInt(if (bitCount == 8) 256 else 0).putInt(0) // biClrUsed, biClrImportant
    if (bitCount == 8) {
      var v = 0
      while (v < 256) { // identity gray palette: RGBQUAD = B,G,R,reserved
        bb.put(v.toByte).put(v.toByte).put(v.toByte).put(0.toByte)
        v += 1
      }
    }
    // ---- LIST movi ----
    bb.putInt(fourcc("LIST")).putInt(4 + moviContent).putInt(fourcc("movi"))
    val moviTypePos = bb.position() - 4 // offset base: the 'movi' fourcc
    val offsets = new Array[Int](payloads.length)
    payloads.zipWithIndex.foreach { case (p, i) =>
      offsets(i) = bb.position() - moviTypePos
      bb.putInt(fourcc(chunkId)).putInt(p.length).put(p)
      if ((p.length & 1) == 1) bb.put(0.toByte) // RIFF even-byte pad
    }
    // ---- idx1 ----
    bb.putInt(fourcc("idx1")).putInt(idxBytes)
    payloads.zipWithIndex.foreach { case (p, i) =>
      bb.putInt(fourcc(chunkId))
      bb.putInt(if (keyframe(i)) 0x10 else 0) // AVIIF_KEYFRAME
      bb.putInt(offsets(i))
      bb.putInt(p.length)
    }
    require(bb.remaining() == 0, s"AVI size accounting bug: ${bb.remaining()} bytes left")
    bb.array()
  }

  private def checkFrames(frames: Seq[Array[Array[Int]]], fps: Int): (Int, Int) = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(fps > 0, s"fps must be positive ($fps)")
    val h = frames.head.length
    val w = frames.head(0).length
    require(frames.forall(f => f.length == h && f(0).length == w),
      "all AVI frames must share one geometry")
    (w, h)
  }

  /** Grayscale frames → a complete, spec-valid AVI file. All frames
    * must share one geometry (the container has a single strf). With
    * `mjpeg = false` frames are stored as uncompressed DIB ('00db',
    * lossless); with `mjpeg = true` each frame is a standalone
    * baseline JPEG ('00dc', fccHandler/biCompression 'MJPG'). Both are
    * INTRA-frame codecs: every frame is a keyframe (idx1 flags all
    * set). For the inter-frame codec see [[encodeAviRle8]]. */
  def encodeAvi(
      frames: Seq[Array[Array[Int]]], fps: Int,
      mjpeg: Boolean = false, quality: Float = 0.9f): Array[Byte] = {
    val (w, h) = checkFrames(frames, fps)
    val payloads = frames.map { f =>
      if (mjpeg) encodeJpeg(f, quality) else dibFramePayload(f)
    }
    writeAviContainer(payloads, payloads.map(_ => true), fps, w, h,
      handler = if (mjpeg) fourcc("MJPG") else 0,
      compression = if (mjpeg) fourcc("MJPG") else 0, bitCount = 24)
  }

  // ------------------------------------------------------------------ //
  // BI_RLE8 — Microsoft RLE8 (biCompression 1, fccHandler 'MRLE'), a  //
  // real, publicly documented INTER-frame AVI codec in pure integer   //
  // byte ops: encoded runs (count,value), escape 00 00 = end of line, //
  // 00 01 = end of bitmap, 00 02 dx dy = position delta, 00 n (n≥3) = //
  // absolute literal run (word-aligned). In a video stream the        //
  // SKIPPED pixels (delta jumps, early EOL/EOB) mean "unchanged from  //
  // the PREVIOUS frame" — that carry-over is the inter-frame          //
  // dependency: a delta frame is undecodable without its             //
  // predecessors back to the nearest keyframe, exactly the GOP        //
  // structure real video codecs have. The encoder emits keyframes     //
  // every `keyframeInterval` frames (absolute re-encode, idx1         //
  // AVIIF_KEYFRAME set) and pure delta frames between (changed-run    //
  // encoding against the previous frame); the seek path              //
  // ([[decodeAviFrames]]) decodes forward from the nearest keyframe   //
  // — O(GOP), not O(stream). Lossless over the 8-bit gray palette,    //
  // so oracle-checkable INCLUDING the cross-frame carry-over          //
  // (battery q106: a pixel's value at frame k depends on which        //
  // earlier frame's delta last wrote it).                             //
  // ------------------------------------------------------------------ //

  private val BiRle8 = 1

  /** One RLE8 keyframe: every pixel written via encoded runs, rows
    * bottom-up, EOL per row, EOB at end. Greedy max-255 runs — legal
    * RLE8 with no absolute mode (the decoder still carries it). */
  private def rle8Keyframe(gray: Array[Array[Int]]): Array[Byte] = {
    val h = gray.length
    val w = gray(0).length
    val out = new java.io.ByteArrayOutputStream()
    var j = 0 // bitmap row, 0 = bottom
    while (j < h) {
      val row = gray(h - 1 - j)
      var c = 0
      while (c < w) {
        val v = row(c)
        var n = 1
        while (c + n < w && row(c + n) == v && n < 255) n += 1
        out.write(n); out.write(v & 0xff)
        c += n
      }
      out.write(0); out.write(0) // EOL
      j += 1
    }
    out.write(0); out.write(1) // EOB
    out.toByteArray
  }

  /** One RLE8 delta frame: only pixels differing from `prev` are
    * written; unchanged spans are crossed with 00 02 dx 00 position
    * deltas (chunked at 255) and untouched rows with bare EOLs, so
    * they carry over from the previous frame on decode. */
  private def rle8Delta(prev: Array[Array[Int]], cur: Array[Array[Int]]): Array[Byte] = {
    val h = cur.length
    val w = cur(0).length
    val out = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < h) {
      val pRow = prev(h - 1 - j)
      val cRow = cur(h - 1 - j)
      var pos = 0 // current decode column in this row
      var c = 0
      while (c < w) {
        if (cRow(c) == pRow(c)) c += 1
        else {
          var skip = c - pos
          while (skip > 0) { // cross the unchanged span
            val d = math.min(skip, 255)
            out.write(0); out.write(2); out.write(d); out.write(0)
            skip -= d
          }
          // encode the changed segment as greedy runs
          var e = c
          while (e < w && cRow(e) != pRow(e)) e += 1
          var k = c
          while (k < e) {
            val v = cRow(k)
            var n = 1
            while (k + n < e && cRow(k + n) == v && n < 255) n += 1
            out.write(n); out.write(v & 0xff)
            k += n
          }
          pos = e
          c = e
        }
      }
      out.write(0); out.write(0) // EOL (resets to next row, column 0)
      j += 1
    }
    out.write(0); out.write(1) // EOB
    out.toByteArray
  }

  /** Apply one RLE8 frame onto `canvas` (gray orientation, top row
    * first) IN PLACE — pixels the stream does not write keep their
    * previous-frame values, which is the codec's inter-frame carry.
    * Carries the full public op set incl. absolute mode and dy jumps
    * the encoder itself never emits. */
  private def rle8Apply(data: Array[Byte], canvas: Array[Array[Int]], palette: Array[Int]): Unit = {
    val h = canvas.length
    val w = canvas(0).length
    var j = 0 // bitmap row, 0 = bottom
    var col = 0
    var i = 0
    var done = false
    while (!done && i + 1 < data.length) {
      val b0 = data(i) & 0xff
      val b1 = data(i + 1) & 0xff
      i += 2
      if (b0 > 0) { // encoded run
        require(j < h && col + b0 <= w, s"RLE8 run overflows row $j at col $col")
        val v = palette(b1)
        val row = canvas(h - 1 - j)
        var k = 0
        while (k < b0) { row(col + k) = v; k += 1 }
        col += b0
      } else b1 match {
        case 0 => j += 1; col = 0 // EOL
        case 1 => done = true     // EOB
        case 2 =>                 // position delta
          require(i + 1 < data.length, "RLE8 truncated delta")
          col += data(i) & 0xff
          j += data(i + 1) & 0xff
          i += 2
        case n =>                 // absolute literal run, word-aligned
          require(j < h && col + n <= w, s"RLE8 absolute run overflows row $j")
          require(i + n <= data.length, "RLE8 truncated absolute run")
          val row = canvas(h - 1 - j)
          var k = 0
          while (k < n) { row(col + k) = palette(data(i + k) & 0xff); k += 1 }
          col += n
          i += n + (n & 1)
      }
    }
    require(done, "RLE8 stream missing end-of-bitmap")
  }

  /** Grayscale frames → AVI with the BI_RLE8 inter-frame codec: a
    * keyframe (absolute encoding, idx1 AVIIF_KEYFRAME) every
    * `keyframeInterval` frames, pure delta frames between. Lossless.
    * Sparse inter-frame change ⇒ delta frames are tiny — the codec's
    * actual purpose — and decoding any frame needs its GOP
    * predecessors, which [[decodeAviFrames]] honors. */
  def encodeAviRle8(
      frames: Seq[Array[Array[Int]]], fps: Int, keyframeInterval: Int = 8): Array[Byte] = {
    require(keyframeInterval > 0, s"keyframeInterval must be positive ($keyframeInterval)")
    val (w, h) = checkFrames(frames, fps)
    val payloads = frames.zipWithIndex.map { case (f, i) =>
      if (i % keyframeInterval == 0) rle8Keyframe(f)
      else rle8Delta(frames(i - 1), f)
    }
    writeAviContainer(payloads, frames.indices.map(_ % keyframeInterval == 0),
      fps, w, h, handler = fourcc("MRLE"), compression = BiRle8, bitCount = 8)
  }

  // ------------------------------------------------------------------ //
  // MCV8 — MOTION-COMPENSATED video (fourcc 'MCV8', 8-bit gray), the   //
  // textbook H.261/MPEG-1 P-frame construction in pure integer byte    //
  // ops: frames split into 16×16 macroblocks, each predicted from the  //
  // PREVIOUS reconstructed frame at an integer motion vector chosen    //
  // by exhaustive SAD (sum of absolute differences) argmin over a      //
  // ±7-pixel search window, plus a per-pixel residual that makes the   //
  // codec exactly LOSSLESS (residuals are mod-256 differences, so      //
  // pred + resid ≡ cur). This is the block-matching motion-estimation  //
  // + motion-compensated-prediction + residual-coding pipeline every   //
  // real inter-frame codec (H.26x/MPEG/VPx/AV1) is built on — minus    //
  // the transform/entropy stages, which only change the residual's     //
  // REPRESENTATION, not the motion semantics. Lossless residuals make  //
  // the whole chain oracle-checkable the q106 way, one step further:   //
  // a pixel's value at frame k is its last writer's formula traced     //
  // THROUGH the motion-vector chain back to a keyframe (battery q146   //
  // plants a translating scene and the oracle replays the closed       //
  // form), and CodecSpec pins that a pure in-range translation         //
  // yields SKIP blocks carrying exactly the planted vector — the       //
  // compression is real, not incidental.                               //
  //                                                                    //
  // Frame payload ('00dc' chunk body):                                 //
  //   'K' + w·h literal gray bytes (TOP-DOWN row-major), or            //
  //   'P' + per macroblock in raster order:                            //
  //         mode byte (0 = SKIP: block is the motion-shifted           //
  //         prediction verbatim; 1 = RESIDUAL), dx+7, dy+7 (bytes),    //
  //         then bw·bh residual bytes iff mode 1.                      //
  // Search contract (what makes encode deterministic): candidates      //
  // scan dy then dx, both ascending −7..7, a candidate is valid iff    //
  // the full reference block stays in frame, FIRST strict minimum      //
  // wins, SKIP iff its SAD is exactly 0. Keyframes every               //
  // `keyframeInterval` frames (idx1 AVIIF_KEYFRAME set) give the       //
  // stream the same GOP seek structure as RLE8 — decodeAviFrames'     //
  // O(GOP) path applies unchanged.                                     //
  // ------------------------------------------------------------------ //

  private val McvFourcc = fourcc("MCV8")
  private val McvBlock = 16
  private val McvRange = 7

  private def mcvKeyframe(gray: Array[Array[Int]]): Array[Byte] = {
    val h = gray.length; val w = gray(0).length
    val out = new Array[Byte](1 + w * h)
    out(0) = 'K'.toByte
    var i = 1; var r = 0
    while (r < h) {
      var c = 0
      while (c < w) { out(i) = gray(r)(c).toByte; i += 1; c += 1 }
      r += 1
    }
    out
  }

  /** Motion search for one block: (dx, dy, sad) under the stated scan/
    * tie contract. */
  private def mcvSearch(prev: Array[Array[Int]], cur: Array[Array[Int]],
      bx: Int, by: Int, bw: Int, bh: Int): (Int, Int, Int) = {
    val h = cur.length; val w = cur(0).length
    var bestSad = Int.MaxValue; var bestDx = 0; var bestDy = 0
    var dy = -McvRange
    while (dy <= McvRange) {
      val sy = by + dy
      if (sy >= 0 && sy + bh <= h) {
        var dx = -McvRange
        while (dx <= McvRange) {
          val sx = bx + dx
          if (sx >= 0 && sx + bw <= w) {
            var sad = 0; var r = 0
            while (r < bh && sad < bestSad) { // early out once beaten
              var c = 0
              while (c < bw) {
                sad += math.abs(cur(by + r)(bx + c) - prev(sy + r)(sx + c))
                c += 1
              }
              r += 1
            }
            if (sad < bestSad) { bestSad = sad; bestDx = dx; bestDy = dy }
          }
          dx += 1
        }
      }
      dy += 1
    }
    (bestDx, bestDy, bestSad)
  }

  private def mcvPFrame(prev: Array[Array[Int]], cur: Array[Array[Int]]): Array[Byte] = {
    val h = cur.length; val w = cur(0).length
    val buf = new java.io.ByteArrayOutputStream(1 + w * h / 4)
    buf.write('P'.toInt)
    var by = 0
    while (by < h) {
      val bh = math.min(McvBlock, h - by)
      var bx = 0
      while (bx < w) {
        val bw = math.min(McvBlock, w - bx)
        val (dx, dy, sad) = mcvSearch(prev, cur, bx, by, bw, bh)
        buf.write(if (sad == 0) 0 else 1)
        buf.write(dx + McvRange)
        buf.write(dy + McvRange)
        if (sad != 0) {
          var r = 0
          while (r < bh) {
            var c = 0
            while (c < bw) {
              buf.write((cur(by + r)(bx + c) - prev(by + dy + r)(bx + dx + c)) & 0xff)
              c += 1
            }
            r += 1
          }
        }
        bx += McvBlock
      }
      by += McvBlock
    }
    buf.toByteArray
  }

  /** Apply one MCV8 frame onto `canvas` in place. Defensive bounds on
    * every read — hostile bytes must throw, not scribble. */
  private def mcvApply(data: Array[Byte], canvas: Array[Array[Int]]): Unit = {
    val h = canvas.length; val w = canvas(0).length
    require(data.length >= 1, "MCV8 empty frame chunk")
    (data(0) & 0xff) match {
      case 'K' =>
        require(data.length == 1 + w * h,
          s"MCV8 keyframe size ${data.length} != ${1 + w * h}")
        var i = 1; var r = 0
        while (r < h) {
          var c = 0
          while (c < w) { canvas(r)(c) = data(i) & 0xff; i += 1; c += 1 }
          r += 1
        }
      case 'P' =>
        // prediction reads the canvas AS OF the previous frame; blocks
        // earlier in raster order must not feed later ones
        val prev = canvas.map(_.clone())
        var i = 1
        var by = 0
        while (by < h) {
          val bh = math.min(McvBlock, h - by)
          var bx = 0
          while (bx < w) {
            val bw = math.min(McvBlock, w - bx)
            require(i + 3 <= data.length, "MCV8 truncated block header")
            val mode = data(i) & 0xff
            val dx = (data(i + 1) & 0xff) - McvRange
            val dy = (data(i + 2) & 0xff) - McvRange
            i += 3
            require(mode == 0 || mode == 1, s"MCV8 unknown block mode $mode")
            val sx = bx + dx; val sy = by + dy
            require(sx >= 0 && sx + bw <= w && sy >= 0 && sy + bh <= h,
              s"MCV8 motion vector ($dx,$dy) leaves the frame at block ($bx,$by)")
            if (mode == 0) {
              var r = 0
              while (r < bh) {
                var c = 0
                while (c < bw) { canvas(by + r)(bx + c) = prev(sy + r)(sx + c); c += 1 }
                r += 1
              }
            } else {
              require(i + bw * bh <= data.length, "MCV8 truncated residual block")
              var r = 0
              while (r < bh) {
                var c = 0
                while (c < bw) {
                  canvas(by + r)(bx + c) = (prev(sy + r)(sx + c) + (data(i) & 0xff)) & 0xff
                  i += 1; c += 1
                }
                r += 1
              }
            }
            bx += McvBlock
          }
          by += McvBlock
        }
        require(i == data.length, s"MCV8 trailing bytes: ${data.length - i}")
      case other => throw new IllegalArgumentException(
        s"MCV8 unknown frame type $other")
    }
  }

  /** Grayscale frames → AVI with the MCV8 motion-compensated codec: a
    * keyframe every `keyframeInterval` frames, P-frames (block motion
    * vectors + mod-256 residuals against the previous frame) between.
    * Exactly lossless; a scene translating ≤ ±7 px/frame compresses to
    * SKIP blocks (3 bytes per 16×16 block). */
  def encodeAviMcv(
      frames: Seq[Array[Array[Int]]], fps: Int, keyframeInterval: Int = 8): Array[Byte] = {
    require(keyframeInterval > 0, s"keyframeInterval must be positive ($keyframeInterval)")
    val (w, h) = checkFrames(frames, fps)
    val payloads = frames.zipWithIndex.map { case (f, i) =>
      if (i % keyframeInterval == 0) mcvKeyframe(f)
      else mcvPFrame(frames(i - 1), f)
    }
    writeAviContainer(payloads, frames.indices.map(_ % keyframeInterval == 0),
      fps, w, h, handler = McvFourcc, compression = McvFourcc, bitCount = 8)
  }

  /** Parsed container metadata plus the frame-chunk table: (bodyOffset,
    * size, keyframe) per video frame, in stream order — located but NOT
    * decoded, so callers can seek-decode a sample of frames without
    * paying for the rest (the access pattern a 100 TB video corpus
    * needs). `palette` maps 8-bit indices to gray values for
    * palettized streams (BI_RLE8); null for true-color/MJPG. Keyframe
    * flags come from idx1; when the container has no index the walk
    * marks only frame 0 (the conservative truth for inter-frame
    * streams — intra codecs ignore the flag entirely). */
  private case class AviStream(
      fps: Int, w: Int, h: Int, compression: Int,
      chunks: IndexedSeq[(Int, Int, Boolean)], palette: Array[Int])

  /** Chunk-walking parser of the real container: strh (rate/scale →
    * fps) and strf (geometry + biCompression) from the hdrl list, then
    * the frame-chunk table. When the file carries an idx1 index
    * (AVIF_HASINDEX) the table comes from the INDEX — one bounded read
    * per frame, no movi walk — honoring both offset conventions in the
    * wild (relative to the movi list's type field, per spec; absolute
    * file offsets, per a common old muxer bug: disambiguated by
    * checking which interpretation lands on a frame chunk header).
    * Without an index it walks the movi list — including 'LIST rec '
    * interleave sublists some muxers emit. Unknown chunks (JUNK, …)
    * are skipped with the even-byte padding rule. Rejects non-'vids'
    * streams and any biCompression other than 0/'MJPG'/BI_RLE8 loudly —
    * silently misreading media is the failure mode this module exists
    * to avoid. */
  private def parseAvi(bytes: Array[Byte]): AviStream = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 12, "truncated AVI")
    require(bb.getInt(0) == fourcc("RIFF"), "not a RIFF file")
    val riffSize = bb.getInt(4)
    require(8 + riffSize <= bytes.length, "truncated RIFF payload")
    require(bb.getInt(8) == fourcc("AVI "), "RIFF is not an AVI")
    val end = 8 + riffSize
    var fps = 0
    var w = 0
    var h = 0
    var compression = 0
    var haveStrh = false
    var haveStrf = false
    var moviType = -1 // file offset of the movi list's 'movi' fourcc
    var idx1Body = -1
    var idx1Size = 0
    var palette: Array[Int] = null
    val walked = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    def isFrameId(id: Int): Boolean = id == fourcc("00db") || id == fourcc("00dc")

    // Walk chunks in [from, until); recurse into LIST hdrl/strl/movi/rec.
    // Defensive bounds for UNTRUSTED bytes: a negative declared size
    // would walk the position backward (infinite loop), and unbounded
    // LIST nesting would overflow the stack — both are exactly the
    // kind of hostile input a corpus-scale media scan must survive by
    // failing loudly, not hanging an executor.
    def walk(from: Int, until: Int, inMovi: Boolean, depth: Int): Unit = {
      require(depth <= 32, "pathological LIST nesting")
      var pos = from
      while (pos + 8 <= until) {
        val id = bb.getInt(pos)
        val size = bb.getInt(pos + 4)
        val body = pos + 8
        require(size >= 0, s"negative chunk size at $pos")
        require(body + size <= until, s"chunk overruns its parent at $pos")
        if (id == fourcc("LIST")) {
          val listType = bb.getInt(body)
          if (listType == fourcc("movi")) {
            moviType = body
            walk(body + 4, body + size, inMovi = true, depth + 1)
          } else if (listType == fourcc("hdrl") || listType == fourcc("strl") ||
              listType == fourcc("rec "))
            walk(body + 4, body + size, inMovi, depth + 1)
        } else if (id == fourcc("strh")) {
          if (!haveStrh) { // first stream only; this decoder is single-stream
            require(bb.getInt(body) == fourcc("vids"),
              "first AVI stream is not video")
            val scale = bb.getInt(body + 20)
            val rate = bb.getInt(body + 24)
            require(scale > 0 && rate > 0, "bad strh rate/scale")
            fps = rate / scale
            haveStrh = true
          }
        } else if (id == fourcc("strf")) {
          if (!haveStrf && haveStrh) {
            w = bb.getInt(body + 4)
            h = bb.getInt(body + 8)
            val bpp = bb.getShort(body + 14)
            compression = bb.getInt(body + 16)
            require(compression == fourcc("MJPG") || (compression == 0 && bpp == 24) ||
                (compression == BiRle8 && bpp == 8) ||
                (compression == McvFourcc && bpp == 8),
              s"unsupported AVI codec (biCompression $compression, $bpp bpp) " +
                "— this decoder carries DIB24, MJPG, RLE8 and MCV8")
            require(w > 0 && h > 0, s"bad strf geometry ${w}x$h")
            if (bpp == 8) { // read the palette: RGBQUADs after the 40-byte header
              val declared = bb.getInt(body + 32) // biClrUsed (0 = full 256)
              val n = if (declared == 0) 256 else declared
              require(size >= 40 + 4 * n, "strf palette truncated")
              palette = Array.tabulate(256) { v =>
                if (v < n) {
                  val b = bb.get(body + 40 + 4 * v) & 0xff
                  val g = bb.get(body + 40 + 4 * v + 1) & 0xff
                  val r = bb.get(body + 40 + 4 * v + 2) & 0xff
                  (r + g + b) / 3
                } else 0
              }
            }
            haveStrf = true
          }
        } else if (id == fourcc("idx1")) {
          idx1Body = body
          idx1Size = size
        } else if (inMovi && isFrameId(id)) {
          walked += ((body, size))
        } // else: JUNK / unknown — skip
        pos = body + size + (size & 1) // RIFF even-byte padding
      }
    }
    walk(12, end, inMovi = false, depth = 0)
    require(haveStrh && haveStrf, "AVI missing strh/strf headers")

    // Prefer the idx1 table: chunk locations + keyframe flags in
    // O(frames) bounded reads.
    val chunks: IndexedSeq[(Int, Int, Boolean)] =
      if (idx1Body >= 0 && moviType >= 0 && idx1Size >= 16) {
        val entries = (0 until idx1Size / 16).flatMap { i =>
          val e = idx1Body + 16 * i
          val eid = bb.getInt(e)
          if (!isFrameId(eid)) None // non-video entries (audio, palette)
          else {
            val flags = bb.getInt(e + 4)
            val off = bb.getInt(e + 8)
            val sz = bb.getInt(e + 12)
            require(sz >= 0, s"idx1 entry $i has a negative size")
            // spec offset: relative to the 'movi' fourcc; old-muxer
            // quirk: absolute file offset. Accept whichever lands on a
            // matching chunk header.
            val rel = moviType + off
            val base =
              if (rel + 8 <= end && bb.getInt(rel) == eid) rel
              else if (off + 8 <= end && bb.getInt(off) == eid) off
              else -1
            require(base >= 0, s"idx1 entry $i points at no frame chunk")
            require(base + 8 + sz <= end, s"idx1 entry $i overruns the file")
            Some((base + 8, sz, (flags & 0x10) != 0)) // AVIIF_KEYFRAME
          }
        }
        if (entries.nonEmpty) entries
        else walked.toIndexedSeq.zipWithIndex.map { case ((o, s), i) => (o, s, i == 0) }
      } else walked.toIndexedSeq.zipWithIndex.map { case ((o, s), i) => (o, s, i == 0) }
    AviStream(fps, w, h, compression, chunks, palette)
  }

  private def isInterFrame(st: AviStream): Boolean =
    st.compression == BiRle8 || st.compression == McvFourcc

  /** Decode one INTRA frame chunk (DIB24 / MJPG). */
  private def decodeAviChunk(
      bytes: Array[Byte], st: AviStream, chunk: (Int, Int, Boolean)): Array[Array[Int]] = {
    val (off, size, _) = chunk
    val data = new Array[Byte](size)
    System.arraycopy(bytes, off, data, 0, size)
    if (st.compression == fourcc("MJPG")) decodeJpeg(data)
    else dibFrameDecode(data, st.w, st.h)
  }

  /** Apply INTER-frame chunk `i` (RLE8 or MCV8) onto the running
    * canvas in place. */
  private def interApplyChunk(
      bytes: Array[Byte], st: AviStream, i: Int, canvas: Array[Array[Int]]): Unit = {
    val (off, size, _) = st.chunks(i)
    val data = new Array[Byte](size)
    System.arraycopy(bytes, off, data, 0, size)
    if (st.compression == BiRle8) rle8Apply(data, canvas, st.palette)
    else mcvApply(data, canvas)
  }

  /** AVI bytes → (fps, ALL decoded grayscale frames, in stream order).
    * Inter-frame streams (RLE8) fold the canvas forward frame by
    * frame. See [[parseAvi]] for the container rules this reader
    * honors. */
  def decodeAvi(bytes: Array[Byte]): (Int, Seq[Array[Array[Int]]]) = {
    val st = parseAvi(bytes)
    if (!isInterFrame(st)) (st.fps, st.chunks.map(decodeAviChunk(bytes, st, _)))
    else {
      // an inter-frame stream not opening on a keyframe has no defined
      // frame-0 content — decoding it against a blank canvas would be
      // silent garbage, the failure mode this module exists to avoid
      require(st.chunks.isEmpty || st.chunks.head._3,
        "inter-frame stream does not start with a keyframe")
      val canvas = Array.ofDim[Int](st.h, st.w)
      val out = st.chunks.indices.map { i =>
        interApplyChunk(bytes, st, i, canvas)
        canvas.map(_.clone())
      }
      (st.fps, out)
    }
  }

  /** Total video frames in the container, WITHOUT decoding any — the
    * idx1-or-walk chunk table length. */
  def aviFrameCount(bytes: Array[Byte]): Int = parseAvi(bytes).chunks.length

  /** Seek-decode: (fps, (frameIdx, frame) for exactly the requested
    * stream indices, in the given order). INTRA streams (DIB24/MJPG)
    * decode only the requested chunks — frames outside the sample are
    * LOCATED (via idx1 when present) but never decoded. INTER-frame
    * streams (RLE8) decode each target's GOP: forward from the nearest
    * keyframe at or before it (idx1 AVIIF_KEYFRAME flags; a container
    * without an index conservatively restarts at frame 0), sharing the
    * canvas walk across targets so overlapping GOPs are decoded once.
    * Either way the cost is O(sampled work) — O(sample) intra,
    * O(GOP span) inter — not O(stream), which at frames-per-payload ≫
    * sample size is the whole economics of frame-sampled video
    * featurization ([[Multimodal.decodeVideoAndEmbed]] rides this).
    * Out-of-range indices fail loudly. */
  def decodeAviFrames(
      bytes: Array[Byte], indices: Seq[Int]): (Int, Seq[(Int, Array[Array[Int]])]) = {
    val st = parseAvi(bytes)
    indices.foreach(i => require(i >= 0 && i < st.chunks.length,
      s"frame index $i outside stream of ${st.chunks.length}"))
    if (!isInterFrame(st)) {
      (st.fps, indices.map(i => (i, decodeAviChunk(bytes, st, st.chunks(i)))))
    } else {
      // one forward canvas walk over the union of the targets' GOPs
      require(st.chunks.head._3, "inter-frame stream does not start with a keyframe")
      val targets = indices.distinct.sorted
      val decoded = scala.collection.mutable.Map.empty[Int, Array[Array[Int]]]
      var canvas: Array[Array[Int]] = null
      var pos = -1 // last chunk applied to the canvas
      targets.foreach { t =>
        val kf = (t to 0 by -1).find(st.chunks(_)._3).getOrElse(0)
        if (canvas == null || kf > pos) { // restart at this GOP's keyframe
          canvas = Array.ofDim[Int](st.h, st.w)
          pos = kf - 1
        }
        while (pos < t) {
          pos += 1
          interApplyChunk(bytes, st, pos, canvas)
        }
        decoded(t) = canvas.map(_.clone())
      }
      (st.fps, indices.map(i => (i, decoded(i))))
    }
  }
}
