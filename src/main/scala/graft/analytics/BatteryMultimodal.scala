package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.clean.TextClean
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.operators.AsOfJoin
import graft.quality.QualitySuite
import graft.similarity.Similarity
import graft.star.Sk

/** Multimodal codecs, layout, PQ/ANN compressed search, BPE, hash families (q100-q123).
  *
  * One link of the [[Battery]] mixin chain — the battery is split by
  * family for reviewability; the chain preserves the original single-
  * object member order (and with it val-initialization order) exactly.
  */
trait BatteryMultimodal extends BatteryCuration {

  /** REAL compressed-format (PNG/DEFLATE) image decode verified
    * cross-engine, closing the last DecodeStub gap for still images:
    * a deterministic 12×17 grayscale image is encoded into genuine
    * PNG bytes through the JDK's pure-Java ImageIO codec (zlib
    * DEFLATE, PNG row filters) and decoded back before 4×4-block
    * pixel sums (ceil-partial edge blocks — width 17 forces one).
    * PNG is lossless, so the oracle recomputes the sums straight from
    * the pixel formula — any filter, zlib, channel or row-order bug
    * hash-mismatches. JPEG (lossy by design) is spec-checked with an
    * error bound instead (CodecSpec). */
  val q100 = Q("q100_png_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(12, 17)((r, c) =>
            ((id * 11 + r * 19 + c * 23) % 256).toInt)
          val g = graft.multimodal.Codec.decodePng(
            graft.multimodal.Codec.encodePng(gray))
          for (br <- 0 until 3; bc <- 0 until 5) yield {
            var sum = 0L
            var r = br * 4
            while (r < math.min(br * 4 + 4, 12)) {
              var c = bc * 4
              while (c < math.min(bc * 4 + 4, 17)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*11 + r*19 + c*23) % 256 AS v
      FROM documents, range(0, 12) t(r), range(0, 17) u(c))
      SELECT media_id, r // 4 AS block_row, c // 4 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, r // 4, c // 4
      ORDER BY media_id, block_row, block_col"""))

  /** The FULL image-dedup pipeline as ONE oracle-checked query —
    * decode → embed → SemDeDup, no fake anywhere: each selected doc
    * renders a deterministic 16×16 grayscale image into genuine PNG
    * bytes, [[Multimodal.decodeImageAndEmbed]] decodes them back
    * (real DEFLATE/zlib through the JDK codec) behind
    * [[graft.operators.Rebalance.forCpuStage]] (ImageIO decode is real
    * CPU work — the valve spreads a split-starved scan across cores;
    * PlanSpec pins the exchange), resizes 16×16 → 8×8 and pools to the
    * 16-dim embedding, and [[Similarity.semDedup]] dedups the result
    * (k = 8, iters = 2, θ = 0.99). Images repeat with period 256 in
    * doc_id (11 is invertible mod 256), so identical-image classes
    * exist at every SF and θ = 0.99 selects exactly them. PNG is
    * lossless and the pooled quantization is boundary-safe (pooled
    * sums s ∈ [0, 1020] give embedding grid points s·50/51 — never
    * within 1/102 of a rounding boundary, vs ≤ 6·10⁻⁵ float error),
    * so the oracle recomputes the embeddings arithmetically from the
    * pixel formula and replays q94's integer-exact Lloyd + cosine +
    * recursive-CC + representative chain. doc_id % 8 bounds the
    * pairwise stage, not the decode-path coverage. */
  /** GIF decode verified cross-engine — same scheme as q100 for the
    * THIRD compressed still format: a deterministic 9×13 grayscale
    * image goes through the indexed-gray GIF encoder (real LZW, and
    * lossless ONLY because the palette is explicit — Codec scaladoc)
    * and the magic-dispatch decoder before 3×3-block sums (width 13
    * forces a partial edge block). The oracle recomputes from the
    * pixel formula; any palette, LZW, or dispatch bug hash-mismatches. */
  val q103 = Q("q103_gif_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(9, 13)((r, c) =>
            ((id * 13 + r * 29 + c * 7) % 256).toInt)
          val g = graft.multimodal.Codec.decodePng(
            graft.multimodal.Codec.encodeGif(gray))
          for (br <- 0 until 3; bc <- 0 until 5) yield {
            var sum = 0L
            var r = br * 3
            while (r < math.min(br * 3 + 3, 9)) {
              var c = bc * 3
              while (c < math.min(bc * 3 + 3, 13)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*13 + r*29 + c*7) % 256 AS v
      FROM documents, range(0, 9) t(r), range(0, 13) u(c))
      SELECT media_id, r // 3 AS block_row, c // 3 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, r // 3, c // 3
      ORDER BY media_id, block_row, block_col"""))

  /** TIFF decode verified cross-engine — the FOURTH still format, same
    * scheme: 8×11 indexed-gray TIFF (the JDK's TIFF plugin) → decode →
    * 4×4-block sums (width 11 forces a partial edge block); oracle
    * from the pixel formula. */
  val q104 = Q("q104_tiff_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val gray = Array.tabulate(8, 11)((r, c) =>
            ((id * 17 + r * 5 + c * 19) % 256).toInt)
          val g = graft.multimodal.Codec.decodePng(
            graft.multimodal.Codec.encodeTiff(gray))
          for (br <- 0 until 2; bc <- 0 until 3) yield {
            var sum = 0L
            var r = br * 4
            while (r < math.min(br * 4 + 4, 8)) {
              var c = bc * 4
              while (c < math.min(bc * 4 + 4, 11)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*17 + r*5 + c*19) % 256 AS v
      FROM documents, range(0, 8) t(r), range(0, 11) u(c))
      SELECT media_id, r // 4 AS block_row, c // 4 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, r // 4, c // 4
      ORDER BY media_id, block_row, block_col"""))

  /** q101's decode input, split out (like [[Similarity.withinClusterPairs]])
    * so PlanSpec can pin the CPU-stage rebalance exchange — semDedup's
    * checkpoint barrier hides the decode fragment from the end-to-end
    * explain. */
  private[graft] def q101MediaRebalanced(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") % 8 === 0).as[Long]
      .map { id =>
        val gray = Array.tabulate(16, 16)((r, c) =>
          ((id * 11 + r * 19 + c * 23) % 256).toInt)
        Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 16, 16, 0, 0L),
          graft.multimodal.Codec.encodePng(gray))
      }
    graft.operators.Rebalance.forCpuStage(media.toDF())
  }

  val q101 = Q("q101_image_semdedup",
    (s, dir) => {
      import s.implicits._
      val feats = Multimodal.decodeImageAndEmbed(
        q101MediaRebalanced(s, dir).as[Multimodal.MediaRow])
      Similarity.semDedup(
          feats.select(col("media_id").as("vec_id"), col("embedding")),
          "vec_id", "embedding", k = 8, iters = 2, theta = 0.99)
        .orderBy("vec_id")
    },
    Some("""WITH RECURSIVE px AS (SELECT doc_id, pr, pc,
        SUM((doc_id*11 + (4*pr + 2*dr)*19 + (4*pc + 2*dc)*23) % 256) AS s
      FROM documents, range(0, 4) t(pr), range(0, 4) u(pc),
           range(0, 2) v(dr), range(0, 2) w(dc)
      WHERE doc_id % 8 = 0
      GROUP BY doc_id, pr, pc),
      base AS (SELECT doc_id AS vec_id,
        list(CAST(round(CAST(s*50 AS DOUBLE)/51) AS BIGINT) ORDER BY pr, pc) AS qv
      FROM px GROUP BY doc_id),
      ex AS (SELECT vec_id, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS x
             FROM base, range(1, 17) t(i)),
      c0 AS (SELECT vec_id AS cid, qv FROM base ORDER BY vec_id LIMIT 8),
      cx0 AS (SELECT cid, CAST(i AS INT) AS pos, qv[CAST(i AS INT)] AS s,
                CAST(1 AS BIGINT) AS n
              FROM c0, range(1, 17) t(i)),
      d1 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx0 USING (pos) GROUP BY vec_id, cid),
      a1 AS (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d1),
      m1 AS (SELECT vec_id, cid FROM a1 WHERE rn = 1),
      cx1 AS (SELECT cid, pos, CAST(SUM(x) AS BIGINT) AS s,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM ex JOIN m1 USING (vec_id) GROUP BY cid, pos),
      d2 AS (SELECT vec_id, cid,
               CAST(SUM((n*x - s)*(n*x - s)) AS BIGINT) AS num, MAX(n) AS n
             FROM ex JOIN cx1 USING (pos) GROUP BY vec_id, cid),
      a2 AS (SELECT vec_id, cid, num,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(num AS DOUBLE)/CAST(n*n AS DOUBLE), cid) AS rn
             FROM d2),
      mem AS (SELECT vec_id, cid, num FROM a2 WHERE rn = 1),
      pr AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
               CAST(list_sum(list_transform(list_zip(qa.qv, qb.qv), p -> p[1]*p[2])) AS DOUBLE)
               / (sqrt(CAST(list_sum(list_transform(qa.qv, x -> x*x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(qb.qv, x -> x*x)) AS DOUBLE))) AS cosine
             FROM mem a JOIN mem b ON a.cid = b.cid AND a.vec_id < b.vec_id
             JOIN base qa ON qa.vec_id = a.vec_id
             JOIN base qb ON qb.vec_id = b.vec_id),
      ed AS (SELECT ia, ib FROM pr WHERE cosine >= 0.99),
      edges AS (SELECT ia AS src, ib AS dst FROM ed UNION SELECT ib, ia FROM ed),
      walk(src, reach) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT w.src, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
      comp AS (SELECT src AS vec_id, MIN(reach) AS component FROM walk GROUP BY src),
      rep AS (SELECT component, vec_id,
                row_number() OVER (PARTITION BY component
                  ORDER BY num DESC, vec_id) AS rn2
              FROM comp JOIN mem USING (vec_id))
      SELECT m.vec_id, m.cid, COALESCE(c.component, m.vec_id) AS component,
        (c.component IS NULL OR r.vec_id IS NOT NULL) AS kept
      FROM mem m LEFT JOIN comp c USING (vec_id)
      LEFT JOIN (SELECT vec_id FROM rep WHERE rn2 = 1) r ON r.vec_id = m.vec_id
      ORDER BY m.vec_id"""))

  /** REAL compressed-AUDIO decode verified cross-engine — IMA-ADPCM
    * WAV (format tag 0x11), the codec that closes the DecodeStub's
    * audio half: each doc synthesizes deterministic PCM16 samples,
    * Spark encodes them into a genuine one-block IMA WAV (state
    * header, low-nibble-first packing, fact chunk) and DECODES IT BACK
    * (Codec.decodeWavImaAdpcm) before exact integer window energies
    * over the RECONSTRUCTION. ADPCM is lossy, so the oracle cannot use
    * the synthesis formula directly — instead it replays the
    * ENCODER+DECODER integer recurrence itself (successive-
    * approximation quantizer, step/index tables, int16 clamps) as a
    * recursive CTE over the inlined step table. Any container,
    * nibble-order, table, or clamp bug hash-mismatches. 65 samples =
    * exactly one blockAlign-36 block; |s| ≤ 32768 ⇒ window energy
    * ≤ 1.7·10¹⁰ — exact BIGINT. */
  val q102 = Q("q102_adpcm_window_energy",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val samples = Array.tabulate(65)(i =>
            (((id * 31 + i * 17) % 2003) - 1001).toShort)
          val wav = graft.multimodal.Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36)
          val (sr, rec) = graft.multimodal.Codec.decodeWavImaAdpcm(wav)
          require(sr == 8000 && rec.length == 65, "ADPCM round-trip lost data")
          (0 until 4).map { w =>
            var e = 0L
            var k = 0
            while (k < 16) { val v = rec(w * 16 + k).toLong; e += v * v; k += 1 }
            (id, w.toLong, e)
          }
        }
        .toDF("media_id", "window_idx", "energy")
        .orderBy("media_id", "window_idx")
    },
    Some {
      val stepsVals = graft.multimodal.Codec.ImaStepTable.zipWithIndex
        .map { case (st, i) => s"($i,$st)" }.mkString(",")
      s"""WITH RECURSIVE steps(six, st) AS (SELECT * FROM (VALUES $stepsVals) v(six, st)),
        rec AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS i,
                 CAST((doc_id*31) % 2003 - 1001 AS BIGINT) AS pred,
                 CAST(0 AS BIGINT) AS ix
          FROM documents
          UNION ALL
          SELECT doc_id, i + 1,
            greatest(-32768, least(32767,
              pred + CASE WHEN sgn = 8 THEN -diff ELSE diff END)),
            greatest(0, least(88,
              ix + CASE nib3 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6
                             WHEN 7 THEN 8 ELSE -1 END))
          FROM (
            SELECT l3.*,
              (st // 8) + f4*st + f2*(st // 2) + f1*(st // 4) AS diff,
              4*f4 + 2*f2 + f1 AS nib3
            FROM (
              SELECT l2.*, CASE WHEN ad3 >= st // 4 THEN 1 ELSE 0 END AS f1
              FROM (
                SELECT l1.*,
                  CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END AS f2,
                  ad2 - (CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END)*(st // 2) AS ad3
                FROM (
                  SELECT l0.*,
                    CASE WHEN ad >= st THEN 1 ELSE 0 END AS f4,
                    ad - (CASE WHEN ad >= st THEN 1 ELSE 0 END)*st AS ad2
                  FROM (
                    SELECT r.doc_id, r.i, r.pred, r.ix, s.st,
                      CASE WHEN r.smp < r.pred THEN 8 ELSE 0 END AS sgn,
                      abs(r.smp - r.pred) AS ad
                    FROM (SELECT *, (doc_id*31 + (i+1)*17) % 2003 - 1001 AS smp
                          FROM rec WHERE i < 64) r
                    JOIN steps s ON s.six = r.ix
                  ) l0
                ) l1
              ) l2
            ) l3
          )
        )
        SELECT doc_id AS media_id, CAST(i // 16 AS BIGINT) AS window_idx,
          CAST(SUM(pred*pred) AS BIGINT) AS energy
        FROM rec WHERE i < 64
        GROUP BY doc_id, i // 16
        ORDER BY media_id, window_idx"""
    })

  /** VIDEO decode verified cross-engine — the AVI RIFF container with
    * uncompressed-DIB frames (Codec.decodeAvi), same scheme as
    * q100/q103/q104 but through a real CONTAINER walk: per document a
    * deterministic 3-frame 10×7 video is muxed (odd width 7 forces the
    * DIB 4-byte row pad; positive height forces bottom-up rows),
    * demuxed, frame-sampled with the real scheduler
    * (sampleFrameIndices stride 2 → frames 0 and 2 — the sampled
    * frame INDEX is part of the verified contract), and 4×4-block
    * summed (partial edge blocks both axes). The oracle replays the
    * pixel formula; any avih/strh/strf offset, chunk-padding,
    * row-order, or frame-ordering bug hash-mismatches. fps and frame
    * count round-trip is asserted in-flight. */
  val q105 = Q("q105_avi_frame_block_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val frames = Seq.tabulate(3) { f =>
            Array.tabulate(10, 7)((r, c) =>
              ((id * 7 + f * 31 + r * 11 + c * 3) % 256).toInt)
          }
          val avi = graft.multimodal.Codec.encodeAvi(frames, fps = 4)
          val (fps, dec) = graft.multimodal.Codec.decodeAvi(avi)
          require(fps == 4 && dec.length == 3, "AVI round-trip lost stream metadata")
          for {
            fi <- Multimodal.sampleFrameIndices(dec.length, stride = 2, maxFrames = 8)
            br <- 0 until 3; bc <- 0 until 2
          } yield {
            val g = dec(fi)
            var sum = 0L
            var r = br * 4
            while (r < math.min(br * 4 + 4, 10)) {
              var c = bc * 4
              while (c < math.min(bc * 4 + 4, 7)) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, fi.toLong, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "frame_idx", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "frame_idx", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id, CAST(f AS BIGINT) AS f,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        (doc_id*7 + f*31 + r*11 + c*3) % 256 AS v
      FROM documents, (VALUES (0),(2)) t(f), range(0, 10) u(r), range(0, 7) w(c))
      SELECT media_id, f AS frame_idx, r // 4 AS block_row, c // 4 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, f, r // 4, c // 4
      ORDER BY media_id, frame_idx, block_row, block_col"""))

  /** INTER-frame video decode verified cross-engine — BI_RLE8, the AVI
    * delta codec (Codec.encodeAviRle8): per document a 4-frame 9×12
    * video where frame 0 is a keyframe (base formula) and each delta
    * frame f ∈ {1,2,3} rewrites ONLY row band {2f, 2f+1}; every other
    * pixel is carried from the previous frame by the codec's skip
    * escapes, never re-sent. Sampling frames 0 and 2 through the GOP
    * seek path means frame 2's output contains band 1 — pixels written
    * solely by frame 1's delta — so a decoder that restarts mid-GOP,
    * drops a delta, or misapplies a skip offset hash-mismatches. The
    * oracle computes each pixel's LAST writer arithmetically
    * (band b visible at frame f iff 1 ≤ b ≤ f). fps and frame count
    * round-trip asserted in-flight. */
  val q106 = Q("q106_avi_rle8_delta_sums",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          def base(r: Int, c: Int) = ((id * 5 + r * 7 + c * 11) % 256).toInt
          def d(f: Int, r: Int, c: Int) = ((id * 3 + f * 41 + r * 13 + c * 17) % 256).toInt
          val frames = scala.collection.mutable.ArrayBuffer(
            Array.tabulate(9, 12)(base))
          (1 to 3).foreach { f =>
            val next = frames.last.map(_.clone())
            (2 * f to 2 * f + 1).foreach(r => (0 until 12).foreach(c => next(r)(c) = d(f, r, c)))
            frames += next
          }
          val avi = graft.multimodal.Codec.encodeAviRle8(
            frames.toSeq, fps = 6, keyframeInterval = 4)
          require(graft.multimodal.Codec.aviFrameCount(avi) == 4, "RLE8 stream lost frames")
          val (fps, picked) = graft.multimodal.Codec.decodeAviFrames(
            avi, Multimodal.sampleFrameIndices(4, stride = 2, maxFrames = 8))
          require(fps == 6, "RLE8 round-trip lost fps")
          for {
            (fi, g) <- picked
            br <- 0 until 3; bc <- 0 until 4
          } yield {
            var sum = 0L
            var r = br * 3
            while (r < br * 3 + 3) {
              var c = bc * 3
              while (c < bc * 3 + 3) { sum += g(r)(c); c += 1 }
              r += 1
            }
            (id, fi.toLong, br.toLong, bc.toLong, sum)
          }
        }
        .toDF("media_id", "frame_idx", "block_row", "block_col", "pixel_sum")
        .orderBy("media_id", "frame_idx", "block_row", "block_col")
    },
    Some("""WITH px AS (SELECT doc_id AS media_id, CAST(f AS BIGINT) AS f,
        CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
        CASE WHEN r // 2 >= 1 AND r // 2 <= f
             THEN (doc_id*3 + (r // 2)*41 + r*13 + c*17) % 256
             ELSE (doc_id*5 + r*7 + c*11) % 256 END AS v
      FROM documents, (VALUES (0),(2)) t(f), range(0, 9) u(r), range(0, 12) w(c))
      SELECT media_id, f AS frame_idx, r // 3 AS block_row, c // 3 AS block_col,
        CAST(SUM(v) AS BIGINT) AS pixel_sum
      FROM px GROUP BY media_id, f, r // 3, c // 3
      ORDER BY media_id, frame_idx, block_row, block_col"""))

  /** Z-order layout arithmetic verified cross-engine — the bucket-rank
    * (codegen'd aggregate over literal boundaries) and Morton
    * bit-interleave expressions behind `Layout.cluster` (SURVEY
    * §2-ext data layout): two derived dimensions of the documents
    * table are bucketed against FIXED quantile boundaries and
    * interleaved at 4 bits; the oracle replays the same comparison
    * sums and shift/mask arithmetic in SQL. The curve value must match
    * bit-for-bit — file pruning decisions at 100 TB ride on it.
    * (The CLUSTERING effect itself — per-file min-max tightness — is
    * proven by LayoutSpec, which is a layout property, not a
    * row-value oracle can check.) */
  val q107 = Q("q107_zorder_values",
    (s, dir) => {
      import graft.store.Layout
      val xb = Seq(100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
      val yb = (1 to 15).map(_ * 62.0)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (col("doc_id") * 37 % 1000).as("y"))
      d.select(
          col("doc_id"),
          Layout.bucketOf(col("n_chars"), xb).as("bkt_x"),
          Layout.bucketOf(col("y"), yb).as("bkt_y"),
          Layout.zValue(
            Seq(Layout.bucketOf(col("n_chars"), xb),
                Layout.bucketOf(col("y"), yb)), bits = 4).as("zval"))
        .orderBy("doc_id")
    },
    Some {
      val xb = Seq(100, 200, 300, 400, 500, 600, 700, 800)
      val yb = (1 to 15).map(_ * 62)
      def bucketSql(v: String, bs: Seq[Int]): String =
        bs.map(b => s"(CASE WHEN $v >= $b THEN 1 ELSE 0 END)").mkString(" + ")
      val interleave = (0 until 4).flatMap { j =>
        Seq(s"(((bkt_x >> $j) & 1) << ${2 * j})", s"(((bkt_y >> $j) & 1) << ${2 * j + 1})")
      }.mkString(" | ")
      s"""WITH dims AS (SELECT doc_id, n_chars, (doc_id * 37) % 1000 AS y FROM documents),
        bk AS (SELECT doc_id,
          CAST(${bucketSql("n_chars", xb)} AS BIGINT) AS bkt_x,
          CAST(${bucketSql("y", yb)} AS BIGINT) AS bkt_y
        FROM dims)
        SELECT doc_id, bkt_x, bkt_y, CAST($interleave AS BIGINT) AS zval
        FROM bk ORDER BY doc_id"""
    })

  /** Hilbert curve index verified cross-engine — the codegen'd native
    * expression behind `Layout.hilbertOrder`
    * (graft.functions.HilbertIndexExpression): q107's bucket dims
    * linearized on the order-4 Hilbert curve. The oracle replays the
    * rotate-and-accumulate recurrence itself as a recursive CTE
    * (4 bit-levels of state (x, y, s, d): quadrant contribution
    * s²·(3rx XOR ry), masked reflect-and-swap rotation) — any
    * rotation, reflection, or accumulation bug in the kernel OR its
    * generated code hash-mismatches. */
  val q108 = Q("q108_hilbert_values",
    (s, dir) => {
      import graft.store.Layout
      val xb = Seq(100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)
      val yb = (1 to 15).map(_ * 62.0)
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (col("doc_id") * 37 % 1000).as("y"))
        .select(
          col("doc_id"),
          graft.functions.HilbertIndexExpression.hilbertIndex(
            Layout.bucketOf(col("n_chars"), xb),
            Layout.bucketOf(col("y"), yb), bits = 4).as("hval"))
        .orderBy("doc_id")
    },
    Some {
      val xb = Seq(100, 200, 300, 400, 500, 600, 700, 800)
      val yb = (1 to 15).map(_ * 62)
      def bucketSql(v: String, bs: Seq[Int]): String =
        bs.map(b => s"(CASE WHEN $v >= $b THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH RECURSIVE dims AS (
        SELECT doc_id, n_chars, (doc_id * 37) % 1000 AS y FROM documents),
      bk AS (SELECT doc_id,
        CAST(${bucketSql("n_chars", xb)} AS BIGINT) AS bkt_x,
        CAST(${bucketSql("y", yb)} AS BIGINT) AS bkt_y
      FROM dims),
      h(doc_id, x, y, s, d) AS (
        SELECT doc_id, bkt_x, bkt_y, CAST(8 AS BIGINT), CAST(0 AS BIGINT) FROM bk
        UNION ALL
        SELECT doc_id,
          CASE WHEN ry = 1 THEN xm WHEN rx = 0 THEN ym ELSE s - 1 - ym END,
          CASE WHEN ry = 1 THEN ym WHEN rx = 0 THEN xm ELSE s - 1 - xm END,
          s // 2,
          d + s * s * xor(3 * rx, ry)
        FROM (SELECT doc_id, x, y, s, d,
                CASE WHEN (x & s) != 0 THEN 1 ELSE 0 END AS rx,
                CASE WHEN (y & s) != 0 THEN 1 ELSE 0 END AS ry,
                x & (s - 1) AS xm, y & (s - 1) AS ym
              FROM h WHERE s >= 1) t
      )
      SELECT doc_id, CAST(d AS BIGINT) AS hval FROM h WHERE s = 0
      ORDER BY doc_id"""
    })

  /** q109/q110's FIXED PQ codebook: m = 4 subspaces of 16 dims, 8
    * codes each, centroid components from a formula in quantized
    * units — fixed so the DuckDB oracle can replay encode and ADC
    * without re-running Lloyd (the TRAINING loop is already
    * oracle-proven by the kmeans family q77/q81/q99; what q109/q110
    * pin is the PQ-specific arithmetic: per-subspace integer argmin
    * with tie-to-smaller-code, and the LUT-sum ADC scan). */
  protected def pqFixedCodebook(s: SparkSession): DataFrame = {
    import s.implicits._
    (for { sub <- 0 until 4; code <- 0 until 8 } yield {
      (sub, code.toLong,
        Seq.tabulate(16)(j => (((sub * 131 + code * 17 + j * 7) % 41) - 20) * 10L))
    }).toDF("sub", "code", "cvec")
  }

  /** PQ encode verified cross-engine — `Similarity.pqEncode` against
    * the fixed codebook, one row per (vector, subspace): the oracle
    * recomputes every integer subspace distance and takes the same
    * (dist, code) argmin. Any slicing, quantization, distance, or
    * tie-break bug hash-mismatches. */
  val q109 = Q("q109_pq_codes",
    (s, dir) => {
      Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding",
          pqFixedCodebook(s))
        .select(col("id").as("vec_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code"))
        .orderBy("vec_id", "sub")
    },
    Some("""WITH qv AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      diffs AS (SELECT vec_id, s, c, j,
          v[CAST(s*16 + j + 1 AS INT)] - (((s*131 + c*17 + j*7) % 41) - 20) * 10 AS df
        FROM qv, range(0, 4) t(s), range(0, 8) u(c), range(0, 16) w(j)),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d)
      SELECT vec_id, CAST(s AS BIGINT) AS sub, CAST(c AS BIGINT) AS code
      FROM best WHERE rn = 1 ORDER BY vec_id, sub"""))

  /** PQ asymmetric-distance top-k verified cross-engine — the full
    * compressed-index read path: encode (as q109), LUT the fixed
    * query against every (sub, code) centroid, score every vector as
    * the integer LUT sum, take the top 10 by (adc DESC, vec_id). The
    * oracle replays codes, LUT, and sum — all BIGINT, so the ranking
    * has no float ambiguity. */
  val q110 = Q("q110_pq_adc_topk",
    (s, dir) => {
      import s.implicits._
      val cb = pqFixedCodebook(s)
      val codes = Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding", cb)
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.pqAdcScores(codes, cb, query)
        .select(col("id").as("vec_id"), col("adc"))
        .orderBy(desc("adc"), col("vec_id")).limit(10)
    },
    Some("""WITH qv AS (SELECT vec_id,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      diffs AS (SELECT vec_id, s, c, j,
          v[CAST(s*16 + j + 1 AS INT)] - (((s*131 + c*17 + j*7) % 41) - 20) * 10 AS df
        FROM qv, range(0, 4) t(s), range(0, 8) u(c), range(0, 16) w(j)),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d),
      codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
      lut AS (SELECT s, c,
          CAST(SUM((((j*13) % 29) - 14) * 10
                   * (((s*131 + c*17 + ((j % 16))*7) % 41) - 20) * 10) AS BIGINT) AS l
        FROM range(0, 4) t(s), range(0, 8) u(c), range(0, 64) w(j)
        WHERE j // 16 = s
        GROUP BY s, c),
      adc AS (SELECT vec_id, CAST(SUM(l) AS BIGINT) AS adc
        FROM codes JOIN lut USING (s, c) GROUP BY vec_id)
      SELECT vec_id, adc FROM adc ORDER BY adc DESC, vec_id LIMIT 10"""))

  /** IVFADC verified cross-engine — `Similarity.ivfPqTopKNeighbors`,
    * the composed production read path: coarse routing by integer
    * centroid-sum cosine picks nprobe = 2 of the label lists (as q31),
    * then the ADC scan (as q110) scores ONLY the probed lists'
    * members from their PQ codes. The oracle replays routing, encode,
    * LUT, and sum; ranking ties follow the engine's (adc DESC, id ASC)
    * rule, so the id set is deterministic. Any bug in the
    * routing/pruning composition — scoring an unprobed list, dropping
    * a probed one, coarse/fine disagreement — changes the id set and
    * hash-mismatches. */
  val q111 = Q("q111_ivfpq_topk",
    (s, dir) => {
      import s.implicits._
      val cb = pqFixedCodebook(s)
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), Similarity.quantize(col("embedding")).as("qv"))
      val codes = Similarity.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding", cb)
        .join(base.select(col("vec_id").as("id"), col("label")), "id")
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.ivfPqTopKNeighbors(codes, "label", base, cb, query, k = 10, nprobe = 2)
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    },
    Some("""WITH qv AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      q AS (SELECT list(CAST((((j*13) % 29) - 14) * 10 AS BIGINT) ORDER BY j) AS qqv
            FROM range(0, 64) t(j)),
      expl AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM qv),
      cent AS (SELECT label, list(sv ORDER BY pos) AS cvec FROM
                 (SELECT label, pos, SUM(x) AS sv FROM expl GROUP BY label, pos)
               GROUP BY label),
      top2 AS (SELECT label FROM cent, q
               ORDER BY CAST(list_sum(list_transform(list_zip(cvec, qqv), p -> p[1]*p[2])) AS DOUBLE)
                 / (sqrt(CAST(list_sum(list_transform(cvec, x -> x*x)) AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(qqv, x -> x*x)) AS DOUBLE))) DESC,
                 label ASC LIMIT 2),
      diffs AS (SELECT vec_id, s, c, j,
          v[CAST(s*16 + j + 1 AS INT)] - (((s*131 + c*17 + j*7) % 41) - 20) * 10 AS df
        FROM qv, range(0, 4) t(s), range(0, 8) u(c), range(0, 16) w(j)),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d),
      codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
      lut AS (SELECT s, c,
          CAST(SUM((((j*13) % 29) - 14) * 10
                   * (((s*131 + c*17 + ((j % 16))*7) % 41) - 20) * 10) AS BIGINT) AS l
        FROM range(0, 4) t(s), range(0, 8) u(c), range(0, 64) w(j)
        WHERE j // 16 = s
        GROUP BY s, c),
      adc AS (SELECT cd.vec_id, CAST(SUM(l.l) AS BIGINT) AS adc
        FROM codes cd JOIN qv b USING (vec_id) JOIN lut l USING (s, c)
        WHERE b.label IN (SELECT label FROM top2)
        GROUP BY cd.vec_id)
      SELECT vec_id FROM (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 10)
      ORDER BY vec_id"""))

  /** Residual IVFADC (IVFADC-R) verified cross-engine —
    * `Similarity.ivfPqResidualTopKNeighbors` over
    * [[Similarity.residualFrame]] codes: per-label FLOORED-MEAN coarse
    * centroids, residual rv = qv − mvec, residual PQ encode against
    * the fixed codebook, routing by mvec cosine (nprobe = 2), and the
    * EXACT integer score decomposition ⟨q,mvec⟩ + Σ LUT[sub][code].
    * The oracle replays every stage — floored means, residual argmin
    * encode, coarse dot, LUT sum, (adc DESC, id ASC) ranking. Any bug
    * in the mean flooring, residual subtraction, or coarse+fine score
    * assembly changes the id set and hash-mismatches. */
  val q112 = Q("q112_ivfpq_residual_topk",
    (s, dir) => {
      import s.implicits._
      val cb = pqFixedCodebook(s)
      val emb = t(s, dir, "embeddings")
      val rf = Similarity.residualFrame(emb, "vec_id", "label", "embedding")
      val codes = Similarity.pqEncodeQ(rf, "id", "rv", cb)
        .join(rf.select(col("id"), col("label")), "id")
      val means = Similarity.listCentroidMeans(
        emb.select(col("label"), Similarity.quantize(col("embedding")).as("qv")),
        "label", "qv")
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.ivfPqResidualTopKNeighbors(codes, "label", means, cb, query,
          k = 10, nprobe = 2)
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    },
    Some("""WITH qv AS (SELECT vec_id, label,
        list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
      FROM embeddings),
      q AS (SELECT list(CAST((((j*13) % 29) - 14) * 10 AS BIGINT) ORDER BY j) AS qqv
            FROM range(0, 64) t(j)),
      expl AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM qv),
      mexp AS (SELECT label, pos,
          CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mv
        FROM expl GROUP BY label, pos),
      mcent AS (SELECT label, list(mv ORDER BY pos) AS mvec FROM mexp GROUP BY label),
      top2 AS (SELECT label FROM mcent, q
               ORDER BY CAST(list_sum(list_transform(list_zip(mvec, qqv), p -> p[1]*p[2])) AS DOUBLE)
                 / (sqrt(CAST(list_sum(list_transform(mvec, x -> x*x)) AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(qqv, x -> x*x)) AS DOUBLE))) DESC,
                 label ASC LIMIT 2),
      coarse AS (SELECT label,
          CAST(list_sum(list_transform(list_zip(mvec, qqv), p -> p[1]*p[2])) AS BIGINT) AS coarse
        FROM mcent, q),
      diffs AS (SELECT b.vec_id, t.s, u.c, w.j,
          b.v[CAST(t.s*16 + w.j + 1 AS INT)] - m.mv
            - (((t.s*131 + u.c*17 + w.j*7) % 41) - 20) * 10 AS df
        FROM qv b
        CROSS JOIN range(0, 4) t(s)
        CROSS JOIN range(0, 8) u(c)
        CROSS JOIN range(0, 16) w(j)
        JOIN mexp m ON m.label = b.label AND m.pos = t.s*16 + w.j + 1),
      d AS (SELECT vec_id, s, c, CAST(SUM(df * df) AS BIGINT) AS dist
        FROM diffs GROUP BY vec_id, s, c),
      best AS (SELECT vec_id, s, c,
          row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, c) AS rn
        FROM d),
      codes AS (SELECT vec_id, s, c FROM best WHERE rn = 1),
      lut AS (SELECT s, c,
          CAST(SUM((((j*13) % 29) - 14) * 10
                   * (((s*131 + c*17 + ((j % 16))*7) % 41) - 20) * 10) AS BIGINT) AS l
        FROM range(0, 4) t(s), range(0, 8) u(c), range(0, 64) w(j)
        WHERE j // 16 = s
        GROUP BY s, c),
      adc AS (SELECT cd.vec_id, CAST(SUM(l.l) AS BIGINT) + MIN(co.coarse) AS adc
        FROM codes cd JOIN qv b USING (vec_id)
        JOIN coarse co ON co.label = b.label
        JOIN lut l USING (s, c)
        WHERE b.label IN (SELECT label FROM top2)
        GROUP BY cd.vec_id)
      SELECT vec_id FROM (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 10)
      ORDER BY vec_id"""))

  /** G.711 μ-law + A-law decode verified cross-engine — the telephony
    * companding codecs (WAV format tags 7/6, Codec.decodeWavG711),
    * same scheme as the ADPCM q102: per document a deterministic
    * 64-sample signal spanning ±30000 (all eight G.711 segments) is
    * companded, expanded, and 16-sample-window energy-summed; the
    * oracle replays BOTH closed-form integer expansions (μ-law
    * complement-bias-shift, A-law even-bit-inversion segment fold) and
    * the encoder's nearest-reconstruction argmin (ties to the smaller
    * code) in SQL. Any mantissa, segment, bias, sign-convention, or
    * fact-chunk bug hash-mismatches. */
  val q113 = Q("q113_g711_window_energy",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(col("doc_id")).as[Long]
        .flatMap { id =>
          val samples = Array.tabulate(64)(i =>
            (((id * 257 + i * 997) % 60001) - 30000).toShort)
          Seq(false, true).flatMap { aLaw =>
            val wav = graft.multimodal.Codec.encodeWavG711(samples, 8000, aLaw)
            val (sr, rec) = graft.multimodal.Codec.decodeWavG711(wav)
            require(sr == 8000 && rec.length == 64, "G.711 round-trip lost data")
            (0 until 4).map { w =>
              var e = 0L
              var k = 0
              while (k < 16) { val v = rec(w * 16 + k).toLong; e += v * v; k += 1 }
              (id, if (aLaw) "alaw" else "ulaw", w.toLong, e)
            }
          }
        }
        .toDF("media_id", "codec", "window_idx", "energy")
        .orderBy("media_id", "codec", "window_idx")
    },
    Some("""WITH dec AS (
        SELECT c, 'ulaw' AS codec,
          CASE WHEN ((255 - c) & 128) != 0
            THEN 132 - ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4))
            ELSE ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4)) - 132 END AS v
        FROM range(0, 256) t(c)
        UNION ALL
        SELECT c, 'alaw',
          CASE WHEN (xor(c, 85) & 128) != 0 THEN seg_val ELSE -seg_val END
        FROM (SELECT c,
            CASE WHEN ((xor(c, 85) & 112) >> 4) = 0 THEN ((xor(c, 85) & 15) << 4) + 8
                 WHEN ((xor(c, 85) & 112) >> 4) = 1 THEN ((xor(c, 85) & 15) << 4) + 264
                 ELSE (((xor(c, 85) & 15) << 4) + 264) << (((xor(c, 85) & 112) >> 4) - 1)
            END AS seg_val
          FROM range(0, 256) t(c)) a),
      smp AS (SELECT doc_id, i, (doc_id*257 + i*997) % 60001 - 30000 AS s
        FROM documents, range(0, 64) t(i)),
      enc AS (SELECT doc_id, i, codec, v,
          row_number() OVER (PARTITION BY doc_id, i, codec
                             ORDER BY abs(v - s), c) AS rn
        FROM smp CROSS JOIN dec)
      SELECT doc_id AS media_id, codec, CAST(i // 16 AS BIGINT) AS window_idx,
        CAST(SUM(v*v) AS BIGINT) AS energy
      FROM enc WHERE rn = 1
      GROUP BY doc_id, codec, i // 16
      ORDER BY media_id, codec, window_idx"""))

  /** Exact substring dedup verified cross-engine — repeated 5-token
    * spans (Dedup.repeatedSpans, the Lee et al. 2107.06499 operator at
    * token-window granularity): every verbatim 5-gram occurring twice
    * anywhere in the corpus flags its non-keeper occurrences; flagged
    * windows merge into maximal spans. The oracle replays windowing
    * (md5-keyed), the corpus-wide (id, pos) keeper rule, and the
    * running-max span coalescing. Any off-by-one in window positions,
    * keeper selection, or adjacent-span merging hash-mismatches. */
  val q114 = Q("q114_repeated_spans",
    (s, dir) => Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minOccurrences = 2)
      .orderBy("doc_id", "span_start"),
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        FROM documents),
      wins AS (SELECT doc_id, p AS pos,
          md5(array_to_string(list_slice(tk, p + 1, p + 5), ' ')) AS h
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - 4)) AS p FROM toks)),
      occ AS (SELECT doc_id, pos,
          row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
          COUNT(*) OVER (PARTITION BY h) AS cnt
        FROM wins),
      flagged AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
      m AS (SELECT doc_id, pos,
          CASE WHEN pos > COALESCE(MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS ns
        FROM flagged),
      g AS (SELECT doc_id, pos, SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m)
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
        CAST(MAX(pos) + 5 AS BIGINT) AS span_end
      FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start"""))

  /** The cut half of exact substring dedup verified cross-engine —
    * Dedup.cutRepeatedSpans drops flagged tokens and rejoins survivors
    * single-spaced (fully-cut docs survive EMPTY). The oracle rebuilds
    * every cleaned text token-by-token and compares md5s — position
    * bookkeeping, keeper survival, span-boundary, and reassembly-order
    * bugs all hash-mismatch. */
  val q115 = Q("q115_cut_repeated_spans",
    (s, dir) => Dedup.cutRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 5, minOccurrences = 2)
      .select(col("doc_id"), md5(col("text")).as("clean_md5"))
      .orderBy("doc_id"),
    Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        FROM documents),
      wins AS (SELECT doc_id, p AS pos,
          md5(array_to_string(list_slice(tk, p + 1, p + 5), ' ')) AS h
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk) - 4)) AS p FROM toks)),
      occ AS (SELECT doc_id, pos,
          row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
          COUNT(*) OVER (PARTITION BY h) AS cnt
        FROM wins),
      flagged AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
      cov AS (SELECT DISTINCT doc_id, pos + v.d AS tpos
        FROM flagged CROSS JOIN range(0, 5) v(d)),
      tok2 AS (SELECT doc_id, p AS tpos, tk[CAST(p + 1 AS INT)] AS tok
        FROM (SELECT doc_id, tk, unnest(range(0, len(tk))) AS p FROM toks)),
      kept AS (SELECT t.doc_id, t.tpos, t.tok
        FROM tok2 t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tpos = t.tpos
        WHERE c.doc_id IS NULL),
      joined AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS txt
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id, md5(COALESCE(j.txt, '')) AS clean_md5
      FROM documents d LEFT JOIN joined j USING (doc_id)
      ORDER BY d.doc_id"""))

  /** The WAV-auto PIPELINE verified cross-engine — the capstone of the
    * audio stack: a MIXED-codec corpus (doc_id%3 routes PCM16 /
    * IMA-ADPCM / μ-law G.711, one signal formula) through
    * `Multimodal.decodeAudioAndFeature` — format-tag routing
    * (Codec.decodeWavAuto), three REAL decoders, exact-sample window
    * scheduling, integer window energies — while the oracle replays
    * ALL THREE decode paths in SQL (identity; the q102 ADPCM
    * encode+decode recursion; the q113 argmin+expansion) and unions
    * them. A routing bug, any single decoder bug, or a window-
    * scheduling off-by-one hash-mismatches. */
  val q116 = Q("q116_wav_auto_pipeline",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val samples = Array.tabulate(64)(i =>
            (((id * 31 + i * 17) % 2003) - 1001).toShort)
          val payload = (id % 3) match {
            case 0 => graft.multimodal.Codec.encodeWavPcm16(samples, 8000)
            case 1 => graft.multimodal.Codec.encodeWavImaAdpcm(samples, 8000, blockAlign = 36)
            case _ => graft.multimodal.Codec.encodeWavG711(samples, 8000, aLaw = false)
          }
          Multimodal.MediaRow(id, Multimodal.MediaMeta("audio", 0, 0, 8000, 8L), payload)
        }
      Multimodal.decodeAudioAndFeature(media, windowMs = 2, hopMs = 2)
        .toDF()
        .select(col("media_id"), col("window_idx").cast("long").as("window_idx"),
          col("energy"))
        .orderBy("media_id", "window_idx")
    },
    Some {
      val stepsVals = graft.multimodal.Codec.ImaStepTable.zipWithIndex
        .map { case (st, i) => s"($i,$st)" }.mkString(",")
      s"""WITH RECURSIVE steps(six, st) AS (SELECT * FROM (VALUES $stepsVals) v(six, st)),
        pcm AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
            CAST((doc_id*31 + i*17) % 2003 - 1001 AS BIGINT) AS v
          FROM documents, range(0, 64) t(i) WHERE doc_id % 3 = 0),
        rec AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS i,
                 CAST((doc_id*31) % 2003 - 1001 AS BIGINT) AS pred,
                 CAST(0 AS BIGINT) AS ix
          FROM documents WHERE doc_id % 3 = 1
          UNION ALL
          SELECT doc_id, i + 1,
            greatest(-32768, least(32767,
              pred + CASE WHEN sgn = 8 THEN -diff ELSE diff END)),
            greatest(0, least(88,
              ix + CASE nib3 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6
                             WHEN 7 THEN 8 ELSE -1 END))
          FROM (
            SELECT l3.*,
              (st // 8) + f4*st + f2*(st // 2) + f1*(st // 4) AS diff,
              4*f4 + 2*f2 + f1 AS nib3
            FROM (
              SELECT l2.*, CASE WHEN ad3 >= st // 4 THEN 1 ELSE 0 END AS f1
              FROM (
                SELECT l1.*,
                  CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END AS f2,
                  ad2 - (CASE WHEN ad2 >= st // 2 THEN 1 ELSE 0 END)*(st // 2) AS ad3
                FROM (
                  SELECT l0.*,
                    CASE WHEN ad >= st THEN 1 ELSE 0 END AS f4,
                    ad - (CASE WHEN ad >= st THEN 1 ELSE 0 END)*st AS ad2
                  FROM (
                    SELECT r.doc_id, r.i, r.pred, r.ix, s.st,
                      CASE WHEN r.smp < r.pred THEN 8 ELSE 0 END AS sgn,
                      abs(r.smp - r.pred) AS ad
                    FROM (SELECT *, (doc_id*31 + (i+1)*17) % 2003 - 1001 AS smp
                          FROM rec WHERE i < 63) r
                    JOIN steps s ON s.six = r.ix
                  ) l0
                ) l1
              ) l2
            ) l3
          )
        ),
        adp AS (SELECT doc_id, i, pred AS v FROM rec),
        dec AS (SELECT c,
            CASE WHEN ((255 - c) & 128) != 0
              THEN 132 - ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4))
              ELSE ((((255 - c) & 15) * 8 + 132) << (((255 - c) & 112) >> 4)) - 132
            END AS dv
          FROM range(0, 256) t(c)),
        usmp AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
            (doc_id*31 + i*17) % 2003 - 1001 AS s
          FROM documents, range(0, 64) t(i) WHERE doc_id % 3 = 2),
        uenc AS (SELECT doc_id, i, dv,
            row_number() OVER (PARTITION BY doc_id, i ORDER BY abs(dv - s), c) AS rn
          FROM usmp CROSS JOIN dec),
        ul AS (SELECT doc_id, i, CAST(dv AS BIGINT) AS v FROM uenc WHERE rn = 1),
        allv AS (SELECT * FROM pcm UNION ALL SELECT * FROM adp UNION ALL SELECT * FROM ul)
        SELECT doc_id AS media_id, CAST(i // 16 AS BIGINT) AS window_idx,
          CAST(SUM(v*v) AS BIGINT) AS energy
        FROM allv GROUP BY doc_id, i // 16
        ORDER BY media_id, window_idx"""
    })

  // ---------------------------------------------------------------- //
  // BPE tokenizer training / encoding (Curation.trainBpe/bpeEncode)  //
  // ---------------------------------------------------------------- //

  /** Shared DuckDB replay of the BPE vocabulary init: corpus →
    * word-frequency table → code-point symbol lists (the exact mirror
    * of [[graft.text.Curation.bpeWordTable]]). */
  protected def bpeInitSql: String =
    """w0 AS (
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        FROM documents) u
      WHERE len(word) > 0 GROUP BY word),
    s0 AS (SELECT word, n,
      list_transform(range(1, len(word)+1),
        i -> substring(word, CAST(i AS INT), 1)) AS syms
      FROM w0)"""

  /** One unrolled BPE round in SQL: winner CTE (supplied — either a
    * pair-count argmax for training or a literal for encoding) plus
    * the greedy left-to-right non-overlapping apply. The apply mirrors
    * [[graft.functions.BpeExpressions.mergeStep]] exactly: for
    * `left ≠ right` adjacent matches never overlap, so every match
    * merges; for `left = right` a maximal run of length L merges at
    * even offsets only (floor(L/2) pairs) — expressed as
    * gaps-and-islands run detection + in-run parity, no sequential
    * scan needed. */
  protected def bpeStageSql(k: Int, winCte: String): String = {
    val p = k - 1
    s"""$winCte,
    ex$k AS (SELECT word, n, CAST(i AS INT) AS i, syms[CAST(i AS INT)] AS sym
      FROM (SELECT word, n, syms, unnest(range(1, len(syms)+1)) AS i FROM s$p) x),
    mk$k AS (SELECT e.word, e.n, e.i, e.sym, w.l AS wl, w.r AS wr,
        COALESCE(e.sym = w.l AND
          lead(e.sym) OVER (PARTITION BY e.word ORDER BY e.i) = w.r, FALSE) AS rawm
      FROM ex$k e CROSS JOIN win$k w),
    isl$k AS (SELECT *, CASE WHEN sym = wl
        THEN i - ROW_NUMBER() OVER (PARTITION BY word, sym = wl ORDER BY i) END AS island
      FROM mk$k),
    par$k AS (SELECT *, CASE WHEN island IS NOT NULL
        THEN (ROW_NUMBER() OVER (PARTITION BY word, island ORDER BY i) - 1) % 2 = 0
        END AS evenoff
      FROM isl$k),
    fin$k AS (SELECT word, n, i,
        CASE WHEN m THEN wl || wr ELSE sym END AS sym,
        COALESCE(lag(m) OVER (PARTITION BY word ORDER BY i), FALSE) AS consumed
      FROM (SELECT *, rawm AND (wl <> wr OR COALESCE(evenoff, FALSE)) AS m
            FROM par$k) y),
    s$k AS (SELECT word, n, list(sym ORDER BY i) AS syms
      FROM fin$k WHERE NOT consumed GROUP BY word, n)"""
  }

  /** Training-round winner: adjacent-pair counts weighted by word
    * frequency (overlaps counted — the classic Sennrich formulation),
    * argmax with ties to the binary-smallest (left, right). */
  protected def bpeTrainWinSql(k: Int): String = {
    val p = k - 1
    s"""pc$k AS (
      SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT)+1] AS r, SUM(n) AS cnt
      FROM (SELECT n, syms, unnest(range(1, len(syms))) AS i
            FROM s$p WHERE len(syms) >= 2) x
      GROUP BY 1, 2),
    win$k AS (SELECT l, r, cnt FROM pc$k ORDER BY cnt DESC, l, r LIMIT 1)"""
  }

  /** Full distributed BPE tokenizer training (arXiv:1508.07909):
    * 6 rounds of pair-count argmax → greedy merge apply over the
    * word-frequency table. The corpus is read ONCE (tokenize →
    * groupBy word); each round then costs one pair-count exchange
    * over |vocab| rows plus a narrow codegen'd merge map — the shape
    * that trains a tokenizer on a 100 TB corpus without ever
    * re-reading it. The oracle replays all 6 rounds unrolled,
    * including the greedy-apply parity rule on identical-symbol runs,
    * so a drift between the counted pairs and the actually-produced
    * vocabulary (the classic BPE implementation bug) hash-mismatches. */
  val q117 = Q("q117_bpe_train",
    (s, dir) => graft.text.Curation.trainBpe("text", nMerges = 6)(
        t(s, dir, "documents"))
      .orderBy("merge_rank"),
    Some {
      val stages = (1 to 6).map(k => bpeStageSql(k, bpeTrainWinSql(k))).mkString(",\n")
      val unions = (1 to 6).map(k =>
        s"SELECT CAST($k AS INT) AS merge_rank, l, r, cnt FROM win$k")
        .mkString("\n      UNION ALL ")
      s"""WITH $bpeInitSql,
      $stages,
      merges AS (
      $unions)
      SELECT merge_rank, l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS n_pair
      FROM merges ORDER BY merge_rank"""
    })

  /** The q118 fixed merge list: rank-ordered, with a cascading third
    * merge (`th` is only producible by rank 2) and a self-pair would-
    * overlap case exercised wherever the corpus has letter runs. */
  protected val bpeFixedMerges: Seq[(String, String)] =
    Seq(("e", "r"), ("t", "h"), ("th", "e"), ("a", "n"))

  /** BPE ENCODE with an already-learned (here: literal) merge table —
    * the inference-side twin of q117. Narrow until the final count:
    * the whole encoder is one codegen kernel call per word inside a
    * higher-order transform (zero exchanges before the token
    * aggregate). The oracle replays the same 4 merges through the
    * unrolled apply template with literal winners. */
  val q118 = Q("q118_bpe_encode",
    (s, dir) => graft.text.Curation.bpeEncode("text", bpeFixedMerges)(
        t(s, dir, "documents"))
      .select(explode(col("bpe_tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(30),
    Some {
      val stages = bpeFixedMerges.zipWithIndex.map { case ((l, r), i) =>
        bpeStageSql(i + 1, s"win${i + 1} AS (SELECT '$l' AS l, '$r' AS r)")
      }.mkString(",\n")
      s"""WITH $bpeInitSql,
      $stages
      SELECT sym AS token, CAST(SUM(n) AS BIGINT) AS n_occurrences
      FROM (SELECT n, unnest(syms) AS sym FROM s${bpeFixedMerges.size}) x
      GROUP BY sym ORDER BY n_occurrences DESC, token LIMIT 30"""
    })

  /** DuckDB mirror of [[graft.functions.OphBandSigs]]: one permutation
    * over the 60-bit hash set, k equal value-range bins keeping their
    * min, empty bins densified from the nearest occupied bin rightward
    * (circular, offset t shifts by t·P), then the same "m|m|..." band
    * strings as the k-permutation family. The fill step expresses the
    * rotation as a (grid × occupied-slots) rank on circular distance —
    * offset 0 IS the occupied case, so one rule covers both. */
  protected def ophBandedSql(bands: Int, rpb: Int): String = {
    val k = bands * rpb
    val (a, b) = Dedup.permConsts(1).head
    val p = Dedup.MinhashP
    s"""vals AS (SELECT doc_id, ($a * (x % $p) + $b) % $p AS v
         FROM (SELECT doc_id, unnest(h) AS x FROM shh) u),
       slots AS (SELECT doc_id, CAST((v * $k) // $p AS INT) AS j, MIN(v) AS mv
         FROM vals GROUP BY 1, 2),
       grid AS (SELECT doc_id, CAST(gj AS INT) AS j
         FROM (SELECT DISTINCT doc_id FROM shh) d, range(0, $k) t(gj)),
       fill AS (SELECT g.doc_id, g.j,
           s.mv + $p * CAST((s.j - g.j + $k) % $k AS BIGINT) AS cand,
           row_number() OVER (PARTITION BY g.doc_id, g.j
             ORDER BY (s.j - g.j + $k) % $k) AS rn
         FROM grid g JOIN slots s ON s.doc_id = g.doc_id),
       osig AS (SELECT doc_id, j, cand AS m FROM fill WHERE rn = 1),
       banded AS (SELECT doc_id, CAST(j // $rpb AS INT) AS band,
           string_agg(CAST(m AS VARCHAR), '|' ORDER BY j) AS bandsig
         FROM osig GROUP BY doc_id, j // $rpb)"""
  }

  /** Near-dup candidates via densified one-permutation hashing
    * (Shrivastava & Li ICML 2014) — the O(|shingles|) signature scan,
    * vs q26's O(k·|shingles|) k-permutation family, with the identical
    * (8,4) banding and bucket join downstream. The oracle replays the
    * whole construction including the rotation densification, so a
    * bin-split or borrow-direction bug hash-mismatches. */
  val q119 = Q("q119_oph_neardup",
    (s, dir) => Dedup.ophCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.CharShingles(5),
        bands = 8, rowsPerBand = 4)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH sh AS (SELECT doc_id, ${shingleSql(5)} AS s FROM documents),
      $hashSetCte,
      ${ophBandedSql(8, 4)},
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM banded a JOIN banded b
               ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id)
      SELECT id_a, id_b FROM cand ORDER BY id_a, id_b"""))

  /** JL sign-projection prefilter + exact re-rank
    * ([[Similarity.jlPrefilterTopK]]): the corpus is scored in a
    * deterministic ±1-projected 16-dim space (4× fewer multiply-adds
    * than the 64-dim brute scan), a generous top-50 candidate set
    * survives, and the exact full-dimension cosine re-ranks it to the
    * final top-10. The oracle replays the ENTIRE construction — LCG
    * sign stream, projected sums, projected cosine, candidate cut,
    * exact re-rank — so a sign-stream index bug or a prefilter/re-rank
    * tie-rule drift hash-mismatches. */
  val q120 = Q("q120_jl_prefilter_topk",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("qv"))
      val query = Seq((-1L, Seq.tabulate(64)(j => ((j * 13) % 29 - 14) * 10L)))
        .toDF("qid", "qqv")
      Similarity.jlPrefilterTopK(base, query, k = 10, outDims = 16, candidateFactor = 5)
        .select(col("id").as("vec_id"))
        .orderBy("vec_id")
    },
    Some {
      val (a, b, p) = (graft.functions.SignProjectLongs.A,
        graft.functions.SignProjectLongs.B, graft.functions.SignProjectLongs.P)
      val signCase = s"CASE WHEN ($a*((pos-1)*16 + j) + $b) % $p < ${p / 2} " +
        "THEN x ELSE -x END"
      s"""WITH qv AS (SELECT vec_id AS id,
          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        FROM embeddings),
        q AS (SELECT list(CAST((((j*13) % 29) - 14) * 10 AS BIGINT) ORDER BY j) AS qqv
              FROM range(0, 64) t(j)),
        px AS (SELECT id, j, CAST(SUM($signCase) AS BIGINT) AS pj
          FROM (SELECT id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM qv) e,
               range(0, 16) t(j)
          GROUP BY id, j),
        qx AS (SELECT j, CAST(SUM($signCase) AS BIGINT) AS qj
          FROM (SELECT unnest(qqv) AS x, generate_subscripts(qqv, 1) AS pos FROM q) e,
               range(0, 16) t(j)
          GROUP BY j),
        pc AS (SELECT p2.id,
            CAST(SUM(p2.pj * q2.qj) AS DOUBLE) /
              (sqrt(CAST(SUM(p2.pj * p2.pj) AS DOUBLE)) *
               sqrt(CAST((SELECT SUM(qj*qj) FROM qx) AS DOUBLE))) AS pcos
          FROM px p2 JOIN qx q2 USING (j) GROUP BY p2.id),
        cand AS (SELECT id FROM pc ORDER BY pcos DESC, id LIMIT 50),
        fin AS (SELECT bq.id,
            CAST(list_sum(list_transform(list_zip(bq.v, q.qqv), pr -> pr[1]*pr[2])) AS DOUBLE) /
              (sqrt(CAST(list_sum(list_transform(bq.v, x -> x*x)) AS DOUBLE)) *
               sqrt(CAST(list_sum(list_transform(q.qqv, x -> x*x)) AS DOUBLE))) AS cosine
          FROM qv bq JOIN cand USING (id), q)
        SELECT id AS vec_id FROM (SELECT id FROM fin ORDER BY cosine DESC, id LIMIT 10)
        ORDER BY vec_id"""
    })

  /** Shared DuckDB replay of [[Multimodal.blockhashGrid]] over pixel
    * rows `px(media_id, r, c, v)` on a 32×32 grid: 2×2 block sums,
    * lower-median threshold (rank 128 of 256 — the value at a rank is
    * tie-stable), strict-above bits, row-major packing into 4 signed
    * BIGINTs via HUGEINT (bit 63 would overflow checked BIGINT
    * arithmetic). */
  protected val blockhashSql =
    """bs AS (SELECT media_id, CAST((r//2)*16 + (c//2) AS BIGINT) AS b,
        CAST(SUM(v) AS BIGINT) AS s
      FROM px GROUP BY media_id, (r//2)*16 + (c//2)),
    med AS (SELECT media_id, s AS m FROM
      (SELECT media_id, s, row_number() OVER (PARTITION BY media_id ORDER BY s) AS rn
       FROM bs) x WHERE rn = 128),
    bits AS (SELECT bs.media_id, bs.b,
        CASE WHEN bs.s > med.m THEN 1 ELSE 0 END AS bit
      FROM bs JOIN med USING (media_id)),
    packed AS (SELECT media_id, CAST(b // 64 AS INT) AS band,
        SUM(CAST(bit AS HUGEINT) * (CAST(1 AS HUGEINT) << CAST(b % 64 AS INT))) AS h
      FROM bits GROUP BY media_id, b // 64),
    bh AS (SELECT media_id, band,
        CAST(CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
             THEN h - (CAST(1 AS HUGEINT) << 64) ELSE h END AS BIGINT) AS bh_value
      FROM packed)"""

  /** Block-mean perceptual image hash ([[Multimodal.blockhashGrid]] —
    * the public blockhash construction): real BMP decode → 2×2 block
    * sums → lower-median threshold → 256 bits packed into 4 longs.
    * All integer and rank-deterministic, so the oracle replays the
    * hash BIT-FOR-BIT — the DCT-based pHash alternative can't cross
    * engines exactly, which is why this is the engine's image hash. */
  val q121 = Q("q121_image_blockhash",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val gray = Array.tabulate(32, 32)((r, c) =>
            ((id * 11 + (id % 7 + 1) * r * c + r * 17 + c * 23) % 256).toInt)
          Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 32, 32, 0, 0L),
            graft.multimodal.Codec.encodeBmp24(gray))
        }
      Multimodal.imageBlockhash(media)
        .select(col("media_id"), posexplode(col("bh")).as(Seq("band", "bh_value")))
        .orderBy("media_id", "band")
    },
    Some(s"""WITH px AS (SELECT doc_id AS media_id, r, c,
        (doc_id*11 + (doc_id%7+1)*r*c + r*17 + c*23) % 256 AS v
      FROM documents, range(0, 32) rr(r), range(0, 32) cc(c)),
      $blockhashSql
      SELECT media_id, band, bh_value FROM bh ORDER BY media_id, band"""))

  /** Blockhash near-dup pairs: every 5th doc's image is a copy of its
    * predecessor's with ONE pixel shifted by +128 — a real small edit,
    * so the pair's hashes differ in a few bits. The banded hamming
    * join ([[Multimodal.blockhashNearDupPairs]], 4 bands of 64 bits —
    * exact recall ≤ distance 3 by pigeonhole, the q93 calculus) finds
    * exactly the copy pairs; the oracle replays hash, banding, bucket
    * join, and bit_count verification. */
  val q122 = Q("q122_blockhash_neardup",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val src = if (id % 5 == 0 && id >= 5) id - 1 else id
          val gray = Array.tabulate(32, 32) { (r, c) =>
            val base = ((src * 11 + (src % 7 + 1) * r * c + r * 17 + c * 23) % 256).toInt
            if (id != src && r == 0 && c == 0) (base + 128) % 256 else base
          }
          Multimodal.MediaRow(id, Multimodal.MediaMeta("image", 32, 32, 0, 0L),
            graft.multimodal.Codec.encodeBmp24(gray))
        }
      Multimodal.blockhashNearDupPairs(
          Multimodal.imageBlockhash(media), maxHamming = 16)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH imgs AS (SELECT doc_id AS media_id,
        CASE WHEN doc_id % 5 = 0 AND doc_id >= 5 THEN doc_id - 1 ELSE doc_id END AS src
      FROM documents),
      px AS (SELECT media_id, r, c,
        CASE WHEN media_id <> src AND r = 0 AND c = 0
          THEN ((src*11 + (src%7+1)*r*c + r*17 + c*23) % 256 + 128) % 256
          ELSE (src*11 + (src%7+1)*r*c + r*17 + c*23) % 256 END AS v
      FROM imgs, range(0, 32) rr(r), range(0, 32) cc(c)),
      $blockhashSql,
      hams AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
          CAST(SUM(bit_count(CAST(xor(a.bh_value, b.bh_value) AS BIGINT))) AS BIGINT) AS hamming
        FROM bh a JOIN bh b ON a.band = b.band AND a.media_id < b.media_id
        GROUP BY a.media_id, b.media_id),
      cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bh a JOIN bh b
        ON a.band = b.band AND a.bh_value = b.bh_value AND a.media_id < b.media_id)
      SELECT id_a, id_b, hamming FROM cand JOIN hams USING (id_a, id_b)
      WHERE hamming <= 16 ORDER BY id_a, id_b"""))

  /** Containment near-dup ([[Dedup.overlapPairs]]): rare-shingle
    * prefix filtering generates the candidates (per-hash fan-out
    * bounded by maxDf² — the quadratic valve, frequent shingles
    * excluded and cap-reported), exact overlap coefficient
    * |A∩B|/min(|A|,|B|) verifies. The subsumption class the
    * Jaccard-tuned LSH (q26) deliberately does not target. The oracle
    * replays df computation, the rare cut, the candidate join, and
    * both verification metrics. */
  val q123 = Q("q123_containment_pairs",
    (s, dir) => Dedup.overlapPairs(
        t(s, dir, "documents"), "doc_id", "text", Dedup.WordShingles(2),
        minOverlap = 0.8, maxDf = 10)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
      sh AS (SELECT doc_id, ${wordShingleSql(2, "toks")} AS s FROM tk),
      $hashSetCte,
      ex AS (SELECT doc_id, unnest(h) AS hv FROM shh),
      dfc AS (SELECT hv, COUNT(*) AS dfn FROM ex GROUP BY hv),
      rd AS (SELECT doc_id, hv FROM ex JOIN (SELECT hv FROM dfc WHERE dfn <= 10) r USING (hv)),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM rd a JOIN rd b ON a.hv = b.hv AND a.doc_id < b.doc_id)
      SELECT id_a, id_b, overlap, jaccard FROM (
        SELECT id_a, id_b,
          CAST(len(list_intersect(sa.h, sb.h)) AS DOUBLE)
            / CAST(least(len(sa.h), len(sb.h)) AS DOUBLE) AS overlap,
          ${jaccardSql("sa.h", "sb.h")} AS jaccard
        FROM cand JOIN shh sa ON sa.doc_id = id_a JOIN shh sb ON sb.doc_id = id_b) x
      WHERE overlap >= 0.8 ORDER BY id_a, id_b"""))

  // ---------------------------------------------------------------- //
  // Model-based quality filtering (LmQuality: CCNet / NB / DSIR)     //
  // ---------------------------------------------------------------- //

  /** DuckDB replay of [[graft.functions.FloorLog2Ratio]]: exact
    * `⌊log2(num/den)⌋` from binary-string lengths — `num`/`den` must
    * be simple BIGINT column refs (each is referenced three times). */
  protected def fl2rSql(num: String, den: String): String =
    s"""((length(bin($num)) - length(bin($den))) -
        CASE WHEN ($num >> (length(bin($num)) - length(bin($den)))) < $den
        THEN 1 ELSE 0 END)"""

  /** Whitespace tokens + adjacent-transition CTEs shared by the
    * LmQuality oracles (mirrors [[graft.text.LmQuality.toks]] /
    * `transitions`: trim, split, ''-token filter, 1-based zip). */
  protected val lmToksCte =
    """lmtk AS (SELECT doc_id, lang, source,
       list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
       FROM documents)"""
  protected def lmTransSql(from: String, as_ : String): String =
    s"""$as_ AS (SELECT doc_id, tk[i] AS prev, tk[i+1] AS w
       FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM $from))"""
}
