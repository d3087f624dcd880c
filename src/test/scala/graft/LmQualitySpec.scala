package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.functions.FloorLog2Ratio
import graft.text.LmQuality

/** Unit coverage of the model-based quality-filter family (battery
  * q124–q127 check the full pipelines against the DuckDB oracle). */
class LmQualitySpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------- kernel

  test("floor_log2_ratio: golden values") {
    assert(FloorLog2Ratio.evalBits(1, 1) == 0)
    assert(FloorLog2Ratio.evalBits(2, 1) == 1)
    assert(FloorLog2Ratio.evalBits(3, 1) == 1)
    assert(FloorLog2Ratio.evalBits(4, 1) == 2)
    assert(FloorLog2Ratio.evalBits(8, 3) == 1)   // 8/3 = 2.67
    assert(FloorLog2Ratio.evalBits(9, 3) == 1)   // exactly 3 -> floor log2 = 1
    assert(FloorLog2Ratio.evalBits(12, 3) == 2)  // exactly 4
    assert(FloorLog2Ratio.evalBits(Long.MaxValue, 1) == 62)
    assert(FloorLog2Ratio.evalBits(Long.MaxValue, Long.MaxValue) == 0)
  }

  test("floor_log2_ratio: property vs BigInteger reference") {
    val gen = for {
      b <- Gen.choose(1L, 1L << 40)
      m <- Gen.choose(1L, 1L << 22)
    } yield (b * m + (b ^ m) % b, b) // a >= b, spread across magnitudes
    ScalaCheckSupport.checkProp(Prop.forAll(gen) { case (a, b) =>
      // reference: largest e with b*2^e <= a, via BigInteger (no overflow)
      val bb = java.math.BigInteger.valueOf(b)
      val aa = java.math.BigInteger.valueOf(a)
      var e = 0
      while (bb.shiftLeft(e + 1).compareTo(aa) <= 0) e += 1
      FloorLog2Ratio.evalBits(a, b) == e
    })
  }

  test("floor_log2_ratio: loud rejects on inverted or non-positive ratios") {
    intercept[IllegalArgumentException](FloorLog2Ratio.evalBits(3, 4))
    intercept[IllegalArgumentException](FloorLog2Ratio.evalBits(5, 0))
    intercept[IllegalArgumentException](FloorLog2Ratio.evalBits(-2, -4))
  }

  test("floor_log2_ratio: SQL surface and null contract") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT floor_log2_ratio(12, 3), floor_log2_ratio(CAST(NULL AS BIGINT), 3)")
      .head()
    assert(r.getInt(0) == 2 && r.isNullAt(1))
  }

  // ------------------------------------------------------- bigram LM

  private val tinyTrain = Seq(
    (1L, "a b a b c"),      // transitions: ab, ba, ab, bc
    (2L, "a b"),            // ab
    (3L, " a  ")            // 1 token -> no transitions
  ).toDF("doc_id", "text")

  test("trainBigramLm: hand-computed counts, V, and derived histories") {
    val lm = LmQuality.trainBigramLm("doc_id", "text")(tinyTrain)
    val big = lm.bigrams.as[(String, String, Long)].collect().toSet
    assert(big == Set(("a", "b", 3L), ("b", "a", 1L), ("b", "c", 1L)))
    val hist = lm.histories.as[(String, Long)].collect().toSet
    assert(hist == Set(("a", 3L), ("b", 2L)))
    assert(lm.vocabSize == 4L) // {a, b, c} + 1 unseen mass
  }

  test("trainBigramLm: minCount prunes bigrams but keeps full history mass") {
    val lm = LmQuality.trainBigramLm("doc_id", "text", minCount = 2L)(tinyTrain)
    val big = lm.bigrams.as[(String, String, Long)].collect().toSet
    assert(big == Set(("a", "b", 3L))) // singletons pruned
    // histories keep the PRE-prune roll-up: b still has mass 2
    val hist = lm.histories.as[(String, Long)].collect().toSet
    assert(hist == Set(("a", 3L), ("b", 2L)))
  }

  test("surprisalBits: hand-computed bits incl. unseen history and short docs") {
    val lm = LmQuality.trainBigramLm("doc_id", "text")(tinyTrain)
    // V=4. Seen: ab -> fl2r(3+4, 3+1)=fl2r(7,4)=0; ba -> fl2r(7,2)=1;
    // bc -> fl2r(7,2)=1. Unseen bigram w/ seen prev: ac -> fl2r(7,1)=2.
    // Unseen history: zz -> fl2r(0+4, 0+1)=2 (= floor log2 V).
    val docs = Seq(
      (10L, "a b c"),   // ab(0) + bc(1) = 1 over 2
      (11L, "a c"),     // ac = 2
      (12L, "z z"),     // unseen history = 2
      (13L, "a"),       // no transitions -> (0, 0)
      (14L, "")         // empty -> (0, 0)
    ).toDF("doc_id", "text")
    val got = LmQuality.surprisalBits("doc_id", "text", lm)(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 2L, 1L), (11L, 1L, 2L), (12L, 1L, 2L),
      (13L, 0L, 0L), (14L, 0L, 0L)))
  }

  test("perplexityFilter: integer milli-bit cut, boundary tie kept") {
    val lm = LmQuality.trainBigramLm("doc_id", "text")(tinyTrain)
    val docs = Seq(
      (10L, "a b c"),  // 1 bit / 2 trans = 500 milli-bits
      (11L, "a c"),    // 2000 milli-bits
      (13L, "a")       // 0/0 -> passes trivially
    ).toDF("doc_id", "text")
    def kept(maxMilli: Long): Set[Long] =
      LmQuality.perplexityFilter("doc_id", "text", lm, maxMilli)(docs)
        .select("doc_id").as[Long].collect().toSet
    assert(kept(500L) == Set(10L, 13L))  // exact tie at the boundary KEPT
    assert(kept(499L) == Set(13L))
    assert(kept(2000L) == Set(10L, 11L, 13L))
  }

  test("perplexityFilter: single-scan form ≡ the docs ⋈ surprisalBits formulation") {
    // Parity pin for the round-12 rewrite: the old form joined the full
    // doc frame against surprisalBits(docs) (which re-joined an id-only
    // scan), doubling the corpus read; the new form attaches the
    // surprisal aggregate with ONE left join. Rows, values, column
    // names, AND column order must be identical.
    val lm = LmQuality.trainBigramLm("doc_id", "text")(tinyTrain)
    val docs = Seq(
      (10L, "a b c", "en"), (11L, "a c", "fr"), (12L, "z z", "en"),
      (13L, "a", "de"), (14L, "", "en")
    ).toDF("doc_id", "text", "lang")
    for (maxMilli <- Seq(0L, 500L, 1500L, 2000L)) {
      val neu = LmQuality.perplexityFilter("doc_id", "text", lm, maxMilli)(docs)
      val old = docs.join(LmQuality.surprisalBits("doc_id", "text", lm)(docs),
          Seq("doc_id"))
        .filter(col("total_bits") * lit(1000L) <= lit(maxMilli) * col("n_trans"))
      assert(neu.columns.toSeq == old.columns.toSeq)
      assert(neu.collect().toSet == old.collect().toSet)
    }
  }

  // ---------------------------------------------------- NB classifier

  test("nbScoreBits: hand-computed scores, prior, OOV, and the tie rule") {
    // pos docs: "good good", "good fine"; neg doc: "bad bad bad"
    val train = Seq(
      (1L, "good good", true), (2L, "good fine", true), (3L, "bad bad bad", false)
    ).toDF("doc_id", "text", "y")
    val m = LmQuality.trainNbQuality("text", "y")(train)
    assert((m.totPos, m.totNeg, m.docsPos, m.docsNeg) == ((4L, 3L, 2L, 1L)))
    assert(m.vocabSize == 4L) // {good, fine, bad} + 1
    // priors: fl2r(5,2)-fl2r(5,3) = 1 - 0 = 1
    // word bits (neg - pos), tot+V: pos den 8, neg den 7:
    //  good: fl2r(7,1)-fl2r(8,4) = 2-1 = 1
    //  bad:  fl2r(7,4)-fl2r(8,1) = 0-3 = -3
    //  oov:  fl2r(7,1)-fl2r(8,1) = 2-3 = -1
    val docs = Seq((10L, "good good"), (11L, "bad"), (12L, "zz"), (13L, ""))
      .toDF("doc_id", "text")
    val got = LmQuality.nbScoreBits("doc_id", "text", m)(docs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (10L, 2L, 3L, true),   // 1+1+prior(1) = 3 > 0
      (11L, 1L, -2L, false), // -3+1
      (12L, 1L, 0L, false),  // -1+1 = 0 -> tie falls to NOT quality
      (13L, 0L, 1L, true)))  // prior only
  }

  test("tokenEntropyBits: repetition scores zero, diversity scores n·log2(types)") {
    val docs = Seq(
      (1L, "x x x x x x x x"),    // one type -> 0 bits, any length
      (2L, "a b c d"),            // uniform over 4 -> 4·⌊log2 4⌋ = 8
      (3L, "a a b b"),            // uniform over 2 -> 4·⌊log2 2⌋ = 4
      (4L, "a a a b"),            // 3·⌊log2 4/3⌋ + 1·⌊log2 4⌋ = 0 + 2
      (5L, "")                    // empty -> (0, 0)
    ).toDF("doc_id", "text")
    val got = graft.text.LmQuality.tokenEntropyBits("doc_id", "text")(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 8L, 0L), (2L, 4L, 8L), (3L, 4L, 4L),
      (4L, 4L, 2L), (5L, 0L, 0L)))
  }

  // ------------------------------------------------------------ DSIR

  test("dsirWeights: identical raw and target corpora weigh exactly zero") {
    val docs = Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = LmQuality.dsirWeights("doc_id", "text", target = docs,
        buckets = 16)(docs)
      .as[(Long, Long, Long)].collect().toSet
    // c_raw(f) == c_tgt(f) and tot_r == tot_t for every bucket ->
    // every per-feature term cancels exactly
    assert(got == Set((1L, 3L, 0L), (2L, 3L, 0L), (3L, 1L, 0L)))
  }

  test("dsirResample: target-like docs outrank, deterministic id tie-break") {
    val target = Seq((100L, "t t t t t t")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "t t t t"),     // pure target-style
      (2L, "u u u u"),     // pure off-target
      (3L, "t t u u"),     // mixed
      (4L, "t t t t")      // identical content to doc 1 -> weight tie
    ).toDF("doc_id", "text")
    val got = LmQuality.dsirResample("doc_id", "text", target, k = 3,
        buckets = 64)(raw)
      .select("doc_id").as[Long].collect().toSeq
    assert(got.take(2) == Seq(1L, 4L), s"tie must break by id: $got") // weight tie -> id asc
    assert(got(2) == 3L, s"mixed doc must outrank pure off-target: $got")
  }
}
