package graft

import graft.operators.Linkage

/** Unit coverage of Fellegi–Sunter linkage (battery q139/q140 check
  * the blocked-customer pipeline against the DuckDB oracle). */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  // 2 matches (name agrees on both; city agrees on one) and
  // 2 non-matches (name never agrees; city agrees on one)
  private val pairs = Seq(
    ("x", "x", "p", "p", true),
    ("y", "y", "p", "q", true),
    ("x", "y", "p", "p", false),
    ("x", "z", "p", "q", false)
  ).toDF("name_a", "name_b", "city_a", "city_b", "is_match")
  private val fields = Seq(("city", "city_a", "city_b"), ("name", "name_a", "name_b"))

  test("fsCounts: per-field agreement counts over labeled pairs") {
    val got = Linkage.fsCounts(pairs, "is_match", fields)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("name", 2L, 2L, 2L, 0L), ("city", 2L, 2L, 1L, 1L)))
  }

  test("fsWeights: hand-computed signed bits incl. the add-one smoothing") {
    // name: m=(2+1)/4, u=(0+1)/4 -> agree = ⌊log2 3⌋ = 1;
    //       disagree = (0+1)/4 vs (2+1)/4 -> ratio 1/3 -> −⌊log2 3⌋ = −1
    // city: m=2/4, u=2/4 -> both weights 0 (uninformative field)
    val got = Linkage.fsWeights(pairs, "is_match", fields)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("name", 1L, -1L), ("city", 0L, 0L)))
  }

  test("fsWeights: an anti-predictive field gets a NEGATIVE agree weight") {
    // agreement only among NON-matches
    val p = Seq(("a", "b", true), ("c", "d", true),
      ("e", "e", false), ("f", "f", false), ("g", "g", false)).toDF("va", "vb", "y")
    val w = Linkage.fsWeights(p, "y", Seq(("v", "va", "vb")))
      .as[(String, Long, Long)].head()
    // m=(0+1)/4, u=(3+1)/5 -> ratio 5/16 -> −⌊log2 16/5⌋ = −1
    assert(w == (("v", -1L, 1L)), s"$w")
  }

  test("scoreFs + linkFs: literal-weight sum, threshold decision, loud missing field") {
    val scored = Linkage.scoreFs(pairs, fields,
      Map("name" -> (5L, -3L), "city" -> (1L, -1L)))
      .select("name_a", "name_b", "score_bits")
      .as[(String, String, Long)].collect().toSet
    assert(scored == Set(("x", "x", 6L), ("y", "y", 4L),
      ("x", "y", -2L), ("x", "z", -4L)))
    val linked = Linkage.linkFs(pairs, "is_match", fields, minScoreBits = 1L)
      .select("name_a", "name_b", "predicted")
      .as[(String, String, Boolean)].collect().toSet
    assert(linked == Set(("x", "x", true), ("y", "y", true),
      ("x", "y", false), ("x", "z", false)))
    intercept[IllegalArgumentException](
      Linkage.scoreFs(pairs, fields, Map("name" -> (1L, -1L))))
  }

  // ------------------------------------------------------------- EM

  /** Deterministic mixture fixture: 2000 pairs, 20% true matches.
    * Agreement rates by construction (conditionally independent):
    * match:     name 90%, bal 92%, seg 100%
    * non-match: name  5%, bal 10%, seg  50%  */
  private def emFixture = (1 to 2000).map { i =>
    val isMatch = i % 5 == 0
    // non-match moduli COPRIME with 5: a multiple-of-5 modulus would
    // be a subset of the matches, so non-matches would never agree and
    // EM would (correctly) absorb u to the lattice floor
    val nameAg = if (isMatch) i % 50 != 0 else i % 19 == 0
    val balAg = if (isMatch) i % 25 != 0 else i % 9 == 0
    val segAg = if (isMatch) true else i % 2 == 0
    ("n" + i, if (nameAg) "n" + i else "x" + i,
      "b" + i, if (balAg) "b" + i else "y" + i,
      "s" + i, if (segAg) "s" + i else "z" + i, isMatch)
  }.toDF("name_a", "name_b", "bal_a", "bal_b", "seg_a", "seg_b", "is_match")

  private val emFields: Seq[Linkage.FieldPair] = Seq(
    ("bal", "bal_a", "bal_b"), ("name", "name_a", "name_b"),
    ("seg", "seg_a", "seg_b"))

  test("patternCounts: one row per agreement pattern, counts sum to |pairs|") {
    val got = Linkage.patternCounts(pairs, fields)
      .as[(Boolean, Boolean, Long)].collect().toSet
    // (city, name): (T,T)=1 match x-x; (F,T)=1 y-y; (T,F)=1 x-y; (F,F)=1 x-z
    assert(got == Set((true, true, 1L), (false, true, 1L),
      (true, false, 1L), (false, false, 1L)))
  }

  test("fsEmParams: label-free EM recovers the planted mixture") {
    val p = Linkage.fsEmParams(emFixture, emFields)
    val S = Linkage.EmScale
    // λ -> the planted 20% match proportion (generously banded: EM's
    // component boundary is soft where patterns overlap)
    assert(p.lambdaPpm > S / 10 && p.lambdaPpm < 3 * S / 10, s"lambda=${p.lambdaPpm}")
    // m high / u low on every field, ordered the planted way
    for (f <- Seq("name", "bal")) {
      assert(p.mPpm(f) > 8 * S / 10, s"m($f)=${p.mPpm(f)}")
      assert(p.uPpm(f) < 2 * S / 10, s"u($f)=${p.uPpm(f)}")
    }
    assert(p.mPpm("seg") > 9 * S / 10 && p.uPpm("seg") < 6 * S / 10)
  }

  test("fsEmWeights: converge to the supervised weights on the labeled fixture") {
    val em = Linkage.fsEmWeights(emFixture, emFields)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    val sup = Linkage.fsWeights(emFixture, "is_match", emFields)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    for (f <- emFields.map(_._1)) {
      val (ea, ed) = em(f); val (sa, sd) = sup(f)
      // same sign and within 1 bit: the quantized EM estimate of the
      // same mixture the labels define
      assert(math.abs(ea - sa) <= 1, s"$f agree: em=$ea sup=$sa")
      assert(math.abs(ed - sd) <= 1, s"$f disagree: em=$ed sup=$sd")
      // agree evidence never negative, disagree never positive (seg's
      // ~2:1 agree ratio floors to 0 bits — in BOTH estimators)
      assert(ea >= 0 && ed <= 0, s"$f signs: $ea/$ed")
    }
  }

  test("fsEmParams: deterministic, bounded-iteration, loud on empty") {
    val a = Linkage.fsEmParams(emFixture, emFields, iters = 7)
    val b = Linkage.fsEmParams(emFixture, emFields, iters = 7)
    assert(a == b)
    // uniform input (every field agrees on every pair) must not crash —
    // parameters clamp to the lattice edge instead of absorbing to 0/1
    val uni = Seq(("a", "a"), ("b", "b")).toDF("va", "vb")
    val u = Linkage.fsEmParams(uni, Seq(("v", "va", "vb")))
    assert(u.mPpm("v") >= 1 && u.mPpm("v") <= Linkage.EmScale - 1)
    intercept[IllegalArgumentException](
      Linkage.fsEmParams(emFixture, emFields, iters = 0))
    intercept[IllegalArgumentException](
      Linkage.fsEmParams(emFixture.limit(0), emFields))
  }
}
