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
}
