package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll

import graft.clean.TextClean

/** O-9…O-12 (SURVEY §2.B): unicode→ASCII normalize + clean chains.
  * Reference semantics: pipeline_etl.ipynb:205-257. */
class TextCleanSpec extends SparkTestBase {

  test("cleanAsciiString strips accents via NFKC→NFD (quality_report.md:75-79 family)") {
    assert(TextClean.cleanAsciiString("Côte d'Or") == "Cote d'Or")
    assert(TextClean.cleanAsciiString("Müsli à l'ancienne") == "Musli a l'ancienne")
    assert(TextClean.cleanAsciiString("™") == "TM") // NFKC compatibility decomposition
    assert(TextClean.cleanAsciiString("½") == "1⁄2".replace("⁄", "")) // fraction slash is non-ASCII
    assert(TextClean.cleanAsciiString(null) == null)
    assert(TextClean.cleanAsciiString("") == "")
    assert(TextClean.cleanAsciiString("plain ascii 123") == "plain ascii 123")
  }

  test("cleanAsciiString is idempotent and ASCII-only (property)") {
    ScalaCheckSupport.checkProp(forAll { (s: String) =>
      val once = TextClean.cleanAsciiString(s)
      val twice = TextClean.cleanAsciiString(once)
      once == twice && once.forall(_ < 128)
    })
  }

  test("cleanText full chain matches reference composition order") {
    val df = spark.createDataFrame(Seq(
      Tuple1("  Côte  d'Or™   Chocolat "),
      Tuple1("UPPER-case_and.punct!"),
      Tuple1("0.9"), // decimal point IS stripped — reference cleans numeric string cols too
      Tuple1("   "),
      Tuple1("déjà vu"))).toDF("s")
    val out = df.select(TextClean.cleanText(col("s")).as("c")).collect().map(_.getString(0))
    assert(out(0) == "cote dortm chocolat")
    assert(out(1) == "uppercaseandpunct")
    assert(out(2) == "09")
    assert(out(3) == "")
    assert(out(4) == "deja vu")
  }

  test("cleanText is idempotent and output ⊆ [a-z0-9 ], no edge spaces") {
    val corpus = Seq("Côte d'Or™", "a  b\t c", " x ", "", "ŒUF œuf", "ﬁre ﬂow",
      "naïve café", "ÀÉÎÕÜ", "12.5g", "foo--bar", "ß sharp", "日本語 mixed latin")
    val df = spark.createDataFrame(corpus.map(Tuple1(_))).toDF("s")
    val once = df.select(TextClean.cleanText(col("s")).as("c"))
    val rows = once.select(col("c"), TextClean.cleanText(col("c")).as("c2")).collect()
    rows.foreach { r =>
      val (c, c2) = (r.getString(0), r.getString(1))
      assert(c == c2, s"not idempotent: '$c' vs '$c2'")
      assert(c.matches("[a-z0-9 ]*"), s"bad chars in '$c'")
      assert(c == c.trim, s"edge spaces in '$c'")
    }
  }

  test("mainCategoryExtract: first dash segment, lang prefix stripped") {
    val df = spark.createDataFrame(Seq(
      Tuple1("en:chocolate-spreads"), Tuple1("fr:boissons"), Tuple1("plain"),
      Tuple1("no-lang-prefix"))).toDF("s")
    val out = df.select(TextClean.mainCategoryExtract(col("s")).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("chocolate", "boissons", "plain", "no"))
  }

  test("lightClean applies ascii LAST (order differs from cleanText)") {
    val df = spark.createDataFrame(Seq(Tuple1("  FRANCE, Bélgique "))).toDF("s")
    val out = df.select(TextClean.lightClean(col("s")).as("c")).collect()(0).getString(0)
    assert(out == "france, belgique") // punctuation survives light clean
  }

  test("cleanAllStringCols touches only non-excluded string columns") {
    val df = spark.createDataFrame(Seq(("Côte!", "Kéep, me", 1L)))
      .toDF("clean_me", "excluded", "num")
    val out = TextClean.cleanAllStringCols(df, Set("excluded")).collect()(0)
    assert(out.getString(0) == "cote")
    assert(out.getString(1) == "Kéep, me")
    assert(out.getLong(2) == 1L)
  }
}
