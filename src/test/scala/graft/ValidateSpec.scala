package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.clean.Validate
import graft.model.OffModel

/** O-13…O-21 (SURVEY §2.B): semantic fill, bounds, derivations, time
  * parts, code filter. Reference: pipeline_etl.ipynb:270-436. */
class ValidateSpec extends SparkTestBase {
  import spark.implicits._

  test("fillDefaults replaces null and all invalid markers, keeps valid") {
    val df = Seq("unknown", "N/A", "", "null", "NONE", "undefined", "Real Brand", null)
      .toDF("brands")
    val out = Validate.fillDefaults(df,
      Seq(("brands", None, "marque inconnue")), OffModel.invalidVals)
      .as[String].collect()
    assert(out.toSeq == Seq("marque inconnue", "marque inconnue", "marque inconnue",
      "marque inconnue", "marque inconnue", "marque inconnue", "Real Brand", "marque inconnue"))
  }

  test("fillDefaults truncates to 255 (O-14)") {
    val long = "x" * 300
    val df = Seq(long).toDF("brands")
    val out = Validate.fillDefaults(df,
      Seq(("brands", None, "d")), OffModel.invalidVals).as[String].collect()(0)
    assert(out.length == 255)
  }

  test("fillDefaults uses fallback column when main invalid, and drops it") {
    val df = Seq(("n/a", "Fallback Cat"), ("Main Cat", "unused"))
      .toDF("categories_en", "categories")
    val out = Validate.fillDefaults(df,
      Seq(("categories_en", Some("categories"), "non classe")), OffModel.invalidVals)
    assert(out.columns.toSeq == Seq("categories_en"))
    assert(out.as[String].collect().toSeq == Seq("Fallback Cat", "Main Cat"))
  }

  test("boundsNullOut nulls exactly the out-of-bounds values (O-16)") {
    val df = Seq(Some(-0.1), Some(0.0), Some(50.0), Some(100.0), Some(100.1), None)
      .toDF("fat_100g")
    val out = Validate.boundsNullOut(df, Seq("fat_100g" -> (0d, 100d)))
      .as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(0.0), Some(50.0), Some(100.0), None, None))
  }

  test("boundsNullOut post-condition holds for arbitrary doubles (property)") {
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.chooseNum(-1000.0, 2000.0), Gen.const(Double.NaN)))
    ScalaCheckSupport.checkProp(Prop.forAll(gen) { xs =>
      val df = xs.map(x => if (x.isNaN) None else Some(x)).toDF("sodium_100g")
      val out = Validate.boundsNullOut(df, Seq("sodium_100g" -> (0d, 40d)))
        .as[Option[Double]].collect()
      out.forall(o => o.forall(v => v >= 0 && v <= 40))
    }, minSuccessful = 10)
  }

  test("deriveNutrients: salt ⇄ sodium ×/÷2.5 + kcal→kJ (O-17/O-18)") {
    val df = Seq(
      (Some(2.5), None: Option[Double], Some(100.0)),
      (None: Option[Double], Some(1.0), None: Option[Double]),
      (Some(5.0), Some(2.0), Some(250.0)))
      .toDF("salt_100g", "sodium_100g", "energy_kcal_100g")
    val out = Validate.deriveNutrients(df)
      .select("salt_100g", "sodium_100g", "energy_kj_100g")
      .as[(Option[Double], Option[Double], Option[Double])].collect()
    def ≈(a: Option[Double], b: Double) = a.exists(v => math.abs(v - b) < 1e-9)
    assert(out(0)._1.contains(2.5) && out(0)._2.contains(1.0) && ≈(out(0)._3, 418.4))
    assert(out(1) == ((Some(2.5), Some(1.0), None)))
    assert(out(2)._1.contains(5.0) && out(2)._2.contains(2.0) && ≈(out(2)._3, 1046.0))
  }

  test("salt/sodium round-trip is consistent within ε (property)") {
    val gen = Gen.listOfN(20, Gen.chooseNum(0.0, 100.0))
    ScalaCheckSupport.checkProp(Prop.forAll(gen) { xs =>
      val df = xs.map(x => (Some(x), None: Option[Double])).toDF("salt_100g", "sodium_100g")
      val out = Validate.deriveNutrients(df)
        .select("salt_100g", "sodium_100g")
        .as[(Option[Double], Option[Double])].collect()
      out.forall { case (s, na) =>
        (s, na) match {
          case (Some(sv), Some(nv)) => math.abs(nv * 2.5 - sv) < 1e-9
          case _ => false
        }
      }
    }, minSuccessful = 10)
  }

  test("roundCols rounds HALF_UP to 1 decimal (O-19)") {
    val df = Seq(1.25, 1.24, -1.25, 0.05, 99.99).toDF("fat_100g")
    val out = Validate.roundCols(df, Seq("fat_100g")).as[Double].collect()
    assert(out.toSeq == Seq(1.3, 1.2, -1.3, 0.1, 100.0))
  }

  test("addTimeParts converts unix seconds in UTC (O-20)") {
    val df = Seq(1700000000L).toDF("last_modified_t")
    val out = Validate.addTimeParts(df)
      .select(col("last_modified_date").cast("string")).as[String].collect()(0)
    assert(out == "2023-11-14")
  }

  test("validCode rejects null, empty, and literal 'null' (O-21)") {
    val df = Seq(Some("123"), Some(""), Some("null"), None).toDF("code")
    val out = df.filter(Validate.validCode(col("code"))).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("123")))
  }

  test("arrayToCompatString reproduces the reference's MySQL form (O-15)") {
    val df = Seq(Tuple1(Seq("france", "belgium"))).toDF("c")
    val out = df.select(Validate.arrayToCompatString(col("c"))).as[String].collect()(0)
    assert(out == "[france, belgium]")
  }
}
