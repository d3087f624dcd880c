package graft.clean

import java.text.Normalizer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Text normalization operators O-9…O-12 (SURVEY §2.B).
  *
  * Reference behavior: vincent_valentin/pipeline_etl.ipynb:205-257. The
  * reference pays a Python-worker round trip per row for its ascii UDF;
  * here it is an in-JVM Scala UDF (and `cleanTextAscii` is a pure
  * built-in chain that stays inside whole-stage codegen when input is
  * known-ASCII).
  */
object TextClean {

  /** O-9: NFKC → NFD → drop non-ASCII; null-safe. Mirrors Python
    * `unicodedata.normalize('NFD', normalize('NFKC', s)).encode('ascii',
    * 'ignore')` (pipeline_etl.ipynb:205-211): NFD decomposes accents into
    * base + combining marks, and the ASCII filter drops the marks. */
  def cleanAsciiString(s: String): String =
    if (s == null) null
    else
      Normalizer
        .normalize(Normalizer.normalize(s, Normalizer.Form.NFKC), Normalizer.Form.NFD)
        .replaceAll("[^\\x00-\\x7F]", "")

  val cleanAsciiUdf: UserDefinedFunction = udf(cleanAsciiString _)

  /** O-9 as a Column — the native Catalyst expression (stays inside
    * whole-stage codegen; the UDF variant above is kept for reference
    * and equivalence testing). */
  def cleanAscii(c: Column): Column =
    graft.functions.CleanAsciiExpression.cleanAsciiNative(c)

  /** O-10: full clean chain — ascii → strip non-alnum → trim → lower →
    * collapse whitespace (pipeline_etl.ipynb:214-240, exact composition
    * and order). */
  def cleanText(c: Column): Column =
    regexp_replace(
      lower(trim(regexp_replace(cleanAscii(c), "[^a-zA-Z0-9 ]", ""))),
      "\\s+", " ")

  /** O-10 without the unicode UDF: identical on ASCII input, pure
    * built-ins (whole-stage codegen survives). Used where the input is
    * known-ASCII and in oracle-checked queries. */
  def cleanTextAscii(c: Column): Column =
    regexp_replace(
      lower(trim(regexp_replace(c, "[^a-zA-Z0-9 ]", ""))),
      "\\s+", " ")

  /** O-11: main-category extract — first `-`-segment, strip `xx:` lang
    * prefix (pipeline_etl.ipynb:246-250). */
  def mainCategoryExtract(c: Column): Column =
    regexp_replace(split(c, "-").getItem(0), "^[a-z]{2}:", "")

  /** O-12: light clean for the excluded columns — trim → lower → ascii
    * (pipeline_etl.ipynb:253-257; note ascii is applied LAST here,
    * unlike O-10). */
  def lightClean(c: Column): Column = cleanAscii(lower(trim(c)))

  /** O-10's dtype-driven column discovery: apply `cleanText` to every
    * StringType column not excluded (pipeline_etl.ipynb:214-216). One
    * `select`, not N `withColumn` plan nodes. */
  def cleanAllStringCols(df: DataFrame, exclude: Set[String]): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType && !exclude(f.name)) cleanText(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
