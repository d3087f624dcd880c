package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.dedup.Dedup

/** The corpus-curation operator family as a reusable API: each stage is
  * a `DataFrame => DataFrame` over a documents table with (idCol,
  * textCol), so pipelines compose with `.transform`. Battery q54 runs
  * exactly this composition end-to-end against a DuckDB oracle.
  *
  * Scale shape: stages 1-2 are narrow (scan-local filters, no
  * shuffle); exact dedup is one shuffle on the content hash; near-dup
  * is the LSH banding path (near-linear candidates, see
  * [[Dedup.minhashCandidatePairs]]); sampling is a narrow filter. A
  * 100 TB corpus pays two shuffles plus the LSH pair join.
  */
object Curation {

  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to")

  private def toks(textCol: String): Column = split(trim(lower(col(textCol))), "\\s+")

  /** Quality filter: ≥ minTokens tokens and stopword ratio < maxStopRatio. */
  def qualityFilter(
      textCol: String, minTokens: Int = 20, maxStopRatio: Double = 0.5,
      stopwords: Seq[String] = DefaultStopwords)(df: DataFrame): DataFrame = {
    val t = toks(textCol)
    val nTok = size(t).cast(LongType)
    val nStop = size(filter(t, tk => tk.isInCollection(stopwords))).cast(LongType)
    df.filter(nTok >= minTokens &&
      nStop.cast("double") / nTok.cast("double") < lit(maxStopRatio))
  }

  /** Stopword-hit language scores for a text column, one count column
    * per (language, markers) entry. */
  def langScores(textCol: String, markers: Seq[(String, Seq[String])]): Seq[(String, Column)] =
    markers.map { case (lang, words) =>
      lang -> size(filter(toks(textCol), tk => tk.isInCollection(words))).cast(LongType)
    }

  val DefaultLangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "es"))

  /** Predicted language = argmax of marker hits (ties resolve in marker
    * order, matching a chained CASE in any SQL engine). */
  def predictedLang(
      textCol: String, markers: Seq[(String, Seq[String])] = DefaultLangMarkers): Column = {
    val scores = langScores(textCol, markers)
    val best = greatest(scores.map(_._2): _*)
    scores.init.foldRight(lit(scores.last._1): Column) { case ((lang, score), elseCol) =>
      when(score === best, lang).otherwise(elseCol)
    }
  }

  /** Keep documents whose labeled language matches the heuristic
    * prediction — a cheap label-consistency screen. */
  def langConsistencyFilter(
      textCol: String, langCol: String,
      markers: Seq[(String, Seq[String])] = DefaultLangMarkers)(df: DataFrame): DataFrame =
    df.filter(predictedLang(textCol, markers) === col(langCol))

  /** Exact dedup: keep the min-id row per identical content. */
  def exactDedup(idCol: String, textCol: String)(df: DataFrame): DataFrame =
    Dedup.exactDedup(df, textCol, idCol)

  /** Near-dup removal: LSH candidates → exact Jaccard ≥ threshold →
    * drop the larger id of each verified pair. */
  def nearDedup(
      idCol: String, textCol: String, shingleN: Int = 5,
      bands: Int = 8, rowsPerBand: Int = 4, jaccardThreshold: Double = 0.5)(
      df: DataFrame): DataFrame = {
    val drops = Dedup.verifiedNearDupPairs(
        df, idCol, textCol, Dedup.CharShingles(shingleN), bands, rowsPerBand)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Cluster-aware near-dup removal: verified pairs → connected
    * components → keep ONLY the min-id doc of each cluster. Differs
    * from [[nearDedup]] on transitive chains: pair-based dropping keeps
    * docs that are only transitively similar (1-3, 2-3 keeps 1 AND 2);
    * cluster-based keeps one representative per component — the
    * standard corpus-dedup policy when near-dup is treated as an
    * equivalence. */
  def nearDedupClustered(
      idCol: String, textCol: String, shingleN: Int = 5,
      bands: Int = 8, rowsPerBand: Int = 4, jaccardThreshold: Double = 0.5)(
      df: DataFrame): DataFrame = {
    val verified = Dedup.verifiedNearDupPairs(
        df, idCol, textCol, Dedup.CharShingles(shingleN), bands, rowsPerBand)
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b")
    val drops = graft.operators.ConnectedComponents.components(verified)
      .filter(col("id") =!= col("comp")) // non-representatives
      .select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Deterministic Bernoulli sample: md5(id) mod `outOf` < `keep` —
    * reproducible across engines, retries, and partitionings. */
  def hashSample(idCol: String, keep: Int, outOf: Int = 100)(df: DataFrame): DataFrame =
    df.filter(
      expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        % outOf < keep)

  /** The full default funnel; returns each stage's surviving DataFrame
    * in order (s0 input … s5 sample) so callers can count, persist, or
    * continue from any stage. */
  def funnel(docs: DataFrame, idCol: String, textCol: String, langCol: String): Seq[(String, DataFrame)] = {
    val s1 = docs.transform(qualityFilter(textCol))
    val s2 = s1.transform(langConsistencyFilter(textCol, langCol))
    val s3 = s2.select(idCol, textCol).transform(exactDedup(idCol, textCol))
    val s4 = s3.transform(nearDedup(idCol, textCol))
    val s5 = s4.transform(hashSample(idCol, keep = 1, outOf = 2))
    Seq("s0_all" -> docs, "s1_quality" -> s1, "s2_lang" -> s2,
      "s3_exact_dedup" -> s3, "s4_near_dedup" -> s4, "s5_sample" -> s5)
  }
}
