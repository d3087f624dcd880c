package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.text.{Curation, Relevance}

/** TF-IDF scoring and the bloom-prefiltered decontamination variant. */
class RelevanceSpec extends SparkTestBase {
  import spark.implicits._

  test("tfIdf: counts and the rational idf on a hand corpus") {
    // "rare" appears in 1 of 3 docs (twice in doc 1); "the" in all 3
    val docs = Seq(
      (1L, "the rare rare word"),
      (2L, "the common word"),
      (3L, "the other text")).toDF("doc_id", "text")
    val out = Relevance.tfIdf(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, "rare")) == ((2L, 1L, 2.0 * 4 / 2))) // tf=2, df=1, 2*(3+1)/(1+1)
    assert(out((1L, "the")) == ((1L, 3L, 1.0 * 4 / 4)))  // tf=1, df=3
    assert(out((2L, "common")) == ((1L, 1L, 1.0 * 4 / 2)))
    // every (doc, term) pair of the corpus is present exactly once
    assert(out.size == out.keys.toSeq.distinct.size)
  }

  test("tfIdf: empty tokens are dropped; a doc of only whitespace contributes nothing") {
    val docs = Seq((1L, "   "), (2L, "one word")).toDF("doc_id", "text")
    val out = Relevance.tfIdf(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  test("bloom-prefiltered contamination counts == exact contamination counts (property)") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    ScalaCheckSupport.checkProp(Prop.forAll(Gen.listOfN(10, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
        .toDF("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val evalSet = docs.filter(col("doc_id") % 3 === 0)
      val exact = Curation.contaminationCounts(corpus, evalSet, "doc_id", "text", n = 3)
        .as[(Long, Long)].collect().toSet
      val bloomed = Curation.contaminationCountsBloom(corpus, evalSet, "doc_id", "text",
          n = 3, expectedGrams = 1000L)
        .as[(Long, Long)].collect().toSet
      exact == bloomed
    }, minSuccessful = 10)
  }

  test("bloomContaminated: superset of the exact verdict; identical in batch and streaming") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = (1L to 30L).map(i =>
      (i, if (i % 5 == 0) "shared eval phrase apple banana cherry date fig"
          else s"unique text $i body ${i * 7} tail ${i * 13} pad ${i * 17}"))
    val corpusRows = docs.filter(_._1 % 3 != 0)
    val evalRows = docs.filter(_._1 % 3 == 0)
    val corpus = corpusRows.toDF("doc_id", "text")
    val evalSet = evalRows.toDF("doc_id", "text")
    val evalGrams = graft.text.Curation.contaminationCounts(corpus, evalSet, "doc_id", "text", n = 3)
    val exactContaminated = evalGrams.filter(col("n_shared_grams") > 0)
      .select("doc_id").as[Long].collect().toSet
    val blob = Curation.bloomOfLongs(
      graft.dedup.Dedup.hashedDocs(evalSet, "doc_id", "text", graft.dedup.Dedup.WordShingles(3))
        .select(explode(col("h")).as("g")).distinct(),
      "g", expectedItems = 10000L)
    // batch verdict
    val batchFlagged = corpus
      .filter(Curation.bloomContaminated(col("text"), blob, n = 3))
      .select("doc_id").as[Long].collect().toSet
    assert(exactContaminated.subsetOf(batchFlagged),
      s"false negatives: ${exactContaminated -- batchFlagged}")
    // streaming verdict over the same rows — must be identical
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .filter(Curation.bloomContaminated(col("text"), blob, n = 3))
      .writeStream.format("memory").queryName("bloom_screen").outputMode("append").start()
    stream.addData(corpusRows: _*)
    q.processAllAvailable(); q.stop()
    val streamFlagged = spark.table("bloom_screen").select("doc_id").as[Long].collect().toSet
    assert(streamFlagged == batchFlagged, s"stream=$streamFlagged batch=$batchFlagged")
  }

  test("empty eval set: null blob means contains-nothing, not an analysis error") {
    val corpus = Seq((1L, "some text here words")).toDF("doc_id", "text")
    val emptyEval = corpus.filter(col("doc_id") < 0)
    val counts = Curation.contaminationCountsBloom(corpus, emptyEval, "doc_id", "text", n = 2)
    assert(counts.count() == 0)
    val blob = Curation.bloomOfLongs(
      emptyEval.select(col("doc_id").as("g")), "g", expectedItems = 10L)
    assert(blob == null)
    assert(corpus.filter(Curation.bloomContaminated(col("text"), blob, n = 2)).count() == 0)
  }

  test("the bloom prefilter is a narrow scan predicate, verification is a sort-merge join") {
    val docs = (1L to 40L).map(i => (i, s"tok$i tok${i + 1} tok${i + 2} shared words here"))
      .toDF("doc_id", "text")
    val out = Curation.contaminationCountsBloom(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", n = 3)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"no bloom prefilter in plan:\n$p")
    assert(p.contains("SortMergeJoin"), s"verification join is not sort-merge:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"eval side broadcast — defeats the point:\n$p")
  }
}
