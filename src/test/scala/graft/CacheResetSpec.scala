package graft

import org.apache.spark.sql.functions._

import graft.text.Curation

/** The CacheReset keep-set contract: a localCheckpoint-backed
  * DataFrame held across a reset dies (lineage is truncated, so an
  * unpersisted checkpoint cannot recompute) UNLESS its RDD ids are
  * passed in `keep`. Exercises the exact hazard documented on
  * [[graft.text.Curation.funnel]]. */
class CacheResetSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and then some more words " +
      "to clear the minimum token count for the quality filter stage okay", "en"),
    (2L, "the quick brown fox jumps over the lazy dog and then some more words " +
      "to clear the minimum token count for the quality filter stage okay", "en"),
    (3L, "a completely different document with plenty of distinct tokens here so " +
      "it also survives the quality screen and the language consistency screen", "en")
  ).toDF("doc_id", "text", "lang")

  test("keep-set exempts held funnel stages from the sweep; swept stages die") {
    val stages = Curation.funnel(docs, "doc_id", "text", "lang").toMap
    val s3 = stages("s3_exact_dedup")
    s3.count() // materialize the lazy localCheckpoint
    val ids = CacheReset.rddIds(s3)
    assert(ids.nonEmpty)

    CacheReset(spark, keep = ids)
    assert(s3.count() == 2) // exact dedup folded the duplicate pair

    CacheReset(spark) // no keep: the checkpoint blocks are swept
    val err = intercept[Exception] { s3.count() }
    assert(err.getMessage != null)
  }

  test("rddIds walks the lineage to the checkpointed block") {
    val df = spark.range(10).toDF("id").localCheckpoint(true)
    val ids = CacheReset.rddIds(df)
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.exists(persisted.contains), s"no persisted id among $ids")
    CacheReset(spark)
  }
}
