package graft

import org.apache.spark.sql.functions._

import graft.operators.Salt

/** Salted two-phase aggregation: result-equivalence with the direct
  * aggregate and salt-spread verification. */
class SaltSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedSumCount ≡ direct groupBy sum/count (skewed key)") {
    // one hot key (90% of rows) + a long tail
    val rows = (1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
    val df = rows.toDF("key", "v").repartition(8)
    val direct = df.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Salt.saltedSumCount(df, Seq("key"), "v", buckets = 8)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("salt is deterministic and spreads the hot key over buckets") {
    val df = (1 to 1000).map(i => ("hot", i)).toDF("key", "v")
    val a = Salt.withSalt(df, Seq("key", "v"), 8).select("__salt").as[Long].collect()
    val b = Salt.withSalt(df, Seq("key", "v"), 8).select("__salt").as[Long].collect()
    assert(a.toSeq == b.toSeq) // deterministic across runs
    assert(a.distinct.length == 8) // hot key actually spread
    assert(a.forall(s => s >= 0 && s < 8))
  }
}
