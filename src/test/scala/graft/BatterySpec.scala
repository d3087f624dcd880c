package graft

import graft.analytics.Battery

/** Smoke + contract checks of the driver battery at sf0.001: every
  * query executes, oracle coverage is total, and names/columns are
  * stable (the driver hash-compares on column names — SparkEntry
  * contract). */
class BatterySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every battery query has an oracle (full correctness-gate coverage)") {
    val missing = Battery.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("query names are unique and stable") {
    val names = Battery.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")))
  }

  Battery.all.foreach { q =>
    test(s"${q.name} executes at sf0.001 with rows >= 0") {
      val df = q.run(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry (flagship) returns rows > 0 — driver smoke contract") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries/oracleSql maps line up with the battery") {
    assert(SparkEntry.queries.keySet == Battery.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
