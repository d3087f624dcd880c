package graft

import org.apache.spark.sql.SparkSession

/** Frees every materialized intermediate between timed/verified runs:
  * SQL-cache entries AND persistent RDD blocks. `localCheckpoint`
  * blocks (the near-dup fingerprint table, q29's simhash table) live
  * in the RDD block manager, which `spark.catalog.clearCache()` does
  * NOT touch — without the unpersist sweep they accumulate across a
  * 74-query run until ContextCleaner's periodic GC. Unpersisting a
  * localCheckpointed RDD invalidates it (lineage is truncated, so it
  * cannot recompute), which is safe here precisely because the plans
  * referencing it are discarded with the finished run.
  */
object CacheReset {
  def apply(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
