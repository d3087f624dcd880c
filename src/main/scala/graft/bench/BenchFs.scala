package graft.bench

import org.apache.spark.sql.SparkSession

/** Filesystem-agnostic existence probe for the bench mains' one-time
  * build markers (generated corpora, stored indexes). The benches used
  * `new java.io.File(path).exists()`, which silently answers "absent"
  * for any non-local filesystem (HDFS/S3A) and would rebuild the
  * fixture every run — the same pitfall Store.pathExists closes for
  * the engine proper. Resolving through the Hadoop FileSystem the path
  * names keeps the probe correct wherever the bench data lives.
  */
object BenchFs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
