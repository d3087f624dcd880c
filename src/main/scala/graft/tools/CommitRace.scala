package graft.tools

import org.apache.spark.sql.SparkSession

import graft.store.Manifest

/** Second-driver half of the CROSS-PROCESS commit race test
  * (ManifestSpec "cross-process commit atomicity"): a separate JVM
  * hammering synthetic appends at a shared table root while the test
  * JVM does the same. Each commit tags its entries `<tag>_<i>`; the
  * test asserts the final snapshot contains EVERY entry from BOTH
  * writers — on a raw local filesystem that only holds if the
  * lock-file arbiter ([[graft.store.LockFileArbiter]]) actually
  * serializes the exists-check + rename pair across processes
  * (POSIX rename overwrites, so an unarbitrated race loses manifests
  * wholesale, not occasionally).
  *
  * Usage: runMain graft.tools.CommitRace <root> <tag> <nCommits>
  */
object CommitRace {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, n) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"commit-race-$tag")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      (0 until n.toInt).foreach { i =>
        Manifest.appendSynthetic(spark, root, Seq(s"${tag}_$i"))
      }
      // machine-parsable completion marker for the spawning test
      println(s"[commitrace] $tag done ${n.toInt}")
    } finally spark.stop()
  }
}
