package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.Manifest

/** Column-mapping cost point: the claim "rename/drop are METADATA-ONLY
  * commits" made quantitative. On an N-row table, measure (a) the
  * renameColumn commit wall, (b) the dropColumn commit wall, (c) what
  * the same rename costs WITHOUT mapping — a full-table rewrite
  * through overwrite with the column aliased — and (d) that a filtered
  * read through the renamed name still file-prunes (planner-equivalent
  * probed bytes before vs after the rename).
  *
  * Usage: runMain graft.bench.ColMapBench [rows]
  * Prints one JSON line.
  */
object ColMapBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_colmap_bench").toString

    def data = spark.range(0, rows).select(
      col("id").as("k"),
      (col("id") * 7919L % 1000000L).as("v"),
      (col("id") % 97L).as("tag"))

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // mapped table: build range-clustered so the skip index is sharp
    val root = s"$dir/mapped"
    Manifest.append(data, root, statsCols = Seq("k"))
    Manifest.compact(spark, root, targetBytes = 1L * 1024 * 1024,
      rangeBy = Seq("k"))
    // the physical name behind the evolving logical: "k" throughout
    // (rename is metadata-only, so the stats stay keyed "k")
    def probedBytes(): Long = {
      val snap = Manifest.current(spark, root).get
      Manifest.prunedFiles(snap, "k", rows / 4, rows / 4 + rows / 100)
        .flatMap(f => snap.bytes.get(f)).sum
    }
    val preBytes = probedBytes()
    val renameS = sec { Manifest.renameColumn(spark, root, "k", "key"); () }
    val postBytes = probedBytes()
    val dropS = sec { Manifest.dropColumn(spark, root, "tag"); () }
    // correctness spot: the renamed read returns rows
    val n = Manifest.readWhereBetween(spark, root, "key",
      rows / 4, rows / 4 + rows / 100).count()
    require(n == rows / 100 + 1, s"renamed skip read returned $n")

    // the unmapped alternative: rewrite the whole table to rename
    val root2 = s"$dir/rewrite"
    Manifest.append(data, root2, statsCols = Seq("k"))
    Manifest.compact(spark, root2, targetBytes = 1L * 1024 * 1024,
      rangeBy = Seq("k"))
    val rewriteS = sec {
      Manifest.overwrite(
        Manifest.read(spark, root2).withColumnRenamed("k", "key"),
        root2, statsCols = Seq("key")); ()
    }

    println(s"""{"campaign":"col_mapping","rows":$rows""" +
      f""","rename_s":$renameS%.3f,"drop_s":$dropS%.3f""" +
      f""","rewrite_rename_s":$rewriteS%.3f""" +
      s""","probed_bytes_pre":$preBytes,"probed_bytes_post":$postBytes}""")
    spark.stop()
  }
}
