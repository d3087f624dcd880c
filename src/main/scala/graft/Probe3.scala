package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") === 0)
    val sh = graft.dedup.Dedup.shingles(col("text"), 5)
    docs.select(
      slice(sort_array(transform(sh, s => concat_ws("", lit("0"), s))), 1, 3).as("inputs"),
      slice(sort_array(transform(sh, s => md5(concat_ws("", lit("0"), s)))), 1, 3).as("md5s"),
      array_min(transform(sh, s => md5(concat_ws("", lit("0"), s)))).as("m0"),
      min(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(lit(1))).as("dummy")
    ).show(false)
    spark.stop()
  }
}
