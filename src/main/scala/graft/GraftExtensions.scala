package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CleanAsciiExpression, DotLongArrays, HilbertIndexExpression, ShingleHashSet, SimHash32, SimHash64, TopKBy}

/** SparkSessionExtensions entry point: makes the engine's native
  * Catalyst functions available to plain SQL texts on any session built
  * with `.withExtensions(new GraftExtensions)` or launched with
  * `spark.sql.extensions=graft.GraftExtensions` — the standard way a
  * library ships custom expressions to a cluster without code changes
  * in the consuming job.
  *
  *  - `clean_ascii(s)` — codegen unicode→ASCII normalize (O-9)
  *  - `topk_by(order, payload, k)` — map-side-bounded per-group top-k
  *  - `shingle_hash_set(s, word, n)` — codegen sorted-distinct 60-bit
  *    shingle-hash set (the near-dup fingerprint kernel)
  *  - `simhash32(s)` / `simhash64_md5(s)` — codegen md5-SimHash (the
  *    64-bit form is the 16-bit-band corpus-scale variant, q93)
  *  - `bpe_merge_step(syms, l, r)` — one greedy BPE merge pass (the
  *    tokenizer-training inner kernel, q117)
  *  - `floor_log2_ratio(a, b)` — exact integer `⌊log2(a/b)⌋` (the
  *    LM-surprisal / Naive-Bayes / DSIR bit-count kernel, q124+)
  *  - the [[graft.plans.AsOfJoinStrategy]] planner strategy for the
  *    native as-of join operator
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("clean_ascii"),
      new ExpressionInfo(classOf[CleanAsciiExpression].getName, "clean_ascii"),
      (exprs: Seq[Expression]) => CleanAsciiExpression(exprs.head)),
    (FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndexExpression].getName, "hilbert_index"),
      (exprs: Seq[Expression]) => {
        val bits = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hilbert_index bits must be an INT literal, got $other")
        }
        HilbertIndexExpression(exprs(0), exprs(1), bits)
      }),
    (FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKBy].getName, "topk_by"),
      (exprs: Seq[Expression]) => {
        val k = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"topk_by k must be an integer literal, got $other")
        }
        TopKBy(exprs(0), exprs(1), k).toAggregateExpression()
      }),
    (FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSet].getName, "shingle_hash_set"),
      ShingleHashSet.fromSql _),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head)),
    (FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64_md5"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    (FunctionIdentifier("dot_longs"),
      new ExpressionInfo(classOf[DotLongArrays].getName, "dot_longs"),
      (exprs: Seq[Expression]) => DotLongArrays(exprs(0), exprs(1))),
    (FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[graft.functions.CountMinSketch].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => {
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"cms_sketch $what must be an INT literal, got $other")
        }
        graft.functions.CountMinSketch(exprs(0),
          intLit(exprs(1), "depth"), intLit(exprs(2), "width")).toAggregateExpression()
      }),
    (FunctionIdentifier("floor_log2_ratio"),
      new ExpressionInfo(classOf[graft.functions.FloorLog2Ratio].getName, "floor_log2_ratio"),
      (exprs: Seq[Expression]) => graft.functions.FloorLog2Ratio(exprs(0), exprs(1))),
    (FunctionIdentifier("bpe_merge_step"),
      new ExpressionInfo(classOf[graft.functions.BpeMergeStep].getName, "bpe_merge_step"),
      (exprs: Seq[Expression]) => {
        def str(e: Expression, what: String): String = e match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case other => throw new IllegalArgumentException(
            s"bpe_merge_step $what must be a STRING literal, got $other")
        }
        graft.functions.BpeMergeStep(
          exprs(0), str(exprs(1), "left"), str(exprs(2), "right"))
      }))

  /** Register the same functions on an already-running session (e.g. in
    * tests or notebooks where the session pre-exists the library). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Register the engine's UDF-backed text/dedup primitives for SQL
    * texts (session-scoped, unlike the Catalyst functions above which
    * also ship via `spark.sql.extensions`): a user migrating raw SQL
    * can shingle, fingerprint, and verify near-dups without touching
    * the DataFrame API. */
  def registerUdfs(spark: SparkSession): Unit = {
    import graft.dedup.Dedup
    spark.udf.register("char_shingles", Dedup.charShinglesUdf)
    spark.udf.register("word_shingles", Dedup.wordShinglesUdf)
    // simhash32 and jaccard_hash_sets graduated from UDFs to native
    // codegen expressions; registered here too so the UDF-era SQL
    // surface keeps working.
    graft.functions.SimHash32.register(spark)
    graft.functions.JaccardHashSets.register(spark)
    graft.functions.OverlapHashSets.register(spark)
    spark.udf.register("shingle_hash60",
      org.apache.spark.sql.functions.udf((s: String) =>
        Option(s).map(Dedup.shingleHash60)))
  }
}
