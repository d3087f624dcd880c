package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup

/** Native Catalyst expressions for the near-dup family's CPU-dominant
  * kernels — the round-6 verdict's top item. These replace the opaque
  * Scala UDFs `shingleHashSetUdf` / `simhash32Md5Udf`: a UDF call is a
  * whole-stage-codegen fence plus a per-row serde boundary, and the
  * shingle-hash pass is the single hottest stage of the entire dedup
  * family (q26/q27/q28/q64/q75/q79 + the q54 funnel) — exactly where a
  * fence hurts most at 100 TB. As opaque expressions they ALSO keep the
  * protection the UDFs existed for: their output array is a leaf value
  * to any downstream higher-order function, so the documented Spark
  * 4.1.2 nested-lambda mis-binding hazard (Dedup.scala bandSigsUdf
  * scaladoc) can never see inside them.
  *
  * Semantics are bit-for-bit those of the UDFs they replace (the DuckDB
  * oracles pin them): md5-based 60-bit shingle hashes
  * ([[Dedup.shingleHash60]]), sorted-distinct sets, and the md5-derived
  * 32-bit SimHash. Measured before→after (sf0.1, local[32], min-of-2
  * in one JVM): q29 3.29→2.82s, q79 3.16→2.67s, q64 2.66→2.59s,
  * q27 2.29→2.23s — the removed serde + fence is worth ~10-15% on the
  * simhash/CC paths; the remaining per-row cost is the md5 digest
  * itself (shared by any engine computing the same portable hash).
  */
case class ShingleHashSet(child: Expression, word: Boolean, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes: SQL callers keep the coercion the former UDF
  // gave them (any atomic input implicitly casts to STRING)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashSet.evalUtf8(input.asInstanceOf[UTF8String], word, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashSet.evalUtf8($c, $word, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Sort in place, then dedupe in place; the input array is consumed. */
  private def distinctSorted(a: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < a.length) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Exactly [[Dedup.charShinglesScala]]/[[Dedup.wordShinglesScala]]
    * followed by hash+distinct+sort, except the distinct runs on the
    * 60-bit hashes directly (the UDF deduped strings AND then hashes;
    * distinct-of-hashes is the same final set either way) — no
    * intermediate distinct string set is materialized. */
  def evalUtf8(s: UTF8String, word: Boolean, n: Int): ArrayData = {
    val t = s.toString
    val raw: Array[Long] =
      if (word) {
        val toks = ws.split(t.trim)
        if (toks.length >= n) {
          val m = toks.length - n + 1
          val out = new Array[Long](m)
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            out(i) = Dedup.shingleHash60(sb.toString)
            i += 1
          }
          out
        } else Array(Dedup.shingleHash60(toks.mkString(" ")))
      } else {
        if (t.length >= n) {
          val m = t.length - n + 1
          val out = new Array[Long](m)
          var i = 0
          while (i < m) {
            out(i) = Dedup.shingleHash60(t.substring(i, i + n))
            i += 1
          }
          out
        } else Array(Dedup.shingleHash60(t))
      }
    new GenericArrayData(distinctSorted(raw))
  }

  /** Column API — the [[Dedup.hashedDocs]] kernel. */
  def shingleHashSet(text: Column, mode: Dedup.ShingleMode): Column = mode match {
    case Dedup.CharShingles(n) =>
      GraftSqlBridge.column(ShingleHashSet(GraftSqlBridge.expression(text), word = false, n))
    case Dedup.WordShingles(n) =>
      GraftSqlBridge.column(ShingleHashSet(GraftSqlBridge.expression(text), word = true, n))
  }

  /** SQL builder: `shingle_hash_set(text, word_boolean, n)`. */
  def fromSql(exprs: Seq[Expression]): Expression = {
    val word = exprs(1) match {
      case Literal(b: Boolean, BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"shingle_hash_set `word` must be a boolean literal, got $other")
    }
    val n = exprs(2) match {
      case Literal(i: Int, IntegerType) => i
      case other => throw new IllegalArgumentException(
        s"shingle_hash_set `n` must be an integer literal, got $other")
    }
    ShingleHashSet(exprs.head, word, n)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSet].getName, "shingle_hash_set"),
      fromSql _)
}

/** 32-bit md5-SimHash as a codegen expression — the cross-engine
  * reproducible SimHash (token hash = first 8 hex chars of md5(token)
  * as unsigned; bit b of the result set iff more than half the distinct
  * non-empty lowercased tokens have bit b set). Bit-for-bit the
  * semantics of the former `simhash32Md5Udf`, pinned by q29's DuckDB
  * oracle. */
case class SimHash32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.evalUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** The STRING shingle set (distinct, first-appearance order) as a
  * codegen expression — the kernel behind `Dedup.shingles` /
  * `Dedup.wordShingles`, which the repetition-stats (q67) and
  * repeated-n-gram (q70) scans evaluate once per document over the
  * whole corpus. Same fence-free rationale as the rest of this file;
  * semantics are exactly [[Dedup.charShinglesScala]] /
  * [[Dedup.wordShinglesScala]] (the SQL-facing `char_shingles` /
  * `word_shingles` UDFs stay registered for dynamic-`n` SQL use). */
case class ShingleArray(child: Expression, word: Boolean, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_array"

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.evalUtf8(input.asInstanceOf[UTF8String], word, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleArray.evalUtf8($c, $word, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {

  /** Static kernel shared by interpreted eval and generated code. */
  def evalUtf8(s: UTF8String, word: Boolean, n: Int): ArrayData = {
    val sh = if (word) Dedup.wordShinglesScala(s.toString, n)
             else Dedup.charShinglesScala(s.toString, n)
    val out = new Array[Any](sh.length)
    var i = 0
    sh.foreach { x => out(i) = UTF8String.fromString(x); i += 1 }
    new GenericArrayData(out)
  }

  def shingles(text: Column, word: Boolean, n: Int): Column =
    GraftSqlBridge.column(ShingleArray(GraftSqlBridge.expression(text), word, n))
}

/** ALL word n-gram windows IN ORDER (no dedup) — the positional
  * kernel behind [[graft.dedup.Dedup.positionalWordNgrams]]: the array
  * index of each window IS its 0-based start-token position, which the
  * substring-dedup span arithmetic (q114/q115) depends on. A codegen
  * expression for the same reason as [[ShingleArray]] — the window
  * build runs once per corpus document, and the interpreted
  * `transform(sequence, slice∘array_join)` form it replaces both
  * re-evaluated the token split per window and fenced codegen
  * (measured ~9× slower on the battery corpus). Docs shorter than n
  * tokens yield an EMPTY array (no whole-text fallback — a span that
  * can't fit the window can't flag). */
case class WordNgramWindows(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngram_windows"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramWindows.evalUtf8(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgramWindows.evalUtf8($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramWindows =
    copy(child = newChild)
}

object WordNgramWindows {

  /** Static kernel shared by interpreted eval and generated code.
    * Tokenization is exactly `trim.split("\\s+")` — the contract the
    * q114/q115 oracles mirror with `string_split_regex(trim(text))`. */
  def evalUtf8(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.trim.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def windows(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordNgramWindows(GraftSqlBridge.expression(text), n))
}

/** Exact Jaccard of two SORTED distinct long arrays by linear merge —
  * the verification kernel that runs once per LSH candidate pair (the
  * join output is the biggest row stream of the near-dup family at
  * 100 TB). Replaces `jaccardOfHashSetsUdf`: as a codegen expression it
  * reads the unsafe array data in place — no per-pair boxing of every
  * element into Array[Long] for a Scala closure, no codegen fence. */
case class JaccardHashSets(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ARRAY<INT> (etc.) inputs implicitly cast element-wise to
  // ARRAY<BIGINT>, as the former UDF's ScalaReflection coercion did
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_hash_sets"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardHashSets.evalArrays(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaccardHashSets.evalArrays($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardHashSets =
    copy(left = newLeft, right = newRight)
}

object JaccardHashSets {

  /** Static kernel shared by interpreted eval and generated code.
    * Inputs must be sorted distinct (as [[ShingleHashSet]] emits). */
  def evalArrays(sa: ArrayData, sb: ArrayData): Double = {
    val na = sa.numElements(); val nb = sb.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val a = sa.getLong(i); val b = sb.getLong(j)
      if (a == b) { inter += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def jaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardHashSets(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaccard_hash_sets"),
      new ExpressionInfo(classOf[JaccardHashSets].getName, "jaccard_hash_sets"),
      (exprs: Seq[Expression]) => JaccardHashSets(exprs(0), exprs(1)))
}

/** Per-band signature strings from a 60-bit shingle-hash set via the
  * permutation-minhash family ([[Dedup.minhashPermScala]]: ONE md5 per
  * shingle upstream + k linear maps here) — the banding kernel of the
  * LSH path, one eval per document. Replaces `bandSigsFromHashesUdf`
  * with the same fence-free rationale as the rest of this file; the
  * opaque output also keeps the Spark 4.1.2 nested-lambda hazard
  * structurally impossible. */
case class MinhashBandSigs(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinhashBandSigs.evalArray(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashBandSigs.evalArray($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBandSigs =
    copy(child = newChild)
}

object MinhashBandSigs {

  /** Static kernel: k = bands·rowsPerBand permutation minhashes, then
    * one "m_i|m_j|..." string per band — identical to the UDF it
    * replaces (and to the SQL the oracles inline via
    * [[Dedup.permConsts]]). */
  def evalArray(h: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = h.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = h.getLong(i); i += 1 }
    val mins = Dedup.minhashPermScala(hs, bands * rowsPerBand)
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('|')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  def bandSigs(h: Column, bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.column(MinhashBandSigs(GraftSqlBridge.expression(h), bands, rowsPerBand))
}

object SimHash32 {

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Votes are summed over the DISTINCT non-empty tokens (a HashSet
    * dedupe — addition is commutative, so set-iteration order is
    * irrelevant), identical to the UDF's `.distinct.filter(_.nonEmpty)`. */
  def evalUtf8(s: UTF8String): Long = {
    val toks = ws.split(s.toString.trim.toLowerCase)
    val seen = new java.util.HashSet[String]()
    val md = md5Tl.get()
    val counts = new Array[Int](32)
    var total = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && seen.add(t)) {
        total += 1
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        // first 4 bytes == first 8 hex chars, big-endian unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (counts(b) * 2 > total) out |= (1L << b); b += 1 }
    out
  }

  /** Column API — replaces `Dedup.simhash32Md5Udf`. */
  def simhash32(text: Column): Column =
    GraftSqlBridge.column(SimHash32(GraftSqlBridge.expression(text)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head))
}

/** 64-bit md5-SimHash — the corpus-scale variant of [[SimHash32]].
  *
  * Why it exists: byte-banding a 32-bit simhash (q29) has only
  * 4 bands × 256 bucket values, so bucket OCCUPANCY — and with it the
  * candidate-pair count — grows with corpus size and the self-join
  * goes quadratic once n ≫ 256·4 (measured in BENCH_SCALE.md: the one
  * super-linear query of the family). With 64 bits the same pigeonhole
  * argument (any pair at hamming ≤ 3 shares one of 4 unchanged bands)
  * runs on 16-bit bands = 65,536 bucket values per band, deferring
  * saturation by 256× for the identical recall guarantee — this is the
  * 100 TB form of simhash near-dup.
  *
  * Same tokenization and vote as [[SimHash32]]; token hash = first
  * 16 md5 hex chars as an unsigned 64-bit value (cross-engine: DuckDB
  * rebuilds it via ('0x' || substr(md5(t),1,16))::UBIGINT, with the
  * sign bit reattached as -2⁶³ — pinned by q93's oracle). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.evalUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.evalUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val md5Tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def evalUtf8(s: UTF8String): Long = {
    val toks = ws.split(s.toString.trim.toLowerCase)
    val seen = new java.util.HashSet[String]()
    val md = md5Tl.get()
    val counts = new Array[Int](64)
    var total = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty && seen.add(t)) {
        total += 1
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        // first 8 bytes == first 16 hex chars, big-endian unsigned
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > total) out |= (1L << b); b += 1 }
    out
  }

  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64_md5"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head))
}

/** Per-band signature strings via DENSIFIED ONE-PERMUTATION HASHING
  * (Shrivastava & Li, "Densifying One Permutation Hashing via Rotation
  * for Fast Near Neighbor Search", ICML 2014) — the O(|shingles|)
  * signature kernel, vs the k-permutation family's O(k·|shingles|)
  * ([[MinhashBandSigs]]).
  *
  * One fixed permutation maps each 60-bit shingle hash to a value in
  * [0, P); the value range is split into k equal bins (bin =
  * v·k div P) and each bin keeps its min. Empty bins densify by
  * circular rotation: borrow the nearest occupied bin to the RIGHT at
  * offset t, shifted by t·P so borrowed values cannot collide with
  * in-range ones. Per signature slot the collision probability still
  * tracks Jaccard (the densified estimator is unbiased), so the
  * banding threshold calculus of the k-permutation family carries
  * over unchanged — same (bands, rowsPerBand) knobs, same bucket
  * join downstream.
  *
  * At 100 TB the difference is the whole signature scan: k=32
  * multiply-adds per shingle collapse to ONE, turning the second
  * CPU-dominant stage of the near-dup path (after the md5 shingle
  * pass itself) into array indexing. Measured (QueryLoop, sf0.1,
  * min-of-3 same-JVM): the full candidate query drops 1.35 → 0.91 s
  * vs the k-permutation q26 at identical (8,4) banding, with the
  * shared md5 pass still dominating both; recall at the banding's
  * design threshold is identical (1.000 for J ≥ 0.4 on the exact
  * all-pairs ground truth where both families also score 1.000).
  * Empty shingle sets leave every slot at the Long.MaxValue sentinel
  * (all-empty docs collide with each other, as in the k-permutation
  * family).
  */
case class OphBandSigs(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(bands >= 1 && rowsPerBand >= 1, "oph banding must be positive")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "oph_band_sigs"

  override protected def nullSafeEval(input: Any): Any =
    OphBandSigs.evalArray(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.OphBandSigs.evalArray($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): OphBandSigs =
    copy(child = newChild)
}

object OphBandSigs {

  /** Densified OPH slot values: one permutation, k bins by value
    * range, min per bin, empty bins borrow from the nearest occupied
    * bin rightward (circular) at offset t as borrowed + t·P. Exposed
    * for specs and the SQL oracle mirror. */
  def ophMins(h: Array[Long], k: Int): Array[Long] = {
    import graft.dedup.Dedup.MinhashP
    val (a, b) = graft.dedup.Dedup.permConsts(1).head
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    var occupied = 0
    while (i < h.length) {
      val v = (a * (h(i) % MinhashP) + b) % MinhashP
      val j = ((v * k) / MinhashP).toInt
      if (mins(j) == Long.MaxValue) occupied += 1
      if (v < mins(j)) mins(j) = v
      i += 1
    }
    if (occupied > 0 && occupied < k) {
      val out = new Array[Long](k)
      var j = 0
      while (j < k) {
        if (mins(j) != Long.MaxValue) out(j) = mins(j)
        else {
          var t = 1
          while (mins((j + t) % k) == Long.MaxValue) t += 1
          out(j) = mins((j + t) % k) + t.toLong * MinhashP
        }
        j += 1
      }
      out
    } else mins
  }

  /** Static kernel: k = bands·rowsPerBand densified-OPH slots, then
    * one "m_i|m_j|..." string per band — the same banding format as
    * [[MinhashBandSigs.evalArray]], so every downstream bucket join
    * ([[graft.dedup.Dedup.candidatePairsFromBanded]], the stored
    * corpus index, the streaming screen) is reused unchanged. */
  def evalArray(h: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = h.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = h.getLong(i); i += 1 }
    val mins = ophMins(hs, bands * rowsPerBand)
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append('|')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  def bandSigs(h: Column, bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.column(OphBandSigs(GraftSqlBridge.expression(h), bands, rowsPerBand))
}

/** Overlap coefficient (Szymkiewicz–Simpson) of two SORTED distinct
  * long arrays: |A∩B| / min(|A|, |B|) — the CONTAINMENT metric. A
  * short document quoted wholesale inside a long one scores ~1.0 here
  * while its symmetric Jaccard is only |A|/|B| (arbitrarily small), so
  * this is the verification kernel for subsumption dedup
  * ([[graft.dedup.Dedup.overlapPairs]]) — the pair class the
  * Jaccard-tuned LSH banding deliberately does not target. Same
  * linear-merge, fence-free construction as [[JaccardHashSets]].
  * Empty-side pairs score 0.0 (nothing to contain). */
case class OverlapHashSets(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "overlap_hash_sets"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    OverlapHashSets.evalArrays(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.OverlapHashSets.evalArrays($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OverlapHashSets =
    copy(left = newLeft, right = newRight)
}

object OverlapHashSets {

  /** Static kernel shared by interpreted eval and generated code.
    * Inputs must be sorted distinct (as [[ShingleHashSet]] emits). */
  def evalArrays(sa: ArrayData, sb: ArrayData): Double = {
    val na = sa.numElements(); val nb = sb.numElements()
    if (na == 0 || nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val a = sa.getLong(i); val b = sb.getLong(j)
      if (a == b) { inter += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    inter.toDouble / math.min(na, nb).toDouble
  }

  def overlap(a: Column, b: Column): Column =
    GraftSqlBridge.column(OverlapHashSets(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("overlap_hash_sets"),
      new ExpressionInfo(classOf[OverlapHashSets].getName, "overlap_hash_sets"),
      (exprs: Seq[Expression]) => OverlapHashSets(exprs(0), exprs(1)))
}
