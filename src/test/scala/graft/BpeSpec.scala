package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}

import graft.functions.BpeExpressions
import graft.text.Curation

/** BPE training/encoding semantics (battery q117/q118 check the full
  * corpus loop against the DuckDB oracle; this pins the kernel's
  * greedy-apply contract and the trainer's determinism on corpora
  * small enough to hand-compute). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def mergeCol(syms: Seq[String], l: String, r: String): Seq[String] = {
    val df = Seq(Tuple1(syms)).toDF("syms")
      .select(BpeExpressions.bpeMergeStep(col("syms"), l, r).as("m"))
    df.as[Seq[String]].head()
  }

  test("mergeStep: non-overlapping left-to-right greedy on identical-symbol runs") {
    assert(mergeCol(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(mergeCol(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergeCol(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("aa", "aa", "a"))
  }

  test("mergeStep: distinct pair merges every adjacent occurrence") {
    assert(mergeCol(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(mergeCol(Seq("a", "b", "a"), "a", "b") == Seq("ab", "a"))
    assert(mergeCol(Seq("x", "a", "b", "b"), "a", "b") == Seq("x", "ab", "b"))
    assert(mergeCol(Seq("a"), "a", "b") == Seq("a"))
    assert(mergeCol(Seq.empty[String], "a", "b") == Seq.empty)
  }

  test("mergeStep: merged symbols do not cascade within one pass") {
    // (a,b) over "a b b": position 0-1 merges to "ab"; the new "ab"
    // followed by "b" must NOT merge again in the same pass
    assert(mergeCol(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
  }

  test("encodeWord equals folding mergeStep over the merge list in rank order") {
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "e"), ("a", "n"))
    def foldRef(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString): Seq[String]) { case (syms, (l, r)) =>
        BpeExpressions.mergeStep(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            syms.map(s => UTF8String.fromString(s)).toArray[Any]),
          UTF8String.fromString(l), UTF8String.fromString(r))
          .toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
      }
    val wordGen = Gen.listOfN(40, Gen.oneOf("thermal", "anther", "banana",
      "therefore", "aaaa", "x", "theether", "ranter", "ththe", "eanan"))
    ScalaCheckSupport.checkPropSeeded(Prop.forAll(wordGen) { ws =>
      val got = ws.toDF("w")
        .select(BpeExpressions.bpeEncodeWord(col("w"), merges).as("t"))
        .as[Seq[String]].collect().toSeq
      got == ws.map(foldRef)
    }, minSuccessful = 10)
  }

  test("trainBpe learns the hand-computed merges, ties to the smaller pair") {
    // corpus: "ab" x3, "abab" x2 -> pair counts: (a,b) 3+2*2=7,
    // (b,a) 2. Round 1 merges (a,b). Round 2: sequences "ab" / "ab ab"
    // -> (ab,ab) count 2. Round 3 exhausts (no pairs left) -> stops.
    val docs = Seq("ab ab ab", "abab abab").toDF("text")
    val got = Curation.trainBpe("text", nMerges = 5)(docs)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 7L), (2, "ab", "ab", 2L)))
  }

  test("trainBpe tie-break: equal counts go to binary-smallest (left, right)") {
    // "xy" and "ab" each appear twice: counts (a,b)=2, (x,y)=2 -> (a,b)
    // wins round 1; round 2 then merges (x,y)
    val docs = Seq("xy ab", "ab xy").toDF("text")
    val got = Curation.trainBpe("text", nMerges = 2)(docs)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 2L), (2, "x", "y", 2L)))
  }

  test("trainBpeBatched: batch=1 IS trainBpe; conflicting pairs defer a round") {
    val docs = Seq("ab ab ab", "abab abab", "xy cd xy cd").toDF("text")
    val seqRef = Curation.trainBpe("text", nMerges = 4)(docs)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    val b1 = Curation.trainBpeBatched("text", nMerges = 4, batch = 1)(docs)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    assert(b1 == seqRef, s"batch=1 diverged: $b1 vs $seqRef")
    // top-2 pairs sharing a symbol must NOT merge in one round:
    // word "abc" x4 -> counts (a,b)=4, (b,c)=4. Round 1 of batch=2
    // accepts (a,b), rejects (b,c) (shares b); round 2 then sees
    // [ab, c] -> (ab,c)=4. Sequential BPE computes the same.
    val chain = Seq.fill(4)("abc").toDF("text")
    val batched = Curation.trainBpeBatched("text", nMerges = 2, batch = 2)(chain)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    assert(batched == Seq((1, "a", "b", 4L), (2, "ab", "c", 4L)), s"$batched")
    assert(batched == Curation.trainBpe("text", nMerges = 2)(chain)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq)
    // independent pairs DO merge in one round, in (count, pair) order
    val indep = Seq("ab ab cd").toDF("text")
    val both = Curation.trainBpeBatched("text", nMerges = 2, batch = 8)(indep)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect().toSeq
    assert(both == Seq((1, "a", "b", 2L), (2, "c", "d", 1L)), s"$both")
    // deterministic across runs
    assert(Curation.trainBpeBatched("text", nMerges = 4, batch = 3)(docs)
      .collect().toSeq == Curation.trainBpeBatched("text", nMerges = 4, batch = 3)(docs)
      .collect().toSeq)
    intercept[IllegalArgumentException](
      Curation.trainBpeBatched("text", 0)(docs))
    intercept[IllegalArgumentException](
      Curation.trainBpeBatched("text", 1, batch = 0)(docs))
  }

  test("trainBpeBatched completes the requested merge count when the vocab allows") {
    // 120 distinct 8-char words -> ~800 merges available; asking for
    // 200 with batch=16 must yield EXACTLY 200 (the BENCH_SCALE x117
    // 1k-merge claim rides this completion property), with dense
    // unique ranks in selection order
    val words = (0 until 120).map { i =>
      val sb = new StringBuilder
      var v = i * 2654435761L
      (0 until 8).foreach { _ => sb.append(('a' + (v % 17)).toChar); v /= 17 }
      sb.toString
    }
    val docs = Seq(words.mkString(" ")).toDF("text")
    val m = Curation.trainBpeBatched("text", nMerges = 200, batch = 16)(docs)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect()
    assert(m.length == 200, s"only ${m.length} merges learned")
    assert(m.map(_._1).toSeq == (1 to 200), "ranks not dense")
    assert(m.map(r => (r._2, r._3)).distinct.length == 200, "duplicate merge pair")
  }

  test("bpeEncode flattens per-word encodings in document order") {
    val docs = Seq((1L, "The theater aaaa")).toDF("doc_id", "text")
    val toks = docs.transform(Curation.bpeEncode("text",
        Seq(("t", "h"), ("th", "e"), ("a", "a"))))
      .select("bpe_tokens").as[Seq[String]].head()
    // "the" -> [the]; "theater" -> [the,a,t,e,r]; "aaaa" -> [aa,aa]
    assert(toks == Seq("the", "the", "a", "t", "e", "r", "aa", "aa"))
  }
}
