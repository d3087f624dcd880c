package graft

import org.apache.spark.sql.functions._

import graft.text.Search

/** Unit coverage of the inverted-index family (battery q130–q132
  * check the full pipelines against the DuckDB oracle). */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private def posts(rows: (Long, String)*) =
    Search.buildPostings("doc_id", "text")(rows.toDF("doc_id", "text"))

  test("buildPostings: 0-based positions, ''-free tokens") {
    val got = posts((1L, "  a  b a "), (2L, ""))
      .as[(String, Long, Int)].collect().toSet
    assert(got == Set(("a", 1L, 0), ("b", 1L, 1), ("a", 1L, 2)))
  }

  test("termStats: df counts documents, cf counts occurrences") {
    val got = Search.termStats(posts((1L, "a b a"), (2L, "a c")))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 3L), ("b", 1L, 1L), ("c", 1L, 1L)))
  }

  test("phraseSearch: overlapping matches, boundary positions, absent terms") {
    val p = posts((1L, "a a a b"), (2L, "b a a"), (3L, "x y"))
    // "a a" overlaps in doc 1 (0 and 1) and ends doc 2 (pos 1)
    assert(Search.phraseSearch(p, Seq("a", "a"))
      .as[(Long, Int)].collect().toSet == Set((1L, 0), (1L, 1), (2L, 1)))
    // phrase crossing the doc end never matches
    assert(Search.phraseSearch(p, Seq("a", "b", "x")).isEmpty)
    // absent first term -> empty, not error
    assert(Search.phraseSearch(p, Seq("zz", "a")).isEmpty)
    // single-term phrase = the posting list
    assert(Search.phraseSearch(p, Seq("b"))
      .as[(Long, Int)].collect().toSet == Set((1L, 3), (2L, 0)))
    intercept[IllegalArgumentException](Search.phraseSearch(p, Seq.empty))
  }

  test("rankByTfIdfBits: hand-computed bits; ubiquitous and absent terms carry nothing") {
    // 4 docs: rare/mid each in 2 docs (idf_bits = ⌊log2 4/2⌋ = 1),
    // "all" in all 4 (bits 0 — ranks nothing), "ghost" nowhere.
    // scores: d1 = tf(rare)1·1 + tf(mid)1·1 = 2; d2 = 2·1 + 1·1 = 3;
    // d3 = d4 = 0 ("all" only)
    val p = posts(
      (1L, "rare mid all"), (2L, "mid all rare rare"),
      (3L, "all"), (4L, "all all"))
    val got = Search.rankByTfIdfBits(p,
        Seq("rare", "mid", "all", "ghost"), nDocs = 4L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L), (1L, 2L), (3L, 0L), (4L, 0L)), s"got $got")
    // k cuts deterministically on (score desc, id asc)
    val cut = Search.rankByTfIdfBits(p, Seq("all"), nDocs = 4L, k = 2)
      .as[(Long, Long)].collect().toSeq
    assert(cut == Seq((1L, 0L), (2L, 0L)), s"cut $cut")
    intercept[IllegalArgumentException](
      Search.rankByTfIdfBits(p, Seq.empty, 4L, 1))
    intercept[IllegalArgumentException](
      Search.rankByTfIdfBits(p, Seq("a"), 0L, 1))
  }

  test("rankByBm25Bits: hand-computed saturation + length normalization") {
    // Same 4-doc corpus as the tf-idf test. T = 10, N = 4 ->
    // avgm = 2500 milli-tokens; lf(d) = 250 + 300·dl.
    // idf_bits: rare/mid df=2 -> fl2r(10,5)=1; all df=4 -> fl2r(10,9)=0.
    // sat = ⌊1e6·tf·2200 / (1e6·tf + 1200·lf)⌋:
    //  d1 (dl=3, lf=1150): rare tf1 -> 924, mid tf1 -> 924 => 1848
    //  d2 (dl=4, lf=1450): rare tf2 -> 1176, mid tf1 -> 802 => 1978
    //  d3/d4: only "all" (idf 0) => 0
    val p = posts(
      (1L, "rare mid all"), (2L, "mid all rare rare"),
      (3L, "all"), (4L, "all all"))
    val got = Search.rankByBm25Bits(p,
        Seq("rare", "mid", "all", "ghost"), nDocs = 4L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1978L), (1L, 1848L), (3L, 0L), (4L, 0L)), s"got $got")
    // b = 0: length normalization off -> lf = 1000 for every doc;
    // sat depends on tf only: tf1 -> 1000, tf2 -> 1375
    val flat = Search.rankByBm25Bits(p, Seq("rare"), nDocs = 4L, k = 10,
        k1Milli = 1200L, bMilli = 0L)
      .as[(Long, Long)].collect().toSeq
    assert(flat == Seq((2L, 1375L), (1L, 1000L)), s"flat $flat")
    // k1 = 0: saturation collapses to presence (sat = 1000 always)
    val bin = Search.rankByBm25Bits(p, Seq("rare"), nDocs = 4L, k = 10,
        k1Milli = 0L, bMilli = 750L)
      .as[(Long, Long)].collect().toSeq
    assert(bin == Seq((1L, 1000L), (2L, 1000L)), s"bin $bin")
    intercept[IllegalArgumentException](
      Search.rankByBm25Bits(p, Seq.empty, 4L, 1))
    intercept[IllegalArgumentException](
      Search.rankByBm25Bits(p, Seq("a"), 4L, 1, bMilli = 1001L))
  }

  test("stored postings index: admit is exactly-once per doc through replay; term filters push down") {
    import graft.store.Store
    val tbl = "t_search_postings"
    try {
      Search.writePostingsIndex(
        Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text"),
        "doc_id", "text", tbl, numBuckets = 4)
      // admit: one novel doc + one already-indexed doc in the same batch
      val appended = Search.admitPostingsBatch(
        Seq((2L, "b c d"), (3L, "c d e")).toDF("doc_id", "text"),
        "doc_id", "text", tbl)
      assert(appended.select("id").as[Long].collect().toSet == Set(3L))
      // replay of the same batch appends nothing
      val replay = Search.admitPostingsBatch(
        Seq((2L, "b c d"), (3L, "c d e")).toDF("doc_id", "text"),
        "doc_id", "text", tbl)
      assert(replay.isEmpty)
      assert(spark.table(tbl).count() == 9L) // 3 + 3 + 3 postings, no dupes
      // the stored index answers phrase search; term filter reaches the scan
      val q = Search.phraseSearchStored(spark, tbl, Seq("c", "d"))
      assert(q.as[(Long, Int)].collect().toSet == Set((2L, 1), (3L, 0)))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters") && p.contains("EqualTo(term,c)"),
        s"term filter not pushed to the postings scan:\n$p")
    } finally Store.drop(spark, tbl)
  }

  test("topNgram: most frequent wins, count ties break to the smaller gram") {
    val docs = Seq(
      (1L, "b c x a a y b c"), (2L, "a a z b c"), (3L, "a")) // "b c" x3, "a a" x2... recount
    // bigrams: doc1: "b c","c x","x a","a a","a y","y b","b c"; doc2:
    // "a a","a z","z b","b c"; doc3 too short. "b c" 3, "a a" 2.
    assert(Search.topNgram("doc_id", "text", 2)(docs.toDF("doc_id", "text"))
      == Seq("b", "c"))
    // force a tie: "p q" and "q p" both twice -> "p q" < "q p" wins
    val tie = Seq((1L, "p q p q p")).toDF("doc_id", "text")
    assert(Search.topNgram("doc_id", "text", 2)(tie) == Seq("p", "q"))
    intercept[IllegalArgumentException](
      Search.topNgram("doc_id", "text", 0)(tie))
  }
}
