package graft

import org.apache.spark.sql.functions._

import graft.analytics.Battery

/** Physical-plan regression checks — the properties that matter at
  * 100 TB: filter pushdown into the parquet scan, column pruning,
  * broadcast joins for dims, partial (map-side) aggregation, and
  * whole-stage codegen coverage. These lock in the plan shape, not
  * just the results. */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push into the parquet scan; projection prunes columns") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"no pushed filter:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning missing:\n$p")
  }

  test("q02 star join broadcasts the small dims") {
    val p = plan(Battery.q02.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q01 aggregation is partial (map-side combine) + codegen") {
    val df = Battery.q01.run(spark, dir)
    df.collect() // finalize the adaptive plan so codegen stages appear
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    // "*(n) " operator prefixes mark whole-stage-codegen stages
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), s"no codegen:\n$p")
  }

  test("q03 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(Battery.q03.run(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
  }

  test("q16 referential-integrity check uses a broadcast anti-join shape") {
    val p = plan(Battery.q16.run(spark, dir))
    assert(p.contains("LeftAnti"), s"no anti-join:\n$p")
  }

  test("q26 LSH candidate join is an equi-join, not a cross product") {
    val p = plan(Battery.q26.run(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH degenerated to cross product:\n$p")
  }

  test("q44 band join broadcasts the tiny tier table (nested-loop, no fact shuffle)") {
    val p = plan(Battery.q44.run(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), s"tier table not broadcast:\n$p")
  }

  test("q42 sessionization shares ONE user_id shuffle across both windows") {
    val p = plan(Battery.q42.run(spark, dir))
    // lag-window, running-sum window, and the groupBy all hash-partition
    // on user_id; a correct plan exchanges once (plus the final orderBy's
    // range partition)
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(p.contains("Window"), s"no window op:\n$p")
    assert(exchanges <= 1, s"extra user_id shuffles ($exchanges):\n$p")
  }

  test("q43 semi/anti joins plan as Semi/Anti, not inner+distinct") {
    val p = plan(Battery.q43.run(spark, dir))
    assert(p.contains("LeftSemi"), s"no semi join:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
  }

  test("q48 hash sampling pushes no UDF barrier — scan-level filter only") {
    val df = Battery.q48.run(spark, dir)
    val p = plan(df)
    assert(p.contains("Filter"), s"no filter:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("SQLUDF"), s"UDF in sampling path:\n$p")
  }

  test("q50 per-group top-k filters on row_number without extra shuffle after window") {
    val p = plan(Battery.q50.run(spark, dir))
    assert(p.contains("Window"), s"no window:\n$p")
    val exchanges = "hashpartitioning\\(p_brand".r.findAllIn(p).size
    assert(exchanges <= 1, s"extra p_brand shuffles:\n$p")
  }

  test("q65 decontamination broadcasts the eval gram set — corpus side joins shuffle-free") {
    val p = plan(Battery.q65.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$p")
    // the only exchanges should be the per-doc count agg + final sort —
    // no hash exchange of the exploded corpus-gram stream for the join
    assert(!p.contains("SortMergeJoin"), s"corpus grams shuffled for the join:\n$p")
  }

  test("q69 centroid deviations broadcast the |labels|x|dims| centroid table") {
    val p = plan(Battery.q69.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"centroid table not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k outliers:\n$p")
  }

  test("q73 unigram scoring broadcasts the Zipf-bounded vocab — token stream never shuffles for the join") {
    val p = plan(Battery.q73.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled for the vocab join:\n$p")
  }

  test("q75 span dedup: winner election is ONE chunk shuffle, no join back") {
    val p = plan(Battery.q75.run(spark, dir))
    assert(p.contains("Window"), s"no window op:\n$p")
    val chunkExchanges = "hashpartitioning\\(chunk".r.findAllIn(p).size
    assert(chunkExchanges <= 1, s"extra chunk shuffles ($chunkExchanges):\n$p")
    // the token array must be materialized once per row, not re-split
    // inside the chunk lambda (the O(tokens^2) trap)
    assert("split\\(".r.findAllIn(p).size <= 1, s"split re-evaluated per chunk:\n$p")
  }

  test("q76 merge pairs: pruned pair table joins against unigram counts without a cross product") {
    val p = plan(Battery.q76.run(spark, dir))
    assert(!p.contains("CartesianProduct"), s"pair/unigram join degenerated:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k pairs:\n$p")
  }

  test("q77 kmeans assignment broadcasts the k seeds — vector side scans shuffle-free") {
    val p = plan(Battery.q77.run(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), s"seed set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"vectors shuffled against the k seeds:\n$p")
  }

  test("q93 simhash64 banding: band equi-join over ONE reused exchange, no cross product") {
    val df = Battery.q93.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    // the 16-bit-band self-join must stay an equi-join on (band, bv)
    // over ONE shared exchange (both sides are the same banded frame)
    assert(p.contains("SortMergeJoin"), s"band self-join not sort-merge:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"simhash banding degenerated to a cross product:\n$p")
    assert(p.contains("ReusedExchange"), s"banded self-join sides computed twice:\n$p")
  }

  test("q97 ANN recall: query set broadcasts (corpus never shuffles for scoring), top-k is a bounded partial aggregate") {
    val df = Battery.q97.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    // brute/IVF scoring joins the (tiny) query set against the corpus
    // scan via broadcast — the corpus rows themselves never shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"scoring fell to a cross product:\n$p")
    // per-query top-k reduces through TopKBy partial/final pairs (exact
    // + probe + approx stages) — ≤ k·|queries| ids per exchange, the
    // n·|queries| scored rows never cross the wire
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 4,
      s"k-bounded TopKBy partial/final pairs missing:\n$p")
    assert(!p.contains("Window"), s"top-k fell back to the rank-all window form:\n$p")
  }

  test("q88 heavy hitters: bounded-summary aggregate is partial (per-mapper), recount joins broadcast") {
    val df = Battery.q88.run(spark, dir)
    df.collect()
    val p = plan(df)
    // the Misra-Gries aggregate must run as partial ObjectHashAggregate
    // (a bounded summary per mapper) before the single final merge
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, s"no partial sketch agg:\n$p")
    // candidates + total are broadcast to the recount — the token stream
    // shuffles only for the candidate-pruned exact count
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"candidates not broadcast:\n$p")
  }

  test("q82 tf-idf: tf and df aggregates are partial; no side assumed broadcastable") {
    val df = Battery.q82.run(spark, dir)
    df.collect()
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 4, s"missing partial aggs:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
  }

  // AdaptiveSparkPlan.toString prints final AND initial plans — counting
  // operator occurrences over the whole string double-counts, so these
  // shape checks cut at the initial-plan marker first
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val p = plan(df)
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("q90 incremental screen: bucket probe is an equi-join; ONE banding per side") {
    val df = Battery.q90.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"index probe degenerated to cross product:\n$p")
    // each side bands once: batch-side banding (1) + corpus index build (1);
    // a third Generate would mean the screen re-banded something
    assert("minhash_band_sigs".r.findAllIn(p).size <= 2,
      s"banding computed more than once per side:\n$p")
  }

  test("q91 column profile: ONE scan (Expand fan-out), partial aggregation") {
    val df = Battery.q91.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    // the one-pass claim: a single parquet scan feeds the Expand-planned
    // multi-countDistinct — per-column scans would show here as N scans
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"profile scans more than once:\n$p")
    assert(p.contains("Expand"), s"multi-countDistinct did not plan via Expand:\n$p")
    // min/max over strings plan as SortAggregate here; the partial_ markers
    // are what prove map-side combine regardless of aggregate flavor
    assert(p.contains("partial_count"), s"no partial agg:\n$p")
  }

  test("q87 PageRank loop body: cached edge partitioning reused — only rank rows shuffle") {
    import graft.operators.Centrality
    // shape-representative synthetic graph (the battery's LSH front end
    // is pinned elsewhere; here the LOOP body is what must not regress)
    val base = spark.range(2000).selectExpr("id % 97 AS src", "(id * 31 + 1) % 97 AS dst")
    val e = base.union(base.selectExpr("dst AS src", "src AS dst")).localCheckpoint(false)
    val (eDeg, nodes) = Centrality.loopInputs(e)
    // rank state is a checkpoint barrier in the real loop — partitioning
    // unknown, exactly the shape each iteration after the first sees
    val rank0 = nodes.select(col("v"), lit(1000000L).as("pr")).localCheckpoint(false)
    val it = Centrality.iterate(eDeg, nodes, rank0, lit(150000L))
    it.collect()
    val exec = it.queryExecution.executedPlan
    val p = finalPlan(it)
    assert(p.contains("InMemoryTableScan"), s"loop inputs not read from cache:\n$p")
    // ≤2 shuffles per iteration: the rank side of the contribution join
    // (if AQE doesn't broadcast it) + the dst-keyed contribution
    // aggregate. The edge list itself must NOT re-shuffle — before the
    // cached pre-distribution, this plan carried 4+ exchanges
    val shuffles = org.apache.spark.sql.GraftSqlBridge.countShuffleExchanges(exec)
    assert(shuffles <= 2, s"loop body re-shuffles loop-invariant inputs ($shuffles):\n$p")
  }

  test("q92 leakage split: component map broadcasts — the corpus side never shuffles") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "comp")
    val df = graft.text.Curation.leakageSafeSplits(docs, "doc_id", comp,
      Seq(("train", 80), ("val", 10), ("test", 10)))
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), s"component map not broadcast:\n$p")
    val shuffles = org.apache.spark.sql.GraftSqlBridge
      .countShuffleExchanges(df.queryExecution.executedPlan)
    assert(shuffles == 0, s"corpus side shuffled for the split ($shuffles):\n$p")
  }

  test("q94 semDedup pairwise stage: cid equi-join over ONE reused exchange, no cross product") {
    // the stage is pinned directly — the CC fixpoint consumes it behind
    // checkpoint barriers, so the end-to-end q94 plan cannot show it
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val members = emb.select(col("vec_id").as("id"),
      (col("vec_id") % 4).as("cid"), lit(0L).as("dist_num"),
      graft.similarity.Similarity.quantize(col("embedding")).as("qv"))
    val df = graft.similarity.Similarity.withinClusterPairs(members, 0.35)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("SortMergeJoin"), s"cluster self-join not sort-merge:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semDedup pairwise stage degenerated to a cross product:\n$p")
    assert(p.contains("ReusedExchange"), s"self-join sides computed twice:\n$p")
  }

  test("q95 chunking is fully narrow: generate + project, zero exchanges") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val df = graft.text.Curation.chunkWithStride("text", 40, 30)(docs)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("Generate"), s"chunk explode missing:\n$p")
    val shuffles = org.apache.spark.sql.GraftSqlBridge
      .countShuffleExchanges(df.queryExecution.executedPlan)
    assert(shuffles == 0, s"chunking should never shuffle ($shuffles):\n$p")
  }

  test("q96 per-source cap: k-bounded partial aggregate, corpus side joins without shuffling") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
    val df = graft.text.Curation.capPerGroup("source", "doc_id", 5)(docs)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val p = finalPlan(df)
    // two ObjectHashAggregates = partial (map-side, ≤k ids per group
    // per mapper) + final — the TopKBy summary, not a rank-all window
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      s"TopKBy partial/final aggregate pair missing:\n$p")
    assert(!p.contains("Window"), s"cap fell back to the window form:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"kept-id semi-join not broadcast:\n$p")
    // exactly ONE exchange: the k-bounded aggregate's — the corpus rows
    // themselves never cross the wire
    val shuffles = org.apache.spark.sql.GraftSqlBridge.countShuffleExchanges(exec)
    assert(shuffles == 1, s"expected only the bounded-aggregate exchange ($shuffles):\n$p")
  }

  test("q98 semantic screen: the bucketed index joins the probe without a corpus-side shuffle") {
    import graft.store.Store
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    graft.similarity.Similarity.writeSemanticIndex(
      corpus, "vec_id", "embedding", k = 4, iters = 1, table = "t_plan_sem_ix")
    // Broadcast OFF for this pin: at sf0.001 the cid-pruned corpus scan
    // is estimated under the broadcast threshold, so the planner
    // (correctly) broadcasts it and the screen plans with ZERO
    // exchanges — which would let a bucketing regression hide behind
    // small-test-data luck. The 100 TB shape is the one to pin: a
    // corpus side too big to broadcast must ride its buckets while
    // only the batch side exchanges.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        org.apache.spark.sql.GraftSqlBridge
          .countShuffleExchanges(df.queryExecution.executedPlan)
      }
      val viaBucketed = shuffles(graft.similarity.Similarity.semanticScreen(
        batch, "vec_id", "embedding", Store.table(spark, "t_plan_sem_ix"), 0.35))
      // identical rows, same plan shape, but NO bucket metadata: the
      // probe join must add a corpus-side exchange on top
      Store.overwrite(Store.table(spark, "t_plan_sem_ix"), "t_plan_sem_flat")
      val viaFlat = shuffles(graft.similarity.Similarity.semanticScreen(
        batch, "vec_id", "embedding", Store.table(spark, "t_plan_sem_flat"), 0.35))
      // the whole screen moves only the (small) batch side — ONE
      // exchange total; the flat twin shuffles the corpus side too.
      // (The r8-era flat=3 included the codebook re-derivation's cid
      // regroup; since the maintained-codebook rework the screen's
      // returned plan holds only the probe join.)
      assert(viaBucketed == 1 && viaFlat == 2,
        s"bucketed index must leave only the batch-side exchange " +
          s"(bucketed=$viaBucketed flat=$viaFlat)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      graft.similarity.Similarity.dropSemanticIndex(spark, "t_plan_sem_ix")
      Store.drop(spark, "t_plan_sem_flat")
    }
  }

  test("q98 semantic screen: cid pruning reaches the index scan as an In(cid, …) pushed filter") {
    import graft.store.Store
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // corpus spans many clusters; the probe batch is a handful of rows,
    // so its assigned-cid set is a strict subset — the screen must read
    // only those clusters' row groups, not the whole index
    graft.similarity.Similarity.writeSemanticIndex(
      emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
      k = 8, iters = 1, table = "t_plan_prune_ix")
    try {
      val screen = graft.similarity.Similarity.semanticScreen(
        emb.filter(col("vec_id") % 100 === 0).limit(3), "vec_id", "embedding",
        Store.table(spark, "t_plan_prune_ix"), 0.35)
      screen.collect()
      val p = screen.queryExecution.executedPlan.toString
      assert(p.contains("In(cid"),
        s"probe's cid pruning must land in the index scan's PushedFilters:\n$p")
    } finally graft.similarity.Similarity.dropSemanticIndex(spark, "t_plan_prune_ix")
  }

  test("CBO end-to-end: ANALYZE column stats flip a filtered-dim join to broadcast") {
    import graft.store.Store
    Store.ensureDatabase(spark, "graft_test")
    // dim: ~20k rows with an incompressible pad, so its FILE size sits
    // well above the broadcast threshold below; grp has 50 distinct
    // values, so the post-filter estimate with NDV stats is tiny
    Store.overwrite(spark.range(20000).selectExpr(
      "id AS k", "CAST(id % 50 AS INT) AS grp",
      "md5(CAST(id AS STRING)) AS pad"), "cbo_dim")
    Store.overwrite(spark.range(100000).selectExpr(
      "CAST(id % 20000 AS BIGINT) AS k", "id AS v"), "cbo_fact")
    def staticJoinPlan: String = {
      val j = Store.table(spark, "cbo_fact")
        .join(Store.table(spark, "cbo_dim").filter(col("grp") === 7), "k")
      // sparkPlan = the STATIC (pre-AQE) plan — this is where the CBO's
      // compile-time decision lives; AQE would later fix it from runtime
      // sizes, at the cost of a pointless shuffle of the fact side first
      j.queryExecution.sparkPlan.toString
    }
    val confs = Seq("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (128 * 1024).toString)
      // without stats-informed estimation: the filtered dim is costed at
      // ~file size (size-only estimation passes Filter through) -> SMJ
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(staticJoinPlan.contains("SortMergeJoin"),
        s"setup broken — dim should exceed the threshold without stats:\n$staticJoinPlan")
      // with CBO + ANALYZE stats: 20000/ndv(grp)=400 estimated rows
      // post-filter -> under the threshold -> static broadcast
      Store.analyze(spark, "cbo_dim", Seq("k", "grp"))
      Store.analyze(spark, "cbo_fact", Seq("k"))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val p = staticJoinPlan
      assert(p.contains("BroadcastHashJoin"),
        s"CBO stats did not inform the broadcast decision:\n$p")
    } finally {
      saved.foreach {
        case (c, Some(v)) => spark.conf.set(c, v)
        case (c, None) => spark.conf.unset(c)
      }
      Store.drop(spark, "cbo_dim"); Store.drop(spark, "cbo_fact")
    }
  }

  test("q101 image decode runs behind the CPU-stage rebalance valve") {
    // the documents scan at sf0.001 is one small file (one split), so
    // the valve must OPEN: ImageIO decode is real CPU work and a
    // split-starved scan would serialize it onto one core. semDedup's
    // checkpoint barrier hides the fragment end-to-end, so the pin
    // reads the split-out decode input directly (q101 consumes it).
    val p = Battery.q101MediaRebalanced(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("RoundRobinPartitioning"),
      s"decode input not rebalanced — ImageIO would run split-starved:\n$p")
  }

  test("Layout.cluster: ONE range exchange, sort survives the helper-column drop") {
    // The Z-order rewrite must cost exactly a global-sort rewrite: one
    // range shuffle on the curve value, an in-partition sort, and the
    // projection that drops __z must sit ABOVE the sort (a projection
    // below would re-plan the sort on nothing; an extra exchange above
    // would destroy the clustering it just built).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars")
    val df = graft.store.Layout.zOrder(
      docs, Seq("n_chars", "doc_id"), partitions = 4, bits = 4)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val p = finalPlan(df)
    val shuffles = org.apache.spark.sql.GraftSqlBridge.countShuffleExchanges(exec)
    assert(shuffles == 1, s"Z-order rewrite must shuffle exactly once ($shuffles):\n$p")
    assert(p.contains("rangepartitioning(__z"),
      s"the one exchange must be a RANGE partitioning on the curve value:\n$p")
    assert(p.contains("Sort"), s"in-partition sort missing:\n$p")
    assert(!df.columns.contains("__z"), "helper column must not reach the output schema")
  }

  test("q114 repeated spans: gram stats join is an equi-join; no cross product anywhere") {
    // The gram-occurrence stream joins its own count+keeper aggregate
    // on the md5 key — corpus-sized both sides, so the shape that
    // survives 100 TB is a plain shuffle equi-join (AQE may broadcast
    // at toy SF; what must NEVER appear is a nested-loop/cartesian
    // form, which would be all-pairs over the corpus).
    val df = Battery.q114.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"gram join degenerated to cross product:\n$p")
    // count+keeper aggregate is partial (map-side combine) before its
    // one shuffle on the hash key
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q112 residual IVFADC: probed-list pruning reaches the codes side as a broadcast join") {
    // The corpus-sized codes table must be FILTERED to probed lists by
    // a broadcast equi-join BEFORE any per-subspace explode/scoring —
    // a post-explode filter would scan m× the corpus, and a shuffle
    // join on the routing product would move the corpus for a
    // |queries|·nprobe-row table.
    val df = Battery.q112.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"probed-list prune is not a broadcast equi-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"unexpected cartesian in the scoring path:\n$p")
    // the ONLY nested-loop products are the two intended broadcast
    // routing/LUT builders (|lists|- and m·ksub-row sides × queries)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3,
      s"scoring path contains an unplanned nested-loop join:\n$p")
  }

  test("q119 OPH candidate join is an equi-join, not a cross product") {
    val p = plan(Battery.q119.run(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"OPH LSH degenerated to cross product:\n$p")
  }

  test("q118 bpe encode is fully narrow before the token aggregate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val df = graft.text.Curation.bpeEncode("text",
      Seq(("e", "r"), ("t", "h"), ("th", "e"), ("a", "n")))(docs)
    df.collect()
    val shuffles = org.apache.spark.sql.GraftSqlBridge
      .countShuffleExchanges(df.queryExecution.executedPlan)
    assert(shuffles == 0,
      s"encode should be one narrow kernel pass ($shuffles):\n${finalPlan(df)}")
  }

  test("q120 JL prefilter: queries broadcast, both top-k stages are bounded partial aggregates") {
    val df = Battery.q120.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    // the only nested-loop products are the two intended |queries|-row
    // broadcast fanouts (projected scoring + exact re-rank)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      s"scoring path contains an unplanned nested-loop join:\n$p")
    // two TopKBy stages, each planned as partial+final ObjectHashAggregate
    assert("ObjectHashAggregate".r.findAllIn(p).size == 4,
      s"k-bounded partial/final pairs missing:\n$p")
    assert(!p.contains("Window"), s"top-k fell back to a window rank:\n$p")
  }

  test("q124 LM training aggregates partially (map-side combine on the bigram key)") {
    val df = Battery.q124.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"training path contains a product join:\n$p")
  }

  test("q125 LM scoring: vocab-sized model tables broadcast; corpus never shuffles for the lookup") {
    val df = Battery.q125.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    // bigram + history lookups (×2: surprisal and the filter's
    // recomputation) must all be broadcast-hash, never sort-merge:
    // a sort-merge lookup would shuffle the 100 TB corpus against a
    // vocab-sized model table. (The doc_id recombination joins MAY
    // sort-merge — those are corpus ⋈ corpus and shuffle correctly.)
    assert(p.contains("BroadcastHashJoin"), s"model lookup not broadcast:\n$p")
    assert(!"SortMergeJoin \\[(prev|w)#".r.findFirstIn(p).isDefined,
      s"corpus shuffled for a model lookup:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q131 phrase search: positional equi-join chain, no cross product") {
    val df = Battery.q131.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"phrase join degenerated to a product:\n$p")
  }

  test("q132 tf-idf ranking: idf broadcast, cut is a bounded TakeOrdered") {
    val df = Battery.q132.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), s"idf join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell to a global sort:\n$p")
  }

  test("q134 triangles: orientation/wedge/close are all equi-joins, no product") {
    val df = Battery.q134.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle chain degenerated to a product:\n$p")
  }

  test("q154 approx triangles: sampled-edge plan has no product; sample filter sits BELOW the dedup") {
    // approxCountsRow's result frame is a driver-built row (the real
    // work runs in its internal actions), so the pin inspects the
    // sampled-edge building block it counts on
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("pa"), col("b.pk").as("pb"))
    val df = graft.operators.Triangles.sampledCanonicalEdges(pairs, "pa", "pb", 3, 7L)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"sampled triangle chain degenerated to a product:\n$p")
    // the md5 sample predicate must prune rows BEFORE the distinct's
    // HashAggregate/Exchange pair — that ordering is where the
    // dup-heavy-input speedup comes from. Plan text prints consumers
    // above producers, so everything printed after the LAST "pmod"
    // occurrence is beneath the sample filter; no HashAggregate may
    // appear there (an aggregate beneath the filter would mean the
    // dedup ran on unsampled rows).
    assert(p.contains("pmod"), s"sample filter missing from the plan:\n$p")
    val below = p.substring(p.lastIndexOf("pmod"))
    assert(!below.contains("HashAggregate"),
      s"an aggregate runs beneath the sample filter — the sample no longer " +
        s"prunes the dedup:\n$p")
  }

  test("q140 linkage: blocking join is an equi-join; scoring is join-free (literal weights)") {
    val df = Battery.q140.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to a product:\n$p")
    // exactly the ONE blocking join feeds scoring — the weights ride
    // as literals, so no second join may appear in the scored plan
    assert("Join".r.findAllIn(p).size <= 2, // blocking join (+ AQE echo)
      s"scoring path grew an unexpected join:\n$p")
  }

  test("q127 DSIR: B-row histograms broadcast, resample cut is a bounded TakeOrdered") {
    val df = Battery.q127.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), s"histogram join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell to a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q144 BM25: idf broadcast, cut is a bounded TakeOrdered, no product") {
    val df = Battery.q144.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), s"idf join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell to a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q147 SCD2 apply: key-partitioned window, no single-partition exchange, no product") {
    val df = Battery.q147.run(spark, dir)
    df.collect()
    val p = finalPlan(df)
    // the timeline window partitions by the key — an empty partitionBy
    // would collapse the whole dim to one task (the shape scd2 must
    // never have; the orderBy tail plans as range partitioning)
    assert(!p.contains("Exchange SinglePartition"), s"single-partition window:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("perplexityFilter reads the corpus exactly twice (score build + attach), never thrice") {
    // the round-12 single-scan contract: ONE (id, text)-pruned scan
    // builds the surprisal aggregate, ONE wide scan is the attach
    // side; the retired formulation added a third id-only scan
    import graft.text.LmQuality
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // train on an IN-MEMORY frame so the model tables' own lineage
    // contributes no parquet scans — the count isolates the filter
    val lm = LmQuality.trainBigramLm("doc_id", "text")(
      Seq((1L, "a b c a b")).toDF("doc_id", "text"))
    val p = plan(LmQuality.perplexityFilter("doc_id", "text", lm, 4400L)(docs))
    val scans = "documents\\.parquet".r.findAllIn(p).size
    assert(scans <= 2, s"corpus scanned $scans times:\n$p")
    assert(scans >= 1, s"plan shape changed — scan count unparseable:\n$p")
  }
}
