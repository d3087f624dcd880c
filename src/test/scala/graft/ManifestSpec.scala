package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.{Manifest, Store}

/** The atomic versioned-manifest store: snapshot isolation, crash
  * injection (data staged / manifest tmp written, commit rename never
  * happens → readers keep the old table, never a mix), time travel,
  * gc, reader-safe compaction — and the two standing-loop
  * compositions (split SCD2, corpus-index admit) inheriting it.
  */
class ManifestSpec extends SparkTestBase {
  import spark.implicits._

  private def newRoot(tag: String): String =
    Files.createTempDirectory(s"graft_manifest_$tag").toString + "/t"

  test("append/overwrite/read: versions are monotonic; append is prev ∪ new; overwrite replaces") {
    val root = newRoot("basic")
    val v0 = Manifest.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root)
    assert(v0 == 0L)
    assert(Manifest.read(spark, root).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    val v1 = Manifest.append(Seq((3L, "c")).toDF("k", "v"), root)
    assert(v1 == 1L)
    assert(Manifest.read(spark, root).count() == 3)
    val v2 = Manifest.overwrite(Seq((9L, "z")).toDF("k", "v"), root)
    assert(v2 == 2L)
    assert(Manifest.read(spark, root).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    // time travel: every old snapshot still reads exactly as committed
    assert(Manifest.readSnapshot(spark, root, Manifest.snapshot(spark, root, 0L))
      .count() == 2)
    assert(Manifest.readSnapshot(spark, root, Manifest.snapshot(spark, root, 1L))
      .count() == 3)
    assert(Manifest.versions(spark, root) == Seq(0L, 1L, 2L))
  }

  test("crash injection: staged data + unrenamed manifest tmp are invisible; commit publishes atomically") {
    val root = newRoot("crash")
    Manifest.append(Seq((1L, "a")).toDF("k", "v"), root)
    val before = Manifest.read(spark, root).as[(Long, String)].collect().toSet

    // simulate a writer killed between data write and pointer swap:
    // (a) a fully-staged batch dir under data/ with no manifest entry
    Seq((666L, "ghost")).toDF("k", "v")
      .write.parquet(s"$root/data/bdeadbeefcrash")
    // (b) a complete manifest tmp that never got renamed into place
    val tmpManifest = new java.io.File(s"$root/manifest/_tmp.crashed")
    Files.writeString(tmpManifest.toPath,
      """{"files":["bdeadbeefcrash/whatever.parquet"],"meta":{}}""")

    // a reader sees EXACTLY the old committed table — the orphans do
    // not exist as far as the protocol is concerned
    assert(Manifest.current(spark, root).map(_.version).contains(0L))
    assert(Manifest.read(spark, root).as[(Long, String)].collect().toSet == before)

    // a reader pinned BEFORE the next commit keeps its snapshot; a
    // reader resolving AFTER sees the new one — old or new, never a mix
    val pinned = Manifest.read(spark, root)
    Manifest.append(Seq((2L, "b")).toDF("k", "v"), root)
    assert(pinned.as[(Long, String)].collect().toSet == before)
    assert(Manifest.read(spark, root).count() == 2)

    // gc sweeps the crash orphans (and the expired snapshot's files)
    Manifest.gc(spark, root, keepVersions = 1)
    assert(!new java.io.File(s"$root/data/bdeadbeefcrash").exists())
    assert(!tmpManifest.exists())
    assert(Manifest.read(spark, root).count() == 2) // survivor intact
    assert(Manifest.versions(spark, root) == Seq(1L))
  }

  test("gc retains every file a kept manifest references; retention floor enforced") {
    val root = newRoot("gc")
    Manifest.append(Seq((1L, "a")).toDF("k", "v"), root)
    Manifest.append(Seq((2L, "b")).toDF("k", "v"), root)
    Manifest.append(Seq((3L, "c")).toDF("k", "v"), root)
    // keep 2: v2 (all three batches) and v1 (two batches) share files —
    // nothing v1/v2 reference may be deleted
    val removed = Manifest.gc(spark, root, keepVersions = 2)
    assert(removed.isEmpty, s"shared files must survive: $removed")
    assert(Manifest.versions(spark, root) == Seq(1L, 2L))
    assert(Manifest.read(spark, root).count() == 3)
    // an overwrite obsoletes all prior files; gc to 1 removes them
    Manifest.overwrite(Seq((9L, "z")).toDF("k", "v"), root)
    val removed2 = Manifest.gc(spark, root, keepVersions = 1)
    assert(removed2.nonEmpty)
    assert(Manifest.read(spark, root).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    intercept[IllegalArgumentException](Manifest.gc(spark, root, keepVersions = 0))
  }

  test("compact collapses file sprawl without disturbing a pinned reader") {
    val root = newRoot("compact")
    (1 to 8).foreach(i => Manifest.append(
      spark.range(i * 10L, i * 10L + 5).toDF("id"), root))
    val sprawled = Manifest.current(spark, root).get.files.size
    assert(sprawled >= 8)
    val want = Manifest.read(spark, root).as[Long].collect().sorted.toSeq
    val pinned = Manifest.read(spark, root)
    Manifest.compact(spark, root)
    assert(Manifest.current(spark, root).get.files.size < sprawled)
    assert(Manifest.read(spark, root).as[Long].collect().sorted.toSeq == want)
    // the pinned pre-compaction reader still reads its own snapshot
    assert(pinned.as[Long].collect().sorted.toSeq == want)
    // and only gc (past retention) invalidates it — documented trade
    Manifest.gc(spark, root, keepVersions = 1)
    assert(Manifest.read(spark, root).as[Long].collect().sorted.toSeq == want)
  }

  test("data skipping: per-file stats prune reads, semantics exact, index survives range compaction") {
    val root = newRoot("skip")
    // three appends with disjoint key ranges → files with tight ranges
    Manifest.append(spark.range(0, 100).toDF("id").coalesce(1), root, statsCols = Seq("id"))
    Manifest.append(spark.range(100, 200).toDF("id").coalesce(1), root, statsCols = Seq("id"))
    Manifest.append(spark.range(200, 300).toDF("id").coalesce(1), root, statsCols = Seq("id"))
    val snap = Manifest.current(spark, root).get
    assert(snap.stats.size == snap.files.size, s"stats missing: ${snap.stats.keys}")
    // [120, 150] intersects only the middle file's [100, 199]
    val kept = Manifest.prunedFiles(snap, "id", 120L, 150L)
    assert(kept.size < snap.files.size, s"nothing pruned: $kept of ${snap.files}")
    assert(Manifest.readWhereBetween(spark, root, "id", 120L, 150L)
      .as[Long].collect().sorted.toSeq == (120L to 150L))
    // fully-out-of-range probe: every file pruned, empty result, real schema
    val none = Manifest.readWhereBetween(spark, root, "id", 1000L, 2000L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id"))
    // a stats-free append is conservatively scanned (correct, unpruned)
    Manifest.append(spark.range(400, 410).toDF("id").coalesce(1), root)
    assert(Manifest.readWhereBetween(spark, root, "id", 400L, 405L)
      .as[Long].collect().sorted.toSeq == (400L to 405L))
    // range compaction keeps the skip index present AND sharp
    Manifest.compact(spark, root, targetBytes = 1024, rangeBy = Seq("id"))
    val snap2 = Manifest.current(spark, root).get
    assert(snap2.stats.nonEmpty, "skip index lost through compaction")
    assert(Manifest.readWhereBetween(spark, root, "id", 120L, 150L)
      .as[Long].collect().sorted.toSeq == (120L to 150L))
    if (snap2.files.size > 1) {
      val keptAfter = Manifest.prunedFiles(snap2, "id", 120L, 150L)
      assert(keptAfter.size < snap2.files.size,
        s"range compaction should keep pruning sharp: $keptAfter of ${snap2.files}")
    }
    // string-typed stats order in the value domain
    val sroot = newRoot("skipstr")
    Manifest.append(Seq("apple", "banana").toDF("w").coalesce(1), sroot, statsCols = Seq("w"))
    Manifest.append(Seq("melon", "peach").toDF("w").coalesce(1), sroot, statsCols = Seq("w"))
    val ssnap = Manifest.current(spark, sroot).get
    assert(Manifest.prunedFiles(ssnap, "w", "a", "c").size == 1)
    assert(Manifest.readWhereBetween(spark, sroot, "w", "a", "c")
      .as[String].collect().sorted.toSeq == Seq("apple", "banana"))
  }

  test("manifest metadata round-trips and survives compaction") {
    val root = newRoot("meta")
    Manifest.overwrite(Seq((1L, "a")).toDF("k", "v"), root,
      meta = Map("graft.sig.family" -> "perm", "note" -> "with \"quotes\" and \\slash"))
    val m0 = Manifest.current(spark, root).get.meta
    assert(m0("graft.sig.family") == "perm")
    assert(m0("note") == "with \"quotes\" and \\slash")
    Manifest.compact(spark, root)
    assert(Manifest.current(spark, root).get.meta == m0)
  }

  test("scd2ApplySplitAtomic: ≡ monolithic history; replay-safe; retro reject; reader never sees a mix") {
    val openRoot = newRoot("scd2o")
    val closedRoot = newRoot("scd2c")
    val init = Store.scd2Init(
      Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("k", "v", "eff"), Seq("k"), "eff")
    Manifest.overwrite(init, openRoot)
    val b0 = Seq((1L, "a2", 200L), (2L, "b", 200L), (3L, "c", 200L)).toDF("k", "v", "eff")
    val b1 = Seq((1L, "a3", 300L), (1L, "a4", 350L)).toDF("k", "v", "eff")
    Store.scd2ApplySplitAtomic(spark, b0, openRoot, closedRoot, Seq("k"), "eff")
    // a reader pinned between the transactions keeps a complete table
    val pinnedOpen = Manifest.read(spark, openRoot)
    Store.scd2ApplySplitAtomic(spark, b1, openRoot, closedRoot, Seq("k"), "eff")
    assert(pinnedOpen.filter(!col("is_current")).count() == 0)

    val got = Store.scd2VersionsAtomic(spark, openRoot, closedRoot)
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    val mono = Store.scd2Apply(Store.scd2Apply(init, b0, Seq("k"), "eff"),
        b1, Seq("k"), "eff")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == mono, s"atomic=$got mono=$mono")

    // replay of b1 changes nothing (idempotent transaction)
    Store.scd2ApplySplitAtomic(spark, b1, openRoot, closedRoot, Seq("k"), "eff")
    assert(Store.scd2VersionsAtomic(spark, openRoot, closedRoot)
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet == mono)

    // genuinely retroactive change rejects loudly, store untouched
    val ex = intercept[IllegalArgumentException](Store.scd2ApplySplitAtomic(spark,
      Seq((1L, "bad", 250L)).toDF("k", "v", "eff"), openRoot, closedRoot, Seq("k"), "eff"))
    assert(ex.getMessage.contains("retroactive"))
    assert(Store.scd2VersionsAtomic(spark, openRoot, closedRoot)
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet == mono)
  }

  test("scd2SinkSplitAtomic: streamed batches maintain the atomic split store ≡ monolithic history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val openRoot = newRoot("sinko")
    val closedRoot = newRoot("sinkc")
    val ckpt = Files.createTempDirectory("scd2a_ckpt").toString
    val init = Store.scd2Init(
      Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("k", "v", "eff"), Seq("k"), "eff")
    Manifest.overwrite(init, openRoot)
    val input = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamOps.scd2SinkSplitAtomic(
      input.toDF().toDF("k", "v", "eff"), openRoot, closedRoot, Seq("k"), "eff", ckpt)
    input.addData((1L, "a2", 200L), (3L, "c", 200L))
    q.processAllAvailable()
    input.addData((1L, "a3", 300L))
    q.processAllAvailable()
    q.stop()
    val got = Store.scd2VersionsAtomic(spark, openRoot, closedRoot)
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    val mono = Store.scd2Apply(Store.scd2Apply(init,
        Seq((1L, "a2", 200L), (3L, "c", 200L)).toDF("k", "v", "eff"), Seq("k"), "eff"),
        Seq((1L, "a3", 300L)).toDF("k", "v", "eff"), Seq("k"), "eff")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == mono, s"atomic stream=$got mono=$mono")
    // the open root holds exactly one open row per key, all committed
    assert(Manifest.read(spark, openRoot).count() == 3L)
  }

  test("admitBatchManifest: screen/admit ≡ the catalog form; replay admits nothing twice; maintenance compacts") {
    import graft.dedup.Dedup
    val hashedRoot = newRoot("admith")
    val bandedRoot = newRoot("admitb")
    def doc(id: Long, text: String) = (id, text)
    val corpus = Seq(
      doc(1L, "the quick brown fox jumps over the lazy dog again and again"),
      doc(2L, "completely different content about spark manifests and atomic commits")
    ).toDF("doc_id", "text")
    Dedup.writeCorpusIndexManifest(corpus, "doc_id", "text",
      Dedup.CharShingles(5), 8, 4, hashedRoot, bandedRoot)

    // batch: one near-dup of doc 1, one fresh doc
    val batch = Seq(
      doc(10L, "the quick brown fox jumps over the lazy dog again and again!"),
      doc(11L, "entirely novel text that matches nothing in the standing corpus")
    ).toDF("doc_id", "text")
    val admitted = Dedup.admitBatchManifest(batch, "doc_id", "text",
      Dedup.CharShingles(5), 8, 4, hashedRoot, bandedRoot, minJaccard = 0.5)
    assert(admitted.select("doc_id").as[Long].collect().toSet == Set(11L))
    // the index grew by exactly the admitted doc
    assert(Manifest.read(spark, hashedRoot).count() == 3)

    // REPLAY: the same batch screens against its own prior admission
    // (jaccard 1.0) — nothing admits, nothing re-appends
    val replay = Dedup.admitBatchManifest(batch, "doc_id", "text",
      Dedup.CharShingles(5), 8, 4, hashedRoot, bandedRoot, minJaccard = 0.5)
    assert(replay.count() == 0)
    assert(Manifest.read(spark, hashedRoot).count() == 3)

    // family mismatch still rejects loudly through the manifest meta
    val ex = intercept[IllegalArgumentException](
      Dedup.admitBatchManifest(batch, "doc_id", "text", Dedup.CharShingles(5), 8, 4,
        hashedRoot, bandedRoot, minJaccard = 0.5, family = Dedup.OphMinhash))
    assert(ex.getMessage.contains("family"))

    // maintenance: force sprawl past the compaction trigger and admit
    // once more — the roots compact and gc, results unchanged
    (20L to 40L).foreach { i =>
      // genuinely distinct content per doc — a shared template would be
      // (correctly) screened out as a near-dup of the previous filler
      val text = (0 until 12).map(j => s"w${(i * 131 + j * 17) * (i + j) % 9973}").mkString(" ")
      Dedup.admitBatchManifest(
        Seq(doc(i, text)).toDF("doc_id", "text"),
        "doc_id", "text", Dedup.CharShingles(5), 8, 4,
        hashedRoot, bandedRoot, minJaccard = 0.5, compactMinFiles = 8)
    }
    assert(Manifest.current(spark, hashedRoot).get.files.size <= 8 * 4,
      "maintenance should keep file sprawl bounded")
    val total = Manifest.read(spark, hashedRoot).count()
    assert(total == 3 + 21, s"expected all fillers admitted, got $total")
  }
}
