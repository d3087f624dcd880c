package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.hadoop.fs.{FileSystem, Path}

/** ATOMIC versioned-manifest table commits — the public Delta/Iceberg
  * idea (a table is a LOG of immutable snapshots, each a manifest
  * listing immutable data files; one atomic pointer move publishes a
  * snapshot), sized to this engine: no external format dependency,
  * plain parquet files + tiny JSON manifests.
  *
  * Why it exists: [[Store.overwrite]]/[[Store.compact]] rewrite files
  * under a live catalog name — a reader racing a compaction can see a
  * half-rewritten table, and the unpartitioned compact's rename-swap
  * has a window where the name is absent (Store.scala documents both
  * honestly). The standing admit loops' crash reasoning covers APPEND
  * ordering (hashed-first, idempotent replay) but not that reader
  * race. Here every mutation is published by ONE atomic filesystem
  * rename of a manifest file; readers resolve the newest manifest and
  * read exactly the files it lists — always a complete snapshot, never
  * a mix. Old snapshots stay readable until [[gc]].
  *
  * Layout under `root/`:
  *  - `data/b<uuid>/part-*.parquet` — immutable data files, written
  *    once by the batch that stages them, never modified.
  *  - `manifest/m%016d` — one JSON per version: the FULL relative file
  *    list of that snapshot plus a string-map of table metadata.
  *    Written to a `_tmp.<uuid>` sibling first, then RENAMED into
  *    place — rename is the commit point AND the race arbiter
  *    (HDFS-style rename fails if the destination exists, so two
  *    committers of version N cannot both win).
  *
  * Semantics:
  *  - [[append]] = previous manifest's files + the batch's new files —
  *    O(batch) data written per commit, never O(history).
  *  - [[overwrite]] = only the new files (atomic table replace).
  *  - [[compact]] = read current, coalesce to a file-size target,
  *    publish as an overwrite — zero reader disruption, unlike the
  *    catalog compact's name-absent window.
  *  - Optimistic concurrency: a committer that loses the rename race
  *    re-reads the NEW latest manifest and retries with the next
  *    version number (its staged data files are already in place; only
  *    the manifest retry loops). Lost-update-free appends, like the
  *    public Delta protocol's commit loop.
  *  - Crash windows: data staged but no manifest → invisible orphan
  *    (removed by [[gc]]); manifest tmp written but not renamed →
  *    invisible orphan. A crash can only ever leave the PREVIOUS
  *    snapshot current — there is no state in which a reader sees a
  *    partial table.
  *
  * Scale shape: a commit is one rename + one small JSON regardless of
  * table size; readers pay one directory listing of `manifest/` (the
  * newest name sorts last — version ids are zero-padded). At 100 TB
  * the manifest file list grows with file count, the motivation for
  * periodic [[compact]]; file-listing cost never touches data bytes.
  *
  * Local-FS caveat (documented, not hidden): `RawLocalFileSystem`
  * rename is not guaranteed atomic the way HDFS rename is; the
  * PROTOCOL is correct on any FS with atomic no-overwrite rename
  * (HDFS, most object-store committers' rename emulation layers).
  */
object Manifest {

  /** One snapshot: ordered relative file paths + table metadata +
    * optional per-file column statistics (file → column → (min, max),
    * the Delta-style data-skipping index; absent entries mean "no
    * stats — never prune this file"). */
  final case class Snapshot(version: Long, files: Seq[String],
      meta: Map[String, String],
      stats: Map[String, Map[String, (Any, Any)]] = Map.empty)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "manifest")
  private def dataDir(root: String) = new Path(root, "data")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"m$v%016d")

  // --- manifest JSON via json4s (ships with Spark):
  // {"files":[...], "meta":{k:v}, "stats":{file:{col:{"lo":x,"hi":y}}}}
  // Stat bounds keep their JSON type (number for numerics, string for
  // strings) so pruning compares in the value domain, never lexically
  // on rendered text.
  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private def statJson(v: Any): JValue = v match {
    case l: Long => JLong(l)
    case i: Int => JLong(i.toLong)
    case s: Short => JLong(s.toLong)
    case b: Byte => JLong(b.toLong)
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal => JDecimal(d)
    case s: String => JString(s)
    case other => JString(String.valueOf(other)) // dates/timestamps via canonical text
  }
  private def statValue(j: JValue): Option[Any] = j match {
    case JLong(l) => Some(l)
    case JInt(i) => Some(i.toLong)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d)
    case JString(s) => Some(s)
    case _ => None // JNull (all-null file) → no stats → never pruned
  }
  private def render(files: Seq[String], meta: Map[String, String],
      stats: Map[String, Map[String, (Any, Any)]]): String = {
    val base: List[(String, JValue)] = List(
      "files" -> JArray(files.map(JString(_)).toList),
      "meta" -> JObject(meta.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }))
    val withStats =
      if (stats.isEmpty) base
      else base :+ ("stats" -> (JObject(stats.toList.sortBy(_._1).map { case (f, cols) =>
        f -> (JObject(cols.toList.sortBy(_._1).map { case (c, (lo, hi)) =>
          c -> (JObject("lo" -> statJson(lo), "hi" -> statJson(hi)): JValue)
        }): JValue)
      }): JValue))
    JsonMethods.compact(JsonMethods.render(JObject(withStats)))
  }
  private def parse(txt: String): (Seq[String], Map[String, String],
      Map[String, Map[String, (Any, Any)]]) = {
    val j = JsonMethods.parse(txt)
    val files = (j \ "files") match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Seq.empty
    }
    val meta = (j \ "meta") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    val stats = (j \ "stats") match {
      case JObject(fs) => fs.flatMap { case (f, cols) =>
        cols match {
          case JObject(cs) =>
            val m = cs.flatMap { case (c, b) =>
              (statValue(b \ "lo"), statValue(b \ "hi")) match {
                case (Some(lo), Some(hi)) => Some(c -> (lo, hi))
                case _ => None
              }
            }.toMap
            if (m.nonEmpty) Some(f -> m) else None
          case _ => None
        }
      }.toMap
      case _ => Map.empty[String, Map[String, (Any, Any)]]
    }
    (files, meta, stats)
  }

  /** Newest committed snapshot, or None for an empty/absent root. */
  def current(spark: SparkSession, root: String): Option[Snapshot] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("m\\d{16}")).map(_.drop(1).toLong)
    if (versions.isEmpty) None else Some(snapshot(spark, root, versions.max))
  }

  /** A specific committed snapshot (time travel). */
  def snapshot(spark: SparkSession, root: String, version: Long): Snapshot = {
    val f = fs(spark, root)
    val p = manifestPath(root, version)
    require(f.exists(p), s"no committed version $version under $root")
    val in = f.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val (files, meta, stats) = parse(txt)
    Snapshot(version, files, meta, stats)
  }

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("m\\d{16}")).map(_.drop(1).toLong).sorted.toSeq
  }

  /** Read the current snapshot (empty-schema-safe: an absent root
    * throws — an empty TABLE is a committed manifest with no files,
    * which reads as an empty frame of the caller-known schema only if
    * at least one file exists; callers bootstrap with an init commit). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    readSnapshot(spark, root, snap)
  }

  /** Read a pinned snapshot — the isolation guarantee made usable: the
    * file list is fixed at resolve time, so later commits/compactions
    * never change (or break) this frame until [[gc]] passes retention. */
  def readSnapshot(spark: SparkSession, root: String, snap: Snapshot): DataFrame = {
    require(snap.files.nonEmpty,
      s"$root version ${snap.version} is an empty snapshot — nothing to read")
    spark.read.parquet(snap.files.map(rel => new Path(dataDir(root), rel).toString): _*)
  }

  /** Stage `df` as new immutable parquet files under data/; returns
    * their manifest-relative paths. */
  private def stage(df: DataFrame, root: String): Seq[String] = {
    val spark = df.sparkSession
    val batchDir = "b" + java.util.UUID.randomUUID().toString.replace("-", "")
    val target = new Path(dataDir(root), batchDir)
    df.write.mode("overwrite").parquet(target.toString)
    val f = fs(spark, root)
    f.listStatus(target).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .sorted.map(n => s"$batchDir/$n").toSeq
  }

  /** Publish `files` (+meta, +stats) as the next version on top of
    * `base`; optimistic retry on manifest-name collision. Inherited
    * files keep their stats; new files carry `newStats`. Returns the
    * version. */
  private def publish(spark: SparkSession, root: String,
      newFiles: Seq[String], meta: Map[String, String],
      baseFiles: Snapshot => Seq[String],
      newStats: Map[String, Map[String, (Any, Any)]] = Map.empty): Long = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    var attempt = 0
    while (attempt < 64) {
      val cur = current(spark, root)
      val v = cur.map(_.version + 1).getOrElse(0L)
      val inherited = cur.map(baseFiles).getOrElse(Seq.empty)
      val files = inherited ++ newFiles
      val inheritedStats = cur.map(s => s.stats.filter(kv => inherited.contains(kv._1)))
        .getOrElse(Map.empty)
      val tmp = new Path(manifestDir(root),
        s"_tmp.${java.util.UUID.randomUUID().toString.replace("-", "")}")
      val out = f.create(tmp, false)
      try out.write(render(files, meta, inheritedStats ++ newStats).getBytes("UTF-8"))
      finally out.close()
      // rename = the atomic commit point; a false return (or the
      // best-effort exists pre-check, for local FS whose POSIX rename
      // silently overwrites) means another committer won version v —
      // re-resolve and retry on top of THEIR snapshot (our staged data
      // files are already in place)
      if (!f.exists(manifestPath(root, v)) && f.rename(tmp, manifestPath(root, v))) return v
      f.delete(tmp, false)
      attempt += 1
    }
    throw new IllegalStateException(
      s"$root: lost the commit race 64 times — a livelocked writer storm")
  }

  /** Per-file min/max for `statsCols` over a just-staged batch dir —
    * the data-skipping index entries. ONE narrow pass over the staged
    * files (same cost class as the write itself; the parquet-footer
    * read would be cheaper still but needs format internals). A column
    * whose min or max is null in a file (all-null file) gets no entry
    * there — conservative "never prune". */
  private def fileStats(spark: SparkSession, root: String,
      staged: Seq[String], statsCols: Seq[String]): Map[String, Map[String, (Any, Any)]] = {
    if (statsCols.isEmpty || staged.isEmpty) return Map.empty
    import org.apache.spark.sql.functions.{input_file_name, max, min, substring_index}
    val byName = staged.map(rel => rel.substring(rel.indexOf('/') + 1) -> rel).toMap
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val paths = staged.map(rel => new Path(dataDir(root), rel).toString)
    spark.read.parquet(paths: _*)
      .groupBy(substring_index(input_file_name(), "/", -1).as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap { r =>
        byName.get(r.getString(0)).map { rel =>
          rel -> statsCols.flatMap { c =>
            val (lo, hi) = (r.getAs[Any](s"__lo_$c"), r.getAs[Any](s"__hi_$c"))
            if (lo == null || hi == null) None else Some(c -> (lo, hi))
          }.toMap
        }
      }
      .filter(_._2.nonEmpty).toMap
  }

  /** Atomic append: stage the batch's files, publish prev ∪ new.
    * `statsCols` adds per-file min/max of those columns to the
    * manifest — the data-skipping index [[readWhereBetween]] prunes
    * by (one extra narrow pass over the staged batch). */
  def append(df: DataFrame, root: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val staged = stage(df, root)
    publish(spark, root, staged, meta, _.files,
      fileStats(spark, root, staged, statsCols))
  }

  /** Atomic table replace: stage, publish ONLY the new files. */
  def overwrite(df: DataFrame, root: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val staged = stage(df, root)
    publish(spark, root, staged, meta, _ => Seq.empty,
      fileStats(spark, root, staged, statsCols))
  }

  /** Total order over stat bounds and predicate constants of the same
    * family: integral (Long/Int/...), fractional (Double/Float),
    * decimals, strings. Cross-family numeric compares go through
    * BigDecimal (a Long bound vs a Double probe must not fall back to
    * string order). */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Number, y: Number) =>
      new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString))
    case _ => throw new IllegalArgumentException(
      s"manifest stats: cannot order ${a.getClass.getName} against ${b.getClass.getName}")
  }

  /** DATA-SKIPPING read: rows of the current snapshot with
    * `lo <= colName <= hi`, scanning ONLY the files whose recorded
    * [min, max] intersects the range (files without stats for the
    * column are conservatively scanned). Semantics are EXACT
    * regardless of pruning — the range filter is applied to the rows
    * too, so a stats-free file contributes exactly its matching rows.
    * Returns the frame; [[prunedFileCount]] reports the skip rate for
    * measurement. */
  def readWhereBetween(spark: SparkSession, root: String,
      colName: String, lo: Any, hi: Any): DataFrame = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val keep = prunedFiles(snap, colName, lo, hi)
    val base =
      if (keep.isEmpty)
        // every file pruned: read one file for the SCHEMA, emit no rows
        // (fabricating a schema here would desync from the stored one)
        readSnapshot(spark, root, snap.copy(files = snap.files.take(1)))
          .filter(lit(false))
      else readSnapshot(spark, root, snap.copy(files = keep))
    base.filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  /** The file subset of `snap` whose recorded [min, max] for `colName`
    * intersects [lo, hi] (no stats → kept). */
  def prunedFiles(snap: Snapshot, colName: String, lo: Any, hi: Any): Seq[String] =
    snap.files.filter { f =>
      snap.stats.get(f).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => cmp(mx, lo) >= 0 && cmp(mn, hi) <= 0
        case None => true
      }
    }

  /** Reader-safe small-file compaction: read current, rewrite into
    * ~targetBytes files, publish as an overwrite carrying the same
    * metadata. Readers pinned to older snapshots keep their files
    * (until [[gc]]); new readers see the compacted snapshot. */
  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      rangeBy: Seq[String] = Nil): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val df = readSnapshot(spark, root, snap)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = ((bytes + targetBytes - 1) / targetBytes).max(1).min(1L << 20).toInt
    // `rangeBy` keeps the skip index SHARP through compaction: a hash
    // repartition scatters rows, so every compacted file's [min, max]
    // widens toward the global range and [[readWhereBetween]] stops
    // pruning; a range repartition on the skip column re-clusters it.
    // localCheckpoint either way: the staged write must not re-read
    // files a racing gc of a PREVIOUS compaction round might be
    // clearing.
    val repart =
      if (rangeBy.nonEmpty) df.repartitionByRange(target, rangeBy.map(col): _*)
      else df.repartition(target)
    val staged = repart.localCheckpoint()
    try {
      val stagedFiles = stage(staged, root)
      // the skip index survives compaction: recompute stats for every
      // column any pre-compaction file carried stats for
      val statCols = snap.stats.values.flatMap(_.keys).toSeq.distinct
      publish(spark, root, stagedFiles, snap.meta, _ => Seq.empty,
        fileStats(spark, root, stagedFiles, statCols))
    } finally { staged.unpersist(); () }
  }

  /** Garbage collection: drop all but the newest `keepVersions`
    * manifests, then delete every data file referenced by NO retained
    * manifest (this also sweeps crash orphans — staged-but-never-
    * committed batch dirs and unrenamed manifest tmps). Manifests are
    * deleted FIRST so a reader resolving after gc starts can never pin
    * a snapshot whose files are about to vanish; readers pinned BEFORE
    * gc to an expired snapshot are the documented retention trade
    * (the public formats' VACUUM caveat). Returns deleted data paths. */
  def gc(spark: SparkSession, root: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "gc must retain at least the current version")
    val f = fs(spark, root)
    val all = versions(spark, root)
    if (all.isEmpty) return Seq.empty
    val dropped = all.dropRight(keepVersions)
    dropped.foreach(v => f.delete(manifestPath(root, v), false))
    // unrenamed manifest tmps are crash debris by definition
    if (f.exists(manifestDir(root)))
      f.listStatus(manifestDir(root)).map(_.getPath)
        .filter(_.getName.startsWith("_tmp.")).foreach(f.delete(_, false))
    val retained = versions(spark, root)
      .flatMap(v => snapshot(spark, root, v).files).toSet
    val dd = dataDir(root)
    if (!f.exists(dd)) return Seq.empty
    val removed = scala.collection.mutable.ArrayBuffer[String]()
    f.listStatus(dd).filter(_.isDirectory).foreach { b =>
      val batch = b.getPath.getName
      f.listStatus(b.getPath).foreach { st =>
        val rel = s"$batch/${st.getPath.getName}"
        val isData = st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
        if (!isData || !retained.contains(rel)) {
          f.delete(st.getPath, false)
          if (isData) removed += rel
        }
      }
      if (f.listStatus(b.getPath).isEmpty) f.delete(b.getPath, false)
    }
    removed.toSeq
  }
}
