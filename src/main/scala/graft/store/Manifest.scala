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
  *  - [[appendOnce]] = exactly-once per (writerId, txnId) — the public
  *    `txn` action; the idempotent sink for streaming writers.
  *  - [[upsert]] / [[deleteWhereBetween]] = MERGE and DELETE whose
  *    cost follows the FILES TOUCHED (stats-pruned + semi-join touch
  *    discovery), committed atomically with a planned-parent guard
  *    against concurrent commits.
  *  - Table metadata MERGES across commits (properties), the schema
  *    fingerprint is recorded every commit and ENFORCED on appends,
  *    per-file row counts come free from parquet footers (so
  *    [[countRows]] is O(0) in data bytes), [[restore]] rolls the
  *    table back to any retained version, and [[changesSince]] is the
  *    append-only change feed (loud throw when a file-rewriting commit
  *    intervened).
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
/** A read-modify-write commit (upsert / delete / partial compact) found
  * a different current version than the snapshot it planned against —
  * committing anyway could resurrect rows a concurrent commit
  * re-materialized. Retryable by construction: re-plan against the new
  * snapshot ([[Manifest.upsert]] and friends do so automatically, a
  * bounded number of times). */
final class ConcurrentCommitException(msg: String)
  extends IllegalStateException(msg)

/** Cross-PROCESS commit arbitration — the public Delta LogStore idea,
  * pluggable per filesystem. The in-JVM per-root lock in [[Manifest]]
  * serializes same-driver writers; this trait closes the remaining
  * seam: two DRIVERS committing to one root. Implementations provide
  * mutual exclusion around the exists-check + rename pair (or prove
  * they don't need it — HDFS rename-if-absent is already atomic). */
trait CommitArbiter {
  /** Run `body` (the publish critical section) under whatever
    * cross-process exclusion this filesystem needs. */
  def withCommitLock[T](root: String)(body: => T): T
}

/** For filesystems whose no-overwrite rename IS the atomic arbiter
  * (HDFS contract): no extra locking — losing a rename race surfaces
  * as rename=false and the optimistic loop retries. */
object RenameArbiter extends CommitArbiter {
  def withCommitLock[T](root: String)(body: => T): T = body
}

/** For raw LOCAL filesystems, whose POSIX rename silently OVERWRITES:
  * a lock FILE under `manifest/` acquired with atomic O_EXCL create
  * (java.io.File.createNewFile — atomic on POSIX), released on exit.
  * A crashed holder's lock goes stale and is taken over past
  * `staleMs` — the guarded section is milliseconds (one manifest JSON
  * write + link), so a lock older than tens of seconds has no live
  * holder under loosely-synchronized clocks. Takeover is TOCTOU-free:
  * the stale lock is atomically RENAMED aside, so of N waiters that
  * observed staleness exactly one clears the way (a plain delete lets
  * waiter A's delete land AFTER waiter B already re-created the lock,
  * victimizing a live holder). Each holder writes an OWNER TOKEN into
  * its lock and release deletes only if the token still matches — a
  * holder stalled past `staleMs` whose lock was usurped must not
  * remove the usurper's live lock. Even under a double-hold (stalled
  * holder + usurper), committed manifests cannot be lost: the commit
  * point itself is an atomic no-overwrite hard link
  * ([[Manifest.commitRename]]) — the fencing check at rename time —
  * so the lock only arbitrates wasted work, never correctness. The
  * acquisition loop jitters and gives up loudly after
  * `acquireTimeoutMs` rather than deadlock.
  *
  * HEARTBEAT: while the guarded body runs, a daemon thread re-touches
  * the lock's mtime every `staleMs / 4`, so "stale" no longer means
  * "held longer than a wall-clock guess at the body's duration" — it
  * means the HOLDER PROCESS is gone or frozen (crash, kill -9, a GC
  * pause long enough to silence the heartbeat — exactly the states a
  * takeover should cover). A merely SLOW body (a big staged write, a
  * saturated disk) keeps its lock for as long as it is alive, closing
  * the §7.5 clock-assumption seam: takeover now requires heartbeat
  * silence, not loose clock agreement about a fixed budget. The
  * touch is the holder's own lock file only, and release still
  * token-checks, so a usurper after a real freeze is never
  * victimized by the woken holder. */
final class LockFileArbiter(staleMs: Long = 30000L,
    acquireTimeoutMs: Long = 60000L) extends CommitArbiter {
  def withCommitLock[T](root: String)(body: => T): T = {
    val dir = new java.io.File(
      new Path(root, "manifest").toUri.getPath)
    dir.mkdirs()
    val lock = new java.io.File(dir, "_commit.lock")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var held = false
    while (!held) {
      held = lock.createNewFile()
      if (held) {
        val w = new java.io.FileOutputStream(lock)
        try w.write(token.getBytes("UTF-8")) finally w.close()
      } else {
        val age = System.currentTimeMillis() - lock.lastModified()
        if (lock.lastModified() > 0L && age > staleMs) {
          val aside = new java.io.File(dir, "_commit.lock.stale." +
            java.util.UUID.randomUUID().toString.take(12))
          if (lock.renameTo(aside)) { aside.delete(); () }
        }
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"$root: could not acquire cross-process commit lock in " +
              s"${acquireTimeoutMs}ms — a stuck holder or a writer storm")
        Thread.sleep(5L + scala.util.Random.nextInt(20))
      }
    }
    // heartbeat: keep the lock visibly alive while the body runs. The
    // token re-check before each touch means a usurped lock (we froze
    // past staleMs anyway) is never re-animated out from under its
    // new holder.
    val beating = new java.util.concurrent.atomic.AtomicBoolean(true)
    val beat = new Thread(() => {
      val period = math.max(staleMs / 4, 1L)
      var run = true
      while (run && beating.get()) {
        try {
          // an unexpected throwable from the touch (SecurityException,
          // disk error) must NOT kill the heartbeat: a silent death
          // here makes a slow-but-alive holder look stale — the exact
          // usurpation state the heartbeat exists to prevent
          try {
            val still =
              try new String(java.nio.file.Files.readAllBytes(lock.toPath),
                "UTF-8") == token
              catch { case _: Exception => false }
            if (still) { lock.setLastModified(System.currentTimeMillis()); () }
          } catch {
            case _: InterruptedException => run = false
            case _: Throwable => ()
          }
          if (run) Thread.sleep(period)
        } catch { case _: InterruptedException => run = false }
      }
    }, s"graft-lock-heartbeat-${token.take(8)}")
    beat.setDaemon(true)
    beat.start()
    try body finally {
      beating.set(false)
      beat.interrupt()
      val mine =
        try new String(java.nio.file.Files.readAllBytes(lock.toPath),
          "UTF-8") == token
        catch { case _: Exception => false }
      if (mine) { lock.delete(); () }
    }
  }
}

object Manifest {

  /** One snapshot: ordered relative file paths + table metadata +
    * optional per-file column statistics (file → column → (min, max),
    * the Delta-style data-skipping index; absent entries mean "no
    * stats — never prune this file") + optional per-file row counts
    * (recorded by the same stats pass; [[rowCount]] answers count(*)
    * from metadata when every file carries one). `chainLen` is the
    * resolution bookkeeping of the incremental log (how many delta
    * manifests sit between this version and its nearest full
    * checkpoint) — in-memory only, never serialized. */
  final case class Snapshot(version: Long, files: Seq[String],
      meta: Map[String, String],
      stats: Map[String, Map[String, (Any, Any)]] = Map.empty,
      rows: Map[String, Long] = Map.empty,
      bytes: Map[String, Long] = Map.empty,
      chainLen: Int = 0)

  /** Reserved metadata key: the last committed transaction id per
    * writer, `graft.txn.<writerId> -> txnId` ([[appendOnce]]). */
  private def txnKey(writerId: String) = s"graft.txn.$writerId"
  /** Reserved metadata key: the table's schema fingerprint, recorded at
    * every commit and ENFORCED on append (loud throw on drift). */
  val SchemaKey = "graft.schema"

  /** Reserved metadata key: the table's full StructType as JSON — set
    * by [[overwrite]] and [[appendMerge]] (schema-recording commits)
    * and carried forward by metadata merge. When present, every read
    * passes it to the parquet reader explicitly, so files that predate
    * a column addition read that column as NULL (by-name resolution) —
    * the mergeSchema half of the public formats' schema evolution. */
  val SchemaJsonKey = "graft.schemaJson"

  /** Reserved metadata key: the current DELETION VECTOR's root-relative
    * parquet path (columns `f` = manifest-relative data file, `ri` =
    * row index within it). Absent = no outstanding deletions. Every
    * reader goes through [[readSnapshot]] (or [[table]]'s wrap), which
    * anti-joins the vector out; compaction APPLIES it (reads through
    * the vector, publishes clean files, clears the pointer). */
  val DvKey = "graft.dv"

  /** Reserved metadata key: the number of live (file, row) entries in
    * the current deletion vector — recorded by [[deleteWhereBetweenDv]]
    * (the vector is deduplicated before the count, so it is EXACTLY
    * the number of deleted-but-unrewritten rows), consumed by
    * [[rowCount]] so count(*) stays a metadata answer while a vector
    * is outstanding. Dropped by any commit that rewrites files under
    * an outstanding vector (upsert / delete / compactSmall): entries
    * for rewritten files go stale and the count would overcount —
    * those states fall back to a scan until the next DV write or
    * full compaction re-establishes it. */
  val DvRowsKey = "graft.dv.rows"

  /** Reserved metadata key: the OPERATION that produced each version —
    * stamped fresh on every commit (it never merges forward), read
    * back by [[history]], the public DESCRIBE HISTORY idea. */
  val OpKey = "graft.op"
  /** Reserved metadata key: the commit's wall-clock time (epoch
    * millis), stamped by [[publish]] on every commit — the resolution
    * surface of timestamp time travel ([[tableAsOfTimestamp]]). Driver
    * clock; ordering across versions is by VERSION, the time is an
    * annotation (the public formats' own caveat). */
  val CommitTimeKey = "graft.commitTime"

  /** Reserved metadata key prefix: per-file BLOOM index sidecars,
    * `graft.bloom.<col> -> <root-relative parquet path>` — the public
    * Delta bloom-filter-index idea for POINT LOOKUPS on columns whose
    * per-file [min, max] can't prune (high-cardinality values in
    * random layout span every file's range). Built by
    * [[buildBloomIndex]], consumed by [[readWhereEquals]]; files
    * ABSENT from the sidecar (appended or rewritten after the build)
    * are conservative candidates, so a stale index degrades pruning,
    * never correctness. */
  val BloomKeyPrefix = "graft.bloom."

  /** Order-insensitive (sorted by field name): parquet reads resolve
    * columns BY NAME per file, so appends that reorder columns are
    * legitimate; renames and retypes are not. Nullability-insensitive
    * too (parquet round-trips relax it). */
  private def schemaFingerprint(df: DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.catalogString}")
      .sorted.mkString(",")

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(root: String) = new Path(root, "manifest")
  private def dataDir(root: String) = new Path(root, "data")
  private def manifestPath(root: String, v: Long) =
    new Path(manifestDir(root), f"m$v%016d")
  /** Checkpoint SIDECAR for a delta version: the fully-resolved
    * snapshot of `v`, written by [[gc]] before it drops the older
    * manifests the delta chains through. Readers try the sidecar first;
    * the original delta stays in place purely as the version listing
    * (the `m\d{16}` names drive [[versions]]/[[current]]). Immutable
    * content (the resolved snapshot), so writing it is idempotent and
    * a crash between sidecar write and manifest drops just re-runs. */
  private def checkpointPath(root: String, v: Long) =
    new Path(manifestDir(root), f"m$v%016d.cp")

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
    // dates/timestamps via the SAME canonical text [[cmp]] normalizes
    // probes to — java.time values (LocalDateTime from an NTZ column's
    // collect or footer lift) would otherwise serialize with a 'T'
    // separator that lexically disagrees with probe text
    case other => JString(String.valueOf(temporalText(other)))
  }
  private def statValue(j: JValue): Option[Any] = j match {
    case JLong(l) => Some(l)
    case JInt(i) => Some(i.toLong)
    case JDouble(d) => Some(d)
    case JDecimal(d) => Some(d)
    case JString(s) => Some(s)
    case _ => None // JNull (all-null file) → no stats → never pruned
  }
  private def perFileFields(stats: Map[String, Map[String, (Any, Any)]],
      rows: Map[String, Long], bytes: Map[String, Long]): List[(String, JValue)] = {
    val withStats =
      if (stats.isEmpty) Nil
      else List("stats" -> (JObject(stats.toList.sortBy(_._1).map { case (f, cols) =>
        f -> (JObject(cols.toList.sortBy(_._1).map { case (c, (lo, hi)) =>
          c -> (JObject("lo" -> statJson(lo), "hi" -> statJson(hi)): JValue)
        }): JValue)
      }): JValue))
    val withRows =
      if (rows.isEmpty) withStats
      else withStats :+ ("rows" -> (JObject(rows.toList.sortBy(_._1).map {
        case (f, n) => f -> (JLong(n): JValue)
      }): JValue))
    if (bytes.isEmpty) withRows
    else withRows :+ ("bytes" -> (JObject(bytes.toList.sortBy(_._1).map {
      case (f, n) => f -> (JLong(n): JValue)
    }): JValue))
  }
  private def render(files: Seq[String], meta: Map[String, String],
      stats: Map[String, Map[String, (Any, Any)]],
      rows: Map[String, Long], bytes: Map[String, Long]): String = {
    val base: List[(String, JValue)] = List(
      "files" -> JArray(files.map(JString(_)).toList),
      "meta" -> JObject(meta.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }))
    JsonMethods.compact(JsonMethods.render(JObject(
      base ++ perFileFields(stats, rows, bytes))))
  }
  /** A DELTA manifest: `base` (the parent version), files added and
    * removed relative to it, the FULL new metadata map (small), and
    * stats/rows/bytes for the ADDED files only — O(batch) JSON per
    * commit instead of O(table), the incremental-log half of the public
    * Delta log + checkpoint design. */
  private def renderDelta(base: Long, add: Seq[String], remove: Seq[String],
      meta: Map[String, String], stats: Map[String, Map[String, (Any, Any)]],
      rows: Map[String, Long], bytes: Map[String, Long]): String = {
    val head: List[(String, JValue)] = List(
      "base" -> JLong(base),
      "add" -> JArray(add.map(JString(_)).toList),
      "remove" -> JArray(remove.map(JString(_)).toList),
      "meta" -> JObject(meta.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }))
    JsonMethods.compact(JsonMethods.render(JObject(
      head ++ perFileFields(stats, rows, bytes))))
  }

  /** A parsed manifest document: full (checkpoint) or delta. */
  private sealed trait Doc
  private final case class FullDoc(files: Seq[String], meta: Map[String, String],
      stats: Map[String, Map[String, (Any, Any)]],
      rows: Map[String, Long], bytes: Map[String, Long]) extends Doc
  private final case class DeltaDoc(base: Long, add: Seq[String],
      remove: Seq[String], meta: Map[String, String],
      stats: Map[String, Map[String, (Any, Any)]],
      rows: Map[String, Long], bytes: Map[String, Long]) extends Doc

  private def parse(txt: String): Doc = {
    // useBigDecimalForDouble: stat bounds must round-trip LOSSLESSLY —
    // jackson's default double parse truncates DECIMAL(38,x) bounds to
    // ~16 significant digits, and a recorded max rounded BELOW the true
    // max would prune files anti-conservatively (wrong results, not
    // slow ones). Double/float stats still compare fine as BigDecimal
    // through [[cmp]]'s Number arm.
    val j = JsonMethods.parse(txt, useBigDecimalForDouble = true)
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
    def longMap(key: String): Map[String, Long] = (j \ key) match {
      case JObject(fs) => fs.collect {
        case (f, JLong(n)) => f -> n
        case (f, JInt(n)) => f -> n.toLong
      }.toMap
      case _ => Map.empty[String, Long]
    }
    def strList(key: String): Seq[String] = (j \ key) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Seq.empty
    }
    (j \ "base") match {
      case JLong(b) => DeltaDoc(b, strList("add"), strList("remove"),
        meta, stats, longMap("rows"), longMap("bytes"))
      case JInt(b) => DeltaDoc(b.toLong, strList("add"), strList("remove"),
        meta, stats, longMap("rows"), longMap("bytes"))
      case _ => FullDoc(files, meta, stats, longMap("rows"), longMap("bytes"))
    }
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

  /** How many consecutive delta manifests may chain before [[publish]]
    * forces a full checkpoint — bounds resolution depth (a cold
    * [[snapshot]] read walks at most this many documents) while keeping
    * 15 of every 16 commits O(batch) in JSON bytes. Bench-visible knob
    * ([[graft.bench]]): 1 = every manifest full, the pre-incremental
    * behavior, the A/B baseline. */
  @volatile private[graft] var checkpointEvery: Int = 16

  /** Resolved snapshots are immutable per (root, version) — a tiny
    * driver cache turns chain walks and the repeated `current()` reads
    * inside commit loops into map hits. Bounded crudely (clear at cap):
    * entries can carry 10⁵-file lists, so the cap stays small. */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Snapshot]()
  private[graft] def clearSnapshotCache(): Unit = snapCache.clear()

  /** A specific committed snapshot (time travel). Delta manifests
    * resolve against their base chain (depth ≤ [[checkpointEvery]]);
    * a [[gc]]-written checkpoint sidecar short-circuits the walk. */
  def snapshot(spark: SparkSession, root: String, version: Long): Snapshot = {
    val f = fs(spark, root)
    val cp = checkpointPath(root, version)
    val m = manifestPath(root, version)
    // existence is checked even on a cache hit — a gc'd-away version
    // must reject at resolve (one FS stat; the chain walk is what the
    // cache saves)
    val cpExists = f.exists(cp)
    require(cpExists || f.exists(m), s"no committed version $version under $root")
    val cached = snapCache.get((root, version))
    if (cached != null) return cached
    def readDoc(p: Path): Doc = {
      val in = f.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      parse(txt)
    }
    val doc: Doc = if (cpExists) readDoc(cp) else readDoc(m)
    val snap = doc match {
      case FullDoc(files, meta, stats, rows, bytes) =>
        Snapshot(version, files, meta, stats, rows, bytes, chainLen = 0)
      case DeltaDoc(base, add, remove, meta, stats, rows, bytes) =>
        val parent = snapshot(spark, root, base)
        val removed = remove.toSet
        Snapshot(version,
          parent.files.filterNot(removed) ++ add, meta,
          (parent.stats -- removed) ++ stats,
          (parent.rows -- removed) ++ rows,
          (parent.bytes -- removed) ++ bytes,
          chainLen = parent.chainLen + 1)
    }
    if (snapCache.size >= 32) snapCache.clear()
    snapCache.put((root, version), snap)
    snap
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
    * never change (or break) this frame until [[gc]] passes retention.
    * The ONE reader choke point: the snapshot's deletion vector (if
    * any) is anti-joined out here, so no path through the store can
    * resurrect deleted rows. */
  def readSnapshot(spark: SparkSession, root: String, snap: Snapshot): DataFrame =
    logicalize(readSnapshotRaw(spark, root, snap), snap)

  /** [[readSnapshot]] in PHYSICAL (file) column names — the form every
    * file-REWRITING maintenance op stages from, so data files keep
    * their physical names across compactions regardless of any column
    * mapping. Identical to [[readSnapshot]] on unmapped tables. */
  private def readSnapshotRaw(spark: SparkSession, root: String,
      snap: Snapshot): DataFrame = {
    require(snap.files.nonEmpty,
      s"$root version ${snap.version} is an empty snapshot — nothing to read")
    applyDv(spark, root, snap, readFiles(spark, root, snap, snap.files))
  }

  /** The snapshot's recorded StructType, when a schema-recording commit
    * has run ([[SchemaJsonKey]]) — absent on pre-evolution tables,
    * whose reads keep inferring schema from their (uniform) files. */
  private def recordedSchema(snap: Snapshot): Option[org.apache.spark.sql.types.StructType] =
    snap.meta.get(SchemaJsonKey).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Schema of a data file, read from its FOOTER on the driver — the
    * job-free twin of Spark's parquet schema inference, which schedules
    * a full Spark job (mergeSchemasInParallel) for EVERY fresh path
    * set even when one footer decides the answer. A pump cycle doing
    * ~30 manifest reads paid ~30 scheduling round-trips for schemas
    * the footers already carry. Spark-written files (every file the
    * store stages) hold the exact serialized StructType in the footer
    * key-value metadata — returning it verbatim (asNullable, as
    * inference does) is bit-identical to the inferred schema; foreign
    * files without the key fall back to one real single-file
    * inference. Cached per immutable file path (bounded). */
  private val fileSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]
  private val SparkSchemaMetaKey = "org.apache.spark.sql.parquet.row.metadata"
  /** Spark's inference nullable-izes the inferred schema (files can't
    * prove absence of nulls across future appends) — mirror it exactly,
    * recursing like StructType.asNullable (private[spark]). */
  private def deepNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = deepNullable(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(deepNullable(a.elementType), containsNull = true)
      case m: MapType => MapType(deepNullable(m.keyType),
        deepNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }
  private def deepNullable(st: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    deepNullable(st: org.apache.spark.sql.types.DataType)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  private def fileSchema(spark: SparkSession, root: String,
      rel: String): org.apache.spark.sql.types.StructType = {
    val p = new Path(dataDir(root), rel).toString
    var st = fileSchemaCache.get(p)
    if (st == null) {
      val conf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(p), conf)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val json = try Option(
        rd.getFooter.getFileMetaData.getKeyValueMetaData.get(SparkSchemaMetaKey))
      finally rd.close()
      st = json.map(j => deepNullable(
          org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[org.apache.spark.sql.types.StructType]))
        .getOrElse(spark.read.parquet(p).schema)
      if (fileSchemaCache.size >= 256) fileSchemaCache.clear()
      fileSchemaCache.put(p, st)
    }
    st
  }

  /** Raw parquet scan of a FILE SUBSET of `snap`, under the table's
    * recorded schema when one exists — the single place every
    * subset-read (upsert touch rewrite, delete rewrite, DV candidates,
    * partial compaction) goes through, so evolved tables (files with
    * heterogeneous column sets) read uniformly: absent columns resolve
    * to NULL by name. Does NOT apply the deletion vector — callers
    * that need live rows wrap with [[applyDv]]. Pre-evolution tables
    * (no recorded schema, uniform files) read under the first file's
    * footer schema — same answer Spark's inference job would return,
    * without the job. */
  private def readFiles(spark: SparkSession, root: String, snap: Snapshot,
      files: Seq[String]): DataFrame = {
    val st = recordedSchema(snap).getOrElse(
      fileSchema(spark, root, files.head))
    spark.read.schema(st)
      .parquet(files.map(rel => new Path(dataDir(root), rel).toString): _*)
  }

  /** A snapshot file entry as the deletion vector's key domain: the
    * data-dir-relative name `_metadata.file_path` extraction yields —
    * absolute entries (shallow clones) are cut at their LAST "/data/";
    * local-relative entries pass through. */
  private def dvName(entry: String): String = {
    val i = entry.lastIndexOf("/data/")
    if (i < 0) entry else entry.substring(i + 6)
  }

  /** The snapshot's deletion vector as a frame, when one is recorded. */
  private def dvFrame(spark: SparkSession, root: String, snap: Snapshot): Option[DataFrame] =
    snap.meta.get(DvKey).map(rel => spark.read.parquet(new Path(root, rel).toString))

  /** Anti-join a FILE-SOURCE frame over this snapshot's files against
    * its deletion vector (no-op without one). Requires `df` to still
    * expose `_metadata` (i.e. be the raw scan, before any join). */
  private def applyDv(spark: SparkSession, root: String, snap: Snapshot,
      df: DataFrame): DataFrame =
    dvFrame(spark, root, snap) match {
      case None => df
      case Some(dv) =>
        import org.apache.spark.sql.functions.{broadcast, expr}
        // the vector side must BROADCAST — a corpus-wide sort-merge
        // anti-join for a few hundred deleted rows would be the scale
        // bug; deletes large enough to overflow a broadcast belong to
        // the rewrite form (deleteWhereBetween) or a compaction
        df.withColumn("__graft_f",
            expr("substring_index(_metadata.file_path, '/data/', -1)"))
          .withColumn("__graft_ri", expr("_metadata.row_index"))
          .join(broadcast(
              dv.select(col("f").as("__graft_f"), col("ri").as("__graft_ri"))),
            Seq("__graft_f", "__graft_ri"), "left_anti")
          .drop("__graft_f", "__graft_ri")
    }

  /** Target bytes per staged file for REWRITE commits (upsert /
    * mergeInto / delete / replaceWhere rewrites and the matview fold
    * frames). Rewrites inherit the session's shuffle partitioning, so
    * a 15k-row view fold staged 32 near-empty files PER COMMIT — and
    * every later commit re-opened, re-stat'd, and re-rewrote all of
    * them (q194's by_cust view reached 97 files in 3 commits). Output
    * sizing derives from the PLAN'S BYTE ESTIMATE, never a constant
    * partition count, so it is scale-adaptive: a 10 GB rewrite keeps
    * ~160 parallel writers at the default, a 100 KB fold lands as one
    * file. Env-overridable for cluster tuning (production: align with
    * the table's target file size, e.g. 128–512 MB / guide §6). */
  private[graft] val rewriteTargetBytes: Long =
    sys.env.get("GRAFT_REWRITE_TARGET_BYTES").map(_.toLong)
      .getOrElse(64L * 1024 * 1024)

  /** `df` coalesced to ~[[rewriteTargetBytes]]-sized output files from
    * the optimizer's size estimate — driver-side, no job. Estimates
    * for rewrite plans are grounded in real parquet scan bytes (the
    * touched files), so they are accurate where it matters; an
    * inflated estimate (joins without CBO multiply) just leaves the
    * partitioning alone, which is the pre-this-change behavior.
    * `coalesce` never increases partition count, so a target above
    * the current partitioning is a no-op by construction. */
  private[graft] def rightSized(df: DataFrame): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = (est + rewriteTargetBytes - 1) / rewriteTargetBytes
    if (target.isValidInt) df.coalesce(target.toInt.max(1)) else df
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

  /** Same-JVM commit serialization, one lock per table root — the
    * public Delta LogStore idea for filesystems whose rename silently
    * OVERWRITES (POSIX/local): the exists-then-rename pair in
    * [[publish]] is check-then-act, so two threads in one driver could
    * both "win" the same version and the first manifest would be
    * silently replaced (a lost update). Writers in ONE JVM — the actual
    * deployment shape, one Spark driver per pipeline — serialize here;
    * CROSS-process atomicity is the filesystem's rename-if-absent
    * contract (atomic on HDFS, best-effort on raw local). */
  private val rootLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  /** Cross-process commit arbitration, selected by scheme: raw local
    * filesystems (overwriting POSIX rename) get the lock-file arbiter;
    * everything else relies on the filesystem's own atomic
    * no-overwrite rename ([[RenameArbiter]] — the HDFS contract).
    * Swappable for a custom [[CommitArbiter]] (an object-store
    * conditional-put arbiter, say) before any commits run. */
  @volatile var arbiterFor: String => CommitArbiter = { root =>
    val scheme = Option(new Path(root).toUri.getScheme).getOrElse("file")
    if (scheme == "file") defaultLocalArbiter else RenameArbiter
  }
  private val defaultLocalArbiter = new LockFileArbiter()

  /** Publish `files` (+meta, +stats, +rows) as the next version on top
    * of `base`; optimistic retry on manifest-name collision. Inherited
    * files keep their stats and row counts; new files carry `newStats`
    * / `newRows`. `metaFn` maps the PREVIOUS snapshot's metadata to the
    * new one — evaluated inside the retry loop, so merge semantics hold
    * against whatever snapshot actually wins as the parent. `skipIf`
    * (evaluated against the same resolved parent) abandons the commit
    * and returns the parent's version — the [[appendOnce]] idempotency
    * arbiter, raced correctly because the check re-runs on every retry,
    * under the same per-root lock as the commit itself.
    * Returns (version, committed). */
  private def publish(spark: SparkSession, root: String,
      newFiles: Seq[String], metaFn: Map[String, String] => Map[String, String],
      baseFiles: Snapshot => Seq[String],
      newStats: Map[String, Map[String, (Any, Any)]] = Map.empty,
      newRows: Map[String, Long] = Map.empty,
      skipIf: Snapshot => Boolean = _ => false,
      requireVersion: Option[Long] = None,
      newBytes: Map[String, Long] = Map.empty): (Long, Boolean) = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    var attempt = 0
    while (attempt < 64) {
      // in-JVM lock (same-driver writers) wrapping the cross-process
      // arbiter (other drivers); the critical section spans parent
      // resolution through the commit rename so a concurrent driver
      // cannot slip a version in between
      val outcome: Option[(Long, Boolean)] = lockFor(root).synchronized {
       arbiterFor(root).withCommitLock(root) {
        val cur = current(spark, root)
        // read-modify-write ops (upsert/delete) planned against a specific
        // parent; committing on top of anything else could resurrect rows
        // a concurrent compaction re-materialized — throw, caller retries
        requireVersion.foreach(rv =>
          if (!cur.map(_.version).contains(rv))
            throw new ConcurrentCommitException(
              s"$root: concurrent commit (expected parent version $rv, " +
                s"found ${cur.map(_.version).getOrElse(-1L)}) — retry the operation"))
        cur.filter(skipIf) match {
          case Some(s) => Some((s.version, false))
          case None =>
            val v = cur.map(_.version + 1).getOrElse(0L)
            val inherited = cur.map(baseFiles).getOrElse(Seq.empty)
            // set-filter, never Seq.contains: that would be O(files^2)
            // string compares per commit attempt — the kind of driver
            // cost that curves at 100 TB file counts
            val inheritedSet = inherited.toSet
            val removeList = cur.map(_.files.filterNot(inheritedSet)).getOrElse(Seq.empty)
            val meta = metaFn(cur.map(_.meta).getOrElse(Map.empty)) +
              (CommitTimeKey -> System.currentTimeMillis().toString)
            // INCREMENTAL LOG: when the change is small relative to the
            // table and the parent's chain is shorter than
            // [[checkpointEvery]], write a DELTA manifest — O(batch)
            // JSON bytes per commit. Full checkpoints bound resolution
            // depth and absorb file-rewriting commits (overwrite /
            // compact / restore produce deltas as large as the full
            // list, so they fall through to full automatically).
            val nFiles = inherited.size + newFiles.size
            val useDelta = cur.exists(_.chainLen + 1 < checkpointEvery) &&
              (newFiles.size + removeList.size) * 2 < nFiles
            val json =
              if (useDelta)
                renderDelta(cur.get.version, newFiles, removeList, meta,
                  newStats, newRows, newBytes)
              else {
                val files = inherited ++ newFiles
                val inheritedStats = cur.map(s => s.stats.filter(kv => inheritedSet(kv._1)))
                  .getOrElse(Map.empty)
                val inheritedRows = cur.map(s => s.rows.filter(kv => inheritedSet(kv._1)))
                  .getOrElse(Map.empty)
                val inheritedBytes = cur.map(s => s.bytes.filter(kv => inheritedSet(kv._1)))
                  .getOrElse(Map.empty)
                render(files, meta, inheritedStats ++ newStats,
                  inheritedRows ++ newRows, inheritedBytes ++ newBytes)
              }
            val tmp = new Path(manifestDir(root),
              s"_tmp.${java.util.UUID.randomUUID().toString.replace("-", "")}")
            val out = f.create(tmp, false)
            try out.write(json.getBytes("UTF-8"))
            finally out.close()
            // atomic commit point; a false return means another
            // committer won version v — re-resolve and retry on top of
            // THEIR snapshot (our staged data files are already in place)
            if (commitRename(f, tmp, manifestPath(root, v)))
              Some((v, true))
            else { f.delete(tmp, false); None }
        }
       }
      }
      outcome.foreach(return _)
      attempt += 1
    }
    throw new IllegalStateException(
      s"$root: lost the commit race 64 times — a livelocked writer storm")
  }

  /** The atomic commit point: publish `tmp` as `dst` iff `dst` does
    * not yet exist. On LOCAL filesystems this is a HARD LINK — link(2)
    * fails EEXIST atomically — which is the fencing check at rename
    * time: POSIX rename overwrites silently and exists+rename is
    * check-then-act, so without this two processes that both believe
    * they hold the commit lock (a stalled holder past the stale window
    * plus its usurper) could silently REPLACE a committed manifest.
    * With it, the loser's publish fails cleanly and retries on top of
    * the winner's snapshot — no clock-synchronization assumption
    * anywhere in the lost-update argument. Non-local filesystems keep
    * the exists+rename pair under their arbiter's contract (HDFS
    * rename-if-absent is itself atomic). Returns whether `dst` was
    * published; `tmp` is consumed on success and left for the caller's
    * cleanup on failure. */
  private def commitRename(f: FileSystem, tmp: Path, dst: Path): Boolean = {
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      val tmpN = java.nio.file.Paths.get(tmp.toUri.getPath)
      val dstN = java.nio.file.Paths.get(dst.toUri.getPath)
      try {
        java.nio.file.Files.createLink(dstN, tmpN)
        java.nio.file.Files.deleteIfExists(tmpN)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          !f.exists(dst) && f.rename(tmp, dst)
      }
    } else !f.exists(dst) && f.rename(tmp, dst)
  }

  /** Per-file min/max for `statsCols` over a just-staged batch dir —
    * the data-skipping index entries. ONE narrow pass over the staged
    * files (same cost class as the write itself; the parquet-footer
    * read would be cheaper still but needs format internals). A column
    * whose min or max is null in a file (all-null file) gets no entry
    * there — conservative "never prune".
    *
    * The second return is the set of staged files the scan actually saw
    * rows in, when the pass ran (`None` when it didn't): Spark writes a
    * schema-only zero-row part file for an empty first task, and a
    * stat-less file is conservatively scanned by every
    * [[readWhereBetween]] forever — so callers drop zero-row files from
    * the published list instead (they contribute no rows to any read). */
  /** Per-file min/max/null-count stats lifted from the parquet
    * FOOTERS the commit just wrote — ZERO Spark jobs and, since r18,
    * zero extra footer reads (the blocks arrive from the single
    * [[footerMeta]] open; this function is pure metadata crunching.
    * The scan-based pass below re-read every staged file as a full
    * Spark job per commit; at 100 TB that is a second pass over every
    * written byte, and on commit-dense scenario lifecycles it was the
    * single largest fixed cost). The footer values are exactly what
    * the scan would compute: parquet-mr records exact min/max per row
    * group (strings in UTF-8 unsigned byte order — the SAME order
    * [[cmp]] prunes with), and exact null counts; [[boundStat]] caps
    * long strings identically on both paths. Conservative bail-out
    * (None → caller falls back to the scan) whenever any column's
    * footer can't serve the contract: missing/legacy statistics,
    * unsupported physical/logical type (INT96 timestamps, nested),
    * NaN float bounds (writer NaN handling differs), unset null
    * counts, or a value-less chunk that is not provably all-null. */
  private def footerStats(staged: Seq[String], statsCols: Seq[String],
      footers: Map[String, Seq[org.apache.parquet.hadoop.metadata.BlockMetaData]])
      : Option[Map[String, Map[String, (Any, Any)]]] = try {
    if (sys.env.contains("GRAFT_NO_FOOTER_STATS")) return None // A/B valve
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val baseCols = statsCols.map(c =>
      if (c.endsWith(NullsSuffix)) c.dropRight(NullsSuffix.length) else c)
      .distinct
    def convert(chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
        v: AnyRef): Option[Any] = {
      val pt = chunk.getPrimitiveType
      val ann = pt.getLogicalTypeAnnotation
      (pt.getPrimitiveTypeName, ann) match {
        case (INT64, null) => Some(v.asInstanceOf[java.lang.Long].longValue)
        case (INT64, a: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
            if a.isSigned => Some(v.asInstanceOf[java.lang.Long].longValue)
        case (INT64, a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
            if a.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS =>
          // read as Long under spark.sql.legacy.parquet.nanosAsLong —
          // the session contract this store runs with (TESTDATA events)
          Some(v.asInstanceOf[java.lang.Long].longValue)
        case (INT64, a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
            if a.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
              a.isAdjustedToUTC =>
          // same epoch-micros -> java.sql.Timestamp split Spark's
          // collect performs, so the canonical stat text agrees
          val us = v.asInstanceOf[java.lang.Long].longValue
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          Some(ts)
        case (INT64, a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
            if a.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
              !a.isAdjustedToUTC =>
          // NTZ: the micros are LOCAL datetime field values — the same
          // LocalDateTime Spark's collect surfaces for TimestampNTZType;
          // statJson/temporalText canonicalize both paths identically
          val us = v.asInstanceOf[java.lang.Long].longValue
          Some(java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC))
        case (INT64, a: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
            if a.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS &&
              a.isAdjustedToUTC =>
          Some(new java.sql.Timestamp(v.asInstanceOf[java.lang.Long].longValue))
        case (INT64, a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          Some(java.math.BigDecimal.valueOf(
            v.asInstanceOf[java.lang.Long].longValue, a.getScale))
        case (INT32, a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          Some(java.math.BigDecimal.valueOf(
            v.asInstanceOf[java.lang.Integer].longValue, a.getScale))
        case (INT32, null) => Some(v.asInstanceOf[java.lang.Integer].intValue)
        case (INT32, a: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
            if a.isSigned => Some(v.asInstanceOf[java.lang.Integer].intValue)
        case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
          Some(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[java.lang.Integer].longValue)))
        case (DOUBLE, _) =>
          val d = v.asInstanceOf[java.lang.Double].doubleValue
          if (d.isNaN) None else Some(d)
        case (FLOAT, _) =>
          val f = v.asInstanceOf[java.lang.Float].floatValue
          if (f.isNaN) None else Some(f)
        case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
          Some(v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
        case (FIXED_LEN_BYTE_ARRAY,
            a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          // DECIMAL(>18,x): big-endian two's-complement unscaled value —
          // the same java.math.BigDecimal Spark's collect surfaces
          Some(new java.math.BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes),
            a.getScale))
        case (BINARY, a: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          Some(new java.math.BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes),
            a.getScale))
        case _ => None
      }
    }
    // one entry per (file, col): None anywhere → bail to the scan pass
    def colEntries(blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
        c: String): Option[Seq[(String, (Any, Any))]] = {
      val chunks = blocks.flatMap(_.getColumns.asScala
        .filter(_.getPath.toDotString == c))
      if (chunks.size != blocks.size) return None // missing / nested
      val sts = chunks.map(_.getStatistics)
      if (sts.exists(s => s == null || s.getNumNulls < 0)) return None
      val nn = sts.map(_.getNumNulls).sum
      val (withVals, noVals) = chunks.zip(sts).partition(_._2.hasNonNullValue)
      // EVERY value-less chunk must be provably all-null (its null count
      // equals its value count) — a chunk holding non-null rows whose
      // writer suppressed min/max (INT96 timestamps, legacy-stat
      // binaries, sort-order-ignored reads) would otherwise be silently
      // excluded from the file bounds, and the under-covering min/max
      // would let fullyCovered() drop the file metadata-only on a range
      // delete (data loss) or wrongly prune reads. Bail to the scan.
      if (noVals.exists { case (ch, s) => s.getNumNulls != ch.getValueCount })
        return None
      val nullsEntry = s"$c$NullsSuffix" -> ((nn, nn): (Any, Any))
      if (withVals.isEmpty) {
        // no bounds exposed anywhere: all chunks proved all-null above,
        // so the column is all-null in this file — nulls-only entry
        if (nn == blocks.map(_.getRowCount).sum) Some(Seq(nullsEntry))
        else None
      }
      else {
        val los = withVals.map { case (ch, s) =>
          convert(ch, s.genericGetMin.asInstanceOf[AnyRef]) }
        val his = withVals.map { case (ch, s) =>
          convert(ch, s.genericGetMax.asInstanceOf[AnyRef]) }
        if (los.exists(_.isEmpty) || his.exists(_.isEmpty)) None
        else Some(Seq(
          c -> ((boundStat(los.flatten.reduce((a, b) =>
              if (cmp(a, b) <= 0) a else b), isMax = false),
            boundStat(his.flatten.reduce((a, b) =>
              if (cmp(a, b) >= 0) a else b), isMax = true)): (Any, Any)),
          nullsEntry))
      }
    }
    val perFile = staged.map { rel =>
      footers.get(rel) match {
        case None => None // no cached footer for this file → bail whole pass
        case Some(blocks) =>
          if (blocks.map(_.getRowCount).sum == 0L)
            Some(None) // empty file: carries no stats (matches the scan pass)
          else {
            val cols = baseCols.map(colEntries(blocks, _))
            if (cols.exists(_.isEmpty)) None // unsupported → bail whole pass
            else Some(Some(rel -> cols.flatten.flatten.toMap))
          }
      }
    }
    if (perFile.exists(_.isEmpty)) None
    else Some(perFile.flatten.flatten.filter(_._2.nonEmpty).toMap)
  } catch { case _: Throwable => None } // any surprise → the scan pass

  private def fileStats(spark: SparkSession, root: String,
      staged: Seq[String], statsCols: Seq[String],
      footers: Map[String, Seq[org.apache.parquet.hadoop.metadata.BlockMetaData]] = Map.empty)
      : Map[String, Map[String, (Any, Any)]] = {
    if (statsCols.isEmpty || staged.isEmpty) return Map.empty
    footerStats(staged, statsCols, footers) match {
      case Some(m) => return m
      case None => () // fall through to the scan-based pass
    }
    import org.apache.spark.sql.functions.{input_file_name, max, min, substring_index, sum, when}
    // recompute paths feed recorded keys back in — normalize the
    // null-count twins ("c#nulls") to their base columns; every stat'd
    // column gets BOTH entries (the twin is what lets a delete prove a
    // stats-covered file holds no null-keyed rows — min/max ignore nulls)
    val baseCols = statsCols.map(c =>
      if (c.endsWith(NullsSuffix)) c.dropRight(NullsSuffix.length) else c)
      .distinct
    val byName = staged.map(rel => rel.substring(rel.indexOf('/') + 1) -> rel).toMap
    val aggs = baseCols.flatMap(c =>
      Seq(min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")))
    val paths = staged.map(rel => new Path(dataDir(root), rel).toString)
    spark.read.parquet(paths: _*)
      .groupBy(substring_index(input_file_name(), "/", -1).as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap { r =>
        byName.get(r.getString(0)).map { rel =>
          rel -> baseCols.flatMap { c =>
            val (lo, hi) = (r.getAs[Any](s"__lo_$c"), r.getAs[Any](s"__hi_$c"))
            val nn = r.getAs[Long](s"__nn_$c")
            val minMax =
              if (lo == null || hi == null) None
              else Some(c -> ((boundStat(lo, isMax = false),
                boundStat(hi, isMax = true)): (Any, Any)))
            minMax.toSeq :+ (s"$c$NullsSuffix" -> ((nn, nn): (Any, Any)))
          }.toMap
        }
      }
      .filter(_._2.nonEmpty).toMap
  }

  /** Recorded-stat cap for long strings (the public Delta
    * 32-char-truncation idea, at 64): a TEXT column's min/max would
    * otherwise carry whole documents into EVERY manifest version —
    * at corpus scale the log would dwarf its own checkpoints. */
  val StatStringCap = 64

  /** Bound a recorded string stat while keeping pruning CORRECT:
    * min truncates to a prefix (any string starting with it compares
    * ≥ the prefix — a valid lower bound; a cut that would strand a
    * high surrogate backs off one char so the prefix stays valid
    * UTF-16), max truncates and INCREMENTS the last retained char
    * (strictly above every string sharing the prefix — a valid upper
    * bound); the increment backs off past chars whose successor would
    * be an UNPAIRED SURROGATE — the UTF-8 serialization of the
    * manifest would mangle one to '?', collapsing the recorded max
    * BELOW real values (anti-conservative, wrong pruning) — as well
    * as past already-maximal chars; a prefix with nothing
    * incrementable keeps the exact value. Both sides only WIDEN the
    * recorded range, so file pruning and fully-covered proofs stay
    * conservative, never wrong. */
  private def boundStat(v: Any, isMax: Boolean): Any = v match {
    case s: String if s.length > StatStringCap =>
      if (!isMax) {
        // don't split a surrogate pair at the cap
        val cut =
          if (Character.isHighSurrogate(s.charAt(StatStringCap - 1)))
            StatStringCap - 1
          else StatStringCap
        s.substring(0, cut)
      } else {
        // c is incrementable iff c+1 is a real, non-surrogate char
        def incrementable(c: Char): Boolean =
          c < 0xD7FF.toChar || (c >= 0xE000.toChar && c < 0xFFFF.toChar)
        var i = StatStringCap - 1
        while (i >= 0 && !incrementable(s.charAt(i))) i -= 1
        if (i < 0) s // cannot bound above this prefix: keep exact
        else s.substring(0, i) + (s.charAt(i) + 1).toChar
      }
    case other => other
  }

  /** Per-file stats key suffix: `<col>#nulls -> (n, n)` — the
    * column's null count in that file, recorded beside every min/max
    * entry. Never matches a probe column name, so every pruning path
    * ignores it; [[deleteWhereBetween]]/[[replaceWhereBetween]] read
    * it to DROP stats-proven fully-covered files without scanning them
    * (safe only when the file provably holds no null-keyed rows —
    * nulls survive a range delete). */
  val NullsSuffix = "#nulls"

  /** Per-file row counts, byte sizes AND row-group metadata from the
    * parquet FOOTERS — driver-side metadata reads (parquet-hadoop is
    * on Spark's classpath), no Spark job, so EVERY commit records
    * both: [[rowCount]] answers count(*) from the manifest alone, and
    * [[ManifestFileIndex]] plans scans with ZERO per-file status RPCs
    * (the public formats record sizes in the log for the same reason).
    * Each staged footer is opened exactly ONCE per commit — the block
    * metadata returned here also feeds [[footerStats]], which used to
    * re-open the same footers (two driver-side footer round trips per
    * file per commit; the latency that matters on object stores).
    * Opens run on a bounded thread pool: footer reads are tiny
    * independent IO waits, and a 1000-file commit must not pay 1000
    * SERIAL opens on the driver. Returns (rows, bytes, blocks). */
  private def footerMeta(spark: SparkSession, root: String,
      staged: Seq[String]): (Map[String, Long], Map[String, Long],
        Map[String, Seq[org.apache.parquet.hadoop.metadata.BlockMetaData]]) = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    def readOne(rel: String) = {
      val p = new Path(dataDir(root), rel)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val blocks = try rd.getFooter.getBlocks.asScala.toSeq finally rd.close()
      (rel, blocks.map(_.getRowCount).sum, in.getLength, blocks)
    }
    val t0 = System.nanoTime()
    val both: Seq[(String, Long, Long,
        Seq[org.apache.parquet.hadoop.metadata.BlockMetaData])] =
      // GRAFT_FOOTER_SERIAL: A/B valve — pool of 1 reproduces the old
      // serial open cost for measurement
      if (staged.size <= 1) staged.map(readOne)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          if (sys.env.contains("GRAFT_FOOTER_SERIAL")) 1
          else math.min(16, staged.size))
        try {
          val futs = staged.map(rel => pool.submit(
            new java.util.concurrent.Callable[(String, Long, Long,
                Seq[org.apache.parquet.hadoop.metadata.BlockMetaData])] {
              def call() = readOne(rel)
            }))
          futs.map(_.get())
        } finally { pool.shutdown(); () }
      }
    if (sys.env.contains("GRAFT_FOOTER_TIMING"))
      System.err.println(f"[manifest] footerMeta: ${staged.size} file(s) in " +
        f"${(System.nanoTime() - t0) / 1e6}%.1f ms")
    (both.map(t => (t._1, t._2)).toMap, both.map(t => (t._1, t._3)).toMap,
      both.map(t => (t._1, t._4)).toMap)
  }

  /** Drop the staged files the footers prove empty (Spark writes a
    * schema-only zero-row part file for an empty first task; left in
    * the list it would carry no skip stats and be conservatively
    * scanned by every probe forever). An all-empty batch keeps ONE
    * file so the snapshot still carries the schema. */
  private def withoutEmpty(staged: Seq[String], rows: Map[String, Long]): Seq[String] = {
    val kept = staged.filter(f => rows.getOrElse(f, 1L) > 0L)
    if (kept.nonEmpty) kept else staged.take(1)
  }

  /** Reserved metadata key prefix: CHECK constraints,
    * `graft.check.<name> -> <SQL predicate>` — the public formats'
    * table constraints. Enforced on every data-adding commit
    * ([[append]]/[[appendOnce]]/[[overwrite]]/[[upsert]]); a NULL
    * predicate result counts as a violation (the Delta rule). */
  val CheckKeyPrefix = "graft.check."

  /** Register a CHECK constraint. The EXISTING table must already
    * satisfy it (one validation scan; loud throw with the violation
    * count otherwise) — a constraint that is born violated would make
    * every future commit fail confusingly. */
  def addCheck(spark: SparkSession, root: String, name: String,
      predicateSql: String): Long = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"constraint name must be a simple token, got [$name]")
    current(spark, root).foreach { snap =>
      if (snap.files.nonEmpty) {
        val bad = violations(readSnapshot(spark, root, snap),
          Map(CheckKeyPrefix + name -> predicateSql)).head._2
        require(bad == 0L,
          s"$root: cannot add CHECK $name ($predicateSql) — " +
            s"$bad existing rows violate it")
      }
    }
    publish(spark, root, Seq.empty,
      old => old + (CheckKeyPrefix + name -> predicateSql) +
        (OpKey -> s"addCheck($name)"),
      _.files)._1
  }

  /** Metadata-only transaction watermark advance — the exactly-once
    * cursor commit for a consumer step whose window carried NO row
    * changes (e.g. a CDC mirror over a span of metadata-only source
    * commits): the (writerId → txnId) watermark moves without staging
    * a byte, through the same atomic commit path as every data commit.
    * Monotonic: a stale or replayed advance (txnId already covered)
    * SKIPS rather than regressing the cursor. */
  def recordTxn(spark: SparkSession, root: String, writerId: String,
      txnId: Long): Long =
    publish(spark, root, Seq.empty,
      old => old + (txnKey(writerId) -> txnId.toString) +
        (OpKey -> "recordTxn"),
      _.files,
      skipIf = s => s.meta.get(txnKey(writerId)).exists(_.toLong >= txnId))._1

  /** Reserved metadata key prefix: named, immutable version TAGS —
    * `graft.tag.<name> -> version` (the public Iceberg tag idea). A
    * tag pins a snapshot under a name a consumer can hold forever
    * ("dataset-v3" for a reproducible training run): [[tableAtTag]]
    * reads it, and [[gc]] PROTECTS the tagged snapshot — its manifest,
    * files, deletion vector, and bloom sidecars — regardless of the
    * retention depth, writing the tagged version a resolved checkpoint
    * sidecar first when history between it and the live tail is about
    * to drop. Tags are immutable ([[tagVersion]] rejects an existing
    * name — [[dropTag]] releases it); like the txn watermark, the tag
    * SET lives in table metadata, so [[restore]] restores the tag set
    * of the restored version (which is what a rollback means). */
  val TagKeyPrefix = "graft.tag."

  /** Pin `version` (default: the current one) under an immutable tag
    * name — one metadata commit. The version must be retained (its
    * snapshot must still resolve); the name must be a simple token and
    * must not already exist. */
  def tagVersion(spark: SparkSession, root: String, name: String,
      version: Option[Long] = None): Long = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"tag name must be a simple token, got [$name]")
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val v = version.getOrElse(cur.version)
    snapshot(spark, root, v) // loud throw if not retained
    require(!cur.meta.contains(TagKeyPrefix + name),
      s"$root: tag [$name] already exists (tags are immutable — dropTag first)")
    publish(spark, root, Seq.empty,
      old => {
        // re-checked against the WINNING parent inside the commit loop:
        // two racing tagVersion calls must not both land (the loser
        // would silently re-pin an "immutable" name)
        require(!old.contains(TagKeyPrefix + name),
          s"$root: tag [$name] already exists (tags are immutable — dropTag first)")
        old + (TagKeyPrefix + name -> v.toString) + (OpKey -> s"tag($name)")
      },
      _.files)._1
  }

  /** Release a tag (no-op commit if absent); the version becomes
    * sweepable by the next [[gc]] unless retention still covers it. */
  def dropTag(spark: SparkSession, root: String, name: String): Long =
    publish(spark, root, Seq.empty,
      old => old - (TagKeyPrefix + name) + (OpKey -> s"dropTag($name)"),
      _.files)._1

  /** Every live tag, name → pinned version. */
  def tags(spark: SparkSession, root: String): Map[String, Long] =
    current(spark, root).map(_.meta.collect {
      case (k, v) if k.startsWith(TagKeyPrefix) =>
        k.stripPrefix(TagKeyPrefix) -> v.toLong
    }.toMap).getOrElse(Map.empty)

  /** The planner-integrated scan of a TAGGED snapshot — [[tableAsOf]]
    * resolved through the tag registry. */
  def tableAtTag(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = tags(spark, root).getOrElse(name,
      throw new IllegalArgumentException(s"$root: no tag [$name]"))
    tableAsOf(spark, root, v)
  }

  /** Drop a CHECK constraint (no-op commit if absent). */
  def dropCheck(spark: SparkSession, root: String, name: String): Long =
    publish(spark, root, Seq.empty,
      old => old - (CheckKeyPrefix + name) + (OpKey -> s"dropCheck($name)"),
      _.files)._1

  /** Append with QUARANTINE — the dead-letter shape a standing ingest
    * loop actually needs (plain [[append]] REFUSES the whole batch on
    * one violating row, which is correct for a transactional write and
    * wrong for a pipeline that must keep moving): rows passing every
    * registered CHECK land in the table; violating rows land in
    * `quarantineRoot` with a `__violated` column naming the FIRST
    * failed constraint (alphabetical), for triage and replay. Returns
    * (table version, good rows, quarantined rows).
    *
    * The two commits are NOT one atomic unit (they are different
    * tables): good rows land FIRST, so a crash between them loses only
    * quarantine visibility — re-running the batch re-quarantines; it
    * can never land bad rows in the table. With no checks registered
    * the whole batch is good and no quarantine commit happens. */
  def appendQuarantine(df: DataFrame, root: String, quarantineRoot: String,
      statsCols: Seq[String] = Nil): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, expr, when}
    val spark = df.sparkSession
    val checks = current(spark, root)
      .map(_.meta.filter(_._1.startsWith(CheckKeyPrefix))).getOrElse(Map.empty)
    if (checks.isEmpty) {
      val v = append(df, root, statsCols = statsCols)
      return (v, countRows(spark, root), 0L)
    }
    val ordered = checks.toSeq.sortBy(_._1)
    val violated = coalesce(ordered.map { case (k, pred) =>
      when(!expr(pred) || expr(pred).isNull,
        lit(k.stripPrefix(CheckKeyPrefix)))
    }: _*)
    val tagged = df.withColumn("__violated", violated).localCheckpoint()
    try {
      val good = tagged.filter(col("__violated").isNull).drop("__violated")
      val bad = tagged.filter(col("__violated").isNotNull)
      val nBad = bad.count()
      val nGood = tagged.count() - nBad
      val v =
        if (nGood > 0) append(good, root, statsCols = statsCols)
        else current(spark, root).map(_.version).getOrElse(
          throw new IllegalArgumentException(
            s"$root has no committed version and the whole batch quarantined"))
      if (nBad > 0) append(bad, quarantineRoot)
      (v, nGood, nBad)
    } finally { tagged.unpersist(); () }
  }

  // ------------------------------------------------------------------ //
  // COLUMN MAPPING — rename/drop as METADATA-ONLY commits (the public  //
  // Delta column-mapping idea): data files keep their original         //
  // PHYSICAL column names forever; the manifest carries a logical →    //
  // physical map ([[ColMapKey]]) plus the list of retired physical     //
  // names ([[DroppedKey]]). Every read path resolves through the map   //
  // (rename + drop-projection at the reader boundary — including the   //
  // planner scan, where filters push through the aliases into the      //
  // physical attributes, so the stats/bloom skip layers, which are     //
  // keyed physical, keep pruning); every write path maps the batch's   //
  // logical names back to physical before staging. A table with no     //
  // mapping takes the identity fast path everywhere.                   //
  // ------------------------------------------------------------------ //

  /** Reserved metadata key: JSON object {logicalName: physicalName}
    * for RENAMED columns (identity implied for everything else). */
  val ColMapKey = "graft.colmap"
  /** Reserved metadata key: JSON array of PHYSICAL names dropped from
    * the logical schema (their data stays in old files, projected away
    * on read; a rewrite naturally sheds them). */
  val DroppedKey = "graft.dropped"

  private def renderStringMap(m: Map[String, String]): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(JObject(
      m.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))
  }
  private def parseStringMap(s: String): Map[String, String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(s) match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
  }
  private def renderStringList(xs: Seq[String]): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(
      JArray(xs.map(x => JString(x): JValue).toList)))
  }
  private def parseStringList(s: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(s) match {
      case JArray(xs) => xs.collect { case JString(v) => v }
      case _ => Seq.empty
    }
  }

  private def colMapOf(snap: Snapshot): Map[String, String] =
    snap.meta.get(ColMapKey).map(parseStringMap).getOrElse(Map.empty)
  private def droppedOf(snap: Snapshot): Seq[String] =
    snap.meta.get(DroppedKey).map(parseStringList).getOrElse(Seq.empty)
  private def hasMapping(snap: Snapshot): Boolean =
    snap.meta.contains(ColMapKey) || snap.meta.contains(DroppedKey)

  /** The physical (file) column name behind a logical name — identity
    * when un-renamed. Skip-stat, bloom, and key probes translate
    * through this before touching the physical layers. */
  private[store] def toPhysical(snap: Snapshot, name: String): String =
    colMapOf(snap).getOrElse(name, name)

  /** Physical frame → the table's LOGICAL view: dropped physicals
    * projected away, renamed physicals aliased to their logical names.
    * Identity (no projection node at all) on unmapped tables. */
  private def logicalize(df: DataFrame, snap: Snapshot): DataFrame =
    if (!hasMapping(snap)) df
    else {
      val dropSet = droppedOf(snap).toSet
      val p2l = colMapOf(snap).map(_.swap)
      df.select(df.columns.filterNot(dropSet)
        .map(p => col(p).as(p2l.getOrElse(p, p))).toSeq: _*)
    }

  /** Logical batch → physical staging names (inverse of
    * [[logicalize]]); identity on unmapped or brand-new tables. */
  private def physicalize(df: DataFrame, snap: Option[Snapshot]): DataFrame =
    snap.filter(hasMapping) match {
      case None => df
      case Some(s) =>
        val m = colMapOf(s)
        df.select(df.columns.map(l => col(l).as(m.getOrElse(l, l))).toSeq: _*)
    }

  /** The table's logical column names (physical schema resolved
    * through the map) — validation surface for rename/drop. */
  private def logicalSchemaNames(spark: SparkSession, root: String,
      snap: Snapshot): Seq[String] = {
    val phys = recordedSchema(snap).getOrElse(
      readFiles(spark, root, snap, snap.files.take(1)).schema)
      .fields.map(_.name).toSeq
    val dropSet = droppedOf(snap).toSet
    val p2l = colMapOf(snap).map(_.swap)
    phys.filterNot(dropSet).map(p => p2l.getOrElse(p, p))
  }

  /** Reject mapping mutations on columns a CHECK constraint references
    * (a stored predicate keeps the AUTHORED name; silently breaking it
    * would turn every future commit into a confusing failure). */
  private def requireNoCheckOn(snap: Snapshot, root: String,
      name: String, what: String): Unit = {
    val word = ("(?<![A-Za-z0-9_`])" +
      java.util.regex.Pattern.quote(name) + "(?![A-Za-z0-9_`])").r
    snap.meta.filter(_._1.startsWith(CheckKeyPrefix)).foreach {
      case (k, sql) => require(word.findFirstIn(sql).isEmpty,
        s"$root: cannot $what column [$name] — CHECK " +
          s"${k.stripPrefix(CheckKeyPrefix)} ($sql) references it; " +
          "drop the constraint first, re-add it against the new name")
    }
  }

  /** RENAME a column — one metadata-only commit, zero data files
    * touched. Old snapshots time-travel with their own mapping; a
    * pinned reader is unaffected. The logical name must exist, the
    * target must not, and no CHECK may reference the old name. */
  def renameColumn(spark: SparkSession, root: String,
      from: String, to: String): Long =
   retryingCommit(s"$root renameColumn", 4) {
    require(from != to, s"renameColumn: [$from] -> itself is a no-op")
    require(to.nonEmpty && !to.startsWith("__"),
      s"renameColumn: [$to] is not a legal column name")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val names = logicalSchemaNames(spark, root, snap)
    require(names.contains(from),
      s"$root: no column [$from] to rename (have ${names.mkString(", ")})")
    require(!names.contains(to),
      s"$root: cannot rename [$from] to [$to] — the name is taken")
    requireNoCheckOn(snap, root, from, "rename")
    val phys = toPhysical(snap, from)
    val m2 = (colMapOf(snap) - from) ++
      (if (phys == to) Map.empty[String, String] else Map(to -> phys))
    // pinned to the planned parent: a concurrent schema-touching commit
    // (another rename/drop/appendMerge) forces a re-plan, never a
    // lost-update merge of stale map state
    publish(spark, root, Seq.empty,
      old => (if (m2.isEmpty) old - ColMapKey
              else old + (ColMapKey -> renderStringMap(m2))) +
        (OpKey -> s"renameColumn($from->$to)"),
      _.files, requireVersion = Some(snap.version))._1
   }

  /** DROP a column — one metadata-only commit; the physical bytes stay
    * in existing files (projected away on every read) and disappear
    * naturally as rewrites churn them. The retired PHYSICAL name stays
    * reserved: [[appendMerge]] re-adding the same LOGICAL name assigns
    * a fresh version-stamped physical name and a map entry (by-name
    * parquet resolution would otherwise resurrect the dropped
    * column's old values into the new one). */
  def dropColumn(spark: SparkSession, root: String, name: String): Long =
   retryingCommit(s"$root dropColumn", 4) {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val names = logicalSchemaNames(spark, root, snap)
    require(names.contains(name),
      s"$root: no column [$name] to drop (have ${names.mkString(", ")})")
    require(names.size > 1, s"$root: cannot drop the last column [$name]")
    requireNoCheckOn(snap, root, name, "drop")
    val phys = toPhysical(snap, name)
    val m2 = colMapOf(snap) - name
    val d2 = (droppedOf(snap) :+ phys).distinct
    // future batches arrive WITHOUT the dropped column: re-record the
    // schema fingerprint (and the reader schema, when one is recorded)
    // as the post-drop physical shape, so plain appends keep enforcing.
    // Old files still carry the column's bytes; a recorded schema that
    // omits it means by-name resolution simply never reads them.
    val physSchema = recordedSchema(snap).getOrElse(
      readFiles(spark, root, snap, snap.files.take(1)).schema)
    val kept = org.apache.spark.sql.types.StructType(
      physSchema.fields.filterNot(f => d2.contains(f.name)))
    val fp2 = kept.fields.map(f => s"${f.name}:${f.dataType.catalogString}")
      .sorted.mkString(",")
    publish(spark, root, Seq.empty,
      old => (if (m2.isEmpty) old - ColMapKey
              else old + (ColMapKey -> renderStringMap(m2))) +
        (DroppedKey -> renderStringList(d2)) +
        // ALWAYS record the reader schema: post-drop appends stage
        // files WITHOUT the column, and a heterogeneous file mix needs
        // the recorded-schema read path (exactly like appendMerge)
        (SchemaKey -> fp2) + (SchemaJsonKey -> nullableDeep(kept)
          .asInstanceOf[org.apache.spark.sql.types.StructType].json) +
        (OpKey -> s"dropColumn($name)"),
      _.files, requireVersion = Some(snap.version))._1
   }

  /** Violation counts per registered check over `df` — ONE aggregate
    * pass for all constraints; NULL predicate results count as
    * violations. */
  private def violations(df: DataFrame,
      checks: Map[String, String]): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.{expr, sum, when}
    val ordered = checks.toSeq
    val aggs = ordered.map { case (_, pred) =>
      sum(when(!expr(pred) || expr(pred).isNull, 1L).otherwise(0L))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    ordered.zipWithIndex.map { case ((k, _), i) =>
      k -> (if (row.isNullAt(i)) 0L else row.getLong(i)) // empty batch → null sum
    }
  }

  /** Enforce every registered CHECK against a batch BEFORE staging.
    * `df` arrives in PHYSICAL (staging) names; predicates are authored
    * in LOGICAL names (addCheck validates against the logical view),
    * so evaluation resolves the column map first — a check on a
    * renamed column keeps enforcing (renameColumn separately rejects
    * renames of check-referenced names, so the two can't drift). */
  private def requireChecks(spark: SparkSession, root: String, df: DataFrame): Unit = {
    val cur = current(spark, root)
    val checks = cur
      .map(_.meta.filter(_._1.startsWith(CheckKeyPrefix))).getOrElse(Map.empty)
    if (checks.isEmpty) return
    val logical = cur.map(logicalize(df, _)).getOrElse(df)
    violations(logical, checks).foreach { case (k, bad) =>
      require(bad == 0L,
        s"$root: $bad batch rows violate CHECK ${k.stripPrefix(CheckKeyPrefix)} " +
          s"(${checks(k)}) — commit refused")
    }
  }

  /** Schema enforcement (on by default for [[append]]/[[appendOnce]]):
    * an append whose batch schema drifts from the table's recorded
    * fingerprint throws BEFORE any commit — the public formats' schema
    * enforcement, minus evolution (an intentional schema change goes
    * through [[overwrite]], which re-records). Nullability-insensitive
    * (parquet round-trips relax it). Tables created before fingerprints
    * existed enforce from their next commit on. */
  private def requireSchema(spark: SparkSession, root: String, fp: String): Unit =
    current(spark, root).flatMap(_.meta.get(SchemaKey)).foreach { recorded =>
      require(recorded == fp,
        s"$root: append schema [$fp] drifts from the table's recorded schema " +
          s"[$recorded]; an intentional change must go through overwrite")
    }

  /** Atomic append: stage the batch's files, publish prev ∪ new.
    * `statsCols` adds per-file min/max of those columns to the
    * manifest — the data-skipping index [[readWhereBetween]] prunes
    * by (one extra narrow pass over the staged batch). Metadata MERGES
    * over the previous snapshot's (table properties; new values win),
    * the batch schema is enforced against the table's recorded
    * fingerprint (loud throw on drift), and per-file row counts land
    * from the parquet footers (no job). */
  def append(df: DataFrame, root: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Long = {
    val cur = current(df.sparkSession, root)
    commitStaged(physicalize(df, cur), root, meta,
      statsCols.map(c => cur.map(toPhysical(_, c)).getOrElse(c)),
      _.files, enforceSchema = true,
      skipIf = _ => false, op = "append")._1
  }

  /** Atomic table replace: stage, publish ONLY the new files. The
    * schema fingerprint AND the full schema JSON are RE-recorded
    * (overwrite is the intentional schema-change path); metadata still
    * merges. */
  def overwrite(df: DataFrame, root: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Long =
    // overwrite REPLACES the table wholesale under the batch's own
    // names — any column mapping resets (logical = physical again)
    // ... and the deletion-vector pointer drops with the old files: a
    // carried stale vector would be harmless (fresh file names never
    // match) but every read would pay its broadcast anti-join for free
    commitStaged(df, root, meta + (SchemaJsonKey -> df.schema.json), statsCols,
      _ => Seq.empty, enforceSchema = false,
      skipIf = _ => false, op = "overwrite",
      clearMeta = Seq(ColMapKey, DroppedKey, DvKey, DvRowsKey))._1

  /** EXACTLY-ONCE overwrite — [[overwrite]] carrying a (writerId →
    * txnId) watermark in the same atomic commit, the wholesale-replace
    * sibling of [[appendOnce]]: a replayed or lagging writer whose txn
    * is already recorded SKIPS (current version returned, nothing
    * staged kept). The re-baseline commit of a RESYNCING change-feed
    * consumer ([[changeFeedResync]]) — the mirror's contents and its
    * cursor move together, so there is no window where the mirror
    * holds the new state but would replay the old delta or vice
    * versa. Resets column mapping and the deletion-vector pointer
    * like any overwrite. */
  def overwriteOnce(df: DataFrame, root: String, writerId: String,
      txnId: Long, meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): (Long, Boolean) = {
    require(writerId.nonEmpty && !writerId.exists(c => c.isWhitespace || c == '"'),
      s"writerId must be a simple token, got [$writerId]")
    val spark = df.sparkSession
    def done(s: Snapshot): Boolean =
      s.meta.get(txnKey(writerId)).exists(_.toLong >= txnId)
    val cur = current(spark, root)
    cur.filter(done).foreach(s => return (s.version, false))
    val (v, committed, staged) = commitStaged(df, root,
      meta + (SchemaJsonKey -> df.schema.json) +
        (txnKey(writerId) -> txnId.toString),
      statsCols, _ => Seq.empty, enforceSchema = false,
      skipIf = done, op = "overwriteOnce",
      clearMeta = Seq(ColMapKey, DroppedKey, DvKey, DvRowsKey))
    if (!committed) staged.headOption.foreach { rel =>
      val f = fs(spark, root)
      f.delete(new Path(dataDir(root), rel.substring(0, rel.indexOf('/'))), true)
      ()
    }
    (v, committed)
  }

  /** SCHEMA-EVOLVING append — the public mergeSchema: the batch may ADD
    * columns, INCLUDING fields nested inside structs (recorded in the
    * table schema; files that predate the addition read them as NULL —
    * the parquet reader's by-name clipping resolves missing nested
    * fields to NULL exactly as it does top-level ones), and may OMIT
    * existing columns (staged as typed NULLs, so every staged file
    * carries the full merged schema); a TYPE change on an existing
    * leaf throws loudly unless it is a safe widening — anything else
    * is an intentional rewrite and goes through [[overwrite]]. New
    * columns/fields append after the existing ones, Delta's rule.
    * CHECK constraints run against the PADDED batch, so a
    * NOT-NULL-style check on an omitted column refuses the commit
    * (NULLs violate). Concurrency: the merged schema is planned
    * against a pinned parent and the commit REQUIRES that parent —
    * two appendMerge calls adding different columns re-plan rather
    * than interleave (the loser's recorded schema would otherwise
    * silently omit the winner's new column); bounded auto-retry,
    * loud after. */
  def appendMerge(df: DataFrame, root: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Long =
   retryingCommit(s"$root appendMerge", 4) {
    val spark = df.sparkSession
    val parent = current(spark, root)
    // column mapping: batch arrives LOGICAL; merge runs on PHYSICAL
    // names. A batch-only (new) column keeps its name as physical —
    // unless that name is retired (dropped) or already claimed as the
    // physical of a renamed column, where by-name parquet resolution
    // would resurrect the wrong bytes. Those columns get a FRESH
    // version-stamped physical name and a colmap entry instead (the
    // public id-based column mapping's re-add semantics): the new
    // logical column starts NULL for old rows, never inheriting the
    // retired column's bytes.
    val remap: Map[String, String] = parent.filter(hasMapping) match {
      case None => Map.empty
      case Some(snap) =>
        val live = logicalSchemaNames(spark, root, snap).toSet
        val tablePhys = recordedSchema(snap).getOrElse(
          readFiles(spark, root, snap, snap.files.take(1)).schema)
          .fields.map(_.name).toSet
        val reserved = droppedOf(snap).toSet ++ colMapOf(snap).values ++
          tablePhys
        df.schema.fields.map(_.name).filterNot(live)
          .filter(reserved).map { l =>
            var p = s"${l}__c${snap.version + 1}"
            while (reserved.contains(p)) p = p + "x"
            l -> p
          }.toMap
    }
    val dfP0 = physicalize(df, parent)
    val dfP =
      if (remap.isEmpty) dfP0
      else dfP0.select(dfP0.columns.map(c =>
        col(c).as(remap.getOrElse(c, c))).toSeq: _*)
    val mapMeta: Map[String, String] =
      if (remap.isEmpty) Map.empty
      else Map(ColMapKey -> renderStringMap(
        colMapOf(parent.get) ++ remap))
    val merged: org.apache.spark.sql.types.StructType = parent match {
      case None => dfP.schema
      case Some(snap) =>
        val table = recordedSchema(snap).getOrElse(
          readFiles(spark, root, snap, snap.files.take(1)).schema)
        mergeStructs(table, dfP.schema).getOrElse(
          throw new IllegalArgumentException(
            s"$root: appendMerge cannot reconcile the batch schema " +
              s"[${dfP.schema.catalogString}] with the table schema " +
              s"[${table.catalogString}] — fields may be added (incl. " +
              "nested struct fields) or safely widened " +
              "(byte→short→int→long, float→double, same-scale decimal " +
              "precision growth); any other type change is an " +
              "intentional rewrite (overwrite)"))
    }
    // recorded DEEP-NULLABLE: files predating a column addition read it
    // as NULL, so nothing in an evolved table may claim non-nullability
    // (the vectorized parquet reader enforces the recorded schema)
    val mergedN = nullableDeep(merged).asInstanceOf[org.apache.spark.sql.types.StructType]
    val have = dfP.schema.fields.map(f => f.name -> f.dataType).toMap
    // present columns PADDED to the merged type — rebuilt field-by-field
    // for structs (a Cast cannot add fields), a no-op when unchanged;
    // staged files always carry the wide form, while pre-widening files
    // read wide through the recorded schema (the 4.x vectorized parquet
    // reader's type-widening contract, verified for exactly the
    // promotions `widened` admits)
    val padded = dfP.select(mergedN.fields.toSeq.map(f =>
      have.get(f.name) match {
        case Some(from) => padTo(col(f.name), from, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }): _*)
    commitStaged(padded, root,
      meta ++ mapMeta + (SchemaJsonKey -> mergedN.json),
      statsCols.map(c => parent.map(s =>
        remap.getOrElse(c, toPhysical(s, c))).getOrElse(c)),
      _.files, enforceSchema = false, skipIf = _ => false, op = "appendMerge",
      requireVersion = parent.map(_.version))._1
   }

  /** Field-wise struct merge for [[appendMerge]]: table fields keep
    * their order (each reconciled against the batch's same-named field
    * via [[widened]], which recurses back here for nested structs),
    * batch-only fields append after. None when any leaf fails to
    * reconcile. */
  private def mergeStructs(table: org.apache.spark.sql.types.StructType,
      batch: org.apache.spark.sql.types.StructType):
      Option[org.apache.spark.sql.types.StructType] = {
    val batchByName = batch.fields.map(f => f.name -> f).toMap
    val tableNames = table.fields.map(_.name).toSet
    val evolved = table.fields.map { tf =>
      batchByName.get(tf.name) match {
        case Some(bf) => widened(tf.dataType, bf.dataType) match {
          case Some(w) => tf.copy(dataType = w)
          case None => return None
        }
        case None => tf
      }
    }
    val fresh = batch.fields.filterNot(f => tableNames.contains(f.name))
    Some(org.apache.spark.sql.types.StructType(evolved ++ fresh))
  }

  /** Rebuild `c` (typed `from`) as the merged type `to`: structs are
    * reconstructed field-by-field (batch-missing fields become typed
    * NULLs, null struct VALUES stay null — a blind struct() would
    * materialize a non-null struct of nulls), array elements pad
    * recursively, leaves cast (safe by [[widened]]'s admission). */
  private def padTo(c: org.apache.spark.sql.Column,
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    import org.apache.spark.sql.functions.{struct, transform, when}
    (from, to) match {
      case (f, t) if f == t => c
      case (f: StructType, t: StructType) =>
        val fromBy = f.fields.map(x => x.name -> x.dataType).toMap
        val sub = t.fields.toSeq.map { tf =>
          (fromBy.get(tf.name) match {
            case Some(fd) => padTo(c.getField(tf.name), fd, tf.dataType)
            case None => lit(null).cast(tf.dataType)
          }).as(tf.name)
        }
        when(c.isNull, lit(null).cast(t)).otherwise(struct(sub: _*)).cast(t)
      case (f: ArrayType, t: ArrayType) =>
        transform(c, e => padTo(e, f.elementType, t.elementType)).cast(t)
      case (_, t) => c.cast(t)
    }
  }

  /** The wider of two types when the promotion is SAFE under the
    * parquet reader's widening contract (old files keep their narrow
    * physical type and read wide through the recorded schema):
    * the integral ladder byte→short→int→long, float→double, and
    * same-scale decimal precision growth. Everything else — including
    * int↔float cross-family, string↔anything, nested shape changes —
    * answers None and the merge rejects loudly. */
  private def widened(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType):
      Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    if (a.catalogString == b.catalogString) return Some(a)
    def rank(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(0); case ShortType => Some(1)
      case IntegerType => Some(2); case LongType => Some(3)
      case _ => None
    }
    ((rank(a), rank(b)) match {
      case (Some(x), Some(y)) => Some(if (x >= y) a else b)
      case _ => None
    }).orElse((a, b) match {
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case (x: DecimalType, y: DecimalType) if x.scale == y.scale =>
        Some(if (x.precision >= y.precision) x else y)
      // nested evolution: a struct leaf may gain fields / widen
      // recursively; arrays evolve through their element type. Maps
      // and cross-family shapes stay rejected.
      case (x: StructType, y: StructType) => mergeStructs(x, y)
      case (x: ArrayType, y: ArrayType) =>
        widened(x.elementType, y.elementType)
          .map(e => ArrayType(e, x.containsNull || y.containsNull))
      case _ => None
    })
  }

  /** Every field (recursively) nullable — what an evolved table's
    * recorded schema must claim. */
  private def nullableDeep(dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = nullableDeep(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(nullableDeep(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(nullableDeep(m.keyType), nullableDeep(m.valueType),
          valueContainsNull = true)
      case other => other
    }
  }

  /** EXACTLY-ONCE append — the public Delta `txn` idea, the idempotent
    * sink a streaming writer needs: `txnId` is the writer's
    * monotonically increasing transaction number (a Structured
    * Streaming batchId); the manifest records the last committed one
    * per `writerId`, and a replayed or raced duplicate commit is
    * SKIPPED (staged files swept immediately). The check re-runs inside
    * the optimistic commit loop against whichever snapshot wins as
    * parent, so two racing replays of the same (writer, txn) commit
    * exactly one batch. Returns (version, committed). */
  def appendOnce(df: DataFrame, root: String, writerId: String, txnId: Long,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): (Long, Boolean) = {
    require(writerId.nonEmpty && !writerId.exists(c => c.isWhitespace || c == '"'),
      s"writerId must be a simple token, got [$writerId]")
    val spark = df.sparkSession
    def done(s: Snapshot): Boolean =
      s.meta.get(txnKey(writerId)).exists(_.toLong >= txnId)
    // fast path: no staging work when the txn is already in
    val cur = current(spark, root)
    cur.filter(done).foreach(s => return (s.version, false))
    val (v, committed, staged) = commitStaged(physicalize(df, cur), root,
      meta + (txnKey(writerId) -> txnId.toString),
      statsCols.map(c => cur.map(toPhysical(_, c)).getOrElse(c)), _.files,
      enforceSchema = true, skipIf = done, op = "appendOnce")
    // abandoned commit: sweep ONLY our own staged batch dir (another
    // writer's staged-but-uncommitted batch must survive; [[gc]] is the
    // backstop for crash debris)
    if (!committed) staged.headOption.foreach { rel =>
      val f = fs(spark, root)
      f.delete(new Path(dataDir(root), rel.substring(0, rel.indexOf('/'))), true)
      ()
    }
    (v, committed)
  }

  /** BENCH/TEST-ONLY commit of fabricated file entries — no data is
    * staged and the entries must never be read; exists so the log
    * benches ([[graft.bench.ManifestLogBench]]) and the two-process
    * race harness ([[graft.tools.CommitRace]]) can exercise COMMIT
    * PROTOCOL cost and atomicity at 10⁴–10⁵-file manifests without
    * paying 10⁵ real parquet writes that would drown the measured
    * object. Goes through the real [[publish]] (locks, arbiter,
    * delta/checkpoint decision) with synthetic stats. */
  private[graft] def appendSynthetic(spark: SparkSession, root: String,
      names: Seq[String], rowsPer: Long = 1000L,
      bytesPer: Long = 64L << 20): Long =
    publish(spark, root, names,
      old => old + (OpKey -> "appendSynthetic"), _.files,
      newStats = names.map(n => n -> Map[String, (Any, Any)](
        "id" -> (0L: Any, rowsPer: Any))).toMap,
      newRows = names.map(_ -> rowsPer).toMap,
      newBytes = names.map(_ -> bytesPer).toMap)._1

  /** Common commit path: stage → footer row counts → drop empty files
    * → optional schema enforcement → min/max stats pass → publish.
    * Returns (version, committed, stagedFiles). */
  private def commitStaged(df: DataFrame, root: String,
      meta: Map[String, String], statsCols: Seq[String],
      baseFiles: Snapshot => Seq[String], enforceSchema: Boolean,
      skipIf: Snapshot => Boolean, op: String,
      requireVersion: Option[Long] = None,
      clearMeta: Seq[String] = Nil): (Long, Boolean, Seq[String]) = {
    val spark = df.sparkSession
    val fp = schemaFingerprint(df)
    if (enforceSchema) requireSchema(spark, root, fp)
    requireChecks(spark, root, df)
    val staged = stage(df, root)
    val (rows, bytesM, fts) = footerMeta(spark, root, staged)
    val kept = withoutEmpty(staged, rows)
    val stats = fileStats(spark, root, kept, statsCols, fts)
    val (v, committed) = publish(spark, root, kept,
      old => (old -- clearMeta) ++ meta + (SchemaKey -> fp) + (OpKey -> op),
      baseFiles, stats, rows.filter(kv => kept.contains(kv._1)), skipIf,
      requireVersion = requireVersion,
      newBytes = bytesM.filter(kv => kept.contains(kv._1)))
    (v, committed, staged)
  }

  /** Total order over stat bounds and predicate constants of the same
    * family: integral (Long/Int/...), fractional (Double/Float),
    * decimals, strings. Cross-family numeric compares go through
    * BigDecimal (a Long bound vs a Double probe must not fall back to
    * string order).
    *
    * Temporal values (java.sql.Date/Timestamp probes from a caller, or
    * java.time values Spark's collect may surface) normalize to the SAME
    * canonical text [[statJson]] stored their bounds as — those ISO-ish
    * forms are order-preserving lexically: dates are fixed-width
    * yyyy-MM-dd, and a timestamp's variable-length decimal fraction
    * still compares correctly digit-by-digit (a shorter fraction that is
    * a prefix of a longer one is the smaller value). Without this,
    * date-range probes against date-stat'd files threw in the
    * (String, Date) match — data skipping unusable on the single most
    * common skip column family. */
  private def temporalText(v: Any): Any = v match {
    case d: java.sql.Date => String.valueOf(d)
    case t: java.sql.Timestamp => String.valueOf(t)
    case d: java.time.LocalDate => String.valueOf(java.sql.Date.valueOf(d))
    case t: java.time.LocalDateTime => String.valueOf(java.sql.Timestamp.valueOf(t))
    case t: java.time.Instant => String.valueOf(java.sql.Timestamp.from(t))
    case other => other
  }
  /** String bounds order by UTF-8 BINARY (= Unicode code-point) order
    * — the order Spark's min/max computed the recorded stats under
    * (UTF8String.compareTo). Java's String.compareTo is UTF-16 code
    * units, which disagrees when supplementary characters mix with
    * U+E000..U+FFFF: under UTF-16 a surrogate pair sorts BELOW U+E000,
    * so a file whose Spark-recorded max is a supplementary char would
    * be wrongly pruned for a U+E000-range probe. One comparator now
    * serves stats recording, pruning, and the cube sweeps
    * ([[graft.store.Layout.utf8Order]] is the same order on the
    * clustering side). */
  private[store] def cmp(a0: Any, b0: Any): Int = (temporalText(a0), temporalText(b0)) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => Layout.utf8Order.compare(x, y)
    case (x: Number, y: Number) =>
      new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString))
    case (a, b) => throw new IllegalArgumentException(
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
    val keep = prunedFiles(snap, toPhysical(snap, colName), lo, hi)
    val base =
      if (keep.isEmpty)
        // every file pruned: read one file for the SCHEMA, emit no rows
        // (fabricating a schema here would desync from the stored one)
        readSnapshot(spark, root, snap.copy(files = snap.files.take(1)))
          .filter(lit(false))
      else readSnapshot(spark, root, snap.copy(files = keep))
    base.filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  /** Deserialized bloom sidecars by (root, rel): a sidecar is
    * IMMUTABLE once written (each build lands under a fresh
    * version-stamped name), so caching is safe; bounded by whole-map
    * eviction — at the cap a fresh probe repopulates only its own
    * table's entry. Keeps the probe path free of Spark jobs: list
    * screening is a driver loop over pre-parsed sketches. */
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[(String, org.apache.spark.util.sketch.BloomFilter)]]()

  private def bloomEntries(spark: SparkSession, root: String, rel: String)
      : Array[(String, org.apache.spark.util.sketch.BloomFilter)] = {
    if (bloomCache.size > 8) bloomCache.clear()
    bloomCache.computeIfAbsent(s"$root#$rel", _ =>
      spark.read.parquet(new Path(root, rel).toString)
        .select(col("file"), col("bloom")).collect()
        .map(r => (r.getString(0),
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))))
  }

  /** xxhash64 of a probe value, evaluated ON THE DRIVER (the
    * expression tree under a literal probe is fully foldable — no
    * reason to launch a job to hash one value). Built from raw
    * catalyst Literal/Cast/XxHash64 — the exact expression the index's
    * build pass ran on the executors — so the hash agrees
    * bit-for-bit; the cast to the column's SCAN type matters because
    * xxhash64 is type-sensitive (an Int probe against a Long column
    * would hash differently, and the index was built hashing the
    * column's own type). Answers None — DON'T SCREEN — when the
    * column's type could not be resolved or the probe doesn't cast
    * into it: a wrongly-typed hash would silently prune files that
    * HOLD the value, and the scaladoc contract is that correctness
    * never depends on the bloom layer. */
  private def hashProbe(value: Any,
      dt: Option[org.apache.spark.sql.types.DataType]): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, XxHash64}
    val litE = Literal(value)
    val typed: Option[Expression] = dt match {
      case None => None
      case Some(t) if t == litE.dataType => Some(litE)
      case Some(t) =>
        if (!Cast.canCast(litE.dataType, t)) None
        else {
          val c = Cast(litE, t, Some("UTC"))
          val v = scala.util.Try(
            c.eval(org.apache.spark.sql.catalyst.InternalRow.empty)).getOrElse(null)
          if (v == null) None else Some(c)
        }
    }
    typed.map(e => new XxHash64(Seq(e))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long])
  }

  /** The column's SCAN type for bloom-probe hashing: the recorded
    * schema when one exists, else ONE live file's parquet schema (a
    * driver footer read, no job — cheap, and the index build read the
    * same files). Plain-append tables never record [[SchemaJsonKey]],
    * so without the fallback an Int probe against a Long column hashed
    * IntegerType while the index was built hashing LongType — every
    * mightContain answered false and matching files were silently
    * pruned. */
  private def bloomProbeType(spark: SparkSession, root: String,
      snap: Snapshot, colName: String): Option[org.apache.spark.sql.types.DataType] =
    recordedSchema(snap)
      .orElse(scala.util.Try(
        readFiles(spark, root, snap, snap.files.take(1)).schema).toOption)
      .flatMap(_.fields.find(_.name == colName)).map(_.dataType)

  /** Build (or refresh) the per-file BLOOM index for `colName` over
    * the CURRENT snapshot: ONE pass groups the table's rows by source
    * file and aggregates a bloom of the column's xxhash64 values per
    * file (Spark's own runtime-filter sketch machinery —
    * `BloomFilterAggregate` — reused at rest), the (file, bloom) table
    * lands as a parquet sidecar under `bloom/`, and a metadata-only
    * commit records the pointer. Sized at `bitsPerRow` bits per row of
    * the largest file (10 ≈ 1 % false positives), capped at Spark's
    * runtime-filter ceiling (64 Mbit). Rebuild after enough appends or
    * rewrites have diluted coverage — until then the new files are
    * simply unscreened candidates ([[readWhereEquals]]). */
  def buildBloomIndex(spark: SparkSession, root: String, colName: String,
      bitsPerRow: Int = 10): Long = {
    require(bitsPerRow >= 2, s"bitsPerRow must be >= 2, got $bitsPerRow")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    require(snap.files.nonEmpty, s"$root is empty — nothing to index")
    val pcol = toPhysical(snap, colName)
    import org.apache.spark.sql.functions.xxhash64
    val maxRows =
      if (snap.rows.nonEmpty) snap.rows.values.max else 4000000L
    val items = math.min(math.max(maxRows, 1L), 4000000L)
    val bits = math.min(items * bitsPerRow, 67108864L)
    val litE = org.apache.spark.sql.catalyst.expressions.Literal
    val bloomAgg = org.apache.spark.sql.GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          org.apache.spark.sql.GraftSqlBridge.expression(xxhash64(col("__v"))),
          litE(items), litE(bits)).toAggregateExpression())
    val rel = s"bloom/${pcol}_v${snap.version}"
    readFiles(spark, root, snap, snap.files)
      .select(col(pcol).as("__v"),
        org.apache.spark.sql.functions
          .expr("substring_index(_metadata.file_path, '/data/', -1)")
          .as("file"))
      .groupBy("file").agg(bloomAgg.as("bloom"))
      .write.mode("overwrite").parquet(new Path(root, rel).toString)
    publish(spark, root, Seq.empty,
      old => old + (BloomKeyPrefix + pcol -> rel) +
        (OpKey -> s"bloomIndex($pcol)"),
      _.files)._1
  }

  /** Auto-refresh valve for standing ingest loops: rebuild the bloom
    * index when its COVERAGE of the current snapshot decays below
    * `minCoverage` (files appended or rewritten since the last build
    * are unscreened candidates — correct but unpruned). The check is
    * metadata-only (cached sidecar names vs the file list, no data
    * scan); the rebuild is [[buildBloomIndex]]'s one pass. Returns
    * whether a rebuild ran. */
  def maybeRefreshBloomIndex(spark: SparkSession, root: String,
      colName: String, minCoverage: Double = 0.7): Boolean = {
    require(minCoverage > 0.0 && minCoverage <= 1.0,
      s"minCoverage must be in (0, 1], got $minCoverage")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    if (snap.files.isEmpty) return false
    val stale = snap.meta.get(BloomKeyPrefix + toPhysical(snap, colName)) match {
      case None => true
      case Some(rel) =>
        val known = bloomEntries(spark, root, rel).map(_._1).toSet
        val covered = snap.files.count(f => known.contains(dvName(f)))
        covered.toDouble / snap.files.size < minCoverage
    }
    if (stale) buildBloomIndex(spark, root, colName)
    stale
  }

  /** POINT-LOOKUP read: `colName = value` with two pruning layers —
    * the [min, max] skip stats (as every range read), then the bloom
    * sidecar when one is recorded: a file whose bloom provably lacks
    * the probe's hash is skipped; files absent from the sidecar stay
    * candidates (post-build appends/rewrites — conservative, stated in
    * [[buildBloomIndex]]). The probe hashes `value` AS THE COLUMN'S
    * RECORDED TYPE (xxhash64 is type-sensitive) and evaluates the
    * might-contain per sidecar row — O(files) driver booleans, no
    * bloom bytes leave the executors. Correctness never depends on
    * either layer: the equality predicate re-applies to every row. */
  def readWhereEquals(spark: SparkSession, root: String, colName: String,
      value: Any): DataFrame = {
    require(value != null, "readWhereEquals probes a non-null value")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val pcol = toPhysical(snap, colName)
    val statCand = prunedFiles(snap, pcol, value, value)
    val cand = snap.meta.get(BloomKeyPrefix + pcol) match {
      case None => statCand
      case Some(rel) =>
        hashProbe(value, bloomProbeType(spark, root, snap, pcol)) match {
          case None => statCand // unresolvable/uncastable probe: stats only
          case Some(h) =>
            val entries = bloomEntries(spark, root, rel)
            val known = entries.map(_._1).toSet
            val pass = entries.filter(_._2.mightContainLong(h)).map(_._1).toSet
            statCand.filter { f =>
              val n = dvName(f); !known.contains(n) || pass(n)
            }
        }
    }
    val base =
      if (cand.isEmpty)
        readSnapshot(spark, root, snap.copy(files = snap.files.take(1)))
          .filter(org.apache.spark.sql.functions.lit(false))
      else readSnapshot(spark, root, snap.copy(files = cand))
    base.filter(col(colName) === lit(value))
  }

  /** Multi-value point lookup: `colName IN (values)` as ONE scan of
    * the union candidate set — the id-list fetch shape. Each value
    * screens through the [min, max] stats, then the bloom sidecar
    * (when recorded) keeps a file only if SOME probe value might be
    * contained; all probe hashes come from one tiny job (the values
    * cast to the column's recorded type). Driver cost is
    * O(values × files) set arithmetic — the operator is for BOUNDED
    * in-lists (tens to thousands of ids), not semi-joins; join a
    * table for those. */
  def readWhereIn(spark: SparkSession, root: String, colName: String,
      values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "readWhereIn needs at least one value")
    require(values.forall(_ != null), "readWhereIn probes non-null values")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val pcol = toPhysical(snap, colName)
    val statCand = values
      .flatMap(v => prunedFiles(snap, pcol, v, v)).distinct
    val cand = snap.meta.get(BloomKeyPrefix + pcol) match {
      case None => statCand
      case Some(rel) =>
        val dt = bloomProbeType(spark, root, snap, pcol)
        val hashes = values.flatMap(hashProbe(_, dt))
        // an unhashable probe value could live in ANY file — a partial
        // hash list must not screen (its files would be pruned wrongly)
        if (hashes.size != values.size) statCand
        else {
          val entries = bloomEntries(spark, root, rel)
          val known = entries.map(_._1).toSet
          val pass = entries
            .filter(e => hashes.exists(e._2.mightContainLong))
            .map(_._1).toSet
          statCand.filter { f =>
            val n = dvName(f); !known.contains(n) || pass(n)
          }
        }
    }
    val base =
      if (cand.isEmpty)
        readSnapshot(spark, root, snap.copy(files = snap.files.take(1)))
          .filter(org.apache.spark.sql.functions.lit(false))
      else readSnapshot(spark, root, snap.copy(files = cand))
    base.filter(col(colName).isin(values: _*))
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

  /** count(*) answered from the MANIFEST alone — Some(sum of the
    * per-file footer counts) when every file in the snapshot carries
    * one, None when any predates row-count recording (fall back to a
    * scan). O(1) in data bytes; the public formats' numRecords idea. */
  def rowCount(snap: Snapshot): Option[Long] = {
    val footerSum =
      if (snap.files.forall(snap.rows.contains)) Some(snap.files.map(snap.rows).sum)
      else None
    snap.meta.get(DvKey) match {
      case None => footerSum
      case Some(_) => // footer counts include DV'd rows; subtract the
        // recorded live vector count when one is present (absent after
        // a file-rewriting commit stranded stale entries -> scan)
        for { total <- footerSum; dv <- snap.meta.get(DvRowsKey) }
          yield total - dv.toLong
    }
  }

  /** count(*) of the current snapshot: metadata fast path, scan
    * fallback for pre-row-count tables. */
  def countRows(spark: SparkSession, root: String): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    rowCount(snap).getOrElse(readSnapshot(spark, root, snap).count())
  }

  /** RESTORE: publish an old snapshot's exact state (files, metadata,
    * stats, row counts) as a NEW version — the public formats' table
    * rollback. Requires every file of the target snapshot to still
    * exist (loud throw if [[gc]] already swept it). Note the
    * transaction caveat the public formats share: restoring to before
    * an [[appendOnce]] commit also restores the txn watermark, so that
    * batch becomes committable again — which is exactly what a rollback
    * means. */
  def restore(spark: SparkSession, root: String, version: Long): Long = {
    val snapV = snapshot(spark, root, version)
    val f = fs(spark, root)
    snapV.meta.get(DvKey).foreach(rel => require(f.exists(new Path(root, rel)),
      s"$root: cannot restore version $version — gc already swept its deletion vector $rel"))
    val missing = snapV.files.filterNot(rel => f.exists(new Path(dataDir(root), rel)))
    require(missing.isEmpty,
      s"$root: cannot restore version $version — gc already swept ${missing.take(3)}" +
        s"${if (missing.size > 3) s" (+${missing.size - 3} more)" else ""}")
    publish(spark, root, snapV.files,
      _ => snapV.meta + (OpKey -> s"restore($version)"), _ => Seq.empty,
      snapV.stats, snapV.rows, newBytes = snapV.bytes)._1
  }

  /** INCREMENTAL read: the rows appended strictly AFTER `sinceVersion`
    * — a batch consumer's change feed. Exact precisely when the lineage
    * since then is append-only, which is verified structurally (every
    * file of the old snapshot must survive in the current one); an
    * intervening overwrite/compact/restore rewrites files and throws
    * loudly — re-read the table and re-baseline, the public formats'
    * own rule for file-rewriting commits in a change feed. */
  def changesSince(spark: SparkSession, root: String, sinceVersion: Long): DataFrame = {
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    changes(spark, root, sinceVersion, cur)
  }

  /** [[changesSince]] against an explicitly PINNED target snapshot —
    * the race-free form for a feed consumer that must commit the exact
    * version it read (resolve `current` once, read the delta up to it,
    * record its version; a commit landing in between is simply the next
    * step's delta instead of silently widening this one). */
  def changes(spark: SparkSession, root: String, sinceVersion: Long,
      to: Snapshot): DataFrame = {
    val old = snapshot(spark, root, sinceVersion)
    require(old.meta.get(DvKey) == to.meta.get(DvKey),
      s"$root: versions $sinceVersion..${to.version} are not append-only " +
        "(a deletion-vector commit intervened) — re-read the full table and re-baseline")
    val curSet = to.files.toSet
    val rewritten = old.files.filterNot(curSet)
    require(rewritten.isEmpty,
      s"$root: versions $sinceVersion..${to.version} are not append-only " +
        s"(${rewritten.size} files rewritten, e.g. ${rewritten.take(2)}) — " +
        "re-read the full table and re-baseline")
    val oldSet = old.files.toSet
    val fresh = to.files.filterNot(oldSet)
    if (fresh.isEmpty)
      readSnapshot(spark, root, to.copy(files = to.files.take(1))).filter(lit(false))
    else readSnapshot(spark, root, to.copy(files = fresh))
  }

  /** Last transaction id committed by `writerId` through [[appendOnce]]
    * — read from the current snapshot's metadata. For a feed consumer
    * mirroring INTO a manifest table, this IS the durable cursor: no
    * side state to keep consistent, crash safety inherited from the
    * manifest's own atomic commit. */
  def lastTxn(spark: SparkSession, root: String, writerId: String): Option[Long] =
    current(spark, root).flatMap(_.meta.get(txnKey(writerId))).map(_.toLong)

  /** Every writerId holding a txn watermark on this table — the
    * ownership probe for single-pump destinations (a materialized view
    * folded by TWO pumps double-counts; the fold is not value-
    * idempotent, so a second writer must fail loud, not corrupt). */
  def txnWriters(spark: SparkSession, root: String): Seq[String] =
    current(spark, root).map(_.meta.keys
      .filter(_.startsWith("graft.txn."))
      .map(_.stripPrefix("graft.txn.")).toSeq.sorted).getOrElse(Seq.empty)

  /** The change-feed column [[changesWithDeltas]] tags each row with:
    * `insert` (row entered the table in the window) or `remove` (row
    * left it). */
  val ChangeTypeCol = "_change_type"

  /** Whether the lineage `sinceVersion` → `to` is append-only (every
    * old file survives, same deletion vector) — the metadata-only test
    * that picks between the cheap [[changes]] feed and the
    * retraction-capable [[changesWithDeltas]]. */
  def appendOnlySince(spark: SparkSession, root: String,
      sinceVersion: Long, to: Snapshot): Boolean = {
    val old = snapshot(spark, root, sinceVersion)
    val curSet = to.files.toSet
    old.meta.get(DvKey) == to.meta.get(DvKey) && old.files.forall(curSet)
  }

  /** GENERAL change feed — the RETRACTION-capable form of [[changes]]:
    * the logical row delta between `sinceVersion` and the pinned `to`
    * snapshot as a frame tagged [[ChangeTypeCol]] insert/remove.
    * Computed at FILE granularity, which is exact for ANY commit kind:
    * files only in `to` contribute their live rows as inserts (the
    * pinned vector applied — a row inserted and DV-deleted inside the
    * window nets to nothing), files only in the old snapshot
    * contribute the rows THAT SNAPSHOT exposed as removes (its own
    * vector applied), and carried files newly covered by `to`'s
    * deletion vector contribute those rows as removes. A row carried
    * through a rewrite (upsert's untouched neighbors in a rewritten
    * file, compaction) appears as both a remove and an insert — the
    * pair nets to zero in any sign-folding consumer, so upserts,
    * deletes (both forms), replaceWhere, restore, and even compaction
    * all produce a CORRECT delta; compaction's is merely large
    * (O(table) both ways), which is a cost statement, not a
    * correctness one. Reads resolve under `to`'s recorded schema
    * (the merged, wider one on evolved tables). The old snapshot's
    * files must still exist — the gc-retention caveat time travel
    * already carries. */
  def changesWithDeltas(spark: SparkSession, root: String,
      sinceVersion: Long, to: Snapshot): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, expr}
    val old = snapshot(spark, root, sinceVersion)
    val curSet = to.files.toSet
    val oldSet = old.files.toSet
    val fresh = to.files.filterNot(oldSet)
    val removed = old.files.filterNot(curSet)
    val carried = old.files.filter(curSet)
    def empty: DataFrame = {
      val one = if (to.files.nonEmpty) to.files.take(1) else old.files.take(1)
      require(one.nonEmpty, s"$root: both snapshots are empty — no schema to expose")
      readFiles(spark, root, to, one)
        .filter(lit(false)).withColumn(ChangeTypeCol, lit(""))
    }
    def tag(df: DataFrame, t: String): DataFrame =
      df.withColumn(ChangeTypeCol, lit(t))
    val ins =
      if (fresh.isEmpty) None
      else Some(tag(applyDv(spark, root, to, readFiles(spark, root, to, fresh)), "insert"))
    val rem1 =
      if (removed.isEmpty) None
      else Some(tag(applyDv(spark, root, old, readFiles(spark, root, to, removed)), "remove"))
    // carried files newly covered by to's vector: DV-only deletes in
    // the window (same vector pointer = provably none)
    val rem2 =
      if (old.meta.get(DvKey) == to.meta.get(DvKey) || carried.isEmpty) None
      else dvFrame(spark, root, to).map { toDv =>
        val newEntries = dvFrame(spark, root, old) match {
          case Some(oldDv) => toDv.join(oldDv, Seq("f", "ri"), "left_anti")
          case None => toDv
        }
        val carriedNames = carried.map(dvName).toSet
        val aff = newEntries.select("f").distinct().collect()
          .map(_.getString(0)).filter(carriedNames).toSet
        if (aff.isEmpty) empty
        else tag(
          readFiles(spark, root, to, carried.filter(f => aff(dvName(f))))
            .withColumn("__graft_f",
              expr("substring_index(_metadata.file_path, '/data/', -1)"))
            .withColumn("__graft_ri", expr("_metadata.row_index"))
            .join(broadcast(newEntries
                .select(col("f").as("__graft_f"), col("ri").as("__graft_ri"))),
              Seq("__graft_f", "__graft_ri"), "left_semi")
            .drop("__graft_f", "__graft_ri"), "remove")
      }
    logicalize((ins.toSeq ++ rem1.toSeq ++ rem2.toSeq)
      .reduceOption(_.unionByName(_)).getOrElse(empty), to)
  }

  /** The change-feed column [[changeFeed]] adds beside
    * [[ChangeTypeCol]]: which commit produced the row's delta. */
  val CommitVersionCol = "_commit_version"

  /** PER-COMMIT change data feed — the user-facing CDF table (the
    * public Delta `table_changes(...)` surface): every logical row
    * delta in `(fromVersion, toVersion]`, tagged [[ChangeTypeCol]]
    * insert/remove AND [[CommitVersionCol]] = the commit that produced
    * it. [[changesWithDeltas]] is the NET delta over a window (a
    * carried rewrite nets out); this form ATTRIBUTES deltas commit by
    * commit, so a consumer sees an upsert as its remove+insert pair AT
    * its version, an audit query can ask "what did commit v change",
    * and a downstream sync can replay history in order. Exactness is
    * inherited stepwise: each step is [[changesWithDeltas]](v-1, v),
    * correct for ANY commit kind. Cost is O(commits in the window)
    * scan branches — a consumer folding a LONG history should either
    * checkpoint (short windows) or take the net form; a compaction
    * inside the window contributes its full remove+insert volume,
    * which is the honest accounting of what that commit did. Every
    * step reads under ITS OWN snapshot's mapping/schema, so a rename
    * or evolution inside the window is replayed faithfully; all
    * steps' frames are unioned BY NAME with missing columns as NULL
    * (the widened reader contract). Old versions' files must still
    * exist — the gc-retention caveat every time-travel read carries. */
  def changeFeed(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(toVersion > fromVersion,
      s"changeFeed needs an open window, got ($fromVersion, $toVersion]")
    require(fromVersion >= -1L,
      s"changeFeed fromVersion is exclusive; -1 starts at genesis, got $fromVersion")
    val steps = ((fromVersion + 1) to toVersion).map { v =>
      val step =
        if (v == 0L) {
          // genesis: no predecessor — version 0's live rows ARE its delta
          val s0 = snapshot(spark, root, 0L)
          logicalize(
            applyDv(spark, root, s0, readFiles(spark, root, s0, s0.files)), s0)
            .withColumn(ChangeTypeCol, lit("insert"))
        } else changesWithDeltas(spark, root, v - 1, snapshot(spark, root, v))
      step.withColumn(CommitVersionCol, lit(v))
    }
    // schema can widen inside the window: align every step's frame on
    // the union of columns, padding absences with NULL
    val allCols = steps.flatMap(_.columns).distinct
    steps.map { df =>
      df.select(allCols.map(c =>
        if (df.columns.contains(c)) col(s"`$c`") else lit(null).as(c)): _*)
    }.reduce(_.unionByName(_))
  }

  /** The resync flag column [[changeFeedResync]] adds beside
    * [[ChangeTypeCol]] / [[CommitVersionCol]]: true on the rows of a
    * full-state re-baseline window, false on exact delta rows. */
  val ResyncCol = "_resync"

  /** [[changeFeed]] that SURVIVES a gc'd left edge — the lagging-CDC-
    * consumer contract every public change feed needs: when retention
    * outpaces a consumer (the manifests for part of `(fromVersion,
    * toVersion]` are gone), the exact per-commit replay is
    * unrecoverable, and throwing (what [[changeFeed]] does) strands
    * the consumer forever. This form instead finds the OLDEST version
    * `r` from which the remaining feed is exact (the contiguous
    * retained run ending at `toVersion` — gc keeps a resolved
    * checkpoint for the oldest retained version, so `r` always
    * resolves), emits the FULL live state at `r` as one insert-only
    * window tagged [[ResyncCol]] = true and [[CommitVersionCol]] = r
    * (the consumer's cue to TRUNCATE-AND-RELOAD rather than fold),
    * then the exact per-commit deltas of `(r, toVersion]` with
    * [[ResyncCol]] = false. A fully-retained window degrades to
    * [[changeFeed]] plus a constant-false [[ResyncCol]] — same rows,
    * same attribution. A resync whose snapshot is EMPTY (all rows
    * deleted before the gc) emits ONE synthetic marker row instead —
    * [[ChangeTypeCol]] = `truncate`, every data column NULL,
    * [[ResyncCol]] = true — so a row-folding consumer still SEES the
    * truncation event it must act on (zero rows would be
    * indistinguishable from "nothing happened"); version-driven
    * consumers ([[graft.streaming.StreamOps.manifestCdcMirrorStep]])
    * never needed the flag and ignore the marker like any unknown
    * change type. */
  def changeFeedResync(spark: SparkSession, root: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(toVersion > fromVersion,
      s"changeFeedResync needs an open window, got ($fromVersion, $toVersion]")
    val have = versions(spark, root).toSet
    require(have.contains(toVersion),
      s"$root: version $toVersion does not exist")
    val needFrom = math.max(fromVersion, 0L)
    if ((needFrom to toVersion).forall(have))
      return changeFeed(spark, root, fromVersion, toVersion)
        .withColumn(ResyncCol, lit(false))
    // left edge gc'd: oldest r with [r, toVersion] fully retained
    var r = toVersion
    while (have.contains(r - 1)) r -= 1
    val snapR = snapshot(spark, root, r)
    val state =
      if (snapR.files.nonEmpty)
        logicalize(applyDv(spark, root, snapR,
          readFiles(spark, root, snapR, snapR.files)), snapR)
      else recordedSchema(snapR) match {
        case Some(st) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
        case None => throw new IllegalStateException(
          s"$root: resync version $r is empty with no recorded schema")
      }
    // an EMPTY resync state (no files, or a vector covering every
    // row) must still be VISIBLE to row-folding consumers: emit one
    // all-NULL `truncate` marker in its place (metadata-level event
    // as a row — the cue to clear state and await deltas). Emptiness
    // is decided from manifest metadata (footer row counts minus the
    // recorded DV count) — JOB-FREE; only a snapshot predating
    // row-count recording (or with a stranded DV pointer) pays the
    // state.isEmpty action over the resync frame
    val stateEmpty = snapR.files.isEmpty ||
      rowCount(snapR).map(_ == 0L).getOrElse(state.isEmpty)
    val base = (if (!stateEmpty) state else {
      val st = state.schema
      spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row.fromSeq(st.fields.map(_ => null).toSeq)), st)
    })
      .withColumn(ChangeTypeCol, lit(if (stateEmpty) "truncate" else "insert"))
      .withColumn(CommitVersionCol, lit(r))
      .withColumn(ResyncCol, lit(true))
    val frames = Seq(base) ++ (if (r < toVersion)
      Some(changeFeed(spark, root, r, toVersion)
        .withColumn(ResyncCol, lit(false)))
      else None)
    // schema can widen across the window: align on the column union
    val allCols = frames.flatMap(_.columns).distinct
    frames.map { df =>
      df.select(allCols.map(c =>
        if (df.columns.contains(c)) col(s"`$c`") else lit(null).as(c)): _*)
    }.reduce(_.unionByName(_))
  }

  /** MERGE / upsert by key — the table-format point-update whose cost
    * follows TOUCHED FILES, not table size: coarse-prune candidate
    * files by the recorded [min, max] of `keyCol` against the batch's
    * key range, then discover the files actually containing a batch key
    * with ONE semi-join scan of the candidates (`input_file_name`, the
    * public Delta MERGE's touched-file discovery), rewrite only those
    * (matched rows replaced by their batch row, every other row carried
    * through), append the batch, and publish (files − touched) ∪
    * rewritten ∪ batch in ONE atomic commit. Untouched files keep their
    * identity, stats, and row counts.
    *
    * Semantics: batch keys must be unique (loud throw); a key present
    * in multiple table files (appended duplicates) has ALL copies
    * replaced by the one batch row; batch rows with unmatched keys are
    * inserts. Read-modify-write concurrency: the commit requires the
    * snapshot it planned against to still be current — a concurrent
    * commit throws (retry the upsert), never silently resurrects
    * replaced rows. */
  def upsert(batch: DataFrame, root: String, keyCol: String,
      maxRetries: Int = 4): Long =
    retryingCommit(s"$root upsert", maxRetries)(upsertPlanned(batch, root, keyCol))

  /** Bounded auto-retry for the read-modify-write commits: on a
    * [[ConcurrentCommitException]] (another commit landed between plan
    * and publish) the operation RE-PLANS from scratch against the new
    * current snapshot — correct by construction, because every planned
    * artifact (touched files, rewrites, vectors) derives from the
    * snapshot resolved inside the body. Loud after `attempts` replans:
    * a root under that much write pressure needs its writers
    * coordinated, not silently serialized here. */
  private def retryingCommit[T](what: String, attempts: Int)(body: => T): T = {
    var i = 0
    while (true) {
      try return body
      catch {
        case e: ConcurrentCommitException =>
          i += 1
          if (i > attempts) throw new IllegalStateException(
            s"$what: still conflicting after $attempts re-plans " +
              "(concurrent writer storm)", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** EXACTLY-ONCE merge — [[upsert]] with a (writerId → txnId)
    * watermark advanced by the SAME atomic commit as the merged rows
    * (the [[appendOnce]] idea for read-modify-write): a replayed or
    * lagging step whose txn is already recorded SKIPS. The skip check
    * reads the same snapshot the commit then pins as its planned
    * parent, so a rival step racing in between forces a re-plan that
    * re-checks — no double-apply window. The primitive under
    * incremental materialized-view maintenance
    * ([[graft.streaming.StreamOps.materializedAggStep]]), where
    * re-applying a delta would DOUBLE-COUNT (value idempotency does
    * not hold for folds, unlike the CDC sink's latest-per-key merge). */
  def upsertOnce(batch: DataFrame, root: String, keyCol: String,
      writerId: String, txnId: Long, maxRetries: Int = 4,
      dropKeys: Option[DataFrame] = None,
      keyedRange: Option[(Any, Any)] = None): (Long, Boolean) = {
    require(writerId.nonEmpty && !writerId.exists(c => c.isWhitespace || c == '"'),
      s"writerId must be a simple token, got [$writerId]")
    val spark = batch.sparkSession
    def done(s: Snapshot): Boolean =
      s.meta.get(txnKey(writerId)).exists(_.toLong >= txnId)
    current(spark, root).filter(done)
      .foreach(s => return (s.version, false))
    // a racer can lose the commit and find the txn recorded only at
    // re-plan time — the flag must come from the planned body, not be
    // assumed from reaching this point
    var skipped = false
    val v = retryingCommit(s"$root upsertOnce", maxRetries)(
      upsertPlanned(batch, root, keyCol,
        extraMeta = Map(txnKey(writerId) -> txnId.toString),
        skipIf = done, onSkip = () => skipped = true, drops = dropKeys,
        keyedRange = keyedRange))
    (v, !skipped)
  }

  /** CONDITIONAL MERGE — the public Delta `MERGE INTO t USING s`
    * UPDATE-SET arm, where [[upsert]] is the whole-row-replace form:
    * matched rows update ONLY the named columns, each set to a SQL
    * expression over BOTH sides (`t.<col>` = the table's current row,
    * `s.<col>` = the source row — the increment / partial-update /
    * conditional-merge shapes whole-row replace cannot express);
    * unmatched source rows insert when `insertUnmatched` (the source
    * must then carry the full table schema); `matchedDeleteSql` is the
    * WHEN MATCHED AND pred THEN DELETE arm, and
    * `notMatchedBySourceDeleteSql` the WHEN NOT MATCHED BY SOURCE AND
    * pred THEN DELETE arm — the sync-to-source shape (table rows whose
    * key the source no longer carries are retired when the predicate
    * holds; NULL = keep, the SQL 3VL rule; authored over the table's
    * logical columns, `t.` qualifier accepted; a source of just the
    * key column with `insertUnmatched = false` gives pure
    * prune-to-source). Cost follows touched files exactly like
    * [[upsert]] (stats-pruned candidates, ONE `input_file_name`
    * semi-join discovery, only matching files rewritten, everything
    * else carried by identity) — EXCEPT the not-matched-by-source arm,
    * whose rows can live anywhere: its discovery is one predicate +
    * key-anti-join scan of the table ([[replaceWhere]]'s shape, the
    * same full-scan cost the public MERGE implementations pay when
    * the clause is present), though still only files actually HOLDING
    * a deleted row are rewritten. Same atomic planned-parent commit,
    * duplicate-source-key rejection, CHECK enforcement on the written
    * rows, bounded auto-re-plan, and column-mapping resolution
    * (expressions are authored in LOGICAL names; staging maps back to
    * physical). */
  def mergeInto(source: DataFrame, root: String, keyCol: String,
      matchedSetSql: Map[String, String], insertUnmatched: Boolean = true,
      maxRetries: Int = 4, matchedDeleteSql: Option[String] = None,
      notMatchedBySourceDeleteSql: Option[String] = None): Long =
    retryingCommit(s"$root mergeInto", maxRetries)(
      mergeIntoPlanned(source, root, keyCol, matchedSetSql, insertUnmatched,
        matchedDeleteSql, notMatchedBySourceDeleteSql))

  private def mergeIntoPlanned(source: DataFrame, root: String,
      keyCol: String, matchedSetSql: Map[String, String],
      insertUnmatched: Boolean, matchedDeleteSql: Option[String],
      notMatchedBySourceDeleteSql: Option[String]): Long = {
    import org.apache.spark.sql.functions.{coalesce, expr, input_file_name, substring_index, when}
    require(matchedSetSql.nonEmpty || matchedDeleteSql.nonEmpty ||
      notMatchedBySourceDeleteSql.nonEmpty,
      "mergeInto needs at least one SET column or a delete predicate")
    require(!matchedSetSql.contains(keyCol),
      s"mergeInto cannot SET the merge key [$keyCol]")
    val spark = source.sparkSession
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val keyP = toPhysical(snap, keyCol)
    val dup = source.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"mergeInto source has duplicate $keyCol values " +
        s"(e.g. ${dup.head.get(0)}) — one row per key")
    val nullKey = source.filter(col(keyCol).isNull).limit(1).collect()
    require(nullKey.isEmpty, "mergeInto source keys must be non-null")
    // logical table columns (the expression surface)
    val tCols = logicalize(
      readFiles(spark, root, snap, snap.files.take(1)), snap).columns.toSeq
    val unknown = matchedSetSql.keys.filterNot(tCols.contains)
    require(unknown.isEmpty,
      s"mergeInto SET names unknown column(s) ${unknown.mkString(", ")} " +
        s"(table has ${tCols.mkString(", ")})")
    // touched-file discovery: stats-pruned candidates, one semi-join
    val srcKeys = source.select(col(keyCol).as(keyP)).distinct()
      .localCheckpoint(false)
    val range = srcKeys.agg(
      org.apache.spark.sql.functions.min(col(keyP)),
      org.apache.spark.sql.functions.max(col(keyP))).head()
    if (range.isNullAt(0) && notMatchedBySourceDeleteSql.isEmpty)
      return snap.version
    val candidates =
      if (range.isNullAt(0)) Seq.empty
      else prunedFiles(snap, keyP, range.get(0), range.get(1))
    val touchedByKey: Seq[String] =
      if (candidates.isEmpty) Seq.empty
      else {
        val byName = candidates.map(rel =>
          rel.substring(rel.lastIndexOf('/') + 1) -> rel).toMap
        readFiles(spark, root, snap, candidates)
          .select(col(keyP),
            substring_index(input_file_name(), "/", -1).as("__f"))
          .join(srcKeys, Seq(keyP), "left_semi")
          .select("__f").distinct().collect()
          .flatMap(r => byName.get(r.getString(0))).toSeq
      }
    // WHEN NOT MATCHED BY SOURCE THEN DELETE discovery: the arm's
    // rows can live in ANY file (absence from the source is not a
    // key-range property), so like [[replaceWhere]] it is one
    // predicate + anti-join scan over the table — the honest cost of
    // the clause (the public MERGE implementations pay the same full
    // scan when it is present); files with no such row are untouched
    val touchedNmbs: Seq[String] = notMatchedBySourceDeleteSql match {
      case None => Seq.empty
      case Some(d) =>
        val byName = snap.files.map(rel =>
          rel.substring(rel.lastIndexOf('/') + 1) -> rel).toMap
        // discovery reads THROUGH the deletion vector like the rewrite
        // side — a file whose only NMBS-matching rows are already
        // DV-deleted must not be selected and needlessly rewritten
        logicalize(applyDv(spark, root, snap,
            readFiles(spark, root, snap, snap.files)
              .withColumn("__f", substring_index(input_file_name(), "/", -1))),
          snap).alias("t")
          .join(source.select(col(keyCol)).distinct().alias("s"),
            col(s"t.$keyCol") === col(s"s.$keyCol"), "left_anti")
          .filter(coalesce(expr(d), lit(false)))
          .select("__f").distinct().collect()
          .flatMap(r => byName.get(r.getString(0))).toSeq
    }
    val touched = (touchedByKey ++ touchedNmbs).distinct
    val touchedSet = touched.toSet
    // matched rewrite: t LEFT JOIN s on the key; SET columns take
    // their expression where a source row matched, else carry
    val updated: Option[DataFrame] =
      if (touched.isEmpty) None
      else {
        val t = logicalize(applyDv(spark, root, snap,
          readFiles(spark, root, snap, touched)), snap).alias("t")
        val sSide = source.alias("s")
        val matched = col(s"s.$keyCol").isNotNull
        val joined = t.join(sSide,
          col(s"t.$keyCol") === col(s"s.$keyCol"), "left")
        // WHEN MATCHED AND <pred> THEN DELETE: the row leaves the
        // table in the same atomic rewrite (NULL predicate = keep,
        // the SQL 3VL delete-what-matches rule)
        val kept0 = matchedDeleteSql match {
          case None => joined
          case Some(d) =>
            joined.filter(!matched || !coalesce(expr(d), lit(false)))
        }
        // WHEN NOT MATCHED BY SOURCE AND <pred> THEN DELETE: same 3VL
        // rule on the complementary side of the join
        val kept = notMatchedBySourceDeleteSql match {
          case None => kept0
          case Some(d) =>
            kept0.filter(matched || !coalesce(expr(d), lit(false)))
        }
        Some(kept.select(tCols.map { c =>
          (matchedSetSql.get(c) match {
            case Some(sql) => when(matched, expr(sql)
                .cast(joined.select(col(s"t.`$c`")).schema.head.dataType))
              .otherwise(col(s"t.`$c`"))
            case None => col(s"t.`$c`")
          }).as(c)
        }: _*))
      }
    // unmatched inserts: source keys absent from every touched file
    // (an untouched file provably holds no source key)
    val inserts: Option[DataFrame] =
      if (!insertUnmatched) None
      else {
        val missing = tCols.filterNot(source.columns.contains)
        require(missing.isEmpty,
          s"mergeInto(insertUnmatched): source lacks column(s) " +
            s"${missing.mkString(", ")} of the table schema")
        // LIVE keys only: the raw file still holds DV-deleted rows,
        // and a key deleted through the vector must INSERT here (the
        // update side reads through the vector too, so without this
        // the source row would vanish instead of landing)
        val existing =
          if (touched.isEmpty) srcKeys.filter(lit(false))
          else applyDv(spark, root, snap,
              readFiles(spark, root, snap, touched))
            .select(col(keyP)).distinct()
        Some(source.select(tCols.map(c => col(s"`$c`")): _*)
          .join(existing.select(col(keyP).as(keyCol)), Seq(keyCol), "left_anti"))
      }
    val outcome = (updated, inserts) match {
      case (Some(u), Some(i)) => u.unionByName(i)
      case (Some(u), None) => u
      case (None, Some(i)) => i
      case (None, None) => return snap.version
    }
    val rewritten = physicalize(outcome, Some(snap))
    val fp = schemaFingerprint(rewritten)
    requireSchema(spark, root, fp)
    requireChecks(spark, root, rewritten)
    val staged = stage(rightSized(rewritten), root)
    val (rows, bytesM, fts) = footerMeta(spark, root, staged)
    val kept = withoutEmpty(staged, rows)
    val statCols = inheritedStatCols(snap)
    val stats = fileStats(spark, root, kept, statCols, fts)
    publish(spark, root, kept,
      old => old - DvRowsKey + (SchemaKey -> fp) + (OpKey -> "mergeInto"),
      _.files.filterNot(touchedSet), stats,
      rows.filter(kv => kept.contains(kv._1)),
      requireVersion = Some(snap.version),
      newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
  }

  /** [[upsertPlanned]]'s `drops`: keys whose rows LEAVE the table in
    * the same atomic commit the batch's rows land — MERGE's WHEN
    * MATCHED DELETE arm. Touched-file discovery and the rewrite
    * anti-join run over batch ∪ drop keys; a drop key absent from the
    * table is a no-op. The consumer this exists for: a retraction-
    * capable materialized view evicting groups whose last source row
    * was deleted (the full recompute has no such group, so the view
    * must not keep a zeroed husk). */
  private def upsertPlanned(batch: DataFrame, root: String, keyCol: String,
      extraMeta: Map[String, String] = Map.empty,
      skipIf: Snapshot => Boolean = _ => false,
      onSkip: () => Unit = () => (),
      drops: Option[DataFrame] = None,
      evolveSchema: Boolean = false,
      keyedRange: Option[(Any, Any)] = None): Long = {
    val spark = batch.sparkSession
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    // exactly-once guard: checked against the SAME snapshot the commit
    // pins via requireVersion — a racing commit forces a re-plan that
    // re-runs this check
    if (skipIf(snap)) { onSkip(); return snap.version }
    // column mapping: the batch arrives LOGICAL; everything below —
    // touched-file discovery, rewrite union, staging — runs PHYSICAL
    val batchP0 = physicalize(batch, Some(snap))
    val dropsP = drops.map(physicalize(_, Some(snap)))
    val keyP = toPhysical(snap, keyCol)
    // evolveSchema (the [[mergeBranch]] path): a batch may ADD columns
    // (or safely widen) vs the table — [[appendMerge]]'s reconcile+pad
    // applied to the upsert commit; the recorded schema evolves in the
    // SAME atomic commit, untouched files read the new columns as NULL
    // through [[readFiles]]'s recorded-schema contract
    val (batchP, schemaMeta) =
      if (!evolveSchema) (batchP0, Map.empty[String, String])
      else {
        val table = recordedSchema(snap).getOrElse(
          readFiles(spark, root, snap, snap.files.take(1)).schema)
        val merged = mergeStructs(table, batchP0.schema).getOrElse(
          throw new IllegalArgumentException(
            s"$root: upsert cannot reconcile the batch schema " +
              s"[${batchP0.schema.catalogString}] with the table schema " +
              s"[${table.catalogString}] — fields may be added or safely " +
              "widened; any other type change is an intentional rewrite"))
        val mergedN = nullableDeep(merged)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val have = batchP0.schema.fields.map(f => f.name -> f.dataType).toMap
        val padded = batchP0.select(mergedN.fields.toSeq.map(f =>
          have.get(f.name) match {
            case Some(from) => padTo(col(f.name), from, f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }): _*)
        (padded, Map(SchemaJsonKey -> mergedN.json))
      }
    val fp = schemaFingerprint(batchP)
    if (!evolveSchema) requireSchema(spark, root, fp)
    requireChecks(spark, root, batchP)
    // ONE aggregation serves the duplicate-key guard AND the key range
    // of batch ∪ drops (previously two jobs per upsert, and a THIRD
    // when drop-keys were present — on commit-dense lifecycles the
    // fixed per-job cost was the wall). Drop keys enter with weight 0:
    // they widen the range without tripping the batch-duplicate count.
    // `keyedRange` (private callers only — the matview fold, whose
    // batch is a groupBy(key) output, keys unique BY CONSTRUCTION and
    // the exact range already computed by the step's own delta
    // aggregate) skips the whole job.
    import org.apache.spark.sql.functions.{lit => flit,
      max => fmax, max_by => fmaxBy, min => fmin, sum => fsum}
    val range = keyedRange.map { case (lo, hi) =>
      org.apache.spark.sql.Row(lo, hi)
    }.getOrElse {
      val tagged = dropsP match {
        case None => batchP.select(col(keyP), flit(1L).as("__b"))
        case Some(d) => batchP.select(col(keyP), flit(1L).as("__b"))
          .unionByName(d.select(col(keyP), flit(0L).as("__b")))
      }
      val kstats = tagged.groupBy(col(keyP)).agg(fsum(col("__b")).as("__n"))
        .agg(fmin(col(keyP)).as("__lo"), fmax(col(keyP)).as("__hi"),
          fmax(col("__n")).as("__maxn"),
          fmaxBy(col(keyP), col("__n")).as("__dupk")).head()
      require(kstats.isNullAt(2) || kstats.getLong(2) <= 1L,
        s"upsert batch has duplicate $keyCol values (e.g. ${kstats.get(3)}) — " +
          "one row per key, the merge is otherwise ambiguous")
      org.apache.spark.sql.Row(kstats.get(0), kstats.get(1))
    }
    val allKeys = dropsP match {
      case None => batchP.select(col(keyP))
      case Some(d) => batchP.select(col(keyP))
        .unionByName(d.select(col(keyP))).distinct()
    }
    if (range.isNullAt(0)) return snap.version // empty batch+drops: no-op
    val candidates = prunedFiles(snap, keyP, range.get(0), range.get(1))
    val touched: Seq[String] =
      if (candidates.isEmpty) Seq.empty
      else {
        import org.apache.spark.sql.functions.{input_file_name, substring_index}
        val byName = candidates.map(rel =>
          rel.substring(rel.lastIndexOf('/') + 1) -> rel).toMap
        readFiles(spark, root, snap, candidates)
          .select(col(keyP),
            substring_index(input_file_name(), "/", -1).as("__f"))
          .join(allKeys, Seq(keyP), "left_semi")
          .select("__f").distinct().collect()
          .flatMap(r => byName.get(r.getString(0))).toSeq
      }
    val touchedSet = touched.toSet
    val rewritten =
      if (touched.isEmpty) batchP
      else applyDv(spark, root, snap, readFiles(spark, root, snap, touched))
        .join(allKeys, Seq(keyP), "left_anti")
        // rewritten old rows read under the OLD recorded schema — an
        // evolving batch's added columns fill as NULL there
        .unionByName(batchP, allowMissingColumns = evolveSchema)
    val staged = stage(rightSized(rewritten), root)
    val (rows, bytesM, fts) = footerMeta(spark, root, staged)
    val kept = withoutEmpty(staged, rows)
    val statCols = inheritedStatCols(snap)
    val stats = fileStats(spark, root, kept, statCols, fts)
    publish(spark, root, kept,
      old => old - DvRowsKey + (SchemaKey -> fp) + (OpKey -> "upsert")
        ++ schemaMeta ++ extraMeta,
      _.files.filterNot(touchedSet), stats,
      rows.filter(kv => kept.contains(kv._1)),
      requireVersion = Some(snap.version),
      newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
  }

  /** DELETE of a key range, file-pruned: only the files whose recorded
    * [min, max] intersects [lo, hi] are rewritten (minus the matching
    * rows — a fully-covered file simply vanishes from the snapshot);
    * every other file is carried through untouched. Same atomicity and
    * read-modify-write concurrency contract as [[upsert]]. */
  def deleteWhereBetween(spark: SparkSession, root: String,
      colName: String, lo: Any, hi: Any, maxRetries: Int = 4): Long =
    retryingCommit(s"$root delete", maxRetries)(
      deleteWhereBetweenPlanned(spark, root, colName, lo, hi))

  /** Stats-proven FULL coverage: every row of `f` lies in [lo, hi]
    * (recorded min/max inside the range) AND the file provably holds
    * no null-keyed rows (the `#nulls` twin — nulls survive a range
    * delete, and min/max are silent about them; files predating the
    * twin stay conservative). Such a file can be dropped from the
    * snapshot WITHOUT being read — the file-level delete that makes
    * dropping a day's partition of a 100 TB table a metadata commit. */
  private def fullyCovered(snap: Snapshot, f: String, colName: String,
      lo: Any, hi: Any): Boolean =
    snap.stats.get(f).exists { m =>
      m.get(colName).exists { case (mn, mx) =>
        cmp(mn, lo) >= 0 && cmp(mx, hi) <= 0 } &&
      m.get(colName + NullsSuffix).exists { case (n, _) =>
        String.valueOf(n) == "0" }
    }

  private def deleteWhereBetweenPlanned(spark: SparkSession, root: String,
      colName0: String, lo: Any, hi: Any): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val colName = toPhysical(snap, colName0) // raw-file row filters below
    val touched = prunedFiles(snap, colName, lo, hi)
    if (touched.isEmpty) return snap.version
    val touchedSet = touched.toSet
    // fully-covered files drop metadata-only; clipped files rewrite.
    // If the delete would empty the table, one dropped file is demoted
    // to clipped so its rewrite stages the schema-carrying empty file.
    val clipped0 = touched.filterNot(f =>
      fullyCovered(snap, f, colName, lo, hi))
    val clipped =
      if (clipped0.isEmpty && !snap.files.exists(f => !touchedSet.contains(f)))
        touched.take(1)
      else clipped0
    if (clipped.isEmpty)
      return publish(spark, root, Seq.empty,
        old => old - DvRowsKey + (OpKey -> "delete"),
        _.files.filterNot(touchedSet),
        requireVersion = Some(snap.version))._1
    val survivors = applyDv(spark, root, snap,
        readFiles(spark, root, snap, clipped))
      .filter(!(col(colName) >= lit(lo) && col(colName) <= lit(hi)) ||
        col(colName).isNull)
    val staged = stage(rightSized(survivors), root)
    val (rows, bytesM, fts) = footerMeta(spark, root, staged)
    // unlike a commit of fresh data, an all-empty rewrite publishes NO
    // files here — the untouched remainder of the table still carries
    // the schema (and a fully-emptied table keeps its newest staged
    // schema file via withoutEmpty only when nothing else remains)
    val nonEmpty = staged.filter(f => rows.getOrElse(f, 1L) > 0L)
    val kept =
      if (nonEmpty.nonEmpty || snap.files.exists(f => !touchedSet.contains(f))) nonEmpty
      else staged.take(1)
    val statCols = inheritedStatCols(snap)
    val stats = fileStats(spark, root, kept, statCols, fts)
    publish(spark, root, kept, old => old - DvRowsKey + (OpKey -> "delete"),
      _.files.filterNot(touchedSet), stats,
      rows.filter(kv => kept.contains(kv._1)),
      requireVersion = Some(snap.version),
      newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
  }

  /** Atomic REPLACE of a key range — the public Delta `replaceWhere`
    * dynamic overwrite, the backfill primitive: re-land one slab of a
    * huge table (a date partition, a key range) in ONE commit, never
    * touching the rest. Files whose recorded [min, max] intersects
    * [lo, hi] are pruned via the manifest stats; their rows OUTSIDE
    * the range are rewritten (survivors), the replacement batch lands
    * in the same staging pass, and one atomic publish swaps both — a
    * reader sees the old slab or the new slab, never neither, never
    * both (delete-then-append would expose the gap between two
    * commits). The batch must lie entirely inside [lo, hi] (loud
    * throw — the public replaceWhere contract), match the table
    * schema, and satisfy CHECK constraints. Same planned-parent
    * concurrency contract as [[upsert]] (bounded auto-re-plan). */
  def replaceWhereBetween(batch: DataFrame, root: String, colName: String,
      lo: Any, hi: Any, maxRetries: Int = 4): Long =
    retryingCommit(s"$root replaceWhere", maxRetries)(
      replaceWhereBetweenPlanned(batch, root, colName, lo, hi))

  private def replaceWhereBetweenPlanned(batch: DataFrame, root: String,
      colName0: String, lo: Any, hi: Any): Long = {
    val spark = batch.sparkSession
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    // column mapping: the batch-range guard runs on the LOGICAL batch;
    // everything against files (stats, survivors, staging) is physical
    val batchP = physicalize(batch, Some(snap))
    val colName = toPhysical(snap, colName0)
    val fp = schemaFingerprint(batchP)
    requireSchema(spark, root, fp)
    requireChecks(spark, root, batchP)
    val outside = batch.filter(col(colName0).isNull ||
      col(colName0) < lit(lo) || col(colName0) > lit(hi)).limit(1).collect()
    require(outside.isEmpty,
      s"replaceWhere batch has rows outside $colName0 in [$lo, $hi] " +
        s"(e.g. ${outside.headOption.getOrElse("")}) — the replaced range " +
        "and the replacement batch must coincide")
    val touched = prunedFiles(snap, colName, lo, hi)
    val touchedSet = touched.toSet
    // stats-proven fully-covered files drop metadata-only (see
    // [[fullyCovered]]); only clipped files are read for survivors.
    // The staged batch always carries the schema, so no demotion
    // guard is needed even when everything else vanishes.
    val clipped = touched.filterNot(f =>
      fullyCovered(snap, f, colName, lo, hi))
    val survivorsAndBatch =
      if (clipped.isEmpty) batchP
      else applyDv(spark, root, snap, readFiles(spark, root, snap, clipped))
        .filter(!(col(colName) >= lit(lo) && col(colName) <= lit(hi)) ||
          col(colName).isNull)
        .unionByName(batchP)
    val staged = stage(rightSized(survivorsAndBatch), root)
    val (rows, bytesM, fts) = footerMeta(spark, root, staged)
    // an empty batch over a fully-covered range is a pure delete: keep
    // the delete path's rule — publish no empty files unless nothing
    // else would carry the schema
    val nonEmpty = staged.filter(f => rows.getOrElse(f, 1L) > 0L)
    val kept =
      if (nonEmpty.nonEmpty || snap.files.exists(f => !touchedSet.contains(f)))
        nonEmpty
      else staged.take(1)
    val statCols = inheritedStatCols(snap)
    val stats = fileStats(spark, root, kept, statCols, fts)
    publish(spark, root, kept,
      old => old - DvRowsKey + (SchemaKey -> fp) + (OpKey -> "replaceWhere"),
      _.files.filterNot(touchedSet), stats,
      rows.filter(kv => kept.contains(kv._1)),
      requireVersion = Some(snap.version),
      newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
  }

  /** GENERAL-predicate atomic replace — [[replaceWhereBetween]]'s
    * arbitrary-predicate form (the full public `replaceWhere`
    * contract): rows satisfying `predicateSql` are swapped for the
    * batch in ONE commit. Touched-file discovery is one
    * predicate-pushdown scan (`input_file_name` distinct — parquet
    * footer/row-group stats prune what they can; the range form stays
    * the cheaper choice when the slab IS a recorded-stats range);
    * survivors are each touched file's rows where the predicate is
    * FALSE or NULL (NULL rows are not replaced — the delete-what-
    * matches rule). Every batch row must satisfy the predicate (loud
    * throw), schema + CHECK constraints enforced, planned-parent
    * auto-retry inherited. */
  def replaceWhere(batch: DataFrame, root: String, predicateSql: String,
      maxRetries: Int = 4): Long =
    retryingCommit(s"$root replaceWhere", maxRetries)(
      replaceWherePlanned(batch, root, predicateSql))

  private def replaceWherePlanned(batch: DataFrame, root: String,
      predicateSql: String): Long = {
    import org.apache.spark.sql.functions.{expr, input_file_name, substring_index}
    val spark = batch.sparkSession
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    // column mapping: the predicate is authored in LOGICAL names, so
    // it evaluates against logicalized frames (batch + corpus); the
    // staged rewrite is physicalized back for the files
    val batchP = physicalize(batch, Some(snap))
    val fp = schemaFingerprint(batchP)
    requireSchema(spark, root, fp)
    requireChecks(spark, root, batchP)
    val pred = expr(predicateSql)
    val outside = batch.filter(!pred || pred.isNull).limit(1).collect()
    require(outside.isEmpty,
      s"replaceWhere batch has rows not satisfying [$predicateSql] " +
        s"(e.g. ${outside.headOption.getOrElse("")}) — the replaced set " +
        "and the replacement batch must coincide")
    val byName = snap.files.map(rel =>
      rel.substring(rel.lastIndexOf('/') + 1) -> rel).toMap
    val touched = logicalize(readFiles(spark, root, snap, snap.files)
        .withColumn("__f", substring_index(input_file_name(), "/", -1)), snap)
      .filter(pred)
      .select("__f")
      .distinct().collect()
      .flatMap(r => byName.get(r.getString(0))).toSeq
    val touchedSet = touched.toSet
    val survivorsAndBatch =
      if (touched.isEmpty) batchP
      else physicalize(
        logicalize(applyDv(spark, root, snap,
            readFiles(spark, root, snap, touched)), snap)
          .filter(!pred || pred.isNull), Some(snap))
        .unionByName(batchP)
    val staged = stage(rightSized(survivorsAndBatch), root)
    val (rows, bytesM, fts) = footerMeta(spark, root, staged)
    val nonEmpty = staged.filter(f => rows.getOrElse(f, 1L) > 0L)
    val kept =
      if (nonEmpty.nonEmpty || snap.files.exists(f => !touchedSet.contains(f)))
        nonEmpty
      else staged.take(1)
    val statCols = inheritedStatCols(snap)
    val stats = fileStats(spark, root, kept, statCols, fts)
    publish(spark, root, kept,
      old => old - DvRowsKey + (SchemaKey -> fp) + (OpKey -> "replaceWhere"),
      _.files.filterNot(touchedSet), stats,
      rows.filter(kv => kept.contains(kv._1)),
      requireVersion = Some(snap.version),
      newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
  }

  /** DELETE as a DELETION VECTOR — the public Delta DV idea: record
    * the matching rows' (file, row index) pairs in a side parquet file
    * and commit only a metadata pointer — ZERO data files rewritten,
    * so at 1 GB files deleting 100 rows no longer rewrites a gigabyte
    * ([[deleteWhereBetween]] is the rewrite form). Every reader
    * anti-joins the vector out at the [[readSnapshot]] choke point;
    * the next [[compact]]/[[compactClustered]] APPLIES it (they read
    * through the vector) and clears the pointer. The trade, stated:
    * reads pay one anti-join until that compaction, and
    * [[rowCount]]/[[countRows]] fall back to a scan while a vector is
    * outstanding. Candidate files are stats-pruned; vectors accumulate
    * across deletes (entries for files later rewritten by
    * upsert/delete are stale-but-harmless — the join is keyed by file
    * — and are dropped at the next DV write). Same planned-parent
    * concurrency contract as [[upsert]]. */
  def deleteWhereBetweenDv(spark: SparkSession, root: String,
      colName: String, lo: Any, hi: Any, maxRetries: Int = 4): Long =
    retryingCommit(s"$root deleteDv", maxRetries)(
      deleteWhereBetweenDvPlanned(spark, root, colName, lo, hi))

  private def deleteWhereBetweenDvPlanned(spark: SparkSession, root: String,
      colName0: String, lo: Any, hi: Any): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val colName = toPhysical(snap, colName0) // raw-file row filter below
    val candidates = prunedFiles(snap, colName, lo, hi)
    if (candidates.isEmpty) return snap.version
    import org.apache.spark.sql.functions.expr
    val cand = readFiles(spark, root, snap, candidates)
      .withColumn("__graft_f",
        expr("substring_index(_metadata.file_path, '/data/', -1)"))
      .withColumn("__graft_ri", expr("_metadata.row_index"))
    val newDel = cand
      .filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
      .select(col("__graft_f").as("f"), col("__graft_ri").as("ri"))
    publishDvDelete(spark, root, snap, newDel)
  }

  /** [[deleteWhereBetweenDv]] for a GENERAL SQL predicate — DELETE
    * WHERE pred as a pure metadata commit: ONE predicate scan over the
    * table collects the matching rows' (file, row index) pairs into
    * the deletion vector; zero data files rewritten. The predicate is
    * authored in LOGICAL column names (column mapping resolves) and
    * follows SQL 3VL — only rows where it is TRUE are deleted, NULL
    * keeps. Same vector accumulation, dedup, live-count recording, and
    * planned-parent concurrency contract as the range form — which
    * stays the cheaper choice when the predicate IS a recorded-stats
    * range (its candidate scan is file-pruned; arbitrary SQL cannot
    * prune, the cost every public format pays for DELETE WHERE). */
  def deleteWhereDv(spark: SparkSession, root: String,
      predicateSql: String, maxRetries: Int = 4): Long =
    retryingCommit(s"$root deleteDv", maxRetries)(
      deleteWhereDvPlanned(spark, root, predicateSql))

  private def deleteWhereDvPlanned(spark: SparkSession, root: String,
      predicateSql: String): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    if (snap.files.isEmpty) return snap.version
    import org.apache.spark.sql.functions.{coalesce, expr}
    val cand = logicalize(readFiles(spark, root, snap, snap.files)
        .withColumn("__graft_f",
          expr("substring_index(_metadata.file_path, '/data/', -1)"))
        .withColumn("__graft_ri", expr("_metadata.row_index")), snap)
    val newDel = cand
      .filter(coalesce(expr(predicateSql), lit(false)))
      .select(col("__graft_f").as("f"), col("__graft_ri").as("ri"))
    publishDvDelete(spark, root, snap, newDel)
  }

  /** Shared tail of the DV delete forms: fold the new (f, ri) pairs
    * into the outstanding vector (stale entries for no-longer-live
    * files dropped), dedup — an overlapping earlier delete re-derives
    * the same pairs from the raw candidate read, and the recorded live
    * count must not double them — write the vector sidecar, commit the
    * pointer. No-op (current version) when nothing matched. */
  private def publishDvDelete(spark: SparkSession, root: String,
      snap: Snapshot, newDel0: DataFrame): Long = {
    // materialize the candidate scan ONCE: the emptiness probe and the
    // vector fold below must not each pay a full predicate table scan
    val newDel = newDel0.localCheckpoint()
    try publishDvDeleteStaged(spark, root, snap, newDel)
    finally { newDel.unpersist(); () }
  }

  private def publishDvDeleteStaged(spark: SparkSession, root: String,
      snap: Snapshot, newDel: DataFrame): Long = {
    if (newDel.isEmpty) return snap.version // nothing matched: no commit
    val liveFiles = snap.files.map(dvName).toSet
    val combined = dvFrame(spark, root, snap) match {
      case None => newDel
      case Some(old) => // drop stale entries for files no longer live
        old.filter(col("f").isInCollection(liveFiles)).unionByName(newDel)
    }
    val staged = combined.distinct().localCheckpoint()
    try {
      val nDeleted = staged.count()
      if (nDeleted == 0L) return snap.version // nothing matched
      val rel = s"dv/dv-${java.util.UUID.randomUUID().toString.replace("-", "")}"
      staged.coalesce(1).write.parquet(new Path(root, rel).toString)
      publish(spark, root, Seq.empty,
        old => old + (DvKey -> rel) + (DvRowsKey -> nDeleted.toString) +
          (OpKey -> "deleteDv"), _.files,
        requireVersion = Some(snap.version))._1
    } finally { staged.unpersist(); () }
  }

  /** Reader-safe small-file compaction: read current, rewrite into
    * ~targetBytes files, publish as an overwrite carrying the same
    * metadata. Readers pinned to older snapshots keep their files
    * (until [[gc]]); new readers see the compacted snapshot. */
  /** PARTIAL compaction — the 100 TB steady-state form: bin-pack ONLY
    * the files smaller than `smallBytes` into ~targetBytes files and
    * carry every large file by IDENTITY (stats, row counts, byte sizes
    * untouched). [[compact]] rewrites the whole table — O(table) work
    * a standing admit loop cannot pay every maintenance cycle; this is
    * O(small files), which is what the loop actually produces. Uses
    * the manifest's recorded byte sizes (no status RPCs; a
    * pre-size-recording file counts as small once, getting it sized).
    * The deletion vector is PRESERVED, not applied: entries for
    * rewritten small files go stale-but-harmless (the rewrite read
    * goes through the vector), entries for carried files are still
    * load-bearing — only the full [[compact]] clears the pointer.
    * Returns the new version, or the current one when fewer than two
    * small files exist (nothing to pack). */
  def compactSmall(spark: SparkSession, root: String,
      smallBytes: Long = 8L * 1024 * 1024,
      targetBytes: Long = 128L * 1024 * 1024,
      rangeBy: Seq[String] = Nil): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val small = snap.files.filter(f => snap.bytes.get(f).forall(_ < smallBytes))
    if (small.size < 2) return snap.version
    val smallSet = small.toSet
    val df = applyDv(spark, root, snap, readFiles(spark, root, snap, small))
    val rangeByP = rangeBy.map(toPhysical(snap, _))
    val bytes = small.flatMap(snap.bytes.get).sum.max(1L)
    val target = ((bytes + targetBytes - 1) / targetBytes).max(1).min(1L << 20).toInt
    val repart =
      if (rangeByP.nonEmpty) df.repartitionByRange(target, rangeByP.map(col): _*)
      else df.repartition(target)
    val staged = repart.localCheckpoint()
    try {
      val stagedFiles = stage(staged, root)
      val (rows, bytesM, fts) = footerMeta(spark, root, stagedFiles)
      val kept = withoutEmpty(stagedFiles, rows)
      val statCols = inheritedStatCols(snap)
      val stats = fileStats(spark, root, kept, statCols, fts)
      publish(spark, root, kept,
        old => old - DvRowsKey + (OpKey -> "compactSmall"),
        _.files.filterNot(smallSet), stats,
        rows.filter(kv => kept.contains(kv._1)),
        requireVersion = Some(snap.version),
        newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
    } finally { staged.unpersist(); () }
  }

  def compact(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024,
      rangeBy: Seq[String] = Nil): Long = {
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val df = readSnapshotRaw(spark, root, snap)
    val rangeByP = rangeBy.map(toPhysical(snap, _))
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
      if (rangeByP.nonEmpty) df.repartitionByRange(target, rangeByP.map(col): _*)
      else df.repartition(target)
    val staged = repart.localCheckpoint()
    try {
      val stagedFiles = stage(staged, root)
      val (rows, bytesM, fts) = footerMeta(spark, root, stagedFiles)
      val kept = withoutEmpty(stagedFiles, rows)
      // the skip index survives compaction: recompute stats for every
      // column any pre-compaction file carried stats for
      val statCols = inheritedStatCols(snap)
      val stats = fileStats(spark, root, kept, statCols, fts)
      // a clean rewrite APPLIES any outstanding deletion vector (the
      // read above went through it) — clear the pointer
      publish(spark, root, kept,
        old => old - DvKey - DvRowsKey + (OpKey -> "compact"),
        _ => Seq.empty, stats, rows.filter(kv => kept.contains(kv._1)),
        newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
    } finally { staged.unpersist(); () }
  }

  /** MULTI-COLUMN clustered compaction — the public OPTIMIZE ZORDER BY:
    * rewrite the table along a space-filling curve over `cols`
    * ([[Layout.cluster]]; `curve` = "z" any-k or "hilbert" 2-D) so
    * EVERY layout column's per-file [min, max] box is tight and the
    * skip index prunes on all of them at once — where
    * [[compact]](rangeBy=…) is lexicographic and only the leading
    * column stays sharp. Stats are recorded for `cols` plus whatever
    * the table already indexed; same reader-safe overwrite publish as
    * [[compact]]. */
  def compactClustered(spark: SparkSession, root: String, cols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024,
      bits: Int = 8, curve: String = "z"): Long = {
    require(cols.nonEmpty, "compactClustered needs at least one layout column")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val df = readSnapshotRaw(spark, root, snap)
    val colsP = cols.map(toPhysical(snap, _))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = ((bytes + targetBytes - 1) / targetBytes).max(1).min(1L << 20).toInt
    val staged = Layout.cluster(df, Layout.mixedBoundariesFor(df, colsP, bits),
      target, bits, curve).localCheckpoint()
    try {
      val stagedFiles = stage(staged, root)
      val (rows, bytesM, fts) = footerMeta(spark, root, stagedFiles)
      val kept = withoutEmpty(stagedFiles, rows)
      val statCols = (inheritedStatCols(snap) ++ colsP).distinct
      // the whole table becomes ONE stable cube — the provenance
      // baseline [[compactClusteredIncremental]] builds on
      val stats = stampCube(kept, fileStats(spark, root, kept, statCols, fts),
        java.util.UUID.randomUUID().toString)
      // a clean rewrite APPLIES any outstanding deletion vector (the
      // read above went through it) — clear the pointer
      publish(spark, root, kept,
        old => old - DvKey - DvRowsKey + (OpKey -> "compact"),
        _ => Seq.empty, stats, rows.filter(kv => kept.contains(kv._1)),
        newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
    } finally { staged.unpersist(); () }
  }

  /** Reserved PSEUDO-STAT key: ZCube provenance (the public Delta
    * OPTIMIZE ZORDER design) — files written by a clustering pass carry
    * their cube id as a degenerate (id, id) stats entry, so provenance
    * rides the existing per-file stats map with no format change. The
    * key never names a data column (readers prune by query-attribute
    * lookup, which can't match it) and is excluded from every
    * stat-recompute list ([[inheritedStatCols]]). A file rewritten by
    * any non-clustering commit (upsert, compact, compactSmall) loses
    * the marker — correct, since the rewrite destroyed its layout. */
  val ZCubeStatKey = "__zcube"

  /** Stat columns to RECOMPUTE on a file-rewriting commit: every data
    * column any current file indexes, excluding reserved pseudo-stats
    * (leading `__`) — those are provenance, not data. */
  private def inheritedStatCols(snap: Snapshot): Seq[String] =
    snap.stats.values.flatMap(_.keys).toSeq.distinct.filterNot(_.startsWith("__"))

  /** Stamp every kept file's stats with a cube id (creating entries
    * for stats-less files, so provenance never silently drops). */
  private def stampCube(kept: Seq[String],
      stats: Map[String, Map[String, (Any, Any)]], cube: String)
      : Map[String, Map[String, (Any, Any)]] =
    kept.map(f => f ->
      (stats.getOrElse(f, Map.empty[String, (Any, Any)]) +
        (ZCubeStatKey -> ((cube: Any, cube: Any))))).toMap

  /** Outcome of [[compactClusteredIncremental]] — the bench-visible
    * accounting of what the incremental pass actually paid. */
  final case class ClusterIncResult(version: Long, rewrittenFiles: Int,
      carriedFiles: Int, rewrittenBytes: Long, carriedBytes: Long)

  /** INCREMENTAL clustered compaction — the liquid-clustering stance:
    * [[compactClustered]] is O(table) per invocation (q161's measured
    * cost), which a standing ingest loop cannot pay every cycle. Files
    * are partitioned by ZCube PROVENANCE (the public Delta OPTIMIZE
    * design — [[ZCubeStatKey]]):
    *
    *  - files a previous clustering pass wrote (marked) are STABLE —
    *    carried by identity, never re-selected — unless their whole
    *    cube totals under `cubeMinBytes`, in which case the cube
    *    DISSOLVES into the selection to merge with new material
    *    (and only when there IS new material or a second undersized
    *    cube — a lone fragment cube rewriting itself forever would be
    *    pure churn), or the cube sits in a CROSS-GENERATION stack:
    *    more than `overlapDegree` cubes covering one primary-column
    *    point (under [[cmp]], so string-primary layouts participate)
    *    merge into one cube, excluding any cube heavier than
    *    `cubeStackFactor` x the lightest covering cube in BYTES —
    *    rewrite cost IS bytes, so a settled base never pays O(table)
    *    for an additive one-probe saving, and the same exclusion
    *    finalizes merged generations, keeping each byte's lifetime
    *    rewrites O(log);
    *  - unmarked files (plain appends since the last pass) are
    *    selected when they POLLUTE the skip index: normalized
    *    [min, max] box volume over `cols` above `volumeFactor` times
    *    the ideal per-file share (1/#files — what a curve tile covers,
    *    up to curve slack), stats missing on a layout column, or —
    *    the DENSITY rule — their primary-column interval sits in a
    *    stack of more than `overlapDegree` unmarked intervals (N
    *    same-box appends each pass the volume test, yet a point probe
    *    there opens all N; the stabbing-depth sweep catches what
    *    volume alone cannot). A pre-sorted append with a tight,
    *    UNCONTESTED box stays carried.
    *
    * Selected rows are re-clustered along the curve into ~`targetBytes`
    * files with boundaries derived from THEM (each new file's box is
    * tight in absolute value space — grid agreement across passes is
    * not needed) and stamped as one new cube. Cost is O(selected) per
    * pass, each byte rewritten O(log(cubeMinBytes/batch)) times across
    * its lifetime — the LSM amortization. Pruning quality is within
    * the curve slack of a full rewrite (MEASURED in BENCH_SCALE's
    * incremental-clustering campaign, pinned by ManifestSpec).
    *
    * The deletion vector is PRESERVED like [[compactSmall]]: rewritten
    * files read through it (their entries go stale-but-harmless),
    * carried files' entries stay load-bearing — only the full
    * [[compact]]/[[compactClustered]] clears the pointer. Commit is
    * pinned to the planned snapshot (concurrent appends throw
    * [[ConcurrentCommitException]] — retry). Returns the accounting;
    * `version` is unchanged when nothing needed rewriting. */
  def compactClusteredIncremental(spark: SparkSession, root: String,
      cols: Seq[String], targetBytes: Long = 128L * 1024 * 1024,
      bits: Int = 8, curve: String = "z", volumeFactor: Double = 4.0,
      cubeMinBytes: Long = 16L * 1024 * 1024,
      overlapDegree: Int = 8,
      cubeStackFactor: Double = 4.0): ClusterIncResult = {
    require(cols.nonEmpty,
      "compactClusteredIncremental needs at least one layout column")
    require(volumeFactor > 0, s"volumeFactor must be positive ($volumeFactor)")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val colsP = cols.map(toPhysical(snap, _))
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    def cubeOf(f: String): Option[String] =
      snap.stats.get(f).flatMap(_.get(ZCubeStatKey)).map(_._1.toString)
    val (marked, unmarked) = snap.files.partition(cubeOf(_).isDefined)
    // per-file numeric box on every layout column (None = can't prune)
    val boxes: Map[String, Option[Seq[(Double, Double)]]] =
      unmarked.map { f =>
        val box = colsP.map { c =>
          snap.stats.get(f).flatMap(_.get(c)).flatMap { case (mn, mx) =>
            for (a <- num(mn); b <- num(mx)) yield (a, b)
          }
        }
        f -> (if (box.forall(_.isDefined)) Some(box.map(_.get)) else None)
      }.toMap
    // global extent per column over EVERY file's recorded stats
    val globals = colsP.map { c =>
      val known = snap.files.flatMap(f =>
        snap.stats.get(f).flatMap(_.get(c)).flatMap { case (mn, mx) =>
          for (a <- num(mn); b <- num(mx)) yield (a, b)
        })
      if (known.isEmpty) (0.0, 0.0)
      else (known.map(_._1).min, known.map(_._2).max)
    }
    val ideal = 1.0 / math.max(snap.files.size, 1)
    // capped at 1/2: a file covering more than half the key space is a
    // polluter at ANY file count (volumeFactor/F alone exceeds 1 for
    // tiny F, which would exempt full-space appends on small tables)
    val thresh = math.min(volumeFactor * ideal, 0.5)
    val volumeSel = unmarked.filter { f =>
      boxes(f) match {
        case None => true // stats-blind file: rewrite to gain a box
        case Some(box) =>
          val vol = box.zip(globals).map { case ((lo, hi), (glo, ghi)) =>
            val extent = ghi - glo
            if (extent <= 0) 1.0 else ((hi - lo) / extent).min(1.0).max(0.0)
          }.product
          vol > thresh
      }
    }
    // DENSITY rule: volume alone misses same-box STACKING — N tight
    // appends over one key region each pass the volume test
    // individually, yet a point probe in that region must open all N
    // files forever. Sweep the PRIMARY layout column's per-file
    // [lo, hi] intervals for stabbing depth (O(U log U) over this
    // pass's unmarked backlog, driver-side over metadata already in
    // hand): any file whose interval covers a point where more than
    // `overlapDegree` unmarked intervals stack is selected, so the
    // stack merges into one cube with disjoint curve tiles. Depth at
    // point p = #{lo_i <= p} − #{hi_i < p}; depth maxima occur at
    // interval starts, so sweeping the lo values finds every hot
    // point. overlapDegree <= 0 disables the rule.
    def countLe(a: Array[Double], p: Double): Int = {
      // upper bound: #elements <= p
      var l = 0; var r = a.length
      while (l < r) { val m = (l + r) >>> 1; if (a(m) <= p) l = m + 1 else r = m }
      l
    }
    def countLt(a: Array[Double], p: Double): Int = {
      var l = 0; var r = a.length
      while (l < r) { val m = (l + r) >>> 1; if (a(m) < p) l = m + 1 else r = m }
      l
    }
    val overlapSel: Seq[String] =
      if (overlapDegree <= 0) Seq.empty
      else {
        val prim = unmarked.flatMap(f =>
          boxes(f).flatMap(_.headOption.map { case (lo, hi) => (f, lo, hi) }))
        if (prim.size <= overlapDegree) Seq.empty
        else {
          val los = prim.map(_._2).sorted.toArray
          val his = prim.map(_._3).sorted.toArray
          val hot = los.distinct.filter(p =>
            countLe(los, p) - countLt(his, p) > overlapDegree)
          if (hot.isEmpty) Seq.empty
          else prim.collect { case (f, lo, hi)
            // hot is sorted (sorted los stay sorted through distinct):
            // any hot point inside [lo, hi] ⇔ the first hot >= lo is <= hi
            if countLt(hot, lo) < hot.length && hot(countLt(hot, lo)) <= hi => f }
        }
      }
    val byCube = marked.groupBy(f => cubeOf(f).get)
    // CROSS-GENERATION density: the sweep above sees only unmarked
    // appends, so N maintenance passes over one hot key range would
    // leave N stacked cube GENERATIONS that never re-merge — each
    // generation internally tight, yet a point probe there opens one
    // file per generation forever. Sweep CUBE intervals the same way:
    // one unit per cube spanning its whole primary extent (intra-cube
    // overlap is the curve's tiling, not stacking — per-file counting
    // would re-select a fresh multi-column cube forever). Intervals
    // compare under [[cmp]] — the SAME total order the stats prune
    // with — so string-primary layouts (lang/source/status, the
    // common curation keys) stack-merge exactly like numeric ones.
    // Where more than `overlapDegree` cubes stack, the covering cubes
    // merge into one — EXCEPT cubes whose BYTES dwarf the lightest
    // covering cube (> cubeStackFactor x): rewrite cost is bytes, so
    // merging a settled base cube into a hot corner would pay
    // O(table) for an additive one-probe saving. The exclusion also
    // FINALIZES merged generations naturally: once the union cube far
    // outweighs the fresh stacks landing on it, it stops re-merging,
    // so each byte still moves only O(log) times up the generations —
    // the LSM shape, no extra parameter for "final".
    val cubeSel: Seq[String] =
      if (overlapDegree <= 0 || byCube.size <= overlapDegree) Seq.empty
      else {
        val cubes = byCube.toSeq.flatMap { case (id, fs) =>
          val ivs = fs.flatMap(f =>
            snap.stats.get(f).flatMap(_.get(colsP.head)))
          if (ivs.isEmpty) None
          else Some((id, fs,
            ivs.map(_._1).reduce((a, b) => if (cmp(a, b) <= 0) a else b),
            ivs.map(_._2).reduce((a, b) => if (cmp(a, b) >= 0) a else b)))
        }
        if (cubes.size <= overlapDegree) Seq.empty
        else {
          val ord = new Ordering[Any] { def compare(a: Any, b: Any) = cmp(a, b) }
          def countLeA(a: Array[Any], p: Any): Int = {
            var l = 0; var r = a.length
            while (l < r) { val m = (l + r) >>> 1; if (cmp(a(m), p) <= 0) l = m + 1 else r = m }
            l
          }
          def countLtA(a: Array[Any], p: Any): Int = {
            var l = 0; var r = a.length
            while (l < r) { val m = (l + r) >>> 1; if (cmp(a(m), p) < 0) l = m + 1 else r = m }
            l
          }
          val los: Array[Any] = cubes.map(_._3).sorted(ord).toArray
          val his: Array[Any] = cubes.map(_._4).sorted(ord).toArray
          val hot = los.distinct.filter(p =>
            countLeA(los, p) - countLtA(his, p) > overlapDegree)
          if (hot.isEmpty) Seq.empty
          else {
            def bytesOf(fs: Seq[String]): Long = fs.flatMap(snap.bytes.get).sum
            val ids = scala.collection.mutable.LinkedHashSet[String]()
            hot.foreach { p =>
              val covering = cubes.filter(c =>
                cmp(c._3, p) <= 0 && cmp(p, c._4) <= 0)
              val weights = covering.map(c => bytesOf(c._2)).filter(_ > 0)
              val minB = if (weights.isEmpty) 0L else weights.min
              // no byte stats at all for this hot point: the
              // cubeStackFactor exclusion cannot run, and selecting
              // everything would pull an arbitrarily heavy settled base
              // into an O(table) rewrite — skip the point instead
              // (stats-free cubes are synthetic/test-only; real commits
              // record footer bytes)
              if (minB > 0L) covering.foreach { c =>
                if (bytesOf(c._2) <= cubeStackFactor * minB) ids += c._1
              }
            }
            cubes.filter(c => ids(c._1)).flatMap(_._2)
          }
        }
      }
    // churn guard: a cube-stack merge needs a PARTNER — a selection
    // that is exactly one whole cube and nothing else would re-tile
    // the same bytes for no depth gain
    val cubeSelEff =
      if (cubeSel.nonEmpty && (volumeSel ++ overlapSel).isEmpty &&
          cubeSel.flatMap(cubeOf(_)).distinct.size == 1) Seq.empty
      else cubeSel
    val unmarkedSel = (volumeSel ++ overlapSel ++ cubeSelEff).distinct
    // undersized cubes dissolve — but only into a merge that has other
    // material (fresh selection or a sibling fragment cube)
    val undersized = byCube.filter { case (_, fs) =>
      fs.flatMap(snap.bytes.get).sum < cubeMinBytes
    }
    val dissolving =
      if (unmarkedSel.nonEmpty || undersized.size >= 2)
        undersized.values.flatten.toSeq
      else Seq.empty
    // distinct: a stack-selected cube can ALSO be undersized — a
    // duplicated file entry would double-read its rows
    val selected = (unmarkedSel ++ dissolving).distinct
    val carried = snap.files.size - selected.size
    val carriedB = (snap.files.toSet -- selected)
      .toSeq.flatMap(snap.bytes.get).sum
    if (selected.isEmpty)
      return ClusterIncResult(snap.version, 0, carried, 0L, carriedB)
    val selectedSet = selected.toSet
    val selBytes = selected.flatMap(snap.bytes.get).sum.max(1L)
    val df = applyDv(spark, root, snap, readFiles(spark, root, snap, selected))
    val target = ((selBytes + targetBytes - 1) / targetBytes)
      .max(1).min(1L << 20).toInt
    val staged = Layout.cluster(df, Layout.mixedBoundariesFor(df, colsP, bits),
      target, bits, curve).localCheckpoint()
    try {
      val stagedFiles = stage(staged, root)
      val (rows, bytesM, fts) = footerMeta(spark, root, stagedFiles)
      val kept = withoutEmpty(stagedFiles, rows)
      val statCols = (inheritedStatCols(snap) ++ colsP).distinct
      val stats = stampCube(kept, fileStats(spark, root, kept, statCols, fts),
        java.util.UUID.randomUUID().toString)
      val v = publish(spark, root, kept,
        old => old - DvRowsKey + (OpKey -> "compactClusteredInc"),
        _.files.filterNot(selectedSet), stats,
        rows.filter(kv => kept.contains(kv._1)),
        requireVersion = Some(snap.version),
        newBytes = bytesM.filter(kv => kept.contains(kv._1)))._1
      ClusterIncResult(v, selected.size, carried, selBytes, carriedB)
    } finally { staged.unpersist(); () }
  }

  /** Multi-predicate skip read: files pruned by EVERY conjunct's
    * recorded [min, max] (a file survives only if each predicate's
    * range intersects its box), the conjunction re-applied to rows —
    * the read shape [[compactClustered]] makes fast on all layout
    * columns at once. */
  def readWhere(spark: SparkSession, root: String,
      preds: Seq[(String, Any, Any)]): DataFrame = {
    require(preds.nonEmpty, "readWhere needs at least one (col, lo, hi) conjunct")
    val snap = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    val keep = preds.foldLeft(snap.files) { case (files, (c, lo, hi)) =>
      val surviving = prunedFiles(snap.copy(files = files),
        toPhysical(snap, c), lo, hi)
      surviving
    }
    val base =
      if (keep.isEmpty)
        readSnapshot(spark, root, snap.copy(files = snap.files.take(1)))
          .filter(lit(false))
      else readSnapshot(spark, root, snap.copy(files = keep))
    preds.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }

  /** The manifest table as a PLANNER-INTEGRATED scan
    * ([[ManifestFileIndex]] under Spark's own `HadoopFsRelation` +
    * `ParquetFileFormat` — the public Delta architecture): ANY filter
    * a DataFrame/SQL query pushes down prunes files through the
    * manifest's recorded per-file stats at scan-planning time, and
    * the read itself is stock vectorized parquet inside whole-stage
    * codegen, with the same predicates pushed further into footers and
    * row groups. [[read]] is the plain snapshot scan (all files);
    * `table` is what a catalog would hand a query engine. Pinned to
    * the current snapshot at call time. */
  def table(spark: SparkSession, root: String): DataFrame =
    tableSnapshot(spark, root, current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version")))

  /** TIME-TRAVEL twin of [[table]]: the planner-integrated scan of a
    * PAST version — skip pruning, vectorized reads, and that version's
    * deletion vector all included. Valid while the version is within
    * [[gc]] retention, like every pinned-snapshot read. */
  def tableAsOf(spark: SparkSession, root: String, version: Long): DataFrame =
    tableSnapshot(spark, root, snapshot(spark, root, version))

  /** The newest retained version whose commit time ([[CommitTimeKey]],
    * stamped at publish) is ≤ `millis` — the public TIMESTAMP AS OF
    * resolution. Versions predating commit-time stamping are skipped;
    * a timestamp before every stamped commit throws (the table did not
    * exist yet, as far as time travel can prove). */
  def versionAsOfTimestamp(spark: SparkSession, root: String,
      millis: Long): Long = {
    val hit = versions(spark, root).reverse.iterator
      .map(v => v -> snapshot(spark, root, v).meta.get(CommitTimeKey))
      .collectFirst { case (v, Some(t)) if t.toLong <= millis => v }
    hit.getOrElse(throw new IllegalArgumentException(
      s"$root: no retained commit at or before $millis " +
        "(gc retention passed, or the table is younger)"))
  }

  /** `TIMESTAMP AS OF` — [[tableAsOf]] resolved through the commit
    * clock. */
  def tableAsOfTimestamp(spark: SparkSession, root: String,
      millis: Long): DataFrame =
    tableAsOf(spark, root, versionAsOfTimestamp(spark, root, millis))

  private def tableSnapshot(spark: SparkSession, root: String,
      snap: Snapshot): DataFrame = {
    require(snap.files.nonEmpty,
      s"$root version ${snap.version} is an empty snapshot — nothing to read")
    val index = new ManifestFileIndex(spark, root, snap)
    val schema = recordedSchema(snap).getOrElse(
      fileSchema(spark, root, snap.files.head))
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, new org.apache.spark.sql.types.StructType(), schema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      Map.empty[String, String])(spark)
    // outstanding deletion vector: same anti-join wrap as readSnapshot
    // (the FileIndex prunes files underneath either way). Column
    // mapping resolves LAST: the projection's aliases sit above the
    // physical scan, so pushed filters rewrite through them into
    // physical attributes — exactly what the stats prune against.
    logicalize(
      applyDv(spark, root, snap, spark.baseRelationToDataFrame(relation)),
      snap)
  }

  /** The table's commit history as a frame — the public DESCRIBE
    * HISTORY: one row per RETAINED version (gc trims the left edge),
    * newest first, with the operation that produced it ([[OpKey]],
    * stamped fresh per commit), file/row/byte totals from the
    * manifest alone (no data scan; `n_rows` is null for versions
    * predating row counts or carrying a deletion vector), and the
    * schema fingerprint. Driver-side manifest reads only. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(spark, root).map { v =>
      val s = snapshot(spark, root, v)
      (v, s.meta.getOrElse(OpKey, null), s.files.size.toLong,
        rowCount(s).map(Long.box).orNull.asInstanceOf[java.lang.Long],
        if (s.files.forall(s.bytes.contains)) Long.box(s.files.map(s.bytes).sum)
        else null.asInstanceOf[java.lang.Long],
        s.meta.contains(DvKey), s.meta.getOrElse(SchemaKey, null),
        s.meta.get(CommitTimeKey).map(t => Long.box(t.toLong))
          .orNull.asInstanceOf[java.lang.Long])
    }.sortBy(-_._1)
      .toDF("version", "operation", "n_files", "n_rows", "n_bytes",
        "has_deletion_vector", "schema", "commit_time_ms")
  }

  /** ZERO-COPY shallow clone — the public Delta SHALLOW CLONE: publish
    * `dstRoot`'s first version as a manifest referencing the SOURCE's
    * current data files by ABSOLUTE path. No data bytes move; stats,
    * row counts, schema fingerprint, and any outstanding deletion
    * vector carry over (the DV pointer is made absolute too). Every
    * subsequent mutation is COPY-ON-WRITE into the clone's own data
    * dir: appends stage locally, upsert/delete rewrite only their
    * touched files locally (source untouched), and a [[compact]] fully
    * materializes the clone, cutting the last tie to the source.
    *
    * The caveat is the public one, stated not hidden: [[gc]] on the
    * SOURCE does not know about clones — sweeping a source version a
    * clone still references breaks the clone. Keep clone lifetimes
    * inside source retention, or compact the clone to materialize. */
  def shallowClone(spark: SparkSession, srcRoot: String, dstRoot: String,
      extraMeta: Map[String, String] = Map.empty): Long = {
    val snap = current(spark, srcRoot).getOrElse(
      throw new IllegalArgumentException(s"$srcRoot has no committed version"))
    require(current(spark, dstRoot).isEmpty,
      s"$dstRoot already has a committed version — clone targets a fresh root")
    def abs(rel: String): String = new Path(dataDir(srcRoot), rel).toString
    val files = snap.files.map(abs)
    val rename = snap.files.zip(files).toMap
    // sidecar pointers resolve against the CLONE root after this —
    // absolutize the deletion vector AND every bloom pointer (a
    // relative bloom pointer would dangle and crash the clone's first
    // point lookup)
    val meta = snap.meta.map {
      case (DvKey, rel) => DvKey -> new Path(srcRoot, rel).toString
      case (k, rel) if k.startsWith(BloomKeyPrefix) =>
        k -> new Path(srcRoot, rel).toString
      case kv => kv
    }
    publish(spark, dstRoot, files,
      _ => meta ++ extraMeta + (OpKey -> "clone"), _ => Seq.empty,
      snap.stats.map { case (k, v) => rename(k) -> v },
      snap.rows.map { case (k, v) => rename(k) -> v },
      newBytes = snap.bytes.map { case (k, v) => rename(k) -> v })._1
  }

  // ------------------------------------------------------------------ //
  // NAMED MUTABLE BRANCHES — the public Iceberg ref surface beside the  //
  // immutable tags: a branch is an IN-ROOT shallow clone living under   //
  // `<root>/refs/<name>`, which makes it a full manifest root of its    //
  // own — EVERY existing write path (append/upsert/merge/deletes/       //
  // replaceWhere/compactions/matviews/ANN builds) works on a branch by  //
  // addressing [[branchRoot]], no per-op ref plumbing. Branch-local     //
  // commits stage copy-on-write into the branch's own data dir; carried //
  // parent files are referenced absolutely (the clone contract). The    //
  // parent's [[gc]] walks every branch ref and keeps parent bytes any   //
  // branch manifest still pins (unlike a detached clone, a branch is a  //
  // REF the parent honors); a branch's own gc sweeps only its local     //
  // debris. [[publishBranch]] is the write-audit-publish terminal step: //
  // fast-forward main to the branch head in one atomic commit.          //
  // ------------------------------------------------------------------ //

  /** Fork bookkeeping on a branch's manifests: the parent version the
    * branch was cut from ([[publishBranch]]'s fast-forward guard). */
  val BranchForkKey = "graft.branch.forkVersion"

  /** The manifest root a branch's commits address. */
  def branchRoot(root: String, name: String): String = {
    require(name.matches("[A-Za-z0-9._-]{1,64}") && name != "main",
      s"branch name must be [A-Za-z0-9._-]{1,64} and not 'main', got [$name]")
    s"$root/refs/$name"
  }

  /** All branch names with a committed version, ascending. */
  def branches(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val dir = new Path(root, "refs")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => versions(spark, s"$root/refs/$n").nonEmpty)
      .sorted.toSeq
  }

  /** Create branch `name` at the parent's CURRENT version — a zero-copy
    * in-root clone stamped with [[BranchForkKey]]. The branch starts as
    * the parent's exact state and diverges copy-on-write from there. */
  def createBranch(spark: SparkSession, root: String, name: String): Long = {
    val br = branchRoot(root, name)
    require(versions(spark, br).isEmpty,
      s"$root: branch '$name' already exists")
    val parent = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    shallowClone(spark, root, br,
      extraMeta = Map(BranchForkKey -> parent.version.toString))
  }

  /** Read a branch's current state (sugar over [[read]] at
    * [[branchRoot]] — any reader API works there directly). */
  def readBranch(spark: SparkSession, root: String, name: String): DataFrame =
    read(spark, branchRoot(root, name))

  /** Drop branch `name` — its manifests AND its copy-on-write local
    * data; parent bytes it referenced are untouched (they were never
    * the branch's to delete). Idempotent on a missing branch. */
  def deleteBranch(spark: SparkSession, root: String, name: String): Unit = {
    val br = branchRoot(root, name)
    val f = fs(spark, root)
    if (f.exists(new Path(br))) { f.delete(new Path(br), true); () }
    // purge the snapshot cache under the deleted root: a RECREATED
    // branch of the same name restarts at version 0, and a stale
    // (root, version) hit would resurrect the old branch's file list
    // (temp-dir roots never reuse paths; branch roots are the first
    // API where path reuse is the normal lifecycle)
    val it = snapCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.startsWith(br)) it.remove()
  }

  /** PUBLISH a branch back to main — the Iceberg fast-forward, the
    * terminal step of write-audit-publish: requires the parent has NOT
    * advanced past the branch's fork version (a diverged parent throws
    * loudly — re-branch and replay, there is no merge), moves the
    * branch's copy-on-write data/dv/bloom files into the parent's
    * dirs (immutable files, rename-only — no bytes copied), and lands
    * the branch's exact state as ONE parent commit pinned to the fork
    * version ([[ConcurrentCommitException]] if a writer races the
    * publish). The branch is CONSUMED: its lineage ends at
    * publication (its manifests reference moved files), so the branch
    * dir is dropped in the same call. Crash between move and commit
    * leaves only age-sweepable orphans in the parent (the branch is
    * sacrificed, the parent never corrupts). Returns the new parent
    * version. */
  def publishBranch(spark: SparkSession, root: String, name: String): Long = {
    val br = branchRoot(root, name)
    val snapB = current(spark, br).getOrElse(
      throw new IllegalArgumentException(s"$root: branch '$name' does not exist"))
    val fork = snapB.meta.getOrElse(BranchForkKey,
      throw new IllegalStateException(
        s"$root: branch '$name' carries no fork version")).toLong
    val parentV = current(spark, root).map(_.version).getOrElse(-1L)
    require(parentV == fork,
      s"$root: cannot fast-forward branch '$name' — main advanced " +
        s"(fork $fork, main $parentV); re-branch and replay the audit")
    val f = fs(spark, root)
    val dataPrefix = dataDir(root).toString + "/"
    val brData = dataDir(br)
    // entry mapping: parent-absolute -> parent-relative; branch-local
    // relative entries keep their names, their batch dirs MOVE below
    def toParentRel(e: String): String =
      if (e.startsWith(dataPrefix)) e.substring(dataPrefix.length) else e
    // branch-LOCAL entries are the truly relative ones (same test
    // moveSidecar applies): a branch cut from a table that is itself a
    // shallow clone also carries FOREIGN-absolute entries (the
    // grandparent's data paths) — those are not under this parent's
    // prefix either, but they are not the branch's to move, and
    // toParentRel already passes them through unchanged
    val localBatches = snapB.files
      .filter(e => !e.startsWith(dataPrefix) && !e.startsWith("/") && !e.contains(":/"))
      .map(e => e.substring(0, e.indexOf('/'))).distinct
    localBatches.foreach { b =>
      val src = new Path(brData, b)
      val dst = new Path(dataDir(root), b)
      if (f.exists(src) && !f.rename(src, dst))
        throw new IllegalStateException(
          s"$root: publishBranch could not move $src to $dst")
    }
    // sidecars: branch-local dv/bloom files move; inherited absolute
    // pointers (still parent paths) map back to parent-relative
    val rootPrefix = root + "/"
    val brPrefix = br + "/"
    def moveSidecar(rel: String): String = {
      // rel is either branch-relative ("dv/x"), branch-absolute, or
      // parent-absolute (inherited at the fork)
      val brRel =
        if (rel.startsWith(brPrefix)) Some(rel.substring(brPrefix.length))
        else if (!rel.startsWith("/") && !rel.contains(":/")) Some(rel)
        else None
      brRel match {
        case Some(r) =>
          val src = new Path(br, r)
          val dst = new Path(root, r)
          f.mkdirs(dst.getParent)
          if (f.exists(src) && !f.rename(src, dst))
            throw new IllegalStateException(
              s"$root: publishBranch could not move $src to $dst")
          r
        case None =>
          if (rel.startsWith(rootPrefix)) rel.substring(rootPrefix.length)
          else rel // foreign absolute (clone-of-clone): keep as-is
      }
    }
    val meta = (snapB.meta - BranchForkKey).map {
      case (DvKey, rel) => DvKey -> moveSidecar(rel)
      case (k, rel) if k.startsWith(BloomKeyPrefix) => k -> moveSidecar(rel)
      case kv => kv
    }
    val files = snapB.files.map(toParentRel)
    val rename = snapB.files.zip(files).toMap
    val v = publish(spark, root, files,
      _ => meta + (OpKey -> s"publishBranch($name)"), _ => Seq.empty,
      snapB.stats.map { case (k, s) => rename(k) -> s },
      snapB.rows.map { case (k, n) => rename(k) -> n },
      requireVersion = Some(fork),
      newBytes = snapB.bytes.map { case (k, n) => rename(k) -> n })._1
    deleteBranch(spark, root, name)
    v
  }

  /** MERGE a branch whose parent has ADVANCED — the diverged half of
    * the ref story ([[publishBranch]] is the fast-forward half; this
    * is the rebase-style 3-way merge a write-audit-publish pipeline
    * needs when ingest kept landing on main during the audit): the
    * branch's NET per-key delta vs its fork (its own version 0 — the
    * clone IS the fork state) is computed exactly for ANY commit mix
    * ([[changesWithDeltas]]), collapsed to per-key actions (surviving
    * row = upsert, disappeared key = drop — the CDC-mirror collapse),
    * and applied to CURRENT main as ONE atomic upsert+drop commit.
    * Conflict rule is per-key BRANCH-WINS over TOUCHED keys: a key
    * ANY branch commit touched takes the branch's final state — its
    * final row (even when that row equals the fork value: an audit
    * that reverted a key back still claims it, so main's concurrent
    * update does not resurrect the audited-away value), or its
    * absence (deleted-on-branch beats updated-on-main, and a key the
    * branch created then deleted drops main's concurrent insert of
    * the same key). Keys the branch never touched keep main's current
    * value — audit edits override, unrelated ingest survives.
    * Touched-ness is judged from the per-commit feed netted WITHIN
    * each commit, so a compaction inside the branch (whose carried
    * rewrites net to zero per commit) claims nothing; the LAST commit
    * that logically touched a key decides its fate. Cost follows
    * branch churn commit-by-commit (a branch-side compaction adds
    * scan volume that then nets out), never main's table size.
    *
    * `columnLevel = true` refines the both-updated case CELL-wise:
    * for a touched surviving key, each column takes the branch's
    * value only where the branch CHANGED it vs the fork (null-safe
    * compare); columns the branch left alone take main's CURRENT
    * value, so branch and main editing DIFFERENT columns of one row
    * both survive. A branch-created key, or a key main dropped, takes
    * the branch row wholesale; deletes stay whole-row branch-wins.
    * Columns ADDED on either ref since the fork merge per the
    * 3-way-vs-fork rule ([[mergeColumnsVsFork]]: added-on-branch
    * lands as the branch's values with NULL elsewhere, added-on-main
    * keeps main's values; the schema evolves in the same atomic
    * commit); a column DROPPED on one ref refuses loudly. Costs two
    * extra key-pruned semi-joined reads (fork + main state of the
    * touched keys); the commit stays O(touched keys).
    *
    * Value-idempotent: re-applying the same delta reproduces the same
    * table, so a crash between the commit and the branch drop re-runs
    * safely. The branch is CONSUMED like [[publishBranch]]. Requires
    * unique non-null keys on both refs, and the branch must still
    * hold its FULL history (version 0 is the merge baseline and the
    * per-commit replay needs every step — a branch you intend to
    * MERGE must not gc its own snapshots). Returns the new main
    * version. */
  def mergeBranch(spark: SparkSession, root: String, name: String,
      keyCol: String, columnLevel: Boolean = false): Long = {
    val br = branchRoot(root, name)
    val snapB = current(spark, br).getOrElse(
      throw new IllegalArgumentException(s"$root: branch '$name' does not exist"))
    val have = versions(spark, br).toSet
    require((0L to snapB.version).forall(have),
      s"$root: branch '$name' gc'd its fork snapshot or part of its " +
        "history — the merge baseline/per-commit replay is gone; keep " +
        "the branch's full history or use publishBranch before main " +
        "diverges")
    val cur0 = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed version"))
    if (snapB.version == 0L) { // no branch commits: nothing to merge
      deleteBranch(spark, root, name)
      return cur0.version
    }
    import org.apache.spark.sql.functions.{row_number, sum, when}
    val feed = changeFeed(spark, br, 0L, snapB.version)
    val dataCols = feed.columns
      .filterNot(c => c == ChangeTypeCol || c == CommitVersionCol)
    // net within each commit: carried rewrites (branch-side
    // compaction) vanish; true updates keep their remove/insert pair
    val perCommit = feed
      .groupBy((col(CommitVersionCol) +: dataCols.map(col)): _*)
      .agg(sum(when(col(ChangeTypeCol) === "insert", 1L)
        .otherwise(-1L)).as("__net"))
      .filter(col("__net") =!= 0L)
    // the key's LAST touching commit decides: an insert there is the
    // branch's final row, a remove-only commit means deleted-on-branch
    // (within one commit an update carries both — the insert wins)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(CommitVersionCol).desc, col("__net").desc)
    val last = perCommit.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .localCheckpoint(false)
    try {
      val upsBranch = last.filter(col("__net") > 0L)
        .select(dataCols.map(col): _*)
      val dropKeys = last.filter(col("__net") < 0L).select(col(keyCol))
      val ups =
        if (!columnLevel) upsBranch
        else mergeColumnsVsFork(spark, root, br, upsBranch, keyCol)
      val v =
        if (ups.isEmpty && dropKeys.isEmpty) cur0.version
        // evolveSchema: a branch that ADDED columns since the fork
        // merges them into main's schema in the same atomic commit
        // (cell rules in [[mergeColumnsVsFork]]; whole-row mode takes
        // the branch row under the union schema)
        else retryingCommit(s"$root mergeBranch($name)", 4)(
          upsertPlanned(ups, root, keyCol, drops = Some(dropKeys),
            evolveSchema = true))
      deleteBranch(spark, root, name)
      v
    } finally { last.unpersist(); () }
  }

  /** The cell-wise 3-way resolve of [[mergeBranch]]`(columnLevel =
    * true)`: for each touched surviving key, branch value where the
    * branch changed the cell vs the fork, main's current value where
    * it did not (main may have concurrently edited OTHER columns of
    * the row), branch row wholesale when the key has no fork row
    * (branch-created) or no main row (main dropped it — branch-wins
    * resurrection).
    *
    * SCHEMA EVOLUTION across the merge (columns ADDED on either ref
    * since the fork) resolves per column — the fork schema is the
    * 3-way baseline exactly like the fork rows are for cells:
    *  - added on BRANCH (∉ fork, ∉ main): merges as the branch's
    *    value (a null branch cell stays null); untouched main rows
    *    read it as NULL once the upsert commit evolves the schema;
    *  - added on MAIN (∉ fork, ∉ branch): touched surviving keys keep
    *    main's current value; branch-created keys get NULL.
    * A column DROPPED on one ref since the fork (present at fork and
    * on the other ref) still refuses loudly: an upsert cannot drop a
    * column table-wide, and silently resurrecting or half-dropping it
    * would corrupt the merge — run dropColumn on main (or re-add on
    * the branch) first. */
  private def mergeColumnsVsFork(spark: SparkSession, root: String,
      br: String, upsBranch: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    val mainCols = read(spark, root).columns.toSeq
    // the branch's CURRENT logical columns — NOT the feed's column
    // union (the feed pads every step to the union, so a column the
    // branch dropped mid-history would still appear there and mask
    // the drop from the refuse rule below)
    val branchCols = read(spark, br).columns.toSeq
    val snap0 = snapshot(spark, br, 0L)
    // the fork-time column set: from the fork's live rows when any
    // exist, else the clone's recorded schema (physical == logical on
    // a fresh clone — renames inside an evolving branch are refused
    // below by the dropped-column rule they'd manifest as)
    val forkCols: Seq[String] =
      if (snap0.files.nonEmpty) readSnapshot(spark, br, snap0).columns.toSeq
      else recordedSchema(snap0).map(_.fieldNames.toSeq).getOrElse(branchCols)
    val (bSet, mSet, fSet) = (branchCols.toSet, mainCols.toSet, forkCols.toSet)
    require(bSet.contains(keyCol) && mSet.contains(keyCol),
      s"$root: merge key $keyCol must exist on both branch and main")
    val droppedOnBranch = ((fSet & mSet) -- bSet).toSeq.sorted
    val droppedOnMain = ((fSet & bSet) -- mSet).toSeq.sorted
    require(droppedOnBranch.isEmpty && droppedOnMain.isEmpty,
      s"$root: column-level merge cannot cross a column DROP " +
        s"(dropped on branch: ${droppedOnBranch.mkString(",")}; " +
        s"dropped on main: ${droppedOnMain.mkString(",")}) — " +
        "drop the column on main too (dropColumn) or re-add it " +
        "before merging")
    // output order: main's columns first, branch-added appended (the
    // same order the upsert's mergeStructs evolution records)
    val outCols = mainCols ++ branchCols.filterNot(mSet)
    val keys = upsBranch.select(col(keyCol)).distinct()
    val forkRows =
      if (snap0.files.isEmpty) None
      else Some(readSnapshot(spark, br, snap0)
        .join(keys, Seq(keyCol), "left_semi")
        .select(col(keyCol) +: forkCols.filterNot(_ == keyCol)
          .map(c => col(c).as(s"__f_$c")): _*)
        .withColumn("__f_has", lit(true)))
    val mainRows = read(spark, root)
      .join(keys, Seq(keyCol), "left_semi")
      .select(col(keyCol) +: mainCols.filterNot(_ == keyCol)
        .map(c => col(c).as(s"__m_$c")): _*)
      .withColumn("__m_has", lit(true))
    val joined = forkRows
      .map(f => upsBranch.join(f, Seq(keyCol), "left"))
      .getOrElse(upsBranch
        .withColumn("__f_has", lit(null).cast("boolean")))
      .join(mainRows, Seq(keyCol), "left")
    joined.select(outCols.map { c =>
      if (c == keyCol) col(c)
      else if (!bSet.contains(c))
        // added on main: main's concurrent value; branch-created (or
        // main-dropped) keys have no main row — NULL
        when(col("__m_has").isNotNull, col(s"__m_$c")).otherwise(lit(null)).as(c)
      else {
        val branchV = col(c)
        val forkV =
          if (forkRows.isDefined && fSet.contains(c)) col(s"__f_$c")
          else lit(null) // added on branch: fork never had the cell
        val mainV =
          if (mSet.contains(c)) col(s"__m_$c")
          else lit(null) // added on branch: main has no cell yet
        when(col("__f_has").isNull, branchV) // branch-created key
          .when(!(branchV <=> forkV), branchV) // branch changed the cell
          .when(col("__m_has").isNotNull, mainV) // main's concurrent value
          .otherwise(branchV) // main dropped the key: branch resurrects
          .as(c)
      }
    }: _*)
  }

  /** Garbage collection: drop all but the newest `keepVersions`
    * manifests, then delete expired data files. Two deletion regimes,
    * because a file referenced by NO manifest at all is
    * INDISTINGUISHABLE from a concurrent writer's staged-but-not-yet-
    * committed batch ([[stage]] runs outside the commit lock — sweeping
    * it would let the writer's manifest commit referencing missing
    * files, a corrupt table):
    *  - files the EXPIRED (dropped) manifests referenced are committed
    *    history past retention — deleted unconditionally;
    *  - files referenced by no manifest (crash orphans OR in-flight
    *    stages) are deleted only once older than `orphanMinAgeMs` —
    *    the public VACUUM modification-time rule. A crashed writer's
    *    debris ages into eligibility; a live writer commits long before
    *    the window closes (a single stage+publish is seconds). Same
    *    valve for unrenamed manifest tmps and unreferenced dv files.
    *
    * Manifests are deleted FIRST so a reader resolving after gc starts
    * can never pin a snapshot whose files are about to vanish; readers
    * pinned BEFORE gc to an expired snapshot are the documented
    * retention trade (the public formats' VACUUM caveat). Returns
    * deleted data paths.
    *
    * BRANCH roots ([[BranchForkKey]] present) auto-skip depth trimming
    * by default: [[mergeBranch]] needs the branch's FULL history
    * (version 0 is the 3-way baseline, the per-commit replay needs
    * every step), so a routine gc — e.g. a [[Maintenance]] policy
    * applied uniformly — must not silently brick a pending merge.
    * Orphan/dv/tmp sweeps still run (they never touch committed
    * history). `branchTrim = true` is the explicit policy knob that
    * restores trimming on a branch whose history you have decided not
    * to merge (publishBranch-only or abandoned refs). */
  def gc(spark: SparkSession, root: String, keepVersions: Int = 2,
      orphanMinAgeMs: Long = 10L * 60 * 1000,
      branchTrim: Boolean = false): Seq[String] = {
    require(keepVersions >= 1, "gc must retain at least the current version")
    val f = fs(spark, root)
    val all = versions(spark, root)
    if (all.isEmpty) return Seq.empty
    // TAGGED versions are pinned outside the retention depth: their
    // manifests never drop, so the file/dv/bloom retention passes
    // below (which walk the RETAINED manifests) keep their bytes too
    val taggedVs = tags(spark, root).values.toSet
    val isBranch = !branchTrim &&
      current(spark, root).exists(_.meta.contains(BranchForkKey))
    val dropped = {
      val d = all.dropRight(keepVersions).filterNot(taggedVs)
      if (d.isEmpty || !isBranch) d
      else {
        System.err.println(s"[manifest] gc($root): branch ref — depth " +
          s"trimming of ${d.size} version(s) skipped to keep the merge " +
          "baseline (pass branchTrim=true to trim a branch you will " +
          "not merge)")
        Seq.empty
      }
    }
    // resolve the expired snapshots BEFORE unlinking their manifests —
    // afterwards "expired history" and "orphan" are indistinguishable
    val droppedSnaps = dropped.map(v => snapshot(spark, root, v))
    val droppedRefs = droppedSnaps.flatMap(_.files).toSet
    val droppedDv = droppedSnaps.flatMap(_.meta.get(DvKey)).toSet
    val cutoff = System.currentTimeMillis() - orphanMinAgeMs
    // incremental log: if a RETAINED version is a delta whose
    // resolution chains through manifests about to be dropped, write
    // its fully-resolved CHECKPOINT SIDECAR first (idempotent: content
    // is the immutable resolved snapshot; rename-if-absent arbitrates).
    // That covers the oldest tail-retained version (every newer tail
    // version's chain stops there — bases are contiguous v → v-1) AND
    // every tagged version stranded in a retention hole (its own
    // checkpoint makes it self-contained). A crash between sidecar
    // write and the drops below just re-runs.
    if (dropped.nonEmpty) {
      def ensureCheckpoint(v: Long): Unit = {
        val snap = snapshot(spark, root, v)
        if (snap.chainLen > 0) {
          val tmp = new Path(manifestDir(root),
            s"_tmp.${java.util.UUID.randomUUID().toString.replace("-", "")}")
          val out = f.create(tmp, false)
          try out.write(render(snap.files, snap.meta, snap.stats, snap.rows,
            snap.bytes).getBytes("UTF-8"))
          finally out.close()
          val cp = checkpointPath(root, v)
          if (f.exists(cp) || !f.rename(tmp, cp)) f.delete(tmp, false)
        }
      }
      val tail = all.takeRight(keepVersions)
      if (tail.nonEmpty) ensureCheckpoint(tail.head)
      taggedVs.filterNot(tail.contains).filter(all.contains)
        .toSeq.sorted.foreach(ensureCheckpoint)
    }
    dropped.foreach { v =>
      f.delete(manifestPath(root, v), false)
      f.delete(checkpointPath(root, v), false)
    }
    if (f.exists(manifestDir(root)))
      f.listStatus(manifestDir(root))
        .filter(st => st.getPath.getName.startsWith("_tmp.") &&
          st.getModificationTime < cutoff)
        .foreach(st => f.delete(st.getPath, false))
    val retainedSnaps = versions(spark, root).map(v => snapshot(spark, root, v))
    // BRANCH refs pin parent bytes: a branch is a REF this root honors
    // (unlike a detached clone) — every branch manifest's absolute
    // entries under THIS root's data/dv/bloom dirs stay retained.
    // Recursive: a branch may itself carry branches.
    def branchSnapsOf(r: String): Seq[Snapshot] =
      branches(spark, r).flatMap { b =>
        val brr = s"$r/refs/$b"
        versions(spark, brr).map(v => snapshot(spark, brr, v)) ++
          branchSnapsOf(brr)
      }
    val branchSnaps = branchSnapsOf(root)
    val dataPrefix = dataDir(root).toString + "/"
    val rootPrefix = root + "/"
    val branchRefs = branchSnaps.flatMap(_.files)
      .filter(_.startsWith(dataPrefix))
      .map(_.substring(dataPrefix.length)).toSet
    def branchSidecars(get: Snapshot => Iterable[String]): Set[String] =
      branchSnaps.flatMap(get)
        .filter(_.startsWith(rootPrefix))
        .map(_.substring(rootPrefix.length)).toSet
    val retained = retainedSnaps.flatMap(_.files).toSet ++ branchRefs
    // deletion vectors: keep every dv file a retained manifest points at
    val retainedDv = retainedSnaps.flatMap(_.meta.get(DvKey)).toSet ++
      branchSidecars(_.meta.get(DvKey))
    val dvDir = new Path(root, "dv")
    if (f.exists(dvDir))
      f.listStatus(dvDir).foreach { st =>
        val rel = s"dv/${st.getPath.getName}"
        if (!retainedDv.contains(rel) &&
            (droppedDv.contains(rel) || st.getModificationTime < cutoff))
          f.delete(st.getPath, true)
      }
    // bloom sidecars: same rule, keyed by the graft.bloom.* pointers
    // (superseded builds age out; the current pointers stay)
    val bloomOf = (s: Snapshot) => s.meta.collect {
      case (k, v) if k.startsWith(BloomKeyPrefix) => v
    }
    val droppedBloom = droppedSnaps.flatMap(bloomOf).toSet
    val retainedBloom = retainedSnaps.flatMap(bloomOf).toSet ++
      branchSidecars(s => bloomOf(s))
    val bloomDir = new Path(root, "bloom")
    if (f.exists(bloomDir))
      f.listStatus(bloomDir).foreach { st =>
        val rel = s"bloom/${st.getPath.getName}"
        if (!retainedBloom.contains(rel) &&
            (droppedBloom.contains(rel) || st.getModificationTime < cutoff))
          f.delete(st.getPath, true)
      }
    val dd = dataDir(root)
    if (!f.exists(dd)) return Seq.empty
    val removed = scala.collection.mutable.ArrayBuffer[String]()
    f.listStatus(dd).filter(_.isDirectory).foreach { b =>
      val batch = b.getPath.getName
      f.listStatus(b.getPath).foreach { st =>
        val rel = s"$batch/${st.getPath.getName}"
        val isData = st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")
        if (!retained.contains(rel) &&
            (droppedRefs.contains(rel) || st.getModificationTime < cutoff)) {
          f.delete(st.getPath, false)
          if (isData) removed += rel
        }
      }
      // recursive: checksum-FS .crc debris is invisible to listStatus
      // but still blocks a plain rmdir
      if (f.listStatus(b.getPath).isEmpty) f.delete(b.getPath, true)
    }
    removed.toSeq
  }
}
