package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table: every commit is a new immutable
  * MANIFEST (the list of data files composing that snapshot), so readers
  * get time travel, snapshot isolation, and O(1) planning without a
  * transactional metastore — the minimal honest core of the
  * Iceberg/Delta idea on plain parquet.
  *
  * Why a manifest at 100 TB: a directory-listing table (plain
  * `spark.read.parquet(dir)`) must LIST the directory tree on every read —
  * millions of files at lake scale, minutes of namenode/S3 round trips
  * before the first byte, and no way to read yesterday's table once
  * today's writer has swapped files. A manifest commit inverts that: the
  * snapshot IS one small file naming its data files; readers load exactly
  * one manifest and plan from it, old manifests keep old snapshots
  * readable until [[vacuum]], and a writer that dies mid-job leaves only
  * unreferenced data files (invisible to every reader) — never a
  * half-visible table.
  *
  * Layout under `dir`:
  * {{{
  *   data/c<ver>-<uuid>/part-*.parquet   — immutable; never rewritten
  *   _manifests/v00001.manifest          — one relative path per line
  * }}}
  *
  * Concurrency contract — OPTIMISTIC, single-winner: a commit stages its
  * data files, then claims version N+1 by CREATE-EXCLUSIVE of the
  * manifest file (`FileSystem.create(overwrite = false)` — atomic on
  * local/HDFS semantics). Two racing writers both stage, one claims the
  * version, the loser's create throws and its staged files stay
  * unreferenced (re-commit retries against the new head; vacuum reclaims
  * the orphans). Readers never lock: a manifest, once visible, is
  * immutable.
  *
  * APPEND commits reference the previous snapshot's files plus the new
  * ones — no data is rewritten, the classic log-structured ingest.
  * OVERWRITE commits reference only the new files. Row-level merge
  * belongs to [[LakeSink.mergePartitioned]]; this class is the snapshot
  * layer underneath.
  */
object VersionedTable {

  private val ManifestDir = "_manifests"
  private val DataDir     = "data"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, version: Int): Path =
    new Path(dir, f"$ManifestDir/v$version%05d.manifest")

  /** Latest committed version, or 0 if the table has no commits. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val f  = fs(spark, dir)
    val md = new Path(dir, ManifestDir)
    if (!f.exists(md)) 0
    else
      f.listStatus(md).iterator
        .map(_.getPath.getName)
        .collect { case n if n.matches("v\\d{5}\\.manifest") => n.substring(1, 6).toInt }
        .foldLeft(0)(math.max)
  }

  private def readManifest(spark: SparkSession, dir: String, version: Int): Seq[String] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, version)
    if (!f.exists(p))
      throw new NoSuchElementException(
        s"VersionedTable: $dir has no version $version (latest = ${latestVersion(spark, dir)})")
    val in = f.open(p)
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally in.close()
  }

  /** The `#token=` header of a manifest, if its commit carried one.
    * None for token-less or vacuumed versions.
    */
  private def manifestToken(spark: SparkSession, dir: String, version: Int): Option[String] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, version)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try
        scala.io.Source.fromInputStream(in, "UTF-8").getLines().map(_.trim)
          .filter(_.startsWith("#token=")).map(_.stripPrefix("#token=")).toList.headOption
      finally in.close()
    }
  }

  /** Commit `df` as the next snapshot. Returns the committed version.
    *
    * @param append true → new snapshot = previous files + df's files;
    *               false → new snapshot = df's files only (overwrite)
    * @param token  optional idempotence key recorded in the manifest
    *               header — see [[commitIdempotent]]
    */
  def commit(
      spark: SparkSession,
      dir: String,
      df: DataFrame,
      append: Boolean,
      token: Option[String] = None
  ): Int = {
    val f = fs(spark, dir)
    // Stage data files under a commit-unique subdir — never visible until
    // the manifest that references them wins its create.
    val base = latestVersion(spark, dir)
    val sub  = f"c${base + 1}%05d-${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    val stageRel = s"$DataDir/$sub"
    df.write.mode("errorifexists").parquet(new Path(dir, stageRel).toString)
    val newFiles = f.listStatus(new Path(dir, stageRel)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$stageRel/${s.getPath.getName}")
      .sorted
    val carried = if (append && base > 0) readManifest(spark, dir, base) else Seq.empty
    val files   = carried ++ newFiles

    // Claim the version: create-exclusive is the whole commit protocol.
    // A loser's staged files stay unreferenced; the caller retries the
    // commit (fresh staging) against the new head.
    val version = base + 1
    val target  = manifestPath(dir, version)
    f.mkdirs(target.getParent)
    val out    = f.create(target, /* overwrite = */ false)
    val header = token.fold("")(t => s"#token=$t\n")
    try out.write((header + files.mkString("", "\n", "\n")).getBytes("UTF-8"))
    finally out.close() // close flushes; LocalFileSystem's checksum wrapper has no hsync
    version
  }

  /** Exactly-once commit keyed by a writer-supplied `token` (the
    * Structured Streaming `batchId` is the canonical one): if some
    * manifest already records this token, return that version WITHOUT
    * committing — so a foreachBatch retry (at-least-once delivery) or a
    * restarted query replaying its last epoch cannot double-append a
    * micro-batch. This is the sink-side half of end-to-end exactly-once:
    * the checkpoint replays the batch, the token makes the replay a
    * no-op.
    *
    * The token scan reads manifest HEADERS (first line) newest-first —
    * bounded metadata, no data files touched; in steady state the
    * replayed batch is within the last couple of versions.
    */
  def commitIdempotent(
      spark: SparkSession,
      dir: String,
      df: DataFrame,
      token: String,
      append: Boolean = true
  ): Int = {
    require(token.nonEmpty && !token.contains('\n'), "token must be a nonempty single line")
    val latest = latestVersion(spark, dir)
    (latest to 1 by -1)
      .find(v => manifestToken(spark, dir, v).contains(token))
      .getOrElse(commit(spark, dir, df, append, Some(token)))
  }

  /** Read a snapshot — `version = None` for the latest. The plan is built
    * from the manifest's explicit file list: no directory listing, and a
    * concurrent commit cannot change what this reader sees.
    *
    * `mergeSchema = true` reconciles files written under EVOLVED schemas
    * (a later append that added columns): the read schema is the union,
    * older files surface NULL for columns they predate — additive schema
    * evolution without a rewrite, the only kind a 100 TB table can
    * afford. (Off by default: schema union costs a footer read per
    * distinct commit, and most tables never evolve.)
    */
  def read(
      spark: SparkSession,
      dir: String,
      version: Option[Int] = None,
      mergeSchema: Boolean = false
  ): DataFrame = {
    val v = version.getOrElse {
      val latest = latestVersion(spark, dir)
      if (latest == 0)
        throw new NoSuchElementException(s"VersionedTable: $dir has no commits")
      latest
    }
    val files  = readManifest(spark, dir, v).map(rel => new Path(dir, rel).toString)
    val reader = if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
    reader.parquet(files: _*)
  }

  /** Incremental read: the rows ADDED between two snapshots — exactly the
    * files `toVersion`'s manifest references that `fromVersion`'s does
    * not. This is what turns the commit log into a change feed: a
    * downstream consumer checkpoints the last version it processed and
    * each run reads ONLY the new files — O(new data), never a table scan
    * or a diff — the incremental-consumption shape every 100 TB ingest
    * pipeline needs.
    *
    * Sound only along an APPEND CHAIN: an overwrite between the two
    * versions removed rows this file-level diff cannot see, so the read
    * REFUSES (fails fast) if `toVersion`'s manifest does not contain
    * every file of `fromVersion`'s. `fromVersion = 0` means "from the
    * beginning" (the increment is the whole snapshot).
    */
  def readIncrement(
      spark: SparkSession,
      dir: String,
      fromVersion: Int,
      toVersion: Int
  ): DataFrame = {
    require(0 <= fromVersion && fromVersion < toVersion,
      s"need 0 <= fromVersion < toVersion, got $fromVersion..$toVersion")
    val to   = readManifest(spark, dir, toVersion)
    val from = if (fromVersion == 0) Seq.empty else readManifest(spark, dir, fromVersion)
    val toSet = to.toSet
    val missing = from.filterNot(toSet)
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"VersionedTable: v$fromVersion → v$toVersion is not an append chain " +
          s"(${missing.size} file(s) of v$fromVersion left the table, e.g. ${missing.head}); " +
          "an overwrite happened in between — incremental reads are only sound over appends")
    val fromSet = from.toSet
    val added   = to.filterNot(fromSet).map(rel => new Path(dir, rel).toString)
    if (added.isEmpty) read(spark, dir, Some(toVersion)).limit(0)
    else spark.read.parquet(added: _*)
  }

  /** Compaction commit: rewrite the LATEST snapshot's rows into
    * ~`targetFileBytes` files and commit the result as a new OVERWRITE
    * version — same rows, fewer files; every prior version's manifest
    * and files are untouched, so time travel survives compaction and the
    * small-file debt a streaming ingest accumulates (one commit per
    * micro-batch = one file set per micro-batch) is paid without a write
    * lock: readers of any committed version never see a half-compacted
    * table, and a concurrent append simply wins or loses the next
    * version against the compaction like any other commit.
    *
    * An incremental consumer ([[readIncrement]]) across the compaction
    * boundary REFUSES (it is an overwrite — the file diff can't prove
    * append-only); consumers checkpoint at or after the compacted
    * version and resume. `coalesce`, not repartition: compaction must
    * not pay a full exchange of the table.
    *
    * Returns (newVersion, filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): (Int, Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val f      = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    if (latest == 0)
      throw new NoSuchElementException(s"VersionedTable: $dir has no commits to compact")
    val files = readManifest(spark, dir, latest)
    val bytes = files.map(rel => f.getFileStatus(new Path(dir, rel)).getLen).sum
    val nOut  = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val v     = commit(spark, dir, read(spark, dir, Some(latest)).coalesce(nOut), append = false)
    (v, files.size, readManifest(spark, dir, v).size)
  }

  /** Drop manifests older than the `keepVersions` most recent and delete
    * every data file no surviving manifest references. Bounded metadata
    * work: reads only the kept manifests + one directory list of `data/`
    * commit subdirs (a subdir whose files are all unreferenced is removed
    * whole). Returns (manifests dropped, data subdirs deleted).
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val f      = fs(spark, dir)
    val latest = latestVersion(spark, dir)
    if (latest == 0) return (0, 0)
    val keepFrom = math.max(1, latest - keepVersions + 1)
    val referencedSubdirs = (keepFrom to latest).iterator
      .filter(v => f.exists(manifestPath(dir, v)))
      .flatMap(v => readManifest(spark, dir, v))
      .map(_.split('/')(1)) // data/<sub>/part-...
      .toSet
    var droppedManifests = 0
    (1 until keepFrom).foreach { v =>
      val p = manifestPath(dir, v)
      if (f.exists(p)) { f.delete(p, false); droppedManifests += 1 }
    }
    val dataRoot = new Path(dir, DataDir)
    var droppedSubdirs = 0
    if (f.exists(dataRoot))
      f.listStatus(dataRoot).foreach { s =>
        if (s.isDirectory && !referencedSubdirs.contains(s.getPath.getName)) {
          f.delete(s.getPath, true)
          droppedSubdirs += 1
        }
      }
    (droppedManifests, droppedSubdirs)
  }
}
