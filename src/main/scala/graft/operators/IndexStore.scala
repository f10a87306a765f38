package graft.operators

import org.apache.hadoop.fs.{FileSystem, FileUtil, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-pointer storage layer shared by every persisted serving
  * index family (MinHash signature, image fingerprint, Jaccard prefix,
  * IVF cell, BM25 postings, gram vocabulary) — the concurrency and
  * cost model that makes the build → append/delete → compact lifecycle
  * production-grade:
  *
  *  - '''Atomic serve-during-compact.''' A compaction never mutates the
  *    live data in place: it writes a complete new GENERATION directory
  *    (`_gen-00001`, `_gen-00002`, …) beside the old one and then flips a
  *    tiny pointer file (`_graft_current`) with one atomic rename
  *    ([[org.apache.hadoop.fs.FileContext]] `Rename.OVERWRITE` — atomic on
  *    HDFS and POSIX local). A concurrent probe resolves the pointer ONCE
  *    at entry and reads a complete, immutable-to-it generation: there is
  *    no window where the index path is absent and no window where a
  *    multi-relation index (BM25's postings/terms/docs, Jaccard's
  *    postings/fullsets) can be seen half-swapped — the in-place
  *    retire→install rename protocol this replaces had both.
  *    The previous generation is retained (readable-until-vacuum, the
  *    [[graft.sinks.VersionedTable]] contract) so probes that resolved it
  *    mid-flip finish; it is reclaimed by the NEXT compaction or an
  *    explicit [[vacuum]].
  *
  *  - '''Selective (dirty-partition-only) compaction.''' A full-index
  *    rewrite at 10⁹ docs to purge 0.1% of rows inverts the amortization
  *    argument, so the family compactors rewrite ONLY dirty partitions —
  *    those holding append segments (>1 data file) or tombstoned rows —
  *    and carry every clean partition into the new generation by
  *    HARDLINK (metadata-only on any POSIX filesystem; byte copy on
  *    filesystems without links, where the manifest-based
  *    [[graft.sinks.VersionedTable]] layer is the right substrate — see
  *    [[carryPartitions]]). Compact cost is proportional to the dirty
  *    fraction, not the index size ([[graft.tools.CompactionSoak]]
  *    measures exactly that).
  *
  *  - '''Multi-writer safety.''' Appends, tombstone deletes, and
  *    compactions serialize on a per-index writer LEASE
  *    (`_graft_writer_lock`, create-exclusive — the
  *    [[graft.sinks.VersionedTable]] commit-claim idea applied to a
  *    mutable directory): two jobs appending the same index (the
  *    daily-crawl × backfill shape) can no longer interleave their
  *    FileOutputCommitter temporaries and silently lose files — the
  *    second writer waits, then fails LOUDLY with the holder's identity
  *    if the lease never frees. Probes never lock. The holder HEARTBEATS
  *    (re-stamps the lock every `staleMs / 3`), so staleness means missed
  *    heartbeats — a dead writer's lease is broken after `staleMs` of
  *    silence, while a live compaction that runs hours keeps renewing. A
  *    holder that was nonetheless stolen (paused past the window) is
  *    FENCED at install: [[swapGeneration]] re-checks the lease token
  *    before flipping the pointer and aborts rather than double-install.
  *
  * Layout compatibility: an index that has never been compacted keeps
  * the flat layout (data directly under its root — no pointer file) and
  * every code path treats it identically; the first compaction
  * transitions the root to generations. The pointer stores the
  * generation's RELATIVE name so a copied index directory (fixture
  * copy-on-write, DR restore) stays self-contained.
  */
private[graft] object IndexStore {

  val PointerName = "_graft_current"
  val LockName    = "_graft_writer_lock"
  /** Streaming batch-token dir (at-most-once appends per foreachBatch
    * batchId — see [[graft.streaming.StreamGates.maintainBatchBody]]).
    * Lives ABOVE the generations like the pointer and lock: a token
    * records that a batch's write committed into SOME generation, which
    * stays true across every subsequent compaction — reclaiming it with
    * the flat era would reopen the duplicate-append retry window the
    * token exists to close.
    */
  val BatchTokensName = "_graft_stream_batches"
  val GenPrefix   = "_gen-"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Resolve the index root to its live DATA directory: the current
    * generation when a pointer exists, the root itself for flat
    * (never-compacted) layouts. Probe paths call this ONCE at entry and
    * use the result throughout, so one operation never mixes
    * generations however many relations it reads.
    */
  def dataDir(spark: SparkSession, root: String): String = {
    val ptr = new Path(root, PointerName)
    val fs  = fsOf(spark, ptr)
    if (!fs.exists(ptr)) root
    else {
      val in = fs.open(ptr)
      val gen =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(gen.startsWith(GenPrefix), s"corrupt index pointer $ptr: '$gen'")
      new Path(root, gen).toString
    }
  }

  /** Current generation number; 0 for flat (never-compacted) roots. */
  def currentGeneration(spark: SparkSession, root: String): Int = {
    val d = dataDir(spark, root)
    if (d == root) 0
    else new Path(d).getName.stripPrefix(GenPrefix).toInt
  }

  // ---------------------------------------------------------------- lease

  /** Roots whose lease this thread already holds, mapped to the lease's
    * fencing TOKEN — writer entry points nest (compactIndexes → family
    * compactor → append helpers), and a re-acquire of a held lease must
    * be a no-op, not a self-deadlock. The token identifies THIS
    * acquisition: the install fence ([[swapGeneration]]) re-reads the
    * lock at flip time and aborts if the token on disk is not ours.
    */
  private val held = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }

  /** Shared daemon scheduler for lease heartbeats — renewals are one tiny
    * atomic file replace each, so one thread serves every concurrently
    * held lease (the family compactors hold at most a handful at once).
    */
  private lazy val heartbeatPool: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newScheduledThreadPool(1, (r: Runnable) => {
      val t = new Thread(r, "graft-index-lease-heartbeat")
      t.setDaemon(true)
      t
    })

  private def readLock(fs: FileSystem, lock: Path): String =
    try {
      val in = fs.open(lock)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    } catch { case _: java.io.IOException => "" } // absent / vanished mid-read

  private def lockTokenOf(content: String): Option[String] =
    "token=(\\S+)".r.findFirstMatchIn(content).map(_.group(1))

  /** Atomically REPLACE the lock file's content (heartbeat renewal): the
    * token stays, the ts re-stamps. Same atomic-replace primitives as
    * [[flipPointer]] — a concurrent reader sees the old or the new stamp,
    * never a partial file (which the stale-break's re-read-compare could
    * mistake for a changed holder).
    */
  private def renewLease(
      spark: SparkSession, fs: FileSystem, lock: Path, me: String, token: String): Unit = {
    val stamp = s"$me token=$token ts=${System.currentTimeMillis()}\n"
    if (fs.getScheme == "file") {
      val dst = java.nio.file.Paths.get(fs.makeQualified(lock).toUri.getPath)
      val tmp = dst.resolveSibling(dst.getFileName.toString + ".hb")
      java.nio.file.Files.write(tmp, stamp.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = fs.makeQualified(new Path(lock.getParent, LockName + ".hb"))
      val out = fs.create(tmp, true)
      try out.write(stamp.getBytes("UTF-8"))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.makeQualified(lock).toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, fs.makeQualified(lock), Options.Rename.OVERWRITE)
    }
  }

  /** Run `body` holding the index's writer lease. Mutators (append,
    * tombstone delete, compact) all pass through here; concurrent
    * writers serialize, and one that cannot acquire within `waitMs`
    * fails loudly with the holder's identity instead of interleaving
    * writes.
    *
    * Liveness vs. staleness: the HOLDER re-stamps the lock file every
    * `heartbeatMs` (default `staleMs / 3`, daemon scheduler), so
    * staleness means MISSED HEARTBEATS — a dead writer's lock is broken
    * after `staleMs` of silence (logged), while a live compaction that
    * legitimately runs hours keeps renewing and is never stolen. A
    * holder that WAS stolen (paused past `staleMs` with heartbeats
    * disabled — a stop-the-world GC longer than the stale window, or a
    * suspended VM) discovers it at install time: [[swapGeneration]]
    * fences on the lease token before flipping the pointer, and the
    * release path deletes the lock only if the token on disk is still
    * this acquisition's. `heartbeatMs = 0` disables renewal (test hook
    * for exactly that stolen-lease scenario).
    */
  def withWriterLease[T](
      spark: SparkSession,
      root: String,
      // Defaults are JVM-tunable (-Dgraft.lease.waitMs/-Dgraft.lease.staleMs,
      // i.e. spark.driver.extraJavaOptions on a cluster): every mutator
      // funnels through here with the defaults, so an operator sizes the
      // wait to the job's patience and the stale window to the heartbeat
      // SLA without threading parameters through the family APIs.
      waitMs: Long = sys.props.get("graft.lease.waitMs").map(_.toLong).getOrElse(120000L),
      staleMs: Long = sys.props.get("graft.lease.staleMs").map(_.toLong).getOrElse(30L * 60 * 1000),
      heartbeatMs: Long = -1L
  )(body: => T): T = {
    val lock = new Path(root, LockName)
    val fs   = fsOf(spark, lock)
    val key  = fs.makeQualified(new Path(root)).toString
    if (held.get().contains(key)) return body // re-entrant: already ours
    val token = java.util.UUID.randomUUID().toString
    val me = s"pid=${ProcessHandle.current().pid()} thread=${Thread.currentThread().getName}"
    val stamp = () => s"$me token=$token ts=${System.currentTimeMillis()}\n"
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      try {
        fs.mkdirs(new Path(root))
        // The claim must be ATOMIC create-exclusive. HDFS's namenode gives
        // that for create(overwrite = false); the LOCAL FileSystem's
        // checksum wrapper implements it as exists-then-create — a TOCTOU
        // hole two simultaneous acquirers both slip through (observed:
        // interleaved committers under suite load). On file: schemes go
        // straight to O_CREAT|O_EXCL via java.nio instead.
        if (fs.getScheme == "file") {
          val p = java.nio.file.Paths.get(fs.makeQualified(lock).toUri.getPath)
          java.nio.file.Files.write(p, stamp().getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW, // atomic O_EXCL
            java.nio.file.StandardOpenOption.WRITE)
        } else {
          val out = fs.create(lock, /* overwrite = */ false)
          try out.write(stamp().getBytes("UTF-8"))
          finally out.close()
        }
        acquired = true
      } catch {
        case _: java.io.IOException => // exists (or raced) — inspect holder
          val holder = readLock(fs, lock)
          val ts = "ts=(\\d+)".r.findFirstMatchIn(holder).map(_.group(1).toLong)
          if (ts.exists(System.currentTimeMillis() - _ > staleMs)) {
            org.apache.log4j.Logger.getLogger(getClass)
              .warn(s"IndexStore: breaking stale writer lease on $root (holder: $holder)")
            // Re-read before deleting: a rival waiter may have broken the
            // stale lock and acquired a FRESH one in the window since our
            // read — deleting that would hand out two leases.
            if (readLock(fs, lock) == holder && holder.nonEmpty) fs.delete(lock, false)
          } else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"IndexStore: could not acquire writer lease on $root within ${waitMs}ms " +
                s"(held by: ${if (holder.isEmpty) "unknown" else holder}); " +
                "concurrent appends/compactions serialize — retry, or break the lease if the holder is dead")
          else Thread.sleep(50)
      }
    }
    val hbEvery = if (heartbeatMs < 0) math.max(1000L, staleMs / 3) else heartbeatMs
    val hbTask =
      if (hbEvery == 0) None
      else Some(heartbeatPool.scheduleAtFixedRate(
        () => try renewLease(spark, fs, lock, me, token)
              catch { case e: Exception =>
                org.apache.log4j.Logger.getLogger(getClass)
                  .warn(s"IndexStore: lease heartbeat on $root failed: $e") },
        hbEvery, hbEvery, java.util.concurrent.TimeUnit.MILLISECONDS))
    held.set(held.get() + (key -> token))
    try body
    finally {
      held.set(held.get() - key)
      hbTask.foreach(_.cancel(false))
      // Release ONLY our own lease: if it was stolen while we ran, the
      // lock now carries the rival's token — deleting it would free a
      // lease we do not hold.
      try if (lockTokenOf(readLock(fs, lock)).contains(token)) fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
    }
  }

  /** The fencing token of the lease THIS thread holds on `root`, if any. */
  private def heldTokenFor(spark: SparkSession, root: String): Option[String] =
    held.get().get(fsOf(spark, new Path(root)).makeQualified(new Path(root)).toString)

  // ------------------------------------------------------- generation swap

  /** Install a new generation: `populate(liveDataDir, stagedGenDir)`
    * writes the COMPLETE replacement (reading from the live dir is fine —
    * it is a sibling, never overwritten), `_`-prefixed metadata artifacts
    * the populate did not itself write are carried over (minus `dropMeta`
    * — the tombstones, which must die with the rows they mask), the
    * pointer flips atomically, and generations older than `keepGens`
    * behind are reclaimed. Crash story: a populate that dies leaves an
    * orphan staged dir the next swap deletes and rewrites; a crash after
    * the flip leaves only over-retained old generations the next swap's
    * cleanup (or [[vacuum]]) reclaims; the pointer itself is replaced in
    * one atomic rename, so a reader resolves the old or the new
    * generation, never neither, at every crash point.
    */
  def swapGeneration(
      spark: SparkSession,
      root: String,
      dropMeta: Set[String],
      carryMeta: Boolean = true,
      keepGens: Int = 1,
      minRetentionMs: Long = 0L
  )(populate: (String, String) => Unit): Unit =
    withWriterLease(spark, root) {
      val conf = spark.sparkContext.hadoopConfiguration
      val rp   = new Path(root)
      val fs   = fsOf(spark, rp)
      val live = dataDir(spark, root)
      val cur  = currentGeneration(spark, root)
      val next = cur + 1
      val genName = f"$GenPrefix$next%05d"
      val staged  = new Path(root, genName)
      fs.delete(staged, true) // orphan of a killed compact
      populate(live, staged.toString)
      fenceOrAbort(spark, root, staged)
      if (!fs.exists(staged)) fs.mkdirs(staged) // empty index is a legal state
      if (carryMeta) {
        val livePath = new Path(live)
        fs.listStatus(livePath).foreach { st =>
          val name = st.getPath.getName
          val isMeta = name.startsWith("_") && name != "_SUCCESS" &&
            name != PointerName && name != LockName && name != BatchTokensName &&
            !name.startsWith(GenPrefix) && !name.endsWith(".tmp") &&
            !dropMeta.contains(name)
          // populate may have written a REPLACEMENT artifact (retrained
          // centroids, refreshed dictionary) — never clobber it.
          if (isMeta && !fs.exists(new Path(staged, name)))
            FileUtil.copy(fs, st.getPath, fs, new Path(staged, name), false, conf)
        }
      }
      fenceOrAbort(spark, root, staged) // final check adjacent to the flip
      flipPointer(spark, root, genName)
      stampRetired(fs, new Path(live)) // the outgoing generation's retire time
      cleanup(spark, root, next, keepGens, minRetentionMs)
    }

  private val RetiredMarker = "_graft_retired_at"

  /** Stamp the moment a generation stopped being current — the clock
    * [[cleanup]]'s age-based retention reads. Written AFTER the flip
    * (so the marker never rides carryMeta into a new generation) into
    * the retiring directory itself; for the flat-era layout that is the
    * index root, and the marker file is reclaimed with the legacy data.
    */
  private def stampRetired(fs: FileSystem, retiringDir: Path): Unit =
    try {
      val out = fs.create(new Path(retiringDir, RetiredMarker), true)
      try out.write(s"${System.currentTimeMillis()}\n".getBytes("UTF-8"))
      finally out.close()
    } catch { case _: java.io.IOException => () } // best-effort: absent marker = conservative mtime fallback

  /** When did this generation retire? The marker when present; the
    * directory's modification time otherwise (pre-marker indexes — an
    * earlier instant than the true retire time, so the fallback reclaims
    * slightly sooner, never later, than exact accounting would).
    */
  private def retiredAtOf(fs: FileSystem, genDir: Path): Long = {
    val m = new Path(genDir, RetiredMarker)
    try {
      if (fs.exists(m)) {
        val in = fs.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
        finally in.close()
      } else fs.getFileStatus(genDir).getModificationTime
    } catch { case _: Exception => 0L } // unreadable → ancient (count-based behavior)
  }

  /** Install FENCE: a generation may only be published by the writer that
    * still OWNS the lease. A holder paused past the stale window (GC
    * pause, suspended VM, severed then restored network) resumes with
    * its lock long since broken — and possibly re-acquired by a rival
    * whose own compaction already installed. Publishing our (now
    * doubly-stale) generation over theirs would silently drop their
    * rows, so re-read the lock and ABORT the install when the token on
    * disk is not this acquisition's: the staged dir is deleted (it is
    * orphan work — the next swap would reclaim it anyway) and the caller
    * gets a loud exception to retry against the index's new state. Run
    * once after the (long) populate and once adjacent to the flip — the
    * generation CAS analogue of [[graft.sinks.VersionedTable]]'s
    * idempotent commit claim.
    */
  private def fenceOrAbort(spark: SparkSession, root: String, staged: Path): Unit = {
    val lock = new Path(root, LockName)
    val fs   = fsOf(spark, lock)
    val mine = heldTokenFor(spark, root)
    val disk = lockTokenOf(readLock(fs, lock))
    if (mine.isEmpty || disk != mine) {
      try fs.delete(staged, true)
      catch { case _: java.io.IOException => () }
      throw new IllegalStateException(
        s"IndexStore: writer lease on $root lost before install " +
          s"(our token: ${mine.getOrElse("<none>")}; on disk: ${disk.getOrElse("<absent>")}) — " +
          "the lease was broken as stale and possibly re-acquired while this writer was stalled; " +
          "its staged generation was discarded, NOT installed. Re-read the index state and retry.")
    }
  }

  /** Overwrite-persist through the layout: flat roots write in place
    * (today's behavior, fixtures unchanged); generational roots get a
    * fresh generation + atomic flip — a REBUILD stops interrupting
    * serving the moment the index has been compacted once.
    */
  def overwriteRoot(spark: SparkSession, root: String)(write: String => Unit): Unit = {
    val ptr = new Path(root, PointerName)
    if (!fsOf(spark, ptr).exists(ptr)) write(root)
    else swapGeneration(spark, root, dropMeta = Set.empty, carryMeta = false)(
      (_, staged) => write(staged))
  }

  private def flipPointer(spark: SparkSession, root: String, genName: String): Unit = {
    val fs  = fsOf(spark, new Path(root))
    val tmp = fs.makeQualified(new Path(root, PointerName + ".tmp"))
    val dst = fs.makeQualified(new Path(root, PointerName))
    val out = fs.create(tmp, true)
    try out.write((genName + "\n").getBytes("UTF-8"))
    finally out.close()
    // FileContext rename with OVERWRITE is the atomic file replace of
    // both HDFS and the local FS — a concurrent dataDir() sees the old
    // or the new pointer, never a partial or missing one.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dst.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  private def genNumber(name: String): Option[Int] =
    if (name.startsWith(GenPrefix)) scala.util.Try(name.stripPrefix(GenPrefix).toInt).toOption
    else None

  /** Reclaim generations older than `keepGens` behind `current`, and —
    * once the flat-era snapshot (generation 0) ages out of the keep
    * window — the legacy data and metadata still sitting at the root.
    *
    * `minRetentionMs > 0` adds an AGE gate (Delta's
    * `deletedFileRetentionDuration` analogue): a generation is
    * reclaimable only when BOTH the count window and its time-since-
    * retire allow. Count alone is not a probe guarantee — N rapid
    * maintenance cycles (the per-batch q_index_maintain_stream shape)
    * can burn through any keepGens while one long analytical probe
    * still reads the generation it resolved at entry; an age floor
    * sized to the probe SLA cannot be outrun by compaction frequency.
    */
  private def cleanup(
      spark: SparkSession, root: String, current: Int, keepGens: Int, minRetentionMs: Long): Unit = {
    val rp = new Path(root)
    val fs = fsOf(spark, rp)
    val now = System.currentTimeMillis()
    def oldEnough(dir: Path): Boolean =
      minRetentionMs <= 0 || now - retiredAtOf(fs, dir) > minRetentionMs
    val dropLegacy = current - keepGens >= 1 && oldEnough(rp) // generation 0 out of window AND aged
    fs.listStatus(rp).foreach { st =>
      val name = st.getPath.getName
      genNumber(name) match {
        case Some(g) => if (g < current - keepGens && oldEnough(st.getPath)) fs.delete(st.getPath, true)
        case None =>
          val keep = name == PointerName || name == LockName ||
            name == BatchTokensName || name.endsWith(".tmp")
          if (!keep && dropLegacy) fs.delete(st.getPath, true)
      }
    }
  }

  /** Drop every non-current generation NOW (and any flat-era leftovers) —
    * except, when `minRetentionMs > 0`, generations that retired less
    * than that long ago (a probe inside its SLA may still read them).
    * Call with the default only when no probe can still hold a resolved
    * old generation; the automatic cleanup in [[swapGeneration]] covers
    * the common case.
    */
  def vacuum(spark: SparkSession, root: String, minRetentionMs: Long = 0L): Unit = {
    val cur = currentGeneration(spark, root)
    if (cur > 0) cleanup(spark, root, cur, keepGens = 0, minRetentionMs)
  }

  // ------------------------------------------------ selective compaction

  /** At-most-once write per (streamId, batchId) — the foreachBatch retry
    * guard every index-mutating stream body needs: Structured Streaming
    * re-runs a failed batch with the SAME id, so `write` runs only if no
    * token for this (stream, id) exists, and the token is created AFTER
    * the write commits (the [[graft.sinks.VersionedTable.commitIdempotent]]
    * pattern at the file layer; residual window = the instant between
    * job commit and token create — closing it fully needs a
    * transactional sink).
    *
    * `streamId` namespaces the ledger: batch ids are per-QUERY, so two
    * different streams appending to the same index both have a batch 0 —
    * an unnamespaced token would make the second stream silently skip
    * its first write. The ledger self-prunes to the last two ids per
    * stream (a retry can only re-run the CURRENT batch and a restart the
    * last committed one), so it stays O(streams), not O(all batches
    * ever). Returns true if `write` ran, false if the token short-circuited.
    */
  def withBatchToken(
      spark: SparkSession, root: String, streamId: String, batchId: Long)(write: => Unit): Boolean = {
    require(!streamId.exists(c => c == '/' || c == '\\'), s"streamId must be path-safe: $streamId")
    val ledger = new Path(root, BatchTokensName)
    val token  = new Path(ledger, s"$streamId-$batchId")
    val fs     = fsOf(spark, token)
    if (fs.exists(token)) return false
    write
    fs.mkdirs(ledger)
    fs.create(token, false).close()
    val prefix = s"$streamId-"
    fs.listStatus(ledger).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix)) {
        val id = name.substring(prefix.length)
        if (id.forall(_.isDigit) && id.toLong < batchId - 1) fs.delete(st.getPath, false)
      }
    }
    true
  }

  /** Per-partition data-file counts of a `partCol=<int>` parquet layout —
    * one driver-side directory listing; a partition with >1 data file
    * holds append segments and is DIRTY by the segment criterion.
    */
  def partitionFileCounts(spark: SparkSession, relDir: String, partCol: String): Map[Int, Int] = {
    val rp = new Path(relDir)
    val fs = fsOf(spark, rp)
    if (!fs.exists(rp)) Map.empty
    else
      fs.listStatus(rp).iterator
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
        .map { st =>
          val v = st.getPath.getName.substring(partCol.length + 1).toInt
          val n = fs.listStatus(st.getPath)
            .count(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          v -> n
        }
        .toMap
  }

  /** Per-partition (file count, total bytes, BASE-file bytes) from the
    * same single directory listing as [[partitionFileCounts]] — the
    * byte-MASS complement to the segment-COUNT signal, read with zero
    * data pages. (Count alone is blind to segment SIZE: one massive
    * append — a corpus-doubling backfill in a single segment — sits
    * under any count threshold forever while every probe pays the
    * unfolded mass and a drifted Jaccard dictionary or fattened IVF
    * geometry never reaches the compact that would cure it.)
    *
    * The base file is the partition's OLDEST by modification time (tie
    * broken by size, largest first): builds and compacts leave one file
    * per partition and appends always land later, while a hardlink
    * carry preserves the original's mtime — so "total minus base" is
    * exactly the appended mass. Identifying the base by SIZE instead
    * would invert the signal for precisely the case the trigger exists
    * for: a single append that dwarfs the base would read as the base
    * itself.
    */
  def partitionByteStats(
      spark: SparkSession, relDir: String, partCol: String): Map[Int, (Int, Long, Long)] = {
    val rp = new Path(relDir)
    val fs = fsOf(spark, rp)
    if (!fs.exists(rp)) Map.empty
    else
      fs.listStatus(rp).iterator
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
        .map { st =>
          val v = st.getPath.getName.substring(partCol.length + 1).toInt
          val fl = fs.listStatus(st.getPath)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          val base = if (fl.isEmpty) 0L
            else fl.minBy(f => (f.getModificationTime, -f.getLen)).getLen
          v -> (fl.length, fl.map(_.getLen).sum, base)
        }
        .toMap
  }

  /** Partitions holding at least one TOMBSTONED row — the delete
    * criterion of dirtiness. One column-pruned scan of
    * (partition column, id column) semi-joined to the broadcast-small
    * tombstone set: at 10⁹ rows this reads one thin column, against the
    * full-width rewrite it saves.
    */
  def tombstoneTouchedParts(
      rel: DataFrame,
      partCol: String,
      idCol: String,
      tombstones: DataFrame,
      tsIdCol: String
  ): Set[Int] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val r  = rel.select(col(partCol), col(idCol))
    val ts = tombstones.select(col(tsIdCol).as("_graft_ts_id"))
    r.join(broadcast(ts), r(idCol) === ts("_graft_ts_id"), "left_semi")
      .select(col(partCol).cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
  }

  /** Carry CLEAN partitions from the live generation into the staged one
    * without rewriting them: hardlink on local/POSIX filesystems
    * (metadata-only — this is what makes selective compaction O(dirty
    * fraction)), byte copy elsewhere. The shared blocks are safe under
    * the generation lifecycle: reclaiming the old generation unlinks its
    * names, the new generation's links keep the data alive. On object
    * stores with neither links nor cheap copies, prefer the
    * manifest-pointer substrate ([[graft.sinks.VersionedTable]]) where a
    * "carry" is one manifest line.
    */
  def carryPartitions(
      spark: SparkSession,
      liveRel: String,
      stagedRel: String,
      partCol: String,
      parts: Iterable[Int]
  ): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs   = fsOf(spark, new Path(liveRel))
    parts.foreach { p =>
      val src = new Path(liveRel, s"$partCol=$p")
      val dst = new Path(stagedRel, s"$partCol=$p")
      if (fs.exists(src)) linkOrCopyTree(fs, conf, src, dst)
    }
  }

  /** Whole-relation carry (an entirely clean relation of a multi-relation
    * index — e.g. BM25 `docs/` with no tombstones and no appends).
    */
  def carryTree(spark: SparkSession, liveDir: String, stagedDir: String): Unit = {
    val fs = fsOf(spark, new Path(liveDir))
    linkOrCopyTree(fs, spark.sparkContext.hadoopConfiguration, new Path(liveDir), new Path(stagedDir))
  }

  private def linkOrCopyTree(
      fs: FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: Path,
      dst: Path
  ): Unit =
    if (fs.getScheme == "file") {
      val s = java.nio.file.Paths.get(fs.makeQualified(src).toUri.getPath)
      val d = java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath)
      java.nio.file.Files.createDirectories(d.getParent)
      linkTreeNio(s, d)
    } else
      FileUtil.copy(fs, src, fs, dst, false, conf)

  private def linkTreeNio(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      val s = Files.list(src)
      try s.forEach(c => linkTreeNio(c, dst.resolve(c.getFileName)))
      finally s.close()
    } else
      try Files.createLink(dst, src)
      catch { // cross-device or FS without links — fall back to a copy
        case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
  }
}
