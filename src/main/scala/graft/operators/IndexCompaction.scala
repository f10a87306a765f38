package graft.operators

import org.apache.spark.sql.SparkSession

/** In-place rewrite machinery for the persisted serving indexes — the
  * missing third of the index lifecycle (build → append/delete → COMPACT).
  *
  * Appends add parquet segments to every touched partition directory and
  * tombstones accumulate under `_graft_tombstones`, so after N
  * forget-flow cycles every probe pays an ever-growing anti-join plus a
  * multi-segment partition scan. Compaction rewrites the data minus the
  * tombstoned docs with ONE segment per partition, atomically(-as-the-FS
  * -allows) swapping the replacement in, and drops the tombstone set —
  * restoring build-fresh probe cost without interrupting serving
  * correctness at any crash point.
  *
  * Same stage-retire-swap as [[graft.sinks.LakeSink.compactParquet]]
  * (crash window between retire and install is detected and repaired at
  * the next call), extended for partitioned index layouts: the staged
  * rewrite preserves the partition scheme, and `_`-prefixed metadata
  * directories living INSIDE the data dir (frozen meta, centroids,
  * dictionaries) are carried over by copy — the live index keeps its
  * metadata until the instant of the swap. Directories named in
  * `dropMeta` (the tombstones) are intentionally left behind in the
  * retired dir and deleted with it.
  */
private[graft] object IndexCompaction {

  /** Rewrite the partitioned dataset at `dir` through a staged swap.
    *
    * `writeStaged(stagingPath)` must WRITE the full compacted replacement
    * (reading from the live `dir` is fine — staging is a sibling path, so
    * Spark's read-what-you-overwrite guard never trips). Crash story:
    * before retire the original is intact; between retire and install the
    * data exists only at `<dir>._compact_retired` and the next call
    * repairs it before doing anything else; after install the replacement
    * is complete. Serving stays correct in every window because tombstone
    * filtering is only dropped together with the rows it masks.
    */
  def rewrite(spark: SparkSession, dir: String, dropMeta: Set[String])(
      writeStaged: String => Unit): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf    = spark.sparkContext.hadoopConfiguration
    val path    = new Path(dir)
    val fs      = path.getFileSystem(conf)
    val staging = new Path(dir + "._compact_staging")
    val retired = new Path(dir + "._compact_retired")
    // Crash repair: a prior run that died between retire and install left
    // the index only at `retired` — restore it first, drop stale staging.
    if (fs.exists(retired) && !fs.exists(path)) {
      if (!fs.rename(retired, path))
        throw new java.io.IOException(
          s"index compaction: found crash leftover $retired but could not restore it to $dir")
    }
    fs.delete(staging, true)
    writeStaged(staging.toString)
    // Carry the frozen metadata ( `_`-prefixed, invisible to partition
    // discovery) into the staged replacement by COPY — the live index
    // keeps its own copy until the swap. `_SUCCESS` markers and the
    // dropMeta set (tombstones) stay behind and die with the retired dir.
    fs.listStatus(path).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") && name != "_SUCCESS" && !dropMeta.contains(name))
        FileUtil.copy(fs, st.getPath, fs, new Path(staging, name), false, conf)
    }
    fs.delete(retired, true)
    if (!fs.rename(path, retired))
      throw new java.io.IOException(s"index compaction: could not retire $dir")
    if (!fs.rename(staging, path)) {
      fs.rename(retired, path) // roll back — the original index comes back
      throw new java.io.IOException(s"index compaction: could not install staged rewrite for $dir")
    }
    fs.delete(retired, true)
  }

  /** Delete a tombstone directory (post-compaction: the masked rows are
    * gone from the data, so the mask must go too — a leftover mask would
    * be harmless for already-purged ids but costs every probe an
    * anti-join forever).
    */
  def dropTombstones(spark: SparkSession, tombstoneDir: String): Unit = {
    val p  = new org.apache.hadoop.fs.Path(tombstoneDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
