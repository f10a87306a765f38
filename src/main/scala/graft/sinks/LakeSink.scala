package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-side write helpers beyond plain parquet directories.
  *
  * Bucketing pre-shuffles a table ONCE at write time: two tables bucketed
  * on the same key with the same bucket count equi-join with NO exchange on
  * either side — the amortization that matters when a 100 TB fact table is
  * joined repeatedly on the same key. (Spark bucketing requires the table
  * catalog, hence `saveAsTable`; pass `path` to keep the data external.)
  */
object LakeSink {

  /** Parquet bloom-filter write options for `cols`: one split-block bloom
    * per column per row group. The point-lookup complement to min/max
    * statistics — on an UNSORTED high-cardinality column every row group
    * spans the full domain and statistics prune nothing, but an equality
    * probe consults the bloom and skips row groups that cannot contain
    * the value (false-positive rate bounded by the filter size, never
    * false negatives). `ndv` sizes each filter to the column's expected
    * distinct count; leaving a high-cardinality column at parquet's
    * default risks a saturated, always-maybe filter.
    */
  private def bloomOptions(cols: Seq[String], ndv: Map[String, Long]): Map[String, String] =
    cols.flatMap { c =>
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true") ++
        ndv.get(c).map(n => s"parquet.bloom.filter.expected.ndv#$c" -> n.toString)
    }.toMap

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      path: Option[String] = None,
      mode: String = "overwrite",
      bloomFilterCols: Seq[String] = Seq.empty,
      bloomFilterNdv: Map[String, Long] = Map.empty
  ): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    var w = df.write
      .format("parquet")
      .mode(mode)
      .options(bloomOptions(bloomFilterCols, bloomFilterNdv))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Sorted (zone-map-friendly) parquet write: range-partition the frame
    * on `sortCols` and sort within each partition before writing, so every
    * output file — and every row group and page inside it — covers a TIGHT,
    * non-overlapping key range. Parquet stores min/max statistics per row
    * group and a column index per page; a selective filter on the sort key
    * then skips whole files/row groups/pages at scan time instead of
    * reading and discarding rows. On an unsorted table every row group
    * spans the full key domain and the statistics prune NOTHING — at
    * 100 TB that is the difference between reading megabytes and reading
    * the table (ScaleToolsSpec measures the scan-row delta directly).
    *
    * Cost model, stated: `repartitionByRange` pays one sampling pass plus
    * one full exchange AT WRITE TIME — the same trade as
    * [[writeBucketed]]: shuffle once, prune on every subsequent read.
    */
  def writeSorted(
      df: DataFrame,
      dir: String,
      sortCols: Seq[String],
      numFiles: Int,
      mode: String = "overwrite"
  ): Unit = {
    require(sortCols.nonEmpty, "need at least one sort column")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    import org.apache.spark.sql.functions.col
    val keys = sortCols.map(col)
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(mode).parquet(dir)
  }

  /** Z-order (Morton-curve) clustered parquet write: the MULTI-dimensional
    * sibling of [[writeSorted]]. A 1-D sorted layout prunes scans that
    * filter its sort key and nothing else — a filter on the second column
    * still reads the table, because every file spans that column's full
    * domain. Interleaving the bits of k quantized keys into one Morton
    * value and range-partitioning + sorting on THAT gives every file a
    * tight hyper-rectangle in all k dimensions at once, so parquet
    * min/max statistics prune selective filters on ANY clustered column
    * (each dimension keeps ~bits/k effective bits of locality — the
    * classic Z-order trade, stated; `ScaleToolsSpec` measures the
    * either-dimension scan bound directly against both the unsorted and
    * the 1-D-sorted layout).
    *
    * Quantization is linear between the column's global min and max (one
    * aggregate pass), clamped into `[0, 2^bitsPerDim)`. A heavily skewed
    * column therefore concentrates its mass in few quantization cells and
    * degrades toward the 1-D behaviour for the OTHER columns — for those
    * layouts quantile-boundary quantization is the upgrade path; linear
    * keeps the write one scan + one exchange, the same cost as
    * [[writeSorted]]. NULL dimension values quantize to cell 0 (they
    * cluster with the domain minimum rather than poisoning the Morton
    * value to NULL).
    *
    * The Morton value is a pure Column expression (static shift/mask
    * tree — whole-stage-codegen'd, no UDF) and is never materialized into
    * the written schema: `repartitionByRange` and `sortWithinPartitions`
    * take it as an expression, so the files carry exactly `df`'s columns.
    */
  def writeZOrdered(
      df: DataFrame,
      dir: String,
      zCols: Seq[String],
      numFiles: Int,
      mode: String = "overwrite"
  ): Unit = {
    require(zCols.size >= 2 && zCols.size <= 4,
      s"z-ordering needs 2-4 columns (1 → writeSorted), got ${zCols.size}")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    import org.apache.spark.sql.functions.{coalesce, col, greatest, least, lit, max, min, shiftleft, shiftrightunsigned}
    import org.apache.spark.sql.Column
    val bitsPerDim = 32 / zCols.size // 16 for 2 dims, 10 for 3, 8 for 4
    val aggCols = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"_lo_$c"), max(col(c).cast("double")).as(s"_hi_$c")))
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    val maxQ = (1L << bitsPerDim) - 1
    val quantized: Seq[Column] = zCols.zipWithIndex.map { case (c, i) =>
      val lo = Option(stats.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val hi = Option(stats.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      val scaled =
        if (hi > lo)
          least(lit(maxQ), greatest(lit(0L),
            ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * maxQ).cast("long")))
        else lit(0L)
      coalesce(scaled, lit(0L))
    }
    val z = (for { i <- 0 until bitsPerDim; d <- quantized.indices } yield
      shiftleft(shiftrightunsigned(quantized(d), i).bitwiseAND(lit(1L)), i * quantized.size + d))
      .reduce(_ bitwiseOR _)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode(mode).parquet(dir)
  }

  /** CDC apply to a PARTITIONED parquet table: upsert `updates`
    * (last-write-wins on `keyCols`, inserts included) into the
    * `partitionCol`-partitioned table at `dir`, rewriting ONLY the
    * partitions the update batch touches — Spark's dynamic partition
    * overwrite replaces exactly the partitions present in the written
    * frame and leaves every other directory untouched. At 100 TB with
    * daily partitions, a CDC batch touching 3 days rewrites 3 days, not
    * the table; without a transactional table format this
    * partition-scoped read-merge-overwrite is the honest upsert, and its
    * blast radius is the touched-partition set.
    *
    * CONTRACT — partition-stable keys: `partitionCol` must be a stable
    * function of the key (the usual date-partitioned-fact shape). An
    * update that MOVES a key to a different partition would leave the old
    * row alive in an untouched partition; this operator cannot see it
    * without a full-table scan, so the constraint is documented, not
    * silently absorbed.
    *
    * Mechanics: the touched-partition values are collected (bounded by
    * `maxTouchedPartitions` — a CDC batch touching more partitions than
    * that should be a backfill, not a merge), the current rows of ONLY
    * those partitions are read (partition-pruned scan), survivors =
    * current anti-join update keys, and survivors ∪ updates are staged to
    * a scratch directory BEFORE the overwrite (Spark refuses to overwrite
    * a path it is reading; the stage also makes the overwrite's input
    * durable). Returns (rows written, partitions rewritten).
    */
  def mergePartitioned(
      spark: SparkSession,
      dir: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      maxTouchedPartitions: Int = 10000
  ): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "need at least one key column")
    require(!keyCols.contains(partitionCol) || keyCols.size > 1,
      "keyCols must identify rows; the partition column alone cannot")
    val touched = updates.select(col(partitionCol)).distinct()
      .limit(maxTouchedPartitions + 1).collect().map(_.get(0))
    require(touched.length <= maxTouchedPartitions,
      s"mergePartitioned: update batch touches > $maxTouchedPartitions partitions — " +
        "that is a backfill; write it with a plain partitioned overwrite")
    val current = spark.read.parquet(dir).where(col(partitionCol).isin(touched: _*))
    val updKeys = updates.select(keyCols.map(c => col(c).as(s"_k_$c")): _*).distinct()
    val keepCond = keyCols.map(c => current(c) <=> updKeys(s"_k_$c")).reduce(_ && _)
    val survivors = current.join(updKeys, keepCond, "left_anti")
    val merged = survivors.unionByName(updates.select(current.columns.map(col): _*))

    val staging = dir + "._merge_staging"
    merged.write.mode("overwrite").parquet(staging)
    val staged = spark.read.parquet(staging)
    val written = staged.count()
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      staged.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
    finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      val p  = new org.apache.hadoop.fs.Path(staging)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
    (written, touched.length.toLong)
  }

  /** Compact a parquet directory's small files into ~`targetFileBytes`
    * outputs — the small-file mitigation every long-lived lake table
    * needs (streaming micro-batches and over-parallel writers leave
    * thousands of KB-scale files; each costs a task + an open per read).
    *
    * File count is sized from the directory's actual on-disk bytes, and
    * the rewrite goes through a staging directory with an atomic-as-the-FS
    * -allows swap: write staged, move old aside, move staged in, delete
    * old. Crash story, window by window: before the retire rename the
    * original is intact; between retire and install, the table exists ONLY
    * at `<dir>._compact_retired` — that window is detected and REPAIRED on
    * the next compactParquet call (the leftover retired dir is renamed
    * back before anything else happens), so the recovery procedure is
    * simply "run it again". After install, the replacement is complete.
    * Returns (filesBefore, filesAfter).
    *
    * FLAT DIRECTORIES ONLY: the rewrite reads the directory as one
    * unpartitioned table, so a Hive-partitioned layout (subdirectories)
    * would be silently flattened — compactParquet fails fast if `dir`
    * contains subdirectories instead; compact each leaf partition
    * directory individually.
    *
    * Row-group locality: `coalesce` (no shuffle) when shrinking file
    * count — compaction must not cost a full exchange of the table.
    *
    * IN-PLACE directory replacement: between retire and install the
    * table path is briefly ABSENT to concurrent readers (and on
    * S3-class object stores the directory renames are copy+delete —
    * slower, with a wider window). That is inherent to compacting a
    * PLAIN parquet directory in place; when readers must never see a
    * gap, serve through [[VersionedTable]] (manifest commits, no
    * rename) or a generation-pointer index ([[graft.operators.IndexStore]])
    * instead — this utility is for pipeline-internal tables whose
    * consumers are scheduled around it.
    *
    * `bloomFilterCols` installs parquet bloom filters on the rewrite —
    * compaction is the natural moment to add point-lookup skipping to a
    * table that accumulated bloom-less micro-batch files (id-keyed
    * forget flows and CDC probes are the 100-TB consumers).
    */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      bloomFilterCols: Seq[String] = Seq.empty,
      bloomFilterNdv: Map[String, Long] = Map.empty
  ): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path    = new org.apache.hadoop.fs.Path(dir)
    val fs      = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir + "._compact_staging")
    val retired = new org.apache.hadoop.fs.Path(dir + "._compact_retired")
    // Crash recovery: a previous run that died between retire and install
    // left the table only at `retired`. Restore it first (and drop any
    // half-written staging output from that run).
    if (fs.exists(retired) && !fs.exists(path)) {
      if (!fs.rename(retired, path))
        throw new java.io.IOException(s"compactParquet: found crash leftover $retired but could not restore it to $dir")
      fs.delete(staging, true)
    }
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val subdirs = fs.listStatus(path).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    if (subdirs.nonEmpty)
      throw new IllegalArgumentException(
        s"compactParquet: $dir contains subdirectories (${subdirs.take(3).mkString(", ")}…) — " +
          "a partitioned table would be flattened by a whole-directory rewrite; compact each leaf partition directory")
    val before     = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut       = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(dir).coalesce(nOut).write.mode("overwrite")
      .options(bloomOptions(bloomFilterCols, bloomFilterNdv))
      .parquet(staging.toString)
    fs.delete(retired, true)
    if (!fs.rename(path, retired))
      throw new java.io.IOException(s"compactParquet: could not retire $dir")
    if (!fs.rename(staging, path)) {
      fs.rename(retired, path) // roll back — the original table comes back
      throw new java.io.IOException(s"compactParquet: could not install staged compaction for $dir")
    }
    fs.delete(retired, true)
    (before.size, parquetFiles(path).size)
  }
}
