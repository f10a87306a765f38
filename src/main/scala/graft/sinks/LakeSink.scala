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

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Seq.empty,
      path: Option[String] = None,
      mode: String = "overwrite"
  ): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    var w = df.write
      .format("parquet")
      .mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Compact a parquet directory's small files into ~`targetFileBytes`
    * outputs — the small-file mitigation every long-lived lake table
    * needs (streaming micro-batches and over-parallel writers leave
    * thousands of KB-scale files; each costs a task + an open per read).
    *
    * File count is sized from the directory's actual on-disk bytes, and
    * the rewrite goes through a staging directory with an atomic-as-the-FS
    * -allows swap: write staged, move old aside, move staged in, delete
    * old — a crash leaves either the original or a complete replacement,
    * never a mix. Returns (filesBefore, filesAfter).
    *
    * Row-group locality: `coalesce` (no shuffle) when shrinking file
    * count — compaction must not cost a full exchange of the table.
    */
  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): (Int, Int) = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path   = new org.apache.hadoop.fs.Path(dir)
    val fs     = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before     = parquetFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nOut       = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val staging    = new org.apache.hadoop.fs.Path(dir + "._compact_staging")
    val retired    = new org.apache.hadoop.fs.Path(dir + "._compact_retired")
    spark.read.parquet(dir).coalesce(nOut).write.mode("overwrite").parquet(staging.toString)
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
