package graft.sinks

import org.apache.spark.sql.DataFrame

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
}
