package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-native (whole-stage-codegen) implementation of the MD5 stableHash
  * contract shared with [[graft.functions.Anonymizer.stableHash]] and the
  * DuckDB oracle ([[graft.OracleGen.hashSql]]): first 4 digest bytes,
  * big-endian, masked positive; null/"" → 0.
  *
  * Used by the dedup/similarity operators so their hot paths stay inside
  * codegen instead of calling a Scala UDF per shingle.
  */
object HashCols {

  /** stableHash as a Catalyst expression (no UDF). */
  def stableHash(e: Column): Column = {
    val h = conv(substring(md5(e), 1, 8), 16, 10).cast("long").bitwiseAND(lit(0x7fffffffL))
    when(e.isNull || e === "", lit(0L)).otherwise(h)
  }
}
