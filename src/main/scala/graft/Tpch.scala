package graft

import graft.plans.{LogicalFK, SchemaManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared catalog/manifest for the driver-provided TPC-H-ish fixture tables
  * (see /root/repo/TESTDATA.md). The FK edges mirror the classic TPC-H
  * relationships present in this reduced schema.
  */
object Tpch {
  val tables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val manifest: SchemaManifest = SchemaManifest(
    tables = tables,
    pks = Map(
      "region"   -> Seq("r_regionkey"),
      "nation"   -> Seq("n_nationkey"),
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part"     -> Seq("p_partkey"),
      "orders"   -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber")
    ),
    fks = Seq(
      LogicalFK("fk_nation_region", "nation", "region", Seq(("n_regionkey", "r_regionkey"))),
      LogicalFK("fk_customer_nation", "customer", "nation", Seq(("c_nationkey", "n_nationkey"))),
      LogicalFK("fk_supplier_nation", "supplier", "nation", Seq(("s_nationkey", "n_nationkey"))),
      LogicalFK("fk_orders_customer", "orders", "customer", Seq(("o_custkey", "c_custkey"))),
      LogicalFK("fk_lineitem_orders", "lineitem", "orders", Seq(("l_orderkey", "o_orderkey"))),
      LogicalFK("fk_lineitem_part", "lineitem", "part", Seq(("l_partkey", "p_partkey"))),
      LogicalFK("fk_lineitem_supplier", "lineitem", "supplier", Seq(("l_suppkey", "s_suppkey")))
    )
  )

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def catalog(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    tables.map(t => t -> table(spark, sfDir, t)).toMap

  /** Events fixture, with `ts` normalized to nanos-since-epoch LongType
    * regardless of the fixture's physical parquet type. Older driver
    * fixtures wrote TIMESTAMP(NANOS), which Spark 4 only reads under the
    * legacy nanos-as-long mapping (LongType nanos); the 2026-08 refresh
    * writes TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ. Every
    * consumer does `ts div 1000` (nanos → µs) arithmetic to match the
    * DuckDB oracles' `epoch_us(ts)`, so both physical forms converge here
    * on the nanos long. The NTZ→epoch conversion goes through a session-tz
    * cast; all entry points (Verify/Bench/tests/tools) pin the session to
    * UTC, matching DuckDB's UTC-naive epoch semantics.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _: org.apache.spark.sql.types.TimestampNTZType |
          _: org.apache.spark.sql.types.TimestampType =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other (expected nanos LongType or a timestamp)")
    }
  }
}
