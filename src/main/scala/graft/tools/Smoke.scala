package graft.tools

import graft.functions.{GraftFunctions, Lens}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Smoke drive: applies the anonymizer UDF surface + a JSON lens over the
  * driver-provided parquet fixtures and prints samples. Usage:
  *   runMain graft.tools.Smoke [sfDir]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val anon = customer.select(
      col("c_custkey"),
      col("c_name"),
      GraftFunctions.fullName(col("c_name")).as("anon_name"),
      GraftFunctions.email(col("c_name")).as("anon_email"),
      GraftFunctions.phoneNumber(col("c_name")).as("anon_phone"),
      GraftFunctions.city(col("c_mktsegment")).as("anon_city"),
      GraftFunctions.partialRedact(2, 2)(col("c_name")).as("partial"),
    )
    println("=== anonymized customer sample ===")
    anon.show(5, truncate = false)

    // Determinism across the whole table: same input → same output.
    val distinctPairs = anon.select("c_name", "anon_email").distinct().count()
    val distinctNames = customer.select("c_name").distinct().count()
    println(s"determinism: distinct (name,email) pairs = $distinctPairs, distinct names = $distinctNames")

    // events.ts is parquet TIMESTAMP(NANOS) — Spark 4 rejects it unless
    // mapped to Long (nanos since epoch). Session-dynamic conf, so queries
    // can set it on whatever session the harness hands us.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val lensed = events.select(
      col("event_id"),
      col("props"),
      GraftFunctions.lensUdf(Lens.Field("k"), _ => "REDACTED")(col("props")).as("props_k_lens"),
    )
    println("=== lens over events.props (k is numeric → warn+passthrough contract) ===")
    lensed.show(3, truncate = false)

    // A string-field JSON built on the fly, lens targets "name".
    val synth = customer.limit(3).select(
      concat(lit("{\"name\": \""), col("c_name"), lit("\", \"seg\": \""), col("c_mktsegment"), lit("\"}")).as("j")
    )
    val out = synth.select(
      col("j"),
      GraftFunctions.lensUdf(Lens.Field("name"), graft.functions.Anonymizer.FullName)(col("j")).as("j_anon")
    )
    println("=== lens Field(name) with FullName anonymizer ===")
    out.show(3, truncate = false)

    spark.stop()
  }
}
