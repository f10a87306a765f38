package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Focused gate iteration: run ONLY the named queries through the Verify
  * pipeline (result parquet + filtered oracle_sql.json), so
  * `tools/check_oracle.py` checks just them instead of the full sweep.
  *
  * Usage: runMain graft.tools.RunGate <sfDir> <outDir> <query1> [query2 ...]
  */
object RunGate {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SessionTuning.tune(spark)
    new java.io.File(outDir).mkdirs()

    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      graft.GateLint.violations(df.schema).foreach(v => System.err.println(s"[rungate] LINT FAIL $name: $v"))
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.GateCache.releasePrivateCopies() // result materialized above
      println(s"[rungate] wrote $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
