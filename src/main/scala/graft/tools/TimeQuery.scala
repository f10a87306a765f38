package graft.tools

import org.apache.spark.sql.SparkSession

/** Times gate queries N times each (first run = warmup) — the focused
  * perf loop for one or a few operators without paying a full Bench sweep.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query>[,<query>...] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps  = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (0 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n  = fn(spark, sfDir).count()
        val s  = (System.nanoTime() - t0) / 1e9
        graft.GateCache.releasePrivateCopies() // materialized; outside the timer
        println(f"[$name] run $i: $s%.3f s ($n rows)${if (i == 0) "  (warmup)" else ""}")
      }
    }
    spark.stop()
  }
}
