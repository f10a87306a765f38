package graft

import org.apache.spark.sql.SparkSession

/** Job labelling for the composed lifecycle operators (guide §1.5): a
  * maintain-stream gate runs 100+ small Spark jobs per invocation, and an
  * unlabelled profile attributes every one of them to the foreachBatch
  * call site. Labels are thread-local and restored on exit, so nested
  * labels compose (innermost wins) and nothing leaks across jobs.
  * Instrumentation only — results are unaffected.
  */
object Jobs {
  def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc   = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
