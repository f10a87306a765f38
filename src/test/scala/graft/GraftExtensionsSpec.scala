package graft

import org.apache.spark.sql.SparkSession

/** `graft_cosine` resolved from SQL TEXT through SparkSessionExtensions —
  * the injection path a platform team would configure cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensionsSpec extends SparkSpec {

  it("injects graft_cosine into a session built withExtensions") {
    // A sibling session on the SAME SparkContext: extensions are
    // per-session state, so clear the default, build with extensions,
    // then restore the shared session for the other suites.
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession
        .builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val one = ext
        .sql("SELECT graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), array(CAST(2 AS FLOAT), CAST(0 AS FLOAT)))")
        .head
        .getDouble(0)
      one shouldBe 1.0 +- 1e-12
      // The catalog knows it as a real function, not a UDF.
      ext.sql("DESCRIBE FUNCTION graft_cosine").collect().map(_.getString(0)).mkString("\n") should
        include("graft_cosine")
      // Argument-count validation surfaces at analysis.
      intercept[Exception] {
        ext.sql("SELECT graft_cosine(array(CAST(1 AS FLOAT)))").collect()
      }
      // The PQ ADC kernel resolves from SQL text too: codes X'0100' =
      // subspace codes (1, 0) against a 2x2 lut -> lut[0*2+1] + lut[1*2+0].
      ext.sql("SELECT graft_pq_adc_dot(X'0100', array(CAST(0.5 AS FLOAT), " +
          "CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT), CAST(3.5 AS FLOAT)))")
        .head.getDouble(0) shouldBe 4.0
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  it("the base session (no extensions) does not leak the injected function") {
    intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)))").collect()
    }
  }
}
