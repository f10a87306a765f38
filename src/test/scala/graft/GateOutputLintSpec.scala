package graft

/** Every gate query's OUTPUT schema must be scalar non-decimal: the driver's
  * typed-value hash diverges from the local replica on wide DECIMALs (r1+r2
  * evidence: 5 hash-fails, all DECIMAL(38,x) sums), and its pandas compare
  * crashes on array/binary/struct columns ("unhashable type"). This spec makes
  * `sbt test` the enforcement point so the class of failure cannot recur.
  * The operator APIs themselves may return arrays/binaries — only the
  * SparkEntry.queries gate projections are constrained.
  */
class GateOutputLintSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  describe("gate output schemas") {
    it("contain only scalar non-decimal columns (driver-hashable)") {
      assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        GateLint.violations(fn(spark, sfDir).schema).map(v => s"$name → $v")
      }
      withClue(bad.mkString("\n")) { bad shouldBe empty }
    }

    it("queries and oracles are in 1:1 correspondence — every gate is hash-checked") {
      val qs = SparkEntry.queries.keySet
      val os = SparkEntry.oracleSql.keySet
      withClue(s"oracleSql entries without a queries entry: ${os -- qs}") {
        (os -- qs) shouldBe empty
      }
      // The driver downgrades oracle-less queries to a rows-only check;
      // this repo's bar is every query hash-verified against DuckDB.
      withClue(s"queries without an oracle (rows-only check): ${qs -- os}") {
        (qs -- os) shouldBe empty
      }
    }
  }
}
