package graft

import graft.functions.{Anonymizer, GraftFunctions, ScrubKernel}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The native [[graft.functions.Scrub]] expression's round-10 surface:
  * the parameterized `partial_redact` kind (the last reference scrubber to
  * leave the UDF path — reference Anonymizer.scala:154-165) and the
  * cast-tolerance contract that keeps the UDF and extension registration
  * tiers accepting the same inputs.
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq("hello123", "abcd", "abc", "", "a", "secretvalue",
    "ab", "x" * 50).toDF("s")

  describe("native partial_redact") {

    it("matches Anonymizer.PartialRedact over edge widths, short inputs, and empties") {
      for ((a, b) <- Seq((2, 2), (1, 3), (0, 0), (4, 0))) {
        val got = corpus.select(GraftFunctions.partialRedact(a, b)(col("s")).as("r"))
          .as[String].collect().toSeq
        val want = corpus.as[String].collect().toSeq.map(Anonymizer.PartialRedact(a, b))
        got shouldBe want
      }
    }

    it("null passes through, as on the UDF path") {
      val df = Seq(Some("hello123"), None).toDF("s")
      df.select(GraftFunctions.partialRedact(2, 2)(col("s")))
        .collect().map(r => Option(r.getString(0))) shouldBe Array(Some("he****23"), None)
    }

    it("the spec DSL lowers mapString(PartialRedact(a, b)) to the native expression") {
      val df = Seq((1L, "hello123"), (2L, "abcd")).toDF("id", "s")
      val spec = graft.dsl.TableSpec.select(row => Seq(row.id, row.s.mapString(Anonymizer.PartialRedact(1, 3))))
      val out = spec.compile(df)
      // Native: the analyzed plan carries the expression's prettyName, and
      // no ScalaUDF wrapper.
      val analyzed = out.queryExecution.analyzed.toString
      analyzed should include("anon_partial_redact")
      analyzed.toLowerCase should not include "udf"
      out.orderBy("id").as[(Long, String)].collect() shouldBe
        Array((1L, "h****123"), (2L, "****"))
    }

    it("construction rejects bad parameters at plan time") {
      an[IllegalArgumentException] should be thrownBy ScrubKernel.idOf("partial_redact", Seq(2))
      an[IllegalArgumentException] should be thrownBy ScrubKernel.idOf("partial_redact", Seq(-1, 2))
      an[IllegalArgumentException] should be thrownBy ScrubKernel.idOf("zip", Seq(1))
      an[IllegalArgumentException] should be thrownBy ScrubKernel.idOf("nope", Nil)
    }
  }

  describe("cast tolerance across registration tiers") {

    it("the native Column surface accepts non-string inputs like the UDF tier (implicit string cast)") {
      val ints = Seq(42, 7).toDF("n")
      val viaNative = ints.select(GraftFunctions.zipCode(col("n")).as("z")).as[String].collect().toSeq
      val viaKernel = Seq("42", "7").map(Anonymizer.ZipCode)
      viaNative shouldBe viaKernel
      val pr = ints.select(GraftFunctions.partialRedact(1, 0)(col("n")).as("p")).as[String].collect().toSeq
      pr shouldBe Seq("4*", "*")
    }

    it("SQL text resolves anon_zip(int) and anon_partial_redact identically on both tiers") {
      // UDF tier on the shared session.
      GraftFunctions.registerAll(spark)
      Seq(42).toDF("n").createOrReplaceTempView("scrub_cast_probe")
      val udfRow = spark.sql(
        "SELECT anon_zip(CAST(n AS STRING)) AS z, anon_partial_redact('hello123', 2, 2) AS p FROM scrub_cast_probe").head
      udfRow.getString(0) shouldBe Anonymizer.ZipCode("42")
      udfRow.getString(1) shouldBe "he****23"

      // Extension tier: sibling session on the same context.
      val base = spark
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        val ext = SparkSession.builder().master("local[2]")
          .withExtensions(new GraftExtensions).getOrCreate()
        // anon_zip(42): non-string input must analyze (the ADVICE defect —
        // the expression tier used to hard-fail what the UDF tier casts).
        val r = ext.sql("SELECT anon_zip(42) AS z, anon_partial_redact('hello123', 2, 2) AS p").head
        r.getString(0) shouldBe Anonymizer.ZipCode("42")
        r.getString(1) shouldBe "he****23"
        // Edge widths must be literals on the expression tier: they embed
        // in generated code at plan time.
        intercept[Exception] {
          ext.sql("SELECT anon_partial_redact('x', CAST(rand() * 2 AS INT), 2)").collect()
        }
      } finally {
        SparkSession.setDefaultSession(base)
        SparkSession.setActiveSession(base)
      }
    }
  }
}
